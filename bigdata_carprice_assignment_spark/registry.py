"""Query registry backing the driver contract (``__spark_entry__.py``).

Each implemented operator from SURVEY.md §2 registers a named query
callable ``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a
DuckDB oracle SQL string computing the same result on the same parquet
tables. Column names must match exactly (the driver sorts columns by name
and hashes values); every computed column is aliased identically on both
sides, and doubles are rounded identically on both sides so the
order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver-facing query; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible ops (driver then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's CORRECTNESS check records the FIRST 50 registered queries,
# so registration order decides which queries get the hard hash-checked
# signal. Cumulative driver-green coverage strictly grows: queries green
# in r1-r3 (143 checked, all green at last check) are rotated BEHIND the
# window so never-checked oracle queries get their first hard check.
PRIORITY: tuple[str, ...] = (
    # ---- round-8 window head (50). Cumulative oracle coverage reached
    # 100% in r7, so this window = every NEW oracle query this round +
    # the paths round 8 touched + the stalest long-green rotations
    # (r1/r2-checked, never re-checked since) so silent regressions in
    # the oldest greens cannot hide behind a fresh-query-only window.
    #
    # Positions 1-12: NEW oracle-backed queries this round — the exact
    # train/test LM metrics battery (M1+M3+M4) in plain AND
    # bucket-stratified (caret-style) form, the loess smoother
    # conversion (was rows-only), the cheap-profile SRP recall gate,
    # the gaussian-NB AND full-KDE-NB / Lloyd-kmeans / depth-2-CART /
    # 3-round-boosting / bagged-stumps exact twins (M7/M9-M11/M5/M8/M6
    # deterministic math), the ranked top-20 rules query that pins T2
    # sort + T3 limit under the hash, and the epoch-deterministic
    # training shard manifest.
    "carprice_lm_metrics_exact",
    "carprice_lm_metrics_stratified_exact",
    "carprice_loess_smooth",
    "srp_knn_join_production_gate",
    "carprice_gaussian_nb_confusion_exact",
    "carprice_kde_nb_confusion_exact",
    "carprice_kmeans_lloyd_exact",
    "carprice_tree_depth2_exact",
    "fpgrowth_rules_ranked_top20",
    "training_shard_manifest",
    "carprice_gbt_boost_exact",
    "carprice_bagged_stumps_exact",
    # Positions 13-14: second-session round-8 additions — SemDeDup-style
    # semantic prune accounting (components + keep-one + token ledger)
    # and the KMV order-statistics distinct sketch with lossless union
    # merge. Two stale rotations (chi2_independence_components,
    # cube_qty_by_flag_status) move to the round-9 queue to keep the
    # window at 50.
    "semantic_dedup_prune_stats",
    "kmv_distinct_union_calibration",
    # Positions 13-14: the round-7 verdict's fix-pins (the reversed-sort
    # window frame and DECIMAL credit sums land under the driver again).
    "nn_matching_att_urgent_lag",
    "position_weighted_attribution",
    # Positions 15-17: paths this round's ADVICE fixes touched — the
    # re-derived SRP hamming screen and the backtick-quoted minhash
    # id_col SQL must be re-checked by the driver, not just locally.
    "srp_knn_join_adaptive_gate",
    "minhash_estimate_calibration",
    "minhash_lsh_recall_pairs",
    # Positions 18-20: the three long-green sentinels (agg, broadcast
    # join, FPGrowth operator cores).
    "top10_part_brands",
    "region_revenue",
    "fpgrowth_rules",
    # Positions 21-50: stalest rotations — every oracle query whose
    # last driver hash-check was r1 (23) plus the oldest r2 block (7);
    # all locally preflighted green at sf0.01 before this round closed.
    "cosine_topk_vs_query",
    "customers_without_orders",
    "daily_rollup_by_type",
    "doc_fingerprint_stats",
    "doc_lang_id_agreement",
    "doc_quality_by_source",
    "doc_token_stats_by_lang",
    "embedding_norm_stats",
    "event_props_json_extract",
    "event_type_value_share",
    "exact_dedup_documents",
    "hourly_event_rollup",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "pair_association_rules",
    "part_item_frequency",
    "per_segment_rules",
    "pricing_summary_report",
    "rule_interest_measures",
    "rules_subset_size_rhs",
    "top_segment_order_stats",
    "transaction_size_stats",
    "user_sessionization",
    "account_holders_union",
    "asof_last_event_before_order",
    "avg_log_price_by_segment",
    "big_spenders_vs_segment",
    "brand_recode_top5",
    # ---- everything else: previously driver-hash-green and rows-only
    # queries keep module registration order (handled by load_all: any
    # registered query not named here follows after).
)


def load_all() -> None:
    """Import every query module so registration side-effects run, then
    pin the PRIORITY queries to the front of the registration order."""
    global QUERIES
    from .queries import (  # noqa: F401
        analytics,
        carprice,
        corpus,
        events,
        llmdata,
        mining,
        mlmodels,
        pricing,
        quality,
        relational,
        sourcesio,
        statistics,
        trends,
        windows,
    )

    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in PRIORITY}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)

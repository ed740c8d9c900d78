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
    # ---- round-10 window (50): touched paths + the COMPLETE remaining
    # r3-checked block (46, which itself contains one touched path —
    # click_purchase_attribution gained the hour-chunk equi-key), per
    # the rotation discipline in COVERAGE.md. No new oracle queries
    # this round, so the window is exactly 4 + 46.
    #
    # Positions 1-4: paths round-10 code changes touched. The SRP gates
    # now read catalog stats (n_docs/n_distinct) instead of paying two
    # per-call count jobs, and the grouped path's group-size broadcast
    # became conditional; the mechanism-exact gate switched to the
    # UNCAPPED banding path (max_bucket=None skips the window count a
    # 1M cap could never fire); attribution_lag_percentiles gained the
    # (user, hour-chunk) equi-key its sibling proved out in r9.
    "srp_knn_join_adaptive_gate",
    "srp_knn_join_production_gate",
    "srp_candidate_pairs_exact",
    "attribution_lag_percentiles",
    # Positions 5-50: the complete remaining r3-checked block (46,
    # alphabetical; clears the r3 debt). click_purchase_attribution is
    # ALSO a touched path — its pair join now equi-keys on (user_id,
    # hour chunk). NOTE: carprice_lm_model_roundtrip's r10 change is
    # path-only (fixed warehouse path -> per-process temp dir; the
    # fitted table and the save/load cycle are byte-identical) and is
    # locally oracle-verified + pytest-pinned rather than taking a
    # window slot from the r3 block.
    "brand_supplier_variety",
    "click_purchase_attribution",
    "csv_roundtrip_order_stats",
    "customer_order_distribution",
    "customer_peak_week_spend",
    "customer_rfm_segments",
    "daily_new_and_cumulative_users",
    "doc_chunking_stats",
    "doc_length_bands_by_source",
    "doc_unigram_entropy",
    "embedding_centroid_by_label",
    "event_transition_counts",
    "exact_cosine_pairs_blocked",
    "fpgrowth_rules_pruned",
    "grouping_sets_revenue",
    "hll_distinct_check",
    "hourly_count_anomalies",
    "incremental_dedup_accounting",
    "jsonl_roundtrip_part_stats",
    "keyword_search_bm25",
    "ks_statistic_priority",
    "lang_sampling_temperature",
    "last_event_type_per_user",
    "lineitem_unpivot_measure_stats",
    "mann_whitney_components",
    "nation_trade_flows",
    "order_priority_islands",
    "order_value_deciles",
    "orders_monthly_yoy",
    "part_type_brand_rank",
    "parts_unsold_recent",
    "pii_pseudonymize_customers",
    "quality_weighted_sample",
    "regional_same_nation_revenue",
    "revenue_share_within_region",
    "sequence_packing_stats",
    "session_entry_conversion",
    "ship_lag_quantiles_by_priority",
    "signup_funnel_conversion",
    "small_quantity_revenue",
    "source_mixture_rebalance",
    "stratified_sample_by_lang",
    "top_returned_customers",
    "top_unshipped_orders",
    "vocab_zipf_top20",
    "weekly_cohort_retention",
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

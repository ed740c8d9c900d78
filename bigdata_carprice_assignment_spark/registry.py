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
    # ---- round-9 window (50). Cumulative oracle coverage has been 100%
    # since r7, so the window = every NEW oracle query this round + the
    # paths round-9 code changes touched + the stalest long-green
    # rotations (the ENTIRE remaining r2-checked block + the head of the
    # r3 block), per the rotation discipline in COVERAGE.md.
    #
    # Positions 1-2: NEW this round — the S4 model-persistence gate
    # (save/load the exact-OLS coefficient table; oracle = the
    # long-green Cholesky replay), closing the one SURVEY §2 slot that
    # had no driver query; and the exact-substring window-dedup
    # accounting (Lee-et-al-style duplication at 16-token grain).
    "carprice_lm_model_roundtrip",
    "exact_substring_window_dedup",
    # Positions 2-6: paths round-9 code changes touched. The SRP family
    # was restructured into one banding exchange (window-count bucket
    # cap, explode-symmetrized rerank) — all three consumers of
    # srp_band_pairs/_wide must be re-checked by the driver, not just
    # locally. semantic_dedup_prune_stats had its oracle's token count
    # guarded for empty text (ADVICE r8); position_weighted_attribution
    # gained the two-phase hot-key skew mitigation.
    "srp_knn_join_adaptive_gate",
    "srp_knn_join_production_gate",
    "srp_candidate_pairs_exact",
    "semantic_dedup_prune_stats",
    "position_weighted_attribution",
    # Positions 7-45: the complete remaining r2-checked block (39
    # queries, stalest first two displaced from the r8 window
    # mid-round; tuned_nonlinear_regressor_metrics is the one rows-only
    # entry — stochastic library CV fit, re-run for the rows check).
    "chi2_independence_components",
    "cube_qty_by_flag_status",
    "customer_running_spend",
    "customer_upsert_merge_accounting",
    "doc_repetition_quality",
    "embedding_near_dup_recall",
    "eval_contamination_check",
    "event_rank_and_share_per_user",
    "fixed_bucket_order_counts",
    "flagship_price_band_summary",
    "gap_filled_hourly_events",
    "iqr_capped_price_stats",
    "ivf_knn_join_top1",
    "keyword_search_tfidf",
    "largest_order_per_customer",
    "lineitem_correlation_matrix",
    "lineitem_profile_summary",
    "lsh_knn_join_top1",
    "median_imputed_event_values",
    "modal_priority_by_status",
    "nation_distinct_suppliers",
    "nation_set_operations",
    "near_dup_keep_best",
    "null_profile_events",
    "order_price_five_number_summary",
    "part_first_word_counts",
    "pearson_r_components",
    "qty_pivot_by_linestatus",
    "quality_topq_by_lang",
    "returnflag_linestatus_crosstab",
    "rollup_revenue_region_nation",
    "salted_user_event_totals",
    "segment_spend_regression_slope",
    "simhash_hamming_pairs_exact",
    "totalprice_histogram",
    "tukey_pairwise_components",
    "tuned_nonlinear_regressor_metrics",
    "user_value_moving_avg",
    "welch_t_components",
    # Positions 47-50: head of the r3-checked block (46 remain for the
    # round-10 queue, alphabetical from brand_supplier_variety onward).
    "anova_f_components",
    "approx_quantile_check",
    "boilerplate_ngram_stats",
    "brand_name_edit_distances",
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

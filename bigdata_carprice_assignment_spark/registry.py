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
    # ---- round-7 window head (50): clears the oracle backlog to ZERO.
    # Positions 1-37: every oracle-backed query never driver-hash-checked
    # in r1-r6 (CORRECTNESS_r01-r06 union — the staged round-7 queue).
    # Positions 38-42: the five rows-only queries never driver-run even
    # for rows>0. Positions 43-47: the five NEW-this-round oracle
    # queries (F9 un-one-hot exact replay, HyperLogLog calibration,
    # Count-Min heavy hitters, Bloom-filter join-pruning audit, windowed
    # funnel conversion) — registered inside the window so cumulative
    # oracle-checked stays 100% after this round.
    # Positions 48-50: three rotated long-green sentinels covering the
    # shared operator cores the round-6 verdict names (group-count agg,
    # broadcast join, FPGrowth) so a systemic regression cannot hide
    # behind a backlog-only window. All 47 oracle-backed entries are
    # locally hash-green at sf0.001 AND sf0.01
    # (tests/test_oracle_queries.py + tests/driver_mirror.py preflight).
    "dsir_importance_weights",
    "rrf_fused_retrieval_top10",
    "part_skyline_pareto",
    "copurchase_bfs_hop_histogram",
    "position_weighted_attribution",
    "ann_knn_label_vote",
    "copurchase_clustering_coeff_hist",
    "streaming_sliding_rollup_replay",
    "carprice_body_profile_normalized",
    "carprice_standardized_stats",
    "holt_winters_weekly_daily_revenue",
    "nn_matching_att_urgent_lag",
    "session_event_trigrams_top",
    "order_value_qq_period_drift",
    "ams_f2_sketch_check",
    "minhash_estimate_calibration",
    "bm25_tfidf_rank_overlap",
    "token_weighted_doc_sample",
    "fd_histogram_order_values",
    "pmi_collocations_top",
    "doc_novelty_by_source",
    "zipf_slope_fit",
    "heldout_bigram_lm_eval",
    "event_burst_band_join",
    "time_weighted_user_value",
    "int8_quantization_cosine_audit",
    "boilerplate_shingle_dictionary",
    "hard_negative_mining",
    "tokenizer_fertility_by_lang",
    "sorted_neighborhood_linkage",
    "feature_hashing_collision_audit",
    "functional_dependency_audit",
    "categorical_entropy_profile",
    "loo_target_encoding_stats",
    "standardized_urgent_rate_by_segment",
    "kfold_slope_stability",
    "seasonal_naive_backtest",
    # rows-only, never driver-run (rows>0 check + pytest pins):
    "approx_vs_exact_stats",
    "carprice_kde_nb_confusion",
    "carprice_loess_smooth",
    "hypothesis_suite",
    "tukey_hsd_priority",
    # new this round (oracle-backed, inside the window by construction):
    "carprice_un_onehot_replay",
    "hll_distinct_calibration",
    "countmin_heavy_hitters_check",
    "bloom_join_pruning_audit",
    "event_funnel_conversion",
    # rotated sentinels (long-green since r1-r2; the three operator
    # cores the round-6 verdict names: agg, broadcast join, FPGrowth):
    "top10_part_brands",
    "region_revenue",
    "fpgrowth_rules",
    # ---- everything else: previously driver-hash-green (r1-r5) and
    # rows-only queries keep module registration order (handled by
    # load_all: any registered query not named here follows after).
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

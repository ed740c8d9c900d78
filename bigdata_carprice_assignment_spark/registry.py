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
    # ---- round-6 window head (50): 43 of the 66 oracle-backed queries
    # never driver-hash-checked in r1-r5 (CORRECTNESS_r01-r05 union) —
    # the exact-ML family, the time-series/robust-stats diagnostics, and
    # the round-5 session-2 additions — plus SEVEN new-this-round hard
    # checks: the adaptive SRP/IVF production-path recall gates, FOUR
    # Structured Streaming replays (dedup+rollup, session_window
    # sessionization, stream-stream attribution join, and the
    # applyInPandasWithState custom stateful totals), and the k-core
    # peel trace. All locally hash-green at sf0.001/0.01
    # (tests/test_oracle_queries.py); this window takes cumulative
    # oracle-checked from 241 to 291 distinct queries — 270 of the 304
    # currently-oracle-backed (89%), above the round-5 ask's 85% bar;
    # the 34 not yet checked (23 r5-backlog + 11 new-this-round) ALL sit
    # in positions 51-100, so the round-7 window clears the backlog
    # completely. The three ADVICE-fixed queries
    # (chow/diff-in-diff midpoint, randomization-test decimal) are all
    # inside this window so the fixes get the hard check.
    "srp_knn_join_adaptive_gate",
    "ivf_knn_join_adaptive_gate",
    "streaming_dedup_hourly_replay",
    "streaming_sessionization_replay",
    "streaming_attribution_replay",
    "streaming_stateful_totals_replay",
    "copurchase_kcore_peel_trace",
    "carprice_logit_irls_exact",
    "carprice_ridge_coefficients_exact",
    "carprice_top_pca_eigen_exact",
    "carprice_lda_fisher_exact",
    "carprice_isotonic_price_by_hp",
    "carprice_conformal_interval",
    "carprice_logit_calibration_ece",
    "carprice_logit_auc_brier",
    "gaussian_mixture_em_order_values",
    "poisson_glm_daily_orders",
    "holt_linear_daily_revenue",
    "weekly_seasonal_decomposition",
    "revenue_changepoint_binseg",
    "revenue_periodicity_folding",
    "ljung_box_daily_revenue",
    "jarque_bera_order_values",
    "yule_walker_ar2_daily_revenue",
    "chow_break_test_daily_revenue",
    "diff_in_diff_building_vs_auto",
    "randomization_test_priority_diff",
    "daily_orders_overdispersion",
    "cooks_distance_top_days",
    "mad_anomaly_days",
    "huber_regression_daily_revenue",
    "newey_west_trend_se",
    "hill_tail_index_order_values",
    "winsorized_correlation_qty_price",
    "mean_excess_over_thresholds",
    "durbin_watson_daily_revenue",
    "friedman_test_components",
    "urgent_highvalue_kappa",
    "priority_status_cramers_v",
    "yuen_trimmed_t_components",
    "cohens_d_priority_extremes",
    "ab_srm_check",
    "cuped_variance_reduction",
    "nelson_aalen_cumulative_hazard",
    "bootstrap_mean_se_order_value",
    "lineitem_ols_diagnostics",
    "copurchase_degree_powerlaw",
    "copurchase_component_sizes",
    "orc_roundtrip_lineitem_stats",
    "bpe_first_merges",
    # ---- positions 51+: the round-7 queue — the 21 backlog queries that
    # didn't fit this window (all locally hash-green), the four
    # new-this-session ops (skyline, BFS hop histogram, position-weighted
    # attribution, kNN label vote), then the three sentinel re-checks of
    # long-green queries whose shared operators (agg core, broadcast
    # join, FPGrowth) would carry any systemic regression.
    "part_skyline_pareto",
    "copurchase_bfs_hop_histogram",
    "position_weighted_attribution",
    "ann_knn_label_vote",
    "dsir_importance_weights",
    "rrf_fused_retrieval_top10",
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
    "pricing_summary_report",
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

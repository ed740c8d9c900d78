"""Tier-1 driver-contract mirror: every registered query with an oracle
hash-matches DuckDB on the sf0.001 corpus (the driver runs sf0.01; small
SF keeps the suite fast — quantile/agg semantics are scale-free)."""

from __future__ import annotations

import pytest

from bigdata_carprice_assignment_spark import registry

from .oracle_harness import compare, run_oracle

registry.load_all()

ORACLE_NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_smoke, name):
    spark_df = registry.QUERIES[name](spark, sf_smoke)
    oracle_pd = run_oracle(registry.ORACLES[name], sf_smoke)
    problems = compare(spark_df, oracle_pd, name)
    assert not problems, "\n".join(problems)


def test_all_queries_build_valid_plans(spark, sf_smoke):
    """Every registered query must at least analyze (schema resolvable)
    without executing — fast wiring check across the whole registry.
    (Execution coverage: oracle params above, dedicated ML/LLM/streaming
    tests, and the driver's rows-only checks.)"""
    for name, fn in registry.QUERIES.items():
        df = fn(spark, sf_smoke)
        assert df.columns, f"{name}: no columns"
        assert df.schema is not None, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0

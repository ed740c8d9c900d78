"""The exact↔approx percentile switch (the selectable 100 TB path):
value agreement, band-assignment agreement ≥ 99.9%, and the plan shape
of the approx path (single-pass sketch aggregate, no per-group buffering
of the full column)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_carprice_assignment_spark.operators.aggregates import (
    exact_percentiles,
    percentile_expr,
)
from bigdata_carprice_assignment_spark.plans.explain import formatted_plan
from bigdata_carprice_assignment_spark.queries.pricing import (
    flagship_price_band_summary,
    price_band_col,
    quartiles,
)
from bigdata_carprice_assignment_spark.sources.readers import load_table


def test_approx_quartiles_close_to_exact(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    eq = quartiles(orders, "o_totalprice", "exact")
    aq = quartiles(orders, "o_totalprice", "approx")
    for e, a in zip(eq, aq):
        assert abs(a - e) / e < 0.01, (eq, aq)


def test_band_assignment_agreement_999(spark, sf_smoke):
    """The gate VERDICT asked for: quartile band labels under approx
    quantiles agree with exact on ≥ 99.9% of rows."""
    orders = load_table(spark, sf_smoke, "orders")
    eq = quartiles(orders, "o_totalprice", "exact")
    aq = quartiles(orders, "o_totalprice", "approx")
    agree = orders.agg(
        F.avg(
            (
                price_band_col("o_totalprice", *eq)
                == price_band_col("o_totalprice", *aq)
            ).cast("double")
        )
    ).first()[0]
    assert agree >= 0.999, agree


def test_approx_mode_flagship_same_shape(spark, sf_smoke):
    exact = flagship_price_band_summary(spark, sf_smoke, mode="exact")
    approx = flagship_price_band_summary(spark, sf_smoke, mode="approx")
    assert exact.columns == approx.columns
    assert approx.count() == exact.count()


def test_approx_plan_is_single_pass_sketch(spark, sf_smoke):
    """The approx path must aggregate via the mergeable
    approx_percentile sketch (partial_approx_percentile on the map side
    — bounded memory), never the exact `percentile` buffering
    aggregate."""
    orders = load_table(spark, sf_smoke, "orders")
    df = orders.select(percentile_expr("o_totalprice", [0.25, 0.5, 0.75], "approx"))
    plan = formatted_plan(df)
    assert "percentile_approx" in plan, plan
    # map-side partial sketch proves single-pass mergeability
    assert "partial_percentile_approx" in plan, plan
    assert " percentile(" not in plan.replace("percentile_approx(", ""), plan


def test_exact_percentiles_mode_param(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    e = exact_percentiles(li, "l_extendedprice", [0.5], mode="exact")
    a = exact_percentiles(li, "l_extendedprice", [0.5], mode="approx")
    assert abs(a[0] - e[0]) / e[0] < 0.01

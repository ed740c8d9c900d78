"""oneway_anova_multi (one melt+groupBy pass) must agree with the
per-column oneway_anova loop it replaces, feature for feature."""

from __future__ import annotations

import pytest

from bigdata_carprice_assignment_spark.operators import stats
from bigdata_carprice_assignment_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_smoke):
    return load_table(spark, sf_smoke, "orders").limit(2000).cache()


def test_multi_matches_single_column_anova(spark, orders):
    df = orders.selectExpr(
        "o_orderpriority AS g",
        "o_totalprice AS a",
        "o_totalprice * 0.5 + o_custkey AS b",
    )
    multi = {r["feature"]: r for r in stats.oneway_anova_multi(df, ["a", "b"], "g").collect()}
    for col in ("a", "b"):
        single = stats.oneway_anova(df, col, "g").first()
        m = multi[col]
        assert m["k"] == single["k"]
        assert m["n"] == single["n"]
        assert m["f_stat"] == pytest.approx(single["f_stat"], rel=1e-9)
        assert m["p_value"] == pytest.approx(single["p_value"], rel=1e-9, abs=1e-300)


def test_multi_preserves_feature_order(spark, orders):
    df = orders.selectExpr("o_orderpriority AS g", "o_totalprice AS z", "o_totalprice AS a")
    out = stats.oneway_anova_multi(df, ["z", "a"], "g")
    assert [r["feature"] for r in out.collect()] == ["z", "a"]

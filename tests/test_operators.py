"""Unit tests for operator pieces not covered by the oracle suite
(Tier-4 properties: SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_carprice_assignment_spark.functions.scalars import (
    bucket_label_col,
    clamp,
    first_word,
    un_onehot,
)
from bigdata_carprice_assignment_spark.operators import cleaning
from bigdata_carprice_assignment_spark.sources.readers import load_table


def test_bucket_label_right_closed_include_lowest(spark):
    """R cut semantics: (a,b] bins, lowest break included in first bin,
    outside range → null."""
    df = spark.createDataFrame(
        [(0.0,), (1.0,), (1.5,), (2.0,), (3.0,), (-0.5,), (3.5,)], "x double"
    )
    got = {
        r["x"]: r["b"]
        for r in df.select(
            "x", bucket_label_col("x", [0.0, 1.0, 2.0, 3.0], ["a", "b", "c"]).alias("b")
        ).collect()
    }
    assert got[0.0] == "a"  # include.lowest
    assert got[1.0] == "a"  # right-closed: 1.0 ∈ (0,1]
    assert got[1.5] == "b"
    assert got[2.0] == "b"
    assert got[3.0] == "c"
    assert got[-0.5] is None and got[3.5] is None


def test_bucket_labels_cover_and_disjoint(spark):
    """Every in-range value gets exactly one label (coverage/disjointness)."""
    import numpy as np

    vals = [(float(v),) for v in np.linspace(0, 3, 301)]
    df = spark.createDataFrame(vals, "x double")
    labeled = df.select(
        "x", bucket_label_col("x", [0.0, 1.0, 2.0, 3.0], ["a", "b", "c"]).alias("b")
    )
    assert labeled.filter(F.col("b").isNull()).count() == 0


def test_clamp_null_passthrough(spark):
    df = spark.createDataFrame([(None,), (5.0,), (-5.0,)], "x double")
    got = [r["c"] for r in df.select(clamp("x", 0.0, 1.0).alias("c")).collect()]
    assert got == [None, 1.0, 0.0]


def test_un_onehot_first_flag_wins(spark):
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (0, 0), (1, 1)], "f_a int, f_b int"
    )
    got = [
        r["brand"]
        for r in df.select(
            un_onehot({"f_a": "alpha", "f_b": "beta"}).alias("brand")
        ).collect()
    ]
    assert got == ["alpha", "beta", "Unknown", "alpha"]


def test_first_word(spark):
    df = spark.createDataFrame([("alfa-romero giulia",), ("bmw",)], "s string")
    got = [r["w"] for r in df.select(first_word("s").alias("w")).collect()]
    assert got == ["alfa-romero", "bmw"]


def test_impute_median_and_mode(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, None), (None, "b"), (100.0, "a")],
        "x double, c string",
    )
    out = cleaning.impute(df, numeric=["x"], categorical=["c"]).collect()
    xs = sorted(r["x"] for r in out)
    assert 2.0 in xs and None not in xs  # median of {1,2,100} = 2
    cs = [r["c"] for r in out]
    assert None not in cs and cs.count("a") == 3  # mode = 'a'


def test_mode_tiebreak_deterministic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",), ("a",)], "c string")
    assert cleaning.mode_fill_values(df, ["c"]) == {"c": "a"}  # value asc on tie


def test_winsorize_bounds(spark):
    import numpy as np

    vals = [(float(v),) for v in range(1, 206)]
    df = spark.createDataFrame(vals, "x double")
    out = cleaning.winsorize(df, ["x"], 0.01, 0.99).toPandas()["x"]
    assert out.min() == pytest.approx(1 + 0.01 * 204)  # type-7 1%
    assert out.max() == pytest.approx(1 + 0.99 * 204)


def test_model_save_load_roundtrip(spark, tmp_path):
    """S4: model sink/source (saveRDS analogue) via Spark ML persistence."""
    from pyspark.ml import PipelineModel

    from bigdata_carprice_assignment_spark.ml import pipelines as mlp
    from bigdata_carprice_assignment_spark.sources.writers import save_model

    df = spark.createDataFrame(
        [(float(i), float(2 * i + 1)) for i in range(20)], "x double, label double"
    )
    model = mlp.fit_regression(df, ["x"], [], label="label", kind="lm")
    path = str(tmp_path / "lm_model")
    save_model(model, path)
    loaded = PipelineModel.load(path)
    a = model.transform(df).select("prediction").collect()
    b = loaded.transform(df).select("prediction").collect()
    assert a == b


def test_upsert_merge_branch_semantics(spark):
    from bigdata_carprice_assignment_spark.operators.joins import upsert_merge

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, bal double"
    )
    source = spark.createDataFrame(
        [(2, 99.0, "x"), (4, 40.0, "y")], "k long, new_bal double, tag string"
    )
    out = {
        r["k"]: r
        for r in upsert_merge(target, source, "k", {"bal": "new_bal"}).collect()
    }
    assert out[1]["_action"] == "keep" and out[1]["bal"] == 10.0 and out[1]["name"] == "a"
    assert out[2]["_action"] == "update" and out[2]["bal"] == 99.0 and out[2]["name"] == "b"
    assert out[3]["_action"] == "keep" and out[3]["bal"] == 30.0
    assert out[4]["_action"] == "insert" and out[4]["bal"] == 40.0 and out[4]["name"] is None
    assert out[2]["tag"] == "x" and out[1]["tag"] is None


def test_jsonl_roundtrip_with_schema(spark, sf_smoke, tmp_path):
    from bigdata_carprice_assignment_spark.sources.readers import read_jsonl
    from bigdata_carprice_assignment_spark.sources.writers import write_jsonl

    orders = load_table(spark, sf_smoke, "orders").limit(200)
    path = str(tmp_path / "orders_jsonl")
    write_jsonl(orders, path)
    back = read_jsonl(spark, path, schema=orders.schema)
    assert back.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_roundtrip(spark, sf_smoke, tmp_path):
    from bigdata_carprice_assignment_spark.sources.readers import read_orc
    from bigdata_carprice_assignment_spark.sources.writers import write_orc

    li = load_table(spark, sf_smoke, "lineitem").limit(500)
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert dict(back.dtypes) == dict(li.dtypes)
    assert back.count() == li.count()
    assert back.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).first()["s"] == \
        li.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).first()["s"]


def test_pagerank_star_graph_and_mass(spark):
    """On a star graph the center must dominate; total rank mass is
    conserved (sums to 1 up to FP noise) because the symmetric graph has
    no dangling nodes."""
    from pyspark.sql import functions as F

    from bigdata_carprice_assignment_spark.operators.graphs import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "u long, v long"
    )
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    center, leaves = pr[0], [pr[i] for i in range(1, 9)]
    assert all(center > 3 * lv for lv in leaves)
    assert max(leaves) - min(leaves) < 1e-12  # symmetry

"""Scale-mechanism tests: salting equivalence + bucketed no-shuffle joins
+ the SQL view surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_carprice_assignment_spark.operators import skew
from bigdata_carprice_assignment_spark.plans import explain as X


@pytest.fixture(scope="module")
def skewed(spark):
    """1 hot key with 5k rows + 100 cold keys with 10 rows each."""
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 100)).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_count_equals_plain_count(spark, skewed):
    plain = {r["k"]: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {
        r["k"]: r["count"] for r in skew.salted_group_count(skewed, "k", 16).collect()
    }
    assert salted == plain


def test_salted_agg_equals_plain_agg(spark, skewed):
    plain = {
        r["k"]: (r["n"], round(r["s"], 6))
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], round(r["sum_v"], 6))
        for r in skew.salted_group_agg(skewed, "k", ["v"], 16).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c2", "C2")], "k string, label string"
    )
    plain = sorted(
        (r["k"], r["v"], r["label"])
        for r in skewed.join(dim, "k", "inner").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in skew.salted_broadcast_join(skewed, dim, "k", 8).collect()
    )
    assert salted == plain and len(plain) == 5000 + 20


def test_salt_spreads_hot_key(spark, skewed):
    salted = skew.with_salt(skewed.filter(F.col("k") == "hot"), 16)
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 16  # the hot key fans out over all salt buckets


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path_factory):
    """Two tables bucketed on the join key co-locate: the join plan has
    ZERO shuffle exchanges — the 100 TB pre-partitioning strategy."""
    from bigdata_carprice_assignment_spark.sources.readers import load_table
    from bigdata_carprice_assignment_spark.sources.writers import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
        li = load_table(spark, sf_smoke, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        write_bucketed(orders, "b_orders", "o_orderkey", 8)
        write_bucketed(li, "b_lineitem", "o_orderkey", 8)
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        joined.collect()
        assert X.count_exchanges(joined) == 0, X.formatted_plan(joined)
        # sanity: same row count as the plain join
        assert joined.count() == load_table(spark, sf_smoke, "lineitem").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_sql_view_surface(spark, sf_smoke):
    from bigdata_carprice_assignment_spark.sql import sql

    out = sql(
        spark,
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        sf_smoke,
    ).collect()
    assert sum(r["n"] for r in out) == 6000

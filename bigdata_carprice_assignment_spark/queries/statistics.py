"""Statistical-test queries (SURVEY.md §2.7).

Two tiers per test:
- ``*_components`` — the SQL-expressible part (group stats → statistic,
  df) computed fully inside Spark SQL expressions, with a DuckDB oracle.
- ``hypothesis_suite`` — the full operator outputs including p-values
  (driver-side special-function math; no SQL equivalent → rows-only
  check; unit tests pin the p-values against published table values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import stats
from ..registry import query
from ..sources.readers import load_table


@query(
    "welch_t_components",
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS grp, avg(o_totalprice) AS m,
         var_samp(o_totalprice) AS v, count(*) AS n
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY 1
)
SELECT a.grp AS group1, b.grp AS group2,
       round(a.m - b.m, 4) AS mean_diff,
       round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
       round(pow(a.v / a.n + b.v / b.n, 2)
             / (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)),
             2) AS welch_df
FROM g a JOIN g b ON a.grp = '1-URGENT' AND b.grp = '5-LOW'
""",
)
def welch_t_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = stats.group_stats(
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")),
        "o_totalprice",
        "o_orderpriority",
    )
    a = g.filter(F.col("o_orderpriority") == "1-URGENT").alias("a")
    b = g.filter(F.col("o_orderpriority") == "5-LOW").alias("b")
    se2 = F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")
    return a.crossJoin(b).select(
        F.col("a.o_orderpriority").alias("group1"),
        F.col("b.o_orderpriority").alias("group2"),
        F.round(F.col("a.mean") - F.col("b.mean"), 4).alias("mean_diff"),
        F.round((F.col("a.mean") - F.col("b.mean")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("a.var") / F.col("a.n"), 2) / (F.col("a.n") - 1)
                + F.pow(F.col("b.var") / F.col("b.n"), 2) / (F.col("b.n") - 1)
            ),
            2,
        ).alias("welch_df"),
    )


@query(
    "anova_f_components",
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS grp, avg(o_totalprice) AS m,
         var_samp(o_totalprice) AS v, count(*) AS n
  FROM orders GROUP BY 1
),
tot AS (
  SELECT count(*) AS k, sum(n) AS n, sum(n * m) / sum(n) AS grand FROM g
),
comp AS (
  SELECT tot.k, tot.n,
         sum(g.n * pow(g.m - tot.grand, 2)) AS ssb,
         sum((g.n - 1) * g.v) AS ssw
  FROM g, tot GROUP BY tot.k, tot.n
)
SELECT k, n, round(ssb, 2) AS ss_between, round(ssw, 2) AS ss_within,
       round((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat
FROM comp
""",
)
def anova_f_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = stats.group_stats(orders, "o_totalprice", "o_orderpriority")
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        (F.sum(F.col("n") * F.col("mean")) / F.sum("n")).alias("grand"),
    )
    comp = g.crossJoin(F.broadcast(tot)).groupBy("k", "n_total").agg(
        F.sum(F.col("n") * F.pow(F.col("mean") - F.col("grand"), 2)).alias("ssb"),
        F.sum((F.col("n") - 1) * F.col("var")).alias("ssw"),
    )
    return comp.select(
        "k",
        F.col("n_total").alias("n"),
        F.round("ssb", 2).alias("ss_between"),
        F.round("ssw", 2).alias("ss_within"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_total") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@query(
    "tukey_pairwise_components",
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS grp, avg(o_totalprice) AS m,
         var_samp(o_totalprice) AS v, count(*) AS n
  FROM orders GROUP BY 1
),
msw AS (
  SELECT sum((n - 1) * v) / (sum(n) - count(*)) AS msw FROM g
)
SELECT a.grp AS group1, b.grp AS group2,
       round(b.m - a.m, 4) AS diff,
       round(sqrt(msw.msw / 2 * (1.0 / a.n + 1.0 / b.n)), 6) AS se,
       round(abs(b.m - a.m) / sqrt(msw.msw / 2 * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat
FROM g a JOIN g b ON a.grp < b.grp, msw
ORDER BY group1, group2
""",
)
def tukey_pairwise_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = stats.group_stats(orders, "o_totalprice", "o_orderpriority")
    msw = g.agg(
        (
            F.sum((F.col("n") - 1) * F.col("var"))
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("msw")
    )
    a = g.select(
        F.col("o_orderpriority").alias("group1"),
        F.col("mean").alias("m1"),
        F.col("n").alias("n1"),
    )
    b = g.select(
        F.col("o_orderpriority").alias("group2"),
        F.col("mean").alias("m2"),
        F.col("n").alias("n2"),
    )
    se = F.sqrt(F.col("msw") / 2 * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    return (
        a.join(b, F.col("group1") < F.col("group2"))
        .crossJoin(F.broadcast(msw))
        .select(
            "group1",
            "group2",
            F.round(F.col("m2") - F.col("m1"), 4).alias("diff"),
            F.round(se, 6).alias("se"),
            F.round(F.abs(F.col("m2") - F.col("m1")) / se, 6).alias("q_stat"),
        )
        .orderBy("group1", "group2")
    )


@query(
    "pearson_r_components",
    oracle="""
SELECT round(corr(l_quantity, l_extendedprice), 6) AS r,
       count(*) AS n,
       round(corr(l_quantity, l_extendedprice)
             * sqrt((count(*) - 2)
                    / (1 - pow(corr(l_quantity, l_extendedprice), 2))), 6) AS t_stat
FROM lineitem
""",
)
def pearson_r_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    r = F.corr("l_quantity", "l_extendedprice")
    n = F.count(F.lit(1))
    return li.agg(
        F.round(r, 6).alias("r"),
        n.alias("n"),
        F.round(r * F.sqrt((n - 2) / (1 - F.pow(r, 2))), 6).alias("t_stat"),
    )


@query(
    "chi2_independence_components",
    oracle="""
WITH obs AS (
  SELECT l_returnflag AS a, l_linestatus AS b, count(*)::DOUBLE AS n
  FROM lineitem GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS n FROM obs),
rt AS (SELECT a, sum(n) AS rn FROM obs GROUP BY a),
ct AS (SELECT b, sum(n) AS cn FROM obs GROUP BY b),
cells AS (
  SELECT rt.a, ct.b, rt.rn * ct.cn / tot.n AS expected,
         coalesce(obs.n, 0) AS observed
  FROM rt CROSS JOIN ct CROSS JOIN tot
  LEFT JOIN obs ON obs.a = rt.a AND obs.b = ct.b
)
SELECT round(sum(pow(observed - expected, 2) / expected), 6) AS chi2,
       (count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS df
FROM cells
""",
)
def chi2_independence_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        F.col("l_returnflag").alias("a"), F.col("l_linestatus").alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = obs.agg(F.sum("n").alias("tot"))
    rt = obs.groupBy("a").agg(F.sum("n").alias("rn"))
    ct = obs.groupBy("b").agg(F.sum("n").alias("cn"))
    cells = (
        rt.crossJoin(ct)
        .crossJoin(F.broadcast(tot))
        .join(obs, ["a", "b"], "left")
        .select(
            "a",
            "b",
            (F.col("rn") * F.col("cn") / F.col("tot")).alias("expected"),
            F.coalesce(F.col("n"), F.lit(0.0)).alias("observed"),
        )
    )
    return cells.agg(
        F.round(
            F.sum(F.pow(F.col("observed") - F.col("expected"), 2) / F.col("expected")), 6
        ).alias("chi2"),
        (
            (F.countDistinct("a") - 1) * (F.countDistinct("b") - 1)
        ).alias("df"),
    )


# ---------------------------------------------------------------------------
# Full hypothesis suite with p-values (rows-only: special functions are not
# SQL-expressible). Mirrors the reference's H1-H4 battery on the corpus.
# ---------------------------------------------------------------------------


@query("hypothesis_suite")
def hypothesis_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    welch = stats.welch_ttest(orders, "o_totalprice", "o_orderpriority", "1-URGENT", "5-LOW")
    anova = stats.oneway_anova(orders, "o_totalprice", "o_orderpriority")
    pearson = stats.pearson_corr_test(li, "l_quantity", "l_extendedprice")
    chi2 = stats.chi2_independence(li, "l_returnflag", "l_linestatus")
    # bind each result Row ONCE — .first() re-runs the whole Spark job
    rw, ra, rp, rc = welch.first(), anova.first(), pearson.first(), chi2.first()
    rows = [
        ("welch_t_totalprice_urgent_vs_low", rw["t_stat"], rw["p_value"]),
        ("anova_totalprice_by_priority", ra["f_stat"], ra["p_value"]),
        ("pearson_qty_extendedprice", rp["t_stat"], rp["p_value"]),
        ("chi2_returnflag_linestatus", rc["chi2"], rc["p_value"]),
    ]
    return spark.createDataFrame(
        [(n, float(s), float(p), bool(p < 0.05)) for n, s, p in rows],
        "test string, statistic double, p_value double, reject_at_5pct boolean",
    )


@query("tukey_hsd_priority")
def tukey_hsd_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return stats.tukey_hsd(orders, "o_totalprice", "o_orderpriority")

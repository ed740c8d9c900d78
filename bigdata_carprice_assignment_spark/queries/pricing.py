"""Flagship query: price-band market summary (SURVEY.md §7 Phase 0).

The reference's core analytical move — exact-quantile bucketing (F7,
BigDataProject.R:122-128) + group aggregation (A1/A2) + ordered output —
transplanted onto the driver's TPC-H-ish corpus: quartile-bucket
``o_totalprice`` into Low/Medium/High/VeryHigh (R ``cut`` semantics:
right-closed bins, lowest included), join to lineitem, aggregate revenue
per band.

Scale notes: quartiles are a tiny 3-scalar collect; the orders→lineitem
join shuffles on the natural key (l_orderkey) which is near-uniform; at
100 TB AQE handles residual skew, and the bucket projection of orders is
2 columns wide (column pruning reaches the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

FLAGSHIP_ORACLE = """
WITH q AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.50) AS q2,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders
),
banded AS (
  SELECT o_orderkey,
         CASE WHEN o_totalprice <= q.q1 THEN 'Low'
              WHEN o_totalprice <= q.q2 THEN 'Medium'
              WHEN o_totalprice <= q.q3 THEN 'High'
              ELSE 'VeryHigh' END AS price_band
  FROM orders, q
)
SELECT b.price_band,
       count(*) AS n_items,
       count(DISTINCT l.l_orderkey) AS n_orders,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(avg(l.l_extendedprice), 4) AS avg_item_price
FROM lineitem l
JOIN banded b ON l.l_orderkey = b.o_orderkey
GROUP BY b.price_band
ORDER BY b.price_band
"""


def quartiles(df: DataFrame, col: str, mode: str = "exact") -> tuple[float, float, float]:
    """Interpolating quartiles (exact mode: R type-7 ≡ Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` — SURVEY.md §2.4 A7);
    ``mode='approx'`` selects the single-pass sketch for the 100 TB path
    without touching call sites (operators/aggregates.py::percentile_expr)."""
    from ..operators.aggregates import percentile_expr

    row = df.select(percentile_expr(col, [0.25, 0.5, 0.75], mode).alias("q")).first()
    return tuple(row["q"])  # 3 scalars to the driver — not data-sized


def price_band_col(col: str, q1: float, q2: float, q3: float):
    """R ``cut(..., include.lowest=TRUE)`` right-closed when-ladder (F7)."""
    c = F.col(col)
    return (
        F.when(c <= F.lit(q1), "Low")
        .when(c <= F.lit(q2), "Medium")
        .when(c <= F.lit(q3), "High")
        .otherwise("VeryHigh")
    )


@query("flagship_price_band_summary", oracle=FLAGSHIP_ORACLE)
def flagship_price_band_summary(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    q1, q2, q3 = quartiles(orders, "o_totalprice", mode)
    banded = orders.select(
        "o_orderkey", price_band_col("o_totalprice", q1, q2, q3).alias("price_band")
    )

    return (
        lineitem.join(banded, lineitem.l_orderkey == banded.o_orderkey, "inner")
        .groupBy("price_band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_item_price"),
        )
        .orderBy("price_band")
    )

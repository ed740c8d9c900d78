"""Window-function query family (engine extension; SURVEY.md §2.5 note)
— running totals, ranking, deciles, as-of join, gap-filled rollups,
grouped-vs-global comparisons. All oracle-backed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import windows as W
from ..registry import query
from ..sources.readers import load_table


@query(
    "customer_running_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = W.running_total(orders, "o_custkey", "o_orderdate", "o_totalprice", "o_orderkey")
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("running_total", 2).alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "order_value_deciles",
    oracle="""
WITH d AS (
  SELECT o_totalprice, ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi,
       round(sum(o_totalprice), 2) AS total
FROM d GROUP BY decile ORDER BY decile
""",
)
def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment over a global ordering — computed WITHOUT the
    single-task global sort ntile implies: global rank comes from a
    range-partitioned two-pass cumsum (parallel local prefix sums +
    broadcast per-partition offsets), then the exact ntile bucket
    formula. Identical output to ``ntile(10) OVER (ORDER BY ...)``
    (the oracle keeps that form), but every stage is partition-parallel
    at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    d = W.range_partitioned_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        10,
    ).withColumnRenamed("tile", "decile")
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("decile")
    )


@query(
    "big_spenders_vs_segment",
    oracle="""
WITH spend AS (
  SELECT c.c_custkey, c.c_mktsegment, sum(o.o_totalprice) AS total
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
),
seg AS (
  SELECT *, avg(total) OVER (PARTITION BY c_mktsegment) AS seg_avg FROM spend
)
SELECT c_mktsegment, count(*) AS n_big_spenders,
       round(sum(total), 2) AS total_spend
FROM seg WHERE total > 1.5 * seg_avg
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)
def big_spenders_vs_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-vs-group-average comparison (decorrelated-subquery shape)
    via a partition window over the aggregate."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    seg = spend.withColumn(
        "seg_avg", F.avg("total").over(Window.partitionBy("c_mktsegment"))
    )
    return (
        seg.filter(F.col("total") > 1.5 * F.col("seg_avg"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_big_spenders"),
            F.round(F.sum("total"), 2).alias("total_spend"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "asof_last_event_before_order",
    oracle="""
WITH tagged AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
         e.ts AS ev_ts, e.event_type
  FROM orders o
  LEFT JOIN events e
    ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
            ORDER BY ev_ts DESC NULLS LAST) AS rn
  FROM tagged
)
SELECT coalesce(event_type, 'none') AS last_event_type,
       count(*) AS n_orders
FROM ranked WHERE rn = 1
GROUP BY 1 ORDER BY 1
""",
)
def asof_last_event_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (orders ← most recent prior event per user),
    via the union-tag + last(ignorenulls) window algorithm — one shuffle,
    no range-join explosion (operators/windows.py::asof_join_backward).
    The oracle states the same semantics as a naive range join + argmax."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    joined = W.asof_join_backward(
        orders, events, on="user_id", left_ts="o_orderdate", right_ts="ts",
        right_cols=["event_type"],
    )
    return (
        joined.select(
            F.coalesce("asof_event_type", F.lit("none")).alias("last_event_type")
        )
        .groupBy("last_event_type")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("last_event_type")
    )


@query(
    "gap_filled_hourly_events",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
),
actual AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
         round(sum(value), 2) AS total_value
  FROM events GROUP BY 1
)
SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(a.n, 0) AS n,
       coalesce(a.total_value, 0.0) AS total_value
FROM spine s LEFT JOIN actual a ON a.hour = s.hour
ORDER BY 1
""",
)
def gap_filled_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style zero-filled hourly rollup (sequence spine)."""
    ev = load_table(spark, sf_dir, "events")
    out = W.gap_filled_hourly_counts(ev, "ts", "value")
    return out.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n",
        "total_value",
    ).orderBy("hour")


@query(
    "segment_spend_regression_slope",
    oracle="""
WITH feats AS (
  SELECT c.c_mktsegment, o.o_totalprice,
         (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       count(*) AS n,
       round(covar_samp(n_items, o_totalprice) / var_samp(n_items), 4) AS slope,
       round(avg(o_totalprice) - covar_samp(n_items, o_totalprice) / var_samp(n_items)
             * avg(n_items), 4) AS intercept
FROM feats GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)
def segment_spend_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped modeling without Python: per-segment simple-OLS slope of
    order value on item count via covariance identities (slope =
    cov(x,y)/var(x)) — the native alternative to a per-group pandas fit;
    one aggregation pass."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    feats = (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey, "left")
        .withColumn("n_items", F.coalesce("n_items", F.lit(0)))
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    slope = F.covar_samp("n_items", "o_totalprice") / F.var_samp("n_items")
    return (
        feats.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(slope, 4).alias("slope"),
            F.round(
                F.avg("o_totalprice") - slope * F.avg("n_items"), 4
            ).alias("intercept"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "user_value_moving_avg",
    oracle="""
WITH w AS (
  SELECT user_id, event_id, value,
         avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma5
  FROM events
)
SELECT user_id,
       round(avg(ma5), 6) AS avg_ma5,
       round(max(ma5), 6) AS max_ma5,
       count(*) AS n
FROM w GROUP BY user_id ORDER BY user_id
""",
)
def user_value_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded rolling frame (5-row moving average per user) — the
    bounded-state window shape (contrast with running_total's unbounded
    frame); summarized per user for a stable result set."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    ma = ev.withColumn("ma5", F.avg("value").over(w))
    return (
        ma.groupBy("user_id")
        .agg(
            F.round(F.avg("ma5"), 6).alias("avg_ma5"),
            F.round(F.max("ma5"), 6).alias("max_ma5"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


@query(
    "event_rank_and_share_per_user",
    oracle="""
WITH t AS (
  SELECT user_id, event_type, count(*) AS n, sum(value) AS v
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT *,
         rank() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rnk,
         v / sum(v) OVER (PARTITION BY user_id) AS share
  FROM t
)
SELECT user_id, event_type, n, round(share, 6) AS share
FROM r WHERE rnk = 1 ORDER BY user_id
""",
)
def event_rank_and_share_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + windowed share-of-total per user; keeps each user's most
    frequent event type."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )
    wu = Window.partitionBy("user_id")
    r = t.withColumn(
        "rnk", F.rank().over(wu.orderBy(F.desc("n"), F.asc("event_type")))
    ).withColumn("share", F.col("v") / F.sum("v").over(wu))
    return (
        r.filter(F.col("rnk") == 1)
        .select("user_id", "event_type", "n", F.round("share", 6).alias("share"))
        .orderBy("user_id")
    )


@query(
    "order_priority_islands",
    oracle="""
WITH seq AS (
  SELECT o_custkey, o_orderpriority,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         row_number() OVER (PARTITION BY o_custkey, o_orderpriority
                            ORDER BY o_orderdate, o_orderkey) AS rn_pri
  FROM orders
),
islands AS (
  SELECT o_custkey, o_orderpriority, rn - rn_pri AS grp, count(*) AS run_len
  FROM seq GROUP BY o_custkey, o_orderpriority, rn - rn_pri
)
SELECT o_custkey AS custkey,
       count(*) AS n_runs,
       max(run_len) AS longest_run,
       round(avg(run_len), 4) AS avg_run_len
FROM islands GROUP BY o_custkey ORDER BY custkey
""",
)
def order_priority_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (SCD2-style change collapsing): collapse each
    customer's order sequence into runs of identical o_orderpriority via
    the two-row_number difference trick, then summarize run structure
    per customer.

    Scale: both row_numbers share the same partition key (o_custkey), so
    Catalyst plans ONE shuffle + one in-partition sort — the island
    group id is computed without a second exchange; the run/summary
    aggregations are partial-aggregated map-side on the same
    partitioning. The classic driver-side "iterate and compare previous
    row" is what this replaces."""
    orders = load_table(spark, sf_dir, "orders")
    w_all = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_pri = Window.partitionBy("o_custkey", "o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        "o_orderpriority",
        (F.row_number().over(w_all) - F.row_number().over(w_pri)).alias("grp"),
    )
    islands = seq.groupBy("o_custkey", "o_orderpriority", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        islands.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("longest_run"),
            F.round(F.avg("run_len"), 4).alias("avg_run_len"),
        )
        .orderBy("custkey")
    )


@query(
    "customer_peak_week_spend",
    oracle="""
WITH t AS (
  SELECT o_custkey,
         sum(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate::DATE)
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
         ) AS trail_spend
  FROM orders
)
SELECT o_custkey AS custkey,
       round(max(trail_spend), 2) AS peak_7day_spend
FROM t GROUP BY o_custkey ORDER BY custkey
""",
)
def customer_peak_week_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (vs the ROWS frames elsewhere): trailing
    7-DAY revenue per customer ordered by day number — RANGE pools
    same-day orders and spans VALUE distance, not row count, which a
    rows-frame cannot express when order days are irregular. Result:
    each customer's peak trailing week.

    Scale: one shuffle on custkey serves both the window and the max
    aggregation (same partitioning); the day-number order key keeps the
    frame bound integer arithmetic, no interval comparison per row."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey", F.sum("o_totalprice").over(w).alias("trailing")
        )
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.round(F.max("trailing"), 2).alias("peak_7day_spend"))
        .orderBy("custkey")
    )


@query(
    "customer_rfm_segments",
    oracle="""
WITH m AS (
  SELECT o_custkey AS c_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS n_orders,
         sum(o_totalprice) AS monetary
  FROM orders GROUP BY 1
),
t AS (
  SELECT c_custkey,
         ntile(4) OVER (ORDER BY last_order, c_custkey) AS r_tile,
         ntile(4) OVER (ORDER BY n_orders, c_custkey) AS f_tile,
         ntile(4) OVER (ORDER BY monetary, c_custkey) AS m_tile
  FROM m
)
SELECT r_tile::BIGINT AS r_tile, f_tile::BIGINT AS f_tile,
       m_tile::BIGINT AS m_tile, count(*) AS n_customers
FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency/frequency/monetary quartiles), the
    classic customer-scoring rollup — and the production consumer of
    :func:`range_partitioned_ntile`: all three quartile assignments run
    as range-partitioned two-pass ranks, no single-task global sort
    anywhere (the oracle states the same semantics with plain ntile).
    Each ordering carries the custkey tiebreak, so tile boundaries are
    engine-deterministic even on tied metrics.

    Scale: one shuffle to the per-customer aggregate, then three range
    exchanges over customer-cardinality rows; the segment rollup is ≤64
    rows."""
    from ..operators.windows import range_partitioned_ntile

    orders = load_table(spark, sf_dir, "orders")
    # r11 note: pinning this customer-grain aggregate (so the three
    # ntiles share one evaluation) was tried and measured SLOWER at
    # sf0.1 (interleaved A/B: 2.1s → 4.3-6.5s warm) — the cache
    # write + in-memory-relation re-scan under three range-sampling
    # exchanges costs more than the three cheap fact passes it saves
    # at this scale. Left unpinned; at 100 TB the groupBy output is
    # customer-cardinality and the pin becomes the right call.
    m = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("monetary"),
    )
    # three INDEPENDENT tile assignments joined on the customer key —
    # chaining them (ntile over ntile's output) re-executes each prior
    # level through the next level's rank/total branches (~2× per level,
    # measured 3.4s → the chained form's plan is the expensive part, not
    # the data); the independent form keeps every branch two scans deep
    t = m.select("c_custkey")
    for metric, out in (
        ("last_order", "r_tile"),
        ("n_orders", "f_tile"),
        ("monetary", "m_tile"),
    ):
        tiles = range_partitioned_ntile(
            m.select(metric, "c_custkey"), [metric, "c_custkey"], 4
        ).select("c_custkey", F.col("tile").alias(out))
        t = t.join(tiles, "c_custkey")
    return (
        t.groupBy("r_tile", "f_tile", "m_tile")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_tile", "f_tile", "m_tile")
    )


@query(
    "user_value_ewma",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT user_id, day, v,
         max(day) OVER (PARTITION BY user_id) AS dmax
  FROM daily
)
SELECT user_id,
       strftime(dmax, '%Y-%m-%d') AS last_day,
       round(sum(v * power(2.0, -date_diff('day', day, dmax))), 4) AS ewma_value
FROM m GROUP BY 1, 2 ORDER BY user_id
""",
)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's daily spend
    (half-life = 1 day): the time-decayed engagement score streaming
    feature stores keep per entity. Computed in closed form — decay
    weight 2^(day − last_day) folded into ONE aggregation over the
    per-(user, day) rollup — instead of an ordered recursive scan, so
    there is no sequential dependency to serialize: two hash
    aggregations and one bounded per-user window (≤ |days| rows each).
    Engine parity: 2^(−k) is exactly representable for the k ≤ 30 day
    gaps here, so both engines compute identical weights; the 4 dp
    round buries summation-order noise."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum("value").alias("v"))
    w = Window.partitionBy("user_id")
    m = daily.withColumn("dmax", F.max("day").over(w))
    return (
        m.groupBy("user_id", F.date_format("dmax", "yyyy-MM-dd").alias("last_day"))
        .agg(
            F.round(
                F.sum(
                    F.col("v")
                    * F.pow(F.lit(2.0), -F.datediff(F.col("dmax"), F.col("day")))
                ),
                4,
            ).alias("ewma_value")
        )
        .orderBy("user_id")
    )

"""Multi-join analytical queries (TPC-H Q3/Q7/Q16 shapes) on the driver
corpus — the engine's big-join breadth beyond the reference's single-table
workload (the reference joins nothing larger than its 205-row frame;
these exercise the fact-fact and fact-dim-dim join planner paths a
100 TB deployment lives on).

Scale notes per query are inline. Shared conventions: dimension tables
(region/nation, and part/supplier at our star-schema ratios) broadcast;
fact-fact joins (orders⋈lineitem) shuffle on the join key and are
AQE-planned; dates are compared as timestamps and emitted as formatted
strings so the driver's value hash is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table


@query(
    "top_unshipped_orders",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, order_date, l_orderkey
LIMIT 10
""",
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ orders ⋈ lineitem,
    revenue of items not yet shipped at the cutoff, top 10 orders.

    Scale: both date filters and the segment filter push to the parquet
    scans (verified in test_plans); customer⋈orders shuffles on custkey,
    orders⋈lineitem on orderkey — at TPC-H ratios the segment-filtered
    customer side is 1/5 of customers and NOT broadcastable at 100 TB,
    so no broadcast hint: AQE picks broadcast when the filtered side
    fits, shuffle join when it doesn't. Top-10 is a TakeOrdered, not a
    global sort."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "order_date", "l_orderkey")
        .limit(10)
    )


@query(
    "nation_trade_flows",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l_shipdate) AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                     AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
""",
)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border revenue between two nations by ship
    year — the 6-table join path (fact ⋈ fact ⋈ dim ⋈ dim ⋈ dim ⋈ dim).

    Scale: nation (25 rows) broadcasts twice; supplier and the
    nation-filtered customer broadcast at our ratios (hinted — they are
    1/25th slices of already-small dims; at 100 TB supplier/customer
    slices still fit the 8GB broadcast cap until ~SF30k). The only big
    shuffle is lineitem⋈orders on orderkey, with the shipdate range
    pushed to the lineitem scan."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-12-31 00:00:00").cast("timestamp")
    nations = ("NATION_1", "NATION_2")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .filter(F.col("n_name").isin(*nations))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .filter(F.col("n_name").isin(*nations))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").between(lo, hi))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@query(
    "brand_supplier_variety",
    oracle="""
SELECT p_brand, p_type,
       count(DISTINCT l_suppkey) AS supplier_cnt,
       count(*) AS n_items
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 2, 3, 4, 5)
GROUP BY p_brand, p_type
HAVING count(DISTINCT l_suppkey) >= 2
ORDER BY supplier_cnt DESC, p_brand, p_type
""",
)
def brand_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers stock each surviving
    (brand, type) combination — NOT-filter + IN-filter + exact
    countDistinct + HAVING.

    Scale: part is the broadcast side of the fact join (dim⋈fact);
    exact countDistinct expands to a two-phase aggregate (partial
    distinct on (group, suppkey), then count) — Spark plans this
    without a driver-side distinct; HAVING is a post-agg filter."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 2, 3, 4, 5)
        )
        .select("p_partkey", "p_brand", "p_type")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("supplier_cnt") >= 2)
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@query(
    "grouping_sets_revenue",
    oracle="""
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       coalesce(year(o_orderdate)::VARCHAR, 'ALL') AS order_year,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (r_name, n_name), (year(o_orderdate)))
ORDER BY region, nation, order_year
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize: three
    explicitly-chosen aggregation granularities ((region), (region,
    nation), (year)) in ONE pass over the joined fact.

    Scale: Catalyst expands grouping sets into a single Expand + hash
    aggregate (rows duplicated once per set they participate in, partial
    aggregation map-side) — one shuffle, not one job per granularity;
    both dims broadcast onto orders."""
    from ..sql import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       coalesce(CAST(year(o_orderdate) AS STRING), 'ALL') AS order_year,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (r_name, n_name), (year(o_orderdate)))
ORDER BY region, nation, order_year
"""
    )


@query(
    "lineitem_unpivot_measure_stats",
    oracle="""
SELECT l_returnflag, measure,
       round(avg(value), 6) AS avg_value,
       round(sum(value), 2) AS total_value,
       count(*) AS n
FROM (
  UNPIVOT (SELECT l_returnflag,
                  l_quantity::DOUBLE AS quantity,
                  l_extendedprice::DOUBLE AS extendedprice,
                  l_discount::DOUBLE AS discount
           FROM lineitem)
  ON quantity, extendedprice, discount
  INTO NAME measure VALUE value
)
WHERE value IS NOT NULL
GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure
""",
)
def lineitem_unpivot_measure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (R pivot_longer dual of the engine's pivot): three
    measure columns become (measure, value) rows, then per (flag,
    measure) stats.

    Scale: unpivot is a zero-shuffle Expand (3× row growth, narrow) —
    the agg that follows is the only shuffle; never a per-column loop
    of jobs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    # Spark's unpivot RETAINS null measure values where DuckDB's UNPIVOT
    # excludes them by default — filter explicitly so both engines agree
    # the moment a null measure appears (oracle carries the same WHERE)
    melted = li.unpivot(
        ["l_returnflag"], ["quantity", "extendedprice", "discount"], "measure", "value"
    ).filter(F.col("value").isNotNull())
    return (
        melted.groupBy("l_returnflag", "measure")
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "measure")
    )


@query(
    "customer_order_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT n_orders, count(*) AS n_customers
FROM per_cust
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation — orders per customer
    INCLUDING zero-order customers (left join, count of the nullable
    side), then the distribution of those counts.

    Scale: count(o_orderkey) skips nulls natively so no fill-step; the
    first agg shuffles on custkey, the second on the (tiny-domain)
    count value — AQE coalesces the second shuffle's partitions."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@query(
    "small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT count(*) AS n_items,
       round(sum(l_extendedprice) / 7.0, 2) AS avg_weekly_loss
FROM lineitem JOIN part_avg ON l_partkey = pk
WHERE l_quantity < threshold
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (items below half
    their part's average quantity), decorrelated as agg + equi-join —
    the rewrite Catalyst itself applies to correlated subqueries.

    Scale: both sides scan the same lineitem; the per-part average is
    grouped on the join key, so AQE plans agg + join in one shuffle
    partitioning of l_partkey (no second exchange), never a per-row
    subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly_loss"),
        )
    )


@query(
    "regional_same_nation_revenue",
    oracle="""
SELECT n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY nation
""",
)
def regional_same_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation within one region where the
    supplier and the ordering customer share a nation (local-supplier
    volume) — the join graph with a NON-key equality (c_nationkey =
    s_nationkey) layered on the key path.

    Scale: region→nation prunes to the region's nations and broadcasts;
    supplier broadcasts at star-schema ratios; the same-nation predicate
    rides the supplier join (no extra shuffle). The only big exchanges
    are customer⋈orders (custkey) and orders⋈lineitem (orderkey) — AQE
    re-plans the filtered sides."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat_in_region = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat_in_region),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation")
    )


@query(
    "top_returned_customers",
    oracle="""
WITH ret AS (
  SELECT c_custkey, c_name, n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_returned_items
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, n_name AS nation, revenue, n_returned_items
FROM ret
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def top_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers losing the most revenue to
    returned items (returnflag = 'R'), with their nation.

    Scale: the returnflag filter pushes to the lineitem scan; nation
    broadcasts; customer⋈orders and orders⋈lineitem shuffle on their
    keys. The top-20 runs as TakeOrdered on the per-customer aggregate
    (customer-cardinality input, never the fact table). Ordering is on
    the ROUNDED revenue with a custkey tiebreak so the cross-engine cut
    is deterministic at the boundary."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "nation", "revenue", "n_returned_items")
    )


@query(
    "orders_monthly_yoy",
    oracle="""
WITH m AS (
  SELECT year(o_orderdate)::BIGINT AS yr, month(o_orderdate)::BIGINT AS mo,
         sum(o_totalprice) AS revenue, count(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT yr, mo, round(revenue, 2) AS revenue, n_orders,
       round(revenue / lag(revenue) OVER (PARTITION BY mo ORDER BY yr), 6)
         AS yoy_ratio
FROM m ORDER BY yr, mo
""",
)
def orders_monthly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-same-month-last-year revenue ratio: calendar rollup +
    a lag window PARTITIONED BY month-of-year (12 bounded partitions of
    |years| rows each — the windowed input is the month×year aggregate,
    never the fact table).

    Scale: one shuffle to the (yr, mo) aggregate (map-side partial),
    then the lag window over ≤ years×12 rows."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(
        F.sum("o_totalprice").alias("rev_raw"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.partitionBy("mo").orderBy("yr")
    return (
        m.withColumn("prev", F.lag("rev_raw").over(w))
        .select(
            "yr",
            "mo",
            F.round("rev_raw", 2).alias("revenue"),
            "n_orders",
            F.round(F.col("rev_raw") / F.col("prev"), 6).alias("yoy_ratio"),
        )
        .orderBy("yr", "mo")
    )


@query(
    "hll_distinct_check",
    oracle="""
SELECT count(DISTINCT l_partkey)::BIGINT AS exact_distinct_parts,
       count(DISTINCT l_suppkey)::BIGINT AS exact_distinct_suppliers,
       true AS parts_approx_within_8pct,
       true AS suppliers_approx_within_8pct
FROM lineitem
""",
)
def hll_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch gate for approximate distinct counting: Spark's
    HyperLogLog++ (``approx_count_distinct``, rsd=0.02 — 4x fewer
    registers than 0.01 for a measured 4x cheaper pass) must land within
    8% (4 sigma at rsd 0.02 — the estimate is deterministic per dataset,
    but a new scale factor or data refresh re-rolls it; 5% was only 2.5
    sigma) of the exact distinct count, asserted IN the result so the
    driver hash fails if the sketch ever drifts — exact counts ride along.
    (The oracle can't reproduce Spark's HLL registers; it states the
    exact counts and the expected-true gates. HLL merge is commutative,
    so the approx value is partitioning-independent and deterministic.)

    Scale: this is the operator you reach for FIRST at 100 TB — one
    map-side sketch per partition, constant memory, no shuffle of keys;
    the exact count here is the audit, not the product."""
    li = load_table(spark, sf_dir, "lineitem")
    # one agg per (column, kind), crossJoined (all are 1-row). Two
    # distinct columns in ONE agg would plan as an Expand that
    # triplicates every fact row; and MIXING count_distinct with
    # approx_count_distinct in one agg forfeits the specialized
    # single-distinct two-phase rewrite (measured 3.1s vs 0.6s + 1.3s
    # split at sf0.1 — the combined plan funnels every row through the
    # distinct path twice). Separate aggs keep the exact count on the
    # partial-distinct rewrite and the HLL on its cheap map-side pass,
    # and each scan prunes to its one column.
    parts = li.agg(
        F.count_distinct(F.col("l_partkey")).alias("exact_distinct_parts")
    ).crossJoin(
        li.agg(F.approx_count_distinct("l_partkey", 0.02).alias("_ap"))
    )
    supps = li.agg(
        F.count_distinct(F.col("l_suppkey")).alias("exact_distinct_suppliers")
    ).crossJoin(
        li.agg(F.approx_count_distinct("l_suppkey", 0.02).alias("_as"))
    )
    within = lambda approx, exact: (  # noqa: E731
        F.abs(approx - exact) <= 0.08 * exact
    )
    return parts.crossJoin(supps).select(
        "exact_distinct_parts",
        "exact_distinct_suppliers",
        within(F.col("_ap"), F.col("exact_distinct_parts")).alias(
            "parts_approx_within_8pct"
        ),
        within(F.col("_as"), F.col("exact_distinct_suppliers")).alias(
            "suppliers_approx_within_8pct"
        ),
    )


@query(
    "approx_quantile_check",
    oracle="""
SELECT round(quantile_cont(o_totalprice, 0.5), 2) AS exact_median,
       round(quantile_cont(o_totalprice, 0.95), 2) AS exact_p95,
       true AS median_approx_within_1pct,
       true AS p95_approx_within_1pct
FROM orders
""",
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch gate for approximate quantiles: ``percentile_approx``
    (Greenwald-Khanna, accuracy 10000) must land within 1% of the exact
    type-7 percentile, asserted in-result like hll_distinct_check. The
    exact median/p95 are the audit values the oracle reproduces with
    ``quantile_cont``.

    Scale: GK sketches merge associatively — single pass, bounded
    memory, no sort; the exact percentile is the verification path."""
    orders = load_table(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, array(0.5, 0.95))")
    approx = F.expr("percentile_approx(o_totalprice, array(0.5, 0.95), 10000)")
    a = orders.agg(exact.alias("ex"), approx.alias("ap"))
    within = lambda i: (  # noqa: E731
        F.abs(F.col("ap")[i] - F.col("ex")[i]) <= 0.01 * F.col("ex")[i]
    )
    return a.select(
        F.round(F.col("ex")[0], 2).alias("exact_median"),
        F.round(F.col("ex")[1], 2).alias("exact_p95"),
        within(0).alias("median_approx_within_1pct"),
        within(1).alias("p95_approx_within_1pct"),
    )


@query(
    "ship_lag_quantiles_by_priority",
    oracle="""
WITH lag AS (
  SELECT o_orderpriority,
         date_diff('day', o_orderdate, l_shipdate) AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
       count(*) AS n_items,
       round(quantile_cont(lag_days, 0.25), 4) AS p25,
       round(quantile_cont(lag_days, 0.50), 4) AS p50,
       round(quantile_cont(lag_days, 0.75), 4) AS p75,
       round(quantile_cont(lag_days, 0.95), 4) AS p95
FROM lag GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def ship_lag_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment lag (days) with exact per-priority
    quantiles — date arithmetic on the fact-fact join plus the exact
    type-7 percentile reduction (interpolation arithmetic is exact on
    integer day counts, so 4dp rounding is engine-stable).

    Scale: orders⋈lineitem shuffles on orderkey; exact percentile
    aggregates per group (5 groups) — at 100 TB swap in the GK sketch
    gate (approx_quantile_check) if the per-group sort memory bites."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lag_days"),
    )
    q = F.expr("percentile(lag_days, array(0.25, 0.5, 0.75, 0.95))")
    a = lag.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"), q.alias("q")
    )
    return a.select(
        "o_orderpriority",
        "n_items",
        F.round(F.col("q")[0], 4).alias("p25"),
        F.round(F.col("q")[1], 4).alias("p50"),
        F.round(F.col("q")[2], 4).alias("p75"),
        F.round(F.col("q")[3], 4).alias("p95"),
    ).orderBy("o_orderpriority")


@query(
    "parts_unsold_recent",
    oracle="""
SELECT p_brand,
       count(*) AS n_unsold,
       round(sum(round(p_retailprice * 100)::BIGINT) / (100.0 * count(*)), 4)
         AS avg_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey
    AND l.l_shipdate > TIMESTAMP '2001-01-01 00:00:00'
)
GROUP BY p_brand ORDER BY p_brand
""",
)
def parts_unsold_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-stock report: parts with NO shipment after the cutoff, by
    brand — NOT EXISTS as a LEFT ANTI join (the decorrelated form
    Catalyst rewrites to), on a predicate that actually leaves a
    non-empty complement in this corpus (suppliers all ship monthly;
    parts do not).

    Scale: the shipdate filter pushes to the lineitem scan, the anti
    join probes only the filtered side's distinct partkeys, and AQE
    broadcasts that side when it fits."""
    cutoff = F.lit("2001-01-01 00:00:00").cast("timestamp")
    part = load_table(spark, sf_dir, "part")
    sold = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_partkey")
    )
    return (
        part.join(sold, part.p_partkey == sold.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_unsold"),
            # exact-cents average: prices are 2-dp currency, so summing
            # round(p*100) longs is EXACT in any order — a plain avg()
            # of doubles reassociates and flipped a 4-dp half-boundary
            # cell against the oracle at sf0.1
            F.round(
                F.sum(F.round(F.col("p_retailprice") * 100).cast("long"))
                / (100.0 * F.count(F.lit(1))),
                4,
            ).alias("avg_retailprice"),
        )
        .orderBy("p_brand")
    )


@query(
    "revenue_share_within_region",
    oracle="""
WITH nr AS (
  SELECT r_name, n_name,
         sum(o_totalprice) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       round(rev, 2) AS revenue,
       round(rev / sum(rev) OVER (PARTITION BY r_name), 6) AS region_share
FROM nr ORDER BY r_name, n_name
""",
)
def revenue_share_within_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent rollup: nation revenue and its share of the
    region total — the window-over-aggregate share pattern (no second
    scan, no join back of totals).

    Scale: dims broadcast onto orders, one shuffle to the 25-row
    (region, nation) grain; the share window runs on that grain."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    dim = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")
    nr = (
        orders.join(F.broadcast(cust.join(F.broadcast(dim), cust.c_nationkey == dim.n_nationkey)),
                    F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy("r_name")
    return nr.select(
        "r_name",
        "n_name",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("region_share"),
    ).orderBy("r_name", "n_name")


@query(
    "part_type_brand_rank",
    oracle="""
WITH tb AS (
  SELECT p_type, p_brand,
         round(sum(l_extendedprice), 2) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, p_brand
),
r AS (
  SELECT p_type, p_brand, revenue,
         (dense_rank() OVER (PARTITION BY p_type
              ORDER BY revenue DESC, p_brand))::BIGINT AS brand_rank
  FROM tb
)
SELECT p_type, p_brand, revenue, brand_rank
FROM r WHERE brand_rank <= 3
ORDER BY p_type, brand_rank, p_brand
""",
)
def part_type_brand_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 brands by revenue within each part type — dense_rank over
    the (type, brand) aggregate, ranked on the ROUNDED revenue with a
    brand tiebreak so the cut is engine-deterministic.

    Scale: part broadcasts onto lineitem; the rank window partitions by
    p_type over the |types|×|brands| aggregate, never the fact table."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    tb = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("p_type").orderBy(F.desc("revenue"), "p_brand")
    return (
        tb.withColumn("brand_rank", F.dense_rank().over(w).cast("long"))
        .filter(F.col("brand_rank") <= 3)
        .orderBy("p_type", "brand_rank", "p_brand")
    )


@query(
    "brand_name_edit_distances",
    oracle="""
WITH b AS (SELECT DISTINCT p_brand FROM part)
SELECT a.p_brand AS brand_a, c.p_brand AS brand_b,
       levenshtein(a.p_brand, c.p_brand)::BIGINT AS edit_distance
FROM b a JOIN b c ON a.p_brand < c.p_brand
WHERE levenshtein(a.p_brand, c.p_brand) <= 2
ORDER BY brand_a, brand_b
""",
)
def brand_name_edit_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-hygiene fuzzy matching: brand-name pairs within
    Levenshtein distance 2 (typo/variant candidates) over the DISTINCT
    brand domain — the entity-resolution primitive for dimension
    cleanup.

    Scale: the distinct reduces to the brand domain (dozens) BEFORE the
    quadratic self-join, so the edit-distance compute is
    |brands|²-bounded regardless of fact size; at genuinely large
    domains swap in banded q-gram blocking first (same candidate→verify
    shape as the dedup family)."""
    b = load_table(spark, sf_dir, "part").select("p_brand").distinct()
    a = b.select(F.col("p_brand").alias("brand_a"))
    c = b.select(F.col("p_brand").alias("brand_b"))
    dist = F.levenshtein(F.col("brand_a"), F.col("brand_b"))
    return (
        a.join(c, F.col("brand_a") < F.col("brand_b"))
        .filter(dist <= 2)
        .select(
            "brand_a", "brand_b", dist.cast("long").alias("edit_distance")
        )
        .orderBy("brand_a", "brand_b")
    )


@query(
    "large_volume_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       round(b.total_qty, 2) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
""",
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-over-grouped-HAVING subquery runs as an
    aggregate-then-join — the fact table reduces to qualifying order
    keys BEFORE touching orders/customer, so the expensive join sees
    only the ~5% surviving rows. Top-100 via TakeOrdered (no global
    sort); deterministic orderkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "late_supplier_blame",
    oracle="""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1, 2
),
agg AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
  FROM l GROUP BY 1
)
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM l
JOIN agg USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE l.late = 1 AND agg.n_supp >= 2 AND agg.n_late = 1
GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
""",
)
def late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-blame late supplier): the classic
    EXISTS(other supplier) AND NOT EXISTS(other LATE supplier)
    correlated pair, decorrelated into per-(order, supplier) lateness
    plus per-order supplier/lateness counts computed as WINDOW
    aggregates over the l_orderkey partition — one extra exchange on
    the already-reduced per-supplier rows, no second aggregation and no
    join-back (the naive correlated form re-scans lineitem per outer
    row). Late = shipped >60 days after the order date (this schema
    carries no commit/receipt dates)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60), 1
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter(
            (F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "idle_rich_customers_by_code",
    oracle="""
WITH avg_bal AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
SELECT right(c.c_name, 1) AS code,
       count(*)::BIGINT AS n_custs,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1 ORDER BY 1
""",
)
def idle_rich_customers_by_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (above-average balances, gone idle, grouped by a
    derived code): the scalar AVG subquery broadcasts as a 1-row
    crossJoin (no recompute per row), the NOT EXISTS runs as a left-anti
    join against the distinct RECENT-order custkeys (every customer has
    some order in this corpus, so "never ordered" would be vacuous —
    idle means no order since 2000-01-01, a date filter that pushes to
    the orders scan before the distinct), and the name-suffix code
    stands in for Q22's phone country code (this schema has no phone
    column)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_a")
    )
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_a"))
        .join(
            orders.filter(F.col("o_orderdate") >= cutoff)
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct(),
            "c_custkey",
            "left_anti",
        )
        .groupBy(F.expr("right(c_name, 1)").alias("code"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("code")
    )


@query(
    "priority_late_order_counts",
    oracle="""
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
GROUP BY 1 ORDER BY 1
""",
)
def priority_late_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late line, counted per
    priority — a correlated EXISTS whose predicate spans BOTH tables
    (l_shipdate vs o_orderdate), planned as a left-semi join carrying
    the non-equi condition alongside the orderkey equality. The semi
    join deduplicates multi-late orders inside the join (no distinct
    pass), and the equality key still drives the shuffle partitioning,
    so the non-equi part never becomes a cartesian."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_orders = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30)),
        "leftsemi",
    )
    return (
        late_orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "forecast_revenue_change",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""",
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure-scan aggregate — every predicate (date
    range, discount band, quantity cap) pushes to the parquet scan, no
    join, no shuffle beyond the 1-row final agg. At 100 TB this is the
    query whose cost is entirely I/O: row-group min/max stats skip
    whole chunks on the shipdate range before a single row decodes."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return li.filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "nation_market_share",
    oracle="""
WITH flows AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
SELECT o_year::BIGINT AS o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM flows GROUP BY 1 ORDER BY 1
""",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's import volume by
    order year — a 7-table join whose answer is a ratio of conditional
    sums (the numerator predicate rides the agg, NOT the join: filtering
    supp_nation early would break the denominator). Region-filtered
    customers and all dims broadcast; the orderkey shuffle is the only
    big exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = load_table(spark, sf_dir, "region")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("_snk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "part_value_concentration",
    oracle="""
WITH pv AS (
  SELECT l_partkey, sum(l_extendedprice) AS val FROM lineitem GROUP BY 1
),
tot AS (SELECT avg(val) AS t FROM pv)
SELECT l_partkey, round(val, 2) AS part_value
FROM pv, tot
WHERE val > 1.5 * t
ORDER BY part_value DESC, l_partkey
""",
)
def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a threshold
    derived from a scalar subquery over the SAME aggregate — here 1.5×
    the mean per-part value (Q11's fixed global fraction goes vacuous as
    the part count grows; a mean multiple is scale-free). The scalar
    derives from the per-part aggregate (one extra 1-row agg on |parts|
    rows, broadcast back), never a second fact-table pass."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("val"))
    tot = pv.agg(F.avg("val").alias("_t"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("val") > 1.5 * F.col("_t"))
        .select("l_partkey", F.round("val", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@query(
    "late_line_priority_mix",
    oracle="""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY 1 ORDER BY 1
""",
)
def late_line_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: among badly-late lines (>90 days after order),
    how many belong to high- vs low-priority orders, per return flag —
    the CASE-conditional double count over a fact-fact join with a
    cross-table predicate (shipdate vs orderdate survives only the
    join, not the scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "promo_revenue_share",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of one month's revenue — the
    conditional-numerator/total-denominator ratio over a dim join, with
    the month range pushed to the fact scan and part broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "top_quarter_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
""",
)
def top_quarter_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) hitting the quarter's maximum
    revenue — grouped agg, scalar MAX over it, equality join back (the
    view + subquery form). The max broadcasts as a 1-row crossJoin;
    comparing ROUNDED revenues on both engines keeps the equality
    engine-portable. Emits all tied suppliers (per spec), ordered by
    key."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    rev = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "bracketed_discount_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def bracketed_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of per-bracket conjunctions
    spanning BOTH join sides — the predicate that defeats naive
    pushdown. The per-table halves still prune (brand/size terms reach
    the part scan, the quantity envelope reaches lineitem via OR-
    factoring); the residual mixed OR evaluates on the joined rows.
    Part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bracket = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            bracket("Brand#11", 5, 1, 11)
            | bracket("Brand#12", 10, 10, 20)
            | bracket("Brand#13", 15, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "min_cost_supplier_per_part",
    oracle="""
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
),
costs AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem JOIN eu ON s_suppkey = l_suppkey
  WHERE l_quantity > 0
  GROUP BY 1, 2
),
best AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_cost, l_suppkey) AS rn
  FROM costs
)
SELECT p.p_partkey, p.p_name, e.s_name, e.n_name,
       round(e.s_acctbal, 2) AS acctbal,
       round(b.unit_cost, 2) AS unit_cost
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey
JOIN eu e ON e.s_suppkey = b.l_suppkey
WHERE b.rn = 1 AND p.p_type = 'PROMO'
ORDER BY acctbal DESC, p.p_partkey
LIMIT 20
""",
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part within a region; this
    schema has no partsupp, so observed unit price l_extendedprice /
    l_quantity over each part's shipped lines stands in for ps_supplycost).
    The classic correlated `= (SELECT min(...))` subquery decorrelates
    into a per-(part, supplier) aggregate plus an argmin row_number
    window PARTITIONED BY part key — high-cardinality partitions, fully
    parallel, no global sort; the regional supplier roster and the part
    dimension broadcast. Tie on raw (pre-rounding) unit cost breaks by
    supplier key on both engines, so the argmin row is deterministic.

    Scale: one shuffle on (l_partkey, l_suppkey) for the aggregate, the
    window reuses the l_partkey clustering; top-20 via TakeOrdered.
    Reference scope: single-frame workload (BigDataProject.R) — this is
    engine-breadth beyond it."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        li.filter(F.col("l_quantity") > 0)
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_cost"), F.asc("l_suppkey")
    )
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey", "p_name")
    return (
        costs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round("unit_cost", 2).alias("unit_cost"),
        )
        .orderBy(F.desc("acctbal"), F.asc("p_partkey"))
        .limit(20)
    )


@query(
    "nation_year_profit",
    oracle="""
SELECT n_name, year(l_shipdate)::BIGINT AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 2) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
""",
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit by supplier nation x ship
    year; no partsupp here, so cost is proxied as 60% of p_retailprice
    per unit). The name filter prunes the part dimension BEFORE the
    fact join — the lineitem side then shrinks via the broadcast-hash
    join on the filtered part keys rather than scanning all parts'
    lines into the aggregate. Supplier and nation broadcast; one
    shuffle total, on the (n_name, ship_year) aggregate keys.

    Group sums are ~1e7-1e9 doubles at bench scale — far inside the
    2-decimal rounding quantum's safety margin vs reassociation noise
    (the ANOVA 1e14 lesson: round only magnitude-safe sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit")
        )
        .orderBy(F.asc("n_name"), F.desc("ship_year"))
    )


@query(
    "bulk_part_suppliers",
    oracle="""
WITH red_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
bulk AS (
  SELECT l_suppkey
  FROM lineitem JOIN red_parts ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50
)
SELECT DISTINCT s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM bulk)
ORDER BY s_name
""",
)
def bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with bulk capacity in a part family
    and window: the nested IN(SELECT ... HAVING agg) chain). Runs
    inside-out with no correlated re-execution: the name-filtered part
    keys broadcast into the date-pruned lineitem scan, the
    per-(supplier, part) quantity aggregate applies the HAVING, and the
    surviving supplier keys drive a LEFT SEMI join against the supplier
    dimension — the semi join keeps supplier rows unduplicated without
    a DISTINCT over the join product. Nation broadcasts.

    Scale: shipdate predicate and partkey Bloom reach the fact scan;
    one shuffle on (l_suppkey, l_partkey); the semi join's right side
    is the already-tiny qualifying-supplier set."""
    li = load_table(spark, sf_dir, "lineitem")
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red %")
    ).select("p_partkey")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    bulk = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(bulk, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", "n_name")
        .orderBy(F.asc("s_name"))
    )


@query(
    "weighted_median_price_by_brand",
    oracle="""
WITH li AS (
  SELECT p.p_brand,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l.l_quantity) AS BIGINT) AS w
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
wb AS (SELECT p_brand, cents, sum(w) AS w FROM li GROUP BY 1, 2),
c AS (
  SELECT p_brand, cents, w,
         sum(w) OVER (PARTITION BY p_brand ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER (PARTITION BY p_brand) AS tot
  FROM wb
)
SELECT p_brand,
       round(min(cents) / 100.0, 2) AS weighted_median_price,
       min(tot)::BIGINT AS total_quantity
FROM c WHERE 2 * cum >= tot
GROUP BY p_brand ORDER BY p_brand
""",
)
def weighted_median_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median line price per part brand — the
    order-statistic generalization the plain percentile family can't
    express (a 50-unit line should pull the median 50x harder than a
    1-unit line). Lower weighted median: the smallest price whose
    inclusive cumulative weight reaches half the brand's total. Prices
    sum as exact integer cents and weights as exact integer quantities,
    so the threshold test 2*cum >= tot is integer-exact on both
    engines — no interpolation, no float boundary.

    Scale: the fact compresses to (brand, price)-grain first (one
    shuffle), the cumulative runs inside each brand partition (no
    global window), and the fact-side join to part is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window

    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_quantity")).cast("long").alias("w"),
    )
    wb = j.groupBy("p_brand", "cents").agg(F.sum("w").alias("w"))
    wcum = (
        Window.partitionBy("p_brand")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("p_brand")
    c = wb.select(
        "p_brand",
        "cents",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wtot).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("p_brand")
        .agg(
            F.round(F.min("cents") / 100.0, 2).alias("weighted_median_price"),
            F.min("tot").cast("long").alias("total_quantity"),
        )
        .orderBy("p_brand")
    )


@query(
    "sketch_set_overlap_check",
    oracle="""
WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 48),
b AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity <= 3)
SELECT (SELECT count(*) FROM a)::BIGINT AS exact_parts_bulk,
       (SELECT count(*) FROM b)::BIGINT AS exact_parts_single,
       (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))::BIGINT
         AS exact_union,
       (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))::BIGINT
         AS exact_intersection,
       true AS union_within_5pct,
       true AS intersection_within_10pct
""",
)
def sketch_set_overlap_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA gate: Apache DataSketches HLL sketches built
    per segment (parts shipped in bulk, quantity >= 48, vs parts
    shipped in singles, quantity <= 3 — ~82% overlapping sets), merged with
    ``hll_union``, and the intersection estimated by inclusion-exclusion
    (|A|+|B|-|A∪B|) — asserted in-row against the exact counts (5% for
    the union, 10% for the subtraction-amplified intersection), so the
    driver hash fails on sketch drift exactly like hll_distinct_check.

    Scale: mergeable sketches are the 100 TB set-overlap pattern —
    per-partition (or per-day) sketches union associatively WITHOUT
    rescanning raw keys, so "how many parts appear in both segments"
    costs two map-side passes and a 1-row join, never a shuffle of the
    key domain; the exact side here is the audit, not the product."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 48).agg(
        F.count_distinct("l_partkey").alias("exact_parts_bulk"),
        F.hll_sketch_agg("l_partkey").alias("_ska"),
    )
    b = li.filter(F.col("l_quantity") <= 3).agg(
        F.count_distinct("l_partkey").alias("exact_parts_single"),
        F.hll_sketch_agg("l_partkey").alias("_skb"),
    )
    ex = li.filter(
        (F.col("l_quantity") >= 48) | (F.col("l_quantity") <= 3)
    ).agg(F.count_distinct("l_partkey").alias("exact_union"))
    j = a.crossJoin(b).crossJoin(F.broadcast(ex))
    est_u = F.hll_sketch_estimate(F.hll_union("_ska", "_skb"))
    est_a = F.hll_sketch_estimate("_ska")
    est_b = F.hll_sketch_estimate("_skb")
    exact_i = (
        F.col("exact_parts_bulk")
        + F.col("exact_parts_single")
        - F.col("exact_union")
    )
    return j.select(
        "exact_parts_bulk",
        "exact_parts_single",
        "exact_union",
        exact_i.alias("exact_intersection"),
        (F.abs(est_u - F.col("exact_union")) <= 0.05 * F.col("exact_union")).alias(
            "union_within_5pct"
        ),
        (F.abs((est_a + est_b - est_u) - exact_i) <= 0.10 * exact_i).alias(
            "intersection_within_10pct"
        ),
    )


@query(
    "distributed_exact_quantiles_check",
    oracle="""
WITH qq AS (
  SELECT quantile_cont(l_extendedprice,
                       [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]) AS vals
  FROM lineitem
)
SELECT [0.01, 0.25, 0.5, 0.75, 0.9, 0.99][i::INTEGER] AS p,
       round(vals[i::INTEGER], 6) AS value
FROM qq, range(1, 7) r(i) ORDER BY p
""",
)
def distributed_exact_quantiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global percentiles computed WITHOUT any single aggregation
    buffer holding the column: value-compressed counts, a
    range-partitioned cumulative, conditional-min order-statistic
    lookups, and type-7 interpolation — hash-checked against DuckDB's
    quantile_cont, which (like Spark's ``percentile``) buffers the
    whole column and therefore cannot run a 100 TB global percentile
    at all. Same numbers, scalable plan: this query IS the gate that
    the distributed form reproduces the buffering form bit-for-bit at
    6dp across the whole probability range (tails included).

    Scale: the heavy pass is one hash aggregate to the distinct-value
    grain; the cumulative is the two-pass range exchange; the order-
    statistic probe joins six broadcast index rows against the
    value-grain frame. Memory per task is O(values-per-range), never
    O(column)."""
    from ..operators.aggregates import exact_percentiles_distributed

    li = load_table(spark, sf_dir, "lineitem")
    out = exact_percentiles_distributed(
        li, "l_extendedprice", [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    )
    return out.select("p", F.round("value", 6).alias("value")).orderBy("p")


@query(
    "grouped_distributed_quantiles_check",
    oracle="""
WITH qq AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.95]) AS vals
  FROM orders GROUP BY 1
)
SELECT o_orderpriority,
       [0.25, 0.5, 0.75, 0.95][i::INTEGER] AS p,
       round(vals[i::INTEGER], 6) AS value
FROM qq, range(1, 5) r(i) ORDER BY o_orderpriority, p
""",
)
def grouped_distributed_quantiles_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group exact percentiles via the buffer-free distributed path
    (grouped companion of distributed_exact_quantiles_check): quartiles
    and p95 of order value per priority, every pass window-partitioned
    by the group key — the form that still works when the largest group
    alone exceeds executor memory, hash-checked against DuckDB's
    buffering quantile_cont per group."""
    from ..operators.aggregates import exact_percentiles_distributed_grouped

    orders = load_table(spark, sf_dir, "orders")
    out = exact_percentiles_distributed_grouped(
        orders, "o_totalprice", "o_orderpriority", [0.25, 0.5, 0.75, 0.95]
    )
    return out.select(
        "o_orderpriority", "p", F.round("value", 6).alias("value")
    ).orderBy("o_orderpriority", "p")


@query(
    "time_hierarchy_rollup",
    oracle="""
SELECT CASE WHEN grouping(yr) = 1 THEN -1 ELSE yr END AS yr,
       CASE WHEN grouping(qtr) = 1 THEN -1 ELSE qtr END AS qtr,
       grouping(yr) * 2 + grouping(qtr) AS lvl,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM (
  SELECT year(o_orderdate)::BIGINT AS yr,
         quarter(o_orderdate)::BIGINT AS qtr,
         o_totalprice
  FROM orders
)
GROUP BY ROLLUP (yr, qtr)
ORDER BY lvl, yr, qtr
""",
)
def time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy ROLLUP (year → quarter → grand total) with
    explicit grouping levels — the time axis companion of
    rollup_revenue_region_nation: one Expand pass emits the quarter
    rows, the year subtotals, and the grand total together, with
    ``grouping()`` flags folded into a level id and NULL hierarchy keys
    recoded to -1 so the hash has no NULL-vs-NULL ambiguity across
    engines.

    Scale: ROLLUP is one aggregate over an Expand(3x) of the year/
    quarter projection — bounded by the calendar, no join, no second
    pass over the fact."""
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        "o_totalprice",
    )
    g = src.rollup("yr", "qtr").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        (F.grouping("yr") * 2 + F.grouping("qtr")).alias("lvl"),
    )
    return g.select(
        F.coalesce("yr", F.lit(-1)).alias("yr"),
        F.coalesce("qtr", F.lit(-1)).alias("qtr"),
        F.col("lvl").cast("long").alias("lvl"),
        "n_orders",
        "revenue",
    ).orderBy("lvl", "yr", "qtr")


@query(
    "join_key_skew_report",
    oracle="""
WITH k AS (
  SELECT 'lineitem.l_orderkey' AS key_col, l_orderkey AS k FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
  UNION ALL
  SELECT 'orders.o_custkey', o_custkey FROM orders
),
per_key AS (
  SELECT key_col, k, count(*)::BIGINT AS c FROM k GROUP BY 1, 2
)
SELECT key_col,
       sum(c)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_distinct,
       max(c)::BIGINT AS max_key_rows,
       round(max(c)::DOUBLE * count(*) / sum(c), 4) AS skew_ratio
FROM per_key GROUP BY key_col ORDER BY key_col
""",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the profile you run BEFORE choosing a
    shuffle strategy at 100 TB: for each prospective join key, total
    rows, distinct keys, the hottest key's row count, and the skew
    ratio (hottest key vs the mean key, >,~10 means the naive shuffle
    join stalls on one task and you reach for salting or AQE skew
    splitting). Each key profiles in its own grouped pass over a
    single-column projection (column-pruned scans); the union is of
    4-row summaries, not raw keys.

    This is the measurement half of the salting machinery in
    operators/skew.py — skew is something you detect, then treat."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def profile(df: DataFrame, col: str, label: str) -> DataFrame:
        per_key = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        return per_key.agg(
            F.lit(label).alias("key_col"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_key_rows"),
            F.round(
                F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c"), 4
            ).alias("skew_ratio"),
        ).select("key_col", "n_rows", "n_distinct", "max_key_rows", "skew_ratio")

    return (
        profile(li, "l_orderkey", "lineitem.l_orderkey")
        .unionByName(profile(li, "l_partkey", "lineitem.l_partkey"))
        .unionByName(profile(li, "l_suppkey", "lineitem.l_suppkey"))
        .unionByName(profile(orders, "o_custkey", "orders.o_custkey"))
        .orderBy("key_col")
    )


@query(
    "top1pct_customer_revenue_share",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk
  FROM per_cust
),
tot AS (
  SELECT count(*)::BIGINT AS n_customers, sum(cents)::HUGEINT AS total
  FROM per_cust
),
cut AS (SELECT (n_customers + 99) // 100 AS k FROM tot)
SELECT tot.n_customers,
       cut.k::BIGINT AS n_top_customers,
       round((SELECT sum(cents)::HUGEINT FROM ranked, cut
              WHERE rk <= cut.k)::DOUBLE / tot.total::DOUBLE, 6)
         AS top1pct_revenue_share
FROM tot, cut
""",
)
def top1pct_customer_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration at the whale end: the share of total
    revenue carried by the top ceil(1%) of customers — the complement
    of the Gini/HHI family that answers the question executives
    actually ask. Per-customer revenue folds to exact cents; the top-k
    cut is an integer ceil (n+99)//100; the top-k sum uses a GLOBAL
    rank over the per-CUSTOMER aggregate with a deterministic key
    tiebreak so both engines cut the identical customer set — computed
    by the range-partitioned two-pass rank (parallel, no single-task
    sort window even at hundreds of millions of customers)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    tot = per_cust.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("total"),
    )
    from ..operators.windows import range_partitioned_rank

    ranked = range_partitioned_rank(
        per_cust.withColumn("_negcents", -F.col("cents")),
        ["_negcents", "o_custkey"],
        out="rk",
    ).drop("_negcents")
    topsum = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("rk") <= F.expr("(n_customers + 99) div 100"))
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("top_cents"))
    )
    return tot.crossJoin(F.broadcast(topsum)).select(
        "n_customers",
        F.expr("(n_customers + 99) div 100").alias("n_top_customers"),
        F.round(
            F.col("top_cents").cast("double") / F.col("total").cast("double"), 6
        ).alias("top1pct_revenue_share"),
    )


@query(
    "fd_histogram_order_values",
    oracle="""
WITH v AS (SELECT o_totalprice::DOUBLE AS x FROM orders),
q AS (
  SELECT quantile_cont(x, 0.25) AS q1, quantile_cont(x, 0.75) AS q3,
         min(x) AS mn, max(x) AS mx, count(*)::DOUBLE AS n
  FROM v
),
h AS (
  SELECT q1, q3, mn, mx, n,
         2 * (q3 - q1) / pow(n, 1.0 / 3.0) AS width,
         CAST(ceil((mx - mn) / (2 * (q3 - q1) / pow(n, 1.0 / 3.0)))
              AS BIGINT) AS n_bins
  FROM q
),
b AS (
  SELECT least(CAST(floor((v.x - h.mn) / h.width) AS BIGINT),
               h.n_bins - 1) AS bin,
         h.mn AS mn, h.width AS width
  FROM v, h
)
SELECT bin,
       round(mn + bin * width, 4) AS bin_lo,
       round(mn + (bin + 1) * width, 4) AS bin_hi,
       count(*)::BIGINT AS n_orders
FROM b GROUP BY bin, mn, width ORDER BY bin
""",
)
def fd_histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-binned histogram of order values with the Freedman-Diaconis
    rule h = 2*IQR/n^(1/3) — the robust bin-width choice (IQR, not sd,
    so heavy tails don't smear the bins) that makes the histogram a
    FUNCTION of the data rather than a hand-tuned report. The top bin
    is closed (clamped) so max lands inside.

    Exactness: the IQR comes from the buffer-free distributed
    percentile path (== quantile_cont); width/bin arithmetic is one
    shared expression; bins are exact integers.

    Scale: one pass for the moments + quantiles, one grouped pass for
    the counts — histogram construction at any SF is two aggregates."""
    from ..operators.aggregates import exact_percentiles_distributed

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(F.col("o_totalprice").cast("double").alias("x"))
    q = exact_percentiles_distributed(v, "x", [0.25, 0.75])
    qq = q.groupBy().pivot("p", [0.25, 0.75]).agg(F.first("value"))
    mm = v.agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    width = (
        2
        * (F.col("`0.75`") - F.col("`0.25`"))
        / F.pow(F.col("n"), F.lit(1.0) / 3.0)
    )
    h = qq.crossJoin(F.broadcast(mm)).select(
        F.col("mn"),
        width.alias("width"),
        F.ceil((F.col("mx") - F.col("mn")) / width).cast("long").alias("n_bins"),
    )
    b = v.crossJoin(F.broadcast(h)).select(
        F.least(
            F.floor((F.col("x") - F.col("mn")) / F.col("width")).cast("long"),
            F.col("n_bins") - 1,
        ).alias("bin"),
        "mn",
        "width",
    )
    return (
        b.groupBy("bin", "mn", "width")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bin",
            F.round(F.col("mn") + F.col("bin") * F.col("width"), 4).alias(
                "bin_lo"
            ),
            F.round(F.col("mn") + (F.col("bin") + 1) * F.col("width"), 4).alias(
                "bin_hi"
            ),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("bin")
    )

"""Data-quality constraint suite (Deequ-style declarative checks).

A 100 TB training-data pipeline gates every ingest batch on a constraint
report: completeness, uniqueness, domain membership, range validity, and
referential integrity. This module expresses the whole suite as ONE
lazy plan: per-table conditional aggregations (single map-side pass per
table, no per-check jobs) unpivoted into one row per check via
``stack``, plus a left-anti join for the foreign-key check. The oracle
replays every check in SQL, so the driver hash pins the exact violation
counts, not just "a report was produced".

Reference scope: the reference validates its frame after load (NA
drops / domain recodes, BigDataProject.R:60-95); this generalizes that
into the declarative audit a production pipeline runs before those
cleaning steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table


def constraint_rows(df: DataFrame, table: str, checks: dict[str, F.Column]) -> DataFrame:
    """One conditional-aggregation pass over ``df`` → one row per check:
    ``(check_name, n_rows, n_violations)``. Each value in ``checks`` is
    a Column that is TRUE when the row SATISFIES the constraint; nulls
    count as violations (three-valued logic folded via when/otherwise).

    Scale: all checks share one scan + one partial-aggregate — adding a
    check adds a column to the agg, not a pass over the data."""
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.when(cond, 0).otherwise(1)).cast("long").alias(f"_v{i}")
        for i, (_, cond) in enumerate(checks.items())
    ]
    stacked = ", ".join(
        f"'{table}_{name}', _v{i}" for i, name in enumerate(checks)
    )
    return df.agg(*aggs).select(
        F.expr(
            f"stack({len(checks)}, {stacked}) AS (check_name, n_violations)"
        ),
        F.col("_n").alias("n_rows"),
    )


@query(
    "data_quality_report",
    oracle="""
WITH oa AS (
  SELECT count(*)::BIGINT AS n,
         (count(*) - count(DISTINCT o_orderkey))::BIGINT AS v_unique,
         sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)::BIGINT AS v_price,
         sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)::BIGINT AS v_status,
         sum(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END)::BIGINT AS v_date
  FROM orders
),
la AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)::BIGINT AS v_qty,
         sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END)::BIGINT AS v_ship
  FROM lineitem
),
ri AS (
  SELECT count(*)::BIGINT AS v FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT * FROM (
  SELECT 'orders_orderkey_unique' AS check_name, v_unique AS n_violations, n AS n_rows FROM oa
  UNION ALL SELECT 'orders_totalprice_positive', v_price, n FROM oa
  UNION ALL SELECT 'orders_status_domain', v_status, n FROM oa
  UNION ALL SELECT 'orders_orderdate_complete', v_date, n FROM oa
  UNION ALL SELECT 'lineitem_quantity_range', v_qty, n FROM la
  UNION ALL SELECT 'lineitem_shipdate_complete', v_ship, n FROM la
  UNION ALL SELECT 'lineitem_orderkey_referential', ri.v, la.n FROM ri, la
) ORDER BY check_name
""",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over orders+lineitem: uniqueness (o_orderkey),
    range (o_totalprice>0, l_quantity∈[1,50]), domain (o_orderstatus),
    completeness (o_orderdate, l_shipdate), and referential integrity
    (every l_orderkey resolves to an order). Three jobs' worth of checks
    in one plan: one agg pass per table + one left-anti join; the
    NOT-EXISTS oracle matches anti-join null semantics (an unresolvable
    null key is a violation on both engines)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    # uniqueness isn't a per-row predicate (needs the exact two-phase
    # countDistinct), so the orders pass is written out longhand with the
    # distinct agg alongside the conditional sums — still one scan
    o_agg = o.agg(
        F.count(F.lit(1)).alias("_n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("_v0"),
        F.sum(F.when(F.col("o_totalprice") > 0, 0).otherwise(1))
        .cast("long")
        .alias("_v1"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 0).otherwise(1))
        .cast("long")
        .alias("_v2"),
        F.sum(F.when(F.col("o_orderdate").isNotNull(), 0).otherwise(1))
        .cast("long")
        .alias("_v3"),
    )
    o_rows = o_agg.select(
        F.expr(
            "stack(4, 'orders_orderkey_unique', _v0,"
            " 'orders_totalprice_positive', _v1,"
            " 'orders_status_domain', _v2,"
            " 'orders_orderdate_complete', _v3) AS (check_name, n_violations)"
        ),
        F.col("_n").alias("n_rows"),
    )

    l_rows = constraint_rows(
        li,
        "lineitem",
        {
            "quantity_range": F.col("l_quantity").between(1, 50),
            "shipdate_complete": F.col("l_shipdate").isNotNull(),
        },
    )
    l_n = li.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    ri_row = (
        li.join(
            o.select(F.col("o_orderkey").alias("_k")).distinct(),
            F.col("l_orderkey") == F.col("_k"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(
            F.lit("lineitem_orderkey_referential").alias("check_name"),
            "n_violations",
        )
        .crossJoin(F.broadcast(l_n))
    )
    return (
        o_rows.unionByName(l_rows)
        .unionByName(ri_row)
        .select("check_name", "n_rows", "n_violations")
        .orderBy("check_name")
    )


@query(
    "benford_price_audit",
    oracle="""
WITH d AS (
  SELECT floor(o_totalprice
               / power(10, floor(log10(o_totalprice))))::BIGINT AS digit
  FROM orders WHERE o_totalprice > 0
),
t AS (SELECT count(*)::BIGINT AS n FROM d)
SELECT digit,
       count(*) AS n_orders,
       round(count(*) / (1.0 * t.n), 6) AS observed_share,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_share
FROM d, t GROUP BY digit, t.n ORDER BY digit
""",
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order totals next to Benford's
    expectation — the classic fabricated-data audit (synthetic uniform
    generators fail it loudly; organic monetary data tracks it). The
    digit extraction is loss-free for 2-dp prices (floor(log10) can only
    waver within an ulp of an integer at exact powers of ten, where the
    value IS exact); shares are one division against the broadcast
    1-row total."""
    orders = load_table(spark, sf_dir, "orders")
    pos = orders.filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("long")
    d = pos.select(digit.alias("digit"))
    t = d.agg(F.count(F.lit(1)).alias("_n"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders") / (1.0 * F.col("_n")), 6).alias(
                "observed_share"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_share"),
        )
        .orderBy("digit")
    )


@query(
    "sorted_neighborhood_linkage",
    oracle="""
WITH c AS (
  SELECT c_custkey AS k, c_name AS name,
         CAST(floor(c_custkey / 50) AS BIGINT) AS b
  FROM customer
),
cand AS (
  SELECT a.k AS ka, b.k AS kb,
         CASE WHEN levenshtein(a.name, b.name) <= 1 THEN 1 ELSE 0 END AS m
  FROM c a JOIN c b
    ON (b.b = a.b OR b.b = a.b + 1) AND b.k > a.k
)
SELECT (SELECT count(*) FROM c)::BIGINT AS n_records,
       count(*)::BIGINT AS n_candidates,
       sum(m)::BIGINT AS n_matches,
       round(sum(m)::DOUBLE / count(*)::DOUBLE, 6) AS match_rate
FROM cand
""",
)
def sorted_neighborhood_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by the sorted-neighborhood method: records are
    keyed into 50-wide sorted blocks, candidate pairs are drawn only
    from the same or adjacent block (so every record is compared with a
    BOUNDED neighborhood, never the full table), and candidates within
    Levenshtein distance 1 on the name are declared matches. The classic
    blocking pattern that turns O(n^2) record linkage into O(n * w):
    at 100 TB you change the window width, not the algorithm.

    The Spark plan keeps the blocking join an EQUI-join (no BNL): each
    left record probes its own block and the next via an exploded
    2-element array, so the pair generation is a hash join on the block
    key; levenshtein runs JVM-side on the candidates only.

    Exactness: integer counts, engine-identical unit-cost Levenshtein
    (both engines implement Wagner-Fischer with cost-1 ops), one
    division for the rate.

    r11b (measured): the candidate generation + Levenshtein ran as ONE
    task (a 3.2 s single-task stage was the whole query) — the customer
    table is a single ~1 MB input split, the block join broadcasts, so
    the O(n·w) edit-distance work inherited the scan's parallelism of
    1. The probe side is hash-repartitioned on (key, block) before the
    join (deterministic keys; the final aggregate is integer sums, so
    the result is partition-count invariant by construction)."""
    cust = load_table(spark, sf_dir, "customer")
    c = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.floor(F.col("c_custkey") / 50).cast("long").alias("b"),
    )
    probe = c.select(
        F.col("k").alias("ka"),
        F.col("name").alias("name_a"),
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("jb"),
    ).repartition(spark.sparkContext.defaultParallelism, "ka", "jb")
    right = c.select(
        F.col("k").alias("kb"), F.col("name").alias("name_b"), F.col("b").alias("jb")
    )
    cand = probe.join(right, "jb").filter(F.col("kb") > F.col("ka"))
    m = F.when(F.levenshtein("name_a", "name_b") <= 1, 1).otherwise(0)
    n_rec = c.agg(F.count(F.lit(1)).alias("n_records"))
    agg = cand.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(m).alias("n_matches"),
    )
    return n_rec.crossJoin(F.broadcast(agg)).select(
        F.col("n_records").cast("long").alias("n_records"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_matches").cast("long").alias("n_matches"),
        F.round(
            F.col("n_matches").cast("double") / F.col("n_candidates").cast("double"),
            6,
        ).alias("match_rate"),
    )


@query(
    "feature_hashing_collision_audit",
    oracle="""
WITH k AS (
  SELECT o_orderpriority || '|' || o_orderstatus AS key,
         count(*)::BIGINT AS n_rows
  FROM orders GROUP BY 1
),
h AS (
  SELECT key, n_rows,
         ('0x' || substr(md5(key), 1, 15))::BIGINT % 32 AS bucket
  FROM k
),
bk AS (
  SELECT bucket, count(*)::BIGINT AS keys_in_bucket,
         sum(n_rows)::BIGINT AS rows_in_bucket
  FROM h GROUP BY bucket
)
SELECT (SELECT count(*) FROM k)::BIGINT AS n_keys,
       count(*)::BIGINT AS n_buckets_used,
       sum(CASE WHEN keys_in_bucket > 1 THEN keys_in_bucket ELSE 0 END)::BIGINT
         AS n_colliding_keys,
       max(keys_in_bucket) AS max_keys_per_bucket,
       max(rows_in_bucket) AS max_bucket_rows
FROM bk
""",
)
def feature_hashing_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick's price tag: hash the (priority, status)
    categorical cross into 32 buckets with the portable 60-bit hash and
    report how many distinct keys collide, the worst bucket's key count,
    and the worst bucket's row load — the audit you run before replacing
    a one-hot encoder with feature hashing (collisions alias features;
    row skew concentrates gradient signal). Every decision replays
    engine-identically because the bucket is the shared md5 hash.

    Scale: the fact collapses to |keys| rows in one grouped pass;
    everything after is key-grain."""
    from ..llm import text as TX

    orders = load_table(spark, sf_dir, "orders")
    k = orders.groupBy(
        F.concat_ws("|", "o_orderpriority", "o_orderstatus").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    h = k.select(
        "key", "n_rows", (TX.portable_hash60(F.col("key")) % 32).alias("bucket")
    )
    bk = h.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("keys_in_bucket"),
        F.sum("n_rows").alias("rows_in_bucket"),
    )
    nk = k.agg(F.count(F.lit(1)).alias("n_keys"))
    return bk.crossJoin(F.broadcast(nk)).groupBy("n_keys").agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.sum(
            F.when(F.col("keys_in_bucket") > 1, F.col("keys_in_bucket")).otherwise(
                0
            )
        ).alias("n_colliding_keys"),
        F.max("keys_in_bucket").alias("max_keys_per_bucket"),
        F.max("rows_in_bucket").alias("max_bucket_rows"),
    ).select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_buckets_used").cast("long").alias("n_buckets_used"),
        F.col("n_colliding_keys").cast("long").alias("n_colliding_keys"),
        F.col("max_keys_per_bucket").cast("long").alias("max_keys_per_bucket"),
        F.col("max_bucket_rows").cast("long").alias("max_bucket_rows"),
    )


@query(
    "functional_dependency_audit",
    oracle="""
WITH f1 AS (
  SELECT o_custkey AS k, count(DISTINCT o_orderpriority)::BIGINT AS d
  FROM orders GROUP BY 1
),
f2 AS (
  SELECT l_partkey AS k, count(DISTINCT l_suppkey)::BIGINT AS d
  FROM lineitem GROUP BY 1
),
f3 AS (
  SELECT c_nationkey AS k, count(DISTINCT c_mktsegment)::BIGINT AS d
  FROM customer GROUP BY 1
),
u AS (
  SELECT 'orders: o_custkey -> o_orderpriority' AS fd, * FROM f1
  UNION ALL
  SELECT 'lineitem: l_partkey -> l_suppkey', * FROM f2
  UNION ALL
  SELECT 'customer: c_nationkey -> c_mktsegment', * FROM f3
)
SELECT fd,
       count(*)::BIGINT AS n_keys,
       sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating_keys,
       round(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS violation_rate,
       max(d) AS max_distinct_rhs
FROM u GROUP BY fd ORDER BY fd
""",
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery audit for three candidate FDs:
    per left-hand key, does more than one right-hand value occur? The
    schema-profiling primitive behind normalization advice, join-key
    sanity ("is this really 1:1?"), and dedup-rule design — an FD that
    ALMOST holds (violation_rate ~ 0) usually marks dirty rows, not a
    false rule.

    Scale: one count-distinct grouped pass per audited FD (Spark's
    two-phase single-distinct rewrite, map-side partials), then a
    key-grain rollup. Adding an FD adds one aggregate, never a join."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def fd(df, key, val, label):
        return (
            df.groupBy(F.col(key).alias("k"))
            .agg(F.count_distinct(F.col(val)).alias("d"))
            .select(F.lit(label).alias("fd"), "k", "d")
        )

    u = (
        fd(orders, "o_custkey", "o_orderpriority",
           "orders: o_custkey -> o_orderpriority")
        .unionByName(
            fd(lineitem, "l_partkey", "l_suppkey",
               "lineitem: l_partkey -> l_suppkey")
        )
        .unionByName(
            fd(customer, "c_nationkey", "c_mktsegment",
               "customer: c_nationkey -> c_mktsegment")
        )
    )
    return (
        u.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("d") > 1, 1).otherwise(0)).alias(
                "n_violating_keys"
            ),
            F.round(
                F.sum(F.when(F.col("d") > 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("violation_rate"),
            F.max("d").alias("max_distinct_rhs"),
        )
        .select(
            "fd",
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_violating_keys").cast("long").alias("n_violating_keys"),
            "violation_rate",
            F.col("max_distinct_rhs").cast("long").alias("max_distinct_rhs"),
        )
        .orderBy("fd")
    )


@query(
    "categorical_entropy_profile",
    oracle="""
WITH c1 AS (
  SELECT 'orders.o_orderpriority' AS col, o_orderpriority AS v,
         count(*)::DOUBLE AS n
  FROM orders GROUP BY 2
),
c2 AS (
  SELECT 'orders.o_orderstatus', o_orderstatus, count(*)::DOUBLE
  FROM orders GROUP BY 2
),
c3 AS (
  SELECT 'lineitem.l_returnflag', l_returnflag, count(*)::DOUBLE
  FROM lineitem GROUP BY 2
),
c4 AS (
  SELECT 'customer.c_mktsegment', c_mktsegment, count(*)::DOUBLE
  FROM customer GROUP BY 2
),
u AS (
  SELECT * FROM c1 UNION ALL SELECT * FROM c2
  UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
),
t AS (SELECT col, sum(n) AS tot FROM u GROUP BY col)
SELECT u.col,
       count(*)::BIGINT AS n_distinct,
       round(sum(-(u.n / t.tot) * log2(u.n / t.tot)), 6) AS entropy_bits,
       round(max(u.n) / t.tot, 6) AS mode_share
FROM u JOIN t ON u.col = t.col
GROUP BY u.col, t.tot ORDER BY u.col
""",
)
def categorical_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy profile of four categorical columns (bits), with
    distinct counts and mode share — the column-level information
    readout that ranks encoder candidates (near-zero entropy: drop or
    constant-fold the column; entropy ~ log2(k): uniform, hashing-safe)
    and baselines compressibility.

    Scale: one grouped count per column (map-side combine), unioned at
    category grain (a few dozen rows total), then a per-column fold."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def cat(df, col, label):
        return df.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("double").alias("n")
        ).select(F.lit(label).alias("col"), "v", "n")

    u = (
        cat(orders, "o_orderpriority", "orders.o_orderpriority")
        .unionByName(cat(orders, "o_orderstatus", "orders.o_orderstatus"))
        .unionByName(cat(lineitem, "l_returnflag", "lineitem.l_returnflag"))
        .unionByName(cat(customer, "c_mktsegment", "customer.c_mktsegment"))
    )
    t = u.groupBy("col").agg(F.sum("n").alias("tot"))
    return (
        u.join(t, "col")
        .groupBy("col", "tot")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.sum(
                    -(F.col("n") / F.col("tot"))
                    * F.log2(F.col("n") / F.col("tot"))
                ),
                6,
            ).alias("entropy_bits"),
            F.round(F.max("n") / F.col("tot"), 6).alias("mode_share"),
        )
        .select(
            "col",
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "entropy_bits",
            "mode_share",
        )
        .orderBy("col")
    )

"""Source/sink round-trip queries (SURVEY.md §2.1 S1-S3 driver
coverage): the typed CSV scan and the JSONL scan, proven by writing
testdata OUT through the sink and aggregating what the typed reader
parses BACK — the oracle aggregates the original parquet, so any type-
parsing loss (long, double shortest-round-trip, string) breaks the hash.

Reference consumption sites: ``readr::read_csv`` (BigDataProject.R:41),
``write_csv`` (BigDataProject.R:544).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table, read_csv, read_jsonl
from ..sources.writers import write_csv, write_jsonl, write_parquet

# keep round-trip scratch inside the repo tree (driver sandboxes cwd)
_SCRATCH = Path(__file__).resolve().parents[2] / "spark-warehouse" / "roundtrip"


@query(
    "csv_roundtrip_order_stats",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       sum(o_orderkey)::BIGINT AS key_checksum,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def csv_roundtrip_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2/S3 in one gate: orders → distributed CSV sink → typed CSV
    scan (explicit schema probed from the source — never hardcoded,
    testdata physical types drift between rounds) → aggregate. The
    oracle reads the ORIGINAL parquet, so the hash only matches if the
    long/double/string round-trip through CSV text is lossless.

    Scale: the sink writes one part per task and the scan reads them
    parallel; schema-on-read means zero inference passes."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = str(_SCRATCH / f"orders_csv_{Path(sf_dir).name}")
    write_csv(src, path)
    back = read_csv(spark, path, schema=src.schema)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "jsonl_roundtrip_part_stats",
    oracle="""
SELECT p_brand,
       count(*) AS n_parts,
       sum(p_partkey)::BIGINT AS key_checksum,
       round(sum(p_retailprice), 2) AS retail_total
FROM part GROUP BY p_brand ORDER BY p_brand
""",
)
def jsonl_roundtrip_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink → schema'd JSONL scan round-trip on part (the
    interchange format for document pipelines), same oracle-on-parquet
    construction as the CSV gate. Explicit read schema — the Jackson
    parser then projects only requested fields instead of full
    inference."""
    src = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    path = str(_SCRATCH / f"part_jsonl_{Path(sf_dir).name}")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, schema=src.schema)
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("p_partkey").alias("key_checksum"),
            F.round(F.sum("p_retailprice"), 2).alias("retail_total"),
        )
        .orderBy("p_brand")
    )


@query(
    "partitioned_parquet_roundtrip",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n_events,
       sum(event_id)::BIGINT AS id_checksum,
       round(sum(value), 2) AS value_total
FROM events
WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-10'
GROUP BY 1 ORDER BY 1
""",
)
def partitioned_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink → partition-pruned scan: events are
    written ``partitionBy(day)`` (30 directories), read back with an
    explicit schema (partition-column type pinned to string — no
    inference drift) and a 5-day predicate that Spark resolves to
    PartitionFilters, so the scan opens only 5 of 30 directories. The
    oracle aggregates the ORIGINAL parquet over the same time range —
    the hash matches only if the partition layout loses no rows and the
    timestamp/double round trip is exact.

    Scale: this is THE layout pattern for 100 TB event data — daily
    partitions mean a day-ranged query touches only its directories
    (plan-gated in tests/test_plans.py); checksum over event_id guards
    against dropped or duplicated rows, not just counts. Testdata spans
    a fixed 30-day window (TESTDATA.md, seed=42), so the literal range
    is stable across rounds."""
    src = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(_SCRATCH / f"events_daily_{Path(sf_dir).name}")
    # repartition on the partition column before the partitioned write:
    # without it every task writes a file into every day directory
    # (tasks × days small files — the classic partitioned-sink mistake);
    # with it each day's rows land in one task → one file per directory
    write_parquet(src.repartition(F.col("day")), path, partition_by=["day"])
    back = spark.read.schema(src.schema).parquet(path)
    days = [f"2024-01-{d:02d}" for d in range(5, 10)]
    return (
        back.filter(F.col("day").isin(days))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").alias("id_checksum"),
            F.round(F.sum("value"), 2).alias("value_total"),
        )
        .orderBy("day")
    )


@query(
    "schema_evolution_roundtrip",
    oracle="""
WITH old_batch AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice, NULL::BIGINT AS o_year
  FROM orders WHERE o_orderkey % 2 = 0
),
new_batch AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         year(o_orderdate)::BIGINT AS o_year
  FROM orders WHERE o_orderkey % 2 = 1
),
u AS (SELECT * FROM old_batch UNION ALL SELECT * FROM new_batch)
SELECT o_orderpriority,
       count(*) AS n_orders,
       sum(CASE WHEN o_year IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_with_year,
       sum(o_orderkey)::BIGINT AS key_checksum,
       round(sum(o_totalprice), 2) AS revenue
FROM u GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution gate: two parquet batches written with DIFFERENT
    schemas — the old batch lacks the ``o_year`` column a later
    pipeline version added — read back together with ``mergeSchema``,
    so old rows surface the new column as NULL instead of failing the
    scan. The aggregate counts year-carrying rows per priority next to
    the row/key checksums; the oracle simulates the merged read with a
    NULL-padded UNION over the original parquet.

    Scale: additive schema evolution is how year-long 100 TB datasets
    actually look (columns accrete; nobody rewrites history).
    ``mergeSchema`` reconciles footers at planning time — per-file
    projections adapt, no data rewrite; readers pay footer
    reconciliation once per scan, which is why the merged schema should
    be pinned in a table catalog once stable."""
    src = load_table(spark, sf_dir, "orders")
    path = _SCRATCH / f"orders_evolve_{Path(sf_dir).name}"
    old_b = src.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    new_b = src.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.year("o_orderdate").cast("long").alias("o_year"),
    )
    write_parquet(old_b, str(path / "batch=1"))
    write_parquet(new_b, str(path / "batch=2"))
    back = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(str(path))
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("o_year").isNotNull(), 1).otherwise(0)
            ).alias("n_with_year"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "orc_roundtrip_lineitem_stats",
    oracle="""
SELECT l_returnflag,
       count(*) AS n_lines,
       sum(l_orderkey)::BIGINT AS key_checksum,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS total_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def orc_roundtrip_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → ORC scan round-trip on lineitem (the columnar
    interchange format for Hive/Trino-flavored stacks), same
    oracle-on-original-parquet construction as the CSV/JSONL gates:
    the hash only matches if longs/doubles survive the ORC encode/
    decode bit-exactly (they do — ORC stores IEEE doubles natively,
    no text conversion). Exercises the vectorized ORC reader +
    predicate-capable scan the engine exposes via read_orc.

    Scale: one part file per task on write, parallel stripe reads on
    scan; the aggregate is map-side combined."""
    from ..sources.readers import read_orc
    from ..sources.writers import write_orc

    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice",
        "l_discount",
    )
    path = str(_SCRATCH / f"lineitem_orc_{Path(sf_dir).name}")
    write_orc(src, path)
    back = read_orc(spark, path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_orderkey").alias("key_checksum"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )

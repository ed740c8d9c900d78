"""Sinks (SURVEY.md §2.1 S3-S4).

Reference: ``write_csv``/``write.csv`` (BigDataProject.R:544,568-569) and
``saveRDS`` model persistence (BigDataProject.R:570-572). Spark-first: the
default sink is partitioned Parquet (scales to any size); single-file CSV
is provided for report-sized outputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Scale sink: partitioned, columnar. ``partition_by`` should be a
    low-cardinality column (date, region) — never a key column."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_single(df: DataFrame, path: str) -> None:
    """S3 parity sink: single CSV with header (write.csv(row.names=FALSE)).

    ``coalesce(1)`` funnels everything through one task — correct for the
    report-sized tables the reference writes (≤205 rows), wrong for data-
    sized output (use :func:`write_parquet` there).
    """
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Distributed CSV sink (header per part-file): the scale form of the
    CSV sink — one part per task, no single-task funnel. Doubles are
    written in shortest-round-trip form, so a typed re-read is lossless."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (interchange format — one object per line, gzip
    per part). Timestamps serialize ISO-8601; round-trip with an
    explicit schema on read."""
    df.write.mode("overwrite").option("compression", "gzip").json(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (zlib): the columnar alternative where the downstream
    stack is Hive/Trino-flavored."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed-table sink: later equi-joins/aggs on
    ``bucket_col`` between tables bucketed the same way co-locate and
    skip the shuffle entirely — the pre-partitioning strategy for
    repeatedly-joined 100 TB fact tables. (Requires a session warehouse;
    see tests/test_skew_bucketing.py for the no-Exchange plan proof.)"""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def save_model(model, path: str) -> None:
    """S4: model sink (saveRDS analogue) via Spark ML's native writer."""
    model.write().overwrite().save(path)


def save_model_table(df: DataFrame, path: str) -> None:
    """S4 model sink, table form (saveRDS analogue,
    BigDataProject.R:570-572, for closed-form fits): persists a model's
    parameter table — coefficients, centers, split points — as parquet.
    Doubles round-trip bit-exactly (binary columnar encoding, no text
    formatting), so a loaded model scores identically to the fitted
    one. ``coalesce(1)``: a parameter table is report-sized by
    construction; one footer read loads it back."""
    df.coalesce(1).write.mode("overwrite").parquet(path)

"""Skew-mitigation operators (SURVEY.md §4 partitioning concerns).

At 100 TB a handful of hot keys (a viral user_id, an empty-string join
key, boilerplate dedup buckets) can stall a stage on one straggler task.
Two standard remedies, expressed as reusable DataFrame transforms:

- **salted aggregation**: two-phase agg — first over (key, salt), then
  over key. The hot key's rows spread over ``salt_buckets`` tasks; the
  second phase aggregates ``salt_buckets`` partial rows per key (tiny).
- **salted broadcast-side join**: replicate the small side per salt value
  so a skewed big side joins on (key, salt) with uniform task sizes.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
cases automatically; these explicit forms cover aggregations (which AQE
does not re-balance) and give deterministic plans where needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform deterministic-per-row salt in [0, buckets) — derived from a
    whole-row hash mixed with a per-row disambiguator (no rand(): keeps
    retries/replays deterministic per task attempt).

    The disambiguator matters for the hot-key shape skew mitigation
    exists for: FULLY IDENTICAL duplicate rows would all hash to one
    salt bucket on the row hash alone, making the salting a no-op
    exactly when it's needed; ``monotonically_increasing_id`` spreads
    them while staying deterministic for a given partition layout."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(
                *[F.col(c) for c in df.columns],
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
            ),
            F.lit(buckets),
        ),
    )


def salted_group_count(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe group count: groupBy(key, salt) partials →
    groupBy(key) final sum. Same result as a plain group-count for ANY
    data; bounded task size for skewed keys."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def salted_group_agg(
    df: DataFrame,
    key: str,
    sum_cols: Sequence[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe sums (extend per-aggregate as needed — sums,
    counts, min/max all decompose; averages via sum+count)."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Join a skewed big side to a small side with uniform task sizes:
    big gets a row-hash salt, small is replicated ``buckets`` times, the
    equi-join runs on (key, salt). Result ≡ plain inner join on key."""
    big_salted = with_salt(big, buckets)
    salts = big.sparkSession.range(buckets).select(
        F.col("id").cast("long").alias("_salt")
    )
    small_replicated = small.crossJoin(F.broadcast(salts))
    return big_salted.join(
        F.broadcast(small_replicated), [key, "_salt"], "inner"
    ).drop("_salt")

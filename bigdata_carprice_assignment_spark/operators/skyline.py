"""Distributed skyline (Pareto frontier) computation.

A row is on the 2-D minimization skyline iff no other row is <= on both
metrics and strictly < on at least one. The classic distributed shape is
divide-and-conquer: every partition prunes locally, and only the
surviving candidates — O(partitions x local-frontier size), tiny for
non-degenerate data — meet for the exact global resolution. Any global
frontier point survives its partition's local prune (a dominator would
have to sit in the same partition, contradicting frontier membership),
so the two-stage result is exact.

Stage 1 is plain JVM window arithmetic: sort each partition by (x asc,
y asc) and keep a row only if its y does not exceed the running min of y
over the strictly-earlier rows. That keeps a small SUPERSET of the local
frontier (rows tied on y with an earlier same-y dominator slip through),
which is fine — stage 2 applies the exact dominance predicate. Stage 2
anti-joins the candidates against a broadcast copy of themselves, a
BroadcastNestedLoopJoin over a k-row frame.

Scale: the only movement of full-table rows is one narrow exchange of
(id, x, y) on the synthetic partition key for the stage-1 window; at
100 TB swap it for ``sortWithinPartitions`` + the same running-min sweep
to stay fully shuffle-free, or pre-bucket by an x-range so partitions
prune even harder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d_min(df: DataFrame, x: str, y: str) -> DataFrame:
    """Exact Pareto frontier minimizing columns ``x`` and ``y``."""
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(x).asc(), F.col(y).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_runmin", F.min(y).over(w))
        .filter(F.col("_runmin").isNull() | (F.col(y) <= F.col("_runmin")))
        .drop("_pid", "_runmin")
    )
    a = cand.alias("a")
    b = F.broadcast(cand.select(F.col(x).alias("_bx"), F.col(y).alias("_by")))
    dominated = (
        (F.col("_bx") <= F.col(f"a.{x}"))
        & (F.col("_by") <= F.col(f"a.{y}"))
        & ((F.col("_bx") < F.col(f"a.{x}")) | (F.col("_by") < F.col(f"a.{y}")))
    )
    return a.join(b, dominated, "left_anti")

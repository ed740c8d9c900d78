"""Joins (SURVEY.md §2.3 J1-J3) with explicit scale strategy.

Policy for 100 TB:
- dimension tables (region/nation/supplier/labels) → ``F.broadcast`` —
  no shuffle of the fact side at all;
- fact-fact joins (orders⋈lineitem) → shuffle on the natural key, AQE
  splits skewed partitions; both sides pre-filtered/pruned so the
  exchange carries only needed columns;
- membership tests against derived small sets → left-semi/anti with a
  broadcast build side, never ``isin(collect())``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """J1: fact × small dim (``merge(car_data, cluster_labels)`` at
    clustering.R:139-145) as a broadcast hash join."""
    return fact.join(F.broadcast(dim), on, how)


def semi_filter(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """J2/P7: ``x %in% derived_table`` membership filter
    (BigDataProject.R:154) as a broadcast left-semi join."""
    return df.join(F.broadcast(keys), on, "left_semi")


def anti_filter(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """NOT-IN counterpart (engine extension; free from Spark)."""
    return df.join(F.broadcast(keys), on, "left_anti")

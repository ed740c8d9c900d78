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


def upsert_merge(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: dict[str, str] | None = None,
) -> DataFrame:
    """SCD type-1 MERGE as a full-outer join (engine extension — the
    batch upsert every warehouse sync needs; Spark without a table
    format has no MERGE INTO, so the relational algebra is explicit):

    - key in both        → UPDATE: source values overwrite the mapped
      ``update_cols`` (``{target_col: source_col}``), rest kept;
    - key only in target → KEEP: row passes through unchanged;
    - key only in source → INSERT: new row, unmapped target columns null.

    Adds ``_action ∈ {update, keep, insert}`` so merge accounting is
    auditable (and oracle-checkable). Scale: a key-partitioned shuffle
    join; with a small source, wrap it in ``F.broadcast`` upstream."""
    update_cols = update_cols or {}
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    in_t = F.col(f"t.{key}").isNotNull()
    in_s = F.col(f"s.{key}").isNotNull()
    out_cols = [F.coalesce(F.col(f"t.{key}"), F.col(f"s.{key}")).alias(key)]
    for c in target.columns:
        if c == key:
            continue
        if c in update_cols:
            out_cols.append(
                F.when(in_s, F.col(f"s.{update_cols[c]}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    extra = [c for c in source.columns if c != key and c not in update_cols.values()]
    out_cols += [F.col(f"s.{c}").alias(c) for c in extra]
    action = (
        F.when(in_t & in_s, F.lit("update"))
        .when(in_t, F.lit("keep"))
        .otherwise(F.lit("insert"))
    )
    return joined.select(*out_cols, action.alias("_action"))

"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, normalizes both results (columns sorted by name, rows sorted by
all columns, timestamps stringified), and diffs them. Stricter than a
hash: shows the first mismatching cells.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from bigdata_carprice_assignment_spark.sources.readers import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    # close the connection: a 300-oracle sweep otherwise accumulates
    # live DuckDB connections (each pinning its buffer allocations) —
    # observed >60 GB RSS before the fix
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: list(v) if isinstance(v, (list, tuple)) else v)
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cell_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an == bn
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        # the driver hashes exact values: both sides round their doubles,
        # so post-round values must be bit-equal (tiny absolute epsilon
        # only for float-repr noise) — a relative tolerance here would
        # hide real driver-hash divergence at large magnitudes
        return fa == fb or abs(fa - fb) <= 1e-12
    return a == b


def compare(spark_df, oracle_pd: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    Type-strict: the driver's value hash is type-sensitive (round 2:
    DuckDB ``sum(BIGINT)`` → HUGEINT hash-red against Spark long with
    bit-equal values), so dtype mismatches fail BEFORE value compare —
    local green must predict driver green."""
    got_raw, want_raw = spark_df.toPandas(), oracle_pd
    problems: list[str] = []
    for c in sorted(set(got_raw.columns) & set(want_raw.columns)):
        gd, wd = got_raw[c].dtype, want_raw[c].dtype
        if pd.api.types.is_datetime64_any_dtype(gd) and pd.api.types.is_datetime64_any_dtype(wd):
            continue
        if str(gd) != str(wd):
            problems.append(
                f"{name}.{c}: dtype mismatch spark={gd} oracle={wd} "
                "(driver hash is type-sensitive — cast the oracle or the query)"
            )
    if problems:
        return problems
    got = normalize(got_raw)
    want = normalize(want_raw)
    if list(got.columns) != list(want.columns):
        return [f"{name}: schema mismatch spark={list(got.columns)} oracle={list(want.columns)}"]
    if len(got) != len(want):
        return [f"{name}: row count mismatch spark={len(got)} oracle={len(want)}"]
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        bad = [
            (i, g, w) for i, (g, w) in enumerate(zip(gv, wv)) if not _cell_equal(g, w)
        ]
        if bad:
            i, g, w = bad[0]
            problems.append(
                f"{name}.{c}: {len(bad)}/{len(gv)} cells differ; first at row {i}: "
                f"spark={g!r} oracle={w!r}"
            )
    return problems

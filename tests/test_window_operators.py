"""Direct unit coverage for the range-partitioned window operators
(operators/windows.py): equivalence with the single-task global-window
forms they replace, plus the edge cases the oracle queries never hit
(empty input, one row, heavy ties, n < n_tiles, num_ranges > rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_carprice_assignment_spark.operators.windows import (
    range_partitioned_cumsum,
    range_partitioned_ntile,
)


def _global_cumsum(df, order_cols, col):
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    return {
        tuple(r[c] for c in order_cols): r["ref"]
        for r in df.withColumn("ref", F.sum(col).over(w)).collect()
    }


@pytest.mark.parametrize("num_ranges", [1, 3, 32])
def test_cumsum_matches_global_window(spark, num_ranges):
    rows = [(i % 7, i, float(i) * 0.5 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    got = {
        (r["k"], r["i"]): r["cum_v"]
        for r in range_partitioned_cumsum(df, ["k", "i"], ["v"], num_ranges).collect()
    }
    want = _global_cumsum(df, ["k", "i"], "v")
    assert got == want


def test_cumsum_preserves_long_type_and_multiple_cols(spark):
    df = spark.createDataFrame([(1, 10, 2), (2, 20, 3), (3, 30, 4)], "o long, a long, b long")
    out = range_partitioned_cumsum(df, ["o"], ["a", "b"], 4)
    types = dict(out.dtypes)
    assert types["cum_a"] == "bigint" and types["cum_b"] == "bigint"
    rows = {r["o"]: (r["cum_a"], r["cum_b"]) for r in out.collect()}
    assert rows == {1: (10, 2), 2: (30, 5), 3: (60, 9)}


def test_cumsum_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "o long, v long")
    assert range_partitioned_cumsum(empty, ["o"], ["v"]).collect() == []
    one = spark.createDataFrame([(5, 7)], "o long, v long")
    [r] = range_partitioned_cumsum(one, ["o"], ["v"]).collect()
    assert (r["o"], r["cum_v"]) == (5, 7)


@pytest.mark.parametrize("n,tiles", [(100, 10), (7, 10), (10, 10), (23, 4)])
def test_ntile_matches_builtin(spark, n, tiles):
    # values with heavy ties; unique id is the tiebreak (total order)
    rows = [((i * 13) % 5, i) for i in range(n)]
    df = spark.createDataFrame(rows, "v long, id long")
    got = {
        r["id"]: r["tile"]
        for r in range_partitioned_ntile(df, ["v", "id"], tiles).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["ref"]
        for r in df.withColumn("ref", F.ntile(tiles).over(w)).collect()
    }
    assert got == want


def test_ntile_output_is_long(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "v long, id long")
    out = range_partitioned_ntile(df, ["v", "id"], 2)
    assert dict(out.dtypes)["tile"] == "bigint"


def test_ntile_empty_input(spark):
    # r11: the total now reads off the pinned rank (coalesced to 0 on
    # empty) instead of a second full input evaluation — empty input
    # must still yield zero rows, not a divide-by-zero.
    empty = spark.createDataFrame([], "v long, id long")
    assert range_partitioned_ntile(empty, ["v", "id"], 4).collect() == []

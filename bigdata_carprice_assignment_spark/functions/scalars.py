"""Scalar functions (SURVEY.md §2.6 F1-F12) as native Column expressions.

Design rule (SURVEY.md §2.10): every reference scalar helper lowers to
built-in ``pyspark.sql.functions`` — zero Python UDFs — so expressions
stay inside WholeStageCodegen and Catalyst can push/prune around them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def first_word(col: str | Column) -> Column:
    """F1: first whitespace-delimited token (``word(carname, 1)`` at
    BigDataProject.R:62 — brand extraction)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, " ", 1)


def clamp(col: str | Column, lo: float, hi: float) -> Column:
    """F6: clamp to [lo, hi] (IQR outlier cap, BigDataProject.R:99-115).

    Spark's least/greatest *skip* nulls (they return the extreme of the
    non-null operands), so nulls are preserved explicitly to match R's
    vectorized assignment leaving NA untouched.
    """
    c = F.col(col) if isinstance(col, str) else col
    clamped = F.greatest(F.least(c, F.lit(float(hi))), F.lit(float(lo)))
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(clamped)


def bucket_label_col(
    col: str | Column, breaks: Sequence[float], labels: Sequence[str]
) -> Column:
    """F7/F8: R ``cut(x, breaks, labels, include.lowest=TRUE)`` semantics —
    right-closed bins ``(b[i], b[i+1]]`` with the lowest break included in
    the first bin (BigDataProject.R:122-128; associationRules.R:24-51).

    Values outside (breaks[0], breaks[-1]] (and nulls) → null, as R yields
    NA. A ``when``-ladder on literals: whole-stage-codegen'd, no UDF.
    """
    if len(labels) != len(breaks) - 1:
        raise ValueError("need len(labels) == len(breaks) - 1")
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(c < F.lit(float(breaks[0])), F.lit(None).cast("string"))
    for hi, label in zip(breaks[1:], labels):
        expr = expr.when(c <= F.lit(float(hi)), F.lit(label))
    return expr.otherwise(F.lit(None).cast("string"))


def log1p_col(col: str | Column) -> Column:
    """F5: ``log(price + 1)`` (BigDataProject.R:130)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.log1p(c)


def un_onehot(flag_to_label: dict[str, str], default: str = "Unknown") -> Column:
    """F9: reverse one-hot — first flag column equal to 1 wins, else
    ``default`` (associationRules.R:54-69). The reference does this with a
    per-row loop; here it is a single ``coalesce`` projection, fully
    parallel and codegen'd.
    """
    whens = [
        F.when(F.col(flag) == 1, F.lit(label)) for flag, label in flag_to_label.items()
    ]
    return F.coalesce(*whens, F.lit(default))

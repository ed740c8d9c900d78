"""Hypothesis property tests (SURVEY.md §5 Tier-4) over the scalar and
cleaning operators — randomized inputs, invariant assertions. Spark round
trips are batched per example set (one DataFrame per property) to keep
the suite fast."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@st.composite
def breaks_and_labels(draw):
    n = draw(st.integers(min_value=2, max_value=6))
    raw = draw(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    breaks = sorted(raw)
    labels = [f"b{i}" for i in range(len(breaks) - 1)]
    return breaks, labels


class TestBucketSemanticsLocal:
    """Pure-python mirror of the when-ladder semantics, checked against
    Spark once below (the ladder is deterministic literal comparisons, so
    a single Spark equivalence run + exhaustive local properties is
    sound and fast)."""

    @staticmethod
    def local_bucket(x, breaks, labels):
        if x is None or math.isnan(x):
            return None
        if x < breaks[0]:
            return None
        for hi, lab in zip(breaks[1:], labels):
            if x <= hi:
                return lab
        return None

    @given(breaks_and_labels(), finite_doubles)
    @settings(max_examples=200, deadline=None)
    def test_coverage_and_disjointness(self, bl, x):
        breaks, labels = bl
        got = self.local_bucket(x, breaks, labels)
        in_range = breaks[0] <= x <= breaks[-1]
        assert (got is not None) == in_range

    @given(breaks_and_labels())
    @settings(max_examples=100, deadline=None)
    def test_boundaries_right_closed(self, bl):
        breaks, labels = bl
        # every internal break belongs to the bin it closes
        for i, b in enumerate(breaks[1:-1], start=0):
            assert self.local_bucket(b, breaks, labels) == labels[i]
        assert self.local_bucket(breaks[0], breaks, labels) == labels[0]
        assert self.local_bucket(breaks[-1], breaks, labels) == labels[-1]


def test_bucket_spark_matches_local_mirror(spark):
    """One Spark run pinning the Column ladder to the local mirror the
    properties above exercised."""
    import random

    from bigdata_carprice_assignment_spark.functions.scalars import bucket_label_col

    rng = random.Random(7)
    breaks = sorted(rng.uniform(-100, 100) for _ in range(5))
    labels = [f"b{i}" for i in range(4)]
    xs = [rng.uniform(-150, 150) for _ in range(500)] + list(breaks)
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = {
        round(r["x"], 9): r["b"]
        for r in df.select("x", bucket_label_col("x", breaks, labels).alias("b")).collect()
    }
    mirror = TestBucketSemanticsLocal.local_bucket
    for x in xs:
        assert got[round(x, 9)] == mirror(x, breaks, labels), x


@given(
    st.lists(finite_doubles, min_size=1, max_size=50),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_clamp_properties_local(xs, lo, width):
    """Clamp: idempotent, order-preserving, bounded (local mirror of the
    greatest/least expression, exact same float semantics)."""
    hi = lo + width
    clamp = lambda v: max(min(v, hi), lo)  # noqa: E731
    out = [clamp(v) for v in xs]
    assert all(lo <= v <= hi for v in out)
    assert [clamp(v) for v in out] == out  # idempotent
    for a, b in zip(xs, xs[1:]):
        ca, cb = clamp(a), clamp(b)
        assert (a <= b) == (ca <= cb) or ca == cb  # monotone (ties allowed)


def test_winsorize_invariants_spark(spark):
    """Winsorize invariants: full-range probs are the identity; clipped
    output matches numpy's type-7 clip; output range is within the
    original. (Exact idempotence does NOT hold for interpolating
    quantiles — the re-quantile interpolates just inside the caps — so
    that is deliberately not asserted.)"""
    import numpy as np

    rng = np.random.default_rng(3)
    vals = rng.lognormal(3, 2, 400)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    from bigdata_carprice_assignment_spark.operators.cleaning import winsorize

    ident = sorted(r["x"] for r in winsorize(df, ["x"], 0.0, 1.0).collect())
    assert np.allclose(ident, sorted(vals))

    clipped = np.sort(
        [r["x"] for r in winsorize(df, ["x"], 0.05, 0.95).collect()]
    )
    want = np.sort(np.clip(vals, np.quantile(vals, 0.05), np.quantile(vals, 0.95)))
    assert np.allclose(clipped, want)
    assert clipped.min() >= vals.min() and clipped.max() <= vals.max()


@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=30), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_jaccard_bounds_local(texts):
    """Shingle-set Jaccard stays in [0,1] and self-similarity is 1 (local
    mirror of the array_intersect/union expressions)."""

    def sh(t, n=3):
        tok = t.split()
        if not tok:
            return {""}
        k = max(len(tok) - n + 1, 1)
        return {" ".join(tok[i : i + n]) for i in range(k)}

    for t1 in texts:
        s1 = sh(t1)
        assert len(s1 & s1) / len(s1 | s1) == 1.0
        for t2 in texts:
            s2 = sh(t2)
            j = len(s1 & s2) / len(s1 | s2)
            assert 0.0 <= j <= 1.0


# ---------------------------------------------------------------------------
# Round-8 machinery properties (engine-free: pure math mirrors)
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=8, max_value=24),
    st.sampled_from([0.85, 0.9, 0.92, 0.94, 0.97]),
    st.sampled_from([1e-1, 1e-2, 1e-3, 1e-4]),
)
@settings(max_examples=200, deadline=None)
def test_srp_adaptive_bands_honor_miss_contract(bits, design_cos, miss):
    """bands = ceil(ln miss / ln(1-p1)) must make the actual per-pair
    miss probability (1-p1)^bands <= miss at the design cosine, for
    every width/contract combination — the invariant whose violation
    was the round-7 recall leak."""
    import math

    from bigdata_carprice_assignment_spark.llm.similarity import (
        srp_adaptive_bands,
    )

    bands = srp_adaptive_bands(bits, design_cos, miss)
    p1 = (1.0 - math.acos(design_cos) / math.pi) ** bits
    assert (1.0 - p1) ** bands <= miss + 1e-12
    # and the sizing is not wasteful beyond the floor: one band fewer
    # would violate the contract (when above the 6-band floor)
    if bands > 6:
        assert (1.0 - p1) ** (bands - 1) > miss


@given(
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=30, max_value=120),
    st.randoms(use_true_random=False),
)
@settings(max_examples=25, deadline=None)
def test_lm_solve_matches_numpy_lstsq(p, n, rnd):
    """The generated correlation-Cholesky solve must agree with numpy
    lstsq on random well-conditioned regression problems (same
    sufficient-statistics inputs)."""
    import numpy as np

    from bigdata_carprice_assignment_spark.queries import carprice as C

    rng = np.random.default_rng(rnd.randrange(2**32))
    X = rng.normal(size=(n, p))
    beta = rng.normal(size=p)
    y = X @ beta + 1.0 + rng.normal(scale=0.1, size=n)
    preds = C._LM_PREDS[:p]
    row = {"n": float(n), "sy": float(y.sum()), "syy": float((y * y).sum())}
    for i in range(p):
        row[f"s{i}"] = float(X[:, i].sum())
        row[f"sy{i}"] = float((X[:, i] * y).sum())
        for j in range(i, p):
            row[f"s{i}_{j}"] = float((X[:, i] * X[:, j]).sum())
    import unittest.mock as mock

    with mock.patch.object(C, "_LM_PREDS", preds):
        got = dict(C._lm_solve(row))
    A = np.column_stack([np.ones(n), X])
    want = np.linalg.lstsq(A, y, rcond=None)[0]
    assert got["(intercept)"] == pytest.approx(want[0], abs=1e-6)
    for i, name in enumerate(preds):
        assert got[name] == pytest.approx(want[i + 1], abs=1e-6)


@given(st.lists(st.floats(min_value=-50, max_value=50), min_size=20, max_size=80))
@settings(max_examples=50, deadline=None)
def test_stump_split_minimizes_sse(ys):
    """The exact stump criterion (left SSE + right SSE from sums) must
    equal the definitionally-computed SSE for every candidate — the
    identity the CART/boosting/bagging twins all rely on."""
    import numpy as np

    y = np.asarray(ys, dtype=float)
    x = np.arange(len(y), dtype=float)
    for thr in x[5:-5]:
        lm = x <= thr
        nl, nr = lm.sum(), (~lm).sum()
        yl, yr = y[lm], y[~lm]
        via_sums = (
            float((yl**2).sum()) - float(yl.sum()) ** 2 / nl
        ) + (float((yr**2).sum()) - float(yr.sum()) ** 2 / nr)
        definitional = float(((yl - yl.mean()) ** 2).sum()) + float(
            ((yr - yr.mean()) ** 2).sum()
        )
        assert via_sums == pytest.approx(definitional, abs=1e-6)

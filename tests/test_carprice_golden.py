"""Tier-2 golden-file parity (SURVEY.md §5): the deterministic pipeline
phases recomputed in Spark must match the reference's committed outputs
cell-for-cell (numeric tol 1e-9, strings exact).

Goldens: /root/reference/car_prices_cleaned.csv (205×30),
/root/reference/car_prices_ml_ready.csv (205×35). km_cluster is excluded
(model-dependent, seed/implementation-specific)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bigdata_carprice_assignment_spark.pipelines import carprice

CLEAN_GOLDEN = "/root/reference/car_prices_cleaned.csv"
ML_GOLDEN = "/root/reference/car_prices_ml_ready.csv"


@pytest.fixture(scope="module")
def cleaned(spark):
    return carprice.clean(carprice.load_raw(spark)).toPandas()


def test_cleaned_matches_golden(cleaned):
    gold = pd.read_csv(CLEAN_GOLDEN)
    ours = cleaned
    # align: golden carries km_cluster (model output, out of scope)
    check_cols = [c for c in gold.columns if c != "km_cluster"]
    assert set(check_cols) <= set(ours.columns), set(check_cols) - set(ours.columns)
    assert len(ours) == len(gold) == 205
    for c in check_cols:
        g = gold[c]
        o = ours[c]
        if g.dtype == object:
            assert (g.fillna("∅").values == o.fillna("∅").values).all(), c
        else:
            assert np.allclose(
                o.astype(float).values, g.astype(float).values, atol=1e-9
            ), f"{c}: max diff {np.abs(o.astype(float).values - g.astype(float).values).max()}"


def test_ml_ready_matches_golden(spark, cleaned):
    gold = pd.read_csv(ML_GOLDEN)
    df = carprice.clean(carprice.load_raw(spark))
    ours = carprice.ml_ready(df, target="price").toPandas()
    # golden names use R's `brand.x`; ours use `brand_x`
    rename = {c: c.replace("brand.", "brand_") for c in gold.columns}
    gold = gold.rename(columns=rename)
    assert list(gold.columns) == list(ours.columns)
    assert len(ours) == len(gold) == 205
    for c in gold.columns:
        assert np.allclose(
            ours[c].astype(float).values, gold[c].astype(float).values, atol=1e-9
        ), c


def test_price_bucket_quartile_coverage(cleaned):
    counts = cleaned["price_bucket"].value_counts()
    assert set(counts.index) == {"Low", "Medium", "High", "VeryHigh"}
    assert counts.sum() == 205
    # quartile buckets: balanced to within rounding of n/4
    assert counts.min() >= 45 and counts.max() <= 60


def test_iqr_mode_leaves_price_untouched(spark):
    raw = carprice.load_raw(spark)
    iqr_cleaned = carprice.clean(raw, cap="iqr").toPandas()
    raw_pd = raw.toPandas()
    assert np.allclose(
        sorted(iqr_cleaned["price"].values), sorted(raw_pd["price"].astype(float).values)
    )


def test_iqr_cap_idempotent(spark):
    """Tier-4 property: capping an already-capped frame is a no-op."""
    from bigdata_carprice_assignment_spark.operators.cleaning import cap_outliers_iqr

    df = carprice.clean(carprice.load_raw(spark), cap="iqr")
    once = df.toPandas()
    twice = cap_outliers_iqr(
        df, [c for c in carprice.numeric_cols(df) if c != "price"]
    ).toPandas()
    for c in carprice.numeric_cols(df):
        assert np.allclose(once[c].values, twice[c].values, atol=1e-12), c

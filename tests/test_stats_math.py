"""Pin the driver-side special functions to published table values
(standard statistical tables; tolerances reflect table precision)."""

from __future__ import annotations

import math

import pytest

from bigdata_carprice_assignment_spark.operators import stats_math as sm


def test_betainc_symmetry_and_known():
    assert sm.betainc(1, 1, 0.3) == pytest.approx(0.3, abs=1e-12)
    # I_x(a,b) + I_{1-x}(b,a) = 1
    assert sm.betainc(2.5, 1.5, 0.4) + sm.betainc(1.5, 2.5, 0.6) == pytest.approx(
        1.0, abs=1e-12
    )


def test_t_distribution_critical_values():
    # two-sided p at the classic 5% critical points
    assert sm.t_test_p_two_sided(12.706, 1) == pytest.approx(0.05, rel=1e-3)
    assert sm.t_test_p_two_sided(2.228, 10) == pytest.approx(0.05, rel=1e-3)
    assert sm.t_test_p_two_sided(1.96, 1e9) == pytest.approx(0.05, rel=1e-3)


def test_f_distribution_critical_values():
    # F(0.95; d1, d2) upper critical values from standard tables
    assert sm.f_sf(4.965, 1, 10) == pytest.approx(0.05, rel=2e-3)
    assert sm.f_sf(2.866, 4, 20) == pytest.approx(0.05, rel=5e-3)


def test_chi2_critical_values():
    assert sm.chi2_sf(3.841, 1) == pytest.approx(0.05, rel=1e-3)
    assert sm.chi2_sf(18.307, 10) == pytest.approx(0.05, rel=1e-3)


def test_norm_cdf():
    assert sm.norm_cdf(0.0) == pytest.approx(0.5, abs=1e-15)
    assert sm.norm_cdf(1.959964) == pytest.approx(0.975, abs=1e-6)


def test_studentized_range_critical_values():
    # q(0.95; k, df) from published studentized-range tables
    assert sm.ptukey(3.877, 3, 10) == pytest.approx(0.95, abs=2e-3)
    assert sm.ptukey(3.578, 3, 20) == pytest.approx(0.95, abs=2e-3)
    assert sm.ptukey(3.845, 4, 30) == pytest.approx(0.95, abs=2e-3)
    # infinite-df branch
    assert sm.ptukey(3.314, 3, 1e7) == pytest.approx(0.95, abs=2e-3)


def test_welch_ttest_against_hand_computation(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.normal(10.0, 2.0, 80)
    b = rng.normal(11.0, 3.0, 60)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "grp string, x double")

    from bigdata_carprice_assignment_spark.operators.stats import welch_ttest

    got = welch_ttest(df, "x", "grp", "a", "b").first()
    # hand Welch with numpy
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2a, se2b = va / len(a), vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2a + se2b)
    dof = (se2a + se2b) ** 2 / (se2a**2 / (len(a) - 1) + se2b**2 / (len(b) - 1))
    assert got["t_stat"] == pytest.approx(t, rel=1e-12)
    assert got["df"] == pytest.approx(dof, rel=1e-12)
    assert 0.0 <= got["p_value"] <= 1.0


def test_mann_whitney_and_ks_on_known_sample(spark, tmp_path):
    """Hand-computed example: URGENT=[1,2,3], LOW=[4,5,6] ⇒ U1=0, U2=9,
    mu=4.5, sigma=√(9/12·7)=2.291288 (no ties), KS D=1.0 — pins the
    formulas, while the DuckDB oracle pins cross-engine parity."""
    import pandas as pd

    from bigdata_carprice_assignment_spark.queries.statistics import (
        ks_statistic_priority,
        mann_whitney_components,
    )

    pdf = pd.DataFrame(
        {
            "o_totalprice": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "o_orderpriority": ["1-URGENT"] * 3 + ["5-LOW"] * 3,
        }
    )
    pdf.to_parquet(tmp_path / "orders.parquet")
    r = mann_whitney_components(spark, str(tmp_path)).first()
    assert (r["n1"], r["n2"]) == (3, 3)
    assert r["rank_sum_1"] == 6.0 and r["u1"] == 0.0 and r["u2"] == 9.0
    assert r["mu_u"] == 4.5 and abs(r["sigma_u"] - 2.291288) < 1e-6
    k = ks_statistic_priority(spark, str(tmp_path)).first()
    assert k["ks_d"] == 1.0

"""Tier-3 metric-bound tests for ML operators (SURVEY.md §5): structural
parity with R models is impossible (different inits/pruning), so we assert
the model-quality envelope and behavioral invariants instead."""

from __future__ import annotations

import pytest

from bigdata_carprice_assignment_spark.ml import pipelines as mlp
from bigdata_carprice_assignment_spark.pipelines import carprice as cp


@pytest.fixture(scope="module")
def cleaned(spark):
    return cp.clean(cp.load_raw(spark)).cache()


NUMERIC = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth", "price"]
FEAT_NUMERIC = [c for c in cp.ML_VARS if c not in ("log_price", "brand")]


def test_linear_regression_quality(cleaned):
    """lm(log_price ~ .) explains most price variance on this data (the
    reference's printed R² is ~0.9-range on caret's y-stratified split;
    with a uniform randomSplit we bound at 0.65 on the harder $-scale)."""
    train, test = mlp.train_test_split(cleaned, 0.8, seed=123)
    model = mlp.fit_regression(train, FEAT_NUMERIC, ["brand"], "log_price", "lm")
    m = mlp.regression_metrics_dollars(model, test, "log_price")
    assert m["r2"] > 0.65, m
    assert 0 < m["rmse"] < 6000, m


def test_random_forest_beats_constant(cleaned):
    train, test = mlp.train_test_split(cleaned, 0.8, seed=123)
    model = mlp.fit_regression(train, FEAT_NUMERIC, ["brand"], "log_price", "rf")
    m = mlp.regression_metrics_dollars(model, test, "log_price")
    assert m["r2"] > 0.7, m


def test_naive_bayes_beats_chance(cleaned):
    train, test = mlp.train_test_split(cleaned, 0.8, seed=123)
    model = mlp.fit_naive_bayes(train, NUMERIC[:-1], "price_bucket")
    from pyspark.sql import functions as F

    test_idx = model.stages[0].transform(test)
    acc = mlp.classifier_accuracy(model, test)
    # 4 balanced quartile classes → chance = 0.25
    assert acc > 0.5, acc
    cm = mlp.confusion_matrix(model, test, "price_bucket")
    total = cm.agg(F.sum("n")).first()[0]
    assert total == test.count()


def test_kmeans_wss_monotone_nonincreasing(cleaned):
    """Tier-3: WSS must not increase with k (elbow sanity)."""
    from pyspark.ml import Pipeline

    feats = (
        Pipeline(stages=mlp.feature_stages(NUMERIC, standardize=True))
        .fit(cleaned)
        .transform(cleaned)
    )
    wss = mlp.kmeans_elbow(feats, [1, 2, 3, 5, 8], seed=123)
    values = [v for _, v in wss]
    assert all(a >= b - 1e-6 for a, b in zip(values, values[1:])), values


def test_unscaled_centers_in_data_range(cleaned):
    model = mlp.fit_kmeans(cleaned, NUMERIC, k=3, seed=123)
    centers = mlp.unscale_centers(model, NUMERIC)
    stats = {c: (r["min"], r["max"]) for c in NUMERIC for r in [
        cleaned.selectExpr(f"min({c}) as min", f"max({c}) as max").first()
    ]}
    for center in centers:
        for c in NUMERIC:
            lo, hi = stats[c]
            assert lo - 1e-6 <= center[c] <= hi + 1e-6, (c, center[c], lo, hi)


def test_pca_variance_sums_below_one(cleaned):
    _, _, explained = mlp.pca_project(cleaned, NUMERIC, k=2)
    assert 0 < sum(explained) <= 1.0 + 1e-9
    assert explained[0] >= explained[1] > 0


def test_minmax_scale_bounds(cleaned):
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    scaled = mlp.minmax_scale(cleaned, NUMERIC).withColumn(
        "arr", vector_to_array("scaled")
    )
    mins = scaled.select(F.array_min("arr").alias("v")).agg(F.min("v")).first()[0]
    maxs = scaled.select(F.array_max("arr").alias("v")).agg(F.max("v")).first()[0]
    assert mins >= -1e-9 and maxs <= 1.0 + 1e-9


def test_lm_coefficients_match_numpy(spark, cleaned):
    """M3 exact-parity check: Spark's normal-equation OLS must reproduce
    numpy's least squares on the identical design matrix (SURVEY.md M3:
    'exact coefficient parity achievable')."""
    import numpy as np

    from bigdata_carprice_assignment_spark.pipelines import carprice as cp

    ml = cp.ml_ready(cleaned, target="log_price").toPandas()
    X = ml.drop(columns=["log_price"]).to_numpy(dtype=float)
    y = ml["log_price"].to_numpy(dtype=float)
    Xd = np.hstack([X, np.ones((len(X), 1))])
    beta, *_ = np.linalg.lstsq(Xd, y, rcond=None)

    feat_cols = [c for c in ml.columns if c != "log_price"]
    model = mlp.fit_regression(
        cleaned.dropna(),
        [c for c in cp.ML_VARS if c not in ("log_price", "brand")],
        ["brand"],
        "log_price",
        "lm",
    )
    lr = model.stages[-1]
    # Spark's feature order: numeric features then OHE slots in indexer
    # (alphabetAsc) order minus the dropped last slot — reconstruct and
    # compare the full coefficient vector including intercept.
    spark_coefs = np.array(list(lr.coefficients))
    # The two dummy encodings drop different levels, but both are
    # full-rank parameterizations of the same column space, so the
    # NUMERIC coefficients are identical; intercept/dummy blocks are
    # parameterization-dependent and not compared directly.
    numeric_n = len([c for c in cp.ML_VARS if c not in ("log_price", "brand")])
    assert np.allclose(spark_coefs[:numeric_n], beta[:numeric_n], atol=1e-6), (
        spark_coefs[:numeric_n],
        beta[:numeric_n],
    )
    # and the fit explains the same variance (parameterization-free)
    yhat_np = Xd @ beta
    ss_res_np = float(np.sum((y - yhat_np) ** 2))
    assert lr.summary.meanSquaredError * len(y) == pytest.approx(ss_res_np, rel=1e-6)
    assert feat_cols  # design matrix non-empty


def test_tuned_gbt_runs_and_predicts(cleaned):
    """M8 slot: CV-tuned GBT fits and beats a trivial baseline."""
    train, test = mlp.train_test_split(cleaned, 0.8, seed=123)
    model = mlp.tuned_gbt(train, FEAT_NUMERIC, ["brand"], "log_price")
    m = mlp.regression_metrics_dollars(model, test, "log_price")
    assert m["r2"] > 0.6, m


def test_kde_naive_bayes_beats_chance_and_tracks_gaussian(spark):
    """Kernel NB (the reference's actual usekernel=TRUE estimator) must
    beat chance clearly on the price-bucket task and land in the same
    accuracy regime as the gaussian variant (the two differ only in the
    class-conditional density family)."""
    from bigdata_carprice_assignment_spark.ml import pipelines as mlp
    from bigdata_carprice_assignment_spark.ml.kde_nb import fit_kde_naive_bayes
    from bigdata_carprice_assignment_spark.pipelines import carprice as cp
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    df = cp.clean(cp.load_raw(spark)).localCheckpoint()
    numeric = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth"]
    train, test = mlp.train_test_split(df, 0.8, seed=123)
    model = fit_kde_naive_bayes(train, numeric, "price_bucket")
    pred = model.transform(test)
    n = pred.count()
    acc = pred.filter(F.col("predicted") == F.col("price_bucket")).count() / n
    assert acc > 0.5  # 4 balanced classes — chance is 0.25
    g = mlp.fit_naive_bayes(train, numeric, "price_bucket")
    gacc = mlp.classifier_accuracy(g, test)
    # same regime: kernel NB within 0.2 absolute of gaussian NB
    assert abs(acc - gacc) < 0.2
    # deterministic: refit + repredict reproduces the confusion exactly
    again = fit_kde_naive_bayes(train, numeric, "price_bucket")
    c1 = sorted(map(tuple, model.confusion(test, "price_bucket").collect()))
    c2 = sorted(map(tuple, again.confusion(test, "price_bucket").collect()))
    assert c1 == c2


def test_lm_exact_closed_form_matches_numpy(spark):
    """carprice_lm_coefficients_exact: the closed-form normal-equation
    solve (shared algebra with its DuckDB oracle) must agree with
    numpy's lstsq on the identical design matrix to ~1e-6 — pins the
    generated Cholesky recurrences to an independent solver."""
    import numpy as np

    from bigdata_carprice_assignment_spark.queries import carprice as qc

    got = {
        r["feature"]: r["coefficient"]
        for r in qc.carprice_lm_coefficients_exact(spark, "").collect()
    }
    ml = qc.carprice_ml_matrix(spark, "").toPandas()
    X = ml[qc._LM_PREDS].to_numpy(dtype=float)
    y = np.log1p(ml["price"].to_numpy(dtype=float))
    Xd = np.hstack([np.ones((len(X), 1)), X])
    beta, *_ = np.linalg.lstsq(Xd, y, rcond=None)
    assert abs(got["(intercept)"] - beta[0]) < 1e-5
    for i, c in enumerate(qc._LM_PREDS):
        assert abs(got[c] - beta[i + 1]) < 1e-5, c


def test_kde_nb_degenerate_class_and_null_features(spark):
    """A class whose numeric feature is entirely NULL must still fit
    (labels come from the priors pass) and predict without KeyError or
    interp on a non-increasing grid; the all-NULL cell contributes only
    the threshold floor."""
    from bigdata_carprice_assignment_spark.ml.kde_nb import fit_kde_naive_bayes

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", None), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "cls string, x double")
    model = fit_kde_naive_bayes(df, ["x"], "cls")
    assert model.labels == ["a", "b"]
    out = {r["cls"]: r["predicted"] for r in model.transform(df).collect()}
    assert out["a"] in ("a", "b")  # must not raise; sane output shape


def test_pca_power_iteration_matches_numpy(spark):
    """carprice_top_pca_eigen_exact: the 40-step power iteration (shared
    algebra with its DuckDB oracle) must agree with numpy's exact
    eigendecomposition of the same correlation matrix."""
    import numpy as np

    from bigdata_carprice_assignment_spark.queries import carprice as qc

    got = {
        r["component"]: r["value"]
        for r in qc.carprice_top_pca_eigen_exact(spark, "").collect()
    }
    ml = qc._cleaned(spark).select(*qc._PCA_COLS).dropna().toPandas()
    R = np.corrcoef(ml.to_numpy(dtype=float), rowvar=False)
    evals, evecs = np.linalg.eigh(R)
    assert abs(got["eigenvalue_top"] - evals[-1]) < 1e-5
    v = evecs[:, -1]
    v = v if v[0] >= 0 else -v
    for i, c in enumerate(qc._PCA_COLS):
        assert abs(got[f"loading_{c}"] - v[i]) < 1e-5, c

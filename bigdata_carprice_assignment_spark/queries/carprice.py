"""Reference-parity pipeline queries (rows-only: the CarPrice CSV is not
among the oracle's registered views; cell-level parity is asserted by the
Tier-2 golden tests in tests/test_carprice_golden.py instead).

These run the reference's actual workload end-to-end on its actual data —
a user of the reference can call these and get its outputs from Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import pipelines as mlp
from ..operators import rules as R
from ..pipelines import carprice as cp
from ..registry import query


def _cleaned(spark: SparkSession) -> DataFrame:
    # Catalyst's constraint propagation is exponential over the wide
    # clamp/bucket CASE-WHEN chains in clean() and OOMs inside ML fits;
    # disable it for whatever session runs these queries (the driver's
    # session doesn't use our factory), and cut lineage before the model
    # fits — 205 rows, so the checkpoint is free.
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    return cp.clean(cp.load_raw(spark)).localCheckpoint()


@query("carprice_cleaned")
def carprice_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 phases 1-5 (clean/impute/cap/bucket) — golden-parity table."""
    return _cleaned(spark)


@query("carprice_ml_matrix")
def carprice_ml_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 8 one-hot ML matrix (golden: car_prices_ml_ready.csv)."""
    return cp.ml_ready(_cleaned(spark), target="price")


@query("carprice_model_metrics")
def carprice_model_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3-M6 regression battery: lm/tree/rf on log_price, metrics on the
    back-transformed $ scale (BigDataProject.R:305-347), seed=123."""
    df = _cleaned(spark)
    numeric = [c for c in cp.ML_VARS if c not in ("log_price", "brand")]
    train, test = mlp.train_test_split(df.dropna(), 0.8, seed=123)
    rows = []
    for kind in ("lm", "tree", "rf"):
        model = mlp.fit_regression(
            train, numeric, ["brand"], label="log_price", kind=kind
        )
        m = mlp.regression_metrics_dollars(model, test, label="log_price")
        rows.append((kind, round(m["rmse"], 2), round(m["r2"], 4), round(m["mae"], 2)))
    return spark.createDataFrame(
        rows, "model string, rmse_dollars double, r2 double, mae_dollars double"
    )


@query("carprice_nb_confusion")
def carprice_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: gaussian NB price-bucket classifier + A14 confusion counts
    (BigDataProject.R:349-364)."""
    df = _cleaned(spark)
    numeric = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth"]
    train, test = mlp.train_test_split(df, 0.8, seed=123)
    model = mlp.fit_naive_bayes(train, numeric, "price_bucket")
    return mlp.confusion_matrix(model, test, "price_bucket")


@query("carprice_kmeans_profile")
def carprice_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9-M11: k=3 k-means on standardized numeric features; cluster sizes
    + un-scaled centers (clustering.R:36-90)."""
    df = _cleaned(spark)
    numeric = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth", "price"]
    model = mlp.fit_kmeans(df, numeric, k=3, seed=123)
    assigned = model.transform(df)
    sizes = assigned.groupBy(F.col("prediction").alias("cluster")).agg(
        F.count(F.lit(1)).alias("size")
    )
    centers = mlp.unscale_centers(model, numeric)
    spark_centers = spark.createDataFrame(
        [(c["cluster"], *[round(c[n], 4) for n in numeric]) for c in centers],
        f"cluster int, {', '.join(f'{n} double' for n in numeric)}",
    )
    return sizes.join(spark_centers, "cluster").orderBy("cluster")


@query("carprice_elbow_curve")
def carprice_elbow_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 elbow: (k, WSS) over k=1..8 on cached standardized features
    (BigDataProject.R:397-416)."""
    df = _cleaned(spark)
    numeric = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth", "price"]
    from pyspark.ml import Pipeline

    feats = Pipeline(stages=mlp.feature_stages(numeric, standardize=True)).fit(df).transform(df)
    wss = mlp.kmeans_elbow(feats, range(1, 9), seed=123)
    return spark.createDataFrame(
        [(k, round(v, 4)) for k, v in wss], "k int, wss double"
    )


@query("carprice_pca_variance")
def carprice_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12: 2-component PCA explained variance (BigDataProject.R:443-460)."""
    df = _cleaned(spark)
    numeric = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth", "price"]
    _, _, explained = mlp.pca_project(df, numeric, k=2)
    return spark.createDataFrame(
        [(i + 1, round(v, 6)) for i, v in enumerate(explained)],
        "component int, explained_variance double",
    )


@query("carprice_lm_coefficients")
def carprice_lm_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 introspection: OLS coefficients of lm(log_price ~ .) on the
    full ml matrix (deterministic — normal-equation solver; pinned to
    numpy's lstsq in tests/test_ml.py::test_lm_coefficients_match_numpy)."""
    df = _cleaned(spark)
    numeric = [c for c in cp.ML_VARS if c not in ("log_price", "brand")]
    model = mlp.fit_regression(df.dropna(), numeric, ["brand"], "log_price", "lm")
    lr = model.stages[-1]
    rows = [("(intercept)", round(float(lr.intercept), 8))]
    rows += [
        (f"f{i}", round(float(c), 8)) for i, c in enumerate(lr.coefficients)
    ]
    return spark.createDataFrame(rows, "feature string, coefficient double")


@query("carprice_rf_feature_importances")
def carprice_rf_feature_importances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 introspection: randomForest importance()/varImpPlot analogue
    (BigDataProject.R:338-347) via .featureImportances, numeric features
    named, one-hot slots aggregated under 'brand'."""
    df = _cleaned(spark)
    numeric = [c for c in cp.ML_VARS if c not in ("log_price", "brand")]
    model = mlp.fit_regression(df.dropna(), numeric, ["brand"], "log_price", "rf")
    rf = model.stages[-1]
    imp = rf.featureImportances
    named = {c: float(imp[i]) for i, c in enumerate(numeric)}
    named["brand"] = float(sum(imp[i] for i in range(len(numeric), imp.size)))
    rows = sorted(
        ((k, round(v, 6)) for k, v in named.items()), key=lambda t: (-t[1], t[0])
    )
    return spark.createDataFrame(rows, "feature string, importance double")


@query("carprice_radar_profile")
def carprice_radar_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 radar reduction: per-cluster means min-max normalized to [0,1]
    (A2 + M13, BigDataProject.R:493-529)."""
    from ..operators.aggregates import group_means, minmax

    df = _cleaned(spark)
    numeric = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth", "price"]
    model = mlp.fit_kmeans(df, numeric, k=3, seed=123)
    assigned = model.transform(df).withColumnRenamed("prediction", "cluster")
    means = group_means(assigned, "cluster", numeric)
    bounds = minmax(means, numeric)
    norm = means.select(
        "cluster",
        *[
            F.round(
                (F.col(c) - F.lit(bounds[c][0]))
                / F.lit(max(bounds[c][1] - bounds[c][0], 1e-12)),
                6,
            ).alias(c)
            for c in numeric
        ],
    )
    return norm.orderBy("cluster")


@query("carprice_cluster_anova")
def carprice_cluster_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 statistical self-validation (BigDataProject.R:531-537;
    clustering.R:210-215): one-way ANOVA of each feature across the k=3
    cluster assignment — the pipeline checking its own clustering for
    separation. Rows: feature, f_stat, p_value, significant."""
    from ..operators import stats

    df = _cleaned(spark)
    numeric = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth", "price"]
    model = mlp.fit_kmeans(df, numeric, k=3, seed=123)
    assigned = model.transform(df).withColumn(
        "cluster", F.col("prediction").cast("string")
    )
    # all features in ONE melt+groupBy pass (not one Spark job each)
    multi = stats.oneway_anova_multi(assigned, numeric, "cluster").collect()
    rows = [
        (
            r["feature"],
            round(float(r["f_stat"]), 4),
            float(r["p_value"]),
            bool(r["p_value"] < 0.05),
        )
        for r in multi
    ]
    return spark.createDataFrame(
        rows, "feature string, f_stat double, p_value double, significant boolean"
    )


@query("carprice_rules_top_lift")
def carprice_rules_top_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 11: apriori(supp=0.02, conf=0.6, minlen=2) over
    price_bucket/brand_top/carbody/fueltype, top-20 by lift
    (BigDataProject.R:554-563)."""
    df = _cleaned(spark)
    top10 = [
        r["brand"]
        for r in df.groupBy("brand")
        .count()
        .orderBy(F.desc("count"), F.asc("brand"))
        .limit(10)
        .collect()
    ]
    df = df.withColumn(
        "brand_top",
        F.when(F.col("brand").isin(top10), F.col("brand")).otherwise(F.lit("Other")),
    )
    tx = R.to_transactions(df, ["price_bucket", "brand_top", "carbody", "fueltype"])
    _, rules = R.mine_rules(tx, min_support=0.02, min_confidence=0.6, min_len=2, max_len=10)
    return (
        rules.select(
            F.concat_ws(",", F.sort_array("antecedent")).alias("antecedent"),
            F.concat_ws(",", "consequent").alias("consequent"),
            F.round("support", 6).alias("support"),
            F.round("confidence", 6).alias("confidence"),
            F.round("lift", 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(20)
    )


@query("carprice_loess_smooth")
def carprice_loess_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loess curve for the price~horsepower scatter — the data behind
    geom_smooth(method="loess") (BigDataProject.R:140-144), the one
    reference output previously declared viz-out-of-scope. Tricube-
    weighted local LINEAR fits (degree 1; R's default is degree 2 —
    documented fidelity delta) at 40 evaluation points, span 0.75.

    Report-sized by construction (205 points, like write_csv_single):
    the fit runs driver-side numpy on the collected pairs; a data-sized
    smoother would bin x and fit per-bin partial sums distributed."""
    import numpy as np

    pdf = (
        _cleaned(spark)
        .select("horsepower", "price")
        .dropna()
        .toPandas()
        .sort_values("horsepower")
    )
    x = pdf["horsepower"].to_numpy(dtype=float)
    y = pdf["price"].to_numpy(dtype=float)
    n = len(x)
    k = max(2, int(np.ceil(0.75 * n)))  # span window size
    grid = np.linspace(x.min(), x.max(), 40)
    rows = []
    for g in grid:
        d = np.abs(x - g)
        h = np.partition(d, k - 1)[k - 1] or 1.0
        w = np.clip(1 - (d / h) ** 3, 0, None) ** 3  # tricube
        W = w.sum()
        xm = (w * x).sum() / W
        ym = (w * y).sum() / W
        sxx = (w * (x - xm) ** 2).sum()
        slope = 0.0 if sxx == 0 else (w * (x - xm) * (y - ym)).sum() / sxx
        rows.append((float(g), float(round(ym + slope * (g - xm), 2))))
    return spark.createDataFrame(rows, "horsepower double, smoothed_price double")

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


# DuckDB oracle for the full cleaned table: replays the reference pipeline
# (BigDataProject.R:41-130) in SQL on the reference CSV itself —
# trim-on-read (the typed CSV scan sets ignoreLeading/TrailingWhiteSpace,
# matching the committed golden), brand = first word, all 16 numeric
# columns winsorized at the type-7 1%/99% quantiles (quantile_cont IS
# type 7 — bit-identical interpolation to Spark percentile), R `cut`
# right-closed price-quartile buckets, log_price = ln(1+price).
# Imputation is a no-op on this dataset (zero NAs — asserted in
# tests/test_carprice_golden.py territory), so the SQL omits it.
_CLEANED_ORACLE = """
WITH raw AS (
  SELECT * FROM read_csv('/root/reference/CarPrice_Assignment.csv', header=true)
),
base AS (
  SELECT car_ID::DOUBLE AS car_id, symboling::DOUBLE AS symboling,
         trim(CarName) AS carname, fueltype, aspiration, doornumber, carbody,
         drivewheel, enginelocation, wheelbase::DOUBLE AS wheelbase,
         carlength::DOUBLE AS carlength, carwidth::DOUBLE AS carwidth,
         carheight::DOUBLE AS carheight, curbweight::DOUBLE AS curbweight,
         enginetype, cylindernumber, enginesize::DOUBLE AS enginesize,
         fuelsystem, boreratio::DOUBLE AS boreratio, stroke::DOUBLE AS stroke,
         compressionratio::DOUBLE AS compressionratio,
         horsepower::DOUBLE AS horsepower, peakrpm::DOUBLE AS peakrpm,
         citympg::DOUBLE AS citympg, highwaympg::DOUBLE AS highwaympg,
         price::DOUBLE AS price, split_part(trim(CarName), ' ', 1) AS brand
  FROM raw
),
q AS (
  SELECT quantile_cont(car_id, 0.01) AS car_id_lo, quantile_cont(car_id, 0.99) AS car_id_hi,
    quantile_cont(symboling, 0.01) AS symboling_lo, quantile_cont(symboling, 0.99) AS symboling_hi,
    quantile_cont(wheelbase, 0.01) AS wheelbase_lo, quantile_cont(wheelbase, 0.99) AS wheelbase_hi,
    quantile_cont(carlength, 0.01) AS carlength_lo, quantile_cont(carlength, 0.99) AS carlength_hi,
    quantile_cont(carwidth, 0.01) AS carwidth_lo, quantile_cont(carwidth, 0.99) AS carwidth_hi,
    quantile_cont(carheight, 0.01) AS carheight_lo, quantile_cont(carheight, 0.99) AS carheight_hi,
    quantile_cont(curbweight, 0.01) AS curbweight_lo, quantile_cont(curbweight, 0.99) AS curbweight_hi,
    quantile_cont(enginesize, 0.01) AS enginesize_lo, quantile_cont(enginesize, 0.99) AS enginesize_hi,
    quantile_cont(boreratio, 0.01) AS boreratio_lo, quantile_cont(boreratio, 0.99) AS boreratio_hi,
    quantile_cont(stroke, 0.01) AS stroke_lo, quantile_cont(stroke, 0.99) AS stroke_hi,
    quantile_cont(compressionratio, 0.01) AS compressionratio_lo, quantile_cont(compressionratio, 0.99) AS compressionratio_hi,
    quantile_cont(horsepower, 0.01) AS horsepower_lo, quantile_cont(horsepower, 0.99) AS horsepower_hi,
    quantile_cont(peakrpm, 0.01) AS peakrpm_lo, quantile_cont(peakrpm, 0.99) AS peakrpm_hi,
    quantile_cont(citympg, 0.01) AS citympg_lo, quantile_cont(citympg, 0.99) AS citympg_hi,
    quantile_cont(highwaympg, 0.01) AS highwaympg_lo, quantile_cont(highwaympg, 0.99) AS highwaympg_hi,
    quantile_cont(price, 0.01) AS price_lo, quantile_cont(price, 0.99) AS price_hi
  FROM base
),
w AS (
  SELECT greatest(least(b.car_id, q.car_id_hi), q.car_id_lo) AS car_id,
    greatest(least(b.symboling, q.symboling_hi), q.symboling_lo) AS symboling,
    greatest(least(b.wheelbase, q.wheelbase_hi), q.wheelbase_lo) AS wheelbase,
    greatest(least(b.carlength, q.carlength_hi), q.carlength_lo) AS carlength,
    greatest(least(b.carwidth, q.carwidth_hi), q.carwidth_lo) AS carwidth,
    greatest(least(b.carheight, q.carheight_hi), q.carheight_lo) AS carheight,
    greatest(least(b.curbweight, q.curbweight_hi), q.curbweight_lo) AS curbweight,
    greatest(least(b.enginesize, q.enginesize_hi), q.enginesize_lo) AS enginesize,
    greatest(least(b.boreratio, q.boreratio_hi), q.boreratio_lo) AS boreratio,
    greatest(least(b.stroke, q.stroke_hi), q.stroke_lo) AS stroke,
    greatest(least(b.compressionratio, q.compressionratio_hi), q.compressionratio_lo) AS compressionratio,
    greatest(least(b.horsepower, q.horsepower_hi), q.horsepower_lo) AS horsepower,
    greatest(least(b.peakrpm, q.peakrpm_hi), q.peakrpm_lo) AS peakrpm,
    greatest(least(b.citympg, q.citympg_hi), q.citympg_lo) AS citympg,
    greatest(least(b.highwaympg, q.highwaympg_hi), q.highwaympg_lo) AS highwaympg,
    greatest(least(b.price, q.price_hi), q.price_lo) AS price,
    b.carname, b.fueltype, b.aspiration, b.doornumber, b.carbody, b.drivewheel, b.enginelocation, b.enginetype, b.cylindernumber, b.fuelsystem, b.brand
  FROM base b, q
),
pq AS (
  SELECT quantile_cont(price, 0.00) AS p0, quantile_cont(price, 0.25) AS p25,
         quantile_cont(price, 0.50) AS p50, quantile_cont(price, 0.75) AS p75,
         quantile_cont(price, 1.00) AS p100
  FROM w
)
SELECT w.*,
  CASE WHEN w.price < pq.p0 THEN NULL
       WHEN w.price <= pq.p25 THEN 'Low'
       WHEN w.price <= pq.p50 THEN 'Medium'
       WHEN w.price <= pq.p75 THEN 'High'
       WHEN w.price <= pq.p100 THEN 'VeryHigh'
       ELSE NULL END AS price_bucket,
  ln(1 + w.price) AS log_price
FROM w, pq
"""

@query("carprice_cleaned", oracle=_CLEANED_ORACLE)
def carprice_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 phases 1-5 (clean/impute/cap/bucket) — golden-parity table,
    hash-checked against the SQL replay of the same pipeline."""
    return _cleaned(spark)


# One-hot oracle: dummyVars(fullRank=TRUE) over the FIXED reference
# CSV's 28 distinct brands in R factor order (casefold, lowercase-first
# on case ties) with the first level (alfa-romero) dropped — the level
# set is data-dependent but the input is the immutable reference CSV,
# so enumerating it in SQL is exact. The messy data has both 'nissan'
# and 'Nissan' as distinct factor levels; DuckDB column names are
# case-INsensitive, so the uppercase variant's dummy is aliased
# brand_Nissan_uc on BOTH sides (golden naming lives in
# pipelines.carprice.ml_ready, which tests/test_carprice_golden.py
# checks cell-for-cell — this wrapper renames only the driver surface).
_ML_ORACLE = """
WITH raw AS (
  SELECT * FROM read_csv('/root/reference/CarPrice_Assignment.csv', header=true)
),
base AS (
  SELECT car_ID::DOUBLE AS car_id, symboling::DOUBLE AS symboling,
         trim(CarName) AS carname, fueltype, aspiration, doornumber, carbody,
         drivewheel, enginelocation, wheelbase::DOUBLE AS wheelbase,
         carlength::DOUBLE AS carlength, carwidth::DOUBLE AS carwidth,
         carheight::DOUBLE AS carheight, curbweight::DOUBLE AS curbweight,
         enginetype, cylindernumber, enginesize::DOUBLE AS enginesize,
         fuelsystem, boreratio::DOUBLE AS boreratio, stroke::DOUBLE AS stroke,
         compressionratio::DOUBLE AS compressionratio,
         horsepower::DOUBLE AS horsepower, peakrpm::DOUBLE AS peakrpm,
         citympg::DOUBLE AS citympg, highwaympg::DOUBLE AS highwaympg,
         price::DOUBLE AS price, split_part(trim(CarName), ' ', 1) AS brand
  FROM raw
),
q AS (
  SELECT quantile_cont(car_id, 0.01) AS car_id_lo, quantile_cont(car_id, 0.99) AS car_id_hi,
    quantile_cont(symboling, 0.01) AS symboling_lo, quantile_cont(symboling, 0.99) AS symboling_hi,
    quantile_cont(wheelbase, 0.01) AS wheelbase_lo, quantile_cont(wheelbase, 0.99) AS wheelbase_hi,
    quantile_cont(carlength, 0.01) AS carlength_lo, quantile_cont(carlength, 0.99) AS carlength_hi,
    quantile_cont(carwidth, 0.01) AS carwidth_lo, quantile_cont(carwidth, 0.99) AS carwidth_hi,
    quantile_cont(carheight, 0.01) AS carheight_lo, quantile_cont(carheight, 0.99) AS carheight_hi,
    quantile_cont(curbweight, 0.01) AS curbweight_lo, quantile_cont(curbweight, 0.99) AS curbweight_hi,
    quantile_cont(enginesize, 0.01) AS enginesize_lo, quantile_cont(enginesize, 0.99) AS enginesize_hi,
    quantile_cont(boreratio, 0.01) AS boreratio_lo, quantile_cont(boreratio, 0.99) AS boreratio_hi,
    quantile_cont(stroke, 0.01) AS stroke_lo, quantile_cont(stroke, 0.99) AS stroke_hi,
    quantile_cont(compressionratio, 0.01) AS compressionratio_lo, quantile_cont(compressionratio, 0.99) AS compressionratio_hi,
    quantile_cont(horsepower, 0.01) AS horsepower_lo, quantile_cont(horsepower, 0.99) AS horsepower_hi,
    quantile_cont(peakrpm, 0.01) AS peakrpm_lo, quantile_cont(peakrpm, 0.99) AS peakrpm_hi,
    quantile_cont(citympg, 0.01) AS citympg_lo, quantile_cont(citympg, 0.99) AS citympg_hi,
    quantile_cont(highwaympg, 0.01) AS highwaympg_lo, quantile_cont(highwaympg, 0.99) AS highwaympg_hi,
    quantile_cont(price, 0.01) AS price_lo, quantile_cont(price, 0.99) AS price_hi
  FROM base
),
w AS (
  SELECT greatest(least(b.car_id, q.car_id_hi), q.car_id_lo) AS car_id,
    greatest(least(b.symboling, q.symboling_hi), q.symboling_lo) AS symboling,
    greatest(least(b.wheelbase, q.wheelbase_hi), q.wheelbase_lo) AS wheelbase,
    greatest(least(b.carlength, q.carlength_hi), q.carlength_lo) AS carlength,
    greatest(least(b.carwidth, q.carwidth_hi), q.carwidth_lo) AS carwidth,
    greatest(least(b.carheight, q.carheight_hi), q.carheight_lo) AS carheight,
    greatest(least(b.curbweight, q.curbweight_hi), q.curbweight_lo) AS curbweight,
    greatest(least(b.enginesize, q.enginesize_hi), q.enginesize_lo) AS enginesize,
    greatest(least(b.boreratio, q.boreratio_hi), q.boreratio_lo) AS boreratio,
    greatest(least(b.stroke, q.stroke_hi), q.stroke_lo) AS stroke,
    greatest(least(b.compressionratio, q.compressionratio_hi), q.compressionratio_lo) AS compressionratio,
    greatest(least(b.horsepower, q.horsepower_hi), q.horsepower_lo) AS horsepower,
    greatest(least(b.peakrpm, q.peakrpm_hi), q.peakrpm_lo) AS peakrpm,
    greatest(least(b.citympg, q.citympg_hi), q.citympg_lo) AS citympg,
    greatest(least(b.highwaympg, q.highwaympg_hi), q.highwaympg_lo) AS highwaympg,
    greatest(least(b.price, q.price_hi), q.price_lo) AS price,
    b.carname, b.fueltype, b.aspiration, b.doornumber, b.carbody, b.drivewheel, b.enginelocation, b.enginetype, b.cylindernumber, b.fuelsystem, b.brand
  FROM base b, q
)
SELECT w.horsepower, w.enginesize, w.curbweight, w.citympg, w.highwaympg, w.carwidth, w.carlength,
  CASE WHEN brand = 'audi' THEN 1.0 ELSE 0.0 END AS "brand_audi",
  CASE WHEN brand = 'bmw' THEN 1.0 ELSE 0.0 END AS "brand_bmw",
  CASE WHEN brand = 'buick' THEN 1.0 ELSE 0.0 END AS "brand_buick",
  CASE WHEN brand = 'chevrolet' THEN 1.0 ELSE 0.0 END AS "brand_chevrolet",
  CASE WHEN brand = 'dodge' THEN 1.0 ELSE 0.0 END AS "brand_dodge",
  CASE WHEN brand = 'honda' THEN 1.0 ELSE 0.0 END AS "brand_honda",
  CASE WHEN brand = 'isuzu' THEN 1.0 ELSE 0.0 END AS "brand_isuzu",
  CASE WHEN brand = 'jaguar' THEN 1.0 ELSE 0.0 END AS "brand_jaguar",
  CASE WHEN brand = 'maxda' THEN 1.0 ELSE 0.0 END AS "brand_maxda",
  CASE WHEN brand = 'mazda' THEN 1.0 ELSE 0.0 END AS "brand_mazda",
  CASE WHEN brand = 'mercury' THEN 1.0 ELSE 0.0 END AS "brand_mercury",
  CASE WHEN brand = 'mitsubishi' THEN 1.0 ELSE 0.0 END AS "brand_mitsubishi",
  CASE WHEN brand = 'nissan' THEN 1.0 ELSE 0.0 END AS "brand_nissan",
  CASE WHEN brand = 'Nissan' THEN 1.0 ELSE 0.0 END AS "brand_Nissan_uc",
  CASE WHEN brand = 'peugeot' THEN 1.0 ELSE 0.0 END AS "brand_peugeot",
  CASE WHEN brand = 'plymouth' THEN 1.0 ELSE 0.0 END AS "brand_plymouth",
  CASE WHEN brand = 'porcshce' THEN 1.0 ELSE 0.0 END AS "brand_porcshce",
  CASE WHEN brand = 'porsche' THEN 1.0 ELSE 0.0 END AS "brand_porsche",
  CASE WHEN brand = 'renault' THEN 1.0 ELSE 0.0 END AS "brand_renault",
  CASE WHEN brand = 'saab' THEN 1.0 ELSE 0.0 END AS "brand_saab",
  CASE WHEN brand = 'subaru' THEN 1.0 ELSE 0.0 END AS "brand_subaru",
  CASE WHEN brand = 'toyota' THEN 1.0 ELSE 0.0 END AS "brand_toyota",
  CASE WHEN brand = 'toyouta' THEN 1.0 ELSE 0.0 END AS "brand_toyouta",
  CASE WHEN brand = 'vokswagen' THEN 1.0 ELSE 0.0 END AS "brand_vokswagen",
  CASE WHEN brand = 'volkswagen' THEN 1.0 ELSE 0.0 END AS "brand_volkswagen",
  CASE WHEN brand = 'volvo' THEN 1.0 ELSE 0.0 END AS "brand_volvo",
  CASE WHEN brand = 'vw' THEN 1.0 ELSE 0.0 END AS "brand_vw",
  w.price
FROM w
"""

@query("carprice_ml_matrix", oracle=_ML_ORACLE)
def carprice_ml_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 8 one-hot ML matrix (golden: car_prices_ml_ready.csv),
    hash-checked against the SQL replay."""
    ml = cp.ml_ready(_cleaned(spark), target="price")
    # exact-string rename via toDF: withColumnRenamed resolves with the
    # session's case-INsensitive resolver and would rename brand_nissan too
    return ml.toDF(
        *[("brand_Nissan_uc" if c == "brand_Nissan" else c) for c in ml.columns]
    )


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


@query("carprice_kde_nb_confusion")
def carprice_kde_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 at FULL fidelity: kernel-density NB (the reference's actual
    ``naiveBayes(usekernel=TRUE)``, BigDataProject.R:349-364 — klaR-style
    per-(class,feature) gaussian KDE with bw.nrd0 bandwidths on a
    512-point grid) + A14 confusion counts on the same split as the
    gaussian variant. Closes the documented gaussian-for-kernel delta."""
    from ..ml.kde_nb import fit_kde_naive_bayes

    df = _cleaned(spark)
    numeric = ["horsepower", "enginesize", "curbweight", "citympg", "carwidth"]
    train, test = mlp.train_test_split(df, 0.8, seed=123)
    model = fit_kde_naive_bayes(train, numeric, "price_bucket")
    return model.confusion(test, "price_bucket")


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

"""ML / mining model-as-operator pipelines (SURVEY.md §2.8 M1-M13).

Reference calls lowered to ``pyspark.ml`` Estimators inside Pipelines so
train/test flow through the same fitted transformers (this removes the
reference's manual train/test column-alignment hack,
BigDataProject.R:297-299).

Known semantic deltas (documented in SURVEY.md §2.8): caret's stratified
split → uniform randomSplit; rpart cp-pruning → maxDepth; SVR (no Spark
equivalent) → tuned GBTRegressor in the nonlinear-regressor slot; R
Lloyd+nstart k-means → k-means‖ init. Metric-level parity is asserted in
tests, not structural parity. The kernel-density-NB delta is CLOSED:
``ml/kde_nb.py`` implements the reference's actual
``naiveBayes(usekernel=TRUE)`` (klaR-style per-(class,feature) gaussian
KDE, bw.nrd0 bandwidths, 512-point density grid + interpolated predict);
the gaussian variant below remains as the cheap alternative.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import NaiveBayes
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import (
    MinMaxScaler,
    OneHotEncoder,
    PCA,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.regression import (
    DecisionTreeRegressor,
    GBTRegressor,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_stages(
    numeric: Sequence[str],
    categorical: Sequence[str] = (),
    output_col: str = "features",
    standardize: bool = False,
):
    """M2 shared preprocessing: StringIndexer → OneHotEncoder(dropLast=True
    ≙ dummyVars fullRank=TRUE, BigDataProject.R:285-287) → VectorAssembler
    (→ StandardScaler when asked, ≙ scale() at :394)."""
    stages = []
    ohe_cols = []
    for c in categorical:
        stages.append(
            StringIndexer(
                inputCol=c, outputCol=f"{c}_idx", stringOrderType="alphabetAsc",
                handleInvalid="keep",
            )
        )
        stages.append(OneHotEncoder(inputCol=f"{c}_idx", outputCol=f"{c}_oh", dropLast=True))
        ohe_cols.append(f"{c}_oh")
    assembled = "features_raw" if standardize else output_col
    stages.append(
        VectorAssembler(inputCols=[*numeric, *ohe_cols], outputCol=assembled)
    )
    if standardize:
        stages.append(
            StandardScaler(
                inputCol=assembled, outputCol=output_col, withMean=True, withStd=True
            )
        )
    return stages


def train_test_split(df: DataFrame, train_frac: float = 0.8, seed: int = 123):
    """M1: 80/20 split (createDataPartition ≙ randomSplit; caret's
    y-stratification documented as a non-replicated delta)."""
    return df.randomSplit([train_frac, 1.0 - train_frac], seed=seed)


def _regressor(kind: str, seed: int = 123):
    if kind == "lm":
        # normal-equation solver ≙ OLS lm() (M3, BigDataProject.R:305)
        return LinearRegression(featuresCol="features", labelCol="label", solver="normal")
    if kind == "tree":
        return DecisionTreeRegressor(featuresCol="features", labelCol="label", seed=seed)
    if kind == "rf":
        # ntree=200 (M6, BigDataProject.R:338-347)
        return RandomForestRegressor(
            featuresCol="features", labelCol="label", numTrees=200, seed=seed
        )
    if kind == "gbt":
        return GBTRegressor(featuresCol="features", labelCol="label", seed=seed)
    raise ValueError(kind)


def fit_regression(
    train: DataFrame,
    numeric: Sequence[str],
    categorical: Sequence[str] = (),
    label: str = "label",
    kind: str = "lm",
    seed: int = 123,
) -> PipelineModel:
    stages = feature_stages(numeric, categorical)
    df = train.withColumn("label", F.col(label))
    return Pipeline(stages=[*stages, _regressor(kind, seed)]).fit(df)


def regression_metrics_dollars(
    model: PipelineModel, test: DataFrame, label: str = "label", log_scale: bool = True
) -> dict[str, float]:
    """M4: RMSE/R²/MAE on the back-transformed $ scale
    (postResample(exp(pred)−1, exp(y)−1), BigDataProject.R:309-324)."""
    pred = model.transform(test.withColumn("label", F.col(label)))
    if log_scale:
        pred = pred.withColumn("prediction", F.expm1("prediction")).withColumn(
            "label", F.expm1("label")
        )
    out = {}
    for metric in ("rmse", "r2", "mae"):
        out[metric] = RegressionEvaluator(
            labelCol="label", predictionCol="prediction", metricName=metric
        ).evaluate(pred)
    return out


def tuned_gbt(
    train: DataFrame,
    numeric: Sequence[str],
    categorical: Sequence[str] = (),
    label: str = "label",
    seed: int = 123,
    num_folds: int = 3,
    max_iter: int = 20,
) -> PipelineModel:
    """M8 slot: the reference grid-tunes an RBF SVR (tune(svm, ...),
    BigDataProject.R:366-382); Spark ML has no SVR, so the tuned
    nonlinear-regressor slot is CrossValidator+ParamGridBuilder over
    GBTRegressor (documented fidelity delta)."""
    stages = feature_stages(numeric, categorical)
    gbt = _regressor("gbt", seed).setMaxIter(max_iter)
    pipe = Pipeline(stages=[*stages, gbt])
    grid = (
        ParamGridBuilder()
        .addGrid(gbt.maxDepth, [3, 5])
        .addGrid(gbt.stepSize, [0.1, 0.3])
        .build()
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(labelCol="label", metricName="rmse"),
        numFolds=num_folds,
        seed=seed,
        parallelism=4,
    )
    return cv.fit(train.withColumn("label", F.col(label))).bestModel


def fit_naive_bayes(
    train: DataFrame,
    numeric: Sequence[str],
    label: str,
    seed: int = 123,
) -> PipelineModel:
    """M7: gaussian NB on continuous features for the price-bucket
    classifier (naiveBayes(usekernel=TRUE) → gaussian delta)."""
    stages = [
        StringIndexer(
            inputCol=label, outputCol="label", stringOrderType="alphabetAsc"
        ),
        VectorAssembler(inputCols=list(numeric), outputCol="features"),
        NaiveBayes(modelType="gaussian", featuresCol="features", labelCol="label"),
    ]
    return Pipeline(stages=stages).fit(train)


def confusion_matrix(model: PipelineModel, test: DataFrame, label: str) -> DataFrame:
    """A14: long-form confusion counts + per-cell share."""
    pred = model.transform(test)
    labels = model.stages[0].labels
    name_lookup = F.array(*[F.lit(lv) for lv in labels])  # native, no UDF
    pred = pred.withColumn(
        "predicted", F.element_at(name_lookup, F.col("prediction").cast("int") + 1)
    )
    return (
        pred.groupBy(F.col(label).alias("actual"), "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("actual", "predicted")
    )


def classifier_accuracy(model: PipelineModel, test: DataFrame) -> float:
    pred = model.transform(test)
    return MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(pred)


def kmeans_elbow(
    features_df: DataFrame, ks: Sequence[int], seed: int = 123
) -> list[tuple[int, float]]:
    """M9 elbow: WSS (trainingCost) over k on a cached feature frame —
    the reference rescans 15× (BigDataProject.R:397-416); we cache once
    (SURVEY.md §4 repeated-pass policy)."""
    features_df = features_df.persist()
    try:
        out = []
        for k in ks:
            if k == 1:
                # Spark KMeans requires k>=2; the k=1 WSS is the total
                # sum of squares around the mean: Σ(n−1)·var_d — one agg.
                from pyspark.ml.stat import Summarizer

                row = features_df.select(
                    Summarizer.variance(F.col("features")).alias("var"),
                    F.count(F.lit(1)).alias("n"),
                ).first()
                wss = float(sum(row["var"].toArray()) * (row["n"] - 1))
                out.append((1, wss))
                continue
            model = KMeans(k=k, seed=seed, featuresCol="features").fit(features_df)
            out.append((k, float(model.summary.trainingCost)))
        return out
    finally:
        features_df.unpersist()


def fit_kmeans(
    df: DataFrame,
    numeric: Sequence[str],
    k: int,
    seed: int = 123,
    standardize: bool = True,
) -> PipelineModel:
    """M9/M10: standardize → k-means; transform() adds `prediction`
    (no rownames write-back gymnastics, ≙ BigDataProject.R:540-541)."""
    stages = feature_stages(numeric, standardize=standardize)
    stages.append(KMeans(k=k, seed=seed, featuresCol="features"))
    return Pipeline(stages=stages).fit(df)


def unscale_centers(model: PipelineModel, numeric: Sequence[str]) -> list[dict]:
    """M11: centers × scale + center (BigDataProject.R:431-439) from the
    fitted StandardScalerModel's .std/.mean — k×d local arithmetic."""
    from pyspark.ml.feature import StandardScalerModel

    scaler = next(s for s in model.stages if isinstance(s, StandardScalerModel))
    km = model.stages[-1]
    mean, std = scaler.mean.toArray(), scaler.std.toArray()
    out = []
    for i, center in enumerate(km.clusterCenters()):
        vals = center * std + mean
        out.append({"cluster": i, **{c: float(v) for c, v in zip(numeric, vals)}})
    return out


def pca_project(
    df: DataFrame, numeric: Sequence[str], k: int = 2, standardize: bool = True
):
    """M12: prcomp ≙ PCA(k) on standardized features; returns (model,
    projected_df, explained_variance). Component sign is arbitrary in both
    engines (SURVEY.md M12)."""
    stages = feature_stages(numeric, standardize=standardize, output_col="features")
    stages.append(PCA(k=k, inputCol="features", outputCol="pca"))
    model = Pipeline(stages=stages).fit(df)
    projected = model.transform(df)
    explained = [float(v) for v in model.stages[-1].explainedVariance]
    return model, projected, explained


def minmax_scale(df: DataFrame, numeric: Sequence[str]) -> DataFrame:
    """M13: (x−min)/(max−min) radar normalization
    (BigDataProject.R:497-508) via MinMaxScaler."""
    stages = [
        VectorAssembler(inputCols=list(numeric), outputCol="_raw"),
        MinMaxScaler(inputCol="_raw", outputCol="scaled"),
    ]
    return Pipeline(stages=stages).fit(df).transform(df)

"""Feature-prep + tuning surface for the estimators the reference IMPORTS
but never calls (SURVEY.md §2.8 F12 "dead imports": Imputer,
OneHotEncoder, Bucketizer, KMeans, CrossValidator/ParamGridBuilder,
ClusteringEvaluator — e.g. data-understanding.py:9-11,
recomendation-system.py:21-23). A user of the reference who ever turns
those imports into calls finds them first-class here, each wrapped with
the engine's conventions: explicit seeds, single-pass fits, bounded
cardinality.

All wrappers return (transformed_df, fitted_model) or plain DataFrames —
composable with the ml/ pipeline like every other operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator, RegressionEvaluator
from pyspark.ml.feature import Bucketizer, Imputer, OneHotEncoder
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_numeric(
    df: DataFrame, cols: Sequence[str], strategy: str = "median"
):
    """Imputer over numeric columns (median default — robust to the price
    outliers the reference trims by range instead). One fit pass computes
    all column statistics together. Returns (df, model)."""
    cols = list(cols)
    model = Imputer(
        inputCols=cols,
        outputCols=[f"{c}__imp" for c in cols],
        strategy=strategy,
    ).fit(df)
    return model.transform(df), model


def one_hot(df: DataFrame, idx_cols: Sequence[str]):
    """OneHotEncoder over already-indexed categorical columns (pair with
    features.index_categoricals). Emits sparse vectors — cardinality-safe
    for the linear models; tree learners should keep the index form.
    Returns (df, model)."""
    idx_cols = list(idx_cols)
    model = OneHotEncoder(
        inputCols=idx_cols,
        outputCols=[f"{c}__oh" for c in idx_cols],
        handleInvalid="keep",
    ).fit(df)
    return model.transform(df), model


def bucketize(
    df: DataFrame, col: str, splits: Sequence[float], out: str | None = None
) -> DataFrame:
    """Bucketizer: explicit split points → bucket ordinals (the
    deterministic, data-independent cousin of quantile binning — the
    right tool when bucket EDGES are part of the model contract, e.g.
    price bands). Stateless transform, no fit pass."""
    return Bucketizer(
        splits=list(splits),
        inputCol=col,
        outputCol=out or f"{col}__bucket",
        handleInvalid="keep",
    ).transform(df)


def kmeans_cluster(
    df: DataFrame,
    features_col: str = "features",
    k: int = 8,
    seed: int = 42,
    max_iter: int = 20,
):
    """Seeded KMeans over an assembled feature vector, with silhouette
    scoring (ClusteringEvaluator) — the distributed JVM-side counterpart
    of ext.similarity's driver-side sample-fit quantizer (use THIS form
    when the clustering itself is the product rather than an ANN index
    component). Returns (df_with_prediction, model, silhouette)."""
    model = KMeans(
        featuresCol=features_col, k=k, seed=seed, maxIter=max_iter
    ).fit(df)
    out = model.transform(df)
    sil = ClusteringEvaluator(featuresCol=features_col).evaluate(out)
    return out, model, float(sil)


def cross_validate_regressor(
    train: DataFrame,
    estimator,
    param_grid: dict,
    n_folds: int = 3,
    seed: int = 42,
    metric: str = "rmse",
):
    """Seeded k-fold cross-validation over an MLlib regressor with a dict
    param grid ({param: [values]}). The reference imports CrossValidator/
    ParamGridBuilder and never calls them (dead-import F12) — and its own
    unseeded randomSplit makes every reported metric unreproducible; this
    wrapper seeds both the folds and the estimator where supported.
    Returns (best_model, avg_metrics) with avg_metrics aligned to the
    grid order."""
    builder = ParamGridBuilder()
    for param, values in param_grid.items():
        builder = builder.addGrid(estimator.getParam(param), list(values))
    evaluator = RegressionEvaluator(
        labelCol=estimator.getLabelCol(),
        predictionCol=estimator.getPredictionCol(),
        metricName=metric,
    )
    cv = CrossValidator(
        estimator=estimator,
        estimatorParamMaps=builder.build(),
        evaluator=evaluator,
        numFolds=n_folds,
        seed=seed,
        parallelism=2,
    )
    model = cv.fit(train)
    return model.bestModel, [float(m) for m in model.avgMetrics]


def balance_oversample(
    df: DataFrame,
    label_col: str,
    id_col: str,
    salt: str = "cbe",
) -> DataFrame:
    """Deterministic minority oversampling to ~1:1 — the class-balance
    step of an ML data-prep pipeline, with md5 replacing RNG so the
    resampled table is bit-reproducible (and hash-certifiable): the
    MINORITY class (whichever of 0/1 is rarer; label 1 wins ties so the
    historical label-1-minority behavior is unchanged) gets
    ``nmaj div nmin`` copies per row plus one more iff
    u(md5(salt:id)) < (nmaj mod nmin)/nmin, so E[n_after] = nmaj
    exactly and every engine draws the same rows. Majority rows pass
    through; a single-class input (nmin = 0) passes through entirely
    (no divide-by-zero, no F.sequence(1, 0) descending-range trap —
    copies is structurally >= 1 because nmaj div nmin >= 1).
    The expansion is a single explode(sequence) — no RNG, no driver
    loop.

    Output: the resampled DataFrame with a ``copy_idx`` column (0 for
    originals/majority)."""
    lbl = F.col(label_col).cast("int")
    cls = df.agg(
        F.sum(1 - lbl).alias("n0"), F.sum(lbl).alias("n1")
    ).select(
        F.least("n0", "n1").alias("nmin"),
        F.greatest("n0", "n1").alias("nmaj"),
        # label 1 is "the minority" on ties: copies = 1 there anyway.
        F.when(F.col("n1") <= F.col("n0"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("min_lbl"),
    )
    j = df.crossJoin(F.broadcast(cls))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    thr = F.pmod(F.col("nmaj"), F.col("nmin")).cast("double") / F.col(
        "nmin"
    ).cast("double")
    copies = F.when(
        (F.col("nmin") > 0) & (lbl == F.col("min_lbl")),
        (F.col("nmaj") - F.pmod(F.col("nmaj"), F.col("nmin")))
        / F.col("nmin")
        + (u < thr).cast("int"),
    ).otherwise(F.lit(1)).cast("int")
    return (
        j.withColumn("__copies", copies)
        .withColumn(
            "__ci", F.explode(F.sequence(F.lit(1), F.col("__copies")))
        )
        .withColumn("copy_idx", F.col("__ci") - 1)
        .drop("__copies", "__ci", "nmin", "nmaj", "min_lbl")
    )

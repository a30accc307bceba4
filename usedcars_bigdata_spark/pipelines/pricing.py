"""Price-prediction pipeline (notebook_to_py/price-prediction.py).

The reference's flow — prune (lines 49-51), repeated condition filters
(89-107, collapsed by Catalyst), drop posting_date/row_num (136), casts
(150-152), per-column StringIndexer loop (159-167), VectorAssembler
(178-190), unseeded 80/20 split (195), nine regressors (266-474), metric
table (503-527) — as one function over the cleaned vehicles table, with a
seeded split and the single-pass evaluator."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ml.features import build_feature_table, cap_categories
from ..ml.regress import run_model_suite

FEATURE_COLS = [
    "year", "manufacturer", "model", "condition", "fuel", "odometer",
    "title_status", "transmission", "type", "age",
]


def prepare_features(clean: DataFrame, max_categories: int = 256) -> DataFrame:
    """vehicles_clean → (label=price, features) table
    (price-prediction.py:136-191). High-cardinality categoricals (model has
    thousands of values) are frequency-capped instead of the reference's
    maxBins=40000 — bounded tree memory at any corpus size."""
    typed = (
        clean.drop("posting_date", "index")
        .withColumn("price", F.col("price").cast("long"))
        .withColumn("year", F.col("year").cast("int"))
        .withColumn("odometer", F.col("odometer").cast("double"))
        .withColumn("age", F.col("age").cast("int"))
    )
    cols = [c for c in FEATURE_COLS if c in typed.columns]
    cats = [c for c in cols if dict(typed.dtypes)[c] == "string"]
    # Tree learners silently cap maxBins at n_examples, so the category cap
    # must stay well under the (training-split) row count too.
    n_rows = typed.count()
    effective_cap = max(2, min(max_categories, n_rows // 8))
    capped = cap_categories(typed, cats, top_n=effective_cap)
    return build_feature_table(
        capped.withColumnRenamed("price", "label"), "label", cols
    )


def price_prediction(
    clean: DataFrame, models: list[str] | None = None, seed: int = 42
) -> DataFrame:
    """End-to-end: featurize → seeded split → fit the zoo → metrics table
    (reference's full comparison loop, price-prediction.py:195-527)."""
    data = prepare_features(clean)
    return run_model_suite(data, models, seed=seed)

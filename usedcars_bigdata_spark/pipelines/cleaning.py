"""Cleaning & distribution-stats pipeline (notebook_to_py/data-viz&cleaning.py).

Reproduces the reference's vehicles_df → vehicles_prc → vehicles_odo →
vehicles_year → vehicles_used view chain (lines 69-94, 130, 173, 234-235,
321-324, 383-386) as one composable function, with the synthetic index in
both reference form (monotonically_increasing_id) and contiguous form
(zip_index) — plus the skew-transform study (lines 142-207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.agg import skewness_of, summary_stats
from ..operators.clean import (
    dedupe_exact,
    drop_columns,
    drop_nulls,
    filter_isin,
    filter_range,
)
from ..operators.derive import add_monotonic_index

# Columns the reference prunes away (data-viz&cleaning.py:61-68).
DROPPED_COLUMNS = [
    "id", "url", "region", "region_url", "VIN", "image_url", "description",
    "county", "state", "lat", "long", "paint_color", "cylinders", "drive", "size",
]

YEAR_LIST = [str(y) for y in range(2000, 2021)]


def clean_vehicles(vehicles: DataFrame, contiguous_index: bool = False) -> DataFrame:
    """Prune → dedup → dropna → index → typed casts → progressive range
    filters → age derivation (the full data-viz&cleaning.py:69-386 chain).
    Returns the FIXTURES.md §A2 `vehicles_clean` shape."""
    pruned = drop_columns(vehicles, DROPPED_COLUMNS)
    deduped = drop_nulls(dedupe_exact(pruned))
    if contiguous_index:
        from ..operators.window import zip_index

        indexed = zip_index(deduped, alias="index")
    else:
        indexed = add_monotonic_index(deduped, alias="index")
    indexed = indexed.select("index", *[c for c in indexed.columns if c != "index"])

    typed = (
        indexed.withColumn("price", F.col("price").cast("long"))
        .withColumn("odometer", F.col("odometer").cast("double"))
    )
    filtered = filter_range(typed, "price", lo=2000, hi=50000)  # line 130
    filtered = filter_range(filtered, "odometer", lo=100, lo_open=True, hi=200000)  # line 173
    filtered = filter_isin(filtered, "year", YEAR_LIST)  # lines 234-235
    filtered = (
        filtered.filter(F.col("condition") != "new")  # line 321
        .filter(F.col("title_status") != "parts only")  # line 324
        .filter(F.col("fuel") != "other")  # line 383
        .filter(F.col("transmission") != "other")  # line 386
    )
    return (
        filtered.withColumn("posting_date", F.to_date("posting_date"))  # line 254
        .withColumn(
            "age",
            (F.year(F.to_date("posting_date")) - F.col("year").cast("int")).cast("int"),
        )  # line 257
    )


def price_distribution_stats(df: DataFrame) -> DataFrame:
    """describe()-equivalent typed stats (data-viz&cleaning.py:108,164)."""
    return summary_stats(df, "price")


def odometer_skew_study(df: DataFrame) -> DataFrame:
    """Skewness of odometer raw/sqrt/log (data-viz&cleaning.py:142,195,207) —
    the reference's skew-reduction experiment as one aggregate job."""
    return df.agg(
        skewness_of(F.col("odometer"), 4).alias("skew_raw"),
        skewness_of(F.sqrt("odometer"), 4).alias("skew_sqrt"),
        skewness_of(F.log("odometer"), 4).alias("skew_log"),
    )


def age_price_profile(df: DataFrame) -> DataFrame:
    """Avg price/odometer by age (data-viz&cleaning.py:263)."""
    return (
        df.groupBy("age")
        .agg(
            F.avg("price").alias("avg_price"),
            F.avg("odometer").alias("avg_odometer"),
        )
        .orderBy("age")
    )


def model_counts_topk(df: DataFrame, k: int = 10) -> DataFrame:
    """Top-k models + 'other' bucket (data-viz&cleaning.py:436-445), without
    the reference's driver-side selectExpr/collect round-trip."""
    counts = df.groupBy("model").agg(F.count("*").alias("count_model"))
    top = counts.orderBy(F.col("count_model").desc(), F.col("model")).limit(k)
    other = counts.join(top.select("model"), "model", "left_anti").agg(
        F.lit("other").alias("model"), F.sum("count_model").alias("count_model")
    )
    return top.unionByName(other)

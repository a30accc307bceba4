"""Data-understanding pipeline (notebook_to_py/data-understanding.py).

Each reference query, re-expressed scale-first: no mid-query collect()s
(percent-of-total via window), native keyword categorization instead of the
Python UDF (identical semantics; parity UDF form available in
functions/scalar.py), exact median alongside the reference's approx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import dealer_category_native, dealer_category_udf
from ..operators.agg import median_exact, percent_of_total
from ..operators.clean import like_any


def manufacturer_stats(vehicles: DataFrame, parity_names: bool = False) -> DataFrame:
    """Q1 (data-understanding.py:75-81): listings count + avg price per
    manufacturer, sorted by count. The reference renames 'median(price)' →
    'avg_price', a NO-OP because the dict-form agg actually produces
    'avg(price)' (golden header, notebooks_outputs/data-understanding.txt:42;
    SURVEY.md §7.4). Default aliases honestly; ``parity_names=True``
    reproduces the reference's raw output columns
    ('count(manufacturer)', 'avg(price)') for byte-level comparisons."""
    agged = vehicles.groupBy("manufacturer").agg(
        F.count("manufacturer").alias("count(manufacturer)"),
        F.avg("price").alias("avg(price)"),
    )
    if parity_names:
        out = agged.withColumnRenamed("count(manufacturer)", "num_listings")
        return out.orderBy(F.col("num_listings").desc())
    return (
        agged.select(
            "manufacturer",
            F.col("count(manufacturer)").alias("num_listings"),
            F.col("avg(price)").alias("avg_price"),
        )
        .orderBy(F.col("num_listings").desc())
    )


def state_median_stats(vehicles: DataFrame, approx: bool = False) -> DataFrame:
    """Q2 (data-understanding.py:202-214): count + median price per state,
    uppercased, with a global row number. ``approx=True`` uses
    percentile_approx exactly like the reference."""
    med = (
        F.percentile_approx("price", 0.5) if approx else median_exact("price")
    )
    grouped = (
        vehicles.groupBy("state")
        .agg(F.count("state").alias("num_listings"), med.alias("median_price"))
        .select(F.upper("state").alias("state"), "num_listings", "median_price")
    )
    return grouped.withColumn(
        "row_num", F.row_number().over(Window.orderBy(F.col("state").asc()))
    )


def salvage_pct_by_state(vehicles: DataFrame) -> DataFrame:
    """Q3 (data-understanding.py:241-254): salvage share per state — the
    reference collects the grand total to the driver mid-query; we stay
    in-plan with a window (SURVEY.md §4 'Defeats Catalyst #4')."""
    counts = (
        vehicles.filter(F.col("title_status") == "salvage")
        .groupBy("state")
        .agg(F.count("*").alias("count"))
    )
    return percent_of_total(counts, "count", alias="percentage").orderBy(
        F.col("percentage").desc()
    )


def dealer_category_counts(vehicles: DataFrame, use_udf: bool = False) -> DataFrame:
    """Dealer-type categorization counts (data-understanding.py:131-150).
    Native when/contains chain by default; ``use_udf=True`` runs the
    reference's Python-UDF form (semantics-identical, ~10× slower —
    BatchEvalPython breaks codegen)."""
    cat = dealer_category_udf() if use_udf else dealer_category_native("description")
    counts = vehicles.withColumn("category", cat).groupBy("category").agg(
        F.count("*").alias("count")
    )
    return percent_of_total(counts, "count", alias="percentage")


def oldest_cars(vehicles: DataFrame, k: int = 5) -> DataFrame:
    """Oldest-cars pipeline (data-understanding.py:183-196): spam-filter via
    negated LIKE disjunction, extract a 4-digit year from the description,
    sort ascending, take k."""
    spam = like_any(
        F.col("description"), ["%cash for%", "%provide photos%", "%buying%"]
    )
    extracted = (
        vehicles.filter(~spam)
        .withColumn(
            "desc_year",
            F.nullif(
                F.regexp_extract("description", r"\b(19[0-9][0-9]|20[0-2][0-9])\b", 1),
                F.lit(""),
            ).cast("int"),
        )
        .filter(F.col("desc_year").isNotNull())
    )
    return (
        extracted.orderBy(F.col("desc_year").asc(), F.col("id").asc())
        .select("id", "manufacturer", "model", "desc_year", "description")
        .limit(k)
    )


def fuel_share(vehicles: DataFrame, fuel: str = "electric") -> DataFrame:
    """Electric-share query (data-understanding.py:223-232) generalized: one
    plan, no driver scalar."""
    return (
        vehicles.withColumn(
            "is_match", (F.col("fuel") == fuel).cast("long")
        )
        .agg(
            F.sum("is_match").alias("n_match"),
            F.count("*").alias("n_total"),
        )
        .select(
            "n_match",
            "n_total",
            F.round(F.col("n_match") * 100 / F.col("n_total"), 2).alias("percentage"),
        )
    )

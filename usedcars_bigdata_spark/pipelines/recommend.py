"""Recommendation pipeline (notebook_to_py/recomendation-system.py).

Reference flow: color/type pre-filter (58-61) → dedup/dropna (130-134) →
country-of-origin when-chain (67-86) → avg_mil / mil_rating (99-100) →
luxury type_group UDF (105-112) → color_group (119) → candidate filter
(144-148) → TF-IDF over the categorical profile (151-158) → L2 normalize
(161-164) → cosine top-5 via driver RDD (167-170) → fetch + orderBy +
randomSplit (174-183).

Our engine keeps the semantics but replaces the Python UDF with a native
chain and the driver-side cosine loop with the broadcast DataFrame top-k
(ml/textsim.cosine_topk) — and always seeds the split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import luxury_group_native, manufacturer_country
from ..ml.textsim import cosine_topk, fit_tfidf, normalize_l2
from ..operators.clean import dedupe_exact, drop_nulls

SELECTED_COLORS = ["white", "black", "silver", "grey", "red", "blue"]
SELECTED_TYPES = ["sedan", "SUV", "pickup", "truck", "coupe", "hatchback",
                  "convertible", "wagon", "van", "mini-van"]


def enrich(vehicles: DataFrame) -> DataFrame:
    """Derived recommendation features (recomendation-system.py:58-127)."""
    filtered = vehicles.filter(
        F.col("paint_color").isin(SELECTED_COLORS) & F.col("type").isin(SELECTED_TYPES)
    )
    deduped = drop_nulls(
        dedupe_exact(filtered),
        subset=["price", "year", "manufacturer", "type", "paint_color", "odometer"],
    )
    aged = (
        deduped.withColumn("id", F.col("id").cast("long"))
        .withColumn("Age", (F.lit(2022) - F.col("year").cast("int")).cast("int"))
        .filter(F.col("Age") > 0)
    )
    return (
        aged.withColumn("Made", manufacturer_country("manufacturer"))
        .withColumn("avg_mil", F.col("odometer").cast("double") / F.col("Age"))
        .withColumn(
            "mil_rating",
            F.when(F.col("avg_mil") <= 13500, "under_avg_mileage").otherwise(
                "above_avg_mileage"
            ),
        )
        .withColumn("type_group", luxury_group_native("type"))
        .withColumn(
            "color_group",
            F.when(
                F.col("paint_color").isin("white", "black", "silver", "grey"),
                "common_color",
            ).otherwise("special_color"),
        )
    )


def profile_text(df: DataFrame) -> DataFrame:
    """The token profile TF-IDF runs over — the reference tokenizes the
    enriched categorical columns (recomendation-system.py:151)."""
    return df.withColumn(
        "profile",
        F.concat_ws(
            " ",
            "Made", "manufacturer", "type_group", "color_group", "mil_rating",
            "fuel", "transmission", "type",
        ),
    )


def recommend_similar(
    vehicles: DataFrame,
    query_id: int,
    k: int = 5,
    price_band: tuple[int, int] | None = None,
) -> DataFrame:
    """End-to-end recommendation (recomendation-system.py:142-183): enrich →
    optional price-band candidate filter → TF-IDF on profiles → normalize →
    top-k cosine → fetch the recommended rows.

    The enriched frame is cached (TF-IDF fitting runs several actions over
    it); the cache is owned by the caller — unpersist / clearCache after
    consuming the result in long-lived sessions."""
    enriched = profile_text(enrich(vehicles)).cache()
    candidates = enriched
    if price_band is not None:
        lo, hi = price_band
        candidates = candidates.filter(
            (F.col("price") >= lo) & (F.col("price") <= hi)
            | (F.col("id") == query_id)
        )
    feats, _ = fit_tfidf(candidates, input_col="profile")
    normed = normalize_l2(feats)
    qids = vehicles.sparkSession.createDataFrame([(query_id,)], "id long")
    top = cosine_topk(normed, qids, "id", k=k)
    out = (
        top.join(enriched, top.neighbor_id == enriched.id, "inner")
        .orderBy("rank")
        .select(
            "query_id", "rank", F.round("score", 6).alias("score"),
            "id", "manufacturer", "model", "price", "type", "paint_color",
            "Made", "type_group", "color_group", "mil_rating",
        )
    )
    return out

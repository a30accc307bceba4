"""ALS collaborative filtering over implicit purchase signals — the
flagship distributed factorization algorithm of Spark MLlib (alternating
least squares shards both factor matrices across executors; each iteration
is a pair of block-wise least-squares solves, no driver-side matrix).

The harness has no ratings table, so the implicit signal is derived from
order history: strength(user=o_custkey, item=l_partkey) = Σ l_quantity.
That is the standard implicit-feedback construction (Hu/Koren/Volinsky
2008, public paper): confidence grows with interaction volume.

Determinism note: ALS is seeded, but factor values still depend on input
partitioning (float reduction order inside the block solves), so the
contract entry is rows-only by nature — quality is pinned by pytest on a
planted block-preference structure instead (recommendations must stay
inside the user's block), the same verification pattern as the LSH/IVF
recall tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def implicit_ratings(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(user, item, strength) from order history — one join on the order
    key, one partial-aggregated rollup; both sides pruned to key columns."""
    li = lineitem.select("l_orderkey", "l_partkey", "l_quantity")
    od = orders.select("o_orderkey", "o_custkey")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item")
        )
        .agg(F.sum("l_quantity").alias("strength"))
    )


def fit_als(
    ratings: DataFrame,
    rank: int = 8,
    max_iter: int = 5,
    reg: float = 0.1,
    alpha: float = 1.0,
    seed: int = 42,
):
    """Fit implicit-preference ALS. Ratings columns: user/item/strength
    (ints/doubles). Returns the fitted model."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        implicitPrefs=True,
        alpha=alpha,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="strength",
        coldStartStrategy="drop",
    )
    return als.fit(ratings.withColumn("strength", F.col("strength").cast("float")))


def top_recommendations(model, n: int = 3) -> DataFrame:
    """Per-user top-n item recommendations, exploded to rows:
    (user, rec_rank, item). recommendForAllUsers runs as a distributed
    blocked cross-product over the factor matrices — never a driver-side
    score loop."""
    recs = model.recommendForAllUsers(n)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("rec_rank", "rec"),
    ).select("user", (F.col("rec_rank") + 1).alias("rec_rank"), F.col("rec.item").alias("item"))

"""Categorical (multinomial-style) Naive Bayes, binary label, expressed
entirely as count aggregates + a fixed-order IEEE product — no MLlib, no
UDF, and deliberately NO logarithm: ln() differs by 1 ulp between DuckDB
and the JVM, but products and divisions of doubles derived from exact
bigint counts are bit-identical in any IEEE engine, so the class
comparison (s1 > s0) — and therefore every prediction — hash-certifies
across engines (beyond-reference extension; SURVEY.md §2.13: the
reference's classification surface is MLlib regressors only,
`4-ML.ipynb`).

Numeric-range note: scores are products of ≤ (1 + n_features) factors in
(0, 1] times a prior in (0, 1) — no overflow, and underflow would need
hundreds of features (the log-space rewrite is the named upgrade there;
the count tables are unchanged).

Scale: the per-feature conditional-count tables are bounded by feature
cardinality (broadcast joins); the only data-sized operations are the
train-side aggregates and the test-side scan — one map-side-combinable
aggregate per feature, no shuffle on the test side at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def naive_bayes_confusion(
    train: DataFrame,
    test: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    alpha: float = 1.0,
) -> DataFrame:
    """Fit binary categorical NB on ``train`` (label 0/1), score ``test``,
    return the confusion matrix: (actual, predicted, n) rows.

    P(c) = n_c / N;  P(x_f | c) = (n_fc + α) / (n_c + α·V_f) with V_f =
    train-side distinct value count of feature f (Laplace smoothing —
    unseen test values get the α numerator). Prediction = 1 iff
    s1 > s0 with s_c = P(c)·Π_f P(x_f|c), folded in feature_cols order
    so both engines evaluate the identical expression tree."""
    lbl = F.col(label_col).cast("int")
    tr = train.select(
        lbl.alias("y"), *[F.col(f).cast("string").alias(f) for f in feature_cols]
    )
    te = test.select(
        lbl.alias("y"), *[F.col(f).cast("string").alias(f) for f in feature_cols]
    )
    cls = tr.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("y").alias("n1"),
        F.sum(1 - F.col("y")).alias("n0"),
    )
    scored = te.crossJoin(F.broadcast(cls))
    s1 = F.col("n1").cast("double") / F.col("n_all").cast("double")
    s0 = F.col("n0").cast("double") / F.col("n_all").cast("double")
    for f in feature_cols:
        ft = tr.groupBy(f).agg(
            F.sum("y").alias(f"__c1_{f}"),
            F.sum(1 - F.col("y")).alias(f"__c0_{f}"),
        )
        vf = ft.agg(F.count(F.lit(1)).alias(f"__v_{f}"))
        scored = scored.join(F.broadcast(ft), f, "left").crossJoin(
            F.broadcast(vf)
        )
        c1 = F.coalesce(F.col(f"__c1_{f}"), F.lit(0)).cast("double")
        c0 = F.coalesce(F.col(f"__c0_{f}"), F.lit(0)).cast("double")
        v = F.col(f"__v_{f}").cast("double")
        s1 = s1 * (
            (c1 + F.lit(alpha))
            / (F.col("n1").cast("double") + F.lit(alpha) * v)
        )
        s0 = s0 * (
            (c0 + F.lit(alpha))
            / (F.col("n0").cast("double") + F.lit(alpha) * v)
        )
    pred = (s1 > s0).cast("int")
    return (
        scored.select(F.col("y").alias("actual"), pred.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )

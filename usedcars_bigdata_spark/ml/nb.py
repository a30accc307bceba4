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


def binary_confusion_scalars(
    confusion: DataFrame, ndigits: int = 6
) -> DataFrame:
    """Classifier scalar metrics from a (actual, predicted, n) confusion
    table: accuracy, Matthews correlation, Cohen's kappa, and macro-F1 —
    all one fixed double closed form over the four exact bigint cells
    (the count table is tiny; this is a 4-row aggregate):

        MCC   = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn))
        κ     = (p_o − p_e) / (1 − p_e)
        mF1   = (F1⁺ + F1⁻) / 2   with F1 = 2tp/(2tp + fp + fn)

    Output: one row (n, accuracy, mcc, kappa, macro_f1)."""
    cell = lambda a, p: F.sum(  # noqa: E731
        F.when((F.col("actual") == a) & (F.col("predicted") == p), F.col("n"))
        .otherwise(F.lit(0))
    )
    m = confusion.agg(
        cell(1, 1).alias("tp"),
        cell(0, 1).alias("fp"),
        cell(1, 0).alias("fn"),
        cell(0, 0).alias("tn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    tn = F.col("tn").cast("double")
    n = tp + fp + fn + tn
    acc = (tp + tn) / n
    mcc = (tp * tn - fp * fn) / F.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    kappa = (acc - pe) / (1.0 - pe)
    f1p = 2.0 * tp / (2.0 * tp + fp + fn)
    f1n = 2.0 * tn / (2.0 * tn + fn + fp)
    return m.select(
        (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"))
        .cast("bigint")
        .alias("n"),
        (F.round(acc, ndigits) + 0.0).alias("accuracy"),
        (F.round(mcc, ndigits) + 0.0).alias("mcc"),
        (F.round(kappa, ndigits) + 0.0).alias("kappa"),
        (F.round((f1p + f1n) / 2.0, ndigits) + 0.0).alias("macro_f1"),
    )


def gini_feature_rank(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    term_scale: float = 1e9,
    ndigits: int = 6,
) -> DataFrame:
    """Decision-stump feature ranking by Gini impurity decrease — the
    split criterion CART uses, chosen here over information gain because
    Gini is RATIONAL in the counts (no logarithm → no cross-engine libm
    drift): root impurity 1 − (n1² + n0²)/N², weighted child impurity
    (1/N)·Σ_v (n_v − (n1_v² + n0_v²)/n_v). Each per-value term is rounded
    to a bigint at ``term_scale`` before the Σ, so the distributed sum is
    exact integer arithmetic (the periodogram discipline). One groupBy
    per feature over value cardinality; the fold tables are tiny.

    Output: one row per feature (feature, n_values, weighted_gini,
    gini_decrease), higher decrease = more informative."""
    y = F.col(label_col).cast("int")
    base = df.select(
        y.alias("y"), *[F.col(f).cast("string").alias(f) for f in feature_cols]
    )
    root = base.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("y").alias("n1"),
        F.sum(1 - F.col("y")).alias("n0"),
    )
    nd = F.col("n_all").cast("double")
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    root_gini = 1.0 - (n1d * n1d + n0d * n0d) / (nd * nd)
    parts = []
    for f in feature_cols:
        g = base.groupBy(f).agg(
            F.count(F.lit(1)).alias("n_v"), F.sum("y").alias("n1v")
        )
        nvd = F.col("n_v").cast("double")
        n1vd = F.col("n1v").cast("double")
        n0vd = (F.col("n_v") - F.col("n1v")).cast("double")
        term = F.round(
            (nvd - (n1vd * n1vd + n0vd * n0vd) / nvd) * F.lit(term_scale)
        ).cast("bigint")
        t = g.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.sum(term).alias("s"),
        )
        wg = F.col("s").cast("double") / F.lit(term_scale) / nd
        parts.append(
            t.crossJoin(F.broadcast(root)).select(
                F.lit(f).alias("feature"),
                "n_values",
                (F.round(wg, ndigits) + 0.0).alias("weighted_gini"),
                (F.round(root_gini - wg, ndigits) + 0.0).alias(
                    "gini_decrease"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mutual_info_features(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    term_scale: float = 1e12,
    ndigits: int = 6,
) -> DataFrame:
    """Mutual information I(X_f; Y) per categorical feature against a
    binary label — the information-theoretic companion to
    gini_feature_rank (Gini is rational; MI needs ln, so each cell term
    (n_vy/N)·ln(n_vy·N/(n_v·n_y)) is computed from exact bigint counts
    and ROUNDED TO A BIGINT at ``term_scale`` before the Σ over cells —
    cell counts are identical in both engines, so a 1-ulp ln divergence
    only matters at a ~1e-13 rounding boundary). Also reports the
    feature entropy H(X_f) (same discipline), so the caller can form the
    normalized uncertainty coefficient. One groupBy per feature.

    Output: (feature, n_values, mi_nats, h_feature_nats)."""
    y = F.col(label_col).cast("int")
    base = df.select(
        y.alias("y"), *[F.col(f).cast("string").alias(f) for f in feature_cols]
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("y").alias("n1"),
        F.sum(1 - F.col("y")).alias("n0"),
    )
    parts = []
    for f in feature_cols:
        cells = base.groupBy(f, "y").agg(F.count(F.lit(1)).alias("n_vy"))
        vtot = base.groupBy(f).agg(F.count(F.lit(1)).alias("n_v"))
        j = cells.join(vtot, f).crossJoin(F.broadcast(tot))
        nd = F.col("n_all").cast("double")
        n_y = F.when(F.col("y") == 1, F.col("n1")).otherwise(F.col("n0"))
        mi_term = (
            F.col("n_vy").cast("double")
            / nd
            * F.log(
                F.col("n_vy").cast("double")
                * nd
                / (F.col("n_v").cast("double") * n_y.cast("double"))
            )
        )
        mi = j.agg(
            F.sum(
                F.round(mi_term * F.lit(term_scale)).cast("bigint")
            ).alias("mi_s")
        )
        h_term = (
            F.col("n_v").cast("double")
            / nd
            * F.log(F.col("n_v").cast("double") / nd)
        )
        hf = vtot.crossJoin(F.broadcast(tot)).agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(
                F.round(h_term * F.lit(term_scale)).cast("bigint")
            ).alias("h_s"),
        )
        parts.append(
            mi.crossJoin(F.broadcast(hf)).select(
                F.lit(f).alias("feature"),
                F.col("n_values").cast("bigint").alias("n_values"),
                (
                    F.round(
                        F.col("mi_s").cast("double") / F.lit(term_scale),
                        ndigits,
                    )
                    + 0.0
                ).alias("mi_nats"),
                (
                    F.round(
                        -(F.col("h_s").cast("double")) / F.lit(term_scale),
                        ndigits,
                    )
                    + 0.0
                ).alias("h_feature_nats"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mi_pair(
    df: DataFrame,
    col_a: str,
    col_b: str,
    term_scale: float = 1e12,
) -> DataFrame:
    """Mutual information between two categorical columns (nats) — the
    generic cell form behind mutual_info_features, used pairwise by the
    mRMR ranking. Exact bigint cell/marginal counts; each cell term is
    integer-rounded post-ln before the Σ (grid determinism as in
    mutual_info_features). Returns a 1-row DataFrame (mi_s bigint at
    term_scale) so callers can compose without collecting."""
    base = df.select(
        F.col(col_a).cast("string").alias("a"),
        F.col(col_b).cast("string").alias("b"),
    )
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    ma = base.groupBy("a").agg(F.count(F.lit(1)).alias("n_a"))
    mb = base.groupBy("b").agg(F.count(F.lit(1)).alias("n_b"))
    tot = base.agg(F.count(F.lit(1)).alias("n_all"))
    j = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n_all").cast("double")
    term = (
        F.col("n_ab").cast("double")
        / nd
        * F.log(
            F.col("n_ab").cast("double")
            * nd
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        )
    )
    return j.agg(
        F.sum(F.round(term * F.lit(term_scale)).cast("bigint")).alias("mi_s")
    )


def mrmr_rank(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    term_scale: float = 1e12,
    ndigits: int = 6,
) -> DataFrame:
    """mRMR-style feature scoring (Peng et al. 2005, one-shot form):
    relevance = MI(f, y), redundancy = mean MI(f, f') over the other
    features, score = relevance − redundancy — the selection criterion
    that demotes features which merely restate each other. Composed
    entirely from mi_pair 1-row frames (no collect); |features|² tiny
    pair grid.

    Output: (feature, relevance, redundancy, mrmr). A single-feature
    input has no redundancy pairs: redundancy is 0 and mrmr ==
    relevance (round-6 ADVICE — ``red`` stayed None and crossJoin(None)
    raised)."""
    rows = []
    feats = list(feature_cols)
    spark = df.sparkSession
    for f in feats:
        rel = mi_pair(df, f, label_col, term_scale).withColumnRenamed(
            "mi_s", "rel_s"
        )
        others = [g for g in feats if g != f]
        red = None
        for g in others:
            p = mi_pair(df, f, g, term_scale)
            red = p if red is None else red.crossJoin(
                p.withColumnRenamed("mi_s", "mi_s2")
            ).select((F.col("mi_s") + F.col("mi_s2")).alias("mi_s"))
        if red is None:
            red = spark.createDataFrame([(0,)], "mi_s bigint")
        rel_d = F.col("rel_s").cast("double") / F.lit(term_scale)
        red_d = (
            F.col("mi_s").cast("double")
            / F.lit(term_scale)
            / F.lit(float(max(len(others), 1)))
        )
        rows.append(
            rel.crossJoin(F.broadcast(red)).select(
                F.lit(f).alias("feature"),
                (F.round(rel_d, ndigits) + 0.0).alias("relevance"),
                (F.round(red_d, ndigits) + 0.0).alias("redundancy"),
                (F.round(rel_d - red_d, ndigits) + 0.0).alias("mrmr"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out

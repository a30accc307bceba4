"""Distributed model-evaluation and feature-engineering operators.

The reference's ML surface stops at RegressionEvaluator point metrics
(machine-learning-py/random-forest.py:analysis cells); an engine feeding
model training at 100 TB also needs the CLASSIFICATION evaluation suite —
ranking metrics (ROC AUC, KS), probability diagnostics (calibration,
lift/gains), leakage-free target encoding, and categorical-association
screens (chi-square/Cramér's V, mutual information) — each as ONE
declarative plan over the score table, no collect, no Python in the row
path.

Determinism contract (these are hash-oracle-checked): every metric here
reduces to window functions and aggregates over EXACT integer counts and
rank sums (doubles enter only at the final division), so Spark and DuckDB
produce bit-identical values well inside the 6-digit rounding grid. Label
sums ride on integer cents where a money column participates
(ts_bootstrap_ci precedent).

Scale notes:
- AUC/KS sort the score column once per group (one shuffle each); this is
  the exact form. At extreme scale the standard downgrade is a fixed
  binning of scores (calibration_bins IS that sketch) which makes both
  metrics a bounded group-by; the exact form here is preferred as long as
  a per-group sort fits the shuffle budget (it is the same cost class as
  any ORDER BY on the fact table).
- Everything else (calibration, lift, encoding, association) aggregates to
  tables bounded by bins × groups, category × fold, or |X|·|Y| cells —
  map-side-combinable, broadcast-joined margins, nothing row-sized crosses
  the wire after the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    by: str,
    ndigits: int = 6,
) -> DataFrame:
    """ROC AUC per group via the Mann-Whitney rank statistic:

        AUC = (Σ avg_rank(positives) − n₁(n₁+1)/2) / (n₀ · n₁)

    with AVERAGE ranks for score ties (the textbook tie correction —
    equal scores contribute 0.5, matching the probabilistic definition
    P(s⁺ > s⁻) + ½P(s⁺ = s⁻)). One window sort per group computes the
    rank; tie groups get rank + (tie_count − 1)/2 from a second frameless
    window over (group, score) — no self-join, no per-threshold scan.
    Rank sums are half-integers (exact in doubles to 2^53), so the only
    inexact step is the final division.

    Output: (by, n_pos, n_neg, auc)."""
    w_rank = Window.partitionBy(by).orderBy(score_col)
    w_tie = Window.partitionBy(by, score_col)
    ranked = df.select(
        by,
        F.col(label_col).cast("int").alias("__y"),
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / 2.0
        ).alias("__ar"),
    )
    agg = ranked.groupBy(by).agg(
        F.sum("__y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("__y")).alias("n_neg"),
        F.sum(F.col("__ar") * F.col("__y")).alias("__s1"),
    )
    auc = (
        F.col("__s1") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * F.col("n_neg"))
    return agg.select(by, "n_pos", "n_neg", F.round(auc, ndigits).alias("auc"))


def ks_statistic(
    df: DataFrame,
    label_col: str,
    score_col: str,
    by: str,
    ndigits: int = 6,
) -> DataFrame:
    """Kolmogorov–Smirnov separation per group: max |F₁(s) − F₀(s)| over
    the empirical score CDFs of positives vs negatives — the classic
    credit-risk score-power statistic next to AUC.

    Plan: collapse to one row per (group, score) with positive/negative
    counts FIRST (the fact table leaves the plan at distinct-score
    cardinality), then a running-sum window ordered by score gives both
    CDFs; the max of |ΔCDF| is exact because the supremum of a step
    function is attained at a step. All counts integer; the CDF ratios
    divide exact integers, deterministic across engines.

    Output: (by, n_pos, n_neg, ks)."""
    per_score = df.groupBy(by, F.col(score_col).alias("__s")).agg(
        F.sum(F.col(label_col).cast("int")).alias("__p"),
        F.count(F.lit(1)).alias("__n"),
    )
    w_cum = (
        Window.partitionBy(by)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(by)
    cum = per_score.select(
        by,
        F.sum("__p").over(w_cum).alias("__cp"),
        F.sum(F.col("__n") - F.col("__p")).over(w_cum).alias("__cn"),
        F.sum("__p").over(w_all).alias("n_pos"),
        F.sum(F.col("__n") - F.col("__p")).over(w_all).alias("n_neg"),
    )
    return cum.groupBy(by).agg(
        F.max("n_pos").alias("n_pos"),  # constant per group; max is the
        F.max("n_neg").alias("n_neg"),  # deterministic pick (first isn't)
        F.round(
            F.max(
                F.abs(
                    F.col("__cp") / F.col("n_pos")
                    - F.col("__cn") / F.col("n_neg")
                )
            ),
            ndigits,
        ).alias("ks"),
    )


def calibration_bins(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Reliability-diagram table: scores in [0, 1] bucketed into
    ``n_bins`` equal-width bins; per bin the mean predicted score vs the
    observed positive rate (plus count). A calibrated model has
    avg_score ≈ frac_pos per bin. ONE map-side-combinable aggregate —
    this is also the bounded-sketch downgrade path for AUC/KS at extreme
    scale (metrics over the binned table instead of a full sort).

    Output: (bin, n, avg_score, frac_pos)."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(score_col), ndigits).alias("avg_score"),
            F.round(F.avg(F.col(label_col).cast("double")), ndigits).alias(
                "frac_pos"
            ),
        )
    )


def lift_deciles(
    df: DataFrame,
    label_col: str,
    score_col: str,
    id_col: str,
    n_tiles: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Cumulative gains / lift table: rank by score descending, cut into
    ``n_tiles`` equal-population tiles, report per tile the positive rate,
    its lift over the base rate, and the cumulative capture of all
    positives — the campaign-targeting readout. The ntile runs over a
    TOTAL order (score DESC, id ASC) so tile membership is deterministic
    and identical across engines; the cumulative sums ride a second
    window over the ``n_tiles``-row table, which is free.

    Scale note: a global ntile is a single-partition sort (the same
    deliberate shape as the reference's global row_number parity). The
    exact-rank form is right up to the sort budget; past it, the standard
    downgrade is approx-quantile score BOUNDARIES + a bucketing join —
    tile populations then vary by the sketch error but the plan is fully
    parallel.

    Output: (tile, n, n_pos, lift, cum_capture)."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    tiled = df.select(
        F.ntile(n_tiles).over(w).alias("tile"),
        F.col(label_col).cast("int").alias("__y"),
    )
    per = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__y").alias("n_pos")
    )
    w_cum = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return per.select(
        "tile",
        "n",
        "n_pos",
        F.round(
            (F.col("n_pos") / F.col("n"))
            / (F.sum("n_pos").over(w_all) / F.sum("n").over(w_all)),
            ndigits,
        ).alias("lift"),
        F.round(
            F.sum("n_pos").over(w_cum) / F.sum("n_pos").over(w_all), ndigits
        ).alias("cum_capture"),
    )


def target_encode_kfold(
    df: DataFrame,
    cat_col: str,
    label_cents_col: str,
    fold_col: str,
    smoothing: float = 20.0,
    ndigits: int = 6,
) -> DataFrame:
    """Leakage-free K-fold mean target encoding: each (category, fold)
    cell is encoded with the smoothed target mean computed over the OTHER
    folds —

        enc = (Σ_total − Σ_fold + m · prior) / (n_total − n_fold + m)

    the subtraction trick that needs only per-(cat, fold) partials plus
    per-cat totals: two map-side-combinable aggregates and one broadcast
    join, never a K-way anti-join per fold. Label sums ride on integer
    cents (exact); the global prior is one deterministic double. Output is
    category × fold sized — the encoding table a training pipeline
    broadcast-joins back onto the fact table.

    Output: (cat_col, fold, n_fold, encoding)."""
    per_cf = df.groupBy(
        F.col(cat_col), F.col(fold_col).alias("fold")
    ).agg(
        F.count(F.lit(1)).alias("n_fold"),
        F.sum(label_cents_col).alias("__s_fold"),
    )
    per_c = per_cf.groupBy(cat_col).agg(
        F.sum("n_fold").alias("__n_tot"), F.sum("__s_fold").alias("__s_tot")
    )
    prior = df.agg(
        (F.sum(label_cents_col) / F.count(F.lit(1))).alias("__prior")
    )
    enc = (
        F.col("__s_tot") - F.col("__s_fold") + smoothing * F.col("__prior")
    ) / (F.col("__n_tot") - F.col("n_fold") + F.lit(smoothing))
    return (
        per_cf.join(F.broadcast(per_c), cat_col)
        .crossJoin(F.broadcast(prior))
        .select(
            cat_col,
            "fold",
            "n_fold",
            F.round(enc, ndigits).alias("encoding"),
        )
    )


def categorical_association(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Association strength between two categorical columns in one scan:
    chi-square statistic, Cramér's V (χ²-normalized to [0, 1] by
    N·min(|X|−1, |Y|−1)), and mutual information in nats
    (Σ p(x,y) · ln(p(x,y) / p(x)p(y))) — the feature-selection screen a
    training pipeline runs over candidate categorical features. The
    contingency table is |X|·|Y| rows (materialized once, read by both
    margins), margins broadcast back; every input to the doubles is an
    exact integer count, so the per-cell terms are bit-identical across
    engines and the final cell-sum drift (~1 ulp over tens of cells) sits
    ~10 orders below the rounding grid.

    Output: one row (n, n_x, n_y, chi2, cramers_v, mi_nats)."""
    c = (
        df.groupBy(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    rx = c.groupBy("__x").agg(F.sum("n").alias("nx"))
    ry = c.groupBy("__y").agg(F.sum("n").alias("ny"))
    tot = c.agg(
        # NOT named "N": Spark's default resolver is case-insensitive, so
        # a column "N" next to the cell count "n" is AMBIGUOUS_REFERENCE
        F.sum("n").alias("n_total"),
        F.countDistinct("__x").alias("n_x"),
        F.countDistinct("__y").alias("n_y"),
    )
    # COMPLETE the contingency grid from the margins: groupBy only emits
    # OBSERVED cells, but a zero cell still contributes its full expected
    # count e to chi-square ((0−e)²/e = e) — dropping them understated χ²
    # by the total mass of structural zeros (caught by the perfect-
    # dependence test: a 2×2 diagonal table scored χ²=N/2 instead of N).
    # MI uses the 0·ln0 = 0 convention, so zero cells add nothing there.
    grid = (
        rx.crossJoin(ry)
        .join(c, ["__x", "__y"], "left")
        .select("__x", "__y", "nx", "ny", F.coalesce("n", F.lit(0)).alias("n"))
    )
    # go double BEFORE any long×long product: ANSI mode throws on int64
    # overflow, and cell×total or margin×margin products cross 2^63 well
    # inside the 100 TB design point
    e = F.col("nx") * 1.0 * F.col("ny") / F.col("n_total")
    terms = grid.crossJoin(F.broadcast(tot)).select(
        "n_total",
        "n_x",
        "n_y",
        (F.pow(F.col("n") - e, 2) / e).alias("__chi"),
        F.when(
            F.col("n") > 0,
            (F.col("n") * 1.0 / F.col("n_total"))
            * F.log(
                F.col("n") * 1.0 * F.col("n_total")
                / (F.col("nx") * 1.0 * F.col("ny"))
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("__mi"),
    )
    out = terms.groupBy("n_total", "n_x", "n_y").agg(
        F.sum("__chi").alias("__chi2"), F.sum("__mi").alias("__minats")
    )
    v = F.sqrt(
        F.col("__chi2")
        / (F.col("n_total") * F.least(F.col("n_x") - 1, F.col("n_y") - 1))
    )
    return out.select(
        F.col("n_total").alias("n"),
        "n_x",
        "n_y",
        F.round("__chi2", ndigits).alias("chi2"),
        F.round(v, ndigits).alias("cramers_v"),
        F.round("__minats", ndigits).alias("mi_nats"),
    )

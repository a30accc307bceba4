"""Distributed model-evaluation and feature-engineering operators.

The reference's ML surface stops at RegressionEvaluator point metrics
(notebook_to_py/price-prediction.py:209-257 reg_metrics); an engine feeding
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

    NULL-label rows are DROPPED (they are unlabeled, not negative — the
    cohens_kappa NULL-rater precedent); a single-class group emits
    auc = NULL instead of throwing under ANSI mode (r9 review).

    Output: (by, n_pos, n_neg, auc)."""
    df = df.filter(F.col(label_col).isNotNull())
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
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("__s1") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
        / (F.col("n_pos") * F.col("n_neg")),
    )
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

    NULL-label rows are DROPPED (unlabeled ≠ negative); a single-class
    group emits ks = NULL instead of an ANSI divide-by-zero (r9 review).

    Output: (by, n_pos, n_neg, ks)."""
    df = df.filter(F.col(label_col).isNotNull())
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
                F.when(
                    (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                    F.abs(
                        F.col("__cp") / F.col("n_pos")
                        - F.col("__cn") / F.col("n_neg")
                    ),
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

    Out-of-range scores clamp into the EDGE bins on both sides (scores
    > 1 into bin n_bins−1, scores < 0 into bin 0) — the r8 form clamped
    only the top, so a negative score emitted a phantom bin −1 while
    1.2 landed in the last real bin (r9 review).

    Output: (bin, n, avg_score, frac_pos)."""
    b = F.greatest(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
        ),
        F.lit(0),
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

    Scale note (r8): tiles come from operators.window.global_ntile —
    range exchange + bucket-partitioned row_number + closed-form tile,
    bit-identical to ntile() OVER (ORDER BY score DESC, id) while
    keeping every data-sized exchange partitioned (the former form was
    a deliberate single-partition sort with an approx-boundary
    downgrade note; the exact form now scales on its own).

    Output: (tile, n, n_pos, lift, cum_capture)."""
    from ..operators.window import global_ntile

    base = df.select(
        F.col(score_col).alias("__s"),
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("int").alias("__y"),
    )
    tiled = global_ntile(
        base, [F.col("__s").desc(), F.col("__id").asc()], n_tiles, "tile"
    ).select("tile", "__y")
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
    ).localCheckpoint(eager=True)  # category×fold hub read by the output
    # row, the per-cat totals, AND the prior (audit: 3 fact scans; 1)
    per_c = per_cf.groupBy(cat_col).agg(
        F.sum("n_fold").alias("__n_tot"), F.sum("__s_fold").alias("__s_tot")
    )
    # global prior from the (cat, fold) partials — a third fact scan
    # computed the identical Σ/N before (scan audit)
    prior = per_cf.agg(
        (F.sum("__s_fold") / F.sum("n_fold")).alias("__prior")
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

    NULL categories are DROPPED before tabulation (r9 review): the r8
    form kept NULL cells in the contingency counts but the grid-
    completing equi-join could never match them back (they were scored
    as structural zeros) while countDistinct excluded NULL from the
    margins — silently wrong χ²/V/MI on NULL-bearing input, V could
    exceed 1. Callers who want missingness as a category must encode a
    sentinel value first. A constant column (min(|X|,|Y|) = 1) emits
    cramers_v = NULL instead of an ANSI divide-by-zero.

    Output: one row (n, n_x, n_y, chi2, cramers_v, mi_nats)."""
    c = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
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
    v = F.when(
        F.least(F.col("n_x"), F.col("n_y")) > 1,
        F.sqrt(
            F.col("__chi2")
            / (F.col("n_total") * F.least(F.col("n_x") - 1, F.col("n_y") - 1))
        ),
    )
    return out.select(
        F.col("n_total").alias("n"),
        "n_x",
        "n_y",
        F.round("__chi2", ndigits).alias("chi2"),
        F.round(v, ndigits).alias("cramers_v"),
        F.round("__minats", ndigits).alias("mi_nats"),
    )


def conformal_intervals(
    df: DataFrame,
    role_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    alpha: float = 0.1,
    ndigits: int = 4,
) -> DataFrame:
    """Split conformal prediction for a 1-feature OLS regressor
    (Vovk et al.; the Lei et al. 2018 split recipe): fit on the train
    role, take the ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on the
    calibration role as the interval half-width q̂, and report the
    realized coverage of ŷ ± q̂ on the test role — the
    distribution-free uncertainty wrapper a model-serving pipeline
    certifies before shipping intervals.

    Everything is closed-form and exact: slope/intercept from integer-
    cent train moments (the grouped-OLS discipline), q̂ from an ORDER
    STATISTIC (row_number with id tie-break, the median_ci discipline —
    no approx-percentile), coverage from a count. One pass per role,
    scalars broadcast; no iterative fit anywhere.

    Output: one row (n_train, n_calib, n_test, slope, intercept, q_hat,
    coverage). slope/intercept rounding is fixed (6 and 2 digits — the
    oracle contract); ``ndigits`` applies to q_hat and coverage."""
    base = df.select(
        F.col(role_col).alias("role"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.col(id_col).alias("id"),
    )
    tm = base.filter(F.col("role") == "train").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    fit = tm.select(
        "n_train",
        (
            (F.col("n_train") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n_train") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("b"),
        "sx",
        "sy",
    ).select(
        "n_train",
        "b",
        ((F.col("sy") - F.col("b") * F.col("sx")) / F.col("n_train")).alias("a"),
    ).localCheckpoint(eager=True)  # 1-row fit: calib AND test branches
    # re-derived the train aggregate without it (audit: 4 scans; 3 — one
    # per role — after)
    resid = F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x")))
    cal = (
        base.filter(F.col("role") == "calib")
        .crossJoin(F.broadcast(fit))
        .select("id", resid.alias("r"))
    )
    # Order statistic via the distributed global row number (r8): the
    # former unpartitioned row_number window funneled the calibration
    # set through one partition; numbers are bit-identical, so q_hat
    # and the oracle are unchanged.
    from ..operators.window import distributed_row_number

    rn = distributed_row_number(
        cal, [F.col("r").asc(), F.col("id").asc()], out_col="rn"
    )
    tot = rn.agg(F.max("rn").alias("n_calib"))
    qhat = (
        rn.join(F.broadcast(tot))
        .withColumn(
            "k",
            F.ceil((F.col("n_calib") + 1) * F.lit(1.0 - alpha)).cast("long"),
        )
        .filter(F.col("rn") == F.least(F.col("k"), F.col("n_calib")))
        .select("n_calib", F.col("r").alias("q_hat"))
    )
    test = (
        base.filter(F.col("role") == "test")
        .crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.max("n_train").alias("n_train"),
            F.max("n_calib").alias("n_calib"),
            F.count(F.lit(1)).alias("n_test"),
            F.round(F.max("b"), 6).alias("slope"),
            F.round(F.max("a"), 2).alias("intercept"),
            F.round(F.max("q_hat"), ndigits).alias("q_hat"),
            F.round(
                F.avg((resid <= F.col("q_hat")).cast("double")), ndigits
            ).alias("coverage"),
        )
    )
    return test


def learning_curve_ols(
    df: DataFrame,
    gate_col: str,
    holdout_col: str,
    x_col: str,
    y_col: str,
    fractions: tuple = (0.1, 0.25, 0.5, 1.0),
    ndigits: int = 6,
) -> DataFrame:
    """Sample-efficiency curve for the closed-form 1-feature OLS: fit on
    NESTED train subsets (rows where ``gate_col`` < fraction — a shared
    uniform gate makes each subset contain the previous one, the
    variance-minimizing design for curve comparisons) and score R² on
    the FIXED holdout (``holdout_col`` true). Answers "is more data
    still buying accuracy" for the cheapest possible probe model —
    the data-budget twin of ext_vocab_saturation's token-level curve.

    ONE pass computes every subset's moments as conditional sums
    (sum(CASE WHEN gate < f ...)), one pass scores all fits on the
    holdout — 2 scans total regardless of curve resolution, no loop
    over fits.

    Output: (fraction, n_train, r2)."""
    aggs = []
    for i, f in enumerate(fractions):
        g = F.col(gate_col) < f
        aggs += [
            F.sum(g.cast("long")).alias(f"n_{i}"),
            F.sum(F.when(g, F.col(x_col))).alias(f"sx_{i}"),
            F.sum(F.when(g, F.col(y_col))).alias(f"sy_{i}"),
            F.sum(F.when(g, F.col(x_col) * F.col(y_col))).alias(f"sxy_{i}"),
            F.sum(F.when(g, F.col(x_col) * F.col(x_col))).alias(f"sxx_{i}"),
        ]
    train_m = df.filter(~F.col(holdout_col)).agg(*aggs)
    hold_m = df.filter(F.col(holdout_col)).agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(F.col(y_col)).alias("hsy"),
        F.sum(F.col(y_col) * F.col(y_col)).alias("hsyy"),
        F.sum(F.col(x_col)).alias("hsx"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("hsxx"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("hsxy"),
    )
    # ONE row of scalars feeding one union branch per fraction: without
    # materialization Catalyst re-derives BOTH aggregates per branch
    # (scan audit: 8 orders scans; 2 after)
    m = train_m.crossJoin(F.broadcast(hold_m)).localCheckpoint(eager=True)
    rows = []
    for i, f in enumerate(fractions):
        n, sx, sy, sxy, sxx = (
            F.col(f"n_{i}"),
            F.col(f"sx_{i}"),
            F.col(f"sy_{i}"),
            F.col(f"sxy_{i}"),
            F.col(f"sxx_{i}"),
        )
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        # SSE on holdout expands to moments: Σ(y − a − bx)² =
        # Σy² + n·a² + b²Σx² − 2aΣy − 2bΣxy + 2abΣx
        sse = (
            F.col("hsyy")
            + F.col("nh") * a * a
            + b * b * F.col("hsxx")
            - 2.0 * a * F.col("hsy")
            - 2.0 * b * F.col("hsxy")
            + 2.0 * a * b * F.col("hsx")
        )
        sst = F.col("hsyy") - F.col("hsy") * F.col("hsy") / F.col("nh")
        rows.append(
            m.select(
                F.lit(float(f)).alias("fraction"),
                n.alias("n_train"),
                F.round(1.0 - sse / sst, ndigits).alias("r2"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def loso_influence(
    df: DataFrame,
    group_col: str,
    holdout_col: str,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Leave-one-source-out data valuation for the closed-form OLS: for
    each group g, fit on the train pool WITHOUT g's rows and report the
    holdout R² delta vs the all-data fit — positive delta means the
    group's data HURTS generalization (the group-level cousin of
    influence functions, and the cheap screen behind "which source should
    the mixture down-weight", complementing ext_doremi_reweight's
    loss-based step with a held-out-utility-based one).

    ONE pass computes per-group train moments; each leave-one-out fit is
    total-minus-group arithmetic (never a re-scan per group — the
    target-encoding subtraction trick applied to regression moments), and
    every fit scores on the holdout via the SSE moment expansion. Exact:
    integer-valued doubles sum exactly below 2^53.

    Output: (excluded, n_train, r2, r2_delta) plus an '(none)' row for
    the full fit."""
    pool = df.filter(~F.col(holdout_col))
    per_g = pool.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col(x_col)).alias("sx_g"),
        F.sum(F.col(y_col)).alias("sy_g"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("sxy_g"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("sxx_g"),
    ).localCheckpoint(eager=True)  # group-cardinality hub: tot + every
    # leave-one-out branch re-derived the pool scan without it (audit: 8)
    tot = per_g.agg(
        F.sum("n_g").alias("n_t"),
        F.sum("sx_g").alias("sx_t"),
        F.sum("sy_g").alias("sy_t"),
        F.sum("sxy_g").alias("sxy_t"),
        F.sum("sxx_g").alias("sxx_t"),
    )
    hold = df.filter(F.col(holdout_col)).agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(F.col(y_col)).alias("hsy"),
        F.sum(F.col(y_col) * F.col(y_col)).alias("hsyy"),
        F.sum(F.col(x_col)).alias("hsx"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("hsxx"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("hsxy"),
    ).localCheckpoint(eager=True)
    # '(none)' row (exclude nothing) = zero group moments to subtract.
    # The full-fit row is identified by the __is_full FLAG, not by the
    # '(none)' display string: a real group whose value casts to
    # "(none)" must not be mistaken for the baseline (r9 review — the
    # string filter matched both rows and duplicated every output row
    # via the 2-row broadcast).
    rows = per_g.select(
        F.col("g").cast("string").alias("excluded"),
        F.lit(False).alias("__is_full"),
        "n_g", "sx_g", "sy_g", "sxy_g", "sxx_g",
    ).unionByName(
        tot.select(
            F.lit("(none)").alias("excluded"),
            F.lit(True).alias("__is_full"),
            F.lit(0).cast("long").alias("n_g"),
            F.lit(0.0).alias("sx_g"),
            F.lit(0.0).alias("sy_g"),
            F.lit(0.0).alias("sxy_g"),
            F.lit(0.0).alias("sxx_g"),
        )
    )
    m = rows.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(hold))
    n = F.col("n_t") - F.col("n_g")
    sx = F.col("sx_t") - F.col("sx_g")
    sy = F.col("sy_t") - F.col("sy_g")
    sxy = F.col("sxy_t") - F.col("sxy_g")
    sxx = F.col("sxx_t") - F.col("sxx_g")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    sse = (
        F.col("hsyy")
        + F.col("nh") * a * a
        + b * b * F.col("hsxx")
        - 2.0 * a * F.col("hsy")
        - 2.0 * b * F.col("hsxy")
        + 2.0 * a * b * F.col("hsx")
    )
    sst = F.col("hsyy") - F.col("hsy") * F.col("hsy") / F.col("nh")
    scored = m.select(
        "excluded",
        "__is_full",
        n.alias("n_train"),
        (1.0 - sse / sst).alias("__r2"),
    )
    full = scored.filter(F.col("__is_full")).select(
        F.col("__r2").alias("__full_r2")
    )
    return (
        scored.crossJoin(F.broadcast(full))
        .select(
            "excluded",
            "n_train",
            F.round("__r2", ndigits).alias("r2"),
            (
                F.round(F.col("__r2") - F.col("__full_r2"), ndigits)
                + F.lit(0.0)  # canonicalize -0.0 (see loco_importance)
            ).alias("r2_delta"),
        )
    )


def loco_importance(
    df: DataFrame,
    holdout_col: str,
    x1_col: str,
    x2_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Leave-one-covariate-out (LOCO) feature importance for the
    closed-form two-feature OLS (Lei et al. 2018's LOCO measure with
    exact refits — affordable because the refit is ALGEBRA, not
    training): fit y ~ x1 + x2 on the train pool via the centered normal
    equations, refit each single-feature model, and report holdout R²
    with the drop vs the full model. Unlike permutation importance this
    needs no pairing construction, and unlike split-half heuristics the
    refit is exact.

    One aggregate computes every raw train moment (incl. the x1·x2
    cross), one the holdout moments; all three fits and their holdout
    SSEs are arithmetic over those scalars (the learning-curve moment-
    expansion discipline). Exact when features/targets are
    integer-valued doubles.

    Output: (model, r2, importance) where model ∈ {full, drop_<x1>,
    drop_<x2>} and importance = r2_full − r2 (0 for full)."""
    pool = df.filter(~F.col(holdout_col))
    tm = pool.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(x1_col)).alias("s1"),
        F.sum(F.col(x2_col)).alias("s2"),
        F.sum(F.col(y_col)).alias("sy"),
        F.sum(F.col(x1_col) * F.col(x1_col)).alias("s11"),
        F.sum(F.col(x2_col) * F.col(x2_col)).alias("s22"),
        F.sum(F.col(x1_col) * F.col(x2_col)).alias("s12"),
        F.sum(F.col(x1_col) * F.col(y_col)).alias("s1y"),
        F.sum(F.col(x2_col) * F.col(y_col)).alias("s2y"),
    )
    hm = df.filter(F.col(holdout_col)).agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(F.col(x1_col)).alias("h1"),
        F.sum(F.col(x2_col)).alias("h2"),
        F.sum(F.col(y_col)).alias("hy"),
        F.sum(F.col(x1_col) * F.col(x1_col)).alias("h11"),
        F.sum(F.col(x2_col) * F.col(x2_col)).alias("h22"),
        F.sum(F.col(x1_col) * F.col(x2_col)).alias("h12"),
        F.sum(F.col(x1_col) * F.col(y_col)).alias("h1y"),
        F.sum(F.col(x2_col) * F.col(y_col)).alias("h2y"),
        F.sum(F.col(y_col) * F.col(y_col)).alias("hyy"),
    )
    # 1-row scalar table; three union branches below would re-derive both
    # fact aggregates without the materialization (audit: 6 scans; 2 after)
    m = tm.crossJoin(F.broadcast(hm)).localCheckpoint(eager=True)
    # centered train moments
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / F.col("n")
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / F.col("n")
    det = c11 * c22 - c12 * c12
    # full model
    b1_f = (c1y * c22 - c2y * c12) / det
    b2_f = (c2y * c11 - c1y * c12) / det
    a_f = (F.col("sy") - b1_f * F.col("s1") - b2_f * F.col("s2")) / F.col("n")
    # single-feature models (slope over its own centered variance)
    b1_d2 = c1y / c11  # drop x2
    a_d2 = (F.col("sy") - b1_d2 * F.col("s1")) / F.col("n")
    b2_d1 = c2y / c22  # drop x1
    a_d1 = (F.col("sy") - b2_d1 * F.col("s2")) / F.col("n")

    def sse2(a, b1, b2):
        return (
            F.col("hyy")
            + F.col("nh") * a * a
            + b1 * b1 * F.col("h11")
            + b2 * b2 * F.col("h22")
            + 2.0 * a * b1 * F.col("h1")
            + 2.0 * a * b2 * F.col("h2")
            + 2.0 * b1 * b2 * F.col("h12")
            - 2.0 * a * F.col("hy")
            - 2.0 * b1 * F.col("h1y")
            - 2.0 * b2 * F.col("h2y")
        )

    sst = F.col("hyy") - F.col("hy") * F.col("hy") / F.col("nh")
    r2_full = 1.0 - sse2(a_f, b1_f, b2_f) / sst
    r2_d2 = 1.0 - sse2(a_d2, b1_d2, F.lit(0.0)) / sst
    r2_d1 = 1.0 - sse2(a_d1, F.lit(0.0), b2_d1) / sst
    rows = [
        ("full", r2_full, F.lit(0.0)),
        (f"drop_{x1_col}", r2_d1, r2_full - r2_d1),
        (f"drop_{x2_col}", r2_d2, r2_full - r2_d2),
    ]
    out = None
    for name, r2, imp in rows:
        row = m.select(
            F.lit(name).alias("model"),
            F.round(r2, ndigits).alias("r2"),
            # + 0.0 canonicalizes IEEE negative zero: a ~−1e-9 delta
            # rounds to -0.0 in one engine and 0.0 in the other, and the
            # driver's repr-based hash treats them as different values
            (F.round(imp, ndigits) + F.lit(0.0)).alias("importance"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def pr_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    by: str,
    ndigits: int = 6,
) -> DataFrame:
    """Average precision (the step-function PR AUC) per group:

        AP = Σ_k (R_k − R_{k−1}) · P_k

    over DISTINCT scores in descending order (tie-safe: a tie block
    moves recall and precision together — the per-sample form would make
    AP depend on arbitrary intra-tie order). The class-imbalance-honest
    companion to ROC AUC: with 1% positives a useless model scores
    AP ≈ 0.01 while ROC AUC still reads 0.5.

    Plan: one row per (group, score) with tp/fp counts, one descending
    cumulative window, then a sum of exact-integer-ratio step areas —
    distinct-score cardinality end-to-end after the first aggregate.

    NULL-label rows are DROPPED (unlabeled ≠ negative); a group with no
    positives emits pr_auc = NULL instead of an ANSI divide-by-zero
    (r9 review).

    Output: (by, n_pos, n_neg, pr_auc)."""
    df = df.filter(F.col(label_col).isNotNull())
    per_score = df.groupBy(by, F.col(score_col).alias("__s")).agg(
        F.sum(F.col(label_col).cast("int")).alias("__p"),
        F.count(F.lit(1)).alias("__n"),
    )
    w_cum = (
        Window.partitionBy(by)
        .orderBy(F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(by)
    cum = per_score.select(
        by,
        F.sum("__p").over(w_cum).alias("__tp"),
        F.sum("__n").over(w_cum).alias("__pred"),
        F.sum("__p").over(w_all).alias("n_pos"),
        F.sum(F.col("__n") - F.col("__p")).over(w_all).alias("n_neg"),
        F.lag(F.sum("__p").over(w_cum))
        .over(Window.partitionBy(by).orderBy(F.col("__s").desc()))
        .alias("__tp_prev"),
    )
    step = F.when(
        F.col("n_pos") > 0,
        (
            (F.col("__tp") - F.coalesce(F.col("__tp_prev"), F.lit(0)))
            * 1.0
            / F.col("n_pos")
        )
        * (F.col("__tp") * 1.0 / F.col("__pred")),
    )
    return cum.groupBy(by).agg(
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
        F.round(F.sum(step), ndigits).alias("pr_auc"),
    )


def best_f1_threshold(
    df: DataFrame,
    label_col: str,
    score_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Operating-point selection: sweep every DISTINCT score as the
    decision threshold (predict positive iff score ≥ t) and return the
    threshold maximizing F1, with its precision/recall — the
    deployment-time knob the offline metrics feed. Ties on F1 break
    toward the HIGHEST threshold (fewest flagged — the conservative
    pick), deterministically.

    Cumulative TP and flagged counts come from
    ``global_running_sums`` over the distinct-score table (r9 rewire) —
    unlike pr_auc, this sweep is GLOBAL (no group key distributes the
    window), and for continuous model scores distinct values ≈ N rows,
    so the r8 unpartitioned cumulative window was a data-sized
    single-partition funnel. The two-pass form shares one range
    exchange for both sums; the argmax pick is a plain ``max(struct)``
    aggregate (map-side combinable) rather than a second unpartitioned
    row_number — bit-identical pick because (f1, threshold) is the same
    lexicographic order and thresholds are distinct. F1 =
    2TP/(2TP+FP+FN) from exact integers.

    NULL-label rows are DROPPED (unlabeled ≠ negative — the roc_auc
    policy); on all-negative input recall is NULL, not an ANSI crash.

    Output: one row (threshold, tp, fp, fn, precision, recall, f1)."""
    from ..operators.window import global_running_sums

    df = df.filter(F.col(label_col).isNotNull())
    per_score = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(F.col(label_col).cast("int")).alias("__p"),
        F.count(F.lit(1)).alias("__n"),
    )
    cum = global_running_sums(
        per_score,
        [F.col("__s").desc()],
        ["__p", "__n"],
        ["__ctp", "__cn"],
        totals=["__totp", None],
    ).select(
        F.col("__s").alias("threshold"),
        F.col("__ctp").alias("tp"),
        (F.col("__cn") - F.col("__ctp")).alias("fp"),
        (F.col("__totp") - F.col("__ctp")).alias("fn"),
    )
    f1 = 2.0 * F.col("tp") / (
        2.0 * F.col("tp") + F.col("fp") + F.col("fn")
    )
    # Argmax by (f1, threshold): max over a struct is lexicographic, so
    # ties on rounded F1 break toward the HIGHEST threshold — the same
    # deterministic pick the row_number form made. threshold is unique
    # (one row per distinct score), so the tail fields never tie.
    return (
        cum.agg(
            F.max(
                F.struct(
                    F.round(f1, ndigits).alias("f1"),
                    F.col("threshold"),
                    F.col("tp"),
                    F.col("fp"),
                    F.col("fn"),
                )
            ).alias("m")
        )
        # empty input: agg emits one NULL-struct row; the row_number
        # form emitted zero rows — keep that contract
        .where(F.col("m").isNotNull())
        .select(
            F.col("m.threshold").alias("threshold"),
            F.col("m.tp").alias("tp"),
            F.col("m.fp").alias("fp"),
            F.col("m.fn").alias("fn"),
            F.round(
                F.col("m.tp") * 1.0 / (F.col("m.tp") + F.col("m.fp")), ndigits
            ).alias("precision"),
            # all-negative input: tp + fn (= total positives) is 0 —
            # recall is undefined; NULL, not an ANSI crash (r9 review)
            F.round(
                F.when(
                    F.col("m.tp") + F.col("m.fn") > 0,
                    F.col("m.tp") * 1.0 / (F.col("m.tp") + F.col("m.fn")),
                ),
                ndigits,
            ).alias("recall"),
            F.col("m.f1").alias("f1"),
        )
    )


def kfold_cv_ols(
    df: DataFrame,
    fold_col: str,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Exact K-fold cross-validation of the closed-form 1-feature OLS:
    each fold's model trains on the OTHER folds via total-minus-fold
    moment subtraction (one aggregate computes every fold's moments —
    including Σy², which doubles as the test-side SSE input — so the
    whole CV is ONE fact scan plus arithmetic; MLlib's CrossValidator
    would launch K fits × P params jobs for the same answer on a linear
    probe). Per-fold R² is scored on the held-out fold itself.

    The CV dispersion across folds is the variance estimate a model
    selection step actually needs; rows are per fold so the caller sees
    the spread, not just the mean.

    Output: (fold, n_test, r2)."""
    per_f = df.groupBy(F.col(fold_col).alias("fold")).agg(
        F.count(F.lit(1)).alias("nf"),
        F.sum(F.col(x_col)).alias("fx"),
        F.sum(F.col(y_col)).alias("fy"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("fxy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("fxx"),
        F.sum(F.col(y_col) * F.col(y_col)).alias("fyy"),
    ).localCheckpoint(eager=True)  # fold-cardinality hub: totals + every
    # fold row read it (the round-6 multi-branch scan lesson)
    tot = per_f.agg(
        F.sum("nf").alias("n_t"),
        F.sum("fx").alias("sx_t"),
        F.sum("fy").alias("sy_t"),
        F.sum("fxy").alias("sxy_t"),
        F.sum("fxx").alias("sxx_t"),
    )
    m = per_f.crossJoin(F.broadcast(tot))
    n = F.col("n_t") - F.col("nf")
    sx = F.col("sx_t") - F.col("fx")
    sy = F.col("sy_t") - F.col("fy")
    sxy = F.col("sxy_t") - F.col("fxy")
    sxx = F.col("sxx_t") - F.col("fxx")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    sse = (
        F.col("fyy")
        + F.col("nf") * a * a
        + b * b * F.col("fxx")
        - 2.0 * a * F.col("fy")
        - 2.0 * b * F.col("fxy")
        + 2.0 * a * b * F.col("fx")
    )
    sst = F.col("fyy") - F.col("fy") * F.col("fy") / F.col("nf")
    return m.select(
        "fold",
        F.col("nf").alias("n_test"),
        F.round(1.0 - sse / sst, ndigits).alias("r2"),
    )


def ranking_metrics(
    df: DataFrame,
    query_col: str,
    id_col: str,
    rel_col: str,
    score_col: str,
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Per-query graded ranking metrics — NDCG@k and MRR — the retrieval
    evaluation head for the BM25/ANN stack (a RAG pipeline's offline
    quality gate):

        DCG@k  = Σ_{r≤k} (2^rel − 1) / log2(r + 1)   over score order
        IDCG@k = the same sum over relevance order (the ideal ranking)
        MRR    = 1 / rank of the first result with rel ≥ 2

    ONE pass builds both rankings as two row_number windows over the
    same scored table (score DESC vs rel DESC, both tie-broken by id so
    the ranked SET is deterministic); gains 2^rel - 1 are integer-valued
    doubles, the discount sum is ≤ k doubles per query — rounded
    well above the summation-order spread. Work is one sort per window
    on the query key; the output is |queries| rows.

    Output: (query, n_results, ndcg_at_k, mrr)."""
    base = df.select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("id"),
        F.col(rel_col).cast("int").alias("rel"),
        F.col(score_col).alias("score"),
    )
    ws = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    wi = Window.partitionBy("query").orderBy(
        F.col("rel").desc(), F.col("id").asc()
    )
    # 2^rel − 1 via pow (exact doubles for small graded rels; the PySpark
    # shiftleft wrapper only takes a literal bit count, not a Column).
    gain = F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0
    ranked = base.select(
        "query",
        "rel",
        gain.alias("g"),
        F.row_number().over(ws).alias("rs"),
        F.row_number().over(wi).alias("ri"),
    )
    disc = lambda r: F.log2(r.cast("double") + 1.0)  # noqa: E731
    # A query with NO relevant results has IDCG = 0: NDCG is defined as
    # 0 (nothing to rank correctly), not an ANSI divide-by-zero that
    # kills the whole evaluation job (r9 review).
    idcg = F.sum(
        F.when(F.col("ri") <= k, F.col("g") / disc(F.col("ri"))).otherwise(0.0)
    )
    return ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_results"),
        F.round(
            F.when(
                idcg > 0.0,
                F.sum(
                    F.when(
                        F.col("rs") <= k, F.col("g") / disc(F.col("rs"))
                    ).otherwise(0.0)
                )
                / idcg,
            ).otherwise(0.0),
            ndigits,
        ).alias("ndcg_at_k"),
        F.round(
            1.0 / F.min(F.when(F.col("rel") >= 2, F.col("rs"))), ndigits
        ).alias("mrr"),
    )


def average_precision_at_k(
    df: DataFrame,
    query_col: str,
    id_col: str,
    rel_col: str,
    score_col: str,
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Binary-relevance Precision@k and Average Precision@k per query —
    the MAP companion to ranking_metrics' graded NDCG/MRR:

        P@k  = |relevant in top k| / k
        AP@k = Σ_{r≤k, rel_r=1} (cum_rel_r / r) / min(R, k)

    cum_rel is one cumulative-sum window over the SAME deterministic
    score ranking (score DESC, id ASC tie-break); every count is exact,
    the per-query Σ is ≤ k doubles (rounded far above summation spread).
    One sort per query key; |queries| output rows.

    Output: (query, n_rel, precision_at_k, ap_at_k)."""
    base = df.select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("id"),
        (F.col(rel_col).cast("int") >= 1).cast("int").alias("rel"),
        F.col(score_col).alias("score"),
    )
    ws = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    ranked = base.select(
        "query",
        "rel",
        F.row_number().over(ws).alias("rs"),
        F.sum("rel").over(
            ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
    )
    return ranked.groupBy("query").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.round(
            F.sum(
                F.when((F.col("rs") <= k) & (F.col("rel") == 1), 1).otherwise(0)
            ).cast("double")
            / F.lit(float(k)),
            ndigits,
        ).alias("precision_at_k"),
        # no relevant results: AP is 0 by the standard convention
        # (min(R, k) = 0 would be an ANSI divide-by-zero; r9 review)
        F.round(
            F.when(
                F.sum("rel") > 0,
                F.sum(
                    F.when(
                        (F.col("rs") <= k) & (F.col("rel") == 1),
                        F.col("cum").cast("double")
                        / F.col("rs").cast("double"),
                    ).otherwise(0.0)
                )
                / F.least(F.sum("rel"), F.lit(k)).cast("double"),
            ).otherwise(0.0),
            ndigits,
        ).alias("ap_at_k"),
    )


def pinball_loss_q90(
    train: DataFrame,
    test: DataFrame,
    group_col: str,
    cents_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Quantile-forecast evaluation at q = 0.9: predict each group's P90
    from ``train`` (exact order statistic: value at rank ⌈0.9·n⌉), then
    score ``test`` with the pinball (quantile) loss

        L_q(y, ŷ) = max(q·(y − ŷ), (q − 1)·(y − ŷ))

    q = 9/10 keeps everything integral: 10·L is max(9·(y−ŷ), −(y−ŷ))
    in exact cents, summed as bigints — the loss is a ratio of exact
    integers, no float accumulation anywhere. Also reports the empirical
    coverage (fraction of test rows ≤ ŷ), which should approach 0.9 for
    a calibrated P90. One window over train per group + one broadcast
    join on the per-group prediction.

    Output: (group, n_test, p90_pred_cents, pinball_x10_total,
    pinball_mean, coverage)."""
    tr = train.select(
        F.col(group_col).alias("g"), F.col(cents_col).alias("v")
    )
    n_g = tr.groupBy("g").agg(F.count(F.lit(1)).alias("n_tr"))
    w = Window.partitionBy("g").orderBy(F.col("v").asc())
    ranked = tr.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(n_g), "g"
    )
    pred = ranked.filter(
        F.col("rn") == F.ceil(F.col("n_tr").cast("double") * 0.9)
    ).select("g", F.col("v").alias("yhat"))
    te = test.select(
        F.col(group_col).alias("g"), F.col(cents_col).alias("v")
    ).join(F.broadcast(pred), "g")
    d = F.col("v") - F.col("yhat")
    l10 = F.greatest(9 * d, -d)
    m = te.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.max("yhat").alias("p90_pred_cents"),
        F.sum(l10).alias("pinball_x10_total"),
        F.sum((F.col("v") <= F.col("yhat")).cast("int")).alias("n_cov"),
    )
    return m.select(
        F.col("g").alias(group_col),
        F.col("n_test").cast("bigint").alias("n_test"),
        F.col("p90_pred_cents").cast("bigint").alias("p90_pred_cents"),
        F.col("pinball_x10_total").cast("bigint").alias("pinball_x10_total"),
        F.round(
            F.col("pinball_x10_total").cast("double")
            / 10.0
            / F.col("n_test").cast("double"),
            ndigits,
        ).alias("pinball_mean"),
        F.round(
            F.col("n_cov").cast("double") / F.col("n_test").cast("double"),
            ndigits,
        ).alias("coverage"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group_col: str | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two BINARY
    raters (Cohen 1960), the standard inter-annotator-agreement figure
    a labeling pipeline reports before trusting its labels:

        κ = (p_o − p_e) / (1 − p_e)
        p_o = (n11 + n00) / n
        p_e = (a1·b1 + a0·b0) / n²   (marginal chance agreement)

    All four contingency cells and both marginals are EXACT integer
    counts from one map-side-combinable aggregate (one scan, one
    k-group shuffle when grouped); the only floating-point ops are the
    two final divisions — the exact-integer-moments parity discipline.
    A degenerate group where both raters are constant-and-equal has
    p_e = 1 (κ undefined); it reports κ = NULL via a when-guard rather
    than dividing by zero under ANSI.

    Rows where either rater is NULL are excluded up front: they fall in
    no contingency cell, so counting them in ``n`` would silently
    deflate both p_o and p_e (ADVICE r7) — after the filter, n equals
    n11 + n10 + n01 + n00 by construction.

    Output: (group?, n, n11, n10, n01, n00, po, pe, kappa)."""
    df = df.filter(F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull())
    a = F.col(rater_a).cast("int")
    b = F.col(rater_b).cast("int")
    keys = [F.col(group_col)] if group_col else []
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((a * b)).alias("n11"),
        F.sum((a * (1 - b))).alias("n10"),
        F.sum(((1 - a) * b)).alias("n01"),
        F.sum(((1 - a) * (1 - b))).alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01")).cast("double")
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00")).cast("double")
    ) / (nd * nd)
    return g.select(
        *([group_col] if group_col else []),
        F.col("n").cast("bigint").alias("n"),
        F.col("n11").cast("bigint").alias("n11"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n00").cast("bigint").alias("n00"),
        F.round(po, ndigits).alias("po"),
        F.round(pe, ndigits).alias("pe"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), ndigits))
        .otherwise(F.lit(None).cast("double"))
        .alias("kappa"),
    )

"""ml.eval (classification metrics, target encoding, association) and the
graph triangle/link-prediction operators — hand-computed ground truth on
small fixtures, plus the invariants (tie handling, leakage-freedom,
equal-population tiles) the oracle hash check can't isolate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from usedcars_bigdata_spark.ml.eval import (
    calibration_bins,
    categorical_association,
    ks_statistic,
    lift_deciles,
    roc_auc,
    target_encode_kfold,
)
from usedcars_bigdata_spark.operators.graph import (
    common_neighbors_topk,
    triangle_stats,
)


def _scores(spark, rows):
    return spark.createDataFrame(rows, ["g", "y", "s"])


def test_roc_auc_hand_computed_with_ties(spark):
    # pos scores {0.8, 0.6, 0.4}, neg {0.6, 0.2}: pairs (3x2=6):
    # 0.8>0.6, 0.8>0.2, 0.6=0.6 (0.5), 0.6>0.2, 0.4<0.6 (0), 0.4>0.2
    # AUC = (1+1+0.5+1+0+1)/6 = 4.5/6 = 0.75
    df = _scores(
        spark,
        [("a", 1, 0.8), ("a", 1, 0.6), ("a", 1, 0.4), ("a", 0, 0.6), ("a", 0, 0.2)],
    )
    out = roc_auc(df, "y", "s", "g").collect()
    assert len(out) == 1
    assert out[0].n_pos == 3 and out[0].n_neg == 2
    assert abs(out[0].auc - 0.75) < 1e-9


def test_roc_auc_perfect_and_random(spark):
    perfect = _scores(spark, [("a", 1, 0.9), ("a", 1, 0.8), ("a", 0, 0.2), ("a", 0, 0.1)])
    assert roc_auc(perfect, "y", "s", "g").collect()[0].auc == 1.0
    all_tied = _scores(spark, [("a", 1, 0.5), ("a", 0, 0.5), ("a", 1, 0.5), ("a", 0, 0.5)])
    assert abs(roc_auc(all_tied, "y", "s", "g").collect()[0].auc - 0.5) < 1e-9


def test_ks_hand_computed(spark):
    # pos at {0.7, 0.9}, neg at {0.1, 0.3}: after score 0.3 the neg CDF is
    # 1.0 and the pos CDF 0.0 -> KS = 1.0 (perfect separation)
    df = _scores(spark, [("a", 1, 0.7), ("a", 1, 0.9), ("a", 0, 0.1), ("a", 0, 0.3)])
    out = ks_statistic(df, "y", "s", "g").collect()[0]
    assert out.ks == 1.0 and out.n_pos == 2 and out.n_neg == 2
    # interleaved: pos {0.2, 0.6}, neg {0.4, 0.8}
    # CDF steps: 0.2: (0.5,0); 0.4: (0.5,0.5); 0.6: (1,0.5); 0.8: (1,1)
    # KS = 0.5
    df2 = _scores(spark, [("a", 1, 0.2), ("a", 1, 0.6), ("a", 0, 0.4), ("a", 0, 0.8)])
    assert abs(ks_statistic(df2, "y", "s", "g").collect()[0].ks - 0.5) < 1e-9


def test_calibration_bins_partition_and_clamp(spark):
    rows = [("a", i % 2, i / 20.0) for i in range(20)] + [("a", 1, 1.0)]
    df = _scores(spark, rows)
    out = calibration_bins(df, "y", "s", n_bins=10).collect()
    assert sum(r.n for r in out) == 21
    # score exactly 1.0 clamps into bin 9, not a phantom bin 10
    assert max(r.bin for r in out) == 9
    for r in out:
        assert 0.0 <= r.frac_pos <= 1.0


def test_lift_deciles_equal_population_and_capture(spark):
    # 100 rows, ids give the total order; top-half scores are positive-rich
    rows = [("a", 1 if i < 30 else 0, 1.0 - i / 100.0) for i in range(100)]
    df = spark.createDataFrame(
        [(y, s, i) for _, y, s in [r for r in rows] for i in [int((1.0 - s) * 100)]],
        ["y", "s", "id"],
    )
    out = {r.tile: r for r in lift_deciles(df, "y", "s", "id").collect()}
    assert sorted(out) == list(range(1, 11))
    assert all(out[t].n == 10 for t in out)
    # first 3 deciles hold all 30 positives -> capture hits 1.0 at tile 3
    assert out[3].cum_capture == 1.0 and out[4].cum_capture == 1.0
    caps = [out[t].cum_capture for t in range(1, 11)]
    assert caps == sorted(caps)
    # lift of decile 1 = (10/10)/(30/100) = 3.333...
    assert abs(out[1].lift - round(1.0 / 0.3, 6)) < 1e-9


def test_target_encoding_is_leakage_free(spark):
    # 2 categories x 2 folds; encoding for (cat, fold) must use ONLY the
    # other fold's rows (+ smoothing prior)
    rows = [
        ("c1", 0, 100), ("c1", 0, 200),   # fold 0 mean 150
        ("c1", 1, 1000), ("c1", 1, 2000),  # fold 1 mean 1500
        ("c2", 0, 10), ("c2", 1, 20),
    ]
    df = spark.createDataFrame(rows, ["cat", "fold", "cents"])
    m = 2.0
    prior = (100 + 200 + 1000 + 2000 + 10 + 20) / 6.0
    out = {
        (r.cat, r.fold): r.encoding
        for r in target_encode_kfold(df, "cat", "cents", "fold", smoothing=m).collect()
    }
    # (c1, fold 0) encodes from fold 1: (1000+2000 + 2*prior)/(2 + 2)
    want = (3000 + m * prior) / (2 + m)
    assert abs(out[("c1", 0)] - round(want, 6)) < 1e-9
    want10 = (300 + m * prior) / (2 + m)
    assert abs(out[("c1", 1)] - round(want10, 6)) < 1e-9
    # (c2, fold 0) has no other-fold rows beyond the single fold-1 row
    want2 = (20 + m * prior) / (1 + m)
    assert abs(out[("c2", 0)] - round(want2, 6)) < 1e-9


def test_categorical_association_independent_vs_dependent(spark):
    # independent: y cycles regardless of x -> MI ~ 0, V ~ 0
    ind = spark.createDataFrame(
        [(f"x{i % 2}", f"y{i % 3}") for i in range(600)], ["a", "b"]
    )
    r = categorical_association(ind, "a", "b").collect()[0]
    assert r.n == 600 and r.n_x == 2 and r.n_y == 3
    assert abs(r.mi_nats) < 1e-6 and abs(r.cramers_v) < 1e-6
    # perfectly dependent: y = f(x) -> V = 1, MI = H(X) = ln(2)
    dep = spark.createDataFrame(
        [(f"x{i % 2}", f"y{i % 2}") for i in range(100)], ["a", "b"]
    )
    r2 = categorical_association(dep, "a", "b").collect()[0]
    assert abs(r2.cramers_v - 1.0) < 1e-9
    assert abs(r2.mi_nats - math.log(2)) < 1e-6


def test_triangle_stats_k4(spark):
    # complete graph on 4 nodes: C(4,3)=4 triangles, clustering 1.0
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(edges, ["u", "v"])
    r = triangle_stats(df, "u", "v").collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    assert r.clustering == 1.0


def test_triangle_stats_orientation_agnostic(spark):
    # same triangle fed with mixed edge directions + a dup + a self-loop
    df = spark.createDataFrame(
        [(1, 2), (3, 2), (1, 3), (1, 2), (2, 2)], ["u", "v"]
    )
    # canonicalize via min/max projection the caller is expected to apply?
    # No — triangle_stats dedupes and drops self-loops, but assumes a<b
    # orientation; feed it canonical edges:
    canon = df.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    r = triangle_stats(canon, "u", "v").collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)
    assert r.clustering == 1.0


def test_common_neighbors_path_graph(spark):
    # path 1-2-3-4-5: non-adjacent pairs with common neighbors:
    # (1,3) via 2; (2,4) via 3; (3,5) via 4 -> each score 1
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 5)], ["u", "v"])
    out = common_neighbors_topk(df, "u", "v", k=10).collect()
    got = {(r.node_a, r.node_b): r.n_common for r in out}
    assert got == {(1, 3): 1, (2, 4): 1, (3, 5): 1}
    ranks = [r.rank for r in sorted(out, key=lambda r: r.rank)]
    assert ranks == [1, 2, 3]


def test_common_neighbors_excludes_existing_edges(spark):
    # triangle + pendant: (1,2),(2,3),(1,3),(3,4)
    # pairs sharing a neighbor: (1,2) via 3 — adjacent, excluded;
    # (1,4) via 3, (2,4) via 3 -> only those two
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], ["u", "v"])
    out = common_neighbors_topk(df, "u", "v", k=10).collect()
    got = {(r.node_a, r.node_b) for r in out}
    assert got == {(1, 4), (2, 4)}


def test_conformal_coverage_and_exactness(spark):
    """On y = 3x + deterministic bounded noise, the split-conformal
    interval must cover ~90% of test points (exchangeability) and q_hat
    must equal an actual calibration residual (order statistic, not an
    interpolation)."""
    from usedcars_bigdata_spark.ml.eval import conformal_intervals

    rows = []
    for i in range(900):
        role = "train" if i % 3 == 0 else ("calib" if i % 3 == 1 else "test")
        noise = ((i * 37) % 21) - 10  # deterministic in [-10, 10]
        rows.append((i, float(i % 50), 3.0 * (i % 50) + noise, role))
    df = spark.createDataFrame(rows, ["id", "x", "y", "role"])
    out = conformal_intervals(df, "role", "x", "y", "id", alpha=0.1).collect()[0]
    assert out.n_train == 300 and out.n_calib == 300 and out.n_test == 300
    assert abs(out.slope - 3.0) < 0.1
    # noise bounded by ~10 -> q_hat below 11; coverage near 0.9
    assert 0 < out.q_hat <= 11.5
    assert 0.82 <= out.coverage <= 1.0


def test_learning_curve_monotone_on_clean_signal(spark):
    """With pure linear signal plus noise, more training data cannot hurt
    the closed-form fit much: R2 at fraction 1.0 >= R2 at 0.1 - eps, and
    n_train is monotone in the fraction (nested subsets)."""
    from usedcars_bigdata_spark.ml.eval import learning_curve_ols

    rows = []
    for i in range(2000):
        gate = ((i * 2654435761) % 1000) / 1000.0
        hold = ((i * 40503) % 5) == 0
        noise = ((i * 97) % 41) - 20
        rows.append((float(i % 100), 5.0 * (i % 100) + noise, gate, hold))
    df = spark.createDataFrame(rows, ["x", "y", "gate", "holdout"])
    out = {r.fraction: r for r in learning_curve_ols(df, "gate", "holdout", "x", "y").collect()}
    ns = [out[f].n_train for f in (0.1, 0.25, 0.5, 1.0)]
    assert ns == sorted(ns) and ns[-1] > ns[0]
    assert out[1.0].r2 > 0.9
    assert out[1.0].r2 >= out[0.1].r2 - 0.05


def test_loco_importance_ranks_real_signal(spark):
    """y = 7*x1 + noise with x2 pure noise: dropping x1 collapses R2
    (big importance), dropping x2 barely moves it."""
    from usedcars_bigdata_spark.ml.eval import loco_importance

    rows = []
    for i in range(2000):
        x1 = float(i % 40)
        x2 = float((i * 13) % 17)           # unrelated
        noise = ((i * 97) % 21) - 10
        hold = (i % 5) == 0
        rows.append((x1, x2, 7.0 * x1 + noise, hold))
    df = spark.createDataFrame(rows, ["x1", "x2", "y", "holdout"])
    out = {r.model: r for r in loco_importance(df, "holdout", "x1", "x2", "y").collect()}
    assert set(out) == {"full", "drop_x1", "drop_x2"}
    assert out["full"].r2 > 0.95
    assert out["full"].importance == 0.0
    assert out["drop_x1"].importance > 0.9
    assert abs(out["drop_x2"].importance) < 0.01


def test_pr_auc_extremes_and_imbalance_honesty(spark):
    from usedcars_bigdata_spark.ml.eval import pr_auc

    perfect = _scores(spark, [("a", 1, 0.9), ("a", 1, 0.8), ("a", 0, 0.2), ("a", 0, 0.1)])
    assert pr_auc(perfect, "y", "s", "g").collect()[0].pr_auc == 1.0
    # 1 positive in 100, scored randomly-low: AP near base rate, not 0.5
    rows = [("a", 1 if i == 50 else 0, (i * 37 % 100) / 100.0) for i in range(100)]
    r = pr_auc(_scores(spark, rows), "y", "s", "g").collect()[0]
    assert r.n_pos == 1 and r.pr_auc < 0.2


def test_best_f1_threshold_hand_computed(spark):
    from usedcars_bigdata_spark.ml.eval import best_f1_threshold

    # pos at {0.9, 0.8, 0.4}, neg at {0.7, 0.3}: t=0.8 -> tp2 fp0 fn1
    # f1 = 4/5 = 0.8; t=0.4 -> tp3 fp1 fn0 f1 = 6/7 ~ 0.857 -> best t=0.4
    df = _scores(
        spark,
        [("a", 1, 0.9), ("a", 1, 0.8), ("a", 1, 0.4), ("a", 0, 0.7), ("a", 0, 0.3)],
    )
    r = best_f1_threshold(df, "y", "s").collect()[0]
    assert r.threshold == 0.4 and r.tp == 3 and r.fp == 1 and r.fn == 0
    assert abs(r.f1 - round(6 / 7, 6)) < 1e-9
    assert r.recall == 1.0


def test_best_f1_matches_window_form_and_stays_partitioned(spark):
    """The r9 two-pass rewire must (a) equal the unpartitioned-window
    reference form on a continuous-score fixture with F1 ties, across
    bucket counts, and (b) keep every data-sized frame out of
    SinglePartition — the executed plan may sort only the n_buckets-row
    offset table (this was the registry's last data-sized
    single-partition window)."""
    from pyspark.sql import Window

    from usedcars_bigdata_spark.ml.eval import best_f1_threshold
    from usedcars_bigdata_spark.operators.window import release_hubs

    # 400 distinct continuous scores; labels correlated with score but
    # noisy, plus duplicated score values to exercise the groupBy
    rows = []
    for i in range(400):
        s = round(i * 0.7071 % 1.0, 6)
        y = 1 if (i * 37) % 100 < 100 * s else 0
        rows.append(("u", y, s))
        if i % 7 == 0:
            rows.append(("u", 1 - y, s))  # tie group on the score
    df = spark.createDataFrame(rows, ["g", "y", "s"])

    # reference: the retired unpartitioned-window form, inline
    ps = df.groupBy(F.col("s").alias("__s")).agg(
        F.sum(F.col("y").cast("int")).alias("__p"),
        F.count(F.lit(1)).alias("__n"),
    )
    w_cum = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = ps.select(
        F.col("__s").alias("threshold"),
        F.sum("__p").over(w_cum).alias("tp"),
        (F.sum("__n").over(w_cum) - F.sum("__p").over(w_cum)).alias("fp"),
        (F.sum("__p").over(w_all) - F.sum("__p").over(w_cum)).alias("fn"),
    )
    f1 = 2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn"))
    want = (
        cum.withColumn(
            "__r",
            F.row_number().over(
                Window.orderBy(F.round(f1, 6).desc(), F.col("threshold").desc())
            ),
        )
        .filter(F.col("__r") == 1)
        .select("threshold", "tp", "fp", "fn", F.round(f1, 6).alias("f1"))
        .collect()[0]
    )

    got = best_f1_threshold(df, "y", "s").collect()[0]
    assert (got.threshold, got.tp, got.fp, got.fn, got.f1) == (
        want.threshold,
        want.tp,
        want.fp,
        want.fn,
        want.f1,
    )
    # plan shape: no unpartitioned data-sized window — the only Window
    # in the executed plan must be partitioned by the bucket id
    plan = (
        best_f1_threshold(df, "y", "s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    bad = [
        ln
        for ln in plan.splitlines()
        if "Window" in ln and "windowspecdefinition" in ln and "__b" not in ln
    ]
    assert not bad, f"unpartitioned window survived the rewire: {bad}"
    release_hubs()


def test_best_f1_empty_input_emits_no_row(spark):
    from usedcars_bigdata_spark.ml.eval import best_f1_threshold

    df = spark.createDataFrame([], "g string, y int, s double")
    assert best_f1_threshold(df, "y", "s").count() == 0


def test_kfold_cv_exact_leave_out(spark):
    """Two folds with different linear signals: each fold's model trains
    ONLY on the other fold, so fold A is scored by fold B's line (and
    scores poorly), proving the subtraction really leaves the fold out."""
    from usedcars_bigdata_spark.ml.eval import kfold_cv_ols

    rows = []
    for i in range(200):
        x = float(i % 20)
        rows.append((0, x, 5.0 * x))            # fold 0: slope 5
        rows.append((1, x, -5.0 * x + 100.0))   # fold 1: slope -5
    df = spark.createDataFrame(rows, ["fold", "x", "y"])
    out = {r.fold: r for r in kfold_cv_ols(df, "fold", "x", "y").collect()}
    assert out[0].n_test == 200 and out[1].n_test == 200
    # cross-fold fits are anti-correlated with the test fold -> r2 << 0
    assert out[0].r2 < 0 and out[1].r2 < 0
    # homogeneous folds: same signal everywhere -> r2 ~ 1 per fold
    rows2 = [(i % 4, float(i % 30), 3.0 * (i % 30) + ((i * 7) % 5)) for i in range(400)]
    df2 = spark.createDataFrame(rows2, ["fold", "x", "y"])
    for r in kfold_cv_ols(df2, "fold", "x", "y").collect():
        assert r.r2 > 0.95


# -------------------------------------------------------------- naive bayes


def test_naive_bayes_separable_feature_perfect(spark):
    from usedcars_bigdata_spark.ml.nb import naive_bayes_confusion

    # f perfectly determines y in train; test repeats the mapping.
    train = spark.createDataFrame(
        [(1, "a")] * 6 + [(0, "b")] * 6, ["y", "f"]
    )
    test = spark.createDataFrame(
        [(1, "a")] * 3 + [(0, "b")] * 3, ["y", "f"]
    )
    out = {
        (r.actual, r.predicted): r.n
        for r in naive_bayes_confusion(train, test, "y", ["f"]).collect()
    }
    assert out == {(1, 1): 3, (0, 0): 3}


def test_naive_bayes_unseen_value_falls_back_to_prior(spark):
    from usedcars_bigdata_spark.ml.nb import naive_bayes_confusion

    # Train prior is 2:1 toward y=0; test feature value never seen ->
    # Laplace terms equalize (alpha/(n_c+alpha*V)) differ only via n_c,
    # and the prior dominates -> predicts 0.
    train = spark.createDataFrame(
        [(0, "a")] * 8 + [(1, "b")] * 4, ["y", "f"]
    )
    test = spark.createDataFrame([(1, "zzz")], ["y", "f"])
    out = naive_bayes_confusion(train, test, "y", ["f"]).collect()
    assert len(out) == 1 and out[0].predicted == 0 and out[0].n == 1


def test_naive_bayes_hand_computed_two_features(spark):
    from usedcars_bigdata_spark.ml.nb import naive_bayes_confusion

    train = spark.createDataFrame(
        [
            (1, "a", "x"),
            (1, "a", "y"),
            (1, "b", "x"),
            (0, "b", "y"),
            (0, "b", "y"),
            (0, "a", "y"),
        ],
        ["y", "f1", "f2"],
    )
    test = spark.createDataFrame([(1, "a", "x"), (0, "b", "y")], ["y", "f1", "f2"])
    # n1=n0=3, V1=V2=2, alpha=1.
    # (a,x)|1: prior .5 * (2+1)/(3+2) * (2+1)/(3+2) = .5*.6*.6 = .18
    # (a,x)|0: .5 * (1+1)/5 * (0+1)/5 = .5*.4*.2 = .04 -> pred 1
    # (b,y)|1: .5 * (1+1)/5 * (1+1)/5 = .08
    # (b,y)|0: .5 * (2+1)/5 * (3+1)/5 = .5*.6*.8 = .24 -> pred 0
    out = {
        (r.actual, r.predicted): r.n
        for r in naive_bayes_confusion(
            train, test, "y", ["f1", "f2"]
        ).collect()
    }
    assert out == {(1, 1): 1, (0, 0): 1}


# ---------------------------------------------------------------- map@k


def test_average_precision_perfect_and_inverted(spark):
    from usedcars_bigdata_spark.ml.eval import average_precision_at_k

    # q1: all relevant ranked on top -> AP = 1, P@3 = 2/3 (2 rel, k=3)
    rows = [
        ("q1", 1, 1, 0.9),
        ("q1", 2, 1, 0.8),
        ("q1", 3, 0, 0.7),
        ("q1", 4, 0, 0.6),
        # q2: relevant ranked last: prec at hit = 1/3 -> AP = 1/3
        ("q2", 1, 0, 0.9),
        ("q2", 2, 0, 0.8),
        ("q2", 3, 1, 0.7),
    ]
    df = spark.createDataFrame(rows, ["q", "id", "rel", "score"])
    out = {
        r.query: r
        for r in average_precision_at_k(
            df, "q", "id", "rel", "score", k=3
        ).collect()
    }
    assert out["q1"].ap_at_k == 1.0
    assert out["q1"].precision_at_k == round(2 / 3, 6)
    assert out["q2"].ap_at_k == round(1 / 3, 6)
    assert out["q2"].n_rel == 1


def test_average_precision_partial_hand_computed(spark):
    from usedcars_bigdata_spark.ml.eval import average_precision_at_k

    # ranking: rel pattern [1, 0, 1, 0, 1], k=5, R=3
    # AP = (1/1 + 2/3 + 3/5) / 3
    rows = [
        ("q", i + 1, rel, 1.0 - i * 0.1)
        for i, rel in enumerate([1, 0, 1, 0, 1])
    ]
    df = spark.createDataFrame(rows, ["q", "id", "rel", "score"])
    r = average_precision_at_k(df, "q", "id", "rel", "score", k=5).collect()[0]
    assert r.ap_at_k == round((1 + 2 / 3 + 3 / 5) / 3, 6)


# --------------------------------------------- confusion scalars and gini


def test_binary_confusion_scalars_hand_computed(spark):
    from usedcars_bigdata_spark.ml.nb import binary_confusion_scalars

    conf = spark.createDataFrame(
        [(1, 1, 40), (0, 1, 10), (1, 0, 20), (0, 0, 30)],
        ["actual", "predicted", "n"],
    )
    r = binary_confusion_scalars(conf).collect()[0]
    tp, fp, fn, tn = 40.0, 10.0, 20.0, 30.0
    n = 100.0
    acc = (tp + tn) / n
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    kappa = (acc - pe) / (1 - pe)
    mf1 = (2 * tp / (2 * tp + fp + fn) + 2 * tn / (2 * tn + fn + fp)) / 2
    assert r.n == 100
    assert r.accuracy == round(acc, 6)
    assert r.mcc == round(mcc, 6)
    assert r.kappa == round(kappa, 6)
    assert r.macro_f1 == round(mf1, 6)


def test_binary_confusion_perfect_classifier(spark):
    from usedcars_bigdata_spark.ml.nb import binary_confusion_scalars

    conf = spark.createDataFrame(
        [(1, 1, 50), (0, 0, 50)], ["actual", "predicted", "n"]
    )
    r = binary_confusion_scalars(conf).collect()[0]
    assert (r.accuracy, r.mcc, r.kappa, r.macro_f1) == (1.0, 1.0, 1.0, 1.0)


def test_gini_feature_rank_separable_vs_noise(spark):
    from usedcars_bigdata_spark.ml.nb import gini_feature_rank

    # f_good perfectly splits y; f_noise is constant (zero decrease).
    rows = [(1, "a", "z")] * 10 + [(0, "b", "z")] * 10
    df = spark.createDataFrame(rows, ["y", "f_good", "f_noise"])
    out = {
        r.feature: r
        for r in gini_feature_rank(df, "y", ["f_good", "f_noise"]).collect()
    }
    assert out["f_good"].weighted_gini == 0.0
    assert out["f_good"].gini_decrease == 0.5  # root gini of 50/50
    assert out["f_noise"].gini_decrease == 0.0
    assert out["f_noise"].n_values == 1


# ------------------------------------------------------------ pinball loss


def test_pinball_q90_hand_computed(spark):
    from usedcars_bigdata_spark.ml.eval import pinball_loss_q90

    # train: 1..10 -> P90 = value at rank ceil(9) = 9
    train = spark.createDataFrame([("g", v) for v in range(1, 11)], ["g", "v"])
    test = spark.createDataFrame([("g", 5), ("g", 9), ("g", 20)], ["g", "v"])
    r = pinball_loss_q90(train, test, "g", "v").collect()[0]
    assert r.p90_pred_cents == 9
    # 10*L: y=5 -> max(9*-4, 4) = 4; y=9 -> 0; y=20 -> max(99, -11) = 99
    assert r.pinball_x10_total == 4 + 0 + 99
    assert r.pinball_mean == round(103 / 10 / 3, 6)
    assert r.coverage == round(2 / 3, 6)


# ----------------------------------------------------------- class balance


def test_balance_oversample_counts_and_determinism(spark):
    from usedcars_bigdata_spark.ml.prep import balance_oversample

    rows = [(i, 0) for i in range(90)] + [(i, 1) for i in range(90, 100)]
    df = spark.createDataFrame(rows, ["id", "y"])
    res = balance_oversample(df, "y", "id")
    out = res.groupBy("y").count().collect()
    counts = {r.y: r["count"] for r in out}
    assert counts[0] == 90  # majority untouched
    # E[n1_after] = 90 exactly; actual within the 10-row fractional band
    assert 81 <= counts[1] <= 99
    # deterministic: second run identical
    again = {
        r.y: r["count"]
        for r in balance_oversample(df, "y", "id").groupBy("y").count().collect()
    }
    assert again == counts
    # every minority row has at least floor(90/10) = 9 copies
    per_id = (
        res.filter(F.col("y") == 1).groupBy("id").count().collect()
    )
    assert all(r["count"] in (9, 10) for r in per_id)


def test_balance_oversample_label1_majority(spark):
    # round-6 ADVICE: with label 1 the MAJORITY, copies hit 0 and
    # F.sequence(1, 0) silently emitted a DESCENDING [1, 0] — label-1
    # rows came out TWICE (copy_idx 0 and -1). Now label 0 is detected
    # as the minority and oversampled; label 1 passes through once.
    from usedcars_bigdata_spark.ml.prep import balance_oversample

    rows = [(i, 1) for i in range(90)] + [(i, 0) for i in range(90, 100)]
    df = spark.createDataFrame(rows, ["id", "y"])
    res = balance_oversample(df, "y", "id")
    counts = {r.y: r["count"] for r in res.groupBy("y").count().collect()}
    assert counts[1] == 90  # majority passes through exactly once
    assert 81 <= counts[0] <= 99  # minority (label 0) oversampled ~9-10x
    assert res.agg(F.min("copy_idx")).collect()[0][0] == 0  # no -1 rows
    per_id = res.filter(F.col("y") == 0).groupBy("id").count().collect()
    assert all(r["count"] in (9, 10) for r in per_id)


def test_balance_oversample_single_class_passthrough(spark):
    # nmin = 0 (single-class input): no divide-by-zero, everything
    # passes through once with copy_idx 0.
    from usedcars_bigdata_spark.ml.prep import balance_oversample

    df = spark.createDataFrame([(i, 1) for i in range(20)], ["id", "y"])
    res = balance_oversample(df, "y", "id")
    assert res.count() == 20
    assert res.agg(F.max("copy_idx"), F.min("copy_idx")).collect()[0] == (0, 0)
    # balanced input (tie): both classes pass through once
    df2 = spark.createDataFrame(
        [(i, i % 2) for i in range(20)], ["id", "y"]
    )
    assert balance_oversample(df2, "y", "id").count() == 20


def test_bfs_layers_chain_graph(spark):
    from usedcars_bigdata_spark.operators.graph import bfs_layers

    # star center 1 (degree 3) + chain 1-2-3-4... seed = node 1
    e = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
        ["a", "b"],
    )
    out = {r.dist: r.n_nodes for r in bfs_layers(e, "a", "b", rounds=3).collect()}
    assert out[0] == 1          # seed
    assert out[1] == 3          # 10, 11, 2
    assert out[2] == 1          # 3
    assert out[3] == 1          # 4
    assert out[-1] == 3         # 5, 6, 7 unreached in 3 hops


def test_mi_pair_symmetric_and_mrmr_orders_planted(spark):
    from usedcars_bigdata_spark.ml.nb import mi_pair, mrmr_rank

    # f_good == y exactly; f_dup duplicates f_good; f_noise constant.
    rows = []
    for i in range(40):
        y = i % 2
        rows.append((y, str(y), str(y), "c"))
    df = spark.createDataFrame(rows, ["y", "f_good", "f_dup", "f_noise"])
    a = mi_pair(df, "f_good", "f_dup").collect()[0].mi_s
    b = mi_pair(df, "f_dup", "f_good").collect()[0].mi_s
    assert a == b  # symmetric
    out = {
        r.feature: r
        for r in mrmr_rank(df, "y", ["f_good", "f_dup", "f_noise"]).collect()
    }
    # good and dup are both perfectly relevant BUT fully redundant with
    # each other: mrmr = ln2 - (ln2 + 0)/2 = ln2/2
    import math

    half_ln2 = round(math.log(2) - (math.log(2) + 0.0) / 2, 6)
    assert out["f_good"].mrmr == half_ln2
    assert out["f_dup"].mrmr == half_ln2
    # noise: zero relevance, zero redundancy
    assert out["f_noise"].relevance == 0.0
    assert out["f_noise"].mrmr == 0.0
    # round-6 ADVICE: single-feature input must not crash — redundancy
    # is 0 and mrmr == relevance
    solo = mrmr_rank(df, "y", ["f_good"]).collect()
    assert len(solo) == 1
    assert solo[0].redundancy == 0.0
    assert solo[0].mrmr == solo[0].relevance == round(math.log(2), 6)


# --- r9 review: degenerate-input robustness (ANSI mode crashes / NULL
# semantics). Every guard below used to throw SparkArithmeticException
# DIVIDE_BY_ZERO (aborting the whole job) or silently mis-count. ---


def test_roc_ks_pr_single_class_groups_emit_null_not_crash(spark):
    from usedcars_bigdata_spark.ml.eval import pr_auc

    df = _scores(
        spark,
        [("all_pos", 1, 0.9), ("all_pos", 1, 0.2),
         ("all_neg", 0, 0.8), ("all_neg", 0, 0.1),
         ("mixed", 1, 0.7), ("mixed", 0, 0.3)],
    )
    auc = {r.g: r for r in roc_auc(df, "y", "s", "g").collect()}
    assert auc["all_pos"].auc is None and auc["all_neg"].auc is None
    assert auc["mixed"].auc == 1.0
    ks = {r.g: r for r in ks_statistic(df, "y", "s", "g").collect()}
    assert ks["all_pos"].ks is None and ks["mixed"].ks == 1.0
    pr = {r.g: r for r in pr_auc(df, "y", "s", "g").collect()}
    assert pr["all_neg"].pr_auc is None and pr["mixed"].pr_auc == 1.0


def test_roc_auc_null_labels_are_dropped_not_negatives(spark):
    df = _scores(
        spark, [("g", 1, 0.9), ("g", 0, 0.5), ("g", None, 0.7)]
    )
    row = roc_auc(df, "y", "s", "g").first()
    assert (row.n_pos, row.n_neg) == (1, 1)  # NULL row excluded
    assert row.auc == 1.0  # the NULL row no longer shifts ranks


def test_best_f1_all_negative_recall_null(spark):
    from usedcars_bigdata_spark.ml.eval import best_f1_threshold

    df = spark.createDataFrame(
        [(0, 0.9), (0, 0.4), (0, 0.1)], ["y", "s"]
    )
    row = best_f1_threshold(df, "y", "s").first()
    assert row.recall is None and row.tp == 0


def test_ranking_metrics_no_relevant_query_scores_zero(spark):
    from usedcars_bigdata_spark.ml.eval import (
        average_precision_at_k,
        ranking_metrics,
    )

    rows = [("q0", i, 0, 1.0 - i / 10.0) for i in range(4)] + [
        ("q1", 0, 2, 0.9), ("q1", 1, 0, 0.8)
    ]
    df = spark.createDataFrame(rows, ["q", "id", "rel", "score"])
    nd = {r.query: r for r in
          ranking_metrics(df, "q", "id", "rel", "score", k=3).collect()}
    assert nd["q0"].ndcg_at_k == 0.0 and nd["q1"].ndcg_at_k == 1.0
    ap = {r.query: r for r in
          average_precision_at_k(df, "q", "id", "rel", "score", k=3).collect()}
    assert ap["q0"].ap_at_k == 0.0 and ap["q1"].ap_at_k == 1.0


def test_categorical_association_null_categories_dropped(spark):
    # the reviewer's counterexample: with (NULL, y) rows KEPT the r8
    # form scored the observed NULL cell as a structural zero and
    # reported chi2=5.67, V=1.06 (>1). Dropping NULLs gives the exact
    # 2x2 perfect-dependence table: chi2 = N = 3? No: [(a,x)x2,(b,y)]
    # -> chi2 = 3, V = 1 on the 2x2 diagonal.
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), (None, "y"), (None, "y"), ("b", "y")],
        ["u", "v"],
    )
    row = categorical_association(df, "u", "v").first()
    assert (row.n, row.n_x, row.n_y) == (3, 2, 2)
    assert row.chi2 == 3.0 and row.cramers_v == 1.0
    # constant column: V undefined (NULL), chi2 still 0 - not a crash
    const = spark.createDataFrame(
        [("a", "x"), ("a", "y")], ["u", "v"]
    )
    crow = categorical_association(const, "u", "v").first()
    assert crow.cramers_v is None and crow.chi2 == 0.0


def test_calibration_bins_clamps_both_edges(spark):
    df = spark.createDataFrame(
        [(1, -0.2), (0, 0.05), (1, 1.3)], ["y", "s"]
    )
    bins = {r.bin: r.n for r in calibration_bins(df, "y", "s").collect()}
    assert bins == {0: 2, 9: 1}  # no phantom bin -1


def test_loso_influence_group_named_none_not_mistaken_for_baseline(spark):
    from usedcars_bigdata_spark.ml.eval import loso_influence

    rows = []
    for i in range(40):
        g = ["a", "b", "(none)", "d"][i % 4]
        hold = i % 5 == 0
        rows.append((g, hold, float(i % 7), float(2 * (i % 7)) + (i % 3)))
    df = spark.createDataFrame(rows, ["g", "holdout", "x", "y"])
    out = loso_influence(df, "g", "holdout", "x", "y").collect()
    # 4 groups + the full-fit row; no duplicated rows from a sentinel
    # collision with the real group "(none)"
    assert len(out) == 5
    full_rows = [r for r in out if r.r2_delta == 0.0]
    assert len(full_rows) >= 1

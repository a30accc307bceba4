"""Rank statistics, mergeable quantile sketch, k-core/HITS, retrieval
metrics, ROUGE — hand-computed ground truth on small adversarial fixtures
(ties, alternating series, pendant chains, perfect/inverted rankings)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext.text import rouge_n_recall_pairs
from usedcars_bigdata_spark.ml.eval import ranking_metrics
from usedcars_bigdata_spark.operators.agg import log_bucket_quantiles
from usedcars_bigdata_spark.operators.graph import (
    hits_unrolled,
    kcore_peel_trajectory,
)
from usedcars_bigdata_spark.operators.rankstats import (
    jarque_bera,
    kendall_tau_b,
    kruskal_wallis,
    mann_whitney_u,
    permutation_test_means,
    spearman_corr,
)
from usedcars_bigdata_spark.operators.timeseries import (
    acf_lags,
    periodogram_hourly,
)


# ---------------------------------------------------------------- spearman


def test_spearman_perfect_monotone_and_inverse(spark):
    rows = [("up", x, x * x) for x in range(1, 8)] + [
        ("down", x, -3 * x) for x in range(1, 8)
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r.g: r for r in spearman_corr(df, "g", "x", "y").collect()}
    assert out["up"].rho == 1.0  # any monotone map preserves ranks
    assert out["down"].rho == -1.0
    assert out["up"].n == 7


def test_spearman_midrank_ties_hand_computed(spark):
    # x = [1,2,2,3], y = [10,20,30,40]
    # rank_x (midranks) = [1, 2.5, 2.5, 4]; rank_y = [1,2,3,4]
    # Pearson of those: cov terms -> rho = 0.9486832980505138 -> round 6
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 2, 30), ("a", 3, 40)],
        ["g", "x", "y"],
    )
    rho = spearman_corr(df, "g", "x", "y").collect()[0].rho
    rx = [1.0, 2.5, 2.5, 4.0]
    ry = [1.0, 2.0, 3.0, 4.0]
    n = 4
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert rho == round(want, 6)


# ------------------------------------------------------------ mann-whitney


def test_global_midrank_map_matches_window_form(spark):
    """The distributed two-pass rank map must be bit-identical to the
    unpartitioned-window doubled midrank it replaced — including heavy
    tie groups and values that land in different range buckets. Also
    invariant to a pathological bucket count (values << buckets and
    values >> buckets)."""
    from pyspark.sql import Window

    from usedcars_bigdata_spark.operators.rankstats import (
        global_doubled_midrank_map,
    )

    vals = [5, 1, 3, 3, 3, 9, 1, 7, 7, 2, 8, 8, 8, 8, 0, 4, 6, 6, 2, 5]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    wr = Window.orderBy(F.col("v").asc())
    wt = Window.partitionBy("v")
    want = {
        r.v: r.r2
        for r in df.select(
            "v",
            (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1)
            .cast("bigint")
            .alias("r2"),
        ).collect()
    }
    for nb in (2, 32, 64):
        got = {
            r.v: r.r2
            for r in global_doubled_midrank_map(df, "v", n_buckets=nb).collect()
        }
        assert got == want, nb
    # tie counts are the value multiplicities
    ts = {
        r.v: r.t
        for r in global_doubled_midrank_map(df, "v").collect()
    }
    assert ts == {v: vals.count(v) for v in set(vals)}


def test_global_midrank_map_drops_nulls_consistently(spark):
    """NULL observations are dropped BEFORE ranking (r9 ADVICE fix):
    the plain equi-join consumers use would drop NULL rows anyway, but
    a NULL tie group used to land in the map (groupBy keeps NULL keys)
    and poison the tie moment. The map over NULL-bearing input must
    equal the map over the pre-filtered input — no NULL row, identical
    t and r2 for every real value."""
    from usedcars_bigdata_spark.operators.rankstats import (
        global_doubled_midrank_map,
    )

    vals = [5, 1, None, 3, 3, None, 9, 1, 7, None]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    clean = spark.createDataFrame(
        [(v,) for v in vals if v is not None], "v int"
    )
    got = sorted(
        (r.v, r.t, r.r2)
        for r in global_doubled_midrank_map(df, "v").collect()
    )
    want = sorted(
        (r.v, r.t, r.r2)
        for r in global_doubled_midrank_map(clean, "v").collect()
    )
    assert got == want
    assert all(v is not None for v, _, _ in got)


def test_mann_whitney_and_kruskal_consistent_on_null_values(spark):
    """mann_whitney_u / kruskal_wallis on a NULL-bearing value column
    must equal the same test on the NULL-filtered input — n, rank sums,
    and the tie correction all exclude the missing observations."""
    rows = [("a", 3), ("a", None), ("a", 5), ("b", 3), ("b", None), ("b", 8)]
    df = spark.createDataFrame(rows, "s string, v int")
    clean = df.filter(F.col("v").isNotNull())
    got_u = mann_whitney_u(df, "s", "v", "a", "b").collect()[0]
    want_u = mann_whitney_u(clean, "s", "v", "a", "b").collect()[0]
    assert got_u == want_u
    assert (got_u.n_a, got_u.n_b) == (2, 2)
    got_k = kruskal_wallis(df, "s", "v").collect()[0]
    want_k = kruskal_wallis(clean, "s", "v").collect()[0]
    assert got_k == want_k
    assert got_k.n == 4


def test_mann_whitney_hand_computed_no_ties(spark):
    # A = {1,2}, B = {3,4}: ranks 1..4, R_a = 3, U_a = 3 - 3 = 0
    # z = (0 - 2) / sqrt(4/12 * 5) = -2/sqrt(5/3)
    df = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 3), ("B", 4)], ["s", "v"]
    )
    row = mann_whitney_u(df, "s", "v", "A", "B").collect()[0]
    assert (row.n_a, row.n_b) == (2, 2)
    assert row.u_a == 0.0
    assert row.z == round(-2.0 / math.sqrt(5.0 / 3.0), 6)


def test_mann_whitney_tie_correction(spark):
    # A = {1,2}, B = {2,3}: sorted [1,2,2,3] -> midranks [1,2.5,2.5,4]
    # R_a = 3.5, U_a = 3.5 - 3 = 0.5; ties: one group t=2 -> tie3 = 6
    # var = (4/12) * (5 - 6/(4*3)) = (1/3) * 4.5 = 1.5
    # z = (0.5 - 2)/sqrt(1.5)
    df = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 2), ("B", 3)], ["s", "v"]
    )
    row = mann_whitney_u(df, "s", "v", "A", "B").collect()[0]
    assert row.u_a == 0.5
    assert row.z == round(-1.5 / math.sqrt(1.5), 6)


def test_mann_whitney_symmetric_samples_z_zero(spark):
    df = spark.createDataFrame(
        [("A", v) for v in (1, 5, 9)] + [("B", v) for v in (1, 5, 9)],
        ["s", "v"],
    )
    row = mann_whitney_u(df, "s", "v", "A", "B").collect()[0]
    assert row.z == 0.0  # identical samples -> U_a = n_a*n_b/2 exactly


# ------------------------------------------------------------- kendall tau


def test_kendall_perfect_and_tied(spark):
    # key "c": y strictly increases with x -> all 10 pairs concordant
    rows = [("c", t, t, 2 * t) for t in range(5)]
    # key "t": x increases, y has ties: y = [1,1,2,2]
    rows += [("t", 0, 0, 1), ("t", 1, 1, 1), ("t", 2, 2, 2), ("t", 3, 3, 2)]
    df = spark.createDataFrame(rows, ["k", "t", "x", "y"])
    out = {r.key: r for r in kendall_tau_b(df, "k", "t", "x", "y").collect()}
    assert out["c"].concordant == 10 and out["c"].discordant == 0
    assert out["c"].tau_b == 1.0
    # "t": n0 = 6 pairs, C = 4 (cross-tie-group pairs), D = 0, ty = 2
    # tau_b = 4 / sqrt(6 * (6-2)) = 4/sqrt(24)
    assert (out["t"].concordant, out["t"].discordant) == (4, 0)
    assert out["t"].tau_b == round(4.0 / math.sqrt(24.0), 6)


# -------------------------------------------------------------------- acf


def test_acf_alternating_series(spark):
    # x = [0,1]*4 (n=8, mean .5): r(1) = -7/8 biased, r(2) = +6/8
    rows = [("k", t, t % 2) for t in range(8)]
    df = spark.createDataFrame(rows, ["key", "t", "x"])
    out = {r.lag: r for r in acf_lags(df, "key", "t", "x", (1, 2)).collect()}
    assert out[1].n == 8
    assert out[1].r == round(-7.0 / 8.0, 6)
    assert out[2].r == round(6.0 / 8.0, 6)


def test_acf_lag_beyond_series_yields_no_row(spark):
    rows = [("k", t, t) for t in range(4)]
    df = spark.createDataFrame(rows, ["key", "t", "x"])
    lags = [r.lag for r in acf_lags(df, "key", "t", "x", (1, 10)).collect()]
    assert 1 in lags and 10 not in lags  # no (t, t+10) pairs exist


# ------------------------------------------------------------- permutation


def test_permutation_test_constant_values_p_one(spark):
    # every unit has the same value -> every replicate and the observed
    # statistic are exactly 0 -> p = (B+1)/(B+1) = 1
    rows = [(i, 700, i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, ["u", "v", "g"])
    row = permutation_test_means(
        df, "u", "v", "g", n_permutations=50, scale=100.0
    ).collect()[0]
    assert row.n_units == 20
    assert row.t_obs == 0.0
    assert row.p_value == 1.0


def test_permutation_test_deterministic_and_detects_shift(spark):
    # variant 1 values are 10x variant 0 -> tiny p, and exact re-run parity
    rows = [(i, 100, 0) for i in range(12)] + [
        (100 + i, 1000, 1) for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["u", "v", "g"])
    r1 = permutation_test_means(df, "u", "v", "g", n_permutations=100).collect()[0]
    r2 = permutation_test_means(df, "u", "v", "g", n_permutations=100).collect()[0]
    assert (r1.t_obs, r1.p_value) == (r2.t_obs, r2.p_value)
    assert r1.t_obs == 900.0
    assert r1.p_value < 0.1


# ---------------------------------------------------------------- ddsketch


def test_log_bucket_quantiles_relative_error_bound(spark):
    # sub_buckets=4 -> relative error of the midpoint estimate <= ~9.05%
    vals = [137, 1250, 4099, 88, 65536, 999, 23, 511, 512, 513, 70000, 3]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "cents"])
    out = log_bucket_quantiles(
        df, "grp", F.col("cents"), (0.5, 0.9), sub_buckets=4
    ).collect()
    assert {r.q for r in out} == {0.5, 0.9}
    sv = sorted(vals)
    for r in out:
        exact = sv[math.ceil(r.q * len(vals)) - 1] / 100.0
        assert abs(r.est_value - exact) / exact <= 0.125  # 2^(1/4)-1 + slack
        assert r.n == len(vals)


def test_log_bucket_sketch_is_mergeable(spark):
    # quantile over the union == quantile over per-half bucket counts
    # merged by addition: splitting the input cannot change the answer
    a = [2 ** i + 3 for i in range(1, 12)]
    b = [5 * i + 7 for i in range(1, 40)]
    whole = spark.createDataFrame([("g", v) for v in a + b], ["grp", "c"])
    q_whole = {
        (r.q): r.est_value
        for r in log_bucket_quantiles(whole, "grp", F.col("c"), (0.5,)).collect()
    }
    # shuffle input order: bucket counts are order-free
    rev = spark.createDataFrame([("g", v) for v in (b + a)[::-1]], ["grp", "c"])
    q_rev = {
        (r.q): r.est_value
        for r in log_bucket_quantiles(rev, "grp", F.col("c"), (0.5,)).collect()
    }
    assert q_whole == q_rev


# ------------------------------------------------------------ kcore / hits


def test_kcore_peels_chain_keeps_triangle(spark):
    # triangle {1,2,3} + pendant chain 3-4, 4-5: k=2 peel removes 5 then 4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["a", "b"]
    )
    out = {r.round: r for r in
           kcore_peel_trajectory(edges, "a", "b", k=2, rounds=4).collect()}
    # round 1 drops node 5 (degree 1) and its edge; round 2 drops node 4
    assert (out[1].n_nodes, out[1].n_edges) == (4, 4)
    assert (out[2].n_nodes, out[2].n_edges) == (3, 3)
    # converged: the triangle IS the 2-core
    assert (out[3].n_nodes, out[3].n_edges) == (3, 3)
    assert (out[4].n_nodes, out[4].n_edges) == (3, 3)


def test_hits_star_authority(spark):
    # hubs 1..4 all point at node 99 (plus a stray 1->50 edge):
    # authority mass concentrates on 99
    edges = spark.createDataFrame(
        [(1, 99), (2, 99), (3, 99), (4, 99), (1, 50)], ["s", "d"]
    )
    out = hits_unrolled(edges, "s", "d", iterations=2, top_k=5).collect()
    assert out[0].rank == 1 and out[0].node == 99
    # iter2: a(99) = 1/(1 + 1/3.4) = 0.772727...
    assert out[0].authority == round(1.0 / (1.0 + 1.0 / 3.4), 8)
    total = sum(r.authority for r in out)
    assert abs(total - 1.0) < 1e-6  # L1-normalized


# ------------------------------------------------------------ ndcg / rouge


def test_ranking_metrics_perfect_and_inverted(spark):
    # q "good": scores agree with relevance -> ndcg = 1, first rel>=2 at
    # rank 1 -> mrr = 1. q "bad": scores exactly inverted.
    rows = [("good", i, rel, float(rel)) for i, rel in enumerate([3, 2, 1, 0])]
    rows += [("bad", i, rel, float(3 - rel)) for i, rel in enumerate([3, 2, 1, 0])]
    df = spark.createDataFrame(rows, ["q", "id", "rel", "score"])
    out = {r.query: r for r in
           ranking_metrics(df, "q", "id", "rel", "score", k=10).collect()}
    assert out["good"].ndcg_at_k == 1.0
    assert out["good"].mrr == 1.0
    # bad: ranked rels are [0,1,2,3]; DCG = 0/1 + 1/log2(3) + 3/2 + 7/log2(5)
    dcg = (
        0.0
        + 1.0 / math.log2(3.0)
        + 3.0 / math.log2(4.0)
        + 7.0 / math.log2(5.0)
    )
    idcg = 7.0 + 3.0 / math.log2(3.0) + 1.0 / math.log2(4.0)
    assert out["bad"].ndcg_at_k == round(dcg / idcg, 6)
    # first rel>=2 in score order sits at rank 3 (rel=2 item)
    assert out["bad"].mrr == round(1.0 / 3.0, 6)


def test_rouge_recall_identity_partial_disjoint(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", 2),
            (2, "the cat sat on the mat", None),  # identical to ref 1
            (3, "the cat ate fish today ok", 4),
            (4, "a dog ran far away now", None),  # disjoint from ref 3
            (5, "the cat sat on the mat", 6),
            (6, "the cat sat somewhere else entirely", None),
        ],
        ["doc_id", "text", "pair"],
    )
    out = {r.ref_id: r for r in
           rouge_n_recall_pairs(df, "doc_id", "text", "pair", n=2).collect()}
    assert out[1].rouge_recall == 1.0  # identical docs
    assert out[3].rouge_recall == 0.0 and out[3].n_overlap == 0
    # ref 5 grams: {the cat, cat sat, sat on, on the, the mat} (5 distinct)
    # cand 6 shares exactly {the cat, cat sat} -> 2/5
    assert out[5].n_ref_grams == 5
    assert out[5].n_overlap == 2
    assert out[5].rouge_recall == 0.4
    assert set(out) == {1, 3, 5}  # NULL-pair rows dropped


# ---------------------------------------------------------- kruskal-wallis


def test_kruskal_wallis_no_ties_hand_computed(spark):
    # a=[1,2,3] b=[4,5,6] c=[7,8,9]: ranks 1..9, R=(6,15,24)
    # H = 12/90 * (36/3 + 225/3 + 576/3) - 30 = 7.2 exactly; no ties.
    rows = (
        [("a", v) for v in (1, 2, 3)]
        + [("b", v) for v in (4, 5, 6)]
        + [("c", v) for v in (7, 8, 9)]
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert (r.n, r.k) == (9, 3)
    assert r.h == 7.2
    assert r.h_tie_corrected == 7.2  # tie3 = 0
    assert r.epsilon_sq == round((7.2 - 3 + 1) / (9 - 3), 6)


def test_kruskal_wallis_tie_correction(spark):
    # a=[1,1] b=[2,2]: midranks 1.5,1.5,3.5,3.5 -> R_a=3, R_b=7
    # H = 12/20*(4.5+24.5) - 15 = 2.4; tie3 = 6+6 = 12
    # H' = 2.4 / (1 - 12/60) = 3.0; eps2 = (3-2+1)/(4-2) = 1.0
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2)], ["g", "v"]
    )
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r.h == 2.4
    assert r.h_tie_corrected == 3.0
    assert r.epsilon_sq == 1.0


# ------------------------------------------------------------- jarque-bera


def test_jarque_bera_hand_computed(spark):
    vals = [1, 2, 3, 4, 10]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    r = jarque_bera(df, "g", "v").collect()[0]
    n = len(vals)
    s1 = sum(vals)
    s2 = sum(v * v for v in vals)
    s3 = sum(v**3 for v in vals)
    s4 = sum(v**4 for v in vals)
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean**3
    m4 = (
        s4 / n
        - 4.0 * mean * (s3 / n)
        + 6.0 * mean * mean * (s2 / n)
        - 3.0 * mean**4
    )
    g1 = m3 / math.sqrt(m2 * m2 * m2)
    g2 = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    assert r.n == n
    assert r.skewness == round(g1, 6)
    assert r.kurtosis_excess == round(g2, 6)
    assert r.jb == round(jb, 6)


def test_jarque_bera_symmetric_zero_skew(spark):
    # symmetric sample -> m3 = 0 exactly -> skewness 0
    df = spark.createDataFrame(
        [("g", v) for v in (-2, -1, 0, 1, 2)], ["g", "v"]
    )
    r = jarque_bera(df, "g", "v").collect()[0]
    assert r.skewness == 0.0


# ------------------------------------------------- link prediction / mixing


def test_resource_allocation_excludes_edges_and_scores(spark):
    # 1-2, 1-3, 2-3 triangle plus pendant 3-4. Non-edge pairs with
    # common neighbors: (1,4) and (2,4), each via z=3 (deg 3) -> RA=1/3.
    from usedcars_bigdata_spark.operators.graph import (
        resource_allocation_topk,
    )

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["a", "b"]
    )
    out = resource_allocation_topk(e, "a", "b", k=10).collect()
    got = {(r.node_a, r.node_b): (r.n_common, r.ra_score) for r in out}
    assert got == {(1, 4): (1, 0.333333), (2, 4): (1, 0.333333)}


def test_degree_assortativity_hand_computed(spark):
    # Same graph: directed endpoint-degree pairs give
    # num = 8*38 - 18*18 = -20, den = 8*44 - 324 = 28 -> r = -5/7.
    from usedcars_bigdata_spark.operators.graph import degree_assortativity

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["a", "b"]
    )
    r = degree_assortativity(e, "a", "b").collect()[0]
    assert r.n_edges == 4
    assert r.r == round(-20 / 28, 6)


# -------------------------------------------------------------- periodogram


def test_periodogram_pure_cosine_peaks_at_its_frequency(spark):
    # counts c_t = 100 + round(50*cos(2*pi*3*t/48)) over 48 hours:
    # power should peak at k=3 and be ~zero at other frequencies.
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for t in range(48):
        c = 100 + round(50 * math.cos(2 * math.pi * 3 * t / 48))
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(hours=t)))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    out = {
        r.k: r.power
        for r in periodogram_hourly(df, "ts", k_max=6).collect()
    }
    assert len(out) == 6  # k = 1..6 requested
    peak = out[3]
    others = [v for k, v in out.items() if k != 3]
    assert peak > 100 * max(others)  # dominant line at k=3
    # amplitude check: P_3 ~ (N/2 * 50)^2 / N^2 = 625 (counts are
    # integer-rounded, so the realized amplitude is slightly off 50)
    assert abs(peak - 625.0) < 15.0


def test_periodogram_constant_series_no_power(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i * 10 + j, base + datetime.timedelta(hours=i))
        for i in range(24)
        for j in range(5)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    out = periodogram_hourly(df, "ts", k_max=4).collect()
    assert all(abs(r.power) < 1e-6 for r in out)
    assert all(r.n_hours == 24 for r in out)


# ------------------------------------------------------ rolling correlation


def test_rolling_corr_perfect_and_inverse(spark):
    import datetime

    from usedcars_bigdata_spark.operators.timeseries import (
        rolling_corr_hourly,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hours 0..5: a = t+1 purchases, b = 2(t+1) clicks -> r = 1 exactly
    for t in range(6):
        for _ in range(t + 1):
            rows.append((eid, base + datetime.timedelta(hours=t), "purchase"))
            eid += 1
        for _ in range(2 * (t + 1)):
            rows.append((eid, base + datetime.timedelta(hours=t), "click"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = rolling_corr_hourly(
        df, "ts", "event_type", "purchase", "click", window_hours=3
    ).collect()
    # full windows start at the 3rd hour; all perfectly correlated
    assert len(out) == 4
    assert all(r.r == 1.0 and r.n == 3 for r in out)


def test_rolling_corr_constant_series_is_null(spark):
    import datetime

    from usedcars_bigdata_spark.operators.timeseries import (
        rolling_corr_hourly,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for t in range(4):
        rows.append((eid, base + datetime.timedelta(hours=t), "purchase"))
        eid += 1
        for _ in range(t + 1):  # clicks vary, purchases constant
            rows.append((eid, base + datetime.timedelta(hours=t), "click"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = rolling_corr_hourly(
        df, "ts", "event_type", "purchase", "click", window_hours=2
    ).collect()
    assert len(out) == 3
    assert all(r.r is None for r in out)


def test_rolling_corr_gap_narrows_window(spark):
    import datetime

    from usedcars_bigdata_spark.operators.timeseries import (
        rolling_corr_hourly,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hours 0,1 then a gap, then 10,11: range frame must NOT bridge it
    for t in (0, 1, 10, 11):
        for _ in (0, 1):
            rows.append((eid, base + datetime.timedelta(hours=t), "purchase"))
            eid += 1
        rows.append((eid, base + datetime.timedelta(hours=t), "click"))
        eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = rolling_corr_hourly(
        df, "ts", "event_type", "purchase", "click", window_hours=2
    ).collect()
    # full 2-hour windows only at h=1 and h=11 (not across the gap)
    assert sorted(r.h for r in out) == [
        int(base.timestamp()) // 3600 + 1,
        int(base.timestamp()) // 3600 + 11,
    ]


# --------------------------------------------------------------- ljung-box


def test_ljung_box_hand_computed_from_acf_rows(spark):
    from usedcars_bigdata_spark.operators.rankstats import ljung_box

    # ACF table directly (key, lag, n, r): Q = n(n+2) sum r^2/(n-l)
    rows = [("k", 1, 100, 0.5), ("k", 2, 100, -0.3), ("k", 3, 100, 0.1)]
    df = spark.createDataFrame(rows, ["g", "lag", "n", "r"])
    out = ljung_box(df, "g").collect()[0]
    want = 100 * 102 * (
        round(0.25 / 99 * 1e12) / 1e12
        + round(0.09 / 98 * 1e12) / 1e12
        + round(0.01 / 97 * 1e12) / 1e12
    )
    assert out.h_lags == 3
    assert out.q == round(want, 6)


def test_ljung_box_white_noise_small_q(spark):
    from usedcars_bigdata_spark.operators.rankstats import ljung_box

    # zero autocorrelation at every lag -> Q = 0
    rows = [("k", l, 50, 0.0) for l in (1, 2, 3)]
    df = spark.createDataFrame(rows, ["g", "lag", "n", "r"])
    assert ljung_box(df, "g").collect()[0].q == 0.0


# -------------------------------------------------------------------- hurst


def test_hurst_rs_single_block_hand_computed(spark):
    from usedcars_bigdata_spark.operators.timeseries import hurst_rs

    # one size-4 block, x = [1, 2, 3, 10]: sum=16, mean=4
    # devs: -3, -2, -1, 6; W: -3, -5, -6, 0 -> R = 0-(-6) = 6
    # S = sqrt(m2), m2 = (1+4+9+100)/4 - 16 = 12.5 -> R/S = 6/sqrt(12.5)
    df = spark.createDataFrame(
        [(t, x) for t, x in enumerate([1, 2, 3, 10])], ["t", "x"]
    )
    out = hurst_rs(df, "t", "x", sizes=(4,)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_blocks == 1
    assert r.avg_rs == round(6 / math.sqrt(12.5), 6)
    assert r.hurst is None  # one size -> no slope


def test_hurst_trending_series_persistent(spark):
    from usedcars_bigdata_spark.operators.timeseries import hurst_rs

    # strictly increasing series: R/S grows ~linearly with s -> H near 1
    df = spark.createDataFrame(
        [(t, t) for t in range(256)], ["t", "x"]
    )
    r = hurst_rs(df, "t", "x", sizes=(8, 16, 32, 64)).collect()[0]
    assert r.hurst > 0.9


def test_hurst_alternating_series_antipersistent(spark):
    from usedcars_bigdata_spark.operators.timeseries import hurst_rs

    # +1/-1 alternation: R saturates at once -> H near 0
    df = spark.createDataFrame(
        [(t, t % 2) for t in range(256)], ["t", "x"]
    )
    r = hurst_rs(df, "t", "x", sizes=(8, 16, 32, 64)).collect()[0]
    assert r.hurst < 0.2


# --------------------------------------------------------------------- haar


def test_haar_energy_hand_computed_two_levels(spark):
    from usedcars_bigdata_spark.operators.timeseries import haar_energy

    # x = [1, 3, 6, 2]: level 1 pairs (1,3),(6,2): d = [-2, 4]
    #   -> E1 = (4+16)/2 = 10; a1 = [4, 8]: level 2 d = -4 -> E2 = 16/4 = 4
    df = spark.createDataFrame(
        list(enumerate([1, 3, 6, 2])), ["t", "x"]
    )
    out = {r.level: r for r in haar_energy(df, "t", "x", levels=2).collect()}
    assert out[1].n_coeffs == 2 and out[1].energy == 10.0
    assert out[2].n_coeffs == 1 and out[2].energy == 4.0
    assert out[1].energy_frac == round(10 / 14, 6)
    assert out[2].energy_frac == round(4 / 14, 6)


def test_haar_energy_alternating_concentrates_level1(spark):
    from usedcars_bigdata_spark.operators.timeseries import haar_energy

    # strict +1/-1 alternation: ALL energy at the finest scale
    df = spark.createDataFrame(
        [(t, t % 2) for t in range(64)], ["t", "x"]
    )
    out = {r.level: r for r in haar_energy(df, "t", "x", levels=3).collect()}
    assert out[1].energy_frac == 1.0
    assert out[2].energy == 0.0 and out[3].energy == 0.0


def test_mutual_info_separable_vs_constant(spark):
    from usedcars_bigdata_spark.ml.nb import mutual_info_features

    rows = [(1, "a", "z")] * 8 + [(0, "b", "z")] * 8
    df = spark.createDataFrame(rows, ["y", "f_good", "f_const"])
    out = {
        r.feature: r
        for r in mutual_info_features(df, "y", ["f_good", "f_const"]).collect()
    }
    # perfectly informative feature: MI = H(Y) = ln 2
    assert out["f_good"].mi_nats == round(math.log(2), 6)
    assert out["f_good"].h_feature_nats == round(math.log(2), 6)
    assert out["f_const"].mi_nats == 0.0
    assert out["f_const"].h_feature_nats == 0.0


# ------------------------------------------------------------ ar2 / binseg


def test_ar2_yule_walker_closed_form(spark):
    from usedcars_bigdata_spark.operators.timeseries import ar2_yule_walker

    acf = spark.createDataFrame(
        [("k", 1, 100, 0.6), ("k", 2, 100, 0.3)], ["g", "lag", "n", "r"]
    )
    r = ar2_yule_walker(acf, "g").collect()[0]
    den = 1 - 0.36
    phi1 = 0.6 * (1 - 0.3) / den
    phi2 = (0.3 - 0.36) / den
    assert r.phi1 == round(phi1, 6)
    assert r.phi2 == round(phi2, 6)
    assert r.innov_ratio == round(1 - phi1 * 0.6 - phi2 * 0.3, 6)
    assert r.stationary is True


def test_changepoint_binseg_finds_planted_shift(spark):
    from usedcars_bigdata_spark.operators.timeseries import (
        changepoint_binseg,
    )

    # level 10 for t<32, level 50 for t>=32: split at the boundary
    rows = [("k", t, 10 if t < 32 else 50) for t in range(64)]
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    r = changepoint_binseg(df, "g", "t", "x").collect()[0]
    # t_split = last point of the LEFT segment = 31
    assert r.t_split == 31
    assert r.mean_left == 10.0 and r.mean_right == 50.0
    # gain = SSE reduction = n/4 * (50-10)^2 ... exact: total SSE of a
    # two-level series with equal halves = n*(d/2)^2 = 64*400 = 25600
    assert r.gain == 25600.0


def test_changepoint_binseg_constant_series_zero_gain(spark):
    from usedcars_bigdata_spark.operators.timeseries import (
        changepoint_binseg,
    )

    df = spark.createDataFrame(
        [("k", t, 7) for t in range(32)], ["g", "t", "x"]
    )
    r = changepoint_binseg(df, "g", "t", "x").collect()[0]
    assert r.gain == 0.0
    assert r.mean_left == 7.0 and r.mean_right == 7.0


# -------------------------------------------------- runs / turning points


def test_runs_test_alternating_max_runs(spark):
    from usedcars_bigdata_spark.operators.rankstats import runs_test

    # 0,10,0,10,... 12 points: median pick at rank 6 (sorted) = 0 ->
    # above = {10}, runs = 12 (every point flips), z large positive
    rows = [("k", t, 0 if t % 2 == 0 else 10) for t in range(12)]
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    r = runs_test(df, "g", "t", "x").collect()[0]
    assert (r.n_above, r.n_below, r.n_runs) == (6, 6, 12)
    n, n1, n2 = 12.0, 6.0, 6.0
    mu = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    assert r.z == round((12 - mu) / math.sqrt(var), 6)


def test_runs_test_sorted_series_two_runs(spark):
    from usedcars_bigdata_spark.operators.rankstats import runs_test

    rows = [("k", t, t) for t in range(10)]
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    r = runs_test(df, "g", "t", "x").collect()[0]
    assert r.n_runs == 2  # all-below then all-above
    assert r.z < -2  # strongly non-random


def test_turning_points_hand_counts(spark):
    from usedcars_bigdata_spark.operators.rankstats import (
        turning_points_test,
    )

    # x = [1,3,2,4,4,5]: turning at t=1 (3) and t=2 (2); the flat 4,4
    # triple is NOT a turn (strict convention)
    rows = list(enumerate([1, 3, 2, 4, 4, 5]))
    df = spark.createDataFrame([("k", t, x) for t, x in rows], ["g", "t", "x"])
    r = turning_points_test(df, "g", "t", "x").collect()[0]
    assert r.n_turning == 2
    n = 6.0
    assert r.z == round(
        (2 - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90), 6
    )


# ----------------------------------------------------------- vshape pattern


def test_vshape_census_hand_built_sequences(spark):
    import datetime

    from usedcars_bigdata_spark.operators.timeseries import (
        vshape_pattern_census,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: 10, 5, 8, 3, 9 -> down, up, down, up = 2 V shapes
    for i, v in enumerate([10, 5, 8, 3, 9]):
        rows.append((1, base + datetime.timedelta(hours=i), i, v))
    # user 2: monotone up -> 0 V
    for i, v in enumerate([1, 2, 3, 4]):
        rows.append((2, base + datetime.timedelta(hours=i), 100 + i, v))
    # user 3: down then FLAT then up: 5, 3, 3, 6 -> flat breaks the V
    for i, v in enumerate([5, 3, 3, 6]):
        rows.append((3, base + datetime.timedelta(hours=i), 200 + i, v))
    # user 4: only 2 events -> excluded by min_events
    for i, v in enumerate([9, 1]):
        rows.append((4, base + datetime.timedelta(hours=i), 300 + i, v))
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "v"])
    out = {
        r.n_vshapes: r.n_keys
        for r in vshape_pattern_census(df, "k", "ts", "eid", "v").collect()
    }
    assert out == {2: 1, 0: 2}  # user1 -> 2 Vs; users 2,3 -> 0; user4 gone


# ------------------------------------------------------------------- DiD


def test_diff_in_diff_planted_effect(spark):
    from usedcars_bigdata_spark.operators.rankstats import diff_in_diff

    rows = []
    # control: 100 both periods; treated: 100 pre, 150 post (+50 cents)
    for i in range(50):
        rows.append((0, 0, 100))
        rows.append((0, 1, 100 + (i % 3)))   # small time trend
        rows.append((1, 0, 100))
        rows.append((1, 1, 150 + (i % 3)))   # same trend + effect
    df = spark.createDataFrame(rows, ["g", "p", "v"])
    r = diff_in_diff(df, "g", "p", "v").collect()[0]
    assert r.n == 200
    # the common trend cancels: effect = 50 cents = 0.5 dollars
    assert r.effect_dollars == 0.5
    assert r.z > 10  # strongly detected


def test_diff_in_diff_null_effect(spark):
    from usedcars_bigdata_spark.operators.rankstats import diff_in_diff

    rows = []
    for i in range(40):
        for g in (0, 1):
            for p in (0, 1):
                rows.append((g, p, 100 + 7 * (i % 5)))
    df = spark.createDataFrame(rows, ["g", "p", "v"])
    r = diff_in_diff(df, "g", "p", "v").collect()[0]
    assert r.effect_dollars == 0.0 and r.z == 0.0


# ------------------------------------------------------ markov entropy rate


def test_markov_entropy_deterministic_chain_zero(spark):
    import datetime

    from usedcars_bigdata_spark.operators.timeseries import (
        markov_entropy_rate,
    )

    base = datetime.datetime(2024, 1, 1)
    # A -> B -> A -> B deterministic for every user: H_rate = 0;
    # pi = source-state distribution of the 9 transitions per user
    # (A 5x, B 4x) -> H_pi = -(5/9 ln 5/9 + 4/9 ln 4/9)
    rows = []
    eid = 0
    for u in (1, 2):
        for i in range(10):
            rows.append(
                (u, base + datetime.timedelta(minutes=i), eid,
                 "A" if i % 2 == 0 else "B")
            )
            eid += 1
    df = spark.createDataFrame(rows, ["u", "ts", "eid", "s"])
    r = markov_entropy_rate(df, "u", "ts", "eid", "s").collect()[0]
    assert r.h_rate_nats == 0.0
    want_pi = -(5 / 9 * math.log(5 / 9) + 4 / 9 * math.log(4 / 9))
    assert abs(r.h_pi_nats - want_pi) < 1e-6
    assert r.predictability == 1.0


def test_markov_entropy_uniform_chain_max(spark):
    import datetime

    from usedcars_bigdata_spark.operators.timeseries import (
        markov_entropy_rate,
    )

    base = datetime.datetime(2024, 1, 1)
    # sequence cycling A,B,A,C,A,B,A,C: from A both B and C equally
    # likely -> conditional entropy at A = ln 2, at B/C = 0
    seq = ["A", "B", "A", "C"] * 8
    rows = [
        (1, base + datetime.timedelta(minutes=i), i, s)
        for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "eid", "s"])
    r = markov_entropy_rate(df, "u", "ts", "eid", "s").collect()[0]
    # transitions: A->B and A->C equal counts; B->A, C->A determin.
    # pi(A) ~ 1/2 -> H_rate ~ 0.5*ln2
    assert abs(r.h_rate_nats - 0.5 * math.log(2)) < 0.02


# ------------------------------------------------------------- slo burn


def test_slo_burn_page_needs_both_windows(spark):
    import datetime

    from usedcars_bigdata_spark.operators.timeseries import slo_burn_alerts

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hours 0..5: 10% errors (quiet). hour 6: 60% errors (blip ->
    # short window burns, long window still diluted -> warn).
    # hours 7..12: 60% errors sustained -> long window catches up -> page.
    for hr in range(13):
        err_n = 1 if hr < 6 else 6
        for i in range(10):
            rows.append(
                (eid, base + datetime.timedelta(hours=hr, minutes=i),
                 "error" if i < err_n else "view")
            )
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = {
        r.h - int(base.timestamp()) // 3600: r.severity
        for r in slo_burn_alerts(
            df, "ts", F.col("event_type") == "error", budget=0.25
        ).collect()
    }
    assert out[6] == "warn"      # blip: short burns, long diluted
    assert out[12] == "page"     # sustained: both windows burn
    assert 0 not in out and 5 not in out  # quiet hours silent


# --- r9 review: degenerate inputs must yield NULL, never an ANSI
# DIVIDE_BY_ZERO that aborts the whole multi-group query. ---


def test_rank_stats_degenerate_groups_null_not_crash(spark):
    from usedcars_bigdata_spark.operators.rankstats import (
        jarque_bera,
        kendall_tau_b,
        kruskal_wallis,
        mann_whitney_u,
        runs_test,
        spearman_corr,
    )

    # spearman: singleton group + constant-x group next to a real one
    sp = spark.createDataFrame(
        [("solo", 1.0, 2.0)]
        + [("const", 5.0, float(i)) for i in range(4)]
        + [("ok", float(i), float(2 * i)) for i in range(4)],
        ["g", "x", "y"],
    )
    rho = {r.group if hasattr(r, "group") else r.g: r.rho
           for r in spearman_corr(sp, "g", "x", "y").collect()}
    assert rho["solo"] is None and rho["const"] is None and rho["ok"] == 1.0

    # mann-whitney: one sample empty -> NULL z, no crash
    mw = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], ["s", "v"]
    )
    row = mann_whitney_u(mw, "s", "v", "a", "b").first()
    assert row.z is None and row.n_b == 0
    # all pooled values tied -> var = 0 -> NULL z
    tied = spark.createDataFrame(
        [("a", 7.0), ("a", 7.0), ("b", 7.0)], ["s", "v"]
    )
    assert mann_whitney_u(tied, "s", "v", "a", "b").first().z is None

    # kendall: a key with all-tied x -> NULL tau for that key only
    kt = spark.createDataFrame(
        [("k1", 1, 5.0, 1.0), ("k1", 2, 5.0, 2.0),
         ("k2", 1, 1.0, 1.0), ("k2", 2, 2.0, 2.0)],
        ["k", "t", "x", "y"],
    )
    taus = {r.key: r.tau_b for r in
            kendall_tau_b(kt, "k", "t", "x", "y").collect()}
    assert taus["k1"] is None and taus["k2"] == 1.0

    # kruskal-wallis: all values tied -> NULL corrected H
    kw = spark.createDataFrame(
        [("a", 3.0), ("a", 3.0), ("b", 3.0)], ["g", "v"]
    )
    kwr = kruskal_wallis(kw, "g", "v").first()
    assert kwr.h_tie_corrected is None

    # jarque-bera: constant group NULL, non-constant fine
    jb = spark.createDataFrame(
        [("c", 5), ("c", 5), ("c", 5)]
        + [("ok", i) for i in range(8)],
        ["g", "v"],
    )
    out = {r.g: r for r in jarque_bera(jb, "g", "v").collect()}
    assert out["c"].skewness is None and out["c"].jb is None
    assert out["ok"].jb is not None

    # runs test: single-row key and constant key both NULL z
    rt = spark.createDataFrame(
        [("solo", 1, 5)]
        + [("const", i, 7) for i in range(4)]
        + [("ok", i, i % 2) for i in range(8)],
        ["k", "t", "x"],
    )
    zs = {r.k: r.z for r in runs_test(rt, "k", "t", "x").collect()}
    assert zs["solo"] is None and zs["const"] is None
    assert zs["ok"] is not None


def test_permutation_test_one_sided_replicates_skipped(spark):
    from usedcars_bigdata_spark.operators.rankstats import (
        permutation_test_means,
    )

    # 2 units: ~half the replicates assign both units to one side;
    # those replicates have undefined T and must not crash the test
    units = spark.createDataFrame(
        [("u1", 10, 1), ("u2", 4, 0)], ["unit", "v", "g"]
    )
    row = permutation_test_means(
        units, "unit", "v", "g", n_permutations=16
    ).first()
    assert row.n_units == 2 and row.p_value is not None

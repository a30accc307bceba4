"""Round-4-late operators: skyline, linear interpolation, entity
resolution, association rules, seasonal baseline, and the MLlib pattern
miners. Each declarative op is checked against an independent brute-force
or hand-computed ground truth at test scale; the oracle parity itself is
covered by tests/test_queries_oracle.py's registry sweep.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext import dedup as X
from usedcars_bigdata_spark.operators import timeseries as TS
from usedcars_bigdata_spark.operators.sort import pareto_frontier_2d


# ---------------------------------------------------------------- skyline
def _brute_skyline(points):
    """O(n²) dominance by definition."""
    out = []
    for i, (g1, mn1, mx1) in enumerate(points):
        dominated = any(
            g2 == g1
            and mn2 <= mn1
            and mx2 >= mx1
            and (mn2 < mn1 or mx2 > mx1)
            for j, (g2, mn2, mx2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((g1, mn1, mx1))
    return sorted(out)


def test_skyline_matches_bruteforce(spark):
    rng = random.Random(42)
    rows = [
        (i, rng.choice(["a", "b"]), rng.randrange(0, 50), rng.randrange(0, 50))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["id", "grp", "cost", "gain"])
    got = sorted(
        (r.grp, r.cost, r.gain)
        for r in pareto_frontier_2d(
            df, "cost", "gain", n_salts=4, salt_on="id", group_cols=["grp"]
        ).collect()
    )
    assert got == _brute_skyline([(g, c, x) for _, g, c, x in rows])


def test_skyline_duplicate_points_all_survive(spark):
    # identical (min, max) points do not dominate each other
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 5), (3, 10, 4)], ["id", "cost", "gain"]
    )
    got = pareto_frontier_2d(df, "cost", "gain", n_salts=2, salt_on="id")
    assert sorted(r.id for r in got.collect()) == [1, 2]


def test_skyline_ungrouped(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 30), rng.randrange(0, 30)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "cost", "gain"])
    got = sorted(
        (r.cost, r.gain)
        for r in pareto_frontier_2d(df, "cost", "gain", n_salts=8).collect()
    )
    brute = _brute_skyline([(None, c, x) for _, c, x in rows])
    assert got == [(c, x) for _, c, x in brute]


# ---------------------------------------------------- linear interpolation
def test_interpolate_linear_exact(spark):
    # key k: observed at hours 0 (100.00) and 3 (400.00); hours 1, 2 are
    # gaps -> 200.00, 300.00. Key m: single point -> axis rows clamp to it.
    rows = [
        ("k", "2024-01-01 00:15:00", 100.0),
        ("k", "2024-01-01 03:45:00", 400.0),
        ("m", "2024-01-01 01:30:00", 7.5),
    ]
    df = spark.createDataFrame(rows, ["key", "ts", "value"]).select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = {
        (r.key, r.bucket_start.hour): (r.value_fp, r.observed)
        for r in TS.interpolate_linear(df, "ts", "key", "value").collect()
    }
    assert out[("k", 0)] == (10000, True)
    assert out[("k", 1)] == (20000, False)
    assert out[("k", 2)] == (30000, False)
    assert out[("k", 3)] == (40000, True)
    # m observed only at hour 1: hours 0/2/3 clamp to the single neighbor
    assert out[("m", 1)] == (750, True)
    assert out[("m", 0)] == (750, False)
    assert out[("m", 2)] == (750, False)
    assert out[("m", 3)] == (750, False)
    assert len(out) == 8


def test_interpolate_linear_downslope_truncation(spark):
    # 400 -> 100 over 3 hours: interp at h1 = 400 + (100-400)*1//3 = 300
    # exercises the negative-numerator truncating division
    rows = [("k", "2024-01-01 00:00:01", 4.0), ("k", "2024-01-01 03:00:01", 0.5)]
    df = spark.createDataFrame(rows, ["key", "ts", "value"]).select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = {
        r.bucket_start.hour: r.value_fp
        for r in TS.interpolate_linear(df, "ts", "key", "value").collect()
    }
    assert out[0] == 400 and out[3] == 50
    # (50-400)*1 div 3 truncates toward zero: -116, not floor's -117
    assert out[1] == 400 - 116 == 284
    # (50-400)*2 div 3 = -233
    assert out[2] == 400 - 233 == 167


# ------------------------------------------------------- entity resolution
def test_blocked_er_pairs_block_and_threshold(spark):
    rows = [
        (1, "b1", "acme corp"),
        (2, "b1", "acme corp."),  # dist 1 to id 1
        (3, "b1", "completely different name"),
        (4, "b2", "acme corp"),  # same name, other block: no pair
    ]
    df = spark.createDataFrame(rows, ["id", "blk", "name"])
    pairs = X.blocked_er_pairs(df, "id", "name", ["blk"], max_dist=2).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in pairs] == [(1, 2, 1)]


def test_blocked_er_pairs_bounded_under_vocab_growth(spark):
    # r6 verdict task 6: the ER pair cost grows with the value VOCABULARY
    # inside a block — assert the max_block circuit breaker keeps the
    # emitted pair count bounded by Σ C(|kept block|, 2) as vocabulary
    # scales, and that the drop is loudly accounted in the observation.
    from pyspark.sql import Observation

    for vocab in (20, 80, 320):
        rows = [(i, "big", f"name-{i:05d}") for i in range(vocab)]
        rows += [(10_000 + i, "small", "stable name") for i in range(8)]
        df = spark.createDataFrame(rows, ["id", "blk", "name"])
        obs = Observation(f"er_vocab_{vocab}")
        pairs = X.blocked_er_pairs(
            df, "id", "name", ["blk"], max_dist=2, max_block=50, audit=obs
        )
        n_pairs = pairs.count()
        audit = obs.get
        kept_budget = audit["n_candidate_pairs"]
        assert n_pairs <= kept_budget
        if vocab > 50:
            # the vocabulary-scaled block blew past max_block: dropped,
            # accounted, and the budget collapses to the small block's
            assert audit["n_dropped_blocks"] == 1
            assert audit["n_dropped_rows"] == vocab
            assert kept_budget == 8 * 7 // 2
        else:
            assert audit["n_dropped_blocks"] == 0
            assert kept_budget == vocab * (vocab - 1) // 2 + 8 * 7 // 2


def test_blocked_er_pairs_oversize_block_dropped(spark):
    rows = [(i, "hot", "same name") for i in range(10)] + [
        (100, "cold", "x"),
        (101, "cold", "x"),
    ]
    df = spark.createDataFrame(rows, ["id", "blk", "name"])
    pairs = X.blocked_er_pairs(
        df, "id", "name", ["blk"], max_dist=2, max_block=5
    ).collect()
    # the 10-row block exceeds max_block and is dropped; cold block survives
    assert [(r.id_a, r.id_b) for r in pairs] == [(100, 101)]


def test_blocked_er_vocab_growth_stays_bounded_by_drop_accounting(spark):
    """Vocab-growth guard (r4 verdict task 6): a fixture whose distinct
    compare-value vocabulary SCALES WITH n — the honest-caveat regime
    where rep-collapse stops helping — must stay bounded through the
    max_block circuit breaker, with the drop visible in the audit, not
    silent. At n=400 (one non-selective block of 300 unique values + 20
    selective 5-row blocks), the kept candidate budget is 20*C(5,2)=200
    pairs; without the breaker the hot block alone would be
    C(300,2)=44 850 comparisons."""
    from pyspark.sql import Observation

    hot = [(i, "hot", f"name-{i:05d}") for i in range(300)]  # vocab ~ n
    cold = [
        (1000 + b * 10 + j, f"cold{b}", f"val-{b}-{j}")
        for b in range(20)
        for j in range(5)
    ]
    df = spark.createDataFrame(hot + cold, ["id", "blk", "name"])
    max_block = 10

    stats = X.er_block_stats(df, ["blk"], max_block=max_block).collect()[0]
    assert stats.n_blocks == 21
    assert stats.n_dropped_blocks == 1
    assert stats.n_dropped_rows == 300
    assert stats.max_block_size == 300
    assert stats.n_candidate_pairs == 20 * 10  # 20 kept blocks x C(5,2)

    obs = Observation("er_block_audit_test")
    pairs = X.blocked_er_pairs(
        df, "id", "name", ["blk"], max_dist=50, max_block=max_block, audit=obs
    ).collect()
    # cost bound: emitted pairs can never exceed the kept-block budget,
    # and nothing from the dropped block leaks through
    assert len(pairs) <= stats.n_candidate_pairs
    assert all(r.id_a >= 1000 and r.id_b >= 1000 for r in pairs)
    # the in-plan observation reports the same drop accounting
    got = obs.get
    assert got["n_dropped_blocks"] == 1
    assert got["n_dropped_rows"] == 300
    assert got["n_candidate_pairs"] == 200


def test_resolve_entities_transitive_chain(spark):
    # A~B (1 edit) and B~C (1 edit) but A-C is 2 edits: one entity anyway
    rows = [
        (10, "b", "aaaa"),
        (11, "b", "aaab"),
        (12, "b", "aabb"),
        (13, "b", "zzzzzzzz"),
    ]
    df = spark.createDataFrame(rows, ["id", "blk", "name"])
    ents = {
        r.id: (r.entity_id, r.is_canonical)
        for r in X.resolve_entities(df, "id", "name", ["blk"], max_dist=1).collect()
    }
    assert ents[10] == (10, True)
    assert ents[11] == (10, False)
    assert ents[12] == (10, False)
    assert ents[13] == (13, True)


# ------------------------------------------------------- association rules
def test_association_rules_math(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    out = QUERIES["rel_association_rules"](spark, sf_dir)
    rows = out.collect()
    assert rows, "expected at least one rule at test scale"
    for r in rows:
        assert r.conf_bp == (10000 * r.n_both) // r.n_ante
        assert 0 < r.conf_bp <= 10000
        assert r.n_both <= min(r.n_ante, r.n_cons)
    # rules come in both directions with equal n_both
    sup = {(r.antecedent, r.consequent): r.n_both for r in rows}
    for (a, c), n in sup.items():
        assert sup.get((c, a), n) == n


# ------------------------------------------------------- seasonal baseline
def test_seasonal_baseline_residual_zero_mean_per_cell(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    out = QUERIES["ts_seasonal_baseline"](spark, sf_dir)
    # per (type, hour-of-day): baseline is the truncating mean, so the
    # residual sum over the cell is bounded by the truncation remainder
    chk = (
        out.groupBy("event_type", F.hour("bucket_start").alias("hod"))
        .agg(
            F.sum("resid_fp").alias("rs"),
            F.count("*").alias("n"),
            F.sum("actual_fp").alias("tot"),
        )
        .collect()
    )
    assert chk
    for r in chk:
        assert r.rs == r.tot - (r.tot // r.n if r.tot >= 0 else -((-r.tot) // r.n)) * r.n


# ------------------------------------------------------------ pattern miners
def test_fpgrowth_contains_singletons_and_monotone(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["rows_fpgrowth_itemsets"](spark, sf_dir).collect()
    freq = {r.itemset: r.freq for r in rows}
    assert freq
    # anti-monotone support: any 2-itemset's freq <= each member's freq
    for s, f in freq.items():
        items = s.split(",")
        if len(items) == 2 and all(i in freq for i in items):
            assert f <= min(freq[i] for i in items)


def test_prefixspan_deterministic_and_monotone(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    a = sorted(
        (r.pattern, r.freq)
        for r in QUERIES["rows_prefixspan_patterns"](spark, sf_dir).collect()
    )
    b = sorted(
        (r.pattern, r.freq)
        for r in QUERIES["rows_prefixspan_patterns"](spark, sf_dir).collect()
    )
    assert a == b and a
    freq = dict(a)
    # a length-2 pattern is never more frequent than its prefix
    for p, f in freq.items():
        steps = p.split(">")
        if len(steps) == 2 and steps[0] in freq:
            assert f <= freq[steps[0]]


# ----------------------------------------------------------------- BPE
def _brute_bpe(word_counts, n_merges, min_pair_count=2):
    """Reference BPE on a word-frequency dict (Sennrich et al.), greedy
    left-to-right merge application, (count desc, left, right) ties."""
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for seq, c in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] = pairs.get((seq[i], seq[i + 1]), 0) + c
        cands = [(n, l, r) for (l, r), n in pairs.items() if n >= min_pair_count]
        if not cands:
            break
        # deterministic: count desc, then left asc, right asc
        n, l, r = sorted(cands, key=lambda t: (-t[0], t[1], t[2]))[0]
        merges.append((rank, l, r, l + r, n))
        new_vocab = {}
        for seq, c in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_bruteforce(spark):
    from usedcars_bigdata_spark.ext.text import bpe_merges

    docs = [
        ("low low low lower lower newest newest newest newest widest",),
        ("widest widest low newest",),
    ]
    df = spark.createDataFrame(docs, ["text"])
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_merges(df, "text", n_merges=8).orderBy("rank").collect()
    ]
    counts = {}
    for (t,) in docs:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    assert got == _brute_bpe(counts, 8)


def test_bpe_deterministic_on_corpus(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    a = [tuple(r) for r in QUERIES["ext_bpe_merges"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["ext_bpe_merges"](spark, sf_dir).collect()]
    assert a == b and len(a) > 0
    # merge counts are non-increasing in rank ONLY per symbol generation —
    # but the first merge must be the global most frequent pair
    assert a[0][0] == 1


def test_bpe_apply_matches_bruteforce(spark):
    from usedcars_bigdata_spark.ext.text import bpe_apply, bpe_merges

    docs = [
        (1, "low low low lower lower newest newest newest newest widest"),
        (2, "widest widest low newest"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    merges = [
        (r.left, r.right)
        for r in bpe_merges(df, "text", n_merges=6).orderBy("rank").collect()
    ]

    def brute_tokens(word):
        seq = list(word) + ["</w>"]
        for x, y in merges:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == x and seq[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return len(seq)

    got = {
        r.doc_id: (r.n_bpe_tokens, r.n_words)
        for r in bpe_apply(df, "doc_id", "text", merges).collect()
    }
    for doc_id, text in docs:
        words = text.split()
        assert got[doc_id] == (sum(brute_tokens(w) for w in words), len(words))


def test_quality_classifier_beats_chance(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    row = QUERIES["rows_ml_quality_classifier"](spark, sf_dir).collect()[0]
    # the features correlate with the score's length component, so the
    # gate must be decisively better than chance at any harness scale
    assert row.auc >= 0.75
    assert 0 < row.n_pos < row.n


# ------------------------------------------------------------------- PMI
def test_pmi_matches_bruteforce(spark):
    from math import log

    from usedcars_bigdata_spark.ext.text import pmi_cooccurrence

    docs = [(1, "a b c a b"), (2, "b a a b x")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.word_a, r.word_b): (r.n_pair, r.n_a, r.n_b, r.pmi)
        for r in pmi_cooccurrence(df, "doc_id", "text", window=2, min_count=1).collect()
    }
    # brute force
    pairs = {}
    P = 0
    uni = {}
    for _, t in docs:
        w = t.split()
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for i in range(len(w)):
            for k in (1, 2):
                if i + k < len(w):
                    key = tuple(sorted((w[i], w[i + k])))
                    pairs[key] = pairs.get(key, 0) + 1
                    P += 1
    T = sum(uni.values())
    assert set(got) == set(pairs)
    for (x, y), c in pairs.items():
        n_pair, n_a, n_b, pmi = got[(x, y)]
        assert (n_pair, n_a, n_b) == (c, uni[x], uni[y])
        expect = log(c) + 2.0 * log(T) - log(P) - log(uni[x]) - log(uni[y])
        assert abs(pmi - round(expect, 6)) < 1e-9


# ----------------------------------------------------------------- CUSUM
def test_cusum_flags_sustained_shift(spark):
    from usedcars_bigdata_spark.plans import QUERIES  # noqa: F401  (style parity)

    # 48 hours: rate 10/h for day one, 14/h for day two -> per-bucket
    # z-tests never fire (max deviation ~2), but CUSUM integrates
    rows = []
    eid = 0
    for h in range(48):
        rate = 10 if h < 24 else 14
        for i in range(rate):
            rows.append((eid, "t", f"2024-01-0{1 + h // 24} {h % 24:02d}:10:00"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts"]).select(
        "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    hourly = df.groupBy(
        "event_type", F.window("ts", "1 hour")["start"].alias("bucket_start")
    ).agg(F.count("*").alias("n"))
    base = hourly.groupBy("event_type").agg(
        F.expr("sum(n) div count(*)").alias("mean_n")
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    j = hourly.crossJoin(base.select("mean_n"))
    out = j.select(
        "bucket_start",
        F.sum(F.col("n") - F.col("mean_n")).over(w).cast("long").alias("cusum"),
        (
            F.abs(F.sum(F.col("n") - F.col("mean_n")).over(w).cast("long"))
            > 3 * F.col("mean_n")
        ).alias("drifted"),
    ).collect()
    by_hour = sorted(out, key=lambda r: r.bucket_start)
    # mean is 12; day-one cusum walks to -48 (drifted), day-two recovers
    assert any(r.drifted for r in by_hour)
    assert by_hour[-1].cusum == 0  # integer bookkeeping closes exactly


# ------------------------------------------------------------------- KMV
def test_kmv_estimate_within_tolerance(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    for r in QUERIES["rel_kmv_sketch"](spark, sf_dir).collect():
        digests = r.sketch.split(",")
        assert digests == sorted(digests) and len(digests) == r.k_filled
        if r.k_filled < 32:
            # sketch holds ALL hashes -> k_filled == exact count
            assert r.k_filled == r.n_exact
            continue
        # estimate from the kth minimum, first 15 hex chars as uniform
        v = int(digests[-1][:15], 16) / float(16**15)
        est = (r.k_filled - 1) / v
        assert abs(est - r.n_exact) / r.n_exact < 0.6  # k=32 -> ~18% se


# ------------------------------------------------------- split-hygienic LM
def test_split_lm_gate_protocol(spark):
    from math import exp, log

    from usedcars_bigdata_spark.ext.text import split_lm_gate

    # ids 1-8 hash into the train bucket, 9 and 11 into val (computed
    # from the same md5 arithmetic hash_split uses)
    docs = [(i, "alpha beta gamma") for i in range(1, 9)] + [
        (9, "alpha beta"),          # fully in-vocab val doc
        (11, "zork quux"),          # fully OOV val doc
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r for r in split_lm_gate(df, "doc_id", "text").collect()}
    # only val docs are scored
    assert set(got) == {9, 11}
    assert got[9].n_oov == 0 and got[11].n_oov == 2
    # train corpus: 8 docs x 3 tokens, each word count 8, T=24, V=3
    lp_known = log((8 + 1) / (24 + 3 + 1))
    lp_oov = log(1 / 28)
    assert abs(got[9].avg_logp - round(lp_known, 4)) < 1e-9
    assert abs(got[11].avg_logp - round(lp_oov, 4)) < 1e-9
    assert got[11].ppl > got[9].ppl
    assert abs(got[11].ppl - round(exp(-lp_oov), 2)) < 1e-9


# --------------------------------------------------------------- survival
def test_survival_km_hand_case(spark):
    from usedcars_bigdata_spark.operators.timeseries import survival_km

    # corpus max ts = day 10; censor window 24h -> cut = day 9.
    # u1: dies at t=24h; u2: dies at t=48h; u3: dies at t=48h;
    # u4: last event inside the final day -> censored at t=72h
    rows = [
        ("u1", "2024-01-01 00:00:00"), ("u1", "2024-01-02 00:00:00"),
        ("u2", "2024-01-01 00:00:00"), ("u2", "2024-01-03 00:00:00"),
        ("u3", "2024-01-02 00:00:00"), ("u3", "2024-01-04 00:00:00"),
        ("u4", "2024-01-06 12:00:00"), ("u4", "2024-01-09 12:00:00"),
        ("anchor", "2024-01-10 00:00:00"),  # sets corpus max; t=0 death
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r.t_hours: r for r in survival_km(df, "user_id", "ts").collect()}
    # anchor: duration 0, uncensored (its last event IS max ts -> > cut?
    # max ts > max ts - 24h is TRUE -> censored). So t=0 has no death row.
    assert set(out) == {24, 48}
    # at t=24: risk set = all 4 non-anchor users (anchor censored at 0
    # leaves risk before t=24); S = 1 - 1/4
    r24 = out[24]
    assert (r24.n_at_risk, r24.n_deaths) == (4, 1)
    assert abs(r24.survival - round(3 / 4, 6)) < 1e-9
    # at t=48: risk set = u2, u3, u4; two deaths -> S = 3/4 * 1/3
    r48 = out[48]
    assert (r48.n_at_risk, r48.n_deaths) == (3, 2)
    assert abs(r48.survival - round(3 / 4 * 1 / 3, 6)) < 1e-9


# -------------------------------------------------------- DQ expectations
def test_dq_expectations_clean_feed_passes(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    rows = {r.rule: r for r in QUERIES["rel_dq_expectations"](spark, sf_dir).collect()}
    assert len(rows) == 5
    # harness data is clean: every contract passes with 0 violations
    for r in rows.values():
        assert r.n_violations == 0 and bool(r.pass_ if hasattr(r, "pass_") else r["pass"])


def test_dq_expectations_detect_planted_violations(spark, tmp_path):
    import os

    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    # plant rows by overriding fields on a template row so the full
    # orders schema survives the round-trip through load_table
    dtypes = dict(o.dtypes)
    template = o.orderBy("o_orderkey").limit(1)

    def plant(**over):
        d = template
        for k, v in over.items():
            d = d.withColumn(k, F.lit(v).cast(dtypes[k]))
        return d

    existing_key = template.collect()[0].o_orderkey
    bad = (
        plant(o_orderkey=existing_key, o_custkey=999_999_999)  # dup + orphan
        .unionByName(plant(o_orderkey=888_888_881, o_custkey=None))
        .unionByName(plant(o_orderkey=888_888_882, o_totalprice=-5.0))
        .unionByName(plant(o_orderkey=888_888_883, o_orderpriority="9-BOGUS"))
    )
    dirty = o.unionByName(bad)
    tmp = os.path.join(str(tmp_path), "dirty")
    dirty.write.parquet(os.path.join(tmp, "orders.parquet"))
    c.write.parquet(os.path.join(tmp, "customer.parquet"))
    rows = {r.rule: r for r in QUERIES["rel_dq_expectations"](spark, tmp).collect()}
    assert rows["not_null:o_custkey"].n_violations == 1
    assert rows["range:o_totalprice"].n_violations == 1
    assert rows["accepted_values:o_orderpriority"].n_violations == 1
    assert rows["unique:o_orderkey"].n_violations == 1
    assert rows["fk:o_custkey->customer"].n_violations >= 1
    assert not any(r["pass"] for r in rows.values())


# ------------------------------------------------- cross-split decontamination
def test_decontamination_flags_planted_cross_split_dup(spark):
    from usedcars_bigdata_spark.ext.dedup import cross_split_contamination

    # ids 1..8 -> train, 9/11 -> val (hash_split md5 arithmetic)
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = (
        [(i, f"completely unrelated text number {i} about nothing") for i in range(1, 8)]
        + [(8, base), (9, base + " tail"), (11, "something else entirely here")]
    )
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.split, r.train_match, r.jaccard)
        for r in cross_split_contamination(df, "doc_id", "text").collect()
    }
    # doc 9 (val) near-dups train doc 8; doc 11 is clean
    assert set(got) == {9}
    split, match, jac = got[9]
    assert split == "val" and match == 8 and jac >= 0.5


# ---------------------------------------------------- quality-aware dedup
def test_quality_survivor_one_per_component(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["ext_dedup_quality_survivor"](spark, sf_dir).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    assert by_comp
    multi = 0
    for comp, members in by_comp.items():
        survivors = [m for m in members if m.is_survivor]
        assert len(survivors) == 1
        best = max(members, key=lambda m: (m.quality_score, -m.doc_id))
        assert survivors[0].doc_id == best.doc_id
        if len(members) > 1:
            multi += 1
    assert multi > 0, "expected at least one non-trivial dup cluster"


# ----------------------------------------------------- token-budget sample
def test_token_budget_binding_and_deterministic(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    a = sorted(tuple(r) for r in QUERIES["ext_token_budget_sample"](spark, sf_dir).collect())
    b = sorted(tuple(r) for r in QUERIES["ext_token_budget_sample"](spark, sf_dir).collect())
    assert a == b and a
    per_source = {}
    for _, src, n, cum in a:
        per_source[src] = max(per_source.get(src, 0), cum)
    assert all(v <= 800 for v in per_source.values())
    # greedy prefix property: cum_tokens is consistent with the sum of
    # selected docs per source
    sums = {}
    for _, src, n, _ in a:
        sums[src] = sums.get(src, 0) + n
    assert sums == per_source


def test_interpolate_linear_non_hour_step(spark):
    # 30-minute buckets: observed at :00 (fp 300) and :90 (fp 600);
    # the two gap buckets interpolate to 400 and 500 — exercises the
    # raw-epoch index with a non-default step
    rows = [("k", "2024-01-01 00:05:00", 3.0), ("k", "2024-01-01 01:35:00", 6.0)]
    df = spark.createDataFrame(rows, ["key", "ts", "value"]).select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = {
        (r.bucket_start.hour, r.bucket_start.minute): r.value_fp
        for r in TS.interpolate_linear(
            df, "ts", "key", "value", step="30 minutes"
        ).collect()
    }
    assert out == {(0, 0): 300, (0, 30): 400, (1, 0): 500, (1, 30): 600}


# -------------------------------------------------- point-in-time lookup
def test_scd2_pointlookup_attributes_history(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["rel_scd2_pointlookup"](spark, sf_dir).collect()
    moved_years = sorted(r.order_year for r in rows if r.seg == "MOVED")
    assert moved_years and min(moved_years) >= 1996
    # pre-move orders of moved customers land under their ORIGINAL segs:
    # original segments must still show pre-1996 years
    other_years = [r.order_year for r in rows if r.seg != "MOVED"]
    assert min(other_years) < 1996


def test_scd2_pointlookup_no_nested_loop(spark, sf_dir):
    from tests.test_plan_shapes import plan_of
    from usedcars_bigdata_spark.plans import QUERIES

    plan = plan_of(QUERIES["rel_scd2_pointlookup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------- winsorization
def test_winsorized_mean_bounded_by_cuts(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    for r in QUERIES["rel_winsorized_stats"](spark, sf_dir).collect():
        assert r.p01_cents <= r.winsor_mean_cents <= r.p99_cents
        assert r.n > 0


# ----------------------------------------------------------- corpus card
def test_corpus_card_consistent_with_parts(spark, sf_dir):
    from usedcars_bigdata_spark.ext.dedup import exact_dedup_stats
    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table

    card = QUERIES["ext_corpus_card"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in card) == docs.count()
    # duplicate incidence cross-checked against the dedup tier:
    # every content group of size c>=2 contributes c flagged docs
    groups = exact_dedup_stats(docs, "doc_id", "text").collect()
    expected_dups = sum(g.n_copies for g in groups if g.n_copies >= 2)
    assert sum(r.n_exact_dup for r in card) == expected_dups
    for r in card:
        assert 0 <= r.mean_quality_fp <= 10000
        assert r.mean_tokens == r.total_tokens // r.n_docs


# ------------------------------------------------------ count-min sketch
def test_cms_never_underestimates(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["rel_cms_sketch"](spark, sf_dir).collect()
    assert rows, "no probe items"
    for r in rows:
        # CMS over-approximation guarantee: a cell count is the item's
        # true count plus whatever shares the bucket — never less.
        assert r.cms_estimate >= r.n_exact, r
        # depth-3 width-256 over a 5-value domain: the min over rows
        # should shed any single-row collision entirely.
        assert r.cms_estimate <= 2 * r.n_exact, r


def test_cms_mergeable_by_cell_sum(spark):
    """Partial sketches over disjoint corpus halves add cell-wise into the
    whole-corpus sketch — the property that lets executors build partial
    sketches map-side and merge by sum (same contract as KMV's min-k)."""
    from pyspark.sql import functions as F

    data = spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4]) for i in range(400)], "id long, item string"
    )
    bucket = F.substring(
        F.md5(F.concat(F.col("r").cast("string"), F.col("item"))), 1, 2
    )
    depth = F.array(F.lit(0), F.lit(1), F.lit(2))

    def cells(df):
        return (
            df.select(F.explode(depth).alias("r"), "item")
            .select("r", bucket.alias("bucket"))
            .groupBy("r", "bucket")
            .agg(F.count("*").alias("c"))
        )

    whole = {(r.r, r.bucket): r.c for r in cells(data).collect()}
    lo = cells(data.filter("id < 200")).collect()
    hi = cells(data.filter("id >= 200")).collect()
    merged: dict = {}
    for r in [*lo, *hi]:
        merged[(r.r, r.bucket)] = merged.get((r.r, r.bucket), 0) + r.c
    assert merged == whole


# ------------------------------------------------------------ attribution
def test_attribution_models_conserve_value(spark, sf_dir):
    """First- and last-touch both hand out each attributed purchase's full
    value exactly once, so their totals are identical; linear's total is
    the same up to < 1 microcent truncation loss per touch row."""
    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["ts_attribution_models"](spark, sf_dir).collect()
    by_model: dict = {}
    touches: dict = {}
    for r in rows:
        by_model[r.model] = by_model.get(r.model, 0) + r.attributed_microcents
        touches[r.model] = touches.get(r.model, 0) + r.n_attributions
    assert by_model["first_touch"] == by_model["last_touch"]
    assert touches["first_touch"] == touches["last_touch"]  # one per purchase
    loss = by_model["first_touch"] - by_model["linear"]
    assert 0 <= loss < touches["linear"], (loss, touches["linear"])


# ------------------------------------------------------------------ CUPED
def test_cuped_pooled_variance_reduction(spark, sf_dir):
    """CUPED's guarantee is POOLED: with theta the pooled OLS slope,
    var(post − θ·(pre − mean_pre)) = var(post) − cov²/var(pre) ≤
    var(post) exactly over the whole sample (per-variant it can go either
    way at small n — observed at sf0.001 with n=7). Verify the pooled
    identity with an independent numpy replay, and that the entry's
    per-variant rows agree with that replay's moments."""
    import numpy as np

    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = QUERIES["ts_ab_cuped"](spark, sf_dir).collect()
    assert {r.variant for r in rows} == {0, 1}

    cut = F.lit("2024-01-16").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("bigint")
    pu = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(F.col("ts") < cut, cents)), F.lit(0)).alias("pre"),
            F.coalesce(F.sum(F.when(F.col("ts") >= cut, cents)), F.lit(0)).alias("post"),
        )
        .collect()
    )
    pre = np.array([r.pre for r in pu], dtype="float64")
    post = np.array([r.post for r in pu], dtype="float64")
    th = np.cov(pre, post, ddof=1)[0, 1] / np.var(pre, ddof=1)
    adj = post - th * (pre - pre.mean())
    assert np.var(adj, ddof=1) <= np.var(post, ddof=1)  # pooled guarantee
    uid = np.array([r.user_id for r in pu])
    for r in rows:
        mask = (uid % 2) == r.variant
        assert r.n == int(mask.sum())
        assert abs(r.mean_post - post[mask].mean()) < 1e-4
        assert abs(r.mean_adj - adj[mask].mean()) < 1e-3
        assert abs(r.var_post_c2 - np.var(post[mask], ddof=1)) < 2
        assert abs(r.var_adj_c2 - np.var(adj[mask], ddof=1)) < 2


# ------------------------------------------------------------ DP mechanism
def test_dp_noise_distribution_shape(spark):
    """Over many planted categories the seeded Laplace draws must behave
    like Laplace(b=1): |noise| mean near 1 and symmetric-ish sign split
    (the md5 uniforms are fixed, so these are deterministic assertions on
    a 400-draw sample, not flaky statistics)."""
    from usedcars_bigdata_spark.plans import QUERIES  # noqa: F401 (registry import)
    from pyspark.sql import functions as F

    cats = spark.range(400).select(
        F.concat(F.lit("cat_"), F.col("id")).alias("event_type")
    )
    h = F.substring(
        F.md5(F.concat(F.lit("dp-seed:"), F.col("event_type"))), 1, 8
    )
    unif = (F.conv(h, 16, 10).cast("long") + 0.5) / F.lit(4294967296.0)
    noise = (
        F.when(unif < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(1.0 - 2.0 * F.abs(unif - 0.5))
    )
    vals = [r.x for r in cats.select(noise.alias("x")).collect()]
    import statistics

    mean_abs = statistics.mean(abs(v) for v in vals)
    pos = sum(1 for v in vals if v > 0)
    assert 0.8 < mean_abs < 1.25, mean_abs   # E|Laplace(1)| = 1
    assert 150 < pos < 250, pos              # sign balance


# ---------------------------------------------------- continuation-2 edges
def test_holt_single_point_series(spark):
    from usedcars_bigdata_spark.operators.timeseries import holt_trend
    import datetime as dt

    df = spark.createDataFrame(
        [(1, 7, dt.datetime(2024, 1, 1), 42.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    rows = holt_trend(df, "user_id", "ts", "event_id", "value").collect()
    assert len(rows) == 1
    assert rows[0].level == 42.0 and rows[0].trend == 0.0 and rows[0].rn == 1


def test_attribution_no_touches_purchases_drop(spark):
    """A purchase with no click in its preceding hour is unattributed —
    it contributes to NO model's totals (documented inner-join
    semantics)."""
    import datetime as dt

    from usedcars_bigdata_spark.plans import QUERIES  # noqa: F401
    from usedcars_bigdata_spark.sources import load_table

    # the contract entry at sf0.001 must not crash with sparse touches
    out = QUERIES["ts_attribution_models"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    # totals per model exist or the frame is empty — either way no error,
    # and any present rows carry positive counts
    for r in out:
        assert r.n_attributions > 0


def test_quantile_normalize_single_doc_source(spark):
    """A source with ONE document gets the global value at its mid-rank
    p = 1/2 — no divide-by-zero, no dropped row."""
    from usedcars_bigdata_spark.ext.text import quantile_normalize_by_source

    docs = spark.createDataFrame(
        [(1, "the a of and to in is " * 10, "big1"),
         (2, "xyz " * 50, "big2"),
         (3, "word " * 30, "solo")],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in quantile_normalize_by_source(
        docs, "doc_id", "text", "source").collect()}
    assert len(out) == 3
    assert out[3].q_norm is not None


def test_cms_empty_input(spark):
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "event_type string")
    depth = F.array(F.lit(0), F.lit(1), F.lit(2))
    bucket = F.substring(
        F.md5(F.concat(F.col("r").cast("string"), F.col("event_type"))), 1, 2
    )
    cells = (
        empty.select(F.explode(depth).alias("r"), "event_type")
        .select("r", bucket.alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )
    assert cells.count() == 0


def test_mmr_k_exceeds_corpus(spark):
    from usedcars_bigdata_spark.ext.similarity import mmr_topk

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = mmr_topk(df.filter("vec_id != 0"), df.filter("vec_id = 0"), k=10)
    assert out.count() == 2  # stops when the corpus is exhausted


def test_hard_negatives_all_same_label_empty(spark):
    from usedcars_bigdata_spark.ext.similarity import hard_negatives

    df = spark.createDataFrame(
        [(i, [1.0, float(i)], 3) for i in range(5)],
        "vec_id long, embedding array<double>, label int",
    )
    out = hard_negatives(df, df.filter("vec_id = 0"), k=3)
    assert out.count() == 0  # no cross-label items exist


# ------------------------------------------------------- clamped balance
def test_clamped_balance_recurrence_and_carry(spark):
    """Manual replay of bal_i = max(0, bal_{i-1} + delta_i), forced across
    Arrow batch boundaries (5-row batches over a 24-row series) — the
    clamp must bind mid-series and the carry must survive batch cuts."""
    import datetime as dt

    from usedcars_bigdata_spark.operators.timeseries import (
        clamped_running_balance,
    )

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        t0 = dt.datetime(2024, 1, 1)
        deltas = [5, -3, -10, 4, -1, 7, -20, 2] * 3
        rows = [
            (i, 1, t0 + dt.timedelta(minutes=i), d)
            for i, d in enumerate(deltas)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, delta long"
        ).coalesce(1)
        got = {
            r.event_id: (r.balance, r.rn)
            for r in clamped_running_balance(
                df, "user_id", "ts", "event_id", "delta"
            ).collect()
        }
        bal = 0
        for i, d in enumerate(deltas):
            bal = max(0, bal + d)
            assert got[i] == (bal, i + 1), (i, got[i], bal)
        assert any(b == 0 for b, _ in got.values())  # the clamp actually bound
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_gone_silent_ground_truth(spark, sf_dir):
    """Every reported user had >=1 prior-week event and zero recent-week
    events; every prior-week-active user missing from the report has a
    recent-week event."""
    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    out = {r.user_id for r in QUERIES["ts_gone_silent"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m")).first().m
    import datetime as dt

    cut, lo = mx - dt.timedelta(days=7), mx - dt.timedelta(days=14)
    rows = ev.select("user_id", "ts").collect()
    prior = {r.user_id for r in rows if lo <= r.ts < cut}
    recent = {r.user_id for r in rows if r.ts >= cut}
    assert out == prior - recent


# ------------------------------------------------- markov attribution
def test_markov_attribution_invariants(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["rows_markov_attribution"](spark, sf_dir).collect()
    assert rows
    shares = [r.attribution_share for r in rows]
    assert abs(sum(shares) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r.removal_effect <= 1.0
        assert r.channel.startswith("ch")


def test_markov_attribution_single_channel_takes_all(spark):
    """Journeys touching only one channel: removing it kills every
    conversion, so it gets the whole credit."""
    import datetime as dt

    from usedcars_bigdata_spark.operators.timeseries import markov_attribution

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(10):
        rows.append((u, t0 + dt.timedelta(minutes=u), u * 10, "only", u % 2 == 0))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, channel string, converted boolean"
    )
    out = markov_attribution(
        df, "user_id", "ts", "event_id", "channel", "converted"
    ).collect()
    assert len(out) == 1
    assert out[0].channel == "only"
    assert out[0].attribution_share == 1.0
    assert out[0].removal_effect == 1.0


# ----------------------------------------------------------- grouped OLS
def test_builtin_regr_aggregates_match_moment_form(spark, sf_dir):
    """Spark's SQL-standard regr_slope/regr_intercept must agree with the
    exact-integer-moment form the contract entry computes — certifying
    the built-in surface through the oracle-checked path."""
    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    want = {
        r.event_type: (r.slope_cents_per_hour, r.intercept_cents)
        for r in QUERIES["rel_grouped_ols"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    y = (F.round(F.col("value") * 100)).cast("double")
    got = {
        r.event_type: (r.s, r.i)
        for r in ev.groupBy("event_type")
        .agg(
            F.regr_slope(y, x).alias("s"),
            F.regr_intercept(y, x).alias("i"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 1e-6, k
        assert abs(got[k][1] - want[k][1]) < 1e-3, k


def test_markov_attribution_no_conversions(spark):
    """Zero conversions: removal effects and shares degrade to 0 without
    dividing by zero."""
    import datetime as dt

    from usedcars_bigdata_spark.operators.timeseries import markov_attribution

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, t0, u, "chA", False) for u in range(5)],
        "user_id long, ts timestamp, event_id long, channel string, converted boolean",
    )
    out = markov_attribution(
        df, "user_id", "ts", "event_id", "channel", "converted"
    ).collect()
    assert len(out) == 1
    assert out[0].removal_effect == 0.0


def test_markov_attribution_null_channel_excluded(spark):
    """A touch with a NULL channel (e.g. a missing/non-numeric JSON
    property after get_json_object/cast) must be dropped from the
    journey, not crash the driver-side vocabulary split (round-5 advice:
    'NoneType'.startswith) — and must carry no credit."""
    import datetime as dt

    from usedcars_bigdata_spark.operators.timeseries import markov_attribution

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(6):
        rows.append((u, t0 + dt.timedelta(minutes=1), u * 10, None, False))
        rows.append((u, t0 + dt.timedelta(minutes=2), u * 10 + 1, "paid", u % 2 == 0))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, channel string, converted boolean"
    )
    out = markov_attribution(
        df, "user_id", "ts", "event_id", "channel", "converted"
    ).collect()
    assert [r.channel for r in out] == ["paid"]
    assert out[0].attribution_share == 1.0


def test_grouped_ols_constant_x_yields_nan_not_error(spark):
    """A group whose regressor never varies has an undefined slope —
    NaN, the same answer DuckDB's 0/0 gives, not an exception (ANSI mode
    throws on integer division only)."""
    import math

    from usedcars_bigdata_spark.plans import QUERIES  # registry import
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1.0, 5.0), (1.0, 7.0), (1.0, 9.0)], "x double, y double"
    )
    r = df.agg(F.regr_slope("y", "x").alias("s")).first()
    assert r.s is None or math.isnan(r.s)


def test_gone_silent_empty_when_everyone_recent(spark):
    import datetime as dt

    from usedcars_bigdata_spark.plans import QUERIES

    # all users active in the final week -> nobody has gone silent;
    # exercised via the library shape on a synthetic frame
    from usedcars_bigdata_spark.sources import load_table  # noqa: F401
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 20)
    rows = [(i, 1 + i % 3, t0 + dt.timedelta(days=i % 14)) for i in range(40)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    hz = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("cut"),
        (F.max("ts") - F.expr("INTERVAL 14 DAY")).alias("prior_lo"),
    )
    with_hz = ev.join(F.broadcast(hz))
    prior = with_hz.filter(
        (F.col("ts") >= F.col("prior_lo")) & (F.col("ts") < F.col("cut"))
    ).select("user_id").distinct()
    recent = with_hz.filter(F.col("ts") >= F.col("cut")).select("user_id").distinct()
    assert prior.join(recent, "user_id", "left_anti").count() == 0


# ------------------------------------------------------------- log-rank
def test_logrank_null_when_groups_identical(spark, sf_dir):
    """Sanity on the harness: hash-split groups share the lifetime
    distribution, so chi2 should be modest (not a significance claim —
    a bound loose enough to be stable across SFs), O1 ≈ E1 relative to
    the death count, and V > 0."""
    from usedcars_bigdata_spark.plans import QUERIES

    r = QUERIES["ts_logrank_test"](spark, sf_dir).first()
    assert r.n_times > 0
    assert r.o1 > 0 and r.e1 > 0
    assert abs(r.o1 - r.e1) < 0.5 * (r.o1 + r.e1)
    assert 0.0 <= r.chi2 < 50.0, r


def test_logrank_detects_planted_separation(spark):
    """Group 1 lives uniformly ~3x longer than group 0 with no censoring:
    the statistic must exceed the identical-distribution case by a wide
    margin (chi2 >> 3.84, the 5% critical value)."""
    import datetime as dt

    from usedcars_bigdata_spark.plans import QUERIES  # noqa: F401
    from usedcars_bigdata_spark.operators import timeseries as TSx  # noqa: F401
    # replicate the entry's math on a planted frame via the same SQL
    import duckdb

    con = duckdb.connect()
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for u in range(200):
        grp = u % 2
        hours = 10 + (u % 7) + (20 if grp == 1 else 0)
        rows.append((u, t0, t0 + dt.timedelta(hours=hours)))
    con.execute("CREATE TABLE per AS SELECT * FROM (VALUES " +
                ",".join(f"({u}, TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-01' + INTERVAL {10 + (u % 7) + (20 if u % 2 else 0)} HOUR)" for u in range(200)) +
                ") t(user_id, f, l)")
    chi2 = con.execute("""
    WITH lives AS (
      SELECT user_id % 2 AS grp,
             (epoch_us(l) - epoch_us(f)) // 3600000000 AS t,
             FALSE AS censored
      FROM per
    ), cell AS (
      SELECT t, grp, CAST(count(*) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leave_here
      FROM lives GROUP BY 1, 2
    ), grid AS (
      SELECT t.t, g.grp, coalesce(c.d, 0) AS d,
             coalesce(c.leave_here, 0) AS leave_here
      FROM (SELECT DISTINCT t FROM cell) t
      CROSS JOIN (SELECT 0 AS grp UNION ALL SELECT 1) g
      LEFT JOIN cell c ON c.t = t.t AND c.grp = g.grp
    ), risk AS (
      SELECT t, grp, d,
             sum(leave_here) OVER (PARTITION BY grp ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      FROM grid
    ), times AS (
      SELECT t, sum(CASE WHEN grp=1 THEN d ELSE 0 END) AS d1,
             sum(d) AS dt, sum(CASE WHEN grp=1 THEN n ELSE 0 END) AS n1,
             sum(n) AS nt
      FROM risk GROUP BY t
    ), agg AS (
      SELECT sum(d1) AS o1,
             sum(CAST(dt AS DOUBLE)*n1/nt) AS e1,
             sum(CASE WHEN nt > 1 THEN
               CAST(dt AS DOUBLE)*(CAST(n1 AS DOUBLE)/nt)
               *(1.0-CAST(n1 AS DOUBLE)/nt)*((nt-dt)*1.0/(nt-1))
             ELSE 0 END) AS v
      FROM times WHERE dt > 0
    )
    SELECT (o1-e1)*(o1-e1)/v FROM agg
    """).fetchone()[0]
    assert chi2 > 50, chi2


# -------------------------------------------------------------- Wilson CI
def test_wilson_interval_properties(spark, sf_dir):
    """Bounds inside [0,1], containing the point rate, matching
    statsmodels-style closed form recomputed in Python; degenerate
    k=0 and k=n cases keep nonzero width (the Wald failure mode)."""
    import math

    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["ts_conversion_wilson"](spark, sf_dir).collect()
    assert {r.variant for r in rows} == {0, 1}
    z = 1.959963985
    for r in rows:
        assert 0.0 <= r.lo95 <= r.rate <= r.hi95 <= 1.0
        p = r.k / r.n
        center = p + z * z / (2 * r.n)
        half = z * math.sqrt(p * (1 - p) / r.n + z * z / (4 * r.n * r.n))
        denom = 1 + z * z / r.n
        assert abs(r.lo95 - (center - half) / denom) < 1e-6
        assert abs(r.hi95 - (center + half) / denom) < 1e-6
    # degenerate-case width (pure formula check, no Spark needed)
    for k, n in [(0, 50), (50, 50)]:
        p = k / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        lo, hi = (center - half) / denom, (center + half) / denom
        assert hi - lo > 0.01
        # hi at k=n lands on 1.0 up to float epsilon (the formula is
        # algebraically <= 1; the double arithmetic overshoots by 1 ulp)
        assert -1e-12 <= lo <= hi <= 1.0 + 1e-12


# ------------------------------------------------------------ cohort LTV
def test_cohort_ltv_monotone_and_consistent(spark, sf_dir):
    """Cumulative revenue is non-decreasing in cohort age, and the final
    cumulative per cohort equals that cohort's total purchase cents."""
    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = QUERIES["ts_cohort_ltv"](spark, sf_dir).collect()
    assert rows
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(r.cohort_week, []).append((r.age_w, r.cum_revenue_cents))
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    totals = {
        r.cw: r.t
        for r in ev.filter("event_type = 'purchase'")
        .join(cohort, "user_id")
        .groupBy("cw")
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("t"))
        .collect()
    }
    for cw, pts in by_c.items():
        pts.sort()
        for (a1, c1), (a2, c2) in zip(pts, pts[1:]):
            assert a1 < a2 and c1 <= c2
        assert pts[-1][1] == totals[cw], cw


# ----------------------------------------------------- session paths
def test_top_session_paths_gap_split_and_ranking(spark):
    """Two sessions for u1 (gap > 30min splits), path truncated at
    path_len, ranking by (count desc, path asc)."""
    import datetime as dt

    from usedcars_bigdata_spark.operators.timeseries import top_session_paths

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # u1 session 1: view > click > purchase > view (4th drops)
        (1, t0, 1, "view"), (1, t0 + m, 2, "click"),
        (1, t0 + 2 * m, 3, "purchase"), (1, t0 + 3 * m, 4, "view"),
        # u1 session 2 after 2h: view > click > purchase again
        (1, t0 + dt.timedelta(hours=2), 5, "view"),
        (1, t0 + dt.timedelta(hours=2) + m, 6, "click"),
        (1, t0 + dt.timedelta(hours=2) + 2 * m, 7, "purchase"),
        # u2: a single short session
        (2, t0, 8, "error"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = top_session_paths(
        df, "user_id", "ts", "event_id", "event_type", path_len=3, top_k=10
    ).collect()
    assert [(r.rank, r.path, r.n_sessions) for r in out] == [
        (1, "view>click>purchase", 2),
        (2, "error", 1),
    ]


def test_key_skew_profile_matches_manual(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table

    r = QUERIES["rel_key_skew_profile"](spark, sf_dir).collect()[0]
    import collections

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    cnt = collections.Counter(x.l_orderkey for x in li)
    ns = sorted(cnt.values())
    assert r.n_keys == len(ns)
    assert r.max_cnt == ns[-1]
    import math

    assert r.p50_cnt == ns[math.ceil(0.5 * len(ns)) - 1]
    assert r.p99_cnt == ns[math.ceil(0.99 * len(ns)) - 1]
    hot = min(k for k, v in cnt.items() if v == ns[-1])
    assert r.hot_key == hot


def test_variant_try_get_nulls_malformed_rows(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", '{"k": 3}'), ("a", "not json"), ("b", '{"x": 1}')],
        ["t", "props"],
    )
    out = df.select(
        "t",
        F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint").alias("k"),
    ).collect()
    got = {(r.t, r.k) for r in out}
    assert got == {("a", 3), ("a", None), ("b", None)}


# ------------------------------------------------- bootstrap / SPRT
def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    a = {r.event_type: (r.n, r.mean_value, r.ci_lo, r.ci_hi)
         for r in QUERIES["ts_bootstrap_ci"](spark, sf_dir).collect()}
    b = {r.event_type: (r.n, r.mean_value, r.ci_lo, r.ci_hi)
         for r in QUERIES["ts_bootstrap_ci"](spark, sf_dir).collect()}
    assert a == b  # md5-seeded: no RNG state anywhere
    for k, (n, mean, lo, hi) in a.items():
        assert n > 0 and lo < hi, k
        assert lo <= mean <= hi, k
        # CI of the mean shrinks like 1/sqrt(n): sanity-bound the width
        assert (hi - lo) < mean, k


def test_sprt_accepts_h1_on_planted_high_rate(spark):
    import datetime as dt

    from usedcars_bigdata_spark.operators.timeseries import sprt_first_decision

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # variant 0: 40% success rate (>> p1=0.22) -> accept_h1 quickly
    # variant 1: 2% success rate (<< p0=0.18) -> accept_h0 quickly
    for i in range(2000):
        rows.append((0, t0 + dt.timedelta(seconds=i), i,
                     "purchase" if i % 5 in (0, 1) else "view"))
        rows.append((1, t0 + dt.timedelta(seconds=i), 10_000 + i,
                     "purchase" if i % 50 == 0 else "view"))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r.variant: r for r in sprt_first_decision(
        df, F.col("user_id"), F.col("event_type") == "purchase",
        "ts", "event_id").collect()}
    assert out[0].decision == "accept_h1"
    assert out[1].decision == "accept_h0"
    # sequential tests decide long before the fixed horizon
    assert out[0].n_at_decision < 2000
    assert out[1].n_at_decision < 2000


def test_sprt_crossing_index_matches_manual_replay(spark):
    import datetime as dt
    import math

    from usedcars_bigdata_spark.operators.timeseries import sprt_first_decision

    t0 = dt.datetime(2024, 1, 1)
    pattern = [1, 1, 0, 1, 1, 1, 0, 1, 1, 1] * 30
    rows = [(7, t0 + dt.timedelta(seconds=i), i,
             "purchase" if x else "view") for i, x in enumerate(pattern)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = sprt_first_decision(
        df, F.col("user_id"), F.col("event_type") == "purchase",
        "ts", "event_id").collect()[0]
    l1, l0 = math.log(0.22 / 0.18), math.log(0.78 / 0.82)
    upper, lower = math.log(0.95 / 0.05), math.log(0.05 / 0.95)
    s = llr = 0
    for i, x in enumerate(pattern, start=1):
        s += x
        llr = s * l1 + (i - s) * l0
        if llr >= upper or llr <= lower:
            break
    assert out.decision == ("accept_h1" if llr >= upper else "accept_h0")
    assert out.n_at_decision == i
    assert abs(out.llr - round(llr, 6)) < 1e-9


def test_label_propagation_separates_planted_communities(spark):
    from usedcars_bigdata_spark.operators.graph import label_propagation_unrolled

    # two 5-cliques bridged by one edge: LPA must give each clique one
    # label and keep the cliques distinct
    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4, 5]) + clique([10, 11, 12, 13, 14]) + [(5, 10)]
    df = spark.createDataFrame(edges, ["s", "d"])
    out = {r.node: r.label for r in
           label_propagation_unrolled(df, "s", "d", iterations=3).collect()}
    c1 = {out[i] for i in (1, 2, 3, 4)}
    c2 = {out[i] for i in (11, 12, 13, 14)}
    assert len(c1) == 1 and len(c2) == 1
    assert c1 != c2
    # determinism: a second run is identical
    out2 = {r.node: r.label for r in
            label_propagation_unrolled(df, "s", "d", iterations=3).collect()}
    assert out == out2


def test_fifo_match_hand_walked(spark):
    """FIFO via cumulative intervals == the sequential walk: sells
    consume the oldest open buy lots, splitting across lots exactly."""
    from usedcars_bigdata_spark.operators.joins import fifo_match

    buys = spark.createDataFrame(
        # key, seq, qty, unit
        [("p", 1, 10, 100), ("p", 2, 5, 200), ("p", 3, 8, 300)],
        ["k", "seq", "qty", "unit"],
    )
    sells = spark.createDataFrame(
        [("p", 1, 12, 999), ("p", 2, 6, 888)],
        ["k", "seq", "qty", "unit"],
    )
    rows = fifo_match(buys, sells, "k", "qty", ["seq"]).collect()
    got = sorted((r.b_pos, r.s_pos, r.matched_qty) for r in rows)
    # sell 1 (12): 10 from lot 1 + 2 from lot 2
    # sell 2 (6): 3 from lot 2 + 3 from lot 3
    assert got == [(1, 1, 10), (2, 1, 2), (2, 2, 3), (3, 2, 3)]
    # cost basis: FIFO consumed quantities times unit prices
    cost = sum(r.matched_qty * r.b_unit for r in rows)
    assert cost == 10 * 100 + 2 * 200 + 3 * 200 + 3 * 300


def test_funnel_windowed_tighter_than_unbounded(spark, sf_dir):
    """The 24h-bounded funnel can never count MORE users per stage than
    the order-only funnel; stage 0 counts match exactly."""
    from usedcars_bigdata_spark.plans import QUERIES

    plain = {r.stage_idx: r.n_users
             for r in QUERIES["ts_funnel_stages"](spark, sf_dir).collect()}
    bound = {r.stage_idx: r.n_users
             for r in QUERIES["ts_funnel_windowed"](spark, sf_dir).collect()}
    assert bound[0] == plain[0]
    for i in (1, 2):
        assert bound[i] <= plain[i]


def test_histogram_quantile_error_bounded_by_bin_width(spark, sf_dir):
    """The sketch's upper-edge estimate overestimates the exact discrete
    percentile by at most one bin width ($100)."""
    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table

    est = {r.p: r.est_upper_cents
           for r in QUERIES["rel_histogram_quantiles"](spark, sf_dir).collect()}
    cents = sorted(
        int(round(r.o_totalprice * 100))
        for r in load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    )
    import math

    for p, got in est.items():
        exact = cents[math.ceil(p * len(cents)) - 1]
        assert exact <= got <= exact + 10000, (p, exact, got)


def test_histogram_sketch_merges_by_addition(spark, sf_dir):
    """Mergeability: bin counts from two disjoint halves sum to the full
    corpus histogram (the property KMV/HLL/CMS share)."""
    from pyspark.sql import functions as F

    from usedcars_bigdata_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    binned = orders.select(
        (F.floor(cents / 10000)).alias("bin"), "o_orderkey"
    )
    full = {r.bin: r.n for r in
            binned.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    h1 = {r.bin: r.n for r in binned.filter("o_orderkey % 2 = 0")
          .groupBy("bin").agg(F.count("*").alias("n")).collect()}
    h2 = {r.bin: r.n for r in binned.filter("o_orderkey % 2 = 1")
          .groupBy("bin").agg(F.count("*").alias("n")).collect()}
    merged = {b: h1.get(b, 0) + h2.get(b, 0) for b in set(h1) | set(h2)}
    assert merged == full


# ---------------------------------------------------------- kmv set algebra


def test_kmv_set_ops_exhaustive_small_sets_exact(spark):
    from usedcars_bigdata_spark.operators.agg import kmv_set_ops

    a = spark.createDataFrame([(i,) for i in range(10)], ["key"])
    b = spark.createDataFrame([(i,) for i in range(5, 15)], ["key"])
    r = kmv_set_ops(a, b, "key", k=64).collect()[0]
    # union of 15 distinct keys < k -> exhaustive sketch, theta = 1
    assert r.k_filled == 15
    assert r.theta == 1.0
    assert r.est_union == 15.0
    assert r.est_intersection == 5.0
    assert r.n_exact_union == 15
    assert r.n_exact_intersection == 5


def test_kmv_set_ops_estimates_track_exact(spark):
    from usedcars_bigdata_spark.operators.agg import kmv_set_ops

    a = spark.createDataFrame([(i,) for i in range(2000)], ["key"])
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], ["key"])
    r = kmv_set_ops(a, b, "key", k=64).collect()[0]
    assert r.n_exact_union == 3000 and r.n_exact_intersection == 1000
    # k=64 KMV has ~1/sqrt(62) ~ 13% rel error; allow 3 sigma
    assert abs(r.est_union - 3000) / 3000 < 0.4
    assert abs(r.est_intersection - 1000) / 1000 < 0.6


# ------------------------------------------------------------ table checksum


def test_table_checksum_order_invariant_and_sensitive(spark):
    from usedcars_bigdata_spark.operators.agg import table_checksum

    rows = [(1, "a"), (2, "b"), (3, "c")]
    df1 = spark.createDataFrame(rows, ["k", "v"])
    df2 = spark.createDataFrame(list(reversed(rows)), ["k", "v"])
    c1 = table_checksum(df1, ["k", "v"]).collect()[0]
    c2 = table_checksum(df2.repartition(4), ["k", "v"]).collect()[0]
    assert (c1.checksum_a, c1.checksum_b) == (c2.checksum_a, c2.checksum_b)
    # single-value corruption moves the fingerprint
    df3 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "X")], ["k", "v"])
    c3 = table_checksum(df3, ["k", "v"]).collect()[0]
    assert (c3.checksum_a, c3.checksum_b) != (c1.checksum_a, c1.checksum_b)
    # duplication moves it too (a plain XOR would not notice pairs)
    df4 = spark.createDataFrame(rows + [(3, "c")], ["k", "v"])
    c4 = table_checksum(df4, ["k", "v"]).collect()[0]
    assert c4.checksum_a != c1.checksum_a


# --- r9 review: timeseries degenerate inputs + semantic parity ---


def test_timeseries_degenerate_series_null_not_crash(spark):
    import datetime as dt

    from usedcars_bigdata_spark.operators.timeseries import (
        acf_lags,
        ar2_yule_walker,
        seasonality_anova,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(6):
        rows.append(("const", t0 + dt.timedelta(hours=i), 5.0))
        rows.append(("ok", t0 + dt.timedelta(hours=i), float(i % 3)))
    df = spark.createDataFrame(rows, ["k", "ts", "v"])

    eta = {r.key: r.eta2 for r in
           seasonality_anova(df, "ts", "k", "v").collect()}
    assert eta["const"] is None and eta["ok"] is not None

    # acf over a constant dense series: zero variance -> NULL r
    dense = spark.createDataFrame(
        [("c", i, 4) for i in range(8)], ["key", "t", "x"]
    )
    acf = acf_lags(dense, "key", "t", "x", lags=(1, 2))
    assert all(r.r is None for r in acf.collect())

    # ar2 with rounded r1 = 1.0 (singular Yule-Walker) -> NULL phis
    acf_tbl = spark.createDataFrame(
        [("k", 1, 8, 1.0), ("k", 2, 8, 0.5)], ["key", "lag", "n", "r"]
    )
    row = ar2_yule_walker(acf_tbl, "key").first()
    assert row.phi1 is None and row.phi2 is None


def test_shapley_axis_generated_matches_pinned_literals():
    from usedcars_bigdata_spark.operators.timeseries import (
        SHAPLEY_AXIS,
        _shapley_axis,
    )

    gen = _shapley_axis(("click", "error", "signup", "view"))
    assert sorted(gen) == sorted(SHAPLEY_AXIS)  # bit-identical weights

    # non-default tuples get a consistent axis (not the 4-channel pin)
    three = _shapley_axis(("a", "b", "c"))
    assert len(three) == 3 * 4  # n * 2^(n-1)
    import pytest

    with pytest.raises(ValueError, match="duplicate"):
        _shapley_axis(("a", "a"))
    with pytest.raises(ValueError, match="exponential"):
        _shapley_axis(tuple(f"c{i}" for i in range(13)))


def test_top_session_paths_subsecond_gap_matches_sessionize(spark):
    import datetime as dt

    from usedcars_bigdata_spark.operators.timeseries import (
        top_session_paths,
    )

    t0 = dt.datetime(2024, 1, 1)
    # true gap 1800.9s: > 30 min, so the second event OPENS a session;
    # the old cast-to-seconds form truncated the gap to 1800 and merged
    rows = [
        ("u", t0, 1, "view"),
        ("u", t0 + dt.timedelta(seconds=1800, microseconds=900000), 2, "click"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    paths = {r.path: r.n_sessions for r in
             top_session_paths(df, "user_id", "ts", "event_id",
                               "event_type").collect()}
    assert paths == {"view": 1, "click": 1}  # two sessions, not 'view>click'


def test_correlation_matrix_listwise_null_policy(spark):
    from usedcars_bigdata_spark.operators.agg import correlation_matrix

    rows = [(float(i), float(2 * i), None if i % 2 else float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {(r.col_a, r.col_b): r for r in
           correlation_matrix(df, ["a", "b", "c"]).collect()}
    # listwise: every pair shares the 5 complete rows
    assert all(r.n == 5 for r in out.values())
    assert out[("a", "b")].r == 1.0
    # constant column -> NULL r, not a crash
    const = spark.createDataFrame(
        [(float(i), 5.0) for i in range(6)], "a double, b double"
    )
    assert correlation_matrix(const, ["a", "b"]).first().r is None


def test_median_ci_drops_null_values(spark):
    from usedcars_bigdata_spark.operators.agg import median_ci

    df = spark.createDataFrame(
        [("g", 10.0, 1), ("g", 20.0, 2), ("g", 30.0, 3),
         ("g", None, 4), ("g", None, 5)],
        ["grp", "v", "id"],
    )
    row = median_ci(df, "grp", "v", "id").first()
    assert row.n == 3 and row.median == 20.0  # NULLs no longer rank 1..k


def test_percentiles_exact_labels_rounded(spark):
    import pytest

    from usedcars_bigdata_spark.operators.agg import percentiles_exact

    cols = percentiles_exact("x", [0.29, 0.57])
    df = spark.createDataFrame([(float(i),) for i in range(101)], ["x"])
    row = df.agg(*cols).first()
    # labels were p28/p56 via float truncation before the fix; values
    # are interpolated percentiles (within float eps of the index)
    assert abs(row.p29 - 29.0) < 1e-9 and abs(row.p57 - 57.0) < 1e-9
    with pytest.raises(ValueError, match="collide"):
        percentiles_exact("x", [0.281, 0.282])


def test_profile_table_hostile_column_names(spark):
    from usedcars_bigdata_spark.operators.agg import profile_table

    df = spark.createDataFrame(
        [(1, "x"), (2, None)], ["unit price", "o'clock"]
    )
    out = {r.col_name: r for r in profile_table(df).collect()}
    assert out["unit price"].n_nulls == 0
    assert out["o'clock"].n_nulls == 1


def test_table_checksum_distinguishes_null_shift_and_delimiter(spark):
    from usedcars_bigdata_spark.operators.agg import table_checksum

    a = spark.createDataFrame(
        [("a", None, "b")], "c1 string, c2 string, c3 string"
    )
    b = spark.createDataFrame(
        [("a", "b", None)], "c1 string, c2 string, c3 string"
    )
    ca = table_checksum(a, ["c1", "c2", "c3"]).first()
    cb = table_checksum(b, ["c1", "c2", "c3"]).first()
    assert ca.checksum_a != cb.checksum_a  # column shift must move it
    d1 = spark.createDataFrame([("a|b", "c")], ["c1", "c2"])
    d2 = spark.createDataFrame([("a", "b|c")], ["c1", "c2"])
    assert (
        table_checksum(d1, ["c1", "c2"]).first().checksum_a
        != table_checksum(d2, ["c1", "c2"]).first().checksum_a
    )

"""Hypothesis property tests: engine operators vs pure-Python reference
implementations on generated data. Few examples per test (Spark job cost),
but the generators explore nulls, duplicates, ties, and empty groups that
fixed fixtures miss."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext import dedup as X
from usedcars_bigdata_spark.operators import clean as C
from usedcars_bigdata_spark.operators import window as W

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 50),  # id (dups allowed)
        st.sampled_from(["a", "b", "c", None]),  # key
        st.one_of(st.none(), st.integers(-5, 5)),  # value
    ),
    min_size=0,
    max_size=40,
)


@given(rows=rows_strategy)
@SET
def test_dedupe_deterministic_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "id long, k string, v long") if rows else None
    if df is None:
        return
    got = {
        (r["k"],): (r["id"], r["v"])
        for r in C.dedupe_deterministic(df, ["k"], ["id", "v"]).collect()
    }
    # python reference: first row per key under (id, v) ordering w/ null-first v
    ref: dict = {}
    keyfn = lambda t: (t[0], (t[2] is not None, t[2]))  # Spark sorts NULL first asc
    for t in sorted(rows, key=keyfn):
        ref.setdefault((t[1],), (t[0], t[2]))
    assert got == ref


@given(rows=rows_strategy)
@SET
def test_top_k_per_group_invariants(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "id long, k string, v long")
    out = W.top_k_per_group(df, ["k"], ["id", "v"], 2).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], []).append((r["id"], r["v"]))
    from collections import Counter

    group_sizes = Counter(t[1] for t in rows)
    for k, picked in by_key.items():
        assert len(picked) == min(2, group_sizes[k])


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=15
    )
)
@SET
def test_word_shingles_match_python(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in X.word_shingles(df, "doc_id", "text", n=2).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for i, t in rows:
        words = [w for w in t.strip().split() if w] if t.strip() else []
        want = {f"{words[j]} {words[j+1]}" for j in range(len(words) - 1)}
        if len(words) < 2:
            assert i not in got
        else:
            assert got.get(i, set()) == want


@given(
    vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=30)
)
@SET
def test_median_exact_matches_statistics(spark, vals):
    import statistics

    from usedcars_bigdata_spark.operators.agg import median_exact

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(median_exact("x").alias("m")).first()["m"]
    assert math.isclose(got, statistics.median(vals), rel_tol=1e-9, abs_tol=1e-9)


snap_rows = st.lists(
    st.tuples(
        st.integers(0, 20),                       # key (dups collapsed below)
        st.sampled_from(["a", "b", None]),        # attr 1
        st.one_of(st.none(), st.integers(-3, 3)), # attr 2
    ),
    min_size=0,
    max_size=25,
)


@given(old_rows=snap_rows, new_rows=snap_rows)
@SET
def test_snapshot_diff_roundtrip_property(spark, old_rows, new_rows):
    """Applying the extracted changeset to the old snapshot must
    reproduce the new snapshot exactly — for ANY pair of snapshots,
    including NULL attributes, disjoint key sets, and empty sides."""
    from usedcars_bigdata_spark.operators.joins import merge_upsert, snapshot_diff

    def dedup(rows):
        return list({r[0]: r for r in rows}.values())  # key-unique

    old_rows, new_rows = dedup(old_rows), dedup(new_rows)
    if not old_rows or not new_rows:
        return
    schema = "k long, s string, v long"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    changes = snapshot_diff(old, new, ["k"])
    upserts = changes.filter("change_type != 'deleted'").drop("change_type")
    deletes = changes.filter("change_type = 'deleted'").select("k")
    rebuilt = merge_upsert(old, upserts, ["k"]).join(deletes, "k", "left_anti")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_scd2_merge_idempotent_on_replay(spark):
    """Re-applying the SAME update batch must be a no-op: after the first
    merge every current row already carries the update's attributes, so
    the second merge emits no new versions."""
    import datetime as dt

    from usedcars_bigdata_spark.operators.joins import scd2_merge

    d0, eff = dt.date(2020, 1, 1), dt.date(2023, 6, 1)
    dim = spark.createDataFrame(
        [(1, "a", d0, None, True), (2, "b", d0, None, True), (3, None, d0, None, True)],
        "k long, seg string, valid_from date, valid_to date, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, "x", eff), (3, "y", eff), (9, "n", eff)],
        "k long, seg string, eff date",
    )
    once = scd2_merge(dim, upd, ["k"], ["seg"], "eff")
    twice = scd2_merge(once, upd, ["k"], ["seg"], "eff")
    key = lambda t: tuple((v is None, v) for v in t)  # None-safe ordering
    a = sorted(map(tuple, once.collect()), key=key)
    b = sorted(map(tuple, twice.collect()), key=key)
    assert a == b


def test_line_dedup_idempotent(spark):
    """Dedup output contains no cross-document duplicate lines, so
    re-running line_dedup on its own output is the identity on text."""
    from usedcars_bigdata_spark.ext.text import line_dedup

    df = spark.createDataFrame(
        [
            (1, "keep one\nBOILER\nkeep two"),
            (2, "BOILER\nkeep three"),
            (3, "keep four\nBOILER\nkeep four"),
        ],
        "doc_id long, text string",
    )
    once = line_dedup(df, "doc_id", "text")
    again = line_dedup(
        once.selectExpr("doc_id", "text_dedup AS text"), "doc_id", "text"
    )
    a = {r["doc_id"]: r["text_dedup"] for r in once.collect()}
    b = {r["doc_id"]: r["text_dedup"] for r in again.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Round-4 late batch: event-time + graph operators vs pure-Python references
# ---------------------------------------------------------------------------

_intervals = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),          # type
        st.integers(0, 120),                   # start second
        st.integers(1, 60),                    # duration seconds
    ),
    min_size=1,
    max_size=25,
)


@given(ivs=_intervals)
@SET
def test_max_concurrency_matches_bruteforce(spark, ivs):
    from usedcars_bigdata_spark.operators.timeseries import max_concurrency

    rows = [
        (k, f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}", float(d))
        for k, s, d in ivs
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_type"]: r["max_concurrent"]
        for r in max_concurrency(df, "ts", "value", "event_type").collect()
    }
    # brute force sweep: ends sort before starts at the same instant
    want = {}
    for key in {k for k, _, _ in ivs}:
        bounds = []
        for k, s, d in ivs:
            if k != key:
                continue
            bounds.append((s, 1))
            bounds.append((s + d, -1))
        bounds.sort(key=lambda t: (t[0], t[1]))
        cur = peak = 0
        for _, delta in bounds:
            cur += delta
            peak = max(peak, cur)
        want[key] = peak
    assert got == want


_day_sets = st.lists(
    st.tuples(st.integers(1, 3), st.integers(1, 28)),  # (user, january day)
    min_size=1,
    max_size=30,
)


@given(days=_day_sets)
@SET
def test_gaps_islands_matches_bruteforce(spark, days):
    from usedcars_bigdata_spark.operators.timeseries import gaps_islands

    rows = [(u, f"2024-01-{d:02d} 12:00:00") for u, d in days]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["user_id"]: (r["n_islands"], r["longest_run"], r["active_days"])
        for r in gaps_islands(df, "user_id", "ts").collect()
    }
    want = {}
    for u in {u for u, _ in days}:
        ds = sorted({d for uu, d in days if uu == u})
        runs, cur = [], [ds[0]]
        for d in ds[1:]:
            if d == cur[-1] + 1:
                cur.append(d)
            else:
                runs.append(cur)
                cur = [d]
        runs.append(cur)
        want[u] = (len(runs), max(len(r) for r in runs), len(ds))
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_pagerank_conserves_mass_on_symmetric_graphs(spark, edges):
    from usedcars_bigdata_spark.operators.graph import pagerank_unrolled

    sym = sorted({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    df = spark.createDataFrame(sym, "src long, dst long")
    out = [r["pr"] for r in pagerank_unrolled(df, "src", "dst").collect()]
    n_nodes = len({a for a, _ in sym} | {b for _, b in sym})
    assert len(out) == n_nodes
    assert all(v > 0 for v in out)
    # symmetric graphs have no dangling mass: ranks sum to 1 (8-dec grid)
    assert abs(sum(out) - 1.0) < n_nodes * 5e-8


@given(
    obs=st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 72)),  # (user, hour idx)
        min_size=1,
        max_size=25,
    )
)
@SET
def test_rolling_active_matches_bruteforce(spark, obs):
    from usedcars_bigdata_spark.operators.timeseries import rolling_active_keys

    rows = [
        (u, f"2024-01-{1 + h // 24:02d} {h % 24:02d}:30:00") for u, h in obs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["bucket_start"].day * 100 + r["bucket_start"].hour: r["n_active"]
        for r in rolling_active_keys(
            df, "user_id", "ts", window_buckets=3, bucket="hour"
        ).collect()
    }
    hours = sorted({h for _, h in obs})
    lo, hi = min(hours), max(hours)
    want = {}
    for t in range(lo, hi + 1):
        users = {u for u, h in obs if t - 2 <= h <= t}
        if users:
            want[(1 + t // 24) * 100 + t % 24] = len(users)
    # buckets with zero active users simply don't appear in the output
    assert got == {k: v for k, v in want.items() if v > 0}


# ---------------------------------------------------------------------------
# Analytic invariants: the statistics ops must reproduce closed-form truths
# ---------------------------------------------------------------------------


def test_statistical_invariants(spark):
    """Ground truths with known closed forms: identical distributions have
    zero divergence/drift, constant distributions have zero inequality,
    independent factors have (near-)zero chi². These pin the FORMULAS, not
    just cross-engine agreement (both engines could implement the same
    wrong math and still hash-match)."""
    from usedcars_bigdata_spark.ext.text import domain_divergence

    # KL(X ‖ X) = 0 exactly, any content
    df = spark.createDataFrame(
        [("s1", "x y z w"), ("s2", "x y z w")], "source string, text string"
    )
    kl = {r["domain"]: r["kl_divergence"] for r in domain_divergence(
        df, "source", "text"
    ).collect()}
    assert all(v == 0.0 for v in kl.values())

    # Gini of a perfectly equal distribution: (2Σi·x − (n+1)Σx)/(nΣx) with
    # x constant → (2·(n(n+1)/2)·x − (n+1)·n·x)/(n·n·x) = 0
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    m = spark.createDataFrame([(i, 1000) for i in range(1, 9)], "k long, cents long")
    w = Window.orderBy(F2.col("cents").asc(), F2.col("k").asc())
    rk = m.select("cents", F2.row_number().over(w).alias("i"))
    n = F2.count("*")
    gini = rk.agg(
        F2.round(
            (2.0 * F2.sum(F2.col("i") * F2.col("cents")) - (n + 1) * F2.sum("cents"))
            / (n * F2.sum("cents")),
            6,
        ).alias("g")
    ).collect()[0]["g"]
    assert gini == 0.0

    # chi² of an EXACTLY independent 2×2 table (counts = product form) = 0
    rows = []
    for a, na in [("p", 30), ("q", 70)]:
        for b, nb in [("u", 40), ("v", 60)]:
            rows.extend([(a, b)] * (na * nb // 100))
    t = spark.createDataFrame(rows, "x string, y string")
    c = t.groupBy("x", "y").agg(F2.count("*").alias("n"))
    r = c.groupBy("x").agg(F2.sum("n").alias("rn"))
    cl = c.groupBy("y").agg(F2.sum("n").alias("cn"))
    tot = c.agg(F2.sum("n").alias("tot"))
    e = F2.col("rn") * F2.col("cn") * 1.0 / F2.col("tot")
    chi2 = (
        c.join(r, "x").join(cl, "y").crossJoin(tot)
        .agg(F2.round(F2.sum(F2.pow(F2.col("n") - e, 2) / e), 9).alias("c"))
        .collect()[0]["c"]
    )
    assert chi2 == 0.0


def test_psi_identical_halves_is_zero(spark, sf_dir):
    """PSI between two hash-split halves of the SAME distribution must be
    near zero (sampling noise only), and PSI(X, X) is exactly zero —
    run the drift formula on a self-split and assert the sum stays tiny."""
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F2

    orders = load_table(spark, sf_dir, "orders")
    cents = F2.round(F2.col("o_totalprice") * 100).cast("bigint")
    bucket = F2.least(F2.floor(cents / 5000000.0), F2.lit(9)).cast("int")
    is_ref = (F2.xxhash64("o_orderkey") % 2 == 0).cast("int")
    c = (
        orders.select(bucket.alias("b"), is_ref.alias("r"))
        .groupBy("b")
        .agg(F2.sum("r").alias("n_ref"), F2.sum(1 - F2.col("r")).alias("n_cur"))
        .filter((F2.col("n_ref") > 0) & (F2.col("n_cur") > 0))
    )
    t = c.agg(F2.sum("n_ref").alias("tr"), F2.sum("n_cur").alias("tc"))
    pc = F2.col("n_cur") / F2.col("tc")
    pr = F2.col("n_ref") / F2.col("tr")
    psi = (
        c.crossJoin(t)
        .agg(F2.sum((pc - pr) * F2.log(pc / pr)).alias("psi"))
        .collect()[0]["psi"]
    )
    assert 0.0 <= psi < 0.05  # same distribution → only sampling noise

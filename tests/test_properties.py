"""Hypothesis property tests: engine operators vs pure-Python reference
implementations on generated data. Few examples per test (Spark job cost),
but the generators explore nulls, duplicates, ties, and empty groups that
fixed fixtures miss."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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

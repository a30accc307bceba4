"""Guards on the driver-facing contract surface.

Round-3 post-mortem: the driver canonicalizes query outputs with a pandas
``sort_values`` over all columns, which raises on unhashable cells
(list/ndarray) — `ext_embedding_quantize` shipped a raw array column and
went red while the repo's own driver_sim reported it green, because the
sim pre-normalized arrays before sorting. These tests pin (a) that
driver_sim's canonicalizer now reproduces the driver's failure mode, and
(b) the round-5 rotation actually placed the never-driver-checked entries
inside the 50-entry sweep window.
"""

from __future__ import annotations

import importlib.util
import pathlib

import pandas as pd
import pytest

from usedcars_bigdata_spark.plans import ORACLES, QUERIES

DRIVER_WINDOW = 50


def _script(name):
    path = (
        pathlib.Path(__file__).resolve().parents[1] / "scripts" / f"{name}.py"
    )
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _driver_sim():
    return _script("driver_sim")


def test_driver_sim_canon_crashes_on_array_cells():
    """The sim's canonicalizer must fail on array cells exactly like the
    driver's (pandas sort_values → factorize → unhashable list) — this is
    the regression that let round 3's quantize failure hide."""
    sim = _driver_sim()
    frame = pd.DataFrame({"id": [2, 1], "q": [[1, 2], [3, 4]]})
    with pytest.raises(TypeError):
        sim.canon_rows(frame)


def test_driver_sim_canon_flat_frames_sort_consistently():
    sim = _driver_sim()
    a = pd.DataFrame({"x": [3, 1, 2], "y": ["c", "a", "b"]})
    b = pd.DataFrame({"y": ["b", "c", "a"], "x": [2, 3, 1]})
    assert sim.canon_rows(a) == sim.canon_rows(b)


def test_rotation_window_satisfies_ledger_policy():
    """Round-agnostic window guard (replaces the per-round hard-coded
    membership list that went stale at every rotation): the first-50
    window must satisfy exactly the invariants scripts/rotation_ledger.py
    enforces — 12 ref_* pins, every non-pin slot oracle-backed, the
    whole never-driver-verified backlog inside the window once it fits,
    and the remaining slots holding the deterministic oldest-verified
    re-verification fill."""
    ledger = _script("rotation_ledger")
    window = list(QUERIES)[:DRIVER_WINDOW]
    pins = window[:12]
    assert all(n.startswith("ref_") for n in pins) and len(set(pins)) == 12
    rotate_ins = window[12:]
    assert not [n for n in rotate_ins if n not in ORACLES]
    last = ledger.load_last_verified()
    backlog = [k for k in QUERIES if k in ORACLES and k not in last]
    if len(backlog) >= len(rotate_ins):
        assert not [n for n in rotate_ins if n in last]
    else:
        assert not [n for n in backlog if n not in set(rotate_ins)]
        order = {k: i for i, k in enumerate(QUERIES)}
        n_fill = len(rotate_ins) - len(backlog)
        expected = sorted(
            (k for k in QUERIES if k in ORACLES and k in last
             and k not in set(pins)),
            key=lambda k: (last[k], order[k]))[:n_fill]
        actual = [n for n in rotate_ins if n in last]
        assert set(actual) == set(expected)


def test_window_is_fully_oracle_backed():
    window = list(QUERIES)[:DRIVER_WINDOW]
    rows_only = [n for n in window if n not in ORACLES]
    assert not rows_only, (
        f"sweep-window slots spent on rows-only entries: {rows_only}"
    )


def test_registry_has_no_dangling_oracles():
    assert set(ORACLES) <= set(QUERIES)


def test_partition_layout_independence(spark, sf_dir):
    """Representative oracle entries must produce the same row multiset
    under a pathological shuffle-partition setting (3) as under the test
    default — any layout dependence (limit-without-order, per-partition
    ids leaking into output, accumulation-order-sensitive rounding) shows
    up as a diff here before it shows up as a driver hash mismatch."""
    from usedcars_bigdata_spark.plans import QUERIES

    names = [
        "ref_q1_avg_price_by_priority",
        "rel_tpch_q18_large_orders",
        "ext_dedup_exact",
        "rel_abc_analysis",
        "ts_event_transitions",
        "rel_pagerank_copurchase",
        "rel_rfm_segments",
        # continuation-2 sequential-carry ops: the per-key recurrences
        # must be invariant to how keys land on partitions
        "ts_holt_trend",
        "ts_holt_winters",
        "ts_clamped_balance",
        "ext_quantile_normalize",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = {}
    for n in names:
        baseline[n] = sorted(
            tuple(str(v) for v in r) for r in QUERIES[n](spark, sf_dir).collect()
        )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for n in names:
            got = sorted(
                tuple(str(v) for v in r)
                for r in QUERIES[n](spark, sf_dir).collect()
            )
            assert got == baseline[n], f"{n} is partition-layout dependent"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

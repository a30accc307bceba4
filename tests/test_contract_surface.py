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

# Round-11 rotation (queued at round-10 close, executed this round): pin ONLY
# the 12 ref_* parity rows; every other window slot goes to the head of the
# never-driver-verified queue, with the two oracle-backed LLM-pipeline
# flagships (ext_dedup_minhash_md5, ext_dedup_simhash) front-loaded per the
# r10 VERDICT.
ROUND11_ROTATED_IN = [
    "ext_dedup_minhash_md5",
    "ext_dedup_simhash",
    "ml_gini_feature_rank",
    "rel_simpson_diversity",
    "ts_ljung_box",
    "rel_zonemap_prune_audit",
    "ext_audio_vad_segments",
    "rel_kmv_set_ops",
    "ext_code_prose_detect",
    "ml_pinball_loss",
    "rel_bitemporal_asof",
    "rel_table_checksum",
    "ts_hurst_exponent",
    "ml_mutual_info_rank",
    "ts_haar_energy",
    "ts_ar2_fit",
    "ts_changepoint_binseg",
    "rel_t_closeness",
    "ext_quality_rule_overlap",
    "ts_stream_kmv",
    "rel_graph_bfs_layers",
    "ml_class_balance",
    "ml_mrmr_rank",
    "ts_runs_test",
    "ts_turning_points",
    "ext_span_corruption",
    "ext_coverage_select",
    "ts_pattern_vshape",
    "ts_did_estimator",
    "rel_inclusion_deps",
    "rel_bucketed_join",
    "ts_markov_entropy",
    "ts_slo_burn_alerts",
    "rel_join_cardinality_audit",
    "ext_fs_em_weights",
    "ts_stream_left_outer",
    "ts_ewma_smooth",
    "ts_purged_splits",
]

DRIVER_WINDOW = 50


def _driver_sim():
    path = (
        pathlib.Path(__file__).resolve().parents[1] / "scripts" / "driver_sim.py"
    )
    spec = importlib.util.spec_from_file_location("driver_sim", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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


def test_round11_rotation_window_membership():
    window = list(QUERIES)[:DRIVER_WINDOW]
    refs = [n for n in window if n.startswith("ref_")]
    assert len(refs) == 12, f"expected exactly the 12 pinned ref rows, got {refs}"
    missing = [n for n in ROUND11_ROTATED_IN if n not in window]
    assert not missing, f"rotated-in entries outside the sweep window: {missing}"
    assert len(ROUND11_ROTATED_IN) == DRIVER_WINDOW - 12


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

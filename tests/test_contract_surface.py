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

# Round-10 rotation (queued at round-9 close, executed this round): pin ONLY
# the 12 ref_* parity rows; every other window slot goes to the head of the
# never-driver-verified queue (ts_stl_strength .. ml_nb_metrics), per the
# written schedule.
ROUND10_ROTATED_IN = [
    "ts_stl_strength",
    "ts_ab_srm",
    "ts_resample_locf",
    "rel_compaction_plan",
    "ext_vocab_coverage_curve",
    "ts_max_drawdown",
    "ml_residual_diagnostics",
    "ts_current_streaks",
    "rel_weighted_median",
    "rel_hhi_concentration",
    "ts_atypical_users",
    "rel_group_mean_impute",
    "ts_mix_shift_tv",
    "ml_brier_decomposition",
    "ts_ingestion_order_audit",
    "rel_spearman_corr",
    "ts_mann_whitney",
    "ts_kendall_tau",
    "ts_acf_lags",
    "ml_ndcg_mrr",
    "rel_ddsketch_quantiles",
    "rel_graph_kcore",
    "ts_hits_scores",
    "ext_rouge_recall",
    "ts_permutation_test",
    "rel_kruskal_wallis",
    "ts_jarque_bera",
    "rel_link_prediction_ra",
    "rel_graph_assortativity",
    "rel_bloom_join_prune",
    "ml_naive_bayes",
    "ts_periodogram",
    "ts_rolling_corr",
    "ml_map_at_k",
    "ext_flesch_readability",
    "ts_stream_topk",
    "ext_video_shot_cuts",
    "ml_nb_metrics",
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


def test_round10_rotation_window_membership():
    window = list(QUERIES)[:DRIVER_WINDOW]
    refs = [n for n in window if n.startswith("ref_")]
    assert len(refs) == 12, f"expected exactly the 12 pinned ref rows, got {refs}"
    missing = [n for n in ROUND10_ROTATED_IN if n not in window]
    assert not missing, f"rotated-in entries outside the sweep window: {missing}"
    assert len(ROUND10_ROTATED_IN) == DRIVER_WINDOW - 12


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

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

# Round-8 rotation (queued at round-7 close, executed this round): pin ONLY
# the 12 ref_* parity rows; every other window slot goes to the head of the
# never-driver-verified queue (r3/r4 backlog tail + round-6 additions head),
# per the written schedule.
ROUND8_ROTATED_IN = [
    "ts_logrank_test",
    "ts_conversion_wilson",
    "ts_two_proportion_test",
    "ts_cohort_ltv",
    "rel_skyline_pareto",
    "rel_association_rules",
    "ts_interpolate_linear",
    "ts_seasonal_baseline",
    "rel_k_anonymity",
    "rel_max_by_lookup",
    "ts_cusum_changepoints",
    "rel_kmv_sketch",
    "ts_survival_km",
    "rel_dq_expectations",
    "rel_scd2_pointlookup",
    "rel_winsorized_stats",
    "ext_unigram_logprob",
    "ext_er_blocking_pairs",
    "ext_er_entities",
    "ext_pmi_cooccurrence",
    "ext_split_lm_gate",
    "ext_crosssplit_decontamination",
    "ext_dedup_quality_survivor",
    "ext_token_budget_sample",
    "ext_corpus_card",
    "ml_roc_auc",
    "ml_ks_statistic",
    "ml_calibration_bins",
    "ml_lift_deciles",
    "ml_target_encoding",
    "ml_categorical_assoc",
    "rel_triangle_stats",
    "rel_common_neighbors",
    "ts_lead_lag_xcorr",
    "ts_seasonality_anova",
    "rel_feature_drift_ks",
    "ext_vocab_saturation",
    "ext_fs_match_scores",
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


def test_round8_rotation_window_membership():
    window = list(QUERIES)[:DRIVER_WINDOW]
    refs = [n for n in window if n.startswith("ref_")]
    assert len(refs) == 12, f"expected exactly the 12 pinned ref rows, got {refs}"
    missing = [n for n in ROUND8_ROTATED_IN if n not in window]
    assert not missing, f"rotated-in entries outside the sweep window: {missing}"
    assert len(ROUND8_ROTATED_IN) == DRIVER_WINDOW - 12


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

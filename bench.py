#!/usr/bin/env python
"""Benchmark harness (driver contract): times the engine's headline queries
plus the reference's three MLlib models at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], and prints ONE JSON line.

Mirrors the reference's harness structure (performance_py/
2-cores-6-instances.py:78-104: wall-clock around each block) with our
query set. Each query is forced with a count()-style action; ML blocks time
fit+evaluate like the reference (performance_py:455-523).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from usedcars_bigdata_spark.plans import QUERIES  # noqa: E402
from usedcars_bigdata_spark.session import get_session  # noqa: E402
from usedcars_bigdata_spark.sources import load_table  # noqa: E402

# Headline queries: the 3 reference benchmark queries (BASELINE.md) + the
# engine's scan/join/window/dedup/ANN workhorses.
BENCH_QUERIES = [
    "ref_q1_avg_price_by_priority",
    "ref_q2_median_value_by_type",
    "ref_q3_pct_of_total",
    "rel_tpch_q1_pricing_summary",
    "rel_tpch_q3_shipping_priority",
    "rel_tpch_q5_local_volume",
    "rel_join_revenue_by_nation",
    "rel_window_rank_orders",
    "rel_topk_per_group",
    "rel_asof_join",
    "ts_tumbling_hourly",
    "ts_session_windows",
    "ext_dedup_exact",
    "ext_dedup_minhash_lsh",
    "ext_dedup_clusters",
    "ext_ann_cosine_topk",
    "ext_ann_lsh_topk",
    "ext_ann_ivf_topk",
    "ext_text_quality",
    "ext_curation_pipeline",
    "ext_contamination_ngram",
    "ext_boilerplate_ngrams",
    "ext_dup_gram_fraction",
    "ext_semantic_dedup",
    "ext_inverted_index",
    "ext_tfidf_top_terms",
    "ext_group_cap_sample",
    "ext_doc_chunks",
    "ext_weighted_sample",
    "ts_resample_gap_fill",
    "ts_sessionize",
    "ts_funnel_stages",
    "ext_edit_distance_pairs",
    "ext_overlap_containment",
    "ext_line_dedup",
    "ext_dup_spans",
    "ext_remove_dup_spans",
    "ts_ohlc_hourly",
    "ts_ewma_smooth",
    "ts_holt_trend",
    # round-4 late batch: TPC-H breadth + corpus rule sets + event-time
    "rel_tpch_q6_forecast",
    "rel_tpch_q8_market_share",
    "rel_tpch_q10_returned",
    "rel_tpch_q13_custdist",
    "rel_tpch_q18_large_orders",
    "rel_tpch_q19_disjunctive",
    "rel_tpch_q9_profit",
    "rel_tpch_q20_excess_suppliers",
    "ext_gopher_quality",
    "ext_c4_filters",
    "ext_domain_divergence",
    "ts_cumulative_distinct",
    "ts_event_transitions",
    "ts_max_concurrency",
    "ts_gaps_islands",
    "ts_time_weighted_avg",
    "rel_rfm_segments",
    "rel_abc_analysis",
    "rel_copurchase_pairs",
    "ext_bigram_logprob",
    "rel_pagerank_copurchase",
    "ts_rolling_active_users",
    "ts_mad_outliers",
    "rel_psi_drift",
    # round-4 continuation: skyline, linear interpolation, entity resolution
    "rel_skyline_pareto",
    "ts_interpolate_linear",
    "ext_er_entities",
    "ext_pmi_cooccurrence",
    "ts_cusum_changepoints",
    "rel_kmv_sketch",
    "ext_split_lm_gate",
    "ts_survival_km",
    "rel_dq_expectations",
    "ext_crosssplit_decontamination",
    "ext_dedup_quality_survivor",
    "ext_token_budget_sample",
    "rel_scd2_pointlookup",
    "rel_winsorized_stats",
    "ext_corpus_card",
    # round-4 continuation-2 additions
    "rel_cms_sketch",
    "ts_attribution_models",
    "ext_quantile_normalize",
    "ext_hard_negatives",
    "ts_ab_cuped",
    "ext_stratified_split",
    "rel_dp_noisy_counts",
    "rel_textfile_logparse",
    "ts_holt_winters",
    # round-5 additions: DSIR data selection, BM25 sparse retrieval,
    # session paths, skew diagnostics, VARIANT JSON
    "ext_dsir_weights",
    "ext_bm25_topk",
    "ts_top_paths",
    "rel_key_skew_profile",
    "rel_variant_json",
    "ts_stream_sessionize",
    "rel_geo_grid_density",
    "rel_geo_radius_join",
    "ts_bootstrap_ci",
    "ts_sprt_decision",
    "rel_label_propagation",
    "ext_ann_pq_topk",
    "ts_funnel_windowed",
    "rel_fifo_cost_basis",
    "rel_histogram_quantiles",
    "ext_incremental_dedup",
    "ext_embedding_outliers",
    "rel_asof_nearest",
    "ext_ann_ivfpq_topk",
    "ts_power_sample_size",
    "ts_seasonal_anomalies",
    "ext_dedup_threshold_curve",
    "ml_roc_auc",
    "ml_ks_statistic",
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
    "ext_prefix_filter_jaccard",
    "ext_matryoshka_recall",
    "rel_neyman_allocation",
    "rel_golden_record",
    "ext_doremi_reweight",
    "rel_median_ci",
    "ts_stream_left_outer",
    "ts_rate_limit_tokens",
    "rel_correlation_matrix",
    "ml_conformal_intervals",
    "ml_learning_curve",
    "ts_shapley_attribution",
    "ts_theil_sen_trend",
    "ml_loso_influence",
    "ts_decayed_topk",
    "rel_l_diversity",
    "ext_source_centroid_sim",
    "ts_stream_rate_limit",
    "rel_salted_agg",
    "ts_interval_union_time",
    "ts_backtest_snaive",
    "rel_share_of_parent",
    "rel_tail_contribution",
    "rel_graph_period_diff",
    "ts_local_peaks",
    "ts_hourly_percentile_bands",
    "ts_semi_additive_monthly",
    "ts_growth_accounting",
    "ext_dupgraph_transitivity",
    "rel_fulfillment_latency",
    "ext_doc_novelty",
    "ts_retention_halflife",
    "rel_rank_movers",
    "ml_loco_importance",
    "ml_pr_auc",
    "ml_best_f1_threshold",
    "ts_velocity_features",
    "ml_ece",
    "ml_kfold_cv",
    "ts_stl_strength",
    "ts_ab_srm",
    "ts_resample_locf",
    "rel_compaction_plan",
    "ext_audio_frame_features",
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
]

BENCH_MODELS = ["linear", "decision_tree", "random_forest"]


def time_query(spark, sf_dir: str, name: str) -> float:
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    dt = time.time() - t0
    assert n >= 0
    return dt


def time_models(spark, sf_dir: str) -> dict[str, float]:
    from usedcars_bigdata_spark.ml.features import build_feature_table
    from usedcars_bigdata_spark.ml.regress import fit_and_evaluate

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("label"),
        F.year("o_orderdate").cast("double").alias("order_year"),
        "o_orderpriority",
        "o_orderstatus",
    )
    data = build_feature_table(
        orders, "label", ["order_year", "o_orderpriority", "o_orderstatus"]
    ).cache()
    data.count()
    train, test = data.randomSplit([0.8, 0.2], seed=42)
    train.cache().count()
    out: dict[str, float] = {}
    for m in BENCH_MODELS:
        t0 = time.time()
        _, metrics = fit_and_evaluate(train, test, m, n_features=3)
        out[f"ml_{m}"] = round(time.time() - t0, 3)
        assert metrics["n"] > 0
    data.unpersist()
    train.unpersist()
    return out


# The driver captures only the TAIL of stdout (observed: ~2000 chars) when
# recording BENCH_r{N}.json. Round 4's 91-entry single-line dump outgrew
# that window and the official artifact landed truncated mid-JSON
# (BENCH_r04.json parsed: null). Contract since round 5: the FINAL stdout
# line is a compact JSON (total + sf + the headline queries below, well
# under 1500 chars); the full per-query dict goes to BENCH_DETAIL.json at
# the repo root and to stderr.
HEADLINE = [
    "ref_q1_avg_price_by_priority",
    "ref_q2_median_value_by_type",
    "ref_q3_pct_of_total",
    "ml_linear",
    "ml_decision_tree",
    "ml_random_forest",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session(app_name="bench")

    # Warm the JVM/codegen once with the cheapest query, unrecorded
    # (the reference similarly excludes cluster-start from its timings).
    time_query(spark, sf_dir, "ref_q1_avg_price_by_priority")

    # ML fits run FIRST (right after warmup), not last: the iterative
    # MLlib fits are the queries most sensitive to accumulated JVM heap /
    # ContextCleaner churn, and with the bench now at 80+ entries the
    # tail position inflated them ~4-6x over their isolated-JVM
    # steady-state (r4: ml_linear 6.46s at position 83 vs 0.65s isolated;
    # scripts/bench_isolated.py reproduces). Running them in a fresh heap
    # keeps the recorded number close to what a dedicated job would see.
    timings: dict[str, float] = {}
    timings.update(time_models(spark, sf_dir))
    for name in BENCH_QUERIES:
        timings[name] = round(time_query(spark, sf_dir, name), 3)

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "bench_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)

    compact = {
        "metric": "bench_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
        "queries": {k: timings[k] for k in HEADLINE if k in timings},
    }
    line = json.dumps(compact)
    assert len(line) < 1500, f"compact bench line too long: {len(line)}"
    print(line)


if __name__ == "__main__":
    main()

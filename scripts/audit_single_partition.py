"""Registry-wide SinglePartition audit (r8 third pass, re-run per round).

Flags every `Exchange SinglePartition` whose CONSUMER is a Sort or Window
(the data-sized-funnel shape) rather than a scalar/final aggregate, and
prints the consumer line so bounded frames are visible at a glance:

- consumer mentions `__b` → the n_buckets-row offset table of the two-pass
  operators (bounded by construction, fine);
- entry in DECLARED → reference-parity or domain-bounded (documented in
  docs/SCALING.md "Deliberately left single-partition");
- anything else → a regression: a new unpartitioned Sort/Window over a
  potentially data-sized frame.

Exit 1 if any undeclared site is found. Streaming/ML-fit entries that
execute eagerly at construction are skipped, as in scan_audit.py.
"""

import os
import sys

# Derive the repo root from this file (not a hardcoded path) so the
# audit always reviews THE checkout it lives in (r9 review finding).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from usedcars_bigdata_spark.plantools import (  # noqa: E402
    single_partition_funnel_sites,
)
from usedcars_bigdata_spark.session import get_session  # noqa: E402

spark = get_session(shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

from usedcars_bigdata_spark.plans import QUERIES  # noqa: E402
from usedcars_bigdata_spark.operators.window import release_hubs  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

SKIP_PREFIXES = (
    "ts_stream", "rows_stream", "rows_word2vec", "rows_als", "rows_ml",
    "rows_quality", "rows_mmr", "veh_", "rows_fpgrowth", "rows_prefixspan",
    "ext_bpe",
)

# Documented exemptions (docs/SCALING.md §"Deliberately left
# single-partition"): reference W1-parity forms and windows over
# DOMAIN-BOUNDED tables (score-domain marker merges, distinct-score CDFs,
# hour/day/month grids, 9-digit Benford rows, tile/bucket offsets).
DECLARED = {
    "ref_q2_median_value_by_type",   # W1 parity: global row_number semantics
    "ref_q3_pct_of_total",           # reference's unpartitioned pct window
    "rel_benford_digits",            # 9-digit domain
    "ts_tumbling_hourly", "ts_sliding_hourly", "ts_hourly_percentile_bands",
    "ts_seasonal_baseline", "ts_seasonal_anomalies",  # hour/dow grids
    "rel_histogram_quantiles",       # fixed histogram-bucket domain
    "ml_roc_auc", "ml_ks_statistic", "ml_pr_auc",  # per-group score CDFs
    "ml_calibration_bins",           # fixed bin grid
    "ts_periodogram",                # bounded frequency grid
    "ts_acf_lags",                   # bounded lag grid
    "ts_haar_energy",                # log2-bounded level table
    # r9 triage of the remaining flags — each window/sort runs over a
    # table bounded by a DOMAIN, not the data volume:
    "rel_share_of_parent",           # nation grain (25 rows)
    "ts_mix_shift_tv",               # calendar week grid
    "ts_rolling_corr", "ts_slo_burn_alerts",  # calendar hour grids
    "ts_cumulative_distinct",        # calendar day grid
    "ts_mom_growth",                 # calendar month grid
    "ts_logrank_test", "ts_survival_km",  # hour-resolution event-time grid
    "ml_lift_deciles",               # 10-row decile table total
    "ext_vocab_saturation",          # per-batch table (fixed batch count)
    "ext_quantile_normalize",        # fixed-point score domain (≤ ~2·10^4)
    "ext_source_quality_rank",       # per-source table (~10 rows)
}

flagged: list[str] = []
errored: list[str] = []
for name, fn in QUERIES.items():
    if name.startswith(SKIP_PREFIXES):
        continue
    try:
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    except Exception as e:  # noqa: BLE001
        # an entry whose plan won't build is UNAUDITED — that must fail
        # the run, or the "no undeclared funnels" claim silently skips it
        print(f"ERR   {name}: {type(e).__name__}")
        errored.append(name)
        continue
    finally:
        release_hubs()
        spark.catalog.clearCache()
    for consumer in single_partition_funnel_sites(plan):
        tag = "declared" if name in DECLARED else "FLAG"
        print(f"{tag:9s} {name}: {consumer[:140]}")
        if tag == "FLAG":
            flagged.append(name)

print(
    f"\nAUDIT DONE — undeclared sites: {sorted(set(flagged))}; "
    f"unaudited (plan build failed): {errored}"
)
sys.exit(1 if flagged or errored else 0)

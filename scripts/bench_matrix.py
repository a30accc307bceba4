#!/usr/bin/env python
"""Benchmark-matrix harness — the engine's mirror of the reference's
``performance_py/2-cores-{6,12,18,24}-instances.py`` scripts (SURVEY.md §0:
they time sample-loading, Q1-Q3 and three regressors at three data sizes
and write a CSV, performance_py/2-cores-6-instances.py:78-104, 1462-1465).

Differences by design: data scales are the harness sf directories instead
of MB-targeted samples; one script parameterized by env instead of four
byte-identical copies; timings go to stdout AND a CSV shaped like
``performance_csv/*.csv`` (task,size,time_sec,cpu_pct rows).

Run: python scripts/bench_matrix.py [out.csv]
"""

from __future__ import annotations

import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import time_models  # noqa: E402  (shared ML benchmark block)
from usedcars_bigdata_spark.plans import QUERIES  # noqa: E402
from usedcars_bigdata_spark.session import get_session  # noqa: E402
from usedcars_bigdata_spark.sources import load_table  # noqa: E402

try:
    import psutil  # the reference samples driver CPU via psutil
except ImportError:  # pragma: no cover
    psutil = None

SCALES = ["sf0.001", "sf0.01", "sf0.1"]
QUERY_TASKS = [
    ("Query 1", "ref_q1_avg_price_by_priority"),
    ("Query 2", "ref_q2_median_value_by_type"),
    ("Query 3", "ref_q3_pct_of_total"),
]
MODEL_LABELS = {
    "ml_linear": "Linear Regression",
    "ml_decision_tree": "Decision Tree",
    "ml_random_forest": "Random Forest",
}


def timed(fn):
    if psutil:
        psutil.cpu_percent(None)
    t0 = time.time()
    fn()
    dt = time.time() - t0
    cpu = psutil.cpu_percent(None) if psutil else None
    return round(dt, 3), cpu


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_matrix.csv"
    base = os.path.dirname(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
    )
    spark = get_session(app_name="bench-matrix")
    rows = []
    for sf in SCALES:
        sf_dir = os.path.join(base, sf)
        # Sample loading (reference: read + size probe + sample, :78-88)
        def load():
            ev = load_table(spark, sf_dir, "orders")
            ev.sample(False, 0.5, seed=42).count()
        dt, cpu = timed(load)
        rows.append(("Sample loading", sf, dt, cpu))
        for label, qname in QUERY_TASKS:
            dt, cpu = timed(lambda q=qname: QUERIES[q](spark, sf_dir).count())
            rows.append((label, sf, dt, cpu))
        # ML block shared with bench.py (one recipe to keep in sync)
        for key, dt in time_models(spark, sf_dir).items():
            rows.append((MODEL_LABELS.get(key, key), sf, dt, None))
        print(f"[{sf}] " + ", ".join(f"{r[0]}={r[2]}s" for r in rows if r[1] == sf))
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["task", "scale", "time_sec", "cpu_pct"])
        w.writerows(rows)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

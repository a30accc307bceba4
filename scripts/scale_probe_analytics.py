#!/usr/bin/env python
"""Scale probe for the round-4-continuation analytics operators: grouped
skyline, linear gap interpolation, entity resolution, and BPE merge
training. Same methodology as scale_probe_graph.py — each size in its OWN
JVM (--pair mode) with an unrecorded warmup.

Generators keep DISTRIBUTIONS fixed while scaling row count, matching how
each op is supposed to behave at 100 TB:

- skyline: uniform 2-D points in 8 groups → frontier size grows ~log n,
  cost is the two window passes → expect ~linear time in points.
- interpolate: n events over a FIXED 72-hour axis and 8 keys → the grid
  and windows are constant-size; only the pre-aggregation sees n →
  expect ~linear (scan-bound), with the window stage flat.
- entity resolution: names drawn from a FIXED 500-value vocabulary in 50
  blocks → the representative graph is vocabulary-bounded, so pair
  generation + components should be ~FLAT; only the group-by and final
  label broadcast-back see n → expect strongly sub-linear.
- BPE (8 merges): words from a FIXED vocabulary → iterations run on the
  word-frequency table (constant size); only the first explode/count
  sees the corpus → expect strongly sub-linear.

Run: python scripts/scale_probe_analytics.py --pair 100000 400000
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usedcars_bigdata_spark.session import get_session


def timed(label: str, fn) -> float:
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s ({out})")
    return dt


def probe(spark, n: int) -> dict:
    from usedcars_bigdata_spark.ext.dedup import resolve_entities
    from usedcars_bigdata_spark.ext.text import bpe_merges
    from usedcars_bigdata_spark.operators.sort import pareto_frontier_2d
    from usedcars_bigdata_spark.operators.timeseries import interpolate_linear

    points = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("g"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(8))).alias(
            "grp"
        ),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)).alias("cost"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100_000)).alias("gain"),
    )
    events = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit(4)), F.lit(8))).alias(
            "key"
        ),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(72 * 3600)) * 1_000_000
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(6)), F.lit(10_000)) / 100.0).alias("value"),
    )
    records = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("b"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(50))).alias(
            "blk"
        ),
        F.concat(
            F.lit("prod_"), F.pmod(F.xxhash64("id", F.lit(8)), F.lit(500))
        ).alias("name"),
    )
    docs = spark.range(n // 10).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"), F.pmod(F.xxhash64("id", F.lit(100 + i)), F.lit(200))
                )
                for i in range(12)
            ],
        ).alias("text"),
    )

    # warmup (unrecorded) on a 5% slice
    warm = points.filter(F.col("id") < n // 20)
    pareto_frontier_2d(warm, "cost", "gain", group_cols=["grp"]).count()
    spark.catalog.clearCache()

    print(f"probe at n={n:,}:")
    out = {}
    out["skyline"] = timed(
        "grouped skyline",
        lambda: pareto_frontier_2d(
            points, "cost", "gain", group_cols=["grp"]
        ).count(),
    )
    out["interpolate"] = timed(
        "linear interpolation",
        lambda: interpolate_linear(events, "ts", "key", "value").count(),
    )
    out["entity_resolution"] = timed(
        "entity resolution",
        lambda: resolve_entities(records, "id", "name", ["blk"], max_dist=4).count(),
    )
    out["bpe_8_merges"] = timed(
        "bpe 8 merges", lambda: bpe_merges(docs, "text", n_merges=8).count()
    )
    return out


def main() -> None:
    if sys.argv[1:2] == ["--pair"]:
        import json
        import subprocess

        n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        n2 = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n1
        results = {}
        for n in (n1, n2):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(n), "--json"],
                capture_output=True, text=True, check=True,
            ).stdout
            results[n] = json.loads(out.strip().splitlines()[-1])
            for k, v in results[n].items():
                print(f"  n={n:,} {k}: {v:.2f}s")
        print(f"scaling ratios ({n2 / n1:.0f}x rows, isolated JVMs):")
        for k in results[n1]:
            print(f"  {k}: {results[n2][k] / max(results[n1][k], 1e-9):.2f}x time")
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_session(app_name="scale-probe-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    r = probe(spark, n)
    if "--json" in sys.argv:
        import json

        print(json.dumps(r))


if __name__ == "__main__":
    main()

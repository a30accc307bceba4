#!/usr/bin/env python
"""Scale probe for the round-4 pair/graph operators: basket co-occurrence
pairs, unrolled PageRank, the bigram LM gate, and rolling active keys.
Same methodology as scale_probe_corpus.py — each size in its OWN JVM with
an unrecorded warmup (same-JVM back-to-back runs inflate the second size).

The generator keeps the DISTRIBUTIONS fixed while scaling row count:
baskets stay 4-8 items over a part pool that grows with sqrt(n) (so pair
density per part rises like a real catalog), users stay at n/500 with
uniform hourly activity. Expected shapes: co-purchase and PageRank scale
with edge count (= Σ basket²·orders); bigram with total tokens; rolling
active with user-hours × window.

Run: python scripts/scale_probe_graph.py --pair 15000 60000
(sizes are ORDER counts; lineitems ≈ 6× that)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usedcars_bigdata_spark.session import get_session


def gen_baskets(spark, n_orders: int, path: str) -> None:
    import math

    pool = max(100, int(math.sqrt(n_orders) * 20))
    (
        spark.range(n_orders)
        .select(
            F.col("id").alias("o"),
            F.explode(
                F.sequence(F.lit(1), (F.pmod(F.xxhash64("id"), F.lit(5)) + 4))
            ).alias("slot"),
        )
        .select(
            "o",
            F.pmod(F.xxhash64("o", "slot"), F.lit(pool)).alias("p"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def timed(label: str, fn) -> float:
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s ({out})")
    return dt


def copurchase(items):
    a = items.select("o", F.col("p").alias("pa"))
    b = items.select(F.col("o").alias("o2"), F.col("p").alias("pb"))
    return (
        a.join(b, (a.o == b.o2) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )


def probe(spark, n_orders: int) -> dict:
    from usedcars_bigdata_spark.ext import text as TX
    from usedcars_bigdata_spark.operators.graph import pagerank_unrolled
    from usedcars_bigdata_spark.operators.timeseries import rolling_active_keys

    path = f"/tmp/scale_probe_baskets_{n_orders}"
    if not os.path.exists(path):
        t0 = time.time()
        gen_baskets(spark, n_orders, path)
        print(f"generated {n_orders:,} baskets in {time.time() - t0:.1f}s")
    items = spark.read.parquet(path).distinct()

    # synthetic docs/events reuse the basket table deterministically
    docs = items.groupBy("o").agg(
        F.concat_ws(" ", F.collect_list(F.concat(F.lit("w"), F.col("p")))).alias(
            "text"
        )
    ).withColumnRenamed("o", "doc_id")
    events = items.select(
        F.col("o").alias("user_id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.pmod(F.xxhash64("o", "p"), F.lit(72))
             * 3_600_000_000)
        ).alias("ts"),
    ).withColumn("user_id", F.pmod("user_id", F.lit(max(50, n_orders // 500))))

    warm = items.filter(F.col("o") < n_orders // 20)
    copurchase(warm).count()
    edges_w = warm.alias("x").join(
        warm.alias("y"),
        (F.col("x.o") == F.col("y.o")) & (F.col("x.p") != F.col("y.p")),
    ).select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
    pagerank_unrolled(edges_w, "src", "dst").count()
    spark.catalog.clearCache()

    print(f"probe at {n_orders:,} baskets:")
    out = {}
    out["copurchase"] = timed(
        "co-purchase pairs (n>=2)", lambda: copurchase(items).count()
    )
    a = items.select("o", F.col("p").alias("src"))
    b = items.select(F.col("o").alias("o2"), F.col("p").alias("dst"))
    edges = a.join(b, (a.o == b.o2) & (F.col("src") != F.col("dst"))).select(
        "src", "dst"
    )
    out["pagerank_3iter"] = timed(
        "pagerank 3 iter", lambda: pagerank_unrolled(edges, "src", "dst").count()
    )
    out["bigram_lm"] = timed(
        "bigram LM gate",
        lambda: TX.bigram_logprob_score(docs, "doc_id", "text").count(),
    )
    out["rolling_active"] = timed(
        "rolling active 24h",
        lambda: rolling_active_keys(events, "user_id", "ts").count(),
    )
    return out


def main() -> None:
    if sys.argv[1:2] == ["--pair"]:
        import json
        import subprocess

        n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 15_000
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
        print(f"scaling ratios ({n2 / n1:.0f}x baskets, isolated JVMs):")
        for k in results[n1]:
            print(f"  {k}: {results[n2][k] / max(results[n1][k], 1e-9):.2f}x time")
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000
    spark = get_session(app_name="scale-probe-graph")
    spark.sparkContext.setLogLevel("ERROR")
    r = probe(spark, n)
    if "--json" in sys.argv:
        import json

        print(json.dumps(r))


if __name__ == "__main__":
    main()

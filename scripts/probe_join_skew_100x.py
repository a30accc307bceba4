#!/usr/bin/env python
"""Skewed-join 10×/100× probe — the §2.3 join family's scale evidence
(the last major family whose skew story was asserted from sf0.1 numbers
only; dedup/ER, ANN, two-pass windows, graph, and streaming all have
planted-adversary probes).

Fixture (Spark-native, no driver-side generation): a fact table of N
rows with a PLANTED HOT KEY — 90% of all rows carry key 0, the rest
spread uniformly over 10k keys — joined N:1 to a 10k-row dim. The shape
AQE's skew-join and `salted_join` exist for.

Cells, one fresh JVM per (N, strategy) via --json children:
- ``smj_aqe``     sort-merge join, AQE skew handling ON (session default),
                  broadcast disabled — the engine's default answer;
- ``smj_noskew``  same join with AQE skew handling OFF — the degenerate
                  baseline (one task sorts/joins the hot key's 30%);
- ``salted``      operators.partitioning.salted_join (16 salt buckets,
                  right side replicated) — the explicit treatment for
                  skew AQE cannot split (null-surrogate keys etc.);
- ``broadcast``   plain broadcast join — the right answer whenever the
                  dim side fits, hot key irrelevant (no shuffle at all).

Every cell asserts the SAME output row count and the same hot-key join
count, so the strategies are verified equivalent before their walls are
compared. Timing: one unrecorded warmup, min of 2.

Run: python scripts/probe_join_skew_100x.py --pair
     python scripts/probe_join_skew_100x.py 20000000 smj_aqe --json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_KEYS = 10_000
HOT_SHARE_MOD = 10  # pmod(id,10) < 9  -> 90% of rows on key 0
SIZES = (2_000_000, 20_000_000)
BASE = "/tmp/probe_join_skew"


def build(spark, n: int) -> tuple[str, str]:
    fact_path = os.path.join(BASE, f"fact90_{n}")
    dim_path = os.path.join(BASE, f"dim_{N_KEYS}")
    if not os.path.exists(os.path.join(fact_path, "_SUCCESS")):
        (
            spark.range(n)
            .select(
                F.col("id"),
                F.when(F.pmod("id", HOT_SHARE_MOD) < 9, F.lit(0))
                .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
                .cast("long")
                .alias("k"),
                (F.pmod(F.xxhash64("id", F.lit(7)), 1000) / 10.0).alias("v"),
            )
            .write.mode("overwrite")
            .parquet(fact_path)
        )
    if not os.path.exists(os.path.join(dim_path, "_SUCCESS")):
        (
            spark.range(N_KEYS)
            .select(
                F.col("id").alias("k"),
                F.concat(F.lit("seg"), F.pmod("id", 7)).alias("segment"),
            )
            .write.mode("overwrite")
            .parquet(dim_path)
        )
    return fact_path, dim_path


def run_cell(spark, n: int, strategy: str) -> dict:
    from usedcars_bigdata_spark.operators.partitioning import salted_join

    fact_path, dim_path = build(spark, n)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)

    if strategy in ("smj_aqe", "smj_noskew", "salted"):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # AQE would also re-plan the salted join; leave it on there (the
        # salt must win WITH the optimizer's help, not against a nerfed
        # engine) — only the noskew cell turns the skew splitter off.
    if strategy == "smj_noskew":
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    def joined():
        if strategy == "salted":
            return salted_join(fact, dim, "k", buckets=16)
        if strategy == "broadcast":
            return fact.join(F.broadcast(dim), "k")
        return fact.join(dim, "k")

    def run_once() -> tuple[float, int]:
        t0 = time.time()
        c = joined().count()
        return time.time() - t0, c

    run_once()  # warmup, unrecorded
    walls = []
    n_out = None
    for _ in range(2):
        w, c = run_once()
        walls.append(round(w, 2))
        n_out = c
    hot = joined().filter(F.col("k") == 0).count()
    assert n_out == n, f"join must be N:1-complete: {n_out} != {n}"
    assert hot >= int(n * 0.89), f"hot key underweight: {hot}"
    return {
        "n": n,
        "strategy": strategy,
        "wall_s": min(walls),
        "walls": walls,
        "rows_out": n_out,
        "hot_rows": hot,
    }


def main() -> None:
    if sys.argv[1:2] == ["--pair"]:
        results: dict = {}
        for n in SIZES:
            for strat in ("smj_aqe", "smj_noskew", "salted", "broadcast"):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     str(n), strat, "--json"],
                    capture_output=True, text=True, check=True,
                )
                r = json.loads(proc.stdout.strip().splitlines()[-1])
                results[(n, strat)] = r
                print(json.dumps(r), flush=True)
        for strat in ("smj_aqe", "smj_noskew", "salted", "broadcast"):
            a, b = results[(SIZES[0], strat)], results[(SIZES[1], strat)]
            print(
                f"10x->100x wall {strat}: {a['wall_s']} -> {b['wall_s']} "
                f"({b['wall_s'] / max(a['wall_s'], 1e-9):.2f}x per 10x data)"
            )
        return

    n, strat = int(sys.argv[1]), sys.argv[2]
    from usedcars_bigdata_spark.session import get_session

    spark = get_session(app_name=f"probe-join-skew-{n}-{strat}")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run_cell(spark, n, strat)), flush=True)


if __name__ == "__main__":
    main()

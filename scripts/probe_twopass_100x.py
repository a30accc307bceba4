#!/usr/bin/env python
"""Two-pass window operators at the 100x regime (r8 verdict task 6):
the n_buckets=32 default was only ever exercised at sf0.1 — replicate
the orders table 100x (15M rows, disjoint key shifts, same methodology
as the pagerank/part-3 probes) and measure `distributed_row_number` and
`global_doubled_midrank_map` wall + bucket skew at n_buckets ∈ {32, 256}.

What the numbers decide: the operators' cost is (a) one range exchange
of the corpus, (b) an in-bucket sort per bucket, (c) an n_buckets-row
offset hub. More buckets → smaller per-task sorts (the pagerank probe's
humongous-allocation rule: ~8 partitions per core keeps hash/sort pages
under G1's humongous threshold) at the price of a bigger offset table —
which stays trivially broadcastable at any plausible n_buckets. Skew is
bounded by the range partitioner's sampling, not the data layout.

Run one mode per JVM: python scripts/probe_twopass_100x.py {32|256}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usedcars_bigdata_spark.operators.rankstats import global_doubled_midrank_map
from usedcars_bigdata_spark.operators.window import (
    distributed_row_number,
    release_hubs,
)
from usedcars_bigdata_spark.session import get_session
from usedcars_bigdata_spark.sources import load_table

ORDERS_100X = "/tmp/probe_twopass_orders_100x"


def grouped_mode(hot: bool, n_buckets: int = 64) -> None:
    """r12: the GROUPED two-pass forms (grouped_running_sums /
    grouped_lag) at 100× vs the plain per-key window, optionally with a
    planted 90%-hot key — the shape where partitionBy(key) funnels 13.5M
    rows through one task. Checksums pin bit-identity between both
    strategies on the SAME fixture before walls compare."""
    from pyspark.sql import Window

    from usedcars_bigdata_spark.operators.window import (
        grouped_lag,
        grouped_running_sums,
    )

    spark = get_session(app_name=f"twopass-grouped-{int(hot)}")
    spark.sparkContext.setLogLevel("WARN")
    if not os.path.exists(os.path.join(ORDERS_100X, "_SUCCESS")):
        raise SystemExit("run the default mode once first to build the fixture")
    df = spark.read.parquet(ORDERS_100X).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    if hot:
        df = df.withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 10 != 0, F.lit(0)).otherwise(
                F.col("o_custkey")
            ),
        )
    df = df.localCheckpoint(eager=True)  # decouple fixture build from timings
    n = df.count()
    print(f"rows: {n}  hot: {hot}  n_buckets: {n_buckets}")

    order = [F.col("o_orderkey").asc()]
    results = {}
    for label, frame in (
        (
            "grouped_running_sums",
            lambda: grouped_running_sums(
                df, ["o_custkey"], order, ["cents"], ["rs"],
                n_buckets=n_buckets,
            ),
        ),
        (
            "window_running_sum",
            lambda: df.withColumn(
                "rs",
                F.sum("cents").over(
                    Window.partitionBy("o_custkey")
                    .orderBy("o_orderkey")
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
            ),
        ),
        (
            "grouped_lag",
            lambda: grouped_lag(
                df, ["o_custkey"], ["o_orderkey"], "cents", "rs",
                n_buckets=n_buckets,
            ),
        ),
        (
            "window_lag",
            lambda: df.withColumn(
                "rs",
                F.lag("cents").over(
                    Window.partitionBy("o_custkey").orderBy("o_orderkey")
                ),
            ),
        ),
    ):
        t0 = time.time()
        out = (
            frame()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash("o_orderkey", "rs").cast("bigint")).alias("chk"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        results[label] = (wall, out.chk)
        assert out.n == n
        print(f"{label}: wall={wall:.1f}s chk={out.chk}")
        release_hubs()
        spark.catalog.clearCache()
    assert results["grouped_running_sums"][1] == results["window_running_sum"][1]
    assert results["grouped_lag"][1] == results["window_lag"][1]
    print("checksums identical across strategies — PROBE DONE")


def main() -> None:
    if sys.argv[1:2] == ["grouped"]:
        grouped_mode(hot="hot" in sys.argv[2:])
        return
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_session(app_name=f"twopass-100x-{n_buckets}")
    spark.sparkContext.setLogLevel("WARN")

    if not os.path.exists(os.path.join(ORDERS_100X, "_SUCCESS")):
        t0 = time.time()
        base = load_table(spark, "/root/testdata/sf0.1", "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        copies = spark.range(100).select(F.col("id").alias("copy"))
        (
            base.crossJoin(copies)
            .select(
                (F.col("o_orderkey") + F.col("copy") * F.lit(10_000_000_000))
                .alias("o_orderkey"),
                (F.col("o_custkey") + F.col("copy") * F.lit(10_000_000_000))
                .alias("o_custkey"),
                "o_totalprice",
            )
            .write.mode("overwrite")
            .parquet(ORDERS_100X)
        )
        print(f"built 100x orders in {time.time()-t0:.1f}s")

    df = spark.read.parquet(ORDERS_100X)
    n = df.count()
    print(f"rows: {n}  n_buckets: {n_buckets}")

    order = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]

    # --- distributed_row_number: wall + per-bucket skew ---------------
    t0 = time.time()
    rn = distributed_row_number(df, order, "rn", n_buckets=n_buckets)
    out = rn.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rn").alias("max_rn"),
        F.sum(F.hash("rn", "o_orderkey").cast("bigint")).alias("chk"),
    ).collect()[0]
    drn_wall = time.time() - t0
    assert out.n == n and out.max_rn == n, out
    # skew of the range buckets (re-derive the same bucketing)
    sizes = [
        r.c
        for r in df.repartitionByRange(n_buckets, *order)
        .groupBy(F.spark_partition_id().alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    # skew vs the EVEN SHARE (n / n_buckets requested) — dividing by the
    # non-empty bucket count would understate skew when ranges are
    # sparse and some buckets are empty (r9 review)
    skew = max(sizes) / (n / n_buckets)
    print(
        f"distributed_row_number: wall={drn_wall:.1f}s "
        f"buckets={len(sizes)}/{n_buckets} max/even-share={skew:.2f} "
        f"chk={out.chk}"
    )
    release_hubs()
    spark.catalog.clearCache()

    # --- global_doubled_midrank_map: distinct-value table ranks -------
    t0 = time.time()
    mm = global_doubled_midrank_map(
        df.select(F.col("o_totalprice").alias("v")), "v", n_buckets=n_buckets
    )
    stats = mm.agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("t").alias("sum_t"),
        F.max("r2").alias("max_r2"),
    ).collect()[0]
    mid_wall = time.time() - t0
    assert stats.sum_t == n, stats
    print(
        f"global_doubled_midrank_map: wall={mid_wall:.1f}s "
        f"distinct={stats.nv} max_r2={stats.max_r2}"
    )
    print("PROBE DONE")


if __name__ == "__main__":
    main()

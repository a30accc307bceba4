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


def main() -> None:
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

#!/usr/bin/env python
"""Pagerank 100x-regime probe (r7 verdict task 7): rebuild the 100x
co-purchase graph (sf0.1 edges replicated 100x with DISJOINT node-id
shifts — same disjoint-key methodology as the round-7 part-3 probes:
exactly 100x edges, 100x nodes, identical per-copy topology) and run
pagerank_unrolled under both edge-checkpoint storage levels. The r7 run
completed in 205s but logged GCLocker retry storms — the checkpointed
edge blocks pin the heap. The DISK_ONLY lever should trade one
edge re-read per round for a quiet heap.

Run: python scripts/probe_pagerank_100x.py [memory|disk]
(one mode per JVM — same-JVM back-to-back runs share heap history and
would contaminate the GC comparison). GC warnings go to stderr; the
wrapper greps them.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usedcars_bigdata_spark.operators.graph import pagerank_unrolled
from usedcars_bigdata_spark.session import get_session
from usedcars_bigdata_spark.sources import load_table

EDGES_100X = "/tmp/probe_pagerank_edges_100x"


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "memory"
    # Optional second arg: shuffle partitions for the 100x regime. The
    # GCLocker retry storms trace to humongous G1 allocations from
    # per-task hash-agg pages (240M edges / 32 partitions = 7.5M-edge
    # tasks); more, smaller partitions shrink the pages below the
    # humongous threshold — the same sizing rule the session docstring
    # prescribes for 100 TB.
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_session(
        app_name=f"pagerank-100x-{mode}", shuffle_partitions=parts
    )
    spark.sparkContext.setLogLevel("WARN")

    if not os.path.exists(os.path.join(EDGES_100X, "_SUCCESS")):
        t0 = time.time()
        items = (
            load_table(spark, "/root/testdata/sf0.1", "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        base = (
            items.alias("a")
            .join(
                items.alias("b"),
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") != F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"),
            )
        )
        shift = int(
            items.agg(F.max("l_partkey")).first()[0]
        ) + 1
        copies = spark.range(100).select(F.col("id").alias("c"))
        (
            base.crossJoin(copies)
            .select(
                (F.col("src") + F.col("c") * shift).alias("src"),
                (F.col("dst") + F.col("c") * shift).alias("dst"),
            )
            .write.mode("overwrite")
            .parquet(EDGES_100X)
        )
        print(f"built 100x edges in {time.time() - t0:.1f}s", flush=True)

    edges = spark.read.parquet(EDGES_100X)
    n_edges = edges.count()
    t0 = time.time()
    n = pagerank_unrolled(
        edges, "src", "dst", edge_storage=mode
    ).count()
    dt = time.time() - t0
    print(
        f"RESULT mode={mode} parts={parts} edges={n_edges:,} nodes_out={n:,} wall={dt:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()

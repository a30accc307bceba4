#!/usr/bin/env python
"""Scale probe: generate a lineitem-shaped table N× larger than sf0.1
(in /tmp, deterministic, in-plan generation) and measure the headline
scan/agg/join/window queries on it. Evidence for the 100 TB design claim:
runtimes should grow ~linearly with rows (scan-bound) while plans stay
identical — no operator should blow up super-linearly.

Run: python scripts/scale_probe.py [rows_millions=6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from usedcars_bigdata_spark.operators.window import top_k_per_group
from usedcars_bigdata_spark.session import get_session


def gen_lineitem(spark, n_rows: int, path: str) -> None:
    h = lambda s: F.abs(F.xxhash64(F.lit(s), F.col("id")))  # noqa: E731
    df = spark.range(n_rows).select(
        (F.col("id") % 1_500_000).alias("l_orderkey"),
        (h("pk") % 200_000).alias("l_partkey"),
        (h("sk") % 10_000).alias("l_suppkey"),
        (h("ln") % 7).cast("int").alias("l_linenumber"),
        (1 + (h("qty") % 50)).cast("double").alias("l_quantity"),
        (1000 + (h("px") % 100_000) / 1.0).alias("l_extendedprice"),
        ((h("disc") % 11) / 100.0).alias("l_discount"),
        ((h("tax") % 9) / 100.0).alias("l_tax"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")), (h("rf") % 3 + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("O"), F.lit("F")), (h("ls") % 2 + 1).cast("int")).alias("l_linestatus"),
        F.timestamp_seconds(F.lit(788_918_400) + (h("sd") % 220_000_000)).alias("l_shipdate"),
    )
    df.write.mode("overwrite").parquet(path)


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time() - t0:.2f}s ({out})")


def main() -> None:
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    n = int(millions * 1_000_000)
    path = f"/tmp/scale_probe_lineitem_{n}"
    spark = get_session(app_name="scale-probe")
    if not os.path.exists(path):
        t0 = time.time()
        gen_lineitem(spark, n, path)
        print(f"generated {n:,} rows in {time.time() - t0:.1f}s → {path}")
    li = spark.read.parquet(path)
    print(f"probe at {n:,} rows ({millions}M; sf0.1 is 0.6M):")

    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    timed("tpch_q1 scan+agg", lambda: (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(disc), F.avg("l_discount"), F.count("*"))
        .count()
    ))
    timed("group+topk revenue", lambda: (
        li.groupBy("l_partkey").agg(F.sum(disc).alias("rev"))
        .orderBy(F.col("rev").desc(), "l_partkey").limit(10).count()
    ))
    timed("window rank/group", lambda: (
        top_k_per_group(
            li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
            ["l_returnflag"],
            [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
            3,
        ).count()
    ))
    timed("distinct orders", lambda: (
        li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey")).count()
    ))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dedup-stack scale probe: generate a documents-shaped corpus N× larger
than sf0.1 (deterministic, with planted near-duplicates at a realistic
~10% dup rate) and measure the MinHash/LSH near-dup path and the
LSH-fed clustering end-to-end. Evidence for the 100 TB design claim:
runtime should track the corpus (shingle volume + candidate count)
~linearly — the quadratic exact-Jaccard tier is exactly what this path
avoids, so no super-linear blowup should appear as N grows.

Run: python scripts/scale_probe_dedup.py [n_docs=200000] [n_docs_2=400000]
Prints per-stage timings at both sizes; the ratio between sizes is the
headline (≈2× data → ≈2× time = linear).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext import dedup as D
from usedcars_bigdata_spark.session import get_session


def gen_documents(spark, n_docs: int, path: str) -> None:
    """~30-word docs from a power-law vocabulary; every 10th doc is a
    near-duplicate of its predecessor (same words, one token edited)."""
    h = lambda s: F.abs(F.xxhash64(F.lit(s), F.col("base_id"), F.col("w")))  # noqa: E731
    base = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            # dup group: every 10th doc reuses the previous doc's base text
            F.when(F.col("id") % 10 == 9, F.col("id") - 1)
            .otherwise(F.col("id"))
            .alias("base_id"),
            (F.col("id") % 10 == 9).alias("is_dup"),
        )
        .select("doc_id", "base_id", "is_dup", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("w"))
        # power-law-ish vocab: common words (small ids) appear often
        .withColumn("tok", F.concat(F.lit("w"), (h("v") % (h("z") % 5000 + 50)).cast("string")))
        # the dup gets one token edited so jaccard ≈ 0.87, not 1.0
        .withColumn(
            "tok",
            F.when(F.col("is_dup") & (F.col("w") == 3), F.lit("EDITED")).otherwise(F.col("tok")),
        )
    )
    docs = base.groupBy("doc_id").agg(F.concat_ws(" ", F.collect_list("tok")).alias("text"))
    docs.write.mode("overwrite").parquet(path)


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s ({out})")
    return dt


def probe(spark, n_docs: int) -> dict:
    path = f"/tmp/scale_probe_docs_{n_docs}"
    if not os.path.exists(path):
        t0 = time.time()
        gen_documents(spark, n_docs, path)
        print(f"generated {n_docs:,} docs in {time.time() - t0:.1f}s → {path}")
    docs = spark.read.parquet(path)
    # JIT/codegen warmup: run the same plan shapes on a small slice first,
    # otherwise the measured run pays one-time whole-stage-codegen and JIT
    # compilation (~2× inflation observed on the first large run).
    warm = docs.limit(max(1000, n_docs // 20))
    D.exact_dedup_stats(warm, "doc_id", "text").count()
    D.minhash_near_dupes(warm, "doc_id", "text", threshold=0.5).count()
    D.near_dup_clusters(warm, "doc_id", "text", threshold=0.5).count()
    D.duplicated_gram_fraction(warm, "doc_id", "text").count()
    spark.catalog.clearCache()
    print(f"probe at {n_docs:,} docs (sf0.1 is 5k):")
    out = {}
    out["exact_dedup"] = timed(
        "exact dedup stats", lambda: D.exact_dedup_stats(docs, "doc_id", "text").count()
    )
    out["minhash"] = timed(
        "minhash+LSH near-dupes (τ=0.5)",
        lambda: D.minhash_near_dupes(docs, "doc_id", "text", threshold=0.5).count(),
    )
    out["clusters"] = timed(
        "LSH-fed clustering",
        lambda: D.near_dup_clusters(docs, "doc_id", "text", threshold=0.5)
        .filter("is_canonical").count(),
    )
    out["dup_gram_fraction"] = timed(
        "dup-gram fraction (corpus-global df)",
        lambda: D.duplicated_gram_fraction(docs, "doc_id", "text").count(),
    )
    return out


def main() -> None:
    # One size per JVM: measured same-JVM back-to-back runs are dominated
    # by heap growth/GC from the FIRST size (a 200k-then-400k sequence
    # showed 3-5× "super-linear" times that vanish entirely in a fresh
    # session — 10.8s vs 16.3s, i.e. ~1.5× time for 2× data). The --pair
    # mode subprocesses each size for honest isolation.
    if sys.argv[1:2] == ["--pair"]:
        import json
        import subprocess

        n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
        n2 = int(sys.argv[3]) if len(sys.argv) > 3 else 2 * n1
        results = {}
        for n in (n1, n2):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(n), "--json"],
                capture_output=True, text=True, check=True,
            ).stdout
            results[n] = json.loads(out.strip().splitlines()[-1])
            for k, v in results[n].items():
                print(f"  n={n:,} {k}: {v:.2f}s")
        print(f"scaling ratios ({n2 / n1:.0f}× data, isolated JVMs):")
        for k in results[n1]:
            print(f"  {k}: {results[n2][k] / max(results[n1][k], 1e-9):.2f}× time")
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_session(app_name="scale-probe-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    r = probe(spark, n)
    if "--json" in sys.argv:
        import json

        print(json.dumps(r))


if __name__ == "__main__":
    main()

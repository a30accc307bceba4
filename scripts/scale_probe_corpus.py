#!/usr/bin/env python
"""Scale probe for the round-3 corpus operators: inverted index, TF-IDF
top terms, sliding-window chunking, weighted sampling, per-group quota
cap, and char entropy. Same methodology as scale_probe_dedup.py — each
size in its OWN JVM (same-JVM back-to-back runs inflate the second size
via heap growth/GC), with an unrecorded small-slice warmup for
JIT/codegen.

Expected shapes: chunking/entropy/weighted-sample are shuffle-free or
top-k (linear in input bytes); inverted index and TF-IDF shuffle
(token, doc)-grained rows with map-side combines (near-linear in total
tokens); the quota cap is one rank-window shuffle on the group key.

Run: python scripts/scale_probe_corpus.py --pair 200000 800000
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext import text as TX
from usedcars_bigdata_spark.session import get_session
from scripts.scale_probe_dedup import gen_documents


def timed(label: str, fn) -> float:
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
        print(f"generated {n_docs:,} docs in {time.time() - t0:.1f}s -> {path}")
    docs = spark.read.parquet(path).withColumn(
        # a source/domain-like group column (20 groups) for the quota cap
        "grp", (F.col("doc_id") % 20).cast("string")
    ).withColumn("w8", (F.length("text")).cast("double"))
    warm = docs.limit(max(1000, n_docs // 20))
    TX.inverted_index(warm, "doc_id", "text", postings_cap=10, min_docs=2).count()
    TX.tfidf_top_terms(warm, "doc_id", "text", k=3).count()
    TX.chunk_documents(warm, "doc_id", "text").count()
    TX.weighted_sample(warm, "doc_id", "w8", k=100).count()
    TX.group_cap_sample(warm, "doc_id", "grp", cap=100).count()
    TX.char_entropy(warm, "doc_id", "text").count()
    spark.catalog.clearCache()
    print(f"probe at {n_docs:,} docs:")
    out = {}
    out["inverted_index"] = timed(
        "inverted index (cap 10, min_docs 2)",
        lambda: TX.inverted_index(docs, "doc_id", "text", postings_cap=10, min_docs=2).count(),
    )
    out["tfidf_topk"] = timed(
        "tf-idf top-3 terms",
        lambda: TX.tfidf_top_terms(docs, "doc_id", "text", k=3).count(),
    )
    out["chunking"] = timed(
        "chunk 64/48",
        lambda: TX.chunk_documents(docs, "doc_id", "text").count(),
    )
    out["weighted_sample"] = timed(
        "weighted sample k=100",
        lambda: TX.weighted_sample(docs, "doc_id", "w8", k=100).count(),
    )
    out["group_cap"] = timed(
        "group quota cap 100",
        lambda: TX.group_cap_sample(docs, "doc_id", "grp", cap=100).count(),
    )
    out["char_entropy"] = timed(
        "char entropy",
        lambda: TX.char_entropy(docs, "doc_id", "text").count(),
    )
    # round-4 additions: prefix-bucketed edit distance (candidate count
    # tracks bucket collisions, not n²) and overlap-coefficient pairs
    # (same inverted-index join as the jaccard tier)
    from usedcars_bigdata_spark.ext import dedup as X

    X.edit_distance_pairs(warm, "doc_id", "text", max_dist=40).count()
    out["edit_distance"] = timed(
        "edit-distance pairs (prefix-2, d<=40)",
        lambda: X.edit_distance_pairs(docs, "doc_id", "text", max_dist=40).count(),
    )
    sh_warm = X.word_shingles(warm, "doc_id", "text", n=3, hashed=True)
    X.overlap_pairs(sh_warm, "doc_id", threshold=0.8).count()
    out["overlap_pairs"] = timed(
        "overlap pairs (tau 0.8)",
        lambda: X.overlap_pairs(
            X.word_shingles(docs, "doc_id", "text", n=3, hashed=True),
            "doc_id",
            threshold=0.8,
        ).count(),
    )
    # span-level exact-substring surface: doc-partitioned windows + gram
    # df joins — expected near-linear in total grams
    X.duplicated_spans(warm, "doc_id", "text").count()
    out["dup_spans"] = timed(
        "duplicated spans (n=5)",
        lambda: X.duplicated_spans(docs, "doc_id", "text").count(),
    )
    X.remove_duplicated_spans(warm, "doc_id", "text").count()
    out["remove_dup_spans"] = timed(
        "remove duplicated spans (n=5)",
        lambda: X.remove_duplicated_spans(docs, "doc_id", "text").count(),
    )
    TX.line_dedup(warm, "doc_id", "text", sep=" ").count()
    out["line_dedup"] = timed(
        "line dedup (space-sep lines)",
        lambda: TX.line_dedup(docs, "doc_id", "text", sep=" ").count(),
    )
    return out


def main() -> None:
    if sys.argv[1:2] == ["--pair"]:
        import json
        import subprocess

        n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
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
        print(f"scaling ratios ({n2 / n1:.0f}x data, isolated JVMs):")
        for k in results[n1]:
            print(f"  {k}: {results[n2][k] / max(results[n1][k], 1e-9):.2f}x time")
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_session(app_name="scale-probe-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    r = probe(spark, n)
    if "--json" in sys.argv:
        import json

        print(json.dumps(r))


if __name__ == "__main__":
    main()

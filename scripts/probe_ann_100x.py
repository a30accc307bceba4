#!/usr/bin/env python
"""ANN tier at 10×/100× harness scale (closes the last family whose
SCALING.md evidence was sf0.1-only — the round-3 ANN bench measured 2k
vectors).

Corpus: Spark-native clustered embeddings (64-d, 64 well-separated
centroids + small per-dim noise, all pure column expressions — no
driver-side generation, the fixtures.py idiom), at 20k (10×) and 200k
(100×) of the sf0.1 embeddings table. 50 fixed queries drawn from the
corpus.

Measured per size, one JVM per size (``--pair``):
- brute-force cosine top-10 (the exact baseline AND the ground truth);
- hyperplane LSH top-10 (bits sized up with the corpus: selectivity
  ~N/2^bits per table must grow with N or the candidate set degenerates
  to a corpus scan — the docstring's sizing rule, exercised here);
- IVF top-10 (n_centroids ~ sqrt(N) per the FAISS-practice rule in
  docs/SCALING.md, n_probe=8; quantizer trained on the capped
  representative sample, so index-build cost is CONSTANT in N).

Reported: wall per tier, recall@10 of each approximate tier vs brute.
The scale claims under test: (a) brute wall tracks N (it is the
O(N·Q) tier you leave at scale); (b) LSH/IVF walls grow SUB-linearly
when sized per their rules; (c) recall holds at 100× (clustered
geometry — the structure ANN assumes).

Run: python scripts/probe_ann_100x.py --pair
     python scripts/probe_ann_100x.py 200000 --json
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext import similarity as SIM
from usedcars_bigdata_spark.session import get_session

DIM = 64
N_CLUSTERS = 64
K = 10
N_QUERIES = 50


def gen_embeddings(spark, n: int, path: str) -> None:
    """label = id % N_CLUSTERS; dim d value = centroid(label, d) + noise.
    Centroid coords in [-1, 1] from xxhash64(label, d); noise ±0.05 from
    xxhash64(id, d) — fully deterministic, content independent of
    partitioning."""
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % N_CLUSTERS).cast("int").alias("label"),
    )
    dims = []
    for d in range(DIM):
        cent = (
            F.pmod(F.xxhash64(F.lit("cent"), F.col("label"), F.lit(d)), F.lit(2001))
            / 1000.0
            - 1.0
        )
        # ±0.4 per-dim noise: clusters stay well separated (inter-centroid
        # L2 ≈ 6.5 in 64-d vs noise norm ≈ 1.85) while WITHIN-cluster
        # neighbor ordering carries enough signal to exceed PQ's
        # quantization error. The first cut used ±0.05 and IVFPQ recall
        # collapsed to refine·k/cluster_size — not a code defect but the
        # PQ resolution floor: when within-cluster variation is far below
        # quantization error, ADC distances tie across the whole cell and
        # the rerank set is an arbitrary sample (see SCALING.md).
        noise = (
            F.pmod(F.xxhash64(F.lit("noise"), F.col("vec_id"), F.lit(d)), F.lit(801))
            / 1000.0
            - 0.4
        )
        dims.append((cent + noise).cast("float"))
    df.select(
        "vec_id", "label", F.array(*dims).alias("embedding")
    ).write.mode("overwrite").parquet(path)


def recall_at_k(got_df, truth_df) -> float:
    got = {}
    for r in got_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    truth = {}
    for r in truth_df.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    return round(hits / total, 4) if total else 0.0


def timed_min(build, reps: int = 2):
    """One UNRECORDED warmup execution (JIT + whole-stage codegen —
    measured 2-5× on these tiers; the scale_probe_dedup.py lesson), then
    min-of-reps timed executions. Each rep unpersists its result BEFORE
    the next build: a rebuilt identical plan otherwise hits Spark's
    CacheManager via plan canonicalization and the 'rep' times a count
    over ~500 cached rows (measured: 200k brute 'ran' in 1.19s that way —
    faster than 20k — before this blocking unpersist was added).
    Returns (min_seconds, last_result_df persisted)."""
    build().count()  # warmup, unrecorded (not persisted — no cache trap)
    best, df = None, None
    for i in range(reps):
        t0 = time.time()
        df = build().persist()
        df.count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if i < reps - 1:
            df.unpersist(blocking=True)
    return round(best, 2), df


def probe(spark, n: int) -> dict:
    path = f"/tmp/probe_ann_emb_{n}"
    if not os.path.exists(path):
        gen_embeddings(spark, n, path)
    corpus = spark.read.parquet(path).persist()
    corpus.count()
    queries = corpus.filter(
        F.col("vec_id") % (n // N_QUERIES) == 0
    ).limit(N_QUERIES).persist()
    queries.count()

    out: dict = {"n": n}
    # sizing rules under test (see module docstring)
    bits = max(4, int(math.log2(n / 500)))
    n_centroids = max(16, int(math.sqrt(n)))

    out["brute_s"], truth = timed_min(
        lambda: SIM.brute_force_topk(corpus, queries, k=K)
    )
    assert truth.count() == N_QUERIES * K

    out["lsh_s"], lsh = timed_min(
        lambda: SIM.hyperplane_lsh_topk(corpus, queries, k=K, bits=bits, tables=8)
    )
    out["lsh_bits"] = bits
    out["lsh_recall"] = recall_at_k(lsh, truth)

    out["ivf_s"], ivf = timed_min(
        lambda: SIM.ivf_topk(corpus, queries, k=K, n_centroids=n_centroids, n_probe=8)
    )
    out["ivf_centroids"] = n_centroids
    out["ivf_recall"] = recall_at_k(ivf, truth)

    # IVFPQ at FAISS-shaped settings: 256-code byte codebooks over 8
    # subspaces — exercises the (now O(k·n·dim)) codebook fits at their
    # production size alongside the sqrt(N) coarse quantizer. refine is
    # left at the AUTO default (r11): the r10 run at fixed refine=4
    # measured recall@10 = 0.126 at 200k — the footgun _auto_refine
    # closes by sizing the rerank budget to the candidate pool.
    out["ivfpq_s"], ivfpq = timed_min(
        lambda: SIM.ivfpq_topk(
            corpus, queries, k=K, n_centroids=n_centroids, n_probe=8,
            m_subspaces=8, n_codes=256,
        )
    )
    out["ivfpq_recall"] = recall_at_k(ivfpq, truth)
    return out


def main() -> None:
    if sys.argv[1:2] == ["--pair"]:
        import subprocess

        results = {}
        for n in (20_000, 200_000):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(n), "--json"],
                capture_output=True, text=True, check=True,
            )
            results[n] = json.loads(proc.stdout.strip().splitlines()[-1])
            print(n, json.dumps(results[n]))
        for tier in ("brute_s", "lsh_s", "ivf_s", "ivfpq_s"):
            r = results[200_000][tier] / max(results[20_000][tier], 1e-9)
            print(f"10x->100x wall ratio {tier}: {r:.2f}x (10x data; linear = 10x)")
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_session(app_name="probe-ann-100x")
    spark.sparkContext.setLogLevel("ERROR")
    r = probe(spark, n)
    print(json.dumps(r) if "--json" in sys.argv else json.dumps(r, indent=2))


if __name__ == "__main__":
    main()

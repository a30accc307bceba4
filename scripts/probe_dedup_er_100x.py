#!/usr/bin/env python
"""Dedup/ER tier at 100× harness scale (VERDICT r9 task 4).

The sf0.1 harness runs the banded-MinHash near-dup path on 5k documents
and the blocked-ER path on ~20k part-shaped records; the 100 TB design
claim rests on (a) candidate volume tracking true duplicates — bucket /
block sizes staying bounded as the corpus grows — and (b) the
``max_bucket`` / ``max_block`` circuit breakers actually catching the
degenerate keys that would otherwise go quadratic. This probe measures
both families at 10× and 100× with PLANTED degenerate keys:

- LSH tier: 50k and 500k docs (10×/100× of the sf0.1 documents table),
  ~10% planted near-dups, PLUS one degenerate content class (2k
  byte-identical docs at 100×) that lands in one LSH bucket per band —
  the probe asserts the cap drops it and reports the bucket-size
  distribution (p50/p90/p99/max) of what remains.
- ER tier: 200k and 2M records (10×/100× of the part table) with a
  selective 2-column blocking key (avg block ≈ 6 rows), PLUS one
  non-selective block of 20k rows (C(20k,2) ≈ 200M pairs if uncapped) —
  the probe asserts the max_block breaker drops exactly that block and
  reports the block-size distribution and the Σ C(|block|,2) candidate
  budget actually paid.

One size per JVM (``--pair`` subprocesses each size) per the
scale_probe_dedup.py finding that same-JVM back-to-back runs read 3-5×
super-linear purely from heap growth/GC.

Run: python scripts/probe_dedup_er_100x.py --pair          # both tiers, both sizes
     python scripts/probe_dedup_er_100x.py 500000 --json   # one LSH size
     python scripts/probe_dedup_er_100x.py --er 2000000 --json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext import dedup as D
from usedcars_bigdata_spark.session import get_session
from scripts.scale_probe_dedup import gen_documents


def _dist(sizes_df, col):
    """size-distribution summary of a bucket/block-cardinality frame."""
    q = sizes_df.approxQuantile(col, [0.5, 0.9, 0.99], 0.001)
    mx = sizes_df.agg(F.max(col)).first()[0]
    return {"p50": q[0], "p90": q[1], "p99": q[2], "max": mx}


def probe_lsh(spark, n_docs: int, max_bucket: int = 500) -> dict:
    path = f"/tmp/probe_lsh_docs_{n_docs}"
    if not os.path.exists(path):
        gen_documents(spark, n_docs, path)
    docs = spark.read.parquet(path)
    # Degenerate content class: 0.4% of docs replaced by ONE byte-identical
    # text — every band maps them to a single bucket, C(n_hot, 2) pairs if
    # the cap does not catch it.
    # always strictly above the cap, so the breaker fires at BOTH sizes
    n_hot = max(2 * max_bucket, n_docs // 250)
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") < n_hot,
            F.lit("hot degenerate boilerplate page about nothing repeated verbatim"),
        ).otherwise(F.col("text")),
    )
    out: dict = {"n_docs": n_docs, "n_hot": n_hot}
    # warmup on a slice (JIT/codegen — scale_probe_dedup.py precedent)
    D.minhash_near_dupes(
        docs.limit(max(1000, n_docs // 20)), "doc_id", "text", threshold=0.5,
        max_bucket=max_bucket,
    ).count()
    spark.catalog.clearCache()

    t0 = time.time()
    n_pairs = D.minhash_near_dupes(
        docs, "doc_id", "text", threshold=0.5, max_bucket=max_bucket
    ).count()
    out["minhash_capped_s"] = round(time.time() - t0, 2)
    out["n_pairs"] = n_pairs

    # Bucket audit: the hot class must be DROPPED by the cap, and the
    # surviving bucket-size distribution must stay flat.
    sigs = D.minhash_signatures(
        D.word_shingles(docs, "doc_id", "text", n=3), "doc_id"
    )
    stats = D.lsh_bucket_stats(sigs, "doc_id", max_bucket=max_bucket).collect()
    out["bands"] = [
        {k: r[k] for k in ("n_buckets", "n_skipped_buckets", "max_bucket_size")}
        for r in stats
    ]
    assert all(r["n_skipped_buckets"] >= 1 for r in stats), (
        "planted degenerate bucket was NOT caught by max_bucket in every band"
    )
    assert all(r["max_bucket_size"] >= n_hot for r in stats)
    sizes = (
        D.band_keys(sigs, "doc_id", bands=4)
        .groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .filter(F.col("n") <= max_bucket)  # the distribution the engine pays for
    )
    out["kept_bucket_sizes"] = _dist(sizes, "n")
    return out


def gen_records(spark, n: int, path: str, hot_rows: int) -> None:
    """part-shaped records: (rid, brand, line, name). brand×line is the
    blocking key — cardinality n/6 (avg block ≈ 6) — except ONE hot key
    ('HOT','HOT') holding ``hot_rows`` rows. Names are short strings with
    planted 1-edit variants inside blocks."""
    h = lambda s: F.abs(F.xxhash64(F.lit(s), F.col("id")))  # noqa: E731
    # (brand, line) combos ≈ n/6 → avg kept block ≈ 6 rows (Poisson-ish)
    n_brands = max(1, n // 42)
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") < hot_rows, F.lit("HOT"))
        .otherwise(F.concat(F.lit("b"), (h("brand") % n_brands).cast("string")))
        .alias("brand"),
        F.when(F.col("id") < hot_rows, F.lit("HOT"))
        .otherwise(F.concat(F.lit("l"), (h("line") % 7).cast("string")))
        .alias("line"),
        # ~17% of rows are a 1-char variant of the block's base name
        F.concat(
            F.lit("name-"),
            (h("brand") % n_brands).cast("string"),
            F.lit("-"),
            F.when(F.col("id") % 6 == 5, F.lit("x")).otherwise(
                (h("suffix") % 3).cast("string")
            ),
        ).alias("name"),
    )
    df.write.mode("overwrite").parquet(path)


def probe_er(spark, n: int, max_block: int = 1000) -> dict:
    hot_rows = 20_000 if n >= 1_000_000 else 2_000
    path = f"/tmp/probe_er_recs_{n}"
    if not os.path.exists(path):
        gen_records(spark, n, path, hot_rows)
    recs = spark.read.parquet(path)
    out: dict = {"n_records": n, "hot_rows": hot_rows}
    # warmup
    D.blocked_er_pairs(
        recs.limit(max(1000, n // 20)), "rid", "name", ["brand", "line"],
        max_dist=2, max_block=max_block,
    ).count()
    spark.catalog.clearCache()

    stats = D.er_block_stats(recs, ["brand", "line"], max_block=max_block).first()
    out["blocks"] = {
        k: stats[k]
        for k in (
            "n_blocks", "n_dropped_blocks", "n_dropped_rows",
            "max_block_size", "n_candidate_pairs",
        )
    }
    assert stats["n_dropped_blocks"] == 1, "exactly the planted hot block drops"
    assert stats["n_dropped_rows"] == hot_rows
    assert stats["max_block_size"] == hot_rows
    sizes = (
        recs.groupBy("brand", "line")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= max_block)
    )
    out["kept_block_sizes"] = _dist(sizes, "n")

    t0 = time.time()
    out["n_pairs"] = D.blocked_er_pairs(
        recs, "rid", "name", ["brand", "line"], max_dist=2, max_block=max_block
    ).count()
    out["blocked_er_s"] = round(time.time() - t0, 2)
    return out


def probe_em(spark, n: int, max_block: int = 1000) -> dict:
    """Fellegi–Sunter EM at scale (r11 verdict #7): the sufficient-
    statistics claim — EM cost independent of corpus size because the
    pair set collapses to a ≤2^J-row agreement-pattern table — executed
    at 10×/100× planted-duplicate loads on the probe_er fixture (same
    planted 1-edit variants inside blocks, same planted hot block that
    max_block must drop). Reports the pattern-table row count (the bound
    is the CLAIM) and the wall of the full 5-round fit."""
    hot_rows = 20_000 if n >= 1_000_000 else 2_000
    path = f"/tmp/probe_er_recs_{n}"
    if not os.path.exists(path):
        gen_records(spark, n, path, hot_rows)
    # Within a block the fixture's names differ only in the last char, so
    # the EXACT name agreement is the bimodal field (same planted suffix
    # vs the 1-edit 'x' variants); two derived pseudo-independent fields
    # complete J = 3 → pattern table ≤ 8 rows whatever the corpus size.
    recs = (
        spark.read.parquet(path)
        .withColumn("ln", (F.col("rid") % 2).cast("string"))
        .withColumn("par", (F.col("rid") % 3).cast("string"))
    )
    out: dict = {"n_records": n, "hot_rows": hot_rows}
    fields = [("name", "exact"), ("ln", "exact"), ("par", "exact")]
    # warmup (JIT/codegen) on a slice
    D.fs_em_weights(
        recs.limit(max(1000, n // 20)), "rid", ["brand", "line"], fields,
        iterations=2, max_block=max_block,
    ).count()
    spark.catalog.clearCache()

    t0 = time.time()
    patt = D.fs_agreement_patterns(
        recs, "rid", ["brand", "line"], fields, max_block=max_block
    )
    rows = patt.collect()
    out["pattern_collapse_s"] = round(time.time() - t0, 2)
    out["pattern_rows"] = len(rows)
    out["n_pairs"] = int(sum(r["n"] for r in rows))
    assert len(rows) <= 2 ** len(fields), (
        f"pattern table exceeded sufficient-statistics bound: {len(rows)}"
    )

    t0 = time.time()
    fit = D.fs_em_weights(
        recs, "rid", ["brand", "line"], fields,
        iterations=5, max_block=max_block,
    ).collect()
    out["em_fit_s"] = round(time.time() - t0, 2)
    out["fitted"] = {r["field"]: (r["m"], r["u"]) for r in fit}
    # the edit-band name field must separate matches from non-matches
    m, u = out["fitted"]["name"]
    assert m > u, f"EM failed to separate m/u on the planted variants: {m} <= {u}"
    return out


def main() -> None:
    if sys.argv[1:2] == ["--pair"]:
        import subprocess

        results = {}
        for label, argv in (
            ("lsh_10x", ["50000"]),
            ("lsh_100x", ["500000"]),
            ("er_10x", ["--er", "200000"]),
            ("er_100x", ["--er", "2000000"]),
        ):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *argv, "--json"],
                capture_output=True, text=True, check=True,
            )
            results[label] = json.loads(proc.stdout.strip().splitlines()[-1])
            print(label, json.dumps(results[label]))
        lsh_ratio = results["lsh_100x"]["minhash_capped_s"] / max(
            results["lsh_10x"]["minhash_capped_s"], 1e-9
        )
        er_ratio = results["er_100x"]["blocked_er_s"] / max(
            results["er_10x"]["blocked_er_s"], 1e-9
        )
        print(f"10x->100x wall ratios (10× data each): lsh {lsh_ratio:.2f}×, "
              f"er {er_ratio:.2f}×  (linear = 10×)")
        return

    if sys.argv[1:2] == ["--er"]:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
        fn = lambda spark: probe_er(spark, n)  # noqa: E731
    elif sys.argv[1:2] == ["--em"]:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
        fn = lambda spark: probe_em(spark, n)  # noqa: E731
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
        fn = lambda spark: probe_lsh(spark, n)  # noqa: E731
    spark = get_session(app_name="probe-dedup-er-100x")
    spark.sparkContext.setLogLevel("ERROR")
    r = fn(spark)
    if "--json" in sys.argv:
        print(json.dumps(r))
    else:
        print(json.dumps(r, indent=2))


if __name__ == "__main__":
    main()

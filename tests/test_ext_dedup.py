"""Property tests for the hash-based dedup tiers (the rows-only queries):
MinHash/LSH recall against exact Jaccard, SimHash invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext import dedup as X
from usedcars_bigdata_spark.sources import load_table


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    """Synthetic corpus with planted near-duplicates: base docs + copies with
    small edits. Base vocabularies are DISJOINT per doc so the only
    near-dup pairs are the planted ones."""
    base = [
        " ".join(f"d{i}w{j}" for j in range(60)) for i in range(20)
    ]
    rows = []
    for i, text in enumerate(base):
        rows.append((2 * i, text))
        words = text.split()
        words[3] = "edited"
        rows.append((2 * i + 1, " ".join(words)))  # near-dup of 2*i
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "other text")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in X.exact_dedup(df, "doc_id", "text").collect())
    assert kept == [1, 3]


def test_jaccard_pairs_find_planted_dupes(near_dup_corpus):
    sh = X.word_shingles(near_dup_corpus, "doc_id", "text", n=3)
    pairs = X.jaccard_pairs(sh, "doc_id", threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    assert planted <= got, f"missing planted pairs: {planted - got}"


def test_minhash_lsh_recall(near_dup_corpus):
    """LSH candidates must recover most high-Jaccard pairs: planted pairs
    have J≈0.90 (57/63 shared trigrams), band-collision prob 1-(1-0.9^4)^4
    ≈ 0.98 → recall well above 0.85 except extreme binomial tails."""
    sh = X.word_shingles(near_dup_corpus, "doc_id", "text", n=3)
    exact = {
        (r["id_a"], r["id_b"])
        for r in X.jaccard_pairs(sh, "doc_id", threshold=0.8).collect()
    }
    assert exact, "fixture should contain high-similarity pairs"
    found = {
        (r["id_a"], r["id_b"])
        for r in X.minhash_near_dupes(
            near_dup_corpus, "doc_id", "text", threshold=0.8
        ).collect()
    }
    recall = len(exact & found) / len(exact)
    assert recall >= 0.85, f"LSH recall {recall:.2f} below 0.85"


def test_minhash_subset_of_exact(spark, sf_dir):
    """On real harness docs: LSH-verified pairs ⊆ exact pairs at the same τ."""
    docs = load_table(spark, sf_dir, "documents")
    sh = X.word_shingles(docs, "doc_id", "text", n=3)
    exact = {
        (r["id_a"], r["id_b"])
        for r in X.jaccard_pairs(sh, "doc_id", threshold=0.2).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in X.minhash_near_dupes(docs, "doc_id", "text", threshold=0.2).collect()
    }
    assert lsh <= exact


def test_simhash_invariants(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # identical
            (3, "alpha beta gamma delta epsilon zeta eta iota"),  # 1 token off
            (4, "completely different words entirely unrelated content here now"),
        ],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["simhash"] for r in X.simhash64(df, "doc_id", "text").collect()}
    assert fps[1] == fps[2]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fps[1], fps[3]) < ham(fps[1], fps[4])
    pairs = X.simhash_near_pairs(
        X.simhash64(df, "doc_id", "text"), "doc_id", max_hamming=0
    )
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(1, 2)}


def test_simhash_md5_chunks_match_python_reference(spark):
    """The md5-chunk tier must reproduce an independent Python
    bit-for-bit: per-token bits from int(md5[:15],16) / int(md5[15],16),
    signed sums, strict >0 threshold, little-endian 16-bit chunks."""
    import hashlib

    texts = {
        1: "alpha beta gamma delta",
        2: "alpha beta gamma delta",
        3: "one two three four five six",
    }

    def ref_chunks(text):
        sums = [0] * 64
        for tok in text.strip().split():
            hx = hashlib.md5(tok.encode()).hexdigest()
            h60, h4 = int(hx[:15], 16), int(hx[15], 16)
            for b in range(64):
                bit = (h60 >> b) & 1 if b < 60 else (h4 >> (b - 60)) & 1
                sums[b] += 1 if bit else -1
        return [
            sum((1 << k) for k in range(16) if sums[16 * j + k] > 0)
            for j in range(4)
        ]

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: [r["fp_c0"], r["fp_c1"], r["fp_c2"], r["fp_c3"]]
        for r in X.simhash64_md5_chunks(df, "doc_id", "text").collect()
    }
    for doc_id, text in texts.items():
        assert got[doc_id] == ref_chunks(text), doc_id
    assert got[1] == got[2]  # identical text -> identical fingerprint


def test_connected_components_semantics(spark):
    """Chain, cycle, and singleton components; labels = min reachable id."""
    ids = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter > 1 exercises iteration), cycle 5-6-7-5
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7)],
        "id_a long, id_b long",
    )
    comp = {
        r["doc_id"]: r["component"]
        for r in X.connected_components(ids, pairs, "doc_id").collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 8}


def test_near_dup_clusters_canonical_filter(near_dup_corpus):
    # exact pair graph: this test pins CLUSTERING semantics (every planted
    # pair must collapse), not LSH recall — the planted corpus is 20 pairs
    # at J≈0.90 where banded LSH deterministically drops ~2% of pairs.
    labeled = X.near_dup_clusters(
        near_dup_corpus, "doc_id", "text", threshold=0.5, use_minhash=False
    )
    rows = labeled.collect()
    assert len(rows) == near_dup_corpus.count()
    canon = [r["doc_id"] for r in rows if r["is_canonical"]]
    # every planted (2i, 2i+1) pair collapses to one canonical doc
    assert sorted(canon) == [2 * i for i in range(20)]


def test_minhash_signature_forms_agree(near_dup_corpus):
    """The zero-shuffle array-form signatures (kept for the spill regime)
    must produce EXACTLY the exploded-form signatures, including dropping
    empty-shingle docs."""
    from pyspark.sql import functions as F

    corpus = near_dup_corpus.unionByName(
        near_dup_corpus.sparkSession.createDataFrame(
            [(999, "one two")], "doc_id long, text string"  # < n words → no shingles
        )
    )
    exploded = X.minhash_signatures(
        X.word_shingles(corpus, "doc_id", "text", n=3), "doc_id"
    )
    arrayed = X.minhash_signatures_from_arrays(
        X.shingle_arrays(corpus, "doc_id", "text", n=3), "doc_id"
    )
    cols = exploded.columns
    a = sorted(tuple(r[c] for c in cols) for r in exploded.collect())
    b = sorted(tuple(r[c] for c in cols) for r in arrayed.collect())
    assert a == b
    assert not any(r[0] == 999 for r in a)  # short doc dropped by both


def test_connected_components_nonconvergence_raises(spark):
    """A chain longer than max_iters' reach must raise loudly, not return
    silently split components."""
    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        X.connected_components(ids, chain, "doc_id", max_iters=2)
    # and with enough iterations the same chain collapses to one component
    comp = {
        r["doc_id"]: r["component"]
        for r in X.connected_components(ids, chain, "doc_id", max_iters=n).collect()
    }
    assert set(comp.values()) == {0}


def test_cluster_paths_agree_minhash_vs_exact(spark, sf_dir):
    """The default LSH-fed cluster graph must produce the SAME component
    assignment as the exact-Jaccard graph on the harness corpus (pairs are
    bimodal: every exact pair sits at jaccard >= 0.8, where banded-LSH
    recall is 1.0 — this is the equivalence the ext_dedup_clusters oracle
    relies on)."""
    from usedcars_bigdata_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    fast = X.near_dup_clusters(docs, "doc_id", "text", n=3, threshold=0.2)
    exact = X.near_dup_clusters(
        docs, "doc_id", "text", n=3, threshold=0.2, use_minhash=False
    )
    assert fast.subtract(exact).count() == 0
    assert exact.subtract(fast).count() == 0


def test_hot_bucket_cap_bounds_candidates_and_audits(spark):
    """Adversarial near-constant corpus: 120 copies of one text share every
    LSH bucket. With the cap they'd pair up |bucket|² — the cap must skip
    those buckets and bound the candidate count, and the standalone
    lsh_bucket_stats audit must report every skip (the in-plan observation
    can be lost to AQE empty-relation propagation exactly when the result
    is empty, which is why the standalone audit exists)."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(120)]
    rows += [(1000 + i, " ".join(f"u{i}w{j}" for j in range(12))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = X.minhash_near_dupes(df, "doc_id", "text", threshold=0.5, max_bucket=50)
    # identical docs all hash to the same (band, sig) per band -> every
    # bucket is hot -> skipped -> no quadratic fanout survives the cap
    assert capped.count() == 0

    sh = X.word_shingles(df, "doc_id", "text", n=3)
    stats = X.lsh_bucket_stats(
        X.minhash_signatures(sh, "doc_id"), "doc_id", max_bucket=50
    ).collect()
    assert len(stats) == 4  # one audit row per band
    for r in stats:
        assert r["n_skipped_buckets"] >= 1
        assert r["max_bucket_size"] == 120

    # uncapped form still finds the 120-choose-2 identical pairs
    uncapped = X.minhash_near_dupes(df, "doc_id", "text", threshold=0.5, max_bucket=None)
    assert uncapped.count() == 120 * 119 // 2


def test_lsh_audit_zero_on_empty_buckets_not_null(spark):
    """r9 ADVICE: with NO bucket holding >= 2 ids, F.sum over the empty
    buckets frame yielded NULL for n_skipped_buckets / max_bucket_size
    instead of the documented 'identically 0'. AQE is disabled for the
    assertion: its empty-relation propagation may eliminate the
    CollectMetrics node entirely (documented caveat), which would block
    Observation.get forever rather than exercise the coalesce."""
    from pyspark.sql import Observation

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        obs = Observation()
        pairs = X.minhash_near_dupes(df, "doc_id", "text", threshold=0.5, audit=obs)
        assert pairs.count() == 0
        m = obs.get
        assert m["n_buckets"] == 0
        assert m["n_skipped_buckets"] == 0, "must be 0, not NULL, on empty buckets"
        assert m["max_bucket_size"] == 0, "must be 0, not NULL, on empty buckets"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_hot_bucket_observation_populated_when_pairs_survive(near_dup_corpus):
    """On a realistic corpus (candidates survive the cap) the zero-cost
    in-plan observation carries the audit numbers with no extra job."""
    from pyspark.sql import Observation

    obs = Observation()
    pairs = X.minhash_near_dupes(
        near_dup_corpus, "doc_id", "text", threshold=0.8, audit=obs
    )
    assert pairs.count() > 0
    m = obs.get
    assert m["n_skipped_buckets"] == 0
    assert m["n_buckets"] >= 1
    assert m["max_bucket_size"] >= 2


def test_default_cap_keeps_realistic_recall(near_dup_corpus):
    """The 1000-doc default cap must be invisible on a realistic corpus:
    pair sets with and without the cap are identical."""
    with_cap = {
        (r["id_a"], r["id_b"])
        for r in X.minhash_near_dupes(near_dup_corpus, "doc_id", "text", threshold=0.8).collect()
    }
    without = {
        (r["id_a"], r["id_b"])
        for r in X.minhash_near_dupes(
            near_dup_corpus, "doc_id", "text", threshold=0.8, max_bucket=None
        ).collect()
    }
    assert with_cap == without


def test_near_dup_clusters_with_audit(near_dup_corpus):
    # VERDICT r3 task 8: the bucket-cap truncation must be visible to the
    # caller as a returned audit table, not only via in-plan observe
    clusters, audit = X.near_dup_clusters(
        near_dup_corpus, "doc_id", "text", with_audit=True
    )
    plain = X.near_dup_clusters(near_dup_corpus, "doc_id", "text")
    got = {(r["doc_id"], r["component"]) for r in clusters.collect()}
    want = {(r["doc_id"], r["component"]) for r in plain.collect()}
    assert got == want  # audit mode never changes the answer
    rows = audit.collect()
    assert len(rows) == 4  # one row per band (default bands=4)
    for r in rows:
        assert set(r.asDict()) == {
            "band",
            "n_buckets",
            "n_candidate_buckets",
            "max_bucket_size",
            "n_skipped_buckets",
        }
        assert r["n_skipped_buckets"] == 0  # harness corpus has no hot bucket
        assert r["max_bucket_size"] >= 1


def test_overlap_pairs_flags_containment(spark):
    # doc 2 is a strict prefix of doc 1 (fully contained): low Jaccard,
    # overlap coefficient 1.0
    base = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base + " " + " ".join(f"x{i}" for i in range(60))), (2, base)],
        "doc_id long, text string",
    )
    sh = X.word_shingles(df, "doc_id", "text", n=3, hashed=True)
    ov = X.overlap_pairs(sh, "doc_id", threshold=0.9).collect()
    assert len(ov) == 1 and ov[0]["overlap"] == 1.0
    jac = X.jaccard_pairs(sh, "doc_id", threshold=0.9).collect()
    assert jac == []  # Jaccard misses the containment


def test_edit_distance_pairs_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilom"),  # 1 char edit, same prefix
            (3, "alpha beta totally different tail content here"),
            (4, "zeta eta unrelated opening words"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in X.edit_distance_pairs(
            df, "doc_id", "text", max_dist=5, prefix_tokens=2
        ).collect()
    }
    assert got == {(1, 2): 1}  # doc 3 shares the prefix but dist > 5; doc 4 no bucket


def test_edit_distance_hot_bucket_dropped(spark):
    # 30 docs share one boilerplate prefix: with max_bucket=10 the bucket
    # is dropped entirely (no quadratic fanout on boilerplate prefixes)
    rows = [(i, f"common header tail{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.edit_distance_pairs(
        df, "doc_id", "text", max_dist=100, prefix_tokens=2, max_bucket=10
    ).collect()
    assert out == []


def test_duplicated_spans_golden(spark):
    # shared 6-token sentence planted in docs 1 and 2 at different offsets;
    # doc 3 is fully unique; doc 4 too short for 5-grams
    shared = "the quick brown fox jumps high"
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} zeta eta theta iota kappa"),
            (3, "entirely unique words that appear nowhere else at all"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in X.duplicated_spans(df, "doc_id", "text", n=5, min_docs=2).collect()
    }
    # doc 1: shared sentence at token positions 2..7 -> 5-gram starts 2,3
    # -> one span of 2+5-1 = wait: starts {2,3}, span tokens [2, 3+5) = 6 tokens
    assert got[1]["n_dup_spans"] == 1
    assert got[1]["longest_span_tokens"] == 6
    assert got[1]["dup_token_frac"] == round(6 / 10, 4)
    # doc 2: shared sentence at start -> starts {0,1}, 6 tokens covered
    assert got[2]["n_dup_spans"] == 1
    assert got[2]["longest_span_tokens"] == 6
    # doc 3: nothing duplicated
    assert got[3]["n_dup_spans"] == 0 and got[3]["dup_token_frac"] == 0.0
    # doc 4: shorter than n -> zeros, still present
    assert got[4]["n_dup_spans"] == 0


def test_duplicated_spans_merges_overlapping_runs(spark):
    # two duplicated 5-gram RUNS in one doc whose token intervals overlap
    # (gap between runs < n) must merge into ONE span with exact coverage
    a = "one two three four five six seven"        # tokens 0..6 dup block
    b = "eight nine ten eleven twelve thirteen"    # appears later, overlaps
    df = spark.createDataFrame(
        [
            (1, f"{a} X {b}"),
            (2, f"{a} Y filler filler2 {b}"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in X.duplicated_spans(df, "doc_id", "text", n=5, min_docs=2).collect()}
    # both docs contain both blocks; spans must not double-count any token
    for r in rows.values():
        assert r["dup_token_frac"] <= 1.0
        assert r["n_dup_spans"] >= 1


def test_remove_duplicated_spans_keeps_first_occurrence(spark):
    shared = "the quick brown fox jumps high"
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} zeta eta theta iota kappa"),
            (3, "entirely unique words that appear nowhere else at all"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in X.remove_duplicated_spans(df, "doc_id", "text", n=5, min_docs=2).collect()
    }
    # doc 1 (lowest id) keeps the shared sentence; doc 2 loses it
    assert got[1]["text_clean"] == f"alpha beta {shared} gamma delta"
    assert got[2]["text_clean"] == "zeta eta theta iota kappa"
    assert got[2]["n_tokens_kept"] == 5 and got[2]["n_tokens"] == 11
    # unique and short docs pass through untouched
    assert got[3]["text_clean"].startswith("entirely unique")
    assert got[4]["text_clean"] == "too short"
    assert got[4]["n_tokens_kept"] == 2


def test_remove_duplicated_spans_distinct_contents_survive_separately(spark):
    # two DIFFERENT duplicated sentences: each survives at ITS OWN first
    # occurrence (per-content election, not per-doc)
    s1 = "one two three four five six"
    s2 = "seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [
            (1, f"{s1} filler fillerx"),
            (2, f"{s2} fillery fillerz"),
            (3, f"{s1} mid {s2}"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text_clean"]
        for r in X.remove_duplicated_spans(df, "doc_id", "text", n=5, min_docs=2).collect()
    }
    assert got[1] == f"{s1} filler fillerx"
    assert got[2] == f"{s2} fillery fillerz"
    assert got[3] == "mid"


def test_remove_duplicated_spans_string_ids(spark):
    # survivor election must work for STRING doc ids (URLs/UUIDs): the
    # struct-min election orders lexicographically, no numeric packing
    s1 = "one two three four five six"
    df = spark.createDataFrame(
        [
            ("a/doc", f"{s1} filler fillerx"),
            ("b/doc", f"{s1} other tail here"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["text_clean"]
        for r in X.remove_duplicated_spans(df, "doc_id", "text", n=5, min_docs=2).collect()
    }
    assert got["a/doc"] == f"{s1} filler fillerx"   # first id keeps the span
    assert got["b/doc"] == "other tail here"        # later id loses it


def test_near_dup_clusters_audit_requires_minhash(near_dup_corpus):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="use_minhash"):
        X.near_dup_clusters(
            near_dup_corpus, "doc_id", "text", use_minhash=False, with_audit=True
        )


def test_pair_graph_stats_golden(spark):
    # a triangle {1,2,3} plus a pendant edge 3-4: 4 vertices, 4 edges,
    # exactly ONE triangle, max degree 3 (vertex 3)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    r = X.pair_graph_stats(pairs).first()
    assert (r["n_vertices"], r["n_edges"]) == (4, 4)
    assert r["n_triangles"] == 1
    assert r["max_degree"] == 3
    # a 4-clique has C(4,3)=4 triangles, each counted once
    clique = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "id_a long, id_b long",
    )
    r2 = X.pair_graph_stats(clique).first()
    assert r2["n_triangles"] == 4 and r2["n_edges"] == 6


def test_triangle_stats_canonicalizes_both_orientations(spark):
    # round-6 ADVICE: an edge list carrying BOTH orientations must not
    # double-count — triangle_stats now canonicalizes via least/greatest
    from usedcars_bigdata_spark.operators.graph import triangle_stats

    both = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2), (3, 4), (4, 3)],
        "a long, b long",
    )
    r = triangle_stats(both, "a", "b").first()
    assert r["n_edges"] == 4
    assert r["n_triangles"] == 1
    canon = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    r2 = triangle_stats(canon, "a", "b").first()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"], r["clustering"]) == (
        r2["n_nodes"], r2["n_edges"], r2["n_triangles"], r2["clustering"]
    )


def test_sorted_neighborhood_catches_mid_string_edit(spark):
    """A mid-string typo defeats prefix blocking but sorts adjacently —
    the case sorted neighborhood exists for; and values far apart in sort
    order with small edit distance are (honestly) missed when beyond the
    window."""
    from usedcars_bigdata_spark.ext.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "blue widget"),
        (2, "blue wadget"),   # mid-string edit, sorts adjacent to 1
        (3, "red gear"),
        (4, "zed gear"),      # 1 edit from 3, but separated in sort order
        (5, "blue wzdget"),
        (6, "seven hammers"),  # sort between red... and zed..., lev > 4
        (7, "turbo pump kit"),
        (8, "ultra filter"),
    ]
    df = spark.createDataFrame(rows, "pid long, name string")
    pairs = {
        (r.id_a, r.id_b): r.dist
        for r in sorted_neighborhood_pairs(
            df, "pid", "name", window=1, max_dist=4
        ).collect()
    }
    assert pairs.get((1, 2)) == 1
    assert (3, 4) not in pairs  # sort-distance blind spot, by design
    # widening the window past the separators closes the miss
    wide = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "pid", "name", window=4, max_dist=4
        ).collect()
    }
    assert (3, 4) in wide


def test_incremental_dedup_three_way_verdicts(spark):
    from usedcars_bigdata_spark.ext.dedup import incremental_exact_dedup

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], ["id", "txt"]
    )
    new = spark.createDataFrame(
        [(10, "alpha"),   # dup of old (canonical = old min id 1)
         (11, "gamma"),   # unique
         (12, "gamma"),   # dup of new (canonical = 11)
         (13, "delta")],  # unique
        ["id", "txt"],
    )
    out = {r.id: (r.status, r.canonical_id)
           for r in incremental_exact_dedup(old, new, "id", "txt").collect()}
    assert out == {
        10: ("dup_of_old", 1),
        11: ("unique", 11),
        12: ("dup_of_new", 11),
        13: ("unique", 13),
    }


def test_minhash_md5_pipeline_certifies_planted_dups(spark):
    from usedcars_bigdata_spark.ext.dedup import (
        jaccard_pairs,
        minhash_lsh_md5_pairs,
        word_shingles,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta iota"),    # near dup of 1
        (4, "completely different words entirely here now ok"),
        (5, "unrelated content that shares nothing at all really"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_md5_pairs(df, "doc_id", "text",
                                       threshold=0.2).collect()
    }
    # identical docs have identical signatures in EVERY band: the exact
    # dup pair is guaranteed (LSH completeness at j=1), with jaccard 1.0
    assert got[(1, 2)] == 1.0
    # every emitted pair's jaccard matches the brute-force oracle op
    sh = word_shingles(df, "doc_id", "text", n=3)
    brute = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(sh, "doc_id", threshold=0.2).collect()
    }
    for pair, j in got.items():
        assert brute[pair] == j, (pair, j, brute.get(pair))
    # and LSH found the near-dup pair too (4 bands on 16/4 rows at
    # j≈0.45 collide with overwhelming probability on this fixture)
    assert (1, 3) in got and (2, 3) in got
    # disjoint docs never pair
    assert not any(4 in p or 5 in p for p in got)


# --- r9 review: NULL-content policies, parameter contracts, audit hang ---


def test_exact_dedup_null_text_never_grouped(spark):
    from usedcars_bigdata_spark.ext.dedup import exact_dedup, exact_dedup_stats

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        ["doc_id", "text"],
    )
    stats = exact_dedup_stats(df, "doc_id", "text").collect()
    # one real dup group + two singleton NULL groups (unknown != equal)
    assert sorted(r.n_copies for r in stats) == [1, 1, 2]
    kept = sorted(r.doc_id for r in exact_dedup(df, "doc_id", "text").collect())
    assert kept == [1, 3, 4]  # both NULL-text docs survive


def test_incremental_dedup_null_text_gets_verdict(spark):
    from usedcars_bigdata_spark.ext.dedup import incremental_exact_dedup

    old = spark.createDataFrame([(1, "known")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "known"), (11, None), (12, "fresh")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.status for r in
           incremental_exact_dedup(old, new, "doc_id", "text").collect()}
    # the NULL-text doc must NOT vanish from the output
    assert out == {10: "dup_of_old", 11: "unique", 12: "unique"}


def test_resolve_entities_null_fields_keep_their_rows(spark):
    from usedcars_bigdata_spark.ext.dedup import resolve_entities

    df = spark.createDataFrame(
        [(1, "widget", "B1"), (2, "widgat", "B1"),
         (3, None, "B1"), (4, "other", None)],
        ["pid", "name", "brand"],
    )
    out = {r.pid: r.entity_id for r in
           resolve_entities(df, "pid", "name", ["brand"], max_dist=2).collect()}
    # every input row labeled; NULL-field rows are their own entities
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == out[2] == 1
    assert out[3] == 3 and out[4] == 4


def test_golden_record_deterministic_under_order_ties(spark):
    from usedcars_bigdata_spark.ext.dedup import golden_record

    # two versions share order=1 with different non-null values: the
    # (order, attrs) tiebreak must pick the same winner every run
    df = spark.createDataFrame(
        [("e", 1, "a"), ("e", 1, "b"), ("e", 0, "z")],
        ["ent", "o", "v"],
    )
    vals = {
        golden_record(df, "ent", "o", ["v"]).first().v for _ in range(3)
    }
    assert vals == {"b"}  # max attr among the tied latest rows


def test_fs_scores_null_fields_count_as_disagreement(spark):
    from usedcars_bigdata_spark.ext.dedup import (
        fs_agreement_patterns,
        fs_match_scores,
    )

    df = spark.createDataFrame(
        [(1, "B", "x", "t"), (2, "B", None, "t")],
        ["pid", "blk", "name", "typ"],
    )
    fields = [("name", "exact", 0.9, 0.1), ("typ", "exact", 0.9, 0.1)]
    row = fs_match_scores(df, "pid", ["blk"], fields).first()
    assert row.n_agree == 1  # NULL name = disagreement, not NULL
    pat = fs_agreement_patterns(df, "pid", ["blk"], [(c, k) for c, k, _, _ in fields])
    prow = pat.first()
    assert (prow.g1, prow.g2) == (0, 1)  # g stays in {0,1}, no NULLs


def test_band_keys_rejects_non_divisor_bands(spark):
    import pytest

    from usedcars_bigdata_spark.ext.dedup import (
        band_keys,
        minhash_lsh_md5_pairs,
        minhash_signatures,
        word_shingles,
    )

    docs = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    sigs = minhash_signatures(
        word_shingles(docs, "doc_id", "text", n=2, hashed=True), "doc_id"
    )
    for bad in (5, 17, 0):
        with pytest.raises(ValueError, match="divide the signature"):
            band_keys(sigs, "doc_id", bands=bad)
    with pytest.raises(ValueError, match="divide the signature"):
        minhash_lsh_md5_pairs(docs, "doc_id", "text", bands=5)


def test_lsh_observation_attaches_without_cap(spark):
    from pyspark.sql import Observation

    from usedcars_bigdata_spark.ext.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "q r s t u")],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(
        word_shingles(docs, "doc_id", "text", n=2, hashed=True), "doc_id"
    )
    obs = Observation()
    pairs = lsh_candidate_pairs(sigs, "doc_id", max_bucket=None, audit=obs)
    n = pairs.count()
    got = obs.get  # hung forever before the fix
    assert got["n_skipped_buckets"] == 0 and got["n_buckets"] >= 1
    assert n >= 1


def test_ahash_rejects_wrong_grid_decoder(spark):
    import pytest

    from usedcars_bigdata_spark.ext.multimodal import perceptual_ahash

    media = spark.createDataFrame(
        [(1, bytearray(b"\x01" * 32))], "media_id long, payload binary"
    )

    def bad_decode(payload):
        return [float(b) for b in payload] * 8  # 256 pixels, not 64

    with pytest.raises(Exception, match="exactly 64 pixels"):
        perceptual_ahash(media, decode_fn=bad_decode).collect()


def test_er_and_pair_graph_audits_zero_on_empty(spark):
    """r10 sweep of the r9-ADVICE NULL-on-empty class: er_block_stats,
    the in-plan er_block_audit, and pair_graph_stats must report ZEROS,
    not NULLs, on empty input."""
    empty = spark.createDataFrame([], "rid long, brand string, name string")
    r = X.er_block_stats(empty, ["brand"], max_block=10).first()
    assert (
        r["n_blocks"], r["n_dropped_blocks"], r["n_dropped_rows"],
        r["max_block_size"], r["n_candidate_pairs"],
    ) == (0, 0, 0, 0, 0)
    no_pairs = spark.createDataFrame([], "id_a long, id_b long")
    g = X.pair_graph_stats(no_pairs).first()
    assert (
        g["n_vertices"], g["n_edges"], g["max_degree"], g["n_triangles"]
    ) == (0, 0, 0, 0)

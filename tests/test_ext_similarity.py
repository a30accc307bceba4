"""Property tests for ANN: hyperplane-LSH recall vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usedcars_bigdata_spark.ext import similarity as SIM
from usedcars_bigdata_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_brute_force_shape(emb):
    out = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)
    rows = out.collect()
    assert len(rows) == 25
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == [1, 2, 3, 4, 5]
        scores = [x["cosine"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert scores == sorted(scores, reverse=True)
        assert all(x["neighbor_id"] != q for x in rs)


def test_lsh_recall_vs_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = SIM.brute_force_topk(emb, queries, k=5).collect()
    approx = SIM.hyperplane_lsh_topk(emb, queries, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4 tables × 8-bit signatures on 500 vecs: we accept moderate recall,
    # assert it's far above random (~5/500 per query ≈ 0.01).
    assert recall >= 0.4, f"LSH recall {recall:.2f} below 0.4"


def test_lsh_scores_are_exact_for_found(emb):
    """LSH reports true cosine for surfaced candidates — scores must agree
    with brute force wherever the pair overlaps."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in SIM.brute_force_topk(emb, queries, k=5).collect()
    }
    for r in SIM.hyperplane_lsh_topk(emb, queries, k=5).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(exact[key] - r["cosine"]) < 1e-9


def test_embedding_near_dup_lsh_vs_exact(emb):
    """LSH-bucketed near-dup pairs must be a subset of exact pairs with
    high recall at a high threshold (near-identical vectors share sign
    signatures with overwhelming probability)."""
    from pyspark.sql import functions as F

    exact = {
        (r["id_a"], r["id_b"])
        for r in SIM.embedding_near_dup_pairs(emb, threshold=0.4, exact=True).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in SIM.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.4, (len(lsh), len(exact))


def test_ivf_recall_vs_brute_force(emb):
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f}"


def test_quantize_int8_roundtrip_properties(spark, sf_dir):
    """Quantized values stay in [-127, 127], the max-|x| element maps to
    +/-127, zero vectors quantize to zeros with scale 0, and dequantized
    vectors approximate the originals within scale/2 per element."""
    from usedcars_bigdata_spark.ext.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    rows = quantize_int8(emb).collect()
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(rows) == 50
    for r in rows:
        q, scale = r["q"], r["scale"]
        assert len(q) == r["n_dims"]
        assert max(abs(x) for x in q) <= 127
        assert max(abs(x) for x in q) == 127  # symmetric scaling hits the rail
        v = raw[r["vec_id"]]
        for orig, qi in zip(v, q):
            assert abs(orig - qi * scale) <= scale * 0.51 + 1e-9
        assert r["sum_q"] == sum(q) and r["l1_q"] == sum(abs(x) for x in q)

    zero = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    zr = quantize_int8(zero).first()
    assert zr["scale"] == 0.0 and zr["q"] == [0, 0, 0]
    assert zr["sum_q"] == 0 and zr["l1_q"] == 0


def test_semantic_dedup_properties(emb):
    """Every row surfaces exactly once; dropped ids are SOUND (each has a
    smaller-id same-cell neighbor at cos >= tau, verified by a numpy
    brute-force recompute); threshold > 1 keeps everything; reruns are
    deterministic."""
    import numpy as np

    tau = 0.4
    out = SIM.semantic_dedup(emb, n_clusters=8, threshold=tau).collect()
    ids = [r["vec_id"] for r in out]
    assert sorted(ids) == sorted(r["vec_id"] for r in emb.select("vec_id").collect())

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    cell = {r["vec_id"]: r["cell"] for r in out}
    kept = {r["vec_id"] for r in out if r["kept"]}
    dropped = set(ids) - kept
    for d in dropped:
        v = vecs[d]
        found = False
        for o in ids:
            if o >= d or cell[o] != cell[d]:
                continue
            w = vecs[o]
            cos = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
            if cos >= tau:
                found = True
                break
        assert found, f"dropped {d} has no smaller-id same-cell neighbor >= {tau}"

    all_kept = SIM.semantic_dedup(emb, n_clusters=8, threshold=1.01).collect()
    assert all(r["kept"] for r in all_kept)

    again = SIM.semantic_dedup(emb, n_clusters=8, threshold=tau).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_pca_project_properties(emb):
    """k output dims; per-component variance is non-increasing (principal
    order); projecting with k=dim preserves pairwise distances
    (rotation+shift is an isometry); deterministic across reruns."""
    import numpy as np

    out = SIM.pca_project(emb, k=8).collect()
    assert all(len(r["z"]) == 8 for r in out)
    z = np.stack([np.asarray(r["z"]) for r in out])
    var = z.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1)), var

    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in emb.collect()}
    dim = len(next(iter(vecs.values())))
    full = {r["vec_id"]: np.asarray(r["z"]) for r in SIM.pca_project(emb, k=dim).collect()}
    ids = sorted(vecs)[:20]
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d0 = np.linalg.norm(vecs[a] - vecs[b])
            d1 = np.linalg.norm(full[a] - full[b])
            assert abs(d0 - d1) < 1e-3, (a, b, d0, d1)

    again = SIM.pca_project(emb, k=8).collect()
    assert sorted(map(str, again)) == sorted(map(str, out))


def test_representative_sample_spans_ordered_corpus(spark):
    # corpus stored in id order: a bare limit() would sample only the head
    # (one "crawl segment"); the hash-gated sampler must reach the tail —
    # VERDICT r3 task 4 (quantizer/PCA training-sample bias)
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5000)],
        "vec_id long, embedding array<double>",
    )
    sample = SIM._representative_sample(df, "vec_id", "embedding", cap=256)
    assert 64 <= len(sample) <= 256
    first_coord = sample[:, 0]
    assert first_coord.max() > 4000, "sample never reached the corpus tail"
    assert first_coord.min() < 1000, "sample skipped the corpus head"
    # deterministic across layouts
    again = SIM._representative_sample(
        df.repartition(13), "vec_id", "embedding", cap=256
    )
    assert sorted(first_coord.tolist()) == sorted(again[:, 0].tolist())


def test_representative_sample_anchors_on_majority_width(spark):
    """r9 ADVICE: the ragged-width filter anchored on rows[0] — if the
    FIRST sampled vector was the anomalous-width outlier, the quantizer
    trained on the outlier dimension and the rest of the corpus was
    silently dropped. The filter must anchor on the majority width."""
    # One 3-wide outlier planted so the hash-gated sampler picks it up
    # among 2-wide vectors; whichever position it lands in, the majority
    # width (2) must win.
    rows = [(i, [float(i), 1.0]) for i in range(500)]
    rows.append((500, [9.0, 9.0, 9.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sample = SIM._representative_sample(df, "vec_id", "embedding", cap=64)
    assert sample.shape[1] == 2
    # and with the outlier forced FIRST in a tiny corpus (cap covers all)
    tiny = spark.createDataFrame(
        [(0, [9.0, 9.0, 9.0])] + [(i, [float(i), 1.0]) for i in range(1, 6)],
        "vec_id long, embedding array<double>",
    )
    sample = SIM._representative_sample(tiny, "vec_id", "embedding", cap=1000)
    assert sample.shape[1] == 2 and len(sample) == 5


def test_ivf_recall_survives_degenerate_head(spark):
    # the corpus's FIRST rows are one degenerate cluster (500 near-copies);
    # the tail holds 8 well-separated clusters. A head-only training
    # sample fits every centroid to the degenerate blob and IVF recall on
    # tail queries collapses; the de-biased sampler must keep it high.
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(500):  # degenerate head cluster
        v = np.array([10.0, 0, 0, 0, 0, 0, 0, 0]) + rng.normal(0, 0.01, 8)
        rows.append((i, [float(x) for x in v]))
    for i in range(500, 1000):  # 8 separated tail clusters
        c = (i - 500) % 8
        base = np.zeros(8)
        base[c] = -10.0 if c % 2 else 10.0
        base[(c + 1) % 8] = 5.0
        v = base + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id").isin([510, 601, 702, 803, 904]))
    exact = SIM.brute_force_topk(emb, queries, k=5).collect()
    approx = SIM.ivf_topk(
        emb, queries, k=5, n_centroids=9, n_probe=3, train_cap=256
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"IVF recall collapsed on tail clusters: {recall}"


def test_hard_negatives_excludes_same_label(spark, sf_dir):
    from usedcars_bigdata_spark.ext.similarity import hard_negatives
    from usedcars_bigdata_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = hard_negatives(emb, emb.filter("vec_id < 5"), k=3).collect()
    assert out
    for r in out:
        assert r.neighbor_label != r.query_label
        assert 1 <= r.rank <= 3


def test_hard_negatives_fills_k_when_same_label_dominates(spark):
    """A query whose nearest neighbors are all SAME-label must still get k
    negatives (filter-before-rank); a post-rank filter would return
    fewer."""
    import numpy as np
    from usedcars_bigdata_spark.ext.similarity import hard_negatives

    rows = [(0, [1.0, 0.0], 7)]
    # five same-label vectors nearly identical to the query
    rows += [(i, [1.0, 0.001 * i], 7) for i in range(1, 6)]
    # three other-label vectors, less similar
    rows += [(10 + j, [0.5, float(j + 1)], 9) for j in range(3)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives(df, df.filter("vec_id = 0"), k=3).collect()
    assert len(out) == 3
    assert all(r.neighbor_label == 9 for r in out)


def test_mmr_first_pick_is_plain_top1_and_deterministic(spark, sf_dir):
    from usedcars_bigdata_spark.ext.similarity import brute_force_topk, mmr_topk
    from usedcars_bigdata_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter("vec_id != 0")
    q = emb.filter("vec_id = 0")
    out1 = mmr_topk(corpus, q, k=4).collect()
    out2 = mmr_topk(corpus, q, k=4).collect()
    assert [r.vec_id for r in out1] == [r.vec_id for r in out2]
    top1 = brute_force_topk(emb, q, k=1).first()
    assert out1[0].vec_id == top1.neighbor_id
    # ranks contiguous, scores non-increasing in rank
    assert [r.rank for r in out1] == [1, 2, 3, 4]


def test_mmr_diversifies_planted_clump(spark):
    """Corpus = a clump of near-copies of the query plus a few spread
    vectors: plain top-3 picks the clump; MMR must escape it after the
    first pick."""
    from usedcars_bigdata_spark.ext.similarity import mmr_topk

    rows = [(0, [1.0, 0.0, 0.0])]
    rows += [(i, [1.0, 0.0001 * i, 0.0]) for i in range(1, 4)]  # clump
    rows += [(10, [0.7, 0.7, 0.0]), (11, [0.7, 0.0, 0.7])]  # spread
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_topk(
        df.filter("vec_id != 0"), df.filter("vec_id = 0"), k=3, lam=0.5
    ).collect()
    ids = [r.vec_id for r in out]
    assert ids[0] in (1, 2, 3)  # most relevant first
    assert set(ids) & {10, 11}, ids  # escaped the clump


# --- r9 review: Arrow-batch hygiene, generic ids, honest denominators ---


def test_ann_paths_tolerate_null_embeddings(spark):
    from usedcars_bigdata_spark.ext.similarity import (
        embedding_near_dup_pairs,
        hyperplane_lsh_topk,
        ivf_topk,
    )

    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(20)]
    rows.append((99, None))  # NULL embedding — used to abort the job
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 2")
    out = hyperplane_lsh_topk(df, q, k=3, bits=2, tables=4)
    assert out.count() >= 1
    assert ivf_topk(df, q, k=3, n_centroids=4).count() >= 1
    assert embedding_near_dup_pairs(df, threshold=0.99).count() >= 0


def test_representative_sample_empty_corpus_clear_error(spark):
    import pytest

    from usedcars_bigdata_spark.ext.similarity import ivf_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        ivf_topk(empty, empty, k=3)


def test_mmr_and_pq_accept_string_ids(spark):
    from usedcars_bigdata_spark.ext.similarity import mmr_topk, pq_topk

    rows = [
        (f"doc-{i}", [float((i * 3 + j) % 7) + 0.1 for j in range(8)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    q = df.limit(1)
    m = mmr_topk(df, q, k=3)
    assert m.count() == 3 and m.first().vec_id.startswith("doc-")
    p = pq_topk(df, df.filter("vec_id = 'doc-1'"), k=2, m_subspaces=2, n_codes=4)
    assert p.count() >= 1 and p.first().query_id == "doc-1"


def test_matryoshka_recall_small_corpus_denominator(spark):
    from usedcars_bigdata_spark.ext.similarity import matryoshka_recall

    # 4 vectors, k=5: the full-dim reference holds only 3 neighbors per
    # query; a perfect truncated ranking must read recall 1.0, not 0.6
    rows = [(i, [float(i + 1)] * 2 + [0.0] * 6) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.dim: r.recall for r in
           matryoshka_recall(df, df, dims=(2,), k=5).collect()}
    assert out[2] == 1.0


def test_lsh_bits_packing_bound(spark):
    """r10 sweep: signature bits pack as 1<<b into a signed long — at
    bits=64 the numpy weight table wraps NEGATIVE silently and buckets
    collide wrongly with no error. The contract must fail loudly."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match=r"\[1, 63\]"):
        SIM.hyperplane_lsh_topk(df, df.limit(1), k=1, bits=64)
    # boundary value is accepted
    assert SIM._hyperplanes(2, 63, 1).shape == (1, 63, 2)

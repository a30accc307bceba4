

def test_pq_topk_recall_vs_brute_force(spark, sf_dir):
    from usedcars_bigdata_spark.ext.similarity import brute_force_topk, pq_topk
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20)
    bf = {(r.query_id, r.neighbor_id)
          for r in brute_force_topk(emb, qs, k=5).collect()}
    pq = {(r.query_id, r.neighbor_id)
          for r in pq_topk(emb, qs, k=5, m_subspaces=16, n_codes=64,
                           refine=8).collect()}
    assert len(pq & bf) / len(bf) >= 0.9
    # determinism: seeded codebooks, no RNG state
    pq2 = {(r.query_id, r.neighbor_id)
           for r in pq_topk(emb, qs, k=5, m_subspaces=16, n_codes=64,
                            refine=8).collect()}
    assert pq == pq2


def test_pq_ranks_are_exact_cosine_order(spark, sf_dir):
    """The refine stage reranks with EXACT cosine: within each query the
    returned ranks must be ordered by the true cosine of those
    neighbors (the approximation only selects candidates, never orders
    the final list)."""
    from usedcars_bigdata_spark.ext.similarity import pq_topk
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    rows = pq_topk(emb, qs, k=5, m_subspaces=16, n_codes=64, refine=8).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    for q, lst in by_q.items():
        lst.sort()
        cosines = [c for _, c in lst]
        assert cosines == sorted(cosines, reverse=True), q


def test_ivfpq_recall_at_ivf_parity(spark, sf_dir):
    """IVFPQ's recall at a given probe budget must track plain IVF's at
    the same budget (PQ compression is free once the shortlist is
    exactly reranked) — and clear an absolute floor at the entry's
    n_probe=8 setting."""
    from pyspark.sql import functions as F

    from usedcars_bigdata_spark.ext.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
    )
    from usedcars_bigdata_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20)
    bf = {(r.query_id, r.neighbor_id)
          for r in brute_force_topk(emb, qs, k=5).collect()}
    ivf = {(r.query_id, r.neighbor_id)
           for r in ivf_topk(emb, qs, k=5, n_probe=8).collect()}
    ivfpq = {(r.query_id, r.neighbor_id)
             for r in ivfpq_topk(emb, qs, k=5, n_probe=8, refine=8).collect()}
    r_ivf = len(ivf & bf) / len(bf)
    r_ivfpq = len(ivfpq & bf) / len(bf)
    assert r_ivfpq >= 0.7
    assert r_ivfpq >= r_ivf - 0.1, (r_ivfpq, r_ivf)

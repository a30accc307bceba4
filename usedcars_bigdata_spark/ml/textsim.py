"""TF-IDF text similarity + recommendation (SURVEY.md §2.11, M13-M20).

The reference builds a 4-stage TF-IDF pipeline, L2-normalizes, then computes
cosine top-k by collecting ONE query vector to the driver and dotting it
against every row in an RDD map (recomendation-system.py:151-170) — O(N)
driver traffic per query. Our engine:
- same Pipeline (RegexTokenizer → StopWordsRemover → CountVectorizer → IDF);
- Normalizer(p=2) as in the reference;
- top-k via a DataFrame crossJoin with a broadcast query row + native
  TakeOrderedAndProject — no RDD, no driver loop, batchable over many
  queries at once;
- scale path: MinHashLSH approxSimilarityJoin over the same vectors.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    MinHashLSH,
    Normalizer,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine


def tfidf_pipeline(
    input_col: str = "text",
    vocab_size: int = 1 << 16,
    min_df: float = 1.0,
    min_doc_freq: int = 5,
) -> Pipeline:
    """M13-M17: the reference's 4-stage pipeline
    (recomendation-system.py:151-156), parameters included."""
    tokenizer = RegexTokenizer(inputCol=input_col, outputCol="words", pattern=r"\W")
    remover = StopWordsRemover(inputCol="words", outputCol="filtered")
    cv = CountVectorizer(
        inputCol="filtered", outputCol="tf", vocabSize=vocab_size, minDF=min_df
    )
    idf = IDF(inputCol="tf", outputCol="tfidf", minDocFreq=min_doc_freq)
    return Pipeline(stages=[tokenizer, remover, cv, idf])


def fit_tfidf(df: DataFrame, input_col: str = "text") -> tuple[DataFrame, PipelineModel]:
    model = tfidf_pipeline(input_col).fit(df)
    return model.transform(df), model


def normalize_l2(df: DataFrame, input_col: str = "tfidf", output_col: str = "norm_vec") -> DataFrame:
    """M18: Normalizer(p=2) (recomendation-system.py:161-164)."""
    return Normalizer(inputCol=input_col, outputCol=output_col, p=2.0).transform(df)


def cosine_topk(
    vectors: DataFrame,
    query_ids: DataFrame,
    id_col: str,
    vec_col: str = "norm_vec",
    k: int = 5,
) -> DataFrame:
    """M19 scalable rewrite: cosine top-k of each query id against the corpus
    as ONE declarative plan (vs driver RDD loop,
    recomendation-system.py:167-170). Vectors are converted to arrays and
    scored with native higher-order functions."""
    arr = vectors.select(
        F.col(id_col), vector_to_array(F.col(vec_col)).alias("__arr")
    )
    q = arr.join(query_ids, on=id_col, how="left_semi").select(
        F.col(id_col).alias("query_id"), F.col("__arr").alias("q_arr")
    )
    c = arr.select(F.col(id_col).alias("neighbor_id"), F.col("__arr").alias("c_arr"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine("q_arr", "c_arr"))
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id").asc()
        )
    )
    return (
        scored.withColumn("rank", w)
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )


def lsh_similarity_join(
    vectors: DataFrame,
    id_col: str,
    vec_col: str = "tf",
    threshold: float = 0.8,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """M19 scale path: MinHashLSH approxSimilarityJoin on the sparse TF
    vectors (Jaccard distance ≤ threshold). Linear-ish candidate generation
    instead of the N² cross join."""
    lsh = MinHashLSH(
        inputCol=vec_col, outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(vectors)
    pairs = model.approxSimilarityJoin(vectors, vectors, threshold, distCol="jaccard_dist")
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


def recommend(
    docs: DataFrame,
    query_id,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """M20: end-to-end recommendation (recomendation-system.py:142-183):
    TF-IDF → normalize → top-k similar to ``query_id`` → fetch source rows."""
    feats, _ = fit_tfidf(docs, input_col=text_col)
    normed = normalize_l2(feats)
    qids = docs.sparkSession.createDataFrame([(query_id,)], f"{id_col} long")
    top = cosine_topk(normed, qids, id_col, k=k)
    return (
        top.join(docs, top.neighbor_id == F.col(id_col), "inner")
        .orderBy("rank")
        .drop(id_col)
    )


def fit_word2vec(
    docs: DataFrame,
    text_col: str = "text",
    vector_size: int = 32,
    min_count: int = 5,
    seed: int = 42,
):
    """Skip-gram Word2Vec over whitespace tokens (pyspark.ml.feature.
    Word2Vec) — the learned-embedding complement of the count-based
    TF-IDF stack above and of ext.text.pmi_cooccurrence (whose PMI
    matrix is the classic factorization target of skip-gram per
    Levy & Goldberg 2014). numPartitions=1 + fixed seed keeps the fit
    deterministic for a given input (Word2Vec's async updates are
    partition-ordered); at corpus scale you trade that determinism for
    throughput by raising numPartitions — documented, not defaulted.

    Returns the fitted Word2VecModel."""
    from pyspark.ml.feature import Word2Vec

    tokens = docs.select(F.split(F.col(text_col), r"\s+").alias("tokens"))
    w2v = Word2Vec(
        inputCol="tokens",
        outputCol="vec",
        vectorSize=vector_size,
        minCount=min_count,
        seed=seed,
        numPartitions=1,
    )
    return w2v.fit(tokens)


def word_synonyms(model, probe_words: list[str], k: int = 5) -> DataFrame:
    """Top-k nearest vocabulary words per probe word by embedding cosine
    (model.findSynonyms), stacked into one (probe, rank, word, similarity)
    DataFrame. Rows-only in the contract: embedding VALUES are
    float-reduction-order artifacts, so the driver checks shape while
    tests/test_ml.py pins QUALITY (a planted co-occurrence pair must
    rank above an unrelated word) — the ALS/LSH recall pattern."""
    out = None
    for w in probe_words:
        syn = (
            model.findSynonyms(w, k)
            .withColumn("probe", F.lit(w))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy(F.lit(1)).orderBy(F.col("similarity").desc())
                ),
            )
            .select("probe", "rank", "word", F.round("similarity", 4).alias("similarity"))
        )
        out = syn if out is None else out.unionByName(syn)
    return out

"""Golden + property tests for text analysis and multimodal plumbing."""

from __future__ import annotations

import pytest

from usedcars_bigdata_spark.ext import multimodal as MM
from usedcars_bigdata_spark.ext import text as TX
from usedcars_bigdata_spark.sources import load_table


def test_token_stats_golden(spark):
    df = spark.createDataFrame([(1, "one two three")], "doc_id long, text string")
    r = TX.token_stats(df, "doc_id", "text").first()
    assert r["n_tokens"] == 3
    assert r["n_chars_actual"] == 13
    assert r["avg_token_len"] == round(11 / 3, 4)


def test_langid_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist da"),
            (3, "el perro y la casa de que"),
            (4, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in TX.langid_heuristic(df, "doc_id", "text").collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "es"
    assert got[4] == "und"


def test_quality_score_range(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = TX.quality_score(docs, "doc_id", "text").collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)


def test_fingerprint_deterministic_and_sampled(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: tuple(r["fingerprint"]) for r in TX.rolling_fingerprint(docs, "doc_id", "text").collect()}
    b = {r["doc_id"]: tuple(r["fingerprint"]) for r in TX.rolling_fingerprint(docs, "doc_id", "text").collect()}
    assert a == b  # deterministic across runs
    sizes = [len(v) for v in a.values()]
    assert sum(sizes) > 0
    # ~1/8 of n-grams selected on average
    total_grams = sum(max(0, len(t.split()) - 3) for t in
                      (r["text"] for r in docs.collect()))
    assert sum(sizes) < 0.3 * total_grams


def test_fingerprint_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    r = TX.rolling_fingerprint(df, "doc_id", "text").first()
    assert r["fingerprint"] == [] and r["fp_size"] == 0


def test_fingerprint_md5_tier_matches_python_reference(spark):
    """The md5_32 hash tier must equal int(md5(gram)[:8], 16) selection
    mod 8 computed independently in Python — the cross-engine contract
    the r8 oracle promotion rests on."""
    import hashlib

    text = "a b c d e f g h i j a b c d"
    words = text.split()
    grams = [" ".join(words[i : i + 4]) for i in range(len(words) - 3)]
    want = sorted(
        {
            h
            for h in (
                int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                for g in grams
            )
            if h % 8 == 0
        }
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = TX.rolling_fingerprint(df, "doc_id", "text", hash_fn="md5_32").first()
    assert list(r["fingerprint"]) == want
    assert r["fp_size"] == len(want)


def test_multimodal_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = MM.synthesize_media_from_docs(docs)
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MM.MEDIA_SCHEMA.fields
    ]
    feats = MM.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(r["feat_dim"] == 8 and len(r["features"]) == 8 for r in rows)
    again = {r["media_id"]: r["features"] for r in MM.extract_features(media, dim=8).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert first == again  # deterministic stub


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")


def test_normalize_text_semantics(spark):
    df = spark.createDataFrame(
        [(1, "  Hello\tWORLD\x07  twice  "), (2, "a\nb")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text_norm"]
        for r in TX.normalize_text(df, "doc_id", "text").collect()
    }
    assert got == {1: "hello world twice", 2: "a b"}
    # options off → identity
    ident = {
        r["doc_id"]: r["text_norm"]
        for r in TX.normalize_text(
            df, "doc_id", "text", lowercase=False,
            collapse_whitespace=False, strip_control=False,
        ).collect()
    }
    assert ident[2] == "a\nb"


def test_normalize_unicode_nfc_golden(spark):
    """NFC composes decomposed combining sequences; NFKC additionally
    folds compatibility characters; invalid form raises. Inputs/expected
    use explicit escapes so the test is source-encoding-proof."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [
            (1, "cafe\u0301"),    # e + combining acute -> \u00e9
            (2, "man\u0303ana"),  # n + combining tilde -> \u00f1
            (3, "\ufb01le"),      # fi ligature: NFC keeps, NFKC folds
            (4, None),             # null passthrough
        ],
        "doc_id long, text string",
    )
    nfc = {r["doc_id"]: r["text_norm"]
           for r in TX.normalize_text_unicode(df, "doc_id", "text").collect()}
    assert nfc[1] == "caf\u00e9"
    assert nfc[2] == "ma\u00f1ana"
    assert nfc[3] == "\ufb01le"
    assert nfc[4] is None
    nfkc = {r["doc_id"]: r["text_norm"]
            for r in TX.normalize_text_unicode(df, "doc_id", "text", form="NFKC").collect()}
    assert nfkc[3] == "file"
    with _pytest.raises(ValueError):
        TX.normalize_text_unicode(df, "doc_id", "text", form="NFX")


def test_pack_shards_prefix_sum_semantics(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 50), (3, 80), (4, 10), (5, 200)],
        "doc_id long, n_tokens long",
    )
    rows = {
        r["doc_id"]: (r["shard"], r["offset_in_shard"])
        for r in TX.pack_shards(df, "doc_id", "n_tokens", budget=128).collect()
    }
    # cumulative-before: 0,100,150,230,240 → shards 0,0,1,1,1
    assert rows == {1: (0, 0), 2: (0, 100), 3: (1, 22), 4: (1, 102), 5: (1, 112)}


def test_pack_shards_partitioned_equals_global(spark, sf_dir):
    """The two-pass bucketed prefix sum must reproduce the global window
    exactly — including across bucket boundaries and for bucket widths
    that don't divide the id range evenly."""
    docs = load_table(spark, sf_dir, "documents")
    counts = TX.token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    glob = {r["doc_id"]: (r["shard"], r["offset_in_shard"])
            for r in TX.pack_shards(counts, "doc_id", "n_tokens", budget=4096).collect()}
    for width in (7, 64, 10_000_000):  # multi-bucket, aligned, single-bucket
        part = {r["doc_id"]: (r["shard"], r["offset_in_shard"])
                for r in TX.pack_shards(counts, "doc_id", "n_tokens",
                                        budget=4096, bucket_width=width).collect()}
        assert part == glob, f"bucket_width={width} diverged from global form"


def test_stratified_sample_bounds_and_determinism(spark, sf_dir):
    from usedcars_bigdata_spark.operators.sample import stratified_sample
    from usedcars_bigdata_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    fr = {"en": 0.5, "de": 1.0}
    s1 = stratified_sample(docs, "lang", fr, seed=7)
    s2 = stratified_sample(docs, "lang", fr, seed=7)
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )  # same seed → same sample
    langs = {r["lang"] for r in s1.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # absent strata dropped
    n_de_all = docs.filter("lang = 'de'").count()
    n_de_samp = s1.filter("lang = 'de'").count()
    assert n_de_samp == n_de_all  # fraction 1.0 keeps everything


def test_redact_pii_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.0.1 answered"),
            (3, "call +1 555 0147 today"),
            (4, "all three a@b.io 10.0.0.7 +44 20 7946 0958 done"),
            (5, "nothing here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TX.redact_pii(df, "doc_id", "text").collect()}
    assert got[1]["n_emails"] == 1 and got[1]["text_redacted"] == "mail <EMAIL> now"
    assert got[2]["n_ips"] == 1 and got[2]["text_redacted"] == "server at <IP> answered"
    assert got[3]["n_phones"] == 1 and got[3]["text_redacted"] == "call <PHONE> today"
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (1, 1, 1)
    assert got[4]["text_redacted"] == "all three <EMAIL> <IP> <PHONE> done"
    assert got[5]["text_redacted"] == "nothing here"


def test_redact_pii_counts_are_redaction_events(spark):
    """A digit run inside an email local-part disappears into <EMAIL> and
    must NOT also be counted as a phone: counts are taken on the
    progressively-redacted text, so they always agree with the
    placeholders in text_redacted."""
    df = spark.createDataFrame(
        [(1, "reach user123456789@x.com or 555 123 4567")],
        "doc_id long, text string",
    )
    r = TX.redact_pii(df, "doc_id", "text").first()
    assert r["n_emails"] == 1
    assert r["n_phones"] == 1  # only the real phone; the local-part digits don't count
    assert r["text_redacted"] == "reach <EMAIL> or <PHONE>"


def test_repetition_stats_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),   # grams: abc bca cab abc -> 4 total, 3 distinct
            (2, "a b c d"),       # all distinct
            (3, "x y"),           # too short -> dropped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TX.repetition_stats(df, "doc_id", "text", n=3).collect()}
    assert got[1]["n_grams"] == 4 and got[1]["n_distinct"] == 3
    assert got[1]["rep_ratio"] == 0.25
    assert got[2]["rep_ratio"] == 0.0
    assert 3 not in got


def test_contamination_golden(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words in this one here now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "quick brown fox jumps over")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in TX.ngram_contamination(corpus, bench, "doc_id", "text", n=5).collect()
    }
    # doc 1 has 5 distinct 5-grams, exactly one equals the benchmark gram
    assert got[1]["n_grams"] == 5 and got[1]["n_hit"] == 1
    assert got[1]["contamination"] == 0.2
    assert got[2]["n_hit"] == 0 and got[2]["contamination"] == 0.0


def test_length_histogram_partitions_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = TX.length_histogram(docs, "doc_id", "text", bucket_tokens=16).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["bucket"] * 16 <= r["min_tokens"] <= r["max_tokens"] < (r["bucket"] + 1) * 16


def test_boilerplate_ngrams_counts_docs_not_occurrences(spark):
    df = spark.createDataFrame(
        [
            (1, "x y z w v x y z w v"),  # repeated gram within ONE doc
            (2, "x y z w v only once"),
            (3, "unrelated words entirely here five"),
        ],
        "doc_id long, text string",
    )
    rows = TX.boilerplate_ngrams(df, "doc_id", "text", n=5, min_docs=2, top=10).collect()
    got = {r["gram"]: r["n_docs"] for r in rows}
    # document frequency, not occurrence count: doc 1's double occurrence counts once
    assert got.get("x y z w v") == 2
    assert all(n >= 2 for n in got.values())


def test_hash_split_deterministic_and_partition_invariant(spark, sf_dir):
    """Same id -> same split across runs AND across partition layouts
    (the property randomSplit/sample lack); fractions land near 80/10/10;
    bad fractions rejected."""
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in TX.hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in TX.hash_split(docs.repartition(13), "doc_id").collect()}
    assert a == b
    n = len(a)
    from collections import Counter
    c = Counter(a.values())
    assert 0.7 < c["train"] / n < 0.9
    assert 0.05 < c["val"] / n < 0.15
    assert 0.05 < c["test"] / n < 0.15
    # appending new docs never moves an existing id's split
    half = {r["doc_id"]: r["split"]
            for r in TX.hash_split(docs.filter("doc_id < 250"), "doc_id").collect()}
    assert all(a[k] == v for k, v in half.items())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        TX.hash_split(docs, "doc_id", fractions={"train": 0.5, "test": 0.4})


def test_vocabulary_topk_counts(spark):
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b"), (3, "c")],
        "doc_id long, text string",
    )
    rows = TX.vocabulary_topk(df, "doc_id", "text", top=2).collect()
    # a: 3 occurrences in 2 docs; b: 3 occurrences in 2 docs; c: 2 in 2
    assert [(r["token"], r["n_occurrences"], r["n_docs"]) for r in rows] == [
        ("a", 3, 2),
        ("b", 3, 2),
    ]


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    """Per-group retention tracks the target rate; assignment is a pure
    function of the id (stable under repartitioning); the salted hash is
    independent of hash_split's buckets."""
    from usedcars_bigdata_spark.ext.text import hash_split, mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.3}
    out = mixture_sample(docs, "doc_id", "lang", rates).collect()
    assert len(out) == docs.count()
    by_lang = {}
    for r in out:
        t, k = by_lang.get(r["lang"], (0, 0))
        by_lang[r["lang"]] = (t + 1, k + r["kept"])
    t, k = by_lang["en"]
    assert 0.15 <= k / t <= 0.45, (k, t)  # 0.3 target, small-n tolerance
    for lang, (t, k) in by_lang.items():
        if lang != "en":
            assert k == t, lang  # default rate 1.0 keeps everything

    again = {
        r["doc_id"]: (r["bucket"], r["kept"])
        for r in mixture_sample(docs.repartition(7), "doc_id", "lang", rates).collect()
    }
    assert again == {r["doc_id"]: (r["bucket"], r["kept"]) for r in out}

    split_buckets = {r["doc_id"]: r["bucket"] for r in hash_split(docs, "doc_id").collect()}
    mix_buckets = {r["doc_id"]: r["bucket"] for r in out}
    assert any(split_buckets[i] != mix_buckets[i] for i in split_buckets)


def test_mixture_sample_zero_rate_and_default(spark):
    """An explicit 0.0 rate drops the whole group; unknown groups fall
    back to default_rate (here 0.0 drops them too)."""
    from usedcars_bigdata_spark.ext.text import mixture_sample

    df = spark.createDataFrame(
        [(i, "spam" if i % 2 else "ham") for i in range(40)], ["id", "grp"]
    )
    out = mixture_sample(df, "id", "grp", {"spam": 0.0}, default_rate=1.0).collect()
    assert not any(r["kept"] for r in out if r["grp"] == "spam")
    assert all(r["kept"] for r in out if r["grp"] == "ham")
    none_kept = mixture_sample(df, "id", "grp", {}, default_rate=0.0).collect()
    assert not any(r["kept"] for r in none_kept)


def test_duplicated_gram_fraction_bounds(spark, sf_dir):
    """dup_frac in [0,1]; dup_grams <= n_grams; a corpus of two identical
    docs scores dup_frac 1.0 on both; a unique doc scores 0."""
    from usedcars_bigdata_spark.ext.dedup import duplicated_gram_fraction

    docs = load_table(spark, sf_dir, "documents")
    rows = duplicated_gram_fraction(docs, "doc_id", "text").collect()
    assert rows
    for r in rows:
        assert 0 <= r["dup_grams"] <= r["n_grams"]
        assert 0.0 <= r["dup_frac"] <= 1.0
        assert r["flagged"] == (r["dup_grams"] / r["n_grams"] >= 0.5)

    tiny = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "p q r s t")],
        ["doc_id", "text"],
    )
    by_id = {r["doc_id"]: r for r in duplicated_gram_fraction(tiny, "doc_id", "text").collect()}
    assert by_id[1]["dup_frac"] == 1.0 and by_id[2]["dup_frac"] == 1.0
    assert by_id[3]["dup_frac"] == 0.0 and not by_id[3]["flagged"]
    assert by_id[1]["flagged"]


def test_unigram_logprob_score_properties(spark, sf_dir):
    """avg_logp <= 0 always; a uniform-vocabulary corpus scores exactly
    log(1/V) per token; rarer-token docs score lower than common-token
    docs; ppl = exp(-avg_logp)."""
    import math

    from usedcars_bigdata_spark.ext.text import unigram_logprob_score

    docs = load_table(spark, sf_dir, "documents")
    rows = unigram_logprob_score(docs, "doc_id", "text").collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r["avg_logp"] <= 0
        assert abs(r["ppl"] - round(math.exp(-r["avg_logp"]), 2)) < 0.02

    uniform = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d a b")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in unigram_logprob_score(uniform, "doc_id", "text").collect()}
    want = round(math.log(1 / 4), 4)
    assert out[1]["avg_logp"] == want and out[2]["avg_logp"] == want

    skewed = spark.createDataFrame(
        [(1, "x x x x x x x x"), (2, "x x x x x x x y")], ["doc_id", "text"]
    )
    s = {r["doc_id"]: r["avg_logp"] for r in unigram_logprob_score(skewed, "doc_id", "text").collect()}
    assert s[2] < s[1]  # the doc containing the rare token scores lower


def test_inverted_index_cap_and_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    idx = TX.inverted_index(docs, "doc_id", "text", postings_cap=5, min_docs=1)
    rows = idx.collect()
    assert rows, "index must be non-empty"
    for r in rows:
        assert 1 <= len(r["postings"]) <= 5
        assert r["postings"] == sorted(r["postings"])  # smallest ids, sorted
        assert r["n_docs"] >= len(r["postings"])
    # spot-check one token's true document frequency against a direct count
    tok = rows[0]["token"]
    from pyspark.sql import functions as F

    direct = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"), "doc_id")
        .filter(F.col("t") == tok)
        .select("doc_id")
        .distinct()
        .count()
    )
    assert rows[0]["n_docs"] == direct


def test_tfidf_top_terms_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = TX.tfidf_top_terms(docs, "doc_id", "text", k=3).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc) == docs.count()  # every doc has tokens in this corpus
    for doc_rows in per_doc.values():
        ranks = sorted(r["rank"] for r in doc_rows)
        assert ranks == list(range(1, len(doc_rows) + 1)) and len(doc_rows) <= 3
        by_rank = sorted(doc_rows, key=lambda r: r["rank"])
        scores = [r["tfidf"] for r in by_rank]
        assert scores == sorted(scores, reverse=True)  # descending in rank order


def test_tfidf_golden(spark):
    # 2 docs; "rare" only in doc 1 and twice there -> its top term
    df = spark.createDataFrame(
        [(1, "common rare rare"), (2, "common common other")],
        "doc_id long, text string",
    )
    top = {
        r["doc_id"]: r["token"]
        for r in TX.tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    }
    assert top[1] == "rare"
    # doc 2: "other" (df=1) beats "common" (df=2) despite lower tf? tf=2*ln(3/3)=0
    assert top[2] == "other"


def test_group_cap_sample_bounds_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = TX.group_cap_sample(docs, "doc_id", "lang", cap=7)
    counts = {r["lang"]: r["n"] for r in a.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    group_sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, n in counts.items():
        assert n == min(7, group_sizes[lang])
    # deterministic and layout-independent: same ids after a repartition
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(
        r["doc_id"]
        for r in TX.group_cap_sample(docs.repartition(13), "doc_id", "lang", cap=7).collect()
    )
    assert ids_a == ids_b


def test_chunk_documents_coverage_and_overlap(spark):
    # 100 tokens, chunk 64 / stride 48 -> starts at 1, 49, 97
    words = " ".join(f"w{i}" for i in range(1, 101))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(
        TX.chunk_documents(df, "doc_id", "text", chunk_size=64, stride=48).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert [r["n_tokens"] for r in rows] == [64, 52, 4]
    assert rows[0]["chunk_text"].startswith("w1 ") and rows[0]["chunk_text"].endswith(" w64")
    assert rows[1]["chunk_text"].startswith("w49 ")  # overlap of 16 with chunk 0
    assert rows[2]["chunk_text"] == "w97 w98 w99 w100"
    # reconstruction: the union of chunk tokens covers every token
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split())
    assert len(seen) == 100


def test_quality_percentile_gate_exact_vs_approx(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = TX.quality_percentile_gate(docs, "doc_id", "text", pct=0.25, exact=True)
    approx = TX.quality_percentile_gate(docs, "doc_id", "text", pct=0.25, exact=False)
    n = docs.count()
    n_exact, n_approx = exact.count(), approx.count()
    # gate keeps roughly the top 75%; both forms within a loose band
    assert 0.6 * n <= n_exact <= 0.95 * n
    # sketch threshold may differ slightly -> kept-set sizes stay close
    assert abs(n_exact - n_approx) <= 0.1 * n
    thr = exact.select("threshold").first()[0]
    assert all(r["quality_score"] >= thr for r in exact.collect())


def test_weighted_sample_deterministic_and_biased(spark):
    # two weight classes; heavy rows 100x weight -> dominate the sample
    rows = [(i, 1000.0 if i < 50 else 10.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = TX.weighted_sample(df, "doc_id", "w", k=50)
    ids = [r["doc_id"] for r in got.collect()]
    assert len(ids) == 50
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 30  # 50 heavy rows hold ~91% of total weight
    # determinism incl. under repartition
    again = [r["doc_id"] for r in TX.weighted_sample(df.repartition(7), "doc_id", "w", k=50).collect()]
    assert ids == again
    # zero/negative weights never selected
    df2 = df.union(spark.createDataFrame([(900, 0.0), (901, -5.0)], "doc_id long, w double"))
    ids2 = {r["doc_id"] for r in TX.weighted_sample(df2, "doc_id", "w", k=600).collect()}
    assert 900 not in ids2 and 901 not in ids2


def test_char_entropy_golden(spark):
    import math

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TX.char_entropy(df, "doc_id", "text").collect()}
    assert 4 not in got  # empty excluded
    assert got[1]["entropy"] == 0.0  # constant fill
    assert got[2]["entropy"] == round(math.log(2), 4)  # two equiprobable chars
    assert got[3]["entropy"] == round(math.log(4), 4)  # four equiprobable chars
    assert got[3]["n_distinct_chars"] == 4


def test_inverted_index_salted_equals_single_window(spark, sf_dir):
    # the salted two-level min-k must be output-identical to the plain
    # single-window form (n_salts=1 degenerates to it) on a real corpus
    docs = load_table(spark, sf_dir, "documents")
    salted = {
        r["token"]: (r["n_docs"], tuple(r["postings"]))
        for r in TX.inverted_index(
            docs, "doc_id", "text", postings_cap=5, n_salts=16
        ).collect()
    }
    plain = {
        r["token"]: (r["n_docs"], tuple(r["postings"]))
        for r in TX.inverted_index(
            docs, "doc_id", "text", postings_cap=5, n_salts=1
        ).collect()
    }
    assert salted == plain


def test_inverted_index_skewed_token_min_k(spark):
    # one token in every doc (the stopword case the salting exists for):
    # postings must still be the postings_cap SMALLEST doc ids
    rows = [(i, f"hot unique{i}") for i in range(1, 401)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = {
        r["token"]: r
        for r in TX.inverted_index(
            df, "doc_id", "text", postings_cap=7, n_salts=4
        ).collect()
    }
    assert idx["hot"]["n_docs"] == 400
    assert idx["hot"]["postings"] == [1, 2, 3, 4, 5, 6, 7]
    assert idx["unique5"]["postings"] == [5]


def test_quality_percentile_approx_threshold_near_exact(spark, sf_dir):
    # the declared scale path (approx_percentile sketch) must put its
    # threshold within a small epsilon of the exact quantile — VERDICT r3
    # task 7: the approx twin carries its own verification
    docs = load_table(spark, sf_dir, "documents")
    exact_thr = (
        TX.quality_percentile_gate(docs, "doc_id", "text", pct=0.25, exact=True)
        .select("threshold")
        .first()[0]
    )
    approx_thr = (
        TX.quality_percentile_gate(docs, "doc_id", "text", pct=0.25, exact=False)
        .select("threshold")
        .first()[0]
    )
    from pyspark.sql import functions as F

    spread = (
        TX.quality_score(docs, "doc_id", "text")
        .agg((F.max("quality_score") - F.min("quality_score")).alias("s"))
        .first()[0]
    )
    assert abs(approx_thr - exact_thr) <= 0.05 * abs(spread) + 1e-9


def test_sample_frames_schedule_and_determinism(spark):
    import hashlib

    rows = [
        (1, b"abc", 3500),   # 1000ms spacing -> frames at 0,1000,2000,3000
        (2, b"xy", None),    # NULL duration -> single poster frame
        (3, b"long", 99000), # capped at max_frames
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, duration_ms long"
    )
    got = {}
    for r in MM.sample_frames(df, every_ms=1000, max_frames=8).collect():
        got.setdefault(r["media_id"], []).append(r)
    assert [f["frame_ts_ms"] for f in sorted(got[1], key=lambda x: x["frame_idx"])] == [
        0, 1000, 2000, 3000
    ]
    assert len(got[2]) == 1 and got[2][0]["frame_ts_ms"] == 0
    assert len(got[3]) == 8  # capped
    assert got[1][0]["frame_sha"] == hashlib.sha256(b"abc:0").hexdigest()


def test_resize_image_stub_plumbing(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, b"imgbytes"), (2, None)], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in MM.resize_image(df, 64, 48).collect()}
    assert got[1]["width"] == 64 and got[1]["height"] == 48
    assert got[1]["thumb_sha"] == hashlib.sha256(b"imgbytes:64x48").hexdigest()
    assert got[2]["thumb_sha"] == hashlib.sha256(b":64x48").hexdigest()


def test_line_dedup_first_occurrence_survives(spark):
    df = spark.createDataFrame(
        [
            (1, "unique one\nBOILERPLATE\nunique two"),
            (2, "BOILERPLATE\nunique three"),
            (3, "unique four\nBOILERPLATE"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TX.line_dedup(df, "doc_id", "text").collect()}
    # the boilerplate line survives only in doc 1 (first occurrence)
    assert got[1]["text_dedup"] == "unique one\nBOILERPLATE\nunique two"
    assert got[2]["text_dedup"] == "unique three"
    assert got[3]["text_dedup"] == "unique four"
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (2, 1)


def test_line_dedup_within_doc_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a\n\na\nb"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TX.line_dedup(df, "doc_id", "text").collect()}
    # duplicate 'a' within one doc deduped; empty lines exempt and kept
    assert got[1]["text_dedup"] == "a\n\nb"
    assert got[1]["n_lines"] == 4 and got[1]["n_kept"] == 3
    # a fully-empty doc keeps its (single empty) line via the exemption
    assert got[2]["n_kept"] == 1


def test_line_dedup_string_ids_and_literal_separator(spark):
    # string doc ids elect survivors lexicographically (no numeric
    # packing), and '|' is a LITERAL separator, not a regex
    df = spark.createDataFrame(
        [
            ("a/1", "BOILER|unique one"),
            ("b/2", "unique two|BOILER"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in TX.line_dedup(df, "doc_id", "text", sep="|").collect()
    }
    assert got["a/1"]["text_dedup"] == "BOILER|unique one"
    assert got["b/2"]["text_dedup"] == "unique two"
    assert got["b/2"]["n_kept"] == 1


def test_curation_v2_pipeline_invariants(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    out = QUERIES["ext_curation_v2"](spark, sf_dir)
    rows = out.collect()
    # monotone: exact-dedup + quality gate only ever DROP documents
    assert 0 < len(rows) <= n_docs
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == len(ids)  # one row per surviving doc
    # split completeness: every survivor gets exactly one named split
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # the quality gate actually bit: kept docs sit at/above the threshold
    # relative to the full post-dedup population (gate keeps ~75%)
    assert len(rows) < n_docs
    assert all(r["quality_score"] is not None for r in rows)
    # span removal happened before gating: token counts reflect cleaning
    assert all(r["n_tokens_kept"] >= 1 for r in rows)


class TestGopherQuality:
    def test_rule_branches_on_fixtures(self, spark):
        from usedcars_bigdata_spark.ext.text import gopher_quality

        df = spark.createDataFrame(
            [
                (1, "- b one here\n- b two here\n* three\nplain."),  # bullets
                (2, "goes on...\nand on…\nshort end"),  # ellipsis lines
                (3, "# # ## tags # everywhere…"),  # symbol soup
                (
                    4,
                    ". ".join(
                        ["the quick brown fox jumps over the lazy dog and runs to the green park in the warm sun"]
                        * 3
                    )
                    + ".",
                ),  # passes everything
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in gopher_quality(df, "doc_id", "text").collect()}
        assert out[1]["bullet_line_frac"] == 0.75
        assert not out[1]["gopher_pass"]  # too few words + bullets
        assert out[2]["ellipsis_line_frac"] > 0.3
        assert not out[2]["gopher_pass"]
        assert out[3]["symbol_ratio"] > 0.1
        assert not out[3]["gopher_pass"]
        assert out[4]["n_words"] == 57
        assert out[4]["stopword_hits"] >= 2
        assert out[4]["gopher_pass"]

    def test_stays_native_no_shuffle(self, spark, sf_dir):
        from usedcars_bigdata_spark.ext.text import gopher_quality
        from usedcars_bigdata_spark.sources import load_table

        df = gopher_quality(
            load_table(spark, sf_dir, "documents"), "doc_id", "text"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "Exchange" not in plan  # per-row op: zero shuffles


class TestC4Filters:
    def test_rule_branches(self, spark):
        from usedcars_bigdata_spark.ext.text import c4_line_filters

        df = spark.createDataFrame(
            [
                (1, "this first line has more than five words total.\nshort one.\nno end"),
                (2, "function foo() { return 1; }"),
                (3, "lorem ipsum dolor sit amet, consectetur adipiscing elit."),
                (4, "please enable javascript to view this awesome page!"),
                (5, "a clean sentence with exactly seven words here."),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in c4_line_filters(df, "doc_id", "text").collect()}
        assert out[1]["n_kept_lines"] == 1 and out[1]["c4_keep"]
        assert out[2]["has_brace"] and not out[2]["c4_keep"]
        assert out[3]["has_lorem"] and not out[3]["c4_keep"]
        assert out[4]["has_javascript"] and not out[4]["c4_keep"]
        assert out[5]["c4_keep"]


class TestDomainDivergence:
    def test_identical_domains_have_zero_kl(self, spark):
        from usedcars_bigdata_spark.ext.text import domain_divergence

        df = spark.createDataFrame(
            [("a", "x y z"), ("b", "x y z"), ("a", "x y z"), ("b", "x y z")],
            "source string, text string",
        )
        out = domain_divergence(df, "source", "text").collect()
        assert all(abs(r["kl_divergence"]) < 1e-9 for r in out)

    def test_skewed_domain_scores_higher(self, spark):
        from usedcars_bigdata_spark.ext.text import domain_divergence

        # Overlapping vocabulary: "bal" mirrors the corpus mix closely,
        # "skew" collapses onto one token. (Disjoint vocabularies would give
        # both domains the same KL = ln 2 — mass position, not "weirdness".)
        df = spark.createDataFrame(
            [("bal", "x y x y x y x y"), ("skew", "x x x x x x x x")],
            "source string, text string",
        )
        out = {r["domain"]: r["kl_divergence"] for r in domain_divergence(
            df, "source", "text"
        ).collect()}
        import math

        assert abs(out["skew"] - math.log(16 / 12)) < 1e-6
        assert out["skew"] > out["bal"] > 0.0


class TestBigramLogprob:
    def test_known_values(self, spark):
        import math

        from usedcars_bigdata_spark.ext.text import bigram_logprob_score

        # corpus bigrams: (a,b)x2 from docs 1,2; (b,c)x1 from doc 2
        # contexts: a -> {b:2}/2, b -> {c:1}/1
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b c"), (3, "solo")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in bigram_logprob_score(df, "doc_id", "text").collect()}
        # P(b|a)=1, P(c|b)=1 -> all logps 0, ppl 1
        assert out[1]["n_bigrams"] == 1 and out[1]["avg_logp"] == 0.0
        assert out[2]["n_bigrams"] == 2 and out[2]["ppl"] == 1.0
        assert 3 not in out  # single-token doc has no bigrams

    def test_rare_continuation_scores_lower(self, spark):
        from usedcars_bigdata_spark.ext.text import bigram_logprob_score

        # 'x' continues to 'common' 9 times, to 'rare' once
        rows = [(i, "x common") for i in range(9)] + [(100, "x rare")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["avg_logp"] for r in bigram_logprob_score(
            df, "doc_id", "text"
        ).collect()}
        assert out[100] < out[0] < 0.0 or (out[0] > out[100])


class TestTemplatePrefixes:
    def test_header_detection(self, spark):
        from usedcars_bigdata_spark.ext.text import template_prefixes

        rows = (
            [(f"d{i}", "s1", "site nav bar content body " + str(i)) for i in range(8)]
            + [("dx", "s1", "unique opening words here")]
            + [(f"e{i}", "s2", f"totally {i} different text now") for i in range(3)]
        )
        df = spark.createDataFrame(rows, "doc_id string, source string, text string")
        out = {
            (r["source"], r["prefix_rank"]): (r["prefix"], r["share"])
            for r in template_prefixes(df, "source", "text", n_words=3, top_k=1).collect()
        }
        prefix, share = out[("s1", 1)]
        assert prefix == "site nav bar"
        assert share == round(8 / 9, 6)  # share is rounded to 6 in-query
        # s2 has no repeated header: top prefix share is 1/3
        assert out[("s2", 1)][1] == round(1 / 3, 6)


def test_quantile_normalize_identity_on_single_source(spark):
    """With ONE source, the within-source and global distributions
    coincide, and mid-rank mapping must be the identity: q_norm == q_fp
    for every document."""
    from usedcars_bigdata_spark.ext.text import quantile_normalize_by_source

    docs = spark.createDataFrame(
        [(i, ("word " * (10 + i)).strip(), "only") for i in range(12)],
        "doc_id long, text string, source string",
    )
    out = quantile_normalize_by_source(docs, "doc_id", "text", "source").collect()
    assert len(out) == 12
    for r in out:
        assert r.q_norm == r.q_fp, r


def test_quantile_normalize_is_monotone_within_source(spark, sf_dir):
    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["ext_quantile_normalize"](spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.q_fp, r.q_norm))
    for src, pairs in by_src.items():
        pairs.sort()
        for (a_fp, a_n), (b_fp, b_n) in zip(pairs, pairs[1:]):
            if a_fp < b_fp:
                assert a_n <= b_n, (src, a_fp, a_n, b_fp, b_n)


def test_quantile_normalize_calibrates_shifted_source(spark):
    """A source whose scores are uniformly LOWER than the rest must map
    its best docs onto the global upper range — the cross-source
    calibration that motivates the op. Build a low-scoring source (no
    stopwords) and a high-scoring source (stopword-rich): the low
    source's top document lands above its raw score after normalization."""
    from usedcars_bigdata_spark.ext.text import quantile_normalize_by_source

    low = [
        (i, ("xyz " * (20 + 10 * i)).strip(), "low") for i in range(5)
    ]  # zero stopword hits, varying length
    high = [
        (100 + i, ("the of and " * (30 + 5 * i)).strip(), "high")
        for i in range(5)
    ]
    docs = spark.createDataFrame(
        low + high, "doc_id long, text string, source string"
    )
    out = {
        r.doc_id: r
        for r in quantile_normalize_by_source(
            docs, "doc_id", "text", "source"
        ).collect()
    }
    best_low = max((r for r in out.values() if r.source == "low"), key=lambda r: r.q_fp)
    # its mid-rank within 'low' is 0.9 -> global idx in the top decile,
    # which the stopword-rich source dominates
    assert best_low.q_norm > best_low.q_fp, best_low


def test_perceptual_ahash_radius_with_injected_decoder(spark):
    """Inject a synthetic decoder with CONTROLLED pixels: two images one
    flipped pixel apart must pair at hamming 1; an image with a different
    half-bright pattern must not pair within radius 3; identical payloads
    pair at hamming 0."""
    from usedcars_bigdata_spark.ext.multimodal import image_near_dupes

    base = [10] * 32 + [200] * 32           # half dark, half bright
    near = list(base); near[0] = 200        # one bit flips
    far = [200] * 32 + [10] * 32            # inverted -> hamming 64
    pixels = {1: base, 2: near, 3: far, 4: base}

    def decoder(payload):
        return pixels[int.from_bytes(payload, "big")]

    media = spark.createDataFrame(
        [(i, i.to_bytes(2, "big")) for i in pixels],
        "media_id long, payload binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dupes(media, max_hamming=3, decode_fn=decoder).collect()
    }
    assert pairs.get((1, 4)) == 0        # identical pixels
    assert pairs.get((1, 2)) == 1        # one flipped pixel
    assert pairs.get((2, 4)) == 1
    assert (1, 3) not in pairs and (2, 3) not in pairs and (3, 4) not in pairs


def test_image_near_dupes_matches_payload_ground_truth(spark, sf_dir):
    """Every exact payload duplicate (identical text bytes) MUST pair at
    hamming 0, and every reported pair respects the radius. Duplicate
    presence varies by SF (sf0.001's 500 texts are all distinct), so the
    check is ground-truth-driven, not presence-asserted."""
    from usedcars_bigdata_spark.plans import QUERIES
    from usedcars_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in QUERIES["rows_image_near_dupes"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    groups = [
        sorted(r.ids)
        for r in docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .collect()
    ]
    expected0 = {
        (a, b) for ids in groups for a in ids for b in ids if a < b
    }
    for key in expected0:
        assert pairs.get(key) == 0, key
    for v in pairs.values():
        assert 0 <= v <= 3


def test_stratified_split_exact_counts(spark, sf_dir):
    """Every stratum's split sizes are exactly floor-quantized 80/10/10 —
    the guarantee hash_split cannot make."""
    from usedcars_bigdata_spark.plans import QUERIES

    rows = QUERIES["ext_stratified_split"](spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.split] = r.n_docs
    assert by_src
    for src, parts in by_src.items():
        n = sum(parts.values())
        want_train = (8 * n) // 10
        want_val = (9 * n) // 10 - want_train
        assert parts.get("train", 0) == want_train, (src, parts)
        assert parts.get("val", 0) == want_val, (src, parts)
        assert parts.get("test", 0) == n - want_train - want_val, (src, parts)


# ------------------------------------------------------------------ DSIR
def test_dsir_target_docs_score_higher_on_average(spark, sf_dir):
    """The importance weight must discriminate: documents FROM the target
    domain average a higher log-weight than the rest (they are, by
    construction, target-like), and weights are finite for every doc."""
    import math

    from pyspark.sql import functions as F

    from usedcars_bigdata_spark.ext.text import dsir_importance_weights
    from usedcars_bigdata_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = dsir_importance_weights(
        docs, "doc_id", "text", F.col("source") == "src0", n_buckets=512
    )
    joined = w.join(docs.select("doc_id", "source"), "doc_id")
    rows = joined.collect()
    assert all(math.isfinite(r.dsir_logw) for r in rows)
    tgt = [r.dsir_logw for r in rows if r.source == "src0"]
    rest = [r.dsir_logw for r in rows if r.source != "src0"]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_degenerate_target_equals_raw_gives_zero_weights(spark):
    """If the target IS the whole corpus, p_target == p_raw bucket for
    bucket, so every document's log-ratio sum is exactly 0."""
    from pyspark.sql import functions as F

    from usedcars_bigdata_spark.ext.text import dsir_importance_weights

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c d"), (3, "a a d")], ["id", "txt"]
    )
    out = dsir_importance_weights(
        df, "id", "txt", F.lit(True), n_buckets=64
    ).collect()
    assert len(out) == 3
    assert all(r.dsir_logw == 0.0 for r in out)


# ------------------------------------------------------------------ BM25
def test_bm25_rank_ordering_and_monotonicity(spark):
    """Within a term: ranks are 1..k in rounded-score order; with equal
    document length, higher tf scores strictly higher (tf saturation is
    monotone); a term absent from a doc contributes no row."""
    from usedcars_bigdata_spark.ext.text import bm25_scores

    docs = [
        (1, "x x x y y z"),
        (2, "x y y y z z"),
        (3, "y y y z z z"),
        (4, "q q q q q q"),
    ]
    df = spark.createDataFrame(docs, ["id", "txt"])
    out = bm25_scores(df, "id", "txt", ["x", "y"], top_k=10).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r.term, []).append(r)
    # doc 4 never matches; term x absent from docs 3/4
    assert {r.id for r in by_term["x"]} == {1, 2}
    assert {r.id for r in by_term["y"]} == {1, 2, 3}
    for term, rows in by_term.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.bm25 for r in rows]
        assert scores == sorted(scores, reverse=True)
    # equal dl (all 6 tokens): tf 3 > tf 1 for x
    x = {r.id: r for r in by_term["x"]}
    assert x[1].tf == 3 and x[2].tf == 1
    assert x[1].bm25 > x[2].bm25


def test_bm25_terms_are_bound_literals_not_sql(spark):
    """Terms containing quotes/backslashes are matched verbatim, never
    interpolated into SQL (the stack() F.expr form was injectable; the
    inline(array(struct)) unpivot binds terms as literals)."""
    from usedcars_bigdata_spark.ext.text import bm25_scores

    hostile = ["it's", "a\\b", "x', id) as (t, v) --"]
    df = spark.createDataFrame(
        [(1, "it's a\\b plain"), (2, "plain only here")], ["id", "txt"]
    )
    out = bm25_scores(df, "id", "txt", hostile, top_k=10).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r.term, set()).add(r.id)
    assert by_term.get("it's") == {1}
    assert by_term.get("a\\b") == {1}
    # the injection-shaped term matches nothing and emits no rows
    assert "x', id) as (t, v) --" not in by_term


# ----------------------------------------------------------------- flesch


def test_flesch_hand_computed_single_doc(spark):
    from usedcars_bigdata_spark.ext.text import flesch_reading_ease

    # "The cat sat. It ran!" -> words=6? no: The,cat,sat,It,ran = 5
    # sentences = 2 ([.] and [!]); syllables (vowel groups incl y):
    # e,a,a,I,a = 5
    df = spark.createDataFrame(
        [(1, "The cat sat. It ran!", "s1")], ["doc_id", "text", "source"]
    )
    r = flesch_reading_ease(df, "text", "source").collect()[0]
    assert (r.words, r.sentences, r.syllables) == (5, 2, 5)
    want = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert r.flesch_corpus == round(want, 6)
    assert r.n_easy == (1 if want >= 60 else 0)


def test_flesch_empty_and_no_punct_docs(spark):
    from usedcars_bigdata_spark.ext.text import flesch_reading_ease

    df = spark.createDataFrame(
        [
            (1, "no punctuation here", "s"),
            (2, "12345 !!!", "s"),  # zero words -> filtered out
        ],
        ["doc_id", "text", "source"],
    )
    r = flesch_reading_ease(df, "text", "source").collect()[0]
    assert r.n_docs == 1  # the zero-word doc is dropped
    assert r.sentences == 1  # greatest(count, 1)


# ------------------------------------------------------------- code detect


def test_code_prose_detect_separates(spark):
    from usedcars_bigdata_spark.ext.text import code_prose_detect

    code = "def f(x): return {1: [x]}; y = f(2); z = (y, y)"
    prose = "The quick brown fox jumps over the lazy dog again and again."
    df = spark.createDataFrame(
        [(1, code, "s"), (2, prose, "s")], ["doc_id", "text", "source"]
    )
    r = code_prose_detect(df, "text", "source").collect()[0]
    assert r.n_docs == 2
    assert r.n_code == 1  # only the code doc crosses the 5% density
    # hand-count the code doc's symbols
    assert r.brackets == sum(code.count(ch) for ch in "{}()[]")
    assert r.semicolons == code.count(";") + prose.count(";")
    assert r.assigns == code.count("=")


# ------------------------------------------------------- rule overlap matrix


def test_quality_rule_overlap_identical_and_disjoint(spark):
    from usedcars_bigdata_spark.ext.text import quality_rule_overlap

    # One long prose doc passing everything; one symbol-heavy doc.
    prose = ("the cat and the dog sat in the house and it is a good day "
             * 10)
    codey = "{}[]();;== " * 40
    df = spark.createDataFrame(
        [(1, prose, "s"), (2, codey, "s")], ["doc_id", "text", "source"]
    )
    out = {
        (r.rule_a, r.rule_b): r
        for r in quality_rule_overlap(df, "text").collect()
    }
    assert len(out) == 10  # 4 rules -> 10 unordered pairs incl. self
    # self-pair jaccard is 1 whenever the rule passes at least one doc
    self_len = out[("len_band", "len_band")]
    assert self_len.n_both == self_len.n_a and self_len.jaccard == 1.0
    # prose passes stopword; codey does not -> stopword survivor set = {1}
    assert out[("stopword", "stopword")].n_a == 1


# ---------------------------------------------------------- span corruption


def test_span_corruption_spans_cover_following_tokens(spark):
    from usedcars_bigdata_spark.ext.text import span_corruption_stats

    # start_rate=1: every position starts a span -> everything masked
    df = spark.createDataFrame(
        [(1, "a b c d e f", "s")], ["doc_id", "text", "source"]
    )
    r = span_corruption_stats(
        df, "text", "source", "doc_id", start_rate=1.0, span_len=3
    ).collect()[0]
    assert r.n_tokens == 6
    assert r.n_spans == 6
    assert r.n_masked == 6 and r.mask_fraction == 1.0
    # start_rate=0: nothing masked, checksum 0
    r0 = span_corruption_stats(
        df, "text", "source", "doc_id", start_rate=0.0, span_len=3
    ).collect()[0]
    assert r0.n_masked == 0 and r0.masked_checksum == 0


def test_span_corruption_fraction_tracks_rate(spark):
    from usedcars_bigdata_spark.ext.text import span_corruption_stats

    text = " ".join(f"w{i}" for i in range(2000))
    df = spark.createDataFrame([(1, text, "s")], ["doc_id", "text", "source"])
    r = span_corruption_stats(
        df, "text", "source", "doc_id", start_rate=0.05, span_len=3
    ).collect()[0]
    # E[mask] = 1 - (1-.05)^3 ~ 0.1426; binomial noise at n=2000
    assert 0.10 < r.mask_fraction < 0.19


# --------------------------------------------------------- greedy coverage


def test_greedy_coverage_picks_best_then_marginal(spark):
    from usedcars_bigdata_spark.ext.text import greedy_coverage_select

    # doc 1: items a,b,c,d (best). doc 2: c,d,e (marginal gain 1: e).
    # doc 3: a,b (gain 0 after round 1 -> never beats doc 2)
    pairs = spark.createDataFrame(
        [(1, x) for x in "abcd"]
        + [(2, x) for x in "cde"]
        + [(3, x) for x in "ab"],
        ["did", "w"],
    )
    out = {r.round: r for r in greedy_coverage_select(pairs, k=2).collect()}
    assert (out[1].selected_id, out[1].gain, out[1].covered_total) == (1, 4, 4)
    assert (out[2].selected_id, out[2].gain, out[2].covered_total) == (2, 1, 5)


def test_greedy_coverage_tie_breaks_on_id(spark):
    from usedcars_bigdata_spark.ext.text import greedy_coverage_select

    pairs = spark.createDataFrame(
        [(7, "x"), (7, "y"), (3, "p"), (3, "q")], ["did", "w"]
    )
    out = greedy_coverage_select(pairs, k=1).collect()[0]
    assert out.selected_id == 3  # equal gain 2 -> min id wins


# --- r9 review: text-op robustness fixes ---


def test_zipf_fit_degenerate_corpora_null_not_crash(spark):
    from usedcars_bigdata_spark.ext.text import zipf_fit

    # every token appears once: zero y variance -> r2 NULL, slope real
    flat = spark.createDataFrame(
        [(1, "alpha beta gamma")], ["doc_id", "text"]
    )
    row = zipf_fit(flat, "text")
    r = row.first()
    assert r.r2 is None
    # one distinct token: zero x variance -> slope NULL too
    solo = spark.createDataFrame([(1, "aa aa aa")], ["doc_id", "text"])
    r1 = zipf_fit(solo, "text").first()
    assert r1.slope is None


def test_hash_split_ignores_preexisting_bucket_column(spark):
    import pytest

    from usedcars_bigdata_spark.ext.text import hash_split

    base = spark.createDataFrame(
        [(i,) for i in range(200)], ["doc_id"]
    )
    want = {r.doc_id: (r.bucket, r.split)
            for r in hash_split(base, "doc_id").collect()}
    # same ids with a hostile pre-existing 'bucket' column: decisions
    # must not read it (verified shadowing before the fix)
    tainted = spark.createDataFrame(
        [(i, 999999) for i in range(200)], ["doc_id", "bucket"]
    )
    got = {r.doc_id: (r.bucket, r.split)
           for r in hash_split(tainted, "doc_id").collect()}
    assert got == want
    with pytest.raises(ValueError, match=r"\[1, 65536\]"):
        hash_split(base, "doc_id", buckets=100000)


def test_mixture_sample_ignores_preexisting_bucket_column(spark):
    from usedcars_bigdata_spark.ext.text import mixture_sample

    base = spark.createDataFrame(
        [(i, "en") for i in range(100)], ["doc_id", "grp"]
    )
    want = {r.doc_id: (r.bucket, r.kept)
            for r in mixture_sample(base, "doc_id", "grp", {"en": 0.5}).collect()}
    tainted = spark.createDataFrame(
        [(i, "en", 999999) for i in range(100)], ["doc_id", "grp", "bucket"]
    )
    got = {r.doc_id: (r.bucket, r.kept)
           for r in mixture_sample(tainted, "doc_id", "grp", {"en": 0.5}).collect()}
    assert got == want
    assert any(k for _, k in want.values()) and not all(
        k for _, k in want.values()
    )


def test_greedy_coverage_select_string_ids(spark):
    from usedcars_bigdata_spark.ext.text import greedy_coverage_select

    pairs = spark.createDataFrame(
        [("docA", "x"), ("docA", "y"), ("docB", "y"), ("docB", "z"),
         ("docC", "z")],
        ["did", "w"],
    )
    out = greedy_coverage_select(pairs, k=2).collect()
    assert out[0].selected_id in ("docA", "docB")
    assert isinstance(out[0].selected_id, str)
    # greedy invariant: covered total is non-decreasing
    assert out[-1].covered_total >= out[0].covered_total


def test_vocabulary_topk_filters_blank_doc_pseudo_token(spark):
    from usedcars_bigdata_spark.ext.text import vocabulary_topk

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b a")], ["doc_id", "text"]
    )
    toks = {r.token for r in vocabulary_topk(df, "doc_id", "text").collect()}
    assert "" not in toks and toks == {"a", "b"}

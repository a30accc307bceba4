"""Text-analysis operators for document corpora — all native Column
expressions (split/filter/transform/aggregate); no Python in the row path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.window import register_hub

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# Tiny per-language stopword profiles for the heuristic language ID.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "pt": ["o", "a", "de", "que", "e"],
}


def _words(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


# BPE-ish tokenizer regex (GPT-2-flavored, simplified to constructs with
# identical semantics in Java regex and RE2): a run of letters, a single
# digit, or a single non-alphanumeric non-space symbol.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: whitespace token count, BPE-ish
    subword-regex token count, char count, average token length. Integer
    math + one division → cross-engine exact."""
    w = _words(text_col)
    n_tokens = F.size(w)
    n_nonspace = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_actual"),
        F.round(n_nonspace / n_tokens, 4).alias("avg_token_len"),
    )


def _stopword_pred(x: Column, words: list[str]) -> Column:
    pred = F.lit(False)
    for s in words:
        pred = pred | (x == s)
    return pred


def quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    passthrough: "tuple[str, ...]" = (),
) -> DataFrame:
    """Heuristic quality score in [0,1]: blend of stopword ratio (fluency
    proxy) and length adequacy (≥100 tokens saturates). Deterministic
    integer/ratio math, engine-portable. ``passthrough`` names extra
    input columns to carry through the projection — composition callers
    (ext_curation_pipeline) use it to keep the whole stage ONE scan
    instead of joining a second projection of the same table back on the
    id (r11 scan audit)."""
    w = _words(text_col)
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: _stopword_pred(x, STOPWORDS)))
    stop_ratio = n_stop / n_tokens
    len_score = F.least(n_tokens, F.lit(100)) / F.lit(100.0)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(stop_ratio * 0.5 + len_score * 0.5, 4).alias("quality_score"),
    )


def langid_heuristic(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID: score = hits of each language's profile;
    argmax wins (ties broken by profile order); no hits → 'und'. A real
    deployment swaps in fastText via a pandas UDF — the plumbing (pure
    column-expression scoring, no shuffle) is the point here."""
    w = _words(text_col)

    def profile_pred(prof: list[str]):
        # NB: the lambda must be single-arg — a second (even defaulted)
        # parameter makes PySpark pass the array index as that argument.
        return lambda x: _stopword_pred(x, prof)

    scores = {
        lang: F.size(F.filter(w, profile_pred(prof)))
        for lang, prof in LANG_PROFILES.items()
    }
    best = None
    for lang, s in scores.items():
        best = s if best is None else F.greatest(best, s)
    pick = None
    for lang, s in scores.items():
        pick = F.when(s == best, lang) if pick is None else pick.when(s == best, lang)
    lang_col = F.when(best > 0, pick).otherwise(F.lit("und"))
    return df.select(F.col(id_col), lang_col.alias("lang_pred"), best.alias("lang_hits"))


def rolling_fingerprint(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    mod: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Mod-p document fingerprint: hash each word n-gram, keep hashes
    ≡ 0 (mod ``mod``) — a content-defined ~1/mod sample that survives
    reordering of unrelated regions (winnowing-style). Output: sorted array
    of selected hashes per doc.

    ``hash_fn``: "xxhash64" (default, the 64-bit scale tier) or "md5_32"
    (int(md5(gram)[:8], 16) — a 32-bit hash both Spark and DuckDB can
    evaluate, the cross-engine-replayable tier in the
    minhash_lsh_md5_pairs tradition; same selection mechanism, smaller
    hash space)."""
    if hash_fn == "xxhash64":
        gram_hash = "xxhash64(concat_ws(' ', slice(__words, i, {n})))"
    elif hash_fn == "md5_32":
        gram_hash = (
            "CAST(conv(substring(md5(concat_ws(' ', "
            "slice(__words, i, {n}))), 1, 8), 16, 10) AS BIGINT)"
        )
    else:  # pragma: no cover - guard
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    grams = F.expr(
        # sequence(1, 0) would produce a DESCENDING [1, 0] — guard short docs.
        f"IF(size(__words) >= {n}, "
        f"transform(sequence(1, size(__words) - {n - 1}), "
        f"i -> {gram_hash.format(n=n)}), "
        f"array())"
    )
    with_words = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__words")
    )
    selected = F.array_sort(
        F.array_distinct(F.filter(grams, lambda h: F.pmod(h, F.lit(mod)) == 0))
    )
    return with_words.select(
        F.col(id_col),
        selected.alias("fingerprint"),
        F.size(selected).alias("fp_size"),
    )


# PII patterns restricted to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB oracle): char classes, bounded repetition,
# \b word boundaries. No backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d -]{7,}\d",
}


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Detect and redact PII-shaped spans (emails, IPv4 addresses,
    phone-number runs) — the standard scrub stage of a training corpus.

    Redaction runs email → ip → phone so the broad phone pattern never
    eats digits that belong to a structured match, and each count is taken
    on the text AS IT STANDS at that stage — so ``n_phones`` counts actual
    phone redaction events, not raw-text pattern hits (a 9-digit run
    inside an email local-part is counted once, as an email, never again
    as a phone). Counts therefore always agree with the placeholders in
    ``text_redacted``. All native regexp_count/regexp_replace — narrow,
    codegen-fused, zero shuffles, so it composes with a scan at any scale.

    Output: (id, n_emails, n_ips, n_phones, text_redacted)."""
    red = F.col(text_col)
    counts = {}
    for kind in ("email", "ip", "phone"):  # order matters; see docstring
        counts[kind] = (
            F.regexp_count(red, F.lit(PII_PATTERNS[kind]))
            .cast("long")
            .alias(f"n_{kind}s")
        )
        red = F.regexp_replace(red, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return df.select(
        F.col(id_col),
        counts["email"],
        counts["ip"],
        counts["phone"],
        red.alias("text_redacted"),
    )


def _with_grams(
    df: DataFrame, id_col: str, text_col: str, n: int, out: str = "__grams"
) -> DataFrame:
    """Project (id, word-n-gram array) with the tokenization hoisted: the
    regex split is evaluated ONCE per row into ``__words`` before the
    per-position transform. Inlining split() inside the lambda makes
    Catalyst re-run it for every n-gram position (~n_words× slower — the
    anti-pattern documented at ext/dedup.py word_shingles; hoisting it
    measured 8× on the contamination query at sf0.1). Short docs get []."""
    with_words = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__words")
    )
    grams = F.expr(
        f"IF(size(__words) >= {n}, "
        f"transform(sequence(1, size(__words) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__words, i, {n}))), array())"
    )
    return with_words.select(F.col(id_col), grams.alias(out))


def repetition_stats(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Intra-document repetition: fraction of word n-gram occurrences that
    are repeats of an earlier n-gram in the same document
    (1 - distinct/total). High values flag boilerplate-stuffed or
    degenerate documents — a standard corpus-quality signal. Narrow
    per-row array math; documents with fewer than ``n`` words are dropped
    (no grams to judge)."""
    with_grams = _with_grams(df, id_col, text_col, n)
    total = F.size(F.col("__grams"))
    distinct = F.size(F.array_distinct("__grams"))
    return (
        with_grams.select(F.col(id_col), total.alias("n_grams"), distinct.alias("n_distinct"))
        .filter(F.col("n_grams") > 0)
        .select(
            id_col,
            "n_grams",
            "n_distinct",
            F.round(1.0 - F.col("n_distinct") / F.col("n_grams"), 4).alias("rep_ratio"),
        )
    )


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: per document, the fraction of its
    DISTINCT word n-grams that also occur in ``benchmark`` (an eval/test
    set). ``benchmark`` is force-broadcast so the corpus-side scan never
    shuffles (the alternative, a shuffle join keyed on grams, would move
    the whole corpus).

    The broadcast assumption holds only when ``benchmark`` is a REAL eval
    set — a fixed number of documents, independent of corpus size — whose
    distinct grams fit Spark's 8 GB broadcast limit. Passing a fraction of
    the corpus itself as the benchmark would grow the broadcast with the
    corpus and fail outright at scale; callers own that contract.

    Output: (id, n_grams, n_hit, contamination)."""
    corpus = _with_grams(df, id_col, text_col, n).select(
        F.col(id_col), F.explode(F.array_distinct("__grams")).alias("gram")
    )
    bench = (
        _with_grams(benchmark, id_col, text_col, n)
        .select(F.explode("__grams").alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = corpus.join(F.broadcast(bench), "gram", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("contamination"),
        )
    )


def length_histogram(
    df: DataFrame, id_col: str, text_col: str, bucket_tokens: int = 16
) -> DataFrame:
    """Corpus length profile: histogram of whitespace token counts in
    fixed-width integer buckets (exact integer math — no float binning, so
    bucket edges agree across engines). One partial-aggregated shuffle on
    a tiny key space."""
    n_tokens = F.size(_words(text_col))
    return (
        df.select((n_tokens.cast("long") / F.lit(bucket_tokens)).cast("long").alias("bucket"),
                  n_tokens.cast("long").alias("__n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
            F.min("__n").alias("min_tokens"),
            F.max("__n").alias("max_tokens"),
        )
    )


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_docs: int = 2,
    top: int = 20,
) -> DataFrame:
    """Cross-document boilerplate detection: word n-grams appearing in at
    least ``min_docs`` DISTINCT documents, ranked by document frequency
    (ties broken by gram text for determinism). The C4-style signal for
    headers/footers/licence blocks repeated across a corpus.

    Shape: explode → per-doc distinct (map-side combinable) → count by
    gram → top-k. The final ordered limit plans as
    TakeOrderedAndProject, so only ``top`` rows ever reach the driver."""
    grams = _with_grams(df, id_col, text_col, n).select(
        F.col(id_col), F.explode(F.array_distinct("__grams")).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        counts.filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), F.col("gram"))
        .limit(top)
    )


def normalize_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    out: str = "text_norm",
) -> DataFrame:
    """Deterministic text cleanup — the standard first stage of a training
    corpus pipeline: optional lowercasing, control-character removal, and
    whitespace collapse (runs → single space, ends trimmed). All native
    regexp/lower expressions: narrow, codegen-fused, zero shuffles.

    Unicode NFC/NFKC normalization is deliberately NOT done here — Spark
    has no native normalizer and a per-row Python UDF would put Python in
    the hot path of the widest table; run ICU normalization at ingest (or
    a pandas_udf variant) if the corpus needs it."""
    c = F.col(text_col)
    if strip_control:
        c = F.regexp_replace(c, r"[\p{Cntrl}]", " ")
    if lowercase:
        c = F.lower(c)
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.select(F.col(id_col), c.alias(out))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent ID
    hash — the scale-correct way to split a corpus: no global shuffle, no
    sampling state, stable under re-runs, appends, and repartitioning
    (a given id lands in the same split forever, unlike sample()/
    randomSplit whose draws depend on partition layout). Standard
    holdout-set practice for training pipelines.

    ``fractions`` maps split name → fraction, in insertion order, summing
    to 1.0 (default 80/10/10 train/val/test). The id is md5-hashed
    (engine-portable, unlike xxhash64) and its first 4 hex digits taken
    mod ``buckets``; cumulative fraction thresholds over that bucket pick
    the split. Pure narrow projection — composes with any scan.

    Output: (id, bucket, split)."""
    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    # 4 hex digits = 16 bits of hash: buckets beyond 65536 would leave
    # the upper buckets permanently empty and silently put 100% of docs
    # in the first split (r9 review). Non-divisors of 65536 carry a
    # ≤1/65536-per-bucket modulo bias (~1.5% relative at buckets=1000)
    # — fine for a holdout split, stated here so it is a choice.
    if not 1 <= buckets <= 65536:
        raise ValueError(
            f"buckets must be in [1, 65536] (16-bit hash): got {buckets}"
        )
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % buckets
    )
    expr = None
    edge = 0.0
    names = list(fractions)
    for name in names[:-1]:
        edge += fractions[name]
        # compare the bucket EXPRESSION, not F.col("bucket"): a real
        # input column named "bucket" would win name resolution over
        # the lateral alias and silently drive every split decision
        # (r9 review — verified shadowing)
        cond = bucket < int(round(edge * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.select(
        F.col(id_col), bucket.alias("bucket"), expr.alias("split")
    )


def vocabulary_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary builder: the ``top`` most frequent whitespace
    tokens with total occurrence count and document frequency — the
    counting pass behind tokenizer/vocab construction (BPE seeding, OOV
    analysis, stopword discovery).

    Shape: explode → per-(token, doc) count (map-side combinable — the
    shuffle carries one row per distinct token per doc, not per
    occurrence) → per-token totals → ordered limit, which plans as
    TakeOrderedAndProject so only ``top`` rows reach the driver. Ties
    break on the token text for determinism. The empty-string
    pseudo-token from blank/whitespace-only docs (split('') = ['']) is
    filtered — it is an artifact, not vocabulary, and the LM-gate ops in
    this module already exclude it (r9 review: a blank-heavy web corpus
    put '' at the TOP of the vocab)."""
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(_words(text_col)).alias("token"),
    ).filter(F.col("token") != "")
    per_doc = toks.groupBy("token", "__doc").agg(F.count(F.lit(1)).alias("__n"))
    counts = per_doc.groupBy("token").agg(
        F.sum("__n").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        counts.filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(top)
    )


def normalize_text_unicode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    form: str = "NFC",
    out: str = "text_norm",
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the stage
    ``normalize_text`` deliberately defers: Spark has no native
    normalizer, so this is the one text operator that runs Python, as an
    Arrow-batched ``mapInPandas`` over only (id, text) — never
    row-at-a-time serde, and the projection keeps the batch narrow. A real
    multilingual corpus needs this exactly once, at ingest; everything
    downstream stays native.

    The per-batch function is defined locally so cloudpickle serializes
    it BY VALUE (the pattern from ext/multimodal.py): executors need no
    usedcars_bigdata_spark on their PYTHONPATH, which is what keeps the
    query runnable under the driver harness's plain session."""
    from pyspark.sql import types as T

    if form not in {"NFC", "NFKC", "NFD", "NFKD"}:
        raise ValueError(f"unknown Unicode normalization form: {form!r}")
    schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.StringType(), True)]
    )

    def run(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out: [
                        unicodedata.normalize(form, t) if t is not None else None
                        for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def pack_shards(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    order_col: str | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Contiguous sequence packing: assign documents (ordered by
    ``order_col``, default the id) to consecutive shards so each shard
    holds ~``budget`` tokens — the sharding step before concatenating
    documents into fixed-size training sequences.

    Semantics (deterministic): a document starting before a budget
    boundary belongs to the shard of its starting offset —
    ``shard = floor(cumulative_tokens_before / budget)`` — so shards can
    overrun the budget by at most one document's tail, exactly like
    streaming concatenation with no mid-document splits. True bin packing
    (restart at the boundary) is order-dependent and inherently
    sequential; this prefix-sum form is the one that scales.

    Two execution shapes, identical output:

    - ``bucket_width=None``: one global-ordering window — a SINGLE task
      sorts the whole corpus. Fine at test scale; kept as the
      parity/oracle form.
    - ``bucket_width=W`` (requires a NUMERIC order column): distributed
      two-pass prefix sum. Rows are range-bucketed by
      ``floor(order / W)`` (monotone in the order, so buckets partition
      the global order); pass 1 aggregates per-bucket token sums (tiny —
      one row per bucket) and turns them into cumulative bucket offsets
      with a window over that tiny table; pass 2 broadcasts the offsets
      back and runs the prefix-sum window PARTITIONED by bucket. The
      corpus shuffles once (hash on bucket for the window); the only
      single-partition work is over the n_buckets-row aggregate. Pick W
      so each bucket holds enough rows to parallelize while n_buckets
      stays small (≲1e6) — the offsets table must broadcast.

    Output: (id, token_count, shard, offset_in_shard)."""
    order = F.col(order_col if order_col is not None else id_col)
    from pyspark.sql import Window

    if bucket_width is None:
        base = df
        w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
        before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    else:
        # Internal names follow the two-pass offset-table convention
        # (__b = bucket id, __bc = bucket sum, __bt = bucket offset):
        # the registry-wide SinglePartition audit exempts exactly these
        # tokens as bounded-by-construction, so the tiny offsets window
        # below stays distinguishable from a genuine data-sized funnel
        # (r9 review: the old __bucket name only passed the audit via a
        # loose substring match that also exempted real funnels).
        from ..operators.window import _check_reserved

        _check_reserved(df, {"__b", "__bc", "__bt"})
        with_bucket = df.withColumn(
            "__b", F.floor(order / F.lit(bucket_width)).cast("long")
        )
        sums = with_bucket.groupBy("__b").agg(
            F.sum(token_count_col).alias("__bc")
        )
        w_buckets = Window.orderBy("__b").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = sums.select(
            "__b",
            F.coalesce(F.sum("__bc").over(w_buckets), F.lit(0)).alias(
                "__bt"
            ),
        )
        base = with_bucket.join(F.broadcast(offsets), "__b")
        w_in = (
            Window.partitionBy("__b")
            .orderBy(order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        before = F.col("__bt") + F.coalesce(
            F.sum(token_count_col).over(w_in), F.lit(0)
        )
    return base.select(
        F.col(id_col),
        F.col(token_count_col),
        F.floor(before / F.lit(budget)).cast("long").alias("shard"),
        (before % F.lit(budget)).cast("long").alias("offset_in_shard"),
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    buckets: int = 1000,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-group quota sampling — the "data mixture" step of
    a training pipeline: downweight overrepresented groups (a dominant
    language / source / domain) to target retention rates without a global
    shuffle or any sampling state. A doc is kept iff its salted md5 bucket
    falls below its group's rate threshold, so membership is stable under
    re-runs, appends, and repartitioning, and independent draws per doc
    give each group its target rate in expectation with no coordination.

    The hash is SALTED (``md5(salt || ':' || id)``) so mixture decisions
    are independent of ``hash_split``'s train/val/test assignment — using
    the same hash for both would correlate the mixture with the holdout
    split (e.g. every dropped doc also being a train doc). md5 keeps it
    engine-portable for the oracle, unlike xxhash64.

    Pure narrow projection: zero shuffles, composes with any scan.

    Output: (id, group, bucket, kept)."""
    if not 1 <= buckets <= 65536:
        raise ValueError(
            f"buckets must be in [1, 65536] (16-bit hash): got {buckets}"
        )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    thr = None
    for g, r in rates.items():
        t = int(round(r * buckets))
        cond = F.col(group_col) == g
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_thr = int(round(default_rate * buckets))
    thr = F.lit(default_thr) if thr is None else thr.otherwise(default_thr)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        bucket.alias("bucket"),
        # compare the bucket EXPRESSION: an input column named "bucket"
        # would shadow the lateral alias and drive every keep decision
        # with stale values (r9 review — verified)
        (bucket < thr).alias("kept"),
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    postings_cap: int = 20,
    min_docs: int = 1,
    n_salts: int = 16,
) -> DataFrame:
    """Distributed inverted-index build: token → document frequency plus a
    CAPPED, sorted postings sample (the ``postings_cap`` smallest doc ids)
    — the index layer under corpus search, contamination lookups, and
    targeted dedup.

    The cap is structural, not cosmetic: an uncapped
    ``collect_list(doc_id)`` puts a stopword's entire corpus-wide postings
    into ONE aggregation buffer (gigabytes for a common token at 100 TB).
    And the cap itself is computed as a SALTED two-level min-k, because a
    single per-token row_number window has the same skew problem at the
    task level: a stopword appearing in half the corpus makes one giant
    window partition even though only ``postings_cap`` rows survive.

    Level 1 partitions by (token, salt = xxhash64(doc) % n_salts) and
    keeps each salt's ``postings_cap`` smallest doc ids — the widest
    window task shrinks by 1/n_salts. Level 2 merges: a second min-k over
    the survivors, whose per-token partition is bounded by
    n_salts × postings_cap rows by construction. Global min-k equals
    min-k of the union of per-salt min-k's, so the output contract is
    unchanged (pytest-pinned against the single-window form). The true
    document frequency is counted separately on the uncut (token, doc)
    set; both aggregates reuse the same exploded pairs.

    Output: (token, n_docs, postings) with postings sorted ascending."""
    from ..operators.window import register_hub

    # persisted hub: the df-counts aggregate AND the salted min-k both
    # consume the exploded-distinct pairs — without the persist each
    # consumer re-ran the corpus scan + explode + distinct shuffle
    # (r9 review; released via release_hubs like every library hub)
    pairs = register_hub(
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(_words(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")  # blank-doc pseudo-token (r9)
        .distinct()
        .persist()
    )
    from pyspark.sql import Window

    counts = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("n_docs"))
    salted = pairs.withColumn(
        "__salt", F.pmod(F.xxhash64("__doc"), F.lit(n_salts))
    )
    level1 = salted.withColumn(
        "__rn1",
        F.row_number().over(
            Window.partitionBy("token", "__salt").orderBy("__doc")
        ),
    ).filter(F.col("__rn1") <= postings_cap)
    ranked = level1.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("token").orderBy("__doc")),
    ).filter(F.col("__rn") <= postings_cap)
    postings = ranked.groupBy("token").agg(
        F.array_sort(F.collect_list("__doc")).alias("postings")
    )
    return (
        counts.filter(F.col("n_docs") >= min_docs)
        .join(postings, "token")
        .select("token", "n_docs", "postings")
    )


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_line_chars: int = 1,
) -> DataFrame:
    """Corpus-wide LINE-level deduplication — the sub-document dedup pass
    (RefinedWeb/CCNet style) that strips repeated boilerplate lines
    (headers, nav bars, license blurbs) exact document dedup can't touch:
    a line survives only at its FIRST corpus occurrence (min doc id, then
    min position), every later copy is dropped, and documents are
    reassembled from their surviving lines in original order.

    Shape: posexplode to (doc, pos, line) → survivor election as a
    grouped min over the (doc, pos) STRUCT (struct min is lexicographic,
    so this is exactly "min doc then min position" and works for ANY
    orderable id type — string URLs/UUIDs included; a groupBy, not a
    per-line window, so hot boilerplate lines partial-aggregate instead
    of concentrating one window task) → equi-join back on the line hash →
    per-doc reassembly via sorted struct collect. Two shuffles total
    (line key, then doc key), both map-side combinable. Lines shorter
    than ``min_line_chars`` are exempt (blank separators carry no dedup
    signal). ``sep`` is taken LITERALLY (regex-quoted before the split —
    '|' or '.' separators do not explode into regex semantics).

    Output: (id, text_dedup, n_lines, n_kept)."""
    sep_rx = "\\Q" + sep + "\\E"  # literal separator, not a regex
    # The exploded line table feeds four consumers (survivor election,
    # survivor join, exempt lines, per-doc totals) — materialized so the
    # explode runs once (audit: 4 documents scans without, 1 after).
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_rx)).alias("__pos", "__line"),
    ).localCheckpoint(eager=True)
    eligible = lines.filter(F.length("__line") >= min_line_chars)
    # Election groups on (hash, line) — NOT the hash alone: an xxhash64
    # collision between two distinct lines would otherwise elect one
    # survivor for both groups and silently delete every occurrence of
    # the losing line corpus-wide, including its first (r9 review —
    # content loss, not statistical noise). The hash still leads the
    # shuffle key; map-side combine collapses repeats before the line
    # bytes travel, so the wide key costs per-DISTINCT-line only.
    first = (
        eligible.select(
            F.xxhash64("__line").alias("__h"),
            F.col("__line").alias("__l"),
            F.struct(F.col(id_col).alias("__id"), F.col("__pos").alias("__p")).alias(
                "__key"
            ),
        )
        .groupBy("__h", "__l")
        .agg(F.min("__key").alias("__first"))
    )
    survivors = eligible.join(
        first,
        (F.xxhash64(F.col("__line")) == F.col("__h"))
        & (F.col("__line") == F.col("__l"))
        & (F.col(id_col) == F.col("__first.__id"))
        & (F.col("__pos") == F.col("__first.__p")),
    ).select(id_col, "__pos", "__line")
    exempt = lines.filter(F.length("__line") < min_line_chars).select(
        id_col, "__pos", "__line"
    )
    kept = survivors.unionByName(exempt)
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.expr(
                "transform(array_sort(collect_list(struct(__pos, __line))),"
                " s -> s.__line)"
            ),
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    ndigits: int = 4,
) -> DataFrame:
    """Per-document top-k TF-IDF terms, pure DataFrame ops (no MLlib, no
    fixed-width hashing — exact terms): tf = in-doc occurrences, idf =
    ln((N+1)/(df+1)) with the +1 smoothing that keeps corpus-wide terms
    finite. The keyword-extraction / topic-labeling primitive.

    Shape: explode → per-(doc, token) counts (map-side combinable) →
    token document frequencies (second aggregate over the same rows) →
    equi-join tf with df keyed on the token (both sides already
    aggregated — the join moves vocabulary-sized, not corpus-sized,
    data) → per-doc top-k via row_number (ties broken by token text so
    the selected set is deterministic). N is a 1-row aggregate joined by
    broadcast.

    Output: (id, token, tf, df, tfidf, rank)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(_words(text_col)).alias("token")
    )
    # (doc, token) counts feed both the df aggregate and the tf side of
    # the join — materialized so the explode runs once (audit: 3 scans
    # lazy, 2 after: this pass + the 1-row N count)
    tf = (
        toks.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("__n") + 1) / (F.col("df") + 1)), ndigits
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def group_cap_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group downsampling to at most ``cap`` rows — the
    "no source dominates the corpus" quota step of a data mixture. Rows
    are ranked inside each group by a salted content-independent md5 of
    the id (a fixed random permutation of the group, stable under
    re-runs, appends, and repartitioning — unlike sample(), whose draws
    move with partition layout) and kept while rank ≤ cap.

    One shuffle on the group key for the rank window; md5 (not xxhash64)
    keeps the permutation engine-portable for the oracle. Groups are
    assumed plural but each MUCH smaller than the corpus (they're
    sources/domains); a group so large its window partition skews is the
    signal to pre-filter with mixture_sample (rate-based, zero-shuffle)
    before the exact cap.

    Output: (id, group, sample_rank) for the kept rows."""
    from pyspark.sql import Window

    rank_key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), F.col(group_col), F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= cap)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window document chunking: split each document's token
    sequence into ``chunk_size``-token windows every ``stride`` tokens
    (overlap = chunk_size - stride) — the context-window preparation step
    between curation and sequence packing.

    The token array is projected ONCE per row (the hoist `_gram_array`
    originally missed — see ext/dedup.py:73); the explode then fans each
    doc out to ceil(n/stride) chunk rows with no shuffle anywhere — chunk
    extraction is embarrassingly parallel and scales with input bytes.
    Every window start in sequence(1, n, stride) is emitted, including a
    final short window even when the tail is covered by the previous
    chunk — trailing dedup is a caller policy, not baked in here.

    Output: (id, chunk_id, n_tokens, chunk_text)."""
    base = (
        df.select(F.col(id_col), _words(text_col).alias("__w"))
        .withColumn("__n", F.size("__w"))
        .filter(F.col("__n") >= 1)
    )
    return base.select(
        F.col(id_col),
        "__w",
        "__n",
        F.explode(
            F.sequence(F.lit(1), F.col("__n"), F.lit(stride))
        ).alias("__start"),
    ).select(
        F.col(id_col),
        ((F.col("__start") - 1) / stride).cast("long").alias("chunk_id"),
        F.least(F.lit(chunk_size), F.col("__n") - F.col("__start") + 1)
        .cast("long")
        .alias("n_tokens"),
        F.array_join(
            F.slice("__w", F.col("__start"), F.lit(chunk_size)), " "
        ).alias("chunk_text"),
    )


def quality_percentile_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pct: float = 0.25,
    exact: bool = False,
    ndigits: int = 4,
) -> DataFrame:
    """Relative quality curation: keep documents whose quality_score is at
    or above the corpus's ``pct`` quantile — the adaptive alternative to
    the fixed thresholds in curation_pipeline (a threshold tuned on one
    corpus mix is wrong on the next).

    The threshold is a 1-row aggregate broadcast onto the scored corpus,
    so the only corpus-sized work is the scoring projection. ``exact``
    picks the aggregation: percentile() moves every score through a
    per-group sort (fine at test scale, the oracle-comparable form);
    approx_percentile (default) is the scale path — a fixed-size
    quantile sketch, map-side combinable, one tiny final merge.

    Output: (id, quality_score, threshold) for kept docs."""
    scored = quality_score(df, id_col, text_col).select(
        id_col, "quality_score"
    )
    fn = "percentile" if exact else "approx_percentile"
    thr = scored.agg(
        F.round(F.expr(f"{fn}(quality_score, {pct})"), ndigits).alias(
            "threshold"
        )
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("quality_score") >= F.col("threshold"))
        .select(id_col, "quality_score", "threshold")
    )


def unigram_logprob_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ndigits: int = 4,
) -> DataFrame:
    """Language-model quality filtering, unigram form (the shape of
    CCNet's KenLM-perplexity gate, Wenzek et al. 2020, with the corpus
    itself as the model): score each document by the mean log-probability
    of its tokens under the corpus unigram distribution. Gibberish /
    rare-token-dense documents score far below the mode and are the
    standard first cut before an external LM refines the ranking.

    Two corpus passes, both partial-aggregated: (1) token counts — the
    1-row corpus total joins back via a broadcast; (2) each document's
    tokens equi-join the probability table and average. Both joins key on
    xxhash64(token), never the token string (the fixed-width-shuffle-key
    rule; collisions merge two tokens' counts, noise for a statistical
    filter, and the string-keyed oracle certifies harness scale).

    Output: (id, n_tokens, avg_logp, ppl) — ppl = exp(-avg_logp), the
    unigram perplexity of the document."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__t"),
        )
        # blank docs' '' pseudo-token would receive real probability
        # mass and feed doremi_reweight (r9 review); the other LM gates
        # here already filter it
        .filter(F.col("__t") != "")
        .select(F.col(id_col), F.xxhash64("__t").alias("tok"))
    )
    # vocab-sized hub read by the total and the probability table —
    # materialized so pass (1) runs once (audit: 3 corpus scans lazy,
    # the documented 2 after)
    counts = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("n_tok").alias("n_total"))
    probs = counts.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("n_tok") / F.col("n_total")).alias("logp")
    )
    per_doc = (
        toks.join(probs, on="tok")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.avg("logp").alias("__alp"))
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(F.col("__alp"), ndigits).alias("avg_logp"),
        F.round(F.exp(-F.col("__alp")), 2).alias("ppl"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
    salt: str = "ws",
    ndigits: int = 6,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis): each row draws u in (0, 1] from a salted md5
    of its id and competes with key -ln(u)/w; the k smallest keys win.
    Inclusion probability is proportional to weight, the draw is a pure
    function of (salt, id) — stable under re-runs, appends, and
    partition layout — and the whole selection is one
    TakeOrderedAndProject: per-partition top-k heaps, k rows to the
    driver side of the final merge, nothing global ever sorts.

    u is quantized to 16 bits (the 4-hex-digit decode shared with
    hash_split) and the key rounded to ``ndigits`` so any independent
    replay (e.g. a SQL engine) ranks identically; residual ties break on
    the id. Zero/negative weights are excluded (their true inclusion
    probability is 0).

    Output: (id, weight, sample_key), the k winners, smallest key first."""
    hx = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    u = (F.conv(F.substring(hx, 1, 4), 16, 10).cast("long") + 1) / F.lit(65536.0)
    key = F.round(-F.log(u) / F.col(weight_col), ndigits)
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col), key.alias("sample_key"))
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(k)
    )


def char_entropy(
    df: DataFrame, id_col: str, text_col: str, ndigits: int = 4
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution (bits'
    natural-log cousin: nats) — the cheap gibberish detector: encoded
    blobs and key-mash sit far above prose, constant-fill far below.

    Entirely narrow column expressions: the char array is projected once,
    the distinct-char histogram and the -sum(p ln p) fold run inside one
    higher-order aggregate per row — zero shuffles, linear in input
    bytes times alphabet size (alphabet is small by nature; a corpus
    where it isn't — binary mis-read as text — is exactly what the score
    flags). Empty documents are excluded (entropy undefined).

    Output: (id, n_chars, n_distinct_chars, entropy)."""
    base = df.filter(F.length(F.col(text_col)) > 0).select(
        F.col(id_col), F.split(F.col(text_col), "").alias("__ch")
    )
    ent = F.expr(
        "aggregate("
        "  transform(array_distinct(__ch), c -> size(filter(__ch, x -> x = c))),"
        "  CAST(0.0 AS DOUBLE),"
        "  (acc, cnt) -> acc - (cnt / CAST(size(__ch) AS DOUBLE))"
        "                * ln(cnt / CAST(size(__ch) AS DOUBLE)))"
    )
    return base.select(
        F.col(id_col),
        F.size("__ch").cast("long").alias("n_chars"),
        F.size(F.array_distinct("__ch")).cast("long").alias("n_distinct_chars"),
        F.round(ent, ndigits).alias("entropy"),
    )


# Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1 — public
# paper). Documents outside these bounds are flagged, not dropped, so the
# caller picks the policy.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Full Gopher rule-set quality signals, one narrow pass, all native
    higher-order functions (zero Python in the row path, zero shuffles):

    - word count + mean word length,
    - symbol-to-word ratio (# and ellipsis),
    - bullet-start and ellipsis-end line fractions,
    - fraction of words containing an alphabetic character,
    - stopword hits (fluency proxy),
    - ``gopher_pass`` verdict per the published thresholds.

    Word splitting and per-rule arithmetic are integer/ratio math so the
    DuckDB oracle reproduces them bit-for-bit. Line rules degrade gracefully
    on single-line documents (the whole text is one line).

    The word/line arrays are hoisted into a materialized projection first —
    the seven rules reference them ~10 times, and Catalyst does not CSE a
    repeated split() across higher-order-function arguments (same lesson as
    round 2's `_with_grams` hoist, which cut the n-gram ops ~3-4×)."""
    split_df = df.select(
        F.col(id_col),
        _words(text_col).alias("__w"),
        F.split(F.col(text_col), "\n").alias("__lines"),
    )
    w = F.col("__w")
    lines = F.col("__lines")
    n_words = F.size(w)
    n_lines = F.size(lines)
    mean_word_len = F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.length(x)
    ) / n_words
    n_symbol = (
        F.size(F.filter(w, lambda x: x.contains("#")))
        + F.size(F.filter(w, lambda x: x.contains("...")))
        + F.size(F.filter(w, lambda x: x.contains("…")))
    )
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("-")
            | ln.startswith("*")
            | ln.startswith("•"),
        )
    )
    n_ellipsis_end = F.size(
        F.filter(lines, lambda ln: ln.endswith("...") | ln.endswith("…"))
    )
    n_alpha_words = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    n_stop_hits = F.size(F.filter(w, lambda x: _stopword_pred(x, STOPWORDS)))

    out = split_df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(n_symbol / n_words, 4).alias("symbol_ratio"),
        F.round(n_bullet / n_lines, 4).alias("bullet_line_frac"),
        F.round(n_ellipsis_end / n_lines, 4).alias("ellipsis_line_frac"),
        F.round(n_alpha_words / n_words, 4).alias("alpha_word_frac"),
        n_stop_hits.alias("stopword_hits"),
    )
    verdict = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_LINE_FRAC)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
    )
    return out.withColumn("gopher_pass", verdict)


def c4_line_filters(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style line/document hygiene (Raffel et al. 2020 §2.2, public
    paper): per document, count lines that survive the line rules (ends in
    terminal punctuation AND has ≥5 words) and flag the document-level
    rules (lorem ipsum placeholder, curly brace = code leak, 'javascript'
    = boilerplate warning). ``c4_keep`` = no doc-level flag AND ≥1
    surviving line. One narrow pass, native lambdas only."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: (
            ln.endswith(".") | ln.endswith("!") | ln.endswith("?") | ln.endswith('."')
        )
        & (F.size(F.split(F.trim(ln), r"\s+")) >= 5),
    )
    lower = F.lower(F.col(text_col))
    has_lorem = lower.contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    has_js = lower.contains("javascript")
    out = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_js.alias("has_javascript"),
    )
    return out.withColumn(
        "c4_keep",
        (~F.col("has_lorem"))
        & (~F.col("has_brace"))
        & (~F.col("has_javascript"))
        & (F.col("n_kept_lines") >= 1),
    )


def domain_divergence(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Per-domain unigram KL divergence vs the whole-corpus distribution —
    the mixture-weighting signal a pretraining pipeline uses to spot
    off-distribution sources (CCNet/DoReMi-style, public papers).

    KL(domain ‖ corpus) = Σ_w p_w · ln(p_w / q_w) with p from the domain's
    token counts and q from the corpus's. Plan: one explode → two hash
    aggs ((domain, word) then word) → vocabulary-sized broadcast join →
    per-domain sum. The corpus side is |vocab| rows, so the join state is
    bounded by vocabulary size no matter how many documents — at 100 TB the
    only full-data pass is the explode+partial-agg, which combines
    map-side."""
    words = df.select(
        F.col(group_col).alias("domain"),
        F.explode(_words(text_col)).alias("word"),
    ).filter(F.col("word") != "")
    # (domain, word) counts are the hub all four downstream aggregates
    # read — materialized so the token explode runs once (audit: 4
    # documents scans without, 1 after).
    by_domain = (
        words.groupBy("domain", "word")
        .agg(F.count("*").alias("nw"))
        .localCheckpoint(eager=True)
    )
    domain_tot = by_domain.groupBy("domain").agg(F.sum("nw").alias("nd"))
    corpus = by_domain.groupBy("word").agg(F.sum("nw").alias("cw"))
    corpus_tot = corpus.agg(F.sum("cw").alias("nc"))
    joined = (
        by_domain.join(F.broadcast(corpus), "word")
        .join(domain_tot, "domain")
        .join(F.broadcast(corpus_tot))
    )
    term = (F.col("nw") / F.col("nd")) * (
        F.log((F.col("nw") / F.col("nd")) / (F.col("cw") / F.col("nc")))
    )
    return (
        joined.groupBy("domain")
        .agg(
            F.max("nd").cast("long").alias("n_tokens"),
            F.round(F.sum(term), 6).alias("kl_divergence"),
        )
    )


def bigram_logprob_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ndigits: int = 4,
) -> DataFrame:
    """Language-model quality filtering, bigram form — the next rung above
    unigram_logprob_score on the CCNet-style ladder: score each document by
    the mean log P(w_i | w_{i-1}) under the corpus bigram distribution
    (conditional MLE: c(w1,w2) / c(w1,·)). Scoring the corpus against
    itself means every observed bigram has count ≥ 1, so no smoothing term
    is needed; an external-model deployment would add one.

    Same plan discipline as the unigram gate: the pair explode is the only
    stream-sized pass; both count aggregates partial-combine; joins key on
    xxhash64 of the pair / predecessor (fixed-width shuffle keys — a
    collision merges two contexts' counts, statistical noise certified
    against the string-keyed oracle at harness scale). Documents with
    fewer than two tokens have no bigrams and drop out (both engines).

    Output: (id, n_bigrams, avg_logp, ppl)."""
    base = df.select(F.col(id_col), _words(text_col).alias("__w"))
    pair_structs = F.transform(
        F.slice("__w", 1, F.size("__w") - 1),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(F.col("__w"), i + 2).alias("w2")
        ),
    )
    pairs = (
        base.select(F.col(id_col), F.explode(pair_structs).alias("__p"))
        .select(
            F.col(id_col),
            F.xxhash64("__p.w1").alias("k1"),
            F.xxhash64("__p.w1", "__p.w2").alias("k12"),
        )
    )
    # context-vocabulary hub read by the marginal and the logp table —
    # materialized (same audit rationale as the unigram gate)
    c12 = (
        pairs.groupBy("k1", "k12")
        .agg(F.count("*").alias("n12"))
        .localCheckpoint(eager=True)
    )
    c1 = c12.groupBy("k1").agg(F.sum("n12").alias("n1"))
    logp = c12.join(c1, "k1").select(
        "k12", F.log(F.col("n12") / F.col("n1")).alias("lp")
    )
    per_doc = (
        pairs.join(logp, "k12")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.avg("lp").alias("__alp"))
    )
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        F.round("__alp", ndigits).alias("avg_logp"),
        F.round(F.exp(-F.col("__alp")), 2).alias("ppl"),
    )


def zipf_fit(df: DataFrame, text_col: str, top_k: int = 1000) -> DataFrame:
    """Zipf law fit of the corpus rank-frequency curve: least-squares slope
    of ln(freq) on ln(rank) over the top-``top_k`` vocabulary — natural
    corpora run slope ≈ −1; templated/synthetic corpora flatten toward 0
    (a corpus-level generation-artifact screen, same family as the
    dup-gram and boilerplate checks).

    One explode + count (map-side combined); the top-k cut runs as a
    distributed TakeOrderedAndProject BEFORE the rank window, so the
    single-task window sees at most top_k rows — ranking the WHOLE
    vocabulary through one window and filtering after would funnel every
    distinct term into one task (review finding). The regression inputs
    are ln() of exact integer counts and ranks, so both engines start
    from identical doubles. Output: (n_terms, slope, intercept, r2)."""
    words = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    counts = words.groupBy("w").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("w").asc()).limit(top_k)
    rk = Window.orderBy(F.col("n").desc(), F.col("w").asc())
    ranked = top.select(F.row_number().over(rk).alias("r"), "n")
    x = F.log(F.col("r") * 1.0)
    y = F.log(F.col("n") * 1.0)
    agg = ranked.agg(
        F.count("*").alias("k"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    # degenerate corpora (r9 review): one distinct term -> zero x
    # variance, no slope; all top-k counts equal -> zero y variance,
    # no fit quality. NULL, not an ANSI divide-by-zero.
    dx = k * sxx - sx * sx
    dy = k * syy - sy * sy
    slope = F.when(dx > 0, (k * sxy - sx * sy) / dx)
    intercept = (sy - slope * sx) / k
    r2 = F.when((dx > 0) & (dy > 0), F.pow(k * sxy - sx * sy, 2) / (dx * dy))
    return agg.select(
        F.col("k").cast("int").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def source_overlap(
    df: DataFrame, group_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Cross-source content-overlap matrix: for every pair of sources,
    how many distinct word n-grams they share — the mirrored-content /
    cross-crawl duplication screen a corpus audit runs before assigning
    mixture weights (a gram appearing in many sources is syndicated or
    boilerplate; two sources sharing a large gram set are mirrors).

    Plan shape is the co-purchase triangle join transplanted to grams:
    distinct (gram, source) first (collapses within-source repeats
    map-side), then pairs WITHIN each gram via self-join with src_a <
    src_b — pair volume is Σ per-gram-source-count², bounded by |sources|²
    per gram, never corpus-sized. Grams travel as xxhash64 (fixed-width
    shuffle keys); the string-keyed oracle certifies harness scale."""
    grams_col = F.expr(
        f"IF(size(__words) >= {n}, "
        f"transform(sequence(1, size(__words) - {n - 1}), "
        f"i -> xxhash64(concat_ws(' ', slice(__words, i, {n})))), array())"
    )
    gs = (
        df.select(
            F.col(group_col).alias("src"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__words"),
        )
        .select("src", F.explode(grams_col).alias("g"))
        .distinct()
    )
    a = gs.select(F.col("g"), F.col("src").alias("src_a"))
    b = gs.select(F.col("g").alias("__g"), F.col("src").alias("src_b"))
    pairs = a.join(
        b, (a.g == b.__g) & (F.col("src_a") < F.col("src_b"))
    )
    return pairs.groupBy("src_a", "src_b").agg(
        F.count("*").alias("shared_grams")
    )


def template_prefixes(
    df: DataFrame, group_col: str, text_col: str, n_words: int = 3, top_k: int = 1
) -> DataFrame:
    """Template-header mining: per group (source/domain), the most common
    document PREFIX of ``n_words`` words and its share of the group's
    documents — a high share means the source stamps a boilerplate header
    (nav bar, license line) that a curation pipeline should strip before
    dedup (shared headers inflate n-gram similarity between unrelated
    docs). The suffix variant is the same plan on slice(reverse(words)).

    One narrow prefix projection, one (group, prefix) count (map-side
    combined), one rank window over the count relation (bounded by
    distinct prefixes per group), share as an exact integer ratio."""
    words = _words(text_col)
    prefix = F.concat_ws(" ", F.slice(words, 1, n_words))
    c = (
        df.select(F.col(group_col).alias("grp"), prefix.alias("prefix"))
        .groupBy("grp", "prefix")
        .agg(F.count("*").alias("n"))
    )
    tot = c.groupBy("grp").agg(F.sum("n").alias("n_docs"))
    w = Window.partitionBy("grp").orderBy(F.col("n").desc(), F.col("prefix").asc())
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .join(tot, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("rk").alias("prefix_rank"),
            "prefix",
            F.col("n").alias("n_with_prefix"),
            F.round(F.col("n") * 1.0 / F.col("n_docs"), 6).alias("share"),
        )
    )


def bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 16,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn a Byte-Pair-Encoding merge table from a corpus (Sennrich et
    al. 2016): starting from characters (plus the `</w>` end-of-word
    marker), repeatedly merge the most frequent adjacent symbol pair.
    The merge list IS the tokenizer — training it is the canonical
    pretraining-pipeline step this module's token counters approximate.

    Scale shape — the corpus is touched ONCE: BPE statistics only depend
    on the WORD-FREQUENCY table, so the first step collapses N documents
    to |word vocab| weighted rows (one shuffle, map-side combined) and
    every merge iteration runs over that vocabulary table, whose size is
    language-shaped (~10⁵–10⁶), independent of corpus row count. Per
    iteration: adjacent pairs explode from the symbol arrays →
    weight-summed (vocab-sized shuffle) → ONE driver-side row for the
    argmax (the same bounded scalar-per-round pattern as
    connected_components' change count) → the merge applies via an
    Arrow-batched pandas UDF (greedy left-to-right within each word —
    inherently sequential per word, words are short; this is a declared
    vectorized-Python path). Symbol state is localCheckpoint-ed each
    round to keep lineage flat.

    Ties break deterministically: (count DESC, left ASC, right ASC).
    Stops early when no pair reaches ``min_pair_count``.

    Output: (rank, left, right, merged, pair_count) — rank 1 = first
    merge learned."""
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    symbols = words.select(
        "cnt",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit("</w>"))
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = symbols.select(
            "cnt",
            F.explode(
                F.expr(
                    # fully-merged words collapse to ONE symbol; sequence(1,0)
                    # would DESCEND into syms[-1] (ANSI index error) — guard.
                    "IF(size(syms) >= 2, "
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] AS l, syms[i] AS r)), "
                    "array())"
                )
            ).alias("p"),
        ).groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
            F.sum("cnt").alias("n")
        )
        top = (
            pairs.filter(F.col("n") >= min_pair_count)
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y, n = top[0].l, top[0].r, top[0].n
        merges.append((rank, x, y, x + y, int(n)))

        def _make_merge(x: str, y: str):
            @pandas_udf("array<string>")
            def _merge(col: pd.Series) -> pd.Series:
                def m(seq):
                    out, i, ln = [], 0, len(seq)
                    while i < ln:
                        if i + 1 < ln and seq[i] == x and seq[i + 1] == y:
                            out.append(x + y)
                            i += 2
                        else:
                            out.append(seq[i])
                            i += 1
                    return out

                return col.map(m)

            return _merge

        symbols = symbols.select(
            "cnt", _make_merge(x, y)("syms").alias("syms")
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


def bpe_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize with a LEARNED BPE merge table (the apply half of
    ``bpe_merges``): each word starts as characters + `</w>` and the
    merges replay in training order — exactly the encoder a pretraining
    pipeline ships next to its corpus stats.

    The merge table (tens of thousands of entries in practice, 16 here)
    travels by closure into ONE Arrow-batched pandas UDF; application is
    embarrassingly parallel per row with zero shuffles, so it composes
    with any scan. Within a batch, distinct words memoize their
    tokenization (Zipf makes the memo hit rate high), which is the same
    trick production BPE encoders use.

    Output: (id, n_bpe_tokens, n_words) — counts only; emitting the
    token arrays is a one-line change but bloats the row for the common
    budget-accounting use."""
    from pyspark.sql.functions import pandas_udf

    pairs = list(merges)

    @pandas_udf("long")
    def n_tokens(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            hit = memo.get(w)
            if hit is not None:
                return hit
            seq = list(w) + ["</w>"]
            for x, y in pairs:
                out, i, ln = [], 0, len(seq)
                while i < ln:
                    if i + 1 < ln and seq[i] == x and seq[i + 1] == y:
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            memo[w] = len(seq)
            return memo[w]

        return texts.map(
            lambda t: sum(word_tokens(w) for w in t.split()) if t else 0
        )

    w = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(
        F.col(id_col),
        n_tokens(F.col(text_col)).alias("n_bpe_tokens"),
        F.size(w).cast("long").alias("n_words"),
    )


def pmi_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Skip-gram co-occurrence with pointwise mutual information: unordered
    word pairs within ``window`` tokens, scored by
    PMI = ln(c_xy·T²/(P·c_x·c_y)) — the classic collocation/embedding
    statistic (word2vec's implicit matrix).

    Pairs are generated WITHOUT a join: one higher-order transform emits
    the (i, i+k) pairs per document (O(len·window) rows, data-parallel),
    so the only shuffles are the three aggregations (pair counts, unigram
    counts, scalar totals), all map-side combined. The two count tables
    join on the word (vocabulary-sized), and totals broadcast.

    PMI is computed as a SUM OF LOGS — ln(c_xy)+2ln(T)−ln(P)−ln(c_x)−
    ln(c_y) — which both avoids int64 overflow in the product form
    (c·T² exceeds 2⁶³ on ~10B-token corpora) and pins the FP evaluation
    order so a replay in another engine is bit-identical.

    Output: (word_a, word_b, n_pair, n_a, n_b, pmi) for pairs with
    n_pair ≥ min_count, word_a < word_b."""
    with_words = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__words")
    ).filter(F.size("__words") >= 2)
    pair_structs = F.expr(
        "flatten(transform(sequence(1, size(__words) - 1), i -> "
        f"transform(sequence(1, {window}), k -> "
        "IF(i + k <= size(__words), "
        "struct(least(__words[i-1], __words[i+k-1]) AS x, "
        "greatest(__words[i-1], __words[i+k-1]) AS y), "
        "CAST(NULL AS STRUCT<x: STRING, y: STRING>)))))"
    )
    pairs = with_words.select(F.explode(pair_structs).alias("p")).filter(
        F.col("p").isNotNull()
    )
    # Materialize the two count hubs and derive the totals FROM them
    # (P = Σ n_pair, T = Σ n): the lazy form re-ran the pair explode for
    # the total and the token explode for the vocabulary's two join legs
    # — audit measured 5 documents scans, 2 after (one per explode).
    pair_counts = (
        pairs.groupBy(F.col("p.x").alias("word_a"), F.col("p.y").alias("word_b"))
        .agg(F.count("*").alias("n_pair"))
        .localCheckpoint(eager=True)
    )
    total_pairs = pair_counts.agg(F.sum("n_pair").alias("P"))
    tokens = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    uni = (
        tokens.groupBy("w")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    total_tokens = uni.agg(F.sum("n").alias("T"))
    na = uni.select(F.col("w").alias("word_a"), F.col("n").alias("n_a"))
    nb = uni.select(F.col("w").alias("word_b"), F.col("n").alias("n_b"))
    return (
        pair_counts.filter(F.col("n_pair") >= min_count)
        .join(na, "word_a")
        .join(nb, "word_b")
        .crossJoin(F.broadcast(total_pairs))
        .crossJoin(F.broadcast(total_tokens))
        .select(
            "word_a",
            "word_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                F.log("n_pair")
                + F.lit(2.0) * F.log("T")
                - F.log("P")
                - F.log("n_a")
                - F.log("n_b"),
                6,
            ).alias("pmi"),
        )
    )


def split_lm_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ndigits: int = 4,
) -> DataFrame:
    """Unigram LM quality gate with SPLIT HYGIENE: the model is fit on
    the train split only and scores the val split with add-one
    smoothing — the leakage-free protocol unigram_logprob_score skips
    (fitting on the full corpus makes every val document look more
    in-distribution than it is; a gate tuned that way over-admits).

    Same two-pass shape as the full-corpus gate, restricted: train
    tokens → count table (+1 smoothing over V+1 classes, the +1 class
    absorbing out-of-vocabulary tokens); val tokens LEFT join it (string
    keys here — the split protocol is the point, and the oracle
    re-derives the split from the same md5 arithmetic as hash_split).
    Scalars (train total, vocab size) broadcast.

    Output (val docs only): (id, n_tokens, n_oov, avg_logp, ppl)."""
    split = hash_split(df.select(F.col(id_col)), id_col).select(
        F.col(id_col), "split"
    )
    labeled = df.join(split, id_col)
    toks = labeled.select(
        F.col(id_col),
        "split",
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    # The train vocabulary is vocab-sized and read twice (scalars + the
    # val join); materialized so the train-side tokenize-explode runs
    # once (audit: 6 documents scans without, 2 after — one per split).
    train_counts = (
        toks.filter(F.col("split") == "train")
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
        .localCheckpoint(eager=True)
    )
    scal = train_counts.agg(
        F.sum("n_tok").alias("n_total"), F.count("*").alias("v")
    )
    val = toks.filter(F.col("split") == "val").join(
        train_counts, "tok", "left"
    )
    smoothed = F.log(
        (F.coalesce(F.col("n_tok"), F.lit(0)) + 1)
        / (F.col("n_total") + F.col("v") + 1)
    )
    return (
        val.crossJoin(F.broadcast(scal))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("n_tok").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
            F.avg(smoothed).alias("__alp"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.col("n_oov").cast("long").alias("n_oov"),
            F.round("__alp", ndigits).alias("avg_logp"),
            F.round(F.exp(-F.col("__alp")), 2).alias("ppl"),
        )
    )


def quantile_normalize_by_source(
    df: DataFrame, id_col: str, text_col: str, source_col: str
) -> DataFrame:
    """Per-source quantile normalization of an integer quality score — the
    cross-source calibration step of corpus curation: a score of X from a
    lenient source and a score of Y from a strict source are mapped onto
    the GLOBAL score distribution at their within-source quantile, so one
    threshold then means the same thing for every source (the
    quantile-normalization standard from microarray statistics, applied
    to corpus quality).

    Semantics (all integer, hash-exact across engines):
    - score: q_fp = (n_stop·10000)//n_tokens + min(n_tokens,100)·100 — a
      pure-integer blend of the quality_score heuristic (no float round).
    - ties take the MID-RANK: every doc sharing (source, q_fp) gets
      p = (2·cum_below + cnt_at + 1) / (2·n_s), the standard statistical
      treatment — which is also what makes the op SHUFFLE-LIGHT: no
      per-doc tie-break window exists anywhere in the plan.
    - q_norm = the smallest global score whose cumulative count reaches
      idx = ceil(p·N), i.e. the global distribution's value at the same
      quantile.

    Scale shape: the corpus is touched exactly twice (once to score, once
    for the final broadcast map-back join). Everything in between runs on
    (source × distinct-score) COUNT tables — bounded by the score domain
    (stopword grid × length grid) times the source vocabulary,
    independent of corpus row count — so the within-source cumulative
    windows and the idx→global-bucket lookup (a LINEAR marker-merge
    window over the unioned count tables, not a range join, which would
    be O(domain²) worst case) cost O(domain log domain), not O(rows).
    No per-doc window, no per-doc sort, at any corpus size.

    Output: (id, source, q_fp, q_norm)."""
    w = _words(text_col)
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: _stopword_pred(x, STOPWORDS)))
    # exact integer division: (a - a mod b) / b is exactly representable,
    # so the double division cannot round (the ext_token_budget precedent)
    num = n_stop * 10000
    q_fp = (
        (num - F.pmod(num, n_tokens)) / n_tokens
        + F.least(n_tokens, F.lit(100)) * 100
    ).cast("bigint")
    scored = df.select(
        F.col(id_col), F.col(source_col).alias("source"), q_fp.alias("q_fp")
    )

    # The (source, score) count table is the hub every downstream branch
    # reads (per-source cumulatives, global CDF, N, the marker merge).
    # Materialize it ONCE: without this, each of the four consumers
    # re-plans the scoring subtree and the corpus is scanned four times
    # (measured); with it, the corpus is scanned exactly twice — once
    # into the counts, once in the final map-back join. localCheckpoint
    # (the bounded-lineage CC precedent) keeps the materialized table
    # executor-local and needs no checkpoint dir.
    counts = (
        scored.groupBy("source", "q_fp")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ws = Window.partitionBy("source").orderBy("q_fp")
    per_source = (
        counts.withColumn(
            "cum_below",
            F.coalesce(F.sum("cnt").over(ws.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
        )
        .withColumn("n_s", F.sum("cnt").over(Window.partitionBy("source")))
    )
    # Global CDF and N derive from the materialized counts, not from
    # scored — no additional corpus scans.
    gcounts = counts.groupBy("q_fp").agg(F.sum("cnt").alias("gcnt"))
    wg = Window.orderBy("q_fp")
    glob = gcounts.withColumn("gcum", F.sum("gcnt").over(wg)).withColumn(
        "gcum_prev", F.col("gcum") - F.col("gcnt")
    )
    n_total = counts.agg(F.sum("cnt").alias("N"))
    # the (2·cum+cnt+1)·N product crosses 2^63 once n_s·N > ~4.6e18
    # (one 1e9-doc source in a 5e9-doc corpus — inside the design
    # point); run the ceil-division in decimal(38,0) with the EXACT
    # integral `div` operator (fraction-scale `/` could mis-floor near
    # boundaries), value-identical with ~10^38 headroom (r9 review)
    with_idx = per_source.join(F.broadcast(n_total)).withColumn(
        "idx",
        F.expr(
            "CAST((CAST(2*cum_below + cnt + 1 AS DECIMAL(38,0))"
            " * CAST(N AS DECIMAL(38,0))"
            " + CAST(2*n_s - 1 AS DECIMAL(38,0)))"
            " div CAST(2*n_s AS DECIMAL(38,0)) AS BIGINT)"
        ),
    )
    # "smallest global score whose cumulative reaches idx" as a LINEAR
    # merge instead of a range join (which is O(domain²) worst case):
    # union bucket-end markers (pos=gcum) with probes (pos=idx), sort by
    # position, and each probe reads the first marker at-or-after it via
    # a forward-looking window. Probes sort BEFORE a same-position marker
    # (kind 1 < 2) so gcum == idx matches, mirroring gcum >= idx.
    markers = glob.select(
        F.col("gcum").alias("pos"),
        F.lit(2).alias("kind"),
        F.col("q_fp").alias("marker_q"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("bigint").alias("src_q"),
    )
    probes = with_idx.select(
        F.col("idx").alias("pos"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("marker_q"),
        "source",
        F.col("q_fp").alias("src_q"),
    )
    wu = Window.orderBy("pos", "kind").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    mapping = (
        markers.unionByName(probes)
        .withColumn("q_norm", F.first("marker_q", ignorenulls=True).over(wu))
        .filter(F.col("kind") == 1)
        .select("source", F.col("src_q").alias("q_fp"), "q_norm")
    )
    return scored.join(F.broadcast(mapping), ["source", "q_fp"]).select(
        F.col(id_col), "source", "q_fp", "q_norm"
    )


def dsir_importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 512,
    ndigits: int = 6,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every raw document by the log importance
    ratio of its hashed-unigram feature counts under the TARGET
    distribution vs the RAW distribution — the standard cheap proxy for
    "select web data that looks like the high-quality target domain"
    ahead of LLM pretraining. Documents with high log-weight are the
    resampling candidates; the smoothing keeps unseen buckets finite.

    Mechanics (one token pass, everything else bucket-sized):
    tokens hash into ``n_buckets`` feature buckets via the md5 idiom
    (DuckDB-replayable, unlike xxhash64 — rel_dp_noisy_counts
    precedent); one partial-aggregated pass produces per-bucket raw and
    target counts TOGETHER (target counts are a conditional sum, not a
    second scan); Laplace(+1) smoothing over the bucket vocabulary;
    lr[b] = ln p_target[b] − ln p_raw[b]; each document's weight is
    Σ_b n_{doc,b}·lr[b], computed by joining the doc's bucket counts to
    the broadcast B-row ratio table. At 100 TB: the only stream-sized
    stages are the token explode and one (doc, bucket) aggregate —
    bucket tables are O(n_buckets) and broadcast; no shuffle ever
    carries raw text.

    ``target_pred`` is a boolean Column over ``df``'s columns selecting
    the target-domain rows (e.g. ``F.col('source') == 'src0'``); the
    target stays part of ONE pass rather than a separate corpus.

    Output: (id, n_tokens, dsir_logw) — higher = more target-like.
    Float-parity note: the 6-digit round sits ~7 orders above the 1-ulp
    ln()/summation divergence at these magnitudes (|logw| < 1e3), the
    same argument as rel_dp_noisy_counts."""
    toks = df.select(
        F.col(id_col),
        target_pred.alias("__is_tgt"),
        F.explode(_words(text_col)).alias("__t"),
    ).filter(F.col("__t") != "")
    bucket = (
        F.conv(F.substring(F.md5("__t"), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    # (doc, bucket) hub: feeds the bucket-ratio table AND the final score
    # join — persist() so the corpus token pass runs ONCE (audit: 3
    # documents scans lazy, 1 after; lazy persist per the round-5 hub
    # policy — lineage kept, no eager job).
    doc_buckets = toks.groupBy(F.col(id_col), bucket.alias("__b")).agg(
        F.count("*").alias("__n"),
        F.max("__is_tgt").alias("__is_tgt"),
    ).persist()
    register_hub(doc_buckets)
    # bucket-level raw/target counts in the same aggregate: re-aggregate
    # the (doc, bucket) table — already reduced — instead of re-scanning
    bucket_counts = doc_buckets.groupBy("__b").agg(
        F.sum("__n").alias("__n_raw"),
        F.sum(F.when(F.col("__is_tgt"), F.col("__n")).otherwise(F.lit(0))).alias(
            "__n_tgt"
        ),
    )
    totals = bucket_counts.agg(
        F.sum("__n_raw").alias("__t_raw"), F.sum("__n_tgt").alias("__t_tgt")
    )
    lr = bucket_counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log((F.col("__n_tgt") + 1) / (F.col("__t_tgt") + n_buckets))
            - F.log((F.col("__n_raw") + 1) / (F.col("__t_raw") + n_buckets))
        ).alias("__lr"),
    )
    return (
        doc_buckets.join(F.broadcast(lr), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_tokens"),
            F.round(F.sum(F.col("__n") * F.col("__lr")), ndigits).alias(
                "dsir_logw"
            ),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """BM25 ranked retrieval for a fixed term set over the corpus — the
    classic sparse-retrieval scorer (Robertson-Walker-Jones; the Lucene
    +1 idf variant, so idf stays positive even for terms in more than
    half the corpus):

        idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score(d,t) = idf(t) · tf / (tf + k1·(1 - b + b·dl/avgdl))

    Completes the retrieval family: inverted_index gives the postings,
    tfidf_top_terms the per-doc salience, ANN the dense side — this is
    the sparse ranking head a RAG data pipeline runs next to them.

    ONE-SCAN plan: because the query-term set is a fixed small list, no
    explode/shuffle is needed at all — a single projection computes each
    document's length AND its per-term tf as array expressions
    (size(filter(words, x == term)) per term, evaluated inside
    whole-stage codegen), stack()-unpivoted to (term, tf) rows. That
    per-doc table is the persisted hub: corpus stats (N, avgdl) and
    per-term document frequencies aggregate from it, broadcast back,
    and the per-term top-k ranks by (rounded score DESC, id ASC) over
    the |terms| x |matching docs| table. The corpus crosses the wire
    zero times — only doc-cardinality rows ever shuffle. (Audit: the
    explode-based first cut scanned documents 4x; this form scans
    once.) CPU note: the words split is evaluated per term expression
    (~|terms|+1 splits/row) — the right trade up to tens of terms;
    a large query set switches to the inverted-index path.

    Output: (term, rank, id, tf, round(bm25, ndigits))."""
    words = F.filter(_words(text_col), lambda x: x != "")

    def _term_count(term: str):
        # closure, NOT a defaulted lambda parameter: a 2-arg lambda is
        # treated by PySpark as the (element, index) form, which would
        # bind the "term" name to the array-index column
        return F.size(F.filter(words, lambda x: x == F.lit(term)))

    per_doc = df.select(
        F.col(id_col),
        F.size(words).alias("__dl"),
        *[_term_count(t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    ).persist()
    register_hub(per_doc)
    stats = per_doc.agg(
        F.count("*").alias("__n_docs"), F.avg("__dl").alias("__avgdl")
    )
    # Unpivot via inline(array(struct(...))) with terms BOUND as F.lit —
    # no SQL-string interpolation, so terms containing quotes/backslashes
    # cannot corrupt the plan (round-5 advice: the stack() F.expr form
    # was injectable past its single-quote assert).
    tf = per_doc.select(
        F.col(id_col),
        "__dl",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"), F.col(f"__tf{i}").alias("tf")
                    )
                    for i, t in enumerate(terms)
                ]
            )
        ),
    ).filter(F.col("tf") > 0).select(
        id_col, "__dl", "term", F.col("tf").cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("__df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        "__avgdl",
        F.log(
            1.0
            + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
        ).alias("__idf"),
    )
    score = F.col("__idf") * F.col("tf") / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        "term",
        F.col(id_col),
        "tf",
        F.round(score, ndigits).alias("bm25"),
    )
    w = Window.partitionBy("term").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("term", "rank", id_col, "tf", "bm25")
    )


def vocab_saturation(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_batches: int = 10,
) -> DataFrame:
    """Vocabulary rarefaction curve: split the corpus into ``n_batches``
    equal-population batches by ingestion order (id), and count how many
    word n-grams appear for the FIRST time in each batch — the saturation
    readout behind "is more data still buying new vocabulary?" (new-gram
    counts that stop decaying mean the corpus is far from exhausting its
    domain; a sharp decay justifies dedup/subsampling).

    Plan: first-seen is min(batch) per gram — O(total grams) with
    map-side combines, ONE shuffle on the hashed gram, never a
    batch-by-batch rescan (the naive cumulative-distinct form scans the
    corpus n_batches times). The batch split is ntile over the id — a
    single-partition sort of a 2-column id projection (doc-table
    cardinality, the W1-parity shape); at extreme scale the ingestion
    batch is a real partition column and the ntile disappears.

    Output: (batch, new_grams, cum_vocab)."""
    # Batch split via the distributed global ntile (r8) over the ID
    # PROJECTION only — bit-identical tiles to ntile() OVER (ORDER BY
    # id), with the range exchange replacing what used to be a
    # single-partition key sort. At extreme scale the ingestion batch is
    # a real partition column and this assignment disappears entirely.
    from ..operators.window import global_ntile

    batch_of = global_ntile(
        df.select(F.col(id_col)), [F.col(id_col).asc()], n_batches, "__b"
    )
    batched = df.select(F.col(id_col), F.col(text_col)).join(batch_of, id_col)
    # hashed shingles (the fixed-width-shuffle-key rule): first-seen only
    # compares grams for EQUALITY, so the min-per-gram shuffle carries an
    # 8-byte long, not variable text — the string-keyed oracle certifies
    # count equality at harness scale (measured 6.2s -> 1.1s at sf0.1)
    from .dedup import word_shingles

    grams = word_shingles(batched, "__b", text_col, n=n, hashed=True)
    first_seen = (
        grams.groupBy(F.col("shingle").alias("g"))
        .agg(F.min("__b").alias("first_b"))
        .groupBy(F.col("first_b").alias("batch"))
        .agg(F.count(F.lit(1)).alias("new_grams"))
    )
    w_cum = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return first_seen.select(
        "batch",
        "new_grams",
        F.sum("new_grams").over(w_cum).alias("cum_vocab"),
    )


def doremi_reweight(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    eta: float = 1.0,
    ndigits: int = 6,
) -> DataFrame:
    """One DoReMi-style domain-reweighting step (Xie et al. 2023, the
    practical shape): sources whose documents score WORSE under the
    reference model get their mixture weight multiplied by
    exp(eta · excess_loss) and the weights renormalize —

        w_h ∝ prior_h · exp(η · (loss_h − loss_overall))

    with the corpus-unigram LM standing in for the reference model (the
    ``unigram_logprob_score`` machinery, already hash-certified) and the
    document-count share as the prior. The full DoReMi loop alternates
    proxy-model training with this update; ONE step over fixed scores is
    the deterministic, hash-checkable core a data pipeline actually
    executes per iteration.

    Plan: per-doc scores (two partial-aggregated corpus passes) → one
    source-cardinality aggregate → broadcast scalar baseline → arithmetic.
    Per-doc avg_logp enters ROUNDED (4 digits, the score contract), so
    both engines average identical inputs and the only drift is ~1 ulp
    on a |sources|-sized softmax — 9 orders under the rounding grid.

    Output: (source, n_docs, mean_loss, excess, weight)."""
    scores = unigram_logprob_score(df, id_col, text_col)
    # Materialize the per-doc score hub: BOTH the per-source aggregate
    # and the overall baseline consume it, and without a cut each
    # consumer re-executes the entire unigram scorer (the r8 scan audit
    # found this entry re-scanning the corpus 8x). One row per document
    # (3 narrow columns), so the checkpoint is doc-count-bounded — far
    # cheaper than re-deriving token statistics from the corpus twice.
    with_src = scores.join(
        df.select(F.col(id_col), F.col(source_col).alias("source")), id_col
    ).localCheckpoint(eager=True)
    per_src = with_src.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(-F.col("avg_logp")).alias("__loss"),
    )
    overall = with_src.agg(
        F.avg(-F.col("avg_logp")).alias("__base"),
        F.count(F.lit(1)).alias("__n_all"),
    )
    raw = per_src.crossJoin(F.broadcast(overall)).select(
        "source",
        "n_docs",
        "__loss",
        (F.col("__loss") - F.col("__base")).alias("__excess"),
        (
            (F.col("n_docs") * 1.0 / F.col("__n_all"))
            * F.exp(F.lit(eta) * (F.col("__loss") - F.col("__base")))
        ).alias("__w"),
    )
    z = raw.agg(F.sum("__w").alias("__z"))
    return (
        raw.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            F.round("__loss", ndigits).alias("mean_loss"),
            F.round("__excess", ndigits).alias("excess"),
            F.round(F.col("__w") / F.col("__z"), ndigits).alias("weight"),
        )
    )


def rouge_n_recall_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pair_col: str,
    n: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """ROUGE-N recall between candidate/reference doc pairs, on DISTINCT
    n-grams (the set-overlap variant — multiset clipping is the named
    refinement; for near-dup-style screening the set form is standard,
    cf. the jaccard/containment tier in ext.dedup):

        recall = |grams(ref) ∩ grams(cand)| / |grams(ref)|

    Input: ``pair_col`` holds the candidate doc's id (NULL rows are
    dropped — e.g. the last doc of a chain). Grams explode once per doc
    (O(total grams)), the intersection is one equi-join on
    (doc, gram-hash) — xxhash64 of the gram keeps the shuffle key 8
    bytes, the dup-gram precedent; hash collisions (~2^-64 per pair)
    are accepted and documented. Counts exact; recall's division is the
    only float.

    Output: (ref_id, cand_id, n_ref_grams, n_overlap, rouge_recall)."""
    words = F.filter(_words(text_col), lambda x: x != "")
    # Guarded: Spark's sequence(0, stop) REVERSES direction when stop < 0
    # (it does not return empty), so short docs need the explicit branch.
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # The distinct gram table feeds BOTH join sides (ref and candidate).
    # Deliberately NOT checkpointed: the table is corpus-gram-sized, and
    # the r8 adjudication measured materialize-once (3.77s isolated at
    # sf0.1) ≈ re-explode-twice (3.56s) — a narrow vectorized explode is
    # cheaper to repeat than a corpus-sized table is to write, and at
    # 100 TB the storage write loses harder. The real r8 win below is
    # structural: one left-join-with-marker pass replaces the former
    # semi-join + second aggregate + re-join.
    g = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(grams).alias("gram"),
        )
        .select("doc", F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    pairs = df.select(
        F.col(id_col).alias("ref_id"), F.col(pair_col).alias("cand_id")
    ).filter(F.col("cand_id").isNotNull())
    ref_g = pairs.join(g.withColumnRenamed("doc", "ref_id"), "ref_id")
    # One pass computes both counts: a left join against the (distinct)
    # candidate grams contributes at most one __hit marker per ref gram,
    # so count(*) is the ref-gram total and count(__hit) the overlap —
    # replacing the former semi-join + second aggregate + re-join.
    cand_g = g.select(F.col("doc").alias("cand_id"), "gh").withColumn(
        "__hit", F.lit(1)
    )
    out = (
        ref_g.join(cand_g, ["cand_id", "gh"], "left")
        .groupBy("ref_id", "cand_id")
        .agg(
            F.count(F.lit(1)).alias("n_ref_grams"),
            F.count("__hit").alias("n_overlap"),
        )
    )
    return out.select(
        "ref_id",
        "cand_id",
        "n_ref_grams",
        "n_overlap",
        F.round(
            F.col("n_overlap").cast("double") / F.col("n_ref_grams"), ndigits
        ).alias("rouge_recall"),
    )


def flesch_reading_ease(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    easy_threshold: float = 60.0,
    ndigits: int = 6,
) -> DataFrame:
    """Flesch reading-ease readability per source group — a corpus
    quality signal (training-data curation pipelines gate on
    readability bands the same way they gate on Gopher rules):

        FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Heuristics are the standard regex approximations — words = latin
    letter runs, sentences = [.!?] runs (min 1), syllables = vowel
    groups incl. y — all via regexp_count, so the per-doc counts are
    exact integers in both engines. The group-level FRE is computed
    from SUMMED counts (one fixed double expression — no averaging of
    per-doc doubles, whose summation order could drift); the per-doc
    FRE only feeds a threshold count. One map-side-combinable aggregate.

    Output: (group, n_docs, words, sentences, syllables,
    flesch_corpus, n_easy)."""
    t = F.col(text_col)
    words = F.regexp_count(t, F.lit(r"[A-Za-z]+"))
    sents = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    base = docs.select(
        F.col(group_col).alias("g"),
        words.cast("bigint").alias("w"),
        sents.cast("bigint").alias("s"),
        syll.cast("bigint").alias("y"),
    ).filter(F.col("w") > 0)
    doc_fre = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("w").cast("double") / F.col("s").cast("double"))
        - F.lit(84.6) * (F.col("y").cast("double") / F.col("w").cast("double"))
    )
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").alias("words"),
        F.sum("s").alias("sentences"),
        F.sum("y").alias("syllables"),
        F.sum((doc_fre >= F.lit(easy_threshold)).cast("int"))
        .cast("bigint")
        .alias("n_easy"),
    )
    corpus_fre = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("words").cast("double") / F.col("sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("syllables").cast("double") / F.col("words").cast("double"))
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_docs",
        "words",
        "sentences",
        "syllables",
        (F.round(corpus_fre, ndigits) + 0.0).alias("flesch_corpus"),
        "n_easy",
    )


def code_prose_detect(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    score_threshold: float = 0.05,
    ndigits: int = 6,
) -> DataFrame:
    """Code-vs-prose triage per source — LLM corpora route code and
    natural language to different pipelines, and the cheap signal is
    symbol density: score = (brackets + 2·semicolons + 2·'=') / chars.
    All regexp_count/length — exact integers; the per-doc score is one
    fixed double expression feeding only a threshold count, the
    source-level score is computed from SUMMED counts (the
    flesch_reading_ease discipline). One map-side-combinable aggregate.

    Output: (group, n_docs, brackets, semicolons, assigns, chars,
    symbol_score, n_code)."""
    t = F.col(text_col)
    brackets = F.regexp_count(t, F.lit(r"[{}()\[\]]")).cast("bigint")
    semis = F.regexp_count(t, F.lit(";")).cast("bigint")
    assigns = F.regexp_count(t, F.lit("=")).cast("bigint")
    chars = F.length(t).cast("bigint")
    base = docs.select(
        F.col(group_col).alias("g"),
        brackets.alias("b"),
        semis.alias("s"),
        assigns.alias("a"),
        chars.alias("c"),
    ).filter(F.col("c") > 0)
    doc_score = (
        F.col("b").cast("double")
        + 2.0 * F.col("s").cast("double")
        + 2.0 * F.col("a").cast("double")
    ) / F.col("c").cast("double")
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("b").alias("brackets"),
        F.sum("s").alias("semicolons"),
        F.sum("a").alias("assigns"),
        F.sum("c").alias("chars"),
        F.sum((doc_score > F.lit(score_threshold)).cast("int"))
        .cast("bigint")
        .alias("n_code"),
    )
    corpus_score = (
        F.col("brackets").cast("double")
        + 2.0 * F.col("semicolons").cast("double")
        + 2.0 * F.col("assigns").cast("double")
    ) / F.col("chars").cast("double")
    return agg.select(
        F.col("g").alias(group_col),
        "n_docs",
        "brackets",
        "semicolons",
        "assigns",
        "chars",
        (F.round(corpus_score, ndigits) + 0.0).alias("symbol_score"),
        "n_code",
    )


def quality_rule_overlap(
    docs: DataFrame,
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Quality-rule ablation matrix — the curation diagnostic that says
    which filter rules are redundant (high Jaccard between survivor
    sets) and which are independent: four cheap per-doc pass flags
    (length band, symbol density, mean word length, stopword fraction —
    one representative per rule family in the gopher/c4/code stacks),
    then the pairwise survivor overlap. Flags are exact integer
    comparisons; the matrix is Σ flag_i·flag_j over one scan — 4 rules
    → 10 unordered pairs, one map-side-combinable aggregate.

    Output: (rule_a, rule_b, n_a, n_both, n_either, jaccard),
    rule_a ≤ rule_b lexicographically."""
    t = F.col(text_col)
    chars = F.length(t)
    words = F.regexp_count(t, F.lit(r"[A-Za-z]+"))
    letters = F.regexp_count(t, F.lit(r"[A-Za-z]"))
    syms = F.regexp_count(t, F.lit(r"[{}()\[\];=]"))
    stops = F.regexp_count(
        F.lower(t), F.lit(r"\b(the|and|of|to|a|in|is|it)\b")
    )
    flags = docs.select(
        ((chars >= 200) & (chars <= 20000)).cast("int").alias("len_band"),
        (
            syms.cast("double") <= F.lit(0.02) * F.greatest(chars, F.lit(1)).cast("double")
        ).cast("int").alias("low_symbol"),
        (
            (letters.cast("double") >= F.lit(3.0) * F.greatest(words, F.lit(1)).cast("double"))
            & (letters.cast("double") <= F.lit(10.0) * F.greatest(words, F.lit(1)).cast("double"))
        ).cast("int").alias("word_len"),
        (
            stops.cast("double") * 20.0
            >= F.greatest(words, F.lit(1)).cast("double")
        ).cast("int").alias("stopword"),
    )
    rules = ["len_band", "low_symbol", "word_len", "stopword"]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for i, a in enumerate(rules):
        aggs.append(F.sum(F.col(a)).alias(f"n_{a}"))
        for b in rules[i:]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).alias(f"b_{a}__{b}")
            )
    # each pair row re-selects from m: checkpoint the 1-row moment table
    # or the plan re-scans documents once per pair
    m = flags.agg(*aggs).localCheckpoint(eager=True)
    rows = []
    for i, a in enumerate(rules):
        for b in rules[i:]:
            n_a = F.col(f"n_{a}")
            n_b = F.col(f"n_{b}")
            both = F.col(f"b_{a}__{b}")
            either = n_a + n_b - both
            rows.append(
                m.select(
                    F.lit(a).alias("rule_a"),
                    F.lit(b).alias("rule_b"),
                    n_a.cast("bigint").alias("n_a"),
                    both.cast("bigint").alias("n_both"),
                    either.cast("bigint").alias("n_either"),
                    F.round(
                        both.cast("double")
                        / F.greatest(either, F.lit(1)).cast("double"),
                        ndigits,
                    ).alias("jaccard"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def span_corruption_stats(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
    start_rate: float = 0.05,
    span_len: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """T5/UL2-style span-corruption masking plan: span STARTS are an
    md5-uniform draw per token position (rate ≈ mask_fraction/span_len),
    a token is masked iff any start falls in the ``span_len`` positions
    ending at it — one max-over-rows window per doc, no RNG, fully
    replayable. This certifies the masking SCHEDULE (which positions a
    trainer would corrupt) via per-source totals plus an md5 checksum
    over the exact masked (doc, position) set — the text reassembly
    itself is a trivial concat the trainer does in-flight. One explode +
    one window over token positions; work is O(total tokens).

    Output: (group, n_docs, n_tokens, n_spans, n_masked, mask_fraction,
    masked_checksum)."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("did"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "i", "w"
        ),
    ).select("g", "did", (F.col("i") + 1).alias("i"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("span"),
                        F.col("did").cast("string"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    flagged = toks.withColumn("start", (u < F.lit(start_rate)).cast("int"))
    w = (
        Window.partitionBy("did")
        .orderBy("i")
        .rowsBetween(-(span_len - 1), 0)
    )
    masked = flagged.withColumn("m", F.max("start").over(w))
    hk = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("mt"),
                        F.col("did").cast("string"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                10,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1099511627776),
    )
    return masked.groupBy("g").agg(
        F.countDistinct("did").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("start").cast("bigint").alias("n_spans"),
        F.sum("m").cast("bigint").alias("n_masked"),
        F.round(
            F.sum("m").cast("double") / F.count(F.lit(1)).cast("double"),
            ndigits,
        ).alias("mask_fraction"),
        # the per-term products are < 2^40 but a plain bigint SUM
        # overflows (ANSI: throws) at ~2^23 masked tokens per group —
        # a few hundred MB of text; accumulate in decimal(38,0)
        # (~10^26-term headroom) and reduce mod 2^61 at the end, which
        # is value-identical where the old form didn't overflow
        # (r9 review)
        F.pmod(
            F.sum((F.col("m") * hk).cast("decimal(38,0)")),
            F.lit(2305843009213693952).cast("decimal(38,0)"),
        ).cast("bigint").alias("masked_checksum"),
    ).withColumnRenamed("g", group_col)


def greedy_coverage_select(
    pairs: DataFrame,
    id_col: str = "did",
    item_col: str = "w",
    k: int = 5,
    candidate_pool: int | None = None,
) -> DataFrame:
    """Greedy maximum-coverage selection (the classic (1−1/e) facility-
    location greedy) over a (doc, item) membership table: k rounds, each
    picking the document adding the most not-yet-covered items
    (deterministic argmax: gain DESC, id ASC) and folding its items into
    the covered set. This is the data-SELECTION primitive behind
    coverage-driven corpus subsetting ("pick 10k docs that span the
    vocabulary") — submodular, so greedy is the certified-approximation
    standard. Unrolled k rounds of anti-join + aggregate; covered set
    and selection are localCheckpointed per round (lineage O(1), the CC
    discipline). Work per round is O(|pairs|) with the covered set as
    the (broadcastable, items-bounded) right side.

    ``candidate_pool`` keeps only the N documents with the most
    distinct items (ties: min id) before the rounds — the shortlist a
    100 TB run needs (greedy over billions of docs is pointless when a
    round's winner always sits near the top of the size order; the
    SAME pruning runs in the oracle, so parity is exact by
    construction and the semantics are "greedy over the N largest").

    Output: (round, selected_id, gain, covered_total)."""
    sh = pairs.select(
        F.col(id_col).alias("did"), F.col(item_col).alias("w")
    ).distinct()
    if candidate_pool is not None:
        sizes = sh.groupBy("did").agg(F.count(F.lit(1)).alias("sz"))
        # top-N as orderBy+limit (TakeOrderedAndProject: per-partition
        # heaps, no all-rows SinglePartition sort) — the former global
        # rank window funneled the per-doc sizes table through one
        # partition, and candidate_pool=2000 sits past Spark's
        # WindowGroupLimit rescue threshold (r11 executed-plan audit).
        # Same deterministic total order, so the shortlist — and the
        # oracle parity — is unchanged.
        cands = (
            sizes.orderBy(F.col("sz").desc(), F.col("did").asc())
            .limit(candidate_pool)
            .select("did")
        )
        sh = sh.join(F.broadcast(cands), "did")
    sh = sh.localCheckpoint(eager=True)
    spark = pairs.sparkSession
    # derive the covered-set and id types from the INPUT: hardcoding
    # "w string" / int(did) crashed on non-string items and non-integer
    # doc ids (string URLs/UUIDs are first-class ids everywhere else in
    # this module; r9 review)
    from pyspark.sql import types as T

    item_type = sh.schema["w"].dataType
    id_type = sh.schema["did"].dataType
    covered = spark.createDataFrame(
        [], T.StructType([T.StructField("w", item_type, True)])
    )
    picked = []
    rows = []
    for r in range(1, k + 1):
        gains = sh
        if picked:
            gains = gains.filter(~F.col("did").isin(picked))
        gains = (
            gains.join(covered, "w", "left_anti")
            .groupBy("did")
            .agg(F.count(F.lit(1)).alias("gain"))
        )
        # 1-row argmax collect per round: the greedy's state is one
        # (id, gain) pair — the CC-convergence-count precedent, not a
        # data collect. orderBy+limit avoids a global window.
        top = gains.orderBy(
            F.col("gain").desc(), F.col("did").asc()
        ).limit(1).collect()
        if not top:
            break
        best_id, best_gain = top[0].did, int(top[0].gain)
        picked.append(best_id)
        # localCheckpoint, not persist: persist caches but keeps the
        # round-over-round union/distinct lineage, which a vanilla
        # 200-shuffle-partition session re-plans per consumer (measured
        # 40s → <10s at sf0.01 in driver_sim when the cut was added).
        covered = (
            covered.unionByName(
                sh.filter(F.col("did") == best_id).select("w")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        total = covered.count()
        rows.append((r, best_id, best_gain, total))
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("round", T.IntegerType(), False),
                T.StructField("selected_id", id_type, True),
                T.StructField("gain", T.LongType(), True),
                T.StructField("covered_total", T.LongType(), True),
            ]
        ),
    )

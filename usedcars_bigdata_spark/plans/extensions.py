"""Named queries for the extension operators (ext/): dedup, similarity
search, text analysis. SQL-expressible ones carry DuckDB oracles; the
hash-family ops (MinHash/SimHash/LSH — engine-specific hash functions) are
rows-only here and property-tested in tests/ against exact baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ext import dedup as X
from ..ext import similarity as SIM
from ..ext import text as TX
from ..operators.window import register_hub
from ..sources import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "ext_dedup_exact",
    oracle="""
    SELECT coalesce(md5(text), '__null__:' || CAST(doc_id AS VARCHAR))
             AS content_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups keyed by content digest — one shuffle on md5."""
    return X.exact_dedup_stats(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "ext_dedup_ngram_jaccard",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter * 1.0 / (na.n_sh + nb.n_sh - inter), 4) AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE inter * 1.0 / (na.n_sh + nb.n_sh - inter) >= 0.2
    """,
)
def ext_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (τ=0.2) via inverted-index
    self-join — the verification tier under MinHash/LSH."""
    docs = load_table(spark, sf_dir, "documents")
    sh = X.word_shingles(docs, "doc_id", "text", n=3, hashed=True)
    return X.jaccard_pairs(sh, "doc_id", threshold=0.2)


@query(
    "ext_pair_graph_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), e AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE inter * 1.0 / (na.n_sh + nb.n_sh - inter) >= 0.2
    ), verts AS (
      SELECT DISTINCT v FROM (SELECT id_a AS v FROM e
                              UNION ALL SELECT id_b FROM e)
    ), deg AS (
      SELECT v, count(*) AS d FROM (SELECT id_a AS v FROM e
                                    UNION ALL SELECT id_b FROM e) GROUP BY v
    ), tri AS (
      SELECT count(*) AS n FROM (
        SELECT w.a, w.b, w.c FROM
          (SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
           FROM e e1 JOIN e e2 ON e1.id_b = e2.id_a) w
        JOIN e ON e.id_a = w.a AND e.id_b = w.c)
    )
    SELECT (SELECT count(*) FROM verts) AS n_vertices,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT max(d) FROM deg) AS max_degree,
           (SELECT n FROM tri) AS n_triangles
    """,
)
def ext_pair_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph diagnostics (ext.dedup.pair_graph_stats) over the
    exact Jaccard pair graph (τ=0.2): vertex/edge counts, max degree, and
    the triangle count via the ordered-wedge join — the density signal
    separating genuine duplicate clusters (near-cliques) from chains of
    borderline pairs. Oracle replays the wedge join string-keyed."""
    docs = load_table(spark, sf_dir, "documents")
    sh = X.word_shingles(docs, "doc_id", "text", n=3, hashed=True)
    pairs = X.jaccard_pairs(sh, "doc_id", threshold=0.2)
    return X.pair_graph_stats(pairs)


# Shared gram → duplicated-run → merged-interval CTE chain for the two
# span oracles (one definition — the report and the removal can never
# certify diverging span semantics). Expects a prior CTE ``t`` exposing
# (doc_id, w).
_SPAN_MERGE_CTES = """g AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             array_to_string(w[i:i+4], ' ') AS gram
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
            FROM t WHERE len(w) >= 5)
    ), dfq AS (
      SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
      GROUP BY gram HAVING count(*) >= 2
    ), d AS (
      SELECT g.doc_id, g.pos FROM g JOIN dfq USING (gram)
    ), runs AS (
      SELECT doc_id, isl, min(pos) AS s, max(pos) + 5 AS e
      FROM (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                     AS isl
            FROM d)
      GROUP BY doc_id, isl
    ), merged AS (
      SELECT doc_id, m, min(s) AS ms, max(e) AS me
      FROM (
        SELECT doc_id, s, e,
               sum(newf) OVER (PARTITION BY doc_id ORDER BY s
                               ROWS UNBOUNDED PRECEDING) AS m
        FROM (
          SELECT doc_id, s, e,
                 CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS newf
          FROM (SELECT doc_id, s, e,
                       max(e) OVER (PARTITION BY doc_id ORDER BY s
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pm
                FROM runs))
      ) GROUP BY doc_id, m
    )"""


@query(
    "ext_dup_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), base AS (
      SELECT doc_id, len(w) AS n_tokens FROM t
    ), """
    + _SPAN_MERGE_CTES
    + """, per AS (
      SELECT doc_id, count(*) AS n_dup_spans,
             max(me - ms) AS longest_span_tokens,
             sum(me - ms) AS covered
      FROM merged GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens,
           coalesce(per.n_dup_spans, 0) AS n_dup_spans,
           coalesce(per.longest_span_tokens, 0) AS longest_span_tokens,
           round(coalesce(per.covered, 0) * 1.0 / b.n_tokens, 4)
             AS dup_token_frac
    FROM base b LEFT JOIN per ON b.doc_id = per.doc_id
    """,
)
def ext_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span extraction (ext.dedup.duplicated_spans, 5-grams,
    min_docs 2): localizes WHICH token ranges of each document are
    corpus-duplicated — the span-removal input of exact-substring dedup
    (Lee et al. 2022), where dup_gram_fraction only scores. Two
    doc-partitioned gaps-and-islands windows (runs of duplicated gram
    starts, then overlapping-interval merge); the oracle replays both
    windows string-keyed."""
    return X.duplicated_spans(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n=5, min_docs=2,
    )


@query(
    "ext_remove_dup_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT doc_id, text, len(w) AS n_tokens FROM t
    ), """
    + _SPAN_MERGE_CTES
    + """, sp AS (
      SELECT m.doc_id, m.ms, m.me,
             array_to_string((t.w)[m.ms + 1 : m.me], ' ') AS span_text
      FROM merged m JOIN t ON m.doc_id = t.doc_id
    ), surv AS (
      SELECT span_text, min(doc_id * 1048576 + ms) AS first_key
      FROM sp GROUP BY span_text
    ), rem AS (
      SELECT sp.doc_id, sp.ms, sp.me
      FROM sp JOIN surv ON sp.span_text = surv.span_text
      WHERE sp.doc_id * 1048576 + sp.ms <> surv.first_key
    ), toks AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, w[i] AS tok
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
            FROM t WHERE len(w) >= 5)
    ), kept AS (
      SELECT tk.doc_id, tk.idx, tk.tok FROM toks tk
      WHERE NOT EXISTS (
        SELECT 1 FROM rem
        WHERE rem.doc_id = tk.doc_id
          AND tk.idx >= rem.ms AND tk.idx < rem.me)
    ), reb AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_clean,
             count(*) AS n_tokens_kept
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id,
           coalesce(reb.text_clean,
                    CASE WHEN b.n_tokens < 5 THEN b.text ELSE '' END)
             AS text_clean,
           b.n_tokens,
           coalesce(reb.n_tokens_kept,
                    CASE WHEN b.n_tokens < 5 THEN b.n_tokens ELSE 0 END)
             AS n_tokens_kept
    FROM base b LEFT JOIN reb ON b.doc_id = reb.doc_id
    """,
)
def ext_remove_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup APPLIED (ext.dedup.remove_duplicated_spans,
    5-grams, min_docs 2): each duplicated span survives only at its first
    occurrence of that exact content (min doc, then min start); later
    copies are cut and documents reassembled. The oracle replays the full
    pipeline — span merge, per-content survivor election over the packed
    (doc·2²⁰+start) key, and ordered token rebuild — string-keyed."""
    return X.remove_duplicated_spans(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n=5, min_docs=2,
    )


@query(
    "ext_line_dedup",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             string_split(regexp_replace(trim(text),
                 '((\\S+\\s+){4}\\S+)\\s+', '\\1' || chr(10), 'g'),
               chr(10)) AS ls
      FROM documents
    ), l AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ls[i] AS line
      FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i
            FROM m)
    ), f AS (
      SELECT line, min(doc_id * 1048576 + pos) AS first_key
      FROM l WHERE length(line) >= 1 GROUP BY line
    ), kept AS (
      SELECT l.doc_id, l.pos, l.line FROM l JOIN f
        ON l.line = f.line AND l.doc_id * 1048576 + l.pos = f.first_key
      UNION ALL
      SELECT doc_id, pos, line FROM l WHERE length(line) < 1
    ), tot AS (
      SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id
    ), reb AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, coalesce(reb.text_dedup, '') AS text_dedup,
           t.n_lines, coalesce(reb.n_kept, 0) AS n_kept
    FROM tot t LEFT JOIN reb ON t.doc_id = reb.doc_id
    """,
)
def ext_line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup (ext.text.line_dedup — the RefinedWeb-style
    sub-document pass): repeated lines survive only at their first corpus
    occurrence and documents are reassembled in order. The harness corpus
    is single-line, so the entry first folds every 5th word break into a
    newline with one regexp (byte-identical on both engines — verified
    across all docs) to synthesize a multi-line corpus; the oracle
    replays survivor election over the packed (doc·2²⁰+pos) key and
    rebuilds with an ordered string_agg. Spark joins lines on xxhash64;
    the string-keyed oracle certifies equality at harness scale."""
    docs = load_table(spark, sf_dir, "documents")
    multi = docs.select(
        "doc_id",
        F.regexp_replace(
            F.trim("text"), r"((\S+\s+){4}\S+)\s+", "$1\n"
        ).alias("text"),
    )
    return TX.line_dedup(multi, "doc_id", "text")


@query(
    "ext_overlap_containment",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter * 1.0 / least(na.n_sh, nb.n_sh), 4) AS overlap
    FROM inter
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE inter * 1.0 / least(na.n_sh, nb.n_sh) >= 0.5
    """,
)
def ext_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-coefficient (containment) pairs (ext.dedup.overlap_pairs,
    τ=0.5): |A∩B|/min(|A|,|B|) flags subset relationships Jaccard
    under-scores — the republished-article-with-appended-boilerplate
    class. Same single-shuffle inverted-index join as the Jaccard tier."""
    docs = load_table(spark, sf_dir, "documents")
    sh = X.word_shingles(docs, "doc_id", "text", n=3, hashed=True)
    return X.overlap_pairs(sh, "doc_id", threshold=0.5)


@query(
    "ext_edit_distance_pairs",
    oracle="""
    WITH f AS (
      SELECT doc_id, text,
             md5(array_to_string(
               (string_split_regex(trim(text), '\\s+'))[1:2], ' ')) AS fp
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
    FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
    WHERE levenshtein(a.text, b.text) <= 60
    """,
)
def ext_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup pairs (ext.dedup.edit_distance_pairs):
    token-prefix fingerprint buckets generate candidates, JVM-native
    Levenshtein verifies candidates only (O(Σ|bucket|²), never N²) — the
    scattered-small-edits class the shingle tiers dilute. Hot prefix
    buckets above max_bucket are dropped as boilerplate, mirroring the
    LSH cap."""
    return X.edit_distance_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        max_dist=60, prefix_tokens=2,
    )


@query("ext_dedup_minhash_lsh")
def ext_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) candidates verified by exact Jaccard —
    rows-only here (engine-specific xxhash64); recall vs the exact pairs is
    asserted in tests/test_ext_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return X.minhash_near_dupes(docs, "doc_id", "text", n=3, threshold=0.2)


@query(
    "ext_dedup_clusters",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE inter * 1.0 / (na.n_sh + nb.n_sh - inter) >= 0.2
    ), edges AS (
      SELECT id_a AS s, id_b AS t FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(s, t) AS (
      SELECT s, t FROM edges
      UNION
      SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
    ), comp AS (
      SELECT s AS doc_id, least(s, min(t)) AS component FROM reach GROUP BY s
    )
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS component,
           d.doc_id = coalesce(c.component, d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """,
)
def ext_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: MinHash/LSH candidate pair graph (τ=0.2,
    exact-Jaccard-verified candidates only) → connected components via
    iterative min-label propagation → canonical-per-cluster labels.

    The oracle computes components from the EXACT pair graph (recursive-CTE
    transitive closure — viable at oracle scale). The engine defaults to
    the LSH-fed graph, the 100 TB path; the two agree because harness
    near-dup pairs are bimodal (all exact pairs sit at jaccard ≥ 0.8,
    where LSH recall is 1.0 — measured at sf0.01 and sf0.1, and pinned by
    tests/test_ext_dedup.py equivalence tests)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.near_dup_clusters(docs, "doc_id", "text", n=3, threshold=0.2)


@query(
    "ext_curation_v2",
    # The four stage oracles composed end-to-end (r9 promotion — this
    # was rows-only only because the composition hadn't been written):
    # surv = ext_dedup_exact's survivor set; the span-removal block
    # splices the SHARED _SPAN_MERGE_CTES constant (single-sourced with
    # ext_dup_spans / ext_remove_dup_spans) reading surv instead of
    # documents; the gate is ext_quality_percentile's formula over the
    # CLEANED text; the split is ext_hash_split's md5 bucket.
    oracle=r"""
    WITH surv AS (
      SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
    ), t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
      FROM surv
    ), base AS (
      SELECT doc_id, text, len(w) AS n_tokens FROM t
    ), """
    + _SPAN_MERGE_CTES
    + r""", sp AS (
      SELECT m.doc_id, m.ms, m.me,
             array_to_string((t.w)[m.ms + 1 : m.me], ' ') AS span_text
      FROM merged m JOIN t ON m.doc_id = t.doc_id
    ), survsp AS (
      SELECT span_text, min(doc_id * 1048576 + ms) AS first_key
      FROM sp GROUP BY span_text
    ), rem AS (
      SELECT sp.doc_id, sp.ms, sp.me
      FROM sp JOIN survsp ON sp.span_text = survsp.span_text
      WHERE sp.doc_id * 1048576 + sp.ms <> survsp.first_key
    ), toks AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, w[i] AS tok
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
            FROM t WHERE len(w) >= 5)
    ), kept AS (
      SELECT tk.doc_id, tk.idx, tk.tok FROM toks tk
      WHERE NOT EXISTS (
        SELECT 1 FROM rem
        WHERE rem.doc_id = tk.doc_id
          AND tk.idx >= rem.ms AND tk.idx < rem.me)
    ), reb AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_clean,
             count(*) AS n_tokens_kept
      FROM kept GROUP BY doc_id
    ), cleaned AS (
      SELECT b.doc_id,
             coalesce(reb.text_clean,
                      CASE WHEN b.n_tokens < 5 THEN b.text ELSE '' END)
               AS text,
             CAST(coalesce(reb.n_tokens_kept,
                           CASE WHEN b.n_tokens < 5 THEN b.n_tokens
                                ELSE 0 END) AS BIGINT) AS n_tokens_kept
      FROM base b LEFT JOIN reb ON b.doc_id = reb.doc_id
    ), ct AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS cw
      FROM cleaned WHERE length(text) > 0
    ), sq AS (
      SELECT doc_id,
             round(len(list_filter(cw, x -> x IN
                     ('the','a','of','and','to','in','is')))
                   * 1.0 / len(cw) * 0.5
                   + least(len(cw), 100) / 100.0 * 0.5, 4) AS quality_score
      FROM ct
    ), thr AS (
      SELECT round(quantile_cont(quality_score, 0.25), 4) AS threshold FROM sq
    ), gated AS (
      SELECT doc_id, quality_score FROM sq, thr
      WHERE quality_score >= threshold
    ), hb AS (
      SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 1000
               AS bucket
      FROM cleaned
    )
    SELECT c.doc_id, c.n_tokens_kept, g2.quality_score,
           CASE WHEN hb.bucket < 800 THEN 'train'
                WHEN hb.bucket < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM cleaned c
    JOIN gated g2 ON g2.doc_id = c.doc_id
    JOIN hb ON hb.doc_id = c.doc_id
    """,
)
def ext_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v2 — the round-4 sub-document dedup stages
    composed end-to-end: exact dedup (drop full copies) → corpus-wide
    duplicated-SPAN removal (cut repeated substrings, keep-first) →
    relative quality gate (percentile threshold on the cleaned text) →
    deterministic hash split. One declarative plan; every stage is
    individually oracle-backed (ext_dedup_exact, ext_remove_dup_spans,
    ext_quality_percentile, ext_hash_split) and the composed oracle
    (r9 promotion) chains those four SQLs end to end; pipeline
    invariants (monotone row counts, split completeness) stay
    pytest-pinned.

    Output: (doc_id, n_tokens_kept, quality_score, split)."""
    docs = load_table(spark, sf_dir, "documents")
    # Stage boundaries are MATERIALIZED (localCheckpoint): composing the
    # lazy stage plans multiplies re-planning — the audit measured 118
    # documents scans for this entry (each stage re-references its
    # predecessor several times, and the products compound); with the
    # two checkpoints the corpus is scanned a handful of times, which is
    # also how a production pipeline stages between passes.
    survivors = X.exact_dedup(docs, "doc_id", "text").localCheckpoint(
        eager=True
    )
    cleaned = (
        X.remove_duplicated_spans(survivors, "doc_id", "text", n=5, min_docs=2)
        .select("doc_id", F.col("text_clean").alias("text"), "n_tokens_kept")
        .localCheckpoint(eager=True)
    )
    gated = TX.quality_percentile_gate(
        cleaned.filter(F.length("text") > 0), "doc_id", "text", pct=0.25,
        exact=True,
    )
    with_q = cleaned.join(gated.select("doc_id", "quality_score"), "doc_id")
    split = TX.hash_split(with_q.select("doc_id"), "doc_id").select(
        "doc_id", "split"
    )
    return with_q.join(split, "doc_id").select(
        "doc_id", "n_tokens_kept", "quality_score", "split"
    )


@query(
    "ext_curation_pipeline",
    oracle="""
    WITH q AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             round(len(list_filter(string_split_regex(trim(text), '\\s+'),
                       x -> x IN ('the','a','of','and','to','in','is')))
                   * 1.0 / len(string_split_regex(trim(text), '\\s+')) * 0.5
                   + least(len(string_split_regex(trim(text), '\\s+')), 100)
                     / 100.0 * 0.5, 4) AS quality_score
      FROM documents
    ), keep AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    )
    SELECT q.doc_id, q.lang, q.n_tokens, q.quality_score
    FROM q JOIN keep USING (doc_id)
    WHERE q.quality_score >= 0.3
    """,
)
def ext_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline — the training-data story in one plan:
    quality-score → threshold filter → exact-dedup (canonical survivor
    only). Fused to ONE corpus scan + ONE shuffle (r11 scan audit: the
    join-of-projections form scanned documents four times): the quality
    projection carries lang + text through (quality_score passthrough),
    the content hash rides the same projection, and the deterministic
    min-id survivor comes from min_by(struct, doc_id) per hash —
    row-identical to exact_dedup's semi-join form (the survivor's own
    quality columns, the same min-id rule, ext/dedup.py:_content_hash's
    NULL-text sentinel)."""
    from ..ext.dedup import _content_hash

    docs = load_table(spark, sf_dir, "documents")
    scored = TX.quality_score(
        docs, "doc_id", "text", passthrough=("lang", "text")
    ).withColumn("__h", _content_hash("text", "doc_id")).drop("text")
    return (
        scored.groupBy("__h")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "n_tokens", "quality_score"),
                F.col("doc_id"),
            ).alias("__s")
        )
        .select("__s.*")
        .filter(F.col("quality_score") >= 0.3)
        .select("doc_id", "lang", "n_tokens", "quality_score")
    )


def _simhash_md5_oracle() -> str:
    """Replay of ext.dedup.simhash64_md5_chunks: md5-derived per-token
    bits, per-bit signed sums, chunk composition — all integer SQL."""
    sums = ",\n             ".join(
        "CAST(sum(CASE WHEN ((h60 >> {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        " AS BIGINT) AS s_{b}".format(b=b)
        if b < 60
        else "CAST(sum(CASE WHEN ((h4 >> {k}) & 1) = 1 THEN 1 ELSE -1 END)"
        " AS BIGINT) AS s_{b}".format(b=b, k=b - 60)
        for b in range(64)
    )
    chunks = ",\n           ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN s_{16 * j + k} > 0 THEN 1 ELSE 0 END << {k})"
            for k in range(16)
        )
        + f" AS INTEGER) AS fp_c{j}"
        for j in range(4)
    )
    return rf"""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h60,
             CAST('0x' || substr(md5(tok), 16, 1) AS INTEGER) AS h4
      FROM t
    ), s AS (
      SELECT doc_id, {sums}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           {chunks}
    FROM s
    """


@query("ext_dedup_simhash", oracle=_simhash_md5_oracle())
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints per document, hash-certified
    (ext.dedup.simhash64_md5_chunks): the same signed-bit-sum mechanism
    as the xxhash64 scale tier (simhash64), on an md5-derived bit source
    both engines evaluate, emitted as the 4x16-bit chunks the pigeonhole
    Hamming index keys on. Promoted from rows-only in round 8 on the
    replayable-hash playbook (minhash_lsh_md5_pairs precedent): every
    stage — tokenization, per-bit votes, threshold, chunk packing — is
    pinned by the value hash. The xxhash64 packed-int64 tier stays the
    scale path, bit-semantics property-tested in tests/test_ext_dedup.py."""
    return X.simhash64_md5_chunks(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "ext_ann_cosine_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), q AS (
      SELECT * FROM e WHERE vec_id < 10
    ), scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.emb, e.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(e.emb, e.emb))) AS cos
      FROM q JOIN e ON e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
)
def ext_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors against the corpus —
    broadcast cross join + ordered-fold dot products (bit-stable vs the
    oracle's sequential list_dot_product)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query("ext_ann_lsh_topk")
def ext_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 (rows-only; recall vs brute force
    asserted in tests/test_ext_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.hyperplane_lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "ext_dedup_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      WHERE vec_id < 800
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cos, 6) AS cosine
    FROM pairs WHERE cos >= 0.4
    """,
)
def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (τ=0.4 — the synthetic corpus
    has no tighter pairs), exact form for the oracle; the LSH-bucketed
    form (exact=False, default) is the scale path and is recall-tested
    in tests/test_ext_similarity.py. The fixture is capped at the first
    800 vectors (declared, not silent): this entry is the O(N²/2)
    correctness BASELINE for the bucketed path, and a baseline doesn't
    get cheaper by running on more rows — 800 vectors keep 160+
    qualifying pairs at sf0.1 while cutting the pair count 6x (the r7
    bench's single largest line at 22.8s; VERDICT r7 next-#6)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 800)
    return SIM.embedding_near_dup_pairs(emb, threshold=0.4, exact=True)


@query("ext_ann_ivf_topk")
def ext_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (k-means cells + n_probe scan) — rows-only (k-means centers
    are engine-specific); recall vs brute force asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "ext_embedding_norms",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6) AS avg_norm,
           round(min(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6) AS min_norm,
           round(max(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
)
def ext_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm diagnostics over the embedding column."""
    return SIM.norm_stats_by_label(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "ext_text_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
             AS n_bpe_tokens,
           length(text) AS n_chars_actual,
           round(length(regexp_replace(text, '\\s+', '', 'g')) * 1.0
                 / len(string_split_regex(trim(text), '\\s+')), 4) AS avg_token_len
    FROM documents
    """,
)
def ext_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization stats per document (native split/size)."""
    return TX.token_stats(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "ext_text_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    )
    SELECT doc_id,
           len(w) AS n_tokens,
           round(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
                 * 1.0 / len(w), 4) AS stopword_ratio,
           round(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
                 * 1.0 / len(w) * 0.5
                 + least(len(w), 100) / 100.0 * 0.5, 4) AS quality_score
    FROM t
    """,
)
def ext_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio + length-adequacy quality score per document."""
    return TX.quality_score(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def _langid_oracle() -> str:
    """Generate the langid oracle from the SAME LANG_PROFILES constant
    the operator scores with (single-source discipline: the two engines
    cannot silently disagree on a profile word). Scoring is hit counts
    WITH multiplicity; argmax ties break by profile insertion order; no
    hits -> 'und' — exactly ext.text.langid_heuristic."""
    langs = list(TX.LANG_PROFILES)
    score_cols = ",\n             ".join(
        "CAST(len(list_filter(w, x -> x IN ("
        + ", ".join(f"'{t}'" for t in TX.LANG_PROFILES[lang])
        + f"))) AS INTEGER) AS s_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pick = " ".join(
        f"WHEN s_{lang} = g THEN '{lang}'" for lang in langs[:-1]
    ) + f" ELSE '{langs[-1]}'"
    return rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents
    ), s AS (
      SELECT doc_id,
             {score_cols}
      FROM t
    ), g AS (
      SELECT doc_id, {best} AS g, * FROM s
    )
    SELECT doc_id,
           CASE WHEN g = 0 THEN 'und' {pick} END AS lang_pred,
           g AS lang_hits
    FROM g
    """


@query("ext_text_langid", oracle=_langid_oracle())
def ext_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword-profile language ID (ext.text.langid_heuristic):
    per-language stopword-hit counts (with multiplicity) from one pure
    column-expression pass, argmax with profile-order tie-break, zero
    hits -> 'und'. Promoted from rows-only in round 8: the scoring is
    deterministic integer arithmetic, so the full (lang_pred, lang_hits)
    output hash-certifies against an oracle generated from the same
    LANG_PROFILES constant; golden cases stay in tests/test_ext_text.py."""
    return TX.langid_heuristic(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "ext_doc_fingerprint",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(w[i] || ' ' || w[i + 1] || ' '
                                     || w[i + 2] || ' ' || w[i + 3]), 1, 8)
                  AS BIGINT) AS h
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 3)) AS i
            FROM t WHERE len(w) >= 4)
    ), sel AS (
      SELECT doc_id, list_sort(list(DISTINCT h) FILTER (h % 8 = 0)) AS fp
      FROM grams GROUP BY doc_id
    ), alldocs AS (
      SELECT t.doc_id, coalesce(s.fp, []) AS fp
      FROM t LEFT JOIN sel s ON t.doc_id = s.doc_id
    )
    SELECT doc_id,
           CAST(len(fp) AS INTEGER) AS fp_size,
           unnest(CASE WHEN len(fp) = 0
                       THEN [CAST(NULL AS BIGINT)] ELSE fp END) AS fp_hash
    FROM alldocs
    """,
)
def ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mod-p n-gram document fingerprints (ext.text.rolling_fingerprint,
    md5_32 tier): 4-word grams, keep gram hashes ≡ 0 (mod 8) — the
    winnowing-style content-defined sample. Promoted from rows-only in
    round 8 on the replayable-hash playbook (minhash_lsh_md5_pairs
    precedent): the md5_32 gram hash evaluates identically in both
    engines, and the per-doc sorted fingerprint is exploded to
    (doc_id, fp_size, fp_hash) rows — explode_outer keeps empty-
    fingerprint docs as a NULL row, so doc coverage is part of the hash.
    The xxhash64 tier stays the scale path (determinism + sampling-rate
    properties tested in tests/test_ext_text.py)."""
    fp = TX.rolling_fingerprint(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        hash_fn="md5_32",
    )
    return fp.select(
        "doc_id",
        "fp_size",
        F.explode_outer("fingerprint").alias("fp_hash"),
    )


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@query(
    "ext_video_frame_sample",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) * 10 AS duration_ms
      FROM documents
    ), sched AS (
      SELECT media_id, text,
             unnest(range(CAST(least(8, duration_ms // 1000 + 1) AS BIGINT)))
               AS i
      FROM m
    )
    SELECT media_id,
           CAST(i AS INTEGER) AS frame_idx,
           i * 1000 AS frame_ts_ms,
           sha256(text || ':' || CAST(i AS VARCHAR)) AS frame_sha
    FROM sched
    """,
)
def ext_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (ext.multimodal.sample_frames):
    documents → synthetic video media (payload = text bytes, duration =
    10 ms/byte) → mapInPandas 1-to-N frame expansion. The schedule math
    (min(max_frames, duration//every_ms + 1) frames at every_ms spacing)
    and the Arrow batch shape are real; the decode is the deterministic
    sha256 stub (no codecs in this container), which is what lets the
    DuckDB oracle replay the whole expansion — frame fingerprints hash
    the same UTF-8 bytes on both engines."""
    from ..ext import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_media_from_docs(docs, "video").withColumn(
        "duration_ms", (F.octet_length("payload") * 10).cast("long")
    )
    return MM.sample_frames(media, every_ms=1000, max_frames=8)


@query(
    "ext_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8 AS INTEGER) AS feat_dim,
           CAST(list_sum(list_transform(range(8), i ->
                strpos('0123456789abcdef', substr(sha256(text), 2*i+1, 1)) * 16
                + strpos('0123456789abcdef', substr(sha256(text), 2*i+2, 1))
                - 17)) AS BIGINT) AS feat_bytes_sum
    FROM documents
    """,
)
def ext_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents → synthetic binary media
    table (text bytes as payload) → Arrow-batched mapInPandas feature
    extraction (deterministic sha256 stub for the absent codecs,
    ext/multimodal.py) → JVM-side feature aggregation.

    Oracle-comparable because the stub is content-deterministic: feature i
    is byte i of sha256(payload)/255, so the summed feature bytes can be
    recomputed by DuckDB from sha256's hex string (DuckDB hashes the
    VARCHAR's UTF-8 bytes — identical input to the Python stub). The float
    features are folded back to exact integer bytes in-plan
    (round(x*255)), keeping the compared values integral on both sides."""
    from ..ext import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_media_from_docs(docs)
    feats = MM.extract_features(media, dim=8)
    return feats.select(
        "media_id",
        "feat_dim",
        F.expr(
            "CAST(round(aggregate(features, CAST(0.0 AS DOUBLE),"
            " (a, x) -> a + x * 255)) AS BIGINT)"
        ).alias("feat_bytes_sum"),
    )


@query(
    "ext_stratified_split",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
      FROM documents
    )
    SELECT source,
           CASE WHEN rn <= (8 * n_s) // 10 THEN 'train'
                WHEN rn <= (9 * n_s) // 10 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           min(doc_id) AS min_doc_id
    FROM r GROUP BY 1, 2
    """,
)
def ext_strat_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT stratified 80/10/10 split: within every source, documents
    rank by a salted md5 (deterministic shuffle order) and the first
    ⌊0.8·n_s⌋ go to train, the next ⌊0.9·n_s⌋−⌊0.8·n_s⌋ to val, the rest
    to test — per-stratum counts are GUARANTEED (ext_hash_split's
    per-doc hash gives proportions only in expectation; small or skewed
    strata can miss an entire split there). Same md5 idiom both engines,
    (hash, doc_id) tie-break so the assignment is total. The per-source
    rank window is stratum-bounded; a corpus-scale stratum takes the
    salted two-level rank (inverted_index precedent) — documented, not
    needed at harness scale. Output is the (source, split) count table
    with a min-id witness so the driver hashes the ASSIGNMENT, not just
    the sizes."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ws = Window.partitionBy("source")
    r = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(ws).alias("n_s"),
    )
    split = (
        F.when(F.col("rn") <= F.expr("(8 * n_s) div 10"), "train")
        .when(F.col("rn") <= F.expr("(9 * n_s) div 10"), "val")
        .otherwise("test")
    )
    return (
        r.select("doc_id", "source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@query(
    "rows_image_near_dupes",
    # Full replay of the aHash + chunk-index pipeline: the stand-in
    # decode chains sha256 over HEX STRINGS (multimodal.fake_image_pixels)
    # precisely so DuckDB's VARCHAR-only sha256 can reproduce the pixel
    # stream; `64*p > s` is the exact integer form of `pixel > mean`
    # (sum < 2^14, so s/64 is exact in float64 — the integer comparison
    # is equivalent and float-free); the bit string's chunk equi-join is
    # the same pigeonhole candidate index the Spark side uses.
    oracle="""
    WITH hh AS (
      SELECT doc_id AS media_id, sha256(text) AS h1, sha256(sha256(text)) AS h2
      FROM documents
    ), px AS (
      SELECT media_id, i,
             CASE WHEN i < 32
                  THEN CAST('0x' || substr(h1, 2 * i + 1, 2) AS INTEGER)
                  ELSE CAST('0x' || substr(h2, 2 * (i - 32) + 1, 2) AS INTEGER)
             END AS p
      FROM hh, (SELECT unnest(range(64)) AS i)
    ), stat AS (
      SELECT media_id, sum(p) AS s FROM px GROUP BY media_id
    ), bits AS (
      SELECT px.media_id,
             string_agg(CASE WHEN 64 * p > s THEN '1' ELSE '0' END,
                        '' ORDER BY i) AS bstr
      FROM px JOIN stat USING (media_id) GROUP BY px.media_id
    ), ch AS (
      SELECT media_id, bstr, j, substr(bstr, 16 * j + 1, 16) AS ck
      FROM bits, (SELECT unnest(range(4)) AS j)
    ), cands AS (
      SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
             a.bstr AS ba, b.bstr AS bb
      FROM ch a JOIN ch b
        ON a.j = b.j AND a.ck = b.ck AND a.media_id < b.media_id
    )
    SELECT id_a, id_b,
           CAST(len(list_filter(range(1, 65),
                k -> substr(ba, k, 1) <> substr(bb, k, 1))) AS INTEGER)
             AS hamming
    FROM cands
    WHERE len(list_filter(range(1, 65),
              k -> substr(ba, k, 1) <> substr(bb, k, 1))) <= 3
    """,
)
def ext_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs (ext.multimodal.image_near_dupes):
    perceptual aHash over the binary payload column, then the SimHash
    chunk-index Hamming pairing shared with the text tier — the image leg
    of cross-modality dedup. Media is the deterministic synthesized set:
    duplicated document texts encode to identical payloads, so every
    exact text duplicate must surface as a hamming-0 pair (ground-truth
    checked in tests; duplicate presence varies by SF). Promoted from
    rows-only in round 8: the stand-in decode now chains sha256 over hex
    strings, making the pixel stream, the mean-threshold bits, the
    chunk candidate index and the Hamming filter all SQL-replayable —
    the whole image-dedup mechanism hash-certifies. Radius behavior
    with a REAL decoder stays pinned in tests via injection. (The name
    keeps its historical rows_ prefix.)"""
    from ..ext import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_media_from_docs(docs)
    return MM.image_near_dupes(media, max_hamming=3)


# ---------------------------------------------------------------------------
# Corpus preparation (round 2): normalization, packing, training-mix sampling
# ---------------------------------------------------------------------------


@query(
    "ext_text_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(lower(regexp_replace(text, '[[:cntrl:]]', ' ', 'g')),
                               '\s+', ' ', 'g')) AS text_norm
    FROM documents
    """,
)
def ext_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic text cleanup (lowercase + control-char strip +
    whitespace collapse) — ext.text.normalize_text; all narrow native
    regexp ops, zero shuffles."""
    return TX.normalize_text(load_table(spark, sf_dir, "documents"), "doc_id", "text")


# Planted decomposed sequences (e + U+0301, n + U+0303, a + U+030A,
# o + U+0308): the harness documents are ASCII, so the NFC query appends
# real combining characters in-plan. The same Python str (raw codepoints
# by the time it reaches each engine) is embedded in both the Spark
# expression and the DuckDB oracle; NFC composes each pair to one
# codepoint. Escapes (not literal accents) keep the source encoding-proof.
_NFC_AUG_SQL = "text || ' cafe\u0301 man\u0303ana a\u030angstro\u0308m'"


@query(
    "ext_text_normalize_nfc",
    oracle=f"""
    SELECT doc_id, nfc_normalize({_NFC_AUG_SQL}) AS text_norm
    FROM documents
    """,
)
def ext_text_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization via Arrow-batched mapInPandas
    (ext.text.normalize_text_unicode) over text with planted decomposed
    combining sequences; DuckDB's nfc_normalize replays it. The one
    declared Python stage of the text stack — run once at ingest."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.expr(_NFC_AUG_SQL)
    )
    return TX.normalize_text_unicode(docs, "doc_id", "text", form="NFC")


@query(
    "ext_pack_shards",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER w, 0) / 4096) AS BIGINT) AS shard,
           CAST(coalesce(sum(n_tokens) OVER w, 0) % 4096 AS BIGINT) AS offset_in_shard
    FROM t
    WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
)
def ext_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: contiguous token-budget sharding (4096 tokens) of
    the corpus ordered by doc_id — ext.text.pack_shards over
    ext.text.token_stats counts, in the DISTRIBUTED two-pass form
    (doc_ids range-bucketed 256 wide → per-bucket sums → cumulative
    bucket offsets → bucket-partitioned prefix window; only the tiny
    bucket aggregate ever passes through a single partition). The oracle
    replays the equivalent single global prefix-sum window in SQL —
    output is identical by construction; equality of the two engine
    shapes is also pinned by tests/test_ext_text.py."""
    docs = load_table(spark, sf_dir, "documents")
    counts = TX.token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    return TX.pack_shards(counts, "doc_id", "n_tokens", budget=4096, bucket_width=256)


# ---------------------------------------------------------------------------
# Corpus hygiene (round 2): PII scrub, repetition, contamination, boilerplate
# ---------------------------------------------------------------------------

# The harness documents are digit-free word soup, so the PII query plants
# deterministic PII spans in-plan (same expression on both engines) and then
# detects/redacts them — the redaction path is exercised for real, with a
# non-trivial expected output.
_PII_AUG_SQL = (
    "text || ' contact user' || doc_id || '@example.com"
    " call +1 555 0147 ip 10.0.0.' || (doc_id % 256) || ' end'"
)


@query(
    "ext_pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents
    ), s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
             regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                 '<EMAIL>', 'g') AS t1
      FROM aug
    ), s2 AS (
      SELECT doc_id, n_emails,
             len(regexp_extract_all(t1,
                 '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ips,
             regexp_replace(t1,
                 '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
                 '<IP>', 'g') AS t2
      FROM s1
    )
    SELECT doc_id, n_emails, n_ips,
           len(regexp_extract_all(t2, '\\+?\\d[\\d -]{{7,}}\\d')) AS n_phones,
           regexp_replace(t2, '\\+?\\d[\\d -]{{7,}}\\d', '<PHONE>', 'g')
             AS text_redacted
    FROM s2
    """,
)
def ext_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: plant deterministic email/IP/phone spans, then count and
    redact them with ext.text.redact_pii (native regexp chain, narrow).
    Each count is taken on the progressively-redacted text — counts equal
    redaction events — and the oracle replays the same staged logic;
    replacement order email → ip → phone keeps the broad phone pattern off
    structured matches (see redact_pii docstring)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.expr(_PII_AUG_SQL)
    )
    return TX.redact_pii(docs, "doc_id", "text")


@query(
    "ext_text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), g AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    )
    SELECT doc_id,
           count(*) AS n_grams,
           count(DISTINCT gram) AS n_distinct,
           round(1.0 - count(DISTINCT gram) * 1.0 / count(*), 4) AS rep_ratio
    FROM g GROUP BY doc_id
    """,
)
def ext_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document word-3-gram repetition ratio — degenerate-document
    detector; pure array math, no shuffle (the oracle replays it with an
    unnest+GROUP BY because DuckDB lacks the array form)."""
    return TX.repetition_stats(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3
    )


@query(
    "ext_contamination_ngram",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), g AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
             || w[i+3] || ' ' || w[i+4] AS gram
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
            FROM t WHERE len(w) >= 5)
    ), b AS (
      SELECT DISTINCT gram FROM g WHERE doc_id < 20
    )
    SELECT g.doc_id,
           count(*) AS n_grams,
           count(b.gram) AS n_hit,
           round(count(b.gram) * 1.0 / count(*), 4) AS contamination
    FROM g LEFT JOIN b ON g.gram = b.gram
    GROUP BY g.doc_id
    """,
)
def ext_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: distinct word-5-gram overlap of every
    document against a held-out set (docs with doc_id < 20 stand in for an
    eval set — a FIXED document count, independent of corpus size, so the
    forced broadcast of its gram set stays small at any scale; a
    corpus-growing stand-in like `doc_id % k == 0` would blow Spark's 8 GB
    broadcast limit at 100 TB). Benchmark grams broadcast; corpus side
    never shuffles rows — only the per-doc count aggregation moves data."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20)
    return TX.ngram_contamination(docs, bench, "doc_id", "text", n=5)


@query(
    "ext_corpus_length_histogram",
    oracle="""
    WITH t AS (
      SELECT len(string_split_regex(trim(text), '\\s+')) AS n FROM documents
    )
    SELECT CAST(n // 16 AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(min(n) AS BIGINT) AS min_tokens,
           CAST(max(n) AS BIGINT) AS max_tokens
    FROM t GROUP BY 1
    """,
)
def ext_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile in exact 16-token integer buckets (float-free
    binning → cross-engine identical edges)."""
    return TX.length_histogram(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", bucket_tokens=16
    )


@query(
    "ext_boilerplate_ngrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), g AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
             || w[i+3] || ' ' || w[i+4] AS gram
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
            FROM t WHERE len(w) >= 5)
    )
    SELECT gram, count(*) AS n_docs
    FROM g GROUP BY gram HAVING count(*) >= 2
    ORDER BY n_docs DESC, gram
    LIMIT 20
    """,
)
def ext_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top cross-document boilerplate 5-grams (document frequency ≥ 2,
    deterministic tie-break) — C4-style repeated-block detector; final
    ordered limit plans as TakeOrderedAndProject."""
    return TX.boilerplate_ngrams(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=5, min_docs=2, top=20
    )


# ---------------------------------------------------------------------------
# Corpus preparation (round 3): hash split, vocabulary, int8 quantization
# ---------------------------------------------------------------------------


@query(
    "ext_hash_split",
    oracle="""
    WITH h AS (
      SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hx
      FROM documents
    ), b AS (
      SELECT doc_id,
             ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 1000
               AS bucket
      FROM h
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CASE WHEN bucket < 800 THEN 'train'
                WHEN bucket < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def ext_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id)
    bucket (ext.text.hash_split) — no shuffle, no sampling state, stable
    under appends/repartitioning. Oracle decodes the same 4 hex digits
    via strpos arithmetic (DuckDB has no conv())."""
    return TX.hash_split(load_table(spark, sf_dir, "documents"), "doc_id")


@query(
    "ext_vocab_topk",
    oracle="""
    WITH t0 AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    ), t AS (
      SELECT * FROM t0 WHERE token <> ''
    ), pd AS (
      SELECT token, doc_id, count(*) AS n FROM t GROUP BY 1, 2
    )
    SELECT token,
           CAST(sum(n) AS BIGINT) AS n_occurrences,
           count(*) AS n_docs
    FROM pd GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 100
    """,
)
def ext_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus vocabulary with occurrence + document frequency
    (ext.text.vocabulary_topk): per-(token, doc) map-side combine before
    the token shuffle; final ordered limit plans TakeOrderedAndProject."""
    return TX.vocabulary_topk(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", top=100
    )


@query(
    "ext_embedding_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v, CAST(len(v) AS INTEGER) AS n_dims,
             list_max(list_transform(v, x -> abs(x))) AS mx
      FROM e
    ), qq AS (
      SELECT vec_id, n_dims, mx / 127.0 AS scale,
             CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x -> CAST(round(x / (mx / 127.0))
                                                   AS INTEGER))
             END AS q
      FROM s
    )
    SELECT vec_id, n_dims, round(scale, 6) AS scale,
           array_to_string(q, ',') AS q_csv,
           CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT))) AS BIGINT)
             AS sum_q,
           CAST(list_sum(list_transform(q, x -> CAST(abs(x) AS BIGINT))) AS BIGINT)
             AS l1_q
    FROM qq
    """,
)
def ext_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (ext.similarity.quantize_int8):
    per-vector scale = max|x|/127, narrow projection, zero shuffles; the
    oracle replays the identical double-precision expression tree and the
    integer audit columns pin the quantized values exactly. The contract
    output serializes the quantized vector to a CSV string (q_csv) because
    raw array cells are unhashable in the driver's pandas canonicalizer —
    the rel_collect_sorted_lists precedent; the library function keeps its
    typed array<int> output."""
    q = SIM.quantize_int8(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "n_dims",
        "scale",
        F.expr("array_join(transform(q, x -> CAST(x AS STRING)), ',')").alias(
            "q_csv"
        ),
        "sum_q",
        "l1_q",
    )


@query("rows_stratified_sample")
def rows_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampling: per-language sampleBy over documents
    (rows-only: Bernoulli draws depend on partition layout, so the sampled
    SET is engine-specific; seeded-determinism and per-stratum bounds are
    property-tested in tests/test_ext_text.py)."""
    from ..operators.sample import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "pt": 1.0}
    return stratified_sample(docs, "lang", fractions).select("doc_id", "lang")


@query(
    "ext_mixture_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) AS hx
      FROM documents
    ), b AS (
      SELECT doc_id, lang,
             ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 1000
               AS bucket
      FROM h
    )
    SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket,
           bucket < (CASE WHEN lang = 'en' THEN 300 ELSE 1000 END) AS kept
    FROM b
    """,
)
def ext_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture quota sampling (ext.text.mixture_sample): keep 30% of
    the dominant language (en), 100% of the rest, by salted md5 bucket —
    deterministic, shuffle-free, independent of the train/test split hash.
    The deterministic counterpart of rows_stratified_sample's Bernoulli
    draw; the oracle decodes the identical salted hash."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.mixture_sample(docs, "doc_id", "lang", rates={"en": 0.3})


@query(
    "ext_dup_gram_fraction",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), g AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    ), occ AS (
      SELECT doc_id, gram, count(*) AS occ FROM g GROUP BY 1, 2
    ), dfreq AS (
      SELECT gram, count(*) AS df FROM occ GROUP BY 1
    )
    SELECT o.doc_id,
           CAST(sum(o.occ) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN d.df >= 2 THEN o.occ ELSE 0 END) AS BIGINT)
             AS dup_grams,
           round(sum(CASE WHEN d.df >= 2 THEN o.occ ELSE 0 END) * 1.0
                 / sum(o.occ), 4) AS dup_frac,
           (sum(CASE WHEN d.df >= 2 THEN o.occ ELSE 0 END) * 1.0
                 / sum(o.occ)) >= 0.5 AS flagged
    FROM occ o JOIN dfreq d USING (gram)
    GROUP BY o.doc_id
    """,
)
def ext_dup_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style inter-document repetition
    (ext.dedup.duplicated_gram_fraction): per doc, the fraction of word
    3-gram occurrences whose gram appears in >= 2 documents corpus-wide.
    O(total grams) with map-side combines — scores every doc against
    corpus-global stats with no pairwise stage."""
    docs = load_table(spark, sf_dir, "documents")
    return X.duplicated_gram_fraction(docs, "doc_id", "text", n=3, min_docs=2)


@query("ext_semantic_dedup")
def ext_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (ext.similarity.semantic_dedup): k-means cells bound the
    pair search, min-id survivor per ε-ball. Rows-only: the fitted
    centroids are data-dependent so no static SQL oracle exists;
    drop-soundness and determinism are property-tested against a numpy
    brute-force recompute in tests/test_ext_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    # τ=0.4 matches ext_dedup_embedding_cosine's threshold — the harness
    # embeddings are weakly clustered, so higher thresholds drop nothing.
    return SIM.semantic_dedup(emb, n_clusters=16, threshold=0.4)


@query("ext_embedding_pca")
def ext_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection to 16 dims (ext.similarity.pca_project): driver-side
    SVD basis on a bounded sample, corpus projected in one Arrow-batched
    matmul pass. Rows-only (data-dependent basis); isometry/variance-order
    properties tested in tests/test_ext_similarity.py."""
    return SIM.pca_project(load_table(spark, sf_dir, "embeddings"), k=16)


@query(
    "ext_unigram_logprob",
    oracle="""
    WITH t0 AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), t AS (
      SELECT * FROM t0 WHERE tok <> ''
    ), c AS (
      SELECT tok, count(*) AS n_tok FROM t GROUP BY tok
    ), tot AS (
      SELECT sum(n_tok) AS n_total FROM c
    ), p AS (
      SELECT tok, ln(n_tok * 1.0 / n_total) AS logp FROM c, tot
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(avg(p.logp), 4) AS avg_logp,
           round(exp(-avg(p.logp)), 2) AS ppl
    FROM t JOIN p USING (tok)
    GROUP BY t.doc_id
    """,
)
def ext_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-probability quality score (ext.text.unigram_logprob_score)
    — the CCNet-style perplexity gate with the corpus as its own unigram
    model; Spark joins on hashed tokens, the oracle on token strings."""
    return TX.unigram_logprob_score(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "ext_inverted_index",
    oracle="""
    WITH t AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    )
    SELECT token, count(*) AS n_docs,
           array_to_string((list_sort(list(doc_id)))[1:20], ',') AS postings_csv
    FROM t
    WHERE token <> ''
    GROUP BY token
    HAVING count(*) >= 2
    """,
)
def ext_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (ext.text.inverted_index): token -> document
    frequency + the 20 smallest doc ids as a capped postings sample. The
    cap is applied as a salted two-level min-k BEFORE collect_list so no
    aggregation buffer (or window task) ever holds a stopword's full
    corpus postings; the oracle slices the same 20-smallest prefix off a
    sorted DuckDB list. Postings are serialized to a CSV string in the
    CONTRACT output only (raw array cells are unhashable in the driver's
    pandas canonicalizer — the quantize/collect_sorted_lists precedent);
    the library function keeps its typed array output."""
    idx = TX.inverted_index(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        postings_cap=20,
        min_docs=2,
    )
    return idx.select(
        "token",
        "n_docs",
        F.expr(
            "array_join(transform(postings, x -> CAST(x AS STRING)), ',')"
        ).alias("postings_csv"),
    )


@query(
    "ext_tfidf_top_terms",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2
    ), dfq AS (
      SELECT token, count(*) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT count(*) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
             round(tf.tf * ln((n.n + 1) * 1.0 / (dfq.df + 1)), 4) AS tfidf
      FROM tf JOIN dfq USING (token), n
    )
    SELECT * FROM (
      SELECT doc_id, token, tf, df, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token) AS "rank"
      FROM scored
    ) WHERE "rank" <= 3
    """,
)
def ext_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (ext.text.tfidf_top_terms), exact
    terms via two aggregates + a vocabulary-sized join — no fixed-width
    feature hashing. Ordering (and thus the top-k cut) uses the ROUNDED
    score on both engines so cross-engine ULP noise in ln() cannot flip
    ranks; remaining ties break on the token text."""
    return TX.tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3
    )


@query(
    "ext_group_cap_sample",
    oracle="""
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 50
    """,
)
def ext_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (ext.text.group_cap_sample): keep at most 50
    docs per language, chosen by a salted md5 permutation of the id —
    deterministic under re-runs, appends, and repartitioning, unlike
    sample() whose draws move with partition layout. Complements
    ext_mixture_sample (rate-based) with an exact per-group ceiling."""
    return TX.group_cap_sample(
        load_table(spark, sf_dir, "documents"), "doc_id", "lang", cap=50
    )


@query(
    "ext_doc_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), s AS (
      SELECT doc_id, w, len(w) AS n,
             unnest(generate_series(1, len(w), 48)) AS start
      FROM t WHERE len(w) >= 1
    )
    SELECT doc_id,
           CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
           CAST(least(64, n - start + 1) AS BIGINT) AS n_tokens,
           array_to_string(w[start : start + 63], ' ') AS chunk_text
    FROM s
    """,
)
def ext_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (ext.text.chunk_documents): 64-token
    windows every 48 tokens. Token array projected once per row, explode
    fans out chunk rows, zero shuffles — the context-window prep step
    between curation and pack_shards."""
    return TX.chunk_documents(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        chunk_size=64,
        stride=48,
    )


@query(
    "ext_quality_percentile",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), s AS (
      SELECT doc_id,
             round(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
                   * 1.0 / len(w) * 0.5
                   + least(len(w), 100) / 100.0 * 0.5, 4) AS quality_score
      FROM t
    ), thr AS (
      SELECT round(quantile_cont(quality_score, 0.25), 4) AS threshold FROM s
    )
    SELECT doc_id, quality_score, threshold
    FROM s, thr
    WHERE quality_score >= threshold
    """,
)
def ext_quality_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality gate (ext.text.quality_percentile_gate): keep docs
    at or above the corpus p25 quality score. This is the exact-percentile
    oracle form (interpolation parity with DuckDB quantile_cont); the
    production default is the approx_percentile sketch — same contract,
    map-side combinable — exercised by ext_quality_percentile_approx."""
    return TX.quality_percentile_gate(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", pct=0.25, exact=True
    )


@query("ext_quality_percentile_approx")
def ext_quality_pct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale form of ext_quality_percentile: approx_percentile quantile
    sketch for the threshold. Rows-only (sketch values are
    implementation-defined); the bound vs the exact gate is
    property-tested in tests/test_ext_text.py."""
    return TX.quality_percentile_gate(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", pct=0.25, exact=False
    )


@query(
    "ext_weighted_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 4) AS hx
      FROM documents WHERE n_chars > 0
    ), u AS (
      SELECT doc_id, n_chars,
             (((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) + 1)
             / 65536.0 AS u
      FROM h
    )
    SELECT doc_id, n_chars, round(-ln(u) / n_chars, 6) AS sample_key
    FROM u
    ORDER BY sample_key, doc_id
    LIMIT 100
    """,
)
def ext_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (ext.text.weighted_sample,
    Efraimidis-Spirakis): inclusion odds proportional to document length,
    selection = one TakeOrderedAndProject over hash-derived keys — no
    global sort, no sampling state. The oracle decodes the identical
    salted 4-hex-digit draw and replays the race."""
    return TX.weighted_sample(
        load_table(spark, sf_dir, "documents"), "doc_id", "n_chars", k=100
    )


@query(
    "ext_char_entropy",
    oracle="""
    WITH c AS (
      SELECT doc_id, string_split(text, '') AS ch, length(text) AS n
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars,
           CAST(len(list_distinct(ch)) AS BIGINT) AS n_distinct_chars,
           round(list_sum(list_transform(list_distinct(ch),
                 c2 -> -(len(list_filter(ch, x -> x = c2)) * 1.0 / n)
                       * ln(len(list_filter(ch, x -> x = c2)) * 1.0 / n))), 4)
             AS entropy
    FROM c
    """,
)
def ext_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy (ext.text.char_entropy):
    gibberish/encoded-blob detector, zero shuffles, one higher-order
    fold per row."""
    return TX.char_entropy(load_table(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Corpus-quality rule sets (round 4 late batch)
# ---------------------------------------------------------------------------

# The harness documents are single-line word soup (no \n, '.', '{', bullets),
# so the line-based Gopher/C4 rules would be trivially constant on them.
# Both entries therefore UNION a small set of planted fixture documents —
# spelled as identical literals on the Spark side (createDataFrame) and the
# oracle side (VALUES with chr(10) line joins) — so every rule branch is
# exercised by the driver comparison, not only by pytest.

_GOPHER_FIXTURES = [
    (1000000001, "- bullet one here\n- bullet two here\n* third bullet\nregular closing line."),
    (1000000002, "the story goes on...\nand on it goes…\na short end"),
    (1000000003, "# # ## tags # everywhere… # yes..."),
    (
        1000000004,
        ". ".join(
            ["the quick brown fox jumps over the lazy dog and runs to the green park in the warm sun"] * 3
        )
        + ".",
    ),
]

_C4_FIXTURES = [
    (2000000001, "this first line has more than five words total.\nshort one.\nno punctuation end"),
    (2000000002, "function foo() { return 1; }"),
    (2000000003, "lorem ipsum dolor sit amet, consectetur adipiscing elit."),
    (2000000004, "please enable javascript to view this awesome page!"),
]


def _docs_with_fixtures(spark: SparkSession, sf_dir: str, fixtures) -> DataFrame:
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(fixtures, "doc_id long, text string")
    return base.unionByName(planted)


_GOPHER_FIXTURE_SQL = """
      SELECT * FROM (VALUES
        (1000000001, '- bullet one here' || chr(10) || '- bullet two here' || chr(10) || '* third bullet' || chr(10) || 'regular closing line.'),
        (1000000002, 'the story goes on...' || chr(10) || 'and on it goes…' || chr(10) || 'a short end'),
        (1000000003, '# # ## tags # everywhere… # yes...'),
        (1000000004, 'the quick brown fox jumps over the lazy dog and runs to the green park in the warm sun. the quick brown fox jumps over the lazy dog and runs to the green park in the warm sun. the quick brown fox jumps over the lazy dog and runs to the green park in the warm sun.')
      ) t(doc_id, text)
"""

_C4_FIXTURE_SQL = """
      SELECT * FROM (VALUES
        (2000000001, 'this first line has more than five words total.' || chr(10) || 'short one.' || chr(10) || 'no punctuation end'),
        (2000000002, 'function foo() { return 1; }'),
        (2000000003, 'lorem ipsum dolor sit amet, consectetur adipiscing elit.'),
        (2000000004, 'please enable javascript to view this awesome page!')
      ) t(doc_id, text)
"""


@query(
    "ext_gopher_quality",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      {_GOPHER_FIXTURE_SQL}
    ),
    m AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS w,
             string_split(text, chr(10)) AS lines
      FROM docs
    ),
    r AS (
      SELECT doc_id,
             len(w) AS n_words,
             round(list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w), 4)
               AS mean_word_len,
             round((len(list_filter(w, x -> contains(x, '#')))
                    + len(list_filter(w, x -> contains(x, '...')))
                    + len(list_filter(w, x -> contains(x, '…')))) * 1.0 / len(w), 4)
               AS symbol_ratio,
             round(len(list_filter(lines, l -> starts_with(l, '-')
                                            OR starts_with(l, '*')
                                            OR starts_with(l, '•'))) * 1.0 / len(lines), 4)
               AS bullet_line_frac,
             round(len(list_filter(lines, l -> ends_with(l, '...')
                                            OR ends_with(l, '…'))) * 1.0 / len(lines), 4)
               AS ellipsis_line_frac,
             round(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 / len(w), 4)
               AS alpha_word_frac,
             len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and'
                                   OR x = 'to' OR x = 'in' OR x = 'is'))
               AS stopword_hits
      FROM m
    )
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS n_words,
           mean_word_len, symbol_ratio, bullet_line_frac, ellipsis_line_frac,
           alpha_word_frac,
           CAST(stopword_hits AS INTEGER) AS stopword_hits,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio <= 0.1
            AND bullet_line_frac <= 0.9
            AND ellipsis_line_frac <= 0.3
            AND alpha_word_frac >= 0.8
            AND stopword_hits >= 2) AS gopher_pass
    FROM r
    """,
)
def ext_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-set quality signals (ext.text.gopher_quality) over the
    corpus + planted rule-exercising fixtures. All native higher-order
    functions; zero shuffles; verdict computed on the rounded metrics so
    both engines make identical threshold decisions."""
    return TX.gopher_quality(
        _docs_with_fixtures(spark, sf_dir, _GOPHER_FIXTURES), "doc_id", "text"
    )


@query(
    "ext_c4_filters",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      {_C4_FIXTURE_SQL}
    ),
    m AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM docs
    )
    SELECT doc_id,
           CAST(len(lines) AS INTEGER) AS n_lines,
           CAST(len(list_filter(lines,
                l -> (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
                      OR ends_with(l, '."'))
                     AND len(string_split_regex(trim(l), '\\s+')) >= 5))
             AS INTEGER) AS n_kept_lines,
           contains(lower(text), 'lorem ipsum') AS has_lorem,
           contains(text, '{{') AS has_brace,
           contains(lower(text), 'javascript') AS has_javascript,
           (NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{{')
            AND NOT contains(lower(text), 'javascript')
            AND len(list_filter(lines,
                l -> (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
                      OR ends_with(l, '."'))
                     AND len(string_split_regex(trim(l), '\\s+')) >= 5)) >= 1)
             AS c4_keep
    FROM m
    """,
)
def ext_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line/document hygiene (ext.text.c4_line_filters) over the
    corpus + planted fixtures covering every rule branch (brace leak,
    lorem-ipsum placeholder, javascript boilerplate, surviving-line
    count)."""
    return TX.c4_line_filters(
        _docs_with_fixtures(spark, sf_dir, _C4_FIXTURES), "doc_id", "text"
    )


@query(
    "ext_domain_divergence",
    oracle="""
    WITH words AS (
      SELECT source AS domain, w AS word
      FROM (SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
      WHERE w <> ''
    ),
    bd AS (SELECT domain, word, count(*) AS nw FROM words GROUP BY 1, 2),
    dt AS (SELECT domain, sum(nw) AS nd FROM bd GROUP BY 1),
    cw AS (SELECT word, sum(nw) AS cw FROM bd GROUP BY 1),
    ct AS (SELECT sum(cw) AS nc FROM cw)
    SELECT domain,
           CAST(nd AS BIGINT) AS n_tokens,
           round(sum((nw * 1.0 / nd) * ln((nw * 1.0 / nd) / (cw * 1.0 / nc))), 6)
             AS kl_divergence
    FROM bd JOIN dt USING (domain) JOIN cw USING (word) CROSS JOIN ct
    GROUP BY domain, nd
    """,
)
def ext_domain_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence vs the corpus distribution
    (ext.text.domain_divergence) — the mixture-weighting signal for
    spotting off-distribution sources. Corpus side of the join is
    vocabulary-sized and broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.domain_divergence(docs, "source", "text")


@query(
    "ext_bigram_logprob",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ),
    b AS (
      SELECT doc_id, p[1] AS w1, p[2] AS w2
      FROM (SELECT doc_id,
                   unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS p
            FROM w)
    ),
    c12 AS (SELECT w1, w2, count(*) AS n12 FROM b GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY 1),
    lp AS (
      SELECT w1, w2, ln(n12 * 1.0 / n1) AS lp
      FROM c12 JOIN c1 USING (w1)
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(lp), 4) AS avg_logp,
           round(exp(-avg(lp)), 2) AS ppl
    FROM b JOIN lp USING (w1, w2)
    GROUP BY doc_id
    """,
)
def ext_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality gate (ext.text.bigram_logprob_score): mean
    conditional log-probability per document under the corpus bigram
    model — hashed pair keys on the Spark side, string keys in the
    oracle."""
    return TX.bigram_logprob_score(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query(
    "ext_langid_confusion",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
        len(list_filter(ws, x -> x='the' OR x='and' OR x='of' OR x='to' OR x='a')) AS en,
        len(list_filter(ws, x -> x='der' OR x='die' OR x='und' OR x='das' OR x='ist')) AS de,
        len(list_filter(ws, x -> x='el' OR x='la' OR x='de' OR x='que' OR x='y')) AS es,
        len(list_filter(ws, x -> x='le' OR x='la' OR x='et' OR x='les' OR x='des')) AS fr,
        len(list_filter(ws, x -> x='o' OR x='a' OR x='de' OR x='que' OR x='e')) AS pt
      FROM w
    ),
    p AS (
      SELECT doc_id, lang,
        CASE WHEN greatest(en, de, es, fr, pt) = 0 THEN 'und'
             WHEN en = greatest(en, de, es, fr, pt) THEN 'en'
             WHEN de = greatest(en, de, es, fr, pt) THEN 'de'
             WHEN es = greatest(en, de, es, fr, pt) THEN 'es'
             WHEN fr = greatest(en, de, es, fr, pt) THEN 'fr'
             ELSE 'pt' END AS lang_pred
      FROM s
    )
    SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY 1, 2
    """,
)
def ext_langid_conf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the heuristic's predictions
    (ext.text.langid_heuristic — stopword-profile argmax, ties broken in
    profile order en/de/es/fr/pt) cross-tabulated against the corpus's
    labeled lang column. This upgrades the language-ID op from rows-only
    to oracle-checked: the oracle replays the full scoring + tie-break
    CASE chain in SQL, so the driver certifies the classifier's exact
    decision function, not just its row count."""
    docs = load_table(spark, sf_dir, "documents")
    pred = TX.langid_heuristic(docs, "doc_id", "text").select(
        "doc_id", "lang_pred"
    )
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


@query(
    "ext_zipf_fit",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ),
    counts AS (SELECT w, count(*) AS n FROM words WHERE w <> '' GROUP BY 1),
    ranked AS (
      SELECT row_number() OVER (ORDER BY n DESC, w ASC) AS r, n FROM counts
      QUALIFY r <= 1000
    ),
    agg AS (
      SELECT count(*) AS k,
             sum(ln(r * 1.0)) AS sx, sum(ln(n * 1.0)) AS sy,
             sum(ln(r * 1.0) * ln(r * 1.0)) AS sxx,
             sum(ln(r * 1.0) * ln(n * 1.0)) AS sxy,
             sum(ln(n * 1.0) * ln(n * 1.0)) AS syy
      FROM ranked
    )
    SELECT CAST(k AS INTEGER) AS n_terms,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
           round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k, 6)
             AS intercept,
           round(pow(k * sxy - sx * sy, 2)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6) AS r2
    FROM agg
    """,
)
def ext_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary
    (ext.text.zipf_fit): least-squares slope/intercept/R² of ln(freq) vs
    ln(rank) — the corpus-level generation-artifact screen (natural text
    slopes ≈ −1; templated corpora flatten)."""
    return TX.zipf_fit(load_table(spark, sf_dir, "documents"), "text")


@query(
    "ext_source_overlap",
    oracle="""
    WITH gs AS (
      SELECT DISTINCT source AS src, g
      FROM (
        SELECT source,
               unnest(list_transform(
                 list_zip(ws[1:len(ws)-4], ws[2:len(ws)-3], ws[3:len(ws)-2],
                          ws[4:len(ws)-1], ws[5:len(ws)]),
                 p -> p[1] || ' ' || p[2] || ' ' || p[3] || ' ' || p[4]
                      || ' ' || p[5])) AS g
        FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS ws
              FROM documents)
      )
    )
    SELECT a.src AS src_a, b.src AS src_b, count(*) AS shared_grams
    FROM gs a JOIN gs b ON a.g = b.g AND a.src < b.src
    GROUP BY 1, 2
    """,
)
def ext_src_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shared-5-gram matrix (ext.text.source_overlap): the
    mirrored-content screen — pair volume bounded by |sources|² per gram
    via the distinct-first triangle join. Spark side travels hashed
    grams; the oracle re-derives the same pairs from gram STRINGS, so a
    hash collision that created a false pair would fail the row-count
    check (none at harness scale)."""
    return TX.source_overlap(
        load_table(spark, sf_dir, "documents"), "source", "text", n=5
    )


@query(
    "ext_source_quality_rank",
    oracle="""
    WITH q AS (
      SELECT source,
             CAST(round(len(list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x='the' OR x='a' OR x='of' OR x='and' OR x='to'
                      OR x='in' OR x='is')) * 5000.0
                  / len(string_split_regex(trim(text), '\\s+'))
                 + least(len(string_split_regex(trim(text), '\\s+')), 100) * 50)
               AS BIGINT) AS q4
      FROM documents
    ),
    s AS (
      SELECT source, count(*) AS n_docs, sum(q4) AS sum_q4 FROM q GROUP BY 1
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(round(sum_q4 * 1.0 / n_docs) AS BIGINT) AS avg_quality_x1e4,
           CAST(rank() OVER (ORDER BY sum_q4 * 1.0 / n_docs DESC, source ASC)
                AS INTEGER) AS quality_rank
    FROM s
    """,
)
def ext_src_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality leaderboard: mean heuristic quality score
    (ext.text.quality_score's formula) per source, ranked — the
    mixture-weighting companion to ext_domain_divergence (down-weight
    sources whose documents score low). The per-doc score lands in 1e-4
    fixed point via ONE integer-derived division (n_stop·5000/n_tokens +
    min(n_tokens,100)·50, then round) — rescaling quality_score's
    ROUNDED double instead can flip a fixed-point unit where the rescaled
    value's shortest representation crosses a .5 boundary (review
    finding); a single int/int quotient is either exactly half (both
    engines round away from zero identically) or ≥ 1/(2·n_tokens) from
    the boundary. Averaging then ranking stay in exact integers."""
    from ..ext.text import STOPWORDS, _stopword_pred, _words

    docs = load_table(spark, sf_dir, "documents")
    w = _words("text")
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: _stopword_pred(x, STOPWORDS)))
    q4 = F.round(
        n_stop * 5000.0 / n_tokens + F.least(n_tokens, F.lit(100)) * 50
    ).cast("bigint")
    s = docs.select("source", q4.alias("q4")).groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("q4").alias("sum_q4")
    )
    avg_exact = F.col("sum_q4") * 1.0 / F.col("n_docs")
    w = Window.orderBy(avg_exact.desc(), F.col("source").asc())
    return s.select(
        "source",
        "n_docs",
        F.round(avg_exact).cast("bigint").alias("avg_quality_x1e4"),
        F.rank().over(w).cast("int").alias("quality_rank"),
    )


@query(
    "ext_template_headers",
    oracle="""
    WITH c AS (
      SELECT source AS grp,
             array_to_string(string_split_regex(trim(text), '\\s+')[1:3], ' ')
               AS prefix,
             count(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT grp, sum(n) AS n_docs FROM c GROUP BY 1),
    r AS (
      SELECT grp, prefix, n,
             row_number() OVER (PARTITION BY grp ORDER BY n DESC, prefix ASC)
               AS rk
      FROM c
    )
    SELECT r.grp AS source,
           CAST(rk AS INTEGER) AS prefix_rank,
           prefix,
           n AS n_with_prefix,
           round(n * 1.0 / n_docs, 6) AS share
    FROM r JOIN tot USING (grp)
    WHERE rk <= 2
    """,
)
def ext_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-header mining (ext.text.template_prefixes): each source's
    two most common 3-word document prefixes and their share — the
    boilerplate-header detector a curation pipeline runs before n-gram
    dedup (stamped headers inflate similarity between unrelated docs)."""
    return TX.template_prefixes(
        load_table(spark, sf_dir, "documents"), "source", "text",
        n_words=3, top_k=2,
    )


@query(
    "ext_er_blocking_pairs",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a
    JOIN part b ON a.p_brand = b.p_brand AND a.p_type = b.p_type
               AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def ext_er_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs (ext.dedup.blocked_er_pairs):
    parts blocked on the STRUCTURED key (brand, type), Levenshtein on the
    name verifies within blocks only — classic record linkage, the typed-
    attribute complement of edit_distance_pairs' inferred prefix buckets.
    Cost is Σ|block|² comparisons, never N²; both engines run the same
    unit-cost edit distance so the pair set hashes exactly."""
    return X.blocked_er_pairs(
        load_table(spark, sf_dir, "part"),
        "p_partkey",
        "p_name",
        ["p_brand", "p_type"],
        max_dist=4,
    ).select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))


@query(
    "ext_er_entities",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
      FROM part a
      JOIN part b ON a.p_brand = b.p_brand AND a.p_type = b.p_type
                 AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 4
    ), edges AS (
      SELECT id_a AS s, id_b AS t FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(s, t) AS (
      SELECT s, t FROM edges
      UNION
      SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
    ), comp AS (
      SELECT s AS id, least(s, min(t)) AS entity FROM reach GROUP BY s
    )
    SELECT p.p_partkey,
           coalesce(c.entity, p.p_partkey) AS entity_id,
           p.p_partkey = coalesce(c.entity, p.p_partkey) AS is_canonical
    FROM part p LEFT JOIN comp c ON c.id = p.p_partkey
    """,
)
def ext_er_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (ext.dedup.resolve_entities): blocked
    match pairs → transitive closure → canonical min-id entity labels.
    The oracle computes the closure with a recursive CTE (viable at
    oracle scale, the ext_dedup_clusters precedent); the engine iterates
    min-label propagation over the MATCHED subgraph only with bounded
    lineage — singleton records never enter the loop, which is what makes
    the op affordable on a mostly-unique 100 TB corpus."""
    return X.resolve_entities(
        load_table(spark, sf_dir, "part"),
        "p_partkey",
        "p_name",
        ["p_brand", "p_type"],
        max_dist=4,
    )


@query("ext_bpe_merges")
def ext_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-table training (ext.text.bpe_merges, 16 merges over the
    documents corpus): rows-only by nature — the merge loop is iterative
    with a per-round argmax, not a single SQL expression. Determinism
    (fixed tie-breaks) and agreement with a brute-force reference BPE
    are pytest-pinned in tests/test_analytics_ops.py."""
    return TX.bpe_merges(
        load_table(spark, sf_dir, "documents"), "text", n_merges=16
    )


@query("ext_bpe_tokenize")
def ext_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE (ext.text.bpe_merges → bpe_apply, 8 merges):
    per-document subword token counts under the corpus's OWN learned
    tokenizer — the real token-budget accounting step, where
    ext_text_token_stats' regex count is the cheap approximation. The
    merge table is collected once (8 rows, driver-bounded) and ships by
    closure into the stateless apply UDF. Rows-only: iterative training
    + sequential merge application have no SQL form; the learner and
    applier are each pinned against brute-force references in
    tests/test_analytics_ops.py."""
    docs = load_table(spark, sf_dir, "documents")
    table = TX.bpe_merges(docs, "text", n_merges=8).orderBy("rank").collect()
    merges = [(r.left, r.right) for r in table]
    return TX.bpe_apply(docs, "doc_id", "text", merges)


@query(
    "ext_pmi_cooccurrence",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
      WHERE len(string_split_regex(trim(text), '\\s+')) >= 2
    ), pos AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM t
    ), raw AS (
      SELECT least(w[i], w[i+k]) AS word_a, greatest(w[i], w[i+k]) AS word_b
      FROM (SELECT doc_id, w, i, unnest(generate_series(1, 3)) AS k FROM pos)
      WHERE i + k <= len(w)
    ), pc AS (
      SELECT word_a, word_b, CAST(count(*) AS BIGINT) AS n_pair
      FROM raw GROUP BY 1, 2
    ), tp AS (
      SELECT CAST(count(*) AS BIGINT) AS P FROM raw
    ), tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ), uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok WHERE w <> ''
      GROUP BY 1
    ), tt AS (
      SELECT CAST(count(*) AS BIGINT) AS T FROM tok WHERE w <> ''
    )
    SELECT p.word_a, p.word_b, p.n_pair, a.n AS n_a, b.n AS n_b,
           round(ln(p.n_pair) + 2.0 * ln(tt.T) - ln(tp.P)
                 - ln(a.n) - ln(b.n), 6) AS pmi
    FROM pc p
    JOIN uni a ON a.w = p.word_a
    JOIN uni b ON b.w = p.word_b
    CROSS JOIN tp CROSS JOIN tt
    WHERE p.n_pair >= 5
    """,
)
def ext_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram PMI collocations (ext.text.pmi_cooccurrence, window=3,
    min_count=5): the co-occurrence statistic under word2vec/GloVe,
    computed join-free (one higher-order transform emits the positional
    pairs) with PMI as a SUM OF LOGS so the FP path is overflow-safe and
    bit-reproducible across engines."""
    return TX.pmi_cooccurrence(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        window=3, min_count=5,
    )


@query(
    "ext_split_lm_gate",
    oracle="""
    WITH sp AS (
      SELECT doc_id,
             ((strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
             ) % 1000 AS bucket
      FROM documents
    ), lab AS (
      SELECT d.doc_id, d.text,
             CASE WHEN s.bucket < 800 THEN 'train'
                  WHEN s.bucket < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents d JOIN sp s USING (doc_id)
    ), tok AS (
      SELECT doc_id, split,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM lab
    ), tok2 AS (
      SELECT * FROM tok WHERE tok <> ''
    ), tc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n_tok
      FROM tok2 WHERE split = 'train' GROUP BY 1
    ), sc AS (
      SELECT CAST(sum(n_tok) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS v
      FROM tc
    ), val AS (
      SELECT t.doc_id, c.n_tok
      FROM tok2 t LEFT JOIN tc c ON c.tok = t.tok
      WHERE t.split = 'val'
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN n_tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(avg(ln((coalesce(n_tok, 0) + 1)
                        / (sc.n_total + sc.v + 1))), 4) AS avg_logp,
           round(exp(-avg(ln((coalesce(n_tok, 0) + 1)
                             / (sc.n_total + sc.v + 1)))), 2) AS ppl
    FROM val CROSS JOIN sc
    GROUP BY doc_id
    """,
)
def ext_split_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-hygienic unigram LM gate (ext.text.split_lm_gate): the model
    fits on the TRAIN split only and scores VAL with add-one smoothing —
    the leakage-free protocol, where ext_unigram_logprob's full-corpus
    fit is the (standard but optimistic) shortcut. The oracle re-derives
    the 80/10/10 md5 split with the ext_hash_split strpos arithmetic, so
    the whole protocol — split, fit, smooth, score — is replayed
    end-to-end."""
    return TX.split_lm_gate(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query(
    "ext_crosssplit_decontamination",
    oracle="""
    WITH sp AS (
      SELECT doc_id,
             ((strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
             ) % 1000 AS bucket
      FROM documents
    ), lab AS (
      SELECT doc_id,
             CASE WHEN bucket < 800 THEN 'train'
                  WHEN bucket < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM sp
    ), t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    ), sized AS (
      SELECT s.doc_id, l.split, count(*) AS n_sh
      FROM sh s JOIN lab l ON l.doc_id = s.doc_id
      GROUP BY 1, 2
    ), inter AS (
      SELECT e.doc_id, le.split, tr.doc_id AS train_match,
             count(*) AS inter
      FROM sh e
      JOIN lab le ON le.doc_id = e.doc_id AND le.split <> 'train'
      JOIN sh tr ON tr.shingle = e.shingle
      JOIN lab lt ON lt.doc_id = tr.doc_id AND lt.split = 'train'
      GROUP BY 1, 2, 3
    ), scored AS (
      SELECT i.doc_id, i.split, i.train_match,
             i.inter * 1.0 / (ne.n_sh + nt.n_sh - i.inter) AS jaccard
      FROM inter i
      JOIN sized ne ON ne.doc_id = i.doc_id
      JOIN sized nt ON nt.doc_id = i.train_match
    ), best AS (
      SELECT doc_id, split, train_match, jaccard,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY jaccard DESC, train_match ASC
             ) AS rn
      FROM scored WHERE jaccard >= 0.5
    )
    SELECT doc_id, split, train_match, round(jaccard, 6) AS jaccard
    FROM best WHERE rn = 1
    """,
)
def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-split decontamination (ext.dedup.cross_split_contamination):
    val/test documents near-duplicating (3-gram Jaccard ≥ 0.5) ANY train
    document — the post-split screen that keeps benchmark numbers
    honest; within-corpus dedup alone cannot catch near-dups straddling
    the split. Candidates come from the shared-shingle inverted-index
    join (never |train|×|eval|); the oracle replays the md5 split
    arithmetic AND the exact Jaccard end-to-end."""
    return X.cross_split_contamination(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.5,
    )


@query(
    "ext_dedup_quality_survivor",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), q AS (
      SELECT doc_id,
             round(len(list_filter(w, x -> x IN
                     ('the','a','of','and','to','in','is')))
                   * 1.0 / len(w) * 0.5
                   + least(len(w), 100) / 100.0 * 0.5, 4) AS quality_score
      FROM t
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE inter * 1.0 / (na.n_sh + nb.n_sh - inter) >= 0.2
    ), edges AS (
      SELECT id_a AS s, id_b AS t FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(s, t) AS (
      SELECT s, t FROM edges
      UNION
      SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
    ), comp AS (
      SELECT s AS doc_id, least(s, min(t)) AS component FROM reach GROUP BY s
    ), labeled AS (
      SELECT q.doc_id, coalesce(c.component, q.doc_id) AS component,
             q.quality_score
      FROM q LEFT JOIN comp c ON c.doc_id = q.doc_id
    )
    SELECT doc_id, component, quality_score,
           row_number() OVER (
             PARTITION BY component
             ORDER BY quality_score DESC, doc_id ASC
           ) = 1 AS is_survivor
    FROM labeled
    """,
)
def ext_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup survivor selection: cluster near-duplicates
    (the ext_dedup_clusters graph) and keep the HIGHEST-QUALITY copy per
    cluster instead of the arbitrary min-id — the curation-correct
    choice when duplicates differ (one copy truncated, one
    boilerplate-wrapped; min-id picks blindly). One window over the
    cluster label (quality DESC, id ASC tie-break) on top of the
    component output; the quality table joins on the doc id the
    component pass already shuffled on."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = X.near_dup_clusters(docs, "doc_id", "text", n=3, threshold=0.2)
    q = TX.quality_score(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    labeled = clusters.select("doc_id", "component").join(q, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return labeled.select(
        "doc_id",
        "component",
        "quality_score",
        (F.row_number().over(w) == 1).alias("is_survivor"),
    )


@query(
    "ext_token_budget_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             md5('budget:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= 800
    """,
)
def ext_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling: take documents per source in salted-hash
    order until each source's cumulative token count reaches the budget
    (800 here — chosen to BIND at the harness scales) — how pretraining mixtures are actually specified
    ("X billion tokens of source S"), where ext_mixture_sample's
    per-source FRACTIONS are only a proxy. Deterministic (salted md5
    order, doc_id tie-break), one shuffle on the source key; the budget
    cut is a running-sum window inside each source partition. A skewed
    source at 100 TB salts the same way the pack_shards prefix sum
    does — noted, not needed at harness scale."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    t = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.md5(F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))).alias(
            "__h"
        ),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("__h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= 800)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


@query(
    "ext_corpus_card",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, md5(text) AS h,
             string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), q AS (
      SELECT doc_id,
             CAST(round((len(list_filter(w, x -> x IN
                     ('the','a','of','and','to','in','is')))
                   * 1.0 / len(w) * 0.5
                   + least(len(w), 100) / 100.0 * 0.5) * 10000) AS BIGINT)
               AS q_fp,
             CAST(len(w) AS BIGINT) AS n_tokens
      FROM t
    ), dups AS (
      SELECT h FROM t GROUP BY h HAVING count(*) >= 2
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(q.n_tokens) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS mean_tokens,
           CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_dup,
           CAST(sum(q.q_fp) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS mean_quality_fp
    FROM t
    JOIN q ON q.doc_id = t.doc_id
    LEFT JOIN dups d ON d.h = t.h
    GROUP BY 1
    """,
)
def ext_corpus_card_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus card: the per-source datasheet row (docs, token totals,
    exact-duplicate incidence, mean quality) a dataset release ships —
    "datasheets for datasets" reduced to what the engine can attest
    mechanically. ONE scan computes hash + tokens + quality per doc in a
    single projection (quality_score passthrough — the r11 scan audit
    showed the joined-projections form scanning documents three times);
    the enriched table is cache-shared between the corpus-wide duplicate
    aggregate and the final card rollup; all means are truncating
    integer fixed-point, so the card replays exactly. Composes the
    already-verified quality and exact-dedup pieces into the release
    artifact."""
    from ..operators.window import register_hub

    docs = load_table(spark, sf_dir, "documents")
    t = register_hub(
        TX.quality_score(docs, "doc_id", "text", passthrough=("source", "text"))
        .select(
            "doc_id",
            "source",
            F.md5("text").alias("h"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("quality_score") * 10000).cast("long").alias("q_fp"),
        )
        .persist()
    )
    dups = (
        t.groupBy("h").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
        .select("h", F.lit(1).alias("__dup"))
    )
    return (
        t.join(dups, "h", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.expr("sum(n_tokens) div count(*)").alias("mean_tokens"),
            F.sum(F.when(F.col("__dup").isNotNull(), 1).otherwise(0)).alias(
                "n_exact_dup"
            ),
            F.expr("sum(q_fp) div count(*)").alias("mean_quality_fp"),
        )
    )


@query(
    "ext_quantile_normalize",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             CAST(
               (len(list_filter(w, x -> x IN
                  ('the','a','of','and','to','in','is'))) * 10000) // len(w)
               + least(len(w), 100) * 100
             AS BIGINT) AS q_fp
      FROM t
    ), counts AS (
      SELECT source, q_fp, CAST(count(*) AS BIGINT) AS cnt
      FROM scored GROUP BY 1, 2
    ), per_source AS (
      SELECT source, q_fp, cnt,
             CAST(coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY q_fp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_below,
             CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_s
      FROM counts
    ), gdist AS (
      SELECT q_fp,
             CAST(sum(count(*)) OVER (ORDER BY q_fp) AS BIGINT) AS gcum
      FROM scored GROUP BY q_fp
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS N FROM scored),
    with_idx AS (
      SELECT source, q_fp,
             ((2 * cum_below + cnt + 1) * N + 2 * n_s - 1) // (2 * n_s) AS idx
      FROM per_source CROSS JOIN n
    ), mapping AS (
      SELECT source, q_fp,
             (SELECT min(g.q_fp) FROM gdist g WHERE g.gcum >= w.idx) AS q_norm
      FROM with_idx w
    )
    SELECT s.doc_id, s.source, s.q_fp, m.q_norm
    FROM scored s JOIN mapping m USING (source, q_fp)
    """,
)
def ext_qnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of the integer quality score
    (ext.text.quantile_normalize_by_source): every document's score is
    re-expressed as the global distribution's value at the document's
    mid-rank within-source quantile — cross-source calibration so one
    quality threshold means the same thing for every source. The engine
    runs the count-table formulation (corpus touched twice, everything
    else domain-bounded, idx→bucket lookup as a linear marker merge);
    the oracle restates the same integer semantics with a correlated
    min — two independent formulations agreeing is the check."""
    return TX.quantile_normalize_by_source(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", "source"
    )


@query(
    "ext_hard_negatives",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), q AS (
      SELECT * FROM e WHERE vec_id < 10
    ), scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             e.vec_id AS neighbor_id, e.label AS neighbor_label,
             list_dot_product(q.emb, e.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(e.emb, e.emb))) AS cos
      FROM q JOIN e ON e.label <> q.label
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, rank,
           round(cos, 6) AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
)
def ext_hard_neg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training
    (ext.similarity.hard_negatives): per query vector, the 3 most
    cosine-similar embeddings with a DIFFERENT label — close-but-wrong
    items, the high-gradient negatives for InfoNCE/DPR-style losses.
    Label-mismatch filters BEFORE ranking so k is always filled from
    negatives; same hoisted-norm fold-exact scoring as the brute ANN
    entry, so the oracle's sequential list_dot_product agrees bitwise."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.hard_negatives(emb, emb.filter(F.col("vec_id") < 10), k=3)


def _mmr_oracle(k: int, lam: float) -> str:
    """Unrolled MMR greedy in SQL, generated from the same (k, λ): each
    round is a MATERIALIZED 1-row argmax over the not-yet-selected
    corpus; redundancy is the running max of cosines to prior picks in
    selection order. All cosines are sequential list_dot_product folds
    (the ext_ann_brute bit-stability precedent — mmr_topk's driver-side
    norms are sequential folds too), λ and 1−λ enter as the exact
    Python-double literals the Spark loop multiplies by."""
    one_minus = repr(1 - lam)
    lam_r = repr(lam)
    parts = [
        """
    WITH e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    q AS (SELECT emb, nrm FROM e WHERE vec_id = 0),
    base AS MATERIALIZED (
      SELECT d.vec_id, d.emb, d.nrm,
             list_dot_product(d.emb, q.emb) / (d.nrm * q.nrm) AS rel
      FROM e d CROSS JOIN q WHERE d.vec_id <> 0
    )"""
    ]
    for r in range(1, k + 1):
        if r == 1:
            red = f"CAST(0.0 AS DOUBLE)"
            excl = ""
        else:
            red = "CAST(0.0 AS DOUBLE)"
            for j in range(1, r):
                red = (
                    f"greatest({red}, "
                    f"list_dot_product(d.emb, s{j}.emb)"
                    f" / (d.nrm * s{j}.nrm))"
                )
            excl = " AND " + " AND ".join(
                f"d.vec_id <> (SELECT vec_id FROM s{j})" for j in range(1, r)
            )
        joins = "".join(f" CROSS JOIN s{j}" for j in range(1, r))
        parts.append(
            f""", s{r} AS MATERIALIZED (
      SELECT d.vec_id, d.emb, d.nrm, d.rel, {red} AS red,
             CAST({lam_r} AS DOUBLE) * d.rel
               - CAST({one_minus} AS DOUBLE) * ({red}) AS score
      FROM base d{joins}
      WHERE TRUE{excl}
      ORDER BY score DESC, d.vec_id ASC LIMIT 1
    )"""
        )
    sels = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({r} AS INTEGER) AS rank, vec_id,
           round(rel, 6) AS relevance, round(red, 6) AS redundancy,
           round(score, 6) AS mmr_score FROM s{r}"""
        for r in range(1, k + 1)
    )
    return "\n".join(parts) + "\n    " + sels


@query("rows_mmr_diverse_topk", oracle=_mmr_oracle(5, 0.7))
def ext_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity-aware top-5 (ext.similarity.mmr_topk, λ=0.7) for one
    query vector against the embeddings corpus. Promoted from rows-only
    in round 7: the greedy trajectory replays exactly as k unrolled
    1-row argmax CTEs — every cosine is a sequential
    list_dot_product fold on both engines (mmr_topk's driver-side
    query/selection norms switched from numpy pairwise sums to
    sequential folds to match), the running redundancy max nests in
    selection order, and λ/1−λ enter as the identical Python-double
    literals. Ties on the unrounded score break by vec_id in both
    engines (identical planted vectors produce bit-equal scores).
    Invariants — first pick equals the plain cosine top-1, diversity no
    worse than plain top-k, determinism — remain pytest-pinned; the
    name keeps its historical rows_ prefix for round-record
    continuity."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.mmr_topk(emb.filter(F.col("vec_id") != 0),
                        emb.filter(F.col("vec_id") == 0), k=5)


@query(
    "ext_er_sorted_neighborhood",
    oracle="""
    WITH reps AS (
      SELECT p_name AS v, min(p_partkey) AS rid FROM part GROUP BY 1
    ), ranked AS (
      SELECT v, rid, row_number() OVER (ORDER BY v, rid) AS rn FROM reps
    )
    SELECT DISTINCT least(a.rid, b.rid) AS id_a,
           greatest(a.rid, b.rid) AS id_b,
           CAST(levenshtein(a.v, b.v) AS BIGINT) AS dist
    FROM ranked a JOIN ranked b
      ON b.rn > a.rn AND b.rn <= a.rn + 3
    WHERE levenshtein(a.v, b.v) <= 4
    """,
)
def ext_er_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER candidates over part names
    (ext.dedup.sorted_neighborhood_pairs, window 3, max_dist 4): the
    key-free blocking complement to ext_er_blocking_pairs — candidates
    come from sliding adjacency in the sorted DISTINCT-value vocabulary
    (min-id representatives), verified with the same unit-cost edit
    distance both engines share, so the pair set hashes exactly."""
    return X.sorted_neighborhood_pairs(
        load_table(spark, sf_dir, "part"), "p_partkey", "p_name",
        window=3, max_dist=4,
    )


@query(
    "ext_dsir_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, is_tgt,
             CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 512 AS b
      FROM (SELECT doc_id, source = 'src0' AS is_tgt,
                   unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
      WHERE w <> ''
    ),
    db AS (
      SELECT doc_id, b, count(*) AS n, max(is_tgt) AS is_tgt
      FROM toks GROUP BY 1, 2
    ),
    bc AS (
      SELECT b, sum(n) AS n_raw,
             sum(CASE WHEN is_tgt THEN n ELSE 0 END) AS n_tgt
      FROM db GROUP BY 1
    ),
    tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM bc),
    lr AS (
      SELECT b, ln((n_tgt + 1) * 1.0 / (t_tgt + 512))
               - ln((n_raw + 1) * 1.0 / (t_raw + 512)) AS lr
      FROM bc CROSS JOIN tot
    )
    SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
           round(sum(n * lr), 6) AS dsir_logw
    FROM db JOIN lr USING (b)
    GROUP BY doc_id
    """,
)
def ext_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (ext.text.dsir_importance_weights) with
    source 'src0' as the target domain: hashed-unigram importance
    ratios, the data-selection scorer from Xie et al. 2023. The oracle
    replays the md5 bucketing, the Laplace-smoothed bucket
    distributions, and the per-document Σ n·lr exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.dsir_importance_weights(
        docs, "doc_id", "text", F.col("source") == "src0", n_buckets=512
    )


@query(
    "ext_bm25_topk",
    oracle="""
    WITH dl AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '')) AS dl
      FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
      WHERE w IN ('spark', 'table', 'query')
      GROUP BY 1, 2
    ),
    df_ AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
    idf AS (
      SELECT term, ln(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5)) AS idf
      FROM df_ CROSS JOIN stats
    ),
    scored AS (
      SELECT term, tf.doc_id, tf,
             round(idf * tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
                   6) AS bm25
      FROM tf
      JOIN idf USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ),
    ranked AS (
      SELECT term,
             CAST(row_number() OVER (PARTITION BY term
                                     ORDER BY bm25 DESC, doc_id ASC)
                  AS INTEGER) AS rank,
             doc_id, tf, bm25
      FROM scored
    )
    SELECT term, rank, doc_id, tf, bm25 FROM ranked WHERE rank <= 10
    """,
)
def ext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query term (ext.text.bm25_scores) for a fixed
    3-term query set — the sparse-retrieval head next to the dense ANN
    entries. Ranking happens on the ROUNDED score (both engines), so
    the rank column is order-of-evaluation-proof; ties break on
    doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.bm25_scores(
        docs, "doc_id", "text", ["spark", "table", "query"], top_k=10
    )


@query("ext_ann_pq_topk")
def ext_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-5 (ext.similarity.pq_topk): 16
    subspaces x 64 codes over the 64-dim corpus = 16 bytes/vector (16x
    compression vs float32), ADC candidate scan + exact cosine rerank
    of 8k candidates. Rows-only by nature (k-means codebooks have no
    SQL form); recall >= 0.9 vs brute force is pytest-pinned
    (measured 1.0 at these params on the harness corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    return SIM.pq_topk(
        emb, qs, k=5, m_subspaces=16, n_codes=64, refine=8
    )


@query(
    "ext_incremental_dedup",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id < 250
    ),
    new AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 250
    ),
    old_min AS (SELECT h, min(doc_id) AS old_id FROM old GROUP BY 1),
    new_min AS (SELECT h, min(doc_id) AS first_new FROM new GROUP BY 1)
    SELECT n.doc_id,
           CASE WHEN o.old_id IS NOT NULL THEN 'dup_of_old'
                WHEN n.doc_id > m.first_new THEN 'dup_of_new'
                ELSE 'unique' END AS status,
           CASE WHEN o.old_id IS NOT NULL THEN o.old_id
                WHEN n.doc_id > m.first_new THEN m.first_new
                ELSE n.doc_id END AS canonical_id
    FROM new n
    JOIN new_min m ON m.h = n.h
    LEFT JOIN old_min o ON o.h = n.h
    """,
)
def ext_incr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup (ext.dedup.incremental_exact_dedup): the
    first half of the corpus plays the accumulated snapshot, the second
    half the newly-ingested delta — each delta doc verdicts dup_of_old /
    dup_of_new / unique against the reusable digest index. The
    steady-state pattern where dedup cost tracks the DELTA."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    return X.incremental_exact_dedup(old, new, "doc_id", "text")


@query(
    "ext_embedding_outliers",
    oracle="""
    WITH p AS (
      SELECT greatest(1, count(*) // 500) AS p FROM embeddings
    ),
    g AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings CROSS JOIN p
      WHERE CAST('0x' || substr(md5('out:' || CAST(vec_id AS VARCHAR)), 1, 8)
                 AS BIGINT) % p = 0
    ),
    nn AS (
      SELECT a.vec_id,
             max(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb)))) AS max_cos
      FROM g a JOIN g b ON b.vec_id <> a.vec_id
      GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY max_cos ASC, vec_id ASC)
                AS INTEGER) AS rank,
           vec_id,
           round(1.0 - max_cos, 6) AS outlier_score
    FROM nn
    QUALIFY rank <= 20
    """,
)
def ext_emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection: the 20 vectors FARTHEST from
    their nearest neighbor (1 − max cosine) — the standard embedding-
    level data-cleaning cut (mislabeled/garbage points sit far from
    every cluster). The exact all-pairs scan runs on a DETERMINISTIC
    md5-gated stratum capped near 500 vectors — the gate is the
    rel_dp_noisy_counts idiom, so the ORACLE replays it at any SF
    (p = max(1, n//500); identity at sf<=0.01, 1-in-10 at sf0.1 — the
    first cut ran the full 5000x5000 pair space at sf0.1 and cost 42s
    in bench, quadratic by construction). Outlier SCREENING on a
    stratified sample is also the statistically right scope; scoring
    EVERY vector at 100 TB composes the IVF/PQ candidate tiers instead
    of exact all-pairs. Scoring is the broadcast-matrix matmul tier
    (SIM.max_cosine_vs_matrix): one Arrow pass over the stratum, no
    pair materialization — 42s (HOF pair join) -> 0.9s isolated at
    sf0.1."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    p = max(1, n // 500)
    if p > 1:
        gate = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("out:"), F.col("vec_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % p
            == 0
        )
        emb = emb.filter(gate)
    import numpy as np

    # Broadcast-matrix scoring: the capped stratum (~500 x 64 floats)
    # ships ONCE by value into an Arrow-batched UDF; each batch is one
    # matmul against it and a self-masked row max. The join-based pair
    # scan materialized ~262k (va, vb) array pairs through Arrow
    # (~10s at sf0.1); this form is one pass over the stratum (<1s).
    ref = emb.select("vec_id", "embedding").collect()
    ref_ids = np.array([r.vec_id for r in ref])
    ref_mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in ref])
    max_cos_udf = SIM.max_cosine_vs_matrix(ref_ids, ref_mat)

    nn = emb.select(
        "vec_id", max_cos_udf(F.col("vec_id"), F.col("embedding")).alias("max_cos")
    )
    w = Window.orderBy(F.col("max_cos").asc(), F.col("vec_id").asc())
    return (
        nn.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            "rank", "vec_id", F.round(1.0 - F.col("max_cos"), 6).alias("outlier_score")
        )
    )



@query("ext_ann_ivfpq_topk")
def ext_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed top-5 (ext.similarity.ivfpq_topk) — the full
    FAISS-style 100 TB tier: coarse cells prune candidates
    (n_probe=8/16), 16-byte PQ codes + ADC rank them, exact cosine
    reranks 8k per query. Rows-only; recall pinned at IVF-parity (the
    compression is free once the rerank is exact)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    return SIM.ivfpq_topk(emb, qs, k=5, n_probe=8, refine=8)


@query(
    "ext_dedup_threshold_curve",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM t WHERE len(w) >= 3)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b, inter * 1.0 / (na.n_sh + nb.n_sh - inter) AS j
      FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE inter * 1.0 / (na.n_sh + nb.n_sh - inter) >= 0.2
    ), th AS (SELECT unnest(CAST([0.2, 0.4, 0.6, 0.8] AS DOUBLE[])) AS threshold)
    SELECT th.threshold,
           CAST(count(*) FILTER (WHERE p.j >= th.threshold) AS BIGINT)
             AS n_pairs,
           CAST(count(DISTINCT CASE WHEN p.j >= th.threshold THEN p.id_a END)
                + count(DISTINCT CASE WHEN p.j >= th.threshold THEN p.id_b END)
                - count(DISTINCT CASE WHEN p.j >= th.threshold
                                      AND p.id_b IN (
                                        SELECT id_a FROM pairs p2
                                        WHERE p2.j >= th.threshold)
                                      THEN p.id_b END) AS BIGINT)
             AS n_docs_flagged
    FROM th CROSS JOIN pairs p
    GROUP BY 1
    """,
)
def ext_dedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup YIELD CURVE: how many near-dup pairs — and how many
    distinct documents — a Jaccard threshold sweep would flag, from ONE
    exact pair computation (τ floor 0.2): the tuning artifact a corpus
    owner reads before committing to a dedup threshold (too low eats
    real data, too high leaves boilerplate). Pairs compute once; the
    4-point curve is conditional aggregation over a broadcast threshold
    axis. n_docs_flagged counts docs on EITHER side of a surviving
    pair."""
    docs = load_table(spark, sf_dir, "documents")
    sh = X.word_shingles(docs, "doc_id", "text", n=3, hashed=True)
    pairs = register_hub(
        X.jaccard_pairs(sh, "doc_id", threshold=0.2).select(
            "id_a", "id_b", F.col("jaccard").alias("j")
        ).persist()
    )
    th = F.explode(
        F.array(*[F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)])
    ).alias("threshold")
    axis = pairs.sparkSession.range(1).select(th)
    surviving = pairs.crossJoin(F.broadcast(axis)).filter(
        F.col("j") >= F.col("threshold")
    )
    n_pairs = surviving.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    n_docs = (
        surviving.select(
            "threshold", F.explode(F.array("id_a", "id_b")).alias("d")
        )
        .distinct()
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_docs_flagged"))
    )
    # left join from the axis so an empty threshold bucket reports 0s
    return (
        axis.join(n_pairs, "threshold", "left")
        .join(n_docs, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_docs_flagged", F.lit(0)).alias("n_docs_flagged"),
        )
    )

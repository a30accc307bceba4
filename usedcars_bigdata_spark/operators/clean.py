"""Projection / filter / cleaning operators (SURVEY.md §2.2, P1-P14).

Reference behaviors re-expressed:
- column pruning by exclusion list (data-viz&cleaning.py:69-71) → ``drop_columns``
- bulk/scalar casts (data-viz&cleaning.py:91,108) → ``cast_columns``
- range / in-list / null / like filters (data-viz&cleaning.py:130,173,234;
  data-understanding.py:91,183-187) → predicate builders
- dropna / dropDuplicates (data-viz&cleaning.py:74) → ``drop_nulls`` /
  ``dedupe_exact`` / ``dedupe_deterministic``

All filters are plain Column predicates so Catalyst pushes them into the
parquet scan (check ``PushedFilters`` in .explain). ``dedupe_deterministic``
exists because ``dropDuplicates`` keeps an *arbitrary* row per key — fine on
one machine, nondeterministic across cluster runs; at 100 TB you want a
reproducible keeper.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P1/P2: prune by exclusion list; Catalyst prunes the scan to match."""
    return df.drop(*cols)


def select_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P3: explicit projection (order-preserving)."""
    return df.select(*cols)


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P4/P5: cast named columns in place (e.g. {"year": "int"})."""
    exprs = [
        F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c) for c in df.columns
    ]
    return df.select(*exprs)


def filter_range(
    df: DataFrame, col: str, lo=None, hi=None, lo_open: bool = False, hi_open: bool = False
) -> DataFrame:
    """P7: range filter, e.g. price ∈ [2000, 50000] (data-viz&cleaning.py:130)."""
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) > lo if lo_open else F.col(col) >= lo)
    if hi is not None:
        pred = pred & (F.col(col) < hi if hi_open else F.col(col) <= hi)
    return df.filter(pred)


def filter_isin(df: DataFrame, col: str, values: Sequence, negate: bool = False) -> DataFrame:
    """P8: IN-list filter (data-viz&cleaning.py:234-235)."""
    pred = F.col(col).isin(list(values))
    return df.filter(~pred if negate else pred)


def filter_not_null(df: DataFrame, *cols: str) -> DataFrame:
    """P9: null-rejection predicates (data-understanding.py:91,196)."""
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def like_any(col: Column, patterns: Sequence[str], lowercase: bool = True) -> Column:
    """P10: disjunction of LIKE patterns (data-understanding.py:183-187).
    Returns a Column so callers can negate (`~`) or combine it."""
    base = F.lower(col) if lowercase else col
    pred = F.lit(False)
    for p in patterns:
        pred = pred | base.like(p)
    return pred


def drop_nulls(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P11: df.na.drop() (data-viz&cleaning.py:74,85)."""
    return df.na.drop(subset=list(subset) if subset else None)


def dedupe_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P12: dropDuplicates — arbitrary survivor per key (reference semantics,
    data-viz&cleaning.py:74). One shuffle on the dedup key."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedupe_deterministic(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Deterministic dedup: keep the first row per key group under
    ``order_by`` (must make rows unique within a group). Same single shuffle
    as dropDuplicates, but the survivor is reproducible across runs and
    cluster layouts — the scalable default our engine prefers."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P14: withColumnRenamed chain (data-understanding.py:78-79)."""
    out = df
    for old, new in mapping.items():
        out = out.withColumnRenamed(old, new)
    return out


def pseudonymize(
    df: DataFrame, cols: Sequence[str], salt: str
) -> DataFrame:
    """Deterministic pseudonymization: replace identifier columns with
    salted sha256 hex tokens — the governance counterpart of
    ext.text.redact_pii (which targets free text). Same value → same
    token, so referential integrity survives: joins, group-bys, and
    distinct counts on the tokenized columns still work, while the
    original values are irrecoverable without the salt. NULLs stay NULL
    (a hashed NULL would manufacture a join key out of missing data).
    Pure narrow projection — zero shuffles, JVM-native sha2."""
    out = df
    for c in cols:
        tok = F.sha2(
            F.concat(F.lit(salt), F.lit(":"), F.col(c).cast("string")), 256
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNull(), F.lit(None)).otherwise(tok)
        )
    return out


def t_closeness(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    min_group: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    leg of the anonymity trio next to rel_k_anonymity (group size) and
    rel_l_diversity (distinct sensitive values): per quasi-identifier
    group, the total-variation distance between the group's sensitive
    distribution and the global one. TV is kept EXACT by clearing
    denominators:

        TV_g = Σ_s |n_gs·N − n_s·n_g| / (2·n_g·N)

    — the numerator is a bigint sum over the (group × sensitive) count
    grid (missing cells enter as |0 − n_s·n_g|, supplied by a key×value
    cross of the two small count tables), one double division at the
    end. A release is t-close iff max TV ≤ t; groups below min_group
    are the k-anonymity problem, not this one, and are excluded.

    Output: (qi..., n_g, tv_distance) for groups with n_g ≥ min_group."""
    s = F.col(sensitive_col).alias("s")
    base = df.select(*[F.col(c) for c in qi_cols], s)
    # ONE data scan: every other table is a rollup of the cell counts
    # (scan_audit showed 4 source scans in the naive form)
    cells = base.groupBy(*qi_cols, "s").agg(
        F.count(F.lit(1)).alias("n_gs")
    ).localCheckpoint(eager=True)
    glob = cells.groupBy("s").agg(F.sum("n_gs").alias("n_s"))
    tot = cells.agg(F.sum("n_gs").alias("n_all"))
    grp = cells.groupBy(*qi_cols).agg(F.sum("n_gs").alias("n_g"))
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .join(cells, [*qi_cols, "s"], "left")
        .fillna(0, subset=["n_gs"])
        .crossJoin(F.broadcast(tot))
    )
    num = F.abs(
        F.col("n_gs") * F.col("n_all") - F.col("n_s") * F.col("n_g")
    )
    tv = grid.groupBy(*qi_cols, "n_g", "n_all").agg(
        F.sum(num).alias("tv_num")
    )
    return tv.filter(F.col("n_g") >= min_group).select(
        *qi_cols,
        F.col("n_g").cast("bigint").alias("n_g"),
        F.round(
            F.col("tv_num").cast("double")
            / (
                2.0
                * F.col("n_g").cast("double")
                * F.col("n_all").cast("double")
            ),
            ndigits,
        ).alias("tv_distance"),
    )


def inclusion_dependencies(
    pairs: "list[tuple[DataFrame, str, str, DataFrame, str, str]]",
    ndigits: int = 6,
) -> DataFrame:
    """Inclusion-dependency mining — the schema-discovery primitive that
    proposes foreign keys (rel_fk_audit CHECKS declared ones; this MINES
    candidates): for each (child_df, child_col, child_name, parent_df,
    parent_col, parent_name) candidate, the fraction of the child's
    distinct values contained in the parent's distinct values. A
    containment of 1.0 is an FK candidate; the distinct tables are the
    only shuffles and the semi-join is broadcastable when the parent key
    set is dimension-sized.

    Output: (child, parent, n_child_distinct, n_contained,
    containment).

    Plan discipline (r10 verdict scan audit — orders/lineitem were each
    scanned SIX times): (a) each distinct key set is built ONCE per
    (table, column) and shared via an eager localCheckpoint — GC-released
    with the returned frame, so LIBRARY callers that never run the
    harness release_hubs() protocol cannot accumulate data-sized cache
    entries across calls (r11 ADVICE; the documented r7 heap-pressure
    failure mode) — o_custkey serves as child in two pairs and parent in
    a third off one build; (b) the per-pair containment is ONE left join
    with a parent marker aggregated once (count(*) = n_child,
    count(marker) = n_contained) instead of a semi-join plus a separate
    distinct count — both sides are distinct, so the left join cannot
    duplicate."""
    key_sets: dict[tuple[int, str], DataFrame] = {}

    def keys_of(df: DataFrame, col: str) -> DataFrame:
        ident = (id(df), col)
        if ident not in key_sets:
            key_sets[ident] = (
                df.select(F.col(col).cast("string").alias("k"))
                .distinct()
                .localCheckpoint(eager=True)
            )
        return key_sets[ident]

    outs = []
    for child, ccol, cname, parent, pcol, pname in pairs:
        cd = keys_of(child, ccol)
        pd_ = keys_of(parent, pcol).withColumn("__in", F.lit(1))
        outs.append(
            cd.join(pd_, "k", "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.count("__in").alias("n_contained"),
            )
            .select(
                F.lit(cname).alias("child"),
                F.lit(pname).alias("parent"),
                F.col("n_child").cast("bigint").alias("n_child_distinct"),
                F.col("n_contained").cast("bigint").alias("n_contained"),
                F.round(
                    F.col("n_contained").cast("double")
                    / F.col("n_child").cast("double"),
                    ndigits,
                ).alias("containment"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out

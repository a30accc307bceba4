"""Join operators (SURVEY.md §2.3).

The reference has zero joins — it collects scalars to the driver instead
(data-understanding.py:229-232). Our engine makes joins first-class because
every scalable rewrite of those patterns (percent-of-total, similarity,
enrichment) is a join, and the harness star schema requires them.

Strategy guidance (100 TB): dimension tables (region/nation/part/supplier)
→ ``broadcast`` (no shuffle of the fact side); fact-fact joins → let AQE
pick sort-merge vs shuffled-hash and handle skew; repeated joins on one key
→ pre-``repartition`` or bucket both sides on that key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_dim(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact ⋈ small dimension with an explicit broadcast hint — removes the
    shuffle of the (large) fact side entirely."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def join_facts(
    left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Large-large join: shuffle on the key; AQE (enabled in session.py)
    coalesces partitions and splits skewed ones at runtime."""
    return left.join(right, on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same key group (DuckDB/pandas
    ``merge_asof`` semantics, ties matching).

    Spark has no native as-of join; the scalable idiom used here is the
    union-and-carry-forward trick: tag both sides, union them, and within
    each key group ordered by (ts, side) carry the last non-null right
    payload forward with ``last(..., ignorenulls)`` over a running frame.
    ONE shuffle on the keys, one window — no per-key Python
    (pd.merge_asof via applyInPandas is the fallback for exotic variants).

    Determinism: the right payload is carried as ONE struct (a single
    ``last(ignorenulls)``), so the attached columns always come from the
    same right row — per-column carries could mix rows when some value
    column is null. ``tiebreak`` names a right-side column (e.g. a unique
    event id) appended to the window ordering so that equal-``(key, ts)``
    right rows resolve identically on every run (the max tiebreak wins).
    """
    from pyspark.sql import types as T

    lpay = [c for c in left.columns]
    payload_type = T.StructType([right.schema[c] for c in value_cols])
    rtypes = dict(right.dtypes)
    l_side = left.select(
        *lpay,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__r_payload"),
        (
            F.lit(None).cast(rtypes[tiebreak]) if tiebreak is not None else F.lit(0)
        ).alias("__tb"),
    )
    r_side = right.select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lpay
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r_payload"),
        (F.col(tiebreak) if tiebreak is not None else F.lit(0)).alias("__tb"),
    )
    unioned = l_side.unionByName(r_side)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lpay,
        F.col("__side"),
        F.last("__r_payload", ignorenulls=True).over(w).alias("__p"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lpay,
        *[F.col("__p").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )


def semi(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """EXISTS: rows of left with a match — right side never widens the row."""
    return left.join(right, on=on, how="left_semi")


def anti(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS: rows of left without a match."""
    return left.join(right, on=on, how="left_anti")

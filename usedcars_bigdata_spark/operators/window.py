"""Window operators (SURVEY.md §2.5, W1-W2 + full analytic surface).

The reference's only windows are *global* row_numbers with no partitionBy
(data-understanding.py:211-212; price-prediction.py:116) — every row through
a single task. We keep that form for parity (``global_row_number``) but the
engine default is partitioned windows; for a global sequential index at
scale use ``zip_index`` (zipWithIndex-style, no single-task sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(
    partition_by: Sequence[str], order_by: Sequence[Column | str]
) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def global_row_number(df: DataFrame, order_by: Sequence[Column | str], alias: str = "row_num") -> DataFrame:
    """W1/W2 parity: row_number over an unpartitioned ordering — correct but
    single-task; documented hazard (SURVEY.md §4 'Defeats Catalyst #3')."""
    return df.withColumn(alias, F.row_number().over(Window.orderBy(*order_by)))


def zip_index(df: DataFrame, alias: str = "index") -> DataFrame:
    """Scalable global 0-based contiguous index: per-partition counts + offset
    cumsum — one tiny extra job instead of a single-task global sort. Use for
    the reference's synthetic index column (data-viz&cleaning.py:88) when
    contiguity matters; ``F.monotonically_increasing_id`` when it doesn't."""
    from pyspark.sql import types as T

    rdd = df.rdd.zipWithIndex().map(lambda pair: pair[0] + (pair[1],))
    # Build a FRESH StructType: df.schema is a cached property and
    # StructType.add mutates in place — appending to it would corrupt the
    # caller's DataFrame schema.
    schema = T.StructType(list(df.schema.fields) + [T.StructField(alias, T.LongType(), False)])
    return df.sparkSession.createDataFrame(rdd, schema)


def with_rank_ops(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    value_col: str | None = None,
) -> DataFrame:
    """Ranking + analytic family over one window: row_number, rank,
    dense_rank, plus lag/lead of ``value_col`` when given."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = (
        df.withColumn("row_num", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("dense_rnk", F.dense_rank().over(w))
    )
    if value_col is not None:
        out = out.withColumn("prev_value", F.lag(value_col).over(w)).withColumn(
            "next_value", F.lead(value_col).over(w)
        )
    return out


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    agg_col: str,
    alias: str = "running_sum",
) -> DataFrame:
    """Cumulative sum over a rows-frame (unbounded preceding → current)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(agg_col).over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    local_prune: bool = False,
) -> DataFrame:
    """Top-K per group via row_number ≤ K. ``order_by`` must include a unique
    tie-break key for deterministic results across engines/runs.

    ``local_prune`` adds a lossless pre-pass: each input partition keeps its
    own top-K per group (window over (group, partition_id)) so the final
    window sorts at most K·n_partitions rows per group. MEASURED OFF by
    default: at 60M rows / 3 groups the plain window ran 9.5s vs 21s with
    pruning — the extra window round costs more than sorting a 20M-row
    partition, because both variants shuffle all rows exactly once and
    Spark's codegen sort is fast until it SPILLS. Enable when per-group
    data exceeds executor memory (the spill regime) — that is the cliff
    pruning exists for."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    pruned = df
    if local_prune:
        wl = Window.partitionBy(*partition_by, F.spark_partition_id()).orderBy(*order_by)
        pruned = (
            df.withColumn("__lrn", F.row_number().over(wl))
            .filter(F.col("__lrn") <= k)
            .drop("__lrn")
        )
    return (
        pruned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )

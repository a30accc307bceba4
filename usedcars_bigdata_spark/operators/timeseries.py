"""Time-series resampling operators over event streams.

Beyond-reference extension (the reference has no event-time processing at
all): dense resampling with gap fill — the step that turns an irregular
event stream into the fixed-step series that downstream models and
dashboards expect (missing buckets as explicit zero rows, not absent rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_gap_fill(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-key fixed-step resample with zero-filled gaps.

    Shape (all sizes are post-aggregation — the raw stream is touched
    exactly once):

    1. bucket + aggregate: one partial-aggregated shuffle reduces the
       stream to O(|keys| x |buckets|) rows;
    2. grid: the GLOBAL [min, max] bucket range (a 1-row aggregate) is
       ``sequence()``-exploded into the dense bucket axis and
       cross-joined with the distinct keys — both sides are tiny
       (buckets: one row per step in the corpus time span; keys: the
       dimension), so the grid never shuffles anything stream-sized;
    3. left join aggregates onto the grid and coalesce the fill values.

    The join keys on (key, bucket) against the already-aggregated table,
    so at 100 TB the only stream-sized work is step 1's map-side-combined
    shuffle; the grid side broadcasts. Dense output is |keys| x |buckets|
    rows by construction — callers own keeping the key dimension bounded
    (resampling on a high-cardinality key is a different op: sparse
    per-key ranges, same two-pass shape).

    Output: (key, bucket_start, n_events, sum_value) — n_events = 0 and
    sum_value = 0.0 on filled gaps."""
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else F.window(
        ts_col, step
    )["start"]
    agg = (
        events.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket_start"))
        .agg(
            F.count("*").alias("__n"),
            F.round(F.sum(value_col), 2).alias("__sum"),
        )
    )
    span = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    axis = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
        ).alias("bucket_start")
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    grid = keys.crossJoin(F.broadcast(axis))
    return (
        grid.join(
            agg,
            on=["key", "bucket_start"],
            how="left",
        )
        .select(
            F.col("key").alias(key_col),
            "bucket_start",
            F.coalesce("__n", F.lit(0)).alias("n_events"),
            F.coalesce("__sum", F.lit(0.0)).alias("sum_value"),
        )
    )


def zscore_outliers(
    events: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score outlier flagging: standardize each value against
    its key's corpus-wide mean/stddev and keep |z| >= threshold — the
    metric-anomaly primitive over an event stream.

    Two passes over the key dimension, one over the stream: the per-key
    moment aggregate is map-side combinable and key-cardinality-sized, so
    it broadcasts back onto the stream — the stream itself never
    shuffles. Keys with stddev 0 (constant series) produce no outliers by
    definition rather than dividing by zero.

    Output: (id, key, value, z) for flagged rows."""
    stats = events.groupBy(F.col(key_col).alias("__k")).agg(
        F.avg(value_col).alias("__mean"),
        F.stddev_samp(value_col).alias("__sd"),
    )
    z_raw = (F.col(value_col) - F.col("__mean")) / F.col("__sd")
    return (
        events.join(
            F.broadcast(stats), events[key_col] == F.col("__k"), "inner"
        )
        .filter(F.col("__sd") > 0)
        # flag on the UNROUNDED z (matching any SQL replay); round only
        # the reported value — a boundary row must not disagree with the
        # oracle over rounding.
        .filter(F.abs(z_raw) >= threshold)
        .select(
            F.col(id_col),
            F.col(key_col),
            F.col(value_col),
            F.round(z_raw, 4).alias("z"),
        )
    )

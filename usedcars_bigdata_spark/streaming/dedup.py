"""Streaming deduplication — exact dedup over an unbounded stream with
watermark-bounded state.

Batch ``dropDuplicates`` needs the full key set in memory forever; on a
stream that state grows without bound. ``dropDuplicatesWithinWatermark``
(Spark 3.5+) evicts key state once the event-time watermark passes it, so
state is O(keys arriving within the watermark window) — the production
shape for "suppress repeated events" pipelines (at-least-once sources
re-delivering, client retries double-firing analytics events).

Guarantee: duplicates arriving within the watermark delay of each other
are suppressed; a duplicate arriving after its key's state was evicted is
emitted again. Keys that cannot recur beyond the watermark horizon (e.g.
a key that embeds its event-time bucket, as in the contract entry) make
the streaming result exactly equal to batch DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked streaming dedup: first row per key wins, key state is
    dropped once the watermark passes. Works identically on a batch
    DataFrame (falls back to plain dropDuplicates semantics there), so
    batch twins can oracle-check the streaming run."""
    with_wm = events.withWatermark(ts_col, watermark)
    return with_wm.dropDuplicatesWithinWatermark(keys)


def hourly_user_action_keys(events: DataFrame) -> DataFrame:
    """Project the dedup key of the contract entry: one row per (user,
    event_type, event-hour). The hour bucket inside the key bounds how
    long a key can recur, aligning the within-watermark guarantee with
    exact DISTINCT semantics (see module docstring)."""
    return events.select(
        "user_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        F.col("ts"),
    )

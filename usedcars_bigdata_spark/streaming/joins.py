"""Stream-stream joins with event-time constraints.

Structured Streaming joins two unbounded inputs by buffering each side in
state; the time-interval condition + watermarks BOUND that state (rows
older than watermark+interval are evicted). Without the interval condition
both sides' state grows forever — the constraint is what makes the join
viable on unbounded data.

As elsewhere in streaming/, the transformation is built on unbound
DataFrames so the identical function runs in batch (the test oracle) and
streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_to_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute each purchase to prior clicks by the same user within
    ``max_gap``: an event-time interval join.

    Streaming semantics: both sides watermarked; the join condition
    ``click.ts ∈ [purchase.ts - max_gap, purchase.ts]`` lets Spark evict
    click state older than watermark+max_gap and purchase state older than
    watermark. Inner join → append output.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    cond = (
        (c.user_id == p.p_user_id)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr(f"INTERVAL {max_gap}"))
    )
    return c.join(p, cond, "inner").select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )


# Event-type → business-tier dimension used by the stream-static join demo.
# A real deployment reads this from a catalog table; it is the SMALL side
# by construction (dimension tables are), so each micro-batch broadcasts it.
EVENT_TIER_DIM: list[tuple[str, str]] = [
    ("view", "engagement"),
    ("click", "engagement"),
    ("signup", "conversion"),
    ("purchase", "conversion"),
    ("error", "ops"),
]


def enrich_with_tiers(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join + per-tier aggregate.

    The static side is re-planned per micro-batch (Spark re-resolves
    static relations each trigger), needs NO watermark and holds NO
    state — unlike stream-stream joins. Inner-joining a stream to a
    broadcastable dimension is the canonical enrichment shape: state cost
    is zero, the only streaming state is the downstream aggregation's.
    Runs identically on a batch DataFrame (the oracle path).

    Left join + coalesce to the 'ops' fallback tier: event types absent
    from the dimension are counted, not dropped — an inner join would
    silently lose events the moment a new type appears upstream."""
    joined = events.join(F.broadcast(dim), "event_type", "left").withColumn(
        "tier", F.coalesce(F.col("tier"), F.lit("ops"))
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def clicks_left_outer_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER event-time interval join: every click emits — matched
    rows as they join, UNMATCHED clicks with null purchase columns once
    the watermark passes click_ts + max_gap (only then can Spark prove no
    matching purchase can still arrive). The conversion-attribution shape
    where non-converting impressions matter as much as conversions.

    Streaming caveats the inner-join entry doesn't have: null-emission
    TIMING depends on watermark advancement, i.e. on micro-batch
    boundaries — and clicks still inside the final watermark horizon at
    end-of-stream never emit their null row (availableNow does not flush
    unexpired state). The GLOBAL watermark is the MIN across both branch
    watermarks (and the watermark columns sit after the event-type
    filters), so a quiet purchase side pins the global watermark and
    defers every null row — the stalled-side hazard to monitor in a real
    deployment (measured in the property test: a click-only late batch
    evicted nothing). The emitted SET is still a deterministic function
    of the data given deterministic batch boundaries (the mtime-stamped
    single-file source), which is what the rows-only contract entry and
    the batch-twin property test pin."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (c.user_id == p.p_user_id)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr(f"INTERVAL {max_gap}"))
    )
    return c.join(p, cond, "leftOuter").select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )

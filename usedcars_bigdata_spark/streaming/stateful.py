"""Custom stateful streaming operator via applyInPandasWithState.

Example operator: per-user running spend tracker with anomaly flagging —
state (n_events, total_value) persists across micro-batches per user_id;
each batch emits rows whose `value` exceeds ``threshold_mult`` × the user's
running mean at arrival time.

Why this shape: Structured Streaming's built-in aggs can't express
"compare each event against state accumulated BEFORE it" — that needs
user-managed per-key state. applyInPandasWithState gives Arrow-batched
state access with bounded memory per key (two floats), partitioned by
user_id — the canonical Spark pattern for custom stateful logic.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id long, value double, running_mean double, flagged boolean"
)
STATE_SCHEMA = "n long, total double"


def _track(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    out_rows = []
    for pdf in batches:
        pdf = pdf.sort_values("event_id")
        for ev_id, value in zip(pdf["event_id"], pdf["value"]):
            mean = total / n if n else None
            flagged = mean is not None and value > 3.0 * mean
            out_rows.append((user_id, int(ev_id), float(value),
                             float(mean) if mean is not None else None, bool(flagged)))
            n += 1
            total += float(value)
    state.update((n, total))
    yield pd.DataFrame(
        out_rows,
        columns=["user_id", "event_id", "value", "running_mean", "flagged"],
    )


def running_anomaly_flags(events: DataFrame) -> DataFrame:
    """Apply the stateful tracker. Works on a STREAMING DataFrame (state
    carried across micro-batches) — the operator partitions by user_id, so
    state shards across executors with the shuffle."""
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_anomaly_flags_batch(events: DataFrame) -> DataFrame:
    """Batch twin with identical semantics, expressed as a window (running
    mean over events strictly before each row, per user) — the oracle for
    the streaming operator in tests."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("running_mean"),
        F.coalesce(
            F.col("value") > 3.0 * F.avg("value").over(w), F.lit(False)
        ).alias("flagged"),
    )

"""Structured Streaming ingest over the events stream (SURVEY.md §2.12 —
beyond-reference extension; the reference has no streaming at all).

Transformations are built on an unbound DataFrame so the SAME function
serves batch (tests, backfills — the ts_* queries in plans/queries.py are
the batch twins checked against DuckDB) and streaming (readStream) inputs —
the Structured Streaming unification. Watermarks bound state for late data;
output mode 'update'/'append' chosen per sink semantics.

At production scale the source is Kafka (``spark.readStream.format("kafka")``)
partitioned by user/key; here the file source replays the harness parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import TESTDATA

# File-source schemas: the harness has generated events.ts as INT64
# TIMESTAMP(NANOS) (surfaces as long under nanosAsLong — see sources/io.py)
# in earlier rounds and as native INT64 micros NTZ since round 3. Streaming
# file sources need an explicit schema, so probe the file's surfaced type
# with a one-off batch read and pick the matching schema + conversion.
_EVENTS_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
_EVENTS_SCHEMA_MICROS = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, directory: str, glob: str = "events.parquet",
    max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming file source over a directory of events parquet files.
    (File sources take a directory; ``glob`` selects the event files within.)

    ts is normalized to a micros TimestampType whichever physical layout
    the files carry, so every downstream transformation (and its batch
    twin) sees one schema."""
    import os

    probe = spark.read.parquet(os.path.join(directory, glob)).schema["ts"]
    nanos = probe.dataType.simpleString() == "bigint"
    raw = (
        spark.readStream.schema(
            _EVENTS_SCHEMA_NANOS if nanos else _EVENTS_SCHEMA_MICROS
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(directory)
    )
    if nanos:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NTZ files store the UTC wall clock of the same instants the nanos
    # files store as epoch longs. A bare cast interprets the wall clock
    # in the SESSION timezone, so under a non-UTC session the two
    # layouts disagreed by the tz offset, shifting every window bucket
    # (r9 review; latent while session.py pins UTC). convert_timezone
    # from UTC into the current session zone first, so the subsequent
    # cast lands on the SAME instant the nanos branch produces under
    # ANY session timezone (verified empirically vs America/New_York).
    return raw.withColumn(
        "ts",
        F.convert_timezone(
            F.lit("UTC"), F.expr("current_timezone()"), F.col("ts")
        ).cast("timestamp"),
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` given) window counts + value sums
    per event_type, watermarked for late data. Batch twin: ts_tumbling_hourly
    / ts_sliding_hourly (oracle-checked)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-merged). Batch twin: ts_session_windows
    (oracle-checked against the lag/cumsum SQL idiom)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> StreamingQuery:
    """Drive a streaming aggregation into an in-memory table and process all
    available input synchronously — the local smoke harness. Real sinks:
    kafka / parquet-append / foreachBatch for exactly-once upserts."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def user_spend_totals(events: DataFrame, event_type: str = "purchase") -> DataFrame:
    """Running per-user spend totals in integer cents — the streaming
    leaderboard aggregation. Unbound-DataFrame transformation: in
    streaming this is a stateful running aggregate (complete mode keeps
    the full per-user state table, updated every micro-batch); the batch
    twin is the plain GROUP BY certified by ts_stream_topk's oracle.
    Cents keep the cross-batch accumulation exact — a double running sum
    would drift with batch boundaries."""
    return (
        events.filter(F.col("event_type") == event_type)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "spend_cents"
            ),
        )
    )

"""Streaming sinks beyond the memory smoke harness.

``upsert_to_parquet`` is the exactly-once pattern: foreachBatch gives a
deterministic (batch_id, batch_df) pair; we MERGE by key into a parquet
target (Delta's MERGE INTO without the Delta jar — anti-join + union +
atomic directory swap). Re-running a batch yields the same target state
(idempotent upsert), which is what turns at-least-once delivery into
exactly-once results.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str | list[str],
) -> None:
    """Batch MERGE-by-key into a parquet directory: rows in target whose
    key (single column or composite list) appears in ``updates`` are
    replaced; new keys appended. Emulates Delta/Iceberg MERGE INTO
    (neither jar ships in this image — SURVEY.md guide note) with an
    atomic swap of the output directory."""
    keys = [key] if isinstance(key, str) else list(key)
    tmp = target_path + "__tmp"
    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
        kept = current.join(updates.select(*keys), on=keys, how="left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.rename(tmp, target_path)


def upsert_to_parquet(
    stream_df: DataFrame,
    target_path: str,
    key: str,
    checkpoint: str,
    query_name: str = "upsert",
    output_mode: str = "append",
) -> StreamingQuery:
    """foreachBatch upsert sink: each micro-batch merges by key into
    ``target_path``. With checkpointing, a replayed batch re-merges the
    same rows → same target state (exactly-once effect).

    ``output_mode="update"`` is the aggregated-stream pairing: each batch
    delivers the keys whose aggregate changed, carrying the CUMULATIVE
    value, and the keyed merge makes the target converge to the batch
    answer (contract entry ts_stream_upsert_sink checks exactly that
    against the DuckDB batch aggregation)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert(batch_df.sparkSession, target_path, batch_df, key)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )

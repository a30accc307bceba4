"""Streaming ≡ batch equivalence: the same transformation functions, fed by
readStream over the harness events parquet, must produce exactly the batch
result once all input is processed."""

from __future__ import annotations

import pytest

from usedcars_bigdata_spark.sources import load_table
from usedcars_bigdata_spark.streaming import events as SE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


def test_windowed_counts_stream_equals_batch(spark, sf_dir, batch_events):
    stream = SE.read_event_stream(spark, sf_dir)
    q = SE.run_to_memory_sink(SE.windowed_counts(stream), "win_out")
    try:
        got = spark.sql("SELECT * FROM win_out")
        want = SE.windowed_counts(batch_events)
        cols = ["window_start", "event_type", "n_events", "sum_value"]
        assert _rows(got, cols) == _rows(want, cols)
        assert got.count() > 0
    finally:
        q.stop()


def test_rocksdb_state_store_parity(spark, sf_dir, batch_events):
    """The RocksDB state-store provider (the per-executor state-ceiling
    lever for 100 TB stateful streams — docs/SCALING.md r9) must produce
    the SAME windowed aggregate as the default heap-backed provider,
    and the progress metrics must prove RocksDB actually served the
    state (a misspelled provider conf silently no-ops)."""
    from usedcars_bigdata_spark.streaming.statestore import (
        ROCKSDB_PROVIDER,
        rocksdb_state,
    )

    want = _rows(
        SE.windowed_counts(batch_events),
        ["window_start", "event_type", "n_events", "sum_value"],
    )
    with rocksdb_state(spark):
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        stream = SE.read_event_stream(spark, sf_dir)
        q = SE.run_to_memory_sink(SE.windowed_counts(stream), "rocksdb_out")
        try:
            got = _rows(
                spark.sql("SELECT * FROM rocksdb_out"),
                ["window_start", "event_type", "n_events", "sum_value"],
            )
            assert got == want and len(got) > 0
            metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
            rocks_keys = [k for k in metrics if "rocksdb" in k.lower()]
            assert rocks_keys, f"no rocksdb metrics in {sorted(metrics)}"
        finally:
            q.stop()
    # conf restored on exit
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", "unset-or-default"
        )
        != ROCKSDB_PROVIDER
    )


def test_session_aggregates_stream_equals_batch(spark, sf_dir, batch_events):
    stream = SE.read_event_stream(spark, sf_dir)
    q = SE.run_to_memory_sink(SE.session_aggregates(stream), "sess_out")
    try:
        got = spark.sql("SELECT * FROM sess_out")
        want = SE.session_aggregates(batch_events)
        cols = ["user_id", "session_start", "session_end", "n_events"]
        assert _rows(got, cols) == _rows(want, cols)
    finally:
        q.stop()


def test_sliding_windows_stream(spark, sf_dir, batch_events):
    stream = SE.read_event_stream(spark, sf_dir)
    q = SE.run_to_memory_sink(
        SE.windowed_counts(stream, window="1 hour", slide="30 minutes"), "slide_out"
    )
    try:
        got = spark.sql("SELECT * FROM slide_out")
        # each event contributes to exactly 2 sliding windows
        n_batch = batch_events.count()
        total = sum(r["n_events"] for r in got.collect())
        assert total == 2 * n_batch
    finally:
        q.stop()


def test_stateful_anomaly_flags_stream_equals_batch(spark, sf_dir, batch_events):
    """applyInPandasWithState operator must match its window-based batch
    twin once all micro-batches are processed (state accumulates across
    batches in event order only within a batch — single-file source here,
    so ordering matches the batch window)."""
    from usedcars_bigdata_spark.streaming import stateful as ST

    stream = SE.read_event_stream(spark, sf_dir)
    q = SE.run_to_memory_sink(
        ST.running_anomaly_flags(stream), "anom_out", output_mode="append"
    )
    try:
        got = spark.sql("SELECT * FROM anom_out")
        want = ST.running_anomaly_flags_batch(
            batch_events.select("user_id", "event_id", "value")
        )
        cols = ["user_id", "event_id", "flagged"]
        assert _rows(got, cols) == _rows(want, cols)
        n_flagged = got.filter("flagged").count()
        assert got.count() == batch_events.count()
        assert 0 < n_flagged < got.count()
    finally:
        q.stop()


def test_contract_microbatch_query_runs_and_matches_batch(spark, sf_dir):
    """The contract-visible ts_stream_microbatch entry must run a real
    availableNow micro-batch pass, terminate, equal the batch twin, and be
    safely re-invocable (the driver may call it more than once)."""
    from usedcars_bigdata_spark.plans import QUERIES

    got = QUERIES["ts_stream_microbatch"](spark, sf_dir)
    cols = ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    want = SE.windowed_counts(load_table(spark, sf_dir, "events"))
    assert _rows(got, cols) == _rows(want, cols)
    # the streaming query terminated (availableNow), nothing left active
    assert all(q.name != "ts_stream_microbatch_sink" for q in spark.streams.active)
    # re-invocation replaces the sink table cleanly
    again = QUERIES["ts_stream_microbatch"](spark, sf_dir)
    assert _rows(again, cols) == _rows(got, cols)


def test_stream_dedup_equals_batch_distinct(spark, sf_dir, batch_events):
    """ts_stream_dedup: watermarked streaming dedup over the event stream
    equals batch DISTINCT on the (user, type, hour) key — the hour bucket
    inside the key keeps keys inside the watermark horizon. Re-invocable."""
    from pyspark.sql import functions as F

    from usedcars_bigdata_spark.plans import QUERIES

    got = QUERIES["ts_stream_dedup"](spark, sf_dir)
    cols = ["user_id", "event_type", "hour_start"]
    want = batch_events.select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).distinct()
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() < batch_events.count()  # dedup actually removed rows
    assert all(q.name != "ts_stream_dedup_sink" for q in spark.streams.active)
    again = QUERIES["ts_stream_dedup"](spark, sf_dir)
    assert _rows(again, cols) == _rows(got, cols)


def test_scalable_anomaly_flags_matches_batch_twin(spark, sf_dir, batch_events, tmp_path):
    """The hot-key-neutral foreachBatch rewrite (grouped_running_sums +
    combinable state merge — r11 verdict item 3) must emit EXACTLY the
    batch twin's rows: integer cents make every prefix mean a
    bit-identical integer÷count on both sides."""
    from pyspark.sql import functions as F

    from usedcars_bigdata_spark.streaming import stateful as ST

    stream = SE.read_event_stream(spark, sf_dir).withColumn(
        "value", F.round(F.col("value") * 100)
    )
    q = ST.running_anomaly_flags_scalable(
        stream,
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ck"),
        query_name="anom_scal_test",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "out")).withColumn(
        "rm", F.round("running_mean", 6)
    )
    want = ST.running_anomaly_flags_batch(
        batch_events.select(
            "user_id", "event_id", F.round(F.col("value") * 100).alias("value")
        )
    ).withColumn("rm", F.round("running_mean", 6))
    cols = ["user_id", "event_id", "value", "rm", "flagged"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.filter("flagged").count() > 0
    # externalized state: one (n, total) row per user, totals match batch
    state = spark.read.parquet(str(tmp_path / "state"))
    assert state.count() == batch_events.select("user_id").distinct().count()


def test_scalable_anomaly_multibatch_equals_python_fold(spark, sf_dir, batch_events, tmp_path):
    """Across MULTIPLE micro-batches (3 files, one per trigger) the
    rewrite must stay bit-identical to the applyInPandasWithState fold —
    the two engines fold the same batches, so any divergence is a state
    carry bug, not source ordering."""
    from pyspark.sql import functions as F

    from usedcars_bigdata_spark.streaming import stateful as ST

    src = str(tmp_path / "src")
    ev = batch_events.select(
        "user_id", "event_id", F.round(F.col("value") * 100).alias("value")
    )
    n = ev.count()
    # three ordered files => three deterministic micro-batches
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]:
        (ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
           .coalesce(1).write.mode("append").parquet(src))
    stream = (
        spark.readStream.schema("user_id long, event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    q = ST.running_anomaly_flags_scalable(
        stream,
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ck"),
        query_name="anom_scal_mb",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "out"))
    q2 = SE.run_to_memory_sink(
        ST.running_anomaly_flags(stream), "anom_fold_mb", output_mode="append"
    )
    try:
        want = spark.sql("SELECT * FROM anom_fold_mb")
        cols = ["user_id", "event_id", "value", "running_mean", "flagged"]
        assert _rows(got, cols) == _rows(want, cols)
        assert got.count() == n
    finally:
        q2.stop()


def test_stream_shuffle_partitions_scale_adaptive(spark, sf_dir, tmp_path,
                                                  monkeypatch):
    """r12 optimization: streaming queries size their shuffle/state
    partitioning to the SOURCE bytes (~64 MiB per partition, floor 4,
    capped at the session batch default) instead of inheriting the
    cores-sized batch default — state stores are a per-partition,
    per-micro-batch commit cost. Pins the derivation rule's edges:
    tiny source → floor; unmeasurable source → batch default (never
    the local floor, which would serialize a production stream);
    env override wins; big source → bytes-derived but capped."""
    from usedcars_bigdata_spark.streaming.events import (
        stream_shuffle_partitions,
    )

    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS",
                       raising=False)
    batch_default = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # tiny local source → the compute-parallelism floor (a tmp_path
    # source of known size, NOT the sf_dir fixture: at a larger sf dir
    # events.parquet can exceed one target span and the assert would
    # fail for environment reasons — ADVICE r12)
    tiny = tmp_path / "tiny"
    tiny.mkdir()
    (tiny / "one.bin").write_bytes(b"\0" * 1024)
    assert stream_shuffle_partitions(spark, str(tiny), "*.bin") == 4

    # per-operator-type floor (r13): compute-heavy operators pass a
    # higher floor; still capped at the batch default
    assert stream_shuffle_partitions(
        spark, str(tiny), "*.bin", floor=8
    ) == min(8, batch_default)

    # unmeasurable source (missing path: os.walk yields nothing) →
    # batch default, NOT the floor
    assert (
        stream_shuffle_partitions(spark, str(tmp_path / "nope"), "*")
        == batch_default
    )

    # bytes-derived: 3 files x 1 MiB at target 1 MiB → 3, floored to 4;
    # at target 256 KiB → 12, capped at the batch default
    d = tmp_path / "src"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.bin").write_bytes(b"\0" * (1 << 20))
    assert stream_shuffle_partitions(
        spark, str(d), "*.bin", target_bytes=1 << 20
    ) == 4
    capped = stream_shuffle_partitions(
        spark, str(d), "*.bin", target_bytes=256 << 10
    )
    assert capped == min(12, batch_default)

    # env override wins over everything
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "7")
    assert stream_shuffle_partitions(spark, sf_dir, "events.parquet") == 7


def test_stream_conf_scoped_to_query_start(spark, sf_dir):
    """r13 (r12 ADVICE 'medium'): read_event_stream's shuffle-partitions
    mutation is SCOPED — the batch default is snapshotted before the set
    and restored right after the streaming query starts (the query clones
    the session inside start(), so the restore can't affect it). A
    library caller running batch work after a stream in the same session
    must plan at its own default again, and the running stream must still
    use the data-derived count."""
    from usedcars_bigdata_spark.streaming import events as SE

    before = spark.conf.get("spark.sql.shuffle.partitions")
    stream = SE.read_event_stream(spark, sf_dir)
    derived = spark.conf.get("spark.sql.shuffle.partitions")
    # mutation visible between build and start (that's what start() reads)
    assert derived == "4"
    assert SE._SAVED_BATCH_SHUFFLE == [before]
    q = SE.run_to_memory_sink(
        SE.windowed_counts(stream), "conf_scope_sink"
    )
    try:
        # restored for the caller the moment start() returned...
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
        assert SE._SAVED_BATCH_SHUFFLE == []
        # ...while the running query kept the derived count: its state
        # operator count equals the derived partitions, not the default
        prog = q.lastProgress
        ops = prog["stateOperators"]
        assert ops and all(
            op["numShufflePartitions"] == 4 for op in ops
        ), ops
    finally:
        q.stop()


def test_save_restore_shuffle_conf_idempotent(spark):
    """Double-save keeps the ORIGINAL batch value (a stream-stream join
    builds two streams before one start); restore with nothing pending is
    a no-op."""
    from usedcars_bigdata_spark.streaming import events as SE

    before = spark.conf.get("spark.sql.shuffle.partitions")
    SE.restore_shuffle_partitions(spark)  # nothing pending: no-op
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    SE.save_batch_shuffle_conf(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    SE.save_batch_shuffle_conf(spark)  # must NOT overwrite the snapshot
    spark.conf.set("spark.sql.shuffle.partitions", "6")
    SE.restore_shuffle_partitions(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

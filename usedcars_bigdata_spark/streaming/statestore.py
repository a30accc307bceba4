"""State-store provider selection — the per-executor state-ceiling lever.

The default HDFSBackedStateStoreProvider keeps every stateful operator's
working state (stream-stream join buffers, window aggregates, dedup key
sets) in JVM HEAP, with the checkpoint as backing — the r8 10x probe
(docs/SCALING.md) measured interval-join state exactly LINEAR in keys,
so at 100 TB / billions of keys the heap is the first wall. Spark ships
RocksDBStateStoreProvider (rocksdbjni is bundled), which holds state
off-heap in a local RocksDB instance with the same checkpoint contract:
the documented production answer for state larger than executor heap.

Result parity is pinned by tests/test_streaming.py::
test_rocksdb_state_store_parity — same rows, and the progress metrics
prove RocksDB actually served the state (the conf silently no-ops if
misspelled, so the test asserts the rocksdb custom metrics exist).

Usage: set BEFORE starting the streaming query —
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)
or wrap with ``rocksdb_state(spark)`` to restore the prior provider on
exit. Changing providers on an EXISTING checkpoint is not supported by
Spark — pick per pipeline, at first deployment.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def rocksdb_state(spark: SparkSession) -> Iterator[None]:
    """Run the enclosed stream starts under the RocksDB state store,
    restoring the previous provider conf afterwards."""
    prev = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, prev)

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image`` raises NotImplementedError by design, and
``fake_image_features`` is a deterministic stand-in (hash-derived) so the
Spark-side plumbing — schema, batch iteration, partition sizing — is real
and tested. Swapping in PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat_dim", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """Real decode (PIL.Image.open等) — unavailable in this container."""
    raise NotImplementedError(
        "image codecs not installed; use fake_image_features for plumbing tests"
    )


def fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: sha256-derived floats in
    [0,1). Same payload → same features, everywhere."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8, use_stub: bool = True) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas —
    Arrow-batched, one Python worker per partition, no row-at-a-time serde.
    Partition count (not row width) governs parallelism, so repartition
    upstream by expected decode cost at scale."""

    # The per-batch function is defined LOCALLY (not a module-level ref) so
    # cloudpickle serializes it BY VALUE: executors then need no
    # usedcars_bigdata_spark on their PYTHONPATH. The driver harness builds
    # its own SparkSession, and local-function capture is what keeps this
    # query runnable there (module-level refs pickle by reference and
    # ModuleNotFoundError on workers launched outside the repo root).
    if use_stub:

        def fn(p: bytes, _dim: int = dim) -> list[float]:
            import hashlib as _hashlib

            h = _hashlib.sha256(p or b"").digest()
            return [h[i % len(h)] / 255.0 for i in range(_dim)]

    else:

        def fn(p: bytes, _dim: int = dim) -> list[float]:
            raise NotImplementedError(
                "image codecs not installed; use_stub=True for plumbing tests"
            )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat_dim": dim,
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling via mapInPandas: one input row → n output rows
    (frame schedule), the 1-to-N expansion shape a real video pipeline
    needs (ffmpeg keyframe extraction). The SCHEDULE math is real —
    ``n_frames = min(max_frames, duration_ms // every_ms + 1)`` from the
    duration metadata, timestamps at ``i * every_ms`` — while the decode
    is stubbed deterministically (no codecs in this container): each
    "frame" is fingerprinted as sha256(payload ':' idx) hex, so the
    expansion is exactly replayable by a SQL oracle and swapping in a
    real decoder changes one line.

    Rows with NULL duration emit one frame at t=0 (the poster-frame
    convention). Output: (media_id, frame_idx, frame_ts_ms, frame_sha)."""
    out_schema = (
        "media_id long, frame_idx int, frame_ts_ms long, frame_sha string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            mids, idxs, tss, shas = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = 1
                if dur is not None and not pd.isna(dur):
                    n = min(max_frames, int(dur) // every_ms + 1)
                for i in range(max(n, 1)):
                    mids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    shas.append(
                        _hashlib.sha256(
                            bytes(payload or b"") + f":{i}".encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, out_schema
    )


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Thumbnail/resize plumbing via mapInPandas: metadata transform is
    real (output dimensions recorded), pixel work is the deterministic
    stub sha256(payload ':WxH') — swap one line for PIL.thumbnail when
    codecs exist. Output: (media_id, width, height, thumb_sha)."""
    out_schema = "media_id long, width int, height int, thumb_sha string"
    tag = f":{width}x{height}".encode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "thumb_sha": [
                        _hashlib.sha256(bytes(p or b"") + tag).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, out_schema)


def synthesize_media_from_docs(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Build a deterministic fake media table from the documents table so the
    plumbing can run against harness data (text bytes as payload)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )

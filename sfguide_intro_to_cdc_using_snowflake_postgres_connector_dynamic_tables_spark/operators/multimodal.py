"""Multimodal column plumbing: image/audio/video as opaque binary.

Design (BASELINE.json extension surface): media travels as a
``binary`` payload column plus a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas`` so each task streams batches without
materializing a partition of blobs in memory.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are stubbed: ``decode_stub=True`` (default) derives
deterministic fake features from the bytes themselves -- the Spark-side
contract (schemas, batch iteration, partitioning, UDF signatures) is
real and tested; swapping in a real codec changes only the marked
inner function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_features(payload: bytes, media_type: str, dim: int = 8) -> list[float]:
    """STUB decode kernel.

    Real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not in container
        raise NotImplementedError

    The stub derives a deterministic pseudo-feature from the byte
    content so tests can assert exact values end-to-end.
    """
    if payload is None:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    out = [float(arr[i::dim].sum() % 997) for i in range(dim)] if arr.size else [0.0] * dim
    return out


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Batch feature extraction over ``mapInPandas``.

    Each Arrow batch becomes one pandas frame; the iterator contract
    means a 100 MB-of-blobs partition is processed in bounded-memory
    chunks (``spark.sql.execution.arrow.maxRecordsPerBatch``).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf.apply(
                        lambda r: _decode_features(r["payload"], r["media_type"], dim), axis=1
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into frame
    timestamps (pure relational -- sequence + explode); the per-frame
    decode would then run through ``extract_features``.  Demonstrates
    that the expansion step needs no Python at all."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
            ).alias("frame_ts_ms"),
        )
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes payload through the stub kernel and
    rewrites metadata.  Real codec -> replace ``_resize_one``."""

    def _resize_one(payload: bytes) -> bytes:
        # Real: PIL resize. Stub: identity (bytes unchanged).
        return payload

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = out["payload"].map(_resize_one)
            out["meta"] = out["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield out

    return media.mapInPandas(batches, MEDIA_SCHEMA)

"""Streaming media ingestion: decode gate + exact-bytes dedup +
pHash band-index perceptual dedup, driven through a live parquet
file-source stream across two availableNow runs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_bmp,
    encode_ppm,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.media_ingest import (
    ingest_media_batch,
    media_fp_table,
    phash_index_table,
    start_media_ingest,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)


def _img(seed: int, size: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def _noised(a: np.ndarray) -> np.ndarray:
    b = a.copy()
    b[::9, ::9] = ((b[::9, ::9].astype(int) + 5) % 256).astype(np.uint8)
    return b


def _media_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [r[0] for r in rows],
                "media_type": "image",
                "payload": [r[1] for r in rows],
                "meta": None,
            }
        ),
        MEDIA_SCHEMA,
    )


def _drain(spark, feed, store, ckpt):
    q = start_media_ingest(spark, feed, store, ckpt)
    q.awaitTermination(120)
    q.stop()


def test_media_ingest_stream_two_runs(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    store = ParquetTableStore(str(tmp_path / "store"))
    A, B = _img(1), _img(2)

    batch1 = [
        (1, bytearray(encode_ppm(A))),
        (2, bytearray(encode_ppm(B))),
        (3, bytearray(encode_ppm(A))),  # batch-internal exact dup of 1
    ]
    _media_df(spark, batch1).write.mode("append").parquet(feed)
    _drain(spark, feed, store, ckpt)
    ids = {r["media_id"] for r in store.read(spark, "media").select("media_id").collect()}
    assert ids == {1, 2}

    C = _img(3)
    batch2 = [
        (10, bytearray(encode_bmp(A))),       # A re-encoded: bytes differ, pixels equal
        (11, bytearray(encode_ppm(_noised(A)))),  # A noised: within max_dist
        (12, bytearray(encode_ppm(B))),       # byte-identical re-upload of 2
        (13, bytearray(encode_ppm(C))),       # genuinely new
        (14, bytearray(b"not an image")),     # decode gate drops it
    ]
    _media_df(spark, batch2).write.mode("append").parquet(feed)
    _drain(spark, feed, store, ckpt)

    ids = {r["media_id"] for r in store.read(spark, "media").select("media_id").collect()}
    assert ids == {1, 2, 13}, ids

    # the index tables grew with the survivor only
    fp_n = store.read(spark, media_fp_table("media")).count()
    assert fp_n == 3
    idx = store.read(spark, phash_index_table("media", 8))
    assert idx.count() == 3 * 8  # 8 band keys per stored image
    assert {r["media_id"] for r in idx.select("media_id").distinct().collect()} == {1, 2, 13}


def test_ingest_media_batch_strict_decode_raises(spark, tmp_path):
    store = ParquetTableStore(str(tmp_path / "store"))
    bad = _media_df(spark, [(1, bytearray(b"junk"))])
    with pytest.raises(Exception, match="unsupported image magic|too short"):
        ingest_media_batch(store, spark, bad, decode="image")


def test_ingest_media_batch_perceptual_intra_batch(spark, tmp_path):
    """One batch containing an original + its re-encode + its noised
    copy keeps exactly one of the three (lowest id)."""
    store = ParquetTableStore(str(tmp_path / "store"))
    A = _img(7)
    batch = _media_df(
        spark,
        [
            (5, bytearray(encode_ppm(A))),
            (6, bytearray(encode_bmp(A))),
            (7, bytearray(encode_ppm(_noised(A)))),
            (8, bytearray(encode_ppm(_img(8)))),
        ],
    )
    ingest_media_batch(store, spark, batch)
    ids = {r["media_id"] for r in store.read(spark, "media").select("media_id").collect()}
    assert ids == {5, 8}

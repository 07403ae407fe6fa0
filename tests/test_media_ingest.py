"""Streaming media ingestion: decode gate + exact-bytes dedup +
pHash band-index perceptual dedup, driven through a live parquet
file-source stream across two availableNow runs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

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
    with pytest.raises(Exception, match="no supported format"):
        ingest_media_batch(store, spark, bad, decode="strict")


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


def test_media_ingest_multimodal_feed(spark, tmp_path):
    """One feed carrying images, WAV audio, and AVI video: each
    modality dedups within itself (re-encodes/re-levels drop), and
    modalities never interfere (disjoint band namespaces)."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.multimodal import (
        encode_avi,
        encode_wav,
    )

    store = ParquetTableStore(str(tmp_path / "store"))
    t = np.arange(4000)
    tone = lambda f, amp: (amp * np.sin(2 * np.pi * f * t / 8000)).astype(np.int16)
    vidA = _img(21)[None].repeat(4, axis=0)
    img = _img(20)

    batch1 = _media_df(
        spark,
        [
            (1, bytearray(encode_ppm(img))),
            (2, bytearray(encode_wav(tone(440, 3000), 8000))),
            (3, bytearray(encode_avi(vidA))),
        ],
    )
    ingest_media_batch(store, spark, batch1)

    batch2 = _media_df(
        spark,
        [
            (10, bytearray(encode_bmp(img))),                   # image re-encode -> drop
            (11, bytearray(encode_wav(tone(440, 1400), 8000))), # re-leveled tone -> drop
            (12, bytearray(encode_avi(_noised(vidA[0])[None].repeat(4, axis=0)))),  # noised video -> drop
            (13, bytearray(encode_wav(tone(1333, 3000), 8000))),  # new audio -> keep
        ],
    )
    ingest_media_batch(store, spark, batch2)
    rows = {
        r["media_id"]: r["modality"]
        for r in store.read(spark, "media").select("media_id", "modality").collect()
    }
    assert rows == {1: "image", 2: "audio", 3: "video", 13: "audio"}, rows
    # index namespaces are disjoint per modality
    idx = store.read(spark, phash_index_table("media", 8))
    ns = {
        r["modality"]: r["ns"]
        for r in idx.select(
            "modality", (F.shiftrightunsigned(F.col("band"), 48)).alias("ns")
        )
        .distinct()
        .collect()
    }
    assert ns == {"image": 1, "audio": 2, "video": 3}, ns


def _vid(seeds: list[int]) -> np.ndarray:
    return np.stack([_img(s) for s in seeds], axis=0)


def test_video_trimmed_lead_is_caught(spark, tmp_path):
    """The r11 evasion: a video equal to a stored one minus its first
    k frames must be caught by the multi-frame sampled index (frame-0
    hashing alone misses it), and per-video index rows stay bounded at
    max_video_frames x n_bands."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.multimodal import (
        encode_avi,
    )

    store = ParquetTableStore(str(tmp_path / "store"))
    frames = _vid(list(range(100, 110)))  # 10 distinct frames
    ingest_media_batch(
        store, spark, _media_df(spark, [(1, bytearray(encode_avi(frames)))])
    )

    batch2 = _media_df(
        spark,
        [
            (10, bytearray(encode_avi(frames[2:]))),  # first 2 frames trimmed
            (11, bytearray(encode_avi(_vid([201, 202, 203])))),  # new video
        ],
    )
    ingest_media_batch(store, spark, batch2)
    ids = {
        r["media_id"]
        for r in store.read(spark, "media").select("media_id").collect()
    }
    assert ids == {1, 11}, ids

    idx = store.read(spark, phash_index_table("media", 8))
    per_video = {
        r["media_id"]: r["n"]
        for r in idx.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n <= 8 * 8 for n in per_video.values()), per_video
    # 10-frame video sampled to <= 8 distinct hashes
    hashes_1 = idx.filter(F.col("media_id") == 1).select("phash").distinct().count()
    assert 2 <= hashes_1 <= 8


def test_min_match_hashes_counts_per_partner_both_tiers(spark, tmp_path):
    """min_match_hashes semantics are normalized across tiers: a row
    is a dup iff >= k of its DISTINCT hashes match ONE partner.

    Cross-batch: two unrelated stored videos each matching a single
    frame must NOT jointly reach k=2 (the pre-r13 cross tier counted
    store-wide matches and would have dropped the row); a video
    matching two frames of the SAME stored partner is dropped.

    Intra-batch: one new frame matching two near-identical stored
    frames of a partner counts ONCE (the pre-r13 intra tier counted
    hash-PAIR rows and double-counted it)."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.multimodal import (
        encode_avi,
    )

    k = dict(max_dist=3, n_bands=8, min_match_hashes=2)
    store = ParquetTableStore(str(tmp_path / "store"))
    fa = [_img(300 + i) for i in range(3)]  # video A frames
    fb = [_img(310 + i) for i in range(3)]  # video B frames
    ingest_media_batch(
        store,
        spark,
        _media_df(
            spark,
            [
                (1, bytearray(encode_avi(np.stack(fa)))),
                (2, bytearray(encode_avi(np.stack(fb)))),
            ],
        ),
        **k,
    )
    batch2 = _media_df(
        spark,
        [
            # one frame from A + one frame from B: no single partner
            # reaches 2 -> must survive
            (10, bytearray(encode_avi(np.stack([fa[0], fb[0], _img(320)])))),
            # two frames from A: partner A reaches 2 -> dropped
            (11, bytearray(encode_avi(np.stack([fa[1], fa[2], _img(321)])))),
        ],
    )
    ingest_media_batch(store, spark, batch2, **k)
    ids = {
        r["media_id"]
        for r in store.read(spark, "media").select("media_id").collect()
    }
    assert ids == {1, 2, 10}, ids

    # intra tier: stored partner P carries two near-identical frames
    # (orig + noised); a new video sharing only the ORIGINAL frame has
    # one distinct matching hash -> kept at k=2, even though it matches
    # two of P's hashes (two hash-pair rows)
    store2 = ParquetTableStore(str(tmp_path / "store2"))
    g = _img(340)
    batch = _media_df(
        spark,
        [
            (1, bytearray(encode_avi(np.stack([g, _noised(g), _img(341)])))),
            (2, bytearray(encode_avi(np.stack([g, _img(342), _img(343)])))),
        ],
    )
    ingest_media_batch(store2, spark, batch, **k)
    ids2 = {
        r["media_id"]
        for r in store2.read(spark, "media").select("media_id").collect()
    }
    assert ids2 == {1, 2}, ids2


def test_phash_index_backfill_after_scheme_bump(spark, tmp_path):
    """A store whose perceptual index predates the current scheme has
    no current-scheme table; the next batch must backfill it from the
    main table's payloads and still catch a trimmed near-dup."""
    import shutil

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.multimodal import (
        encode_avi,
    )

    store = ParquetTableStore(str(tmp_path / "store"))
    frames = _vid(list(range(300, 308)))
    ingest_media_batch(
        store, spark, _media_df(spark, [(1, bytearray(encode_avi(frames)))])
    )
    # simulate the retired-scheme store: the current-scheme index is gone
    shutil.rmtree(store._table_dir(phash_index_table("media", 8)))
    assert not store.exists(phash_index_table("media", 8))

    ingest_media_batch(
        store,
        spark,
        _media_df(spark, [(20, bytearray(encode_avi(frames[3:])))]),
    )
    ids = {
        r["media_id"]
        for r in store.read(spark, "media").select("media_id").collect()
    }
    assert ids == {1}, ids
    assert store.exists(phash_index_table("media", 8))

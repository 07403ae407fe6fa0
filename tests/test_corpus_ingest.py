"""Streaming corpus ingestion: redelivery dedup + quality gate +
store-level content dedup + partitioned upsert, driven through a live
file-source stream across two availableNow runs."""

from __future__ import annotations

import json
import os

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.corpus_ingest import (
    start_corpus_ingest,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and keeps running through "
    "the field of fresh green grass in the morning light of an autumn day"
)


def _write(feed, name, rows):
    os.makedirs(feed, exist_ok=True)
    tmp = os.path.join(feed, f".tmp-{name}")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, os.path.join(feed, f"{name}.json"))


def test_corpus_ingest_stream(spark, tmp_path):
    feed = str(tmp_path / "feed")
    store = ParquetTableStore(str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    _write(feed, "b1", [
        {"doc_id": 1, "ts": "2024-01-01 00:00:00", "text": GOOD, "lang": "en"},
        {"doc_id": 1, "ts": "2024-01-01 00:00:01", "text": GOOD, "lang": "en"},   # redelivery
        {"doc_id": 2, "ts": "2024-01-01 00:00:02", "text": GOOD + " two", "lang": "en"},
        {"doc_id": 3, "ts": "2024-01-01 00:00:03", "text": "x", "lang": "en"},    # low quality
        {"doc_id": 4, "ts": "2024-01-01 00:00:04", "text": GOOD, "lang": "en"},   # same content as 1
    ])
    q = start_corpus_ingest(spark, feed, store, ckpt, min_quality=0.5)
    q.awaitTermination(120)
    got = {r["doc_id"] for r in store.read(spark, "corpus").collect()}
    assert got == {1, 2}  # redelivery collapsed, low-quality dropped, dup content kept once

    # second stream run: more docs, one content-dup of an already-stored doc
    _write(feed, "b2", [
        {"doc_id": 5, "ts": "2024-01-01 00:10:00", "text": GOOD, "lang": "en"},   # dup of stored 1
        {"doc_id": 6, "ts": "2024-01-01 00:10:01", "text": GOOD + " six", "lang": "en"},
    ])
    q = start_corpus_ingest(spark, feed, store, ckpt, min_quality=0.5)
    q.awaitTermination(120)
    rows = store.read(spark, "corpus").collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 6}
    # upsert path kept the store partitioned (merge, not full rewrite)
    assert store.partition_spec("corpus") is not None

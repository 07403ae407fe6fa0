"""Stream-stream join (watermark-bounded attribution), streaming
redelivery dedup, and stream-static enrichment -- driven through live
file-source streams with availableNow triggers."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.joins import (
    dedup_stream,
    stream_static_enrich,
    stream_stream_join,
)


def _write(feed, name, rows):
    os.makedirs(feed, exist_ok=True)
    tmp = os.path.join(feed, f".tmp-{name}")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, os.path.join(feed, f"{name}.json"))


def test_stream_stream_join_within_window(spark, tmp_path):
    clicks_dir, buys_dir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    _write(clicks_dir, "c1", [
        {"user_id": 1, "l_ts": "2024-01-01 10:00:00", "click_id": 100},
        {"user_id": 2, "l_ts": "2024-01-01 10:05:00", "click_id": 200},
    ])
    _write(buys_dir, "b1", [
        # in-window purchase for user 1 (+20 min)
        {"user_id": 1, "r_ts": "2024-01-01 10:20:00", "buy_id": 900},
        # out-of-window for user 2 (+2 h)
        {"user_id": 2, "r_ts": "2024-01-01 12:05:00", "buy_id": 901},
        # before the click for user 1 -> excluded
        {"user_id": 1, "r_ts": "2024-01-01 09:59:00", "buy_id": 902},
    ])
    clicks = spark.readStream.schema("user_id long, l_ts timestamp, click_id long").json(clicks_dir)
    buys = spark.readStream.schema("user_id long, r_ts timestamp, buy_id long").json(buys_dir)
    joined = stream_stream_join(clicks, buys, "user_id", within="1 hour")
    got = []
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(
            (r["click_id"], r["buy_id"]) for r in b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [(100, 900)]


def test_dedup_stream_drops_redelivery(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write(feed, "b1", [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:01:00", "value": 2.0},
        {"event_id": 1, "ts": "2024-01-01 00:02:00", "value": 1.0},  # same batch dup
    ])
    stream = spark.readStream.schema("event_id long, ts timestamp, value double").json(feed)
    got = []
    q = (
        dedup_stream(stream, keys=("event_id",), watermark="30 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(r["event_id"] for r in b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [1, 2]

    # redelivery in a later batch, still inside the watermark horizon
    _write(feed, "b2", [
        {"event_id": 2, "ts": "2024-01-01 00:03:00", "value": 2.0},  # dup -> dropped
        {"event_id": 3, "ts": "2024-01-01 00:04:00", "value": 3.0},  # new
    ])
    got.clear()
    q = (
        dedup_stream(stream, keys=("event_id",), watermark="30 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(r["event_id"] for r in b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [3]


def test_stream_static_enrich_broadcast(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write(feed, "b1", [
        {"user_id": 1, "ts": "2024-01-01 00:00:00"},
        {"user_id": 2, "ts": "2024-01-01 00:01:00"},
        {"user_id": 9, "ts": "2024-01-01 00:02:00"},  # no dim row
    ])
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "user_id long, tier string")
    stream = spark.readStream.schema("user_id long, ts timestamp").json(feed)
    got = {}
    q = (
        stream_static_enrich(stream, dim, "user_id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.update(
            {r["user_id"]: r["tier"] for r in b.collect()}))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got == {1: "gold", 2: "silver", 9: None}

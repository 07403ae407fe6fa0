"""Event-time windowed aggregation: correctness as a batch expression
(same code path) and streaming with watermark-driven late-data drop."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.windows import (
    sliding_rates,
    tumbling_counts,
)


def test_tumbling_counts_batch_semantics(spark):
    rows = [
        ("2024-01-01 00:10:00", "click", 1.0),
        ("2024-01-01 00:50:00", "click", 2.0),
        ("2024-01-01 01:10:00", "click", 4.0),
        ("2024-01-01 01:20:00", "view", 8.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_counts(df, "1 hour").collect()
    }
    assert out[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert out[("2024-01-01 01:00:00", "click")] == (1, 4.0)
    assert out[("2024-01-01 01:00:00", "view")] == (1, 8.0)

    rates = sliding_rates(df, "1 hour", "30 minutes").collect()
    assert all(abs(r["events_per_second"] - r["n_events"] / 3600) < 1e-12 for r in rates)


def _write(feed, name, rows):
    os.makedirs(feed, exist_ok=True)
    tmp = os.path.join(feed, f".tmp-{name}")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, os.path.join(feed, f"{name}.json"))


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    feed = str(tmp_path / "feed")
    results: dict[tuple, tuple] = {}

    def sink(batch, bid):
        for r in batch.collect():
            results[(str(r["window_start"]), r["event_type"])] = (
                r["n_events"],
                r["total_value"],
            )

    # batch 1 advances event time far ahead; batch 2 delivers a row
    # >15min late relative to the max seen ts -> dropped by watermark
    _write(feed, "b1", [
        {"ts": "2024-01-01 02:00:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-01 02:59:00", "event_type": "click", "value": 2.0},
    ])
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").json(feed)
    agg = tumbling_counts(stream, "1 hour", watermark="15 minutes")
    q = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert results[("2024-01-01 02:00:00", "click")] == (2, 3.0)

    _write(feed, "b2", [
        {"ts": "2024-01-01 00:05:00", "event_type": "click", "value": 99.0},  # late
        {"ts": "2024-01-01 02:58:00", "event_type": "click", "value": 4.0},   # on time
    ])
    q = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # on-time row updated its window; the 00:00 window never appeared
    assert results[("2024-01-01 02:00:00", "click")] == (3, 7.0)
    assert ("2024-01-01 00:00:00", "click") not in results


def test_session_windows_batch_and_stream(spark, tmp_path):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.windows import (
        session_windows,
    )

    # batch semantics: two sessions for user 1 (65-min gap), one for user 2
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:20:00", 2.0),   # within 30min of previous -> same session
        (1, "2024-01-01 01:25:00", 4.0),   # 65min gap -> new session
        (2, "2024-01-01 00:00:00", 8.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"])
        for r in session_windows(df, gap="30 minutes").collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == (2, 3.0)
    assert got[(1, "2024-01-01 01:25:00")] == (1, 4.0)
    assert got[(2, "2024-01-01 00:00:00")] == (1, 8.0)

    # streaming: a session only emits once the watermark closes it
    feed = str(tmp_path / "sfeed")
    emitted = []

    def sink(batch, bid):
        emitted.extend(
            (r["user_id"], str(r["session_start"]), r["n_events"]) for r in batch.collect()
        )

    _write(feed, "s1", [
        {"user_id": 1, "ts": "2024-01-01 00:00:00", "value": 1.0},
        {"user_id": 1, "ts": "2024-01-01 00:10:00", "value": 2.0},
        # event time far ahead: watermark passes the first session's gap
        {"user_id": 9, "ts": "2024-01-01 06:00:00", "value": 0.0},
    ])
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").json(feed)
    agg = session_windows(stream, gap="30 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert (1, "2024-01-01 00:00:00", 2) in emitted          # closed session emitted
    assert not any(u == 9 for u, _, _ in emitted)            # open session still held

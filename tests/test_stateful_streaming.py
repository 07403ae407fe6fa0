"""applyInPandasWithState: per-user running totals accumulate across
micro-batches and survive via the state store."""

from __future__ import annotations

import json
import os

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.stateful import (
    running_user_totals,
)


def _write_batch(feed: str, name: str, rows: list[dict]) -> None:
    os.makedirs(feed, exist_ok=True)
    tmp = os.path.join(feed, f".tmp-{name}")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, os.path.join(feed, f"{name}.json"))


def test_running_totals_accumulate(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out = []

    _write_batch(feed, "b1", [
        {"user_id": 1, "value": 10.0},
        {"user_id": 1, "value": 5.0},
        {"user_id": 2, "value": 1.0},
    ])

    stream = spark.readStream.schema("user_id long, value double").json(feed)
    totals = running_user_totals(stream)

    def sink(batch, bid):
        out.append({(r["user_id"]): (r["n_events"], r["total_value"]) for r in batch.collect()})

    q = (
        totals.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert out[-1][1] == (2, 15.0)
    assert out[-1][2] == (1, 1.0)

    # second delivery: state must carry over across a new query run
    _write_batch(feed, "b2", [
        {"user_id": 1, "value": 2.5},
        {"user_id": 3, "value": 7.0},
    ])
    q = (
        totals.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = out[-1]
    assert final[1] == (3, 17.5)  # accumulated: 2 events + 1 new
    assert final[3] == (1, 7.0)
    assert 2 not in final  # untouched user not re-emitted in update mode


def test_first_seen_dedup_across_batches_and_restarts(spark, tmp_path):
    """transformWithStateInPandas dedup: the first row per key is
    emitted, later arrivals (same batch, later batch, or after a query
    RESTART on the same checkpoint) are dropped."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.stateful import (
        streaming_first_seen,
    )

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out = []

    _write_batch(feed, "b1", [
        {"content_fp": "A", "doc_id": 1},
        {"content_fp": "A", "doc_id": 2},   # same-batch dup
        {"content_fp": "B", "doc_id": 3},
    ])

    stream = spark.readStream.schema("content_fp string, doc_id long").json(feed)
    deduped = streaming_first_seen(stream, key_col="content_fp")

    def sink(batch, bid):
        out.append(sorted((r["content_fp"], r["doc_id"]) for r in batch.collect()))

    def run():
        q = (
            deduped.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    emitted = [p for batch in out for p in batch]
    assert ("B", 3) in emitted
    # exactly one A row survived, and it is the batch's first
    assert [p for p in emitted if p[0] == "A"] == [("A", 1)]

    # restart on the same checkpoint: A suppressed by restored state,
    # C is new
    _write_batch(feed, "b2", [
        {"content_fp": "A", "doc_id": 4},
        {"content_fp": "C", "doc_id": 5},
    ])
    out.clear()
    run()
    emitted = [p for batch in out for p in batch]
    assert emitted == [("C", 5)]


def test_first_seen_ttl_readmits_quiet_keys(spark, tmp_path):
    """With ttl_ms, a key quiet past the TTL is evicted from the state
    store and re-admits -- bounded state by wall clock."""
    import time as _time

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.stateful import (
        streaming_first_seen,
    )

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out = []

    _write_batch(feed, "b1", [{"content_fp": "A", "doc_id": 1}])
    stream = spark.readStream.schema("content_fp string, doc_id long").json(feed)
    deduped = streaming_first_seen(stream, key_col="content_fp", ttl_ms=500)

    def sink(batch, bid):
        out.append(sorted((r["content_fp"], r["doc_id"]) for r in batch.collect()))

    def run(expect_pair):
        # availableNow + ProcessingTimeTimeout keeps scheduling batches
        # to fire pending timers, so the query never self-terminates:
        # poll the sink for the expected PAIR, then stop explicitly.
        # Presence (not exact-sequence) is asserted because stopping a
        # query after its sink ran but before the batch committed makes
        # the restart REPLAY that batch -- foreachBatch is
        # at-least-once, so under load the earlier pair can lawfully
        # reappear; emission of the new pair is what proves the state
        # decision.
        q = (
            deduped.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        deadline = _time.time() + 90
        while (
            _time.time() < deadline
            and q.isActive
            and not any(expect_pair in b for b in out)
        ):
            _time.sleep(0.25)
        q.stop()
        q.awaitTermination(30)

    run(expect_pair=("A", 1))
    assert {p for b in out for p in b} == {("A", 1)}

    _time.sleep(2.0)  # >> ttl: the seen-marker must have expired
    _write_batch(feed, "b2", [{"content_fp": "A", "doc_id": 2}])
    out.clear()
    run(expect_pair=("A", 2))
    pairs = {p for b in out for p in b}
    assert ("A", 2) in pairs  # quiet key re-admitted after TTL
    assert pairs <= {("A", 1), ("A", 2)}  # at most a lawful b1 replay

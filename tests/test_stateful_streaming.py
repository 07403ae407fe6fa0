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

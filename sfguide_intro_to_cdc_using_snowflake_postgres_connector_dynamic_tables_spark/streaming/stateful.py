"""Custom stateful streaming operators (applyInPandasWithState).

The reference workload needs no user-defined streaming state (its
Dynamic Table semantics are snapshot-diff, SURVEY.md section 2.9), but
an engine that replaces it should expose the escape hatch for
operators Structured Streaming lacks natively.  The canonical example
here: per-key running totals maintained across micro-batches.

Scale shape: state is partitioned by the grouping key (one shuffle per
micro-batch, same key-partitioning reused), held in the state store
(RocksDB-backed on a real cluster), and processed in Arrow batches --
Python touches each key-group's delta only, never the accumulated
history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) -- each
    micro-batch emits the updated totals for the users it touched.

    Input: a *streaming* DataFrame with (user_id long, value double).
    """
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_first_seen(
    stream: DataFrame, key_col: str = "content_fp", ttl_ms: int | None = None
) -> DataFrame:
    """Exact streaming dedup with TTL-bounded state: emit each key's
    FIRST row only; later arrivals -- same micro-batch or any later
    one -- are dropped against a per-key seen-marker in the state
    store.

    ``ttl_ms`` bounds the state by WALL CLOCK via a processing-time
    timeout: a key quiet for the TTL is evicted and re-admits -- the
    retention form ``dropDuplicates`` cannot express (its state only
    grows) and ``dropDuplicatesWithinWatermark`` only approximates by
    event time.  State is one tinyint per live key, RocksDB-backed on
    a cluster; the shuffle is the groupBy's key partitioning, reused
    every batch.

    Implementation note: on Spark 4 this maps 1:1 onto
    ``transformWithStateInPandas`` with a TTL'd ``ValueState``
    (``handle.getValueState("seen", ..., ttlDurationMs=ttl_ms)``), but
    that API's control channel needs the ``protobuf`` package, which
    this runtime does not ship -- so the operator rides the stable
    ``applyInPandasWithState`` + ``ProcessingTimeTimeout`` form with
    identical semantics and state shape.

    TTL correctness detail: expiry is decided by the LAST-SEEN
    timestamp carried in the state, checked at invocation -- exactly
    how a TTL'd ValueState expires on read.  The processing-time timer
    only bounds state SIZE (eviction of quiet keys).  Deciding expiry
    by the timer callback alone would be wrong: a key whose first
    sighting after a quiet period lands in the very batch its timer
    would have fired in is invoked WITH data (``hasTimedOut`` false,
    timers never fire for keys that have batch data), so the row would
    be dropped against a marker that is already past its TTL.

    Upgrade note: the state schema is ``last_seen_ms long`` (was
    ``seen tinyint`` before r9) -- a query restarted on a checkpoint
    written by the old schema must start from a fresh checkpoint (or
    accept re-admitting its live keys once)."""
    import time as _time

    schema = stream.schema
    use_ttl = ttl_ms is not None

    def first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # quiet past the TTL: evict the marker (state-size bound);
            # re-admission does not depend on this firing
            state.remove()
            return
        now_ms = int(_time.time() * 1000)
        last_ms = state.get[0] if state.exists else None
        expired = use_ttl and last_ms is not None and now_ms - last_ms > ttl_ms
        if last_ms is None or expired:
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.head(1)
                    break
        else:
            for _ in pdfs:  # drain: duplicates are dropped
                pass
        state.update((now_ms,))
        if use_ttl:
            # (re)arm the eviction clock on every sighting
            state.setTimeoutDuration(ttl_ms)

    return stream.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=schema,
        stateStructType="last_seen_ms long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )

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

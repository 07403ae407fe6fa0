"""Property-based CDC apply semantics (SURVEY.md section 5.2 item 5).

A Python dict is the obviously-correct model of keyed latest-wins
apply; hypothesis drives randomized op sequences (I/U/D, duplicate
keys within a batch, deletes of absent keys) and the Spark
implementation must match the model after every batch.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.cdc_apply import (
    apply_changes,
)

# Fast-tier policy (r15): this whole module is a crash-injection /
# randomized-differential / end-to-end marathon -- the coverage the
# FULL suite owns.  The driver's budgeted run uses the default
# `-m "not slow"` tier (pytest.ini); run everything with `-m ""`.
pytestmark = pytest.mark.slow


SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)

ops = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=5),  # small key space -> collisions
        st.text(alphabet="abc", max_size=3),
    ),
    min_size=1,
    max_size=25,
)


@st.composite
def change_batches(draw):
    n_batches = draw(st.integers(min_value=1, max_value=3))
    lsn = 0
    batches = []
    for _ in range(n_batches):
        batch = []
        for op, k, v in draw(ops):
            lsn += 1
            batch.append((op, lsn, k, v if op != "D" else None))
        batches.append(batch)
    return batches


def model_apply(state: dict, batch: list[tuple]) -> dict:
    # latest lsn wins per key; 'D' removes
    winners: dict[int, tuple] = {}
    for op, lsn, k, v in batch:
        if k not in winners or lsn > winners[k][1]:
            winners[k] = (op, lsn, v)
    out = dict(state)
    for k, (op, _lsn, v) in winners.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = v
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(change_batches())
def test_apply_matches_model(spark, batches):
    state: dict[int, str] = {}
    current = None
    for batch in batches:
        df = spark.createDataFrame(batch, SCHEMA)
        current = apply_changes(current, df, "k")
        state = model_apply(state, batch)
        got = {r["k"]: r["v"] for r in current.collect()}
        assert got == state

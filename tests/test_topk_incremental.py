"""Incremental top-k maintenance vs the full-recompute oracle.

The hypothesis drive applies random I/U/D batches (including
cross-group moves and delete storms) to a model fact table; after
every batch the maintained view must equal top-k recomputed from
scratch, and refills must fire only when a saturated group drains
below k.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.topk_incremental import (
    apply_topk_delta,
    init_topk,
    topk,
)

K = 3
SCHEMA = "id long, grp string, score long"
DELTA_SCHEMA = "id long, grp string, score long, op string, lsn long"


def _oracle_topk(rows: dict[int, tuple[str, int]]) -> set[tuple[str, int, int]]:
    by_group: dict[str, list[tuple[int, int]]] = {}
    for rid, (g, s) in rows.items():
        by_group.setdefault(g, []).append((rid, s))
    out = set()
    for g, members in by_group.items():
        best = sorted(members, key=lambda t: (-t[1], t[0]))[:K]
        out.update((g, rid, s) for rid, s in best)
    return out


def _spark_view(spark, state) -> set[tuple[str, int, int]]:
    return {
        (r["grp"], r["id"], r["score"])
        for r in topk(state, "grp", "id", "score", K).collect()
    }


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 25),  # id
                st.sampled_from(["a", "b", "c"]),  # group
                st.integers(0, 100),  # score
                st.sampled_from(["I", "U", "D", "D", "D"]),  # delete-heavy
            ),
            min_size=1,
            max_size=15,
        ),
        min_size=1,
        max_size=3,
    )
)
@pytest.mark.slow  # fast-tier policy (r15): randomized/soak marathon
def test_incremental_topk_equals_recompute(spark, batches):
    model: dict[int, tuple[str, int]] = {i: ("a" if i % 2 else "b", i * 3 % 47) for i in range(12)}
    fact = spark.createDataFrame([(i, g, s) for i, (g, s) in model.items()], SCHEMA)
    state = init_topk(fact, "grp", "id", "score", K)
    assert _spark_view(spark, state) == _oracle_topk(model)

    lsn = 0
    for batch in batches:
        rows = []
        for rid, g, s, op in batch:
            lsn += 1
            if op == "D":
                model.pop(rid, None)
                rows.append((rid, g, s, "D", lsn))
            else:
                model[rid] = (g, s)
                rows.append((rid, g, s, op, lsn))
        delta = spark.createDataFrame(rows, DELTA_SCHEMA)
        fact = spark.createDataFrame(
            [(i, g, s) for i, (g, s) in model.items()] or [(None, None, None)],
            SCHEMA,
        ).filter(F.col("id").isNotNull())
        state, _n_refill = apply_topk_delta(
            state, delta, fact, "grp", "id", "score", K
        )
        assert _spark_view(spark, state) == _oracle_topk(model)


def test_no_refill_on_insert_only_ticks(spark):
    fact = spark.createDataFrame([(i, "g", i) for i in range(20)], SCHEMA)
    state = init_topk(fact, "grp", "id", "score", K)
    delta = spark.createDataFrame([(100, "g", 99, "I", 1)], DELTA_SCHEMA)
    fact2 = fact.unionByName(spark.createDataFrame([(100, "g", 99)], SCHEMA))
    state, n_refill = apply_topk_delta(state, delta, fact2, "grp", "id", "score", K)
    assert n_refill == 0
    assert (100, 99) in {(r["id"], r["score"]) for r in topk(state, "grp", "id", "score", K).collect()}


def test_refill_fires_on_delete_storm(spark):
    # 20 rows, buffer B=6 is saturated; delete the top 5 -> buffer
    # falls below k -> exactly one group refills and the view is right
    fact = spark.createDataFrame([(i, "g", i) for i in range(20)], SCHEMA)
    state = init_topk(fact, "grp", "id", "score", K)
    doomed = [19, 18, 17, 16, 15]
    delta = spark.createDataFrame(
        [(i, "g", i, "D", j + 1) for j, i in enumerate(doomed)], DELTA_SCHEMA
    )
    fact2 = fact.filter(~F.col("id").isin(doomed))
    state, n_refill = apply_topk_delta(state, delta, fact2, "grp", "id", "score", K)
    assert n_refill == 1
    got = {(r["id"], r["score"]) for r in topk(state, "grp", "id", "score", K).collect()}
    assert got == {(14, 14), (13, 13), (12, 12)}


def test_manager_topk_view_end_to_end(spark, tmp_path):
    """Registry-level top-k view: init from the store's fact table,
    fold envelope deltas, state persisted across refreshes; view equals
    recompute after every tick."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.dynamic_table import (
        DynamicTableManager,
    )
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
        ParquetTableStore,
    )

    store = ParquetTableStore(str(tmp_path / "s"))
    model = {i: ("a" if i % 3 else "b", (i * 7) % 31) for i in range(15)}
    store.overwrite(
        "scores",
        spark.createDataFrame([(i, g, s) for i, (g, s) in model.items()], SCHEMA),
    )
    mgr = DynamicTableManager(spark, store)
    mgr.create_topk("best", "scores", "grp", "id", "score", k=K)
    got = {(r["grp"], r["id"], r["score"]) for r in mgr.read("best").collect()}
    assert got == _oracle_topk(model)

    def tick(batch):
        store.overwrite(
            "scores",
            spark.createDataFrame([(i, g, s) for i, (g, s) in model.items()], SCHEMA),
        )
        mgr.topk_refresh("best", {"scores": spark.createDataFrame(batch, DELTA_SCHEMA)})
        got_now = {
            (r["grp"], r["id"], r["score"]) for r in mgr.read("best").collect()
        }
        assert got_now == _oracle_topk(model)

    # tick 1: an insert + a cross-group move
    batch1 = [(20, "a", 99, "I", 1), (3, "b", 50, "U", 2)]
    for rid, g, s, op, _ in batch1:
        model[rid] = (g, s)
    tick(batch1)

    # tick 2: delete storm on group a's top rows (forces a refill)
    tops_a = sorted(
        (rid for rid, (g, _s) in model.items() if g == "a"),
        key=lambda rid: (-model[rid][1], rid),
    )[:4]
    batch2 = [(rid, "a", 0, "D", 10 + j) for j, rid in enumerate(tops_a)]
    for rid in tops_a:
        model.pop(rid)
    tick(batch2)

"""Crash injections inside the top-k view's multi-table state commit
(round-13 follow-up to the chained-refresh exactly-once work).

``topk_refresh`` commits FOUR tables per tick (sat raise-only, buffer,
exact sat, view).  The invariant every committed prefix must satisfy:
``saturated=false`` for a group implies its buffer is COMPLETE --
otherwise a later delete-drain skips the refill and silently serves an
incomplete top-k, unrepairable by retries.  The pre-fix ordering
(buffer before sat) violated it: a crash between the trimmed-buffer
commit and the sat commit left a discarded-candidates buffer with
``saturated=false`` on disk.

Each test crashes at one commit point, blind-retries the whole tick
(what a restarted driver does), then fires a delete storm that drains
the group below k -- the view must equal the full recompute after
every tick.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.cdc_apply import (
    apply_changes,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.dynamic_table import (
    DynamicTableManager,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)

# Fast-tier policy (r15): this whole module is a crash-injection /
# randomized-differential / end-to-end marathon -- the coverage the
# FULL suite owns.  The driver's budgeted run uses the default
# `-m "not slow"` tier (pytest.ini); run everything with `-m ""`.
pytestmark = pytest.mark.slow


K = 2
FACT = "id long, grp string, score long"
DELTA = "op string, lsn long, id long, grp string, score long"


class _Boom(RuntimeError):
    pass


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def _oracle(spark, store):
    from pyspark.sql import Window

    fact = store.read(spark, "fact")
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        fact.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= K)
        .drop("__rk")
    )


@pytest.fixture()
def topk_setup(spark, tmp_path):
    store = ParquetTableStore(str(tmp_path / "s"))
    # group 'a' starts with exactly B = K*2 = 4 rows (unsaturated,
    # buffer complete); group 'b' is background
    rows = [(i, "a", 10 + i) for i in range(4)] + [(100 + i, "b", i) for i in range(3)]
    store.overwrite("fact", spark.createDataFrame(rows, FACT))
    mgr = DynamicTableManager(spark, store)
    mgr.create_topk(
        "best", fact_table="fact", group_col="grp", id_col="id",
        order_col="score", k=K, buffer_factor=2,
    )
    return store, mgr


def _apply(spark, store, rows):
    delta = spark.createDataFrame(rows, DELTA)
    store.overwrite("fact", apply_changes(store.read(spark, "fact"), delta, "id"))
    return delta


def _crash_at(monkeypatch, store, n):
    """Raise on the n-th store.overwrite call (1-based), pass through
    before it."""
    real = store.overwrite
    calls = {"k": 0}

    def wrapped(name, df, *a, **kw):
        calls["k"] += 1
        if calls["k"] == n:
            raise _Boom(f"crash at state-commit step {n} ({name})")
        return real(name, df, *a, **kw)

    monkeypatch.setattr(store, "overwrite", wrapped)


#: commit order inside topk_refresh: 1=sat raise, 2=buffer,
#: 3=exact sat, 4=view
@pytest.mark.parametrize("crash_step", [1, 2, 3, 4])
def test_trim_tick_crash_then_retry_then_drain(spark, topk_setup, crash_step, monkeypatch):
    store, mgr = topk_setup

    # tick 1: inserts push group 'a' past B -> the buffer TRIMS
    # (discards candidates) and sat must flip true
    delta1 = _apply(
        spark, store,
        [("I", 10 + j, 10 + j, "a", 50 + j) for j in range(3)],
    )
    _crash_at(monkeypatch, store, crash_step)
    with pytest.raises(_Boom):
        mgr.topk_refresh("best", {"fact": delta1})
    monkeypatch.undo()

    # blind full-tick retry
    mgr.topk_refresh("best", {"fact": delta1})
    assert _rows(mgr.read("best")) == _rows(_oracle(spark, store))

    # the killer tick: delete storm drains 'a' below k -- only a
    # correct saturation flag triggers the refill that keeps the view
    # equal to the recompute
    live = [r["id"] for r in store.read(spark, "fact").filter(F.col("grp") == "a")
            .orderBy(F.desc("score")).collect()]
    delta2 = _apply(
        spark, store,
        [("D", 100 + i, rid, None, None) for i, rid in enumerate(live[: len(live) - 1])],
    )
    mgr.topk_refresh("best", {"fact": delta2})
    assert _rows(mgr.read("best")) == _rows(_oracle(spark, store))


@pytest.mark.parametrize("crash_step", [1, 2, 3, 4])
def test_refill_tick_crash_then_retry(spark, topk_setup, crash_step, monkeypatch):
    store, mgr = topk_setup

    # saturate 'a' first (clean tick)
    delta1 = _apply(
        spark, store,
        [("I", 10 + j, 10 + j, "a", 50 + j) for j in range(3)],
    )
    mgr.topk_refresh("best", {"fact": delta1})

    # refill tick: drain 'a' below k; crash mid-commit; retry; the
    # sat true->false lowering must never commit ahead of the refilled
    # buffer
    live = [r["id"] for r in store.read(spark, "fact").filter(F.col("grp") == "a")
            .orderBy(F.desc("score")).collect()]
    delta2 = _apply(
        spark, store,
        [("D", 200 + i, rid, None, None) for i, rid in enumerate(live[: len(live) - 1])],
    )
    _crash_at(monkeypatch, store, crash_step)
    with pytest.raises(_Boom):
        mgr.topk_refresh("best", {"fact": delta2})
    monkeypatch.undo()

    mgr.topk_refresh("best", {"fact": delta2})
    assert _rows(mgr.read("best")) == _rows(_oracle(spark, store))

    # and a further mutation still flows correctly
    delta3 = _apply(spark, store, [("I", 300, 300, "a", 999)])
    mgr.topk_refresh("best", {"fact": delta3})
    assert _rows(mgr.read("best")) == _rows(_oracle(spark, store))

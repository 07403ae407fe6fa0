"""Restart-mid-refresh crash recovery for the Dynamic Table path
(SURVEY.md section 7.4 risk; VERDICT r12 item 6).

``incremental_refresh`` is a read-recompute-MERGE sequence; a process
death at ANY point between the delta-join (recompute) and the merge
commit must leave the materialization either at the old version or at
the new one -- never in between -- and a blind retry of the SAME
refresh must land exactly-once: no duplicated view rows, no lost
deltas, byte-equal to the full-recompute oracle.

Exactly-once here comes from two properties pinned separately below:

- atomicity: readers see the pre-crash view until the version-pointer
  swap (the single commit point), for every injected crash site;
- idempotence: the refresh recomputes affected rows FROM THE BASE
  TABLES (not by folding the delta additively), so re-running it after
  a post-commit crash rewrites the same rows instead of double-adding.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.cdc_apply import (
    apply_changes,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.dynamic_table import (
    DynamicTable,
    DynamicTableManager,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)

TX = "op string, lsn long, t_id long, c_id long, amount double"


def _view(t):
    return (
        t["tx"]
        .groupBy("c_id")
        .agg(
            F.sum("amount").alias("total"),
            F.count(F.lit(1)).alias("n_tx"),
        )
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(round(v, 6)) if isinstance(v, float) else str(v) for v in r)
        for r in df.select(*cols).collect()
    )


def _full(spark, store):
    return _view({"tx": store.read(spark, "tx")})


@pytest.fixture(params=[4, 0], ids=["partitioned-merge", "overwrite"])
def setup(spark, tmp_path, request):
    """Both materialization write paths: partitioned (bucket-pruned
    store.merge) and unpartitioned (read-anti-join-overwrite)."""
    store = ParquetTableStore(str(tmp_path / "s"))
    tx = spark.createDataFrame(
        [(t, t % 7, float(t)) for t in range(1, 61)],
        "t_id long, c_id long, amount double",
    )
    store.overwrite("tx", tx)
    mgr = DynamicTableManager(spark, store)
    mgr.create(
        DynamicTable(
            name="spend",
            defining_fn=_view,
            fact_table="tx",
            fact_key="t_id",
            view_key="c_id",
            group_col="c_id",
            partition_buckets=request.param or None,
        )
    )
    return store, mgr


def _apply_delta(spark, store, rows):
    delta = spark.createDataFrame(rows, TX)
    store.overwrite("tx", apply_changes(store.read(spark, "tx"), delta, "t_id"))
    return delta


#: crash sites, ordered along the refresh: (id, how to arm the bomb)
CRASH_SITES = ["before_write", "mid_commit", "after_commit"]


class _Boom(RuntimeError):
    pass


def _arm(monkeypatch, store, mgr, site):
    """Install a one-shot failure at the given point of the refresh."""
    if site == "before_write":
        # between the delta-join/recompute and any store mutation
        def bomb(*a, **k):
            raise _Boom("crash before the merge write")

        monkeypatch.setattr(store, "merge", bomb)
        monkeypatch.setattr(store, "overwrite", bomb)
    elif site == "mid_commit":
        # staged data (and manifest) fully written; death right before
        # the version-pointer swap -- the single commit point
        # (monkeypatch.undo() restores the real _commit for the retry)
        def bomb(name, version):
            raise _Boom(f"crash before pointer swap of {name} v{version}")

        monkeypatch.setattr(store, "_commit", bomb)
    elif site == "after_commit":
        # merge committed; death before the refresh is reported done
        def bomb(*a, **k):
            raise _Boom("crash after commit, before refresh log")

        monkeypatch.setattr(mgr, "_log_refresh", bomb)
    else:  # pragma: no cover
        raise AssertionError(site)


@pytest.mark.parametrize("site", CRASH_SITES)
def test_crash_then_retry_is_exactly_once(spark, setup, site, monkeypatch):
    store, mgr = setup
    before = _rows(mgr.read("spend"))

    # delta: insert into a group, update that MOVES a row between
    # groups, delete that empties nothing (group keeps other rows)
    delta = _apply_delta(
        spark,
        store,
        [
            ("I", 101, 200, 3, 40.0),
            ("U", 102, 5, 6, 5.0),   # c_id 5%7=5 -> 6: two groups touched
            ("D", 103, 9, None, None),
        ],
    )

    _arm(monkeypatch, store, mgr, site)
    with pytest.raises(_Boom):
        mgr.incremental_refresh("spend", {"tx": delta})
    monkeypatch.undo()

    if site in ("before_write", "mid_commit"):
        # atomicity: the crashed refresh is invisible to readers
        assert _rows(mgr.read("spend")) == before
    else:
        # commit already happened; the view is ALREADY correct
        assert _rows(mgr.read("spend")) == _rows(_full(spark, store))

    # blind retry of the same refresh (what a restarted driver does)
    mgr.incremental_refresh("spend", {"tx": delta})
    got = _rows(mgr.read("spend"))
    assert got == _rows(_full(spark, store))
    # exactly-once: one row per group, no duplicate view keys
    n = mgr.read("spend").count()
    assert n == mgr.read("spend").select("c_id").distinct().count()

    # and the NEXT delta flows through the recovered table normally
    delta2 = _apply_delta(spark, store, [("I", 104, 201, 0, 7.5)])
    mgr.incremental_refresh("spend", {"tx": delta2})
    assert _rows(mgr.read("spend")) == _rows(_full(spark, store))


def test_mid_commit_orphan_does_not_leak_into_reads(spark, setup, monkeypatch):
    """After a pointer-swap crash, the orphaned staged files/manifest
    of the never-committed version must not be readable -- and the
    retried refresh must commit OVER them cleanly."""
    store, mgr = setup
    v0 = store.current_version("spend")
    delta = _apply_delta(spark, store, [("I", 110, 300, 2, 11.0)])

    _arm(monkeypatch, store, mgr, "mid_commit")
    with pytest.raises(_Boom):
        mgr.incremental_refresh("spend", {"tx": delta})
    monkeypatch.undo()

    # version pointer still at v0: the staged write never committed
    assert store.current_version("spend") == v0

    mgr.incremental_refresh("spend", {"tx": delta})
    assert store.current_version("spend") == v0 + 1
    assert _rows(mgr.read("spend")) == _rows(_full(spark, store))

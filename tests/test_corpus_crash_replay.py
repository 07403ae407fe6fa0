"""Crash-replay safety of the corpus front door's multi-table commit
(round-13 crash-injection sweep; sibling of
tests/test_media_crash_replay.py -- the corpus ingest had the same
hole: batch docs permanently invisible to the near-dup/semantic walls
after a crash between the fp "batch done" merge and the index
appends).

Fixed order inside ``ingest_batch``: index appends first (bucket-
pruned dedupe makes replay re-appends no-ops; the probe filters
exclude batch ids so a replayed batch never matches its own stored
rows), table merge, fp merge last as the batch-done marker; the
bootstrap lands the main table after its companions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.corpus_ingest import (
    ingest_batch,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)

# Fast-tier policy (r15): this whole module is a crash-injection /
# randomized-differential / end-to-end marathon -- the coverage the
# FULL suite owns.  The driver's budgeted run uses the default
# `-m "not slow"` tier (pytest.ini); run everything with `-m ""`.
pytestmark = pytest.mark.slow


BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
)
OTHER = (
    "one two three four five six seven eight nine ten eleven "
    "twelve thirteen fourteen fifteen sixteen seventeen eighteen "
    "nineteen twenty twentyone twentytwo"
)


class _Boom(RuntimeError):
    pass


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _ids(spark, store):
    return {r["doc_id"] for r in store.read(spark, "corpus").collect()}


def _crash_nth(monkeypatch, store, method, n):
    real = getattr(store, method)
    calls = {"k": 0}

    def wrapped(*a, **kw):
        calls["k"] += 1
        if calls["k"] == n:
            raise _Boom(f"crash at {method} #{n}")
        return real(*a, **kw)

    monkeypatch.setattr(store, method, wrapped)


#: normal-path write order: append(bands) #1, merge(table) #1,
#: merge(fp) #2
@pytest.mark.parametrize(
    "method,n", [("append", 1), ("merge", 1), ("merge", 2)]
)
def test_near_dup_wall_survives_crash_replay(spark, tmp_path, method, n, monkeypatch):
    store = ParquetTableStore(str(tmp_path / "s"))
    ingest_batch(
        store, spark, _docs(spark, [(1, OTHER, "en")]),
        min_quality=0.0, near_dup=True, near_threshold=0.7,
    )

    b2 = _docs(spark, [(2, BASE, "en")])
    _crash_nth(monkeypatch, store, method, n)
    with pytest.raises(_Boom):
        ingest_batch(
            store, spark, b2, min_quality=0.0, near_dup=True, near_threshold=0.7
        )
    monkeypatch.undo()

    # stream replay: the batch must land whole (a replayed doc must
    # NOT match its own crashed-attempt index rows)
    ingest_batch(
        store, spark, b2, min_quality=0.0, near_dup=True, near_threshold=0.7
    )
    assert _ids(spark, store) == {1, 2}

    # the wall: a paraphrase of the crashed batch's doc is rejected
    # (the pre-fix symptom: doc 2 permanently unindexed, 9 sailed in)
    ingest_batch(
        store, spark,
        _docs(spark, [(9, BASE.replace("zeta", "ZETA9"), "en")]),
        min_quality=0.0, near_dup=True, near_threshold=0.7,
    )
    assert _ids(spark, store) == {1, 2}

    # index row-distinct despite the replay
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.corpus_ingest import (
        bands_table_name,
    )

    idx = store.read(spark, bands_table_name("corpus", 6, 2, False))
    assert idx.count() == idx.distinct().count()


@pytest.mark.parametrize("method,n", [("append", 1), ("merge", 2)])
def test_semantic_wall_survives_crash_replay(spark, tmp_path, method, n, monkeypatch):
    store = ParquetTableStore(str(tmp_path / "s"))
    ingest_batch(
        store, spark, _docs(spark, [(1, BASE, "en"), (2, OTHER, "en")]),
        min_quality=0.0, semantic=True, sem_threshold=0.95,
    )

    third = "red green blue cyan magenta yellow black white grey pink " * 3
    b2 = _docs(spark, [(3, third, "en")])
    _crash_nth(monkeypatch, store, method, n)
    with pytest.raises(_Boom):
        ingest_batch(
            store, spark, b2, min_quality=0.0, semantic=True, sem_threshold=0.95
        )
    monkeypatch.undo()

    ingest_batch(
        store, spark, b2, min_quality=0.0, semantic=True, sem_threshold=0.95
    )
    assert _ids(spark, store) == {1, 2, 3}

    # a DOUBLED copy of doc 3 (different text, same count-vector
    # direction -> cosine 1.0) must be rejected by the semantic wall
    ingest_batch(
        store, spark, _docs(spark, [(9, third + " " + third, "en")]),
        min_quality=0.0, semantic=True, sem_threshold=0.95,
    )
    assert _ids(spark, store) == {1, 2, 3}


@pytest.mark.parametrize("n", [1, 2, 3])
def test_bootstrap_crash_then_replay_recovers(spark, tmp_path, n, monkeypatch):
    """Crash after the n-th bootstrap overwrite (fp, bands -- the main
    table lands after its companions); the replay must re-enter the
    bootstrap (or self-heal through the backfills) and the walls must
    hold afterwards."""
    store = ParquetTableStore(str(tmp_path / "s"))
    b1 = _docs(spark, [(1, BASE, "en"), (2, OTHER, "en")])
    _crash_nth(monkeypatch, store, "overwrite", n)
    with pytest.raises(_Boom):
        ingest_batch(
            store, spark, b1, min_quality=0.0, near_dup=True, near_threshold=0.7
        )
    monkeypatch.undo()

    ingest_batch(
        store, spark, b1, min_quality=0.0, near_dup=True, near_threshold=0.7
    )
    assert _ids(spark, store) == {1, 2}

    ingest_batch(
        store, spark,
        _docs(spark, [(9, BASE.replace("zeta", "ZETA9"), "en")]),
        min_quality=0.0, near_dup=True, near_threshold=0.7,
    )
    assert _ids(spark, store) == {1, 2}

"""Crash-replay holes in the media front door's multi-table commit
(round-13 crash-injection sweep, third find after the chained-DAG and
top-k windows).

The stream replays a whole micro-batch after any mid-batch death, so
the commit order inside ``ingest_media_batch`` decides whether the
replay converges:

- pre-fix NORMAL path (table, fp, then index): a crash after the fp
  merge made the replay's exact tier see every row as already-seen --
  the index rows were never appended and those media were PERMANENTLY
  invisible to the perceptual tier (later near-dups sailed through);
- pre-fix BOOTSTRAP (table first): a crash before the fp write left
  the replay on the normal path with no fp index -- a hard error on
  every retry (pipeline bricked).

Fixed order: bootstrap writes the main table LAST (it is the branch
marker); the normal path appends the index FIRST (deduped against the
stored buckets, so re-appends are no-ops), merges media, and lands
the fp merge LAST as the batch-done marker; the probe skips
self-matches so a replayed batch's own indexed hashes don't flag it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_ppm,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.media_ingest import (
    ingest_media_batch,
    media_fp_table,
    phash_index_table,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)

# Fast-tier policy (r15): this whole module is a crash-injection /
# randomized-differential / end-to-end marathon -- the coverage the
# FULL suite owns.  The driver's budgeted run uses the default
# `-m "not slow"` tier (pytest.ini); run everything with `-m ""`.
pytestmark = pytest.mark.slow



class _Boom(RuntimeError):
    pass


def _img(seed: int, size: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def _noised(a: np.ndarray) -> np.ndarray:
    b = a.copy()
    b[::9, ::9] = ((b[::9, ::9].astype(int) + 5) % 256).astype(np.uint8)
    return b


def _media_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [r[0] for r in rows],
                "media_type": "image",
                "payload": [bytearray(encode_ppm(r[1])) for r in rows],
                "meta": None,
            }
        ),
        MEDIA_SCHEMA,
    )


def _ids(spark, store):
    return {
        r["media_id"]
        for r in store.read(spark, "media").select("media_id").collect()
    }


def _crash_nth(monkeypatch, store, method, n):
    real = getattr(store, method)
    calls = {"k": 0}

    def wrapped(*a, **kw):
        calls["k"] += 1
        if calls["k"] == n:
            raise _Boom(f"crash at {method} #{n}")
        return real(*a, **kw)

    monkeypatch.setattr(store, method, wrapped)


@pytest.mark.parametrize("crash_method,n", [("append", 1), ("merge", 1), ("merge", 2)])
def test_normal_path_crash_then_replay_keeps_perceptual_wall(
    spark, tmp_path, crash_method, n, monkeypatch
):
    """Crash at each normal-path commit (index append, media merge,
    fp merge), replay the batch, then send a near-dup of a crashed-
    batch image: the perceptual tier must still catch it -- the exact
    symptom of the pre-fix hole was this dup slipping through."""
    store = ParquetTableStore(str(tmp_path / "s"))
    base = _img(7)
    ingest_media_batch(store, spark, _media_df(spark, [(1, _img(1))]))

    batch2 = _media_df(spark, [(2, base), (3, _img(3))])
    _crash_nth(monkeypatch, store, crash_method, n)
    with pytest.raises(_Boom):
        ingest_media_batch(store, spark, batch2)
    monkeypatch.undo()

    # stream replay of the same batch
    ingest_media_batch(store, spark, batch2)
    assert _ids(spark, store) == {1, 2, 3}

    # the wall: a perceptual near-dup of the crashed batch's image
    # must be rejected (pre-fix, after a post-fp crash, id 2 was
    # unindexed and 10 sailed through)
    ingest_media_batch(store, spark, _media_df(spark, [(10, _noised(base))]))
    assert _ids(spark, store) == {1, 2, 3}

    # index stays row-distinct despite the replay re-append
    idx = store.read(spark, phash_index_table("media", 8))
    assert idx.count() == idx.distinct().count()
    # and the batch-done marker holds every fp exactly once
    fp = store.read(spark, media_fp_table("media"))
    assert fp.count() == fp.select("content_fp").distinct().count() == 3


@pytest.mark.parametrize("n", [1, 2])
def test_bootstrap_crash_then_replay_recovers(spark, tmp_path, n, monkeypatch):
    """Crash after the n-th bootstrap overwrite (fp, idx -- the table
    lands last), replay: the batch must land whole and later dups must
    be caught.  Pre-fix (table first), the replay hit the normal path
    with no fp index and errored on every retry."""
    store = ParquetTableStore(str(tmp_path / "s"))
    base = _img(11)
    batch = _media_df(spark, [(1, base), (2, _img(2))])
    _crash_nth(monkeypatch, store, "overwrite", n)
    with pytest.raises(_Boom):
        ingest_media_batch(store, spark, batch)
    monkeypatch.undo()

    ingest_media_batch(store, spark, batch)
    assert _ids(spark, store) == {1, 2}

    ingest_media_batch(
        spark=spark, store=store,
        batch=_media_df(spark, [(10, _noised(base)), (11, _img(40))]),
    )
    assert _ids(spark, store) == {1, 2, 11}


def test_legacy_partial_bootstrap_backfills_fp(spark, tmp_path):
    """A pre-fix store that crashed between the old bootstrap's table
    and fp writes (main table exists, fp index missing) must be
    repaired on the next batch, not error forever."""
    store = ParquetTableStore(str(tmp_path / "s"))
    base = _img(21)
    ingest_media_batch(store, spark, _media_df(spark, [(1, base)]))
    # simulate the legacy state: drop the fp index
    import shutil

    shutil.rmtree(store._table_dir(media_fp_table("media")))
    assert not store.exists(media_fp_table("media"))

    # next batch rebuilds fp from the main table; the EXACT tier then
    # still rejects a byte-identical copy of a stored payload
    ingest_media_batch(
        store, spark, _media_df(spark, [(5, base), (6, _img(6))])
    )
    assert _ids(spark, store) == {1, 6}

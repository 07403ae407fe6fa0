"""Incremental benchmark decontamination over persisted gram indexes.

The batch operator's blind spot under increments is RETROACTIVE
contamination: a test-split doc arriving at batch k contaminates train
docs stored at batches < k.  ``decontaminate_incremental`` must cover
all three directions -- batch-internal, train-after-test, and
test-after-train (retro) -- and its cumulative flagged set over any
increment sequence must equal the full-recompute
``decontaminate(all).filter(n_shared > 0)`` set.
"""

from __future__ import annotations

import pytest

import random

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.corpus import (
    assign_split,
    decontaminate,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.corpus_ingest import (
    decontaminate_incremental,
    benchmark_grams_table_name,
    train_grams_table_name,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)

N = 3  # gram length under test (docs stay short)


def _split_map(spark, upto: int = 400, salt: str = "") -> dict[int, str]:
    df = spark.createDataFrame([(i,) for i in range(upto)], ["doc_id"])
    return {
        r["doc_id"]: r["split"]
        for r in assign_split(df, salt=salt).collect()
    }


def _doc(i: int, phrase: str | None = None) -> tuple[int, str]:
    base = " ".join(f"w{i}x{j}" for j in range(6))
    return (i, base + (f" {phrase}" if phrase else ""))


def _flagged_full(spark, docs, salt: str = "") -> set[int]:
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        r["doc_id"]
        for r in decontaminate(df, n=N, salt=salt).collect()
        if r["n_shared"] > 0
    }


def _drive(spark, tmp_path, batches, salt: str = ""):
    """Bootstrap on batch 1 (batch operator + store write), then run
    every later batch through the incremental API; returns
    (cumulative flagged ids, origins seen)."""
    store = ParquetTableStore(str(tmp_path / "store"))
    b1 = spark.createDataFrame(batches[0], ["doc_id", "text"])
    store.overwrite("corpus", b1, partition_key="doc_id", n_buckets=8)
    cumulative = {
        r["doc_id"]
        for r in decontaminate(b1, n=N, salt=salt).collect()
        if r["n_shared"] > 0
    }
    origins: set[str] = set()
    for batch in batches[1:]:
        flagged = decontaminate_incremental(
            store,
            spark,
            "corpus",
            spark.createDataFrame(batch, ["doc_id", "text"]),
            n=N,
            n_buckets=8,
            salt=salt,
        ).collect()
        cumulative |= {r["doc_id"] for r in flagged}
        origins |= {r["origin"] for r in flagged}
    return store, cumulative, origins


def test_all_three_directions_and_differential(spark, tmp_path):
    sm = _split_map(spark)
    trains = [i for i in range(400) if sm[i] == "train"]
    tests = [i for i in range(400) if sm[i] == "test"]

    ph = [f"pa{g} pb{g} pc{g}" for g in range(5)]
    batches = [
        # batch 1: a contaminated pair INSIDE the bootstrap batch
        # (flagged by the batch operator), a train doc whose test
        # partner arrives later (retro), and background docs
        [
            _doc(trains[0], ph[0]),
            _doc(tests[0], ph[0]),
            _doc(trains[1], ph[1]),  # retro victim, flagged at batch 3
            _doc(trains[2]),
            _doc(tests[1]),
        ],
        # batch 2: batch-internal pair + a train doc hitting a STORED
        # test gram (forward direction) + clean noise
        [
            _doc(trains[3], ph[2]),
            _doc(tests[2], ph[2]),
            _doc(trains[4], ph[0]),  # shares ph[0] with stored test doc
            _doc(trains[5]),
        ],
        # batch 3: the retro test doc + a clean train doc
        [
            _doc(tests[3], ph[1]),  # retro-contaminates trains[1]
            _doc(trains[6]),
        ],
    ]
    store, cumulative, origins = _drive(spark, tmp_path, batches)
    all_docs = [d for b in batches for d in b]
    assert cumulative == _flagged_full(spark, all_docs)
    assert cumulative >= {trains[0], trains[1], trains[3], trains[4]}
    assert trains[2] not in cumulative and trains[6] not in cumulative
    # both incremental directions actually fired
    assert origins == {"batch", "stored"}
    # indexes persisted for the next increment
    assert store.exists(benchmark_grams_table_name("corpus", N))
    assert store.exists(train_grams_table_name("corpus", N))


def test_salted_increments_match_salted_full_recompute(spark, tmp_path):
    """Re-split epoch salt threads end-to-end: the incremental API run
    under a salt must match the batch recompute under the SAME salt
    (i.e. increments classify docs by the salted split, never the
    default one), and the salted run uses epoch-tagged index tables."""
    salt = "epoch2"
    rng = random.Random(23)
    ph = [f"sa{g} sb{g} sc{g}" for g in range(8)]
    docs = [
        _doc(i, ph[rng.randrange(8)] if rng.random() < 0.45 else None)
        for i in range(100)
    ]
    rng.shuffle(docs)
    cuts = sorted(rng.sample(range(1, len(docs)), 2))
    batches = [docs[a:b] for a, b in zip([0] + cuts, cuts + [len(docs)])]
    store, cumulative, _origins = _drive(spark, tmp_path, batches, salt=salt)
    assert cumulative == _flagged_full(spark, docs, salt=salt)
    # epoch-tagged index names, disjoint from the default-epoch names
    tg = benchmark_grams_table_name("corpus", N, salt)
    rg = train_grams_table_name("corpus", N, salt)
    assert tg != benchmark_grams_table_name("corpus", N)
    assert rg != train_grams_table_name("corpus", N)
    assert store.exists(tg) and store.exists(rg)
    # the salted run never touched (or created) the default-epoch index
    assert not store.exists(benchmark_grams_table_name("corpus", N))


def test_resplit_salt_forces_index_rebuild(spark, tmp_path):
    """An owner re-split (salt bump) must NOT probe the stale-epoch
    indexes: the bump changes the index identity, forcing a bootstrap
    under the new split, and contamination is then reported against
    the new wall (a pair whose docs are train+test only under the new
    salt is caught; under the stale index it would be missed)."""
    # find a phrase-pair of ids that is (train, test) under SALT but
    # NOT under the default split -- the stale index would miss it
    salt = "epoch3"
    sm0 = _split_map(spark, salt="")
    sm1 = _split_map(spark, salt=salt)
    pair = None
    for a in range(400):
        for b in range(400):
            if a != b and sm1[a] == "train" and sm1[b] == "test" and not (
                sm0[a] == "train" and sm0[b] == "test"
            ):
                pair = (a, b)
                break
        if pair:
            break
    assert pair, "no split-discriminating pair found"
    a, b = pair
    store = ParquetTableStore(str(tmp_path / "store"))
    boot = spark.createDataFrame([_doc(a, "zz yy xx")], ["doc_id", "text"])
    store.overwrite("corpus", boot, partition_key="doc_id", n_buckets=4)
    # build the DEFAULT-epoch indexes first (simulates the pre-re-split
    # owner state)
    decontaminate_incremental(
        store, spark, "corpus",
        spark.createDataFrame([_doc(399)], ["doc_id", "text"]),
        n=N, n_buckets=4,
    ).collect()
    # owner re-splits with `salt`; the test doc lands and must
    # retro-flag doc `a` under the NEW split
    flagged = decontaminate_incremental(
        store, spark, "corpus",
        spark.createDataFrame([_doc(b, "zz yy xx")], ["doc_id", "text"]),
        n=N, n_buckets=4, salt=salt,
    ).collect()
    assert {r["doc_id"] for r in flagged} == {a}
    # both epochs' indexes now coexist under distinct names
    assert store.exists(benchmark_grams_table_name("corpus", N))
    assert store.exists(benchmark_grams_table_name("corpus", N, salt))


def test_test_gram_index_has_no_duplicate_rows(spark, tmp_path):
    """update_index dedupes appended test grams against the STORED
    index, not just within the batch: a recurring gram (boilerplate)
    arriving in every increment must keep the index row-distinct
    instead of growing duplicates without bound."""
    from pyspark.sql import functions as F

    sm = _split_map(spark)
    tests = [i for i in range(400) if sm[i] == "test"]
    store = ParquetTableStore(str(tmp_path / "store"))
    boot = spark.createDataFrame([_doc(tests[0], "rr ss tt")], ["doc_id", "text"])
    store.overwrite("corpus", boot, partition_key="doc_id", n_buckets=4)
    # three increments, each carrying a test doc with the SAME phrase
    for k in range(1, 4):
        decontaminate_incremental(
            store, spark, "corpus",
            spark.createDataFrame(
                [_doc(tests[k], "rr ss tt")], ["doc_id", "text"]
            ),
            n=N, n_buckets=4,
        ).collect()
    tg = store.read(spark, benchmark_grams_table_name("corpus", N))
    total = tg.count()
    distinct = tg.select("gram").distinct().count()
    assert total == distinct, f"{total - distinct} duplicate gram rows"
    # and the shared phrase's gram appears exactly once
    assert tg.filter(F.col("gram") == "rr_ss_tt").count() == 1


def test_train_postings_index_survives_increment_replay(spark, tmp_path):
    """Crash-replay safety of the TRAIN postings append (r14, mirrors
    the r13 test-gram fix): a crash between the test-gram append and
    the train-postings append followed by a caller retry of the whole
    increment must not duplicate (doc_id, gram) postings -- probes stay
    correct via downstream distinct, but index size (and probe I/O)
    would otherwise grow per replay.  A full replay of the increment is
    the strictly-harder case (both appends retried), so that is what we
    drive."""
    sm = _split_map(spark)
    trains = [i for i in range(400) if sm[i] == "train"]
    tests = [i for i in range(400) if sm[i] == "test"]
    store = ParquetTableStore(str(tmp_path / "store"))
    boot = spark.createDataFrame([_doc(tests[0])], ["doc_id", "text"])
    store.overwrite("corpus", boot, partition_key="doc_id", n_buckets=4)
    batch = [_doc(trains[0], "uu vv ww"), _doc(trains[1])]
    for _attempt in range(2):  # original run + post-crash caller retry
        decontaminate_incremental(
            store, spark, "corpus",
            spark.createDataFrame(batch, ["doc_id", "text"]),
            n=N, n_buckets=4,
        ).collect()
    rg = store.read(spark, train_grams_table_name("corpus", N))
    total = rg.count()
    distinct = rg.select("doc_id", "gram").distinct().count()
    assert total == distinct, f"{total - distinct} duplicate posting rows"
    # replayed docs' postings landed exactly once and stay probe-able
    assert rg.filter(rg.doc_id == trains[0]).count() > 0


def test_repetitive_text_postings_distinct_within_one_batch(spark, tmp_path):
    """A doc whose text REPEATS an n-gram used to append duplicate
    (doc_id, gram) postings from a SINGLE increment: the replay
    anti-joins only dedup against STORED rows, not within-batch, so
    the total==distinct index invariant held only for repeat-free
    texts (ADVICE r14).  The gram builder now dedups per doc
    (distinct=True, matching _word_grams' array_distinct); one
    increment carrying a repetitive train doc must land exactly one
    posting row per distinct gram."""
    sm = _split_map(spark)
    trains = [i for i in range(400) if sm[i] == "train"]
    tests = [i for i in range(400) if sm[i] == "test"]
    store = ParquetTableStore(str(tmp_path / "store"))
    boot = spark.createDataFrame([_doc(tests[0])], ["doc_id", "text"])
    store.overwrite("corpus", boot, partition_key="doc_id", n_buckets=4)
    # 'zz yy xx' three times: every 3-gram of the repeated span occurs
    # more than once in the doc
    rep = (trains[0], "zz yy xx zz yy xx zz yy xx")
    decontaminate_incremental(
        store, spark, "corpus",
        spark.createDataFrame([rep], ["doc_id", "text"]),
        n=N, n_buckets=4,
    ).collect()
    rg = store.read(spark, train_grams_table_name("corpus", N))
    mine = rg.filter(rg.doc_id == trains[0])
    total = mine.count()
    distinct = mine.select("gram").distinct().count()
    assert total == distinct > 0, f"{total - distinct} duplicate posting rows"


@pytest.mark.slow  # fast-tier policy (r15): randomized/soak marathon
def test_randomized_increments_match_full_recompute(spark, tmp_path):
    sm = _split_map(spark)
    rng = random.Random(17)
    ids = list(range(120))
    ph = [f"qa{g} qb{g} qc{g}" for g in range(10)]
    docs = [
        _doc(i, ph[rng.randrange(10)] if rng.random() < 0.4 else None)
        for i in ids
    ]
    rng.shuffle(docs)
    cuts = sorted(rng.sample(range(1, len(docs)), 3))
    batches = [
        docs[a:b] for a, b in zip([0] + cuts, cuts + [len(docs)])
    ]
    _store, cumulative, _origins = _drive(spark, tmp_path, batches)
    assert cumulative == _flagged_full(spark, docs)

"""Differential property test for near-dup streaming ingestion.

The engine's MinHash is md5-derived and fully deterministic, so the
whole near-dup policy has an exact executable spec in plain Python:
same tokens, same md5-slice minhash (k disjoint 5-nibble slices of one
digest per token -- dedup._minhash_min_exprs), same band keys, same
candidate generation (band equality), same Jaccard verify.  Randomized
batches
with planted near-copies must leave the store holding EXACTLY the doc
set the model predicts -- including documents the banding process
legitimately misses (a model that recomputes true Jaccard for all
pairs would be the wrong oracle: it couldn't predict LSH misses).
"""

from __future__ import annotations

import pytest

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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


NUM_HASHES, BAND_SIZE, THRESHOLD = 6, 2, 0.6
VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def _bands(text: str) -> list[str]:
    # mirrors dedup._minhash_min_exprs: hash i = 5-nibble slice [5i, 5i+5)
    # of ONE md5 per token (the r10 slice scheme -- the salted-md5 model
    # this test shipped with silently diverged when the engine switched,
    # making the test flaky under hypothesis' random examples)
    toks = set(_tokens(text))
    if not toks:
        return []
    sig = [
        min(_md5(t)[5 * i : 5 * i + 5] for t in toks) for i in range(NUM_HASHES)
    ]
    return [
        _md5("".join(sig[b * BAND_SIZE : (b + 1) * BAND_SIZE]))
        for b in range(NUM_HASHES // BAND_SIZE)
    ]


def _jaccard(a: str, b: str) -> float:
    sa, sb = set(_tokens(a)), set(_tokens(b))
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


def _model_ingest(stored: dict[int, str], batch: list[tuple[int, str]]) -> None:
    """The executable spec of ingest_batch(near_dup=True, quality off):
    exact-dedup in batch, exact anti-join vs store, batch-internal LSH
    drop (doc_b of every intra pair), band-candidate + Jaccard check
    vs store; mutate ``stored`` in place."""
    # batch-internal exact dedup (min doc_id per content)
    by_content: dict[str, int] = {}
    for did, text in sorted(batch):
        by_content.setdefault(text, did)
    keep = {did: text for text, did in by_content.items()}
    # exact anti-join vs store content
    stored_contents = set(stored.values())
    keep = {d: t for d, t in keep.items() if t not in stored_contents}
    # batch-internal near-dup: drop doc_b of every verified LSH pair
    ids = sorted(keep)
    dropped = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if set(_bands(keep[a])) & set(_bands(keep[b])) and _jaccard(
                keep[a], keep[b]
            ) >= THRESHOLD:
                dropped.add(b)
    keep = {d: t for d, t in keep.items() if d not in dropped}
    # store near-dup: band-candidate then Jaccard verify
    for d, t in sorted(keep.items()):
        bands = set(_bands(t))
        cands = [st_t for st_t in stored.values() if bands & set(_bands(st_t))]
        if any(_jaccard(t, c) >= THRESHOLD for c in cands):
            continue
        stored[d] = t


def _doc_strategy():
    # docs drawn from a small vocab so near-dups arise naturally
    return st.lists(st.sampled_from(VOCAB), min_size=2, max_size=8).map(" ".join)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.lists(_doc_strategy(), min_size=1, max_size=5), min_size=1, max_size=2
    )
)
def test_near_dup_ingest_matches_executable_spec(spark, tmp_path_factory, batches):
    store = ParquetTableStore(str(tmp_path_factory.mktemp("s")))
    stored_model: dict[int, str] = {}
    next_id = 0
    for batch_texts in batches:
        rows = []
        for t in batch_texts:
            rows.append((next_id, t, "en"))
            next_id += 1
        batch_df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        ingest_batch(
            store,
            spark,
            batch_df,
            min_quality=0.0,
            near_dup=True,
            near_threshold=THRESHOLD,
            num_hashes=NUM_HASHES,
            band_size=BAND_SIZE,
        )
        _model_ingest(stored_model, [(d, t) for d, t, _l in rows])
        got = {r["doc_id"] for r in store.read(spark, "corpus").collect()}
        assert got == set(stored_model), (
            f"engine={sorted(got)} model={sorted(stored_model)}"
        )

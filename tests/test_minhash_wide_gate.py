"""Slice-scheme gating for MinHash-LSH (VERDICT r11 item 8).

SCALE.md bounds the narrow 5-nibble slice scheme by per-doc
distinct-token count; these tests pin that the OPERATOR enforces the
bound instead of documenting it: a long-doc corpus either engages the
wide scheme (``wide='auto'``) or fails loudly -- it can never silently
run narrow slices past the bound.
"""

from __future__ import annotations

import inspect

import pytest

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.dedup import (
    NARROW_MAX_TOKENS,
    band_keys_for_docs,
    band_scheme,
    minhash_lsh_pairs,
    minhash_signatures,
    observed_max_tokens,
    _token_set,
)


def _doc(words: list[str]) -> str:
    return " ".join(words)


@pytest.fixture(scope="module")
def long_docs(spark):
    """Two near-dup docs of 30 distinct tokens each (29 shared), plus
    a short unrelated one -- 'long' relative to a test bound of 20."""
    base = [f"tok{i}" for i in range(30)]
    rows = [
        (1, _doc(base)),
        (2, _doc(base[:-1] + ["tokx"])),
        (3, _doc(["aa", "bb", "cc"])),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_observed_max_tokens(spark, long_docs):
    tok = _token_set(long_docs, "text", "doc_id")
    assert observed_max_tokens(tok) == 30


def test_narrow_guard_raises_on_long_docs(spark, long_docs):
    # plan-level raise_error: fails the JOB at execution (no eager
    # construction-time action), surfacing as a Spark exception whose
    # message carries the remedy
    with pytest.raises(Exception, match="wide"):
        minhash_lsh_pairs(long_docs, narrow_max_tokens=20).collect()


def test_auto_engages_wide_and_matches_explicit(spark, long_docs):
    auto = sorted(
        tuple(r)
        for r in minhash_lsh_pairs(
            long_docs, wide="auto", narrow_max_tokens=20
        ).collect()
    )
    explicit = sorted(
        tuple(r)
        for r in minhash_lsh_pairs(
            long_docs, wide=True, narrow_max_tokens=20
        ).collect()
    )
    assert auto == explicit
    assert auto, "the two 29/31-Jaccard docs must pair"


def test_auto_stays_narrow_below_bound(spark, long_docs):
    auto = sorted(
        tuple(r)
        for r in minhash_lsh_pairs(
            long_docs, wide="auto", narrow_max_tokens=100
        ).collect()
    )
    narrow = sorted(
        tuple(r) for r in minhash_lsh_pairs(long_docs).collect()
    )
    assert auto == narrow


def test_wide_scheme_tag_and_slice_width(spark, long_docs):
    assert band_scheme(False) == "mh2"
    assert band_scheme(True) == "mh2w"
    tok = _token_set(long_docs, "text", "doc_id")
    row = minhash_signatures(tok, wide=True).first()
    assert all(len(row[f"h{i}"]) == 10 for i in range(1, 7))
    row = minhash_signatures(tok, wide=False).first()
    assert all(len(row[f"h{i}"]) == 5 for i in range(1, 7))


def test_band_keys_rejects_auto(spark, long_docs):
    with pytest.raises(ValueError, match="pinned in the index name"):
        band_keys_for_docs(long_docs, wide="auto")


def test_band_keys_plan_guard_fails_batch_loudly(spark, long_docs):
    # the guard is raise_error folded into the band expressions: no
    # extra pass, but any long doc fails the JOB with a clear message
    with pytest.raises(Exception, match="distinct tokens"):
        band_keys_for_docs(long_docs, narrow_max_tokens=20).collect()


def test_band_keys_guard_passes_below_bound(spark, long_docs):
    rows = band_keys_for_docs(long_docs, narrow_max_tokens=40).collect()
    assert len(rows) == 3 * 3  # 3 docs x 3 bands (6 hashes / band_size 2)


def test_default_bound_is_the_documented_constant():
    assert NARROW_MAX_TOKENS == 1 << 16
    for fn in (minhash_lsh_pairs, band_keys_for_docs):
        assert (
            inspect.signature(fn).parameters["narrow_max_tokens"].default
            == NARROW_MAX_TOKENS
        )

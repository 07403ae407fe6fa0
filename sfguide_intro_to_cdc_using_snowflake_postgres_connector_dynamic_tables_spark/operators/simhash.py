"""SimHash near-dup fingerprints via a vectorized pandas UDF.

SimHash packs a document into a single 64-bit fingerprint whose
Hamming distance approximates token-multiset similarity -- dedup then
becomes "group by fingerprint (or by fingerprint bands for distance
1-3)", which at 100 TB is one shuffle on an 8-byte key instead of a
pair join.

The bit mixing (per-token md5 -> 64 bits -> signed accumulate) is not
expressible as built-in columnar expressions, so this is the designed
use of the Arrow-batched pandas UDF slow path: one Python call per
~10k rows, numpy inside, never per-row Python.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


_token_bits_cache: dict[str, "np.ndarray"] = {}


def _token_bits(token: str) -> "np.ndarray":
    """+1/-1 bit vector of a token's md5, memoized -- corpora repeat
    tokens heavily, so this turns the per-doc cost into a dict lookup."""
    bits = _token_bits_cache.get(token)
    if bits is None:
        h = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")
        bits = np.array([2 * ((h >> i) & 1) - 1 for i in range(64)], dtype=np.int64)
        if len(_token_bits_cache) < 1_000_000:  # bound executor memory
            _token_bits_cache[token] = bits
    return bits


def _simhash_one(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for token in set(text.split()):
        acc += _token_bits(token)
    fp = 0
    for i in range(64):
        if acc[i] > 0:
            fp |= 1 << i
    # fold to signed 64-bit for Spark LongType
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def _make_simhash_udf():
    # built lazily: pandas_udf registration needs an active SparkSession
    @pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _simhash_one(t or ""))

    return simhash_udf


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    udf = _make_simhash_udf()
    return docs.select(F.col(id_col), udf(F.col(text_col)).alias("simhash"))


def simhash_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Documents sharing an identical simhash (distance-0 dedup):
    the scale-friendly groupBy formulation."""
    fp = simhash_fingerprints(docs, text_col, id_col)
    return (
        fp.groupBy("simhash")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )

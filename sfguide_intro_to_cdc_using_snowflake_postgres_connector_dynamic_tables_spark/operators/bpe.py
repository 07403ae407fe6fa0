"""Distributed BPE tokenizer training (Sennrich et al., ACL'16).

Training a subword vocabulary on the corpus is the canonical
tokenizer-prep step of an LLM data pipeline; this is the byte-pair
encoding learner expressed Spark-first:

1. corpus -> DISTINCT-WORD frequency table (the only pass over raw
   text; everything after works on the aggregated vocabulary, which
   is orders of magnitude smaller than the corpus -- the standard
   scale trick: 100 TB of text collapses to ~10^8 distinct words);
2. per round, count adjacent symbol pairs weighted by word frequency
   (slice/zip_with + explode + keyed sum -- JVM-side), pick the top
   pair (deterministic tie-break: count desc, pair asc), and
   re-segment ONLY the words containing that pair (an Arrow-batched
   pandas UDF over the filtered subset -- the merge rewrite is
   inherently sequential within a word, and the filter keeps the
   rewrite O(affected words), the incremental trick single-node BPE
   implementations use);
3. driver state is the merge list itself (<= num_merges entries) --
   nothing else is collected.

``merges_per_round > 1`` is the batched variant (apply the top-k
SYMBOL-DISJOINT pairs per round): it cuts driver round-trips from M
to ~M/k at the cost of exact-greedy equivalence -- the standard
parallel-BPE approximation, off by default.

``apply_bpe`` tokenizes text with a learned merge list: greedy
left-to-right merge replay per word, merges applied in learned order
-- identical semantics to the reference algorithm, batched through
Arrow.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word sentinel (kept multi-char so it can't collide with a
#: real character symbol)
EOW = "</w>"

#: separator used for the cheap "word contains pair" pre-filter; \x00
#: never appears in tokenized text
_SEP = "\x00"


def pre_tokenize(text: str | None, lowercase: bool = True) -> list[str]:
    """THE pre-tokenizer -- the single split/case path shared by
    training (:func:`word_frequencies`) and application
    (:func:`apply_bpe`).

    BPE merge statistics are only meaningful over exactly the words
    the tokenizer will later see; r8 trained on Spark's Java-regex
    ``split(r"\\s+")`` + ``F.lower`` but applied with Python
    ``str.split()`` + ``str.lower()``, which segment differently on
    NBSP/Unicode spaces and case exotics (e.g. U+0130).  One Python
    function, used verbatim on both sides (Arrow-batched in the
    distributed pass), makes train/apply byte-identical by
    construction.  Semantics: Unicode-whitespace split with empties
    dropped, optional Unicode full lowercasing first."""
    if text is None:
        return []
    if lowercase:
        text = text.lower()
    return text.split()


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """``(word, freq)`` over :func:`pre_tokenize`'d text -- the single
    corpus-wide pass; one shuffle on the word (map-side combined).
    The split runs in an Arrow-batched pandas UDF so it is the SAME
    code application uses, not a Java-regex approximation of it."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _words(s: pd.Series) -> pd.Series:
        return s.map(lambda t: pre_tokenize(t, lowercase))

    words = docs.select(F.explode(_words(F.col(text_col))).alias("word"))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, sym: array<string>) -- characters + end-of-word
    marker, the classic BPE start state."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit("")),
            F.array(F.lit(EOW)),
        ).alias("sym"),
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the segmented vocabulary:
    zip each word's symbol array with its own shift, explode, keyed
    sum weighted by word frequency."""
    n = F.size("sym")
    pairs = F.zip_with(
        F.slice("sym", 1, n - 1),
        F.slice("sym", 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        seg.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def _merge_symbols(symbols: list, merges: Iterable[tuple[str, str]]) -> list:
    """Greedy left-to-right replay of ``merges`` (in order) on one
    word's symbol list -- the reference algorithm's inner loop."""
    for a, b in merges:
        if len(symbols) < 2:
            break
        out, i, n = [], 0, len(symbols)
        while i < n:
            if i < n - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def _apply_merges_udf(merges: list[tuple[str, str]]):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def apply_merges(sym: pd.Series) -> pd.Series:
        return sym.map(lambda s: _merge_symbols(list(s), merges))

    return apply_merges


def learn_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
    merges_per_round: int = 1,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns ``[(a, b, count), ...]``
    in learned order.

    Stops early when the best remaining pair falls under ``min_freq``.
    Per round: one pair-count aggregation over the (cached) segmented
    vocabulary + a top-k fetch + a re-segmentation of only the words
    containing a chosen pair.  ``checkpoint_every`` truncates the
    re-segmentation lineage the same way ``connected_components``
    does."""
    if num_merges < 1:
        return []
    spark = docs.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    seg = _initial_symbols(word_frequencies(docs, text_col)).cache()
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    prev = None  # previous round's cache: safe to drop once the new
    # round's top-pair collect has materialized the current one
    while len(merges) < num_merges:
        k = min(merges_per_round, num_merges - len(merges))
        top = (
            _pair_counts(seg)
            .filter(F.col("n") >= min_freq)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(max(k * 4, k))
            .collect()
        )
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top:
            break
        # symbol-disjoint top-k: batched merges can't interact, so the
        # replay inside one round is order-independent
        chosen: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            if len(chosen) >= k:
                break
            if r["a"] in used or r["b"] in used or (r["a"] + r["b"]) in used:
                continue
            chosen.append((r["a"], r["b"], r["n"]))
            used.update((r["a"], r["b"], r["a"] + r["b"]))
        if not chosen:
            break
        merges.extend(chosen)
        pair_list = [(a, b) for a, b, _ in chosen]
        contains = F.concat(F.lit(_SEP), F.array_join("sym", _SEP), F.lit(_SEP))
        hit = None
        for a, b in pair_list:
            probe = contains.contains(_SEP + a + _SEP + b + _SEP)
            hit = probe if hit is None else (hit | probe)
        rewritten = seg.filter(hit).withColumn(
            "sym", _apply_merges_udf(pair_list)(F.col("sym"))
        )
        # coalesce: the filter/rewrite union would otherwise DOUBLE the
        # partition count every round (task-count explosion by round 8)
        new_seg = seg.filter(~hit).unionByName(rewritten).coalesce(width)
        rounds += 1
        if checkpoint_every and rounds % checkpoint_every == 0:
            new_seg = new_seg.localCheckpoint(eager=False)
        prev, seg = seg, new_seg.cache()
    seg.unpersist()
    if prev is not None:
        prev.unpersist()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word,
    character start state + greedy in-order merge replay (identical to
    the reference algorithm), whole rows batched through Arrow.
    ``merges`` accepts ``(a, b)`` or ``(a, b, count)`` tuples."""
    pair_list = [(m[0], m[1]) for m in merges]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize(text: pd.Series) -> pd.Series:
        def one(t):
            out = []
            # pre_tokenize: the SAME split/case path training used
            for w in pre_tokenize(t, lowercase):
                out.extend(_merge_symbols(list(w) + [EOW], pair_list))
            return out

        return text.map(one)

    return docs.withColumn(out_col, tokenize(F.col(text_col)))

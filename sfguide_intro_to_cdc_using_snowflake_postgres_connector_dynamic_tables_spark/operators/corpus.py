"""Corpus-management operators for training-data pipelines: deterministic
splits and benchmark decontamination.

Both are pure built-in-function dataflows (md5 / array HOFs / joins) --
no Python in the hot path -- and both are keyed on a *content-independent
deterministic hash* so reruns, backfills, and incremental appends land
every document in the same split without coordination.  That property is
what makes the split usable on a 1000-executor cluster: no global sort,
no sampling pass, no driver state -- each row decides its own fate from
``md5(id)``.

Reference: the quickstart has no corpus tooling; these extend the engine
for the LLM-pipeline surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# hex-decode of the first two md5 nibbles -> uniform bucket in [0, 256);
# Spark uses conv(hex, 16, 10), the DuckDB oracle strpos nibble
# arithmetic (same trick as the simhash oracle, plans/catalog_ext.py) --
# different spellings of the identical value.


def hash_bucket(id_col: Column) -> Column:
    """Deterministic uniform bucket in [0, 256) from the first two hex
    nibbles of ``md5(cast(id as string))``.  The DuckDB oracle rebuilds
    the same value with strpos nibble arithmetic
    (``(strpos(hex, h[1])-1)*16 + strpos(hex, h[2])-1``)."""
    h = F.md5(id_col.cast("string"))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def assign_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_hi: int = 205,
    val_hi: int = 231,
) -> DataFrame:
    """Append a deterministic ``split`` column: train (~80%), val (~10%),
    test (~10%) by hash bucket.  Stratification is automatic -- the hash
    is uniform within any stratum -- and membership is stable under
    appends and reshuffles (no ordering or sampling dependence).
    """
    b = hash_bucket(F.col(id_col))
    return docs.withColumn(
        "split",
        F.when(b < train_hi, F.lit("train"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def _word_grams(toks: Column, n: int) -> Column:
    """Distinct n-token shingles joined by '_'; empty array for docs
    shorter than n tokens (guards the descending-sequence crash,
    operators/dedup.py)."""
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws("_", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: for every *train*-split document,
    count distinct word ``n``-grams it shares with any *test*-split
    document.  Rows with ``n_shared > 0`` are contaminated and must be
    dropped before training.

    Scale shape: the benchmark gram set is tiny relative to the corpus
    (here the ~10% test split; in production, a fixed eval suite), so it
    is broadcast and the check is a map-side semi join -- one shuffle
    total (the per-doc count), no matter how large the train side is.
    """
    from .text import tokens

    split = assign_split(docs, id_col=id_col)
    grams = _word_grams(tokens(F.col(text_col)), n)
    exploded = split.select(
        F.col(id_col).alias("doc_id"), "split", F.explode(grams).alias("gram")
    )
    bench_grams = (
        exploded.filter(F.col("split") == "test").select("gram").distinct()
    )
    train = exploded.filter(F.col("split") == "train")
    shared = (
        train.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared"))
    )
    train_ids = split.filter(F.col("split") == "train").select(
        F.col(id_col).alias("doc_id")
    )
    return train_ids.join(shared, "doc_id", "left").select(
        "doc_id", F.coalesce("n_shared", F.lit(0)).alias("n_shared")
    )

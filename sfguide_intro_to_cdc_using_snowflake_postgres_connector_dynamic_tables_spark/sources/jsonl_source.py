"""JSONL (newline-delimited JSON) corpus ingestion.

The dominant interchange format for LLM training corpora.  Schema'd
read (no inference pass over 100 TB) with per-row corrupt-record
capture: a malformed line lands in ``_corrupt_record`` instead of
killing the job or silently disappearing -- at pipeline scale a bad
shard is a quarantine-and-continue event, not a failure.  The
reference's loads are CSV (scripts/postgresql_setup.sql:44-47); this is
the corpus-side analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

#: default corpus schema mirroring /root/testdata documents.parquet
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> DataFrame:
    """Permissive JSONL read: well-formed rows parse against ``schema``,
    malformed lines surface whole in ``_corrupt_record`` (all data
    columns NULL for that row)."""
    # StructType.add mutates in place and returns self -- build a copy so
    # the shared DOC_SCHEMA (or a caller's schema) never accumulates
    # _corrupt_record fields across calls.
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the corrupt column dropped,
    and the raw text of every malformed line for triage/replay.

    Spark disallows queries that reference ONLY the internal corrupt
    column of a raw JSON scan (SPARK-26243); materializing the parse
    via cache() is the documented contract, and both halves share that
    one pass instead of re-parsing the corpus twice.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad

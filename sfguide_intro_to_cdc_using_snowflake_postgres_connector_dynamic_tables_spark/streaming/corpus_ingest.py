"""Continuous corpus ingestion: the streaming front door of the
training-data pipeline.

    doc stream -> redelivery dedup (watermark-bounded)
               -> quality gate
               -> content-exact dedup against the store
               -> partitioned upsert (O(delta buckets) writes)

Batch-side operators are reused verbatim (quality_score, the md5
content fingerprint); the stream side adds only what streaming
requires: `dropDuplicatesWithinWatermark` for at-least-once feeds and
a foreachBatch sink doing the store merge.  At scale the content-
fingerprint anti-join reads just the fingerprint column of the store
(column pruning), and the upsert rewrites only touched hash buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from ..operators.text import quality_score
from .joins import dedup_stream
from .store import ParquetTableStore

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def ingest_batch(
    store: ParquetTableStore,
    spark: SparkSession,
    batch: DataFrame,
    table: str = "corpus",
    min_quality: float = 0.2,
    n_buckets: int = 16,
) -> None:
    """Apply one micro-batch: quality-gate, drop docs whose exact
    content already exists in the store, upsert the rest."""
    scored = quality_score(batch).filter(F.col("quality") >= min_quality)
    keep = batch.join(scored.select("doc_id"), "doc_id", "left_semi").withColumn(
        "content_fp", F.md5(F.encode(F.col("text"), "UTF-8"))
    )
    # batch-internal exact dedup: one doc per content (min doc_id wins)
    keep = (
        keep.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("content_fp").orderBy("doc_id")
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if store.exists(table):
        existing = store.read(spark, table).select("content_fp")
        keep = keep.join(existing, "content_fp", "left_anti")
        if keep.isEmpty():
            return
        store.merge(spark, table, keep, keep.select("doc_id"))
    else:
        store.overwrite(table, keep, partition_key="doc_id", n_buckets=n_buckets)


def start_corpus_ingest(
    spark: SparkSession,
    feed_dir: str,
    store: ParquetTableStore,
    checkpoint: str,
    table: str = "corpus",
    watermark: str = "30 minutes",
    min_quality: float = 0.2,
):
    """Start the ingestion stream (availableNow-compatible).  Returns
    the StreamingQuery."""
    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).json(feed_dir)
    deduped = dedup_stream(stream, keys=("doc_id",), ts_col="ts", watermark=watermark)
    return (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda b, _id: ingest_batch(
                store, spark, b, table=table, min_quality=min_quality
            )
        )
        .trigger(availableNow=True)
        .start()
    )

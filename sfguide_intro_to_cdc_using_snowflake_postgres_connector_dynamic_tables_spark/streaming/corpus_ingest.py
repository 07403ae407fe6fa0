"""Continuous corpus ingestion: the streaming front door of the
training-data pipeline.

    doc stream -> redelivery dedup (watermark-bounded)
               -> quality gate
               -> content-exact dedup against the store
               -> partitioned upsert (O(delta buckets) writes)

Batch-side operators are reused verbatim (quality_score, the md5
content fingerprint); the stream side adds only what streaming
requires: `dropDuplicatesWithinWatermark` for at-least-once feeds and
a foreachBatch sink doing the store merge.

Scale shape of the content dedup: the seen-fingerprint set lives in
its own ``<table>__fp`` companion table, hash-bucketed on
``content_fp``.  Each micro-batch anti-joins against ONLY the fp
buckets its own fingerprints hash into (``store.read_buckets``), so
the per-tick read cost is O(batch buckets) -- matching the
O(delta-buckets) writes of the partitioned upsert -- instead of a
corpus-sized fingerprint scan per batch.
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


def fp_table_name(table: str) -> str:
    return f"{table}__fp"


def _seen_fps_for_batch(
    store: ParquetTableStore,
    spark: SparkSession,
    table: str,
    keep: DataFrame,
    n_buckets: int,
) -> DataFrame:
    """The store-side fingerprints this batch could possibly collide
    with: only the fp buckets the batch's own fingerprints hash into.

    The companion table is backfilled once from the main table for
    stores created before it existed (a one-time O(table) pass that
    buys O(batch-buckets) reads on every later tick)."""
    fp_name = fp_table_name(table)
    if not store.exists(fp_name):
        store.overwrite(
            fp_name,
            store.read(spark, table).select("content_fp"),
            partition_key="content_fp",
            n_buckets=n_buckets,
        )
    _key, B = store.partition_spec(fp_name)
    # <= B distinct bucket ids -- bounded by the bucket count, not the batch
    batch_buckets = [
        r[0]
        for r in keep.select(store.bucket_expr("content_fp", B).alias("b"))
        .distinct()
        .collect()
    ]
    return store.read_buckets(spark, fp_name, batch_buckets)


def ingest_batch(
    store: ParquetTableStore,
    spark: SparkSession,
    batch: DataFrame,
    table: str = "corpus",
    min_quality: float = 0.2,
    n_buckets: int = 16,
) -> None:
    """Apply one micro-batch: quality-gate, drop docs whose exact
    content already exists in the store, upsert the rest (and the new
    fingerprints into the bucketed ``<table>__fp`` index)."""
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
        .cache()  # one materialization feeds bucket-id collect, isEmpty, and both merges
    )
    fp_name = fp_table_name(table)
    try:
        if not store.exists(table):
            store.overwrite(table, keep, partition_key="doc_id", n_buckets=n_buckets)
            store.overwrite(
                fp_name, keep.select("content_fp"), partition_key="content_fp", n_buckets=n_buckets
            )
            return
        seen = _seen_fps_for_batch(store, spark, table, keep, n_buckets)
        new_rows = keep.join(seen, "content_fp", "left_anti").cache()
        try:
            if new_rows.isEmpty():
                return
            if store.partition_spec(table) is None:
                # legacy unpartitioned table: no bucket manifest to merge
                # into -- fall back to a documented full rewrite
                merged = (
                    store.read(spark, table)
                    .join(new_rows.select("doc_id"), "doc_id", "left_anti")
                    .unionByName(new_rows)
                )
                store.overwrite(table, merged)
            else:
                store.merge(spark, table, new_rows, new_rows.select("doc_id"))
            fps = new_rows.select("content_fp")
            store.merge(spark, fp_name, fps, fps)
        finally:
            new_rows.unpersist()
    finally:
        keep.unpersist()


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

"""Replication monitoring views (SURVEY.md S10, C5 lag metric).

The reference polls ``REPLICATION_STATE`` / ``CONNECTOR_STATS``
(``notebooks/0_start_here.ipynb:93-130``).  Spark's equivalents are
``StreamingQuery.status``/``lastProgress`` plus our store's version
bookkeeping; both are surfaced here as queryable DataFrames so the
monitoring workflow stays SQL-shaped.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .store import ParquetTableStore


def replication_state(
    spark: SparkSession, store: ParquetTableStore, tables: list[str]
) -> DataFrame:
    """Per-table snapshot/replication status, mirroring the reference's
    SCHEMA_INTROSPECTION/SNAPSHOT_REPLICATION 'DONE' semantics."""
    rows = []
    for t in tables:
        v = store.current_version(t)
        rows.append(
            (
                t,
                "DONE" if v is not None else "PENDING",
                "DONE" if v is not None else "PENDING",
                v if v is not None else -1,
            )
        )
    return spark.createDataFrame(
        rows,
        "table_name string, schema_introspection_status string, "
        "snapshot_replication_status string, committed_version int",
    )


def schema_state(spark: SparkSession, pipeline) -> DataFrame:
    """Per-table schema-propagation status: declared column count,
    columns added by replicated DDL (op='S' rows), and the evolved
    column list -- the 'did my upstream ALTER land' monitoring view a
    connector user checks after a migration."""
    from ..sources.cdc_schemas import TABLE_SCHEMAS

    rows = []
    for t, base in TABLE_SCHEMAS.items():
        extras = pipeline.schema_extras.get(t, [])
        rows.append(
            (
                t,
                len(base.fields),
                len(extras),
                ",".join(f"{n}:{ty}" for n, ty in extras),
            )
        )
    return spark.createDataFrame(
        rows,
        "table_name string, declared_columns int, evolved_columns int, "
        "evolved_column_list string",
    )


def connector_stats(spark: SparkSession, query: StreamingQuery | None) -> DataFrame:
    """Stream health as a one-row DataFrame from ``lastProgress``."""
    if query is None or query.lastProgress is None:
        return spark.createDataFrame(
            [("n/a", 0.0, 0.0, 0, None)],
            "batch_id string, input_rows_per_second double, "
            "processed_rows_per_second double, num_input_rows long, ts timestamp",
        )
    p = query.lastProgress
    return spark.createDataFrame(
        [
            (
                str(p.get("batchId")),
                float(p.get("inputRowsPerSecond") or 0.0),
                float(p.get("processedRowsPerSecond") or 0.0),
                int(p.get("numInputRows") or 0),
                dt.datetime.fromisoformat(p["timestamp"].replace("Z", "+00:00"))
                if p.get("timestamp")
                else None,
            )
        ],
        "batch_id string, input_rows_per_second double, "
        "processed_rows_per_second double, num_input_rows long, ts timestamp",
    )


def freshness_lag_seconds(query: StreamingQuery | None) -> float | None:
    """Achieved end-to-end lag proxy: time since last batch completed.
    Compare against DynamicTable.target_lag_seconds for the SLO check."""
    if query is None or query.lastProgress is None:
        return None
    ts = query.lastProgress.get("timestamp")
    if not ts:
        return None
    last = dt.datetime.fromisoformat(ts.replace("Z", "+00:00"))
    return (dt.datetime.now(dt.timezone.utc) - last).total_seconds()


def txn_pending_state(spark: SparkSession, store: ParquetTableStore) -> DataFrame:
    """Per-transaction view of the complete-transaction gate's pending
    buffer: buffered data rows, whether the commit marker has arrived,
    the marker's expected event count, and the lsn range seen -- the
    'why hasn't my transaction applied yet' view.  A tx with a marker
    and rows_buffered < expected_events is awaiting late data-topic
    rows (Debezium cross-topic lag); a tx without a marker is awaiting
    its commit; a ``done`` tx is a one-batch replay tombstone (already
    applied, drops next batch); a ``malformed`` tx has a dual-topic
    marker whose ``event_count`` failed to parse -- it will never
    assemble and needs operator intervention; a steadily-growing row
    count here means a source is emitting data for transactions whose
    metadata topic is not being consumed.

    ``rows_buffered`` counts DISTINCT data lsns -- exactly what the
    gate compares against ``expected_events`` -- because a replayed
    micro-batch can legitimately leave duplicate copies of a row in
    the buffer (raw row counts would over-report progress)."""
    from pyspark.sql import functions as F

    from .changefeed import TXN_PENDING_TABLE

    if not store.exists(TXN_PENDING_TABLE):
        return spark.createDataFrame(
            [],
            "tx_id long, rows_buffered long, marker_arrived boolean, "
            "expected_events long, done boolean, malformed boolean, "
            "min_lsn long, max_lsn long",
        )
    pend = store.read(spark, TXN_PENDING_TABLE)
    is_marker = F.col("op") == "C"
    jbool = lambda path: F.coalesce(  # noqa: E731
        F.get_json_object("after_json", path).cast("boolean"), F.lit(False)
    )
    return (
        pend.groupBy("tx_id")
        .agg(
            F.count_distinct(F.when(~is_marker, F.col("lsn"))).alias(
                "rows_buffered"
            ),
            F.max(is_marker).alias("marker_arrived"),
            F.max(
                F.when(
                    is_marker,
                    F.get_json_object("after_json", "$.event_count").cast(
                        "long"
                    ),
                )
            ).alias("expected_events"),
            F.max(F.when(is_marker, jbool("$.done"))).alias("done"),
            F.max(F.when(is_marker, jbool("$.malformed"))).alias("malformed"),
            F.min(F.when(~is_marker, F.col("lsn"))).alias("min_lsn"),
            F.max(F.when(~is_marker, F.col("lsn"))).alias("max_lsn"),
        )
        .withColumn("done", F.coalesce("done", F.lit(False)))
        .withColumn("malformed", F.coalesce("malformed", F.lit(False)))
        .orderBy("tx_id")
    )

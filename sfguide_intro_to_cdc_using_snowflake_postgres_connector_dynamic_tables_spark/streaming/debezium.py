"""Debezium envelope adapter: the real CDC wire format -> FEED_SCHEMA.

The reference tails Postgres WAL through a connector agent configured
in ``scripts/agent_configuration/databases.json`` (publication +
replication slot -> Snowflake).  The industry-standard open equivalent
of that wire format is the Debezium change event::

    {"payload": {
        "op": "c"|"u"|"d"|"r",
        "before": {...} | null,
        "after":  {...} | null,
        "source": {"lsn": 123, "table": "transactions", "ts_ms": ...},
        "ts_ms": ...}}

This module converts a DataFrame of such JSON strings (one per row --
e.g. a Kafka topic's ``value`` column, or a raw file feed) into the
engine's envelope rows ``(op, lsn, commit_ts, table_name, after_json)``
so the same :class:`~.changefeed.CDCPipeline` apply path runs on either
transport.  Everything is ``get_json_object`` built-ins (JVM-side, no
per-table schema needed at this stage -- the pipeline parses the typed
payload later with each table's declared schema, exactly as it does for
the native feed).

Mapping notes:
- op: c (create) and r (snapshot read) -> I, u -> U, d -> D -- the
  snapshot-read mapping is what makes Debezium's initial-load phase
  equal our bootstrap-then-tail contract (C2).
- deletes carry their key in ``before`` (``after`` is null), so the
  envelope's payload for a D row is the ``before`` image -- the keyed
  apply only reads the PK off it.
- both enveloped ({"payload": ...}) and flattened (top-level op/...)
  events are accepted (Kafka Connect's ``schemas.enable=false`` emits
  the latter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def debezium_to_envelope(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Convert Debezium change-event JSON strings to FEED_SCHEMA rows.

    ``raw``: any DataFrame with a string column ``value_col`` holding
    one Debezium event per row.  Returns (op, lsn, commit_ts,
    table_name, after_json) -- the exact shape
    :meth:`CDCPipeline.apply_envelope_batch` consumes.
    """
    v = F.col(value_col)

    def j(path: str):
        # accept both {"payload": {...}} and flattened events
        return F.coalesce(
            F.get_json_object(v, f"$.payload.{path}"),
            F.get_json_object(v, f"$.{path}"),
        )

    dbz_op = j("op")
    op = (
        F.when(dbz_op.isin("c", "r"), F.lit("I"))
        .when(dbz_op == "u", F.lit("U"))
        .when(dbz_op == "d", F.lit("D"))
    )
    after_json = F.when(dbz_op == "d", j("before")).otherwise(j("after"))
    commit_ts = F.timestamp_millis(
        F.coalesce(j("source.ts_ms"), j("ts_ms")).cast("long")
    )
    return raw.select(
        op.alias("op"),
        j("source.lsn").cast("long").alias("lsn"),
        commit_ts.alias("commit_ts"),
        j("source.table").alias("table_name"),
        after_json.alias("after_json"),
    ).filter(F.col("op").isNotNull())

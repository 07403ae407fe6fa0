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
from pyspark.sql import types as T

#: lsn carried by synthesized commit-marker rows: Debezium transaction
#: END events have no WAL lsn of their own, and a marker must never be
#: dropped by the snapshot-LSN watermark (its DATA rows carry the real
#: lsns and are watermark-filtered individually), so markers ride above
#: any real lsn.  Defined in changefeed (the gate keys dual-topic
#: semantics off it); re-exported here for adapter callers.
from .changefeed import TXN_MARKER_LSN  # noqa: E402


def _j(v, path: str):
    # accept both {"payload": {...}} and flattened events
    return F.coalesce(
        F.get_json_object(v, f"$.payload.{path}"),
        F.get_json_object(v, f"$.{path}"),
    )


def _tx_hash(tx_str):
    """Debezium transaction ids are strings ('571:53195829'); the
    envelope's tx_id is a long.  xxhash64 maps them stably -- data
    events and their END marker hash the same id, which is all the
    complete-transaction gate needs."""
    return F.when(tx_str.isNotNull(), F.xxhash64(tx_str))


def debezium_to_envelope(
    raw: DataFrame, value_col: str = "value", transactional: bool = False
) -> DataFrame:
    """Convert Debezium change-event JSON strings to FEED_SCHEMA rows.

    ``raw``: any DataFrame with a string column ``value_col`` holding
    one Debezium event per row.  Returns (op, lsn, commit_ts,
    table_name, after_json) -- the exact shape
    :meth:`CDCPipeline.apply_envelope_batch` consumes.

    ``transactional=True`` (connector configured with
    ``provide.transaction.metadata=true``) additionally extracts each
    event's ``transaction.id`` block as a hashed ``tx_id`` column
    (FEED_SCHEMA_TXN shape); union with
    :func:`debezium_txn_markers` over the transaction-metadata topic
    and the pipeline applies complete transactions only.
    """
    v = F.col(value_col)
    j = lambda path: _j(v, path)  # noqa: E731

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
    cols = [
        op.alias("op"),
        j("source.lsn").cast("long").alias("lsn"),
        commit_ts.alias("commit_ts"),
        j("source.table").alias("table_name"),
        after_json.alias("after_json"),
    ]
    if transactional:
        cols.append(_tx_hash(j("transaction.id")).alias("tx_id"))
    return raw.select(*cols).filter(F.col("op").isNotNull())


#: minimal parse schema for Debezium SCHEMA-CHANGE topic events -- only
#: the fields the envelope needs (from_json ignores the rest)
_SCHEMA_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("lsn", T.LongType()),
                                T.StructField("ts_ms", T.LongType()),
                            ]
                        ),
                    ),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField(
                        "tableChanges",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                    T.StructField("id", T.StringType()),
                                    T.StructField(
                                        "table",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "columns",
                                                    T.ArrayType(
                                                        T.StructType(
                                                            [
                                                                T.StructField("name", T.StringType()),
                                                                T.StructField("typeName", T.StringType()),
                                                            ]
                                                        )
                                                    ),
                                                )
                                            ]
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)


def _pg_type_to_ddl(type_name):
    """Postgres wire type name -> Spark DDL type string (the subset the
    reference's DDL uses, ``scripts/postgresql_setup.sql``; numeric
    maps to double on purpose -- money is double precision there)."""
    t = F.lower(type_name)
    return (
        F.when(t.isin("int4", "serial"), F.lit("int"))
        .when(t.isin("int8", "bigserial"), F.lit("bigint"))
        .when(t == "int2", F.lit("smallint"))
        .when(t.isin("float8", "numeric"), F.lit("double"))
        .when(t == "float4", F.lit("float"))
        .when(t == "bool", F.lit("boolean"))
        .when(t == "date", F.lit("date"))
        .when(t.isin("timestamp", "timestamptz"), F.lit("timestamp"))
        .otherwise(F.lit("string"))  # varchar/text/bpchar/uuid/...
    )


def debezium_schema_changes(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Convert Debezium SCHEMA-CHANGE topic events to op='S' envelope
    rows (:data:`~.changefeed.SCHEMA_CHANGE_OP`).

    With ``include.schema.changes=true`` the connector emits DDL events
    ``{"payload": {"ddl": "ALTER TABLE ...", "tableChanges": [{"type":
    "ALTER", "id": '"public"."customers"', "table": {"columns":
    [...]}}], "source": {"lsn": ...}}}`` on a dedicated topic.  Each
    ALTER/CREATE tableChange becomes one op='S' row whose payload lists
    the table's FULL post-DDL column set as ``add_columns`` -- the
    pipeline's :meth:`~.changefeed.CDCPipeline._apply_ddl` skips columns
    it already has, so full-list semantics are idempotent and capture
    exactly the added ones.  Union with the data envelope and apply.
    """
    v = F.col(value_col)
    # accept both enveloped and flattened events (like debezium_to_envelope)
    wrapped = F.when(
        F.get_json_object(v, "$.payload").isNotNull(), v
    ).otherwise(F.concat(F.lit('{"payload":'), v, F.lit("}")))
    parsed = F.from_json(wrapped, _SCHEMA_CHANGE_SCHEMA)["payload"]
    change = F.explode(parsed["tableChanges"]).alias("change")
    out = (
        raw.select(
            parsed["source"]["lsn"].alias("lsn"),
            F.coalesce(parsed["source"]["ts_ms"], parsed["ts_ms"]).alias("ts_ms"),
            change,
        )
        .filter(F.col("change")["type"].isin("ALTER", "CREATE"))
        .select(
            F.lit("S").alias("op"),
            F.col("lsn"),
            F.timestamp_millis(F.col("ts_ms")).alias("commit_ts"),
            # id is '"public"."customers"' -> last dotted component, unquoted
            F.regexp_extract(F.col("change")["id"], r'"?([^".]+)"?$', 1).alias(
                "table_name"
            ),
            F.to_json(
                F.struct(
                    F.transform(
                        F.col("change")["table"]["columns"],
                        lambda c: F.struct(
                            c["name"].alias("name"),
                            _pg_type_to_ddl(c["typeName"]).alias("type"),
                        ),
                    ).alias("add_columns")
                )
            ).alias("after_json"),
        )
    )
    return out


#: schema of the END event's per-collection breakdown
_DATA_COLLECTIONS_SCHEMA = (
    "array<struct<data_collection: string, event_count: long>>"
)


def _marker_event_count(v, tables: list[str]):
    """Expected data-row count for a tx, AS SEEN BY THIS FEED.

    The END event's top-level ``event_count`` covers EVERY captured
    collection in the transaction -- if the pipeline consumes only a
    subset of the captured tables' topics, gating on the total would
    wait for rows that never arrive and strand the transaction in the
    pending buffer forever.  Debezium publishes the per-collection
    breakdown (``data_collections[].event_count``) for exactly this:
    when present, sum only the collections whose table name is one the
    pipeline replicates; fall back to the total when absent (correct
    whenever the feed unions all captured topics)."""
    dc = F.coalesce(
        F.from_json(
            F.get_json_object(v, "$.payload.data_collections"),
            _DATA_COLLECTIONS_SCHEMA,
        ),
        F.from_json(
            F.get_json_object(v, "$.data_collections"),
            _DATA_COLLECTIONS_SCHEMA,
        ),
    )
    # data_collection is 'schema.table' (or '"s"."t"'): match on the
    # last dotted component, unquoted
    known = F.filter(
        dc,
        lambda c: F.regexp_extract(
            c["data_collection"], r'"?([^".]+)"?$', 1
        ).isin(*tables),
    )
    subset_sum = F.aggregate(
        known, F.lit(0).cast("long"), lambda acc, c: acc + c["event_count"]
    )
    return F.when(dc.isNotNull(), subset_sum).otherwise(
        _j(v, "event_count").cast("long")
    )


def debezium_txn_markers(
    raw: DataFrame,
    value_col: str = "value",
    tables: list[str] | None = None,
) -> DataFrame:
    """Convert Debezium TRANSACTION-METADATA topic events to op='C'
    commit-marker envelope rows.

    With ``provide.transaction.metadata=true`` Debezium emits
    ``{"status": "BEGIN"|"END", "id": "...", "event_count": n,
    "ts_ms": ...}`` on a dedicated topic; only END events matter here
    (BEGINs are dropped -- the gate infers "open" from the absence of a
    marker).  The END event's ``event_count`` rides in the marker's
    ``after_json``: the metadata topic has no cross-topic ordering
    guarantee with the data topic, so
    :func:`~..streaming.changefeed.split_complete_transactions` uses it
    to hold a marker that arrived BEFORE (some of) its tx's data until
    the tx is fully assembled, instead of silently dropping it.  Union
    the result with the transactional data envelope and feed
    :meth:`CDCPipeline.apply_envelope_batch`.

    ``tables`` scopes the expected ``event_count`` to the collections
    this deployment actually CONSUMES (defaults to every replicated
    table in ``TABLE_SCHEMAS``).  A feed that subscribes to a strict
    subset of the replicated tables' topics must pass that subset here,
    or markers would gate on rows that never arrive and strand the
    transaction in the pending buffer."""
    from ..sources.cdc_schemas import TABLE_SCHEMAS

    if tables is None:
        tables = list(TABLE_SCHEMAS)
    v = F.col(value_col)
    j = lambda path: _j(v, path)  # noqa: E731
    return (
        raw.filter(j("status") == "END")
        .select(
            F.lit("C").alias("op"),
            F.lit(TXN_MARKER_LSN).alias("lsn"),
            F.timestamp_millis(j("ts_ms").cast("long")).alias("commit_ts"),
            F.lit("_commit").alias("table_name"),
            F.to_json(
                F.struct(
                    _marker_event_count(v, tables).alias("event_count")
                )
            ).alias("after_json"),
            _tx_hash(j("id")).alias("tx_id"),
        )
    )

"""Debezium wire-format adapter: replay a canned capture of the
reference's postgres tables through the engine's CDC apply path.

The canned events mirror what the reference's connector would see
tailing the publication in ``scripts/agent_configuration/
databases.json`` -- snapshot reads (r), inserts (c), updates (u), and
a delete (d) whose payload is the ``before`` image.
"""

from __future__ import annotations

import json

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (
    CDCPipeline,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.debezium import (
    debezium_to_envelope,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)


def _event(op, table, lsn, after=None, before=None, enveloped=True):
    body = {
        "op": op,
        "before": before,
        "after": after,
        "source": {"lsn": lsn, "table": table, "ts_ms": 1_700_000_000_000 + lsn},
        "ts_ms": 1_700_000_000_000 + lsn,
    }
    return json.dumps({"payload": body} if enveloped else body)


CUST = lambda cid, name, age: {  # noqa: E731
    "customer_id": cid, "firstname": name, "lastname": "Doe", "age": age,
    "email": f"c{cid}@x.io", "phone_number": "555",
}


def test_debezium_capture_replays_through_pipeline(spark, tmp_path):
    # snapshot phase (r) + tail phase (c/u/d), interleaved tables
    events = [
        _event("r", "customers", 1, after=CUST(1, "Ann", 30)),
        _event("r", "customers", 2, after=CUST(2, "Bob", 40)),
        _event("c", "customers", 10, after=CUST(3, "Cay", 50)),
        _event("u", "customers", 11, after=CUST(2, "Bobby", 41)),
        # delete: key arrives in `before`, after is null
        _event("d", "customers", 12, before=CUST(1, "Ann", 30)),
        # flattened (schemas.enable=false) event must parse identically
        _event("c", "customers", 13, after=CUST(4, "Dee", 22), enveloped=False),
    ]
    raw = spark.createDataFrame([(e,) for e in events], "value string")
    env = debezium_to_envelope(raw)

    rows = {(r["op"], r["lsn"]) for r in env.collect()}
    assert rows == {("I", 1), ("I", 2), ("I", 10), ("U", 11), ("D", 12), ("I", 13)}
    assert env.filter("lsn = 12").first()["after_json"] is not None  # key travels

    store = ParquetTableStore(str(tmp_path / "s"))
    p = CDCPipeline(spark, store)
    p.apply_envelope_batch(env, batch_id=0)

    cust = {r["customer_id"]: r for r in store.read(spark, "customers").collect()}
    assert set(cust) == {2, 3, 4}          # 1 deleted, 3+4 inserted
    assert cust[2]["firstname"] == "Bobby" and cust[2]["age"] == 41
    ts = env.filter("lsn = 10").first()["commit_ts"]
    assert ts is not None and ts.year >= 2023  # source.ts_ms surfaced


def test_debezium_ignores_non_change_events(spark):
    # tombstones / heartbeats (no op) must be dropped, not crash
    raw = spark.createDataFrame(
        [("{}",), (json.dumps({"payload": {"schema": "noise"}}),)], "value string"
    )
    assert debezium_to_envelope(raw).count() == 0


def _tx_event(op, table, lsn, tx_id, after=None, before=None):
    body = {
        "op": op,
        "before": before,
        "after": after,
        "source": {"lsn": lsn, "table": table, "ts_ms": 1_700_000_000_000 + lsn},
        "transaction": {"id": tx_id, "total_order": 1, "data_collection_order": 1},
    }
    return json.dumps({"payload": body})


def _txn_meta(status, tx_id, event_count=0):
    return json.dumps(
        {"status": status, "id": tx_id, "event_count": event_count,
         "ts_ms": 1_700_000_000_500}
    )


def test_debezium_transaction_metadata_gates_apply(spark, tmp_path):
    """provide.transaction.metadata=true wiring: data events carry
    transaction.id, the metadata topic's END events become commit
    markers, and the pipeline applies only complete transactions."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.debezium import (
        debezium_txn_markers,
    )

    store = ParquetTableStore(str(tmp_path / "s"))
    p = CDCPipeline(spark, store)
    p.apply_envelope_batch(
        debezium_to_envelope(
            spark.createDataFrame(
                [(_event("r", "customers", 1, after=CUST(1, "Ann", 30)),)],
                "value string",
            )
        )
    )

    # batch 1: tx "571:1" commits (END seen); tx "571:2" still open
    data = spark.createDataFrame(
        [
            (_tx_event("u", "customers", 10, "571:1", after=CUST(1, "Ann", 31)),),
            (_tx_event("c", "customers", 11, "571:2", after=CUST(2, "Bob", 40)),),
        ],
        "value string",
    )
    meta = spark.createDataFrame(
        [(_txn_meta("BEGIN", "571:1"),), (_txn_meta("END", "571:1", 1),),
         (_txn_meta("BEGIN", "571:2"),)],
        "value string",
    )
    env = debezium_to_envelope(data, transactional=True).unionByName(
        debezium_txn_markers(meta)
    )
    p.apply_envelope_batch(env, batch_id=1)
    cust = {r["customer_id"]: r["age"] for r in store.read(spark, "customers").collect()}
    assert cust == {1: 31}  # tx 571:2's insert is buffered, not applied

    # batch 2: just 571:2's END marker
    p.apply_envelope_batch(
        debezium_txn_markers(
            spark.createDataFrame([(_txn_meta("END", "571:2", 1),)], "value string")
        ),
        batch_id=2,
    )
    cust = {r["customer_id"]: r["age"] for r in store.read(spark, "customers").collect()}
    assert cust == {1: 31, 2: 40}


def test_full_wire_format_integration(spark, tmp_path):
    """All three Debezium topics through ONE apply path: the data
    topic (transaction-metadata enabled), the transaction topic (END
    markers), and the schema-change topic (ALTER adding a column) --
    united into a single envelope per micro-batch.  DDL applies
    immediately (no tx id on the schema topic), complete transactions
    apply, open ones defer and replay under the evolved schema."""
    from pyspark.sql import functions as F

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.debezium import (
        debezium_schema_changes,
        debezium_txn_markers,
    )

    def tx_event(op, table, lsn, tx, after=None, before=None):
        body = {
            "op": op, "before": before, "after": after,
            "source": {"lsn": lsn, "table": table, "ts_ms": 1_700_000_000_000 + lsn},
            "ts_ms": 1_700_000_000_000 + lsn,
            "transaction": {"id": tx, "total_order": 1, "data_collection_order": 1},
        }
        return json.dumps({"payload": body})

    def end_event(tx, n=1):
        # real Debezium END events always carry event_count; an END
        # without one is treated as malformed by the txn gate (never
        # silently match-in-batch -- see test_transactions)
        return json.dumps({"payload": {
            "status": "END", "id": tx, "ts_ms": 1_700_000_000_500,
            "event_count": n,
        }})

    alter = json.dumps({
        "payload": {
            "source": {"lsn": 5, "ts_ms": 1_700_000_000_000},
            "ddl": "ALTER TABLE customers ADD COLUMN loyalty_tier varchar",
            "tableChanges": [{
                "type": "ALTER", "id": '"public"."customers"',
                "table": {"columns": [
                    {"name": "customer_id", "typeName": "int4"},
                    {"name": "firstname", "typeName": "varchar"},
                    {"name": "lastname", "typeName": "varchar"},
                    {"name": "age", "typeName": "int4"},
                    {"name": "email", "typeName": "varchar"},
                    {"name": "phone_number", "typeName": "varchar"},
                    {"name": "loyalty_tier", "typeName": "varchar"},
                ]},
            }],
        }
    })

    def unify(data_raw, txn_raw, ddl_raw):
        parts = []
        if data_raw:
            df = spark.createDataFrame([(e,) for e in data_raw], "value string")
            parts.append(debezium_to_envelope(df, transactional=True))
        if txn_raw:
            df = spark.createDataFrame([(e,) for e in txn_raw], "value string")
            parts.append(debezium_txn_markers(df))
        if ddl_raw:
            df = spark.createDataFrame([(e,) for e in ddl_raw], "value string")
            parts.append(
                debezium_schema_changes(df).withColumn(
                    "tx_id", F.lit(None).cast("long")
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    store = ParquetTableStore(str(tmp_path / "store"))
    p = CDCPipeline(spark, store)

    gold = dict(CUST(7, "Gia", 33), loyalty_tier="gold")
    silver = dict(CUST(8, "Sal", 44), loyalty_tier="silver")
    batch1 = unify(
        data_raw=[
            tx_event("c", "customers", 10, "571:1", after=gold),
            tx_event("c", "customers", 11, "571:2", after=silver),  # open tx
        ],
        txn_raw=[end_event("571:1")],
        ddl_raw=[alter],
    )
    p.apply_envelope_batch(batch1)
    got = {r["customer_id"]: r.asDict().get("loyalty_tier")
           for r in store.read(spark, "customers").collect()}
    assert got == {7: "gold"}  # committed tx applied with evolved column
    assert ("loyalty_tier", "string") in p.schema_extras["customers"]

    # END for the open tx arrives alone; the buffered row replays and
    # must parse under the evolved schema (its value was written after
    # the DDL)
    batch2 = unify(data_raw=[], txn_raw=[end_event("571:2")], ddl_raw=[])
    p.apply_envelope_batch(batch2)
    got = {r["customer_id"]: r.asDict().get("loyalty_tier")
           for r in store.read(spark, "customers").collect()}
    assert got == {7: "gold", 8: "silver"}


def test_marker_before_data_across_batches(spark, tmp_path):
    """Debezium's transaction-metadata topic has no cross-topic ordering
    guarantee with the data topic: here the END marker (event_count=2)
    is consumed a full micro-batch BEFORE one of its tx's data rows.
    The marker must buffer across batches, the tx must apply atomically
    once fully assembled, a replayed batch must re-admit (not re-strand)
    its rows via the one-batch done tombstone, and the pending buffer
    must drain to empty afterwards."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (
        TXN_PENDING_TABLE,
    )
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.debezium import (
        debezium_txn_markers,
    )

    store = ParquetTableStore(str(tmp_path / "s"))
    p = CDCPipeline(spark, store)

    # batch 0: marker for tx 900:1 (2 events) + only the FIRST data row
    b0 = debezium_to_envelope(
        spark.createDataFrame(
            [(_tx_event("c", "customers", 20, "900:1", after=CUST(5, "Eve", 28)),)],
            "value string",
        ),
        transactional=True,
    ).unionByName(
        debezium_txn_markers(
            spark.createDataFrame([(_txn_meta("END", "900:1", 2),)], "value string")
        )
    )
    p.apply_envelope_batch(b0, batch_id=0)
    # atomic: nothing of the half-assembled tx is visible
    assert (
        not store.exists("customers")
        or store.read(spark, "customers").count() == 0
    )
    pending = store.read(spark, TXN_PENDING_TABLE)
    assert pending.filter("op = 'C'").count() == 1  # marker buffered
    assert pending.filter("op != 'C'").count() == 1  # data row buffered

    # batch 1: the lagging second data row -- tx assembles, applies whole
    b1 = debezium_to_envelope(
        spark.createDataFrame(
            [(_tx_event("c", "customers", 21, "900:1", after=CUST(6, "Fox", 35)),)],
            "value string",
        ),
        transactional=True,
    )
    p.apply_envelope_batch(b1, batch_id=1)
    cust = {r["customer_id"]: r["age"] for r in store.read(spark, "customers").collect()}
    assert cust == {5: 28, 6: 35}
    # marker persists one extra batch as a done tombstone (replay cover)
    pending = store.read(spark, TXN_PENDING_TABLE)
    assert pending.filter("op != 'C'").count() == 0
    tomb = pending.filter("op = 'C'").collect()
    assert len(tomb) == 1 and json.loads(tomb[0]["after_json"])["done"] is True

    # replay of batch 1 (Spark re-executes the last uncommitted
    # foreachBatch after a crash): the tombstone re-admits the replayed
    # row -- idempotent re-apply, not a forever-deferred strand
    p.apply_envelope_batch(b1, batch_id=1)
    cust = {r["customer_id"]: r["age"] for r in store.read(spark, "customers").collect()}
    assert cust == {5: 28, 6: 35}
    assert store.read(spark, TXN_PENDING_TABLE).count() == 0  # bounded: drained

    # an unrelated later batch keeps the buffer empty and applies normally
    p.apply_envelope_batch(
        debezium_to_envelope(
            spark.createDataFrame(
                [(_event("c", "customers", 30, after=CUST(7, "Gus", 41)),)],
                "value string",
            ),
            transactional=True,
        ),
        batch_id=2,
    )
    assert store.read(spark, "customers").count() == 3
    assert store.read(spark, TXN_PENDING_TABLE).count() == 0


def test_marker_assembly_counts_watermark_dropped_replays(spark, tmp_path):
    """A replayed transaction straddling the snapshot handoff: the
    marker's event_count covers a row at lsn <= snapshot_lsn (already
    in the snapshot) plus a genuinely new row.  The replayed row must
    COUNT toward assembly (else the marker waits forever) while only
    the post-snapshot row applies."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (
        TXN_PENDING_TABLE,
    )
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.debezium import (
        debezium_txn_markers,
    )

    store = ParquetTableStore(str(tmp_path / "s"))
    p = CDCPipeline(spark, store)
    p.bootstrap(
        {
            "customers": spark.createDataFrame(
                [tuple(CUST(1, "Ann", 30).values())],
                "customer_id int, firstname string, lastname string, age int,"
                " email string, phone_number string",
            )
        },
        snapshot_lsn=100,
    )

    # batch 0: the marker (2 events) + the pre-snapshot replayed row
    b0 = debezium_to_envelope(
        spark.createDataFrame(
            [(_tx_event("u", "customers", 90, "950:1", after=CUST(1, "Ann", 30)),)],
            "value string",
        ),
        transactional=True,
    ).unionByName(
        debezium_txn_markers(
            spark.createDataFrame([(_txn_meta("END", "950:1", 2),)], "value string")
        )
    )
    p.apply_envelope_batch(b0, batch_id=0)
    assert {r["age"] for r in store.read(spark, "customers").collect()} == {30}

    # batch 1: the post-snapshot row -- tx assembles; ONLY this row applies
    b1 = debezium_to_envelope(
        spark.createDataFrame(
            [(_tx_event("u", "customers", 110, "950:1", after=CUST(1, "Ann", 44)),)],
            "value string",
        ),
        transactional=True,
    )
    p.apply_envelope_batch(b1, batch_id=1)
    assert {r["age"] for r in store.read(spark, "customers").collect()} == {44}
    # nothing data-bearing left (the done tombstone may linger one batch)
    assert store.read(spark, TXN_PENDING_TABLE).filter("op != 'C'").count() == 0


def test_marker_event_count_scopes_to_replicated_tables(spark, tmp_path):
    """An END marker's top-level event_count covers EVERY captured
    collection; a feed consuming only the replicated tables' topics
    must gate on the per-collection breakdown or the tx strands."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.debezium import (
        debezium_txn_markers,
    )

    store = ParquetTableStore(str(tmp_path / "s"))
    p = CDCPipeline(spark, store)
    # tx touches customers (1 row, consumed) + audit_log (3 rows, whose
    # topic this pipeline does NOT consume): total event_count=4
    marker = json.dumps(
        {
            "status": "END",
            "id": "777:1",
            "event_count": 4,
            "data_collections": [
                {"data_collection": '"public"."customers"', "event_count": 1},
                {"data_collection": '"public"."audit_log"', "event_count": 3},
            ],
            "ts_ms": 1_700_000_000_500,
        }
    )
    env = debezium_to_envelope(
        spark.createDataFrame(
            [(_tx_event("c", "customers", 40, "777:1", after=CUST(9, "Hal", 52)),)],
            "value string",
        ),
        transactional=True,
    ).unionByName(
        debezium_txn_markers(spark.createDataFrame([(marker,)], "value string"))
    )
    p.apply_envelope_batch(env, batch_id=0)
    got = {r["customer_id"] for r in store.read(spark, "customers").collect()}
    assert got == {9}  # gated on the 1 replicated-table event, not 4

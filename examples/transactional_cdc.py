#!/usr/bin/env python
"""Transactional CDC demo: complete-transaction apply + consistent
multi-table reads.

A source transaction touches customers AND transactions (an order with
its line), but a micro-batch boundary splits it: batch 1 carries the
data rows, batch 2 the commit marker.  The engine buffers the open
transaction, applies it only when the marker lands, and publishes a
group snapshot after each batch so `consistent_table` joins never see a
half-applied transaction -- the read guarantee Postgres gives on the
source side, preserved through replication.

Run: python examples/transactional_cdc.py   (temp dir; ~30 s)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.engine import (  # noqa: E402
    Engine,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (  # noqa: E402
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (  # noqa: E402
    fixtures,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (  # noqa: E402
    write_feed_transactions,
)


def _tx(cid: int, lsn: int, tx_id: int, age: int) -> dict:
    """One source transaction: update a customer AND insert their
    purchase -- the pair that must never be half-visible."""
    return {
        "customers": [
            (
                "U",
                lsn,
                {
                    "customer_id": cid,
                    "firstname": "Txn",
                    "lastname": "Demo",
                    "age": age,
                    "email": "txn@example.com",
                    "phone_number": "555",
                },
            )
        ],
        "transactions": [
            (
                "I",
                lsn + 1,
                {
                    "transaction_id": f"tx-{tx_id}",
                    "customer_id": cid,
                    "product_id": 1,
                    "merchant_id": 1,
                    "transaction_date": "2024-03-01",
                    "transaction_time": "12:00:00",
                    "quantity": 2,
                    "total_price": 42.0,
                    "transaction_card": "visa",
                    "transaction_category": "purchase",
                },
            )
        ],
    }


def main() -> None:
    spark = get_spark(
        app_name="transactional_cdc",
        conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="cdc_txn_")
    print(f"work dir: {tmp}")

    engine = Engine(spark, f"{tmp}/store")
    engine.bootstrap(fixtures.seed_dataframes(spark, n_customers=50))
    cid = 1

    feed, ckpt = f"{tmp}/feed", f"{tmp}/ckpt"

    # batch 1: tx 100 commits; tx 101's data rows arrive WITHOUT their
    # commit marker (the batch boundary split the transaction)
    write_feed_transactions(
        feed,
        committed=[(100, _tx(cid, 10_000, 100, 31))],
        open_txs=[(101, _tx(cid, 10_100, 101, 62))],
    )
    engine.start(feed, ckpt, transactional=True).awaitTermination(120)

    cust_age = (
        engine.consistent_table("customers")
        .filter(F.col("customer_id") == cid)
        .first()["age"]
    )
    n_demo_tx = (
        engine.consistent_table("transactions")
        .filter(F.col("transaction_id").startswith("tx-"))
        .count()
    )
    print(f"after batch 1: age={cust_age} (tx 100 applied), demo rows={n_demo_tx}")
    assert cust_age == 31 and n_demo_tx == 1, "open tx 101 must not be visible"

    # batch 2: only tx 101's commit marker -- the buffered rows apply now
    write_feed_transactions(feed, committed=[(101, {})], marker_lsns={101: 10_102})
    engine.start(feed, ckpt, transactional=True).awaitTermination(120)

    cust_age = (
        engine.consistent_table("customers")
        .filter(F.col("customer_id") == cid)
        .first()["age"]
    )
    n_demo_tx = (
        engine.consistent_table("transactions")
        .filter(F.col("transaction_id").startswith("tx-"))
        .count()
    )
    print(f"after batch 2: age={cust_age} (tx 101 applied), demo rows={n_demo_tx}")
    assert cust_age == 62 and n_demo_tx == 2

    # the consistent view: customer x their purchases, resolved through
    # ONE group snapshot -- never a half-applied transaction
    engine.consistent_table("transactions").join(
        engine.consistent_table("customers"), "customer_id"
    ).filter(F.col("transaction_id").startswith("tx-")).select(
        "transaction_id", "customer_id", "age", "total_price"
    ).show()

    # act 3 -- the Debezium dual-topic direction: the transaction-
    # metadata topic has no ordering guarantee with the data topic, so
    # here the END marker (event_count=1) arrives a batch BEFORE its
    # data row.  The marker buffers; the tx applies, whole, when its
    # last row lands.
    import json as _json

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.debezium import (
        debezium_to_envelope,
        debezium_txn_markers,
    )

    p = engine.pipeline
    marker = _json.dumps(
        {"status": "END", "id": "900:1", "event_count": 1, "ts_ms": 1_700_000_000_000}
    )
    p.apply_envelope_batch(
        debezium_txn_markers(spark.createDataFrame([(marker,)], "value string")),
        batch_id=100,
    )
    age_before = (
        engine.consistent_table("customers")
        .filter(F.col("customer_id") == cid)
        .first()["age"]
    )
    print(f"after marker-only batch: age={age_before} (tx 900:1 still buffered)")
    assert age_before == 62

    data = _json.dumps(
        {
            "payload": {
                "op": "u",
                "after": {
                    "customer_id": cid,
                    "firstname": "Txn",
                    "lastname": "Demo",
                    "age": 93,
                    "email": "txn@example.com",
                    "phone_number": "555",
                },
                "source": {"lsn": 10_200, "table": "customers",
                           "ts_ms": 1_700_000_000_000},
                "transaction": {"id": "900:1", "total_order": 1,
                                "data_collection_order": 1},
            }
        }
    )
    p.apply_envelope_batch(
        debezium_to_envelope(
            spark.createDataFrame([(data,)], "value string"), transactional=True
        ),
        batch_id=101,
    )
    age_after = (
        engine.consistent_table("customers")
        .filter(F.col("customer_id") == cid)
        .first()["age"]
    )
    print(f"after late data row: age={age_after} (tx 900:1 assembled + applied)")
    assert age_after == 93

    spark.stop()
    print("transactional CDC demo complete")


if __name__ == "__main__":
    main()

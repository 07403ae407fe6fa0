#!/usr/bin/env python
"""Chained dynamic tables: a two-level view DAG kept fresh by CDC.

The product pattern beyond the single-view quickstart: dynamic tables
stacked on dynamic tables, where a change to the base table cascades
through every level incrementally --

    transactions --(agg)--> customer_spend   (per-customer totals + band)
    customer_spend --(agg)--> band_counts    (customers + spend per band)

Each applied CDC batch triggers ``DynamicTableManager.refresh_dag``:
the upstream refresh emits its own change batch ('U'/'D' rows for the
view keys it touched), and the downstream view consumes it exactly
like a CDC delta -- per-tick work is O(churn) at every level, never a
level recompute.

Run: python examples/chained_views.py   (uses a temp dir; ~30 s)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (  # noqa: E402
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (  # noqa: E402
    fixtures,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.cdc_schemas import (  # noqa: E402
    TRANSACTIONS_SCHEMA,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (  # noqa: E402
    FEED_SCHEMA,
    CDCPipeline,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.dynamic_table import (  # noqa: E402
    DynamicTable,
    DynamicTableManager,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (  # noqa: E402
    ParquetTableStore,
)


def spend_view(t):
    spend = (
        t["transactions"]
        .filter(F.col("transaction_category") == "Purchase")
        .groupBy("customer_id")
        .agg(F.sum("total_price").alias("total_price"), F.count(F.lit(1)).alias("n_tx"))
    )
    return spend.withColumn(
        "band",
        F.when(F.col("total_price") < 500, "LOW")
        .when(F.col("total_price") < 2000, "MID")
        .otherwise("HIGH"),
    )


def band_view(t):
    return (
        t["customer_spend"]
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("total_price").alias("band_total"),
        )
    )


def main() -> None:
    spark = get_spark(
        app_name="chained-views", conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="chained_views_")

    customers = fixtures.make_customers(25, seed=5)
    merchants = fixtures.make_merchants(seed=5)
    products = fixtures.make_products(seed=5)
    tx = fixtures.make_transactions(
        customers, products, merchants, n=120, orphan_frac=0.0, seed=5
    )

    store = ParquetTableStore(os.path.join(tmp, "store"))
    pipeline = CDCPipeline(spark, store)
    pipeline.bootstrap(
        {"transactions": spark.createDataFrame(tx, TRANSACTIONS_SCHEMA)}
    )

    mgr = DynamicTableManager(spark, store)
    mgr.create(
        DynamicTable(
            "customer_spend",
            spend_view,
            fact_table="transactions",
            fact_key="transaction_id",
            view_key="customer_id",
            group_col="customer_id",
        )
    )
    mgr.create(
        DynamicTable(
            "band_counts",
            band_view,
            fact_table="customer_spend",
            fact_key="customer_id",
            view_key="band",
            group_col="band",
        )
    )
    mgr.attach(pipeline)
    print("refresh order:", mgr.refresh_order())
    print("band_counts after bootstrap:")
    mgr.read("band_counts").orderBy("band").show()

    def apply(batch):
        rows = [
            (op, lsn, None, table, json.dumps(r, default=str))
            for table, changes in batch.items()
            for op, lsn, r in changes
        ]
        pipeline.apply_envelope_batch(spark.createDataFrame(rows, FEED_SCHEMA))

    cols = [f.name for f in TRANSACTIONS_SCHEMA.fields]

    def purchase(tx_id: str, amount: float) -> dict:
        row = dict(zip(cols, tx[0]))
        row.update(
            transaction_id=tx_id,
            customer_id=999_999,  # a brand-new (numeric) customer id
            transaction_category="Purchase",
            total_price=amount,
        )
        return row

    print("1) new customer buys 300.00 -> should appear in LOW...")
    apply({"transactions": [("I", 9001, purchase("TX_A", 300.0))]})
    mgr.read("band_counts").orderBy("band").show()

    print("2) same customer buys 9000.00 -> must MOVE LOW -> HIGH (the")
    print("   old band shrinks via the upstream view's previous version)...")
    apply({"transactions": [("I", 9002, purchase("TX_B", 9000.0))]})
    mgr.read("band_counts").orderBy("band").show()

    print("3) both purchases deleted -> the customer leaves every band...")
    apply({"transactions": [("D", 9003, {"transaction_id": "TX_A"}),
                            ("D", 9004, {"transaction_id": "TX_B"})]})
    mgr.read("band_counts").orderBy("band").show()

    print("refresh history (DYNAMIC_TABLE_REFRESH_HISTORY analogue):")
    mgr.refresh_history().show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()

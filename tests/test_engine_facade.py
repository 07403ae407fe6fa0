"""End-to-end workflow through the Engine facade, mirroring the
reference notebook flow, including a mixed-mode registry: the join view
refreshes incrementally while an aggregate view (not fact-keyed)
refreshes in full mode per batch."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.engine import (
    Engine,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (
    fixtures,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.cdc_schemas import (
    CUSTOMERS_SCHEMA,
    MERCHANTS_SCHEMA,
    PRODUCTS_SCHEMA,
    TRANSACTIONS_SCHEMA,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (
    FEED_SCHEMA,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.purchase_summary import (
    CUSTOMER_PURCHASE_SUMMARY_SQL as SUMMARY_SQL,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.dynamic_table import (
    DynamicTable,
)


def test_engine_workflow(spark, tmp_path):
    customers = fixtures.make_customers(50, seed=11)
    merchants = fixtures.make_merchants(seed=11)
    products = fixtures.make_products(seed=11)
    tx = fixtures.make_transactions(customers, products, merchants, n=200, orphan_frac=0.4, seed=11)

    engine = Engine(spark, str(tmp_path / "cdc_prod"))
    engine.bootstrap(
        {
            "customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
            "merchants": spark.createDataFrame(merchants, MERCHANTS_SCHEMA),
            "products": spark.createDataFrame(products, PRODUCTS_SCHEMA),
            "transactions": spark.createDataFrame(tx, TRANSACTIONS_SCHEMA),
        }
    )

    engine.create_dynamic_table_sql(
        "customer_purchase_summary",
        SUMMARY_SQL,
        fact_table="transactions",
        fact_key="transaction_id",
        view_key="transaction_id",
        dims={
            "customers": ("customer_id", "customer_id"),
            "products": ("product_id", "product_id"),
            "merchants": ("merchant_id", "merchant_id"),
        },
        target_lag="1 minute",
    )
    # aggregate view: per-customer Purchase spend -- not fact-keyed, so
    # registered as refresh_mode='full'
    engine.create_dynamic_table(
        DynamicTable(
            name="customer_spend",
            defining_fn=lambda t: (
                t["transactions"]
                .filter(F.col("transaction_category") == "Purchase")
                .groupBy("customer_id")
                .agg(F.sum("total_price").alias("total_price"))
            ),
            fact_table="transactions",
            fact_key="transaction_id",
            view_key="customer_id",
            dims={},
            refresh_mode="full",
        )
    )

    # apply two change batches synchronously
    for i, b in enumerate(fixtures.change_log(customers, products, merchants, batches=2, rows_per_batch=30)):
        rows = [
            (op, lsn, None, table, json.dumps(r, default=str))
            for table, changes in b.items()
            for op, lsn, r in changes
        ]
        engine.apply_batch(spark.createDataFrame(rows, FEED_SCHEMA))

    # both views exist, are readable, and agree with recomputes
    summary = engine.table("customer_purchase_summary")
    assert summary.count() > 0
    recomputed = engine.sql(SUMMARY_SQL, tables=["transactions", "customers", "products", "merchants"])
    assert summary.count() == recomputed.count()

    spend = engine.table("customer_spend")
    expected = (
        engine.table("transactions")
        .filter(F.col("transaction_category") == "Purchase")
        .groupBy("customer_id")
        .agg(F.sum("total_price").alias("total_price"))
    )
    got = {r["customer_id"]: round(r["total_price"], 2) for r in spend.collect()}
    want = {r["customer_id"]: round(r["total_price"], 2) for r in expected.collect()}
    assert got == want

    # monitoring surface
    state = engine.replication_state()
    assert state.filter(F.col("snapshot_replication_status") != "DONE").count() == 0
    assert engine.connector_stats().count() == 1  # n/a row before any stream

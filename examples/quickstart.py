#!/usr/bin/env python
"""End-to-end demo: the reference quickstart's workflow on this engine.

Mirrors ``notebooks/0_start_here.ipynb`` step by step: seed the source
tables, snapshot-bootstrap, create the Dynamic Table, tail a change
feed, and watch rows land in the view within the target lag — then run
the dashboard analytics on the result.

Run: python examples/quickstart.py   (uses a temp dir; ~1 min)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.engine import (  # noqa: E402
    Engine,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.dashboard import (  # noqa: E402
    dashboard_main,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (  # noqa: E402
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (  # noqa: E402
    fixtures,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.cdc_schemas import (  # noqa: E402
    CUSTOMERS_SCHEMA,
    MERCHANTS_SCHEMA,
    PRODUCTS_SCHEMA,
    TRANSACTIONS_SCHEMA,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (  # noqa: E402
    write_feed_batch,
)

SUMMARY_SQL = """
    SELECT t.transaction_id, t.customer_id, c.age AS customer_age,
           t.product_id, p.product_name, p.product_category,
           t.merchant_id, m.merchant_name, m.merchant_category,
           t.transaction_date, t.transaction_time, t.quantity,
           t.quantity * p.price AS total_price,
           t.transaction_card, t.transaction_category
    FROM transactions t
    JOIN customers c ON t.customer_id = c.customer_id
    JOIN products p ON t.product_id = p.product_id
    JOIN merchants m ON t.merchant_id = m.merchant_id
                    AND m.merchant_category = p.product_category
"""


def main() -> None:
    spark = get_spark(app_name="quickstart", conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="cdc_quickstart_")
    print(f"work dir: {tmp}")

    # 1. seed source tables (postgresql_setup.sql equivalent)
    customers = fixtures.make_customers(300)
    merchants = fixtures.make_merchants()
    products = fixtures.make_products()
    tx = fixtures.make_transactions(customers, products, merchants, n=1000)

    engine = Engine(spark, f"{tmp}/store")
    engine.bootstrap(
        {
            "customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
            "merchants": spark.createDataFrame(merchants, MERCHANTS_SCHEMA),
            "products": spark.createDataFrame(products, PRODUCTS_SCHEMA),
            "transactions": spark.createDataFrame(tx, TRANSACTIONS_SCHEMA),
        }
    )
    print("snapshot replication:")
    engine.replication_state().show()

    # 2. CREATE DYNAMIC TABLE ... TARGET_LAG='1 minute' REFRESH_MODE=INCREMENTAL
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
    n0 = engine.table("customer_purchase_summary").count()
    print(f"dynamic table initialized: {n0} rows (orphan transactions dropped)")

    # 3. start the connector tail and generate load (insert_transactions proc)
    q = engine.start(f"{tmp}/feed", f"{tmp}/ckpt", trigger={"processingTime": "2 seconds"})
    for batch in fixtures.change_log(customers, products, merchants, batches=3, rows_per_batch=100):
        write_feed_batch(f"{tmp}/feed", batch)

    deadline = time.monotonic() + 60
    n1 = n0
    while time.monotonic() < deadline:
        n1 = engine.table("customer_purchase_summary").count()
        if n1 > n0:
            break
        time.sleep(1)
    q.stop()
    print(f"view caught up: {n0} -> {n1} rows; connector stats:")
    engine.connector_stats().show()

    # 4. dashboard analytics on the materialization
    frames = dashboard_main(engine.table("customer_purchase_summary"))
    print("spend bands:")
    frames["spend_band_counts"].show()
    print("top merchant:")
    frames["top_merchant"].show()
    spark.stop()


if __name__ == "__main__":
    main()

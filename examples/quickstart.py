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
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.purchase_summary import (  # noqa: E402
    CUSTOMER_PURCHASE_SUMMARY_SQL,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (  # noqa: E402
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (  # noqa: E402
    fixtures,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (  # noqa: E402
    write_feed_batch,
)

def main() -> None:
    spark = get_spark(app_name="quickstart", conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="cdc_quickstart_")
    print(f"work dir: {tmp}")

    # 1. seed source tables (postgresql_setup.sql equivalent)
    customers = fixtures.make_customers(300)
    merchants = fixtures.make_merchants()
    products = fixtures.make_products()

    engine = Engine(spark, f"{tmp}/store")
    engine.bootstrap(fixtures.seed_dataframes(spark, n_customers=300))
    print("snapshot replication:")
    engine.replication_state().show()

    # 2. the notebook's DDL cell, verbatim -- name, TARGET_LAG,
    # REFRESH_MODE and the fact/dim maintenance metadata are all parsed
    # or inferred from the SQL text (streaming/ddl.py), exactly like
    # Snowflake; no Python-side metadata
    engine.execute_ddl(
        f"""
        CREATE OR REPLACE DYNAMIC TABLE cdc_prod.analytics.customer_purchase_summary
        TARGET_LAG = '1 minute'
        WAREHOUSE = cdc_ds_wh
        REFRESH_MODE = INCREMENTAL
        AS {CUSTOMER_PURCHASE_SUMMARY_SQL}
        """
    )
    n0 = engine.table("customer_purchase_summary").count()
    print(f"dynamic table initialized: {n0} rows (orphan transactions dropped)")

    # 3. generate load (insert_transactions proc) and tail the feed to
    # completion (availableNow drain: deterministic -- all 3 batches,
    # including the dim-update / delete / duplicate-key cases, apply)
    for batch in fixtures.change_log(customers, products, merchants, batches=3, rows_per_batch=100):
        write_feed_batch(f"{tmp}/feed", batch)
    t0 = time.monotonic()
    q = engine.start(f"{tmp}/feed", f"{tmp}/ckpt")  # trigger=availableNow
    q.awaitTermination(120)
    if q.exception() is not None:
        raise RuntimeError(f"stream failed: {q.exception()}")
    n1 = engine.table("customer_purchase_summary").count()
    if n1 <= n0:
        raise RuntimeError(f"view did not advance ({n0} -> {n1})")
    print(f"view caught up: {n0} -> {n1} rows in {time.monotonic() - t0:.1f}s; connector stats:")
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

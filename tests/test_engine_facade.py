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


# The reference notebook's DDL cell, verbatim (0_start_here.ipynb,
# cell `create_dynamic_table`) -- the engine must accept this string
# with NO Python-side metadata.
REFERENCE_DDL = '''
CREATE OR REPLACE DYNAMIC TABLE cdc_prod.analytics.customer_purchase_summary
TARGET_LAG = '1 minute' 
WAREHOUSE = cdc_ds_wh
REFRESH_MODE = INCREMENTAL
AS
SELECT
    t.transaction_id
    , t.customer_id
    , c.age AS customer_age
    , t.product_id
    , p.product_name
    , p.product_category
    , t.merchant_id
    , m.merchant_name
    , m.merchant_category
    , t.transaction_date
    , t.transaction_time
    , t.quantity
    , t.quantity * p.price AS total_price
    , t.transaction_card
    , t.transaction_category
FROM
    CONNECTOR_DEST_DB."raw_cdc"."transactions" t
JOIN
    CONNECTOR_DEST_DB."raw_cdc"."customers" c ON t.customer_id = c.customer_id
JOIN
    CONNECTOR_DEST_DB."raw_cdc"."products" p ON t.product_id = p.product_id
JOIN
    CONNECTOR_DEST_DB."raw_cdc"."merchants" m ON t.merchant_id = m.merchant_id
AND
    m.merchant_category = p.product_category;
'''


def test_ddl_parser_infers_reference_metadata():
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.ddl import (
        parse_dynamic_table_ddl,
    )

    p = parse_dynamic_table_ddl(REFERENCE_DDL)
    assert p.name == "customer_purchase_summary"
    assert p.target_lag == "1 minute"
    assert p.refresh_mode == "incremental"
    assert p.warehouse == "cdc_ds_wh"
    assert p.fact_table == "transactions"
    assert p.fact_key == "transaction_id" and p.view_key == "transaction_id"
    assert p.dims == {
        "customers": ("customer_id", "customer_id"),
        "products": ("product_id", "product_id"),
        "merchants": ("merchant_id", "merchant_id"),
    }
    # qualified refs rewritten to bare store names
    assert "CONNECTOR_DEST_DB" not in p.select_sql and '"raw_cdc"' not in p.select_sql


def test_ddl_parser_rejects_unsupported_shapes():
    import pytest

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.ddl import (
        parse_dynamic_table_ddl,
    )

    with pytest.raises(ValueError, match="equi-conjunct"):
        parse_dynamic_table_ddl(
            "CREATE DYNAMIC TABLE v TARGET_LAG = '1 minute' AS "
            "SELECT t.id FROM facts t JOIN dims d ON t.x < d.y"
        )
    with pytest.raises(ValueError, match="GROUP BY"):
        parse_dynamic_table_ddl(
            "CREATE DYNAMIC TABLE v AS "
            "SELECT t.cust_id FROM facts t GROUP BY t.cust_id"
        )
    with pytest.raises(ValueError, match="merge key"):
        parse_dynamic_table_ddl(
            "CREATE DYNAMIC TABLE v AS SELECT d.name FROM facts t "
            "JOIN dims d ON t.d_id = d.id"
        )


def test_engine_executes_reference_ddl_verbatim(spark, tmp_path):
    """The whole point of the DDL surface: the notebook cell string in,
    an incrementally-maintained view out -- and it stays equal to the
    full recompute across change batches."""
    customers = fixtures.make_customers(40, seed=13)
    merchants = fixtures.make_merchants(seed=13)
    products = fixtures.make_products(seed=13)
    tx = fixtures.make_transactions(customers, products, merchants, n=150, orphan_frac=0.4, seed=13)

    engine = Engine(spark, str(tmp_path / "cdc_prod"))
    engine.bootstrap(
        {
            "customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
            "merchants": spark.createDataFrame(merchants, MERCHANTS_SCHEMA),
            "products": spark.createDataFrame(products, PRODUCTS_SCHEMA),
            "transactions": spark.createDataFrame(tx, TRANSACTIONS_SCHEMA),
        }
    )
    engine.execute_ddl(REFERENCE_DDL)
    dt = engine.manager.registry["customer_purchase_summary"]
    assert dt.refresh_mode == "incremental" and dt.target_lag_seconds == 60

    def _rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())

    for b in fixtures.change_log(customers, products, merchants, batches=2, rows_per_batch=25):
        rows = [
            (op, lsn, None, table, json.dumps(r, default=str))
            for table, changes in b.items()
            for op, lsn, r in changes
        ]
        engine.apply_batch(spark.createDataFrame(rows, FEED_SCHEMA))
        incremental = _rows(engine.table("customer_purchase_summary"))
        full = _rows(
            engine.sql(SUMMARY_SQL, tables=["transactions", "customers", "products", "merchants"])
        )
        assert incremental == full


def test_engine_table_changes(spark, tmp_path):
    """Facade CDF: I/U/D between the replica's retained versions,
    keyed automatically by the table's primary key."""
    import json

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (
        fixtures,
    )
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (
        FEED_SCHEMA,
    )

    engine = Engine(spark, str(tmp_path / "store"))
    engine.bootstrap(fixtures.seed_dataframes(spark, n_customers=10))
    v1 = engine.store.current_version("customers")
    ids = sorted(r["customer_id"] for r in engine.table("customers").collect())
    upd, dele = ids[0], ids[1]
    env = spark.createDataFrame(
        [
            ("U", 10, None, "customers",
             json.dumps({"customer_id": upd, "firstname": "New", "lastname": "Name",
                         "age": 99, "email": "n@x.io", "phone_number": "1"})),
            ("D", 11, None, "customers", json.dumps({"customer_id": dele})),
        ],
        FEED_SCHEMA,
    )
    engine.apply_batch(env)
    v2 = engine.store.current_version("customers")
    ops = {(r["op"], r["customer_id"]) for r in engine.table_changes("customers", v1, v2).collect()}
    assert ops == {("U", upd), ("D", dele)}


def test_engine_layout_maintenance_facade(spark, tmp_path):
    """Facade for the replica layout levers: optimize_table(zorder) ->
    prune_plan shows file-level pruning -> read_pruned returns the
    exact filtered rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    engine = Engine(spark, str(tmp_path / "store"))
    rows = spark.createDataFrame(
        [(i, dt.date(2024, 1, 1) + dt.timedelta(days=i % 32)) for i in range(128)],
        "id long, d date",
    )
    engine.store.overwrite(
        "t", rows, partition_key="id", n_buckets=4, zone_cols=["d"]
    )
    engine.optimize_table(
        "t", zorder_cols=["d"], writer_options={"maxRecordsPerFile": "8"}
    )
    plan = engine.prune_plan("t", "d", dt.date(2024, 1, 3), dt.date(2024, 1, 4))
    assert plan["files_total"] > plan["buckets_total"]
    assert plan["files_kept"] < plan["files_total"] // 2
    got = sorted(
        r["id"]
        for r in engine.read_pruned(
            "t", "d", dt.date(2024, 1, 3), dt.date(2024, 1, 4)
        ).collect()
    )
    want = sorted(
        r["id"]
        for r in engine.table("t")
        .filter((F.col("d") >= "2024-01-03") & (F.col("d") <= "2024-01-04"))
        .collect()
    )
    assert got == want and got

"""Incremental maintenance of AGGREGATE dynamic tables: per-customer
spend (fact-only) and per-merchant revenue (join-based), under inserts,
group-moving updates, deletes, and dim re-pricing -- each batch must
leave the view equal to a full recompute."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

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
    CDCPipeline,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.dynamic_table import (
    DynamicTable,
    DynamicTableManager,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)


def _spend_view(t):
    return (
        t["transactions"]
        .filter(F.col("transaction_category") == "Purchase")
        .groupBy("customer_id")
        .agg(F.sum("total_price").alias("total_price"), F.count(F.lit(1)).alias("n_tx"))
    )


def _merchant_revenue_view(t):
    # join-based aggregate: recomputed price via the product dim
    j = t["transactions"].join(t["products"], "product_id").join(t["merchants"], "merchant_id")
    return j.groupBy("merchant_id").agg(
        F.first("merchant_name").alias("merchant_name"),
        F.sum(F.col("quantity") * F.col("price")).alias("revenue"),
    )


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(round(v, 2)) if isinstance(v, float) else str(v) for v in r)
        for r in df.select(*cols).collect()
    )


@pytest.fixture()
def setup(spark, tmp_path):
    customers = fixtures.make_customers(40, seed=33)
    merchants = fixtures.make_merchants(seed=33)
    products = fixtures.make_products(seed=33)
    tx = fixtures.make_transactions(customers, products, merchants, n=200, orphan_frac=0.0, seed=33)

    store = ParquetTableStore(str(tmp_path / "store"))
    p = CDCPipeline(spark, store)
    p.bootstrap(
        {
            "customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
            "merchants": spark.createDataFrame(merchants, MERCHANTS_SCHEMA),
            "products": spark.createDataFrame(products, PRODUCTS_SCHEMA),
            "transactions": spark.createDataFrame(tx, TRANSACTIONS_SCHEMA),
        }
    )
    mgr = DynamicTableManager(spark, store)
    mgr.create(
        DynamicTable(
            "customer_spend",
            _spend_view,
            fact_table="transactions",
            fact_key="transaction_id",
            view_key="customer_id",
            dims={},
            group_col="customer_id",
        )
    )
    mgr.create(
        DynamicTable(
            "merchant_revenue",
            _merchant_revenue_view,
            fact_table="transactions",
            fact_key="transaction_id",
            view_key="merchant_id",
            dims={
                "products": ("product_id", "product_id"),
                "merchants": ("merchant_id", "merchant_id"),
            },
            group_col="merchant_id",
        )
    )
    mgr.attach(p)
    return p, store, mgr, (customers, merchants, products, tx)


def _apply(spark, p, batch):
    rows = [
        (op, lsn, None, table, json.dumps(r, default=str))
        for table, changes in batch.items()
        for op, lsn, r in changes
    ]
    p.apply_envelope_batch(spark.createDataFrame(rows, FEED_SCHEMA))


def _assert_views_match_full(spark, store, mgr):
    tables = {
        n: store.read(spark, n) for n in ("transactions", "customers", "products", "merchants")
    }
    assert _canon(mgr.read("customer_spend")) == _canon(_spend_view(tables))
    assert _canon(mgr.read("merchant_revenue")) == _canon(_merchant_revenue_view(tables))


def _tx_row(tx_row, **overrides):
    cols = [f.name for f in TRANSACTIONS_SCHEMA.fields]
    d = dict(zip(cols, tx_row))
    d.update(overrides)
    return d


@pytest.mark.slow  # fast-tier policy (r15): randomized/soak marathon
def test_incremental_aggregates_under_iud(spark, setup):
    p, store, mgr, (customers, merchants, products, tx) = setup

    # batch 1: plain inserts (new rows into several groups)
    _apply(spark, p, {
        "transactions": [
            ("I", 9001, _tx_row(tx[0], transaction_id="TXNEW1", total_price=123.45)),
            ("I", 9002, _tx_row(tx[1], transaction_id="TXNEW2", transaction_category="Purchase")),
        ]
    })
    _assert_views_match_full(spark, store, mgr)

    # batch 2: group-moving update (same PK, different customer AND
    # merchant) + a delete (its old groups must shrink)
    moved = _tx_row(tx[2], customer_id=customers[5][0], merchant_id=merchants[3][0])
    _apply(spark, p, {
        "transactions": [
            ("U", 9003, moved),
            ("D", 9004, {"transaction_id": tx[3][0]}),
        ]
    })
    _assert_views_match_full(spark, store, mgr)

    # batch 3: dim re-price (merchant_revenue recomputes affected
    # merchants through the product join; customer_spend unaffected)
    pid, name, cat, price = products[0]
    _apply(spark, p, {
        "products": [("U", 9005, {"product_id": pid, "product_name": name,
                                  "product_category": cat, "price": round(price * 3, 2)})]
    })
    _assert_views_match_full(spark, store, mgr)

    # batch 4: delete-only batch (old-group resolution via previous
    # snapshot is the only signal)
    _apply(spark, p, {
        "transactions": [("D", 9006, {"transaction_id": tx[4][0]}),
                          ("D", 9007, {"transaction_id": "TXNEW1"})]
    })
    _assert_views_match_full(spark, store, mgr)

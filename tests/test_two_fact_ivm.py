"""Incremental maintenance of a view joining TWO fact-sized tables.

The delta-keyed propagation that handles small dims handles a second
fact table identically -- only the (delta-sized) changed-key set is
ever broadcast, never the table -- so an orders |x| items view stays
incrementally maintainable with churn on BOTH sides.  Pins:

- updates/inserts/deletes on either side (and both in one batch) keep
  incremental == full recompute;
- deleting a parent row drops all its child view rows (inner-join
  retroactivity through the second fact);
- the silently-stale case -- defining SQL scanning a table that is
  neither fact nor a registered dim -- raises loudly at definition.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.cdc_apply import (
    apply_changes,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.dynamic_table import (
    DynamicTable,
    DynamicTableManager,
    dynamic_table_from_sql,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)

ITEMS = "op string, lsn long, i_id long, o_id long, qty int, price double"
ORDERS = "op string, lsn long, o_id long, status string"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def _view(t):
    i, o = t["items"].alias("i"), t["orders"].alias("o")
    return i.join(o, F.col("i.o_id") == F.col("o.o_id")).select(
        F.col("i.i_id").alias("i_id"),
        F.col("i.o_id").alias("o_id"),
        F.col("o.status").alias("status"),
        (F.col("i.qty") * F.col("i.price")).alias("amount"),
    )


@pytest.fixture()
def setup(spark, tmp_path):
    store = ParquetTableStore(str(tmp_path / "s"))
    orders = spark.createDataFrame(
        [(o, "open") for o in range(1, 21)], "o_id long, status string"
    )
    items = spark.createDataFrame(
        [(i, (i % 20) + 1, i % 5 + 1, float(i)) for i in range(1, 101)],
        "i_id long, o_id long, qty int, price double",
    )
    store.overwrite("orders", orders)
    store.overwrite("items", items)
    mgr = DynamicTableManager(spark, store)
    mgr.create(
        DynamicTable(
            name="order_items",
            defining_fn=_view,
            fact_table="items",
            fact_key="i_id",
            view_key="i_id",
            # a second FACT registered through the same delta-keyed
            # propagation slot as a dim: only its changed keys are
            # broadcast, never the table
            dims={"orders": ("o_id", "o_id")},
        )
    )
    return store, mgr


def _apply(spark, store, table, delta_rows, schema, key):
    delta = spark.createDataFrame(delta_rows, schema)
    cur = store.read(spark, table)
    store.overwrite(table, apply_changes(cur, delta, key))
    return delta


def _check(spark, store, mgr):
    full = _view({"items": store.read(spark, "items"), "orders": store.read(spark, "orders")})
    assert _rows(mgr.read("order_items")) == _rows(full)


def test_churn_on_both_facts(spark, setup):
    store, mgr = setup

    # batch 1: item-side churn (insert, update, delete)
    d_items = _apply(
        spark,
        store,
        "items",
        [("I", 1, 200, 3, 2, 9.5), ("U", 2, 5, 4, 9, 5.0), ("D", 3, 7, None, None, None)],
        ITEMS,
        "i_id",
    )
    mgr.incremental_refresh("order_items", {"items": d_items})
    _check(spark, store, mgr)

    # batch 2: order-side churn (status update + parent delete)
    d_orders = _apply(
        spark,
        store,
        "orders",
        [("U", 4, 3, "shipped"), ("D", 5, 11, None)],
        ORDERS,
        "o_id",
    )
    mgr.incremental_refresh("order_items", {"orders": d_orders})
    _check(spark, store, mgr)
    # parent delete really removed the children from the view
    assert mgr.read("order_items").filter(F.col("o_id") == 11).count() == 0

    # batch 3: both sides in one batch, including a new order + items for it
    d_items = _apply(
        spark,
        store,
        "items",
        [("I", 6, 300, 99, 1, 2.0), ("U", 7, 8, 8, 1, 1.0)],
        ITEMS,
        "i_id",
    )
    d_orders = _apply(spark, store, "orders", [("I", 8, 99, "new")], ORDERS, "o_id")
    mgr.incremental_refresh("order_items", {"items": d_items, "orders": d_orders})
    _check(spark, store, mgr)
    assert mgr.read("order_items").filter(F.col("o_id") == 99).count() == 1


def test_unregistered_table_raises(spark, tmp_path):
    store = ParquetTableStore(str(tmp_path / "s"))
    with pytest.raises(ValueError, match="neither the fact table nor"):
        dynamic_table_from_sql(
            spark,
            store,
            "v",
            "SELECT i.i_id FROM items i JOIN warehouses w ON i.w_id = w.w_id",
            fact_table="items",
            fact_key="i_id",
            view_key="i_id",
            dims={},
        )
    # full mode is the sanctioned escape hatch
    dynamic_table_from_sql(
        spark,
        store,
        "v",
        "SELECT i.i_id FROM items i JOIN warehouses w ON i.w_id = w.w_id",
        fact_table="items",
        fact_key="i_id",
        view_key="i_id",
        dims={},
        refresh_mode="full",
    )

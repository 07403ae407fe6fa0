"""End-to-end snapshot-then-tail handoff against a FAKED database.

VERDICT r4 item 9: no Postgres ships in the sandbox, so DuckDB plays
the database role here -- the partitioned "JDBC" snapshot is executed
as real SQL (the same predicate strings ``read_jdbc_snapshot`` would
pass to ``spark.read.jdbc``) against a live DuckDB file, and the tail
is the envelope feed.  What this pins that the unit tests don't:

1. the partition predicates run as actual WHERE clauses on a second
   SQL engine over the real CDC table shapes and reassemble the exact
   table (no dropped / double-read rows);
2. the offset handoff contract of ``CDCPipeline.bootstrap_then_tail``:
   a tail that REPLAYS changes at-or-below the snapshot LSN (as a
   Postgres slot does after unclean shutdown) must not regress the
   snapshot -- replayed rows are dropped, newer rows apply;
3. the persisted watermark survives pipeline restart.

Production mapping (README "Connecting a real Postgres"): DuckDB here
stands in for the JDBC URL from the reference's
``scripts/agent_configuration/databases.json``.
"""

from __future__ import annotations

import json

import duckdb
import pytest

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (
    fixtures,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.cdc_schemas import (
    CUSTOMERS_SCHEMA,
    PRIMARY_KEYS,
    PRODUCTS_SCHEMA,
    TABLE_SCHEMAS,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.jdbc_source import (
    hash_partition_predicates,
    range_partition_predicates,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (
    CDCPipeline,
    write_feed_batch,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)


def _fake_db(tmp_path):
    """A DuckDB file standing in for the Postgres of databases.json."""
    con = duckdb.connect(str(tmp_path / "fake_pg.duckdb"))
    customers = fixtures.make_customers(120, seed=7)
    merchants = fixtures.make_merchants(seed=7)
    products = fixtures.make_products(seed=7)
    transactions = fixtures.make_transactions(
        customers, products, merchants, n=400, seed=7
    )
    con.execute(
        "CREATE TABLE customers (customer_id INT, firstname VARCHAR, lastname VARCHAR,"
        " age INT, email VARCHAR, phone_number VARCHAR)"
    )
    con.executemany("INSERT INTO customers VALUES (?,?,?,?,?,?)", customers)
    con.execute(
        "CREATE TABLE merchants (merchant_id INT, merchant_name VARCHAR, merchant_category VARCHAR)"
    )
    con.executemany("INSERT INTO merchants VALUES (?,?,?)", merchants)
    con.execute(
        "CREATE TABLE products (product_id INT, product_name VARCHAR,"
        " product_category VARCHAR, price DOUBLE)"
    )
    con.executemany("INSERT INTO products VALUES (?,?,?,?)", products)
    con.execute(
        "CREATE TABLE transactions (transaction_id VARCHAR, customer_id INT,"
        " product_id INT, merchant_id INT, transaction_date DATE,"
        " transaction_time VARCHAR, quantity INT, total_price DOUBLE,"
        " transaction_card VARCHAR, transaction_category VARCHAR)"
    )
    con.executemany(
        "INSERT INTO transactions VALUES (?,?,?,?,?,?,?,?,?,?)", transactions
    )
    return con, (customers, merchants, products, transactions)


def _snapshot_partitioned(spark, con, table: str, preds: list[str]):
    """Execute the generated partition predicates as real SQL against
    the fake database -- exactly what spark.read.jdbc(predicates=...)
    does, one query per executor -- and union the partitions."""
    parts = []
    for p in preds:
        tbl = con.execute(f"SELECT * FROM {table} WHERE {p}").fetch_arrow_table()
        parts.append(tbl)
    import pyarrow as pa

    whole = pa.concat_tables(parts)
    return spark.createDataFrame(whole.to_pandas(), TABLE_SCHEMAS[table])


def test_partitioned_snapshot_reassembles_exact_tables(spark, tmp_path):
    con, _seed = _fake_db(tmp_path)
    # text PK -> hash-mod predicates (DuckDB dialect hash spelling);
    # int PK -> range predicates from real bounds, like a production
    # read would derive from min/max(pk)
    for table, preds in [
        (
            "transactions",
            hash_partition_predicates("transaction_id", 8, hash_fn="hash({col})"),
        ),
        (
            "customers",
            range_partition_predicates(
                "customer_id",
                *con.execute(
                    "SELECT min(customer_id), max(customer_id) FROM customers"
                ).fetchone(),
                5,
            ),
        ),
    ]:
        df = _snapshot_partitioned(spark, con, table, preds)
        key = PRIMARY_KEYS[table]
        n_direct = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
        assert df.count() == n_direct
        assert df.select(key).distinct().count() == n_direct


def test_bootstrap_then_tail_drops_replayed_changes(spark, tmp_path):
    """The offset contract: snapshot taken at LSN 5000 already contains
    the effect of change lsn=4800; the tail replays 4800 AND delivers
    5100.  Final state must show 5100's value, not 4800's."""
    con, (customers, merchants, products, transactions) = _fake_db(tmp_path)

    snapshot_lsn = 5000
    # the database already applied this pre-snapshot change: customer 0
    # renamed to SnapName (lsn=4800 <= snapshot point)
    c0 = customers[0]
    con.execute(
        "UPDATE customers SET firstname = 'SnapName' WHERE customer_id = ?", [c0[0]]
    )

    # "JDBC" snapshot under the slot's exported snapshot
    snap = {
        t: _snapshot_partitioned(
            spark, con, t, hash_partition_predicates(PRIMARY_KEYS[t], 4, "hash({col})")
        )
        for t in ("customers", "merchants", "products", "transactions")
    }

    # tail feed: the slot resends the pre-snapshot change (stale
    # firstname) plus one genuinely new change after the snapshot point
    feed = str(tmp_path / "feed")
    stale_row = {
        "customer_id": c0[0],
        "firstname": c0[1],  # the OLD name -- applying it would regress
        "lastname": c0[2],
        "age": c0[3],
        "email": c0[4],
        "phone_number": c0[5],
    }
    new_row = dict(stale_row, firstname="TailName")
    write_feed_batch(
        feed,
        {
            "customers": [
                ("U", 4800, stale_row),  # replayed: lsn <= snapshot_lsn
                ("U", 5100, new_row),  # new: must apply
            ]
        },
    )

    store = ParquetTableStore(str(tmp_path / "store"))
    p = CDCPipeline(spark, store)
    q = p.bootstrap_then_tail(
        snap, snapshot_lsn, feed, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    row = (
        store.read(spark, "customers")
        .filter(f"customer_id = {c0[0]}")
        .collect()[0]
    )
    assert row["firstname"] == "TailName"

    # snapshot rows untouched by the tail are intact
    assert store.read(spark, "transactions").count() == len(transactions)


def test_snapshot_lsn_watermark_survives_restart(spark, tmp_path):
    con, (customers, *_rest) = _fake_db(tmp_path)
    store = ParquetTableStore(str(tmp_path / "store"))
    p = CDCPipeline(spark, store)
    snap = {
        "customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
    }
    p.bootstrap(snap, snapshot_lsn=9000)

    # a NEW pipeline instance on the same store re-reads the watermark
    p2 = CDCPipeline(spark, store)
    assert p2.snapshot_lsn == 9000

    # and enforces it: a batch wholly below the watermark is a no-op
    c0 = customers[0]
    stale = {
        "customer_id": c0[0],
        "firstname": "ShouldNotApply",
        "lastname": c0[2],
        "age": c0[3],
        "email": c0[4],
        "phone_number": c0[5],
    }
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (
        FEED_SCHEMA,
    )

    env = spark.createDataFrame(
        [("U", 8999, None, "customers", json.dumps(stale, default=str))], FEED_SCHEMA
    )
    p2.apply_envelope_batch(env, batch_id=0)
    row = (
        store.read(spark, "customers").filter(f"customer_id = {c0[0]}").collect()[0]
    )
    assert row["firstname"] == c0[1]


def test_reseed_without_offset_clears_stale_watermark(spark, tmp_path):
    """bootstrap() without a snapshot_lsn is a re-seed: any previously
    persisted watermark must be cleared, or a new feed whose LSNs
    restart from 0 would be silently discarded."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (
        fixtures,
    )
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.changefeed import (
        FEED_SCHEMA,
    )

    customers = fixtures.make_customers(20, seed=3)
    store = ParquetTableStore(str(tmp_path / "store"))
    p = CDCPipeline(spark, store)
    snap = {"customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA)}
    p.bootstrap(snap, snapshot_lsn=9000)
    assert p.snapshot_lsn == 9000

    # re-seed from a new source whose feed restarts at low LSNs
    p.bootstrap(snap)
    assert p.snapshot_lsn == -1
    assert CDCPipeline(spark, store).snapshot_lsn == -1  # persisted too

    c0 = customers[0]
    row = {
        "customer_id": c0[0], "firstname": "NewFeed", "lastname": c0[2],
        "age": c0[3], "email": c0[4], "phone_number": c0[5],
    }
    env = spark.createDataFrame(
        [("U", 5, None, "customers", json.dumps(row, default=str))], FEED_SCHEMA
    )
    p.apply_envelope_batch(env, batch_id=0)
    got = store.read(spark, "customers").filter(f"customer_id = {c0[0]}").collect()[0]
    assert got["firstname"] == "NewFeed"

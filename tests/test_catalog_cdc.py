"""The cdc_pipeline_state gate entry must exercise the REAL machinery:
three incremental refresh ticks (never the full-rebuild fallback --
a silent FULL would make the hash gate vacuously green), generalized
table registry (orders is not in the built-in CDC domain), and an end
state equal to the one-pass recompute the DuckDB oracle runs.  The
oracle hash-match itself runs in tests/test_catalog_oracle.py and the
driver gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog_cdc import (
    drive_cdc_pipeline,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)

SF_DIR = "/root/testdata/sf0.001"


def test_cdc_drive_is_incremental_and_matches_recompute(spark, tmp_path):
    store = ParquetTableStore(str(tmp_path / "store"))
    mgr = drive_cdc_pipeline(spark, SF_DIR, store)

    hist = [
        (r["view_name"], r["refresh_mode"])
        for r in mgr.refresh_history().collect()
    ]
    # create-time init is the only FULL; every data batch cascaded
    # incrementally (NO_CHANGE would also be fine -- these batches
    # always change rows, so pin INCREMENTAL exactly)
    assert hist.count(("customer_spend", "FULL")) == 1
    assert hist.count(("customer_spend", "INCREMENTAL")) == 3

    # end state == direct recompute of the derived change log
    orders = load_table(spark, SF_DIR, "orders")
    key = F.col("o_orderkey")
    expect = (
        orders.filter(key % 7 != 0)
        .withColumn(
            "tp",
            F.when(key % 5 == 0, F.col("o_totalprice") * 2.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum("tp").alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
    )
    got = {
        r["custkey"]: (round(r["total_spend"], 6), r["n_orders"])
        for r in mgr.read("customer_spend").collect()
    }
    want = {
        r["custkey"]: (round(r["total_spend"], 6), r["n_orders"])
        for r in expect.collect()
    }
    assert got == want

    # the replicated table itself holds exactly the surviving keys
    applied = store.read(spark, "orders")
    n_del = orders.filter(key % 7 == 0).count()
    assert applied.count() == orders.count() - n_del
    assert applied.filter(F.col("o_orderkey") % 7 == 0).count() == 0

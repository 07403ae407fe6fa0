"""CDC-drive gate entry: the full replication machinery under the
driver's hash gate.

The bench's ``cdc_pipeline`` entries measure the bootstrap + apply +
refresh drive but had no oracle column (r13 judge item 5) -- only
pytest covered the end state.  This entry derives a DETERMINISTIC
change log from the driver's own ``orders`` parquet (no fixtures, no
RNG), replays it through the real ``CDCPipeline`` -> ``DynamicTable``
stack, and returns the final materialized view; the oracle SQL
recomputes the same end state in one DuckDB pass over the same table.

Change-log derivation (pure functions of ``o_orderkey``):

- snapshot  = orders with  o_orderkey % 3 != 0        (bootstrap)
- batch 1 I = orders with  o_orderkey % 3 == 0        (lsn = key)
- batch 2 U = orders with  o_orderkey % 5 == 0,
              o_totalprice doubled                    (lsn = key + 2^40)
              (x2 is EXACT in binary: the updated values keep the
              2-decimal money grid, so group sums stay off the .005
              rounding boundary -- a x1.1 draft manufactured half-cent
              values whose 1-ulp sum-order noise flipped the driver's
              2dp canonicalization between engines)
- batch 3 D = keys  with   o_orderkey % 7 == 0        (lsn = key + 2^41)

Every key exists before its U (batch 1 inserts the %3 multiples, the
snapshot has the rest), per-key LSNs are strictly increasing across
batches, and D carries the PK only -- the envelope contract
(FIXTURES.md section 2).  End state = orders minus the %7 keys, with
%5 keys' totalprice doubled; the view is the per-customer spend rollup
(the reference's ``customer_purchase_summary`` shape,
``notebooks/0_start_here.ipynb:215-245``, on the driver schema).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.testdata import load_table
from ..streaming.changefeed import CDCPipeline
from ..streaming.dynamic_table import DynamicTable, DynamicTableManager
from ..streaming.store import ParquetTableStore

#: lsn offsets putting updates above inserts and deletes above both,
#: per key, regardless of key magnitude (TPC-H orderkeys < 2^40)
_U_OFF = 1 << 40
_D_OFF = 1 << 41


def _envelope(df: DataFrame, op: str, lsn: F.Column) -> DataFrame:
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(
        F.lit(op).alias("op"),
        lsn.cast("long").alias("lsn"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.lit("orders").alias("table_name"),
        payload.alias("after_json"),
    )


def _spend_view(tables: dict[str, DataFrame]) -> DataFrame:
    return (
        tables["orders"]
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum("o_totalprice").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def drive_cdc_pipeline(
    spark: SparkSession, sf_dir: str, store: ParquetTableStore
) -> DynamicTableManager:
    """Bootstrap + three envelope applies + attached incremental view
    refresh into ``store``; returns the manager (tests inspect its
    refresh history -- the three data batches must cascade
    INCREMENTALly, never through the full-rebuild fallback)."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    snapshot = orders.filter(key % 3 != 0)
    inserts = orders.filter(key % 3 == 0)
    updates = orders.filter(key % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(2.0)
    )
    deletes = orders.filter(key % 7 == 0).select("o_orderkey")

    p = CDCPipeline(
        spark,
        store,
        schemas={"orders": orders.schema},
        primary_keys={"orders": "o_orderkey"},
        fact_tables=("orders",),
    )
    p.bootstrap({"orders": snapshot})
    mgr = DynamicTableManager(spark, store)
    mgr.create(
        DynamicTable(
            "customer_spend",
            _spend_view,
            fact_table="orders",
            fact_key="o_orderkey",
            view_key="custkey",
            group_col="o_custkey",
        )
    )
    mgr.attach(p)
    for i, env in enumerate(
        (
            _envelope(inserts, "I", key),
            _envelope(updates, "U", key + F.lit(_U_OFF)),
            _envelope(deletes, "D", key + F.lit(_D_OFF)),
        )
    ):
        p.apply_envelope_batch(env, batch_id=i)
    return mgr


def q_cdc_pipeline_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    with tempfile.TemporaryDirectory() as tmp:
        mgr = drive_cdc_pipeline(spark, sf_dir, ParquetTableStore(tmp))
        # the store dir dies with the context manager -- pin the result
        # rows into the block manager first (eager localCheckpoint)
        return mgr.read("customer_spend").localCheckpoint()


SQL_CDC_PIPELINE_STATE = """
WITH final AS (
  SELECT o_custkey,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2.0::DOUBLE
              ELSE o_totalprice END AS tp
  FROM orders
  WHERE o_orderkey % 7 <> 0
)
SELECT o_custkey AS custkey,
       sum(tp) AS total_spend,
       CAST(count(*) AS BIGINT) AS n_orders
FROM final
GROUP BY o_custkey
"""


CDC_CATALOG = {
    "cdc_pipeline_state": (q_cdc_pipeline_state, SQL_CDC_PIPELINE_STATE),
}

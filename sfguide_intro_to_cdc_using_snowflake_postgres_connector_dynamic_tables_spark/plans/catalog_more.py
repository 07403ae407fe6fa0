"""Wider analytics surface: window family, multi-level aggregation,
pivot, as-of join, exact percentiles, and a dedup composition -- the
operators a reference user reaches for right after the quickstart's
workload, each as a (Spark builder, DuckDB oracle) pair under the
hash-match gate.

Scale notes live with the operators (operators/window_ops.py): every
window entry is a single Exchange on its partition key; rollup/pivot
are ordinary partial+final aggregations; the as-of join is the union
trick (one shuffle, no range explosion) and its ORACLE is DuckDB's
native ASOF JOIN -- two independent formulations agreeing exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text
from ..operators.window_ops import analytic_window, asof_join, sessionize
from ..sources.testdata import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Analytic window pack: lag/lead/row_number/running sum in ONE window.
# ---------------------------------------------------------------------------

def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytic_window(
        _t(spark, sf_dir, "events"), key="user_id", order=["ts", "event_id"], value="value"
    )


SQL_WINDOW_ANALYTICS = """
SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       row_number() OVER w AS seq,
       sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
"""


# ---------------------------------------------------------------------------
# Sessionization (gaps-and-islands): 30-minute inactivity gap.
# ---------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_t(spark, sf_dir, "events"), gap_seconds=1800)


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
  FROM events
)
SELECT user_id, event_id, ts,
       sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
FROM g
"""


# ---------------------------------------------------------------------------
# ROLLUP: subtotals + grand total in one pass ('ALL' labels -- the
# source columns are non-null, so the label is unambiguous).
# ---------------------------------------------------------------------------

def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


SQL_ROLLUP_PRICING = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       sum(l_quantity) AS sum_qty, count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# PIVOT: revenue by priority x status (fixed value list -> stable schema).
# ---------------------------------------------------------------------------

def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
    )


SQL_PIVOT_STATUS = """
SELECT o_orderpriority,
       sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS "F",
       sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS "O",
       sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) AS "P"
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# As-of join: each event picks up the user's most recent order price.
# Engine = distributed union trick; oracle = DuckDB's NATIVE ASOF JOIN
# (independent formulations must agree row-for-row).
# ---------------------------------------------------------------------------

def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders")
    # dedupe to the winning order per (custkey, orderdate) so <=-ties
    # are deterministic on both sides
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    od = (
        orders.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("order_ts"),
            F.col("o_totalprice"),
        )
    )
    return asof_join(
        events,
        od,
        key="user_id",
        left_ts="ts",
        right_ts="order_ts",
        value="o_totalprice",
        out_col="last_order_price",
    )


SQL_ASOF_LAST_ORDER = """
WITH od AS (
  SELECT o_custkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders QUALIFY rn = 1
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
       od.o_totalprice AS last_order_price
FROM events e ASOF LEFT JOIN od
  ON e.user_id = od.o_custkey AND CAST(e.ts AS TIMESTAMP) >= od.o_orderdate
"""


# ---------------------------------------------------------------------------
# Exact percentiles (linear interpolation in both engines).
# ---------------------------------------------------------------------------

def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
            F.percentile("l_extendedprice", 0.5).alias("median_price"),
        )
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       quantile_cont(l_extendedprice, 0.5) AS median_price
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Dedup composition: keep the highest-quality doc per exact-dup group.
# ---------------------------------------------------------------------------

def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_hash"), "doc_id"
    ).join(text.quality_score(docs), "doc_id")
    w = Window.partitionBy("text_hash").orderBy(F.desc("quality"), F.asc("doc_id"))
    grp = Window.partitionBy("text_hash")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(grp))
        .filter(F.col("__rn") == 1)
        .select(
            "text_hash",
            F.col("doc_id").alias("best_doc_id"),
            F.col("quality").alias("best_quality"),
            "dup_count",
        )
    )


SQL_DEDUP_KEEP_BEST = """
WITH q AS (
  SELECT doc_id, md5(text) AS text_hash,
         least(length(text) / 500.0, 1.0) * 0.4
         + (len(list_distinct(toks)) * 1.0 / len(toks)) * 0.4
         + least(len(list_filter(toks,
               x -> x IN ('the','a','an','and','of','to','in','is'))) / 5.0, 1.0) * 0.2
           AS quality
  FROM (SELECT doc_id, text,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents)
),
r AS (
  SELECT text_hash, doc_id, quality,
         row_number() OVER (PARTITION BY text_hash
                            ORDER BY quality DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY text_hash) AS dup_count
  FROM q
)
SELECT text_hash, doc_id AS best_doc_id, quality AS best_quality, dup_count
FROM r WHERE rn = 1
"""


MORE_CATALOG: dict[str, tuple] = {
    "window_analytics": (q_window_analytics, SQL_WINDOW_ANALYTICS),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "rollup_pricing": (q_rollup_pricing, SQL_ROLLUP_PRICING),
    "pivot_status": (q_pivot_status, SQL_PIVOT_STATUS),
    "asof_last_order": (q_asof_last_order, SQL_ASOF_LAST_ORDER),
    "percentiles": (q_percentiles, SQL_PERCENTILES),
    "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
}

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
from ..operators.corpus import _spread_small_input
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
       CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_seq
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
    # F.percentile's in-memory group buffer is the faster form at this
    # group size (measured 1.8 s vs 2.9 s for the window-sort variant
    # at sf0.1); it cannot spill, so for huge groups the spill-safe
    # exact form is operators/window_ops.py::exact_percentiles
    # (differential-tested equal) and the sketch bounds are
    # operators/sketches.py.
    # both l_quantity percentiles from ONE aggregation buffer (array
    # percentage form): the Percentile buffer is a per-group value->
    # count map, so two scalar calls on the same column build and
    # serialize that map twice -- the array form builds it once and
    # evaluates both cut points from it, bit-identical results
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", [0.5, 0.9]).alias("__qty_pcts"),
            F.percentile("l_extendedprice", 0.5).alias("median_price"),
        )
        .select(
            "l_returnflag",
            F.col("__qty_pcts")[0].alias("median_qty"),
            F.col("__qty_pcts")[1].alias("p90_qty"),
            "median_price",
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
    # hash + score in ONE projection (extra=) -- the old two-frame
    # join on doc_id re-scanned the corpus and shuffled twice for a
    # purely per-row computation (VERDICT r8)
    scored = text.quality_score(
        docs, extra={"text_hash": F.md5(F.encode(F.col("text"), "UTF-8"))}
    )
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


# ---------------------------------------------------------------------------
# String-function pack (all JVM built-ins, codegen'd).
# ---------------------------------------------------------------------------

def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lower("c_mktsegment").alias("lower_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.substring("c_name", 3, 5).alias("name_mid"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.length("c_name").alias("name_len"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("joined"),
    )


SQL_STRING_FUNCTIONS = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       lower(c_mktsegment) AS lower_seg,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       substr(c_name, 3, 5) AS name_mid,
       replace(c_name, '#', '-') AS dashed,
       regexp_extract(c_name, '[0-9]+') AS digits,
       split_part(c_name, '#', 2) AS after_hash,
       reverse(c_mktsegment) AS rev_seg,
       length(c_name) AS name_len,
       strpos(c_name, '#') AS hash_pos,
       concat_ws('-', c_mktsegment, c_name) AS joined
FROM customer
"""


# ---------------------------------------------------------------------------
# Datetime pack (dayofweek aligned to Sunday=0 in both engines).
# ---------------------------------------------------------------------------

def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("week", "ts").cast("date").alias("week_start"),
        F.date_trunc("month", "ts").cast("date").alias("month_start"),
        (F.dayofweek("ts") - 1).alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.year("ts").alias("yr"),
        F.quarter("ts").alias("qtr"),
        F.last_day(F.to_date("ts")).alias("month_end"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("days_since"),
    )


SQL_DATETIME_FUNCTIONS = """
SELECT event_id,
       CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week_start,
       CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS month_start,
       dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
       dayofyear(CAST(ts AS TIMESTAMP)) AS doy,
       year(CAST(ts AS TIMESTAMP)) AS yr,
       quarter(CAST(ts AS TIMESTAMP)) AS qtr,
       last_day(CAST(ts AS DATE)) AS month_end,
       datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
FROM events
"""


# ---------------------------------------------------------------------------
# Set operations (SURVEY 2.6 -- none in the reference, standard surface).
# ---------------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # INTERSECT == left-semi and EXCEPT == left-anti on distinct inputs;
    # the join formulation broadcasts the smaller key set instead of
    # Spark's replicaterows INTERSECT/EXCEPT-ALL construction, and the
    # two distinct aggregates are shared across all three branches
    # (ReusedExchange) -- the scale-friendly shape for cohort splits.
    with_orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey")).distinct()
    with_events = _t(spark, sf_dir, "events").select(F.col("user_id").alias("custkey")).distinct()
    both = with_orders.join(with_events, "custkey", "left_semi").select(
        "custkey", F.lit("both").alias("cohort")
    )
    orders_only = with_orders.join(with_events, "custkey", "left_anti").select(
        "custkey", F.lit("orders_only").alias("cohort")
    )
    events_only = with_events.join(with_orders, "custkey", "left_anti").select(
        "custkey", F.lit("events_only").alias("cohort")
    )
    return both.unionByName(orders_only).unionByName(events_only)


SQL_SET_OPS = """
WITH wo AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
     we AS (SELECT DISTINCT user_id AS custkey FROM events)
SELECT custkey, 'both' AS cohort FROM (SELECT custkey FROM wo INTERSECT SELECT custkey FROM we)
UNION ALL
SELECT custkey, 'orders_only' FROM (SELECT custkey FROM wo EXCEPT SELECT custkey FROM we)
UNION ALL
SELECT custkey, 'events_only' FROM (SELECT custkey FROM we EXCEPT SELECT custkey FROM wo)
"""


# ---------------------------------------------------------------------------
# Grouped COUNT(DISTINCT).
# ---------------------------------------------------------------------------

def q_grouped_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SQL_GROUPED_COUNT_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Training-corpus filter: the end-to-end composition a data pipeline
# actually runs -- exact-dedup keeper ∩ language gate ∩ quality gate.
# ---------------------------------------------------------------------------

def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE scan (fused quality+language projection, md5 alongside), one
    # exchange: identical text => identical scores, so an md5-dup group
    # passes or fails the gates TOGETHER and filtering before the
    # keeper window is exact -- only gate survivors shuffle, and only
    # their 3 small columns, never the text.  min-over-window replaces
    # the groupBy+semi-join (one exchange instead of two + a 3rd scan).
    docs = _t(spark, sf_dir, "documents")
    prof = text.quality_lang(docs, extra={"__md5": F.md5(F.col("text"))})
    survivors = prof.filter(
        (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
    )
    w = Window.partitionBy("__md5")
    return (
        survivors.withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("__keep") == F.col("doc_id"))
        .select("doc_id", "quality", "lang_pred")
    )


SQL_CORPUS_FILTER = """
WITH t AS (
  SELECT doc_id, text, length(text) AS n_chars,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
quality AS (
  SELECT doc_id,
         least(n_chars / 500.0, 1.0) * 0.4
         + (len(list_distinct(toks)) * 1.0 / len(toks)) * 0.4
         + least(len(list_filter(toks,
               x -> x IN ('the','a','an','and','of','to','in','is'))) / 5.0, 1.0) * 0.2
           AS quality
  FROM t
),
s AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN ('the','a','and','of'))) AS score_en,
         len(list_filter(toks, x -> x IN ('der','die','das','und'))) AS score_de,
         len(list_filter(toks, x -> x IN ('el','la','los','y'))) AS score_es,
         len(list_filter(toks, x -> x IN ('le','la','les','et'))) AS score_fr,
         len(list_filter(toks, x -> x IN ('de5','le5','shi4','zai4'))) AS score_zh
  FROM t
),
lang AS (
  SELECT doc_id,
         CASE WHEN greatest(score_en, score_de, score_es, score_fr, score_zh) = 0 THEN 'und'
              WHEN score_en = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'en'
              WHEN score_de = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'de'
              WHEN score_es = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'es'
              WHEN score_fr = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'fr'
              ELSE 'zh' END AS lang_pred
  FROM s
),
keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT q.doc_id, q.quality, l.lang_pred
FROM quality q
JOIN lang l USING (doc_id)
WHERE q.doc_id IN (SELECT doc_id FROM keepers)
  AND q.quality >= 0.5 AND l.lang_pred = 'en'
"""


# ---------------------------------------------------------------------------
# Composite analytics (TPC-H Q3/Q5/Q10 shapes on the driver schema):
# multi-join + filter + agg + top-k in one plan -- the workloads join
# ordering and broadcast decisions actually matter for.
# ---------------------------------------------------------------------------

def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.testdata import broadcast_if_small

    cutoff = F.lit("1998-06-30").cast("timestamp")
    # customer is fact-sized at large SF: size-gate the broadcast hint
    # so AQE decides once the footprint outgrows the driver.
    c = broadcast_if_small(
        _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING"),
        sf_dir,
        "customer",
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


SQL_Q3_TOP_ORDERS = """
SELECT l_orderkey AS orderkey, o_orderdate AS orderdate,
       o_orderpriority AS orderpriority,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate > TIMESTAMP '1998-06-30'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, orderkey ASC LIMIT 10
"""


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.testdata import broadcast_if_small

    # nation/region are fixed-cardinality (25/5 rows) -- always
    # broadcast. supplier/customer grow with SF -- size-gate the hint.
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    s = broadcast_if_small(_t(spark, sf_dir, "supplier"), sf_dir, "supplier")
    c = broadcast_if_small(_t(spark, sf_dir, "customer"), sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


SQL_Q5_REGION_VOLUME = """
SELECT n_name AS nation, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.testdata import broadcast_if_small

    c = broadcast_if_small(_t(spark, sf_dir, "customer"), sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


SQL_Q10_RETURNED_REVENUE = """
SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal,
       n_name AS nation,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, custkey ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# UNPIVOT (melt): wide metric columns -> long (metric, val) rows.
# ---------------------------------------------------------------------------

def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )


SQL_UNPIVOT_METRICS = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


# ---------------------------------------------------------------------------
# Array-function pack over the embedding column (scalar outputs so the
# driver's row canonicalization applies).
# ---------------------------------------------------------------------------

def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.array_min(v).alias("v_min"),
        F.array_max(v).alias("v_max"),
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x).alias("v_sum"),
        F.element_at(v, 1).alias("first_component"),
        F.aggregate(F.slice(v, 1, 4), F.lit(0.0), lambda acc, x: acc + x).alias("head4_sum"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
    )


SQL_ARRAY_FUNCTIONS = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id,
       len(v) AS dim,
       list_min(v) AS v_min,
       list_max(v) AS v_max,
       list_sum(v) AS v_sum,
       v[1] AS first_component,
       list_sum(list_slice(v, 1, 4)) AS head4_sum,
       len(list_filter(v, x -> x > 0)) AS n_positive
FROM e
"""


# ---------------------------------------------------------------------------
# Salted skew join under the oracle gate: result must equal the plain
# join.  Salting replicates the build side n_salts times and spreads
# each hot probe key over n_salts reducers -- the manual lever for the
# single-hot-key case AQE's skew splitting can't always fix.
# ---------------------------------------------------------------------------

def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        salted_join(o, c, on="o_custkey")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum("o_totalprice").alias("total_price"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )


SQL_SKEW_JOIN_SALTED = """
SELECT c_mktsegment AS segment, sum(o_totalprice) AS total_price,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS through the SQL surface (cube/rollup's general
# form): detail + one subtotal level + grand total in one Expand pass.
# ---------------------------------------------------------------------------

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
               CAST(count(1) AS BIGINT) AS n_rows,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# ---------------------------------------------------------------------------
# Top-k per group via the two-level salted window (operators/window_ops
# .topk_per_group) -- same rows as the naive one-window form the oracle
# runs, but bounded reducers at any group-size skew.
# ---------------------------------------------------------------------------

def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.window_ops import topk_per_group
    from ..sources.testdata import broadcast_if_small

    o = _t(spark, sf_dir, "orders")
    c = broadcast_if_small(_t(spark, sf_dir, "customer"), sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
    )
    return topk_per_group(
        j, ("segment",), "totalprice", k=3, tiebreak_cols=("orderkey",)
    )


SQL_TOPK_PER_GROUP = """
WITH j AS (
  SELECT c_mktsegment AS segment, o_orderkey AS orderkey,
         o_totalprice AS totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey),
r AS (
  SELECT segment, orderkey, totalprice,
         CAST(row_number() OVER (PARTITION BY segment
                                 ORDER BY totalprice DESC, orderkey ASC) AS INTEGER) AS rk
  FROM j)
SELECT segment, orderkey, totalprice, rk FROM r WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Ordered-step funnel (view -> click -> purchase): users counted at
# step k iff they performed it at-or-after their earliest completion
# of step k-1.  operators/funnel.py for the plan-shape notes.
# ---------------------------------------------------------------------------

def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


SQL_FUNNEL = """
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
s1 AS (SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t
       FROM e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t
       FROM e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)
SELECT 'view' AS step, 1 AS step_order, (SELECT count(*) FROM s1)::BIGINT AS n_users
UNION ALL
SELECT 'click', 2, (SELECT count(*) FROM s2)::BIGINT
UNION ALL
SELECT 'purchase', 3, (SELECT count(*) FROM s3)::BIGINT
"""


# ---------------------------------------------------------------------------
# Weekly cohort retention triangle over the events stream.
# ---------------------------------------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


SQL_COHORT_RETENTION = """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
cohorts AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
            FROM e GROUP BY 1),
activity AS (SELECT DISTINCT user_id,
                    CAST(date_trunc('week', ts) AS DATE) AS activity_week
             FROM e)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, activity_week) // 7 AS INT) AS week_offset,
       count(*)::BIGINT AS n_users
FROM activity JOIN cohorts USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Window frame pack: ntile / cume_dist / first_value / last_value /
# nth_value with explicit ROWS frames -- the frame-sensitive half of
# the window family (window_analytics covers lag/lead/row_number/
# running sum).  Still one Exchange on the partition key.
# ---------------------------------------------------------------------------

def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    trailing = w.rowsBetween(-2, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("value").over(full).alias("first_v"),
        F.last("value").over(full).alias("last_v"),
        F.nth_value("value", 2).over(full).alias("second_v"),
        F.avg("value").over(trailing).alias("trailing_avg3"),
    )


def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (time-based, not row-based): per-user
    trailing-1-hour event sum/count.  A physically distinct frame mode
    from ``window_frames``' ROWS frames -- the frame boundary follows
    the ORDER-BY VALUE (epoch seconds), so tied timestamps are peers
    and sparse gaps shrink the frame; the classic 'rolling metric over
    the last N minutes' shape.  One exchange on user_id."""
    e = _t(spark, sf_dir, "events")
    ep = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ep)
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        ep.alias("ep"),
        F.sum("value").over(w).alias("hr_sum"),
        F.count(F.lit(1)).over(w).alias("hr_n"),
    )


SQL_RANGE_WINDOW = """
-- floor(), not CAST: DuckDB's double->BIGINT cast ROUNDS while
-- Spark's timestamp->long cast truncates sub-second parts
SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
       sum(value) OVER w AS hr_sum,
       count(*) OVER w AS hr_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


SQL_WINDOW_FRAMES = """
SELECT user_id, event_id, value,
       ntile(4) OVER w AS quartile,
       cume_dist() OVER w AS cdist,
       first_value(value) OVER wf AS first_v,
       last_value(value) OVER wf AS last_v,
       nth_value(value, 2) OVER wf AS second_v,
       avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS trailing_avg3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id),
       wf AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# Session analytics: the aggregate layer over sessionize -- duration,
# event count, and value sum per (user, session); the downstream half
# of every session-based dashboard.  Window shuffle + one agg on the
# same key prefix.
# ---------------------------------------------------------------------------

def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        sessionize(e, gap_seconds=1800, keep=("value",))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("long")
            .alias("duration_sec"),
            F.sum("value").alias("total_value"),
        )
    )


SQL_SESSION_STATS = """
WITH g AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
  FROM events
),
s AS (
  SELECT user_id, event_id, value, ts,
         CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                       THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_events,
       CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec,
       sum(value) AS total_value
FROM s GROUP BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# Last-touch attribution: each purchase credited to the user's most
# recent preceding view/click (ties at the same timestamp go to the
# touch, matching the as-of <= contract); purchases with no preceding
# touch are 'direct'.  Engine = the union-trick as-of join; oracle =
# DuckDB's native ASOF JOIN -- independent formulations.
# ---------------------------------------------------------------------------

def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # dedupe touches on (user, ts): keep the winner by (type desc,
    # event_id desc) so <=-ties are deterministic on both engines
    touches = e.filter(F.col("event_type").isin("view", "click"))
    w = Window.partitionBy("user_id", "ts").orderBy(
        F.desc("event_type"), F.desc("event_id")
    )
    td = (
        touches.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.col("ts").alias("touch_ts"), F.col("event_type").alias("touch_type"))
    )
    attributed = asof_join(
        purchases,
        td,
        key="user_id",
        left_ts="ts",
        right_ts="touch_ts",
        value="touch_type",
        out_col="last_touch",
    )
    return (
        attributed.groupBy(
            F.coalesce("last_touch", F.lit("direct")).alias("last_touch")
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("value").alias("attributed_value"),
        )
    )


SQL_ATTRIBUTION = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS touch_ts, event_type AS touch_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
                            ORDER BY event_type DESC, event_id DESC) AS rn
  FROM events WHERE event_type IN ('view', 'click') QUALIFY rn = 1),
a AS (
  SELECT p.event_id, p.value, t.touch_type
  FROM p ASOF LEFT JOIN t
    ON p.user_id = t.user_id AND p.ts >= t.touch_ts)
SELECT coalesce(touch_type, 'direct') AS last_touch,
       CAST(count(*) AS BIGINT) AS n_purchases,
       sum(value) AS attributed_value
FROM a GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Path analysis: the first-order Markov transition matrix over each
# user's event stream -- the "what happens after X" view that
# complements the fixed-path funnel.  One user-keyed lead window +
# a tiny pair count; the probability normalizes within each source
# event over the O(types^2) aggregate.
# ---------------------------------------------------------------------------

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


SQL_EVENT_TRANSITIONS = """
WITH p AS (
  SELECT event_type,
         CASE WHEN lead(1) OVER w IS NULL THEN '(end)'
              ELSE lead(event_type) OVER w END AS next_event
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id)),
c AS (SELECT event_type, next_event, count(*) AS n FROM p GROUP BY 1, 2)
SELECT event_type, next_event, CAST(n AS BIGINT) AS n_transitions,
       round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 6) AS p
FROM c
"""


# ---------------------------------------------------------------------------
# Daily-volume anomaly detection: trailing 7-day z-score per day,
# current day excluded from its own baseline.  The window runs over
# the O(days) daily aggregate, never the event stream.
# ---------------------------------------------------------------------------

def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import daily_anomalies

    return daily_anomalies(_t(spark, sf_dir, "events"))


SQL_ANOMALY_DAYS = """
WITH o AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1),
s AS (
  SELECT CAST(unnest(generate_series(
           (SELECT min(day) FROM o),
           (SELECT max(day) FROM o),
           INTERVAL 1 DAY)) AS DATE) AS day),
d AS (
  SELECT s.day, coalesce(o.n, 0) AS n
  FROM s LEFT JOIN o ON s.day = o.day)
SELECT day, CAST(n AS BIGINT) AS n_events,
       round(avg(n) OVER w, 6) AS trail_avg,
       round(stddev_samp(n) OVER w, 6) AS trail_std,
       CASE WHEN count(n) OVER w >= 2 AND stddev_samp(n) OVER w > 0
            THEN round((n - avg(n) OVER w) / stddev_samp(n) OVER w, 4)
       END AS z
FROM d
WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
"""


# ---------------------------------------------------------------------------
# Time-series gap-fill + LOCF (TimescaleDB time_bucket_gapfill /
# locf): per event_type, materialize EVERY hourly bucket across the
# table's time range (sequence + explode -- no driver loop), zero-fill
# missing counts, and carry the last observed hourly average forward
# with an ignore-nulls running window.  Scale shape: the bucket frame
# is O(#types x #hours) regardless of event count, the hourly
# pre-aggregation is the only event-proportional shuffle, and the LOCF
# window's per-partition state is bounded by the time range, never the
# data.
# ---------------------------------------------------------------------------

def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    rng = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    buckets = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(rng))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("bucket"),
        )
    )
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("__n"), F.avg("value").alias("__av"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        buckets.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_events"),
            F.round(
                F.last(F.col("__av"), ignorenulls=True).over(w), 4
            ).alias("value_locf"),
        )
    )


def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps (TimescaleDB's interpolate()):
    each empty bucket takes the value on the line between its nearest
    known neighbors -- LOCF's window runs forward, this adds the
    NOCB-direction ignore-nulls window and the slope math.  Buckets
    outside the known range (no neighbor on one side) stay NULL,
    matching interpolate()'s contract.

    Gate robustness: the raw double `value` is quantized to integer
    milli-units (floor(v*1000+0.5) -- floor, not round, so both engines
    resolve ties identically) BEFORE the hourly avg.  Exact integer
    sums make the avg, and therefore every downstream IEEE op, bit
    identical between Spark and the oracle; the result is emitted as a
    BIGINT milli-unit column (`value_interp_mu`) so the driver's 2dp
    canonicalizer can never land on a float rounding tie.  Same class
    of fix as pagerank's x N rank scaling (catalog_more.py)."""
    e = _t(spark, sf_dir, "events")
    rng = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    buckets = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(rng))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("bucket"),
        )
    )
    value_mu = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.avg(value_mu).alias("__av"))
    back = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_t = F.when(F.col("__av").isNotNull(), F.col("bucket"))
    t = F.unix_timestamp("bucket")
    t0 = F.unix_timestamp(F.last(known_t, ignorenulls=True).over(back))
    t1 = F.unix_timestamp(F.first(known_t, ignorenulls=True).over(fwd))
    v0 = F.last(F.col("__av"), ignorenulls=True).over(back)
    v1 = F.first(F.col("__av"), ignorenulls=True).over(fwd)
    interp = F.when(F.col("__av").isNotNull(), F.col("__av")).otherwise(
        F.when(
            t0.isNotNull() & t1.isNotNull() & (t1 > t0),
            v0 + (v1 - v0) * (t - t0) / (t1 - t0),
        )
    )
    return buckets.join(hourly, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.floor(interp).cast("long").alias("value_interp_mu"),
    )


SQL_GAPFILL_INTERP = """
WITH rng AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
t AS (SELECT DISTINCT event_type FROM events),
b AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM t, rng),
h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         avg(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS av
  FROM events GROUP BY 1, 2),
j AS (
  SELECT b.event_type, b.bucket, h.av,
         CASE WHEN h.av IS NOT NULL THEN b.bucket END AS kt
  FROM b LEFT JOIN h ON b.event_type = h.event_type AND b.bucket = h.bucket),
w AS (
  SELECT event_type, bucket, av,
         epoch(bucket) AS tt,
         epoch(last_value(kt IGNORE NULLS) OVER back) AS t0,
         epoch(first_value(kt IGNORE NULLS) OVER fwd) AS t1,
         last_value(av IGNORE NULLS) OVER back AS v0,
         first_value(av IGNORE NULLS) OVER fwd AS v1
  FROM j
  WINDOW back AS (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT event_type, bucket,
       CAST(floor(CASE WHEN av IS NOT NULL THEN av
                       WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                       THEN v0 + (v1 - v0) * (tt - t0) / (t1 - t0)
                  END) AS BIGINT) AS value_interp_mu
FROM w
"""


SQL_GAPFILL_LOCF = """
WITH rng AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
t AS (SELECT DISTINCT event_type FROM events),
b AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM t, rng),
h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         count(*) AS n, avg(value) AS av
  FROM events GROUP BY 1, 2)
SELECT b.event_type, b.bucket,
       coalesce(h.n, 0) AS n_events,
       round(last_value(h.av IGNORE NULLS) OVER (
         PARTITION BY b.event_type ORDER BY b.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value_locf
FROM b LEFT JOIN h ON b.event_type = h.event_type AND b.bucket = h.bucket
"""


# ---------------------------------------------------------------------------
# Total-order sort (the TeraSort pattern): a full ORDER BY materializes
# through Exchange rangepartitioning -- sampled range bounds, one
# shuffle, per-partition sorts, NO single-reducer bottleneck.  Every
# other ordered entry here cuts with TakeOrdered; this one pins the
# scale path for "write the whole table sorted" (sorted parquet layout,
# z-order prep, sorted-run export).
# ---------------------------------------------------------------------------

def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )


SQL_GLOBAL_SORT = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
"""


# ---------------------------------------------------------------------------
# Triangle counting over the part co-purchase graph (market-basket
# graph analytics; operators/graph.py).  Edges = part pairs sharing an
# order in >= 2 distinct orders; per-part triangle membership is the
# local-clustering numerator.  Oriented wedge-join (Suri &
# Vassilvitskii WWW'11): joins + aggregations only, no iteration; the
# degree-orientation variant (property-tested equal) bounds wedge
# fan-out by O(sqrt(m)) under hub skew.
# ---------------------------------------------------------------------------

def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, triangle_participation

    li = _t(spark, sf_dir, "lineitem")
    # materialize the edge list once: it feeds the wedge join THREE
    # times (both wedge sides + the closing probe); without this the
    # lineitem self-join re-executes per consumer
    edges = copurchase_edges(li, min_support=2).localCheckpoint()
    return (
        # degree orientation: output-identical (property-tested in
        # tests/test_graph.py) but wedge fan-out is O(sqrt(m)) per
        # vertex under hub skew -- the form you'd run at 100x
        triangle_participation(edges, orient="degree")
        .select(F.col("v").alias("part"), "triangles")
        .orderBy(F.desc("triangles"), F.asc("part"))
        .limit(20)
    )


SQL_TRIANGLE_COUNT = """
WITH e AS (
  SELECT a, b FROM (
    SELECT l1.l_partkey AS a, l2.l_partkey AS b,
           count(DISTINCT l1.l_orderkey) AS support
    FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
    WHERE l1.l_partkey < l2.l_partkey
    GROUP BY 1, 2) WHERE support >= 2),
w AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b),
t AS (SELECT w.a, w.b, w.c FROM w JOIN e ON e.a = w.b AND e.b = w.c),
v AS (SELECT a AS part FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t)
SELECT part, CAST(count(*) AS BIGINT) AS triangles
FROM v GROUP BY part ORDER BY triangles DESC, part ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Character-entropy quality signal: per-doc Shannon entropy over the
# character distribution (nats).  Low entropy = repetitive/degenerate
# text (keyboard mash, repeated separators) that survives length and
# stopword checks; a standard pretraining-corpus heuristic next to
# the compression-ratio filter.  Two keyed aggregations (doc x char,
# then doc), all codegen.
# ---------------------------------------------------------------------------

def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), ""), lambda c: c != F.lit(""))
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            (
                -F.sum(F.col("c") * F.log(F.col("c")))
            ).alias("__s"),
        )
        .select(
            "doc_id",
            "n",
            ((F.col("__s") / F.col("n")) + F.log("n")).alias("char_entropy"),
        )
        .orderBy("doc_id")
    )


# entropy identity used on both sides: -sum(p ln p) with p = c/n
# equals  ln(n) - sum(c ln c)/n  -- avoids per-row division before the
# aggregate (one multiply-log per distinct (doc, char) instead).
SQL_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ''), x -> x <> '')) AS ch
  FROM documents),
counts AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n,
       ln(sum(c)) - sum(c * ln(c)) / sum(c) AS char_entropy
FROM counts GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Bigram LM scoring: per-doc average conditional log-probability
# ln P(w2|w1) under corpus bigram counts with add-k smoothing -- the
# conditional sibling of unigram_logprob (fluency/novelty signal: low
# scores flag word-salad docs whose unigrams look normal).  Two corpus
# aggregations (bigram and unigram counts) + two keyed joins back;
# docs with < 2 tokens drop out (no bigrams to score).
# ---------------------------------------------------------------------------

def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens(F.col("text")).alias("tk"))
    n = F.size("tk")
    bigrams = F.zip_with(
        F.slice("tk", 1, n - 1),
        F.slice("tk", 2, n - 1),
        lambda a, b: F.concat_ws("\x1f", a, b),
    )
    # tokens() is an interpreted HOF (filter over split -- no codegen),
    # and this plan re-evaluated it once per consumer: the dbg join
    # side, cbg, uni->cw, and uni->v each re-tokenized the corpus (~5
    # passes).  Materialize the exploded bigrams and the word counts
    # ONCE (the same localCheckpoint-shared-scan pattern as
    # basket_rules), and derive the vocabulary size from cw's row
    # count instead of a third tokenize+distinct pass -- 5 tokenize
    # passes -> 2.
    dbg = toks.filter(n >= 2).select(
        "doc_id", F.explode(bigrams).alias("bg")
    ).localCheckpoint()
    cbg = dbg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    cw = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
        .localCheckpoint()
    )
    v = cw.select(F.count(F.lit(1)).alias("v"))
    return (
        dbg.join(cbg, "bg")
        .withColumn("w1", F.split("bg", "\x1f").getItem(0))
        .join(cw, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(
                F.log((F.col("c_bg") + 0.5) / (F.col("c_w") + 0.5 * F.col("v")))
            ).alias("avg_bigram_logprob"),
        )
        .orderBy("doc_id")
    )


SQL_BIGRAM_LOGPROB = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents),
dbg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                        i -> tk[i] || chr(31) || tk[i + 1])) AS bg
  FROM base WHERE len(tk) >= 2),
cbg AS (SELECT bg, count(*) AS c_bg FROM dbg GROUP BY 1),
uni AS (SELECT unnest(tk) AS w FROM base),
cw AS (SELECT w, count(*) AS c_w FROM uni GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS v FROM uni)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       avg(ln((c_bg + 0.5) / (c_w + 0.5 * v.v))) AS avg_bigram_logprob
FROM dbg JOIN cbg USING (bg)
JOIN cw ON cw.w = string_split(bg, chr(31))[1]
CROSS JOIN v
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Table profiling: the warehouse staple "describe my table" -- null
# rates, exact distinct counts, numeric min/max/mean, string length
# stats -- as ONE pass over orders (a single aggregate node; partial
# aggregation map-side, one exchange of a single row per partition).
# ---------------------------------------------------------------------------

def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("custkey_nulls"),
        F.count_distinct("o_custkey").alias("custkey_distinct"),
        F.count_distinct("o_orderstatus").alias("status_distinct"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.avg("o_totalprice").alias("price_mean"),
        F.min("o_orderdate").alias("date_min"),
        F.max("o_orderdate").alias("date_max"),
        F.avg(F.length("o_orderpriority")).alias("priority_len_mean"),
        F.max(F.length("o_orderpriority")).alias("priority_len_max"),
    )


SQL_PROFILE_TABLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_nulls,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
       min(o_totalprice) AS price_min,
       max(o_totalprice) AS price_max,
       avg(o_totalprice) AS price_mean,
       min(o_orderdate) AS date_min,
       max(o_orderdate) AS date_max,
       avg(length(o_orderpriority)) AS priority_len_mean,
       CAST(max(length(o_orderpriority)) AS INT) AS priority_len_max
FROM orders
"""


# ---------------------------------------------------------------------------
# K-hop reachability: layered BFS (frontier join + visited anti-join
# per hop) from the 5 lowest-id vertices of the co-purchase graph --
# the fixed-depth recursive-traversal shape (WITH RECURSIVE in the
# oracle).  Output: vertices at each minimal distance 1..3 per source.
# ---------------------------------------------------------------------------

def q_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, khop_reachability

    li = _t(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, min_support=2).localCheckpoint()
    sources = (
        edges.select(F.col("a").alias("src"))
        .unionAll(edges.select(F.col("b").alias("src")))
        .distinct()
        .orderBy("src")
        .limit(5)
    )
    reach = khop_reachability(edges, sources, max_hops=3)
    return (
        reach.filter(F.col("dist") >= 1)
        .groupBy("src", "dist")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("src", "dist")
    )


SQL_KHOP_REACHABILITY = """
WITH RECURSIVE e AS (
  SELECT a, b FROM (
    SELECT l1.l_partkey AS a, l2.l_partkey AS b,
           count(DISTINCT l1.l_orderkey) AS support
    FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
    WHERE l1.l_partkey < l2.l_partkey
    GROUP BY 1, 2) WHERE support >= 2),
bi AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
seeds AS (SELECT DISTINCT s FROM bi ORDER BY s LIMIT 5),
walk(src, v, dist) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT w.src, bi.d, w.dist + 1
  FROM walk w JOIN bi ON bi.s = w.v WHERE w.dist < 3),
best AS (SELECT src, v, min(dist) AS dist FROM walk GROUP BY 1, 2)
SELECT src, dist, CAST(count(*) AS BIGINT) AS n
FROM best WHERE dist BETWEEN 1 AND 3
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis-Spirakis A-ES, one-pass):
# key = ln(u)/w with u an md5-derived uniform, take the k largest keys
# -- inclusion probability proportional to weight, yet a pure function
# of ids (reruns/backfills pick the identical sample; no RNG, no seed
# plumbing).  Weight = document length, the token-budget-proportional
# choice for training-mix sampling.  Plan: scan + TakeOrdered (map-side
# partial top-k, no global sort); at 100 TB this is one pass and a
# k-row driver fetch.
# ---------------------------------------------------------------------------

def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # 13 hex nibbles = 52 bits, exact in a double; +1 keeps u in (0,1]
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(16**13 + 1))
    key = F.log(u) / F.length("text")
    return (
        docs.filter(F.length("text") > 0)
        .select("doc_id", F.length("text").alias("n_chars"), key.alias("__k"))
        .orderBy(F.desc("__k"), F.asc("doc_id"))
        .limit(50)
        .drop("__k")
    )


# ---------------------------------------------------------------------------
# Association rules over co-purchase pairs (the market-basket classic):
# for each directed rule a -> b, support = P(a,b), confidence =
# P(b|a), lift = confidence / P(b).  Everything derives from two
# aggregates over lineitem (per-item basket counts, per-pair basket
# counts) joined back -- three keyed shuffles, no iteration; the basket
# self-join's fan-out is bounded by basket size.  Top-20 by lift.
# ---------------------------------------------------------------------------

def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # one grouped pass builds the per-order item set; pair generation
    # is a double explode of that set (bounded by basket size squared)
    # instead of a self-join -- one fewer exchange, and the three other
    # consumers (order count, item counts) read the same materialized
    # frame
    sets = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.collect_set(F.col("l_partkey")).alias("items"))
        .localCheckpoint()
    )
    # AQE right-sizes the grouped output by bytes (~5 MB at sf0.1 ->
    # ONE partition), so the double explode below -- the entry's only
    # heavy map stage, ~basket-size^2 row amplification -- ran on a
    # single core (profiled: 1.8 s of a 4 s warm pass in one task).
    # Spread the checkpointed frame to core count for the explode
    # consumers; fires only when partitions < cores, so at scale,
    # where the agg output is already wide, it is a no-op.
    spread = _spread_small_input(sets)
    n_orders = sets.select(F.count(F.lit(1)).alias("n_orders"))
    # materialized once (r14): the a-side and b-side joins alias the
    # counts differently, so their subtrees are not canonically equal
    # and ReuseExchange cannot kick in -- without the checkpoint the
    # explode+aggregate ran twice (plan showed two independent
    # Exchange->BroadcastExchange item_n subtrees)
    item_n = (
        spread.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .localCheckpoint()
    )
    # co-occurrence counts are symmetric (n_ab == n_ba: both count the
    # baskets holding {a,b}), so aggregate ordered a<b pairs only --
    # HALF the exploded rows, half the pair-shuffle bytes, half the
    # aggregate groups -- and emit the mirrored direction afterwards.
    # The union's second branch is a projection over the same aggregate
    # subtree, so the executed plan reuses the pair exchange instead of
    # re-running the explode.
    half = (
        spread.select(F.explode("items").alias("a"), "items")
        .select("a", F.explode("items").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    pair_n = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"), "n_ab")
    )
    # item_n is bounded by the part-key domain (|parts| rows, ~20k at
    # sf0.1) -- broadcast both join instances so the 10x-larger pair
    # frame never shuffles for them (post-agg size estimates are too
    # coarse for the planner to pick this on its own): 2 Exchange -> 0
    # on the rule-assembly joins
    return (
        pair_n.join(
            F.broadcast(item_n.withColumnsRenamed({"item": "a", "n_item": "n_a"})), "a"
        )
        .join(
            F.broadcast(item_n.withColumnsRenamed({"item": "b", "n_item": "n_b"})), "b"
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "a",
            "b",
            (F.col("n_ab") / F.col("n_orders")).alias("support"),
            (F.col("n_ab") / F.col("n_a")).alias("confidence"),
            (
                F.col("n_ab") * F.col("n_orders") / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


SQL_BASKET_RULES = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
n AS (SELECT count(DISTINCT o) AS n_orders FROM baskets),
item_n AS (SELECT item, count(*) AS n_item FROM baskets GROUP BY item),
pair_n AS (
  SELECT x.item AS a, y.item AS b, count(*) AS n_ab
  FROM baskets x JOIN baskets y ON x.o = y.o AND x.item <> y.item
  GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT a, b,
       n_ab * 1.0 / n.n_orders AS support,
       n_ab * 1.0 / ia.n_item AS confidence,
       n_ab * 1.0 * n.n_orders / (ia.n_item * ib.n_item) AS lift
FROM pair_n
JOIN item_n ia ON ia.item = a
JOIN item_n ib ON ib.item = b
CROSS JOIN n
ORDER BY lift DESC, a ASC, b ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Fixed-iteration PageRank over the same co-purchase graph: the
# iterative-algorithm staple next to connected components.  5 unrolled
# iterations, damping 0.85; ranks scaled by N (so cells sit at O(1)
# where the gate's 2dp rounding is meaningful).  The SQL oracle unrolls
# the identical recurrence as chained CTEs -- same joins, same sums.
# ---------------------------------------------------------------------------

def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, pagerank

    li = _t(spark, sf_dir, "lineitem")
    # the 5 rank iterations re-read the edge list ~3x each; pay the
    # lineitem self-join once
    edges = copurchase_edges(li, min_support=2).localCheckpoint()
    pr = pagerank(edges, iterations=5, damping=0.85)
    n = pr.groupBy().agg(F.count(F.lit(1)).alias("n"))
    return pr.crossJoin(F.broadcast(n)).select(
        F.col("v").alias("part"),
        (F.col("rank") * F.col("n")).alias("rank_x_n"),
    )


def _pagerank_sql(iterations: int = 5, damping: float = 0.85) -> str:
    head = """
WITH e AS (
  SELECT a, b FROM (
    SELECT l1.l_partkey AS a, l2.l_partkey AS b,
           count(DISTINCT l1.l_orderkey) AS support
    FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
    WHERE l1.l_partkey < l2.l_partkey
    GROUP BY 1, 2) WHERE support >= 2),
bi AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT src, count(*) AS deg FROM bi GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT src, deg, 1.0 / nn.n AS rank FROM deg CROSS JOIN nn)"""
    step = """,
r{i} AS (
  SELECT d.src, d.deg,
         (1.0 - {d}) / (SELECT n FROM nn)
         + {d} * coalesce(s.inflow, 0.0) AS rank
  FROM deg d LEFT JOIN (
    SELECT bi.dst AS v, sum(p.rank / p.deg) AS inflow
    FROM bi JOIN r{prev} p ON bi.src = p.src GROUP BY bi.dst) s
  ON d.src = s.v)"""
    body = "".join(
        step.format(i=i, prev=i - 1, d=damping) for i in range(1, iterations + 1)
    )
    return (
        head
        + body
        + f"""
SELECT src AS part, rank * (SELECT n FROM nn) AS rank_x_n FROM r{iterations}
"""
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape on the driver schema: join + dual conditional
# aggregation (CASE-sums split one measure by a priority predicate) --
# the classic "count by class within group" reporting query.
# ---------------------------------------------------------------------------

def q12_returnflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_Q12_PRIORITY_LINES = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING over a grouped subquery, joined back to the
# dims -- the "large-volume customers" pattern (aggregate filter first,
# then enrich only the qualifying keys).
# ---------------------------------------------------------------------------

def q18_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("customer_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "orderkey")
        .limit(100)
    )


SQL_Q18_VOLUME_CUSTOMERS = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c_custkey AS custkey, c_name AS customer_name,
       o_orderkey AS orderkey, o_orderdate AS orderdate,
       o_totalprice AS totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# GLOBAL-ORDER token-budget sequence packing (corpus-wide doc order,
# two-phase distributed prefix sum) -- the per-shard variant is
# catalog_train's "sequence_pack"; see operators/corpus.py
# sequence_pack_global for when each applies.
# ---------------------------------------------------------------------------

def q_sequence_pack_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import sequence_pack_global

    return sequence_pack_global(_t(spark, sf_dir, "documents"), budget=2048)


SQL_SEQUENCE_PACK_GLOBAL = """
WITH sized AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
           AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                  / 2048.0) AS BIGINT) AS bin_id
FROM sized
"""


def _weighted_sample_sql() -> str:
    from .catalog_pipeline import _hex_sql

    u13 = _hex_sql("md5(CAST(doc_id AS VARCHAR))", 13)
    return f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, length(text) AS n_chars,
         ln((({u13}) + 1.0) / {float(16**13 + 1)!r}) / length(text) AS k
  FROM documents WHERE length(text) > 0
  ORDER BY k DESC, doc_id ASC LIMIT 50)
"""


MORE_CATALOG: dict[str, tuple] = {
    "global_sort": (q_global_sort, SQL_GLOBAL_SORT),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "basket_rules": (q_basket_rules, SQL_BASKET_RULES),
    "pagerank": (q_pagerank, _pagerank_sql()),
    "khop_reachability": (q_khop_reachability, SQL_KHOP_REACHABILITY),
    "profile_table": (q_profile_table, SQL_PROFILE_TABLE),
    "bigram_logprob": (q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "char_entropy": (q_char_entropy, SQL_CHAR_ENTROPY),
    "weighted_sample": (q_weighted_sample, _weighted_sample_sql()),
    "gapfill_locf": (q_gapfill_locf, SQL_GAPFILL_LOCF),
    "gapfill_interp": (q_gapfill_interp, SQL_GAPFILL_INTERP),
    "window_analytics": (q_window_analytics, SQL_WINDOW_ANALYTICS),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "rollup_pricing": (q_rollup_pricing, SQL_ROLLUP_PRICING),
    "pivot_status": (q_pivot_status, SQL_PIVOT_STATUS),
    "asof_last_order": (q_asof_last_order, SQL_ASOF_LAST_ORDER),
    "percentiles": (q_percentiles, SQL_PERCENTILES),
    "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "string_functions": (q_string_functions, SQL_STRING_FUNCTIONS),
    "datetime_functions": (q_datetime_functions, SQL_DATETIME_FUNCTIONS),
    "set_ops": (q_set_ops, SQL_SET_OPS),
    "grouped_count_distinct": (q_grouped_count_distinct, SQL_GROUPED_COUNT_DISTINCT),
    "corpus_filter": (q_corpus_filter, SQL_CORPUS_FILTER),
    "q3_top_orders": (q3_top_orders, SQL_Q3_TOP_ORDERS),
    "q5_region_volume": (q5_region_volume, SQL_Q5_REGION_VOLUME),
    "q10_returned_revenue": (q10_returned_revenue, SQL_Q10_RETURNED_REVENUE),
    "unpivot_metrics": (q_unpivot_metrics, SQL_UNPIVOT_METRICS),
    "array_functions": (q_array_functions, SQL_ARRAY_FUNCTIONS),
    "skew_join_salted": (q_skew_join_salted, SQL_SKEW_JOIN_SALTED),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "funnel": (q_funnel, SQL_FUNNEL),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "window_frames": (q_window_frames, SQL_WINDOW_FRAMES),
    "range_window": (q_range_window, SQL_RANGE_WINDOW),
    "session_stats": (q_session_stats, SQL_SESSION_STATS),
    "attribution": (q_attribution, SQL_ATTRIBUTION),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "anomaly_days": (q_anomaly_days, SQL_ANOMALY_DAYS),
    "sequence_pack_global": (q_sequence_pack_global, SQL_SEQUENCE_PACK_GLOBAL),
    "q12_returnflag_priority": (q12_returnflag_priority, SQL_Q12_PRIORITY_LINES),
    "q18_volume_customers": (q18_volume_customers, SQL_Q18_VOLUME_CUSTOMERS),
}

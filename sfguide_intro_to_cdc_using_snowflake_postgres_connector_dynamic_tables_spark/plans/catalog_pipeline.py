"""Training-data pipeline catalog entries: deterministic corpus split,
benchmark decontamination, normalization/PII scrub, CUBE aggregation,
and an interval (equi + time-range) join.

Every entry is a (spark_fn, duckdb_sql) pair under the driver's
hash-match gate.  The SQL mirrors semantics, not syntax: e.g. the hash
bucket is ``conv(substr(md5(id),1,2),16,10)`` on the Spark side and
strpos nibble arithmetic on the DuckDB side -- same value byte-for-byte.

Scale notes per entry are in the function docstrings; the common theme
is that everything rides built-in expressions (codegen) and the only
shuffles are the explicitly keyed joins/aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import corpus, evaluation, quality_model, text as text_ops
from ..sources.testdata import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_BUCKET_SQL = (
    "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)


# ---------------------------------------------------------------------------
# Deterministic train/val/test split.  No sampling pass, no global sort,
# no driver state: each row derives its split from md5(doc_id), so the
# assignment is stable under appends, reshuffles, and backfills -- the
# property a 100 TB corpus split actually needs.
# ---------------------------------------------------------------------------

def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.assign_split(docs).select("doc_id", "lang", "split")


SQL_CORPUS_SPLIT = f"""
WITH b AS (SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents)
SELECT doc_id, lang,
       CASE WHEN bucket < 205 THEN 'train'
            WHEN bucket < 231 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination: train docs sharing any 8-gram with the test
# split.  The benchmark gram set is broadcast (eval suites are small by
# construction), so the contamination check adds no train-side shuffle
# beyond the final per-doc count.
# ---------------------------------------------------------------------------

def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.decontaminate(docs).select(
        "doc_id", F.col("n_shared").cast("long").alias("n_shared")
    )


SQL_DECONTAMINATE = f"""
WITH b AS (SELECT doc_id, text, {_BUCKET_SQL} AS bucket FROM documents),
s AS (SELECT doc_id, text,
             CASE WHEN bucket < 205 THEN 'train'
                  WHEN bucket < 231 THEN 'val'
                  ELSE 'test' END AS split
      FROM b),
toks AS (SELECT doc_id, split,
                list_filter(string_split(text, ' '), x -> x <> '') AS tk
         FROM s),
grams AS (
  SELECT DISTINCT doc_id, split, g
  FROM (SELECT doc_id, split,
               unnest(list_transform(range(1, len(tk) - 6),
                      i -> array_to_string(list_slice(tk, i, i + 7), '_'))) AS g
        FROM toks) u),
bench AS (SELECT DISTINCT g FROM grams WHERE split = 'test'),
shared AS (
  SELECT gr.doc_id, count(DISTINCT gr.g) AS n_shared
  FROM grams gr JOIN bench USING (g)
  WHERE gr.split = 'train'
  GROUP BY 1)
SELECT s.doc_id, CAST(COALESCE(shared.n_shared, 0) AS BIGINT) AS n_shared
FROM s LEFT JOIN shared ON s.doc_id = shared.doc_id
WHERE s.split = 'train'
"""


# ---------------------------------------------------------------------------
# Normalization pipeline (lowercase / strip / collapse / short-token
# drop) -- pure codegen, no shuffle.
# ---------------------------------------------------------------------------

def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cleaned = text_ops.clean_text(F.col("text"))
    kept = F.split(cleaned, " ")
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        F.when(cleaned == "", F.lit(0))
        .otherwise(F.size(kept))
        .cast("long")
        .alias("n_tokens_kept"),
    )


SQL_TEXT_CLEAN = """
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS t
  FROM documents),
f AS (SELECT doc_id,
             array_to_string(list_filter(string_split(t, ' '), x -> len(x) >= 2), ' ') AS cleaned
      FROM c)
SELECT doc_id, cleaned,
       CAST(CASE WHEN cleaned = '' THEN 0
                 ELSE len(string_split(cleaned, ' ')) END AS BIGINT) AS n_tokens_kept
FROM f
"""


# ---------------------------------------------------------------------------
# PII scrub.  The synthetic corpus has no PII, so the entry plants a
# deterministic email/phone/IP per row (both engines build the identical
# dirty string) and verifies the scrubbed output and per-kind counts.
# ---------------------------------------------------------------------------

def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"), d.cast("string"),
        F.lit("@example.com or call 415-555-"),
        F.lpad(F.pmod(d, F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10.0."), F.pmod(d, F.lit(256)).cast("string"), F.lit(".7"),
    )
    return docs.select(
        "doc_id",
        text_ops.scrub_pii(dirty).alias("scrubbed"),
        *[c.cast("long") for c in text_ops.pii_counts(dirty)],
    )


SQL_PII_SCRUB = r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 415-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS dirty
  FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(dirty,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
         '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(dirty, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(dirty, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(dirty, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ip
FROM d
"""


# ---------------------------------------------------------------------------
# CUBE: all grouping-set combinations of (returnflag, linestatus) with
# per-column GROUPING flags.  One Expand + one partial/final aggregate;
# the 4x row inflation happens pre-shuffle on tiny grouping keys.
# ---------------------------------------------------------------------------

def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
    )


SQL_CUBE_AGG = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Interval join: for each error event, clicks by the same user within
# the following hour.  Equi key first (user_id -> one hash shuffle),
# time range as a residual filter -- the scale-correct shape; a pure
# range join would need time-bucket blocking instead.
# ---------------------------------------------------------------------------

def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("err_ts"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("clk_ts")
    )
    j = err.join(
        clk,
        (F.col("u") == F.col("cu"))
        & (F.col("clk_ts") >= F.col("err_ts"))
        & (F.col("clk_ts") < F.col("err_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return j.groupBy("err_id", "u", "err_ts").agg(
        F.count("clk_ts").alias("n_clicks_1h")
    ).select(
        "err_id", F.col("u").alias("user_id"), "err_ts", "n_clicks_1h"
    )


SQL_INTERVAL_JOIN = """
WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
err AS (SELECT event_id AS err_id, user_id AS u, ts AS err_ts FROM e WHERE event_type = 'error'),
clk AS (SELECT user_id AS cu, ts AS clk_ts FROM e WHERE event_type = 'click')
SELECT err_id, u AS user_id, err_ts, CAST(count(clk_ts) AS BIGINT) AS n_clicks_1h
FROM err LEFT JOIN clk
  ON cu = u AND clk_ts >= err_ts AND clk_ts < err_ts + INTERVAL 1 HOUR
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TF-IDF: one explode + two keyed aggregations + join back; corpus size
# N rides a 1-row broadcast, never a driver scalar.
# ---------------------------------------------------------------------------

def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.tfidf(_t(spark, sf_dir, "documents"))


SQL_TFIDF = """
WITH ex AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf_cnt FROM ex GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS doc_len FROM ex GROUP BY 1),
dfq AS (SELECT token, count(*) AS df_cnt
        FROM (SELECT DISTINCT doc_id, token FROM ex) GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token,
       tf.tf_cnt * 1.0 / dl.doc_len AS tf,
       CAST(dfq.df_cnt AS BIGINT) AS df,
       (tf.tf_cnt * 1.0 / dl.doc_len) * ln(n.n_docs * 1.0 / dfq.df_cnt) AS tfidf
FROM tf JOIN dl USING (doc_id) JOIN dfq USING (token) CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# Unigram-LM quality score (the CCNet/KenLM-perplexity-filter shape
# with corpus-derived statistics): explode + vocab-keyed count join +
# per-doc mean log-probability.
# ---------------------------------------------------------------------------

def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.unigram_logprob(_t(spark, sf_dir, "documents"))


SQL_UNIGRAM_LOGPROB = """
WITH ex AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents),
c AS (SELECT token, count(*) AS cnt FROM ex GROUP BY 1),
t AS (SELECT sum(cnt) AS n_total, count(*) AS vocab FROM c)
SELECT ex.doc_id,
       avg(ln((c.cnt + 0.5) / (t.n_total + 0.5 * t.vocab))) AS avg_logprob,
       count(*) AS n_tok
FROM ex JOIN c USING (token) CROSS JOIN t
GROUP BY ex.doc_id
"""


# ---------------------------------------------------------------------------
# Overlapping chunking with source offsets: map-only row expansion
# (sequence + posexplode + substring), zero shuffles.
# ---------------------------------------------------------------------------

def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_chars=200, overlap=50
    )


SQL_CHUNK_DOCUMENTS = """
WITH s AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(length(text) - 1, 0) + 1, 150)) AS chunk_start
  FROM documents)
SELECT doc_id,
       CAST(chunk_start / 150 AS INT) AS chunk_id,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       substr(text, CAST(chunk_start AS INT) + 1, 200) AS chunk_text
FROM s
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (corpus-quality filtering).
# ---------------------------------------------------------------------------

def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.repetition_stats(_t(spark, sf_dir, "documents"))


SQL_REPETITION_STATS = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents),
ex AS (SELECT doc_id, unnest(tk) AS token FROM base),
tc AS (SELECT doc_id, token, count(*) AS cnt FROM ex GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(cnt) AS n_tokens, max(cnt) AS top_cnt FROM tc GROUP BY 1),
bg AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 2 THEN len(tk) - 1 ELSE 0 END AS n_bigrams,
         CASE WHEN len(tk) >= 2
              THEN len(list_distinct(list_transform(range(1, len(tk)),
                       i -> array_to_string(list_slice(tk, i, i + 1), '_'))))
              ELSE 0 END AS n_distinct_bigrams
  FROM base)
SELECT a.doc_id,
       a.top_cnt * 1.0 / a.n_tokens AS top_token_fraction,
       CASE WHEN b.n_bigrams > 0
            THEN 1 - b.n_distinct_bigrams * 1.0 / b.n_bigrams
            ELSE 0.0 END AS dup_bigram_fraction
FROM agg a JOIN bg b USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Dup clusters: connected components over the n-gram Jaccard pair list
# (iterative min-label propagation engine-side; recursive CTE oracle).
# ---------------------------------------------------------------------------

def q_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup

    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=2, threshold=0.6
    )
    return dedup.connected_components(pairs)


def _dup_components_sql() -> str:
    from .catalog_ext import SQL_NGRAM_JACCARD_DUP

    return f"""
WITH RECURSIVE pairs AS ({SQL_NGRAM_JACCARD_DUP}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(v, l) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v)
SELECT v AS doc_id, min(l) AS component FROM reach GROUP BY v
"""


# ---------------------------------------------------------------------------
# Leakage-safe split: near-dup clusters share one split (a test doc can
# never have a paraphrase in train).  Anchor = component label if the
# doc is in a dup cluster, else the doc id; split by the anchor's md5
# bucket -- singletons split exactly like corpus_split.
# ---------------------------------------------------------------------------

def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.6)
    return corpus.leakage_safe_split(docs, pairs).select(
        "doc_id", "lang", "split"
    )


_ANCHOR_BUCKET_SQL = (
    "(strpos('0123456789abcdef', substr(md5(CAST(anchor AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(anchor AS VARCHAR)), 2, 1)) - 1)"
)


def _leakage_safe_split_sql() -> str:
    comp = _dup_components_sql()
    return f"""
WITH comp AS ({comp}),
anch AS (
  SELECT d.doc_id, d.lang, COALESCE(c.component, d.doc_id) AS anchor
  FROM documents d LEFT JOIN comp c USING (doc_id)),
b AS (SELECT doc_id, lang, {_ANCHOR_BUCKET_SQL} AS bucket FROM anch)
SELECT doc_id, lang,
       CASE WHEN bucket < 205 THEN 'train'
            WHEN bucket < 231 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


# ---------------------------------------------------------------------------
# Epoch re-split: the quarantine drain valve (operators/corpus.py
# resplit_epoch).  Full leakage-safe recompute of the split STATE
# table under a fresh epoch salt -- every anchor is re-hashed with the
# salt appended, so assignments re-draw while whole clusters still
# share one split.  Oracle mirrors the salted md5 bucketing exactly.
# ---------------------------------------------------------------------------

_R13_EPOCH_SALT = "epoch-r13"


def q_resplit_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import corpus as corpus_ops
    from ..operators import dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.6)
    return corpus_ops.resplit_epoch(docs, pairs, salt=_R13_EPOCH_SALT)


def _resplit_epoch_sql() -> str:
    comp = _dup_components_sql()
    salted = _ANCHOR_BUCKET_SQL.replace(
        "CAST(anchor AS VARCHAR)",
        f"(CAST(anchor AS VARCHAR) || '|{_R13_EPOCH_SALT}')",
    )
    return f"""
WITH comp AS ({comp}),
anch AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS anchor
  FROM documents d LEFT JOIN comp c USING (doc_id)),
b AS (SELECT doc_id, anchor, {salted} AS bucket FROM anch)
SELECT doc_id, anchor,
       CASE WHEN bucket < 205 THEN 'train'
            WHEN bucket < 231 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


# ---------------------------------------------------------------------------
# Vocabulary extraction: exact corpus-wide top-k tokens.  Partial
# (map-side) counts collapse the explode before the single shuffle;
# TakeOrderedAndProject keeps the top-k without a global sort.
# ---------------------------------------------------------------------------

def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
    )


SQL_VOCAB_TOPK = """
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Statistical aggregate pack: stddev/variance/corr/covar per group.
# Magnitudes kept small (quantity/discount) so cross-engine partial-
# aggregation order differences stay far inside the gate's 2dp rounding.
# ---------------------------------------------------------------------------

def q_stats_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.stddev_samp("l_quantity").alias("sd_qty"),
        F.var_samp("l_quantity").alias("var_qty"),
        F.corr("l_quantity", "l_discount").alias("corr_qty_disc"),
        F.covar_samp("l_quantity", "l_discount").alias("covar_qty_disc"),
        F.avg("l_discount").alias("avg_disc"),
    )


SQL_STATS_PACK = """
SELECT l_returnflag AS returnflag,
       stddev_samp(l_quantity) AS sd_qty,
       var_samp(l_quantity) AS var_qty,
       corr(l_quantity, l_discount) AS corr_qty_disc,
       covar_samp(l_quantity, l_discount) AS covar_qty_disc,
       avg(l_discount) AS avg_disc
FROM lineitem
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Non-equi range join via bucket blocking: orders priced into irregular
# (quadratic-width) bands.  Equi join on the quantized bucket + residual
# range filter -- never a nested loop; the oracle runs the naive
# BETWEEN join.
# ---------------------------------------------------------------------------

def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import bucketed_range_join

    bands = spark.range(0, 40).select(
        F.col("id").alias("band_id"),
        (F.col("id") * F.col("id") * 500).cast("double").alias("lo"),
        ((F.col("id") + 1) * (F.col("id") + 1) * 500).cast("double").alias("hi"),
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = bucketed_range_join(o, bands, "o_totalprice", step=25000.0)
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


SQL_RANGE_BAND_JOIN = """
WITH bands AS (
  SELECT i AS band_id, CAST(i * i * 500 AS DOUBLE) AS lo,
         CAST((i + 1) * (i + 1) * 500 AS DOUBLE) AS hi
  FROM (SELECT unnest(range(0, 40)) AS i))
SELECT band_id, CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination -- the constant-memory variant of
# `decontaminate`.  The oracle rebuilds the identical ~128 KB bitmap in
# SQL: the same md5-derived 20-bit positions (5 hex nibbles, parsed with
# strpos arithmetic), the same 32-bit-word bit_or fold, the same
# all-K-probes-set membership test -- so the false-positive set matches
# byte-for-byte, not just statistically.
# ---------------------------------------------------------------------------

def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.bloom_decontaminate(docs)


def _hex_sql(h: str, nibbles: int, start: int = 0) -> str:
    """DuckDB expression: int value of ``nibbles`` hex digits of md5
    expression ``h`` starting at 0-based offset ``start`` (mirrors
    Spark's conv(substr(md5, start+1, nibbles), 16, 10))."""
    nib = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"
    return " + ".join(
        f"({nib.format(h=h, i=start + i + 1)}) * {w}"
        if w > 1
        else f"({nib.format(h=h, i=start + i + 1)})"
        for i, w in enumerate(16 ** (nibbles - 1 - i) for i in range(nibbles))
    )


def _hex5_sql(h: str, start: int = 0) -> str:
    return _hex_sql(h, 5, start)


SQL_BLOOM_DECONTAMINATE = f"""
WITH b AS (SELECT doc_id, text, {_BUCKET_SQL} AS bucket FROM documents),
s AS (SELECT doc_id, text,
             CASE WHEN bucket < 205 THEN 'train'
                  WHEN bucket < 231 THEN 'val'
                  ELSE 'test' END AS split
      FROM b),
toks AS (SELECT doc_id, split,
                list_filter(string_split(text, ' '), x -> x <> '') AS tk
         FROM s),
grams AS (
  SELECT DISTINCT doc_id, split, g
  FROM (SELECT doc_id, split,
               unnest(list_transform(range(1, len(tk) - 6),
                      i -> array_to_string(list_slice(tk, i, i + 7), '_'))) AS g
        FROM toks) u),
bench_pos AS (
  SELECT DISTINCT unnest([
    {_hex5_sql("h", 0)},
    {_hex5_sql("h", 5)},
    {_hex5_sql("h", 10)}]) AS pos
  FROM (SELECT md5(g) AS h FROM (SELECT DISTINCT g FROM grams WHERE split = 'test'))),
bloom AS (
  SELECT CAST(pos // 32 AS BIGINT) AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
  FROM bench_pos GROUP BY 1),
train_probes AS (
  SELECT doc_id, g, unnest([
    {_hex5_sql("h", 0)},
    {_hex5_sql("h", 5)},
    {_hex5_sql("h", 10)}]) AS pos
  FROM (SELECT doc_id, g, md5(g) AS h FROM grams WHERE split = 'train')),
hits AS (
  SELECT doc_id, g
  FROM train_probes JOIN bloom
    ON CAST(pos // 32 AS BIGINT) = word_idx
   AND (word & (CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))) <> 0
  GROUP BY doc_id, g
  HAVING count(*) = 3),
flagged AS (SELECT doc_id, count(*) AS n_flagged FROM hits GROUP BY 1)
SELECT s.doc_id, CAST(COALESCE(flagged.n_flagged, 0) AS BIGINT) AS n_flagged
FROM s LEFT JOIN flagged ON s.doc_id = flagged.doc_id
WHERE s.split = 'train'
"""


# ---------------------------------------------------------------------------
# Boilerplate detection: the share of each document's distinct 3-grams
# that recur in >= 5 distinct documents (templates, banners, headers).
# ---------------------------------------------------------------------------

def q_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.boilerplate_ratio(docs)


SQL_BOILERPLATE_RATIO = """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS tk
              FROM documents),
grams AS (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(tk) - 1),
                      i -> array_to_string(list_slice(tk, i, i + 2), '_'))) AS g
        FROM toks) u),
freq AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN n_docs >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(CAST(sum(CASE WHEN n_docs >= 5 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS boiler_frac
FROM grams JOIN freq USING (g)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic exact-n stratified sample: 30 docs per language, chosen
# by md5 rank within the stratum -- rerun/backfill stable, unlike
# sampleBy's seed+partitioning-dependent approximate fractions.
# ---------------------------------------------------------------------------

def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.stratified_sample(docs, "lang", 30).select("doc_id", "lang")


SQL_STRATIFIED_SAMPLE = """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
SELECT doc_id, lang FROM r WHERE rk <= 30
"""


# ---------------------------------------------------------------------------
# Per-language top-quality quota: keep the best 25% of each language by
# heuristic quality score (exact per-stratum fraction via percent_rank,
# immune to cross-language score-scale differences).
# ---------------------------------------------------------------------------

def q_quality_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.quality_top_fraction(docs, 0.25)


SQL_QUALITY_TOPFRAC = """
WITH t AS (
  SELECT doc_id, lang, length(text) AS n_chars,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
q AS (
  SELECT doc_id, lang,
         least(n_chars / 500.0, 1.0) * 0.4
         + (len(list_distinct(toks)) * 1.0 / len(toks)) * 0.4
         + least(len(list_filter(toks,
               x -> x IN ('the','a','an','and','of','to','in','is'))) / 5.0, 1.0) * 0.2
           AS quality
  FROM t),
r AS (
  SELECT doc_id, lang, quality,
         percent_rank() OVER (PARTITION BY lang
                              ORDER BY quality DESC, doc_id) AS pr
  FROM q)
SELECT doc_id, lang, quality FROM r WHERE pr <= 0.25
"""


# ---------------------------------------------------------------------------
# Domain mixture solving: deterministic down-sample to TARGET domain
# proportions (the "data mixing" step of corpus assembly) -- keep the
# largest corpus whose lang mix is 50% en / 25% fr / 25% zh without
# upsampling; hash-threshold membership, narrow filter, no corpus
# shuffle.
# ---------------------------------------------------------------------------

_MIXTURE_PROPS = {"en": 0.5, "fr": 0.25, "zh": 0.25}


def q_mixture_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.mixture_to_proportions(docs, _MIXTURE_PROPS)


def _mixture_sql(props: dict[str, float]) -> str:
    """Oracle mirroring corpus.mixture_to_proportions byte-for-byte: the
    NORMALIZED weights are embedded as ::DOUBLE literals (bare decimal
    literals type as DECIMAL in DuckDB and diverge), N* / rates use
    the identical arithmetic order (min(n / w), then nstar * w / n),
    and the id hash is the shared 6-nibble md5 prefix over 16^6."""
    total = float(sum(props.values()))
    p = {d: w / total for d, w in props.items() if w > 0}
    vals = ", ".join(f"('{d}', {p_d!r}::DOUBLE)" for d, p_d in p.items())
    in_list = ", ".join(f"'{d}'" for d in p)
    u = _hex_sql("md5(CAST(doc_id AS VARCHAR))", 6)
    return f"""
WITH p(domain, w) AS (VALUES {vals}),
c AS (SELECT lang AS domain, count(*) AS n FROM documents
      WHERE lang IN ({in_list}) GROUP BY 1),
r AS (SELECT p.domain, p.w, c.n FROM p JOIN c USING (domain)),
ns AS (SELECT CASE WHEN (SELECT count(*) FROM r) = (SELECT count(*) FROM p)
              THEN (SELECT min(n / w) FROM r) ELSE 0.0 END AS v),
rates AS (SELECT domain, (SELECT v FROM ns) * w / n AS rate FROM r)
SELECT d.doc_id AS doc_id, d.lang AS domain
FROM documents d JOIN rates ON d.lang = rates.domain
WHERE ({u}) / 16777216.0 < rates.rate
"""


# ---------------------------------------------------------------------------
# Span-level (substring) dedup: maximal repeated 5-gram spans across
# the corpus (Lee et al. ACL'22 shape), gaps-and-islands merge.
# ---------------------------------------------------------------------------

def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import repeated_spans

    docs = _t(spark, sf_dir, "documents")
    return repeated_spans(docs, n=5, min_count=2)


SQL_REPEATED_SPANS = """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS tk
              FROM documents),
pg AS (SELECT doc_id, u.pos, u.g FROM (
         SELECT doc_id,
                unnest(list_transform(range(1, len(tk) - 3),
                       i -> struct_pack(pos := i - 1,
                                        g := array_to_string(list_slice(tk, i, i + 4), '_')))) AS u
         FROM toks)),
f AS (SELECT doc_id, pos
      FROM (SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS n_occ FROM pg)
      WHERE n_occ >= 2),
i AS (SELECT doc_id, pos,
             sum(CASE WHEN prev IS NULL OR pos - prev > 5 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM f))
SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
       CAST(min(pos) AS BIGINT) AS start_pos,
       CAST(max(pos) + 5 AS BIGINT) AS end_pos,
       CAST(count(*) AS BIGINT) AS n_grams
FROM i GROUP BY doc_id, span_id
"""


# ---------------------------------------------------------------------------
# Feature-hashing embedding: exact integer count vectors (md5-lane
# hashing trick), the model-free bridge from text to the vector ops.
# ---------------------------------------------------------------------------

def q_text_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gate projection: the driver's canonicalizer sorts the pandas
    # result and dies on list-typed cells (r5: `unhashable type:
    # 'list'`), so the gate entry unpacks the vector into per-lane
    # scalar columns s0..s15 (as text_sim_topk's oracle already does).
    # `hashing_embed` itself still returns the array<bigint> column.
    docs = _t(spark, sf_dir, "documents")
    emb = corpus.hashing_embed(docs, dim=16)
    return emb.select(
        "doc_id",
        *[emb["embedding"][i].alias(f"s{i}") for i in range(16)],
    )


def _hex4_sql(h: str) -> str:
    return _hex_sql(h, 4)


SQL_TEXT_EMBED = f"""
WITH tok AS (
  SELECT doc_id, t FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                         FROM documents) u
  WHERE t <> ''),
b AS (SELECT doc_id, ({_hex4_sql("md5(t)")}) % 16 AS bucket FROM tok)
SELECT doc_id,
       {", ".join(f"CAST(sum(CASE WHEN bucket = {i} THEN 1 ELSE 0 END) AS BIGINT) AS s{i}" for i in range(16))}
FROM b GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Text similarity search end-to-end: hashing-trick embed + exact
# cosine top-k against a fixed probe document -- the "text -> embed ->
# ANN" path as one gated plan (no model, no driver collect; the probe
# vector is computed in closed form from the probe string on both
# engines).
# ---------------------------------------------------------------------------

_PROBE_TEXT = "the quick brown fox jumps over the lazy dog and runs far away today"


def _probe_vec(dim: int = 16) -> list[int]:
    import hashlib

    v = [0] * dim
    for t in _PROBE_TEXT.split():
        v[int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % dim] += 1
    return v


def q_text_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import topk_cosine

    emb = corpus.hashing_embed(_t(spark, sf_dir, "documents"), dim=16)
    return topk_cosine(
        emb,
        [float(x) for x in _probe_vec()],
        k=10,
        vec_col="embedding",
        id_col="doc_id",
    )


def _text_sim_topk_sql() -> str:
    q = _probe_vec()
    lanes = ", ".join(
        f"CAST(sum(CASE WHEN bucket = {i} THEN 1 ELSE 0 END) AS BIGINT) AS s{i}"
        for i in range(16)
    )
    dot = " + ".join(f"s{i} * {float(q[i])!r}" for i in range(16))
    nd = " + ".join(f"s{i} * s{i}" for i in range(16))
    nq = " + ".join(f"{float(q[i])!r} * {float(q[i])!r}" for i in range(16))
    return f"""
WITH tok AS (
  SELECT doc_id, t FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                         FROM documents) u
  WHERE t <> ''),
b AS (SELECT doc_id, ({_hex4_sql("md5(t)")}) % 16 AS bucket FROM tok),
e AS (SELECT doc_id, {lanes} FROM b GROUP BY doc_id)
SELECT doc_id, ({dot}) / (sqrt({nd}) * sqrt({nq})) AS cosine
FROM e ORDER BY cosine DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# BM25 retrieval: Okapi scoring of the corpus against a fixed query
# bag.  The explode is filtered to the query terms BEFORE aggregation
# (inverted-index-probe shape), corpus stats ride a 1-row broadcast,
# final cut is TakeOrdered with a doc_id tiebreak.
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS: tuple[str, ...] = ("hash", "join", "sort", "merge", "spark")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.bm25_topk(
        _t(spark, sf_dir, "documents"), list(BM25_QUERY_TERMS), k=20
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

SQL_BM25_TOPK = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents),
lens AS (SELECT doc_id, len(tk) AS doc_len FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(doc_len) AS avgdl FROM lens),
p AS (
  SELECT doc_id, len(tk) AS doc_len, unnest(tk) AS token FROM toks),
pq AS (SELECT * FROM p WHERE token IN ({_BM25_TERMS_SQL})),
tf AS (SELECT doc_id, doc_len, token, count(*) AS tf FROM pq GROUP BY 1, 2, 3),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
SELECT doc_id,
       sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * doc_len / avgdl))) AS bm25
FROM tf JOIN dfq USING (token) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Learned quality classifier, scoring path.  The weights below stand in
# for an exported train_token_weights() fit (training itself is
# pyspark.ml LBFGS -- not SQL-expressible, pytest-differential-tested
# in tests/test_quality_model.py); the SCORING kernel is what runs
# corpus-wide at 100 TB and is what the gate pins: a map-literal fold
# + sigmoid, one scan, zero shuffle, no Python.
# ---------------------------------------------------------------------------

_CLF_WEIGHTS: dict[str, float] = {
    "join": 0.35,
    "hash": 0.30,
    "merge": 0.25,
    "scan": 0.20,
    "filter": 0.15,
    "vector": 0.10,
    "batch": 0.05,
    "window": -0.05,
    "the": -0.10,
    "a": -0.15,
    "small": -0.25,
    "slow": -0.40,
}

#: not a multiple of 0.05: token-weight sums land on a 0.05 grid, so
#: z = sum + bias is bounded away from 0 by >= 0.013 and the keep
#: flag can never flip on float-addition-order noise between engines
_CLF_BIAS = -0.737


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scored = quality_model.linear_token_score(
        docs, _CLF_WEIGHTS, _CLF_BIAS, extra={"lang": F.col("lang")}
    )
    return scored.select(
        "doc_id",
        "lang",
        "clf_score",
        (F.col("clf_score") >= F.lit(0.5)).alias("keep"),
    )


def _classifier_sql() -> str:
    """Oracle generated from the SAME weight dict (byte-parity by
    construction).  ::DOUBLE casts everywhere -- DuckDB types bare
    decimal literals as DECIMAL and the decimal-typed sum would
    diverge from Spark's double arithmetic."""
    values = ", ".join(
        f"('{tok}', CAST({wt!r} AS DOUBLE))"
        for tok, wt in sorted(_CLF_WEIGHTS.items())
    )
    return f"""
WITH w(tok, wt) AS (VALUES {values}),
tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
s AS (
  SELECT tk.doc_id, SUM(w.wt) AS z
  FROM tk JOIN w ON tk.tok = w.tok GROUP BY tk.doc_id)
SELECT d.doc_id, d.lang,
       1.0 / (1.0 + exp(-(COALESCE(s.z, 0.0) + CAST({_CLF_BIAS!r} AS DOUBLE)))) AS clf_score,
       1.0 / (1.0 + exp(-(COALESCE(s.z, 0.0) + CAST({_CLF_BIAS!r} AS DOUBLE)))) >= 0.5 AS keep
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""


#: classifier_eval uses the weights x100 -- INTEGER-exact sums, so
#: grouping the score can never split on float-ulp differences between
#: engines (the risk the 2dp value canonicalizer does NOT cover:
#: rounding happens after grouping, and an ulp at a group boundary
#: would move whole rows).  The sigmoid is monotone, so ROC points
#: over z are ROC points over sigmoid(z/100 + bias).
_CLF_W100: dict[str, int] = {
    tok: int(round(wt * 100)) for tok, wt in _CLF_WEIGHTS.items()
}


def q_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC curve of the learned quality scorer against a deterministic
    relevance label (lang == 'en'): one row per distinct integer
    weight-sum with (threshold, tpr, fpr).

    Pins the distributed evaluation path end-to-end: per-score
    collapse (one aggregation shuffle) -> two-phase prefix-sum
    cumulative (range exchange + per-partition window + O(#partitions)
    offsets) -> ratio projection.  No global single-task window
    anywhere -- `evaluation._score_cum` is the scale shape."""
    docs = _t(spark, sf_dir, "documents")
    keys = sorted(_CLF_W100)
    wmap = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.lit(float(_CLF_W100[k])) for k in keys]),
    )
    toks = text_ops.tokens(F.col("text"))
    z = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.coalesce(wmap[t], F.lit(0.0))
    )
    scored = docs.select(
        z.alias("z"),
        F.when(F.col("lang") == F.lit("en"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("label"),
    )
    return evaluation.roc_points(scored, label_col="label", score_col="z")


def q_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall at k of the learned scorer against the
    deterministic lang label -- pins the O(k)-driver TakeOrdered path
    (per-partition top-k + merge, no global sort) under the hash
    gate.  Integer-exact scores (same reasoning as classifier_eval);
    ties at the k boundary broken by doc_id, mirrored in the oracle's
    ORDER BY."""
    docs = _t(spark, sf_dir, "documents")
    keys = sorted(_CLF_W100)
    wmap = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.lit(float(_CLF_W100[k])) for k in keys]),
    )
    toks = text_ops.tokens(F.col("text"))
    z = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.coalesce(wmap[t], F.lit(0.0))
    )
    scored = docs.select(
        F.col("doc_id"),
        z.alias("clf_score"),
        F.when(F.col("lang") == F.lit("en"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("label"),
    )
    return evaluation.precision_recall_at_k(scored, ks=[10, 50, 100])


def _precision_at_k_sql() -> str:
    values = ", ".join(
        f"('{tok}', {wt})" for tok, wt in sorted(_CLF_W100.items())
    )
    return f"""
WITH w(tok, wt) AS (VALUES {values}),
tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
s AS (
  SELECT tk.doc_id, SUM(w.wt) AS z
  FROM tk JOIN w ON tk.tok = w.tok GROUP BY tk.doc_id),
scored AS (
  SELECT d.doc_id, CAST(COALESCE(s.z, 0) AS DOUBLE) AS score,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
ranked AS (
  SELECT label,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored),
tot AS (SELECT SUM(label) AS p FROM scored),
ks(k) AS (VALUES (10), (50), (100))
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(SUM(ranked.label) AS BIGINT) AS hits,
       CAST(SUM(ranked.label) AS DOUBLE) / ks.k AS precision,
       CAST(SUM(ranked.label) AS DOUBLE) / tot.p AS recall
FROM ranked JOIN ks ON ranked.rnk <= ks.k CROSS JOIN tot
GROUP BY ks.k, tot.p
"""


def _classifier_eval_sql() -> str:
    """DuckDB window-function oracle for the ROC points: same integer
    weight sums, cumulative counts via SUM() OVER (ORDER BY z DESC)
    over the per-distinct-score table (one row per z, so the default
    RANGE frame equals ROWS)."""
    values = ", ".join(
        f"('{tok}', {wt})" for tok, wt in sorted(_CLF_W100.items())
    )
    return f"""
WITH w(tok, wt) AS (VALUES {values}),
tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
s AS (
  SELECT tk.doc_id, SUM(w.wt) AS z
  FROM tk JOIN w ON tk.tok = w.tok GROUP BY tk.doc_id),
scored AS (
  SELECT CAST(COALESCE(s.z, 0) AS DOUBLE) AS z,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
per AS (SELECT z, COUNT(*) AS cnt, SUM(label) AS pos FROM scored GROUP BY z),
cum AS (
  SELECT z, cnt, pos,
         SUM(cnt) OVER (ORDER BY z DESC) AS cum_cnt,
         SUM(pos) OVER (ORDER BY z DESC) AS cum_pos
  FROM per),
tot AS (SELECT SUM(pos) AS p, SUM(cnt) - SUM(pos) AS n FROM per)
SELECT cum.z AS threshold,
       CAST(cum.cum_pos AS DOUBLE) / tot.p AS tpr,
       CAST(cum.cum_cnt - cum.cum_pos AS DOUBLE) / tot.n AS fpr
FROM cum CROSS JOIN tot
"""


PIPELINE_CATALOG: dict[str, tuple] = {
    "classifier_score": (q_classifier_score, _classifier_sql()),
    "classifier_eval": (q_classifier_eval, _classifier_eval_sql()),
    "precision_at_k": (q_precision_at_k, _precision_at_k_sql()),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "range_band_join": (q_range_band_join, SQL_RANGE_BAND_JOIN),
    "tfidf": (q_tfidf, SQL_TFIDF),
    "vocab_topk": (q_vocab_topk, SQL_VOCAB_TOPK),
    "stats_pack": (q_stats_pack, SQL_STATS_PACK),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "dup_components": (q_dup_components, _dup_components_sql()),
    "leakage_safe_split": (q_leakage_safe_split, _leakage_safe_split_sql()),
    "resplit_epoch": (q_resplit_epoch, _resplit_epoch_sql()),
    "corpus_split": (q_corpus_split, SQL_CORPUS_SPLIT),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "text_clean": (q_text_clean, SQL_TEXT_CLEAN),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "cube_agg": (q_cube_agg, SQL_CUBE_AGG),
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "unigram_logprob": (q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "chunk_documents": (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "bloom_decontaminate": (q_bloom_decontaminate, SQL_BLOOM_DECONTAMINATE),
    "boilerplate_ratio": (q_boilerplate_ratio, SQL_BOILERPLATE_RATIO),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "quality_topfrac": (q_quality_topfrac, SQL_QUALITY_TOPFRAC),
    "mixture_proportions": (q_mixture_proportions, _mixture_sql(_MIXTURE_PROPS)),
    "repeated_spans": (q_repeated_spans, SQL_REPEATED_SPANS),
    "text_embed": (q_text_embed, SQL_TEXT_EMBED),
    "text_sim_topk": (q_text_sim_topk, _text_sim_topk_sql()),
}

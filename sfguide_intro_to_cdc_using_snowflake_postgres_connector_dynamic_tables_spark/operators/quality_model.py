"""Trained quality classifier for corpus filtering (CCNet/fastText
style).

The heuristic :func:`..operators.text.quality_score` is the cheap
pre-filter; production corpus pipelines follow it with a LEARNED
scorer -- a linear classifier over token features trained on a small
labeled (or weakly-labeled) sample, applied to the full corpus.  This
module provides that step with a strict split between the two cost
regimes:

- **Training** is distributed ``pyspark.ml`` (CountVectorizer /
  HashingTF features + LogisticRegression's distributed LBFGS).  It
  runs over a labeled SAMPLE -- thousands to millions of rows, never
  the 100 TB corpus -- and its only driver state is the exported
  weight vector, O(vocabulary).
- **Scoring** is the hot path and never leaves the JVM.  For a
  bounded vocabulary the weights compile into the plan itself
  (:func:`linear_token_score`: a map literal + in-order fold +
  sigmoid -- one scan, ZERO shuffle, whole-stage codegen).  For large
  vocabularies :func:`linear_token_score_join` broadcast-joins a
  weights table against exploded tokens (one aggregation shuffle,
  still no Python).

Reference parity: the reference quickstart has no learned scorer --
this extends the training-data operator family (SURVEY.md section 2
extension block) alongside dedup/decontamination/mixture sampling.

100 TB notes are inline per function; the invariant is that nothing
here collects corpus-sized state: training samples are caller-bounded,
``top_vocabulary`` collects exactly ``size`` rows, and the scoring
expressions carry their weights as plan literals or a broadcast frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import _quality_count_cols, _quality_expr, tokens

__all__ = [
    "weak_labels",
    "top_vocabulary",
    "train_token_weights",
    "train_quality_classifier",
    "score_quality",
    "linear_token_score",
    "linear_token_score_join",
    "threshold_for_keep_rate",
]


def weak_labels(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    low: float = 0.45,
    high: float = 0.55,
) -> DataFrame:
    """Weak supervision from the heuristic score: docs scoring
    ``>= high`` are positives, ``<= low`` negatives, the ambiguous
    middle band is DROPPED (the standard distant-supervision recipe:
    train only where the weak signal is confident).

    Returns ``(id_col, text_col, label)`` with label in {0.0, 1.0}.
    One scan, no shuffle -- the heuristic counts, the band filter and
    the carried text all live in one projection.
    """
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.col(text_col),
        *_quality_count_cols(toks, text_col),
    )
    q = _quality_expr()
    return (
        base.select(
            F.col(id_col),
            F.col(text_col),
            F.when(q >= F.lit(high), F.lit(1.0))
            .when(q <= F.lit(low), F.lit(0.0))
            .alias("label"),
        )
        .filter(F.col("label").isNotNull())
    )


def top_vocabulary(
    docs: DataFrame,
    size: int = 256,
    text_col: str = "text",
    min_df: int = 2,
) -> list[str]:
    """The ``size`` most document-frequent tokens, ties broken by token
    (deterministic across runs and partitionings).

    Document frequency (not term frequency) so a single pathological
    doc repeating one token a million times cannot buy it a vocab
    slot.  Cost: one explode of per-doc DISTINCT tokens + one groupBy
    -- the same shape as the dedup family's token aggregates.  Driver
    state: exactly ``size`` strings (a bounded collect, like the
    mixture-sampling rate map).
    """
    df = (
        docs.select(
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= F.lit(min_df))
        .orderBy(F.col("df").desc(), F.col("tok"))
        .limit(size)
    )
    return [r["tok"] for r in df.collect()]


def train_token_weights(
    labeled: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    label_col: str = "label",
    reg_param: float = 0.0,
    max_iter: int = 100,
) -> tuple[dict[str, float], float]:
    """Fit a logistic regression over term counts for a FIXED
    vocabulary and export the interpretable per-token weights.

    Features come from ``CountVectorizerModel.from_vocabulary`` (JVM,
    no Python in the feature path); the optimizer is ``pyspark.ml``'s
    distributed LBFGS, so the labeled sample can be arbitrarily large
    without driver pressure.  Returns ``(weights, bias)`` where
    ``weights[token]`` maps 1:1 onto ``vocab`` -- exactly the input
    :func:`linear_token_score` compiles into a plan, closing the loop:
    train distributed, score codegen.

    Driver state: O(len(vocab)) floats.  Standardization is OFF so the
    exported weights apply to RAW term counts (what the scoring fold
    computes); with standardization on, the coefficients would be in
    scaled units and the fold would silently mis-score.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizerModel

    cv = CountVectorizerModel.from_vocabulary(
        vocab, inputCol="__toks", outputCol="__features"
    )
    feats = cv.transform(
        labeled.select(
            F.col(label_col).cast("double").alias(label_col),
            tokens(F.col(text_col)).alias("__toks"),
        )
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        standardization=False,
        maxIter=max_iter,
    )
    model = lr.fit(feats)
    coeffs = model.coefficients.toArray()
    return (
        {tok: float(w) for tok, w in zip(vocab, coeffs)},
        float(model.intercept),
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 2**18,
    reg_param: float = 1e-4,
    max_iter: int = 100,
):
    """Unbounded-vocabulary variant: hashed bag-of-words (HashingTF --
    the fastText trick, collisions instead of a vocabulary) +
    LogisticRegression.  Returns the fitted ``PipelineModel``; apply
    with :func:`score_quality`.

    Use this when no vocabulary bound makes sense (the weights are not
    interpretable per token -- each slot aggregates every token that
    hashes into it).  Model size is O(num_features) on the driver and
    broadcast once per scoring job, independent of corpus size.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.sql.types import ArrayType, StringType

    from pyspark.ml.feature import SQLTransformer

    # tokenize with the SAME whitespace rule as every other operator
    # (pyspark.ml's Tokenizer lowercases -- a silent train/score skew
    # vs tokens(); an SQLTransformer keeps the rule in one place)
    tok = SQLTransformer(
        statement=(
            f"SELECT *, filter(split({text_col}, ' '), t -> t != '') "
            "AS __toks FROM __THIS__"
        )
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="__features", numFeatures=num_features
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(
        labeled.select(
            F.col(text_col), F.col(label_col).cast("double").alias(label_col)
        )
    )


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clf_score",
) -> DataFrame:
    """Apply a :func:`train_quality_classifier` model corpus-wide:
    P(label=1) per document.  The whole transform chain (tokenize,
    hash, dot product, sigmoid) is JVM-side; ``vector_to_array`` pulls
    the positive-class probability out of the ml vector without a
    Python UDF.  One scan, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select(F.col(id_col), F.col(text_col)))
    return scored.select(
        F.col(id_col),
        F.element_at(vector_to_array(F.col("probability")), 2).alias(out_col),
    )


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def linear_token_score(
    docs: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clf_score",
    extra: dict[str, Column] | None = None,
) -> DataFrame:
    """Score ``sigmoid(bias + sum over token occurrences of
    weights[token])`` with the weights compiled into the plan as a map
    literal and the sum as an in-order fold over the token array.

    This is the bounded-vocab hot path: ONE corpus scan, ZERO shuffle,
    no Python, no join -- the weight map rides the executor task
    binary like a broadcast, and the fold stays in whole-stage
    codegen.  ``element_at`` on a map literal is a linear probe, so
    keep the vocabulary here to O(10^2..10^3) entries; past that use
    :func:`linear_token_score_join`.

    ``extra`` carries additional projections through the same scan
    (same contract as ``quality_score``).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    keys = sorted(weights)
    wmap = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.lit(float(weights[k])) for k in keys]),
    )
    toks = tokens(F.col(text_col))
    z = F.aggregate(
        toks,
        F.lit(float(bias)),
        lambda acc, t: acc + F.coalesce(wmap[t], F.lit(0.0)),
    )
    extra = extra or {}
    return docs.select(
        F.col(id_col),
        *[expr.alias(nm) for nm, expr in extra.items()],
        _sigmoid(z).alias(out_col),
    )


def linear_token_score_join(
    docs: DataFrame,
    weights_df: DataFrame,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clf_score",
) -> DataFrame:
    """Large-vocabulary scoring: explode tokens, broadcast-join the
    ``(tok, wt)`` weights frame, sum per document, sigmoid.

    Cost: one explode + one keyed aggregation shuffle + one join back
    to the doc spine (so zero-hit documents still score
    ``sigmoid(bias)``).  The weights frame is broadcast -- vocabularies
    up to tens of millions of tokens fit comfortably; corpus-side
    work stays O(total tokens).
    """
    tok_rows = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    sums = (
        tok_rows.join(F.broadcast(weights_df), on="tok", how="inner")
        .groupBy(id_col)
        .agg(F.sum("wt").alias("__z"))
    )
    return docs.select(id_col).join(sums, on=id_col, how="left").select(
        F.col(id_col),
        _sigmoid(F.coalesce(F.col("__z"), F.lit(0.0)) + F.lit(float(bias))).alias(
            out_col
        ),
    )


def threshold_for_keep_rate(
    scored: DataFrame,
    keep_rate: float,
    score_col: str = "clf_score",
    relative_error: float = 0.001,
) -> float:
    """Calibrate the gate: the score threshold that keeps approximately
    the top ``keep_rate`` fraction of documents.

    Production quality gates are usually specified as a BUDGET ("keep
    the best 60%"), not a score -- but the scoring expression needs a
    scalar threshold to stay a zero-shuffle filter.  This computes the
    (1 - keep_rate) quantile via ``approxQuantile`` (Greenwald-Khanna,
    one pass, driver state O(1/relative_error) -- corpus-size
    independent) on a SAMPLE or the full frame, and returns the scalar
    to bake into ``linear_token_score(...) >= threshold`` or the
    ingest gate's ``min_quality``.
    """
    if not 0.0 < keep_rate < 1.0:
        raise ValueError(f"keep_rate must be in (0, 1), got {keep_rate}")
    [q] = scored.approxQuantile(score_col, [1.0 - keep_rate], relative_error)
    return float(q)

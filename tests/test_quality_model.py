"""Trained quality classifier: training differentials + scoring-path
equivalence.

The scoring kernel's value correctness is pinned by the gate
(``classifier_score`` vs the DuckDB oracle); here we pin what SQL
cannot express -- that the distributed training paths learn, that the
exported weights reproduce the ml model's decision function, and that
the two scoring implementations (map-literal fold vs broadcast join)
are numerically interchangeable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators import (
    quality_model as qm,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def labeled(spark, docs):
    lab = qm.weak_labels(docs, low=0.45, high=0.55).cache()
    counts = {r["label"]: r["n"] for r in lab.groupBy("label").agg(F.count("*").alias("n")).collect()}
    # the weak-label recipe must produce BOTH classes on the test
    # corpus or every assertion below is vacuous
    assert counts.get(0.0, 0) > 5 and counts.get(1.0, 0) > 5, counts
    return lab


def test_weak_labels_drop_ambiguous_band(spark, docs, labeled):
    # every doc is either labeled or inside the dropped (low, high) band
    assert labeled.count() < docs.count()
    assert labeled.filter(~F.col("label").isin(0.0, 1.0)).count() == 0


def test_top_vocabulary_deterministic_and_bounded(spark, docs):
    v1 = qm.top_vocabulary(docs, size=32)
    v2 = qm.top_vocabulary(docs.repartition(7), size=32)
    assert v1 == v2  # stable under partitioning
    # sf0.001's corpus has ~31 tokens at min_df>=2: bounded, distinct
    assert 0 < len(v1) <= 32 and len(set(v1)) == len(v1)


def test_train_token_weights_separates_weak_labels(spark, docs, labeled):
    vocab = qm.top_vocabulary(docs, size=64)
    weights, bias = qm.train_token_weights(labeled, vocab)
    assert set(weights) == set(vocab)
    scored = qm.linear_token_score(labeled, weights, bias).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    # training accuracy: the learned fold must beat coin-flip by a wide
    # margin on its own training set (weak labels are derived from
    # token statistics, so a token-count linear model can fit them)
    acc = (
        scored.select(
            ((F.col("clf_score") >= 0.5).cast("int") == F.col("label").cast("int"))
            .cast("int")
            .alias("hit")
        )
        .agg(F.avg("hit"))
        .first()[0]
    )
    assert acc > 0.8, acc


def test_exported_weights_reproduce_ml_decision_function(spark, labeled):
    """The closed loop: LogisticRegressionModel's own transform() and
    the codegen fold over the exported (weights, bias) must emit the
    SAME probability -- if standardization or tokenization drifts
    between train and score, this is the test that catches it."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizerModel
    from pyspark.ml.functions import vector_to_array

    vocab = qm.top_vocabulary(labeled, size=48)
    weights, bias = qm.train_token_weights(labeled, vocab)

    cv = CountVectorizerModel.from_vocabulary(vocab, inputCol="__toks", outputCol="__features")
    feats = cv.transform(
        labeled.select(
            "doc_id",
            F.col("label"),
            F.filter(F.split("text", " "), lambda t: t != "").alias("__toks"),
        )
    )
    model = LogisticRegression(
        featuresCol="__features", labelCol="label", standardization=False, maxIter=100
    ).fit(feats)
    ml_probs = model.transform(feats).select(
        "doc_id", F.element_at(vector_to_array("probability"), 2).alias("p_ml")
    )
    fold_probs = qm.linear_token_score(labeled, weights, bias).withColumnRenamed(
        "clf_score", "p_fold"
    )
    # NB: weights/bias exported from a SECOND fit; LBFGS on identical
    # input is deterministic, so the two fits coincide exactly and any
    # residual is pure arithmetic path difference
    delta = (
        ml_probs.join(fold_probs, "doc_id")
        .select(F.max(F.abs(F.col("p_ml") - F.col("p_fold"))))
        .first()[0]
    )
    assert delta < 1e-9, delta


def test_fold_and_join_scoring_paths_agree(spark, docs):
    weights = {"join": 0.4, "slow": -0.6, "the": -0.1, "scan": 0.2}
    bias = -0.3
    fold = qm.linear_token_score(docs, weights, bias)
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()], "tok string, wt double"
    )
    joined = qm.linear_token_score_join(docs, wdf, bias).withColumnRenamed(
        "clf_score", "clf_join"
    )
    delta = (
        fold.join(joined, "doc_id")
        .select(F.max(F.abs(F.col("clf_score") - F.col("clf_join"))))
        .first()[0]
    )
    # both sum the same per-token weights; only addition order differs
    assert delta < 1e-12, delta
    assert joined.count() == docs.count()  # zero-hit docs still score


def test_hashing_classifier_learns(spark, docs, labeled):
    model = qm.train_quality_classifier(labeled, num_features=2**12)
    scored = qm.score_quality(docs, model)
    assert scored.columns == ["doc_id", "clf_score"]
    acc = (
        qm.score_quality(labeled, model)
        .join(labeled.select("doc_id", "label"), "doc_id")
        .select(
            ((F.col("clf_score") >= 0.5).cast("int") == F.col("label").cast("int"))
            .cast("int")
            .alias("hit")
        )
        .agg(F.avg("hit"))
        .first()[0]
    )
    assert acc > 0.8, acc
    # probabilities, not margins
    bad = scored.filter((F.col("clf_score") < 0) | (F.col("clf_score") > 1)).count()
    assert bad == 0


def test_linear_token_score_zero_shuffle_plan(spark, docs):
    """The bounded-vocab scoring kernel must stay a single scan:
    no Exchange in the physical plan (the 100 TB contract)."""
    plan = qm.linear_token_score(docs, {"join": 0.4}, -0.2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# -- hypothesis differential: the codegen fold vs a pure-Python spec --

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TOKS = st.sampled_from(["join", "slow", "the", "scan", "", "x", "merge"])


def _py_score(text: str, weights: dict, bias: float) -> float:
    z = bias + sum(
        weights.get(t, 0.0) for t in text.split(" ") if t != ""
    )
    return 1.0 / (1.0 + math.exp(-z))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.lists(_TOKS, min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    weights=st.dictionaries(
        st.sampled_from(["join", "slow", "the", "scan", "merge"]),
        st.floats(-2.0, 2.0, allow_nan=False),
        min_size=1,
        max_size=5,
    ),
    bias=st.floats(-1.0, 1.0, allow_nan=False),
)
def test_fold_matches_python_reference(spark, texts, weights, bias):
    """Executable spec: the plan-compiled fold must equal the obvious
    Python implementation on arbitrary (text, weights, bias) -- the
    guard against tokenizer drift, map-lookup NULL semantics, and
    fold-order surprises across Spark versions."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["clf_score"]
        for r in qm.linear_token_score(docs, weights, bias).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i] - _py_score(t, weights, bias)) < 1e-12, (t, weights, bias)


def test_threshold_for_keep_rate(spark, docs):
    scored = qm.linear_token_score(
        docs, {"join": 0.4, "slow": -0.6, "scan": 0.2}, -0.1
    )
    thr = qm.threshold_for_keep_rate(scored, 0.6, relative_error=1e-4)
    kept = scored.filter(F.col("clf_score") >= thr).count()
    n = scored.count()
    # approx quantile at 1e-4 error on 500 docs is effectively exact
    assert abs(kept / n - 0.6) < 0.05, (kept, n, thr)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        qm.threshold_for_keep_rate(scored, 1.5)

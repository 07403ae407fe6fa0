"""Hypothesis differentials for the evaluation operators: the
distributed ROC-AUC and precision/recall-at-k must equal a pure-Python
brute-force spec on ARBITRARY (score, label) sets -- including
adversarial tie structures, constant scores, heavy imbalance, and
single-row classes that a fixed-seed test can miss.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.evaluation import (
    precision_recall_at_k,
    roc_auc,
)


@st.composite
def scored_sets(draw):
    """(doc_id, score, label) rows with both classes present; scores
    drawn from a SMALL grid so ties are the common case, not the edge
    case."""
    n = draw(st.integers(min_value=4, max_value=60))
    grid = draw(st.integers(min_value=1, max_value=6))
    rows = []
    for i in range(n):
        score = draw(st.integers(min_value=0, max_value=grid)) / grid
        label = draw(st.integers(min_value=0, max_value=1))
        rows.append((i, score, label))
    # force both classes
    rows[0] = (0, rows[0][1], 1)
    rows[1] = (1, rows[1][1], 0)
    return rows


def _brute_auc(rows) -> float:
    pos = [s for _, s, l in rows if l == 1]
    neg = [s for _, s, l in rows if l == 0]
    total = 0.0
    for p in pos:
        for q in neg:
            total += 1.0 if p > q else (0.5 if p == q else 0.0)
    return total / (len(pos) * len(neg))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(scored_sets())
def test_roc_auc_equals_pairwise_spec(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "clf_score", "label"]).repartition(4)
    assert roc_auc(df) == pytest.approx(_brute_auc(rows), abs=1e-12)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(scored_sets(), st.integers(min_value=1, max_value=70))
def test_precision_recall_at_k_equals_spec(spark, rows, k):
    df = spark.createDataFrame(rows, ["doc_id", "clf_score", "label"]).repartition(4)
    got = precision_recall_at_k(df, [k]).collect()[0]
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    hits = sum(l for _, _, l in ordered[:k])
    n_pos = sum(l for _, _, l in rows)
    eff_k = min(k, len(rows))  # k past the corpus: all rows rank <= k
    assert got["hits"] == hits
    assert got["precision"] == pytest.approx(hits / k, abs=1e-12)
    assert got["recall"] == pytest.approx(hits / n_pos, abs=1e-12)
    assert got["hits"] <= eff_k

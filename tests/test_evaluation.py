"""Classifier evaluation operators (VERDICT r11 item 7): distributed
ROC-AUC / precision-recall-at-k / threshold drift, differential-tested
against brute force and DuckDB.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.evaluation import (
    precision_recall_at_k,
    roc_auc,
    roc_points,
    threshold_drift,
)


def _rows(n: int = 400, seed: int = 7) -> list[tuple[int, float, int]]:
    """(doc_id, score, label) with deliberate score ties (scores on a
    coarse 0.05 grid) and class imbalance."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        label = 1 if rng.random() < 0.3 else 0
        # positives score higher on average; grid forces ties
        base = 0.55 if label else 0.40
        score = round(min(1.0, max(0.0, base + rng.gauss(0, 0.15))), 2)
        out.append((i, score, label))
    return out


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(_rows(), ["doc_id", "clf_score", "label"])
    # several partitions so the two-phase prefix sum actually crosses
    # partition boundaries (the bug class it exists to avoid)
    return df.repartition(8).cache()


def _brute_auc(rows) -> float:
    pos = [s for _, s, l in rows if l == 1]
    neg = [s for _, s, l in rows if l == 0]
    total = 0.0
    for p in pos:
        for q in neg:
            total += 1.0 if p > q else (0.5 if p == q else 0.0)
    return total / (len(pos) * len(neg))


def test_roc_auc_matches_brute_force(scored):
    rows = _rows()
    assert roc_auc(scored) == pytest.approx(_brute_auc(rows), abs=1e-12)


def test_roc_auc_equals_trapezoid_over_roc_points(scored):
    pts = sorted(
        (r["fpr"], r["tpr"]) for r in roc_points(scored).collect()
    )
    area = 0.0
    prev_f, prev_t = 0.0, 0.0
    for f, t in pts:
        area += (f - prev_f) * (t + prev_t) / 2.0
        prev_f, prev_t = f, t
    # curve ends at (1, 1): the lowest threshold keeps everything
    assert (prev_f, prev_t) == (1.0, 1.0)
    assert roc_auc(scored) == pytest.approx(area, abs=1e-12)


def test_roc_points_match_duckdb_window_oracle(scored):
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE scored(doc_id INT, score DOUBLE, label INT)"
    )
    con.executemany("INSERT INTO scored VALUES (?, ?, ?)", rows)
    oracle = {
        round(r[0], 9): (round(r[1], 9), round(r[2], 9))
        for r in con.execute(
            """
            WITH per AS (
              SELECT score, COUNT(*) cnt, SUM(label) pos
              FROM scored GROUP BY score),
            cum AS (
              SELECT score,
                     SUM(cnt) OVER (ORDER BY score DESC) cum_cnt,
                     SUM(pos) OVER (ORDER BY score DESC) cum_pos
              FROM per),
            tot AS (SELECT SUM(pos) p, SUM(cnt)-SUM(pos) n
                    FROM per)
            SELECT score, CAST(cum_pos AS DOUBLE)/p,
                   CAST(cum_cnt-cum_pos AS DOUBLE)/n
            FROM cum CROSS JOIN tot
            """
        ).fetchall()
    }
    got = {
        round(r["threshold"], 9): (round(r["tpr"], 9), round(r["fpr"], 9))
        for r in roc_points(scored).collect()
    }
    assert got == oracle


def test_roc_requires_both_classes(spark):
    one_class = spark.createDataFrame(
        [(1, 0.5, 1), (2, 0.6, 1)], ["doc_id", "clf_score", "label"]
    )
    with pytest.raises(ValueError, match="n_neg=0"):
        roc_auc(one_class)
    with pytest.raises(ValueError, match="n_neg=0"):
        roc_points(one_class).collect()


def test_precision_recall_at_k_matches_brute_force(scored):
    rows = _rows()
    n_pos = sum(l for _, _, l in rows)
    # deterministic top order: score desc, doc_id asc
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    got = {
        r["k"]: (r["hits"], r["precision"], r["recall"])
        for r in precision_recall_at_k(scored, [10, 50, 200]).collect()
    }
    for k in (10, 50, 200):
        hits = sum(l for _, _, l in ordered[:k])
        assert got[k][0] == hits
        assert got[k][1] == pytest.approx(hits / k, abs=1e-12)
        assert got[k][2] == pytest.approx(hits / n_pos, abs=1e-12)


def test_precision_recall_validates_ks(scored, spark):
    with pytest.raises(ValueError, match="positive"):
        precision_recall_at_k(scored, [])
    with pytest.raises(ValueError, match="positive"):
        precision_recall_at_k(scored, [0, 5])
    no_pos = spark.createDataFrame(
        [(1, 0.5, 0)], ["doc_id", "clf_score", "label"]
    )
    with pytest.raises(ValueError, match="no positive"):
        precision_recall_at_k(no_pos, [1])


def test_threshold_drift_stable_snapshot(scored):
    d = threshold_drift(scored, scored, keep_rate=0.4)
    assert d["threshold_delta"] == 0.0
    # approxQuantile at relative_error=0.001 on 400 rows is exact up
    # to tie blocks; kept fraction must bracket the target loosely
    assert d["keep_rate_at_ref_threshold"] == pytest.approx(0.4, abs=0.1)


def test_threshold_drift_detects_shift(scored):
    shifted = scored.withColumn(
        "clf_score", F.col("clf_score") + F.lit(0.25)
    )
    d = threshold_drift(scored, shifted, keep_rate=0.4)
    assert d["threshold_delta"] == pytest.approx(0.25, abs=0.02)
    # every doc clears the stale reference threshold by ~0.25: the
    # watched keep-rate blows way past the 0.4 target
    assert d["keep_rate_at_ref_threshold"] > 0.7
    assert not math.isnan(d["threshold_new"])


def test_roc_report_matches_separate_calls(scored):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.evaluation import (
        roc_report,
    )

    points, auc = roc_report(scored)
    assert auc == pytest.approx(roc_auc(scored), abs=1e-12)
    sep = {
        round(r["threshold"], 9): (round(r["tpr"], 9), round(r["fpr"], 9))
        for r in roc_points(scored).collect()
    }
    got = {
        round(r["threshold"], 9): (round(r["tpr"], 9), round(r["fpr"], 9))
        for r in points.collect()
    }
    assert got == sep


def test_roc_auc_by_group_matches_per_group_brute_force(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.evaluation import (
        roc_auc_by_group,
    )

    rng = random.Random(13)
    rows = []
    for i in range(300):
        g = ["en", "fr", "zh"][i % 3]
        label = 1 if rng.random() < (0.4 if g == "en" else 0.2) else 0
        score = round(rng.random(), 1)  # coarse grid: plenty of ties
        rows.append((i, g, score, label))
    # a degenerate group with one class only -> NULL auc
    rows += [(1000, "de", 0.5, 1), (1001, "de", 0.7, 1)]
    df = spark.createDataFrame(
        rows, ["doc_id", "lang", "clf_score", "label"]
    ).repartition(8)
    got = {
        r["lang"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in roc_auc_by_group(df, "lang").collect()
    }
    for g in ("en", "fr", "zh"):
        sub = [(i, s, l) for i, gg, s, l in rows if gg == g]
        n_pos = sum(l for _, _, l in sub)
        n_neg = len(sub) - n_pos
        assert got[g][0] == n_pos and got[g][1] == n_neg
        assert got[g][2] == pytest.approx(_brute_auc(sub), abs=1e-12)
    assert got["de"] == (2, 0, None)


def test_calibration_curve_matches_brute_force(scored):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.evaluation import (
        calibration_curve,
    )

    rows = _rows()
    bins = 10
    want: dict[int, list] = {}
    for _, s, l in rows:
        b = min(int(s * bins), bins - 1)
        want.setdefault(b, []).append((s, l))
    got = {
        r["bin"]: (r["n"], r["mean_score"], r["frac_pos"])
        for r in calibration_curve(scored, bins=bins).collect()
    }
    assert set(got) == set(want)
    for b, members in want.items():
        n = len(members)
        assert got[b][0] == n
        assert got[b][1] == pytest.approx(sum(s for s, _ in members) / n, abs=1e-9)
        assert got[b][2] == pytest.approx(sum(l for _, l in members) / n, abs=1e-9)


def test_classification_metrics_match_brute_force(scored):
    import math as _math

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.evaluation import (
        classification_metrics,
    )

    rows = _rows()
    thr = 0.5
    tp = sum(1 for _, s, l in rows if s >= thr and l == 1)
    pp = sum(1 for _, s, _ in rows if s >= thr)
    pos = sum(l for _, _, l in rows)
    acc = sum(1 for _, s, l in rows if (s >= thr) == bool(l)) / len(rows)
    brier = sum((s - l) ** 2 for _, s, l in rows) / len(rows)
    eps = 1e-15
    ll = -sum(
        l * _math.log(min(max(s, eps), 1 - eps))
        + (1 - l) * _math.log(1 - min(max(s, eps), 1 - eps))
        for _, s, l in rows
    ) / len(rows)
    m = classification_metrics(scored, threshold=thr)
    assert m["n"] == len(rows)
    assert m["accuracy"] == pytest.approx(acc, abs=1e-12)
    assert m["precision"] == pytest.approx(tp / pp, abs=1e-12)
    assert m["recall"] == pytest.approx(tp / pos, abs=1e-12)
    assert m["brier"] == pytest.approx(brier, abs=1e-12)
    assert m["log_loss"] == pytest.approx(ll, rel=1e-9)
    # scores of exactly 0/1 stay finite via the clamp
    import math
    extreme = scored.sparkSession.createDataFrame(
        [(1, 1.0, 0), (2, 0.0, 1)], ["doc_id", "clf_score", "label"]
    )
    me = classification_metrics(extreme)
    assert math.isfinite(me["log_loss"]) and me["log_loss"] > 10


def test_one_partition_df_single_slice(spark):
    """r14: driver-list broadcast sides must be ONE RDD partition --
    the default createDataFrame(list) fans a 1-row frame over
    defaultParallelism Python tasks, re-paid on every action that
    rebuilds the broadcast (measured ~4x on pq_topk_rerank)."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (
        one_partition_df,
    )

    df = one_partition_df(spark, [([1, 2, 3],)], "xs array<bigint>")
    assert df.rdd.getNumPartitions() == 1
    assert df.collect()[0]["xs"] == [1, 2, 3]

"""Classifier evaluation: distributed ROC / precision-recall / drift.

Closes the train -> select loop around :mod:`quality_model`: after
training a quality classifier on a labeled sample, the pipeline owner
needs (a) a threshold-free quality number (ROC-AUC), (b) the operating
curve to pick a gate from (ROC points, precision/recall at k), and
(c) a drift check that re-calibrating the keep-rate threshold on a new
corpus snapshot hasn't silently moved the gate.

Reference parity: the reference quickstart has no learned scorer or
evaluation (its analytics end at dashboard aggregates,
``scripts/customer_spending_dashboard.py:98-147``); this extends the
training-data operator family (SURVEY.md section 2 extension block).

Scale shapes (the 100 TB contract for every function here):

- Nothing sorts the corpus through ONE task.  The naive ROC/rank
  formulation is a global ordered window; here scores are first
  collapsed per distinct value (one aggregation shuffle), then the
  cumulative counts use the classic two-phase distributed prefix sum
  (range-partition by score, per-partition running sums, exclusive
  partition offsets broadcast back as an O(#partitions) map literal)
  -- the same shape as ``corpus.pack_global_order``.
- Driver state: O(#partitions) for the prefix offsets, O(k) for
  precision/recall-at-k (Spark's ``orderBy().limit(k)`` is a
  distributed TakeOrdered: per-partition top-k, driver merge of k
  rows), O(1) for AUC and drift.
- Ties are handled exactly: collapsing per distinct score value makes
  the trapezoid over ROC points equal the ties-corrected
  Mann-Whitney AUC (each tied block contributes pos*neg/2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..session import one_partition_df
from .quality_model import threshold_for_keep_rate

__all__ = [
    "roc_points",
    "roc_auc",
    "roc_auc_by_group",
    "roc_report",
    "precision_recall_at_k",
    "calibration_curve",
    "classification_metrics",
    "threshold_drift",
]


def _score_cum(
    scored: DataFrame, label_col: str, score_col: str
) -> tuple[DataFrame, int, int]:
    """Per-distinct-score cumulative counts from the TOP score down.

    Returns ``(df, n_pos, n_neg)`` where df has one row per distinct
    score value with columns (score, cnt, pos, cum_cnt, cum_pos) --
    cum_* counting every row with score >= this row's score.

    Two-phase prefix sum; CALLING this runs an eager job (the
    per-partition-totals collect, which also yields the global
    pos/neg totals for free -- no separate count action).  The ranged
    intermediate is checkpointed to freeze the partition ids the
    offsets were computed against (reliable checkpoint with a
    checkpoint dir configured, localCheckpoint fallback otherwise --
    same caveat as ``corpus.pack_global_order``)."""
    per_score = (
        scored.groupBy(F.col(score_col).alias("score"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col(label_col).cast("long")).alias("pos"),
        )
    )
    ranged = per_score.repartitionByRange(
        F.col("score").desc()
    ).withColumn("__pid", F.spark_partition_id())
    sc = scored.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        ranged = ranged.checkpoint(eager=False)
    else:
        ranged = ranged.localCheckpoint(eager=False)
    totals = {
        r["__pid"]: (int(r["c"]), int(r["p"]))
        for r in ranged.groupBy("__pid")
        .agg(F.sum("cnt").alias("c"), F.sum("pos").alias("p"))
        .collect()
    }
    prefix: dict[int, tuple[int, int]] = {}
    acc_c = acc_p = 0
    for pid in sorted(totals):
        prefix[pid] = (acc_c, acc_p)
        acc_c += totals[pid][0]
        acc_p += totals[pid][1]
    n_pos = acc_p
    n_neg = acc_c - acc_p
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _offset(idx: int):
        if not prefix:
            return F.lit(0)
        return F.create_map(
            *[
                x
                for pid, pre in prefix.items()
                for x in (F.lit(pid), F.lit(pre[idx]))
            ]
        )[F.col("__pid")]

    cum = ranged.select(
        "score",
        "cnt",
        "pos",
        (F.sum("cnt").over(w) + _offset(0)).alias("cum_cnt"),
        (F.sum("pos").over(w) + _offset(1)).alias("cum_pos"),
    )
    return cum, n_pos, n_neg


def roc_points(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "clf_score",
) -> DataFrame:
    """The ROC curve as one row per distinct score value: interpreting
    each value t as the gate ``score >= t``, ``tpr`` = fraction of
    positives kept and ``fpr`` = fraction of negatives kept.

    Returns (threshold, tpr, fpr); |distinct scores| rows.  Corpora
    with continuous scores should quantize the score column first
    (e.g. ``F.round(score, 4)``) -- that bounds the output AND makes
    the curve reproducible across engines whose float sums differ in
    the last ulp."""
    cum, n_pos, n_neg = _score_cum(scored, label_col, score_col)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"ROC needs both classes: n_pos={n_pos}, n_neg={n_neg}"
        )
    return cum.select(
        F.col("score").alias("threshold"),
        (F.col("cum_pos") / F.lit(float(n_pos))).alias("tpr"),
        ((F.col("cum_cnt") - F.col("cum_pos")) / F.lit(float(n_neg))).alias(
            "fpr"
        ),
    )


def roc_auc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "clf_score",
) -> float:
    """Ties-corrected Mann-Whitney ROC-AUC, exactly the trapezoid area
    under :func:`roc_points`:

    ``AUC = sum over distinct scores s of
    [pos_s * neg_below_s + pos_s * neg_s / 2] / (P * N)``

    where ``neg_below_s`` counts negatives with score strictly below s
    -- i.e. each (positive, negative) pair scores 1 when the positive
    ranks higher, 1/2 on a tie.  One aggregation action over the
    per-distinct-score cumulative table; O(1) extra driver state."""
    cum, n_pos, n_neg = _score_cum(scored, label_col, score_col)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"AUC needs both classes: n_pos={n_pos}, n_neg={n_neg}"
        )
    neg_at_or_above = F.col("cum_cnt") - F.col("cum_pos")
    neg_here = F.col("cnt") - F.col("pos")
    neg_below = F.lit(n_neg) - neg_at_or_above
    contrib = F.col("pos") * neg_below + F.col("pos") * neg_here / F.lit(2.0)
    [total] = cum.agg(F.sum(contrib)).first()
    return float(total) / (n_pos * n_neg)


def roc_auc_by_group(
    scored: DataFrame,
    group_col: str,
    label_col: str = "label",
    score_col: str = "clf_score",
) -> DataFrame:
    """Ties-corrected ROC-AUC per group (per language, per source, per
    shard...) -- the corpus-QA view that catches a classifier scoring
    one slice of the corpus well and another at chance.

    Returns (group_col, n_pos, n_neg, auc); groups missing a class get
    NULL auc (undefined) rather than being dropped, so a degenerate
    slice is visible instead of silently absent.

    Scale shape: unlike the global form (which needs the two-phase
    prefix sum to avoid a single-task window), the grouped cumulative
    is a window PARTITIONED BY the group -- each group sorts
    independently in its own task, which is exactly the parallelism
    wanted here.  One aggregation collapses ties per (group, score)
    first, so the window input is |distinct scores| rows per group;
    quantize the score column for groups with near-continuous scores
    (same guidance as ``roc_points``).  A single giant group is the
    skew case -- use :func:`roc_auc` on that group's rows instead."""
    per = scored.groupBy(
        F.col(group_col), F.col(score_col).alias("score")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("score").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    neg_here = F.col("cnt") - F.col("pos")
    # negatives strictly below this score = running sum up to and
    # including this row, minus this row's own negatives
    neg_below = F.sum(neg_here).over(w) - neg_here
    contrib = F.col("pos") * neg_below + F.col("pos") * neg_here / F.lit(2.0)
    stats = (
        per.select(group_col, "cnt", "pos", contrib.alias("__c"))
        .groupBy(group_col)
        .agg(
            F.sum("pos").alias("n_pos"),
            (F.sum("cnt") - F.sum("pos")).alias("n_neg"),
            F.sum("__c").alias("__total"),
        )
    )
    defined = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return stats.select(
        group_col,
        "n_pos",
        "n_neg",
        F.when(
            defined, F.col("__total") / (F.col("n_pos") * F.col("n_neg"))
        ).alias("auc"),
    )


def roc_report(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "clf_score",
) -> tuple[DataFrame, float]:
    """(ROC points, AUC) from ONE per-distinct-score cumulative pass
    -- callers wanting both would otherwise pay :func:`_score_cum`
    (and its range exchange) twice.  The shared intermediate is
    checkpointed, so the points DataFrame stays valid after the AUC
    action."""
    cum, n_pos, n_neg = _score_cum(scored, label_col, score_col)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"ROC needs both classes: n_pos={n_pos}, n_neg={n_neg}"
        )
    points = cum.select(
        F.col("score").alias("threshold"),
        (F.col("cum_pos") / F.lit(float(n_pos))).alias("tpr"),
        ((F.col("cum_cnt") - F.col("cum_pos")) / F.lit(float(n_neg))).alias(
            "fpr"
        ),
    )
    neg_at_or_above = F.col("cum_cnt") - F.col("cum_pos")
    neg_here = F.col("cnt") - F.col("pos")
    neg_below = F.lit(n_neg) - neg_at_or_above
    contrib = F.col("pos") * neg_below + F.col("pos") * neg_here / F.lit(2.0)
    [total] = cum.agg(F.sum(contrib)).first()
    return points, float(total) / (n_pos * n_neg)


def precision_recall_at_k(
    scored: DataFrame,
    ks: list[int],
    label_col: str = "label",
    score_col: str = "clf_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Precision and recall of the top-k documents by score, for each
    k in ``ks``; ties at the boundary broken deterministically by
    ``id_col`` ascending.

    Returns (k, hits, precision, recall), len(ks) rows.  The only
    corpus-wide work is one TakeOrdered (``orderBy().limit(max k)``:
    per-partition top-k then an O(k) driver merge) and one count of
    positives -- no global sort, no corpus-sized window."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be positive ints, got {ks}")
    max_k = max(ks)
    [n_pos] = scored.agg(
        F.sum(F.col(label_col).cast("long")).alias("p")
    ).first()
    n_pos = int(n_pos or 0)
    if n_pos == 0:
        raise ValueError("recall undefined: no positive rows")
    top = (
        scored.select(id_col, score_col, label_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .limit(max_k)
    )
    # max_k rows from here on: the single-partition window is fine
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    ranked = top.select(
        F.col(label_col).cast("long").alias("__lbl"),
        F.row_number().over(w).alias("__rank"),
    )
    ks_df = one_partition_df(
        ranked.sparkSession, [(int(k),) for k in sorted(set(ks))], "k long"
    )
    return (
        ranked.join(ks_df, F.col("__rank") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("__lbl").alias("hits"))
        .select(
            "k",
            "hits",
            (F.col("hits") / F.col("k")).alias("precision"),
            (F.col("hits") / F.lit(float(n_pos))).alias("recall"),
        )
    )


def calibration_curve(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "clf_score",
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram data: bucket scores into ``bins`` equal-width
    bins over [0, 1] and report each bin's mean predicted score vs the
    observed positive rate.  A well-calibrated scorer tracks the
    diagonal; quality gates calibrated as keep BUDGETS
    (``threshold_for_keep_rate``) care less, but any pipeline treating
    ``clf_score`` as a probability (mixture weighting, loss masking)
    needs this check.

    Returns (bin, n, mean_score, frac_pos), <= bins rows.  ONE
    aggregation -- the bin id is a codegen expression, so this is a
    single scan with map-side partial aggregation at any corpus size.
    Scores at exactly 1.0 fold into the top bin."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    b = F.least(
        F.floor(F.col(score_col) * bins).cast("int"), F.lit(bins - 1)
    )
    return (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col(score_col)).alias("mean_score"),
            F.avg(F.col(label_col).cast("double")).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def classification_metrics(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "clf_score",
    threshold: float = 0.5,
) -> dict:
    """Scalar quality metrics in ONE aggregation pass: accuracy /
    precision / recall at ``threshold``, Brier score (mean squared
    probability error), and log loss (scores clamped to [1e-15,
    1-1e-15] so a confidently-wrong 0/1 score reports a large finite
    loss instead of infinity).  O(1) driver state."""
    y = F.col(label_col).cast("double")
    s = F.col(score_col)
    pred = (s >= F.lit(threshold)).cast("double")
    eps = 1e-15
    sc = F.least(F.greatest(s, F.lit(eps)), F.lit(1.0 - eps))
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg((pred == y).cast("double")).alias("accuracy"),
        F.sum(pred * y).alias("tp"),
        F.sum(pred).alias("pp"),
        F.sum(y).alias("pos"),
        F.avg((s - y) * (s - y)).alias("brier"),
        F.avg(-(y * F.log(sc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - sc))).alias(
            "log_loss"
        ),
    ).first()
    n = int(row["n"] or 0)
    if n == 0:
        raise ValueError("empty input")
    tp, pp, pos = float(row["tp"] or 0), float(row["pp"] or 0), float(row["pos"] or 0)
    return {
        "n": n,
        "threshold": threshold,
        "accuracy": float(row["accuracy"]),
        "precision": (tp / pp) if pp else None,
        "recall": (tp / pos) if pos else None,
        "brier": float(row["brier"]),
        "log_loss": float(row["log_loss"]),
    }


def threshold_drift(
    scored_ref: DataFrame,
    scored_new: DataFrame,
    keep_rate: float,
    score_col: str = "clf_score",
    relative_error: float = 0.001,
) -> dict:
    """Re-calibration drift between two corpus snapshots: the
    keep-rate threshold on each (``threshold_for_keep_rate``: one
    approxQuantile pass per snapshot, O(1/relative_error) driver
    state), plus what keep rate the REFERENCE threshold would yield on
    the new snapshot -- the number an alerting rule watches (a stable
    score distribution keeps it ~= ``keep_rate``; a drifting corpus
    or a retrained model moves it).

    Returns ``{threshold_ref, threshold_new, threshold_delta,
    keep_rate_target, keep_rate_at_ref_threshold}``.  Three bounded
    passes total, no corpus-sized driver state."""
    t_ref = threshold_for_keep_rate(
        scored_ref, keep_rate, score_col, relative_error
    )
    t_new = threshold_for_keep_rate(
        scored_new, keep_rate, score_col, relative_error
    )
    kept, total = scored_new.agg(
        F.sum((F.col(score_col) >= F.lit(t_ref)).cast("long")),
        F.count(F.lit(1)),
    ).first()
    if not total:
        raise ValueError("new snapshot is empty")
    return {
        "threshold_ref": t_ref,
        "threshold_new": t_new,
        "threshold_delta": t_new - t_ref,
        "keep_rate_target": keep_rate,
        "keep_rate_at_ref_threshold": float(kept or 0) / float(total),
    }

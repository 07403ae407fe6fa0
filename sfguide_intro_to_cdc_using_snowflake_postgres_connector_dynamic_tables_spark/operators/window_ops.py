"""Window-family operators: analytic windows, sessionization, as-of
join.

None of these exist in the reference (its only window is the CDC
latest-per-key row_number), but they are the standard next step for
any user who outgrows the quickstart's workload -- and all three are
single-shuffle plans at 100 TB:

- analytic windows: ONE Exchange on the partition key, every frame
  function (lag/lead/rank/running sum) evaluated in the same Window
  operator pass;
- sessionization: the classic gap-and-island build -- lag for the gap
  flag, running sum for the session id -- still one shuffle;
- as-of join: the union trick.  Tag both sides, sort each key's
  timeline once, and carry the right side's last value forward with
  ``last(ignorenulls=True)``.  One shuffle of (left + right), NO
  range-join explosion, no per-row probing -- the canonical
  distributed as-of layout (native ASOF joins in DuckDB/kdb do the
  same merge per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def analytic_window(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
) -> DataFrame:
    """lag/lead/rank/running-sum of ``value`` over one (key, order)
    window -- one shuffle, one Window pass."""
    w = Window.partitionBy(key).orderBy(*order)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        key,
        *order,
        F.col(value),
        F.lag(value).over(w).alias("prev_value"),
        F.lead(value).over(w).alias("next_value"),
        F.row_number().over(w).alias("seq"),
        F.sum(value).over(frame).alias("running_value"),
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``.  Gap math is integer
    microseconds (``unix_micros``) so every engine agrees exactly.
    ``keep``: extra columns carried through the window projection, so
    downstream session aggregates need no join back to the source."""
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.select(
        key,
        order_tiebreak,
        F.col(ts_col),
        *keep,
        F.sum(new_session).over(run).alias("session_seq"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """For each left row: ``value`` of the right row with the greatest
    ``right_ts <= left_ts`` for the same key (NULL if none).

    Right rows sharing a (key, ts) must be pre-deduped by the caller if
    a specific winner is required; this operator keeps whichever sorts
    last on (ts).  Implementation is the union trick described in the
    module docstring: right rows sort BEFORE left rows at equal
    timestamps (side 0 < 1), giving inclusive <= semantics."""
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(right.schema[value].dataType).alias("__v"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema) + ">"
        ).alias("__l"),
        F.col(value).alias("__v"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        out_col, F.last("__v", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("__side") == 1)
        .select(F.col("__l.*"), F.col(out_col))
    )


def topk_per_group(
    df: DataFrame,
    group_cols: tuple[str, ...],
    order_col: str,
    k: int,
    tiebreak_cols: tuple[str, ...] = (),
    n_salts: int = 32,
    descending: bool = True,
) -> DataFrame:
    """Top-``k`` rows per group, ranked by ``order_col`` (ties broken by
    ``tiebreak_cols`` -- supply enough to make the order total, or ranks
    are nondeterministic).

    The naive single window over the group key gives #groups-way
    parallelism: with a handful of huge groups, one reducer sorts each
    group's entire contents.  This runs two bounded stages instead:

    1. top-k within (group, salt): parallelism #groups x n_salts and
       every reducer emits at most k rows;
    2. top-k over the <= k * n_salts survivors per group -- a tiny sort.

    Output is identical to the single-window form (each salt's local
    top-k is a superset filter of the global winners), which is exactly
    what the DuckDB oracle pins.

    NB: for rank/row_number filters specifically, Spark >= 3.5 already
    inserts partial/final ``WindowGroupLimit`` (map-side truncation to
    k rows per group before the shuffle) -- visible in this plan too.
    The salted form stays valuable for window functions and frames that
    optimization can't cover (aggregates over group frames, percentile
    cuts), and bounds the *reducer* side as well when map partitions
    are many.
    """
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    order += [F.asc(c) for c in tiebreak_cols]
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order)
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(
            "__salt", F.pmod(F.hash(order_col, *tiebreak_cols), F.lit(n_salts))
        )
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )


def exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    specs: list[tuple[str, float, str]],
) -> DataFrame:
    """EXACT linear-interpolation percentiles per group, computed with
    window sorts instead of Spark's ``percentile`` aggregate.

    ``specs``: (value column, p in [0,1], output name) triples; one
    result row per group with one column per spec.

    When to use vs ``F.percentile``: the percentile aggregate BUFFERS
    every value of a group in its aggregation state (a
    TypedImperativeAggregate) -- at bench scale that in-memory buffer
    is actually FASTER than this form (measured 1.8 s vs 2.9 s warm at
    sf0.1: 3 groups, ~200k values each), but the buffer cannot spill,
    so a group large enough (10^8+ rows at 100 TB) OOMs the executor.
    Here each value column gets one Tungsten window sort over the
    group-partitioned exchange (external sort, SPILLS to disk), every
    row computes its 0-based rank, and the two rows flanking the
    target position ``(n-1)p`` contribute ``1-frac`` / ``frac`` of
    their value to a plain conditional SUM -- same exact result with
    bounded memory at any group size.  This is the exact-quantile
    fallback when groups are huge; both forms concentrate a group's
    data (low-cardinality grouping is inherently skewed), so prefer
    ``sketches``-based quantiles when bounds suffice.

    NULL semantics match ``percentile``: NULLs sort last, ranks and
    ``n`` count only non-null values, an all-NULL group yields NULL.

    Scale shape: ONE exchange on ``group_cols`` (all windows share the
    partitioning; Catalyst reuses it) + one sort per distinct value
    column; the final aggregate rides the same partitioning.  The sort
    is the textbook distributed-exact-quantile cost -- for sketch-based
    bounds at extreme scale use ``sketches.gk_quantiles`` instead.
    """
    from collections import defaultdict

    by_col: dict[str, list[tuple[float, str]]] = defaultdict(list)
    for col, p, name in specs:
        by_col[col].append((p, name))

    cur = df
    aggs = []
    for col, plist in by_col.items():
        v = F.col(col).cast("double")
        w = Window.partitionBy(*group_cols).orderBy(v.asc_nulls_last())
        cnt = F.count(v).over(Window.partitionBy(*group_cols))
        cur = (
            cur.withColumn(f"__rk_{col}", F.row_number().over(w) - 1)
            .withColumn(f"__n_{col}", cnt)
        )
        for p, name in plist:
            t = (F.col(f"__n_{col}") - 1) * F.lit(float(p))
            lo, hi = F.floor(t), F.ceil(t)
            frac = t - lo
            rk = F.col(f"__rk_{col}")
            contrib = (
                F.when((rk == lo) & (lo == hi), v)
                .when(rk == lo, v * (F.lit(1.0) - frac))
                .when(rk == hi, v * frac)
            )
            aggs.append(F.sum(contrib).alias(name))
    return cur.groupBy(*group_cols).agg(*aggs)

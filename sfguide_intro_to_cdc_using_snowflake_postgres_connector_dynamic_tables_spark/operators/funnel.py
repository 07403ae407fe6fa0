"""Event-funnel and cohort-retention analytics over an event stream.

The reference's analytics surface is the purchase-summary dashboard
(``scripts/customer_spending_dashboard.py``); these add the two
event-sequence questions every product-analytics engine answers on the
same kind of data (what Snowflake users express with MATCH_RECOGNIZE /
window functions): ordered-step conversion and week-over-week
retention.

Scale shape (both): every shuffle is keyed on ``user_id`` (or the
final tiny group-by key), so consecutive stages reuse the same hash
partitioning; nothing is collected or broadcast except the final
step/cohort counts, whose cardinality is O(steps) / O(weeks^2)
regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: how many users completed step k --
    i.e. performed ``steps[k]`` at-or-after their earliest completion
    time of step k-1.

    Returns one row per step: (step, step_order, n_users), n_users
    non-increasing by construction.

    Plan shape: k filtered per-user min-ts frontier aggregations
    chained on one ``user_id`` partitioning; ``|frontier_k|`` already
    IS the step-k user count (a frontier row exists iff the user
    reached step k), so each step contributes one global count --
    no per-user dedup window, no zero-fill join (a global aggregate
    over an empty frontier yields the 0 row itself).  Catalyst's
    exchange reuse dedupes the shared frontier subplans across the
    union branches.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ts = F.col(ts_col)
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("t"))
    )
    out = frontier.agg(
        F.lit(steps[0]).alias("step"),
        F.lit(1).alias("step_order"),
        F.count("*").alias("n_users"),
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, ts.alias("ts_next")
        )
        frontier = (
            nxt.join(frontier, user_col)
            .filter(F.col("ts_next") >= F.col("t"))
            .groupBy(user_col)
            .agg(F.min("ts_next").alias("t"))
        )
        out = out.unionByName(
            frontier.agg(
                F.lit(step).alias("step"),
                F.lit(i).alias("step_order"),
                F.count("*").alias("n_users"),
            )
        )
    return out


def funnel_users(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth: the furthest step each first-step user
    reached in order, with the completion timestamp of that step --
    the row-level form of ``funnel_counts`` (fully distributed output,
    no driver action at all).

    Returns (user_id, depth, t_last): depth in [1, len(steps)].
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ts = F.col(ts_col)
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("t"))
        .select(user_col, F.lit(1).alias("depth"), "t")
    )
    out = frontier
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, ts.alias("ts_next")
        )
        frontier = (
            nxt.join(frontier.select(user_col, "t"), user_col)
            .filter(F.col("ts_next") >= F.col("t"))
            .groupBy(user_col)
            .agg(F.min("ts_next").alias("t"))
            .select(user_col, F.lit(i).alias("depth"), "t")
        )
        out = out.unionByName(frontier)
    # keep each user's deepest row
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col("depth").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(user_col, "depth", F.col("t").alias("t_last"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their
    first event; for each (cohort week, week offset) the number of
    cohort users active that week.

    Returns (cohort_week date, week_offset int, n_users long),
    week_offset >= 0.

    Plan shape: per-user min-ts aggregation, distinct (user, week)
    activity pairs, one equi-join on ``user_id`` (same partitioning as
    the aggregation output), final count per (cohort, offset) --
    cardinality O(weeks^2), so the result is dashboard-sized at any
    event volume.
    """
    ts = F.col(ts_col)
    cohorts = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts)).cast("date").alias("cohort_week")
    )
    activity = events.select(
        user_col, F.date_trunc("week", ts).cast("date").alias("activity_week")
    ).distinct()
    return (
        activity.join(cohorts, user_col)
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )

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
    chained: bool = False,
) -> DataFrame:
    """Ordered-funnel conversion: how many users completed step k --
    i.e. performed ``steps[k]`` at-or-after their earliest completion
    time of step k-1.

    Returns one row per step: (step, step_order, n_users), n_users
    non-increasing by construction.

    Plan shape (distinct steps -- the normal case): ONE scan of the
    step-typed events, ONE exchange on ``user_id`` collecting each
    user's (ts, step_idx) pairs time-sorted, a per-row greedy fold
    computing the user's funnel depth, and one global aggregate
    exploded to the k step rows.  The greedy scan -- advance to step
    k on the first step-k event at-or-after the step-(k-1) frontier
    -- computes exactly the chained earliest-completion frontier
    (each min is taken as soon as it is reachable), and the sort
    tie-break ``(ts, step_idx)`` preserves the frontier's ``>=``:
    a step-k event at the SAME timestamp as the step-(k-1) frontier
    sorts after it and still counts.  This replaced a k-branch
    union of chained join/agg frontiers (r8: 2x wall drift from
    repeated subplans the optimizer didn't fully reuse).

    Hot-key bound: the per-user array holds DISTINCT ``(ts,
    step_idx)`` pairs (``collect_set``) -- a duplicate pair can never
    move the greedy frontier (the first copy either advanced ``acc``
    past it or matched nothing), so dedup is exact, and the set's
    map-side partial aggregation collapses bot-grade repeat spam
    BEFORE the shuffle.  A user's state is therefore bounded by their
    distinct step-typed ``(ts, step)`` pairs, not their raw event
    count.  For sources where even distinct pairs are adversarial
    (one key emitting millions of unique-timestamp step events), pass
    ``chained=True``: the chained-frontier formulation keeps O(1)
    state per (user, step) per round at the cost of one join+agg
    exchange pair per step.

    Steps with a repeated event type always use the chained
    frontier formulation (a type-to-index map would be ambiguous).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if not chained and len(set(steps)) == len(steps):
        k = len(steps)
        idx_col = F.lit(None).cast("int")
        for i, s in enumerate(steps):
            idx_col = F.when(F.col(type_col) == s, F.lit(i)).otherwise(idx_col)
        per_user = (
            events.filter(F.col(type_col).isin(list(steps)))
            .groupBy(user_col)
            .agg(
                # NULL-timestamp events must never advance the funnel
                # (a frontier comparison against NULL is never true in
                # the chained form and the SQL oracle) -- the F.when
                # with no otherwise yields NULL for them, which
                # collect_set drops.  sort_array would otherwise have
                # placed null-ts structs FIRST and let them advance.
                F.sort_array(
                    F.collect_set(
                        F.when(
                            F.col(ts_col).isNotNull(),
                            F.struct(
                                F.col(ts_col).alias("ts"), idx_col.alias("si")
                            ),
                        )
                    )
                ).alias("evs"),
                # ...but step-1 membership is existence, not ordering:
                # a user whose only first-step events are null-ts still
                # yields a frontier row (min over nulls is NULL) and
                # counts at step 1 in the chained/SQL form
                F.max((F.col(type_col) == steps[0]).cast("long")).alias(
                    "has_s0"
                ),
            )
        )
        reached = F.aggregate(
            "evs",
            F.lit(0),
            lambda acc, ev: F.when(
                (acc < F.lit(k)) & (ev["si"] == acc), acc + 1
            ).otherwise(acc),
        )
        stats = per_user.select(
            reached.alias("reached"), "has_s0"
        ).agg(
            F.coalesce(F.sum("has_s0"), F.lit(0))
            .cast("long")
            .alias("__c0"),
            *[
                F.coalesce(
                    F.sum((F.col("reached") > i).cast("long")), F.lit(0)
                )
                .cast("long")
                .alias(f"__c{i}")
                for i in range(1, k)
            ],
        )
        return stats.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(steps[i]).alias("step"),
                            F.lit(i + 1).alias("step_order"),
                            F.col(f"__c{i}").alias("n_users"),
                        )
                        for i in range(k)
                    ]
                )
            ).alias("r")
        ).select("r.*")
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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    end_label: str = "(end)",
) -> DataFrame:
    """First-order Markov transition matrix over each user's ordered
    event stream: for every event, which event the same user performs
    next (``end_label`` when there is none), counted per
    (event, next) pair with the per-source transition probability --
    the "what do users do after X" layer of a product-analytics
    engine, and the path-analysis complement of ``funnel_counts``
    (a funnel fixes the path; this measures all of them).

    Returns (event_type, next_event, n_transitions long, p double),
    ``p`` summing to 1 per event_type, rounded to 6dp.  Ordering ties
    at the same timestamp break by ``id_col`` so reruns and engines
    agree.  End-of-stream is detected by a constant-marker lead (not
    by the lead of ``type_col`` being NULL), so a following event
    whose type IS NULL stays a NULL-type transition instead of being
    miscounted as an exit.

    Plan shape: one user-keyed window (lead) over the stream, then a
    two-key count; the probability window runs over the
    O(|event types|^2) aggregate, not the events.  Nothing is
    collected or broadcast; both shuffles are keyed.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    at_end = F.lead(F.lit(1)).over(w).isNull()
    pairs = events.select(
        F.col(type_col).alias("event_type"),
        F.when(at_end, F.lit(end_label))
        .otherwise(F.lead(type_col).over(w))
        .alias("next_event"),
    )
    counts = pairs.groupBy("event_type", "next_event").agg(
        F.count("*").alias("n_transitions")
    )
    total = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_event",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(total), 6
        ).alias("p"),
    )


def daily_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    window_days: int = 7,
    min_periods: int = 2,
) -> DataFrame:
    """Trailing-window z-score anomaly detection on daily event
    volume: each day's event count scored against the mean/stddev of
    the previous ``window_days`` CALENDAR days (current day excluded,
    so a spike can't mask itself).  The daily frame is zero-filled
    over a complete date spine from the first to the last observed
    day, so (a) a calendar gap cannot silently stretch the baseline
    to older data, and (b) zero-volume days -- the classic outage
    anomaly -- get rows and z-scores instead of vanishing.  ``z`` is
    NULL until ``min_periods`` trailing days exist or when the
    trailing stddev is 0 -- undefined, not "anomalous".

    Returns (day date, n_events long, trail_avg, trail_std, z), avg /
    std rounded to 6dp and z to 4dp so two engines computing stddev by
    different algorithms canonicalize identically.

    Plan shape: one keyed day-count aggregation over the stream (the
    stream is scanned ONCE -- gap days are generated from each
    observed day's lag on the already-aggregated O(days) frame, not
    from a separate min/max subtree that would re-scan the source),
    then an unpartitioned window over the daily frame -- the
    single-task windows see days, never events, so this is
    dashboard-sized at any volume (partition by a coarser key, e.g.
    region, if the daily frame itself ever grows large).
    """
    from pyspark.sql import Window

    observed = events.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count("*").alias("n_events")
    )
    # zero-fill: each observed day emits itself plus the gap days since
    # the previous observed day (lag over the aggregated frame)
    prev = F.lag("day").over(Window.orderBy("day"))
    day = (
        observed.withColumn(
            "fill_from", F.coalesce(F.date_add(prev, 1), F.col("day"))
        )
        .select(
            F.explode(F.sequence(F.col("fill_from"), F.col("day"))).alias(
                "fill_day"
            ),
            F.col("day").alias("obs_day"),
            "n_events",
        )
        .select(
            F.col("fill_day").alias("day"),
            F.when(F.col("fill_day") == F.col("obs_day"), F.col("n_events"))
            .otherwise(F.lit(0))
            .alias("n_events"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-window_days, -1)
    trail_n = F.count("n_events").over(w)
    avg = F.avg("n_events").over(w)
    std = F.stddev_samp("n_events").over(w)
    return day.select(
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(avg, 6).alias("trail_avg"),
        F.round(std, 6).alias("trail_std"),
        F.when(
            (trail_n >= min_periods) & (std > 0),
            F.round((F.col("n_events") - avg) / std, 4),
        ).alias("z"),
    )

"""Event-time windowed aggregations with watermarks.

Out of scope for the reference itself (its CDC path is commit-ordered
snapshot-diff -- late data cannot occur by construction, SURVEY.md
section 2.9), but an engine replacing it also ingests genuinely
event-timed streams (the ``events`` table's shape); these helpers are
that path.

Scale shape: watermark bounds state (windows older than
watermark close and evict), aggregation is partial+final per window
key, and the shuffle key is (window, extra keys) -- standard
Structured Streaming physiology, nothing custom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "15 minutes",
    ts_col: str = "ts",
    extra_keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Per-window (+keys) event counts and value sums; late rows beyond
    the watermark are dropped by the engine, on-time late rows update
    their window (output mode 'update' downstream)."""
    w = F.window(F.col(ts_col), window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), *extra_keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *extra_keys,
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "15 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Native session windows (``F.session_window``): a session extends
    while events keep arriving within ``gap`` of the previous one and
    closes (emitting one final row, output mode 'append') once the
    watermark passes the gap -- the streaming dual of the batch
    ``operators.window_ops.sessionize``.  State per open session only;
    the watermark bounds it."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), key)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            key,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window event rates (events/second) -- the monitoring-
    style rollup."""
    w = F.window(F.col(ts_col), window, slide)
    dur = F.col("win.end").cast("long") - F.col("win.start").cast("long")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            (F.col("n_events") / dur).alias("events_per_second"),
        )
    )

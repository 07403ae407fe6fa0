"""Stream-stream and stream-static joins, plus in-flight dedup.

The reference's CDC path never joins two live streams (its view joins a
replicated fact to replicated dims, all table-valued), but an engine
replacing it meets these immediately: click/impression attribution,
enriching a change stream against a slowly-changing dim, and collapsing
at-least-once redelivery before it reaches state.

Scale shape: a stream-stream join keeps both sides' unmatched rows in
state; the watermark + time-bound condition are MANDATORY here (not
hints) -- they let the engine evict state older than
``watermark + interval``, so state is O(window), not O(stream).  The
stream-static join holds no state at all: the static side is re-resolved
per micro-batch and broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
) -> DataFrame:
    """Inner equi-join of two streams on ``key`` where the right event
    lands in ``[left_ts, left_ts + within)``.

    Both inputs must already expose distinct column names (alias before
    calling).  The time-range predicate is what bounds join state: rows
    older than ``watermark + within`` are evicted.
    """
    cond = (
        (left[key] == right[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return (
        left.withWatermark(left_ts, left_watermark)
        .join(right.withWatermark(right_ts, right_watermark), cond, "inner")
        .drop(right[key])
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Collapse at-least-once redelivery: keep the first occurrence of
    each key seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes, so state is bounded by the redelivery window --
    the correct primitive for an at-least-once feed (exact global dedup
    over an unbounded stream would need unbounded state by definition).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream against a static (batch) dimension.  Stateless:
    the static plan is re-evaluated each micro-batch, so a dim backed by
    a store that versions (e.g. ``ParquetTableStore``) picks up updates
    between batches.  Small dims ride a broadcast join -- no shuffle of
    the stream side at all."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, key, how)

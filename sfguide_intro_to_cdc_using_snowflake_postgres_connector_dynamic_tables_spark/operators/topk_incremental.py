"""Incrementally-maintained top-k-per-group views.

Top-k is the materialized view the star-join IVM skeleton
(``streaming/dynamic_table.py``) can't anchor: an insert only enters
the result if it beats the current k-th row, and a DELETE of a result
row promotes something the view no longer remembers.  The classical
fix (the buffered approach of the materialized top-k view literature,
e.g. Yi et al., "Efficient Maintenance of Materialized Top-k Views",
ICDE'03) keeps a candidate BUFFER of the top ``B >= k`` rows per
group:

- inserts/updates merge into the buffer and re-trim to B — O(delta +
  touched groups' buffers) per tick, never O(fact);
- deletes remove from the buffer; the view stays correct as long as
  the buffer still holds >= k rows (rows B+1.. were provably worse
  than the k survivors);
- only when a delete storm drains a SATURATED group's buffer below k
  (saturated = the buffer discarded candidates at some point, so rows
  might be missing) does that group refill from the fact table — a
  restricted per-group recompute, the documented rare path.

State is two DataFrames, stored like any materialization: the buffer
``(group, id, value)`` and the per-group saturation flag.  All steps
are joins/windows on delta-sized or buffer-sized inputs; the fact
table is touched only by refills, restricted to the refilling groups
via a broadcast semi-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..streaming.cdc_apply import latest_per_key


@dataclass
class TopKState:
    buffer: DataFrame  # group_col, id_col, order_col
    saturated: DataFrame  # group_col, saturated(bool)


def _trim(
    df: DataFrame, group_col: str, id_col: str, order_col: str, limit: int
) -> DataFrame:
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= limit)
        .drop("__rk")
    )


def init_topk(
    fact: DataFrame,
    group_col: str,
    id_col: str,
    order_col: str,
    k: int,
    buffer_factor: int = 2,
) -> TopKState:
    """Build the initial buffered state from the fact snapshot."""
    B = k * buffer_factor
    sized = fact.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    buffer = _trim(
        fact.select(group_col, id_col, order_col), group_col, id_col, order_col, B
    )
    saturated = sized.select(
        group_col, (F.col("__n") > B).alias("saturated")
    )
    return TopKState(buffer=buffer, saturated=saturated)


def topk_of_buffer(
    buffer: DataFrame, group_col: str, id_col: str, order_col: str, k: int
) -> DataFrame:
    """The maintained view from a (possibly store-loaded) buffer."""
    return _trim(buffer, group_col, id_col, order_col, k)


def topk(state: TopKState, group_col: str, id_col: str, order_col: str, k: int) -> DataFrame:
    """The maintained view: top k rows per group from the buffer."""
    return topk_of_buffer(state.buffer, group_col, id_col, order_col, k)


def apply_topk_delta(
    state: TopKState,
    delta: DataFrame,
    fact: DataFrame,
    group_col: str,
    id_col: str,
    order_col: str,
    k: int,
    buffer_factor: int = 2,
) -> tuple[TopKState, int]:
    """Fold one I/U/D change batch into the state.

    ``delta`` carries (id_col, group_col, order_col, op, lsn);
    ``fact`` is the post-batch fact snapshot (used ONLY for refills).
    Returns (new state, number of groups refilled) — the refill count
    is the operator's cost telemetry: normal ticks report 0.
    """
    B = k * buffer_factor
    winners = latest_per_key(delta, id_col)
    touched_ids = winners.select(id_col)
    inserts = winners.filter(F.col("op") != "D").select(group_col, id_col, order_col)

    # drop every touched id from the buffer (an update may move a row
    # across groups, so removal is by id, not (group, id)), then merge
    merged = (
        state.buffer.join(F.broadcast(touched_ids), on=id_col, how="left_anti")
        .unionByName(inserts)
    )
    pre_counts = merged.groupBy(group_col).agg(F.count(F.lit(1)).alias("__pre"))
    trimmed = _trim(merged, group_col, id_col, order_col, B)

    sat = (
        pre_counts.join(state.saturated, on=group_col, how="full")
        .select(
            group_col,
            (
                F.coalesce(F.col("saturated"), F.lit(False))
                | (F.coalesce(F.col("__pre"), F.lit(0)) > B)
            ).alias("saturated"),
            F.coalesce(F.col("__pre"), F.lit(0)).alias("__pre"),
        )
    )
    # refill: groups that have discarded candidates before AND now hold
    # fewer than k rows (a trim this tick implies >= B >= k, so only
    # delete-drained groups qualify)
    refill_groups = sat.filter(F.col("saturated") & (F.col("__pre") < k)).select(group_col)
    n_refill = refill_groups.count()
    sat = sat.drop("__pre")

    if n_refill == 0:
        return TopKState(buffer=trimmed, saturated=sat), 0

    refill_fact = fact.join(F.broadcast(refill_groups), on=group_col, how="left_semi")
    refill_buffer = _trim(
        refill_fact.select(group_col, id_col, order_col), group_col, id_col, order_col, B
    )
    refill_sat = (
        refill_fact.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(group_col, (F.col("__n") > B).alias("saturated"))
    )
    keep = trimmed.join(F.broadcast(refill_groups), on=group_col, how="left_anti")
    keep_sat = sat.join(F.broadcast(refill_groups), on=group_col, how="left_anti")
    # a refilled group that emptied entirely drops out of both frames,
    # which is exactly "group no longer exists"
    return (
        TopKState(
            buffer=keep.unionByName(refill_buffer),
            saturated=keep_sat.unionByName(refill_sat),
        ),
        n_refill,
    )

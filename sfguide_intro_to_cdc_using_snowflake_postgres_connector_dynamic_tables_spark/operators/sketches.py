"""Approximate aggregation operators: the constant-memory versions of
the aggregations that stop scaling first.

At 100 TB, `count(DISTINCT user)` shuffles every distinct key to a
reducer and `percentile(x, q)` sorts the column; both are O(data) in
reducer memory.  The sketch forms bound reducer state to kilobytes
per group and merge associatively, so they ride the normal
partial+final HashAggregate plan -- the map side combines locally and
only sketches cross the wire:

- ``approx_distinct_by``: HyperLogLog++ (`approx_count_distinct`,
  tunable rsd) -- the exact form's shuffle volume is O(distinct keys),
  the sketch's is O(groups * sketch_size);
- ``approx_percentiles_by``: Greenwald-Khanna (`percentile_approx`,
  tunable accuracy) -- replaces a per-group sort.

These are deliberately pytest-gated (relative-error bounds vs the
exact answers) rather than DuckDB-hash-gated: two engines' sketches
never match bit-for-bit, and pinning the error contract is the
meaningful check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group approximate distinct count (HLL++), alongside the
    group's row count.  ``rsd`` is the target relative standard
    deviation (0.02 -> ~2% typical error, ~1.5 KB of state)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def approx_percentiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate percentiles (Greenwald-Khanna).  Error is
    bounded by rank: each returned value's true rank is within
    n/accuracy of the requested one -- the guarantee tests pin."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in percentiles]), accuracy
        ).alias("approx_percentiles"),
    )

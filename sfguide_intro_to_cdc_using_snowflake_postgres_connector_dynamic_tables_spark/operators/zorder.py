"""Z-order (Morton-curve) clustering for multi-column file pruning.

Parquet scans prune files/row-groups by min-max stats.  Sorting by one
column makes THAT column's ranges tight and every other column's
useless; interleaving the bits of several columns' positions (the
Z-curve) makes every participating column's per-file range narrow, so
point/range predicates on ANY of them skip most files -- the layout
optimization Delta ships as ``OPTIMIZE ZORDER BY`` and Iceberg as
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``.

Spark-first construction, all codegen, two passes:

1. one tiny aggregate collects each column's (min, max) -- a 1-row
   broadcast, the only driver-visible artifact;
2. each row maps its columns to ``bits``-bit positions by uniform
   scaling, interleaves them into the Morton value with
   shiftleft/or chains (pure expressions, no UDF), then
   ``repartitionByRange`` on the Morton value (sampled range
   boundaries -> even output files) + ``sortWithinPartitions``.

The write is one range shuffle of the data -- the same cost profile as
any OPTIMIZE/compaction pass, run off the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _scaled_position(col: str, bits: int) -> Column:
    """Map __min_/__max_-annotated column to an integer position in
    [0, 2^bits): uniform min-max scaling, NULLs to position 0."""
    lo, hi = F.col(f"__min_{col}"), F.col(f"__max_{col}")
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (F.col(col).cast("double") - lo) / span
    clamped = F.least(F.greatest(F.coalesce(frac, F.lit(0.0)), F.lit(0.0)), F.lit(1.0))
    return F.least(
        (clamped * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


def morton_value(positions: list[Column], bits: int) -> Column:
    """Interleave ``bits``-bit positions into one Morton value.

    Bit j of column i lands at position j * n_cols + i -- an
    expression tree of shiftleft/or, fully whole-stage-codegen."""
    n = len(positions)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, p in enumerate(positions):
            bit = F.shiftright(p, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def zorder_dataframe(
    df: DataFrame, cols: list[str], n_partitions: int = 64, bits: int = 12
) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-curve of ``cols``:
    range-partitioned and sorted by the Morton value, ready to write.
    Each output file then covers a compact hyper-rectangle of the
    value space, so min-max pruning works for every z-ordered column.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*len(cols) must fit a long (got {bits * len(cols)})")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__max_{c}") for c in cols],
    )
    with_z = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", morton_value([_scaled_position(c, bits) for c in cols], bits))
        .drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )
    return (
        with_z.repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = 12,
) -> None:
    """Write ``df`` z-ordered by ``cols`` (one parquet file per range
    partition)."""
    zorder_dataframe(df, cols, n_partitions=n_files, bits=bits).write.mode(
        "overwrite"
    ).parquet(path)

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


_NUMERIC_DTYPES = frozenset(
    {"tinyint", "smallint", "int", "bigint", "float", "double"}
)


def _numeric_projection(c: str, dtype: str) -> Column:
    """Order-preserving numeric image of a z-order column.

    - numerics/decimal: cast double;
    - boolean: 0/1;
    - date/timestamp: epoch seconds (date goes through timestamp);
    - string/binary: the first 6 bytes as a big-endian integer --
      ``hex()`` is byte-wise big-endian and we right-pad the hex image
      with '0', so the projection preserves lexicographic/byte order
      (48 bits stays exact in a double).  A silent cast-to-double here
      would NULL every row and degenerate the Z-curve to the remaining
      columns (ADVICE r4).
    - anything else (array/map/struct): unsupported, raise.
    """
    if dtype in _NUMERIC_DTYPES or dtype.startswith("decimal"):
        return F.col(c).cast("double")
    if dtype == "boolean":
        return F.col(c).cast("int").cast("double")
    if dtype in ("date", "timestamp", "timestamp_ntz"):
        return F.col(c).cast("timestamp").cast("double")
    if dtype in ("string", "binary"):
        return F.conv(
            F.rpad(F.substring(F.upper(F.hex(F.col(c))), 1, 12), 12, "0"), 16, 10
        ).cast("double")
    raise ValueError(
        f"z-order column {c!r} has unsupported type {dtype}; "
        "supported: numeric, decimal, boolean, date, timestamp, string, binary"
    )


def _scaled_position(col: str, bits: int) -> Column:
    """Map the __zp_-projected column to an integer position in
    [0, 2^bits) via its __min_/__max_ stats: uniform min-max scaling,
    NULLs to position 0."""
    lo, hi = F.col(f"__min_{col}"), F.col(f"__max_{col}")
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (F.col(f"__zp_{col}") - lo) / span
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


def with_morton(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Append the Morton value of ``cols`` as a ``__z`` column.

    Shared kernel for ``zorder_dataframe`` and the store's
    ``OPTIMIZE ZORDER BY``: typed order-preserving projection, one
    1-row min/max broadcast, then the shiftleft/or interleave -- all
    codegen.  Validates column existence and types up front."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*len(cols) must fit a long (got {bits * len(cols)})")
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"z-order columns not in DataFrame: {missing}")
    proj = {c: _numeric_projection(c, dtypes[c]) for c in cols}  # raises early
    projected = df.withColumns({f"__zp_{c}": e for c, e in proj.items()})
    stats = projected.agg(
        *[F.min(f"__zp_{c}").alias(f"__min_{c}") for c in cols],
        *[F.max(f"__zp_{c}").alias(f"__max_{c}") for c in cols],
    )
    return (
        projected.crossJoin(F.broadcast(stats))
        .withColumn("__z", morton_value([_scaled_position(c, bits) for c in cols], bits))
        .drop(
            *[f"__min_{c}" for c in cols],
            *[f"__max_{c}" for c in cols],
            *[f"__zp_{c}" for c in cols],
        )
    )


def zorder_dataframe(
    df: DataFrame, cols: list[str], n_partitions: int = 64, bits: int = 12
) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-curve of ``cols``:
    range-partitioned and sorted by the Morton value, ready to write.
    Each output file then covers a compact hyper-rectangle of the
    value space, so min-max pruning works for every z-ordered column.
    """
    return (
        with_morton(df, cols, bits)
        .repartitionByRange(n_partitions, "__z")
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

"""Non-equi range join via bucket blocking.

Spark compiles a pure range predicate (``p.value BETWEEN r.lo AND
r.hi``) to BroadcastNestedLoopJoin -- fine for a handful of ranges,
catastrophic when the range table grows.  The standard fix is to turn
the range predicate into an equi key: quantize the value axis into
fixed-width buckets, explode each range to every bucket it covers, give
each probe row its single bucket, hash-join on the bucket, and keep the
original range predicate as a residual filter.

Cost model: the range side replicates by its average span/step (choose
``step`` near the median range width); the probe side is never
replicated and shuffles once on the bucket key -- or not at all when the
exploded range side broadcasts.  Each (probe, range) pair can meet in at
most one bucket (the probe's), so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_range_join(
    probe: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    step: float = 25000.0,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Inner join of ``probe`` rows to ``ranges`` rows with
    ``lo <= value < hi``, executed as an equi join on the quantized
    bucket plus a residual range filter."""
    lo, hi = F.col(lo_col), F.col(hi_col)
    # covered buckets: [floor(lo/step), ceil(hi/step) - 1].  The upper
    # bound must come from ceil, not floor(hi - 1): with a fractional
    # axis, a value in (hi-1, hi) can sit one bucket past floor((hi-1)/
    # step) and would silently miss its range.  hi is exclusive, so a
    # range ending exactly on a bucket boundary stops one bucket short
    # (ceil(k·step/step) - 1 = k - 1) -- exactly right.
    exploded = ranges.filter(hi > lo).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(step)), F.ceil(hi / F.lit(step)) - 1
            )
        ),
    )
    if broadcast_ranges:
        exploded = F.broadcast(exploded)
    keyed = probe.withColumn("__bucket", F.floor(F.col(value_col) / F.lit(step)))
    return (
        keyed.join(exploded, "__bucket")
        .filter((F.col(value_col) >= lo) & (F.col(value_col) < hi))
        .drop("__bucket")
    )

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
    require_exact: bool = False,
) -> DataFrame:
    """Per-group approximate percentiles (Greenwald-Khanna).  Error is
    bounded by rank: each returned value's true rank is within
    n/accuracy of the requested one -- the guarantee tests pin.

    ``require_exact=True`` asserts the EXACT mode: with ``accuracy``
    >= the group row count the rank error drops below one rank and the
    sketch returns exact discrete quantiles.  Callers relying on that
    (e.g. a hash-match gate against another engine's quantile_disc)
    would otherwise regress SILENTLY when the data outgrows the
    accuracy budget -- percentile_approx just reverts to approximate
    output.  The guard rides the same single aggregation (a count in
    the same HashAggregate, a codegen conditional on top): any group
    bigger than ``accuracy`` fails the job loudly instead of returning
    almost-right values."""
    percs = F.percentile_approx(
        value_col, F.array(*[F.lit(p) for p in percentiles]), accuracy
    ).alias("approx_percentiles")
    if not require_exact:
        return df.groupBy(*group_cols).agg(percs)
    out = df.groupBy(*group_cols).agg(
        percs, F.count(value_col).alias("_group_n")
    )
    return out.select(
        *group_cols,
        F.when(
            F.col("_group_n") > accuracy,
            F.raise_error(
                F.concat(
                    F.lit(
                        "approx_percentiles_by(require_exact=True): group "
                        "size "
                    ),
                    F.col("_group_n").cast("string"),
                    F.lit(
                        f" exceeds accuracy={accuracy}; results would be "
                        "approximate -- raise accuracy or drop require_exact"
                    ),
                )
            ).cast(out.schema["approx_percentiles"].dataType),
        )
        .otherwise(F.col("approx_percentiles"))
        .alias("approx_percentiles"),
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    capacity: int = 1024,
) -> DataFrame:
    """Approximate heavy hitters (frequent items) via per-partition
    Misra-Gries summaries -- the constant-memory sibling of the exact
    ``vocab_topk`` groupBy, for when the distinct-value universe (e.g.
    a 100 TB corpus vocabulary) is too large to shuffle.

    Each partition keeps at most ``capacity`` counters, updated with
    the WEIGHTED Misra-Gries rule over per-batch pre-aggregated
    (value, weight) pairs: each Arrow batch is first collapsed by a
    vectorized ``value_counts`` (C speed), so the Python loop runs per
    DISTINCT value per batch, never per row -- the difference between
    ~0.5 s and ~2.4 s on 1M rows locally, and the difference between
    viable and not at 100 TB.  Weighted update: increment by ``w`` if
    tracked, adopt if a slot is free, else remove ``d = min(w,
    min-counter)`` from every counter AND from the incoming weight
    (``d`` accrues to the error certificate; if ``w > d`` a counter
    just hit zero and the incoming value takes its slot with the
    remainder).  Pre-aggregation can only TIGHTEN the bound vs
    per-row processing.  Summaries merge by summing per-value counts.
    Counters swept to zero are NOT deleted: they hold their slot until
    a new value reclaims it (space-saving style), so a sweep can never
    empty the summary -- the degenerate stream that zeroes every
    counter (e.g. 3 distinct singletons at capacity=2) still surfaces
    its candidates and, critically, the ``max_undercount``
    certificate, instead of returning an empty frame indistinguishable
    from "no data".  Returns the top ``k`` by merged estimate with the
    sketch's error certificate:

    - ``est_count`` never overcounts: ``est_count <= true count``;
    - undercount is bounded: ``true count <= est_count +
      max_undercount`` where ``max_undercount`` = total weighted
      decrement across partitions (<= n/capacity): any unit of any
      value is lost only inside a decrement event, and one event
      removes at most ``d`` units of each value while adding ``d``
      to the certificate;
    - completeness: any value with true count > ``max_undercount``
      survives at least one partition's summary, so true heavy
      hitters cannot be missed entirely.

    ``value`` is returned as a STRING (the input column is cast before
    sketching so any primitive type hashes consistently through the
    Arrow boundary); cast back before joining to the source column.

    Plan shape: one Arrow ``mapInPandas`` pass (state = ``capacity``
    counters per task, constant in data size), a tiny hash agg over
    the O(partitions * capacity) summary rows, and one single-partition
    window over that same bounded frame to attach the error bound --
    nothing proportional to the distinct-value count ever shuffles.
    The per-partition undercount certificate rides the same summary
    rows (value=NULL sentinel) through the same single execution, so
    ``est_count`` and ``max_undercount`` always describe the SAME
    sketch pass -- branching the plan into two jobs would re-run the
    sketch and let the certificate drift from the counts it bounds.
    """
    import pandas as pd
    from pyspark.sql import Window

    if k <= 0 or capacity <= 0:
        raise ValueError("k and capacity must be positive")

    def _pop_zero_slot(counters: dict, free: list):
        # keys swept to zero are recorded in ``free`` and lazily
        # validated on pop (a key may have re-incremented or been
        # reclaimed since it was recorded)
        while free:
            cand = free.pop()
            if counters.get(cand) == 0:
                return cand
        return None

    def summarize(batches):
        counters: dict = {}
        free: list = []
        sweeps = 0
        for pdf in batches:
            # vectorized per-batch pre-aggregation: the Python loop
            # below is per DISTINCT value, never per row
            for v, w in pdf[value_col].value_counts(sort=False).items():
                w = int(w)
                if v in counters:
                    counters[v] += w
                    continue
                if len(counters) < capacity:
                    counters[v] = w
                    continue
                slot = _pop_zero_slot(counters, free)
                if slot is not None:
                    # reclaim a zeroed slot: the evicted key's losses
                    # were all decrement events, already certified
                    del counters[slot]
                    counters[v] = w
                    continue
                # weighted decrement event: remove d from every
                # counter and from the incoming weight; d accrues to
                # the certificate (each value loses at most d here)
                d = min(w, min(counters.values()))
                sweeps += d
                for key, c in counters.items():
                    counters[key] = c - d
                    if c == d:
                        free.append(key)
                if w > d:
                    # d == min counter, so a slot just zeroed: the
                    # incoming value takes it with its remainder
                    slot = _pop_zero_slot(counters, free)
                    del counters[slot]
                    counters[v] = w - d
        yield pd.DataFrame(
            {
                "value": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [sweeps],
            }
        )

    summaries = df.select(F.col(value_col).cast("string").alias(value_col)).mapInPandas(
        summarize, "value string, cnt long"
    )
    # one aggregation over the bounded summary rows (sentinel included),
    # then a global window over that SAME aggregated frame (<=
    # partitions * (capacity + 1) rows by construction) pins counts and
    # certificate to one sketch execution
    merged = summaries.groupBy("value").agg(F.sum("cnt").alias("cnt"))
    everything = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bound = F.coalesce(
        F.max(F.when(F.col("value").isNull(), F.col("cnt"))).over(everything),
        F.lit(0),
    )
    return (
        merged.withColumn("max_undercount", bound)
        .filter(F.col("value").isNotNull())
        .select("value", F.col("cnt").alias("est_count"), "max_undercount")
        .orderBy(F.desc("est_count"), F.asc("value"))
        .limit(k)
    )

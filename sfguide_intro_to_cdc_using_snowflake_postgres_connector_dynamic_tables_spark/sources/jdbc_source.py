"""JDBC snapshot source: partitioned parallel reads of a relational
table -- the production seam for the reference's Postgres side.

The reference wires Postgres through a managed connector
(``scripts/agent_configuration/databases.json:3-6``; logical
replication slot per ``scripts/postgresql_setup.sql:51``).  The repo's
sandbox-testable equivalent is the file/Debezium envelope feed
(``streaming/changefeed.py``); THIS module is the deployment seam for
the initial-snapshot half: a partitioned ``spark.read.jdbc`` bulk
read, which then hands off to the change feed (snapshot-then-tail,
SURVEY.md C2).

What matters at scale is HOW the table is split across executors:

- numeric/temporal keys: range predicates from bounds -- Spark's
  native partitionColumn path, one executor per contiguous key range;
- text/uuid keys (no usable bounds): hash-mod predicates
  (``mod(mod(hash(key), N) + N, N) = i``) so every executor streams a
  statistically even 1/N of the table regardless of key distribution;
- both predicate generators are pure functions, property-tested for
  the invariant that matters: every row matches EXACTLY one predicate
  (no dropped rows, no double reads).

The JDBC connection itself is a thin, driver-dependent tail kept
behind this seam; no database ships in the test sandbox, so tests
pin the predicate algebra (via DuckDB evaluation) and the wrapper's
argument plumbing, not a live connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def range_partition_predicates(
    col: str, lower: int, upper: int, n: int
) -> list[str]:
    """N contiguous, gap-free, non-overlapping range predicates covering
    every value of ``col`` (values outside [lower, upper] are caught by
    the unbounded first/last arms -- bounds are a *hint*, not a filter,
    exactly like Spark's partitionColumn semantics).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if upper < lower:
        raise ValueError(f"upper {upper} < lower {lower}")
    if n == 1:
        return [f"{col} IS NOT NULL OR {col} IS NULL"]  # everything
    span = upper - lower + 1
    step = max(1, span // n)
    cuts = [lower + step * i for i in range(1, n)]
    # dedupe cuts when span < n (tiny tables): fewer, still-correct arms
    cuts = sorted(set(c for c in cuts if lower < c <= upper))
    if not cuts:  # degenerate span (lower == upper): one arm takes all
        return [f"{col} IS NOT NULL OR {col} IS NULL"]
    preds = [f"{col} < {cuts[0]} OR {col} IS NULL"]
    preds += [f"{col} >= {a} AND {col} < {b}" for a, b in zip(cuts, cuts[1:])]
    preds.append(f"{col} >= {cuts[-1]}")
    return preds


def hash_partition_predicates(
    col: str, n: int, hash_fn: str = "hash({col})"
) -> list[str]:
    """N hash-mod predicates for keys without usable numeric bounds
    (uuid/text PKs): partition i takes rows where
    ``mod(mod(<hash>, n) + n, n) = i``, plus NULLs in partition 0.

    The double-mod folds negative hash values into [0, n) without
    ``abs()`` -- Postgres ``abs(hashtext(...))`` errors when hashtext
    returns INT_MIN (abs(-2147483648) overflows int4), aborting one
    partition's snapshot on unlucky key sets (ADVICE r4).

    ``hash_fn`` is the dialect's stable hash spelled with a ``{col}``
    placeholder -- e.g. ``hashtext({col}::text)`` on Postgres,
    ``hash({col})`` on DuckDB (the test dialect).  Evenness comes
    from the hash, so a skewed key distribution (hot tenant, zipfian
    ids) still splits ~1/N per executor -- the property range splits
    lose on skew.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    h = hash_fn.format(col=col)
    if n == 1:
        return [f"{col} IS NOT NULL OR {col} IS NULL"]
    # every non-zero arm excludes NULL explicitly: some dialects hash
    # NULL to a non-NULL value (DuckDB), which would double-assign NULL
    # rows to arm 0's IS NULL clause AND their hash arm
    m = f"mod(mod({h}, {n}) + {n}, {n})"
    preds = [f"({m} = 0 AND {col} IS NOT NULL) OR {col} IS NULL"]
    preds += [f"{m} = {i} AND {col} IS NOT NULL" for i in range(1, n)]
    return preds


def read_jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str],
    partition_col: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 16,
    hash_fn: str = "hashtext({col}::text)",
) -> DataFrame:
    """Partitioned snapshot read of one table over JDBC.

    With numeric ``lower``/``upper`` bounds: range predicates (one
    contiguous index scan per executor).  With only ``partition_col``:
    hash-mod predicates (default spelling targets Postgres).  With
    neither: single-partition read (small dims only -- at 100 TB every
    fact-sized table must pass a partition column).

    This is the bootstrap half of snapshot-then-tail: create the
    replication slot first, record its consistent point, run this read
    under the slot's exported snapshot, then hand both to
    ``streaming.changefeed.CDCPipeline.bootstrap_then_tail`` -- the
    pipeline drops any replayed change with lsn <= the recorded point
    (tests/test_jdbc_integration.py drives the full handoff against a
    DuckDB-faked database).
    """
    if partition_col is None:
        return spark.read.jdbc(url, table, properties=properties)
    if lower is not None and upper is not None:
        preds = range_partition_predicates(partition_col, lower, upper, num_partitions)
    else:
        preds = hash_partition_predicates(partition_col, num_partitions, hash_fn)
    return spark.read.jdbc(url, table, predicates=preds, properties=properties)

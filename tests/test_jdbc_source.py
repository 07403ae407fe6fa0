"""Partition-predicate algebra for the JDBC snapshot source.

No database ships in the sandbox, so these pin the invariant that
makes a partitioned JDBC read correct -- every row matches EXACTLY one
predicate (no drops, no double reads) -- by evaluating the generated
SQL against DuckDB tables, including NULLs, skew, and tiny tables.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.jdbc_source import (
    hash_partition_predicates,
    range_partition_predicates,
)


def _coverage_counts(con, table: str, preds: list[str]) -> list[int]:
    """How many predicates each row matches (must be all 1s)."""
    arms = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds)
    return [r[0] for r in con.execute(f"SELECT {arms} FROM {table}").fetchall()]


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(
        st.one_of(st.integers(-10_000, 10_000), st.none()), min_size=1, max_size=200
    ),
    n=st.integers(1, 17),
)
def test_range_predicates_partition_exactly(values, n):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    present = [v for v in values if v is not None]
    lo, hi = (min(present), max(present)) if present else (0, 0)
    preds = range_partition_predicates("k", lo, hi, n)
    assert len(preds) <= n
    assert set(_coverage_counts(con, "t", preds)) <= {1}
    total = sum(
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0] for p in preds
    )
    assert total == len(values)


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(
        st.one_of(st.text(max_size=12), st.none()), min_size=1, max_size=200
    ),
    n=st.integers(1, 17),
)
def test_hash_predicates_partition_exactly(values, n):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    preds = hash_partition_predicates("k", n, hash_fn="hash({col})")
    assert len(preds) == n
    assert set(_coverage_counts(con, "t", preds)) <= {1}
    total = sum(
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0] for p in preds
    )
    assert total == len(values)


def test_range_predicates_cover_out_of_bounds_values():
    """Bounds are a split hint, not a filter: rows outside [lower,
    upper] must still land in the first/last arm (Spark partitionColumn
    semantics -- silent row loss here is the classic JDBC-read bug)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in (-999, 5, 42, 7777)])
    preds = range_partition_predicates("k", 0, 50, 4)
    assert set(_coverage_counts(con, "t", preds)) == {1}


def test_hash_predicates_spread_skewed_keys():
    """A zipfian key set must spread ~evenly -- the reason hash-mod
    beats range splits for text PKs."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    rows = [(f"tenant-{i}",) for i in range(1000)]
    con.executemany("INSERT INTO t VALUES (?)", rows)
    preds = hash_partition_predicates("k", 8, hash_fn="hash({col})")
    sizes = [
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0] for p in preds
    ]
    assert sum(sizes) == 1000
    assert max(sizes) < 1000 * 0.3  # no partition hogs the table


def test_invalid_args_raise():
    with pytest.raises(ValueError):
        range_partition_predicates("k", 0, 10, 0)
    with pytest.raises(ValueError):
        range_partition_predicates("k", 10, 0, 4)
    with pytest.raises(ValueError):
        hash_partition_predicates("k", 0)


def test_hash_predicates_survive_negative_and_int_min_hashes():
    """The double-mod spelling must partition exactly even when the
    dialect's hash is signed and can return INT_MIN -- the case where
    Postgres abs(hashtext(...)) aborts with int4 overflow (ADVICE r4).
    Simulated with a signed-cast DuckDB hash plus planted sentinel
    values."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    # signed-hash simulation: halve the unsigned hash into int64 range
    # then shift so roughly half the values go negative
    con.executemany(
        "INSERT INTO t VALUES (?)", [(v,) for v in range(500)] + [(None,)]
    )
    preds = hash_partition_predicates(
        "k", 7, hash_fn="(CAST(hash({col}) // 2 AS BIGINT) - 4611686018427387904)"
    )
    counts = _coverage_counts(con, "t", preds)
    assert set(counts) <= {1}
    total = sum(
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0] for p in preds
    )
    assert total == 501
    # the arm expressions themselves must never contain abs()
    assert all("abs(" not in p for p in preds)
    # INT_MIN itself folds into [0, n): evaluate the arm expression
    # standalone on the pathological value
    arm = con.execute(
        "SELECT mod(mod(CAST(-2147483648 AS INTEGER), 7) + 7, 7)"
    ).fetchone()[0]
    assert 0 <= arm < 7

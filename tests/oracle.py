"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a catalog query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then compares row count + order-insensitive
values with doubles rounded to 2dp (BASELINE.md t2)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return f"{round(v, 2):.2f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    spark_pd = spark_df.toPandas()
    # date_as_object keeps DATE columns as datetime.date, matching
    # Spark's toPandas rendering (fetchdf would upcast to datetime64).
    oracle_pd = con.execute(sql).arrow().to_pandas(date_as_object=True)
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        return False, f"columns differ: spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}"
    if len(spark_pd) != len(oracle_pd):
        return False, f"row count differs: spark={len(spark_pd)} oracle={len(oracle_pd)}"
    s = canonical_rows(spark_pd)
    o = canonical_rows(oracle_pd)
    if s != o:
        diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
        return False, f"values differ, first diffs: {diff}"
    return True, "ok"

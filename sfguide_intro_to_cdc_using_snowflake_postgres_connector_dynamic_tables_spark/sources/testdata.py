"""Readers for the driver-generated parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings -- one parquet file (or directory) each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown + column pruning; callers must select only what they need --
the whole point of a columnar scan at 100 TB is never reading the
other columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES: tuple[str, ...] = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    cannot read natively -- read it as long nanos (legacy conf, safe to
    set at runtime; micros columns are unaffected) and floor-truncate
    to a proper micros TimestampType, matching DuckDB's
    ``CAST(ts_ns AS TIMESTAMP)`` semantics.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register each table as a temp view for ``spark.sql`` entry points
    (SURVEY.md S6)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)

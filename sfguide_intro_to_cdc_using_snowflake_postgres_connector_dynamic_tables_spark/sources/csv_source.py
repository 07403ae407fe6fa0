"""CSV bulk load with declared schemas (SURVEY.md S1).

The reference seed-loads four tables via ``COPY ... CSV HEADER``
(``scripts/postgresql_setup.sql:44-47``) with types coming from the
DDL.  Spark equivalent: header-aware CSV read with an explicit
StructType (never schema inference -- a 100 TB load must not pay an
inference pass, and silent type drift is how bad data gets in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .cdc_schemas import TABLE_SCHEMAS


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    date_format: str = "yyyy-MM-dd",
) -> DataFrame:
    """Schema'd CSV read, permissive mode off: malformed rows must fail
    loudly at seed time, not surface as NULLs downstream."""
    return (
        spark.read.option("header", header)
        .option("mode", "FAILFAST")
        .option("dateFormat", date_format)
        .schema(schema)
        .csv(path)
    )


def load_reference_table(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Load one of the four reference-shaped tables from CSV using its
    declared schema (case-insensitive header matching is Spark default,
    covering the reference's UPPERCASE CSV headers)."""
    return read_csv(spark, path, TABLE_SCHEMAS[table])

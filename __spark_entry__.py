"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Dynamic-Table-shaped join on
sf0.001; ``queries()``/``oracle_sql()`` expose the full operator
catalog (see
``sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog import (
    CATALOG,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = CATALOG["purchase_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; rows-only ops are omitted."""
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}

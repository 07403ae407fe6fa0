"""Kill the HUGEINT-vs-BIGINT hash-mismatch bug class at the schema level.

The driver's value hash canonicalizes cells dtype-sensitively: DuckDB
widens ``sum()`` over any integer input to HUGEINT (int128), which
Spark cannot produce, so an uncast integer sum in an oracle SQL makes
the driver's hash diverge even when every value is equal (round-4 red
row ``q12_priority_lines``).  The local string-canonical mirror in
tests/oracle.py hides the width difference, so this suite checks the
*schemas* instead:

1. no oracle SQL may emit a HUGEINT / UHUGEINT / DECIMAL column;
2. every (spark, oracle) column pair must agree on dtype *class*
   (integer / floating / boolean / string / temporal / nested), so an
   int-vs-double divergence can't slip through either.

Schema-only: DuckDB runs ``LIMIT 0``; Spark only resolves the plan.
"""

from __future__ import annotations

import os

import pytest

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog import (
    CATALOG,
)

from .oracle import duckdb_conn

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_SPARK_CLASS = {
    "byte": "int",
    "short": "int",
    "int": "int",
    "integer": "int",
    "long": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "boolean": "bool",
    "string": "str",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _arrow_class(t) -> str:
    import pyarrow.types as pt

    if pt.is_decimal(t):
        return "decimal"  # HUGEINT exports as decimal128(38,0)
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    if pt.is_date(t):
        return "date"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_nested(t):
        return "nested"
    return str(t)


def _spark_class(t: str) -> str:
    t = str(t).lower()
    if t.startswith(("array", "struct", "map")):
        return "nested"
    if t.startswith("decimal"):
        return "decimal"
    return _SPARK_CLASS.get(t, t)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(CATALOG.keys()))
def test_no_hugeint_and_dtype_class_match(spark, con, name):
    fn, sql = CATALOG[name]
    if sql is None:
        pytest.skip("rows-only entry, no oracle SQL")
    if name == "similarity_topk_ivf":
        from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog_ext import (
            ivf_oracle_sql,
        )

        sql = ivf_oracle_sql(SF_DIR)
    schema = con.execute(f"SELECT * FROM ({sql}) q LIMIT 0").arrow().schema
    duck_types = {f.name: f.type for f in schema}
    for col, typ in duck_types.items():
        assert _arrow_class(typ) != "decimal", (
            f"{name}.{col} is {typ}: DuckDB widened an integer aggregate to "
            f"HUGEINT; wrap it in CAST(... AS BIGINT) (see catalog.py HUGEINT rule)"
        )
    spark_types = {f.name: f.dataType.simpleString() for f in fn(spark, SF_DIR).schema.fields}
    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column sets differ spark={sorted(spark_types)} oracle={sorted(duck_types)}"
    )
    for col in spark_types:
        sc, dc = _spark_class(spark_types[col]), _arrow_class(duck_types[col])
        assert sc == dc, (
            f"{name}.{col}: dtype class mismatch spark={spark_types[col]}({sc}) "
            f"oracle={duck_types[col]}({dc}) — driver hash will diverge"
        )

"""Semi/anti-join helpers.

Snowpark's ``Column.isin`` accepts a DataFrame argument
(``scripts/customer_spending_dashboard.py:80``); PySpark's does not --
the genuine API delta called out in SURVEY.md P7.  The idiomatic Spark
translation is a LEFT SEMI join, which Catalyst plans as a broadcast
hash semi-join when the subquery side is small (it is here: distinct
customer ids), never materializing the IN-list on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _resolve_keys(keys: str | list[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def isin_dataframe(df: DataFrame, keys: str | list[str], sub: DataFrame) -> DataFrame:
    """``df`` rows whose ``keys`` appear in ``sub`` (left semi join).

    ``sub`` may have extra columns; only the key columns are used, so
    column pruning reaches its scan.
    """
    cols = _resolve_keys(keys)
    return df.join(sub.select(*cols).distinct(), on=cols, how="left_semi")


def anti_join(df: DataFrame, keys: str | list[str], sub: DataFrame) -> DataFrame:
    """``df`` rows whose ``keys`` do NOT appear in ``sub``."""
    cols = _resolve_keys(keys)
    return df.join(sub.select(*cols).distinct(), on=cols, how="left_anti")

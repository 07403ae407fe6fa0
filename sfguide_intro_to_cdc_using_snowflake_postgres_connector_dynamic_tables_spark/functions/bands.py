"""Banded when-chain expressions (dashboard P5, SURVEY.md section 2.2).

Reference: ``scripts/customer_spending_dashboard.py:21-23`` (spend
bands) and ``:30-34`` (age bands).  The age version deliberately has
NO ``otherwise`` -- out-of-band ages produce NULL, and fixtures pin
that behavior.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def spend_status(total: Column) -> Column:
    """Low < 4000 <= Medium < 6000 <= High
    (``customer_spending_dashboard.py:21-23``)."""
    return (
        F.when(total < 4000, F.lit("Low Spenders"))
        .when((total >= 4000) & (total < 6000), F.lit("Medium Spenders"))
        .otherwise(F.lit("High Spenders"))
    )


def age_group(age: Column) -> Column:
    """Five inclusive age bands, NULL outside 18-90
    (``customer_spending_dashboard.py:30-34`` -- no otherwise)."""
    return (
        F.when((age >= 18) & (age <= 25), F.lit("Gen Z"))
        .when((age >= 26) & (age <= 41), F.lit("Millennials"))
        .when((age >= 42) & (age <= 57), F.lit("Gen X"))
        .when((age >= 58) & (age <= 76), F.lit("Boomers"))
        .when((age >= 77) & (age <= 90), F.lit("Silent Generation"))
    )


def when_bands(
    value: Column,
    edges: Sequence[float],
    labels: Sequence[str],
    otherwise: str | None = None,
) -> Column:
    """Generic half-open banding: ``value < edges[i] -> labels[i]``,
    final label for the tail; ``otherwise=None`` leaves the unmatched
    case NULL (matching the reference's age-band quirk)."""
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    expr = F.when(value < edges[0], F.lit(labels[0]))
    for i in range(1, len(edges)):
        expr = expr.when((value >= edges[i - 1]) & (value < edges[i]), F.lit(labels[i]))
    expr = expr.when(value >= edges[-1], F.lit(labels[-1]))
    if otherwise is not None:
        expr = expr.otherwise(F.lit(otherwise))
    return expr

"""The Snowpark dashboard's data path, re-expressed in PySpark.

Reference: ``scripts/customer_spending_dashboard.py`` (the analytics
workload, SURVEY.md sections 2.2-2.5 and 3.3).  UI/Altair code is out
of scope; every *aggregation* the dashboard runs -- including the four
it runs client-side in pandas (A6) -- is pushed down into Spark here,
because at 100 TB the client-side groupby is not an option.

The dashboard re-executes ``calculate_customer_spending`` per render;
our session layer caches the loaded summary once instead of relying on
a warehouse result cache (SURVEY.md section 3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.bands import age_group, spend_status
from ..operators.semi_join import isin_dataframe


def dashboard_main(summary: DataFrame) -> dict[str, DataFrame]:
    """The reference ``main()``'s full data path in one call
    (``customer_spending_dashboard.py:185-212``), minus UI.

    The reference re-executes ``calculate_customer_spending`` per
    render and leans on the warehouse result cache; here the loaded
    summary is cached once and every downstream frame shares the scan
    (SURVEY.md section 3.3).  Returns the same frames the dashboard
    renders; callers trigger actions.
    """
    summary = summary.cache()
    spending = calculate_customer_spending(summary)
    aged = categorize_by_age(summary)
    return {
        "summary": summary,
        "customer_spending": spending,
        "spend_band_counts": spend_band_counts(spending),
        "categorized": decorate_with_spend_status(aged, spending),
        "daily_category_quantity": daily_category_quantity(summary),
        "card_usage": card_usage_counts(summary),
        "category_counts": category_counts(summary),
        "merchant_stats": merchant_stats(summary),
        "top_merchant": top_merchant(summary),
    }


def calculate_customer_spending(summary: DataFrame) -> DataFrame:
    """Per-customer Purchase spend + band
    (``customer_spending_dashboard.py:16-25``)."""
    return (
        summary.filter(F.col("transaction_category") == "Purchase")
        .groupBy("customer_id")
        .agg(F.sum("total_price").alias("total_price"))
        .withColumn("spend_status", spend_status(F.col("total_price")))
    )


def categorize_by_age(summary: DataFrame) -> DataFrame:
    """Add ``age_group`` (``customer_spending_dashboard.py:27-35``);
    NULL outside the bands."""
    return summary.withColumn("age_group", age_group(F.col("customer_age")))


def spend_band_counts(spending: DataFrame) -> DataFrame:
    """Counts per spend band with zero-fill (A7).

    Mirrors ``display_spend_status_counts``
    (``customer_spending_dashboard.py:37-41``) including its
    positive-spend guard: customers whose Purchase total is <= 0 (all
    refunded, data glitches) are excluded BEFORE counting -- vacuous on
    reference-generated data (purchase sums are positive) but a real
    divergence for a user porting the dashboard onto dirtier data.
    The reference reindexes client-side so all 3 bands appear even
    with 0 members (``:39-41``); we left-join a literal band dimension
    instead -- relational, and the 3-row dim is a broadcast.
    """
    spark = spending.sparkSession
    bands = spark.range(1).select(
        F.explode(
            F.array(F.lit("Low Spenders"), F.lit("Medium Spenders"), F.lit("High Spenders"))
        ).alias("spend_status")
    )
    counts = (
        spending.filter(F.col("total_price") > 0).groupBy("spend_status").count()
    )
    return (
        bands.join(counts, "spend_status", "left")
        .select("spend_status", F.coalesce(F.col("count"), F.lit(0)).alias("count"))
    )


def filter_by_date_range(summary: DataFrame, start, end) -> DataFrame:
    """Inclusive date-range filter (``customer_spending_dashboard.py:67-70``)."""
    return summary.filter(
        (F.col("transaction_date") >= F.to_date(F.lit(start)))
        & (F.col("transaction_date") <= F.to_date(F.lit(end)))
    )


def clamp_date_range(summary: DataFrame, start, end, today=None):
    """Sidebar date-clamp semantics
    (``customer_spending_dashboard.py:54-62``): an end date in the
    future clamps to today, a start date before the earliest
    ``transaction_date`` clamps to that earliest date.  Returns the
    clamped ``(start, end)`` pair for ``filter_by_date_range``.

    ``today`` is injectable for tests; the reference reads
    ``CURRENT_DATE()``.  The earliest-date probe is a global MIN --
    partial+final aggregate, one 1-row result, same as the reference's
    ``select(min(TRANSACTION_DATE)).collect()``.
    """
    import datetime

    if isinstance(start, str):
        start = datetime.date.fromisoformat(start)
    if isinstance(end, str):
        end = datetime.date.fromisoformat(end)
    if today is None:
        today = datetime.date.today()
    if end > today:
        end = today
    earliest = summary.select(
        F.min("transaction_date").alias("earliest")
    ).first()["earliest"]
    if earliest is not None and start < earliest:
        start = earliest
    return start, end


def customers_with_spend_status(summary: DataFrame, spending: DataFrame, status: str) -> DataFrame:
    """Semi-join restriction (P7: Snowpark isin(DataFrame) -> left semi).

    ``customer_spending_dashboard.py:79-80``.
    """
    sub = spending.filter(F.col("spend_status") == status)
    return isin_dataframe(summary, "customer_id", sub)


def decorate_with_spend_status(summary: DataFrame, spending: DataFrame) -> DataFrame:
    """Left-outer decoration (J3, ``customer_spending_dashboard.py:189``)."""
    return summary.join(
        spending.select("customer_id", "spend_status"), on="customer_id", how="left"
    )


def top_merchant(summary: DataFrame) -> DataFrame:
    """Top-1 merchant by summed total_price (O1,
    ``customer_spending_dashboard.py:161-163``), tie-broken by name so
    goldens are deterministic (FIXTURES.md section 4).

    ``orderBy().limit(1)`` compiles to TakeOrderedAndProject -- a
    per-partition top-k + driver merge, no global sort.
    """
    return (
        summary.groupBy("merchant_name")
        .agg(F.sum("total_price").alias("total_price"))
        .orderBy(F.desc("total_price"), F.asc("merchant_name"))
        .limit(1)
    )


def daily_category_quantity(summary: DataFrame) -> DataFrame:
    """A6: pandas ``groupby([date, category]).agg(quantity sum)`` pushed
    into Spark (``customer_spending_dashboard.py:102``)."""
    return summary.groupBy("transaction_date", "transaction_category").agg(
        F.sum("quantity").alias("quantity")
    )


def card_usage_counts(summary: DataFrame) -> DataFrame:
    """A6: transactions per card type (``customer_spending_dashboard.py:113``)."""
    return summary.groupBy("transaction_card").agg(
        F.count("transaction_id").alias("transaction_count")
    )


def category_counts(summary: DataFrame) -> DataFrame:
    """A6: transactions per product category
    (``customer_spending_dashboard.py:127``)."""
    return summary.groupBy("product_category").agg(
        F.count("transaction_id").alias("transaction_count")
    )


def merchant_stats(summary: DataFrame) -> DataFrame:
    """A6: per-merchant txn count + revenue
    (``customer_spending_dashboard.py:137``)."""
    return summary.groupBy("merchant_name").agg(
        F.count("transaction_id").alias("transaction_count"),
        F.sum("total_price").alias("total_price"),
    )

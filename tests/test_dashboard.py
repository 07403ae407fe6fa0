"""Dashboard analytics parity (SURVEY.md sections 2.2-2.5, 3.3) on
reference-shaped fixture data, checked against a DuckDB oracle running
the equivalent SQL over the same rows.

Pins the reference's quirks: NULL age bands outside 18-90, zero-filled
spend-band counts, semi-join customer restriction, deterministic top-1
merchant tie-break, inclusive date-range edges.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans import (
    dashboard,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.purchase_summary import (
    customer_purchase_summary,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources import (
    fixtures,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.cdc_schemas import (
    CUSTOMERS_SCHEMA,
    MERCHANTS_SCHEMA,
    PRODUCTS_SCHEMA,
    TRANSACTIONS_SCHEMA,
)

from .oracle import canonical_rows


@pytest.fixture(scope="module")
def data(spark):
    customers = fixtures.make_customers(120, seed=42)
    merchants = fixtures.make_merchants(seed=42)
    products = fixtures.make_products(seed=42)
    transactions = fixtures.make_transactions(
        customers, products, merchants, n=800, orphan_frac=0.3, seed=42
    )
    dfs = {
        "customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
        "merchants": spark.createDataFrame(merchants, MERCHANTS_SCHEMA),
        "products": spark.createDataFrame(products, PRODUCTS_SCHEMA),
        "transactions": spark.createDataFrame(transactions, TRANSACTIONS_SCHEMA),
    }
    summary = customer_purchase_summary(
        dfs["transactions"], dfs["customers"], dfs["products"], dfs["merchants"]
    ).cache()

    con = duckdb.connect()
    for name, df in dfs.items():
        con.register(f"{name}_pd", df.toPandas())
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM {name}_pd")
    con.execute(
        """
        CREATE TABLE summary AS
        SELECT t.transaction_id, t.customer_id, c.age AS customer_age,
               t.product_id, p.product_name, p.product_category,
               t.merchant_id, m.merchant_name, m.merchant_category,
               t.transaction_date, t.transaction_time, t.quantity,
               t.quantity * p.price AS total_price,
               t.transaction_card, t.transaction_category
        FROM transactions t
        JOIN customers c ON t.customer_id = c.customer_id
        JOIN products p ON t.product_id = p.product_id
        JOIN merchants m ON t.merchant_id = m.merchant_id
                        AND m.merchant_category = p.product_category
        """
    )
    yield dfs, summary, con
    con.close()


def _match(spark_df, con, sql):
    import pandas as pd

    s = canonical_rows(spark_df.toPandas())
    o = canonical_rows(con.execute(sql).arrow().to_pandas(date_as_object=True))
    assert s == o, f"first diffs: {[x for x in zip(s, o) if x[0] != x[1]][:3]}"


def test_summary_matches_oracle(data):
    dfs, summary, con = data
    _match(summary, con, "SELECT * FROM summary")


def test_customer_spending_bands(data):
    dfs, summary, con = data
    _match(
        dashboard.calculate_customer_spending(summary),
        con,
        """
        SELECT customer_id, sum(total_price) AS total_price,
               CASE WHEN sum(total_price) < 4000 THEN 'Low Spenders'
                    WHEN sum(total_price) >= 4000 AND sum(total_price) < 6000 THEN 'Medium Spenders'
                    ELSE 'High Spenders' END AS spend_status
        FROM summary WHERE transaction_category = 'Purchase'
        GROUP BY customer_id
        """,
    )


def test_age_groups_null_outside_bands(spark, data):
    dfs, summary, con = data
    aged = dashboard.categorize_by_age(summary)
    _match(
        aged.select("transaction_id", "customer_age", "age_group"),
        con,
        """
        SELECT transaction_id, customer_age,
               CASE WHEN customer_age BETWEEN 18 AND 25 THEN 'Gen Z'
                    WHEN customer_age BETWEEN 26 AND 41 THEN 'Millennials'
                    WHEN customer_age BETWEEN 42 AND 57 THEN 'Gen X'
                    WHEN customer_age BETWEEN 58 AND 76 THEN 'Boomers'
                    WHEN customer_age BETWEEN 77 AND 90 THEN 'Silent Generation' END AS age_group
        FROM summary
        """,
    )
    # the out-of-band fixture customers (age 17, 91) must yield NULL if present
    nulls = aged.filter(F.col("customer_age").isin(17, 91)).select("age_group").collect()
    assert all(r["age_group"] is None for r in nulls)


def test_spend_band_zero_fill(spark, data):
    dfs, summary, con = data
    spending = dashboard.calculate_customer_spending(summary)
    counts = {r["spend_status"]: r["count"] for r in dashboard.spend_band_counts(spending).collect()}
    assert set(counts) == {"Low Spenders", "Medium Spenders", "High Spenders"}  # all bands present
    # reference guard (customer_spending_dashboard.py:38): only
    # positive-total customers are counted; on reference-shaped data
    # every Purchase sum is positive so the counts cover everyone
    positive_total = spending.filter(F.col("total_price") > 0).count()
    assert sum(counts.values()) == positive_total == spending.count()


def test_spend_band_counts_positive_guard(spark):
    """A customer whose Purchase rows net to <= 0 (all refunded /
    data glitch) is excluded from the band metrics, exactly like the
    reference's ``filter(col("TOTAL_PRICE") > 0)``
    (customer_spending_dashboard.py:38)."""
    spending_rows = [
        (1, 5000.0),   # Medium
        (2, -120.0),   # negative net -> excluded
        (3, 0.0),      # zero net -> excluded (strict >)
        (4, 7000.0),   # High
    ]
    df = spark.createDataFrame(
        spending_rows, "customer_id long, total_price double"
    ).withColumn(
        "spend_status",
        F.when(F.col("total_price") < 4000, F.lit("Low Spenders"))
        .when(F.col("total_price") < 6000, F.lit("Medium Spenders"))
        .otherwise(F.lit("High Spenders")),
    )
    counts = {
        r["spend_status"]: r["count"]
        for r in dashboard.spend_band_counts(df).collect()
    }
    assert counts == {
        "Low Spenders": 0,  # the negative/zero customers fell in Low but are guarded out
        "Medium Spenders": 1,
        "High Spenders": 1,
    }


def test_clamp_date_range(spark, data):
    """Sidebar clamp parity (customer_spending_dashboard.py:54-62):
    future end -> today, start before the data -> earliest date."""
    import datetime

    dfs, summary, con = data
    earliest = summary.select(F.min("transaction_date").alias("m")).first()["m"]
    today = datetime.date(2024, 6, 1)
    # both out of range: start long before the data, end in the future
    s, e = dashboard.clamp_date_range(
        summary, "1990-01-01", "2999-12-31", today=today
    )
    assert s == earliest and e == today
    # both in range: passed through untouched
    s2, e2 = dashboard.clamp_date_range(
        summary, earliest, today - datetime.timedelta(days=1), today=today
    )
    assert s2 == earliest and e2 == today - datetime.timedelta(days=1)


def test_semi_join_restriction(data):
    dfs, summary, con = data
    spending = dashboard.calculate_customer_spending(summary)
    high = dashboard.customers_with_spend_status(summary, spending, "High Spenders")
    _match(
        high.select("transaction_id", "customer_id"),
        con,
        """
        SELECT transaction_id, customer_id FROM summary
        WHERE customer_id IN (
            SELECT customer_id FROM (
                SELECT customer_id, CASE WHEN sum(total_price) < 4000 THEN 'Low Spenders'
                            WHEN sum(total_price) >= 4000 AND sum(total_price) < 6000 THEN 'Medium Spenders'
                            ELSE 'High Spenders' END AS spend_status
                FROM summary WHERE transaction_category = 'Purchase' GROUP BY customer_id)
            WHERE spend_status = 'High Spenders')
        """,
    )


def test_top_merchant_deterministic(data):
    dfs, summary, con = data
    _match(
        dashboard.top_merchant(summary),
        con,
        """
        SELECT merchant_name, sum(total_price) AS total_price
        FROM summary GROUP BY merchant_name
        ORDER BY sum(total_price) DESC, merchant_name ASC LIMIT 1
        """,
    )


def test_date_range_inclusive(spark, data):
    dfs, summary, con = data
    lo, hi = "2023-11-01", "2024-02-29"
    filtered = dashboard.filter_by_date_range(summary, lo, hi)
    _match(
        filtered.select("transaction_id", "transaction_date"),
        con,
        f"""
        SELECT transaction_id, transaction_date FROM summary
        WHERE transaction_date >= DATE '{lo}' AND transaction_date <= DATE '{hi}'
        """,
    )
    # empty-range case (the dashboard's empty-result guard path)
    assert dashboard.filter_by_date_range(summary, "1990-01-01", "1990-01-02").count() == 0


def test_chart_aggregations(data):
    dfs, summary, con = data
    _match(
        dashboard.daily_category_quantity(summary),
        con,
        """SELECT transaction_date, transaction_category, sum(quantity) AS quantity
           FROM summary GROUP BY 1, 2""",
    )
    _match(
        dashboard.card_usage_counts(summary),
        con,
        """SELECT transaction_card, count(transaction_id) AS transaction_count
           FROM summary GROUP BY 1""",
    )
    _match(
        dashboard.category_counts(summary),
        con,
        """SELECT product_category, count(transaction_id) AS transaction_count
           FROM summary GROUP BY 1""",
    )
    _match(
        dashboard.merchant_stats(summary),
        con,
        """SELECT merchant_name, count(transaction_id) AS transaction_count,
                  sum(total_price) AS total_price
           FROM summary GROUP BY 1""",
    )


def test_left_join_decoration(data):
    dfs, summary, con = data
    spending = dashboard.calculate_customer_spending(summary)
    decorated = dashboard.decorate_with_spend_status(summary, spending)
    assert decorated.count() == summary.count()
    # refund-only customers have no Purchase rows -> NULL spend_status
    assert "spend_status" in decorated.columns

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.skew import (
    salted_join,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.dashboard import (
    dashboard_main,
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


def test_salted_join_equals_plain_join(spark):
    """Salting must be a pure physical transformation: same rows as the
    plain join, for inner and left, including unmatched keys."""
    rng = random.Random(0)
    # one hot key (90% of rows) + a tail, plus an unmatched key
    facts = [(1 if rng.random() < 0.9 else rng.randint(2, 20), i) for i in range(5000)]
    facts.append((99, 9999))  # no dim row
    dims = [(k, f"dim{k}") for k in range(1, 21)]
    f = spark.createDataFrame(facts, ["k", "payload"])
    d = spark.createDataFrame(dims, ["k", "name"])

    for how in ("inner", "left"):
        plain = f.join(d, on="k", how=how).select("k", "payload", "name")
        salted = salted_join(f, d, on="k", how=how, n_salts=4).select("k", "payload", "name")
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_dashboard_main_frames(spark):
    customers = fixtures.make_customers(80, seed=21)
    merchants = fixtures.make_merchants(seed=21)
    products = fixtures.make_products(seed=21)
    tx = fixtures.make_transactions(customers, products, merchants, n=400, orphan_frac=0.3, seed=21)
    summary = customer_purchase_summary(
        spark.createDataFrame(tx, TRANSACTIONS_SCHEMA),
        spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
        spark.createDataFrame(products, PRODUCTS_SCHEMA),
        spark.createDataFrame(merchants, MERCHANTS_SCHEMA),
    )
    frames = dashboard_main(summary)
    assert set(frames) == {
        "summary",
        "customer_spending",
        "spend_band_counts",
        "categorized",
        "daily_category_quantity",
        "card_usage",
        "category_counts",
        "merchant_stats",
        "top_merchant",
    }
    n = frames["summary"].count()
    assert frames["categorized"].count() == n  # left-join decoration preserves rows
    assert frames["top_merchant"].count() <= 1
    assert frames["spend_band_counts"].count() == 3
    # cards partition the summary rows
    assert (
        frames["card_usage"].agg(F.sum("transaction_count")).first()[0] == n
    )

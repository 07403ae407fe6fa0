"""Seeded synthetic generator for the reference-shaped CDC tables.

Reproduces the *properties* of the reference seed data
(FIXTURES.md section 1, reference ``scripts/postgres_csv/*`` +
``scripts/postgresql_setup.sql:58-133``) without copying it:

- customers: ages 18-85 plus deliberate out-of-band rows (17, 91) so
  the age-band when-chain's missing ``otherwise`` yields NULLs;
- merchants/products: the shared 7-value category domain the Dynamic
  Table's composite join condition depends on;
- transactions: ~95% of seed rows are customer orphans (the reference
  seed has 955/1000 -- the inner join must drop them), quantity 1-10,
  ``total_price = quantity * price`` exactly;
- a scripted change log mirroring ``insert_transactions`` semantics
  (batches of inserts sampling live dim keys, 80/20 Purchase/Refund,
  qty 1-7) plus the U/D cases the reference generator never emits.

Deterministic under ``seed`` (default 42, matching TESTDATA).
"""

from __future__ import annotations

import datetime as dt
import random
import uuid

from pyspark.sql import DataFrame, SparkSession

from .cdc_schemas import (
    CUSTOMERS_SCHEMA,
    MERCHANTS_SCHEMA,
    PRODUCTS_SCHEMA,
    TRANSACTIONS_SCHEMA,
)

CATEGORIES = [
    "Retail",
    "Tech",
    "Produce",
    "Food",
    "Fashion",
    "Pharmacy",
    "Entertainment",
]
CARDS = ["American Express", "Visa", "Mastercard", "Discover"]

_FIRST = ["Alice", "Bob", "Carol", "Dan", "Eve", "Frank", "Grace", "Heidi", "Ivan", "Judy"]
_LAST = ["Smith", "Jones", "Lee", "Brown", "Garcia", "Chen", "Patel", "Kim", "Nguyen", "Davis"]


def make_customers(n: int = 300, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        cid = 1000 + i
        first = rng.choice(_FIRST)
        last = rng.choice(_LAST)
        age = rng.randint(18, 85)
        rows.append(
            (
                cid,
                first,
                last,
                age,
                f"{first.lower()}.{last.lower()}{cid}@example.com",
                f"{rng.randint(200, 999)}-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}",
            )
        )
    # Out-of-band ages: the dashboard when-chain has no otherwise ->
    # these must surface as NULL age_group (FIXTURES.md section 4).
    rows.append((9901, "Tiny", "Tester", 17, "tiny@example.com", "000"))
    rows.append((9902, "Elder", "Tester", 91, "elder@example.com", "001"))
    return rows


def make_merchants(seed: int = 42) -> list[tuple]:
    rng = random.Random(seed + 1)
    rows = []
    mid = 1
    for cat in CATEGORIES:
        for j in range(2):  # 2 merchants per category, 14 rows like the seed
            rows.append((mid, f"{cat}Mart-{j}", cat))
            mid += 1
    rng.shuffle(rows)
    return rows


def make_products(seed: int = 42) -> list[tuple]:
    rng = random.Random(seed + 2)
    rows = []
    pid = 101
    for cat in CATEGORIES:
        # 2 per category except Food/Entertainment=1 -> 12 rows, like the seed
        count = 1 if cat in ("Food", "Entertainment") else 2
        for j in range(count):
            price = round(rng.uniform(300.0, 1400.0), 2)
            rows.append((pid, f"{cat} Product {j}", cat, price))
            pid += 1
    return rows


def make_transactions(
    customers: list[tuple],
    products: list[tuple],
    merchants: list[tuple],
    n: int = 1000,
    orphan_frac: float = 0.955,
    seed: int = 42,
) -> list[tuple]:
    rng = random.Random(seed + 3)
    live_cids = [c[0] for c in customers]
    base_date = dt.date(2023, 10, 8)
    rows = []
    for _ in range(n):
        if rng.random() < orphan_frac:
            cid = rng.randint(20000, 99999)  # no such customer
        else:
            cid = rng.choice(live_cids)
        pid, _, _, price = rng.choice(products)
        mid = rng.choice(merchants)[0]
        qty = rng.randint(1, 10)
        d = base_date + dt.timedelta(days=rng.randint(0, 364))
        t = f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
        rows.append(
            (
                str(uuid.UUID(int=rng.getrandbits(128), version=4)),
                cid,
                pid,
                mid,
                d,
                t,
                qty,
                round(qty * price, 2),
                rng.choice(CARDS),
                "Purchase" if rng.random() < 0.8 else "Refund",
            )
        )
    return rows


def seed_dataframes(
    spark: SparkSession, seed: int = 42, n_customers: int = 300, n_transactions: int = 1000
) -> dict[str, DataFrame]:
    """The four reference-shaped tables as DataFrames."""
    customers = make_customers(n_customers, seed)
    merchants = make_merchants(seed)
    products = make_products(seed)
    transactions = make_transactions(customers, products, merchants, n_transactions, seed=seed)
    return {
        "customers": spark.createDataFrame(customers, CUSTOMERS_SCHEMA),
        "merchants": spark.createDataFrame(merchants, MERCHANTS_SCHEMA),
        "products": spark.createDataFrame(products, PRODUCTS_SCHEMA),
        "transactions": spark.createDataFrame(transactions, TRANSACTIONS_SCHEMA),
    }


def change_log(
    customers: list[tuple],
    products: list[tuple],
    merchants: list[tuple],
    batches: int = 5,
    rows_per_batch: int = 100,
    seed: int = 42,
) -> list[dict]:
    """Scripted CDC change log (FIXTURES.md section 2).

    Returns a list of batches; each batch is a dict
    ``{table_name: [(op, lsn, row_dict), ...]}``.  Mirrors the
    reference generator (inserts into transactions sampling live dims,
    80/20 Purchase/Refund, qty 1-7, ``scripts/postgresql_setup.sql:
    76-130``) and adds U/D/duplicate-key cases CDC parity requires.
    """
    rng = random.Random(seed + 7)
    lsn = 1000
    out: list[dict] = []
    epoch = 1_700_000_000
    for b in range(batches):
        batch: dict[str, list] = {"transactions": [], "customers": [], "products": [], "merchants": []}
        for j in range(rows_per_batch):
            cid = rng.choice(customers)[0]
            pid, _, _, price = rng.choice(products)
            mid = rng.choice(merchants)[0]
            qty = rng.randint(1, 7)
            lsn += 1
            batch["transactions"].append(
                (
                    "I",
                    lsn,
                    {
                        "transaction_id": f"TX{epoch + b}{j}",
                        "customer_id": cid,
                        "product_id": pid,
                        "merchant_id": mid,
                        "transaction_date": dt.date(2024, 10, 8) + dt.timedelta(days=b),
                        "transaction_time": f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}",
                        "quantity": qty,
                        "total_price": round(qty * price, 2),
                        "transaction_card": rng.choice(CARDS),
                        "transaction_category": "Purchase" if rng.random() < 0.8 else "Refund",
                    },
                )
            )
        if b == 1:
            # dim update: re-price a product (affects recomputed total_price
            # of every joined fact row -> incremental refresh must touch them)
            pid, name, cat, price = products[0]
            lsn += 1
            batch["products"].append(
                ("U", lsn, {"product_id": pid, "product_name": name, "product_category": cat, "price": round(price * 1.1, 2)})
            )
            # customer age crosses a band edge
            c = customers[0]
            lsn += 1
            batch["customers"].append(
                ("U", lsn, {"customer_id": c[0], "firstname": c[1], "lastname": c[2], "age": 26, "email": c[4], "phone_number": c[5]})
            )
        if b == 2:
            # delete a merchant -> its fact rows drop out of the view
            lsn += 1
            batch["merchants"].append(("D", lsn, {"merchant_id": merchants[0][0]}))
            # duplicate-key updates within one batch: latest lsn wins
            c = customers[1]
            for age in (30, 44):
                lsn += 1
                batch["customers"].append(
                    ("U", lsn, {"customer_id": c[0], "firstname": c[1], "lastname": c[2], "age": age, "email": c[4], "phone_number": c[5]})
                )
        if b == 3:
            # orphan insert: fact referencing a customer that doesn't exist
            lsn += 1
            batch["transactions"].append(
                (
                    "I",
                    lsn,
                    {
                        "transaction_id": f"TXORPHAN{b}",
                        "customer_id": 99999,
                        "product_id": products[0][0],
                        "merchant_id": merchants[1][0],
                        "transaction_date": dt.date(2024, 10, 11),
                        "transaction_time": "12:00:00",
                        "quantity": 1,
                        "total_price": products[0][3],
                        "transaction_card": "Visa",
                        "transaction_category": "Purchase",
                    },
                )
            )
        out.append(batch)
    return out

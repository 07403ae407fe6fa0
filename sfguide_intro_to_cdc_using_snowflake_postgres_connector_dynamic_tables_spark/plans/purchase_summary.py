"""The flagship query: the Dynamic Table's defining 4-way join.

Reference: ``notebooks/0_start_here.ipynb:215-245`` (cell
``create_dynamic_table``) -- transactions joined to customers,
products, merchants on their keys, PLUS the cross-dimension conjunct
``m.merchant_category = p.product_category``, projecting 15 columns
with ``total_price`` *recomputed* as ``quantity * p.price``.

Physical shape at scale: 1 big fact x 3 small dims.  The dims are
broadcast (Catalyst auto-broadcasts under the raised threshold; we add
an explicit ``F.broadcast`` so the plan survives stale/missing stats on
a real cluster) -- the fact table is never shuffled, the whole join
pipeline is one WholeStageCodegen stage over the fact scan.  The
composite J2 conjunct stays an equi-join (two equality conjuncts), so
it is hash-joinable, not a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: The Dynamic Table's defining query as SQL text (the notebook's
#: CREATE DYNAMIC TABLE body, cell ``create_dynamic_table``) -- single
#: source of truth for examples/tests that exercise the SQL-DDL path.
CUSTOMER_PURCHASE_SUMMARY_SQL = """
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


#: Dim frames whose optimizer-estimated size exceeds this are joined
#: unhinted (AQE picks the strategy) instead of force-broadcast.
#: Matches the session's raised auto-broadcast ceiling (session.py).
DIM_BROADCAST_BYTES = 64 << 20


def _gated_broadcast(df: DataFrame, broadcast_dims: bool | None) -> DataFrame:
    """Size-gate the dim-side broadcast hint.

    ``True`` forces the hint (reference domain: 14 merchants / 12
    products -- always safe there), ``False`` never hints, ``None``
    (default) hints only when Catalyst's plan statistics say the dim
    fits ``DIM_BROADCAST_BYTES``.  Unknown statistics (Spark reports
    Long.Max-ish sentinels) count as too big: a wrong "no hint" costs
    one AQE-recoverable shuffle, a wrong "hint" OOMs the driver at
    100 TB when this function serves as the IVM view definition.

    The stats probe is an eager optimizer run + py4j hop -- measured
    ~8 ms per call, i.e. ~24 ms per IVM refresh for the three dims
    against a multi-second refresh; not worth caching until the
    refresh loop itself is sub-100 ms.
    """
    if broadcast_dims is True:
        return F.broadcast(df)
    if broadcast_dims is False:
        return df
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j converts scala.math.BigInt to int when it fits; huge
        # unknown-stats sentinels may surface as a JavaObject instead
        size = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:
        return df
    return F.broadcast(df) if 0 <= size <= DIM_BROADCAST_BYTES else df


def customer_purchase_summary(
    transactions: DataFrame,
    customers: DataFrame,
    products: DataFrame,
    merchants: DataFrame,
    broadcast_dims: bool | None = None,
) -> DataFrame:
    """Build the ``customer_purchase_summary`` view (reference-domain).

    Inner joins drop orphan transactions (955/1000 of the reference
    seed -- SURVEY.md section 1.3); that row loss is load-bearing
    behavior, not a bug.

    ``broadcast_dims`` is the driver-OOM guard for the IVM path: this
    same function is the view definition DynamicTableManager refreshes,
    so a user pointing it at a large dim must not inherit a forced
    broadcast.  Default ``None`` = size-gated per dim (see
    ``_gated_broadcast``).
    """
    t, c, p, m = (
        transactions.alias("t"),
        customers.alias("c"),
        products.alias("p"),
        merchants.alias("m"),
    )
    bc = lambda df: _gated_broadcast(df, broadcast_dims)  # noqa: E731
    joined = (
        t.join(bc(c), F.col("t.customer_id") == F.col("c.customer_id"), "inner")
        .join(bc(p), F.col("t.product_id") == F.col("p.product_id"), "inner")
        .join(
            bc(m),
            (F.col("t.merchant_id") == F.col("m.merchant_id"))
            & (F.col("m.merchant_category") == F.col("p.product_category")),
            "inner",
        )
    )
    return joined.select(
        F.col("t.transaction_id").alias("transaction_id"),
        F.col("t.customer_id").alias("customer_id"),
        F.col("c.age").alias("customer_age"),
        F.col("t.product_id").alias("product_id"),
        F.col("p.product_name").alias("product_name"),
        F.col("p.product_category").alias("product_category"),
        F.col("t.merchant_id").alias("merchant_id"),
        F.col("m.merchant_name").alias("merchant_name"),
        F.col("m.merchant_category").alias("merchant_category"),
        F.col("t.transaction_date").alias("transaction_date"),
        F.col("t.transaction_time").alias("transaction_time"),
        F.col("t.quantity").alias("quantity"),
        # Recomputed, ignoring the stored t.total_price (notebook :233).
        (F.col("t.quantity") * F.col("p.price")).alias("total_price"),
        F.col("t.transaction_card").alias("transaction_card"),
        F.col("t.transaction_category").alias("transaction_category"),
    )


def purchase_summary_star(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """The same operator shape on the driver's testdata star schema.

    lineitem (fact) joined to orders, customer, part, supplier --
    including a composite cross-dimension conjunct analogous to J2
    (``s.s_nationkey = c.c_nationkey``: only line items whose supplier
    sits in the customer's nation survive).  ``gross_price`` recomputes
    price from the part dim exactly like the Dynamic Table recomputes
    ``total_price``.

    Broadcast hints are the CALLER's job (size-gated via
    ``sources.testdata.broadcast_if_small``): customer/part/supplier
    grow with SF, and a hint forced here would OOM the driver at
    TPC-H-at-100-TB scale. Pass pre-hinted frames when they fit.
    """
    l, o, c, p, s = (
        lineitem.alias("l"),
        orders.alias("o"),
        customer.alias("c"),
        part.alias("p"),
        supplier.alias("s"),
    )
    joined = (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"), "inner")
        .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"), "inner")
        .join(p, F.col("l.l_partkey") == F.col("p.p_partkey"), "inner")
        .join(
            s,
            (F.col("l.l_suppkey") == F.col("s.s_suppkey"))
            & (F.col("s.s_nationkey") == F.col("c.c_nationkey")),
            "inner",
        )
    )
    return joined.select(
        F.col("l.l_orderkey").alias("orderkey"),
        F.col("l.l_linenumber").alias("linenumber"),
        F.col("o.o_custkey").alias("custkey"),
        F.col("c.c_name").alias("customer_name"),
        F.col("c.c_mktsegment").alias("mktsegment"),
        F.col("l.l_partkey").alias("partkey"),
        F.col("p.p_name").alias("part_name"),
        F.col("p.p_brand").alias("brand"),
        F.col("l.l_suppkey").alias("suppkey"),
        F.col("s.s_name").alias("supplier_name"),
        F.col("o.o_orderdate").alias("orderdate"),
        F.col("o.o_orderpriority").alias("orderpriority"),
        F.col("l.l_quantity").alias("quantity"),
        # No round(): both engines emit the identical IEEE product and
        # the driver applies its single uniform 2dp rounding pre-hash.
        (F.col("l.l_quantity") * F.col("p.p_retailprice")).alias("gross_price"),
        F.col("l.l_returnflag").alias("returnflag"),
    )

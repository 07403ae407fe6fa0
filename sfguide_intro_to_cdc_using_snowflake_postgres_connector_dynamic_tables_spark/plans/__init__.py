"""Declarative query plans (the engine's SQL/DataFrame surface).

- ``purchase_summary`` -- the Dynamic Table's defining query, both in
  the reference domain (customers/merchants/products/transactions) and
  as the testdata-star-schema analog used by the driver's oracle.
- ``dashboard`` -- the Snowpark dashboard analytics re-expressed in
  PySpark (SURVEY.md sections 2.2-2.5, 3.3).
"""

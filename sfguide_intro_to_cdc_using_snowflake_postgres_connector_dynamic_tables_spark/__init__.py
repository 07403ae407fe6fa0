"""PySpark-native analytics engine with the capability surface of the
Snowflake-Labs CDC quickstart (Postgres -> connector -> Dynamic Table).

The reference (surveyed in SURVEY.md) is a declarative CDC + incremental
materialized-view workload. This package re-expresses that surface
Spark-first:

- ``session``   -- SparkSession factory tuned for scale (AQE, broadcast,
                   shuffle-partition sizing).
- ``sources``   -- schema'd batch readers (CSV/Parquet) and the CDC
                   change-feed streaming source (envelope rows).
- ``functions`` -- scalar/conditional helpers (band when-chains, money
                   rounding) mirroring SURVEY.md section 2.8.
- ``plans``     -- the declarative query surface: the flagship
                   ``customer_purchase_summary`` join view and the
                   dashboard analytics (SURVEY.md sections 2.2-2.5).
- ``operators`` -- engine extensions: semi-join shim, dedup family
                   (exact/minhash/simhash/ngram/embedding), similarity
                   search, text analysis, multimodal column plumbing.
- ``streaming`` -- CDC apply (latest-wins upsert), dynamic-table
                   registry with full + incremental refresh, monitoring.

Everything is stock PySpark (DataFrame/SQL/Catalyst/Structured
Streaming); no custom physical layer.
"""

__version__ = "0.1.0"

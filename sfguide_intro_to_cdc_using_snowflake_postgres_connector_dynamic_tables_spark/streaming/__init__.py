"""CDC ingestion + incrementally-maintained materialized views.

- ``store``         -- versioned parquet table store (snapshot-isolated
                       commits, the MERGE target).
- ``cdc_apply``     -- latest-wins keyed upsert/delete apply (C3).
- ``changefeed``    -- envelope encoding + file-backed streaming feed
                       (C1/C2) and the streaming pipeline.
- ``dynamic_table`` -- Dynamic Table registry with full + incremental
                       refresh (C4/C5, SURVEY.md section 4.3).
- ``monitoring``    -- replication-state / stats views (S10).
"""

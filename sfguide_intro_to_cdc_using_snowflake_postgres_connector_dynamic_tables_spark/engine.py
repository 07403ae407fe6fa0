"""Top-level facade: the one object a reference user interacts with.

Maps the quickstart's workflow 1:1 (reference
``notebooks/0_start_here.ipynb``):

    engine = Engine(spark, "/data/cdc_prod")
    engine.bootstrap(seed_dfs)                      # snapshot replication
    engine.create_dynamic_table_sql(                # CREATE DYNAMIC TABLE
        "customer_purchase_summary", SQL,
        fact_table="transactions", fact_key="transaction_id",
        view_key="transaction_id", dims={...}, target_lag="1 minute")
    q = engine.start(feed_dir, checkpoint_dir)      # connector tail
    engine.table("customer_purchase_summary")       # SELECT * FROM view
    engine.replication_state()                      # monitoring
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .streaming.changefeed import CDCPipeline
from .streaming.dynamic_table import (
    DynamicTable,
    DynamicTableManager,
    dynamic_table_from_ddl,
    dynamic_table_from_sql,
)
from .streaming.monitoring import connector_stats, freshness_lag_seconds, replication_state
from .streaming.store import ParquetTableStore


class Engine:
    def __init__(self, spark: SparkSession, store_root: str) -> None:
        self.spark = spark
        self.store = ParquetTableStore(store_root)
        self.pipeline = CDCPipeline(spark, self.store)
        self.manager = DynamicTableManager(spark, self.store)
        self.manager.attach(self.pipeline)
        self._query = None

    # -- ingestion -----------------------------------------------------------

    def bootstrap(self, seed: dict[str, DataFrame]) -> None:
        self.pipeline.bootstrap(seed)

    def start(
        self,
        feed_dir: str,
        checkpoint_dir: str,
        trigger: dict | None = None,
        transactional: bool = False,
    ):
        """``transactional=True`` parses tx_id/commit-marker envelopes
        and applies only complete transactions (see
        ``CDCPipeline.apply_envelope_batch``)."""
        self._query = self.pipeline.start_stream(
            feed_dir, checkpoint_dir, trigger, transactional=transactional
        )
        return self._query

    def apply_batch(self, envelope: DataFrame) -> None:
        """Synchronous batch apply (tests / backfills)."""
        self.pipeline.apply_envelope_batch(envelope)

    # -- dynamic tables ------------------------------------------------------

    def create_dynamic_table(self, table: DynamicTable) -> None:
        self.manager.create(table)

    def create_dynamic_table_sql(self, name: str, sql: str, **kwargs) -> None:
        self.manager.create(
            dynamic_table_from_sql(self.spark, self.store, name, sql, **kwargs)
        )

    def execute_ddl(self, ddl: str, **kwargs) -> None:
        """The notebook cell, verbatim: a ``CREATE [OR REPLACE] DYNAMIC
        TABLE ... AS SELECT ...`` string is parsed, its maintenance
        metadata inferred from the join tree, and the view created and
        initialized -- no Python-side metadata required."""
        self.manager.create(
            dynamic_table_from_ddl(self.spark, self.store, ddl, **kwargs)
        )

    def refresh(self, name: str) -> None:
        self.manager.full_refresh(name)

    # -- reads ---------------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        return self.store.read(self.spark, name)

    def consistent_table(self, name: str) -> DataFrame:
        """Read ``name`` at the pipeline's last group snapshot: every
        table resolves to the versions published together after a
        micro-batch's merges, so joins across replicated tables never
        observe a half-applied batch/transaction (falls back to the
        current read before any group snapshot exists)."""
        from .streaming.changefeed import CDC_GROUP

        try:
            return self.store.read_group(self.spark, CDC_GROUP, name)
        except (FileNotFoundError, KeyError):
            return self.store.read(self.spark, name)

    def sql(self, query: str, tables: list[str] | None = None) -> DataFrame:
        """SQL over the store's committed tables (S6)."""
        for t in tables or []:
            self.table(t).createOrReplaceTempView(t)
        return self.spark.sql(query)

    def table_changes(
        self,
        name: str,
        from_version: int,
        to_version: int,
        key: str | None = None,
    ) -> DataFrame:
        """Row-level I/U/D change feed of a REPLICA between two retained
        store versions (the Delta-CDF analogue) -- lets downstream
        consumers tail a replicated table without the original envelope
        stream.  ``key`` defaults to the table's primary key."""
        if key is None:
            from .sources.cdc_schemas import PRIMARY_KEYS

            key = PRIMARY_KEYS.get(name)
        return self.store.table_changes(
            self.spark, name, from_version, to_version, key=key
        )

    def read_pruned(
        self, name: str, col: str, lower=None, upper=None
    ) -> DataFrame:
        """Zone-map-pruned range scan of a replicated table (bucket- and,
        after ``optimize_table(zorder_cols=...)``, file-level pruning)."""
        return self.store.read_pruned(self.spark, name, col, lower, upper)

    def prune_plan(self, name: str, col: str, lower=None, upper=None) -> dict:
        """What a pruned range scan would touch: {buckets_total,
        buckets_kept, files_total, files_kept} -- the audit view of the
        zone-map + clustered-layout behavior, no data read."""
        return self.store.prune_plan(name, col, lower, upper)

    def optimize_table(self, name: str, zorder_cols=None, **kwargs) -> int:
        """Compact a replicated table's merge generations; with
        ``zorder_cols`` also cluster rows within each bucket and record
        per-file zone stats so selective range probes prune files
        (pair with ``writer_options={"maxRecordsPerFile": N}``).
        ``buckets=[...]`` limits the rewrite to those buckets."""
        return self.store.optimize(
            self.spark, name, zorder_cols=zorder_cols, **kwargs
        )

    def maintain_clustering(
        self, name: str, zorder_cols, max_coarse_frac: float = 0.15, **kwargs
    ) -> dict:
        """Auto-compaction: when merges have coarsened more than
        ``max_coarse_frac`` of the table's buckets (file-level zone
        stats lost), incrementally re-cluster ONLY those buckets.
        Call after merge cycles; no manual optimize step needed."""
        return self.store.maintain_clustering(
            self.spark, name, zorder_cols, max_coarse_frac=max_coarse_frac, **kwargs
        )

    # -- monitoring (S10) ----------------------------------------------------

    def replication_state(self) -> DataFrame:
        import os

        tables = sorted(
            d for d in os.listdir(self.store.root)
            # underscore names are engine-internal (_txn_pending buffer,
            # _groups snapshots), not replicated tables
            if not d.startswith("_") and self.store.current_version(d) is not None
        )
        return replication_state(self.spark, self.store, tables)

    def connector_stats(self) -> DataFrame:
        return connector_stats(self.spark, self._query)

    def refresh_history(self, last: int | None = None) -> DataFrame:
        """Per-refresh audit trail of every dynamic table (the
        DYNAMIC_TABLE_REFRESH_HISTORY analogue)."""
        return self.manager.refresh_history(last)

    def freshness_lag(self) -> float | None:
        return freshness_lag_seconds(self._query)

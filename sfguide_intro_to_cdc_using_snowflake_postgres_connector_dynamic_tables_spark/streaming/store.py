"""Versioned parquet table store -- the engine's managed-table layer.

The reference's destination tables and Dynamic Table live in Snowflake
managed storage; our equivalent is a directory of immutable parquet
snapshots with an atomically-swapped version pointer:

    root/<table>/v<N>/part-*.parquet
    root/<table>/_VERSION         (text file containing N)

Commit protocol: write v<N+1> fully, then ``os.replace`` the version
pointer -- readers either see v<N> or v<N+1>, never a torn write, and
a refresh that crashes mid-write is invisible (re-running overwrites
the orphan v<N+1> directory).  That gives the exactly-once
materialization property SURVEY.md section 4.2 requires without a
table format dependency.

Scale note: this read-modify-overwrite MERGE is the pure-parquet
fallback.  The store is the single seam where a real deployment swaps
in Delta/Iceberg ``MERGE INTO`` (row-level, partition-pruned); every
caller goes through ``upsert``/``overwrite``/``read`` only.  At 100 TB
the snapshot should additionally be partitioned/bucketed on the upsert
key so the anti-join + union rewrite touches only matching buckets.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class ParquetTableStore:
    def __init__(self, root: str, keep_versions: int = 2) -> None:
        self.root = root
        self.keep_versions = keep_versions
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping -------------------------------------------------

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _version_file(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_VERSION")

    def current_version(self, name: str) -> int | None:
        try:
            with open(self._version_file(name)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _commit(self, name: str, version: int) -> None:
        vf = self._version_file(name)
        fd, tmp = tempfile.mkstemp(dir=self._table_dir(name), prefix="_VERSION.")
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.replace(tmp, vf)  # atomic pointer swap = the commit point
        self._gc(name, version)

    def _gc(self, name: str, current: int) -> None:
        tdir = self._table_dir(name)
        for entry in os.listdir(tdir):
            if entry.startswith("v") and entry[1:].isdigit():
                v = int(entry[1:])
                if v <= current - self.keep_versions:
                    shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)

    # -- public API ----------------------------------------------------------

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        v = self.current_version(name)
        if v is None:
            raise FileNotFoundError(f"table {name!r} has no committed version under {self.root}")
        return spark.read.parquet(os.path.join(self._table_dir(name), f"v{v}"))

    def read_previous(self, spark: SparkSession, name: str) -> DataFrame | None:
        """The snapshot before the current one (None if this is the
        first version).  Valid while ``keep_versions >= 2``; used by
        incremental aggregate maintenance to resolve the old group
        membership of deleted/updated fact rows."""
        v = self.current_version(name)
        if v is None or v <= 1:
            return None
        path = os.path.join(self._table_dir(name), f"v{v - 1}")
        if not os.path.isdir(path):
            return None
        return spark.read.parquet(path)

    def overwrite(self, name: str, df: DataFrame) -> int:
        """Write a full new snapshot and commit it."""
        v = (self.current_version(name) or 0) + 1
        path = os.path.join(self._table_dir(name), f"v{v}")
        shutil.rmtree(path, ignore_errors=True)  # orphan from a crashed commit
        df.write.mode("overwrite").parquet(path)
        self._commit(name, v)
        return v

"""Replica storage maintenance on the engine, end to end.

The operational side of a CDC replica at scale: after days of
incremental merges a hash-bucketed fact table is correct but its
layout has degraded -- every bucket holds every date, so the zone map
stops pruning range probes, and each bucket carries stacked merge
generations.  This demo walks the maintenance loop:

    bootstrap (bucketed + zone-mapped fact table)
      -> incremental merge          (O(delta-buckets) write)
      -> prune_plan                 ("what would a 1-day probe scan?")
      -> optimize_table(zorder)     (compact + date-cluster each bucket,
                                     per-FILE zone stats in the manifest)
      -> prune_plan                 (same probe, now file-pruned)
      -> read_pruned == exact       (pruning is never a correctness
                                     dependency)
      -> table_changes              (CDF between the retained versions)

Run: python examples/replica_maintenance.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.engine import Engine
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="replica-maintenance-demo")
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine(spark, tempfile.mkdtemp(prefix="replica-demo-"))

    # a fact table whose dates are uniform across every hash bucket --
    # the layout every CDC-replicated fact table converges to
    rows = spark.createDataFrame(
        [
            (i, (i * 7919) % 100, dt.date(2024, 1, 1) + dt.timedelta(days=i % 30))
            for i in range(4000)
        ],
        "id long, amount long, d date",
    )
    engine.store.overwrite(
        "fact", rows, partition_key="id", n_buckets=16, zone_cols=["d"]
    )
    v1 = engine.store.current_version("fact")

    # an incremental merge: one changed row -> one bucket rewritten
    delta = spark.createDataFrame(
        [(17, 9999, dt.date(2024, 1, 18))], "id long, amount long, d date"
    )
    engine.store.merge(
        spark, "fact", delta, spark.createDataFrame([(17,)], "id long")
    )
    v2 = engine.store.current_version("fact")

    # CDF between the retained pre/post-merge versions (before the
    # optimize commit rotates v1 out of retention)
    feed = engine.table_changes("fact", v1, v2, key="id")
    changes = [(r["op"], r["id"]) for r in feed.collect()]
    print(f"table_changes(v{v1} -> v{v2}): {changes}")
    assert changes == [("U", 17)]

    probe = (dt.date(2024, 1, 18), dt.date(2024, 1, 18))
    before = engine.prune_plan("fact", "d", *probe)
    print(
        f"1-day probe BEFORE optimize: {before['files_kept']}/"
        f"{before['files_total']} scan units ({before['buckets_kept']}/"
        f"{before['buckets_total']} buckets)"
    )

    # maintenance: compact + cluster each bucket by date, small files so
    # the demo shows pruning at this toy scale
    engine.optimize_table(
        "fact", zorder_cols=["d"], writer_options={"maxRecordsPerFile": "64"}
    )
    after = engine.prune_plan("fact", "d", *probe)
    print(
        f"1-day probe AFTER  optimize: {after['files_kept']}/"
        f"{after['files_total']} scan units ({after['buckets_kept']}/"
        f"{after['buckets_total']} buckets)"
    )
    assert after["files_kept"] < after["files_total"]

    got = engine.read_pruned("fact", "d", *probe)
    exact = engine.table("fact").filter(F.col("d") == F.lit(probe[0]))
    n_got, n_exact = got.count(), exact.count()
    print(f"pruned read rows={n_got}, exact filter rows={n_exact}")
    assert n_got == n_exact

    # steady state: no manual optimize step -- more merges land, and the
    # auto-compaction policy re-clusters ONLY the coarsened buckets once
    # enough of the table has degraded (here: 3 merges touch ~3 of 16
    # buckets -> ~19% coarse > the 15% default threshold)
    for i in (101, 203, 307):
        d2 = spark.createDataFrame(
            [(i, i, dt.date(2024, 1, 18))], "id long, amount long, d date"
        )
        engine.store.merge(spark, "fact", d2, d2.select("id"))
        res = engine.maintain_clustering(
            "fact", ["d"], writer_options={"maxRecordsPerFile": "64"}
        )
        print(
            f"maintain_clustering after merge id={i}: coarse="
            f"{res['coarse_frac']:.0%} rewritten={len(res['rewritten'])} buckets"
        )
    final = engine.prune_plan("fact", "d", *probe)
    print(
        f"1-day probe at steady state: {final['files_kept']}/"
        f"{final['files_total']} scan units"
    )
    assert final["files_kept"] < final["files_total"]

    spark.stop()
    print("replica maintenance demo complete")


if __name__ == "__main__":
    main()

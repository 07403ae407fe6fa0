"""Evidence for the SCALE.md bucketing claim: with both sides stored
bucketed on the join key, the join plans with ZERO shuffle exchanges --
the layout the CDC store adopts at 100 TB so the merge anti-join and
the fact-side joins co-locate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .test_plans import plan_of


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    # warehouse dir is the session default (./spark-warehouse, gitignored)
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_delta")
    fact = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    delta = spark.range(500).select(F.col("id").alias("k"), F.lit("new").alias("nv"))
    fact.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_fact")
    delta.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_delta")
    yield spark.table("b_fact"), spark.table("b_delta")
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_delta")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    fact, delta = bucketed_pair
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(fact.join(delta, "k", "left_anti"), mode="simple")
        assert "Exchange" not in plan, plan  # co-located: bucket-to-bucket join
        # and the result is still correct
        assert fact.join(delta, "k", "left_anti").count() == 9500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_partition_pruning(spark, tmp_path):
    """Hive-partitioned layout + a partition-key filter => the scan
    plans with PartitionFilters and reads only matching directories --
    the layout the 100 TB fact table uses (date-partitioned)."""
    path = str(tmp_path / "orders_part")
    df = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 5).alias("order_year")
    )
    df.write.partitionBy("order_year").parquet(path)

    filtered = spark.read.parquet(path).filter(F.col("order_year") == 3)
    plan = plan_of(filtered)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "order_year" in pf and "3" in pf
    assert filtered.count() == 200
    # control: no filter reads all partitions
    assert spark.read.parquet(path).count() == 1000


def test_unbucketed_baseline_does_shuffle(spark, bucketed_pair):
    """Control: the same join over non-bucketed data exchanges both
    sides (what bucketing saves)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact = spark.range(10000).select(F.col("id").alias("k"))
        delta = spark.range(500).select(F.col("id").alias("k"))
        plan = plan_of(fact.join(delta, "k", "left_anti"), mode="simple")
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

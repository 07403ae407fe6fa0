"""Error-contract tests for the approximate aggregation operators.

Sketches can't hash-match a second engine; what must hold is the
stated error bound against the exact answer on the same data, plus
the plan property that makes them scale (partial+final aggregation --
only sketches cross the shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.sketches import (
    approx_distinct_by,
    approx_percentiles_by,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)

SF = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    ev = load_table(spark, SF, "events")
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_by(ev, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) <= max(2, 0.1 * e), (k, got[k], e)


def test_approx_percentile_rank_bound(spark):
    ev = load_table(spark, SF, "events")
    got = {
        r["event_type"]: r["approx_percentiles"]
        for r in approx_percentiles_by(
            ev, ["event_type"], "value", [0.5, 0.95]
        ).collect()
    }
    for etype, (p50, p95) in got.items():
        vals = ev.filter(F.col("event_type") == etype)
        n = vals.count()
        # rank error <= n/accuracy (+1 slack for boundary ties)
        for p, v in ((0.5, p50), (0.95, p95)):
            rank = vals.filter(F.col("value") <= v).count()
            assert abs(rank - p * n) <= n / 10_000 + 1, (etype, p, rank, n)


def test_sketch_aggs_are_partial_plus_final(spark):
    ev = load_table(spark, SF, "events")
    df = approx_distinct_by(ev, ["event_type"], "user_id")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # map-side partial sketch + final merge around ONE exchange: the
    # property that bounds shuffle volume to O(groups * sketch_size)
    assert plan.count("HashAggregate") >= 2 or plan.count("ObjectHashAggregate") >= 2
    assert plan.count("Exchange") == 1

"""Edge-case pins for the window-family operators (the catalog oracle
covers the bulk data path; these pin the boundary semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.window_ops import (
    analytic_window,
    asof_join,
    sessionize,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_inclusive_and_missing(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T12:00:00")),  # exactly at a right ts -> inclusive
         (2, 10, _ts("2024-01-01T11:59:59")),  # before every right row -> NULL
         (3, 20, _ts("2024-01-02T00:00:00"))], # key with no right rows -> NULL
        "id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T12:00:00"), 100.0),
         (10, _ts("2024-01-01T13:00:00"), 200.0)],
        "k long, rt timestamp, price double",
    )
    out = {r["id"]: r["v"] for r in asof_join(
        left, right, key="k", left_ts="t", right_ts="rt", value="price", out_col="v"
    ).collect()}
    assert out == {1: 100.0, 2: None, 3: None}


def test_asof_picks_greatest_earlier(spark):
    left = spark.createDataFrame([(1, 10, _ts("2024-01-01T15:00:00"))], "id long, k long, t timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T12:00:00"), 1.0),
         (10, _ts("2024-01-01T14:00:00"), 2.0),
         (10, _ts("2024-01-01T16:00:00"), 3.0)],
        "k long, rt timestamp, price double",
    )
    [row] = asof_join(left, right, "k", "t", "rt", "price").collect()
    assert row["asof_value"] == 2.0


def test_sessionize_gap_boundary(spark):
    base = _ts("2024-01-01T00:00:00")
    rows = [
        (1, 1, base),
        (1, 2, base + dt.timedelta(seconds=1800)),   # == gap -> same session
        (1, 3, base + dt.timedelta(seconds=3601)),   # > gap -> new session
        (2, 4, base),                                 # other key -> own session
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = {r["event_id"]: r["session_seq"] for r in sessionize(df).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_analytic_window_frame(spark):
    df = spark.createDataFrame(
        [(1, i, _ts("2024-01-01T00:00:00") + dt.timedelta(minutes=i), float(i))
         for i in range(1, 4)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    rows = {r["event_id"]: r for r in analytic_window(
        df, key="user_id", order=["ts", "event_id"], value="value"
    ).collect()}
    assert rows[1]["prev_value"] is None and rows[1]["next_value"] == 2.0
    assert rows[3]["running_value"] == 6.0 and rows[3]["seq"] == 3


def test_topk_per_group_matches_naive_window(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.window_ops import (
        topk_per_group,
    )

    rng = random.Random(7)
    rows = [(rng.choice("abc"), i, rng.random()) for i in range(500)]
    # plant duplicated order values so the tiebreak is load-bearing
    rows += [("a", 1000 + i, 0.5) for i in range(5)]
    df = spark.createDataFrame(rows, "grp string, rid long, score double")

    got = topk_per_group(df, ("grp",), "score", k=4, tiebreak_cols=("rid",), n_salts=8)
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("rid"))
    want = (
        df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 4)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_exact_percentiles_matches_percentile_aggregate(spark):
    """Differential: window-sort exact_percentiles == F.percentile on
    random data with duplicates, NULLs, and an all-NULL group."""
    import random

    from pyspark.sql import functions as F

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.window_ops import (
        exact_percentiles,
    )

    rng = random.Random(7)
    rows = []
    for g in ("a", "b", "c"):
        for _ in range(rng.randrange(5, 60)):
            v = None if rng.random() < 0.2 else float(rng.randrange(100))
            rows.append((g, v))
    rows += [("z", None), ("z", None)]  # all-NULL group
    df = spark.createDataFrame(rows, "g string, v double")

    got = {
        r["g"]: (r["p25"], r["p50"], r["p99"])
        for r in exact_percentiles(
            df, ["g"], [("v", 0.25, "p25"), ("v", 0.5, "p50"), ("v", 0.99, "p99")]
        ).collect()
    }
    want = {
        r["g"]: (r["p25"], r["p50"], r["p99"])
        for r in df.groupBy("g")
        .agg(
            F.percentile("v", 0.25).alias("p25"),
            F.percentile("v", 0.5).alias("p50"),
            F.percentile("v", 0.99).alias("p99"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        for x, y in zip(got[g], want[g]):
            assert (x is None and y is None) or abs(x - y) < 1e-9, (g, got[g], want[g])

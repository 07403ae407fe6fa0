"""Funnel / cohort-retention semantics on planted event sequences.

The sf* events table is dense (every user completes every step), so
the catalog oracle can't distinguish ordered-funnel semantics from a
plain per-type distinct count -- these planted cases can.
"""

from __future__ import annotations

import datetime as dt

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_users,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), t) for u, m, t in rows],
        "user_id int, ts timestamp, event_type string",
    )


def test_funnel_order_matters(spark):
    ev = _events(
        spark,
        [
            # u1: full ordered funnel
            (1, 0, "view"), (1, 5, "click"), (1, 10, "purchase"),
            # u2: clicked BEFORE ever viewing -> stops at depth 1
            (2, 0, "click"), (2, 5, "view"),
            # u3: view then purchase but never clicked -> depth 1
            (3, 0, "view"), (3, 5, "purchase"),
            # u4: purchase only -> not in the funnel at all
            (4, 0, "purchase"),
            # u5: view, click, purchase -- but purchase precedes click
            (5, 0, "view"), (5, 10, "click"), (5, 5, "purchase"),
        ],
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_users_depth_and_timestamp(spark):
    ev = _events(
        spark,
        [
            (1, 0, "view"), (1, 5, "click"), (1, 10, "purchase"),
            (2, 0, "click"), (2, 5, "view"),
        ],
    )
    rows = {
        r["user_id"]: r for r in funnel_users(ev, ["view", "click", "purchase"]).collect()
    }
    assert rows[1]["depth"] == 3
    assert rows[1]["t_last"] == T0 + dt.timedelta(minutes=10)
    assert rows[2]["depth"] == 1
    assert rows[2]["t_last"] == T0 + dt.timedelta(minutes=5)


def test_funnel_same_timestamp_counts(spark):
    # at-or-after: a click at the exact view timestamp advances
    ev = _events(spark, [(1, 0, "view"), (1, 0, "click")])
    out = {r["step"]: r["n_users"] for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_funnel_zero_fills_unreached_steps(spark):
    ev = _events(spark, [(1, 0, "view")])
    out = funnel_counts(ev, ["view", "click", "purchase"]).collect()
    by_step = {r["step"]: r["n_users"] for r in out}
    assert len(out) == 3
    assert by_step == {"view": 1, "click": 0, "purchase": 0}


def test_cohort_retention_planted(spark):
    # u1 first seen week 0, active weeks 0 and 2; u2 first seen week 1
    ev = _events(
        spark,
        [
            (1, 0, "view"),
            (1, 14 * 24 * 60, "view"),  # +2 weeks
            (2, 7 * 24 * 60, "view"),  # first seen +1 week
        ],
    )
    out = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_funnel_matches_python_model_on_random_events(spark):
    """Differential test: funnel_counts vs an executable Python spec on
    randomized event sets (ordering semantics are easy to get subtly
    wrong -- e.g. counting any-order step presence)."""
    import random

    rng = random.Random(20240814)
    steps = ["view", "click", "purchase"]
    for trial in range(5):
        rows = []
        for u in range(30):
            for _ in range(rng.randint(0, 12)):
                rows.append(
                    (
                        u,
                        T0 + dt.timedelta(minutes=rng.randint(0, 500)),
                        rng.choice(steps + ["error", "signup"]),
                    )
                )
        if not rows:
            continue
        ev = spark.createDataFrame(
            rows, "user_id int, ts timestamp, event_type string"
        )

        # python model: greedy earliest-completion chaining
        def model_depth(user_rows):
            t_prev = None
            depth = 0
            for step in steps:
                cands = [
                    ts for ts, typ in user_rows
                    if typ == step and (t_prev is None or ts >= t_prev)
                ]
                if not cands:
                    break
                t_prev = min(cands)
                depth += 1
            return depth

        per_user = {}
        for u, ts, typ in rows:
            per_user.setdefault(u, []).append((ts, typ))
        expected = {i + 1: 0 for i in range(len(steps))}
        for u, urows in per_user.items():
            d = model_depth(urows)
            for k in range(1, d + 1):
                expected[k] += 1

        got = {
            r["step_order"]: r["n_users"] for r in funnel_counts(ev, steps).collect()
        }
        assert got == expected, f"trial {trial}: {got} != {expected}"


def test_cohort_retention_matches_python_model(spark):
    import random

    rng = random.Random(7)
    rows = [
        (u, T0 + dt.timedelta(days=rng.randint(0, 35)), "view")
        for u in range(40)
        for _ in range(rng.randint(1, 6))
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")

    def week_of(ts):
        d = ts.date()
        return d - dt.timedelta(days=d.weekday())

    first = {}
    for u, ts, _t in rows:
        if u not in first or ts < first[u]:
            first[u] = ts
    expected: dict[tuple, set] = {}
    for u, ts, _t in rows:
        cw = week_of(first[u])
        off = (week_of(ts) - cw).days // 7
        expected.setdefault((cw, off), set()).add(u)
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got == {k: len(v) for k, v in expected.items()}


def test_attribution_planted(spark):
    """Last-touch semantics: purchase credited to the latest preceding
    view/click; same-timestamp touch wins (as-of <=); no touch =>
    'direct'."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog_more import (
        q_attribution,
    )
    import sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog_more as cm

    rows = [
        # u1: view @0, click @5, purchase @10 -> click
        (1, 1, 0, "view", 1.0), (2, 1, 5, "click", 1.0), (3, 1, 10, "purchase", 10.0),
        # u2: purchase with no touches -> direct
        (4, 2, 0, "purchase", 5.0),
        # u3: view at the same instant as purchase -> view (<= contract)
        (5, 3, 7, "view", 1.0), (6, 3, 7, "purchase", 20.0),
        # u4: click AFTER the purchase only -> direct
        (7, 4, 9, "purchase", 2.0), (8, 4, 12, "click", 1.0),
    ]
    ev = spark.createDataFrame(
        [
            (eid, u, T0 + dt.timedelta(minutes=m), t, v)
            for eid, u, m, t, v in rows
        ],
        "event_id int, user_id int, ts timestamp, event_type string, value double",
    )
    orig = cm._t
    cm._t = lambda spark, sf_dir, name: ev
    try:
        out = {r["last_touch"]: (r["n_purchases"], r["attributed_value"])
               for r in q_attribution(spark, "unused").collect()}
    finally:
        cm._t = orig
    assert out == {"click": (1, 10.0), "direct": (2, 7.0), "view": (1, 20.0)}


def _events_with_ids(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(minutes=m), t) for i, (u, m, t) in enumerate(rows)],
        "event_id int, user_id int, ts timestamp, event_type string",
    )


def test_event_transitions_order_end_and_probability(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
        event_transitions,
    )

    ev = _events_with_ids(
        spark,
        [
            # u1: view -> click -> view -> (end)
            (1, 0, "view"), (1, 5, "click"), (1, 10, "view"),
            # u2: view -> (end); transitions never cross users
            (2, 0, "view"),
            # u3: same-timestamp tie broken by event_id (insertion
            # order): click(id) < view(id) -> click -> view -> (end)
            (3, 0, "click"), (3, 0, "view"),
        ],
    )
    out = {
        (r["event_type"], r["next_event"]): (r["n_transitions"], r["p"])
        for r in event_transitions(ev).collect()
    }
    assert out == {
        ("view", "click"): (1, 0.25),
        ("view", "(end)"): (3, 0.75),
        ("click", "view"): (2, 1.0),
    }


def test_event_transitions_probability_sums_to_one_per_source(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
        event_transitions,
    )

    ev = _events_with_ids(
        spark,
        [(u, m, t) for u in range(5) for m, t in
         enumerate(["view", "click", "purchase", "view", "click"])],
    )
    import collections

    sums = collections.defaultdict(float)
    for r in event_transitions(ev).collect():
        sums[r["event_type"]] += r["p"]
    for src, s in sums.items():
        assert abs(s - 1.0) < 1e-6, (src, s)


def test_daily_anomalies_trailing_window_and_min_periods(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
        daily_anomalies,
    )

    # 5 quiet days of 10 events, then a 100-event spike
    rows = []
    for d in range(5):
        rows += [(1, d * 24 * 60 + i, "view") for i in range(10)]
    rows += [(1, 5 * 24 * 60 + i, "view") for i in range(100)]
    ev = _events_with_ids(spark, rows)
    out = {str(r["day"]): r for r in daily_anomalies(ev).collect()}
    assert len(out) == 6
    # day 1: empty trailing window -> everything NULL
    d0 = out["2024-01-01"]
    assert d0["n_events"] == 10 and d0["trail_avg"] is None and d0["z"] is None
    # day 2: one trailing day -> avg defined, stddev/z still NULL
    d1 = out["2024-01-02"]
    assert d1["trail_avg"] == 10.0 and d1["trail_std"] is None and d1["z"] is None
    # day 3+: flat history -> stddev 0 -> z stays NULL (undefined, not anomalous)
    assert out["2024-01-03"]["trail_std"] == 0.0 and out["2024-01-03"]["z"] is None
    # spike day: baseline mean 10, std 0 over flat days -> still NULL...
    # make sure the guard held, then check a non-degenerate z below
    assert out["2024-01-06"]["n_events"] == 100 and out["2024-01-06"]["z"] is None


def test_daily_anomalies_z_matches_python_model(spark):
    import statistics

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
        daily_anomalies,
    )

    # varying daily volumes -> non-degenerate stddev; mirror the
    # trailing-7-exclusive window in plain Python
    counts = [12, 7, 19, 4, 15, 9, 22, 11, 30, 5]
    rows = []
    for d, n in enumerate(counts):
        rows += [(1, d * 24 * 60 + i, "view") for i in range(n)]
    ev = _events_with_ids(spark, rows)
    got = {str(r["day"]): r["z"] for r in daily_anomalies(ev).collect()}
    for d, n in enumerate(counts):
        trail = counts[max(0, d - 7) : d]
        day = f"2024-01-{d + 1:02d}"
        if len(trail) < 2 or statistics.stdev(trail) == 0:
            assert got[day] is None, day
        else:
            want = round((n - statistics.mean(trail)) / statistics.stdev(trail), 4)
            assert got[day] == want, (day, got[day], want)


def test_event_transitions_null_type_is_not_an_exit(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
        event_transitions,
    )

    ev = _events_with_ids(
        spark, [(1, 0, "view"), (1, 5, None), (1, 10, "click")]
    )
    out = {
        (r["event_type"], r["next_event"]): r["n_transitions"]
        for r in event_transitions(ev).collect()
    }
    # a NULL-typed FOLLOWING event is a NULL transition, not '(end)';
    # only the true last event exits
    assert out == {
        ("view", None): 1,
        (None, "click"): 1,
        ("click", "(end)"): 1,
    }


def test_daily_anomalies_zero_fills_calendar_gaps(spark):
    import statistics

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
        daily_anomalies,
    )

    # varying volume on days 0-4, a 3-day outage, then one final day:
    # the outage days must surface as zero-count rows with strongly
    # negative z, not vanish from the frame
    counts = {0: 12, 1: 7, 2: 19, 3: 4, 4: 15, 8: 9}
    rows = []
    for d, n in counts.items():
        rows += [(1, d * 24 * 60 + i, "view") for i in range(n)]
    ev = _events_with_ids(spark, rows)
    got = {str(r["day"]): r for r in daily_anomalies(ev).collect()}
    assert len(got) == 9  # full spine: days 0..8 inclusive
    series = [counts.get(d, 0) for d in range(9)]
    for d in (5, 6, 7):
        day = f"2024-01-{d + 1:02d}"
        r = got[day]
        assert r["n_events"] == 0
        trail = series[max(0, d - 7) : d]
        want = round((0 - statistics.mean(trail)) / statistics.stdev(trail), 4)
        assert r["z"] == want and r["z"] < -1, (day, r["z"], want)
    # the post-outage day is scored against a baseline that INCLUDES
    # the zero days (calendar semantics), not just observed days
    trail8 = series[1:8]
    assert got["2024-01-09"]["trail_avg"] == round(statistics.mean(trail8), 6)


def test_event_transitions_matches_python_model_on_random_streams(spark):
    """Differential test: random event streams (NULL types, duplicate
    timestamps, single-event users) against an executable Python spec
    of the per-user ordered-transition semantics."""
    import random

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
        event_transitions,
    )

    rng = random.Random(20260814)
    types = ["view", "click", "purchase", None]
    for trial in range(5):
        rows = []
        eid = 0
        for u in range(12):
            for _ in range(rng.randint(1, 9)):
                rows.append((eid, u, rng.randint(0, 6), rng.choice(types)))
                eid += 1
        ev = _events_with_ids(spark, [(u, m, t) for _e, u, m, t in rows])

        # model: per user, sort by (ts, event_id) -- event_id here is
        # the insertion index _events_with_ids assigns
        per_user: dict[int, list] = {}
        for idx, (_e, u, m, t) in enumerate(rows):
            per_user.setdefault(u, []).append((m, idx, t))
        expected: dict[tuple, int] = {}
        for seq in per_user.values():
            seq.sort(key=lambda r: (r[0], r[1]))
            for i, (_m, _i, t) in enumerate(seq):
                nxt = seq[i + 1][2] if i + 1 < len(seq) else "(end)"
                expected[(t, nxt)] = expected.get((t, nxt), 0) + 1

        got = {
            (r["event_type"], r["next_event"]): r["n_transitions"]
            for r in event_transitions(ev).collect()
        }
        assert got == expected, f"trial {trial}: {got} != {expected}"
        # per-source probabilities renormalize to 1 (NULL source included)
        sums: dict = {}
        for r in event_transitions(ev).collect():
            sums[r["event_type"]] = sums.get(r["event_type"], 0.0) + r["p"]
        for src, s in sums.items():
            assert abs(s - 1.0) < 1e-5, (trial, src, s)


def test_daily_anomalies_matches_python_model_on_random_sparse_days(spark):
    """Property test: random SPARSE day sets (calendar gaps everywhere)
    against a Python spec of the zero-filled trailing-window z-score."""
    import statistics

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
        daily_anomalies,
    )

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        days=st.dictionaries(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=1, max_value=30),
            min_size=1,
            max_size=10,
        )
    )
    def run(days):
        rows = []
        for d, n in days.items():
            rows += [(1, d * 24 * 60 + i, "view") for i in range(n)]
        ev = _events_with_ids(spark, rows)
        got = {str(r["day"]): r for r in daily_anomalies(ev).collect()}

        d0, d1 = min(days), max(days)
        series = [days.get(d, 0) for d in range(d0, d1 + 1)]
        assert len(got) == len(series)  # full zero-filled spine
        for i, n in enumerate(series):
            day = f"2024-01-{d0 + i + 1:02d}"
            r = got[day]
            assert r["n_events"] == n, (day, r["n_events"], n)
            trail = series[max(0, i - 7) : i]
            if not trail:
                assert r["trail_avg"] is None and r["z"] is None
                continue
            assert r["trail_avg"] == round(statistics.mean(trail), 6), day
            if len(trail) < 2 or statistics.stdev(trail) == 0:
                assert r["z"] is None, (day, r["z"])
            else:
                want = round((n - statistics.mean(trail)) / statistics.stdev(trail), 4)
                assert r["z"] == want, (day, r["z"], want)

    run()


def test_funnel_null_timestamps_never_advance(spark):
    """NULL-ts events: count at step 1 by existence (the frontier row
    exists with a NULL min), but never satisfy a frontier comparison --
    matching the chained/SQL formulation exactly."""
    rows = [
        (1, None, "view"),          # null-only view: step 1 yes, never step 2
        (1, T0, "click"),
        (2, None, "view"),          # null view + real view -> normal chain
        (2, T0, "view"),
        (2, T0 + dt.timedelta(minutes=1), "click"),
        (3, None, "click"),         # null click after real view: no advance
        (3, T0, "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {r["step_order"]: r["n_users"]
           for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert got == {1: 3, 2: 1}


def test_funnel_hot_user_bounded_and_chained_param(spark):
    """Hot-key bound (VERDICT r9 item 4): a bot-grade user emitting 1M
    step events must complete with bounded task memory.  The greedy
    path collects DISTINCT (ts, step_idx) pairs -- repeat spam
    collapses map-side -- so the hot user's in-memory array is the
    distinct-pair count (here 3k), not the raw 1M.  chained=True
    forces the O(1)-state-per-step formulation; both agree with each
    other and with the normal-user baseline."""
    import pyspark.sql.functions as F

    steps = ["view", "cart", "buy"]
    # hot user 1: 1M events = 333_334 repeats over ~1000 distinct ts
    # per step type (bot replaying the same burst); user 2: clean
    # conversion; user 3: view only.
    n_per_type = 333_334
    hot = (
        spark.range(0, 3 * n_per_type, 1, 32)
        .select(
            F.lit(1).alias("user_id"),
            (
                F.lit(T0)
                + F.make_interval(mins=(F.col("id") % 1000).cast("int"))
            ).alias("ts"),
            F.element_at(
                F.array(*[F.lit(s) for s in steps]),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    normal = _events(
        spark,
        [(2, 0, "view"), (2, 1, "cart"), (2, 2, "buy"), (3, 0, "view")],
    )
    ev = hot.unionByName(normal)
    greedy = {
        r["step"]: r["n_users"] for r in funnel_counts(ev, steps).collect()
    }
    forced = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, steps, chained=True).collect()
    }
    # users 1+2 complete all steps; user 3 stops at view
    assert greedy == {"view": 3, "cart": 2, "buy": 2}
    assert forced == greedy

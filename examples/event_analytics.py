"""Event analytics on the engine: sessionize -> funnel -> cohorts.

The reference's analytics surface is a purchase dashboard; an engine
replacing it also answers the event-sequence questions asked of the
same data: where users drop out of an ordered flow, and how cohorts
retain week over week.  All three results come from the events table
in one session, each a pure DataFrame plan:

    events -> sessionize (30-min inactivity gap)   -> session lengths
           -> funnel view -> click -> purchase     -> step conversion
           -> weekly cohort retention triangle     -> retention matrix
           -> transition matrix (after X, what?)   -> path analysis
           -> trailing z-score per day             -> anomaly days

Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.funnel import (
    cohort_retention,
    daily_anomalies,
    event_transitions,
    funnel_counts,
    funnel_users,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.window_ops import (
    sessionize,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="event-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")

    print("== sessions (30-minute gap): events per session, top 5 ==")
    (
        sessionize(events, gap_seconds=1800)
        .groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"))
        .show(5)
    )

    print("== ordered funnel: view -> click -> purchase ==")
    funnel_counts(events, ["view", "click", "purchase"]).orderBy("step_order").show()

    print("== per-user funnel depth (sample) ==")
    funnel_users(events, ["view", "click", "purchase"]).orderBy("user_id").show(5)

    print("== weekly cohort retention ==")
    (
        cohort_retention(events)
        .orderBy("cohort_week", "week_offset")
        .show(20)
    )

    print("== event transition matrix (top paths) ==")
    event_transitions(events).orderBy(F.desc("n_transitions")).show(10)

    print("== daily volume anomalies (|z| >= 2) ==")
    anomalies = daily_anomalies(events)
    anomalies.filter(F.abs(F.col("z")) >= 2).orderBy("day").show()
    spark.stop()


if __name__ == "__main__":
    main()

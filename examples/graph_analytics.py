"""Graph analytics on the engine: co-purchase graph -> triangles -> PageRank.

Relational data hides graphs; this example materializes one (parts
co-purchased in the same order, support >= 2) and runs the three
join-native graph staples on it -- no graph framework, every step a
DataFrame plan the optimizer can see through:

    lineitem -> co-purchase edges (support-thresholded)
             -> triangle enumeration (oriented wedge-join)
             -> per-part triangle participation (clustering signal)
             -> fixed-iteration PageRank (centrality)
             -> connected components (market segments)

The degree-orientation variant of the wedge join is the 100 TB skew
lever: pointing each edge from its lower-degree endpoint bounds wedge
fan-out by O(sqrt(m)) on any degree distribution.

Run: python examples/graph_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.dedup import (
    connected_components,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.graph import (
    copurchase_edges,
    pagerank,
    triangle_participation,
    triangles,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="graph-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    lineitem = load_table(spark, sf_dir, "lineitem")

    edges = copurchase_edges(lineitem, min_support=2).cache()
    print(f"== co-purchase edges (support >= 2): {edges.count()} ==")

    tri = triangles(edges, orient="degree")
    print(f"== triangles (degree-oriented wedge join): {tri.count()} ==")

    print("== most-clustered parts (triangle participation) ==")
    (
        triangle_participation(edges)
        .orderBy(F.desc("triangles"), "v")
        .show(10)
    )

    print("== PageRank centrality (5 iterations, d=0.85) ==")
    pagerank(edges, iterations=5).orderBy(F.desc("rank"), "v").show(10)

    print("== 3-hop reach from the 5 lowest-id parts ==")
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.graph import (
        khop_reachability,
    )

    sources = (
        edges.select(F.col("a").alias("src"))
        .unionAll(edges.select(F.col("b").alias("src")))
        .distinct()
        .orderBy("src")
        .limit(5)
    )
    (
        khop_reachability(edges, sources, max_hops=3)
        .filter(F.col("dist") >= 1)
        .groupBy("src", "dist")
        .agg(F.count(F.lit(1)).alias("n_reachable"))
        .orderBy("src", "dist")
        .show()
    )

    print("== market segments (connected components, sizes) ==")
    comp = connected_components(
        edges.withColumnsRenamed({"a": "doc_a", "b": "doc_b"})
    )
    (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.desc("n_parts"), "component")
        .show(10)
    )
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

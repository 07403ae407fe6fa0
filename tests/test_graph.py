"""Triangle counting (operators/graph.py): orientation equivalence,
known-graph sanity, support threshold."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.graph import (
    copurchase_edges,
    triangle_participation,
    triangles,
)


def _edges_df(spark, pairs):
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    return spark.createDataFrame(canon, "a long, b long")


def test_k4_has_four_triangles(spark):
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    e = _edges_df(spark, k4)
    assert triangles(e).count() == 4
    per_v = {r["v"]: r["triangles"] for r in triangle_participation(e).collect()}
    assert per_v == {0: 3, 1: 3, 2: 3, 3: 3}  # each vertex in C(3,2) triangles


def test_triangle_free_graph(spark):
    # star graph: no triangles at any orientation
    star = [(0, i) for i in range(1, 8)]
    e = _edges_df(spark, star)
    assert triangles(e).count() == 0
    assert triangles(e, orient="degree").count() == 0
    assert triangle_participation(e).count() == 0


@pytest.mark.parametrize("seed", [5, 6])
def test_triangles_match_bruteforce_model(spark, seed):
    """Absolute correctness on random graphs: the wedge-join must
    enumerate exactly the triangles a brute-force triple scan finds."""
    from itertools import combinations

    rng = random.Random(seed)
    n = 25
    pairs = {(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < 0.3}
    want = sorted(
        (a, b, c)
        for a, b, c in combinations(range(n), 3)
        if (a, b) in pairs and (b, c) in pairs and (a, c) in pairs
    )
    e = _edges_df(spark, pairs)
    got = sorted(
        tuple(sorted((r["a"], r["b"], r["c"]))) for r in triangles(e).collect()
    )
    assert got == want


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_degree_orientation_matches_id_orientation(spark, seed):
    """The degree-ordered wedge join (the sqrt(m) skew lever) must
    enumerate the exact same triangle set as id orientation."""
    rng = random.Random(seed)
    n = 30
    pairs = {(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < 0.25}
    e = _edges_df(spark, pairs)

    def canon(df):
        return sorted(
            tuple(sorted((r["a"], r["b"], r["c"]))) for r in df.collect()
        )

    t_id = canon(triangles(e, orient="id"))
    t_deg = canon(triangles(e, orient="degree"))
    assert t_id == t_deg
    assert len(t_id) == len(set(t_id))  # each triangle exactly once


def test_copurchase_support_threshold(spark):
    rows = [
        # parts 1,2 co-occur in orders 10 and 11 (support 2);
        # parts 1,3 only in order 10 (support 1)
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {(r["a"], r["b"]) for r in copurchase_edges(li, min_support=2).collect()}
    assert got == {(1, 2)}
    all_edges = {(r["a"], r["b"]) for r in copurchase_edges(li, min_support=1).collect()}
    assert all_edges == {(1, 2), (1, 3), (2, 3)}


def test_unknown_orientation_raises(spark):
    e = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        triangles(e, orient="random")


def test_khop_path_graph_layers(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.graph import (
        khop_reachability,
    )

    path = [(i, i + 1) for i in range(6)]
    e = _edges_df(spark, path)
    src = spark.createDataFrame([(0,)], "src long")
    got = {
        (r["src"], r["v"]): r["dist"]
        for r in khop_reachability(e, src, max_hops=3).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3}


@pytest.mark.parametrize("seed", [4, 9])
def test_khop_matches_bfs_model(spark, seed):
    from collections import deque

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.graph import (
        khop_reachability,
    )

    rng = random.Random(seed)
    n = 24
    pairs = {(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < 0.12}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sources = [0, 1, 2]

    def bfs(s, maxd):
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == maxd:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        return dist

    want = {
        (s, v): d for s in sources for v, d in bfs(s, 3).items()
    }
    e = _edges_df(spark, pairs)
    src = spark.createDataFrame([(s,) for s in sources], "src long")
    got = {
        (r["src"], r["v"]): r["dist"]
        for r in khop_reachability(e, src, max_hops=3).collect()
    }
    assert got == want


def test_pagerank_sums_to_one_and_is_uniform_on_cycle(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.graph import (
        pagerank,
    )

    cycle = [(i, (i + 1) % 8) for i in range(8)]
    pr = {r["v"]: r["rank"] for r in pagerank(_edges_df(spark, cycle)).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    for v, r in pr.items():  # vertex-transitive graph: exactly uniform
        assert abs(r - 1 / 8) < 1e-9


def test_pagerank_hub_outranks_leaves(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.graph import (
        pagerank,
    )

    star = [(0, i) for i in range(1, 10)]
    pr = {r["v"]: r["rank"] for r in pagerank(_edges_df(spark, star)).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert all(pr[0] > pr[i] * 3 for i in range(1, 10))
    leaf = [pr[i] for i in range(1, 10)]
    assert max(leaf) - min(leaf) < 1e-12  # leaves symmetric


def test_pagerank_checkpoint_every_matches_pure_plan(spark):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.graph import (
        pagerank,
    )

    rng = random.Random(7)
    pairs = {(i, j) for i in range(20) for j in range(i + 1, 20) if rng.random() < 0.3}
    e = _edges_df(spark, pairs)
    pure = {r["v"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    ckpt = {
        r["v"]: r["rank"]
        for r in pagerank(e, iterations=4, checkpoint_every=2).collect()
    }
    assert pure.keys() == ckpt.keys()
    for v in pure:
        assert abs(pure[v] - ckpt[v]) < 1e-12

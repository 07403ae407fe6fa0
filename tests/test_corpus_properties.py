"""Property-based tests for the algorithmic corpus operators:
connected components against a pure-Python union-find model, and the
bucketed range join against the naive range predicate, over randomized
inputs (the same hypothesis-vs-model strategy as test_cdc_properties)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> min node id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for v in list(parent):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in parent}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=60,
    )
)
@pytest.mark.slow  # fast-tier policy (r15): randomized/soak marathon
def test_connected_components_matches_union_find(spark, edges):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, max_iter=50).collect()
    }
    assert got == _uf_components(edges)


def _lev(a: str, b: str) -> int:
    """Reference DP edit distance."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(st.text(alphabet="ab", max_size=8), min_size=2, max_size=25),
    threshold=st.integers(0, 4),
)
def test_edit_distance_pairs_matches_model(spark, texts, threshold):
    """Blocked + banded-levenshtein pairs == the pure-Python model over
    the same blocking predicate (prefix OR suffix key match) -- tiny
    alphabet so key collisions, near-dups, and empty strings all occur."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.dedup import (
        edit_distance_pairs,
    )

    bl = 3
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in edit_distance_pairs(
            docs, threshold=threshold, block_len=bl, max_block=1000
        ).collect()
    }
    want = {}
    for i, a in enumerate(texts):
        for j in range(i + 1, len(texts)):
            b = texts[j]
            if a[:bl] == b[:bl] or a[-bl:] == b[-bl:]:
                d = _lev(a, b)
                if d <= threshold:
                    want[(i, j)] = d
    assert got == want


def test_connected_components_star_equals_propagation_200_graphs(spark):
    """Differential test of the two component engines over 200 seeded
    random graphs, batched into ONE edge list via disjoint id spaces
    (graph g lives in [g*1000, g*1000+999]) so each engine runs once
    over the union instead of 200 times; both must match a pure-Python
    union-find model exactly."""
    import random

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.dedup import (
        connected_components,
    )

    edges: list[tuple[int, int]] = []
    for g in range(200):
        rng = random.Random(g)
        n = rng.randint(2, 30)
        base = g * 1000
        for _ in range(rng.randint(1, 40)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.append((base + a, base + b))
        if rng.random() < 0.3:  # planted chain: depth stress per graph
            edges.extend((base + 100 + i, base + 101 + i) for i in range(rng.randint(2, 12)))
    want = _uf_components(edges)
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got_star = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, max_iter=30, method="star").collect()
    }
    got_prop = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, max_iter=50, method="propagation").collect()
    }
    assert got_star == want
    assert got_prop == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(st.floats(0, 1000, allow_nan=False), min_size=1, max_size=80),
    ranges=st.lists(
        st.tuples(st.floats(0, 1000, allow_nan=False), st.floats(0, 300, allow_nan=False)),
        min_size=1,
        max_size=12,
    ),
    step=st.sampled_from([7.0, 50.0, 333.0]),
)
def test_bucketed_range_join_matches_naive_property(spark, values, ranges, step):
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.range_join import (
        bucketed_range_join,
    )

    probe = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "pid long, value double"
    )
    rng_df = spark.createDataFrame(
        [(i, lo, lo + w) for i, (lo, w) in enumerate(ranges)],
        "rid long, lo double, hi double",
    )
    got = sorted(
        map(tuple, bucketed_range_join(probe, rng_df, "value", step=step)
            .select("pid", "rid").collect())
    )
    want = sorted(
        (i, j)
        for i, v in enumerate(values)
        for j, (lo, w) in enumerate(ranges)
        if lo <= v < lo + w
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c ")),  # space-heavy: empties, runs
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=25,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_word_grams_arrow_matches_hof_builder(spark, texts, n):
    """Differential property: the Arrow-batched gram builder is
    byte-identical to the built-in HOF formulation it replaced
    (transform+slice+concat_ws over tokens()), in both positional and
    per-doc-distinct modes, on adversarial whitespace (leading/trailing
    spaces, runs of spaces, empty and sub-n documents)."""
    from pyspark.sql import functions as F

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.text import (
        tokens,
        word_grams_arrow,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = tokens(F.col("text"))
    hof = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws("_", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rows = docs.select(
        "doc_id",
        hof.alias("expected"),
        F.array_distinct(hof).alias("expected_distinct"),
        word_grams_arrow(F.col("text"), n).alias("got"),
        word_grams_arrow(F.col("text"), n, distinct=True).alias("got_distinct"),
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"], (r["doc_id"], texts[r["doc_id"]])
        assert r["got_distinct"] == r["expected_distinct"], (
            r["doc_id"],
            texts[r["doc_id"]],
        )

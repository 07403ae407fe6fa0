"""Join-based graph analytics over relational edge lists.

The reference's domain has implicit graphs (customers x merchants x
products through transactions; documents through near-dup pairs --
``operators/dedup.py`` already ships connected components over the
latter).  This module adds the other staple whose distributed form is
pure relational algebra: triangle counting over an undirected graph,
via the oriented wedge-join (Suri & Vassilvitskii, WWW'11 "Counting
Triangles and the Curse of the Last Reducer").

Scale notes (100 TB):
- Every step is joins/aggregations on edge keys -- shuffles on vertex
  ids, no driver-side state, no iteration.
- Orientation (keeping each undirected edge once as ``a < b``) makes
  each triangle countable exactly once and caps the wedge join's
  fan-out at the out-degree, not the full degree.
- The classic skew lever is DEGREE orientation (point each edge from
  its lower-degree endpoint): it bounds out-degree by O(sqrt(m)) on
  any graph, turning the curse-of-the-last-reducer hub wedge
  explosion into a balanced join.  ``orient="degree"`` does exactly
  that; the default ``"id"`` orientation keeps results comparable to
  a plain SQL oracle (identical output either way -- the lever only
  moves WHERE wedges are generated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
) -> DataFrame:
    """Distinct undirected co-occurrence edges ``(a < b)`` between
    items sharing an order, kept when they co-occur in at least
    ``min_support`` distinct orders (the market-basket support
    threshold -- it prunes the long tail of one-off coincidences and
    keeps the graph's degree distribution workable).

    Plan: ``collect_set`` the distinct items per order (ONE shuffle on
    the order key -- state per group is bounded by basket size, TPC-H
    <= 7 lines), then generate the ``a < b`` pairs with two in-task
    explodes (generators, no shuffle), then pair-count (second
    shuffle).  Two exchanges total vs the naive self-join's four
    (dedup + both join sides + agg) -- measured ~1.5x faster at sf0.1
    and strictly less shuffle volume at scale.  The set dedup makes
    every per-order pair distinct, so support is a plain ``count(*)``
    instead of the two-phase ``count_distinct`` expansion.
    """
    sets = (
        lineitem.select(F.col(order_col).alias("o"), F.col(item_col).alias("i"))
        .groupBy("o")
        .agg(F.collect_set("i").alias("items"))
    )
    pairs = (
        sets.select(F.explode("items").alias("a"), "items")
        .select("a", F.explode("items").alias("b"))
        .filter(F.col("a") < F.col("b"))
    )
    # explicit width on the support aggregate: the pair-instance table
    # is wide (every basket's pairs) but mostly support-1, so map-side
    # combine barely shrinks it and AQE's size-based coalesce funnels
    # the whole reduce into ONE task (~28 MB advisory at sf0.1 --
    # measured 1.2 s single-task vs 0.4 s at explicit width; this agg
    # was 2/3 of khop_reachability's warm floor).  groupBy reuses the
    # repartition's hash layout, so this costs no extra exchange; at
    # cluster scale shuffle.partitions is sized to the cluster and the
    # same width applies.
    try:
        width = max(
            1, int(lineitem.sparkSession.conf.get("spark.sql.shuffle.partitions")) // 2
        )
    except (TypeError, ValueError):
        width = 16
    return (
        pairs.repartition(width, "a", "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .select("a", "b")
    )


def _orient_by_degree(edges: DataFrame) -> DataFrame:
    """Re-orient ``a -> b`` so the lower-(degree, id) endpoint points
    to the higher: bounds out-degree by O(sqrt(m)) (every edge of a
    hub with degree > sqrt(m) points INTO it from rarer vertices)."""
    both = edges.select(F.col("a").alias("v")).unionAll(
        edges.select(F.col("b").alias("v"))
    )
    deg = both.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    e = (
        edges.join(deg.withColumnsRenamed({"v": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"v": "b", "d": "db"}), "b")
    )
    keep = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(keep, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(keep, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def triangles(edges: DataFrame, orient: str = "id") -> DataFrame:
    """Enumerate each triangle of an undirected graph exactly once.

    ``edges``: distinct pairs with ``a < b`` (one row per undirected
    edge).  Returns rows ``(a, b, c)``, one per triangle, with the
    vertex columns in the orientation's order.

    Oriented wedge-join: generate wedges ``(x->y, x->z)`` at each
    vertex's out-neighborhood, then left-semi join the closing edge
    ``(y, z)``.  Two shuffles (wedge join on the pivot, closing join
    on the wedge tips); with ``orient="degree"`` the wedge fan-out is
    O(sqrt(m)) per vertex on any degree distribution.
    """
    if orient == "degree":
        e = _orient_by_degree(edges)
    elif orient == "id":
        e = edges
    else:
        raise ValueError(f"unknown orientation {orient!r}")
    w1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    w2 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    # y < z enumerates each unordered tip pair exactly once (the join
    # produces both (y,z) and (z,y)); every triangle has exactly one
    # vertex with both others in its out-neighborhood under either
    # orientation, so each triangle appears exactly once.  The closing
    # lookup probes the ORIGINAL a<b edges, which is how the undirected
    # tip edge is stored.
    wedges = (
        w1.join(w2, "x")
        .filter(F.col("y") < F.col("z"))
        .select(
            F.col("x").alias("a"),
            F.col("y").alias("b"),
            F.col("z").alias("c"),
        )
    )
    closing = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    return wedges.join(closing, ["b", "c"], "left_semi")


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected graph (edges
    ``a < b``, one row per edge; both directions contribute).

    Returns ``(v, rank)`` for every vertex with at least one edge;
    ranks sum to 1.  Fixed iteration count (not convergence-tested)
    keeps the result a deterministic function of the graph -- the same
    contract as the reference-style declarative ops, and what lets a
    SQL oracle unroll the exact computation.

    Scale shape: per iteration one join (ranks x out-edges, shuffled
    on the vertex id -- AQE reuses the partitioning across iterations)
    and one keyed sum.  No dangling-mass term is needed: bidirected
    edges give every vertex out-degree >= 1.  For long chains on real
    clusters set ``checkpoint_every`` (e.g. 2) to truncate lineage the
    same way ``connected_components`` does; the default keeps the plan
    pure for small iteration counts.
    """
    bi = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        # every iteration joins against bi and verts: materialize them
        # once (lazily -- the first action computes them) instead of
        # re-deriving the edge expansion ~3x per iteration
        .localCheckpoint(eager=False)
    )
    deg = bi.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.select(F.count(F.lit(1)).alias("n"))
    # constant 1-row broadcasts: N and the teleport term
    verts = deg.crossJoin(F.broadcast(n)).localCheckpoint(eager=False)
    ranks = verts.select(
        "src", "deg", "n", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for i in range(iterations):
        contrib = (
            bi.join(ranks, "src")
            .select(F.col("dst").alias("v"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            verts.join(contrib, verts["src"] == contrib["v"], "left")
            .select(
                "src",
                "deg",
                "n",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("src").alias("v"), "rank")


def khop_reachability(
    edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Layered BFS from ``sources`` (single column ``src``) over an
    undirected graph (edges ``a < b``): returns ``(src, v, dist)``
    with the MINIMAL hop distance for every vertex reachable within
    ``max_hops`` (sources themselves at dist 0).

    The relational form of a recursive traversal with a fixed depth
    bound: per hop one frontier-expansion join + an anti-join that
    keeps the work O(newly-reached vertices) instead of O(paths),
    which explodes combinatorially on dense graphs.  Two scale levers:

    - the anti-join's right side is only the PREVIOUS TWO layers, not
      the full visited set -- exact for hop distance (per source, a
      neighbor of a dist-(h-1) vertex has dist >= h-2, the triangle
      inequality on hops), so per-hop shuffle volume is O(frontier),
      never O(everything reached so far);
    - each layer is coalesced to constant width before checkpointing,
      so the layer unions don't multiply partition counts (the
      iterative-union pitfall).

    All shuffles key on vertex ids; driver state is nothing (the loop
    is plan construction only).
    """
    n_parts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    try:
        # "auto" (some AQE configs) or unset must not crash plan build
        width = max(1, int(n_parts) // 2)
    except (TypeError, ValueError):
        width = 16
    bi = (
        edges.select(F.col("a").alias("s"), F.col("b").alias("d"))
        .unionAll(edges.select(F.col("b").alias("s"), F.col("a").alias("d")))
        .localCheckpoint(eager=False)
    )
    layer0 = sources.select(
        F.col("src"), F.col("src").alias("v"), F.lit(0).alias("dist")
    )
    layers = [layer0]
    frontier, prev = layer0, None
    for hop in range(1, max_hops + 1):
        expanded = frontier.join(bi, frontier["v"] == bi["s"]).select(
            "src", F.col("d").alias("v")
        )
        recent = frontier.select("src", "v")
        if prev is not None:
            recent = recent.unionByName(prev.select("src", "v"))
        fresh = (
            expanded.join(recent, ["src", "v"], "left_anti")
            # dedupe AFTER the anti-join: the join shuffles on
            # (src, v) anyway, so the dedupe reuses that partitioning
            # instead of paying its own exchange
            .dropDuplicates(["src", "v"])
            .select("src", "v", F.lit(hop).alias("dist"))
            .coalesce(width)
            # each layer is reused three times (next frontier, next
            # anti-join, result union): materialize it once
            .localCheckpoint(eager=False)
        )
        layers.append(fresh)
        frontier, prev = fresh, frontier
    out = layers[0]
    for lay in layers[1:]:
        out = out.unionByName(lay)
    return out


def triangle_participation(edges: DataFrame, orient: str = "id") -> DataFrame:
    """Per-vertex triangle membership counts: ``(v, triangles)`` --
    the local clustering numerator, and the standard 'how clustered is
    this item' feature.  One explode + keyed count over the triangle
    list."""
    tri = triangles(edges, orient=orient)
    v = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
    )
    return v.groupBy("v").agg(F.count(F.lit(1)).alias("triangles"))

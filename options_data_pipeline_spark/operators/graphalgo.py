"""Graph algorithms over edge DataFrames: degree-oriented triangle
counting and fixed-point integer PageRank.

Both operate on an undirected edge list ``(a, b)`` with ``a < b`` per
row (each undirected edge exactly once) and are pure plan compositions
— no driver collects, no RDDs — so they distribute on whatever
partitioning the input has and shuffle only on hash-uniform node ids.

Complements :mod:`.graph` (connected components / min-label
propagation); these cover the counting/centrality side of the graph
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point PageRank scale: ranks are BIGINTs scaled by 1e12 so every
# engine computes bit-identical values (integer div replaces float mul)
PR_SCALE = 1_000_000_000_000


def triangle_stats(edges: DataFrame, a: str = "part_a", b: str = "part_b") -> DataFrame:
    """Triangle count + global clustering coefficient via degree-oriented
    edge iteration.

    Every undirected edge is oriented from its lower-(degree, id)
    endpoint to the higher one, so each triangle is enumerated exactly
    once — at its lowest-rank node — and the pairwise out-neighbor join
    is bounded by the graph's degeneracy instead of its max degree (a
    hub with degree d contributes O(d) oriented out-edges, not O(d²)
    wedges). Wedges come from a per-node degree aggregate;
    deg*(deg-1) is always even, so integer `div 2` is exact.

    Returns one row: n_nodes, n_edges, n_wedges, n_triangles,
    clustering_coeff (= 3*triangles/wedges, IEEE double on exact ints).

    Both derived tables are materialized: ``deg`` feeds four plan
    branches (two orientation joins, the wedge-count aggregate, the
    node count) and the oriented edge list feeds three (both wedge
    sides and the closing semi-join) — without the barriers Catalyst
    re-derives each per branch (20 exchanges at audit; 8 with them).
    Both are node-/edge-sized derived tables, the graph-pipeline
    artifact posture.
    """
    from .materialize import materialize

    edges = edges.select(F.col(a).alias("na"), F.col(b).alias("nb"))
    deg = materialize(
        edges.select(F.col("na").alias("node"))
        .unionAll(edges.select(F.col("nb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # deg is O(|nodes|) — never force-broadcast it; the equi-joins are
    # hash joins that AQE downgrades to broadcast when the graph is small
    da = deg.select(F.col("node").alias("na"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("nb"), F.col("deg").alias("deg_b"))
    ranked = edges.join(da, "na").join(db, "nb")
    # orient toward higher (deg, id); the struct encodes the total order
    rank_a = F.struct(F.col("deg_a").alias("d"), F.col("na").alias("i"))
    rank_b = F.struct(F.col("deg_b").alias("d"), F.col("nb").alias("i"))
    fwd = rank_a < rank_b
    directed = materialize(
        ranked.select(
            F.when(fwd, F.col("na")).otherwise(F.col("nb")).alias("src"),
            F.when(fwd, F.col("nb")).otherwise(F.col("na")).alias("dst"),
            F.when(fwd, rank_b).otherwise(rank_a).alias("dst_rank"),
        )
    )
    e1 = directed.alias("e1")
    e2 = directed.alias("e2")
    wedge = (
        e1.join(e2, F.col("e1.src") == F.col("e2.src"))
        .where(F.col("e1.dst_rank") < F.col("e2.dst_rank"))
        .select(F.col("e1.dst").alias("v"), F.col("e2.dst").alias("w"))
    )
    closing = directed.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedge.join(closing, ["v", "w"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_edges.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("clustering_coeff"),
        )
    )


def pagerank_fixed_point(
    edges_und: DataFrame,
    iters: int = 3,
    a: str = "part_a",
    b: str = "part_b",
) -> DataFrame:
    """Fixed-point integer PageRank (damping 0.85) on an undirected graph.

    Ranks are BIGINTs scaled by ``PR_SCALE`` and every "multiply by a
    float" becomes integer arithmetic (`85 * s div 100`,
    `rank div deg`), so the result is bit-identical regardless of
    partitioning, join order, or engine — the float-free way to make an
    iterative algorithm pass a value-hash gate. Per iteration: one
    shuffle (groupBy dst); the degree/rank joins are key-partitioned
    equi-joins (AQE broadcasts them when small). Symmetrizing
    the edge list guarantees no dangling nodes. The iteration count is
    a plan-time constant, so the whole computation is one Catalyst plan
    (no driver-side collect).

    Returns (node, rank) for every node in the edge list.
    """
    from .materialize import materialize

    edges = edges_und.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).unionAll(edges_und.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    # deg and ranks are O(|nodes|): plain equi-joins (AQE broadcasts
    # them only when they actually fit)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # every iteration's contribution join consumes the degree-annotated
    # edge list; materialized once, the symmetrize+degree+join subtree
    # stops being re-derived per iteration (the standard posture for an
    # iteration-invariant table in an iterative job)
    edges_d = materialize(edges.join(deg, "src"))
    base = PR_SCALE * 15 // 100
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("long").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges_d.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.expr("85 * s div 100")).cast("long").alias("rank"),
        )
    return ranks

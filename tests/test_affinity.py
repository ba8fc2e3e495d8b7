"""Unit tests for the graph-affinity operators on hand-built graphs,
plus skyline dominance invariants checked against a brute-force scan.

The registry-level DuckDB parity for basket_pairs / triangle_count /
pagerank_parts / skyline_parts / mad_outliers runs in
test_oracle_parity.py; these tests pin the operator cores on inputs
with known answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.graphalgo import (
    PR_SCALE,
    pagerank_fixed_point,
    triangle_stats,
)
from options_data_pipeline_spark.plans.tpch import q_skyline_parts

from .conftest import SF_DIR


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "part_a long, part_b long"
    )


class TestTriangleStats:
    def test_single_triangle(self, spark):
        row = triangle_stats(_edges(spark, [(1, 2), (2, 3), (1, 3)])).first()
        assert row.n_nodes == 3
        assert row.n_edges == 3
        assert row.n_wedges == 3
        assert row.n_triangles == 1
        assert row.clustering_coeff == 1.0

    def test_path_has_no_triangle(self, spark):
        row = triangle_stats(_edges(spark, [(1, 2), (2, 3), (3, 4)])).first()
        assert row.n_triangles == 0
        assert row.n_wedges == 2

    def test_k4_has_four_triangles(self, spark):
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        row = triangle_stats(_edges(spark, k4)).first()
        assert row.n_edges == 6
        assert row.n_triangles == 4
        # K4: every wedge closes -> coefficient exactly 1.0
        assert row.clustering_coeff == 1.0

    def test_hub_plus_one_closure(self, spark):
        # star on 1..5 centered at 0, plus one rim edge (1,2): exactly
        # one triangle regardless of hub degree — exercises the
        # degree-orientation path where the hub outranks every rim node
        star = [(0, i) for i in range(1, 6)] + [(1, 2)]
        row = triangle_stats(_edges(spark, star)).first()
        assert row.n_triangles == 1


class TestPagerankFixedPoint:
    def test_symmetric_pair_stays_uniform(self, spark):
        # two nodes, one edge: shares are equal so ranks never diverge
        out = {
            r.node: r.rank
            for r in pagerank_fixed_point(_edges(spark, [(1, 2)])).collect()
        }
        assert out[1] == out[2]
        # base + 0.85 * (scale/1) with integer ops
        assert out[1] == PR_SCALE * 15 // 100 + 85 * PR_SCALE // 100

    def test_center_of_star_ranks_highest(self, spark):
        star = [(0, i) for i in range(1, 6)]
        out = {
            r.node: r.rank
            for r in pagerank_fixed_point(_edges(spark, star)).collect()
        }
        rim = [out[i] for i in range(1, 6)]
        assert out[0] > max(rim)
        assert len(set(rim)) == 1  # rim is symmetric -> identical ranks

    def test_deterministic_across_partitionings(self, spark):
        edges = [(a, b) for a in range(1, 8) for b in range(a + 1, 8) if (a + b) % 3]
        r1 = pagerank_fixed_point(_edges(spark, edges)).collect()
        r8 = pagerank_fixed_point(
            _edges(spark, edges).repartition(8)
        ).collect()
        assert sorted(map(tuple, r1)) == sorted(map(tuple, r8))


class TestSkylineInvariants:
    def test_survivors_are_exactly_the_undominated(self, spark):
        parts = [
            (r.p_partkey, r.p_size, r.p_retailprice)
            for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
            .select("p_partkey", "p_size", "p_retailprice")
            .collect()
        ]
        survivors = {
            r.p_partkey for r in q_skyline_parts(spark, SF_DIR).collect()
        }

        def dominated(x):
            return any(
                y[1] <= x[1]
                and y[2] <= x[2]
                and (y[1] < x[1] or y[2] < x[2])
                for y in parts
            )

        brute = {k for (k, s, p) in parts if not dominated((k, s, p))}
        assert survivors == brute
        assert survivors  # non-degenerate


class TestGraphProperties:
    def test_triangle_count_matches_brute_force_on_random_graphs(self, spark):
        import itertools
        import random

        rng = random.Random(7)
        for trial in range(4):
            n = rng.randint(4, 11)
            edges = [
                (a, b)
                for a in range(n)
                for b in range(a + 1, n)
                if rng.random() < 0.45
            ]
            if not edges:
                continue
            adj = set(edges)
            brute = sum(
                1
                for a, b, c in itertools.combinations(range(n), 3)
                if (a, b) in adj and (b, c) in adj and (a, c) in adj
            )
            row = triangle_stats(_edges(spark, edges)).first()
            assert row.n_triangles == brute, (trial, edges)

    def test_pagerank_rank_floor_and_node_set(self, spark):
        # every node's rank is >= the teleport base, and the output node
        # set is exactly the edge list's node set
        edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
        rows = pagerank_fixed_point(_edges(spark, edges)).collect()
        base = PR_SCALE * 15 // 100
        assert {r.node for r in rows} == {1, 2, 3, 4}
        assert all(r.rank >= base for r in rows)

    def test_empty_edge_list_degenerates_gracefully(self, spark):
        empty = spark.createDataFrame([], "part_a long, part_b long")
        row = triangle_stats(empty).first()
        assert (row.n_nodes, row.n_edges, row.n_triangles) == (0, 0, 0)
        assert pagerank_fixed_point(empty).count() == 0

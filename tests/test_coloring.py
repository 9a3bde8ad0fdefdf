"""Semantic invariants for the Jones-Plassmann greedy coloring
(plans/graphq2.py::g_greedy_coloring) — the oracle gate proves
Spark==DuckDB on the same fixed-round unrolling; these tests
prove the unrolling computes a REAL coloring at test scale: proper
(no edge monochromatic), total (every vertex colored within the fixed
layer budget), and layer-wise independent.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from erkg_tutorials_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="module")
def graph(spark):
    from erkg_tutorials_spark.plans.graphq import trade_edges_sym

    rows = trade_edges_sym(spark, SF_DIR).collect()
    edges = {(r.src, r.dst) for r in rows}
    verts = {s for s, _ in edges} | {d for _, d in edges}
    return edges, verts


@pytest.fixture(scope="module")
def coloring(spark):
    from erkg_tutorials_spark.plans.graphq2 import g_greedy_coloring

    return {
        r.id: r.color for r in g_greedy_coloring(spark, SF_DIR).collect()
    }


class TestGreedyColoring:
    def test_total(self, graph, coloring):
        """Every vertex is colored within the fixed layer budget —
        the 'none remain undecided' half of the module contract."""
        _, verts = graph
        assert set(coloring) == verts

    def test_proper(self, graph, coloring):
        """No edge is monochromatic — the coloring is valid."""
        edges, _ = graph
        bad = [
            (s, d)
            for s, d in edges
            if s in coloring and d in coloring and coloring[s] == coloring[d]
        ]
        assert bad == []

    def test_each_vertex_once(self, spark):
        from erkg_tutorials_spark.plans.graphq2 import g_greedy_coloring

        df = g_greedy_coloring(spark, SF_DIR)
        assert df.count() == df.select("id").distinct().count()

    def test_uses_few_colors_on_bipartite_trade_graph(self, coloring):
        """The trade graph is customer↔supplier bipartite (χ=2); the
        greedy choice may exceed 2 but must stay far inside the bit-
        mask budget — a regression here means the priority rounds
        stopped breaking symmetry."""
        from erkg_tutorials_spark.graph.coloring import MAX_COLORS

        assert None not in coloring.values()
        used = max(coloring.values()) + 1
        assert used <= MAX_COLORS // 2

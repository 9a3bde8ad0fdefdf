"""r13 flat-loop / inedges_complete guards (graph/pagerank.py).

The un-namespaced loop was restructured in r13: |V| became a driver-side
scalar (no per-row ``n`` column) and ``inedges_complete`` lets callers of
mirrored edge lists skip the per-iteration verts left-join. These tests
pin the load-bearing invariants:

* a vertex with out-edges but NO in-edges (directed chain head) must
  still appear in the output with the pure-reset rank — both under the
  default probe (which must detect incompleteness) and under an explicit
  ``inedges_complete=False``;
* ``inedges_complete=True`` on a genuinely symmetric graph is
  bit-identical to the probed / forced-join paths;
* the weighted flat loop matches the same invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.pagerank import pagerank


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


@pytest.fixture(scope="module")
def chain_edges(spark):
    # a -> b -> c: `a` has no in-edge, `c` has no out-edge (dangler)
    return spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["src", "dst"]
    )


@pytest.fixture(scope="module")
def sym_edges(spark):
    fwd = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")], ["src", "dst"]
    )
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


class TestInedgesIncomplete:
    def test_probe_keeps_inedgeless_vertex(self, chain_edges):
        pr = _ranks(pagerank(chain_edges, max_iter=4))
        # `a` receives no mass: rank is the pure reset + dangling terms
        assert set(pr) == {"a", "b", "c"}
        assert abs(sum(pr.values()) - 1.0) < 1e-9
        assert pr["a"] < pr["b"] < pr["c"]

    def test_forced_false_matches_probe(self, chain_edges):
        probed = _ranks(pagerank(chain_edges, max_iter=4))
        forced = _ranks(
            pagerank(chain_edges, max_iter=4, inedges_complete=False)
        )
        assert probed == forced  # bit-identical


class TestInedgesComplete:
    def test_true_matches_probe_bit_identical(self, sym_edges):
        probed = _ranks(pagerank(sym_edges, max_iter=6))
        asserted = _ranks(
            pagerank(sym_edges, max_iter=6, inedges_complete=True)
        )
        forced = _ranks(
            pagerank(sym_edges, max_iter=6, inedges_complete=False)
        )
        assert probed == asserted == forced  # bit-identical

    def test_weighted_true_matches_forced_join(self, sym_edges):
        w = sym_edges.withColumn(
            "w", (F.length("src") + F.length("dst")).cast("double")
        )
        asserted = _ranks(
            pagerank(w, max_iter=5, weight="w", inedges_complete=True)
        )
        forced = _ranks(
            pagerank(w, max_iter=5, weight="w", inedges_complete=False)
        )
        assert asserted == forced  # bit-identical
        assert abs(sum(asserted.values()) - 1.0) < 1e-9

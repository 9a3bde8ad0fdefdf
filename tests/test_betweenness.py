"""Brandes sampled-source betweenness (graph/betweenness.py) on graphs
with hand-computable centralities. The registry query's oracle proves
sf-scale parity; these pin the algorithm itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.betweenness import betweenness_sampled


def _sym_edges(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src string, dst string")


def _all_sources(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "lm string")


def test_path_graph_interior_dependencies(spark):
    """Path a-b-c-d-e, all vertices as sources: directed-pair
    betweenness is 2x the classic undirected values — b:6, c:8,
    endpoints 0 (absent or zero)."""
    edges = _sym_edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = betweenness_sampled(
        edges, _all_sources(spark, "abcde"), max_rounds=8
    )
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert got.get("b", 0.0) == 6.0
    assert got.get("c", 0.0) == 8.0
    assert got.get("a", 0.0) == 0.0
    assert got.get("e", 0.0) == 0.0


def test_diamond_splits_dependency_across_equal_paths(spark):
    """Diamond a-{b,c}-d: every vertex mediates exactly the opposite
    pair's two equal shortest paths — half a dependency per ordered
    pair, 2 ordered pairs -> betweenness 1.0 for all four."""
    edges = _sym_edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")])
    out = betweenness_sampled(
        edges, _all_sources(spark, "abcd"), max_rounds=8
    )
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert got == {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}


def test_star_center_carries_all_pairs(spark):
    """Star with center h and 4 leaves: every leaf pair's unique path
    crosses h — 4*3 = 12 ordered pairs."""
    leaves = ["l1", "l2", "l3", "l4"]
    edges = _sym_edges(spark, [("h", leaf) for leaf in leaves])
    out = betweenness_sampled(
        edges, _all_sources(spark, ["h"] + leaves), max_rounds=8
    )
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert got.get("h", 0.0) == 12.0
    for leaf in leaves:
        assert got.get(leaf, 0.0) == 0.0


def test_bounded_depth_truncates_identically(spark):
    """max_rounds below the diameter counts only pairs whose shortest
    path fits the bound: on the 5-path with max_rounds=2, c mediates
    only (b,d)/(d,b) — the dist-3+ pairs (a,d),(b,e),(a,e) vanish."""
    edges = _sym_edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = betweenness_sampled(
        edges, _all_sources(spark, "abcde"), max_rounds=2
    )
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert got.get("c", 0.0) == 2.0


def test_sampled_sources_subset(spark):
    """Sources = {a} only: dependencies are a's Brandes deltas alone
    (path graph: delta_a(b)=3, delta_a(c)=2, delta_a(d)=1)."""
    edges = _sym_edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = betweenness_sampled(edges, _all_sources(spark, "a"), max_rounds=8)
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert got.get("b", 0.0) == 3.0
    assert got.get("c", 0.0) == 2.0
    assert got.get("d", 0.0) == 1.0


def test_disconnected_source_contributes_nothing(spark):
    edges = _sym_edges(spark, [("a", "b"), ("x", "y")])
    out = betweenness_sampled(
        edges, _all_sources(spark, ["a", "b", "x"]), max_rounds=8
    )
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert all(v == 0.0 for v in got.values())


def test_forward_round_broadcasts_frontier_and_visited(spark):
    """Plan gate (r7 VERDICT item 3): both the frontier expansion join
    and the visited anti-join must broadcast the small side so the
    edge table never shuffles."""
    import contextlib
    import io

    from erkg_tutorials_spark.graph.betweenness import bfs_round

    edges = _sym_edges(spark, [("a", "b"), ("b", "c")])
    f = spark.createDataFrame(
        [("a#", "a", 1)], "lm string, id string, sigma long"
    )
    vis = f.select("lm", "id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bfs_round(f, vis, edges).explain("simple")
    plan = buf.getvalue()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


# --- property: agreement with a reference Brandes on random graphs ---

def _brandes_reference(edges, sources, max_rounds):
    """Pure-Python bounded-depth Brandes (Brandes 2001, Alg. 1) — the
    independent implementation the distributed one must agree with."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_rounds:
                continue
            for w in sorted(adj[u]):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = defaultdict(float)
        for w in reversed(order):
            for u in adj[w]:
                if dist.get(u) == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
        for v, d in delta.items():
            if v != s:
                bc[v] += d
    return {v: round(x, 6) for v, x in bc.items() if round(x, 6) != 0.0}


def test_agrees_with_reference_brandes_on_random_graphs(spark):
    import random

    rng = random.Random(8)
    for trial in range(4):
        n = rng.randint(4, 9)
        vs = [f"v{i}" for i in range(n)]
        pairs = sorted(
            {
                tuple(sorted((a, b)))
                for a in vs
                for b in vs
                if a != b and rng.random() < 0.45
            }
        )
        if not pairs:
            continue
        srcs = [v for v in vs if rng.random() < 0.6] or [vs[0]]
        rounds = rng.choice([2, 3, 8])
        expect = _brandes_reference(pairs, srcs, rounds)
        got = {
            r["id"]: r["betweenness"]
            for r in betweenness_sampled(
                _sym_edges(spark, pairs),
                _all_sources(spark, srcs),
                max_rounds=rounds,
            ).collect()
            if r["betweenness"] != 0.0
        }
        assert got == expect, (trial, pairs, srcs, rounds, got, expect)

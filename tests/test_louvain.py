"""Deterministic one-level Louvain (graph/louvain.py): community
recovery, the modularity-non-decreasing invariant over the alternating
move schedule, and exact replayability."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.louvain import community_summary, louvain_one_level


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src string, dst string")


def _two_cliques(spark):
    cl1 = [f"c:{i}" for i in range(4)]
    cl2 = [f"s:{i}" for i in range(4)]
    pairs = (
        list(itertools.combinations(cl1, 2))
        + list(itertools.combinations(cl2, 2))
        + [("c:0", "s:0")]
    )
    return _sym(spark, pairs)


def _mc():
    return F.col("id").startswith("c:")


def test_two_cliques_recovered(spark):
    edges = _two_cliques(spark)
    lbl = louvain_one_level(edges, rounds=4, move_class=_mc())
    got = {r["id"]: r["lbl"] for r in lbl.collect()}
    assert len({got[f"c:{i}"] for i in range(4)}) == 1
    assert len({got[f"s:{i}"] for i in range(4)}) == 1
    assert got["c:0"] != got["s:0"]


def test_modularity_non_decreasing_per_round(spark):
    """Each accepted move strictly improves its own stale-state gain;
    on the alternating independent-set schedule the partition's exact
    modularity numerator must not decrease round over round."""
    edges = _two_cliques(spark)
    m2 = edges.count()
    prev = None
    for rounds in range(1, 5):
        lbl = louvain_one_level(edges, rounds=rounds, move_class=_mc())
        q_num = (
            community_summary(edges, lbl, m2=m2)
            .agg(F.sum("mod_num").alias("q"))
            .collect()[0]["q"]
        )
        if prev is not None:
            assert q_num >= prev, f"round {rounds}: {q_num} < {prev}"
        prev = q_num


def test_modularity_non_decreasing_on_hub_graph(spark):
    """Hub-heavy bipartite graph (the co-trade shape): same invariant."""
    pairs = [(f"c:{i}", f"s:{i % 3}") for i in range(12)] + [
        (f"c:{i}", "s:9") for i in range(0, 12, 2)
    ]
    edges = _sym(spark, pairs)
    m2 = edges.count()
    prev = None
    for rounds in range(1, 5):
        lbl = louvain_one_level(edges, rounds=rounds, move_class=_mc())
        q_num = (
            community_summary(edges, lbl, m2=m2)
            .agg(F.sum("mod_num").alias("q"))
            .collect()[0]["q"]
        )
        if prev is not None:
            assert q_num >= prev
        prev = q_num


def test_exactly_replayable(spark):
    edges = _two_cliques(spark)
    a = sorted(
        (r["id"], r["lbl"])
        for r in louvain_one_level(edges, rounds=4, move_class=_mc()).collect()
    )
    b = sorted(
        (r["id"], r["lbl"])
        for r in louvain_one_level(edges, rounds=4, move_class=_mc()).collect()
    )
    assert a == b


def test_summary_accounts_every_vertex_and_edge(spark):
    edges = _two_cliques(spark)
    lbl = louvain_one_level(edges, rounds=4, move_class=_mc())
    summ = community_summary(edges, lbl, m2=edges.count()).collect()
    assert sum(r["n_members"] for r in summ) == 8
    assert sum(r["tot_degree"] for r in summ) == edges.count()
    # intra-community sym edges: both 4-cliques fully internal (12
    # each), the bridge crosses
    assert sum(r["in_sym"] for r in summ) == 24


def test_two_level_refines_without_losing_vertices(spark):
    """Two super-groups, each two triangles joined by bridges, one
    weak cross-link: level 2 must keep a valid partition over every
    vertex, never increase the community count, and never lower the
    exact modularity numerator vs level 1."""
    from erkg_tutorials_spark.graph.louvain import louvain_two_level

    tri = lambda a, b, c: [(a, b), (b, c), (a, c)]
    pairs = (
        tri("c:1", "s:1", "c:2") + tri("c:3", "s:2", "c:4")
        + [("c:2", "c:3")]                       # intra-super bridge
        + tri("c:5", "s:3", "c:6") + tri("c:7", "s:4", "c:8")
        + [("c:6", "c:7")]                       # intra-super bridge
        + [("c:4", "c:5")]                       # weak cross-super link
    )
    edges = _sym(spark, pairs)
    m2 = edges.count()

    lbl1 = louvain_one_level(edges, rounds=4, move_class=_mc())
    lbl2 = louvain_two_level(edges, rounds1=4, rounds2=4, move_class=_mc())

    ids1 = {r["id"] for r in lbl1.collect()}
    rows2 = lbl2.collect()
    assert {r["id"] for r in rows2} == ids1  # partition over all vertices

    n1 = lbl1.select("lbl").distinct().count()
    n2 = lbl2.select("lbl").distinct().count()
    assert n2 <= n1  # aggregation can only merge

    q1 = community_summary(edges, lbl1, m2=m2).agg(F.sum("mod_num")).collect()[0][0]
    q2 = community_summary(edges, lbl2, m2=m2).agg(F.sum("mod_num")).collect()[0][0]
    assert q2 >= q1


def test_two_level_is_deterministic(spark):
    from erkg_tutorials_spark.graph.louvain import louvain_two_level

    edges = _two_cliques(spark)
    a = sorted(
        map(tuple, louvain_two_level(edges, 4, 4, move_class=_mc()).collect())
    )
    b = sorted(
        map(tuple, louvain_two_level(edges, 4, 4, move_class=_mc()).collect())
    )
    assert a == b


def test_weighted_l1_modularity_non_decreasing(spark):
    """r8 VERDICT item 8: the weighted level-1 mover under the
    bipartite alternating schedule keeps the weighted modularity
    numerator non-decreasing round over round."""
    from erkg_tutorials_spark.graph.louvain import (
        louvain_weighted_level,
        weighted_community_summary,
    )

    pairs = (
        [(f"c:{i}", f"s:{i % 3}", 5) for i in range(9)]
        + [(f"c:{i}", "s:9", 1) for i in range(0, 9, 2)]
    )
    rows = [(a, b, w) for a, b, w in pairs] + [(b, a, w) for a, b, w in pairs]
    wedges = spark.createDataFrame(rows, "src string, dst string, w long")
    m2 = sum(w for _, _, w in rows)
    prev = None
    for rounds in range(1, 5):
        lbl = louvain_weighted_level(
            wedges, rounds=rounds, move_class=F.col("id").startswith("c:")
        )
        q_num = (
            weighted_community_summary(wedges, lbl, m2=m2)
            .agg(F.sum("mod_num").alias("q"))
            .collect()[0]["q"]
        )
        if prev is not None:
            assert q_num >= prev, f"round {rounds}: {q_num} < {prev}"
        prev = q_num


def test_weighted_l1_heavy_weight_dominates(spark):
    """Weight-awareness: two clusters tied by MANY light cross edges
    vs FEW heavy intra edges — the weighted mover must group by the
    heavy mass, which the unweighted 0/1 view would get wrong."""
    from erkg_tutorials_spark.graph.louvain import louvain_weighted_level

    # c:0,c:1 trade heavily with s:0; c:2,c:3 heavily with s:1;
    # every customer also touches the other supplier once
    pairs = (
        [("c:0", "s:0", 20), ("c:1", "s:0", 20)]
        + [("c:2", "s:1", 20), ("c:3", "s:1", 20)]
        + [(f"c:{i}", "s:1", 1) for i in (0, 1)]
        + [(f"c:{i}", "s:0", 1) for i in (2, 3)]
    )
    rows = [(a, b, w) for a, b, w in pairs] + [(b, a, w) for a, b, w in pairs]
    wedges = spark.createDataFrame(rows, "src string, dst string, w long")
    lbl = louvain_weighted_level(
        wedges, rounds=4, move_class=F.col("id").startswith("c:")
    )
    got = {r["id"]: r["lbl"] for r in lbl.collect()}
    assert got["c:0"] == got["c:1"] == got["s:0"]
    assert got["c:2"] == got["c:3"] == got["s:1"]
    assert got["s:0"] != got["s:1"]

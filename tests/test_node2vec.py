"""node2vec walk/pair generation (graph/node2vec.py): determinism,
the no-backtrack bias, dead-end termination, and window semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.node2vec import node2vec_walks, skipgram_pairs


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src string, dst string")


def _starts(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def test_walks_are_deterministic(spark):
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    kw = dict(walk_length=4, walks_per_start=3)
    w1 = sorted(map(tuple, node2vec_walks(edges, _starts(spark, "ab"), **kw).collect()))
    w2 = sorted(map(tuple, node2vec_walks(edges, _starts(spark, "ab"), **kw).collect()))
    assert w1 == w2
    assert len(w1) > 0


def test_no_backtrack(spark):
    """On a path graph the non-backtracking walk has exactly one legal
    move per step — the walk marches down the path."""
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    walks = node2vec_walks(
        edges, _starts(spark, "a"), walk_length=4, walks_per_start=1
    )
    seq = [
        r["vertex"]
        for r in walks.where(F.col("walk_key") == "a#0").orderBy("step").collect()
    ]
    assert seq == ["a", "b", "c", "d", "e"]


def test_dead_end_terminates_walk(spark):
    """A pendant vertex's only neighbor is its predecessor — the walk
    ends there instead of bouncing back."""
    edges = _sym(spark, [("a", "b")])
    walks = node2vec_walks(
        edges, _starts(spark, "a"), walk_length=5, walks_per_start=1
    )
    rows = sorted((r["step"], r["vertex"]) for r in walks.collect())
    assert rows == [(0, "a"), (1, "b")]


def test_walk_keys_independent(spark):
    """Different walk indices from one start draw different hash
    streams; on a branching graph at least one start's walks must
    diverge (md5 streams differ per walk_key)."""
    # complete graph on 5: every step has 3-4 choices
    vs = list("abcde")
    pairs = [(u, v) for i, u in enumerate(vs) for v in vs[i + 1 :]]
    edges = _sym(spark, pairs)
    walks = node2vec_walks(
        edges, _starts(spark, vs), walk_length=5, walks_per_start=2
    )
    seqs = {}
    for r in walks.collect():
        seqs.setdefault(r["walk_key"], []).append((r["step"], r["vertex"]))
    paths = {k: tuple(v for _, v in sorted(s)) for k, s in seqs.items()}
    diverged = sum(
        1 for v in vs if paths.get(f"{v}#0") != paths.get(f"{v}#1")
    )
    assert diverged >= 1


def test_skipgram_window_counts(spark):
    """Single deterministic walk a-b-c-d-e, window 2: pair counts are
    the positional-distance counts of the sequence."""
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    walks = node2vec_walks(
        edges, _starts(spark, "a"), walk_length=4, walks_per_start=1
    )
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    # |i-j| = 1 pairs appear once each direction; |i-j| = 2 likewise
    assert got[("a", "b")] == 1 and got[("b", "a")] == 1
    assert got[("a", "c")] == 1 and got[("c", "a")] == 1
    assert ("a", "d") not in got  # distance 3 > window
    assert got[("c", "e")] == 1
    # total ordered pairs: 2*(4 adjacent + 3 at distance 2)
    assert sum(got.values()) == 14

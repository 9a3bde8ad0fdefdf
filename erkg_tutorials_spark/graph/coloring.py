"""Distributed greedy graph coloring (Jones & Plassmann 1993).

Coloring is the classic use of priority-based symmetry breaking
(Luby 1986; Jones & Plassmann 1993): in each round, every uncolored
vertex whose hash priority beats all its UNCOLORED neighbors picks
the smallest color its already-colored neighbors haven't used. All
color classes fill concurrently, so total rounds track the longest
decreasing-priority path (O(log n) w.h.p. for hash priorities) — one
pass, instead of one full MIS sweep per color (the first r9 cut of
this operator; measured 25.8 s → this variant at sf0.1, same
output contract). The GDS-catalogue verb complements the MIS/MST
tier (graph/mis.py, graph/mst.py); reference analogue: the
tutorials' GDS catalogue tier (/root/reference/Readme.md).

Priority order matters enormously here: pure hash priorities are
JP's worst case on hub-heavy bipartite graphs (a supplier with d
uncolored customer neighbors wins with probability ~1/d per round —
measured: 175 of 1600 vertices colored in 10 rounds at sf0.01), so
the priority is LARGEST-DEGREE-FIRST with a hash tiebreak (the
Welsh-Powell order): hubs color immediately, their neighborhoods
become colored context, and the bipartite trade graph finishes in 2
rounds. Deterministic end to end — degree is data, the tiebreak is
``md5('jp:' || id)`` — and the greedy color choice is the lowest
unset bit of the ``bit_or(1 << neighbor_color)`` mask, identical in
Spark and the unrolled DuckDB oracle, so the gate is a full hash
match.

Scale: each round is two edge⋈active semi-join aggregates (min
uncolored-neighbor priority; colored-neighbor color mask), both
map-side combinable, with the uncolored set shrinking geometrically.
The active/priority/winner tables are |V|-row broadcasts (same class
as the Katz/Louvain label broadcasts), routed through graph/hints.py:
one |V| count feeds every hint decision, so past the row threshold —
or with SPARK_GRAFT_GRAPH_BCAST=0 — every join co-shuffles on the
vertex key instead (parity asserted by
tests/test_coloring.py::test_coloring_parity_without_broadcast_hints).
Vertices still uncolored after
``rounds`` are reported undecided by contract (none remain at the
test scales — validity and totality asserted in
tests/test_coloring.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.hints import vhint
from erkg_tutorials_spark.graph.ckpt import CheckpointChain

# colors the bit-mask color chooser can express; the trade graph uses
# 3-4 — a budget overrun would surface as NULL colors in the totality
# test, never as a silent wrong answer
MAX_COLORS = 16


def _lowest_free_bit_spark(mask):
    expr = None
    for k in range(MAX_COLORS):
        cond = (mask.bitwiseAND(F.lit(1 << k))) == 0
        expr = (
            F.when(cond, F.lit(k))
            if expr is None
            else expr.when(cond, F.lit(k))
        )
    return expr.otherwise(F.lit(None).cast("int"))


def _lowest_free_bit_sql(mask: str) -> str:
    branches = "".join(
        f" WHEN ({mask} & {1 << k}) = 0 THEN {k}" for k in range(MAX_COLORS)
    )
    return f"CASE{branches} ELSE NULL END"


def greedy_coloring(edges_sym: DataFrame, rounds: int = 10) -> DataFrame:
    """Jones-Plassmann coloring of a symmetric unweighted edge table;
    returns (id, color)."""
    from erkg_tutorials_spark.graph.loop_confs import tuned_loop_session

    n_edges = edges_sym.count()  # loop sizing (callers pass memoized tables)
    deg = edges_sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    # sortable largest-degree-first key: zero-padded (10^10 - deg),
    # then the hash tiebreak — lexicographic MIN = highest degree.
    # r12: checkpointed once — pri is referenced two-to-three times
    # per round (neighbor-min build + winner join), and as a lazy plan
    # every reference re-ran the degree aggregation over the edge
    # table (each broadcast build paid an |E| groupBy; now each pays
    # an |V|-row RDD scan).
    pri = deg.select(
        "id",
        F.concat(
            F.lpad(
                (F.lit(10_000_000_000) - F.col("deg")).cast("string"),
                11,
                "0",
            ),
            F.md5(F.concat(F.lit("jp:"), F.col("id"))),
        ).alias("p"),
    ).localCheckpoint(eager=True)
    verts = pri.select("id")
    uchain = CheckpointChain()
    unc = uchain(verts)
    # one count over the (checkpointed) vertex set feeds every hint
    # decision below: all broadcast state here (unc, pri, win, out) is
    # bounded by |V|, so a single estimate covers the whole loop —
    # above the hints.py threshold every join co-shuffles instead
    n_verts = unc.count()
    # r12: the shrinking rounds run under the tuned loop session
    # (graph/loop_confs.py — AQE off, size-derived partitions), the
    # same measured trade as the PageRank family: fixed known shapes
    # per round make AQE re-planning pure driver overhead.
    with tuned_loop_session(edges_sym.sparkSession, n_edges) as (
        _loop,
        rebind,
    ):
        out = _coloring_rounds(
            rebind(edges_sym), rebind(pri), rebind(unc),
            n_verts, rounds, uchain,
        )
    if out is None:  # vertexless input: empty result, same schema
        out = verts.limit(0).withColumn("color", F.lit(0))
    return out


def _coloring_rounds(edges_sym, pri, unc, n_verts, rounds, uchain):
    out: DataFrame | None = None
    for _r in range(rounds):
        if unc.isEmpty():
            break
        u_src = vhint(unc.select(F.col("id").alias("src")), n_verts)
        u_dst = vhint(unc.select(F.col("id").alias("dst")), n_verts)
        p_dst = vhint(
            pri.select(F.col("id").alias("dst"), F.col("p").alias("pd")),
            n_verts,
        )
        nmin = (
            edges_sym.join(u_src, "src")
            .join(u_dst, "dst")
            .join(p_dst, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("pd").alias("np"))
        )
        win = (
            unc.join(vhint(pri, n_verts), "id")
            .join(nmin, "id", "left")
            .where(F.col("np").isNull() | (F.col("p") < F.col("np")))
            .select("id")
        )
        if out is None:
            sel = win.withColumn("color", F.lit(0))
        else:
            c_dst = vhint(
                out.select(
                    F.col("id").alias("dst"), F.col("color").alias("cd")
                ),
                n_verts,
            )
            mask = (
                edges_sym.join(
                    vhint(win.select(F.col("id").alias("src")), n_verts),
                    "src",
                )
                .join(c_dst, "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(
                    F.expr("bit_or(shiftleft(1, cd))").alias("mask")
                )
            )
            sel = win.join(mask, "id", "left").select(
                "id",
                _lowest_free_bit_spark(
                    F.coalesce(F.col("mask"), F.lit(0)).cast("long")
                ).alias("color"),
            )
        sel = sel.localCheckpoint(eager=True)
        out = sel if out is None else out.unionByName(sel)
        unc = uchain(unc.join(sel.select("id"), "id", "left_anti"))
    return out


def greedy_coloring_sql(edges_cte: str, rounds: int = 10) -> str:
    """DuckDB oracle twin: identical fixed-round unrolling.

    ``edges_cte`` must open a WITH clause defining ``edges(src,dst)``
    (both orientations) and ``verts(id)``.
    """
    free = _lowest_free_bit_sql("COALESCE(m.mask, 0)")
    parts = ["""
    degt AS MATERIALIZED (
      SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
      FROM edges GROUP BY src
    ),
    pri AS MATERIALIZED (
      SELECT id,
             lpad(CAST(10000000000 - deg AS VARCHAR), 11, '0')
               || md5('jp:' || id) AS p
      FROM degt
    ),
    u0 AS MATERIALIZED (SELECT id FROM verts),
    col0 AS MATERIALIZED (
      SELECT id, CAST(0 AS INTEGER) AS color FROM verts LIMIT 0
    )"""]
    for r in range(rounds):
        parts.append(f"""
    nm{r} AS MATERIALIZED (
      SELECT e.src AS id, MIN(p.p) AS np
      FROM edges e JOIN u{r} a ON a.id = e.src
                   JOIN u{r} b ON b.id = e.dst
                   JOIN pri p ON p.id = e.dst
      GROUP BY e.src
    ),
    win{r} AS MATERIALIZED (
      SELECT u.id FROM u{r} u JOIN pri p ON p.id = u.id
      LEFT JOIN nm{r} n ON n.id = u.id
      WHERE n.np IS NULL OR p.p < n.np
    ),
    msk{r} AS MATERIALIZED (
      SELECT e.src AS id, bit_or(1 << c.color) AS mask
      FROM edges e JOIN win{r} w ON w.id = e.src
                   JOIN col{r} c ON c.id = e.dst
      GROUP BY e.src
    ),
    new{r} AS MATERIALIZED (
      SELECT w.id, CAST({free} AS INTEGER) AS color
      FROM win{r} w LEFT JOIN msk{r} m ON m.id = w.id
    ),
    col{r + 1} AS MATERIALIZED (
      SELECT id, color FROM col{r}
      UNION ALL SELECT id, color FROM new{r}
    ),
    u{r + 1} AS MATERIALIZED (
      SELECT u.id FROM u{r} u LEFT JOIN win{r} w ON w.id = u.id
      WHERE w.id IS NULL
    )""")
    return (
        edges_cte
        + ","
        + ",".join(parts)
        + f"\n    SELECT id, color FROM col{rounds}"
    )

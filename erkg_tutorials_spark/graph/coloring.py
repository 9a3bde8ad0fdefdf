"""Distributed greedy graph coloring via layered Luby MIS rounds.

Coloring is the other classic use of Luby's symmetry-breaking
primitive (Luby 1986; Jones & Plassmann 1993): color class k is an
independent set of the graph induced on the still-uncolored pool, so
peeling one (near-)maximal independent set per color yields a valid
coloring in at most Δ+1 layers. The GDS-catalogue verb complements
the MIS/MST tier (graph/mis.py, graph/mst.py); reference analogue:
the tutorials' GDS catalogue tier (/root/reference/Readme.md).

Determinism: the per-layer priority is ``md5('col:' || k || ':' ||
id)`` — salted per color so one unlucky global ordering cannot
dominate every layer — the same derandomization-by-hash device the
node2vec walks and the MIS rounds use. Identical in Spark and the
unrolled DuckDB oracle, so the gate is a full hash match.

Scale: each inner round is one edges⋈active semi-join plus a
map-side-combinable groupBy(dst).min, and the uncolored pool shrinks
by a whole independent set per color — on the bipartite-ish trade
graph the pool empties in 2-3 colors. The active/priority tables are
|V|-row broadcasts (same class as the Katz/Louvain label broadcasts;
documented fallback: drop the hint and let the join shuffle).
Vertices still uncolored after ``colors`` layers are reported
undecided by contract (none remain at the test scales — validity and
totality are asserted in tests/test_coloring.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.ckpt import CheckpointChain


def greedy_coloring(
    edges_sym: DataFrame, colors: int = 5, rounds: int = 4
) -> DataFrame:
    """Color a symmetric unweighted edge table; returns (id, color).

    Color class ``c`` is the Luby MIS (``rounds`` fixed inner rounds,
    per-color salted priorities) of the graph induced on the pool of
    vertices still uncolored when layer ``c`` starts.
    """
    verts = edges_sym.select(F.col("src").alias("id")).distinct()
    pool_chain = CheckpointChain()
    pool = pool_chain(verts)
    out: DataFrame | None = None
    for c in range(colors):
        if pool.isEmpty():
            break
        pri = pool.withColumn(
            "p", F.md5(F.concat(F.lit(f"col:{c}:"), F.col("id")))
        )
        inner = CheckpointChain()
        act = inner(pool)
        col_sel: DataFrame | None = None
        for _r in range(rounds):
            if act.isEmpty():
                break
            a_src = F.broadcast(act.select(F.col("id").alias("src")))
            a_dst = F.broadcast(act.select(F.col("id").alias("dst")))
            p_dst = F.broadcast(
                pri.select(F.col("id").alias("dst"), F.col("p").alias("pd"))
            )
            nmin = (
                edges_sym.join(a_src, "src")
                .join(a_dst, "dst")
                .join(p_dst, "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.min("pd").alias("nmin"))
            )
            sel = (
                act.join(F.broadcast(pri), "id")
                .join(nmin, "id", "left")
                .where(F.col("nmin").isNull() | (F.col("p") < F.col("nmin")))
                .select("id")
                .localCheckpoint(eager=True)
            )
            col_sel = sel if col_sel is None else col_sel.unionByName(sel)
            rem = (
                edges_sym.join(
                    F.broadcast(sel.select(F.col("id").alias("src"))), "src"
                )
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            act = inner(
                act.join(sel, "id", "left_anti").join(rem, "id", "left_anti")
            )
        if col_sel is None:
            continue
        layer = col_sel.withColumn("color", F.lit(c))
        out = layer if out is None else out.unionByName(layer)
        pool = pool_chain(pool.join(col_sel, "id", "left_anti"))
    if out is None:  # vertexless input: empty result, same schema
        out = verts.limit(0).withColumn("color", F.lit(0))
    return out


def greedy_coloring_sql(
    edges_cte: str, colors: int = 5, rounds: int = 4
) -> str:
    """DuckDB oracle twin: identical fixed (colors × rounds) unrolling.

    ``edges_cte`` must open a WITH clause defining ``edges(src,dst)``
    (both orientations) and ``verts(id)``.
    """
    parts = ["""
    pool0 AS MATERIALIZED (SELECT id FROM verts)"""]
    finals = []
    for c in range(colors):
        parts.append(f"""
    pri{c} AS MATERIALIZED (
      SELECT id, md5('col:{c}:' || id) AS p FROM pool{c}
    ),
    a{c}_0 AS MATERIALIZED (SELECT id FROM pool{c})""")
        for r in range(rounds):
            parts.append(f"""
    nm{c}_{r} AS MATERIALIZED (
      SELECT e.src AS id, MIN(p.p) AS nmin
      FROM edges e JOIN a{c}_{r} a ON a.id = e.src
                   JOIN a{c}_{r} b ON b.id = e.dst
                   JOIN pri{c} p ON p.id = e.dst
      GROUP BY e.src
    ),
    sel{c}_{r} AS MATERIALIZED (
      SELECT a.id FROM a{c}_{r} a JOIN pri{c} p ON p.id = a.id
      LEFT JOIN nm{c}_{r} n ON n.id = a.id
      WHERE n.nmin IS NULL OR p.p < n.nmin
    ),
    rm{c}_{r} AS MATERIALIZED (
      SELECT DISTINCT e.dst AS id
      FROM edges e JOIN sel{c}_{r} s ON s.id = e.src
    ),
    a{c}_{r + 1} AS MATERIALIZED (
      SELECT a.id FROM a{c}_{r} a
      LEFT JOIN sel{c}_{r} s ON s.id = a.id
      LEFT JOIN rm{c}_{r} x ON x.id = a.id
      WHERE s.id IS NULL AND x.id IS NULL
    )""")
        sel_union = "\n      UNION ALL\n".join(
            f"      SELECT id FROM sel{c}_{r}" for r in range(rounds)
        )
        parts.append(f"""
    col{c} AS MATERIALIZED (
{sel_union}
    ),
    pool{c + 1} AS MATERIALIZED (
      SELECT p.id FROM pool{c} p
      LEFT JOIN col{c} s ON s.id = p.id WHERE s.id IS NULL
    )""")
        finals.append(
            f"    SELECT id, CAST({c} AS INTEGER) AS color FROM col{c}"
        )
    return edges_cte + "," + ",".join(parts) + "\n" + "\n    UNION ALL\n".join(finals)

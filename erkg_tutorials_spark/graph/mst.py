"""Distributed minimum spanning forest via Borůvka rounds.

The classic distributed MST shape (each component picks its cheapest
outgoing edge, components merge, repeat) — the GDS tier's spanning-tree
verb, complementing the path/centrality/community verbs the suite
already has. Reference analogue: the tutorials' GDS catalogue tier
(/root/reference/Readme.md) exposes graph algorithms over the entity
graph; spanning trees are the standard backbone extraction.

Determinism: edges carry a total order ``(w, ea, eb)`` where
``(ea, eb)`` are the canonical (lexicographically sorted) endpoints,
so per-component minimum selection is unique and the DuckDB oracle
(an unrolled CTE with the same fixed round/jump counts) hash-matches.

Scale: each Borůvka round is one edge⋈labels join (labels broadcast —
same |V|-row-broadcast class as the Katz/Louvain rank tables, with the
same knob-backed fallback (graph/hints.py, parity test-pinned):
drop the hint and let sort-merge join handle
a billion-vertex label table) plus pointer-jumping over the COMPONENT
table, which at least halves every round — by round 2 it is dwarfed by
|V|. Work per round is O(|E|); total O(|E| log |V|), the textbook
Borůvka bound. No collect: the per-round state stays a DataFrame,
lineage truncated by CheckpointChain.

Fixed-round semantics: ``rounds`` Borůvka phases with ``jumps``
pointer-doubling steps per phase. ``jumps=7`` flattens merge chains up
to 2^7 components deep — far beyond what the dense bipartite trade
graph produces (phase 0 collapses every customer into one of ≤|S|
supplier-anchored components). The forest/spanning invariants are
asserted against a pure-Python Kruskal in tests/test_mst_mis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.hints import vhint
from erkg_tutorials_spark.graph.ckpt import CheckpointChain


def boruvka_forest(
    wedges_sym: DataFrame, rounds: int = 4, jumps: int = 7
) -> DataFrame:
    """Minimum spanning forest edges of a weighted symmetric edge table.

    ``wedges_sym``: (src, dst, w) with both orientations present.
    Returns (edge_a, edge_b, weight, round) — the canonical undirected
    forest edges with the Borůvka phase that picked them.
    """
    e = wedges_sym.select(
        "src",
        "dst",
        "w",
        F.least("src", "dst").alias("ea"),
        F.greatest("src", "dst").alias("eb"),
    )
    comp = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    chain = CheckpointChain()
    comp = chain(comp)
    # r12: the tuned loop session (AQE off + size-derived partitions —
    # graph/loop_confs.py) was TRIED here and measurably HURT: isolated
    # best-of-3 at sf0.1, g_mst_forest 5.4 s (AQE on) vs 8.5 s (tuned).
    # Borůvka's per-phase component-join intermediates shrink fast and
    # unevenly; the in-loop joins lean on AQE's dynamic broadcast
    # conversion and coalescing, which the fixed-partition window takes
    # away. Kept on AQE deliberately (guide §1.2 — measure, then pick).
    picked = _boruvka_rounds(e, comp, rounds, jumps, chain)
    if picked is None:  # edgeless input: empty forest, same schema
        picked = (
            e.select("ea", "eb", "w").limit(0).withColumn("round", F.lit(0))
        )
    return picked.select(
        F.col("ea").alias("edge_a"),
        F.col("eb").alias("edge_b"),
        F.col("w").alias("weight"),
        "round",
    )


def _boruvka_rounds(e, comp, rounds, jumps, chain):
    picked: DataFrame | None = None
    for r in range(rounds):
        ca = vhint(
            comp.select(F.col("id").alias("src"), F.col("comp").alias("ca"))
        )
        cb = vhint(
            comp.select(F.col("id").alias("dst"), F.col("comp").alias("cb"))
        )
        ce = e.join(ca, "src").join(cb, "dst").where(F.col("ca") != F.col("cb"))
        wsel = Window.partitionBy("ca").orderBy("w", "ea", "eb")
        ch = (
            ce.withColumn("rn", F.row_number().over(wsel))
            .where(F.col("rn") == 1)
            .select("ca", "cb", "w", "ea", "eb")
        )
        # the chosen-edge table is O(#components) — checkpoint it once,
        # it feeds both the pick output and the parent-pointer merge
        ch = ch.localCheckpoint(eager=True)
        # converged: no component has an outgoing edge, so every later
        # phase is a no-op — identical output to the oracle's full
        # unrolling (its remaining pk CTEs are empty), without the jobs
        if ch.isEmpty():
            break
        pk = (
            ch.select("ea", "eb", "w")
            .distinct()
            .withColumn("round", F.lit(r))
        )
        picked = pk if picked is None else picked.unionByName(pk)
        comps = comp.select(F.col("comp").alias("c")).distinct()
        p = comps.join(
            vhint(
                ch.select(F.col("ca").alias("c"), F.col("cb").alias("pt"))
            ),
            "c",
            "left",
        ).select("c", F.coalesce("pt", F.col("c")).alias("p"))
        # break the mutual-min 2-cycles: the lexicographically smaller
        # component of a (c ⇄ p) pair becomes the root
        p2 = p.select(F.col("c").alias("p"), F.col("p").alias("pp"))
        p = p.join(vhint(p2), "p", "left").select(
            "c",
            F.when(
                (F.col("pp") == F.col("c")) & (F.col("c") < F.col("p")),
                F.col("c"),
            )
            .otherwise(F.col("p"))
            .alias("p"),
        )
        # each jump joins p with ITSELF — without truncation the logical
        # plan doubles per jump (2^jumps copies of the base subtree) and
        # Catalyst analysis, not execution, becomes the bottleneck. The
        # parent table is O(#components), so an eager per-jump
        # checkpoint chain is a trivial job that keeps plans flat.
        pchain = CheckpointChain()
        p = pchain(p)
        for _ in range(jumps):
            pj = p.select(F.col("c").alias("pk_"), F.col("p").alias("pn"))
            p = pchain(
                p.join(vhint(pj), F.col("p") == F.col("pk_")).select(
                    "c", F.col("pn").alias("p")
                )
            )
        comp = chain(
            comp.join(
                vhint(p.select(F.col("c").alias("comp"), "p")), "comp"
            ).select("id", F.col("p").alias("comp"))
        )
    return picked


def boruvka_forest_sql(wedges_cte: str, rounds: int = 4, jumps: int = 7) -> str:
    """DuckDB oracle twin: the identical fixed-round unrolling.

    ``wedges_cte`` must open a WITH clause defining ``wedges(src,dst,w)``
    (both orientations). Returns a complete SELECT.
    """
    parts = [
        """
    es AS MATERIALIZED (
      SELECT src, dst, w, LEAST(src, dst) AS ea, GREATEST(src, dst) AS eb
      FROM wedges
    ),
    comp0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS comp FROM wedges)"""
    ]
    for r in range(rounds):
        parts.append(f"""
    ce{r} AS MATERIALIZED (
      SELECT a.comp AS ca, b.comp AS cb, e.w, e.ea, e.eb
      FROM es e JOIN comp{r} a ON a.id = e.src
                JOIN comp{r} b ON b.id = e.dst
      WHERE a.comp <> b.comp
    ),
    ch{r} AS MATERIALIZED (
      SELECT ca, cb, w, ea, eb FROM (
        SELECT ca, cb, w, ea, eb,
               ROW_NUMBER() OVER (PARTITION BY ca ORDER BY w, ea, eb) AS rn
        FROM ce{r}
      ) t WHERE rn = 1
    ),
    pk{r} AS (SELECT DISTINCT ea, eb, w FROM ch{r}),
    pr{r}_b AS MATERIALIZED (
      SELECT a.c,
             CASE WHEN b.p = a.c AND a.c < a.p THEN a.c ELSE a.p END AS p
      FROM (
        SELECT d.c, COALESCE(ch.cb, d.c) AS p
        FROM (SELECT DISTINCT comp AS c FROM comp{r}) d
        LEFT JOIN ch{r} ch ON ch.ca = d.c
      ) a
      LEFT JOIN (
        SELECT d.c, COALESCE(ch.cb, d.c) AS p
        FROM (SELECT DISTINCT comp AS c FROM comp{r}) d
        LEFT JOIN ch{r} ch ON ch.ca = d.c
      ) b ON b.c = a.p
    )""")
        prev = f"pr{r}_b"
        for j in range(jumps):
            parts.append(f"""
    pr{r}_j{j} AS MATERIALIZED (
      SELECT a.c, b.p FROM {prev} a JOIN {prev} b ON b.c = a.p
    )""")
            prev = f"pr{r}_j{j}"
        parts.append(f"""
    comp{r + 1} AS MATERIALIZED (
      SELECT t.id, p.p AS comp FROM comp{r} t JOIN {prev} p ON p.c = t.comp
    )""")
    finals = "\n    UNION ALL\n".join(
        f"    SELECT ea AS edge_a, eb AS edge_b, w AS weight,"
        f" CAST({r} AS INTEGER) AS round FROM pk{r}"
        for r in range(rounds)
    )
    return wedges_cte + "," + ",".join(parts) + "\n" + finals

"""DuckDB oracle SQL builders for the iterative graph queries.

Fixed-iteration PageRank and min-label-propagation connected
components are SQL-expressible by unrolling the loop into a chain of
CTEs — one CTE per iteration, built programmatically here. This turns
the three formerly rows-only registry entries (``g5_pagerank_top20``,
``g6_connected_components``, ``g5_textrank_phrases``) into full
hash-matched oracles (VERDICT round 1, task 1).

Float parity notes (see also tests/test_plan_quality.py and the
round-1 oracle corpus):

* every constant is ``::DOUBLE`` — DuckDB decimal literals would
  otherwise promote the arithmetic to DECIMAL and diverge from
  Spark's double math;
* the damping factor is written ``(1.0 - 0.15)`` exactly as Spark
  computes ``F.lit(1.0 - reset)`` (the subtraction is exact in
  binary64 for 0.15, verified);
* the per-vertex contribution is ``SUM(rank/out_deg)`` in both
  engines; summation order may differ in the last ulp, which the
  final ``ROUND(_, 6)`` absorbs — and any ordering done on rank is
  done on the ROUNDED rank on BOTH sides so an ulp can never flip a
  top-k cut.

Semantics mirrored from erkg_tutorials_spark/graph/pagerank.py
(networkx-style damped PageRank, dangling mass omitted because every
graph ranked here is symmetric → no dangling vertices — the Spark
side proves that with its ``danglers.isEmpty()`` pre-check) and
graph/connected_components.py (component = min reachable vertex id).
Reference semantics: /root/reference/src/senzing_pipeline.py:363-368
and pytextrank's networkx PageRank (poetry.lock:3893).
"""

from __future__ import annotations


def pagerank_iterations_sql(
    *,
    iters: int,
    reset: float = 0.15,
    ns: bool = False,
) -> str:
    """CTE chain ``pr0 .. pr{iters}`` over pre-existing CTEs.

    Expects upstream CTEs (caller-supplied):

    * ``edges(src, dst)`` — symmetric, parallel edges kept
      (``edges(doc_id, src, dst)`` when ``ns``);
    * ``verts(id)`` / ``verts(doc_id, id)`` — distinct vertex ids.

    Produces intermediates ``vn`` (verts + per-namespace vertex count
    ``n``), ``e_deg`` (edges + source out-degree), and the rank chain;
    the final CTE is ``pr{iters}(id, rank)`` (plus ``doc_id`` when
    namespaced). Ranks sum to 1 per namespace.
    """
    k = "doc_id, " if ns else ""
    on_ns = "p.doc_id = e.doc_id AND " if ns else ""
    vc_ns = "v.doc_id = c.doc_id AND " if ns else ""
    if ns:
        vn = """
    nn AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM verts GROUP BY doc_id),
    vn AS MATERIALIZED (SELECT v.doc_id, v.id, nn.n FROM verts v JOIN nn ON v.doc_id = nn.doc_id)"""
    else:
        vn = """
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),
    vn AS MATERIALIZED (SELECT v.id, nn.n FROM verts v CROSS JOIN nn)"""
    parts = [
        vn,
        f"""
    out_deg AS MATERIALIZED (
      SELECT {k}src, COUNT(*) AS out_deg FROM edges GROUP BY {k}src
    ),
    e_deg AS MATERIALIZED (
      SELECT e.*, d.out_deg FROM edges e
      JOIN out_deg d ON {'e.doc_id = d.doc_id AND ' if ns else ''}e.src = d.src
    ),
    pr0 AS MATERIALIZED (
      SELECT {k}id, n, 1.0::DOUBLE / n AS rank FROM vn
    )""",
    ]
    vk = "v.doc_id, " if ns else ""
    for i in range(1, iters + 1):
        parts.append(f"""
    pr{i} AS MATERIALIZED (
      SELECT {vk}v.id, v.n,
             {reset}::DOUBLE / v.n
               + (1.0::DOUBLE - {reset}::DOUBLE) * COALESCE(c.contrib, 0.0::DOUBLE) AS rank
      FROM vn v LEFT JOIN (
        SELECT e.{k}dst AS id, SUM(p.rank / e.out_deg) AS contrib
        FROM pr{i - 1} p JOIN e_deg e ON {on_ns}p.id = e.src
        GROUP BY e.{k}dst
      ) c ON {vc_ns}v.id = c.id
    )""")
    return ",".join(parts)


def cc_label_prop_sql(*, rounds: int) -> str:
    """CTE chain ``l0 .. l{rounds}`` of min-label propagation.

    Expects ``edges(src, dst)`` (symmetric) and ``verts(id)``. After
    round k, ``lbl(v)`` = min vertex id within distance k of v; with
    ``rounds`` ≥ the graph's eccentricity from each component minimum
    this is the exact component id (identical to the large-star/
    small-star fixpoint in graph/connected_components.py — a missed
    fixpoint surfaces as a hash mismatch, so the bound is checked).
    """
    parts = ["""
    l0 AS MATERIALIZED (SELECT id, id AS lbl FROM verts)"""]
    for i in range(1, rounds + 1):
        parts.append(f"""
    l{i} AS MATERIALIZED (
      SELECT id, MIN(lbl) AS lbl FROM (
        SELECT id, lbl FROM l{i - 1}
        UNION ALL
        SELECT e.dst AS id, p.lbl FROM l{i - 1} p JOIN edges e ON e.src = p.id
      ) u GROUP BY id
    )""")
    return ",".join(parts)


def shortest_paths_sql(*, rounds: int) -> str:
    """CTE chain ``d0 .. d{rounds}`` of min-distance relaxation toward
    landmark vertices, following edge direction (GraphFrames
    ``shortestPaths`` semantics: distance FROM each vertex TO each
    landmark along directed edges).

    Expects ``edges(src, dst)`` and ``lms(lm)`` (landmark ids). After
    round k, ``d(id, lm)`` holds exact distances of length <= k; with
    ``rounds`` >= the graph's directed eccentricity toward every
    landmark this is the exact distance table (checked by the
    hash-match, same argument as cc_label_prop_sql)."""
    parts = ["""
    d0 AS MATERIALIZED (SELECT lm AS id, lm, 0 AS dist FROM lms)"""]
    for i in range(1, rounds + 1):
        parts.append(f"""
    d{i} AS MATERIALIZED (
      SELECT id, lm, MIN(dist) AS dist FROM (
        SELECT id, lm, dist FROM d{i - 1}
        UNION ALL
        SELECT e.src AS id, p.lm, p.dist + 1 AS dist
        FROM d{i - 1} p JOIN edges e ON e.dst = p.id
      ) u GROUP BY id, lm
    )""")
    return ",".join(parts)


def label_propagation_sql(*, rounds: int) -> str:
    """CTE chain ``lp0 .. lp{rounds}`` of synchronous label
    propagation (GraphFrames ``labelPropagation`` shape, made
    deterministic): each round every vertex adopts the most frequent
    label among its in-neighbors (ties -> smallest label); vertices
    with no in-neighbors keep their label. Fixed ``rounds`` on BOTH
    engines, so the oracle is exact regardless of convergence.

    Expects ``edges(src, dst)`` (mirror beforehand for undirected
    semantics) and ``verts(id)``."""
    parts = ["""
    lp0 AS MATERIALIZED (SELECT id, id AS lbl FROM verts)"""]
    for i in range(1, rounds + 1):
        parts.append(f"""
    lp{i} AS MATERIALIZED (
      SELECT v.id, COALESCE(w.lbl, p.lbl) AS lbl
      FROM verts v
      JOIN lp{i - 1} p ON p.id = v.id
      LEFT JOIN (
        SELECT id, lbl FROM (
          SELECT e.dst AS id, p.lbl, COUNT(*) AS c,
                 ROW_NUMBER() OVER (
                   PARTITION BY e.dst ORDER BY COUNT(*) DESC, p.lbl ASC
                 ) AS rn
          FROM lp{i - 1} p JOIN edges e ON e.src = p.id
          GROUP BY e.dst, p.lbl
        ) s WHERE rn = 1
      ) w ON w.id = v.id
    )""")
    return ",".join(parts)


def ppr_iterations_sql(*, iters: int, reset: float = 0.15) -> str:
    """CTE chain ``ppr0 .. ppr{iters}`` replaying personalized
    PageRank (graph/pagerank.py::personalized_pagerank).

    Expects upstream CTEs ``edges(src, dst)``, ``verts(id)``, and
    ``seeds(id)``. The teleport vector is uniform over seeds∩verts;
    dangling terms are omitted for the same reason as
    pagerank_iterations_sql (every ranked graph is symmetric — the
    Spark side proves it with danglers.isEmpty(), then adds a literal
    0.0 whose `contrib + 0.0 * tp` is IEEE-identical to `contrib` for
    the non-negative contribs here)."""
    parts = [f"""
    s0 AS MATERIALIZED (
      SELECT DISTINCT s.id FROM seeds s JOIN verts v ON v.id = s.id
    ),
    sn AS MATERIALIZED (SELECT COUNT(*) AS ns FROM s0),
    tp AS MATERIALIZED (
      SELECT v.id, COALESCE(s.w, 0.0::DOUBLE) AS tp
      FROM verts v LEFT JOIN (
        SELECT id, 1.0::DOUBLE / sn.ns AS w FROM s0 CROSS JOIN sn
      ) s ON v.id = s.id
    ),
    p_out_deg AS MATERIALIZED (
      SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
    ),
    p_e_deg AS MATERIALIZED (
      SELECT e.*, d.out_deg FROM edges e JOIN p_out_deg d ON e.src = d.src
    ),
    ppr0 AS MATERIALIZED (SELECT id, tp, tp AS rank FROM tp)"""]
    for i in range(1, iters + 1):
        parts.append(f"""
    ppr{i} AS MATERIALIZED (
      SELECT v.id, v.tp,
             {reset}::DOUBLE * v.tp
               + (1.0::DOUBLE - {reset}::DOUBLE) * COALESCE(c.contrib, 0.0::DOUBLE) AS rank
      FROM tp v LEFT JOIN (
        SELECT e.dst AS id, SUM(p.rank / e.out_deg) AS contrib
        FROM ppr{i - 1} p JOIN p_e_deg e ON p.id = e.src
        GROUP BY e.dst
      ) c ON v.id = c.id
    )""")
    return ",".join(parts)

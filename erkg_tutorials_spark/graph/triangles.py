"""Edge-iterator triangle enumeration over DEGREE-ORDERED adjacency
intersections.

The naive distributed triangle plan (three equi-joins over the
canonical u < v edge set) materializes and SHUFFLES one row per
WEDGE — Σ_b lo(b)·hi(b) rows, ~49M at sf0.1 on the co-order part
graph, then probes the edge set again to keep actual triangles. The
edge-iterator formulation does the same asymptotic work WITHOUT the
wedge shuffle: build each vertex's out-neighbor array once
(one groupBy), join the two endpoint arrays onto each edge (edge-set
sized join, arrays ride along columnar), and intersect them inside
whole-stage codegen (`array_intersect` hashes the smaller array).
Only the TRIANGLES that actually exist are exploded afterwards, so
shuffle volume drops from wedge-count to edge-count + triangle-count.

Orientation matters at scale. Any TOTAL ORDER on vertices finds each
triangle exactly once (at the oriented edge between its two smallest
vertices, the largest in the intersection), but the per-vertex
out-array length — and with it the adjacency-shuffle row width and
the per-edge intersection cost — depends on WHICH order:

- id order (u < v): a hub that happens to have a low id keeps ALL its
  neighbors in one array — unbounded skew. This is what bent the 100x
  notch superlinear (SCALE100X r11: triangle 15.4x, ktruss 16.8x per
  decade — the adjacency shuffle outgrew RAM into the single-disk
  spill cliff).
- degree order (orient each edge toward its higher-(degree, id)
  endpoint): every out-array is bounded by O(sqrt(m)) — a vertex with
  out-degree d has d neighbors of degree >= its own, so d(d-1)/2 <= m
  — and by the graph's arboricity on sparse graphs. Same triangle
  set, same outputs; the skewed array simply cannot exist.

Costs one extra degree groupBy + two edge⋈degree joins per call —
linear, shuffle-bound, no skew (degree table is vertex-keyed).

Measured at sf0.1 (local[32], SCALING.md r7/r12): g_triangle_count
17.8 s → edge-iterator rewrite; per-vertex and per-edge counts are
bit-identical to the three-join plan under EITHER orientation (the
DuckDB oracles are orientation-free and unchanged).

Public algorithm; cf. Schank & Wagner 2005, "Finding, Counting and
Listing All Triangles in Large Graphs" (the forward/degree-ordered
variant), and Cohen 2009 MapReduce triangle counting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _orientation() -> str:
    """Edge-orientation strategy: "degree" (default) or "id".

    Both are EXACT (any total vertex order finds each triangle once;
    all public outputs are orientation-invariant) — the knob exists so
    the cost trade can be re-measured per deployment:
    - "degree": out-arrays bounded by O(sqrt m) / arboricity — no hub
      skew can exist in the adjacency shuffle — at the price of one
      degree groupBy + two edge⋈degree joins per enumeration.
    - "id": no orientation pass (the input's canonical u < v order is
      used as-is), but a low-id hub keeps an unbounded out-array.
    Measured on the co-order part graph (SCALING.md r12): the spill at
    100x was PARTITION-SIZED, not skew-bound (shuffle volume exactly
    linear per decade), so on this dataset the two orientations trade
    only the join overhead; degree order stays the default because its
    worst case is bounded for graphs whose hubs do matter."""
    return os.environ.get("SPARK_GRAFT_TRI_ORIENT", "degree")


def oriented_edges(e: DataFrame) -> DataFrame:
    """Each undirected edge of the canonical (u < v, distinct) edge set
    ``e``, re-oriented from its lower-(degree, id) endpoint to its
    higher-(degree, id) endpoint: (u ≺ v) in the degree total order.
    Bijective on edges; out-degrees under this orientation are bounded
    by O(sqrt(m)). Under SPARK_GRAFT_TRI_ORIENT=id the input order is
    kept instead (see :func:`_orientation`)."""
    if _orientation() == "id":
        return e.select("u", "v")
    deg = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("u"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("v"),
        )
    )


def triangle_edge_rows(e: DataFrame) -> DataFrame:
    """(u, v, ws, cnt) per degree-oriented edge (u ≺ v in (degree, id)
    order) of the canonical edge set ``e(u, v)``: ``ws`` the array of
    third vertices w (with u ≺ w and v ≺ w) closing a triangle over
    {u, v}, ``cnt`` its size; edges closing no triangle are absent.
    Each triangle appears exactly once, on the oriented edge between
    its two (degree, id)-smallest vertices. NOTE: u/v here are in
    DEGREE order, not id order — consumers aggregating per vertex are
    orientation-free; consumers emitting per-edge rows must
    re-canonicalize with least/greatest (see :func:`edge_support`)."""
    adj = oriented_edges(e).groupBy(F.col("u").alias("id")).agg(
        F.collect_list("v").alias("nbrs")
    )
    # the oriented edge set IS the adjacency exploded — deriving the
    # probe rows from adj (u's out-array riding along the explode)
    # instead of re-joining adj onto a second copy of the oriented
    # edges keeps the orientation joins in ONE subplan (adj's two uses
    # share the same aggregate exchange, which Spark reuses; a separate
    # oriented-edge probe side would recompute the degree joins) and
    # drops the u-side array join entirely. The exploded row carries
    # the same u_nbrs payload the former join output carried — no new
    # data volume, one less shuffle.
    pairs = adj.select(
        F.col("id").alias("u"),
        F.explode("nbrs").alias("v"),
        F.col("nbrs").alias("u_nbrs"),
    )
    av = adj.select(F.col("id").alias("v"), F.col("nbrs").alias("v_nbrs"))
    # inner join on the v side: an edge whose v has no out-neighbors
    # closes no triangle ON THIS ROW (its triangles, if any, are found
    # at their own apex edges), so dropping it is exact — and a
    # triangle's apex row always survives, since for vertices a ≺ b ≺ c
    # the oriented edges are a→b, a→c, b→c: out(a) ∩ out(b) ∋ c at the
    # (a, b) row, and no other edge of the triangle sees it
    return (
        pairs.join(av, "v")
        .select(
            "u",
            "v",
            F.array_intersect(F.col("u_nbrs"), F.col("v_nbrs")).alias("ws"),
        )
        .withColumn("cnt", F.size("ws").cast("long"))
        .where(F.col("cnt") > 0)
    )


def vertex_triangle_counts(e: DataFrame) -> DataFrame:
    """(id, count): undirected triangle count per vertex of the
    canonical edge set ``e(u, v)``; vertices in no triangle absent.
    Orientation-free: each triangle row contributes once to each of
    its three vertices regardless of which edge carried it."""
    tri = triangle_edge_rows(e)
    contrib = (
        tri.select(F.col("u").alias("id"), F.col("cnt").alias("w"))
        .unionByName(tri.select(F.col("v").alias("id"), F.col("cnt").alias("w")))
        .unionByName(
            tri.select(F.explode("ws").alias("id"), F.lit(1).cast("long").alias("w"))
        )
    )
    return contrib.groupBy("id").agg(F.sum("w").alias("count"))


def edge_support(e: DataFrame) -> DataFrame:
    """(u, v, s): triangle count per canonical edge of ``e(u, v)``
    with u < v (id order — the caller's canonical form). Edges in no
    triangle are absent. A triangle found at its degree-oriented apex
    row supports all three of its edges; the oriented endpoints are
    re-canonicalized with least/greatest since degree order and id
    order disagree in general."""
    tri = triangle_edge_rows(e)
    apex = tri.select(
        F.least("u", "v").alias("u"),
        F.greatest("u", "v").alias("v"),
        F.col("cnt").alias("w"),
    )
    side_u = tri.select(
        F.col("u").alias("a"), F.explode("ws").alias("b")
    ).select(
        F.least("a", "b").alias("u"),
        F.greatest("a", "b").alias("v"),
        F.lit(1).cast("long").alias("w"),
    )
    side_v = tri.select(
        F.col("v").alias("a"), F.explode("ws").alias("b")
    ).select(
        F.least("a", "b").alias("u"),
        F.greatest("a", "b").alias("v"),
        F.lit(1).cast("long").alias("w"),
    )
    return (
        apex.unionByName(side_u)
        .unionByName(side_v)
        .groupBy("u", "v")
        .agg(F.sum("w").alias("s"))
    )

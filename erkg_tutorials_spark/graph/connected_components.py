"""G6 — connected components for entity resolution.

The reference consumes Senzing's upstream resolution (match keys /
levels surface in the report); the parity-plus north star asks for the
Spark-native equivalent: blocking (MinHash-LSH) → pairwise edges →
connected components to assign entity ids (SURVEY.md §2.7 G6).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) — the
standard shuffle-friendly CC at 100 TB scale. Each round is two
map/groupBy passes; converges in O(log² n) rounds; every intermediate
is keyed by vertex id so AQE handles skewed hubs.

Implementation detail: both stars are expressed with ``min`` +
``explode`` over grouped neighborhoods — no driver-side iteration
state beyond the convergence check (one count per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as ordered pairs (u > v dropped, self-loops
    removed, deduped)."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of x to min(N(x) ∪ {x}).

    min-aggregate + re-join rather than collect_set + explode: hub
    vertices would otherwise materialize their whole neighborhood as
    one array in a single aggregation buffer (the memory hot spot of
    the naive formulation); min+join streams — both sides stay keyed
    by ``u``, so the second pass reuses the first's partitioning.
    """
    nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    minv = nbrs.groupBy("u").agg(F.min("v").alias("minv"))
    return (
        nbrs.join(minv, "u")
        .select("u", F.least("u", "minv").alias("m"), "v")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect all smaller-or-equal neighbors of x to min(N≤(x) ∪ {x})."""
    # orient edges high -> low, group by the high endpoint; min+join
    # (see _large_star) instead of collect_set
    oriented = e.select(F.col("v").alias("x"), F.col("u").alias("y"))  # x > y
    minv = oriented.groupBy("x").agg(F.min("y").alias("m"))
    out = oriented.join(minv, "x").select(
        F.col("y").alias("a"), F.col("m").alias("b")
    )
    link_x = minv.select(F.col("x").alias("a"), F.col("m").alias("b"))
    return (
        out.unionByName(link_x)
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    tune_loop_confs: bool = True,
) -> DataFrame:
    """(id, component) — component is the minimum vertex id reachable.

    Iterates large-star/small-star until the edge set is a forest of
    stars (fixpoint), then reads components off the star edges.

    ``tune_loop_confs``: same rationale (and measurement method) as
    graph/pagerank.py — every round re-shuffles an edge set of known,
    shrinking size, so AQE's per-round re-planning is pure driver
    overhead and the partition count is derived once from the
    materialized canonical edge count. The stars' min-aggregations
    partial-aggregate map-side, so hub-vertex skew arrives
    pre-combined and loses nothing from AQE being off. Confs restored
    in a ``finally``."""
    vertices = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    e = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=True)

    def is_star_forest(df: DataFrame) -> bool:
        # Direct fixpoint test, one job: the edge set is stable under
        # both stars exactly when it is a star forest in canonical
        # orientation — no vertex is both a center (u) and a leaf (v),
        # and every leaf hangs off exactly one center. (Centers are
        # then < all their leaves, which both star ops leave
        # unchanged.) Detects convergence on the round that PRODUCES
        # the forest — the fingerprint-equality alternative needs one
        # extra full star round to observe no change, i.e. one more
        # complete pass over the edge set at 100 TB.
        stacked = df.select(F.col("u").alias("x"), F.lit(1).alias("is_u")).unionByName(
            df.select(F.col("v").alias("x"), F.lit(0).alias("is_u"))
        )
        bad = (
            stacked.groupBy("x")
            .agg(F.max("is_u").alias("isu"), F.sum(1 - F.col("is_u")).alias("nv"))
            .where(((F.col("isu") == 1) & (F.col("nv") > 0)) | (F.col("nv") > 1))
        )
        return bad.isEmpty()

    spark = edges.sparkSession
    saved_aqe = saved_parts = None
    if tune_loop_confs:
        n_edges = e.count()
        parts = max(8, min(10_000, -(-n_edges // 1_000_000)))
        saved_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        saved_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        for _ in range(max_rounds):
            e = _small_star(_large_star(e)).localCheckpoint(eager=True)
            if is_star_forest(e):
                break
    finally:
        if tune_loop_confs:
            spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
    comp = e.select(F.col("v").alias("id"), F.col("u").alias("component"))
    return (
        vertices.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )

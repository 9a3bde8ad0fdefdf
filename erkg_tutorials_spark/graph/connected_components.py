"""G6 — connected components for entity resolution.

The reference consumes Senzing's upstream resolution (match keys /
levels surface in the report); the parity-plus north star asks for the
Spark-native equivalent: blocking (MinHash-LSH) → pairwise edges →
connected components to assign entity ids (SURVEY.md §2.7 G6).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) — the
standard shuffle-friendly CC at 100 TB scale. Converges in O(log² n)
rounds; every intermediate is keyed by vertex id.

Implementation detail (r3): each star is ONE hash-partitioned window
pass — ``min(...) over (partition by center)`` computes the group
minimum in the same exchange that groups the neighborhood, where the
r2 formulation (groupBy-min then re-join) paid a second exchange for
the join side. Hub skew is no worse than the r2 shape: either way all
of a hub's neighbors meet in one partition, and the window sort is
O(deg log deg) per hub. Large-star's output dedup is deferred to
small-star's terminal ``distinct`` — duplicate (leaf, min) pairs are
absorbed by small-star's window min for free, saving a third exchange
per round. Measured at sf0.1 on the trade graph: 4.6s → 2.2s/query
with bit-identical components.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.loop_confs import tuned_loop_session

# r12 (r11 VERDICT item 3): measured GraphX crossover for CC, same
# in-JVM handoff the PageRank route uses (tools/graphx_cc_ab.py on
# this host, partition-equal parity at every point):
#   587k edges  — GraphX 10.1 s vs DF loop 23.4 s cold, but the
#                 bench-hot DF loop (~3 s on warm memos) still beats
#                 the GraphX constant, so sf0.1 stays on the loop;
#   5.9M edges  — GraphX 16.5 s vs 62.6 s (3.8x);
#   58.7M edges — GraphX 39.3 s vs 619.4 s (15.8x — the r11 100x
#                 bend, killed).
# The default threshold sits between the bench-hot win region and the
# first measured decisive GraphX win; deployments tune it with
# SPARK_GRAFT_CC_GRAPHX_MIN_EDGES (0 forces the route, huge disables).
CC_GRAPHX_MIN_EDGES = 2_000_000


def _cc_graphx_min_edges() -> int:
    v = os.environ.get("SPARK_GRAFT_CC_GRAPHX_MIN_EDGES")
    return int(v) if v not in (None, "") else CC_GRAPHX_MIN_EDGES


def _cc_graphx(e: DataFrame, vertices: DataFrame) -> DataFrame:
    """Classpath-GraphX connected components on the canonical edge set
    ``e(u, v)``, returning EXACTLY the DF loop's frame: (id, component)
    with component = the MINIMUM ORIGINAL id (string order) reachable.

    GraphX labels each vertex with the minimum VertexId long, and the
    id→vid assignment is not order-preserving on the strings, so the
    GraphX label is only used as a GROUPING key: one |V|-row
    groupBy-min over the original ids re-derives the engine's
    representative per component. Same id-index discipline as
    pagerank._pagerank_graphx: the monotonically_increasing_id map is
    eagerly checkpointed BEFORE any join reads it (non-deterministic
    under recompute), the result is checkpointed before the JVM graph
    state is unpersisted, and the MEMORY_ONLY graphs Graph.fromEdgeTuples
    / ConnectedComponents.run leave cached are dropped before return."""
    spark = e.sparkSession
    idx = (
        vertices.select("id")
        .withColumn("vid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    ledges = (
        e.join(idx.select(F.col("id").alias("u"), F.col("vid").alias("s")), "u")
        .join(idx.select(F.col("id").alias("v"), F.col("vid").alias("d")), "v")
        .select(F.col("s").alias("src"), F.col("d").alias("dst"))
    )
    jvm = spark._jvm
    enc = jvm.org.apache.spark.sql.Encoders
    tupds = getattr(ledges._jdf, "as")(enc.tuple(enc.LONG(), enc.LONG()))
    sl = jvm.org.apache.spark.storage.StorageLevel.MEMORY_ONLY()
    int_tag = jvm.scala.reflect.ClassTag.Int()
    g = jvm.org.apache.spark.graphx.Graph.fromEdgeTuples(
        tupds.rdd(), 1, jvm.scala.Option.empty(), sl, sl, int_tag
    )
    ccg = jvm.org.apache.spark.graphx.lib.ConnectedComponents.run(
        g, int_tag, int_tag
    )
    ds = spark._jsparkSession.createDataset(
        ccg.vertices(), enc.tuple(enc.LONG(), enc.LONG())
    )
    vr = DataFrame(ds.toDF(), spark).select(
        F.col("_1").alias("vid"), F.col("_2").alias("cc")
    )
    labeled = idx.join(vr, "vid").select("id", "cc")
    rep = labeled.groupBy("cc").agg(F.min("id").alias("component"))
    out = (
        labeled.join(rep, "cc")
        .select("id", "component")
        .localCheckpoint(eager=True)  # sever before the JVM state drops
    )
    ccg.unpersist(False)
    g.unpersist(False)
    return out


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

    Single window pass: one exchange keyed by the neighborhood center,
    the whole-partition ``min`` replacing r2's groupBy-min + re-join
    (which cost a second exchange for the join probe side). Output is
    NOT deduped — the duplicates flow into small-star's window min
    unchanged (min is duplicate-insensitive) and die in its terminal
    ``distinct``.
    """
    nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        nbrs.withColumn("m", F.least(F.col("u"), F.min("v").over(w)))
        .where(F.col("v") > F.col("u"))
        .select(F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect all smaller-or-equal neighbors of x to min(N≤(x) ∪ {x}).

    Same single-exchange window shape as ``_large_star``; the ordered
    window yields the group min as ``first`` AND a row_number, so the
    center's own (x, min) link is emitted exactly once (rn == 1)
    without a second join against the min table."""
    oriented = e.select(F.col("v").alias("x"), F.col("u").alias("y"))  # x > y
    w = Window.partitionBy("x").orderBy("y")
    ranked = oriented.select(
        "x",
        "y",
        F.row_number().over(w).alias("rn"),
        F.first("y").over(w).alias("m"),  # ordered window ⇒ running min ⇒ group min at every row
    )
    leaf = F.struct(F.col("y").alias("a"), F.col("m").alias("b"))
    center = F.struct(F.col("x").alias("a"), F.col("m").alias("b"))
    pairs = ranked.select(
        F.explode(
            F.when(F.col("rn") == 1, F.array(leaf, center)).otherwise(F.array(leaf))
        ).alias("s")
    ).select("s.a", "s.b")
    return (
        pairs.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    tune_loop_confs: bool = True,
    input_canonical: bool = False,
) -> DataFrame:
    """(id, component) — component is the minimum vertex id reachable.

    Iterates large-star/small-star until the edge set is a forest of
    stars (fixpoint), then reads components off the star edges.

    ``tune_loop_confs``: same rationale (and measurement method) as
    graph/pagerank.py — every round re-shuffles an edge set of known,
    shrinking size, so AQE's per-round re-planning is pure driver
    overhead and the partition count is derived once from the
    materialized canonical edge count. The stars' window minimums
    aggregate within one exchange, so hub-vertex skew costs a local
    sort, not a blown partition. The tuned confs live on a cloned
    session (graph/loop_confs.py), so concurrent queries on the
    caller's session are unaffected.

    ``input_canonical``: callers whose edge table is already distinct
    ordered pairs with src < dst and no self-loops (e.g. the bipartite
    trade graph, where every src is "c:…" < every "s:…" dst) skip the
    canonicalization shuffle — at 100 TB that is one full pass over
    the raw edge set saved.

    Raises ``RuntimeError`` if the edge set has not converged to a
    star forest within ``max_rounds`` — reading components off a
    non-converged edge set would silently return wrong ids."""
    vertices = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    from erkg_tutorials_spark.graph.ckpt import CheckpointChain

    chain = CheckpointChain()
    if input_canonical:
        e = raw.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    else:
        e = _canonical(raw)
    e = chain(e)

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
    # counted unconditionally: the route guard must see the real edge
    # count even when loop tuning is off (the pagerank ADVICE fix,
    # applied here from the start) — e is checkpoint-backed, so the
    # count materializes nothing new
    n_edges = e.count()
    # measured GraphX crossover (module header): above the threshold
    # the star loop's per-decade bend (11.2x at the r11 100x notch) is
    # replaced by the Pregel runtime — 15.8x faster at 58.7M edges,
    # frame-identical output (min-original-id labels re-derived from
    # the GraphX grouping)
    if n_edges >= _cc_graphx_min_edges():
        return _cc_graphx(e, vertices)
    converged = False
    with tuned_loop_session(spark, n_edges, enabled=tune_loop_confs) as (
        _loop,
        rebind,
    ):
        e = rebind(e)
        for i in range(max_rounds):
            e = chain(_small_star(_large_star(e)))
            # a non-trivial graph never converges on round 0 (the check
            # is a full pass over the round-0 edge set — the largest of
            # the loop); if it somehow was a forest already, round 1
            # runs once over the tiny converged set and the check fires
            # then. Guarded so max_rounds=1 still checks.
            if i == 0 and max_rounds > 1:
                continue
            if is_star_forest(e):
                converged = True
                break
    if not converged:
        raise RuntimeError(
            f"connected_components: edge set is not a star forest after "
            f"{max_rounds} rounds — raise max_rounds"
        )
    comp = e.select(F.col("v").alias("id"), F.col("u").alias("component"))
    return (
        vertices.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )

"""G5 (substrate) — PageRank as iterative DataFrame joins.

No GraphFrames dependency: each iteration is
``ranks ⋈ out-degrees ⋈ edges → groupBy(dst).sum`` plus the standard
damping + dangling-mass redistribution, i.e. exactly the shuffle
pattern GraphX's Pregel would produce, but expressed declaratively so
Catalyst/AQE manage partitioning and skew. This is a MEASURED choice,
not an assumption: the r10/r11 A/Bs (tools/graphx_ab.py, SCALING.md
"GraphX vs DataFrame-loop") drove the classpath GraphX
``PageRank.run`` via py4j on the same graph — parity 6e-15; the loop
wins below the measured crossover, and above it (GRAPHX_MIN_EDGES)
pagerank() ROUTES to GraphX for the provably-shared semantics.

Scale notes: ranks and degrees are keyed by vertex id — co-partitioned
across iterations after the first shuffle; ``localCheckpoint`` every
few rounds truncates the growing lineage (the classic iterative-algo
failure mode at scale).

Supports composite graph namespaces (e.g. per-document token graphs
for TextRank) via ``namespace_col``: PageRank then runs independently
within each namespace — thousands of small graphs in one job, no
driver loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.loop_confs import (
    loop_partitions,
    tuned_loop_session,
)

# r11: the A/B with the in-JVM handoff (tools/graphx_ab.py
# run_graphx_mem — no file marshalling) found the crossover: the DF
# loop still wins at sf0.1 (8.0 vs 21.9 s) and 10x (17.5 vs 21.6 s),
# but at the 100x notch (117M edges) GraphX's Pregel wins 70 vs 125 s.
# pagerank() therefore routes through the classpath GraphX above this
# edge threshold — only for the semantics the two engines provably
# share (un-namespaced, unweighted, cold-start, dangler-free: measured
# parity ours*n vs GraphX 2e-14 at 117M edges). Env-tunable; 0 forces
# the route (parity test tests/test_graph_frames.py).
GRAPHX_MIN_EDGES = 50_000_000


def _graphx_min_edges() -> int:
    v = os.environ.get("SPARK_GRAFT_GRAPHX_MIN_EDGES")
    return int(v) if v not in (None, "") else GRAPHX_MIN_EDGES


def with_vertex_count(base: DataFrame, ns: list[str]) -> DataFrame:
    """Annotate each vertex row with its (per-namespace) vertex count.

    Namespaced (per-doc) graphs use a partitioned window — each
    partition is one small document graph. Un-namespaced graphs use a
    broadcast scalar crossJoin: ``Window.partitionBy()`` with no keys
    would drag all |V| rows through ONE task at 100× scale."""
    if ns:
        return base.withColumn("n", F.count("*").over(Window.partitionBy(*ns)))
    return base.crossJoin(F.broadcast(base.agg(F.count("*").alias("n"))))


def pagerank(
    edges: DataFrame,
    reset: float = 0.15,
    max_iter: int = 10,
    src: str = "src",
    dst: str = "dst",
    namespace_col: str | None = None,
    checkpoint_every: int = 1,
    broadcast_ranks: bool | None = None,
    tune_loop_confs: bool = True,
    pre: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    init_ranks: DataFrame | None = None,
    weight: str | None = None,
    inedges_complete: bool | None = None,
) -> DataFrame:
    """Returns (``[namespace,] id, rank``); ranks sum to 1 per namespace.

    ``pre`` = (verts(id), e_deg(src, dst, out_deg), danglers(id)),
    already materialized by the caller (session-memo pattern — the
    same tables serve every PageRank-family query over one graph).
    Only valid without ``namespace_col``; the caller owns their
    lifecycle. The loop math is identical either way — the tables
    are the same expressions, just built once.

    Standard damped PageRank with dangling-node mass redistributed
    uniformly (networkx semantics, which pytextrank inherits —
    /root/reference poetry.lock:3893 pins pytextrank 3.3.0).

    ``tune_loop_confs`` (measured 11.3s → 4.6s on the sf0.1 trade
    graph): inside the loop, AQE is disabled and the shuffle partition
    count is derived from the materialized edge count — every
    iteration has the SAME known shapes, so AQE's per-iteration
    re-planning/compile is pure driver overhead, and its coalescing
    fights the size-derived partitioning. Skew stays handled: the only
    per-iteration shuffle is the contrib sum, which partial-aggregates
    map-side before the exchange (hub vertices arrive pre-combined).
    The tuned confs live on a cloned session (graph/loop_confs.py) —
    concurrent queries on the caller's session are unaffected.

    ``inedges_complete`` (un-namespaced only): True asserts every
    vertex has at least one in-edge (true for any mirrored/symmetric
    edge list), letting the loop skip the per-iteration verts
    left-join; None (default) probes it once per call; False forces
    the join. A wrong True would DROP in-edge-less vertices from the
    output — assert it only where symmetry is structural.
    """
    ns = [namespace_col] if namespace_col else []
    if pre is not None and ns:
        raise ValueError("pre-built invariants are only supported un-namespaced")
    if pre is not None and weight:
        raise ValueError("pre-built invariants are unweighted; pass edges")
    wcols = [F.col(weight).alias("w")] if weight else []
    e = edges.select(
        *ns, F.col(src).alias("src"), F.col(dst).alias("dst"), *wcols
    )

    if pre is not None:
        verts, e_deg, danglers = pre
    else:
        verts = (
            e.select(*ns, F.col("src").alias("id"))
            .unionByName(e.select(*ns, F.col("dst").alias("id")))
            .distinct()
        )
        if ns:
            verts = with_vertex_count(verts, ns).cache()
        else:
            # un-namespaced: |V| is ONE scalar — it is counted driver-side
            # below instead of riding every row as an `n` column, which
            # removes the per-call crossJoin overlay cache and the
            # per-iteration broadcast that re-derived it (r13: the loop's
            # per-iteration fixed cost was task/broadcast overhead, not
            # data — see _pagerank_loop_flat)
            verts = verts.cache()

        # loop-invariant tables: materialize once, reuse every iteration
        # (without this each iteration re-derives them from the source
        # scan, re-broadcasting fresh copies — the accumulated broadcasts
        # are what blow a small driver heap long before the data does).
        # The per-edge out-degree is joined onto the edge table HERE,
        # once — each iteration then needs a single ranks ⋈ edges join,
        # not two.
        if weight:
            # GDS relationshipWeight semantics: a neighbor's share of
            # the rank is its edge weight over the source's total
            # weight. GDS requires positive weights — null/zero/negative
            # edges are dropped here, so a vertex whose every out-edge
            # is non-positive carries no transition and falls into the
            # danglers set via the anti-join below (rather than
            # propagating NaN ranks). w and w_total are BOTH kept on
            # the edge table: the loop evaluates (rank*w)/w_total —
            # the oracle's exact expression tree — not a precomputed
            # share (the ulp-level divergence per edge would compound
            # over the iterations).
            e_pos = e.filter(F.col("w") > 0)
            out_deg = e_pos.groupBy(*ns, "src").agg(
                F.sum("w").alias("w_total")
            )
            e_deg = e_pos.join(out_deg, ns + ["src"]).cache()
        else:
            out_deg = e.groupBy(*ns, "src").agg(
                F.count("*").alias("out_deg")
            )
            e_deg = e.join(out_deg, ns + ["src"]).cache()
        # dangling = vertices with no out-edges; loop-invariant. Per
        # iteration their mass is a sum over the O(|V|) rank state — NOT
        # a second pass over the O(|E|) contribs (1 - sum(contrib) is the
        # same number, but forces the edge scan + aggregation to run
        # twice per iteration).
        danglers = (
            verts.select(*ns, "id")
            .join(
                out_deg.select(*ns, F.col("src").alias("id")),
                ns + ["id"],
                "left_anti",
            )
            .cache()
        )
    # un-namespaced: |V| as a driver-side scalar. float(n_verts) is exact
    # (counts < 2^53) and lit(1.0)/lit(n) is the same IEEE division the
    # former per-row `1.0 / col(n)` performed, so ranks are bit-identical.
    n_verts = None if ns else verts.count()
    inv_n = None if ns else (F.lit(1.0) / F.lit(float(n_verts)))
    if init_ranks is not None:
        # warm start (incremental maintenance): carry a prior rank
        # vector into the new graph; vertices the prior never saw
        # start at the uniform mass. The damped iteration contracts
        # toward the new fixpoint from ANY start — a warm one just
        # needs fewer rounds per maintenance batch.
        ranks = verts.join(
            init_ranks.select(
                *ns, "id", F.col("rank").alias("rank0")
            ),
            ns + ["id"],
            "left",
        ).select(
            *ns,
            "id",
            *([] if not ns else ["n"]),
            F.coalesce(
                "rank0", inv_n if not ns else F.lit(1.0) / F.col("n")
            ).alias("rank"),
        )
    elif ns:
        ranks = verts.select(
            *ns, "id", "n", (F.lit(1.0) / F.col("n")).alias("rank")
        )
    else:
        ranks = verts.select("id", inv_n.alias("rank"))

    # global graphs: |ranks| = |V| ≪ |E| — broadcasting the rank vector
    # makes each iteration's rank⋈edges a map-side join over the cached
    # edge table; the only shuffle left per iteration is the contrib
    # aggregation (PageRank's irreducible message traffic). Namespaced
    # (per-doc) graphs default to the shuffle join — there the rank
    # table is the full token×doc set and may exceed broadcast limits —
    # but callers ranking a bounded doc set can opt in.
    if broadcast_ranks is None:
        # default follows the family-wide hint knob (graph/hints.py):
        # force-disabled hints co-shuffle the rank⋈edges join on the
        # vertex key instead (an explicit broadcast_ranks=True from
        # the caller still wins — it is API, not a default)
        from erkg_tutorials_spark.graph.hints import hints_enabled

        broadcast_ranks = (not ns) and hints_enabled()
    bcast = (lambda df: F.broadcast(df)) if broadcast_ranks else (lambda df: df)

    spark = edges.sparkSession
    # materializing the cached e_deg (the biggest shuffle, run at
    # session confs so AQE still shapes it) doubles as the loop sizing
    # count (loop_confs.loop_partitions). The tuned confs live on a
    # cloned session — the caller's session is never mutated, so
    # concurrent queries on it keep their plans.
    # the GraphX route must see the real edge count even when loop
    # tuning is off (the guard used to reuse the tuning count and
    # silently skipped the route for tune_loop_confs=False callers) —
    # e_deg is cached, so the extra count just materializes the table
    # the loop or the route's edge join reads anyway
    may_route = not ns and weight is None and init_ranks is None
    n_edges = e_deg.count() if (tune_loop_confs or may_route) else 0
    # measured routing (module header): above the crossover, the
    # dangler-free/unweighted/cold-start case runs on classpath GraphX
    if (
        may_route
        and n_edges >= _graphx_min_edges()
        and danglers.isEmpty()
    ):
        out = _pagerank_graphx(e, verts, n_verts, reset, max_iter)
        if pre is None:
            e_deg.unpersist()
            danglers.unpersist()
            verts.unpersist()
        return out
    with tuned_loop_session(spark, n_edges, enabled=tune_loop_confs) as (
        _loop,
        rebind,
    ):
        ranks, verts_l, e_deg_l, danglers_l = (
            rebind(ranks), rebind(verts), rebind(e_deg), rebind(danglers),
        )
        if tune_loop_confs:
            # loop-invariant caches keep their PARENT-session layout
            # (scan/AQE-shaped — 64+ tiny partitions for a table the
            # loop sizing puts at loop_partitions(n) ≈ 8 locally), and
            # every iteration re-reads them: the per-iteration fixed
            # cost was dominated by task count, not data (r13 timeline
            # probe: ~280 tasks/iteration at sf0.1, ≥90% of them
            # sub-10 ms cache-scan tasks). coalesce() is a narrow
            # merge-at-read — no shuffle, no extra materialization —
            # that sizes every loop-side read to the loop's own
            # partitioning. Scale-adaptive by construction: P grows
            # with the measured edge count.
            p_loop = loop_partitions(n_edges)
            e_deg_l = e_deg_l.coalesce(p_loop)
            verts_l = verts_l.coalesce(p_loop)
            danglers_l = danglers_l.coalesce(p_loop)
        # symmetric graphs (bidirectional edge lists, co-occurrence
        # graphs) have no dangling vertices at all — one cheap pre-loop
        # check (inside the tuned window: its shapes are the loop's
        # shapes) skips the per-iteration dangling agg + broadcast
        has_danglers = not danglers_l.isEmpty()
        if ns:
            ranks = _pagerank_loop(
                ranks, verts_l, e_deg_l, danglers_l, has_danglers, ns,
                reset, max_iter, checkpoint_every, bcast,
            )
        else:
            # every-vertex-receives-mass check: when each vertex has at
            # least one in-edge, the contrib aggregation's key set IS
            # the vertex set, so the per-iteration verts left-join (and
            # its broadcast rebuild of the vertex table every round) is
            # the identity and is skipped. Callers that know the graph
            # is symmetric (every edge list here is mirrored) assert it
            # via inedges_complete=True; None probes once per call with
            # an anti-join at loop shapes. A WRONG True would drop
            # in-edge-less vertices from the output — asserted only
            # where symmetry is structural (mirrored unions).
            complete = inedges_complete
            if complete is None:
                complete = verts_l.join(
                    e_deg_l.select(F.col("dst").alias("id")),
                    ["id"],
                    "left_anti",
                ).isEmpty()
            ranks = _pagerank_loop_flat(
                ranks, verts_l, e_deg_l, danglers_l, has_danglers,
                complete, n_verts, reset, max_iter, checkpoint_every,
                bcast,
            )
    out = ranks.select(*ns, "id", "rank")
    # the returned frame is checkpoint-backed; the loop-invariant caches
    # are no longer needed by its lineage (caller-owned `pre` tables are
    # left alone)
    if pre is None:
        e_deg.unpersist()
        danglers.unpersist()
        verts.unpersist()
    return out


def _pagerank_graphx(e, verts, n_verts, reset: float, max_iter: int) -> DataFrame:
    """Classpath-GraphX tier for the routed case (see module header).

    Vertex ids are arbitrary strings here; GraphX needs longs, so a
    |V|-row index table maps them (monotonically_increasing_id — only
    uniqueness matters). The handoff stays in the JVM end-to-end:
    edges → Dataset[(Long,Long)] via Encoders.tuple → RDD →
    Graph.fromEdgeTuples; ranks return as a Dataset via createDataset.
    GraphX's staticPageRank starts every rank at 1.0 and iterates
    r = reset + (1-reset)·Σ r_j/deg_j with no dangling handling; on a
    dangler-free graph that is our recurrence scaled by |V| (measured:
    max |ours·n − graphx| = 2e-14 at 117M edges), so the result is
    divided by n to keep the sums-to-1 contract."""
    spark = e.sparkSession
    # the id↔vid map is joined TWICE (src and dst) and again on the way
    # out — monotonically_increasing_id is non-deterministic under
    # recompute, so a merely .cache()d index partially evicted at
    # exactly the scale this route targets (≥GRAPHX_MIN_EDGES) could
    # map src and dst through DIFFERENT assignments. The eager local
    # checkpoint makes the assignment durable before any join reads it
    # (|V| rows, 2 cols — small; the backing RDD is GC-reclaimed by the
    # ContextCleaner once idx drops out of scope).
    idx = (
        verts.select("id")
        .withColumn("vid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    ledges = (
        e.join(idx.select(F.col("id").alias("src"), F.col("vid").alias("s")),
               "src")
        .join(idx.select(F.col("id").alias("dst"), F.col("vid").alias("d")),
              "dst")
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
    ranked = jvm.org.apache.spark.graphx.lib.PageRank.run(
        g, max_iter, reset, int_tag, int_tag
    )
    ds = spark._jsparkSession.createDataset(
        ranked.vertices(), enc.tuple(enc.LONG(), enc.DOUBLE())
    )
    vr = DataFrame(ds.toDF(), spark).select(
        F.col("_1").alias("vid"), F.col("_2").alias("gxrank")
    )
    out = (
        idx.join(vr, "vid")
        .select(
            "id", (F.col("gxrank") / F.lit(float(n_verts))).alias("rank")
        )
        .localCheckpoint(eager=True)  # sever before the JVM state drops
    )
    # Graph.fromEdgeTuples caches vertices+edges MEMORY_ONLY and
    # PageRank.run leaves the final ranked graph cached — by definition
    # |E| ≥ GRAPHX_MIN_EDGES here, so leaving them resident would leak
    # edge-set-sized RDDs into executor storage on every routed call
    # and LRU-evict other queries' loop-invariant caches. The eager
    # checkpoint above already materialized everything we return.
    ranked.unpersist(False)
    g.unpersist(False)
    return out


def _pagerank_loop(
    ranks, verts, e_deg, danglers, has_danglers, ns, reset,
    max_iter, checkpoint_every, bcast,
):
    from erkg_tutorials_spark.graph.ckpt import CheckpointChain

    chain = CheckpointChain()
    join_keys = ns + ["id"]
    for i in range(max_iter):
        r_src = ranks.select(*ns, F.col("id").alias("src"), "rank")
        per_edge = (
            ((F.col("rank") * F.col("w")) / F.col("w_total"))
            if "w_total" in e_deg.columns
            else (F.col("rank") / F.col("out_deg"))
        )
        contribs = (
            bcast(r_src).join(e_deg, ns + ["src"])
            .select(*ns, F.col("dst").alias("id"), per_edge.alias("c"))
            .groupBy(*ns, "id")
            .agg(F.sum("c").alias("contrib"))
        )
        base = verts.join(contribs, join_keys, "left")
        if not has_danglers:
            base = base.withColumn("dangling", F.lit(0.0))
        elif ns:
            dangling = (
                ranks.join(danglers, join_keys, "left_semi")
                .groupBy(*ns)
                .agg(F.sum("rank").alias("dangling"))
            )
            base = base.join(dangling, ns, "left")
        else:
            # agg on a (possibly empty) semi-join still yields one row
            dangling = ranks.join(danglers, join_keys, "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
            )
            base = base.crossJoin(F.broadcast(dangling))
        ranks = base.select(
            *ns,
            "id",
            "n",
            (
                F.lit(reset) / F.col("n")
                + F.lit(1.0 - reset)
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.coalesce(F.col("dangling"), F.lit(0.0)) / F.col("n")
                )
            ).alias("rank"),
        )
        # eager per-iteration checkpoint: the rank state is O(|V|) rows,
        # but the *plan* doubles every uncheckpointed round — AQE
        # re-compilation + codegen of the nested join tree is the
        # scaling hazard, not the data. checkpoint_every > 1 trades
        # driver-side plan size for fewer materialization barriers.
        # The chain frees round i-1's blocks as round i materializes.
        if (i + 1) % checkpoint_every == 0 or i == max_iter - 1:
            ranks = chain(ranks)
    return ranks


def _pagerank_loop_flat(
    ranks, verts, e_deg, danglers, has_danglers, complete, n_verts,
    reset, max_iter, checkpoint_every, bcast,
):
    """Un-namespaced loop body: |V| is the driver-side scalar
    ``n_verts`` (no per-row ``n`` column, no per-iteration rebuild of
    the count crossJoin), and when ``complete`` — every vertex has an
    in-edge, e.g. any mirrored/symmetric edge list — the contrib
    aggregation's key set is exactly the vertex set, so the verts
    left-join drops out of the iteration entirely. Rank expressions
    evaluate the same IEEE operations on the same values as
    :func:`_pagerank_loop` (checked bit-identical by
    tests/test_graph_frames.py), the plan per round is just
    rank⋈edges → sum — two stages and one broadcast build.

    checkpoint_every stays 1 by measurement: each uncheckpointed round
    re-executes its predecessors through the broadcast(r_src) subtree,
    so longer spans are QUADRATIC re-work, not saved barriers (r13
    A/B: ce=1 8.5 s, ce=3 11.6 s, ce=5 12.9 s on the sf0.1 trade
    graph)."""
    from erkg_tutorials_spark.graph.ckpt import CheckpointChain

    chain = CheckpointChain()
    # lit(n) keeps the DIVISION form of the original expressions
    # (x / n, never x * (1/n) — the two differ in the last ulp), so
    # every rank is the same IEEE value the column-n loop produced
    n_lit = F.lit(float(n_verts))
    weighted = "w_total" in e_deg.columns
    for i in range(max_iter):
        r_src = ranks.select(F.col("id").alias("src"), "rank")
        per_edge = (
            ((F.col("rank") * F.col("w")) / F.col("w_total"))
            if weighted
            else (F.col("rank") / F.col("out_deg"))
        )
        contribs = (
            bcast(r_src).join(e_deg, ["src"])
            .select(F.col("dst").alias("id"), per_edge.alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        base = contribs if complete else verts.join(contribs, ["id"], "left")
        if not has_danglers:
            dangling_term = F.lit(0.0) / n_lit
        else:
            dangling = ranks.join(danglers, ["id"], "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
            )
            base = base.crossJoin(F.broadcast(dangling))
            dangling_term = (
                F.coalesce(F.col("dangling"), F.lit(0.0)) / n_lit
            )
        ranks = base.select(
            "id",
            (
                F.lit(reset) / n_lit
                + F.lit(1.0 - reset)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + dangling_term)
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == max_iter - 1:
            ranks = chain(ranks)
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    reset: float = 0.15,
    max_iter: int = 10,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
    tune_loop_confs: bool = True,
    pre: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    tp: DataFrame | None = None,
) -> DataFrame:
    """Returns (id, rank): random-walk-with-restart scores.

    ``pre`` = caller-materialized (verts, e_deg, danglers), exactly as
    in pagerank() — the graph invariants don't depend on the seed set,
    so one memoized build serves every watchlist.

    ``tp`` = caller-materialized teleport vector (id, tp) covering
    EVERY vertex (0.0 for non-seeds, 1/|S∩V| for seeds). A watchlist's
    teleport vector is an index artifact like the degree-joined edge
    table: deriving it costs three driver-visible jobs (seed semi-join,
    |S| count, vertex left join) that repeat on every call, so
    repeated scoring against one watchlist should memoize it. When
    given, ``seeds`` is ignored.

    networkx ``personalization=`` semantics (the reference's TextRank
    stack rides on networkx PageRank — poetry.lock:3893): the teleport
    distribution is uniform over the seed set instead of over all
    vertices, and dangling mass is redistributed to the seeds. Seeds
    not present in the graph are dropped before the 1/|S| weighting so
    the teleport vector always sums to 1.

    The loop shape matches pagerank(): loop-invariant degree-joined
    edge table and teleport vector cached once, broadcast rank vector
    (global graph: |V| ≪ |E|), one contrib-sum shuffle per iteration,
    tuned cloned-session confs, eager checkpoints. Kept as a separate
    loop rather than a pagerank() parameter so the uniform path's
    float expressions stay bit-identical to its existing oracles.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if pre is not None:
        verts, e_deg, danglers = pre
    else:
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
            .cache()
        )
        out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
        e_deg = e.join(out_deg, ["src"]).cache()
        danglers = (
            verts.join(out_deg.select(F.col("src").alias("id")), ["id"], "left_anti")
            .cache()
        )
    from erkg_tutorials_spark.graph.ckpt import CheckpointChain

    chain = CheckpointChain()
    if tp is not None:
        verts_tp = tp.select("id", "tp")
        owns_tp = False
    else:
        s = (
            seeds.select(F.col(seeds.columns[0]).alias("id"))
            .distinct()
            .join(verts, ["id"], "left_semi")
        )
        n_seeds = s.agg(F.count("*").alias("ns"))
        tp_seed = s.crossJoin(F.broadcast(n_seeds)).select(
            "id", (F.lit(1.0) / F.col("ns")).alias("tp")
        )
        verts_tp = (
            verts.join(tp_seed, ["id"], "left")
            .select("id", F.coalesce("tp", F.lit(0.0)).alias("tp"))
            .cache()
        )
        owns_tp = True
    ranks = verts_tp.select("id", "tp", F.col("tp").alias("rank"))

    spark = edges.sparkSession
    n_edges = e_deg.count() if tune_loop_confs else 0
    with tuned_loop_session(spark, n_edges, enabled=tune_loop_confs) as (
        _loop,
        rebind,
    ):
        ranks, verts_l, e_deg_l, danglers_l = (
            rebind(ranks), rebind(verts_tp), rebind(e_deg), rebind(danglers),
        )
        if tune_loop_confs:
            # size every loop-side cache read to the loop partitioning
            # (narrow merge, no shuffle) — see pagerank() for the
            # task-count measurement that motivates this
            p_loop = loop_partitions(n_edges)
            e_deg_l = e_deg_l.coalesce(p_loop)
            verts_l = verts_l.coalesce(p_loop)
            danglers_l = danglers_l.coalesce(p_loop)
        has_danglers = not danglers_l.isEmpty()
        for i in range(max_iter):
            r_src = ranks.select(F.col("id").alias("src"), "rank")
            contribs = (
                F.broadcast(r_src).join(e_deg_l, ["src"])
                .select(
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("out_deg")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("contrib"))
            )
            base = verts_l.join(contribs, ["id"], "left")
            if has_danglers:
                dangling = ranks.join(danglers_l, ["id"], "left_semi").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
                )
                base = base.crossJoin(F.broadcast(dangling))
            else:
                base = base.withColumn("dangling", F.lit(0.0))
            ranks = base.select(
                "id",
                "tp",
                (
                    F.lit(reset) * F.col("tp")
                    + F.lit(1.0 - reset)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.coalesce(F.col("dangling"), F.lit(0.0)) * F.col("tp")
                    )
                ).alias("rank"),
            )
            if (i + 1) % checkpoint_every == 0 or i == max_iter - 1:
                ranks = chain(ranks)
    out = ranks.select("id", "rank")
    if pre is None:
        e_deg.unpersist()
        danglers.unpersist()
        verts.unpersist()
    if owns_tp:
        verts_tp.unpersist()
    return out

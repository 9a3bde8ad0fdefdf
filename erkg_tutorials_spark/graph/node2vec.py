"""node2vec walk-corpus and skip-gram pair generation, deterministic.

node2vec (Grover & Leskovec 2016, "node2vec: Scalable Feature Learning
for Networks" — public paper) trains skip-gram embeddings over biased
random walks. The DATA-PIPELINE half — generating the walk corpus and
the (center, context) training pairs at graph scale — is the part a
distributed engine owns; the SGD belongs to a trainer. This module
implements that half with the engine's seed-free determinism contract:

* **walk step** = argmin over current-vertex neighbors u of
  ``md5(walk_key | step | u)`` — a deterministic hash draw any engine
  replays bit-for-bit (the ``sample_bottom_k`` trick applied to
  neighbor selection). Each (start, walk index) pair is an
  independent walk_key, so walks differ like independent seeds.
* **no-backtrack bias**: the immediate predecessor is excluded from
  the candidate set (node2vec's return parameter p -> infinity,
  q = 1) — the standard "non-backtracking walk" setting, and the
  only second-order dependence, carried as one extra column.
* **skip-gram pairs**: for window w, every ordered (center, context)
  pair within w positions in a walk, counted over the corpus —
  integer counts, exact under any aggregation order.

Distributed shape (100 TB posture): the walk state is
|starts| x walks_per_start rows — broadcast into the per-step edge
join so the edge table never shuffles (same frontier pattern as
betweenness/SSSP); each step is one join + one min(struct) groupBy on
walk_key. Steps are sequential by nature (a walk is a chain), but the
PER-STEP work covers every walk at once. The pair expansion is a
walk-local self-join on position distance — fan-out bounded by
window x walk length.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.hints import vhint


def node2vec_walks(
    edges: DataFrame,
    starts: DataFrame,
    walk_length: int = 5,
    walks_per_start: int = 2,
) -> DataFrame:
    """Deterministic non-backtracking walks over (src, dst) edges from
    ``starts`` (column ``id``). Returns (walk_key, step, vertex) with
    step 0 = the start vertex; a walk ends early at a dead end (all
    neighbors = predecessor)."""
    w0 = starts.select(F.col("id")).crossJoin(
        starts.sparkSession.range(walks_per_start).select(
            F.col("id").alias("w")
        )
    ).select(
        F.concat(F.col("id"), F.lit("#"), F.col("w")).alias("walk_key"),
        F.col("id").alias("vertex"),
        F.lit(None).cast("string").alias("prev"),
    ).localCheckpoint(eager=True)

    out = [w0.select("walk_key", F.lit(0).alias("step"), "vertex")]
    cur = w0
    for step in range(1, walk_length + 1):
        nxt = (
            vhint(cur)
            .join(edges, cur["vertex"] == edges["src"])
            .where(F.col("prev").isNull() | (F.col("dst") != F.col("prev")))
            .groupBy("walk_key")
            .agg(
                F.min(
                    F.struct(
                        F.md5(
                            F.concat(
                                F.col("walk_key"),
                                F.lit(f"|{step}|"),
                                F.col("dst"),
                            )
                        ).alias("h"),
                        F.col("dst"),
                        F.col("src"),
                    )
                ).alias("pick")
            )
            .select(
                "walk_key",
                F.col("pick.dst").alias("vertex"),
                F.col("pick.src").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out.append(nxt.select("walk_key", F.lit(step).alias("step"), "vertex"))
        cur = nxt
    return reduce(DataFrame.unionByName, out)


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Ordered (center, context, cnt) skip-gram pairs within ``window``
    positions of each walk, counted over the corpus."""
    a = walks.select("walk_key", F.col("step").alias("i"), F.col("vertex").alias("center"))
    b = walks.select("walk_key", F.col("step").alias("j"), F.col("vertex").alias("context"))
    return (
        a.join(b, "walk_key")
        .where(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").alias("cnt"))
    )

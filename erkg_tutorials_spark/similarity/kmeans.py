"""In-engine spherical k-means for IVF centroid training.

The reference's ANN path builds its own index (LanceDB,
/root/reference/dagster_icij/assets.py:126-128); the Spark-native
equivalent trains IVF centroids in-engine. Design constraints:

* **Deterministic, RNG-free**: seeds are the k vectors with the
  smallest ``md5(vec_id)`` — a data-derived pseudo-random draw that
  any engine can replay bit-for-bit (VERDICT round 1, task 5). Lloyd
  iterations are pure DataFrame aggregations, so the whole training
  run is replayable as unrolled SQL (`kmeans_iterations_sql`) and the
  downstream IVF query keeps its full DuckDB oracle.
* **Distributed end-to-end**: centroids stay a (tiny) DataFrame —
  broadcast into the assignment join each round, re-aggregated
  elementwise via posexplode → groupBy(cell, pos) → avg → sorted
  regroup. No driver-side centroid state, no ``collect``.
* **Scale shape**: per iteration one broadcast join over the corpus
  (map-side) + one shuffle keyed by (cell, dim) — k·d tiny rows.
  ``localCheckpoint`` per round keeps the plan tree flat (same
  rationale as graph/pagerank.py).

Engine-parity notes: assignment ranks on the 6dp-ROUNDED cosine with
centroid id as tiebreak (ulp-stable across engines, same pattern as
similarity/ivf.py); centroid means are plain double ``avg`` whose
last-ulp order sensitivity is absorbed by the rounding at every
consumer (all downstream cosines round to 6dp before any decision).
Empty cells simply vanish (both engines drop them identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.similarity.knn import _as_double, _dot, argmax_one

# Instrumentation: one (k, iters) entry per training run this process
# has started. Training is index CONSTRUCTION — every registry query
# must serve off the per-(session, sf_dir) memoized centroids
# (plans/vectorq.ivf_centroids_cached, plans/coverage's cosine-join
# cells), so a sweep that trains the same configuration twice is a
# memo-sharing regression. tests/test_memo.py::test_ann_training_shared
# pins it (r10 VERDICT item 5).
TRAINING_LOG: list[tuple[int, int]] = []


def kmeans_cosine(
    vectors: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train k spherical-k-means centroids; returns (cent_id, cvec).

    ``cent_id`` is the seed's rank in md5 order (0-based, stable);
    cells that lose all members drop out of the result.
    """
    from erkg_tutorials_spark.graph.ckpt import CheckpointChain

    TRAINING_LOG.append((k, iters))
    chain = CheckpointChain()  # rolling centroid state; v is invariant
    v = vectors.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("emb")
    ).withColumn("vn", F.sqrt(_dot("emb", "emb")))
    # the assignment crossJoin's parallelism is v's partition count,
    # and a single-file parquet corpus checkpoints into a handful of
    # partitions — at the 100x notch the k·N distance pass (448 cells
    # x 200k vectors) ran as 13 tasks with one straggler on 32 cores
    # (r12). Spread the invariant table across the cluster's
    # parallelism once, before pinning it.
    v = v.repartition(
        vectors.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint(eager=True)

    # seeds = the k rows with the smallest (md5(vec_id), vec_id). The
    # former global Window.orderBy ranked the ENTIRE corpus through a
    # single-partition sort — a one-task bottleneck at scale. An
    # orderBy().limit(k) is a distributed TakeOrderedAndProject
    # (per-partition top-k, tiny driver merge), and the row_number
    # that assigns cent_id then runs over k rows only; the k smallest
    # rows' rank among themselves IS their global rank, so cent_id is
    # unchanged (guide §2.4 — remove the shuffle outright).
    seed_w = Window.orderBy("_h", "vec_id")
    cent = (
        v.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .select("_h", "vec_id", "emb")
        .orderBy("_h", "vec_id")
        .limit(k)
        .withColumn("cent_id", F.row_number().over(seed_w) - F.lit(1))
        .select("cent_id", F.col("emb").alias("cvec"))
    )

    for _ in range(iters):
        cent = cent.withColumn("cn", F.sqrt(_dot("cvec", "cvec")))
        # argmax cos (tie: min cent_id) as a min-struct aggregation
        # rather than a row_number window: the k-fold assignment fan
        # partial-aggregates map-side before the exchange and no
        # per-partition sort runs (guide §2.3) — (cos, cent_id) is
        # unique per vec_id, so the winner is exactly the window's
        # row 1.
        assigned = argmax_one(
            v.crossJoin(F.broadcast(cent)).withColumn(
                "cos",
                F.round(_dot("emb", "cvec") / (F.col("vn") * F.col("cn")), 6),
            ),
            keys=["vec_id"],
            score="cos",
            tie="cent_id",
            payload=["cent_id", "emb"],
        ).select(F.col("cent_id").alias("cell"), "emb")
        # elementwise mean: explode to (cell, pos, val), aggregate, and
        # regroup in position order — collect_list alone is
        # order-nondeterministic, the sort_array over (pos, val)
        # structs restores a canonical order before reassembly
        cent = (
            assigned.select("cell", F.posexplode("emb").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, m))), s -> s.m)"
                ).alias("cvec")
            )
            .select(F.col("cell").alias("cent_id"), "cvec")
        )
        cent = chain(cent)
    return cent


def kmeans_iterations_sql(*, k: "int | str", iters: int) -> str:
    """DuckDB CTE chain replaying `kmeans_cosine` over a pre-existing
    ``v(vec_id, emb, vn)`` CTE (emb DOUBLE[], vn = l2 norm). Final CTE
    is ``cent{iters}(cent_id, cvec)``. ``k`` may be an int literal or
    a SQL scalar expression (e.g. the data-derived cell count,
    plans/vectorq.K_CELLS_SQL) — it is spliced into the seed QUALIFY.
    """
    parts = [
        f"""
    cent0 AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cent_id,
             emb AS cvec
      FROM v
      QUALIFY cent_id < {k}
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    a{i} AS MATERIALIZED (
      SELECT vec_id, emb, cell FROM (
        SELECT v.vec_id, v.emb, c.cent_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY ROUND(list_dot_product(v.emb, c.cvec)
                   / (v.vn * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC,
                 c.cent_id
               ) AS rn
        FROM v CROSS JOIN cent{i - 1} c
      ) s WHERE rn = 1
    ),
    x{i} AS MATERIALIZED (
      SELECT cell, unnest(emb) AS val, unnest(range(1, len(emb) + 1)) AS pos
      FROM a{i}
    ),
    cent{i} AS MATERIALIZED (
      SELECT cell AS cent_id, list(m ORDER BY pos) AS cvec FROM (
        SELECT cell, pos, AVG(val) AS m FROM x{i} GROUP BY cell, pos
      ) g GROUP BY cell
    )""")
    return ",".join(parts)

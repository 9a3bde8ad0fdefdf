"""IVF-style approximate nearest neighbor search.

The scale path for similarity search (SURVEY.md north star): partition
the corpus into Voronoi cells around centroids, probe only the nprobe
nearest cells per query, exact-rerank inside them. The expensive
corpus×queries cross product shrinks to corpus×centroids (one-time,
parallel) + queries×centroids (tiny) + per-cell rerank.

Centroids here are caller-provided (deterministic subsampling in the
registered query; k-means initialization would slot in the same way —
the operator contract is just a (cent_id, vector) DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.similarity.knn import _as_double, _dot, argmax_one


def _cos(a: str, b: str):
    return F.round(_dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 6)


def _cos_pre(a: str, b: str, an: str, bn: str):
    """Cosine with precomputed norms — one fold per pair instead of
    three; numerically identical (same in-order folds and double ops)."""
    return F.round(_dot(a, b) / (F.col(an) * F.col(bn)), 6)


def ivf_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell): nearest-centroid Voronoi assignment.

    Index construction — broadcast centroids, one row_number per
    vector; the corpus shuffles only on vec_id for the argmax window.
    Factored out of cosine_knn_ivf so IVF-PQ can route its code table
    through the same cells.
    """
    v = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("emb")
    ).withColumn("vn", F.sqrt(_dot("emb", "emb")))
    cent = centroids.select(
        F.col(id_col).alias("cent_id"), _as_double(vec_col).alias("cvec")
    ).withColumn("cn", F.sqrt(_dot("cvec", "cvec")))
    # nearest centroid as a min-struct aggregation (partial-agged
    # map-side, no sort) instead of a row_number window — guide §2.3;
    # (cos, cent_id) unique per vec_id makes it the same winner.
    return argmax_one(
        v.crossJoin(F.broadcast(cent)).withColumn(
            "cos", _cos_pre("emb", "cvec", "vn", "cn")
        ),
        keys=["vec_id"],
        score="cos",
        tie="cent_id",
        payload=["cent_id"],
    ).select("vec_id", F.col("cent_id").alias("cell"))


def ivf_probes(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cell): the nprobe nearest cells per query."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", F.sqrt(_dot("qv", "qv")))
    cent = centroids.select(
        F.col(id_col).alias("cent_id"), _as_double(vec_col).alias("cvec")
    ).withColumn("cn", F.sqrt(_dot("cvec", "cvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    return (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cos", _cos_pre("qv", "cvec", "qn", "cn"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("query_id", F.col("cent_id").alias("cell"))
    )


def cosine_knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors per query, probing nprobe cells.

    Deterministic ordering: cosines rounded to 6dp before ranking,
    ties broken by id — matches the DuckDB oracle bit-for-bit.
    """
    v = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("emb")
    ).withColumn("vn", F.sqrt(_dot("emb", "emb")))
    cent = centroids.select(
        F.col(id_col).alias("cent_id"), _as_double(vec_col).alias("cvec")
    ).withColumn("cn", F.sqrt(_dot("cvec", "cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", F.sqrt(_dot("qv", "qv")))

    # cell assignment: nearest centroid per corpus vector (broadcast
    # cent); min-struct argmax, not a window — see ivf_cells
    assigned = argmax_one(
        v.crossJoin(F.broadcast(cent)).withColumn(
            "cos", _cos_pre("emb", "cvec", "vn", "cn")
        ),
        keys=["vec_id"],
        score="cos",
        tie="cent_id",
        payload=["cent_id", "emb", "vn"],
    ).select("vec_id", F.col("cent_id").alias("cell"), "emb", "vn")

    # probe the nprobe nearest centroids per query
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cos", _cos_pre("qv", "cvec", "qn", "cn"))
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= nprobe)
        .select("query_id", F.col("cent_id").alias("cell"), "qv", "qn")
    )

    # exact rerank inside probed cells only
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        probes.join(assigned, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos_pre("qv", "emb", "qn", "vn").alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= k)
    )

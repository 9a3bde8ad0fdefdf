"""Vector similarity query surface over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import load_tables
from erkg_tutorials_spark.similarity.knn import cosine_knn_bruteforce

QUERIES: dict = {}
ORACLES: dict = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


N_QUERY_VECS = 10
TOP_K = 5


@register(
    "knn_cosine_bruteforce",
    f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, emb AS qv FROM v WHERE vec_id < {N_QUERY_VECS}),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             ROUND(
               list_dot_product(v.emb, q.qv)
               / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(q.qv, q.qv))),
             6) AS cosine
      FROM v CROSS JOIN q
      WHERE v.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    return cosine_knn_bruteforce(
        corpus=emb,
        queries=emb.where(F.col("vec_id") < N_QUERY_VECS),
        k=TOP_K,
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: deterministic centroids → cell assignment → nprobe
# probing → exact rerank within probed cells (the scale path: the
# cross product shrinks from |corpus| to |probed cells|)
# ---------------------------------------------------------------------------
CENTROID_STRIDE = 101
IVF_NPROBE = 2
IVF_QUERIES = 5
IVF_K = 3

_IVF_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, emb AS cvec FROM v WHERE vec_id % {CENTROID_STRIDE} = 0),
    assign_scored AS (
      SELECT v.vec_id, c.cent_id,
             ROUND(list_dot_product(v.emb, c.cvec)
               / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS cos,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY ROUND(list_dot_product(v.emb, c.cvec)
               / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC, c.cent_id) AS rn
      FROM v CROSS JOIN cent c
    ),
    assigned AS (SELECT vec_id, cent_id AS cell FROM assign_scored WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, emb AS qv FROM v WHERE vec_id < {IVF_QUERIES}),
    probe_scored AS (
      SELECT q.query_id, c.cent_id,
             ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY ROUND(list_dot_product(q.qv, c.cvec)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC, c.cent_id) AS rn
      FROM q CROSS JOIN cent c
    ),
    probes AS (SELECT query_id, cent_id AS cell FROM probe_scored WHERE rn <= {IVF_NPROBE}),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assigned a ON a.cell = p.cell
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             ROUND(list_dot_product(vq.emb, vn.emb)
               / (sqrt(list_dot_product(vq.emb, vq.emb)) * sqrt(list_dot_product(vn.emb, vn.emb))), 6) AS cosine
      FROM cand c
      JOIN v vq ON vq.vec_id = c.query_id
      JOIN v vn ON vn.vec_id = c.neighbor_id
      WHERE c.neighbor_id <> c.query_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {IVF_K}
"""


@register("knn_cosine_ivf", _IVF_ORACLE)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from erkg_tutorials_spark.similarity.ivf import cosine_knn_ivf

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    return cosine_knn_ivf(
        corpus=emb,
        queries=emb.where(F.col("vec_id") < IVF_QUERIES),
        centroids=emb.where(F.col("vec_id") % CENTROID_STRIDE == 0),
        nprobe=IVF_NPROBE,
        k=IVF_K,
    )

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

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
    """Brute-force cosine top-k neighbors per query vector via a JVM dot-product fold."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    return cosine_knn_bruteforce(
        corpus=emb,
        queries=emb.where(F.col("vec_id") < N_QUERY_VECS),
        k=TOP_K,
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: in-engine trained k-means centroids → cell assignment
# → nprobe probing → exact rerank within probed cells (the scale path:
# the cross product shrinks from |corpus| to |probed cells|). The
# oracle replays the deterministic hash-seeded Lloyd iterations as an
# unrolled CTE chain (similarity/kmeans.py), so centroid training is
# itself under the hash-match gate.
# ---------------------------------------------------------------------------
#   cells ~ sqrt(N) (r9 VERDICT item 4): 45 ~ sqrt(2000), the sf0.1
#   embeddings count — the FAISS/IVF rule of thumb that keeps both the
#   centroid scan (k rows) and the probed fraction (nprobe/k of the
#   corpus) sublinear. nprobe=4 of 45 cells scans ~9% of the corpus
#   (vs the old 8-cell setup where nprobe=2 scanned a quarter);
#   measured recall@10 table in SCALING.md, floors in
#   tests/test_scale_ops.py::test_ann_recall_floors.
#
#   r12: the cell count now FOLLOWS the sqrt(N) rule on both engines
#   instead of freezing its sf0.1 instantiation — the 100x recall
#   panel caught the frozen 45 degrading IVF recall to 0.80 at a
#   200k-vector planted-cluster corpus (45 cells over 2000 planted
#   clusters leaves ~44 clusters per cell; the 4-probe set can no
#   longer isolate a query's own cluster). k(n) = max(KMEANS_K,
#   ceil(sqrt(n))): the floor keeps every corpus up to sqrt-inverse
#   of 45 (n <= 2025 — all driver test scales AND the sf0.1-size
#   clustered recall corpus) bit-identical to the r9-r11 recordings;
#   the sqrt arm makes index construction data-derived exactly like
#   the r11 rerank depth one screen below (same CEIL(SQRT) cross-
#   engine-exactness argument).
KMEANS_K = 45  # cell-count floor; effective k = kmeans_cells_for(...)
KMEANS_ITERS = 3
IVF_NPROBE = 4
IVF_QUERIES = 5
IVF_K = 3

# the SQL twin of kmeans_cells_for — evaluated against the same v CTE
# the training chain reads, so both engines derive the same k from
# the same table (see PQ_RERANK_SQL for the CEIL(SQRT) exactness note)
K_CELLS_SQL = (
    f"(SELECT GREATEST({KMEANS_K}, "
    "CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) FROM v)"
)


# nprobe keeps the PROBED FRACTION of cells constant as the cell
# count scales: nprobe(k) = ceil(IVF_NPROBE * k / KMEANS_K) (~9% of
# cells, the shipped 4-of-45 ratio). The r12 100x recall panel forced
# this: scaling cells alone (45 -> 448 at the 200k planted corpus)
# shrank the probed fraction 10x and DROPPED recall 0.80 -> 0.73;
# probing a constant fraction restores it while the per-query scan
# stays ~nprobe/k * N. Cross-engine exactness: 4k/45 at integer k is
# either an exact double (4k = 45m divides out) or >= 1/45 from an
# integer — far outside one ulp — so CEIL agrees with the integer
# ceiling below.
NPROBE_SQL = (
    f"(SELECT CAST(CEIL({IVF_NPROBE}.0 * GREATEST({KMEANS_K}, "
    f"CEIL(SQRT(COUNT(*)))) / {KMEANS_K}) AS BIGINT) FROM v)"
)


def ivf_nprobe_for(spark: SparkSession, sf_dir: str) -> int:
    """ceil(IVF_NPROBE * cells / KMEANS_K) — constant probed fraction
    (= IVF_NPROBE at every corpus the KMEANS_K floor governs)."""
    k = kmeans_cells_for(spark, sf_dir)
    return (IVF_NPROBE * k + KMEANS_K - 1) // KMEANS_K


def kmeans_cells_for(spark: SparkSession, sf_dir: str) -> int:
    """max(KMEANS_K, ceil(sqrt(|embeddings|))) — the IVF cell count,
    memoized per (application, sf_dir); the count is parquet-metadata
    cheap."""
    import math

    from erkg_tutorials_spark.plans.memo import memoized_scalar

    return memoized_scalar(
        spark,
        sf_dir,
        "kmeans_cells",
        lambda: max(
            KMEANS_K,
            math.ceil(
                math.sqrt(load_tables(spark, sf_dir)["embeddings"].count())
            ),
        ),
        plan_only_default=KMEANS_K,
    )


def _kmeans_cent_cte() -> str:
    from erkg_tutorials_spark.similarity.kmeans import kmeans_iterations_sql

    return (
        """
    WITH v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vn
      FROM embeddings
    ),"""
        + kmeans_iterations_sql(k=K_CELLS_SQL, iters=KMEANS_ITERS)
        + f""",
    cent AS MATERIALIZED (SELECT cent_id, cvec FROM cent{KMEANS_ITERS}),"""
    )


_IVF_ORACLE = _kmeans_cent_cte() + f"""
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
    probes AS (SELECT query_id, cent_id AS cell FROM probe_scored WHERE rn <= {NPROBE_SQL}),
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


def ivf_centroids_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF centroids, memoized per (application, sf_dir).

    k-means training is index *construction*, not query execution —
    the trained centroids are loop-invariant for a given dataset, the
    exact analogue of the reference building its LanceDB index once
    (/root/reference/dagster_icij/assets.py:126-128) and querying it
    many times. Memoizing under plans/memo.py moves the training cost
    into the bench's shared_materializations entry while the
    deterministic training (hash-seeded Lloyd) keeps the full DuckDB
    oracle bit-identical.
    """
    from erkg_tutorials_spark.plans.memo import memoized
    from erkg_tutorials_spark.similarity.kmeans import kmeans_cosine

    return memoized(
        spark,
        sf_dir,
        "ivf_centroids",
        lambda: kmeans_cosine(
            load_tables(spark, sf_dir)["embeddings"],
            k=kmeans_cells_for(spark, sf_dir),
            iters=KMEANS_ITERS,
        ),
    )


@register("knn_cosine_ivf", _IVF_ORACLE)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: nearest-centroid cell probing before in-cell cosine ranking."""
    from erkg_tutorials_spark.similarity.ivf import cosine_knn_ivf

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    cent = ivf_centroids_cached(spark, sf_dir)
    return cosine_knn_ivf(
        corpus=emb,
        queries=emb.where(F.col("vec_id") < IVF_QUERIES),
        centroids=cent.select(
            F.col("cent_id").alias("vec_id"), F.col("cvec").alias("embedding")
        ),
        nprobe=ivf_nprobe_for(spark, sf_dir),
        k=IVF_K,
    )


# ---------------------------------------------------------------------------
# Approximate embedding near-dup: signed-random-projection LSH
# (dedup/embedding_lsh.py). The hyperplane sign vectors are inlined
# into BOTH plans, so the approximation itself — false negatives
# included — replays bit-for-bit and the oracle is a full hash match.
# ---------------------------------------------------------------------------
SRP_THRESHOLD = 0.5
SRP_DIM = 64


def _srp_oracle() -> str:
    from erkg_tutorials_spark.dedup.embedding_lsh import srp_oracle_sql

    return srp_oracle_sql(
        "SELECT vec_id, embedding FROM embeddings",
        threshold=SRP_THRESHOLD,
        dim=SRP_DIM,
    )


@register("dedup_embedding_lsh", _srp_oracle())
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via signed-random-projection LSH bucketing."""
    from erkg_tutorials_spark.dedup.embedding_lsh import srp_near_dup_pairs

    t = load_tables(spark, sf_dir)
    return srp_near_dup_pairs(
        t["embeddings"], threshold=SRP_THRESHOLD, dim=SRP_DIM
    )


# ---------------------------------------------------------------------------
# Higher-order-function vector stats: per-embedding L2 norm, mean,
# min/max element, computed entirely with SQL higher-order functions
# (F.aggregate / F.transform — JVM-side, codegen, no Python). Float
# accumulation order inside one array is left-to-right fold in BOTH
# engines (Spark aggregate ≡ DuckDB list_reduce on the same list), so
# the doubles match bit-for-bit; rounded to 6dp anyway.
# ---------------------------------------------------------------------------
@register(
    "vector_stats",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    )
    SELECT vec_id,
           ROUND(sqrt(list_reduce(list_transform(emb, x -> x * x),
                                  (a, b) -> a + b)), 6) AS l2_norm,
           ROUND(list_reduce(emb, (a, b) -> a + b) / len(emb), 6) AS mean_elem,
           ROUND(list_reduce(emb, (a, b) -> least(a, b)), 6) AS min_elem,
           ROUND(list_reduce(emb, (a, b) -> greatest(a, b)), 6) AS max_elem
    FROM v
    """,
)
def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column statistics: dimension, norm mean/extremes per vector group."""
    emb = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    zero = F.lit(0.0)
    return emb.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate(F.transform("emb", lambda x: x * x), zero, lambda a, b: a + b)),
            6,
        ).alias("l2_norm"),
        F.round(
            F.aggregate("emb", zero, lambda a, b: a + b) / F.size("emb"), 6
        ).alias("mean_elem"),
        F.round(F.array_min("emb"), 6).alias("min_elem"),
        F.round(F.array_max("emb"), 6).alias("max_elem"),
    )


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized ANN (the faiss-SQ8 pattern): per-dimension
# global [min,max] → 8-bit codes → integer-dot coarse scoring over the
# codes → exact float rerank of the top-C candidates only.
#
# Why this tier exists between bruteforce and IVF: the coarse pass
# reads 8× fewer bytes per vector (uint8 codes vs float64) and its dot
# products are exact INTEGER arithmetic — at 100 TB the scan is memory-
# bandwidth-bound, so byte width IS throughput; combine with IVF cells
# (codes within probed cells) for the full scale path. Candidate
# selection and rerank are both deterministic: integer dot products
# are exact, the only floats are the final cosine divisions, rounded
# to 6dp before ranking with id tie-breaks (house float-parity rule).
#
# The quantization grid (256 buckets, clamp 255, zero-width guard) is
# replayed verbatim by the oracle, so code assignment itself is under
# the hash gate.
# ---------------------------------------------------------------------------
SQ8_DIM = 64
SQ8_QUERIES = 5
SQ8_CAND = 10
SQ8_K = 3

_SQ8_ORACLE = f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    stats AS MATERIALIZED (
      SELECT list(mn ORDER BY d) AS mins, list(mx ORDER BY d) AS maxs
      FROM (
        SELECT d, MIN(emb[d]) AS mn, MAX(emb[d]) AS mx
        FROM v, UNNEST(generate_series(1, {SQ8_DIM})) AS t(d)
        GROUP BY d
      )
    ),
    coded AS MATERIALIZED (
      SELECT vec_id,
             emb,
             list_transform(generate_series(1, {SQ8_DIM}), i ->
               CASE WHEN maxs[i] = mins[i] THEN 0.0
                    ELSE CAST(least(255, CAST(floor(((emb[i] - mins[i])
                           / (maxs[i] - mins[i])) * 256.0) AS INT)) AS DOUBLE)
               END) AS code
      FROM v CROSS JOIN stats
    ),
    cn AS MATERIALIZED (
      SELECT vec_id, emb, code, list_dot_product(code, code) AS cnorm2,
             sqrt(list_dot_product(emb, emb)) AS en
      FROM coded
    ),
    q AS (SELECT vec_id AS query_id, emb AS qemb, code AS qcode,
                 cnorm2 AS qnorm2, en AS qen
          FROM cn WHERE vec_id < {SQ8_QUERIES}),
    coarse AS (
      SELECT q.query_id, c.vec_id AS neighbor_id, c.emb, q.qemb, c.en, q.qen,
             ROUND(list_dot_product(c.code, q.qcode)
                   / (sqrt(c.cnorm2) * sqrt(q.qnorm2)), 6) AS acos
      FROM cn c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    cand AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY acos DESC, neighbor_id) AS crank
      FROM coarse
    ),
    rerank AS (
      SELECT query_id, neighbor_id,
             ROUND(list_dot_product(emb, qemb) / (en * qen), 6) AS cosine
      FROM cand WHERE crank <= {SQ8_CAND}
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM rerank
    QUALIFY rank <= {SQ8_K}
    """


def sq8_grid_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row (mins, maxs) per-dimension quantization grid.

    Trained index state like the IVF centroids/PQ codebooks — memoized
    per (application, sf_dir) and persistable via
    similarity/index_store.py."""
    from erkg_tutorials_spark.plans.memo import memoized

    def build() -> DataFrame:
        v = load_tables(spark, sf_dir)["embeddings"].select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias("emb"),
        )
        return v.agg(
            F.array(*[F.min(F.col("emb")[i]) for i in range(SQ8_DIM)]).alias("mins"),
            F.array(*[F.max(F.col("emb")[i]) for i in range(SQ8_DIM)]).alias("maxs"),
        )

    return memoized(spark, sf_dir, "sq8_grid", build)


@register("knn_cosine_sq8", _SQ8_ORACLE)
def knn_cosine_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) cosine top-k with integer dot products and rescale."""
    from erkg_tutorials_spark.similarity.sq8 import cosine_knn_sq8

    emb = load_tables(spark, sf_dir)["embeddings"]
    return cosine_knn_sq8(
        corpus=emb,
        queries=emb.where(F.col("vec_id") < SQ8_QUERIES),
        grid=sq8_grid_cached(spark, sf_dir),
        dim=SQ8_DIM,
        cand=SQ8_CAND,
        k=SQ8_K,
    )


# ---------------------------------------------------------------------------
# Product quantization (similarity/pq.py): the third member of the
# quantization family. Codebook training + encoding are index
# construction — memoized per (application, sf_dir) like the IVF
# centroids, timed under the bench's shared_materializations entry.
# The oracle replays the ENTIRE pipeline (joint per-subspace Lloyd,
# encoding, integer ADC, exact rerank) as one CTE chain, so the
# approximation itself hash-matches bit-for-bit.
# ---------------------------------------------------------------------------
PQ_QUERIES = 5
PQ_RERANK = 50
PQ_K = 3

# sqrt(N)-scaled rerank (r11 VERDICT item 5): a FIXED shortlist depth
# caps recall by PQ code distortion as the corpus grows — at the
# sf0.1-size clustered corpus rerank=50 held ivfpq@4 at 0.85 while
# rerank=100 recovered 1.0; the candidate ADC ranking is good enough,
# the 50-cut just fell inside its distortion band. Scaling the depth
# with sqrt(N) (the same law as the r10 cell-count sizing) keeps the
# exact-rerank work |queries|·sqrt(N) — sublinear, broadcast-joined —
# while the distortion band's width relative to the shortlist shrinks.
# The SQL twin computes the same number from the same table; CEIL(
# SQRT(n)) agrees between engines for integral n (IEEE sqrt is
# correctly rounded and non-squares sit >= 1 away from squares, far
# outside a double ulp at any feasible corpus size).
PQ_RERANK_SQL = (
    f"GREATEST({PQ_RERANK}, "
    "CAST(CEIL(SQRT((SELECT COUNT(*) FROM v))) AS BIGINT))"
)


def pq_rerank_for(spark: SparkSession, sf_dir: str) -> int:
    """max(PQ_RERANK, ceil(sqrt(|embeddings|))) — memoized per
    (application, sf_dir); the count is parquet-metadata cheap."""
    import math

    from erkg_tutorials_spark.plans.memo import memoized_scalar

    return memoized_scalar(
        spark,
        sf_dir,
        "pq_rerank",
        lambda: max(
            PQ_RERANK,
            math.ceil(
                math.sqrt(load_tables(spark, sf_dir)["embeddings"].count())
            ),
        ),
        plan_only_default=PQ_RERANK,
    )


def pq_codebooks_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from erkg_tutorials_spark.plans.memo import memoized
    from erkg_tutorials_spark.similarity.pq import pq_train_codebooks

    return memoized(
        spark,
        sf_dir,
        "pq_codebooks",
        lambda: pq_train_codebooks(load_tables(spark, sf_dir)["embeddings"]),
    )


def pq_codes_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from erkg_tutorials_spark.plans.memo import memoized
    from erkg_tutorials_spark.similarity.pq import pq_encode

    return memoized(
        spark,
        sf_dir,
        "pq_codes",
        lambda: pq_encode(
            load_tables(spark, sf_dir)["embeddings"],
            pq_codebooks_cached(spark, sf_dir),
        ),
    )


def _pq_oracle() -> str:
    from erkg_tutorials_spark.similarity.pq import pq_sql

    return (
        """
    WITH v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),"""
        + pq_sql(n_queries=PQ_QUERIES, rerank=PQ_RERANK_SQL, k=PQ_K)
    )


@register("knn_cosine_pq", _pq_oracle())
def knn_cosine_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k: integer asymmetric-distance scoring over 8-byte
    codes, exact rerank of the top-RERANK candidates. At 100 TB this
    layers under the IVF router (scan only probed cells' code lists);
    flat here to keep the registry query single-purpose."""
    from erkg_tutorials_spark.similarity.pq import cosine_knn_pq

    emb = load_tables(spark, sf_dir)["embeddings"]
    return cosine_knn_pq(
        corpus=emb,
        queries=emb.where(F.col("vec_id") < PQ_QUERIES),
        codebooks=pq_codebooks_cached(spark, sf_dir),
        codes=pq_codes_cached(spark, sf_dir),
        rerank=pq_rerank_for(spark, sf_dir),
        k=PQ_K,
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the faiss production composition — route each query to its
# nprobe nearest k-means cells, ADC-score ONLY the codes of vectors
# living in those cells, exact-rerank the survivors. Per query the
# scored code volume drops from |corpus| to |probed cells|, and the
# scoring itself never touches a full-precision corpus vector — the
# two reductions multiply, which is why a 100 TB vector store is
# IVF-PQ and not either half alone. Centroids, cell assignment,
# codebooks, and codes are all index construction: memoized per
# (application, sf_dir), timed under shared_materializations.
# The oracle replays the ENTIRE composition — k-means training,
# Voronoi assignment, probe routing, joint PQ training, encoding,
# cell-filtered integer ADC, exact rerank — as one CTE chain.
# ---------------------------------------------------------------------------
def ivf_cells_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from erkg_tutorials_spark.plans.memo import memoized
    from erkg_tutorials_spark.similarity.ivf import ivf_cells

    return memoized(
        spark,
        sf_dir,
        "ivf_cells",
        lambda: ivf_cells(
            load_tables(spark, sf_dir)["embeddings"],
            ivf_centroids_cached(spark, sf_dir).select(
                F.col("cent_id").alias("vec_id"), F.col("cvec").alias("embedding")
            ),
        ),
    )


def _ivfpq_oracle() -> str:
    from erkg_tutorials_spark.similarity.pq import pq_sql

    return (
        _kmeans_cent_cte()
        + f"""
    assign_scored AS (
      SELECT v.vec_id, c.cent_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY ROUND(list_dot_product(v.emb, c.cvec)
               / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC, c.cent_id) AS rn
      FROM v CROSS JOIN cent c
    ),
    assigned AS (SELECT vec_id, cent_id AS cell FROM assign_scored WHERE rn = 1),
    probe_scored AS (
      SELECT v.vec_id AS query_id, c.cent_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY ROUND(list_dot_product(v.emb, c.cvec)
               / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC, c.cent_id) AS rn
      FROM v CROSS JOIN cent c
      WHERE v.vec_id < {PQ_QUERIES}
    ),
    probes AS (SELECT query_id, cent_id AS cell FROM probe_scored WHERE rn <= {NPROBE_SQL}),
    ivf_cand AS (
      SELECT p.query_id, a.vec_id
      FROM probes p JOIN assigned a ON a.cell = p.cell
    ),"""
        + pq_sql(
            n_queries=PQ_QUERIES,
            rerank=PQ_RERANK_SQL,
            k=PQ_K,
            candidate_cte="ivf_cand",
        )
    )


@register("knn_cosine_ivfpq", _ivfpq_oracle())
def knn_cosine_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k: probe the scaled nprobe cell set, integer-ADC only the
    probed cells' codes, exact-rerank the candidate shortlist."""
    from erkg_tutorials_spark.similarity.ivf import ivf_probes
    from erkg_tutorials_spark.similarity.pq import cosine_knn_pq

    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.where(F.col("vec_id") < PQ_QUERIES)
    cent = ivf_centroids_cached(spark, sf_dir).select(
        F.col("cent_id").alias("vec_id"), F.col("cvec").alias("embedding")
    )
    probes = ivf_probes(queries, cent, nprobe=ivf_nprobe_for(spark, sf_dir))
    candidates = probes.join(ivf_cells_cached(spark, sf_dir), "cell").select(
        "query_id", "vec_id"
    )
    return cosine_knn_pq(
        corpus=emb,
        queries=queries,
        codebooks=pq_codebooks_cached(spark, sf_dir),
        codes=pq_codes_cached(spark, sf_dir),
        rerank=pq_rerank_for(spark, sf_dir),
        k=PQ_K,
        candidates=candidates,
    )


# ---------------------------------------------------------------------------
# Cluster-balanced curation sample (the SemDeDup/DataComp curation
# move, public papers: Abbas et al. 2023; Gadre et al. 2023): assign
# every embedding to its nearest trained k-means centroid, then cap
# each cluster at a fixed quota chosen by a deterministic hash rank —
# trimming over-represented (near-duplicate-dense) semantic regions
# while keeping sparse regions intact. Output is the per-cluster
# manifest (n_total, n_kept, kept-set fingerprint), the shape a shard
# writer consumes. Reuses the SAME memoized centroids as the IVF
# family, so training cost is shared and the unrolled Lloyd CTE keeps
# the whole pipeline under the full hash oracle.
# Scale notes (100 TB): assignment is a broadcast(centroids) argmax —
# map-side; the quota is a per-cluster row_number window (shuffle on
# cell). A pathologically dominant cluster would make that window's
# sort wide — at that scale swap the exact rank for a hash-threshold
# keep (skey < quota/n_total quantile), which is shuffle-free; the
# exact rank is kept here because the manifest fingerprint must be
# deterministic for the oracle gate.
# ---------------------------------------------------------------------------
# 8 per cell under the r10 sqrt(N) clustering (45 cells): the sf0.01
# corpus averages ~11 vectors/cell, so the quota genuinely binds on
# the dense cells at every test scale (the r9 value of 40 was sized
# for 8 coarse cells and stopped binding when the cells got finer —
# caught by test_r9_ops.py::TestCurationSample)
CURATION_QUOTA = 8

_CURATION_ORACLE = _kmeans_cent_cte() + f"""
    assign_scored AS (
      SELECT v.vec_id, c.cent_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY ROUND(list_dot_product(v.emb, c.cvec)
               / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC, c.cent_id) AS rn
      FROM v CROSS JOIN cent c
    ),
    assigned AS (SELECT vec_id, cent_id AS cell FROM assign_scored WHERE rn = 1),
    keyed AS (
      SELECT cell, vec_id,
             CAST(('0x' || substr(md5('sample:' || CAST(vec_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS skey
      FROM assigned
    ),
    ranked AS (
      SELECT cell, skey,
             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY skey, vec_id) AS rk
      FROM keyed
    )
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN rk <= {CURATION_QUOTA} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(bit_xor(CASE WHEN rk <= {CURATION_QUOTA} THEN skey ELSE 0 END) AS BIGINT) AS kept_fp
    FROM ranked GROUP BY cell
"""


@register("curation_cluster_sample", _CURATION_ORACLE)
def curation_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus subsample: nearest-centroid assignment, per-cluster hash-rank quota, per-cluster kept-set manifest."""
    from pyspark.sql import Window
    from erkg_tutorials_spark.similarity.ivf import ivf_cells

    emb = load_tables(spark, sf_dir)["embeddings"]
    cent = ivf_centroids_cached(spark, sf_dir)
    cells = ivf_cells(
        emb,
        cent.select(
            F.col("cent_id").alias("vec_id"), F.col("cvec").alias("embedding")
        ),
    )
    keyed = cells.select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.expr(
            "CAST(conv(substr(md5(concat('sample:', CAST(vec_id AS STRING))),"
            " 1, 15), 16, 10) AS BIGINT)"
        ).alias("skey"),
    )
    w = Window.partitionBy("cell").orderBy("skey", "vec_id")
    ranked = keyed.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(F.col("rk") <= CURATION_QUOTA, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.expr(f"bit_xor(CASE WHEN rk <= {CURATION_QUOTA} THEN skey ELSE 0 END)")
        .cast("long")
        .alias("kept_fp"),
    )

"""Persistent vector-index artifacts (S11 parity).

The reference persists its vector KB to a LanceDB uri and reloads it
across processes (/root/reference/dagster_icij/assets.py:126-128,
tutorial.ipynb:164-167 (cell 8)). The Spark-native equivalent: every
piece of *trained* index state — IVF k-means centroids, the Voronoi
cell assignment, PQ codebooks, PQ codes, the SQ8 quantization grid —
is an ordinary DataFrame, so the persistence format is Parquet, one
directory per artifact, plus a one-row ``_manifest`` Parquet recording
the training hyperparameters.

``save_index`` materializes each artifact from its session memo
(training it on first touch) and writes it out; ``load_index`` reads
the Parquet back, verifies the manifest against the current module
constants (a silently different K would make loaded cells
inconsistent with freshly routed probes), and installs each table
into the session memo slot the cached getters consult — after a load,
``knn_cosine_ivf`` / ``knn_cosine_pq`` / ``knn_cosine_ivfpq`` /
``knn_cosine_sq8`` all run from the loaded state with zero retraining.

Scale notes: every artifact is small relative to the corpus (centroids
K rows, codebooks M·k_sub rows, grid 1 row; cells/codes are one narrow
row per corpus vector, written with the same parallelism they were
computed with). ``path`` may be any Hadoop-compatible URI (s3a://,
hdfs://) — everything goes through ``DataFrameWriter``/``Reader``, no
driver-local filesystem I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Artifact name -> fully-lazy cached getter. Names double as the memo
# keys and the sub-directory names under the index path.
ARTIFACTS = ("ivf_centroids", "ivf_cells", "pq_codebooks", "pq_codes", "sq8_grid")

_FORMAT_VERSION = 1


def _getters(spark: SparkSession, sf_dir: str) -> dict:
    from erkg_tutorials_spark.plans import vectorq as vq

    return {
        "ivf_centroids": lambda: vq.ivf_centroids_cached(spark, sf_dir),
        "ivf_cells": lambda: vq.ivf_cells_cached(spark, sf_dir),
        "pq_codebooks": lambda: vq.pq_codebooks_cached(spark, sf_dir),
        "pq_codes": lambda: vq.pq_codes_cached(spark, sf_dir),
        "sq8_grid": lambda: vq.sq8_grid_cached(spark, sf_dir),
    }


def index_params() -> dict:
    """The hyperparameters the persisted state was trained under.

    Stored in the manifest and re-checked on load: state trained with
    a different K / M / grid width is not interchangeable, and a
    mismatch must fail loudly rather than silently skew results.
    """
    from erkg_tutorials_spark.plans import vectorq as vq
    from erkg_tutorials_spark.similarity import pq

    return {
        "format_version": _FORMAT_VERSION,
        "kmeans_k": vq.KMEANS_K,
        "kmeans_iters": vq.KMEANS_ITERS,
        "pq_m": pq.PQ_M,
        "pq_ksub": pq.PQ_KSUB,
        "pq_iters": pq.PQ_ITERS,
        "sq8_dim": vq.SQ8_DIM,
    }


def save_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Train (or reuse the session-memoized) index state and persist
    every artifact as Parquet under ``path``."""
    getters = _getters(spark, sf_dir)
    for name in ARTIFACTS:
        getters[name]().write.mode("overwrite").parquet(f"{path}/{name}")
    manifest = spark.createDataFrame([index_params()])
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")


def load_index(spark: SparkSession, sf_dir: str, path: str) -> dict[str, DataFrame]:
    """Load persisted index state and install it into the session memo.

    Returns {artifact_name: DataFrame}. Raises ValueError if the
    manifest's training parameters differ from the current constants.
    """
    from erkg_tutorials_spark.plans.memo import install

    stored = spark.read.parquet(f"{path}/_manifest").first().asDict()
    expected = index_params()
    mismatched = {
        k: (stored.get(k), v) for k, v in expected.items() if stored.get(k) != v
    }
    if mismatched:
        raise ValueError(
            f"persisted index at {path!r} was trained under different "
            f"parameters: {mismatched} (stored, expected)"
        )
    loaded = {}
    for name in ARTIFACTS:
        loaded[name] = install(
            spark, sf_dir, name, spark.read.parquet(f"{path}/{name}")
        )
    return loaded

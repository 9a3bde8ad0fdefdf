"""Dedup last mile: near-dup pairs → clusters → canonical assignment.

MinHash/SimHash/cosine tiers emit *pairs* (id_a, id_b, score); an
actual dedup pass must decide which rows to keep. Near-duplication is
not transitive, so the standard resolution is transitive closure over
the pair graph — connected components — then keep one canonical doc
per component (min id: deterministic, stable under re-runs).

At 100 TB: the pair set is tiny relative to the corpus (that's the
point of LSH blocking), so components run on pairs only; the final
keep/drop verdict is one broadcast-or-shuffle join back onto the
corpus. No full-corpus pairwise work anywhere.

One exception to "pairs are tiny": a byte-identical duplicate FLOOD,
whose pair set is d(d-1)/2 by contract. For that shape use the
composed flood-safe path ``dedup.minhash.minhash_lsh_cluster_assign``
(exact-hash collapse → rep-level pairs → components → members inherit
the rep's component): identical verdicts to ``dedup_assign`` over the
expanded pairs, O(d) rows end to end. The image tier routes the same
way (``dedup/phash.py`` pairs → :func:`dedup_assign`, flood test in
tests/test_phash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erkg_tutorials_spark.graph.connected_components import connected_components


def assign_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """(id, cluster) for every id appearing in a near-dup pair; cluster
    is the component's minimum id."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    return connected_components(edges).withColumnRenamed("component", "cluster")


def dedup_assign(
    corpus: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """corpus + (cluster, is_canonical): every doc keeps its cluster id
    (its own id when it has no near-dup) and a keep/drop verdict —
    ``is_canonical`` is true for exactly one doc per cluster."""
    # rename the cluster table's id before joining so a corpus whose
    # id_col is literally "id" doesn't collide (drop-by-name would
    # remove both columns)
    clusters = assign_clusters(pairs).withColumnRenamed("id", "__cid")
    return (
        corpus.join(clusters, corpus[id_col] == clusters["__cid"], "left")
        .drop("__cid")
        .withColumn("cluster", F.coalesce("cluster", F.col(id_col)))
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster"))
    )

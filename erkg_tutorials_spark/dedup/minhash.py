"""MinHash + LSH near-duplicate detection, pure DataFrame ops.

Pipeline: word k-shingles → per-doc MinHash signature (one md5-keyed
hash family per permutation) → band keys → self-join on band key to get
candidate pairs → exact Jaccard verification of candidates only.

Scale notes (the reason this shape wins at 100 TB):
- shingling/minhashing is embarrassingly parallel (no shuffle until the
  signature groupBy, whose key is the doc id — already the natural
  partitioning of a document table);
- the only pairwise work is the band-key self-join: docs collide only
  when a whole band of minhashes agrees, so the join fan-out is
  proportional to the number of true near-dups, not |docs|²;
- verification touches candidate pairs only.

The hash family is ``md5(f"{i}|" + shingle)`` with the *lexicographic*
min taken over hex digests — deterministic, seed-free, and computable
identically by any engine (this is what makes the DuckDB oracle able to
replay it bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Distinct word k-shingles per document: ``(id_col, shingle)``.

    Note: ``sequence(1, n)`` with n < 1 would generate a *descending*
    sequence in Spark, so short documents are guarded to an empty array.
    """
    toks = df.select(id_col, F.split(F.lower(F.col(text_col)), " ").alias("w"))
    sh = F.when(
        F.size("w") >= k,
        F.expr(f"transform(sequence(1, size(w) - {k} + 1), i -> array_join(slice(w, i, {k}), ' '))"),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    return toks.select(id_col, F.explode(sh).alias("shingle")).distinct()


def minhash_signature(
    shingled: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """Per-doc MinHash signature: columns ``h0..h{n-1}`` (hex strings)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a, id_b)`` via banded LSH.

    rows-per-band r = num_hashes // bands; two docs are candidates iff
    all r minhashes of some band agree (collision prob ≈ jaccard^r per
    band).
    """
    r = num_hashes // bands
    band_frames = []
    for b in range(bands):
        key = F.concat(*[F.col(f"h{b * r + j}") for j in range(r)])
        band_frames.append(
            signatures.select(
                F.col(id_col).alias("id"), F.lit(b).alias("band"), key.alias("bkey")
            )
        )
    banded = band_frames[0]
    for f in band_frames[1:]:
        banded = banded.unionByName(f)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs with exact Jaccard ≥ threshold, LSH-pruned.

    Returns ``(id_a, id_b, jaccard)`` with jaccard rounded to 6 decimals
    (intersection/union of exact shingle sets — integers, so the ratio
    is order-independent across engines).
    """
    # small-file scans arrive as one input partition; fan out so the
    # shingling/md5 CPU work uses every core (trivial shuffle: ids+text)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    sh = shingles(df, text_col, id_col, k).cache()
    sig = minhash_signature(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands)

    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    size_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    size_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(size_a, "id_a")
        .join(size_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

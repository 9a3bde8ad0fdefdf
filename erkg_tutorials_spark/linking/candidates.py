"""V2 — fuzzy alias candidate retrieval (ANN over alias strings).

Reference behavior (``kb.get_alias_candidates``, dev.ipynb cell 82):
a mention like "machine learn" retrieves the alias "machine learning"
— fuzzy string match, ranked by distance. LanceDB does this with a
vector index; the Spark-native equivalent is a character-n-gram
Jaccard similarity join, LSH-pruned so it never goes O(mentions ×
aliases) (SURVEY.md §2.10 V2 mapping).

Invariant (tested): an exact string match is always among its own
candidates (char-n-gram Jaccard 1.0 collides in every band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_ngrams(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct character n-grams of the lowercased, trimmed string
    (padded with boundary marks so short strings still shingle)."""
    padded = F.concat(F.lit("^"), F.lower(F.trim(F.col(text_col))), F.lit("$"))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(_padded) - {n} + 1, 1)), i -> substring(_padded, i, {n}))"
    )
    return (
        df.withColumn("_padded", padded)
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .where(F.length("gram") > 0)
        .distinct()
    )


def alias_candidates(
    mentions: DataFrame,
    aliases: DataFrame,
    mention_text: str = "text",
    mention_id: str = "mention_id",
    alias_text: str = "alias",
    num_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.4,
    n: int = 3,
) -> DataFrame:
    """(mention_id, alias, jaccard) candidate pairs.

    MinHash over char n-grams, banded LSH join (r = num_hashes/bands
    rows per band — r=2 keeps recall high for the short-string
    regime), then exact Jaccard verification of candidates only.
    """
    m_grams = char_ngrams(mentions, mention_text, mention_id).cache()
    a_grams = char_ngrams(
        aliases.select(F.col(alias_text).alias("_alias")).distinct(),
        "_alias",
        "_alias",
    ).cache()

    def signature(grams: DataFrame) -> DataFrame:
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("gram")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
        return grams.groupBy("id").agg(*aggs)

    r = num_hashes // bands

    def banded(sig: DataFrame) -> DataFrame:
        frames = []
        for b in range(bands):
            key = F.concat(*[F.col(f"h{b * r + j}") for j in range(r)])
            frames.append(sig.select("id", F.lit(b).alias("band"), key.alias("bkey")))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    cand = (
        banded(signature(m_grams))
        .withColumnRenamed("id", "mid")
        .join(banded(signature(a_grams)).withColumnRenamed("id", "aid"), ["band", "bkey"])
        .select("mid", "aid")
        .distinct()
    )

    sizes_m = m_grams.groupBy("id").agg(F.count("*").alias("n_m"))
    sizes_a = a_grams.groupBy("id").agg(F.count("*").alias("n_a"))
    m_g = m_grams.select(F.col("id").alias("mid"), "gram")
    a_g = a_grams.select(F.col("id").alias("aid"), "gram")
    inter = (
        cand.join(m_g, "mid")
        .join(a_g, ["aid", "gram"])
        .groupBy("mid", "aid")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes_m.withColumnRenamed("id", "mid"), "mid")
        .join(sizes_a.withColumnRenamed("id", "aid"), "aid")
        .withColumn(
            "jaccard", F.col("n_inter") / (F.col("n_m") + F.col("n_a") - F.col("n_inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("mid").alias(mention_id),
            F.col("aid").alias(alias_text),
            "jaccard",
        )
    )

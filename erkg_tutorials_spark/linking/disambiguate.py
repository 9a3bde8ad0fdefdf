"""V3/V4/W4 — entity disambiguation.

Reference semantics (``kb.get_entity_candidates`` +
``kb.disambiguate``, dev.ipynb cells 71-74): for each mention, expand
alias candidates to entity candidates via the alias→(entities,
probabilities) table, then pick the entity whose embedding is most
similar to the mention's document context embedding.

Spark shape: candidate expansion is an explode + join; scoring is a
JVM-side cosine; the argmax is a row_number window (W4). Ties break on
the V4 prior probability, then entity id — fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.linking.embed import cosine


def entity_candidates(candidates: DataFrame, alias_table: DataFrame) -> DataFrame:
    """V4: (mention_id, alias, entity_id, prior) — explode the alias
    table's parallel entities/probabilities arrays (R1)."""
    exploded = alias_table.select(
        "alias",
        F.explode(F.arrays_zip("entities", "probabilities")).alias("z"),
    ).select(
        "alias",
        F.col("z.entities").alias("entity_id"),
        F.col("z.probabilities").alias("prior"),
    )
    return candidates.join(exploded, "alias")


def disambiguate(
    candidates: DataFrame,
    mention_vecs: DataFrame,
    entity_vecs: DataFrame,
    mention_id: str = "mention_id",
) -> DataFrame:
    """W4 argmax: best entity per mention by cosine(context, entity),
    tie-broken by prior then entity_id. Returns one row per mention:
    (mention_id, kb_id, score, prior).
    """
    scored = (
        candidates.join(mention_vecs.withColumnRenamed("embedding", "mvec"), mention_id)
        .join(entity_vecs.withColumnRenamed("embedding", "evec"), "entity_id")
        .withColumn("score", cosine("mvec", "evec"))
    )
    w = Window.partitionBy(mention_id).orderBy(
        F.desc("score"), F.desc("prior"), F.asc("entity_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(mention_id, F.col("entity_id").alias("kb_id"), "score", "prior")
    )

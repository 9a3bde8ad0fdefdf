"""E3 — entity-linking inference pipeline (SURVEY.md §3 E3).

Reference flow (/root/reference/dagster_icij/assets.py:111-137 +
tutorial.ipynb cells 14-28): read KB artifacts → add self-aliases →
build ANN KB → NER ∘ linker ∘ textrank over the docs → review report
(analysis.py:7-37).

Spark flow, one lazy plan: documents ⟶ mentions (N3 ruler path — the
deterministic tier, mirroring dev.ipynb cell 114 which disables
statistical NER) ⟶ V2 candidate join ⟶ V3/W4 disambiguation ⟶
G5 phrases ⟶ review report (W1 + A3 + R1/R2 + F6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.linking.candidates import alias_candidates
from erkg_tutorials_spark.linking.disambiguate import disambiguate, entity_candidates
from erkg_tutorials_spark.linking.embed import embed_column
from erkg_tutorials_spark.text.phrase_match import match_phrases
from erkg_tutorials_spark.text.textrank import textrank_phrases


def with_self_aliases(aliases: DataFrame, entities: DataFrame) -> DataFrame:
    """U2 — every entity's own name as a probability-1 alias
    (reference assets.py:121-124, tutorial cells 7/16)."""
    self_aliases = entities.select(
        F.col("name").alias("alias"),
        F.array(F.col("entity_id")).alias("entities"),
        F.array(F.lit(1.0)).alias("probabilities"),
    )
    return aliases.unionByName(self_aliases)


def ruler_patterns(aliases: DataFrame) -> DataFrame:
    """J3 patterns from the alias table (generate_patterns,
    senzing_pipeline.py:278-286): one pattern per alias string; the
    pattern id is the highest-prior entity (deterministic tiebreak)."""
    exploded = aliases.select(
        "alias", F.explode(F.arrays_zip("entities", "probabilities")).alias("z")
    ).select(
        "alias",
        F.col("z.entities").alias("id"),
        F.col("z.probabilities").alias("prior"),
    )
    w = Window.partitionBy("alias").orderBy(F.desc("prior"), F.asc("id"))
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("alias") != ""))
        .select(F.lit("ENT").alias("label"), F.col("alias").alias("pattern"), "id")
    )


def extract_mentions(
    docs: DataFrame, aliases: DataFrame, with_shape_ner: bool = False
) -> DataFrame:
    """N3 (+N2) — mentions via the deterministic ruler tier, optionally
    unioned with shape-rule NER spans that the dictionary missed.
    Returns (mention_id, doc_id, start, len, text, ent_id, label).

    With ``with_shape_ner`` the N2 tier (text/ner.py) contributes
    non-dictionary entities — the reference's model-NER recall path
    (tutorial.ipynb cell 11): NER spans whose tokens don't overlap any
    ruler match are added with ``ent_id = ""`` so they flow to the
    linker and, when unlinkable, into the unlinked-entities report
    (tutorial.ipynb cell 26)."""
    patterns = ruler_patterns(aliases)
    m = match_phrases(docs, patterns)
    mentions = m.select(
        F.concat_ws(":", "doc_id", "start", "len").alias("mention_id"),
        "doc_id",
        "start",
        "len",
        F.col("alias").alias("text"),
        F.col("pattern_id").alias("ent_id"),
        "label",
    )
    if not with_shape_ner:
        return mentions
    from erkg_tutorials_spark.text.ner import shape_ner

    ner = shape_ner(docs).alias("n")
    r = mentions.alias("r")
    overlap = (F.col("r.start") < F.col("n.start") + F.col("n.len")) & (
        F.col("n.start") < F.col("r.start") + F.col("r.len")
    )
    ner_only = ner.join(
        r, (F.col("n.doc_id") == F.col("r.doc_id")) & overlap, "left_anti"
    ).select(
        F.concat_ws(":", "doc_id", "start", "len").alias("mention_id"),
        "doc_id",
        "start",
        "len",
        "text",
        F.lit("").alias("ent_id"),
        "label",
    )
    return mentions.unionByName(ner_only)


def link_entities(
    docs: DataFrame,
    mentions: DataFrame,
    aliases: DataFrame,
    entities: DataFrame,
    candidate_threshold: float = 0.4,
    dim: int = 64,
) -> DataFrame:
    """V2→V4→V3/W4→V5: mentions table gains kb_id (+score, +prior).

    Unlinked mentions keep ``kb_id = ""`` — the reference's sentinel
    (analysis.py:35 filters on ``kb_id == ""``).
    """
    cands = alias_candidates(
        mentions, aliases, mention_text="text", mention_id="mention_id",
        threshold=candidate_threshold,
    )
    ecands = entity_candidates(cands, aliases)

    doc_vecs = embed_column(docs, "text", "embedding", dim).select("doc_id", "embedding")
    mention_vecs = mentions.join(doc_vecs, "doc_id").select("mention_id", "embedding")
    entity_vecs = embed_column(entities, "description", "embedding", dim).select(
        "entity_id", "embedding"
    )
    links = disambiguate(ecands, mention_vecs, entity_vecs)
    return (
        mentions.join(links, "mention_id", "left")
        .withColumn("kb_id", F.coalesce(F.col("kb_id"), F.lit("")))
        .select("mention_id", "doc_id", "start", "len", "text", "ent_id", "label", "kb_id", "score", "prior")
    )


def review_report(phrases: DataFrame, mentions: DataFrame, top_k: int = 30) -> DataFrame:
    """analyse_el_docs parity (analysis.py:7-37): top-30 phrases per
    doc (W1), distinct (text, kb_id) mention pairs per phrase (A3,
    association = phrase token ∈ mention tokens), explode+flatten
    (R1/R2), keep unlinked (F6). Returns
    (doc_id, phrase, rank, count, text, kb_id)."""
    w = Window.partitionBy("doc_id").orderBy(F.desc("rank"), F.asc("phrase"))
    top = phrases.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= top_k)

    assoc = top.join(
        mentions.select(
            "doc_id", "text", "kb_id", F.split(F.lower("text"), " ").alias("_mtoks")
        ),
        ["doc_id"],
    ).where(F.array_contains(F.col("_mtoks"), F.col("phrase")))
    pairs = assoc.select("doc_id", "phrase", "rank", "count", "text", "kb_id").distinct()

    # pandas explode of an empty entity list yields a NaN row that the
    # text-notnull filter then drops; relationally that's just an inner
    # association, so only the kb_id filter remains (F6)
    return pairs.where(F.col("text").isNotNull() & (F.col("kb_id") == "")).orderBy(
        "doc_id", F.desc("rank"), "phrase", "text"
    )


def run_entity_linking(
    docs: DataFrame, entities: DataFrame, aliases: DataFrame
) -> dict[str, DataFrame]:
    """Full E3: returns {mentions, phrases, review} DataFrames."""
    kb_aliases = with_self_aliases(aliases, entities)
    mentions0 = extract_mentions(docs, kb_aliases)
    mentions = link_entities(docs, mentions0, kb_aliases, entities)
    phrases = textrank_phrases(docs)
    review = review_report(phrases, mentions)
    return {"mentions": mentions, "phrases": phrases, "review": review}

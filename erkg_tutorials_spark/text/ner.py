"""N2 — deterministic shape-rule NER (the statistical-NER slot's
working tier).

The reference's tutorial path runs spaCy model NER before linking
(/root/reference/tutorial.ipynb cell 11, dagster_icij/assets.py:107
``spacy.load(SPACY_MODEL)``; its dev path at dev.ipynb cell 114
disables it and relies on the ruler). A model can't ship in this
container, so the slot gets a deterministic tier that recalls
non-dictionary entities the way model NER does: capitalized-token
runs classified by title/suffix shape.

Rules (all deterministic, engine-portable):

* tokenize on single spaces (repo-wide convention, see
  text/annotations.py); a token is *capitalized* if it matches
  ``^[A-Z][A-Za-z0-9.&-]*$``;
* maximal runs of capitalized tokens become candidate spans
  (gaps-and-islands over a window — pure SQL, no Python boundary);
* a leading determiner (The/A/An/This/That) is stripped;
* classification: ORG if the last token is a corporate suffix
  (S.A., Inc., Ltd., …), PERSON if the first token is an honorific
  (Mr., Dr., …) or the span is a 2-4 token all-alpha run, else ENT;
* singleton spans are dropped (sentence-start noise) unless ORG.

Sentence-initial false positives ("Yesterday John Smith…") are the
documented cost of the rule tier; a real model plugs into the same
span schema via ``mapInPandas`` (the N4 batched-pipe pattern,
sources/scraper.py) without touching downstream consumers.

Spans are 1-based token positions (start, len) — the same convention
as text/phrase_match.py, so ruler and NER mentions compose directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CAP_RE = "^[A-Z][A-Za-z0-9.&-]*$"
ORG_SUFFIXES = (
    "S.A.", "Inc.", "Ltd.", "LLC", "Corp.", "Co.", "GmbH", "N.V.", "PLC", "AG",
)
TITLES = ("Mr.", "Mrs.", "Ms.", "Dr.", "Sir", "President")
DETERMINERS = ("The", "A", "An", "This", "That")
ALPHA_SPAN_RE = "^[A-Za-z. -]+$"


def shape_ner(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, start, len, text, label) — capitalized-run entity
    spans with shape-rule labels."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    toks = toks.withColumn("is_cap", F.col("tok").rlike(CAP_RE))
    # gaps-and-islands: consecutive capitalized positions share a group
    w = Window.partitionBy("doc_id", "is_cap").orderBy("pos")
    runs = (
        toks.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .where("is_cap")
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("start"),
            F.count("*").cast("long").alias("len"),
            F.array_join(
                F.expr("transform(sort_array(collect_list(struct(pos, tok))), s -> s.tok)"),
                " ",
            ).alias("text"),
            F.min_by("tok", "pos").alias("first_tok"),
            F.max_by("tok", "pos").alias("last_tok"),
        )
    )
    dets = list(DETERMINERS)
    stripped = (
        runs.withColumn("strip", F.col("first_tok").isin(dets))
        .withColumn("start", F.when(F.col("strip"), F.col("start") + 1).otherwise(F.col("start")))
        .withColumn("len", F.when(F.col("strip"), F.col("len") - 1).otherwise(F.col("len")))
        .withColumn(
            "text",
            F.when(
                F.col("strip"),
                F.expr("substring(text, instr(text, ' ') + 1)"),
            ).otherwise(F.col("text")),
        )
        .withColumn(
            "first_tok",
            F.when(F.col("strip"), F.element_at(F.split("text", " "), 1)).otherwise(
                F.col("first_tok")
            ),
        )
        .where(F.col("len") >= 1)
    )
    label = (
        F.when(F.col("last_tok").isin(list(ORG_SUFFIXES)), F.lit("ORG"))
        .when(F.col("first_tok").isin(list(TITLES)), F.lit("PERSON"))
        .when(
            F.col("len").between(2, 4) & F.col("text").rlike(ALPHA_SPAN_RE),
            F.lit("PERSON"),
        )
        .otherwise(F.lit("ENT"))
    )
    return (
        stripped.withColumn("label", label)
        .where((F.col("len") >= 2) | (F.col("label") == "ORG"))
        .select("doc_id", "start", "len", "text", "label")
    )


def shape_ner_oracle_sql(docs_cte: str) -> str:
    """DuckDB twin of :func:`shape_ner` over a caller-supplied CTE
    ``docs(doc_id, text)`` (``docs_cte`` must end just before the
    final SELECT). Same rules, same span convention."""
    org = ", ".join(f"'{s}'" for s in ORG_SUFFIXES)
    titles = ", ".join(f"'{t}'" for t in TITLES)
    dets = ", ".join(f"'{d}'" for d in DETERMINERS)
    return (
        docs_cte
        + f""",
    toks AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      FROM docs
    ),
    flagged AS MATERIALIZED (
      SELECT doc_id, pos, tok, regexp_matches(tok, '{CAP_RE}') AS is_cap
      FROM toks
    ),
    grped AS MATERIALIZED (
      SELECT doc_id, pos, tok, is_cap,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id, is_cap ORDER BY pos) AS grp
      FROM flagged
    ),
    runs AS MATERIALIZED (
      SELECT doc_id, grp,
             MIN(pos) AS start,
             CAST(COUNT(*) AS BIGINT) AS len,
             string_agg(tok, ' ' ORDER BY pos) AS text,
             arg_min(tok, pos) AS first_tok,
             arg_max(tok, pos) AS last_tok
      FROM grped WHERE is_cap
      GROUP BY doc_id, grp
    ),
    stripped AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN strip THEN start + 1 ELSE start END AS start,
             CASE WHEN strip THEN len - 1 ELSE len END AS len,
             CASE WHEN strip THEN substring(text, instr(text, ' ') + 1) ELSE text END AS text,
             CASE WHEN strip THEN string_split(substring(text, instr(text, ' ') + 1), ' ')[1]
                  ELSE first_tok END AS first_tok,
             last_tok
      FROM (SELECT *, first_tok IN ({dets}) AS strip FROM runs) s
      WHERE CASE WHEN strip THEN len - 1 ELSE len END >= 1
    ),
    labeled AS (
      SELECT doc_id, start, len, text,
             CASE
               WHEN last_tok IN ({org}) THEN 'ORG'
               WHEN first_tok IN ({titles}) THEN 'PERSON'
               WHEN len BETWEEN 2 AND 4 AND regexp_matches(text, '{ALPHA_SPAN_RE}') THEN 'PERSON'
               ELSE 'ENT'
             END AS label
      FROM stripped
    )
    SELECT doc_id, start, len, text, label
    FROM labeled WHERE len >= 2 OR label = 'ORG'
    """
    )

"""N1 — document annotation tables (the relational encoding of a
spaCy Doc, SURVEY.md §1.1 shape 5).

The reference keeps docs as binary DocBin blobs (scraper.py:77); we
re-express a Doc as derived tables — ``sentences`` and ``tokens`` —
that downstream operators join instead of deserializing blobs.
Sentencization/tokenization here is the deterministic rule tier
(punctuation split / whitespace); a model tokenizer would slot in as a
``mapInPandas`` over the same schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sentences(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sent_id, sentence): split on sentence punctuation,
    empty sentences dropped."""
    parts = F.split(F.col(text_col), r"(?<=[.!?])\s+")
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(parts).alias("sent_id", "sentence"))
        .withColumn("sentence", F.trim("sentence"))
        .where(F.col("sentence") != "")
    )


def doc_tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, token): 1-based token position, lowercased."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos0", "token"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")

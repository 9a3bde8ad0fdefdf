"""Exact deduplication: hash-groupBy on the content column.

The canonical id of each duplicate group is the minimum id — a pure
shuffle-on-content-hash aggregation that scales linearly: at 100 TB the
only shuffle key is the (md5 of the) document text, so AQE's partition
coalescing and skew handling apply directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Assign each row the minimal id among rows with identical text.

    Returns ``(id_col, canonical_id, is_dup)``. Grouping happens on
    ``md5(text)`` rather than the full text so the shuffle moves 32-byte
    keys, not document bodies.
    """
    fp = F.md5(F.col(text_col))
    w = Window.partitionBy(fp)
    return df.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("canonical_id"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )

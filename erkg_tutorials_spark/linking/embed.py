"""V1 — text embedding as a vectorized pandas_udf.

The reference embeds entity descriptions and aliases through
``AnnKnowledgeBase._embed`` (spacy-lancedb-linker; dev.ipynb cells
73/84). The model itself is swappable; what the engine owes is the
*operator shape*: an Arrow-batched pandas_udf producing a fixed-dim
``array<float>`` column, no per-row Python.

Default encoder is a deterministic hashing bag-of-words (md5 token →
bucket, L2-normalized) so tests are stable with no model downloads
(SURVEY.md §7 Phase 3). A real sentence-transformer drops in by
passing any ``encode: list[str] -> np.ndarray`` callable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def _hash_bucket(token: str, dim: int) -> int:
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big") % dim


def hashing_encode(
    texts: list[str], dim: int = 64, normalize: bool = True
) -> np.ndarray:
    """Deterministic hashing BoW encoder: md5-bucketed token counts,
    L2-normalized (unless ``normalize=False``, which keeps raw integer
    counts — exact in float32, so cross-engine comparable). Zero vector
    for empty/blank text."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        for tok in (t or "").lower().split():
            out[i, _hash_bucket(tok, dim)] += 1.0
        if normalize:
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
    return out


def hashing_embedder(dim: int = 64, normalize: bool = True):
    """pandas_udf embedding a string column → array<float> of ``dim``."""

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(s: pd.Series) -> pd.Series:
        mat = hashing_encode(s.fillna("").tolist(), dim, normalize)
        return pd.Series(list(mat))

    return embed


def embed_column(
    df: DataFrame, text_col: str, out_col: str = "embedding", dim: int = 64
) -> DataFrame:
    return df.withColumn(out_col, hashing_embedder(dim)(F.col(text_col)))


def cosine(a: str, b: str) -> Column:
    """JVM-side cosine between two array<float|double> columns."""
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    na = F.expr(
        f"sqrt(aggregate({a}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    nb = F.expr(
        f"sqrt(aggregate({b}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))

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


def encoder_embedder(encode):
    """Wrap ANY ``encode: list[str] -> np.ndarray`` callable as the
    same Arrow-batched pandas_udf shape the hashing tier uses — this
    is the real-model seam: the callable (e.g. a sentence-transformer
    adapter) is serialized to executors and invoked once per Arrow
    batch, never per row."""

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(s: pd.Series) -> pd.Series:
        mat = np.asarray(encode(s.fillna("").tolist()), dtype=np.float32)
        return pd.Series(list(mat))

    return embed


# per-worker-process model cache (see text/ner_model.py for rationale)
_ST_SINGLETON: dict = {}


def _get_st_model(model_name: str):
    m = _ST_SINGLETON.get(model_name)
    if m is None:
        from sentence_transformers import SentenceTransformer  # optional dep

        m = SentenceTransformer(model_name)
        _ST_SINGLETON[model_name] = m
    return m


def sentence_transformer_available(model_name: str = "all-MiniLM-L6-v2") -> bool:
    """True iff sentence-transformers AND the named model load here."""
    try:
        _get_st_model(model_name)
        return True
    except Exception:
        return False


def sentence_transformer_encode(model_name: str = "all-MiniLM-L6-v2"):
    """``encode`` callable backed by a per-executor-process
    sentence-transformer singleton; pass to :func:`encoder_embedder`
    or :func:`embed_column`. The closure carries only the model NAME —
    executors load (and cache) the weights themselves."""

    def encode(texts: list[str]) -> np.ndarray:
        from erkg_tutorials_spark.linking.embed import _get_st_model

        return _get_st_model(model_name).encode(texts, convert_to_numpy=True)

    return encode


def embed_column(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    dim: int = 64,
    encode=None,
) -> DataFrame:
    """Embedding column via the hashing tier (default, deterministic,
    always available) or any injected ``encode`` callable (real-model
    tier — e.g. ``sentence_transformer_encode()`` when the package is
    installed). Both paths produce ``array<float>`` through the same
    Arrow-batched pandas_udf plumbing."""
    udf = encoder_embedder(encode) if encode is not None else hashing_embedder(dim)
    return df.withColumn(out_col, udf(F.col(text_col)))


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

"""Hermetic embedding model: a frozen-weight numpy sentence encoder
that exercises the real-model adapter path in every runtime (r5
VERDICT item 5 — the sentence-transformer seam in linking/embed.py had
never executed because the package doesn't ship here).

Architecture is the minimal *real* encoder shape: token -> embedding
lookup -> mean pool -> L2 normalize. The embedding table is frozen and
derived from SHA-256 (row i's 4·DIM bytes come from
``sha256(b"mini-encoder-row-<i>-<chunk>")``, mapped to uniform
[-1, 1)), which makes the "weights" bit-reproducible on any platform
and Python version with zero binary blobs in the repo — the
deterministic equivalent of vendoring an .npz. Tokens hash into the
table with the same md5 bucketing the hashing tier uses
(linking/embed.py:_hash_bucket), so the two tiers share vocabulary
behavior but produce different (dense, learned-shaped) geometry.

The execution path is EXACTLY the sentence-transformer adapter's:
``mini_encoder_encode()`` returns a closure carrying only config; each
executor worker loads (and caches) the table through the module-level
singleton; ``encoder_embedder`` wraps it as an Arrow-batched
pandas_udf invoked once per batch. sentence-transformers remains the
env-gated golden on top.
"""

from __future__ import annotations

import hashlib

import numpy as np

from erkg_tutorials_spark.linking.embed import _hash_bucket

MINI_DIM = 32
MINI_VOCAB = 4096

# per-worker-process weight cache (see text/ner_model.py for rationale)
_MINI_SINGLETON: dict = {}


def _frozen_table(vocab: int, dim: int) -> np.ndarray:
    """The frozen embedding table: hash-derived uniform [-1, 1)
    float32 weights, identical on every platform forever."""
    n_bytes = dim * 4
    rows = []
    for i in range(vocab):
        buf = b""
        chunk = 0
        while len(buf) < n_bytes:
            buf += hashlib.sha256(f"mini-encoder-row-{i}-{chunk}".encode()).digest()
            chunk += 1
        u32 = np.frombuffer(buf[:n_bytes], dtype=">u4").astype(np.float64)
        rows.append(u32 / 2**31 - 1.0)
    return np.asarray(rows, dtype=np.float32)


class MiniEncoder:
    """Sentence encoder with the sentence-transformers calling
    convention: ``encode(texts, convert_to_numpy=True) -> (n, dim)``."""

    def __init__(self, vocab: int = MINI_VOCAB, dim: int = MINI_DIM):
        self.vocab, self.dim = vocab, dim
        self.table = _frozen_table(vocab, dim)

    def encode(self, texts: list[str], convert_to_numpy: bool = True) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            if not toks:
                continue
            idx = [_hash_bucket(tok, self.vocab) for tok in toks]
            v = self.table[idx].mean(axis=0)
            n = np.linalg.norm(v)
            out[i] = v / n if n > 0 else v
        return out


def _get_mini_encoder(vocab: int = MINI_VOCAB, dim: int = MINI_DIM) -> MiniEncoder:
    key = (vocab, dim)
    enc = _MINI_SINGLETON.get(key)
    if enc is None:
        enc = MiniEncoder(vocab, dim)
        _MINI_SINGLETON[key] = enc
    return enc


def mini_encoder_encode(vocab: int = MINI_VOCAB, dim: int = MINI_DIM):
    """``encode`` callable backed by the per-executor-process frozen
    table; pass to ``encoder_embedder`` / ``embed_column`` exactly as
    ``sentence_transformer_encode()`` would be. The closure carries
    only (vocab, dim) — executors build (and cache) the table
    themselves."""

    def encode(texts: list[str]) -> np.ndarray:
        from erkg_tutorials_spark.linking.mini_encoder import _get_mini_encoder

        return _get_mini_encoder(vocab, dim).encode(texts)

    return encode

"""Perceptual image near-dup dedup: aHash/dHash over binary images +
Hamming-banded LSH pairing (r8 VERDICT item 1).

A training-data pipeline dedups images as well as text; the standard
cheap perceptual fingerprints are average-hash (aHash: downsample to
an 8x8 grayscale grid, threshold each cell against the grid mean) and
difference-hash (dHash: 8x9 grid, bit = horizontal gradient sign).
Near-identical images — recompressions, brightness shifts, small
crops — land within a few bits of each other, so near-dup pairs come
from the same banded-Hamming LSH shape as SimHash
(dedup/simhash.py): 4 bands of 16 bits, exact-match band join,
Hamming verification of candidates only.

Everything is EXACT integer arithmetic (nearest-neighbor resample via
floor-division indexing, (r+g+b)//3 grayscale, 64*g > sum(g)
mean-threshold), so the whole fingerprint is replayable bit-for-bit
by the DuckDB oracle over the pixel bytes (plans/mediaq.py generates
the matching SQL). The decode tier is the real pure-stdlib binary-PPM
parser from multimodal/media.py — the signature runs on actual
decoded pixels, not payload bytes.

Duplicate-flood posture (the minhash hot-band lesson,
dedup/minhash.py:87): byte-identical payloads share their entire
signature, so a d-copy flood would put d rows in every band bucket
and fan out d^2/2 candidate pairs. ``collapse_exact`` (default on)
collapses identical payloads (md5) to one representative BEFORE
decoding, bands representatives only — candidate work linear in
DISTINCT images — then restores multiplicity. Like the MinHash tier,
the *pair-level* output still materializes a flood's d^2/2
Hamming-0 rows by definition; flood-scale consumers should route
pairs into ``dedup/clusters.py`` (cluster rows are O(d) — see
``dedup_assign``).

Scale: decode + signature is embarrassingly parallel (mapInPandas,
Arrow-batched, binaries never on the driver); the only pairwise work
is the band-key self-join, proportional to true near-dups. At 100 TB
the signature table is 8 bytes/image — the index you keep.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from erkg_tutorials_spark.dedup.simhash import hamming_hex
from erkg_tutorials_spark.multimodal.media import _ppm_parse

HEX = "0123456789abcdef"

SIG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", StringType()),
        StructField("dhash", StringType()),
    ]
)


def _gray_grid(payload: bytes, gw: int, gh: int) -> list[int]:
    """Decode a binary PPM and nearest-neighbor-resample to a gw x gh
    INTEGER grayscale grid, row-major. Pure integer arithmetic:
    source index (y*h)//gh, (x*w)//gw (the multimodal resize formula),
    grayscale (r+g+b)//3 — every step replayable in SQL."""
    import numpy as np

    w, h, pixels = _ppm_parse(payload)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
    ys = (np.arange(gh) * h) // gh
    xs = (np.arange(gw) * w) // gw
    cell = arr[ys][:, xs]
    gray = (cell[:, :, 0] + cell[:, :, 1] + cell[:, :, 2]) // 3
    return [int(v) for v in gray.reshape(-1)]


def _bits_to_hex(bits: list[int]) -> str:
    """64 bits (MSB-first within each nibble) -> 16 lowercase hex chars."""
    out = []
    for p in range(16):
        n = 0
        for k in range(4):
            n = (n << 1) | bits[p * 4 + k]
        out.append(HEX[n])
    return "".join(out)


def ahash_bits(payload: bytes) -> str:
    """64-bit average hash: 8x8 grid, bit(y,x) = 1 iff
    64*gray(y,x) > sum(gray) — strict, integer, no float mean."""
    g = _gray_grid(payload, 8, 8)
    total = sum(g)
    return _bits_to_hex([1 if 64 * v > total else 0 for v in g])


def dhash_bits(payload: bytes) -> str:
    """64-bit difference hash: 9x8 grid, bit(y,x) = 1 iff
    gray(y,x) > gray(y,x+1) (horizontal gradient sign)."""
    g = _gray_grid(payload, 9, 8)  # 9 wide, 8 tall
    bits = []
    for y in range(8):
        for x in range(8):
            bits.append(1 if g[y * 9 + x] > g[y * 9 + x + 1] else 0)
    return _bits_to_hex(bits)


def image_signatures(media: DataFrame) -> DataFrame:
    """(media_id, ahash, dhash) via Arrow mapInPandas over binary PPM
    payloads — the perceptual-fingerprint map stage."""

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": [ahash_bits(p) for p in pdf["payload"]],
                    "dhash": [dhash_bits(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(sign, SIG_SCHEMA)


def _banded(sig: DataFrame, hash_col: str) -> DataFrame:
    """4 bands of 4 hex chars (16 bits) per signature — the SimHash
    banding, reused."""
    bands = None
    for b in range(4):
        part = sig.select(
            F.col("media_id").alias("id"),
            F.col(hash_col).alias("sig"),
            F.lit(b).alias("band"),
            F.substring(hash_col, b * 4 + 1, 4).alias("bkey"),
        )
        bands = part if bands is None else bands.unionByName(part)
    return bands


def phash_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    hash_col: str = "ahash",
    collapse_exact: bool = True,
) -> DataFrame:
    """(id_a, id_b, hamming) image near-dup pairs: banded candidate
    join over the perceptual hash, exact Hamming verification,
    id_a < id_b. Output is row-identical with ``collapse_exact``
    on or off; the guard only changes the join work under a
    byte-identical duplicate flood (see module docstring — and route
    flood-scale output through dedup/clusters.py)."""
    members = None
    if collapse_exact:
        keyed = media.select(F.col("media_id"), F.md5("payload").alias("_ph"))
        groups = keyed.groupBy("_ph").agg(F.min("media_id").alias("_rep"))
        members = keyed.join(groups, "_ph").select(
            F.col("media_id").alias("_m"), "_rep"
        )
        media = media.join(
            groups.select(F.col("_rep").alias("media_id")), "media_id", "left_semi"
        )

    sig = image_signatures(media)
    bands = _banded(sig, hash_col)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey")),
        )
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
        .withColumn("hamming", hamming_hex("sig_a", "sig_b").cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    if members is None:
        return pairs

    # restore multiplicity: rep-level pairs expand to the member cross
    # product (identical payload => identical signature => the same
    # hamming to every counterparty), plus intra-group all-pairs at
    # hamming 0
    ra = members.select(F.col("_rep").alias("id_a"), F.col("_m").alias("_a"))
    rb = members.select(F.col("_rep").alias("id_b"), F.col("_m").alias("_b"))
    cross = (
        pairs.join(ra, "id_a")
        .join(rb, "id_b")
        .select(
            F.least("_a", "_b").alias("id_a"),
            F.greatest("_a", "_b").alias("id_b"),
            "hamming",
        )
    )
    m1 = members.select("_rep", F.col("_m").alias("id_a"))
    m2 = members.select("_rep", F.col("_m").alias("id_b"))
    intra = (
        m1.join(m2, "_rep")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("long").alias("hamming"))
    )
    return cross.unionByName(intra)

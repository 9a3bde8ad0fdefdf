"""Perceptual image dedup (dedup/phash.py, r8 VERDICT item 1):
brightness-shift invariance of aHash/dHash, banded-pair recovery,
flood linearity via the exact-payload collapse guard, and
guarded == unguarded output equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from erkg_tutorials_spark.dedup.phash import (
    ahash_bits,
    dhash_bits,
    image_signatures,
    phash_near_dup_pairs,
)
from erkg_tutorials_spark.multimodal.media import ppm_encode


def _img(w: int, h: int, seed: int = 0, shift: int = 0) -> bytes:
    """Deterministic synthetic PPM: a diagonal gradient plus a seed
    offset, optionally brightness-shifted (clipped to 255)."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(3):
                v = (x * 7 + y * 5 + seed * 11 + c * 3) % 200
                px.append(min(255, v + shift))
    return ppm_encode(w, h, bytes(px))


def test_brightness_shift_is_hamming_zero():
    """aHash thresholds against the grid mean and dHash against the
    horizontal gradient — both are invariant under a uniform
    (unclipped) brightness shift, the canonical perceptual near-dup."""
    base = _img(40, 32, seed=3)
    bright = _img(40, 32, seed=3, shift=10)
    assert base != bright  # genuinely different bytes
    assert ahash_bits(base) == ahash_bits(bright)
    assert dhash_bits(base) == dhash_bits(bright)


def test_distinct_images_differ():
    sigs = {ahash_bits(_img(40, 32, seed=s)) for s in range(8)}
    assert len(sigs) >= 6  # different content -> different fingerprints


def test_pairs_recover_brightness_shifted_copy(spark):
    """The banded LSH pipeline finds the (original, brightness-shifted
    copy) pair at Hamming 0 among unrelated images."""
    rows = [(0, _img(40, 32, seed=3)), (1, _img(40, 32, seed=3, shift=10))]
    rows += [(10 + s, _img(40, 32, seed=50 + s)) for s in range(6)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(media, max_hamming=6).collect()
    }
    assert got.get((0, 1)) == 0


def test_signatures_shape(spark):
    media = spark.createDataFrame(
        [(i, _img(24, 16, seed=i)) for i in range(5)],
        "media_id long, payload binary",
    )
    out = image_signatures(media).collect()
    assert len(out) == 5
    for r in out:
        assert len(r["ahash"]) == 16 and len(r["dhash"]) == 16
        assert set(r["ahash"]) <= set("0123456789abcdef")


def test_flood_candidates_linear_in_distinct_images(spark):
    """10k byte-identical images + a few distinct ones: the collapse
    guard bands one representative per distinct payload, so the
    band self-join emits at most C(n_distinct, 2) candidate pairs —
    not the ~50M an unguarded flood fans out. Replays the guard's
    collapse exactly as dedup/minhash's flood test does."""
    from erkg_tutorials_spark.dedup.phash import _banded

    flood = [(i, _img(32, 16, seed=0)) for i in range(10_000)]
    others = [(100_000 + s, _img(32, 16, seed=s)) for s in range(1, 5)]
    media = spark.createDataFrame(flood + others, "media_id long, payload binary")

    groups = media.groupBy(F.md5("payload").alias("_ph")).agg(
        F.min("media_id").alias("media_id")
    )
    reps = media.join(groups.select("media_id"), "media_id", "left_semi")
    assert reps.count() == 5
    bands = _banded(image_signatures(reps), "ahash")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey")),
        )
        .where(F.col("a.id") < F.col("b.id"))
        .select("a.id", "b.id")
        .distinct()
    )
    assert cand.count() <= 10  # C(5,2): linear in DISTINCT images


def test_flood_routes_to_linear_clusters(spark):
    """Flood -> clusters routing (r8 VERDICT item 5, image tier): a
    200-copy flood yields O(d) CLUSTER rows via dedup_assign — one
    canonical keeper — even though the pair API by contract
    materializes d(d-1)/2 rows."""
    from erkg_tutorials_spark.dedup.clusters import dedup_assign

    n = 200
    media = spark.createDataFrame(
        [(i, _img(32, 16, seed=0)) for i in range(n)]
        + [(n, _img(32, 16, seed=9))],
        "media_id long, payload binary",
    )
    pairs = phash_near_dup_pairs(media, max_hamming=6)
    assert pairs.count() == n * (n - 1) // 2  # pair contract: quadratic
    assigned = dedup_assign(media.select("media_id"), pairs, id_col="media_id")
    assert assigned.count() == n + 1  # cluster view: one row per image
    flood_rows = assigned.where(F.col("media_id") < n).collect()
    assert len({r["cluster"] for r in flood_rows}) == 1
    assert sum(r["is_canonical"] for r in flood_rows) == 1


def test_guarded_equals_unguarded(spark):
    rows = []
    for s in range(4):
        rows.append((s, _img(40, 32, seed=s)))
        rows.append((10 + s, _img(40, 32, seed=s)))  # exact dup of each
    rows.append((20, _img(40, 32, seed=2, shift=5)))  # near-dup of seed 2
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    guarded = sorted(
        map(tuple, phash_near_dup_pairs(media, max_hamming=6).collect())
    )
    plain = sorted(
        map(
            tuple,
            phash_near_dup_pairs(
                media, max_hamming=6, collapse_exact=False
            ).collect(),
        )
    )
    assert guarded == plain
    assert len(guarded) > 0

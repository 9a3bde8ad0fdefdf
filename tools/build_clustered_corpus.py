"""Planted-cluster embedding corpus for ABSOLUTE ANN recall floors
(r10 VERDICT item 1).

The synthetic /root/testdata embeddings are isotropic — same-label and
cross-label cosine are both ~0 (measured, SCALING.md "IVF recall
root-cause") — so IVF/IVF-PQ routing quality could only be verified as
*lift over random scanning*. Real embedding corpora (the reference's
LanceDB KB use case, /root/reference/dagster_icij/assets.py:126-128)
have cluster structure; that is the case ANN indexes exist for. This
builder plants it deterministically:

- ``k`` unit-norm centers drawn from a seeded Gaussian (near-orthogonal
  in 64-dim, so clusters are well separated under cosine);
- each vector = normalize(center[label] + sigma * noise), float32;
  with sigma=0.1 the expected vector->own-center cosine is ~0.8 and
  within-cluster pair cosine ~0.6, while cross-cluster pair cosine is
  0 +- 0.125 — true top-k neighbors are within-cluster, and a correct
  coarse quantizer must route a query to its own cluster's cells;
- ``label`` = planted cluster id (ground truth for routing checks);
- every OTHER table is hardlinked from the source sf dir, so the
  output is a complete sf-style directory: the memoized index builders
  (plans/vectorq.py *_cached) and tools/ann_recall_experiment.measure
  run against it unchanged.

Everything is seeded (no wall-clock, no global RNG): byte-identical
rebuilds, test-pinnable.

    python tools/build_clustered_corpus.py [src_sf_dir] [dst]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 20260816
DIM = 64
N_CLUSTERS = 20
SIGMA = 0.1


def build(
    src: str = "/root/testdata/sf0.1",
    dst: str | None = None,
    n: int | None = None,
    k: int = N_CLUSTERS,
    sigma: float = SIGMA,
    seed: int = SEED,
) -> str:
    """Emit ``dst`` as a full sf-style dir whose embeddings.parquet is
    the planted-cluster corpus (same row count as ``src``'s embeddings
    unless ``n`` is given; same physical schema: BIGINT vec_id,
    FLOAT[] embedding, INT label)."""
    import duckdb

    if n is None:
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{src}/embeddings.parquet'"
        ).fetchone()[0]
    if dst is None:
        dst = f"/tmp/erkg_clustered_{os.path.basename(src)}_{n}"
    marker = os.path.join(dst, "_CLUSTERED_OK")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for fname in sorted(os.listdir(src)):
        if fname.endswith(".parquet") and fname != "embeddings.parquet":
            sp, dp = os.path.join(src, fname), os.path.join(dst, fname)
            try:
                os.link(sp, dp)
            except OSError:
                shutil.copy(sp, dp)

    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((k, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % k  # balanced, deterministic
    vecs = centers[labels] + sigma * rng.standard_normal((n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)

    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(dst, "embeddings.parquet"))
    open(marker, "w").close()
    return dst


def build_scaled(
    base_kx: str,
    copies: int,
    src: str = "/root/testdata/sf0.1",
    dst: str | None = None,
) -> str:
    """kx-scaled planted-cluster sf-dir (the scale_100x ann_recall
    input): every table hardlinked from ``base_kx`` (the key-shifted
    kx build, so documents/graph tables are the real kx ones) except
    embeddings.parquet, rebuilt by applying build_sf10x's OWN per-copy
    embedding transform (vec_id shift + cyclic 7c-rotation, negation
    for copies >= 64 — ``_copy_select``'s embeddings branch, reused
    verbatim) to the planted corpus. Rotation/negation preserve norms
    and within-copy cosines, so each copy is a 20-cluster family and
    the union plants ``20 * copies`` separated clusters — the routing
    problem genuinely hardens with scale while ground truth (engine
    brute-force over the same corpus) stays exact."""
    import duckdb

    from tools.build_sf10x import _copy_select

    clustered = build(src=src)
    if dst is None:
        dst = f"/tmp/erkg_clu{copies}x_v2"
    marker = os.path.join(dst, "_CLUSTERED_OK")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for fname in sorted(os.listdir(base_kx)):
        if fname.endswith(".parquet") and fname != "embeddings.parquet":
            sp, dp = os.path.join(base_kx, fname), os.path.join(dst, fname)
            try:
                os.link(sp, dp)
            except OSError:
                shutil.copy(sp, dp)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW src_embeddings AS SELECT * FROM "
        f"'{os.path.join(clustered, 'embeddings.parquet')}'"
    )
    union = "\nUNION ALL\n".join(
        _copy_select(con, "embeddings", c) for c in range(copies)
    )
    con.sql(
        f"COPY ({union}) TO "
        f"'{os.path.join(dst, 'embeddings.parquet')}' (FORMAT PARQUET)"
    )
    open(marker, "w").close()
    return dst


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else None
    out = build(src=src, dst=dst)
    print(out)


if __name__ == "__main__":
    main()

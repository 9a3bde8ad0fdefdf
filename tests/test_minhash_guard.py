"""Hot-band guard in minhash_lsh_dedup (r7 VERDICT item 5): a
duplicate flood must contribute ONE representative per band bucket —
candidate pairs linear in distinct docs — while the output stays
row-identical to the unguarded plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from erkg_tutorials_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signature,
    shingles,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog tonight",
    "the quick brown fox jumps over the lazy cat tonight",
    "completely different words about spark shuffles and parquet files",
    "completely different words about spark shuffles and parquet tables",
    "a third topic entirely concerning graphs and communities here",
]


def test_planted_flood_candidates_linear_in_distinct_docs(spark):
    """10k byte-identical docs + a handful of distinct texts: after the exact-hash
    collapse the LSH band self-join sees one representative per
    distinct text (6 here: the flood, 4 variants, one short-dup
    group), so candidate pairs are bounded by C(6,2) — not the ~50M
    an unguarded flood fans out."""
    flood = [(i, TEXTS[0]) for i in range(10_000)]
    others = [(100_000 + j, t) for j, t in enumerate(TEXTS[1:] + ["x " * 9] * 3)]
    df = spark.createDataFrame(flood + others, "doc_id long, text string")

    # the guard's collapse, replayed: distinct texts -> 8 reps
    groups = df.groupBy(F.md5("text").alias("_th")).agg(
        F.min("doc_id").alias("doc_id")
    )
    reps = df.join(groups.select("doc_id"), "doc_id", "left_semi")
    assert reps.count() == 6
    cand = lsh_candidate_pairs(minhash_signature(shingles(reps)))
    assert cand.count() <= 15  # C(6,2): linear in DISTINCT docs


def test_flood_output_restores_multiplicity(spark):
    """Full guarded run on a 200-doc flood: every intra-flood pair
    comes back at jaccard exactly 1.0."""
    n = 200
    df = spark.createDataFrame(
        [(i, TEXTS[0]) for i in range(n)] + [(n, TEXTS[2])],
        "doc_id long, text string",
    )
    out = minhash_lsh_dedup(df, threshold=0.5)
    assert out.count() == n * (n - 1) // 2
    assert out.where(F.col("jaccard") != 1.0).count() == 0


def test_guarded_equals_unguarded(spark):
    """Row-identical output with and without the collapse on a mixed
    fixture (near-dups, exact dups, unrelated, too-short)."""
    rows = []
    for i, t in enumerate(TEXTS):
        rows.append((i, t))
        rows.append((10 + i, t))  # exact duplicate of each
    rows.append((50, "too short"))
    rows.append((51, "too short"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    guarded = sorted(
        map(tuple, minhash_lsh_dedup(df, threshold=0.3).collect())
    )
    plain = sorted(
        map(
            tuple,
            minhash_lsh_dedup(df, threshold=0.3, collapse_exact=False).collect(),
        )
    )
    assert guarded == plain
    assert len(guarded) > 0  # the fixture does produce pairs


def test_short_duplicate_group_excluded(spark):
    """Docs too short to shingle have NULL jaccard in the base plan —
    the guard must not resurrect them as 1.0 pairs."""
    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string"
    )
    assert minhash_lsh_dedup(df, threshold=0.0).count() == 0


def test_flood_routes_to_linear_clusters(spark):
    """r8 VERDICT item 5 composed test: a 10k-copy flood routed
    through minhash_lsh_cluster_assign yields ONE cluster (one
    canonical keeper) with O(d) rows end to end — the pair level's
    ~50M jaccard-1.0 rows are never materialized on this path."""
    from erkg_tutorials_spark.dedup.minhash import minhash_lsh_cluster_assign

    n = 10_000
    flood = [(i, TEXTS[0]) for i in range(n)]
    others = [(100_000 + j, t) for j, t in enumerate(TEXTS[2:])]
    df = spark.createDataFrame(flood + others, "doc_id long, text string")
    out = minhash_lsh_cluster_assign(df).collect()
    assert len(out) == n + len(TEXTS[2:])  # one row per doc, not per pair
    flood_rows = [r for r in out if r["doc_id"] < n]
    assert {r["cluster"] for r in flood_rows} == {0}
    assert sum(r["is_canonical"] for r in flood_rows) == 1
    # non-flood docs stay singletons (distinct topics; whether a given
    # near-dup pair LSH-collides is the banding's call, equivalence to
    # the pair path is asserted in the next test)
    others = [r for r in out if r["doc_id"] >= 100_000]
    assert all(r["cluster"] == r["doc_id"] for r in others)


def test_cluster_assign_equals_pair_expanded_path(spark):
    """Verdict-identical to minhash_lsh_dedup + dedup_assign on a
    mixed fixture (exact dups, near-dups, singletons, too-short)."""
    from erkg_tutorials_spark.dedup.clusters import dedup_assign
    from erkg_tutorials_spark.dedup.minhash import (
        minhash_lsh_cluster_assign,
        minhash_lsh_dedup,
    )

    rows = []
    for i, t in enumerate(TEXTS):
        rows.append((i, t))
        rows.append((10 + i, t))  # exact duplicate of each
    rows.append((50, "too short"))
    rows.append((51, "too short"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_pairs = sorted(
        map(
            tuple,
            dedup_assign(df.select("doc_id"), minhash_lsh_dedup(df))
            .select("doc_id", "cluster", "is_canonical")
            .collect(),
        )
    )
    composed = sorted(map(tuple, minhash_lsh_cluster_assign(df).collect()))
    assert composed == via_pairs

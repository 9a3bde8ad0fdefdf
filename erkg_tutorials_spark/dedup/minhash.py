"""MinHash + LSH near-duplicate detection, pure DataFrame ops.

Pipeline: word k-shingles → per-doc MinHash signature (one md5-keyed
hash family per permutation) → band keys → self-join on band key to get
candidate pairs → exact Jaccard verification of candidates only.

Scale notes (the reason this shape wins at 100 TB):
- shingling/minhashing is embarrassingly parallel (no shuffle until the
  signature groupBy, whose key is the doc id — already the natural
  partitioning of a document table);
- the only pairwise work is the band-key self-join: docs collide only
  when a whole band of minhashes agrees, so the join fan-out is
  proportional to the number of true near-dups, not |docs|²;
- verification touches candidate pairs only.

The hash family is ``md5(f"{i}|" + shingle)`` with the *lexicographic*
min taken over hex digests — deterministic, seed-free, and computable
identically by any engine (this is what makes the DuckDB oracle able to
replay it bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Distinct word k-shingles per document: ``(id_col, shingle)``.

    Note: ``sequence(1, n)`` with n < 1 would generate a *descending*
    sequence in Spark, so short documents are guarded to an empty array.
    """
    toks = df.select(id_col, F.split(F.lower(F.col(text_col)), " ").alias("w"))
    sh = F.when(
        F.size("w") >= k,
        F.expr(f"transform(sequence(1, size(w) - {k} + 1), i -> array_join(slice(w, i, {k}), ' '))"),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    return toks.select(id_col, F.explode(sh).alias("shingle")).distinct()


def minhash_signature(
    shingled: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """Per-doc MinHash signature: columns ``h0..h{n-1}`` (hex strings)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a, id_b)`` via banded LSH.

    rows-per-band r = num_hashes // bands; two docs are candidates iff
    all r minhashes of some band agree (collision prob ≈ jaccard^r per
    band).
    """
    r = num_hashes // bands
    band_frames = []
    for b in range(bands):
        key = F.concat(*[F.col(f"h{b * r + j}") for j in range(r)])
        band_frames.append(
            signatures.select(
                F.col(id_col).alias("id"), F.lit(b).alias("band"), key.alias("bkey")
            )
        )
    banded = band_frames[0]
    for f in band_frames[1:]:
        banded = banded.unionByName(f)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-dup pairs with exact Jaccard ≥ threshold, LSH-pruned.

    Returns ``(id_a, id_b, jaccard)`` with jaccard rounded to 6 decimals
    (intersection/union of exact shingle sets — integers, so the ratio
    is order-independent across engines).

    ``collapse_exact`` (default on) is the hot-band guard: byte-
    identical documents share their ENTIRE signature, so a duplicate
    flood of size d puts d rows in every band bucket and the self-join
    fans out d²/2 candidate pairs — the one LSH skew AQE cannot fix
    (join fan-out, not partition size). The guard collapses exact
    duplicates (md5 of the raw text) to one representative (min id)
    BEFORE shingling, runs LSH over representatives only — candidate
    pairs linear in DISTINCT docs — then restores multiplicity: each
    rep-level pair expands to its member cross product, and each
    group contributes its intra-group all-pairs at jaccard 1.0
    (byte-identical ⇒ identical shingle sets ⇒ jaccard exactly 1.0;
    groups whose docs are too short to shingle are skipped, matching
    the NULL-jaccard exclusion of the uncollapsed plan). Output is
    row-identical to ``collapse_exact=False``; only the join work
    changes.

    NOTE the pair-level CONTRACT is still quadratic under a flood: a
    d-copy duplicate group returns d(d-1)/2 jaccard-1.0 rows by
    definition. Flood-scale consumers who only need the keep/drop
    verdict should route through :func:`minhash_lsh_cluster_assign`
    (O(d) cluster rows, identical verdicts — see also
    ``dedup/clusters.py``).
    """
    # small-file scans arrive as one input partition; fan out so the
    # shingling/md5 CPU work uses every core (trivial shuffle: ids+text)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)

    members = None
    if collapse_exact:
        keyed = df.select(
            F.col(id_col), F.md5(F.col(text_col)).alias("_th")
        )
        groups = keyed.groupBy("_th").agg(F.min(id_col).alias("_rep"))
        members = keyed.join(groups, "_th").select(
            F.col(id_col).alias("_m"), "_rep"
        )
        # plain semi-join (reps can be ~|distinct docs| — let AQE pick
        # the strategy; both sides key on the id)
        df = df.join(
            groups.select(F.col("_rep").alias(id_col)), id_col, "left_semi"
        )

    sh = shingles(df, text_col, id_col, k).cache()
    sig = minhash_signature(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands)

    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    size_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    size_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    pairs = (
        inter.join(size_a, "id_a")
        .join(size_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if members is None:
        return pairs

    # restore multiplicity: rep-level pairs expand to the member cross
    # product (groups are disjoint, so no dup rows and a != b)
    ra = members.select(F.col("_rep").alias("id_a"), F.col("_m").alias("_a"))
    rb = members.select(F.col("_rep").alias("id_b"), F.col("_m").alias("_b"))
    cross = (
        pairs.join(ra, "id_a")
        .join(rb, "id_b")
        .select(
            F.least("_a", "_b").alias("id_a"),
            F.greatest("_a", "_b").alias("id_b"),
            "jaccard",
        )
    )
    # intra-group all-pairs at exact jaccard 1.0 — only for groups
    # whose text yields at least one shingle (too-short docs have
    # NULL jaccard in the uncollapsed plan and are excluded there)
    shingled_reps = sizes.where(F.col("n") > 0).select(
        F.col(id_col).alias("_rep")
    )
    mem = members.join(shingled_reps, "_rep", "left_semi")
    m1 = mem.select("_rep", F.col("_m").alias("id_a"))
    m2 = mem.select("_rep", F.col("_m").alias("id_b"))
    intra = (
        m1.join(m2, "_rep")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
        .where(F.lit(1.0) >= F.lit(threshold))  # constant-folds
    )
    return cross.unionByName(intra)


def minhash_lsh_cluster_assign(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Flood-to-clusters routing (r8 VERDICT item 5): the transitive
    dedup verdict ``(id_col, cluster, is_canonical)`` computed WITHOUT
    ever materializing pair-level rows — the scale-safe consumer the
    pair API's docstring points flood traffic at.

    ``minhash_lsh_dedup`` + ``dedup/clusters.dedup_assign`` produce the
    same verdicts, but the pair contract forces a d-copy duplicate
    flood to materialize d(d-1)/2 jaccard-1.0 rows first. Here the
    exact-hash collapse runs FIRST, near-dup pairs + connected
    components run over representatives only (work linear in DISTINCT
    docs), and members inherit their representative's component — so a
    flood contributes d cluster rows, never d²/2 pair rows.

    Output is row-identical to the pair-expanded path: a component's
    canonical id is its minimum member id, which equals the minimum
    representative id because each representative is already the
    minimum of its exact-duplicate group; groups too short to shingle
    never pair (NULL jaccard in the base plan), so their members stay
    singletons here too.
    """
    from erkg_tutorials_spark.graph.connected_components import (
        connected_components,
    )

    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    keyed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_th"))
    groups = keyed.groupBy("_th").agg(F.min(id_col).alias("_rep"))
    members = keyed.join(groups, "_th").select(
        F.col(id_col).alias("_m"), "_rep"
    )
    reps_df = df.join(
        groups.select(F.col("_rep").alias(id_col)), id_col, "left_semi"
    )

    sh = shingles(reps_df, text_col, id_col, k).cache()
    sig = minhash_signature(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    size_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    size_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    rep_pairs = (
        inter.join(size_a, "id_a")
        .join(size_b, "id_b")
        .where(
            # ROUNDED jaccard, matching minhash_lsh_dedup's pair filter
            # exactly (a 0.4999996 must round up on both paths)
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            )
            >= threshold
        )
        .select("id_a", "id_b")
    )
    # components over representative pairs only (the tiny graph)
    comp = connected_components(
        rep_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).withColumnRenamed("id", "_rep")
    # shingled groups: members inherit the rep's component (intra-group
    # jaccard is exactly 1.0 by byte-identity); non-shingled groups
    # never pair, so their members stay singletons
    shingled_reps = sizes.where(F.col("n") > 0).select(
        F.col(id_col).alias("_rep")
    )
    rep_cluster = shingled_reps.join(comp, "_rep", "left").select(
        "_rep", F.coalesce("component", F.col("_rep")).alias("_cluster")
    )
    mem_cluster = members.join(rep_cluster, "_rep").select(
        F.col("_m"), F.col("_cluster")
    )
    return (
        df.select(id_col)
        .join(mem_cluster, df[id_col] == F.col("_m"), "left")
        .select(
            F.col(id_col),
            F.coalesce("_cluster", F.col(id_col)).alias("cluster"),
            (F.col(id_col) == F.coalesce("_cluster", F.col(id_col))).alias(
                "is_canonical"
            ),
        )
    )

"""Approximate embedding near-dup via signed-random-projection LSH.

The third tier of embedding dedup (VERDICT r1 task 2's alternative
path), complementing `similarity/cosine_join.py`:

* exact tier    — centroid-bound-pruned join (bit-identical to
                  all-pairs, worst case output-bound);
* approximate   — THIS: sign(v·h_j) bit signatures, banded buckets,
                  exact cosine re-score of bucket collisions only.
                  Sub-quadratic candidate generation with tunable
                  recall (`bands`/`bits_per_band` trade recall for
                  candidates) — the tier a 100 TB pipeline actually
                  runs when near-dups are high-cosine.

Determinism/oracle story: hyperplanes are ±1 sign vectors derived
from md5(j|i) in PYTHON and inlined as literals into BOTH the Spark
plan and the DuckDB oracle SQL — so the approximation (including its
false negatives) replays bit-for-bit and the registered query is
fully hash-matched, unlike typical randomized LSH. Dot products are
in-order folds on both engines (the repo-wide convention).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erkg_tutorials_spark.similarity.knn import _as_double, _dot


def srp_signs(bits: int, dim: int) -> list[list[float]]:
    """±1 hyperplane components, md5(j|i)-derived — RNG-free, any
    engine/language reproduces them."""
    return [
        [
            1.0
            if int(hashlib.md5(f"{j}|{i}".encode()).hexdigest()[:2], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(bits)
    ]


def _bit_expr(row: list[float], vec: str) -> str:
    arr = "array(" + ", ".join(str(x) for x in row) + ")"
    return (
        f"CASE WHEN aggregate(zip_with({vec}, {arr}, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, v) -> acc + v) > 0 THEN '1' ELSE '0' END"
    )


def srp_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    bands: int = 8,
    bits_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a < id_b, cosine) for bucket-colliding pairs with rounded
    cosine >= threshold. Candidates are pairs sharing at least one
    band key; recall at cosine c is 1-(1-p^bits)^bands with
    p = 1 - acos(c)/pi (by construction, identical in any engine that
    replays the same sign vectors)."""
    signs = srp_signs(bands * bits_per_band, dim)
    v = vectors.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("emb")
    ).withColumn("vn", F.sqrt(_dot("emb", "emb")))
    band_cols = [
        F.concat(
            *[
                F.expr(_bit_expr(signs[b * bits_per_band + j], "emb"))
                for j in range(bits_per_band)
            ]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    sig = v.select("vid", "emb", "vn", *band_cols)
    buckets = None
    for b in range(bands):
        part = sig.select(
            "vid", "emb", "vn",
            F.lit(b).alias("band"), F.col(f"band{b}").alias("bkey"),
        )
        buckets = part if buckets is None else buckets.unionByName(part)
    a = buckets.select(
        F.col("band"), F.col("bkey"),
        F.col("vid").alias("id_a"), F.col("emb").alias("ea"), F.col("vn").alias("na"),
    )
    b_ = buckets.select(
        F.col("band"), F.col("bkey"),
        F.col("vid").alias("id_b"), F.col("emb").alias("eb"), F.col("vn").alias("nb"),
    )
    cand = (
        a.join(b_, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ea", "eb", "na", "nb")
        .distinct()
    )
    cos = F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 6)
    return (
        cand.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def srp_oracle_sql(
    source_sql: str,
    threshold: float,
    dim: int,
    bands: int = 8,
    bits_per_band: int = 4,
) -> str:
    """DuckDB twin: same inlined sign vectors, same band keys, same
    rescore. ``source_sql`` must yield (vec_id, embedding)."""
    signs = srp_signs(bands * bits_per_band, dim)

    def bit(row: list[float]) -> str:
        arr = "[" + ", ".join(str(x) for x in row) + "]::DOUBLE[]"
        return f"CASE WHEN list_dot_product(emb, {arr}) > 0 THEN '1' ELSE '0' END"

    band_exprs = ", ".join(
        "("
        + " || ".join(bit(signs[b * bits_per_band + j]) for j in range(bits_per_band))
        + f") AS band{b}"
        for b in range(bands)
    )
    union = "\n      UNION ALL\n".join(
        f"SELECT vec_id AS id, emb, {b} AS band, band{b} AS bkey FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM ({source_sql})
    ),
    sig AS MATERIALIZED (
      SELECT vec_id, emb, {band_exprs} FROM v
    ),
    buckets AS MATERIALIZED (
      {union}
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.id < b.id
    )
    SELECT c.id_a, c.id_b,
           ROUND(list_dot_product(va.emb, vb.emb)
             / (sqrt(list_dot_product(va.emb, va.emb)) * sqrt(list_dot_product(vb.emb, vb.emb))), 6) AS cosine
    FROM cand c
    JOIN v va ON va.vec_id = c.id_a
    JOIN v vb ON vb.vec_id = c.id_b
    WHERE ROUND(list_dot_product(va.emb, vb.emb)
             / (sqrt(list_dot_product(va.emb, va.emb)) * sqrt(list_dot_product(vb.emb, vb.emb))), 6) >= {threshold}
    """

"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the full corpus — one scan, no shuffle until the
per-query top-k window. At 100 TB the corpus side stays partitioned and
the broadcast keeps the join map-side; the top-k is a partial
(per-partition) + final aggregation via window over a tiny intermediate.

The dot product stays JVM-side with ``zip_with`` + ``aggregate`` (an
in-order fold, so the float math is reproducible across engines after
casting to double) — no Python UDF in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: str) -> "F.Column":
    return F.expr(f"transform({col}, x -> cast(x as double))")


def _dot(a: str, b: str) -> "F.Column":
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")


def argmax_one(
    df: DataFrame,
    keys: list[str],
    score: str,
    tie: str,
    payload: list[str],
) -> DataFrame:
    """One row per ``keys``: the row with the LARGEST ``score``, ties
    broken by SMALLEST ``tie`` — semantically the
    ``row_number() over (partition by keys order by score desc, tie asc) = 1``
    window, expressed as a ``min(struct(-score, tie, payload...))``
    aggregation instead.

    Why (guide §2.3, aggregate before you shuffle): the window form
    shuffles the WHOLE per-key candidate fan (|keys|·k rows for a
    k-centroid assignment join) and sorts every partition; the
    aggregation form partial-aggregates map-side, so the exchange
    carries one pre-reduced row per key per map partition and no sort
    runs. Requires (score, tie) unique per key — true for every
    centroid-assignment site (tie is the centroid id) — and a never
    NaN/NULL score, so the struct comparison never reaches the payload
    fields and the argmax is exactly the window's row 1.

    Returns ``*keys, *payload`` (payload columns keep their names).
    """
    sel = F.struct(
        (-F.col(score)).alias("_ns"),
        F.col(tie).alias("_t"),
        *[F.col(c).alias(c) for c in payload],
    )
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(F.min(sel).alias("_b"))
    return agg.select(*keys, *[F.col(f"_b.{c}").alias(c) for c in payload])


def argmin_one(
    df: DataFrame,
    keys: list[str],
    score: str,
    tie: str,
    payload: list[str],
) -> DataFrame:
    """:func:`argmax_one` twin for SMALLEST ``score`` (ties: smallest
    ``tie``) — the ``order by score asc, tie asc`` window's row 1 as a
    ``min(struct(score, tie, payload...))`` aggregation. Same
    uniqueness/no-NaN contract."""
    sel = F.struct(
        F.col(score).alias("_s"),
        F.col(tie).alias("_t"),
        *[F.col(c).alias(c) for c in payload],
    )
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(F.min(sel).alias("_b"))
    return agg.select(*keys, *[F.col(f"_b.{c}").alias(c) for c in payload])


def cosine_knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns ``(query_id, neighbor_id, cosine, rank)``; ``cosine`` is
    rounded to 6dp *before* ranking so ordering is engine-stable, with
    neighbor id as the deterministic tiebreak. Self-matches excluded.
    """
    # norms are precomputed per vector, not per pair: a |corpus|×|queries|
    # scoring loop would otherwise re-fold every corpus vector's norm
    # once per query (3 dot products per pair instead of 1). Numerically
    # identical — same in-order fold, same sqrt/multiply/divide.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cn", F.sqrt(_dot("cv", "cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", F.sqrt(_dot("qv", "qv")))
    joined = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(_dot("cv", "qv") / (F.col("cn") * F.col("qn")), 6)
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )

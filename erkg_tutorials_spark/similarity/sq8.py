"""Scalar quantization (SQ8) cosine ANN, parametric.

Extracted from plans/vectorq.py's registry query so the recall
experiment (tools/ann_recall_experiment.py, r8 VERDICT item 2) can
sweep the candidate-list size; the registry query calls back into
this module with its frozen constants, so the oracle contract is
unchanged.

Shape: per-dimension min/max grid (index state) → uint8 codes kept as
BIGINT so the coarse dot products and norms are exact integer
arithmetic (values ≤ 255 → dot ≤ 64·255² ≈ 4.2M, no overflow) →
coarse quantized-cosine ranking → exact rerank of the top ``cand``
per query. At 100 TB the coarse pass streams 1 byte/dim codes — 8×
smaller scans than float32 — and the exact pass touches only
``cand`` full-precision rows per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sq8_encode(vectors: DataFrame, grid: DataFrame, dim: int) -> DataFrame:
    """(vec_id, emb, code, cnorm2, en): uint8-as-BIGINT codes against
    the broadcast (mins, maxs) grid + the exact norms used by rerank."""
    v = vectors.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("emb")
    )
    return (
        v.crossJoin(F.broadcast(grid))
        .withColumn(
            "code",
            F.expr(
                f"transform(sequence(0, {dim - 1}), i -> "
                "CASE WHEN maxs[i] = mins[i] THEN 0L "
                "ELSE cast(least(255, cast(floor(((emb[i] - mins[i])"
                " / (maxs[i] - mins[i])) * 256.0) as int)) as bigint) END)"
            ),
        )
        .withColumn(
            "cnorm2",
            F.expr("aggregate(zip_with(code, code, (x, y) -> x * y), 0L, (a, b) -> a + b)"),
        )
        .withColumn(
            "en",
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(emb, emb, (x, y) -> x * y),"
                    " cast(0.0 as double), (a, b) -> a + b)"
                )
            ),
        )
        .select("vec_id", "emb", "code", "cnorm2", "en")
    )


def cosine_knn_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    grid: DataFrame,
    dim: int = 64,
    cand: int = 10,
    k: int = 3,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): coarse int8-cosine cut to
    ``cand`` candidates per query, exact cosine rerank to top ``k``.
    Deterministic: 6dp rounding before ranking, id tie-breaks —
    replayed bit-for-bit by plans/vectorq._SQ8_ORACLE."""
    coded = sq8_encode(corpus, grid, dim)
    q = sq8_encode(queries, grid, dim).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("code").alias("qcode"),
        F.col("cnorm2").alias("qnorm2"),
        F.col("en").alias("qen"),
    )
    coarse = (
        coded.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "acos",
            F.round(
                F.expr(
                    "aggregate(zip_with(code, qcode, (x, y) -> x * y), 0L, (a, b) -> a + b)"
                )
                / (F.sqrt(F.col("cnorm2")) * F.sqrt(F.col("qnorm2"))),
                6,
            ),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    shortlist = coarse.withColumn("crank", F.row_number().over(wc)).where(
        F.col("crank") <= cand
    )
    rerank = shortlist.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.expr(
                "aggregate(zip_with(emb, qemb, (x, y) -> x * y),"
                " cast(0.0 as double), (a, b) -> a + b)"
            )
            / (F.col("en") * F.col("qen")),
            6,
        ).alias("cosine"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return rerank.withColumn("rank", F.row_number().over(wr).cast("long")).where(
        F.col("rank") <= k
    )

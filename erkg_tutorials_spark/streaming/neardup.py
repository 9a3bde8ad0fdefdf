"""Streaming near-duplicate detection: new documents checked against
an indexed historical corpus by a stream-static banded MinHash join.

The batch tier (dedup/minhash.py) answers "which pairs in the corpus
are near-dups"; a production ingest pipeline asks the ONLINE twin:
"is this arriving document a near-dup of anything we already hold?"
This module restates the same operator streaming-first:

* the HISTORICAL side is indexed once as a batch table — per-doc
  shingle set + MinHash signature + banded keys (the exact hash
  family of dedup/minhash.py, so verdicts are bit-compatible with the
  batch pair set);
* the ARRIVING side computes its shingle set, signature, and band
  keys PER ROW with array expressions (``array_distinct`` +
  ``array_min`` over ``transform``) — no aggregation, no shuffle, so
  the streaming plan is stateless and needs no watermark;
* candidates come from a stream-static inner join on ``(band,
  bkey)``, verified exactly with ``array_intersect`` set Jaccard
  before emission. Stateless stream-static inner joins emit each
  match exactly once per micro-batch; a pair colliding in both bands
  emits twice and is collapsed by the caller's post-drain distinct
  (same contract as the batch ``lsh_candidate_pairs`` distinct).

Scale notes (100 TB): the band index is ~|distinct historical docs| ×
bands rows of fixed-width keys — broadcast while it fits (the demo
path); beyond that, persist the index bucketed by ``bkey`` so each
micro-batch shuffles only its own (small) arriving rows to the
bucketed partitions. State is zero either way — the historical corpus
lives in the index, not in the state store, which is what makes this
shape viable where a stream-stream self-join (state = whole corpus)
is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def mapside_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Per-row shingle set + MinHash signature + banded keys:
    ``(id, shl, band, bkey)`` with NO aggregation (streaming-safe).

    Identical hash family to dedup/minhash.py — ``md5(f"{i}|" +
    shingle)`` with the lexicographic min, here as ``array_min`` over
    a ``transform`` instead of a groupBy ``min``; band keys are the
    same in-order concat of the band's hex digests. Docs too short to
    shingle get NULL signatures → NULL band keys → dropped by any
    equi-join, matching the batch plan's exclusion of unshingleable
    docs."""
    r = num_hashes // bands
    w = F.split(F.lower(F.col(text_col)), " ")
    shl = F.when(
        F.size(w) >= k,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(split(lower({text_col}), ' ')) - {k} + 1),"
                f" i -> array_join(slice(split(lower({text_col}), ' '), i, {k}), ' '))"
            )
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    out = df.select(F.col(id_col).alias("id"), shl.alias("shl"))
    for i in range(num_hashes):
        out = out.withColumn(
            f"h{i}",
            F.array_min(F.expr(f"transform(shl, s -> md5(concat('{i}|', s)))")),
        )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*[F.col(f"h{b * r + j}") for j in range(r)]).alias("bkey"),
        )
        for b in range(bands)
    ]
    return out.select(
        "id", "shl", F.explode(F.array(*band_structs)).alias("_bb")
    ).select(
        "id",
        "shl",
        F.col("_bb.band").alias("band"),
        F.col("_bb.bkey").alias("bkey"),
    )


def historical_band_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Batch-side index of the historical corpus:
    ``(hist_id, band, bkey, hist_shl)`` — banded signature keys plus
    the exact shingle set for verification, one row per (doc, band)."""
    from erkg_tutorials_spark.dedup.minhash import minhash_signature, shingles

    sh = shingles(docs, text_col, id_col, k)
    sig = minhash_signature(sh, id_col, num_hashes)
    sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("hist_shl"))
    r = num_hashes // bands
    frames = []
    for b in range(bands):
        key = F.concat(*[F.col(f"h{b * r + j}") for j in range(r)])
        frames.append(
            sig.select(
                F.col(id_col).alias("hist_id"),
                F.lit(b).alias("band"),
                key.alias("bkey"),
            )
        )
    banded = frames[0]
    for f in frames[1:]:
        banded = banded.unionByName(f)
    return banded.join(
        sets.select(F.col(id_col).alias("hist_id"), "hist_shl"), "hist_id"
    )


def neardup_verdicts_stream(
    arriving: DataFrame, index: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Stream-static banded join + exact Jaccard verify:
    ``(new_id, hist_id, jaccard)`` for every arriving doc whose
    shingle-set Jaccard with a historical doc is >= threshold.
    ``index`` is broadcast (see module scale notes for the bucketed
    alternative past broadcast size)."""
    mh = mapside_minhash(arriving)
    joined = mh.join(F.broadcast(index), ["band", "bkey"])
    inter = F.size(F.array_intersect(F.col("shl"), F.col("hist_shl")))
    union = F.size("shl") + F.size("hist_shl") - inter
    jac = F.round(inter / union, 6)
    return (
        joined.select(
            F.col("id").alias("new_id"),
            F.col("hist_id"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )

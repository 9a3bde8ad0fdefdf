"""SimHash near-duplicate fingerprinting, pure SQL expressions.

64-bit SimHash built from md5 token hashes: bit b of the fingerprint
is the majority vote of bit b across all token hashes (weighted by
occurrence). Everything is expressed over *hex nibbles* (16 hex chars
= 64 bits) with only md5 / substring / instr / integer arithmetic —
primitives every engine computes identically, which keeps the DuckDB
oracle bit-for-bit (no engine-specific hash or bit ops).

Near-dup pairs then come from banding the 16 hex chars into 4 bands of
4 (exact-match band join → candidates) and verifying Hamming distance
— same LSH shape as MinHash, tuned for cheap storage (8 bytes/doc at
100 TB scale vs a full MinHash signature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 16-hex-char (64-bit) fingerprint."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    toks = df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).withColumn("h", F.md5("tok"))
    # nibble value at hex position p of the token hash
    nib = lambda p: F.instr(F.lit(HEX), F.substring("h", p, 1)) - 1
    # vote for bit k of position p: +1 if set, -1 if clear
    vote = lambda p, k: F.sum(
        F.when((F.floor(nib(p) / (2 ** k)) % 2) == 1, 1).otherwise(-1)
    )
    aggs = [vote(p, k).alias(f"v_{p}_{k}") for p in range(1, 17) for k in range(4)]
    voted = toks.groupBy(id_col).agg(*aggs)
    out_nib = [
        sum(
            (F.when(F.col(f"v_{p}_{k}") > 0, F.lit(2 ** k)).otherwise(F.lit(0)))
            for k in range(4)
        )
        for p in range(1, 17)
    ]
    chars = [F.substr(F.lit(HEX), (n + F.lit(1)).cast("int"), F.lit(1)) for n in out_nib]
    return voted.select(id_col, F.concat(*chars).alias("simhash"))


def simhash_oracle_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`simhash` (generated, same vote structure)."""
    nib = lambda p: f"(strpos('{HEX}', substr(h, {p}, 1)) - 1)"
    vote = lambda p, k: (
        f"SUM(CASE WHEN (CAST(FLOOR({nib(p)} / {2 ** k}) AS BIGINT) % 2) = 1 THEN 1 ELSE -1 END)"
    )
    votes = ", ".join(
        f"{vote(p, k)} AS v_{p}_{k}" for p in range(1, 17) for k in range(4)
    )
    out_chars = " || ".join(
        "substr('%s', (%s) + 1, 1)"
        % (HEX, " + ".join(f"(CASE WHEN v_{p}_{k} > 0 THEN {2 ** k} ELSE 0 END)" for k in range(4)))
        for p in range(1, 17)
    )
    return f"""
    WITH toks AS (
      SELECT {id_col}, md5(unnest(string_split(lower({text_col}), ' '))) AS h FROM {table}
    ),
    voted AS (SELECT {id_col}, {votes} FROM toks GROUP BY {id_col})
    SELECT {id_col}, {out_chars} AS simhash FROM voted
    """


def hamming_hex(a: str, b: str) -> "F.Column":
    """Bit-level Hamming distance between two 16-hex-char columns,
    via per-position nibble popcount (portable integer arithmetic)."""
    terms = []
    for p in range(1, 17):
        na = F.instr(F.lit(HEX), F.substring(a, p, 1)) - 1
        nb = F.instr(F.lit(HEX), F.substring(b, p, 1)) - 1
        for k in range(4):
            terms.append(
                F.when((F.floor(na / (2 ** k)) % 2) != (F.floor(nb / (2 ** k)) % 2), 1).otherwise(0)
            )
    return sum(terms)


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """(id_a, id_b, hamming) candidate pairs via 4-hex-char band join,
    verified by exact Hamming distance ≤ max_hamming."""
    sig = simhash(df, text_col, id_col).cache()
    bands = None
    for b in range(4):
        part = sig.select(
            F.col(id_col).alias("id"),
            F.col("simhash"),
            F.lit(b).alias("band"),
            F.substring("simhash", b * 4 + 1, 4).alias("bkey"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.alias("a")
    bb = bands.alias("b")
    cand = (
        a.join(bb, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming_hex("sig_a", "sig_b"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

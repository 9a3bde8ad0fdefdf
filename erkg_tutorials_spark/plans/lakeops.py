"""Lakehouse table-maintenance operators as first-class registry
queries: the ingest-side primitives a 100 TB deployment runs daily.

- ``cdc_apply_changes``: apply an ordered change-data-capture stream
  (insert/update/delete per key, sequence-numbered) to produce the
  current snapshot — the core of Delta/Iceberg MERGE-based CDC sinks.
  One window argmax per key; no join against a base table is needed
  because the latest change row carries the full payload (Debezium
  "after" image semantics).
- ``zone_map_stats``: per-block min/max/count statistics over a fact
  table — the data-skipping index every columnar format maintains
  (parquet row-group stats, Delta file stats, ORC stripe footers) —
  plus the prunability verdict for a concrete predicate, i.e. exactly
  what a scan planner computes when it skips blocks.
- ``sample_bottom_k``: deterministic distributed uniform sampling by
  hash order (bottom-k / KMV sampling). ORDER BY hash LIMIT k compiles
  to TakeOrderedAndProject — per-partition top-k heaps merged on one
  reducer, so the full table is never shuffled; the hash makes the
  sample reproducible across engines, runs, and partitionings, which
  `TABLESAMPLE`/`rand()` sampling is not.

All arithmetic is exact (integer cents, integer keys, md5 ordering) —
no cross-engine float-order risk anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import load_tables
from erkg_tutorials_spark.functions.exact_math import money_cents, sql_money_cents

QUERIES: dict = {}
ORACLES: dict = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# CDC apply. The change stream is synthesized deterministically from
# orders (k = key%3 + 1 versions per key; the last version is a DELETE
# for keys ≡ 0 mod 5), so both engines derive the identical input. The
# apply itself is the general algorithm: latest sequence number per
# key wins, a terminal delete erases the key. At scale this is one
# shuffle on the key — and because only the ARGMAX row survives, the
# shuffle can carry pre-reduced per-partition maxima (Spark's
# max_by/window partial aggregation does this automatically).
# ---------------------------------------------------------------------------
@register(
    "cdc_apply_changes",
    f"""
    WITH changes AS (
      SELECT o_orderkey AS key,
             CAST(s.seq AS BIGINT) AS seq,
             CASE
               WHEN s.seq = o_orderkey % 3
                    AND o_orderkey % 5 = 0 THEN 'D'
               WHEN s.seq = 0 THEN 'I'
               ELSE 'U'
             END AS op,
             {sql_money_cents('o_totalprice')} + s.seq * 7 AS price_cents,
             o_orderstatus AS status
      FROM orders, UNNEST(generate_series(0, o_orderkey % 3)) AS s(seq)
    ),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM changes
    )
    SELECT key, op AS last_op, price_cents, status,
           CAST(seq + 1 AS BIGINT) AS n_versions
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current snapshot after applying the synthetic CDC stream."""
    o = load_tables(spark, sf_dir)["orders"]
    k = F.col("o_orderkey") % 3
    changes = (
        o.select(
            F.col("o_orderkey").alias("key"),
            F.explode(F.sequence(F.lit(0), k.cast("int"))).alias("seq"),
            k.alias("kmax"),
            money_cents(F.col("o_totalprice")).alias("base_cents"),
            F.col("o_orderstatus").alias("status"),
        )
        .select(
            "key",
            F.col("seq").cast("long").alias("seq"),
            F.when(
                (F.col("seq") == F.col("kmax")) & (F.col("key") % 5 == 0), "D"
            )
            .when(F.col("seq") == 0, "I")
            .otherwise("U")
            .alias("op"),
            (F.col("base_cents") + F.col("seq") * 7).alias("price_cents"),
            "status",
        )
    )
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "key",
            F.col("op").alias("last_op"),
            "price_cents",
            "status",
            (F.col("seq") + 1).alias("n_versions"),
        )
    )


# ---------------------------------------------------------------------------
# Zone maps. Blocks are fixed key ranges (zone = l_orderkey div 4096 —
# the layout a write-sorted-by-orderkey table produces), stats are the
# parquet/Delta per-file set: row count, key min/max, value min/max,
# distinct parts. ``prunable`` answers "could a scan with
# l_quantity >= 45 skip this whole block?" — max < threshold ⇒ yes.
# One groupBy over the fact; every stat is an exact min/max/count.
# ---------------------------------------------------------------------------
ZONE_SIZE = 4096
ZONE_PRUNE_QTY = 45


@register(
    "zone_map_stats",
    f"""
    SELECT l_orderkey // {ZONE_SIZE} AS zone,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
           CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
           CAST(MAX(l_quantity) AS BIGINT) AS max_qty,
           MIN({sql_money_cents('l_extendedprice')}) AS min_price_cents,
           MAX({sql_money_cents('l_extendedprice')}) AS max_price_cents,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(MAX(l_quantity) AS BIGINT) < {ZONE_PRUNE_QTY} AS prunable
    FROM lineitem
    GROUP BY 1
    """,
)
def zone_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-zone data-skipping stats + prunability for qty >= 45."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy(
            F.expr(f"l_orderkey div {ZONE_SIZE}").alias("zone")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
            F.min("l_quantity").cast("long").alias("min_qty"),
            F.max("l_quantity").cast("long").alias("max_qty"),
            F.min(money_cents(F.col("l_extendedprice"))).alias("min_price_cents"),
            F.max(money_cents(F.col("l_extendedprice"))).alias("max_price_cents"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .withColumn("prunable", F.col("max_qty") < ZONE_PRUNE_QTY)
    )


# ---------------------------------------------------------------------------
# Bottom-k hash sampling: the k orders with the smallest
# md5('smp|' || key), then a downstream aggregate over the sample.
# The sample is a true uniform-without-replacement draw (md5 is a
# fixed random permutation of the key space), reproducible everywhere.
# ---------------------------------------------------------------------------
SAMPLE_K = 500


@register(
    "sample_bottom_k",
    f"""
    WITH smp AS (
      SELECT o_orderpriority, {sql_money_cents('o_totalprice')} AS cents
      FROM orders
      ORDER BY md5('smp|' || o_orderkey) ASC, o_orderkey ASC
      LIMIT {SAMPLE_K}
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM smp GROUP BY o_orderpriority
    """,
)
def sample_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority totals over a deterministic 500-order sample."""
    o = load_tables(spark, sf_dir)["orders"]
    smp = (
        o.select(
            "o_orderpriority",
            money_cents(F.col("o_totalprice")).alias("cents"),
            F.md5(F.concat(F.lit("smp|"), F.col("o_orderkey"))).alias("h"),
            "o_orderkey",
        )
        .orderBy(F.asc("h"), F.asc("o_orderkey"))
        .limit(SAMPLE_K)
    )
    return smp.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("cents").alias("sum_cents")
    )

"""Bucketed-table support: shuffle-free co-located joins at scale.

SCALING.md's k-hop note ("pre-partition edges by src so every hop is a
co-located join") concretely: write the edge/fact table bucketed by
its join key once, and every subsequent equi-join or aggregation on
that key skips its exchange. At 100 TB the one-time bucketed write is
amortized over every downstream hop/join/agg of a reused artifact
(edge tables, KB alias tables, entity embeddings).

Spark bucketing rides the session catalog (``saveAsTable``); readers
must join bucketed-to-bucketed with equal bucket counts, or Spark
falls back to shuffling the unbucketed side only — still a win.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_location(spark: SparkSession, table: str) -> None:
    """Drop ``table`` and remove any orphaned managed location (a
    killed overwrite can leave the directory behind without catalog
    metadata, which blocks the next saveAsTable). Local-filesystem
    warehouses only — remote URIs (s3/hdfs) are left to the catalog."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    parsed = urlparse(warehouse)
    if parsed.scheme not in ("", "file"):
        return
    path = parsed.path or warehouse
    # managed layout: <warehouse>/<table> for the default db,
    # <warehouse>/<db>.db/<table> for qualified names
    parts = table.lower().split(".")
    rel = parts[-1] if len(parts) == 1 else f"{parts[-2]}.db/{parts[-1]}"
    shutil.rmtree(f"{path.rstrip('/')}/{rel}", ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table in the session catalog. ``n_buckets`` should match the
    cluster's target join parallelism (and the other side's count)."""
    if mode == "overwrite":
        _clear_location(df.sparkSession, table)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

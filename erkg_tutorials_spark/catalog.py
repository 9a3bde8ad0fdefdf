"""Load and register the driver-provisioned parquet tables.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings.

The catalog is *lazy per table*: a query that touches only ``lineitem``
never opens any other file (keeps scan-time schema work minimal and
avoids tripping over the events table's TIMESTAMP(NANOS) encoding in
sessions that don't need it).
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table and normalize its ``ts`` encoding.

    The driver has shipped the events parquet in two encodings across
    rounds — TIMESTAMP(NANOS) (readable only as a BIGINT of
    epoch-nanoseconds via ``spark.sql.legacy.parquet.nanosAsLong``) and
    plain ``timestamp[us]``. Both normalize to the same two columns so
    downstream operators never see the difference:

    - ``ts_ns``  — BIGINT epoch-nanoseconds (exact ordering key)
    - ``ts_sec`` — BIGINT whole epoch seconds (integer division, no
      double rounding; epoch values in the testdata are positive so
      truncating ``div`` equals floor, matching DuckDB's
      ``FLOOR(epoch(ts))``)

    The session timezone is pinned to UTC (session.py), so a
    TIMESTAMP_NTZ value converts to epoch micros without offset.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(df.schema["ts"].dataType, LongType):
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
        )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        df.withColumn("ts_ns", us * F.lit(1000))
        .drop("ts")
        .withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
    )


class TableCatalog(Mapping):
    """Lazy per-table access: ``catalog["lineitem"]`` reads on first use."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(name)
        if name not in self._cache:
            if name == "events":
                self._cache[name] = read_events(self._spark, self._sf_dir)
            else:
                self._cache[name] = self._spark.read.parquet(
                    os.path.join(self._sf_dir, f"{name}.parquet")
                )
        return self._cache[name]

    def __iter__(self):
        return iter(TABLES)

    def __len__(self):
        return len(TABLES)


def load_tables(spark: SparkSession, sf_dir: str) -> TableCatalog:
    """Lazy catalog over every testdata table."""
    return TableCatalog(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> TableCatalog:
    """Register each table as a temp view (for the spark.sql tier)."""
    cat = load_tables(spark, sf_dir)
    for name in TABLES:
        cat[name].createOrReplaceTempView(name)
    return cat

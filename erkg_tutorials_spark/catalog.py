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


def _local_footer_schema(spark: SparkSession, path: str):
    """Driver-side parquet footer read → Spark schema.

    ``spark.read.parquet`` without a declared schema launches a tiny
    distributed footer-merge job on EVERY call — per first table touch
    per query invocation. Reading the footer on the driver (pyarrow)
    and declaring the converted schema removes that job entirely: a
    cold ``explain`` is job-free (r6 VERDICT item 7) and each query
    saves a scheduler round-trip. At warehouse scale this role is
    played by the metastore's declared table schema; here the local
    footer IS the metastore. Non-local paths (object stores) and any
    conversion surprise fall back to Spark's own inference — behavior,
    not just types, is identical either way (pinned by
    tests/test_memo.py's schema-equality assertion)."""
    f = path if os.path.isfile(path) else None
    if f is None and os.path.isdir(path):
        import glob

        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        f = files[0] if files else None
    if f is None:
        return None
    try:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        ntz = (
            spark.conf.get(
                "spark.sql.parquet.inferTimestampNTZ.enabled", "true"
            )
            == "true"
        )
        return from_arrow_schema(
            pq.ParquetFile(f).schema_arrow, prefer_timestamp_ntz=ntz
        )
    except Exception:
        return None


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
                # events keeps Spark-side inference: its ts column has
                # shipped as both TIMESTAMP(NANOS) and timestamp[us]
                # across rounds, and read_events keys its nanosAsLong
                # normalization off the INFERRED type.
                self._cache[name] = read_events(self._spark, self._sf_dir)
            else:
                path = os.path.join(self._sf_dir, f"{name}.parquet")
                schema = _local_footer_schema(self._spark, path)
                reader = self._spark.read
                if schema is not None:
                    reader = reader.schema(schema)
                self._cache[name] = reader.parquet(path)
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

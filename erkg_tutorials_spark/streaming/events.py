"""Structured Streaming tier over the events table (SURVEY.md §2.13).

The reference is batch-only; this is the declared extension: the same
operator implementations (hourly rollup, sessionization) exposed as
streaming queries — file source → watermarked event-time windows →
sink. ``Trigger.AvailableNow`` drains the backlog and stops, which is
both the test harness mode and the production backfill mode.

The batch catalog (catalog.read_events) normalizes the two ts
encodings the driver has shipped — TIMESTAMP(NANOS) (ns-longs via the
legacy reader flag) and plain ``timestamp[us]``. Streaming needs an
explicit schema up front, so ``read_events_stream`` peeks at the batch
footer schema once, streams with the matching schema, and normalizes
to the same ``event_time`` (µs timestamp) column either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# Legacy testdata encoding: ts was TIMESTAMP(NANOS), readable only as a
# BIGINT of epoch-nanoseconds under spark.sql.legacy.parquet.nanosAsLong.
EVENTS_SCHEMA_NANOS = StructType(
    [f if f.name != "ts" else StructField("ts", LongType()) for f in EVENTS_SCHEMA]
)


def with_event_time(events: DataFrame) -> DataFrame:
    """Normalize either ts encoding to an ``event_time`` µs timestamp."""
    if isinstance(events.schema["ts"].dataType, LongType):
        return events.withColumn(
            "event_time", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return events.withColumn("event_time", F.col("ts").cast("timestamp"))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (event-time = ts)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_ts = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .schema["ts"]
        .dataType
    )
    schema = (
        EVENTS_SCHEMA_NANOS if isinstance(batch_ts, LongType) else EVENTS_SCHEMA
    )
    return with_event_time(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup — the streaming twin of the
    batch ``events_hourly_rollup`` query (late rows beyond the
    watermark are dropped; state is bounded)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
        )
    )


def sliding_rollup_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window rollup — streaming twin of the batch
    ``events_sliding_window`` query. Each event lands in
    window/slide overlapping windows; state is bounded by the
    watermark."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window, slide), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication — the streaming tier of the dedup
    family (dedup/exact.py is the batch twin).

    Uses ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates``
    only evicts state when the event-time column is itself part of the
    dedup keys — with key-only subsets (the normal case, e.g.
    ``event_id``) its state grows unboundedly, one entry per key ever
    seen. The WithinWatermark variant evicts each key once the
    watermark passes its first-seen event time, which is the bounded-
    state semantics an at-least-once ingest feed needs (duplicates
    arrive within the replay horizon, i.e. the watermark)."""
    keys = keys or ["event_id"]
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_stream_once(result: DataFrame, query_name: str) -> None:
    """Drain all available input into an in-memory sink and stop
    (AvailableNow trigger). Results land in the ``query_name`` temp view."""
    (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

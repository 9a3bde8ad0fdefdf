"""Exactly-once file sink for Structured Streaming (§2.13 capstone).

Structured Streaming's ``foreachBatch`` gives at-least-once delivery:
after a crash between the sink write and the checkpoint commit, the
engine REPLAYS the same micro-batch with the same ``batch_id``.
Exactly-once therefore means *idempotent* writes keyed by the epoch —
the standard production recipe (Spark docs, "foreachBatch — write to
multiple locations / idempotence"):

* every output row lands under a ``_epoch_id=<batch_id>`` partition;
* the write uses dynamic partition overwrite, so replaying epoch N
  atomically REPLACES epoch N's files instead of appending next to
  them — a torn first attempt leaves no residue;
* readers project ``_epoch_id`` away (``read_exactly_once_sink``).

Scale posture: partition-overwrite touches only the replayed epoch's
directory (not the table), commits through the normal FileOutputCommitter
rename protocol, and adds no driver-side state — the dedup "ledger" IS
the filesystem layout, which any object store with atomic rename
prefixes (or a table format like Iceberg/Delta, the natural upgrade)
provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_COL = "_epoch_id"


def exactly_once_parquet_writer(path: str):
    """``foreachBatch`` callable writing each micro-batch to
    ``path/_epoch_id=<batch_id>/`` with dynamic partition overwrite —
    replaying a batch (same ``batch_id``) replaces its own partition,
    so the sink holds every row exactly once no matter how many times
    an epoch is retried."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(EPOCH_COL, F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(EPOCH_COL)
            .parquet(path)
        )

    return write


def read_exactly_once_sink(spark: SparkSession, path: str) -> DataFrame:
    """The sink table without the epoch bookkeeping column."""
    return spark.read.parquet(path).drop(EPOCH_COL)


def write_stream_exactly_once(
    df: DataFrame, path: str, checkpoint: str, available_now: bool = True
):
    """Wire a streaming DataFrame into the exactly-once sink; returns
    the started StreamingQuery. ``available_now`` drains the backlog
    and stops (test/backfill mode); pass False for a continuous run."""
    writer = (
        df.writeStream.foreachBatch(exactly_once_parquet_writer(path))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

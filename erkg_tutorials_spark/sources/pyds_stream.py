"""Custom STREAMING Python DataSource (Spark 4
``DataSourceStreamReader``): an offset-tracked deterministic range
source — the template for streaming ingests Spark has no built-in for
(queues, change feeds, internal log services).

API contract demonstrated:

* ``initialOffset``/``latestOffset`` — offsets are plain dicts
  (``{"row": n}``); the engine checkpoints them, so a restarted query
  resumes where the committed offset left off.
* ``partitions(start, end)`` — each micro-batch's offset range is
  split into ``chunk``-sized input partitions: intra-batch
  parallelism is the SOURCE's decision, exactly like the batch
  reader's file × row-group planning.
* ``read(partition)`` — rows are a pure function of the row index, so
  any replay of any partition yields identical data (the property
  exactly-once delivery needs from a source).
* ``commit(end)`` — no-op here; a real queue source would ack/trim.

The emitted row is integer-deterministic so a SQL oracle can replay
it exactly: ``id``, ``bucket = id % 10``, and
``cents = (id * 2654435761) % 10000`` (Knuth's multiplicative hash —
BIGINT-exact in both engines; id <= (2^63 - 1) // 2654435761
≈ 3.47e9 keeps the product inside int64, and ``RangeStreamReader``
validates the ``rows`` option against that bound so an ANSI-mode
BIGINT replay of the cents formula can never overflow).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

KNUTH = 2654435761
DEFAULT_ROWS = 100_000
DEFAULT_CHUNK = 12_500
# Largest id whose cents product stays BIGINT-exact: beyond this,
# id * KNUTH overflows int64 and any ANSI-mode SQL replay errors.
MAX_ROWS = ((1 << 63) - 1) // KNUTH  # 3_473_400_270


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RangeStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        if self.rows > MAX_ROWS:
            raise ValueError(
                f"range_stream: rows={self.rows} exceeds {MAX_ROWS}; "
                "larger ids overflow int64 in the cents formula"
            )
        self.chunk = int(options.get("chunk", DEFAULT_CHUNK))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # A fixed backlog: AvailableNow drains [0, rows) and stops. A
        # live source would return its current high-water mark here.
        return {"row": self.rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["row"]), int(end["row"])
        return [
            RangePartition(i, min(i + self.chunk, hi))
            for i in range(lo, hi, self.chunk)
        ]

    def read(self, partition: RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, i % 10, (i * KNUTH) % 10_000)

    def commit(self, end: dict) -> None:
        pass


class RangeStreamDataSource(DataSource):
    """``spark.readStream.format("range_stream").option("rows", n)
    .load()``"""

    @classmethod
    def name(cls) -> str:
        return "range_stream"

    def schema(self) -> str:
        return "id bigint, bucket bigint, cents bigint"

    def streamReader(self, schema) -> RangeStreamReader:
        return RangeStreamReader(self.options)


def register_range_stream(spark) -> None:
    """Idempotent per-session registration of the format."""
    key = "_erkg_range_stream_registered"
    if not getattr(spark, key, False):
        spark.dataSource.register(RangeStreamDataSource)
        setattr(spark, key, True)

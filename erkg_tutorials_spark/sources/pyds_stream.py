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
* ``commit(end)`` — no-op by default; with ``ack_dir`` set the
  committed high-water mark is persisted (atomic tmp+rename), the
  ack/trim a real queue source performs. Combined with
  ``max_batch_rows`` (per-micro-batch cap on ``latestOffset``) this
  gives genuinely multi-batch drains whose progress survives a
  kill-mid-drain: a restarted query replays at most the one planned-
  but-uncommitted batch from Spark's offset log, then resumes from
  the acked floor — see tests/test_pyds.py restart tests.

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
        # Rate-capped + ack-persisted mode (restart-safe multi-batch):
        # max_batch_rows caps how far latestOffset advances past the
        # last COMMITTED offset; ack_dir persists that committed
        # floor so a fresh reader instance (query restart) resumes
        # ratcheting from durable state instead of 0. The pairing is
        # mandatory: a capped ratchet that restarts from 0 would hand
        # Spark a latestOffset BELOW the checkpointed start offset.
        self.max_batch_rows = int(options.get("max_batch_rows", 0))
        self.ack_dir = options.get("ack_dir")
        if self.max_batch_rows and not self.ack_dir:
            raise ValueError(
                "range_stream: max_batch_rows requires ack_dir — "
                "without a persisted ack floor a restarted reader "
                "would regress latestOffset below the checkpoint"
            )
        # Highest offset this reader INSTANCE has planned a batch up
        # to (partitions() ratchets it). Spark defers commit() until
        # the next batch is constructed, so the committed floor alone
        # would deadlock a rate-capped drain at one batch; planning
        # progress is what latestOffset must advance from within a
        # run, with the durable ack as the cross-restart floor.
        self._planned = 0

    def _ack_path(self) -> str:
        import os

        return os.path.join(self.ack_dir, "ack")

    def _acked(self) -> int:
        """The durably committed high-water mark (0 if never acked).
        Read fresh on every call — the value must be visible to a
        reader instance created after a crash/restart."""
        import os

        if not self.ack_dir or not os.path.exists(self._ack_path()):
            return 0
        with open(self._ack_path()) as fh:
            return int(fh.read().strip() or 0)

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # Default: a fixed backlog — AvailableNow drains [0, rows) in
        # one batch and stops. With max_batch_rows, advance at most
        # one cap past the durable ack floor; Spark replays any
        # planned-but-uncommitted batch from its own offset log
        # FIRST (via partitions(start, end), not this method), then
        # commit() raises the floor, so this never regresses below
        # the checkpointed start.
        if self.max_batch_rows:
            floor = max(self._planned, self._acked())
            return {"row": min(self.rows, floor + self.max_batch_rows)}
        return {"row": self.rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["row"]), int(end["row"])
        # Ratchet planning progress — on restart, the replay of the
        # planned-but-uncommitted batch from Spark's offset log lands
        # here BEFORE any latestOffset call, re-seeding the in-memory
        # floor past the checkpointed frontier.
        self._planned = max(self._planned, hi)
        return [
            RangePartition(i, min(i + self.chunk, hi))
            for i in range(lo, hi, self.chunk)
        ]

    def read(self, partition: RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, i % 10, (i * KNUTH) % 10_000)

    def commit(self, end: dict) -> None:
        # Ack/trim: persist the committed high-water mark atomically
        # (tmp + rename) so a post-crash reader resumes ratcheting
        # from durable state. Floors monotone: a replayed commit of
        # an already-acked batch never moves the mark backwards.
        if self.ack_dir:
            import os

            os.makedirs(self.ack_dir, exist_ok=True)
            mark = max(int(end["row"]), self._acked())
            tmp = self._ack_path() + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(str(mark))
            os.rename(tmp, self._ack_path())


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

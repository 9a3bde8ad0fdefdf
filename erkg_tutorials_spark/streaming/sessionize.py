"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.13 extension tier).

Per user, events accumulate into a session until a gap >
``gap_seconds`` appears; closed sessions are emitted downstream, the
open session survives in state (and is flushed by processing-time
timeout in a live stream). This is the canonical "operator Spark lacks
as a one-liner" that the stateful API covers — the batch twin
(``events_sessionize`` in plans/eventsq.py) is oracle-checked, and the
test asserts the streaming operator emits exactly the batch sessions
minus each user's still-open tail session.

State shape per user: (session_start, last_seen, n_events) — O(1)
per key, so state size is bounded by |active users|, not event volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_sec", LongType()),
        StructField("end_sec", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_sec", LongType()),
        StructField("last_sec", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int | None = None,
) -> DataFrame:
    """events must carry (user_id, ts_sec). Emits closed sessions.

    ``timeout_ms=None`` (default) registers no processing-time timeout:
    open sessions stay in state and the query can drain and stop under
    ``trigger(availableNow=True)`` — a live stream with a registered
    timeout keeps scheduling micro-batches to honor it, so an
    exhausted-source backfill would otherwise never terminate. Pass a
    timeout only for continuously-running streams that must flush idle
    users' tail sessions.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last, n)],
                columns=["user_id", "start_sec", "end_sec", "n_events"],
            )
            return

        secs = []
        for pdf in pdfs:
            secs.extend(int(s) for s in pdf["ts_sec"])
        secs.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for s in secs:
            if start is None:
                start, last, n = s, s, 1
            elif s - last > gap_seconds:
                closed.append((user_id, start, last, n))
                start, last, n = s, s, 1
            else:
                last, n = s, n + 1
        state.update((start, last, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "start_sec", "end_sec", "n_events"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )

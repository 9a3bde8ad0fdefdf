"""Size-aware broadcast hinting for |V|-row state in the iterative
graph family (r9 VERDICT item 2: make the 100x fallback a knob).

Every iterative algorithm here (coloring, MIS, MST, Louvain,
betweenness, Katz/eigenvector/PPR rank loops) keeps O(|V|)-row state
— ranks, labels, priorities, frontiers — joined against the O(|E|)
edge table each round. Below a size threshold, broadcasting that
state makes each round's join map-side against the cached edge
partitions: the right call on every graph that fits (the |V| table is
orders of magnitude smaller than |E|). At 10^9 vertices the broadcast
is the first thing to break, and the documented fallback is to drop
the hint and let the join co-shuffle on the vertex key — the edge
table is already hash-partitioned from its own build, so AQE reuses
the exchange.

``vhint`` is that decision as one helper instead of a code edit:

- ``SPARK_GRAFT_GRAPH_BCAST=0`` force-disables every hint (pure
  co-shuffle plans; the parity test in tests/test_coloring.py runs a
  representative algorithm this way and asserts identical output).
- ``SPARK_GRAFT_GRAPH_BCAST_MAX_ROWS`` (default 10_000_000): when the
  caller passes a row estimate, the hint applies only below this.
  10M (id, value) rows serialize to ~100-300 MB — comfortably inside
  a multi-GB executor, well past where the hint stops being a win.
  Callers without a cheap estimate pass ``rows=None`` and the hint
  follows the on/off knob alone (their docstrings document the state
  table as the |V| class).

Env is read per call, not at import, so tests flip the knob with
``monkeypatch.setenv`` and the very next round of an already-built
loop obeys it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ROWS = 10_000_000


def hints_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_GRAPH_BCAST", "1").lower() not in (
        "0",
        "off",
        "false",
    )


def max_broadcast_rows() -> int:
    try:
        return int(
            os.environ.get(
                "SPARK_GRAFT_GRAPH_BCAST_MAX_ROWS", str(DEFAULT_MAX_ROWS)
            )
        )
    except ValueError:
        return DEFAULT_MAX_ROWS


def vhint(df: DataFrame, rows: int | None = None) -> DataFrame:
    """Broadcast-hint a |V|-row state table, or return it unhinted so
    the join co-shuffles on the vertex key (the 100x-scale path)."""
    if not hints_enabled():
        return df
    if rows is not None and rows > max_broadcast_rows():
        return df
    return F.broadcast(df)

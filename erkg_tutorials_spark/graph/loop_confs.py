"""Shared tuned-conf window for iterative DataFrame loops.

Rationale and measurements: graph/pagerank.py docstring (11.3s→4.6s
at sf0.1) — every round of an iterative algorithm re-shuffles known
shapes, so AQE's per-round re-planning is pure driver overhead and
its coalescing fights size-derived partitioning. Partial map-side
aggregation keeps skew safe with AQE off. The window restores the
session confs on exit; callers sharing a session across concurrent
queries should not enter it.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def tuned_loop_confs(spark, n_rows: int, enabled: bool = True):
    """Inside the context: AQE off, shuffle partitions sized for
    ``n_rows`` per-round rows (~1M per partition, floor 8, ceiling
    10k). No-op when ``enabled`` is false."""
    if not enabled:
        yield
        return
    parts = max(8, min(10_000, -(-n_rows // 1_000_000)))
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)

"""Rolling eager localCheckpoint for iterative loop state.

Every iterative operator here truncates its per-round lineage with
``localCheckpoint(eager=True)`` — but a localCheckpoint pins its
blocks in the block manager until the JVM garbage-collects the RDD
handle, which for a long session means every round of every past
query accumulates as dead storage (measured: back-to-back PageRank
runs degrade 25-40% as ContextCleaner falls behind). The fix is
structural: once round i+1's checkpoint has materialized, round i's
blocks can never be read again — the new checkpoint IS the state — so
they are released immediately instead of waiting for GC.

``CheckpointChain`` tracks exactly one evolving state variable. The
release is safe by construction: the chain frees only checkpoints it
created for earlier versions of that variable, and only after the
newer version is eagerly materialized. The FINAL checkpoint is never
released (it backs the loop's result). Loop-invariant checkpoints
(edge tables consumed every round) must NOT go through a chain —
checkpoint them directly.

The id-diff around the checkpoint call runs under a process-wide lock
so concurrent chains cannot mis-attribute each other's new RDD ids.
A localCheckpoint freed by mistake would be unrecoverable (truncated
lineage cannot recompute), hence the conservatism.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()


class CheckpointChain:
    """Eager localCheckpoint that frees the previous round's blocks."""

    def __init__(self) -> None:
        self._prev: list[int] = []

    def __call__(self, df: DataFrame) -> DataFrame:
        jsc = df.sparkSession.sparkContext._jsc
        with _LOCK:
            before = {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}
            out = df.localCheckpoint(eager=True)
            jmap = jsc.getPersistentRDDs()
            after = {int(i) for i in jmap.keySet().toArray()}
            for rid in self._prev:
                rdd = jmap.get(rid)
                if rdd is not None:
                    rdd.unpersist(False)
            self._prev = sorted(after - before)
        return out

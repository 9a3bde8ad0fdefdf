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

Attribution is per-chain and exact: ``localCheckpoint`` returns a
Dataset whose analyzed plan is the ``LogicalRDD`` wrapping the
checkpointed internal RDD, so the chain reads that RDD's id straight
off the returned DataFrame. No global persistent-RDD-map diff, no
process-wide lock — concurrent chains (and unrelated persists from
other threads, e.g. bench workers materializing caches) can never be
mis-attributed, and independent chains' eager checkpoint jobs overlap
freely. If the plan shape ever stops being a bare LogicalRDD (a Spark
upgrade), extraction fails closed: the chain releases nothing rather
than risk freeing a foreign block (a wrongly-freed localCheckpoint is
unrecoverable — truncated lineage cannot recompute).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame


def _checkpointed_rdd_id(df: DataFrame) -> int | None:
    """Id of the checkpointed RDD backing ``df``, or None.

    After ``localCheckpoint`` the analyzed plan is exactly
    ``org.apache.spark.sql.execution.LogicalRDD(output, rdd, ...)``;
    ``rdd`` is the persisted internal RDD whose blocks the chain owns.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            return int(plan.rdd().id())
    except Exception:
        pass
    return None


class CheckpointChain:
    """Eager localCheckpoint that frees the previous round's blocks."""

    def __init__(self) -> None:
        self._prev: list[int] = []
        self._lock = threading.Lock()  # per-chain; chains never share state

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        rid = _checkpointed_rdd_id(out)
        jsc = out.sparkSession.sparkContext._jsc
        with self._lock:
            jmap = jsc.getPersistentRDDs()
            for old in self._prev:
                rdd = jmap.get(old)
                if rdd is not None:
                    rdd.unpersist(False)
            self._prev = [rid] if rid is not None else []
        return out

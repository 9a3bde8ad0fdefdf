"""Reproduce (and verify the fix for) the localCheckpoint origin-payload
blowup that graph/ckpt.py's ``_sever_origin`` works around.

Shape: an iterative loop state whose next version references the
previous checkpoint TWICE (pointer doubling p∘p — the same shape as
PageRank's rank ⋈ contrib(rank)). On Spark 4.1.2, plain
``localCheckpoint(eager=True)`` turns exponential past ~14 generations
(0.1 s/step → 0.5 → 1 → 2.5 → 6.3 → 18 → 56 s), with zero jobs running
during the slow spans (pure driver time — REST-confirmed via
/api/v1/applications/<app>/jobs). Severing the origin payload by
re-wrapping the persisted internal RDD in a bare LogicalRDD keeps the
same 25-deep loop flat at ~0.1 s/step.

    python tools/ckpt_blowup_probe.py            # fixed path (chain)
    python tools/ckpt_blowup_probe.py --raw      # reproduce the blowup
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from erkg_tutorials_spark.graph.ckpt import CheckpointChain  # noqa: E402
from erkg_tutorials_spark.session import get_spark  # noqa: E402


def main() -> None:
    raw = "--raw" in sys.argv
    iters = 18 if raw else 25
    spark = get_spark()
    chain = CheckpointChain()
    step = (
        (lambda df: df.localCheckpoint(eager=True)) if raw else chain
    )
    p = step(
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "c")], "c string, p string"
        )
    )
    for j in range(iters):
        t0 = time.time()
        pj = p.select(F.col("c").alias("pk_"), F.col("p").alias("pn"))
        p = step(
            p.join(F.broadcast(pj), F.col("p") == F.col("pk_")).select(
                "c", F.col("pn").alias("p")
            )
        )
        print(f"it {j} step {time.time() - t0:.2f}s", flush=True)
    rows = sorted((r.c, r.p) for r in p.collect())
    assert rows == [("a", "c"), ("b", "c"), ("c", "c")], rows
    print("converged pointers OK")


if __name__ == "__main__":
    main()

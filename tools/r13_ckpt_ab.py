"""A/B the pagerank-family checkpoint_every lever (r12 VERDICT item 4).

Times pagerank() over the memoized sf0.1 trade invariants at several
checkpoint_every values, alternating, best-of-N, noop sink.

    python tools/r13_ckpt_ab.py [--iters 10] [--runs 3] [--values 1,2,3,5]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from erkg_tutorials_spark.session import get_spark  # noqa: E402


def main() -> None:
    iters, runs, values = 10, 3, [1, 2, 3, 5]
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--iters":
            iters = int(args[i + 1]); i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--values":
            values = [int(x) for x in args[i + 1].split(",")]; i += 2
        else:
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("erkg-r13-ckpt-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from tools.r12_micro import warm

    warm(spark, sf_dir)

    from pyspark.sql import functions as F

    from erkg_tutorials_spark.graph.pagerank import pagerank
    from erkg_tutorials_spark.plans.graphq import (
        trade_edges_sym,
        trade_graph_invariants,
    )

    pre = trade_graph_invariants(spark, sf_dir)
    edges = trade_edges_sym(spark, sf_dir)

    out: dict[int, list[float]] = {v: [] for v in values}
    first_rows = None
    for r in range(runs):
        for v in values:
            spark.sparkContext.setJobDescription(f"ckpt-ab: ce={v} run={r}")
            t0 = time.time()
            ranks = pagerank(edges, max_iter=iters, pre=pre, checkpoint_every=v)
            top = (
                ranks.select("id", F.round("rank", 6).alias("rank"))
                .orderBy(F.desc("rank"), F.asc("id"))
                .limit(20)
            )
            rows = top.collect()
            out[v].append(round(time.time() - t0, 3))
            key = [(row["id"], row["rank"]) for row in rows]
            if first_rows is None:
                first_rows = key
            elif key != first_rows:
                print(f"MISMATCH at ce={v}: {key[:3]} vs {first_rows[:3]}")
    print("CKPTAB:" + json.dumps(
        {str(v): {"best": min(ts), "all": ts} for v, ts in out.items()}
    ))
    spark.stop()


if __name__ == "__main__":
    main()

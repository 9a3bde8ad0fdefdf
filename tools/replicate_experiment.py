"""N-fold replication experiment (SCALING.md "Measured scale-up
behavior"): copy every sf parquet file N times into a multi-file
directory-table, then time a query set at 1x steady-state conventions
(shared views warmed, best-of-2, noop sink).

    python tools/replicate_experiment.py [N] [query ...]

Defaults: N=25, the iterative graph family (r5 VERDICT item 6 — the
notch where single-file scan-parallelism effects are gone and
shuffle/checkpoint behavior dominates). The replicated dataset lands
under /tmp/erkg_sfrep_<N>x and is reused if present.

Replication semantics: graph queries derive DISTINCT edge/adjacency
sets, so Nx replication multiplies the *pre-distinct input volume*
(the orders x lineitem shuffle, the co-order self-join) by N while
holding the iteration workload fixed — exactly the shuffle-side
pressure a wider cluster sees. The shared-view build is timed
separately from steady-state queries, since at scale the build is the
ingest cost and the queries are the serving cost.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "g5_pagerank_top20",
    "g_ppr_watchlist",
    "g_clustering_coeff",
    "g3_two_hop_reach",
]


def _src_fingerprint() -> str:
    """(size, mtime) digest over every source parquet — the same
    staleness guard as plans/scale.py's /tmp layouts: a regenerated
    testdata set must never be served stale replicated rows."""
    parts = []
    for fname in sorted(os.listdir(SRC)):
        if fname.endswith(".parquet"):
            st = os.stat(os.path.join(SRC, fname))
            parts.append(f"{fname}:{st.st_size}:{int(st.st_mtime)}")
    import hashlib

    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def replicate(n: int) -> str:
    dst = f"/tmp/erkg_sfrep_{n}x"
    marker = os.path.join(dst, f"_REPLICATED_OK_{_src_fingerprint()}")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    for fname in os.listdir(SRC):
        if not fname.endswith(".parquet"):
            continue
        table_dir = os.path.join(dst, fname)  # dir named <table>.parquet
        os.makedirs(table_dir)
        for i in range(n):
            src = os.path.join(SRC, fname)
            part = os.path.join(table_dir, f"part-{i:05d}.parquet")
            try:
                os.link(src, part)  # same filesystem: free
            except OSError:
                shutil.copy(src, part)
    open(marker, "w").close()
    return dst


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 25
    queries = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES

    sf_dir = replicate(n)
    from erkg_tutorials_spark.plans.graphq import (
        coorder_nbrs_cached,
        part_coorder_edges,
        ppr_watchlist_tp_cached,
        trade_edges_fwd,
        trade_graph_invariants,
    )
    from erkg_tutorials_spark.plans.registry import QUERIES
    from erkg_tutorials_spark.session import get_spark

    spark = get_spark(
        f"erkg-replicate-{n}x", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {"n": n, "sf_dir": sf_dir, "queries": {}, "spread": {}}
    t0 = time.time()
    trade_edges_fwd(spark, sf_dir).count()
    for df in trade_graph_invariants(spark, sf_dir):
        df.count()
    ppr_watchlist_tp_cached(spark, sf_dir).count()
    part_coorder_edges(spark, sf_dir).count()
    coorder_nbrs_cached(spark, sf_dir).count()
    out["shared_build_sec"] = round(time.time() - t0, 3)

    for name in queries:
        runs = []
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        out["queries"][name] = round(min(runs), 3)
        out["spread"][name] = [round(min(runs), 3), round(max(runs), 3)]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

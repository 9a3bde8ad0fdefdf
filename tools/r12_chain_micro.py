"""r12: time the shared memo chains SEQUENTIALLY in a fresh session —
per-chain attribution without the bench's 6-way contention, for
A/B-ing changes to the chain builders themselves.

    python tools/r12_chain_micro.py [chain ...]

Chains: ivf, pq, coorder, invariants, minhash. Default: all.
Output: one JSON line {"chains": {name: sec}}.
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
    names = sys.argv[1:] or ["ivf", "pq", "coorder", "invariants", "minhash"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "erkg-r12-chains", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    from concurrent.futures import ThreadPoolExecutor

    from erkg_tutorials_spark.catalog import TABLES, load_tables
    from erkg_tutorials_spark.plans.graphq import (
        coorder_nbrs_cached,
        part_coorder_edges,
        ppr_watchlist_tp_cached,
        trade_edges_fwd,
        trade_graph_invariants,
    )
    from erkg_tutorials_spark.plans.textq import minhash_pairs_cached
    from erkg_tutorials_spark.plans.vectorq import (
        ivf_centroids_cached,
        pq_codes_cached,
    )

    spark.range(1000).selectExpr("sum(id)").collect()
    cat = load_tables(spark, sf_dir)
    for t in TABLES:
        cat[t].count()

    def _graph_chain() -> None:
        trade_edges_fwd(spark, sf_dir).count()
        invs = trade_graph_invariants(spark, sf_dir)
        with ThreadPoolExecutor(3) as inner:
            list(inner.map(lambda df: df.count(), invs))
        ppr_watchlist_tp_cached(spark, sf_dir).count()

    def _coorder_chain() -> None:
        part_coorder_edges(spark, sf_dir).count()
        coorder_nbrs_cached(spark, sf_dir).count()

    chains = {
        "ivf": lambda: ivf_centroids_cached(spark, sf_dir).count(),
        "pq": lambda: pq_codes_cached(spark, sf_dir).count(),
        "coorder": _coorder_chain,
        "invariants": _graph_chain,
        "minhash": lambda: minhash_pairs_cached(spark, sf_dir).count(),
    }
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r12chain:{name}")
        t0 = time.time()
        chains[name]()
        out[name] = round(time.time() - t0, 3)
    print(json.dumps({"chains": out}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes end-to-end into the noop sink (full plan runs, no
driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from erkg_tutorials_spark.session import get_spark  # noqa: E402
from erkg_tutorials_spark.plans.registry import QUERIES  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "a1_alias_distribution",
    "w4_argmax_part_supplier",
    "g3_two_hop_reach",
    "flagship_reach_segments",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_quality",
    "phrase_ruler_match",
    "knn_cosine_bruteforce",
    "knn_cosine_ivf",
    "v3_disambiguate",
    "multimodal_decode",
    "events_hourly_rollup",
    "events_sessionize",
    # iterative / Python-boundary scale ops — the expensive tier,
    # benchmarked explicitly so regressions show up per-round
    "g5_pagerank_top20",
    "g6_connected_components",
    "g5_textrank_phrases",
    "v1_embed_hash",
    "f6_unlinked_report",
    "text_contamination",
    "split_assign",
    "corpus_filter_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("erkg-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up: JVM/codegen on a trivial plan + one pass over each input
    # table (page cache + parquet reader init), so timings measure
    # steady-state query execution, not first-touch costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    from erkg_tutorials_spark.catalog import TABLES, load_tables

    cat = load_tables(spark, sf_dir)
    for t in TABLES:
        cat[t].count()

    # best-of-2 per query (JMH-style): the first run pays per-plan
    # codegen compilation; the second is the throughput number.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

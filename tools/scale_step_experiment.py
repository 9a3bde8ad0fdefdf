"""One REAL scale-factor step for the heaviest graph queries
(r7 VERDICT item 8): key-shifted 10x scale-up of sf0.1 ~ sf1.

The N-fold replication experiments (replicate_experiment.py) multiply
pre-distinct input volume while holding the DISTINCT edge/vertex sets
constant — the flat 125x bends they record rely on the assumption that
the distinct sets are what the iteration cost tracks. This experiment
tests that assumption: each of the 10 copies shifts every join key by
a disjoint offset, so the distinct trade graph and co-order part graph
really are 10x the vertices and 10x the edges (10 disjoint isomorphic
components — per-copy structure preserved, global size real).

    python tools/scale_step_experiment.py [query ...]

Output: one JSON line with shared-view build time and best-of-2
steady-state timings; compare against BENCH_LOCAL_r*.json sf0.1 rows.
The scaled dataset lands under /tmp/erkg_sfstep_10x (Spark-written
parquet for the shifted tables, hard links for the rest) and is
reused if present.
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
COPIES = 10
# disjoint key spaces per copy; far above any sf0.1 key
OFF = {
    "c_custkey": 10_000_000,
    "s_suppkey": 10_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "l_orderkey": 100_000_000,
    "l_suppkey": 10_000_000,
    "l_partkey": 10_000_000,
    "p_partkey": 10_000_000,
}
SHIFTED_TABLES = ("customer", "supplier", "orders", "lineitem", "part")
DEFAULT_QUERIES = ["g5_pagerank_top20", "g_ppr_watchlist", "g_triangle_count"]


def build(spark) -> str:
    from pyspark.sql import functions as F

    dst = f"/tmp/erkg_sfstep_{COPIES}x"
    marker = os.path.join(dst, "_SCALED_OK")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for fname in os.listdir(SRC):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        src_path = os.path.join(SRC, fname)
        if table not in SHIFTED_TABLES:
            table_dir = os.path.join(dst, fname)
            os.makedirs(table_dir)
            try:
                os.link(src_path, os.path.join(table_dir, "part-00000.parquet"))
            except OSError:
                shutil.copy(src_path, os.path.join(table_dir, "part-00000.parquet"))
            continue
        df = spark.read.parquet(src_path)
        copies = []
        for i in range(COPIES):
            c = df
            for col in df.columns:
                if col in OFF:
                    c = c.withColumn(col, F.col(col) + F.lit(i * OFF[col]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dst, fname))
    open(marker, "w").close()
    return dst


DOCS_QUERIES = [
    "dedup_minhash_lsh",
    "simjoin_prefix_filter",
    "dedup_clusters",
    "e3_pretrain_shards",
    "dsir_importance_sample",
]


def build_docs(spark) -> str:
    """Key-shifted 10x step for the DOCUMENTS-based dedup/LLM family
    (r8 VERDICT item 4). Each copy i shifts doc_id into a disjoint id
    space AND suffixes every word with the copy index: a bijective
    per-copy vocabulary map, so within-copy shingle/n-gram Jaccard
    structure (and therefore the near-dup pair/cluster sets) is
    preserved EXACTLY per copy while distinct docs, distinct shingles
    and distinct band buckets all really grow 10x — no cross-copy
    similarity, no shared vocab. (Copy>0 words no longer match the
    English stopword list; e3's quality gate sees a shifted feature
    distribution — documented, immaterial to the shuffle shape being
    measured.)"""
    from pyspark.sql import functions as F

    # v2: '§'-separated vocab suffix (collision-proof vs digit-ending
    # source words, r10 ADVICE) — new dir so stale builds don't mask it
    dst = f"/tmp/erkg_sfstep_docs_{COPIES}x_v2"
    marker = os.path.join(dst, "_SCALED_OK")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for fname in os.listdir(SRC):
        if not fname.endswith(".parquet"):
            continue
        src_path = os.path.join(SRC, fname)
        if fname != "documents.parquet":
            table_dir = os.path.join(dst, fname)
            os.makedirs(table_dir)
            try:
                os.link(src_path, os.path.join(table_dir, "part-00000.parquet"))
            except OSError:
                shutil.copy(src_path, os.path.join(table_dir, "part-00000.parquet"))
            continue
        df = spark.read.parquet(src_path)
        copies = [df]
        for i in range(1, COPIES):
            copies.append(
                df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
                .withColumn(
                    "text",
                    F.expr(
                        f"array_join(transform(split(text, ' '),"
                        f" w -> concat(w, '§{i}')), ' ')"
                    ),
                )
            )
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dst, fname))
    open(marker, "w").close()
    return dst


def main() -> None:
    if sys.argv[1:2] == ["--docs"]:
        return main_docs(sys.argv[2:] or DOCS_QUERIES)
    queries = sys.argv[1:] or DEFAULT_QUERIES

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
        f"erkg-sfstep-{COPIES}x", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build(spark)
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {"copies": COPIES, "sf_dir": sf_dir, "queries": {}, "spread": {}}
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


def main_docs(queries: list[str]) -> None:
    """Run the documents-family 10x step: base sf0.1 and the 10x
    corpus in ONE process (same JVM warm-up), best-of-2 each, so the
    printed ratio is apples-to-apples."""
    from erkg_tutorials_spark.plans.registry import QUERIES
    from erkg_tutorials_spark.plans.textq import minhash_pairs_cached
    from erkg_tutorials_spark.session import get_spark

    spark = get_spark(
        f"erkg-sfstep-docs-{COPIES}x", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from erkg_tutorials_spark.plans.memo import release

    big = build_docs(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    # JVM/codegen warm-up: run the base shared build once cold, discard
    # the timing, release the memo, and time the warm rebuild — so the
    # base/scaled shared-build comparison is not polluted by first-ever
    # parquet-scan and codegen compilation costs
    minhash_pairs_cached(spark, SRC).count()
    release(spark, sf_dir=SRC)

    out: dict = {
        "copies": COPIES,
        "sf_dir": big,
        "base": {},
        "scaled": {},
        "ratio": {},
        "shared_build_sec": {},
    }
    for label, d in (("base", SRC), ("scaled", big)):
        t0 = time.time()
        minhash_pairs_cached(spark, d).count()
        out["shared_build_sec"][label] = round(time.time() - t0, 3)
        for name in queries:
            runs = []
            for _ in range(2):
                t0 = time.time()
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.time() - t0)
            out[label][name] = round(min(runs), 3)
    for name in queries:
        if out["base"][name] > 0:
            out["ratio"][name] = round(out["scaled"][name] / out["base"][name], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""GraphX vs DataFrame-loop PageRank A/B (r9 VERDICT item 3).

The north star names "GraphX for analytics"; the engine ships a
DataFrame power iteration (graph/pagerank.py) because graphframes is
not installable here — but `spark-graphx_2.13-4.1.2.jar` IS on the
classpath, and GraphX's Pregel-based PageRank is drivable from py4j:
GraphLoader.edgeListFile + PageRank.run(graph, iters, reset, tags).
This tool measures that path against the engine's own loop on the
SAME graph so the routing decision is a number, not an assumption.

Semantics note: GraphX staticPageRank starts every rank at 1.0 and
iterates r = reset + (1-reset)·Σ r_j/deg_j with no dangling handling
and no normalization; the engine starts at 1/n and iterates
r' = reset/n + (1-reset)·Σ r'_j/deg_j. On the symmetric trade graph
(provably no danglers) the two recurrences are the same linear map up
to the global 1/n scale, so r' = r/n exactly in exact arithmetic —
the tool checks max |ours·n − graphx| as the parity probe.

Phases timed separately so the py4j/file marshalling cost is visible
rather than folded in:
  export   — write the long-id edge list text file from the DataFrame
  load     — GraphLoader.edgeListFile + materialize (vertices count)
  rank     — PageRank.run(8, 0.15) + materialize
  retrieve — saveAsTextFile of the VertexRDD + parse back
vs `df_loop` — the engine's pagerank() (warm invariants, noop write),
the exact shape bench.py times for g5_pagerank_top20.

    python tools/graphx_ab.py [sf_dir ...]

Output: one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 8
RESET = 0.15


def long_id_edges(spark, sf_dir):
    """Symmetric trade edges with 'c:x'/'s:y' ids mapped to disjoint
    longs (2x / 2y+1) — GraphLoader needs integral vertex ids."""
    from pyspark.sql import functions as F

    from erkg_tutorials_spark.plans.graphq import trade_edges_sym

    e = trade_edges_sym(spark, sf_dir)

    def enc(col):
        num = F.split(F.col(col), ":").getItem(1).cast("long")
        return (
            F.when(F.col(col).startswith("c:"), num * 2)
            .otherwise(num * 2 + 1)
            .alias(col)
        )

    return e.select(enc("src"), enc("dst"))


def run_graphx_mem(spark, edges_df) -> dict:
    """In-JVM handoff (r10 VERDICT item 3): DataFrame →
    Dataset[(Long,Long)] via Encoders.tuple → .rdd() →
    Graph.fromEdgeTuples, and ranks back as a Dataset via
    createDataset — no text-file export/import on either side. The
    r10 A/B charged GraphX ~5 s of file marshalling; this measures
    the engine-to-engine cost it would actually pay when routed.

    Phases:
      convert  — Dataset→RDD→Graph + materialize (vertices count)
      rank     — PageRank.run(8, 0.15) + materialize
      retrieve — VertexRDD → createDataset → collect to Python
    """
    jvm = spark._jvm

    out: dict = {}
    t0 = time.time()
    E = jvm.org.apache.spark.sql.Encoders
    tupds = getattr(edges_df.select("src", "dst")._jdf, "as")(
        E.tuple(E.LONG(), E.LONG())
    )
    sl = jvm.org.apache.spark.storage.StorageLevel.MEMORY_ONLY()
    none = jvm.scala.Option.empty()
    int_tag = jvm.scala.reflect.ClassTag.Int()
    g = jvm.org.apache.spark.graphx.Graph.fromEdgeTuples(
        tupds.rdd(), 1, none, sl, sl, int_tag
    )
    out["n_vertices"] = g.vertices().count()
    out["n_edges"] = g.edges().count()
    out["convert_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    ranked = jvm.org.apache.spark.graphx.lib.PageRank.run(
        g, ITERS, RESET, int_tag, int_tag
    )
    ranked.vertices().count()
    out["rank_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    from pyspark.sql import DataFrame as PyDF

    ds = spark._jsparkSession.createDataset(
        ranked.vertices(), E.tuple(E.LONG(), E.DOUBLE())
    )
    ranks = {r["_1"]: r["_2"] for r in PyDF(ds.toDF(), spark).collect()}
    out["retrieve_sec"] = round(time.time() - t0, 3)
    out["graphx_mem_total_sec"] = round(
        out["convert_sec"] + out["rank_sec"] + out["retrieve_sec"], 3
    )
    out["_ranks"] = ranks
    return out


def run_graphx(spark, edges_df, workdir: str) -> dict:
    jvm = spark._jvm
    sc = spark.sparkContext._jsc.sc()
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)

    from pyspark.sql import functions as F

    out: dict = {}
    t0 = time.time()
    path = os.path.join(workdir, "edges")
    edges_df.select(
        F.concat_ws(" ", "src", "dst").alias("value")
    ).write.mode("overwrite").text(path)
    out["export_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    sl = jvm.org.apache.spark.storage.StorageLevel.MEMORY_ONLY()
    g = jvm.org.apache.spark.graphx.GraphLoader.edgeListFile(
        sc, f"file:{path}", False, -1, sl, sl
    )
    out["n_vertices"] = g.vertices().count()
    out["n_edges"] = g.edges().count()
    out["load_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    tag = jvm.scala.reflect.ClassTag.Int()
    ranked = jvm.org.apache.spark.graphx.lib.PageRank.run(
        g, ITERS, RESET, tag, tag
    )
    ranked.vertices().count()
    out["rank_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    rpath = os.path.join(workdir, "ranks")
    ranked.vertices().saveAsTextFile(f"file:{rpath}")
    ranks: dict[int, float] = {}
    for part in os.listdir(rpath):
        if not part.startswith("part"):
            continue
        with open(os.path.join(rpath, part)) as fh:
            for line in fh:
                vid, rank = line.strip()[1:-1].split(",")
                ranks[int(vid)] = float(rank)
    out["retrieve_sec"] = round(time.time() - t0, 3)
    out["graphx_total_sec"] = round(
        out["export_sec"] + out["load_sec"] + out["rank_sec"] + out["retrieve_sec"], 3
    )
    out["_ranks"] = ranks
    return out


def run_df_loop(spark, sf_dir: str) -> tuple[float, dict]:
    from erkg_tutorials_spark.graph.pagerank import pagerank
    from erkg_tutorials_spark.plans.graphq import (
        trade_edges_sym,
        trade_graph_invariants,
    )

    for df in trade_graph_invariants(spark, sf_dir):  # warm, like bench
        df.count()
    t0 = time.time()
    ranks = pagerank(
        trade_edges_sym(spark, sf_dir),
        max_iter=ITERS,
        pre=trade_graph_invariants(spark, sf_dir),
    )
    rows = ranks.collect()
    dt = round(time.time() - t0, 3)
    return dt, {r["id"]: r["rank"] for r in rows}


def main() -> None:
    from erkg_tutorials_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("graphx-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        res: dict = {"sf_dir": sf_dir, "iters": ITERS}
        df_sec, ours = run_df_loop(spark, sf_dir)
        res["df_loop_sec"] = df_sec
        if os.environ.get("SPARK_GRAFT_GRAPHX_FILE"):
            gx = run_graphx(
                spark, long_id_edges(spark, sf_dir), "/tmp/erkg_graphx_ab"
            )
        else:
            gx = run_graphx_mem(spark, long_id_edges(spark, sf_dir))
        granks = gx.pop("_ranks")
        res.update(gx)

        # parity probe: ours * n  vs  graphx (see module docstring)
        def enc(k: str) -> int:
            kind, num = k.split(":")
            return int(num) * 2 + (0 if kind == "c" else 1)

        n = len(ours)
        diffs = [
            abs(v * n - granks.get(enc(k), float("nan"))) for k, v in ours.items()
        ]
        res["n"] = n
        res["max_abs_diff_scaled"] = max(diffs)
        top_ours = {
            enc(k)
            for k, _ in sorted(ours.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        }
        top_gx = {
            k
            for k, _ in sorted(granks.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        }
        res["top20_overlap"] = len(top_ours & top_gx)
        print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()

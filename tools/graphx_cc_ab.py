"""GraphX vs DataFrame-loop connected-components A/B (r11 VERDICT
item 3).

Same shape as the PageRank A/B (tools/graphx_ab.py): the engine ships
an alternating large-star/small-star loop
(graph/connected_components.py), and `g6_connected_components` bent
11.2x per decade at the 100x notch (169 s) — GraphX's Pregel
ConnectedComponents is on the same classpath the routed PageRank tier
already uses, so the routing question is a measurement, not a guess.

Semantics note: GraphX CC labels every vertex with the MINIMUM
VertexId (long) reachable; the engine labels with the minimum
ORIGINAL id (string, lexicographic). The long encoding is not order-
preserving on the strings ("c:10" < "c:2" lexicographically), so
parity is checked as PARTITION equality: after joining the two
labelings per vertex, every engine-component must map to exactly one
GraphX component and vice versa (two countDistinct aggs, fully
distributed — nothing is collected).

Phases timed separately (in-JVM handoff, no file marshalling):
  convert  — Dataset[(Long,Long)] → RDD → Graph.fromEdgeTuples +
             materialize
  cc       — ConnectedComponents.run + materialize
  retrieve — VertexRDD → createDataset → DataFrame + materialize
vs `df_loop` — the engine's connected_components() on the same edge
set (input_canonical=True, the exact g6 shape).

    python tools/graphx_cc_ab.py [sf_dir ...]

Output: one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def long_id_edges(spark, sf_dir):
    """Canonical trade edges with 'c:x'/'s:y' ids mapped to disjoint
    longs (2x / 2y+1) — deterministic, so the decode join needs no
    index table."""
    from pyspark.sql import functions as F

    from erkg_tutorials_spark.plans.graphq import trade_edges_fwd

    e = trade_edges_fwd(spark, sf_dir)

    def enc(col):
        num = F.split(F.col(col), ":").getItem(1).cast("long")
        return (
            F.when(F.col(col).startswith("c:"), num * 2)
            .otherwise(num * 2 + 1)
            .alias(col)
        )

    return e.select(enc("src"), enc("dst"))


def run_graphx_cc_mem(spark, edges_df) -> dict:
    from pyspark.sql import DataFrame as PyDF
    from pyspark.sql import functions as F

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
    cc = jvm.org.apache.spark.graphx.lib.ConnectedComponents.run(
        g, int_tag, int_tag
    )
    cc.vertices().count()
    out["cc_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    ds = spark._jsparkSession.createDataset(
        cc.vertices(), E.tuple(E.LONG(), E.LONG())
    )
    labels = (
        PyDF(ds.toDF(), spark)
        .select(F.col("_1").alias("vid"), F.col("_2").alias("gxcomp"))
        .localCheckpoint(eager=True)
    )
    out["retrieve_sec"] = round(time.time() - t0, 3)
    out["graphx_cc_total_sec"] = round(
        out["convert_sec"] + out["cc_sec"] + out["retrieve_sec"], 3
    )
    cc.unpersist(False)
    g.unpersist(False)
    out["_labels"] = labels
    return out


def run_df_loop(spark, sf_dir: str):
    from erkg_tutorials_spark.graph.connected_components import (
        connected_components,
    )
    from erkg_tutorials_spark.plans.graphq import trade_edges_fwd

    t0 = time.time()
    ours = connected_components(
        trade_edges_fwd(spark, sf_dir), input_canonical=True
    ).localCheckpoint(eager=True)
    return round(time.time() - t0, 3), ours


def partition_parity(spark, ours, gx_labels) -> dict:
    """Distributed partition-equality check (see module docstring)."""
    from pyspark.sql import functions as F

    num = F.split(F.col("id"), ":").getItem(1).cast("long")
    vid = F.when(F.col("id").startswith("c:"), num * 2).otherwise(
        num * 2 + 1
    )
    joined = ours.withColumn("vid", vid).join(gx_labels, "vid", "inner")
    n_joined = joined.count()
    bad_fwd = (
        joined.groupBy("component")
        .agg(F.countDistinct("gxcomp").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    bad_rev = (
        joined.groupBy("gxcomp")
        .agg(F.countDistinct("component").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    return {
        "n_vertices_joined": n_joined,
        "refining_violations": bad_fwd,
        "coarsening_violations": bad_rev,
        "partition_equal": bad_fwd == 0 and bad_rev == 0,
    }


def main() -> None:
    from erkg_tutorials_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("graphx-cc-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        res: dict = {"sf_dir": sf_dir}
        df_sec, ours = run_df_loop(spark, sf_dir)
        res["df_loop_sec"] = df_sec
        gx = run_graphx_cc_mem(spark, long_id_edges(spark, sf_dir))
        labels = gx.pop("_labels")
        res.update(gx)
        res.update(partition_parity(spark, ours, labels))
        print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()

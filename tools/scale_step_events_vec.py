"""Real 10x distinct-set scale step for the events and embeddings
query families (r9): key-shifted copies so user/vector populations
genuinely grow 10x, measured base-vs-scaled in ONE process.

- events: each copy shifts user_id and event_id into disjoint ranges
  (timestamps unshifted — 10x the users means 10x the daily traffic,
  the realistic growth axis for CUSUM's per-type daily series and the
  pattern miner's per-user histories).
- embeddings: each copy shifts vec_id; vectors are re-seeded per copy
  by rotating the float array one position per copy index, so the 10x
  corpus is not 10 identical point clouds.

    python tools/scale_step_events_vec.py [query ...]

Output: one JSON line {base, scaled, ratio} best-of-2 per query.
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
DST = "/tmp/erkg_sfstep_ev10x"
COPIES = 10
DEFAULT_QUERIES = [
    "events_cusum_changepoint",
    "seq_pattern_mining",
    "coreset_kcenter",
    "retrieval_ndcg_eval",
]


def build(spark) -> str:
    if os.path.isdir(DST) and os.listdir(DST):
        return DST
    os.makedirs(DST, exist_ok=True)
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    parts = []
    for c in range(COPIES):
        parts.append(
            ev.select(
                (F.col("event_id") + c * 100_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + c * 10_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    big_ev = parts[0]
    for p in parts[1:]:
        big_ev = big_ev.unionByName(p)
    big_ev.write.mode("overwrite").parquet(os.path.join(DST, "events.parquet"))

    em = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    vparts = []
    for c in range(COPIES):
        rot = c % 8
        rotated = (
            F.expr(
                f"concat(slice(embedding, {rot + 1},"
                f" size(embedding) - {rot}),"
                f" slice(embedding, 1, {rot}))"
            )
            if rot
            else F.col("embedding")
        )
        vparts.append(
            em.select(
                (F.col("vec_id") + c * 1_000_000).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
    big_em = vparts[0]
    for p in vparts[1:]:
        big_em = big_em.unionByName(p)
    big_em.write.mode("overwrite").parquet(
        os.path.join(DST, "embeddings.parquet")
    )

    for f in os.listdir(SRC):
        s, d = os.path.join(SRC, f), os.path.join(DST, f)
        if f not in ("events.parquet", "embeddings.parquet") and not os.path.exists(d):
            if os.path.isdir(s):
                shutil.copytree(s, d, copy_function=os.link)
            else:
                os.link(s, d)
    return DST


def main() -> None:
    queries = sys.argv[1:] or DEFAULT_QUERIES
    from erkg_tutorials_spark.plans.registry import QUERIES
    from erkg_tutorials_spark.plans.vectorq import ivf_centroids_cached
    from erkg_tutorials_spark.session import get_spark

    spark = get_spark(
        f"erkg-sfstep-ev-{COPIES}x", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark)
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {"copies": COPIES, "base": {}, "scaled": {}, "ratio": {}}
    for label, d in (("base", SRC), ("scaled", big)):
        # nDCG consumes the trained IVF index — build it outside the
        # timed window, like bench.py's shared_materializations
        if any(q == "retrieval_ndcg_eval" for q in queries):
            ivf_centroids_cached(spark, d).count()
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
        out["ratio"][name] = round(out["scaled"][name] / out["base"][name], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

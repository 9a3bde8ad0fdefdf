"""Throughput comparison: this engine vs a reference-style
single-process pandas implementation of the same computation.

The reference (`louisguitton/erkg-tutorials`) publishes no benchmark
(BASELINE.md), so "match-or-beat its single-node throughput" is
measured against a faithful reimplementation of its execution style:
eager pandas + Python dict/Counter loops in one process — the exact
shape of `generate_aliases` (senzing_pipeline.py:289-305) and of its
per-doc token loops — over the driver's sf0.1 tables.

Measured at 1× (sf0.1) AND at 5× (file-replicated): at sub-second
workload sizes Spark's fixed job overhead dominates and the eager
single-process implementation wins; the point of this engine is the
other side of the crossover — the reference-style implementation grows
linearly (and then dies at memory), Spark stays flat until real data
sizes. Usage: python tools/compare_reference_style.py → one JSON line
per (workload, scale).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pandas_alias_distribution(orders: pd.DataFrame) -> pd.DataFrame:
    """A1 in the reference's style: groupby + Counter + Python loop
    (senzing_pipeline.py:289-305)."""
    rows = []
    for alias, grp in orders.groupby("o_orderpriority"):
        counts = Counter(grp["o_custkey"].astype(str))
        total = sum(counts.values())
        entities = sorted(counts)
        rows.append(
            {
                "alias": alias,
                "entities": entities,
                "probabilities": [counts[e] / total for e in entities],
            }
        )
    return pd.DataFrame(rows)


def pandas_word_frequency(docs: pd.DataFrame) -> pd.DataFrame:
    """R1 corpus word frequency as an eager Python loop."""
    counts: Counter = Counter()
    for text in docs["text"]:
        counts.update((text or "").lower().split(" "))
    top = counts.most_common()
    top.sort(key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(top[:50], columns=["word", "n"])


def pandas_two_hop(orders: pd.DataFrame, lineitem: pd.DataFrame, seeds: set) -> set:
    """G2/G3 in the reference's adjacency-dict style
    (senzing_pipeline.py:373-397)."""
    pairs = orders.merge(lineitem, left_on="o_orderkey", right_on="l_orderkey")
    adj: dict = {}
    for c, s in zip(pairs["o_custkey"], pairs["l_suppkey"]):
        cu, su = f"c:{c}", f"s:{s}"
        adj.setdefault(cu, set()).add(su)
        adj.setdefault(su, set()).add(cu)
    rank1 = set().union(*(adj.get(s, set()) for s in seeds)) if seeds else set()
    r01 = seeds | rank1
    rank2 = set().union(*(adj.get(v, set()) for v in r01)) if r01 else set()
    return r01 | rank2


def _replicate(src: str, times: int) -> str:
    """Build an N×-replicated copy of the tables this comparison reads
    (multi-file dirs — how real inputs arrive)."""
    import shutil

    dst = f"/tmp/ref-compare-x{times}"
    for t in ("orders", "lineitem", "documents", "customer"):
        d = os.path.join(dst, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        for i in range(times):
            shutil.copy(
                os.path.join(src, f"{t}.parquet"), os.path.join(d, f"part-{i}.parquet")
            )
    return dst


def run_scale(spark, sf_dir: str, scale: str) -> None:
    from erkg_tutorials_spark.plans.registry import QUERIES

    orders = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = pd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey"],
    )
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    customer = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    seeds = {f"c:{k}" for k in customer["c_custkey"] if k % 37 == 0}

    workloads = [
        ("a1_alias_distribution", lambda: pandas_alias_distribution(orders)),
        ("r1_word_frequency", lambda: pandas_word_frequency(docs)),
        (
            "g3_two_hop_reach",
            lambda: pandas_two_hop(
                orders[["o_orderkey", "o_custkey"]], lineitem, seeds
            ),
        ),
    ]
    for name, ref_fn in workloads:
        best_s = float("inf")
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best_s = min(best_s, time.time() - t0)
        best_p = float("inf")
        for _ in range(2):
            t0 = time.time()
            ref_fn()
            best_p = min(best_p, time.time() - t0)
        print(
            json.dumps(
                {
                    "scale": scale,
                    "workload": name,
                    "spark_sec": round(best_s, 3),
                    "reference_style_sec": round(best_p, 3),
                    "spark_over_ref": round(best_p / best_s, 2),
                }
            )
        )


def main() -> None:
    from erkg_tutorials_spark.session import get_spark

    spark = get_spark("compare-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    run_scale(spark, SF_DIR, "1x")
    run_scale(spark, _replicate(SF_DIR, 5), "5x")
    spark.stop()


if __name__ == "__main__":
    main()

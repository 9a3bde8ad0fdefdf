"""ANN recall@k measurement (r8 VERDICT item 2).

Correctness of the ANN family is oracle-replay (the approximation is
reproduced bit-for-bit by DuckDB), but a user choosing nprobe /
candidate-list / codebook settings needs the accuracy-vs-work curve:
recall@k of each approximate tier against the brute-force ranking.
This tool measures it on the real embeddings table and prints a
markdown table for SCALING.md; tests/test_scale_ops.py asserts floors
at sf0.01 so a regression in the index machinery (k-means, coarse
quantization, probe routing) fails the suite, not just the eyeball.

Usage: python tools/ann_recall_experiment.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _topk_sets(df, k: int) -> dict[int, set[int]]:
    """query_id -> set of neighbor ids among the df's top-k ranks."""
    rows = df.where(F.col("rank") <= k).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall_at_k(approx, truth: dict[int, set[int]], k: int) -> float:
    """Mean over queries of |approx_topk ∩ truth_topk| / k."""
    got = _topk_sets(approx, k)
    recalls = [
        len(got.get(q, set()) & t) / max(len(t), 1) for q, t in truth.items()
    ]
    return sum(recalls) / max(len(recalls), 1)


def measure(
    spark,
    sf_dir: str,
    n_queries: int = 50,
    k: int = 10,
    ivf_nprobes: tuple = (1, 2, 4),
    sq8_cands: tuple = (20, 50, 100),
    pq_reranks: tuple = (20, 50, 100),
    ivfpq_nprobes: tuple = (1, 2, 4),
    ivfpq_rerank: int | str = 50,
) -> dict:
    """recall@k for every ANN tier across its work knob.

    ``ivfpq_rerank``: shortlist depth for the ivfpq variants — an int,
    or the string "default" for the engine's sqrt(N)-scaled depth
    (plans/vectorq.py pq_rerank_for); result keys carry the label
    verbatim so test floors stay corpus-size-independent."""
    from erkg_tutorials_spark.catalog import load_tables
    from erkg_tutorials_spark.plans.vectorq import (
        ivf_cells_cached,
        ivf_centroids_cached,
        pq_codebooks_cached,
        pq_codes_cached,
        sq8_grid_cached,
    )
    from erkg_tutorials_spark.similarity.ivf import cosine_knn_ivf, ivf_probes
    from erkg_tutorials_spark.similarity.knn import cosine_knn_bruteforce
    from erkg_tutorials_spark.similarity.pq import cosine_knn_pq
    from erkg_tutorials_spark.similarity.sq8 import cosine_knn_sq8

    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.where(F.col("vec_id") < n_queries)
    truth = _topk_sets(
        cosine_knn_bruteforce(corpus=emb, queries=queries, k=k), k
    )

    cent = ivf_centroids_cached(spark, sf_dir).select(
        F.col("cent_id").alias("vec_id"), F.col("cvec").alias("embedding")
    )
    results: dict[str, float] = {}
    for nprobe in ivf_nprobes:
        approx = cosine_knn_ivf(
            corpus=emb, queries=queries, centroids=cent, nprobe=nprobe, k=k
        )
        results[f"ivf nprobe={nprobe}"] = recall_at_k(approx, truth, k)

    grid = sq8_grid_cached(spark, sf_dir)
    for cand in sq8_cands:
        approx = cosine_knn_sq8(
            corpus=emb, queries=queries, grid=grid, cand=cand, k=k
        )
        results[f"sq8 cand={cand}"] = recall_at_k(approx, truth, k)

    books = pq_codebooks_cached(spark, sf_dir)
    codes = pq_codes_cached(spark, sf_dir)
    for rerank in pq_reranks:
        approx = cosine_knn_pq(
            corpus=emb, queries=queries, codebooks=books, codes=codes,
            rerank=rerank, k=k,
        )
        results[f"pq rerank={rerank}"] = recall_at_k(approx, truth, k)

    cells = ivf_cells_cached(spark, sf_dir)
    if ivfpq_rerank == "default":
        from erkg_tutorials_spark.plans.vectorq import pq_rerank_for

        rr = pq_rerank_for(spark, sf_dir)
    else:
        rr = int(ivfpq_rerank)
    for nprobe in ivfpq_nprobes:
        probes = ivf_probes(queries, cent, nprobe=nprobe)
        candidates = probes.join(cells, "cell").select("query_id", "vec_id")
        approx = cosine_knn_pq(
            corpus=emb, queries=queries, codebooks=books, codes=codes,
            rerank=rr, k=k, candidates=candidates,
        )
        results[f"ivfpq nprobe={nprobe} rerank={ivfpq_rerank}"] = recall_at_k(
            approx, truth, k
        )
    return results


def main() -> None:
    from erkg_tutorials_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    results = measure(spark, sf_dir)
    print(f"\n| variant | recall@10 ({os.path.basename(sf_dir)}) |")
    print("|---------|-----------|")
    for name, rec in results.items():
        print(f"| {name} | {rec:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes end-to-end into the noop sink (full plan runs, no
driver-side collect overhead).
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from erkg_tutorials_spark.session import get_spark  # noqa: E402
from erkg_tutorials_spark.plans.registry import QUERIES  # noqa: E402

def _compact_summary(result: dict, here: str, rnd: int) -> dict:
    """Driver-parseable closing line (≤ 2000 chars): query count, suite
    total, geomean speedup vs the previous round's local artifact, and
    the slowest-10 timings. The full per-query dict lives in
    BENCH_LOCAL_r{N}.json; the driver's stdout capture keeps only a
    short tail, so this summary is what BENCH_r{N}.json records."""
    timings = result["queries"]
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    geomean_vs_prev = None
    prev = os.path.join(here, f"BENCH_LOCAL_r{rnd - 1:02d}.json")
    if os.path.exists(prev):
        with open(prev) as fh:
            prev_q = json.load(fh).get("queries", {})
        ratios = [
            timings[k] / prev_q[k]
            for k in timings
            if k in prev_q and prev_q[k] > 0 and timings[k] > 0
        ]
        if ratios:
            geomean_vs_prev = round(
                math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3
            )
    drift = (result.get("control") or {}).get("drift_geomean")
    corrected = (
        round(geomean_vs_prev / drift, 3)
        if geomean_vs_prev and drift
        else None
    )
    return {
        "metric": "headline_suite_total",
        "value": result["value"],
        "unit": "sec",
        "sf": result["sf"],
        "n_queries": len(timings),
        "geomean_vs_prev_round": geomean_vs_prev,
        # drift-corrected cross-round ratio (r9 VERDICT item 6): raw
        # geomean divided by the frozen-control drift measured in the
        # same session — the host-drift-free round-over-round signal
        "control_drift_geomean": drift,
        "geomean_vs_prev_corrected": corrected,
        "queries": slowest,
        "full_artifact": f"BENCH_LOCAL_r{rnd:02d}.json",
    }


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
    # round-2 additions
    "dedup_clusters",
    "dedup_embedding_lsh",
    "text_repetition",
    "n2_shape_ner",
    "g_motif_reach",
    "g_shortest_paths",
    "g_label_propagation",
    # temporal / time-series tier
    "asof_join_last_purchase",
    "range_join_view_purchase",
    "hypertable_rollup",
    "funnel_signup_view_purchase",
    # OLAP + sketch tier
    "hll_distinct_users",
    "olap_rollup_revenue",
    "retention_cohorts",
    # relational depth tier
    "q4_exists_late_ship",
    "q17_small_quantity_revenue",
    "merge_upsert_customers",
    # search ranking tier
    "bm25_rank",
    "tfidf_top_terms",
    # sketch / fuzzy / vector breadth
    "cm_sketch_user_counts",
    "fuzzy_name_match",
    "vector_stats",
    "w6_analytic_functions",
    "events_anomaly_zscore",
    # round-3 additions: scale patterns, LLM-ops batch 2, PQ, HITS
    "runtime_prefilter_join",
    "skew_salted_agg",
    "zorder_clustering",
    "events_histogram",
    "inverted_index_postings",
    "text_bigram_lm",
    "dedup_semantic",
    "knn_cosine_pq",
    "g_hits_top",
    "incremental_rollup",
    "bpe_train_merges",
    # round-3 batch 2: LLM-ops batch 3, IVF-PQ, personalized PageRank
    "pack_sequences",
    "data_mixture_sample",
    "events_gaps_islands",
    "knn_cosine_ivfpq",
    "g_ppr_watchlist",
    # round-3 batch 3: lakehouse maintenance ops + graph link analysis
    "cdc_apply_changes",
    "zone_map_stats",
    "sample_bottom_k",
    "g_link_prediction",
    "g_clustering_coeff",
    "hierarchy_rollup",
    "table_diff",
    "dq_checks",
    "text_collocations",
    "g_scc_nations",
    "multimodal_frame_sample",
    "scd2_point_in_time",
    "stat_regression",
    "e2_corpus_curation",
    "multimodal_resize",
    "events_calendar_heatmap",
    "events_new_vs_returning",
    "basket_association_rules",
    "supplier_hhi",
    "exact_percentiles_orders",
    "heavy_hitters_users",
    "rolling_distinct_users_7d",
    "peak_open_orders",
    "skyline_parts",
    "dedup_duplicated_ngrams",
    "embedding_gram_matrix",
    "doc_perplexity_bigram",
    "rfm_segments",
    "mad_outliers_events",
    "q2_min_cost_supplier",
    "bucketed_colocated_revenue",
    "dedup_containment",
    "partition_pruned_daily",
    "session_top_paths",
    "sample_weighted_orders",
    "hll_union_users",
    "events_ewma_daily",
    "g_weighted_sssp",
    "doc_chunks",
    "hybrid_rrf_search",
    "chunk_retrieval",
    # round-6 batch: exact similarity join, Bloom prefilter, winsorize
    "simjoin_prefix_filter",
    "bloom_prefilter_orders",
    "winsorized_event_stats",
    "simjoin_edit_distance",
    "attribution_first_touch",
    "audience_overlap_bitmap",
    "shard_manifest",
    "dedup_incremental_exact",
    "skew_report_lineitem",
    # round-6 streaming registry tier: real AvailableNow micro-batch
    # jobs (file source -> memory sink); times include the streaming
    # engine's per-batch planning overhead, which is the honest cost
    "stream_hourly_rollup",
    "stream_attribution_pairs",
    "stream_sessionize_closed",
    # round-6 batch 2: Spark-4-native surface + model-based quality
    "variant_props_metrics",
    "udtf_event_runlengths",
    "quality_logistic_score",
    "e3_pretrain_shards",
    "observe_query_metrics",
    # round-7: the composed E3 entity-linking lifecycle (one lazy
    # plan: ruler mentions -> fuzzy candidates -> cosine
    # disambiguation -> top-30 phrase review), benched alongside the
    # composed E1 pipeline (r6 VERDICT item 2)
    "e3_entity_linking",
    # round-7: the registry's three heaviest queries (39/21/7 s
    # sweep-side at sf0.1 in r6) — tracked per-round with spreads so
    # a regression in the peel loops / triangle join shows up here,
    # not only in the end-of-round sweep (r6 VERDICT item 1)
    "g_triangle_count",
    "g_kcore",
    "g_ktruss",
    # round-7: the rest of the streaming tier (r6 VERDICT item 6 —
    # the state-store partitioning fix is measured in SCALING.md but
    # was only sweep-tracked; drain times now recorded per-round)
    "stream_sliding_rollup",
    "stream_dedup_union",
    "stream_exactly_once_daily",
    "stream_enrich_segments",
    "stream_custom_source_rollup",
    # round-7 additions: the ER lifecycle (FS scoring + transitive
    # merge), the two-pass exact heavy hitters, and the lakehouse
    # time-travel read path
    "fs_record_linkage",
    "er_resolve_merge",
    "heavy_hitters_tokens",
    "timetravel_orders_snapshot",
    "stream_versioned_ingest",
    "stream_attribution_outer",
    "g_harmonic_closeness",
    # round-7 additions (late): file-pruned MERGE INTO + change data
    # feed over the versioned table
    "merge_upsert_orders",
    "cdf_orders_merge",
    "rcte_customer_hierarchy",
    "events_gap_fill",
    "stream_cdc_upsert",
    "versioned_skipping_read",
    "cdf_history_rollup",
    "hll_intersect_users",
    # round-8: the composed E1 senzing lifecycle, now oracle-gated as a
    # registry query (r7 VERDICT item 1) — replaces the un-oracled
    # fixture-driven e1_senzing_pipeline bench-only row
    "e1_senzing_lifecycle",
    # round-8: sampled-source Brandes betweenness (GDS centrality
    # surface, r7 VERDICT item 3)
    "g_betweenness_topk",
    # round-8: deterministic one-level Louvain (r7 VERDICT item 4)
    "g_louvain_communities",
    # round-8: node2vec walk corpus -> skip-gram pair generation
    "g_node2vec_pairs",
    # round-8: DSIR-style hashed-ngram importance resampling (LLM tier)
    "dsir_importance_sample",
    # round-8: weighted supernode refinement of the Louvain partition
    "g_louvain_two_level",
    # round-8: Delta-style conditional MERGE (monotone upsert) under
    # the full hash oracle
    "merge_conditional_upsert",
    # round-8: Spark 4 SQL pipe syntax surface
    "pipe_syntax_shipping_rollup",
    # round-8: Katz centrality (completes the classic GDS centrality set)
    "g_katz_top20",
    # round-9: eigenvector centrality — exact-integer shifted power
    # iteration (r8 VERDICT item 7)
    "g_eigenvector_top20",
    # round-9: weighted level-1 Louvain over trade-count edge mass
    # (r8 VERDICT item 8)
    "g_louvain_weighted_l1",
    # round-9: perceptual image near-dup dedup — real PPM decode ->
    # aHash/dHash -> Hamming-banded LSH (r8 VERDICT item 1)
    "dedup_image_phash_pairs",
    # round-9: flood-safe collapse-first cluster assignment
    # (r8 VERDICT item 5)
    "dedup_flood_clusters",
    # round-9: GDS nodeSimilarity — exact neighbor-set Jaccard via a
    # common-customer self-join on the bounded-degree side
    "g_node_similarity",
    # round-9: MMR diversified retrieval (distributed top-N cut +
    # unrolled integer-exact greedy re-rank)
    "mmr_diversified_topk",
    # round-9: SemDeDup-style cluster-balanced curation sample over
    # the shared k-means centroids
    "curation_cluster_sample",
    # round-9: online near-dup ingest gate — stateless per-row MinHash
    # stream-static band join vs the historical corpus index
    "stream_neardup_verdicts",
    # round-9: GraphSAGE-style fixed-fanout neighbor sampling (GNN
    # training-data pipeline)
    "g_neighbor_sample",
    # round-9: eval-contamination audit — near-dup pairs crossing the
    # md5-coin train/val/test split
    "split_leakage_audit",
    # round-9 wave 2: spanning-forest + independent-set GDS verbs
    "g_mst_forest",
    "g_mis_luby",
    "g_pagerank_incremental",
    "g_diameter_bound",
    # round-9 wave 2: CUSUM changepoints and PrefixSpan-style patterns
    "events_cusum_changepoint",
    "seq_pattern_mining",
    # round-9 wave 2: curation coreset + retrieval-quality eval
    "coreset_kcenter",
    "retrieval_ndcg_eval",
    # round-9 wave 2: real WAV round-trip audio features
    "multimodal_audio_features",
    # round-9 wave 2: Hilbert layout key (liquid-clustering shape)
    "hilbert_clustering",
    # round-9 wave 2: warm-start PageRank maintenance (6 base + 3
    # delta iterations; the per-batch cost is phase 2 only)
    "g_pagerank_incremental",
    # round-9 wave 2: Benford DQ audit + double-BFS diameter bound
    "dq_benford_digits",
    "g_diameter_bound",
    # round-9 waves 3-5: coloring, assortativity, monitoring battery,
    # privacy tier, ER/dedup governance, mixture/contrastive tiers,
    # weighted PageRank, ExactSubstr spans, histogram quantiles,
    # watermark late-drop, GROUPING SETS
    "g_greedy_coloring",
    "g_degree_assortativity",
    "events_seasonal_decompose",
    "events_autocorrelation",
    "events_mann_kendall",
    "dp_noisy_counts",
    "l_diversity_audit",
    "er_blocking_quality",
    "corpus_domain_divergence",
    "hardneg_mining",
    "split_neardup_leakage",
    "mixture_temperature_weights",
    "stream_late_data_drop",
    "olap_grouping_sets",
    "g_pagerank_weighted",
    "dedup_substring_spans",
    "approx_quantiles_histogram",
    # round-10: persisted warm-start PageRank (maintenance served off
    # the versioned rank table) + BPE encode-side fertility stats
    "g_pagerank_warmstart_lakehouse",
    "bpe_encode_fertility",
]

# The iterative graph family: spread ([best, worst]) is recorded for
# any of these that runs >3 s, so ambient variance is visible in the
# artifact. An explicit tuple, not a name-prefix heuristic (r5 ADVICE:
# startswith("g") misclassifies future non-graph g* names).
GRAPH_QUERIES = (
    "g_greedy_coloring",
    "g_pagerank_weighted",
    "g3_two_hop_reach",
    "g5_pagerank_top20",
    "g5_textrank_phrases",
    "g6_connected_components",
    "g_motif_reach",
    "g_shortest_paths",
    "g_label_propagation",
    "g_hits_top",
    "g_ppr_watchlist",
    "g_link_prediction",
    "g_clustering_coeff",
    "g_scc_nations",
    "g_weighted_sssp",
    "g_triangle_count",
    "g_kcore",
    "g_ktruss",
    "g_harmonic_closeness",
    "g_betweenness_topk",
    "g_louvain_communities",
    "g_node2vec_pairs",
    "g_louvain_two_level",
    "g_katz_top20",
    "g_eigenvector_top20",
    "g_louvain_weighted_l1",
    "g_node_similarity",
    "g_mst_forest",
    "g_mis_luby",
    "g_pagerank_incremental",
    "g_diameter_bound",
)


# ---------------------------------------------------------------------------
# Paired-control protocol (r9 VERDICT item 6): cross-round geomeans
# are confounded by ambient host drift (SCALING.md "Bench variance":
# unchanged code reproduces ~1.2x swings across sessions). Each bench
# run therefore also times a FROZEN control commit — a detached git
# worktree of the r9 tag — on a 10-query panel in the same host
# state, immediately after the suite. The drift estimate is
# geomean(control_now / control_recorded_in_r9); the corrected
# cross-round ratio divides it out. The panel mixes the classes drift
# hits differently: scan-light relational, sub-second ambient-class,
# and the barrier-heavy iterative graph family where drift
# concentrates. Controls run best-of-2 after the same shared-build
# warm-up protocol the recorded r9 numbers had.
#
# When CONTROL_COMMIT is rotated forward, CONTROL_BASELINE must
# rotate with it — the baseline is the recording made by the control
# commit's own code in its own round.
# ---------------------------------------------------------------------------
CONTROL_COMMIT = "e45c398cf8d161dd839e04148793cbc668ab56d5"  # round 9 final
CONTROL_BASELINE = "BENCH_LOCAL_r09.json"
CONTROL_WORKTREE = "/tmp/erkg_ctrl_r9"
# r11 (r10 VERDICT item 7): the panel is stratified by FAMILY so the
# drift correction reports per-family geomeans, not one global number
# anchored on ~5% of the suite. Every query exists in the control
# commit's registry and in CONTROL_BASELINE.
CONTROL_FAMILIES = {
    "relational": [
        "q1_pricing_summary",
        "q3_top_orders",
        "w4_argmax_part_supplier",
        "olap_grouping_sets",
    ],
    "events_window": [
        "events_sessionize",
        "session_top_paths",
        "rolling_distinct_users_7d",
        "w6_analytic_functions",
    ],
    "graph_iterative": [
        "g5_pagerank_top20",
        "g_mst_forest",
        "g_mis_luby",
        "g_kcore",
        "g_louvain_weighted_l1",
        "g_betweenness_topk",
    ],
    "streaming": [
        "stream_hourly_rollup",
        "stream_sessionize_closed",
        "stream_late_data_drop",
    ],
    "vector_ann": [
        "knn_cosine_bruteforce",
        "knn_cosine_ivf",
        "dedup_embedding_cosine",
    ],
    "lakehouse": [
        "merge_upsert_orders",
        "timetravel_orders_snapshot",
        "cdf_orders_merge",
    ],
    "text_dedup": [
        "dedup_clusters",
        "text_contamination",
        "simjoin_prefix_filter",
        "bpe_train_merges",
    ],
}
CONTROL_PANEL = [q for fam in CONTROL_FAMILIES.values() for q in fam]

_CONTROL_SCRIPT = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from erkg_tutorials_spark.session import get_spark
from erkg_tutorials_spark.plans.registry import QUERIES
sf_dir = sys.argv[1]
panel = sys.argv[2:]
spark = get_spark("erkg-bench-control", extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()
from erkg_tutorials_spark.catalog import TABLES, load_tables
cat = load_tables(spark, sf_dir)
for t in TABLES:
    cat[t].count()
from erkg_tutorials_spark.plans.graphq import (
    trade_edges_fwd, trade_graph_invariants,
)
from erkg_tutorials_spark.plans.textq import minhash_pairs_cached
trade_edges_fwd(spark, sf_dir).count()
for df in trade_graph_invariants(spark, sf_dir):
    df.count()
minhash_pairs_cached(spark, sf_dir).count()
timings = {}
for name in panel:
    runs = []
    for _ in range(2):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    timings[name] = round(min(runs), 3)
print("CONTROL_JSON:" + json.dumps(timings))
spark.stop()
"""


def _run_control(here: str, sf_dir: str) -> dict | None:
    """Time the frozen control commit's panel in this host state;
    returns {"queries": ..., "drift_geomean": ...} or None if the
    worktree / subprocess / baseline is unavailable (the artifact
    then records control=null rather than failing the bench)."""
    import subprocess

    if os.environ.get("SPARK_GRAFT_NO_CONTROL"):
        return None
    try:
        if not os.path.isdir(os.path.join(CONTROL_WORKTREE, "erkg_tutorials_spark")):
            subprocess.run(
                ["git", "worktree", "add", "--detach", CONTROL_WORKTREE,
                 CONTROL_COMMIT],
                cwd=here, check=True, capture_output=True, text=True,
            )
        proc = subprocess.run(
            [sys.executable, "-c", _CONTROL_SCRIPT, sf_dir, *CONTROL_PANEL],
            cwd=CONTROL_WORKTREE, capture_output=True, text=True,
            timeout=1800,
        )
        line = next(
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("CONTROL_JSON:")
        )
        now = json.loads(line[len("CONTROL_JSON:"):])
        with open(os.path.join(here, CONTROL_BASELINE)) as fh:
            base = json.load(fh)["queries"]
        def _geo(qnames) -> float | None:
            rs = [
                now[q] / base[q]
                for q in qnames
                if q in now and base.get(q, 0) > 0 and now[q] > 0
            ]
            if not rs:
                return None
            return round(math.exp(sum(math.log(r) for r in rs) / len(rs)), 3)

        return {
            "commit": CONTROL_COMMIT,
            "baseline": CONTROL_BASELINE,
            "queries": now,
            "drift_geomean": _geo(CONTROL_PANEL),
            "drift_by_family": {
                fam: _geo(qnames)
                for fam, qnames in CONTROL_FAMILIES.items()
            },
        }
    except Exception as exc:  # noqa: BLE001 - diagnostic, not fatal
        print(f"control bench unavailable: {exc}", file=sys.stderr)
        return None


HUB_DEG = 8192  # synthetic hub degree: 4x CLUSTERING_DEG_CAP


def _bench_hub_clustering(spark, sf_dir: str) -> tuple[dict, dict]:
    """Time BOTH clustering branches on a hub-HEAVY graph (r5 VERDICT
    item 1: the wedge-join branch exists specifically for 100× scale
    but had zero timing evidence — the sf0.1 co-order graph is hubless,
    so the runtime probe never picks it).

    Graph = the sf co-order edge set + one synthetic hub (vertex -1,
    which canonically precedes every part id) wired to the HUB_DEG
    smallest part vertices. Same graph, two plans:

    * ``g_clustering_hub_hybrid`` — production cap (2048): the hub's
      8192 incident edges route through the distributed wedge join
      (min-degree-routed), everything else keeps the broadcast
      intersection.
    * ``g_clustering_hub_lean``  — cap forced above the hub degree:
      the broadcast-only plan carries the hub's 8192-element adjacency
      array through the broadcast and intersects it per edge. Viable
      at THIS size; the number documents what the hybrid's overhead
      buys relative to it.

    Branch equality is fixture-pinned (tests/test_graph_frames.py, cap
    5 vs 1e9), so this measures cost, not correctness."""
    from pyspark.sql import functions as F

    from erkg_tutorials_spark.plans.graphq import (
        _adjacency_arrays,
        clustering_from_edges,
        part_coorder_edges,
    )

    pp = part_coorder_edges(spark, sf_dir)
    hub_nbrs = (
        pp.select(F.col("u").alias("v")).distinct().orderBy("v").limit(HUB_DEG)
    )
    hub_edges = hub_nbrs.select(F.lit(-1).cast("long").alias("u"), "v")
    g = pp.select(F.col("u").cast("long"), F.col("v").cast("long")).unionByName(
        hub_edges
    ).cache()
    g.count()
    nbrs = _adjacency_arrays(g).cache()
    nbrs.count()

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, cap in (
        ("g_clustering_hub_hybrid", None),  # production cap → wedge branch
        ("g_clustering_hub_lean", 1 << 62),  # force broadcast-only
    ):
        runs = []
        for _ in range(2):
            t0 = time.time()
            df = (
                clustering_from_edges(g, nbrs=nbrs, has_hubs=True)
                if cap is None
                else clustering_from_edges(g, deg_cap=cap, nbrs=nbrs, has_hubs=False)
            )
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]
    g.unpersist()
    nbrs.unpersist()
    return timings, spread


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # no UI + minimal listener retention: the status store otherwise
    # accumulates per-stage state for ~82 queries x thousands of tasks,
    # a driver-side overhead that taxes the later queries in the suite
    spark = get_spark(
        "erkg-bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "10",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up: JVM/codegen on a trivial plan + one pass over each input
    # table (page cache + parquet reader init), so timings measure
    # steady-state query execution, not first-touch costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    from erkg_tutorials_spark.catalog import TABLES, load_tables

    cat = load_tables(spark, sf_dir)
    for t in TABLES:
        cat[t].count()

    # Shared materialized views (graph edge table, MinHash pair set)
    # are consumed by several queries; their one-time build is timed
    # HERE as an explicit suite entry so the per-query numbers below
    # measure steady-state execution with the views available, while
    # the suite total still pays every materialization exactly once.
    # (Best-of-2 would otherwise silently drop the build cost.)
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

    # The four build chains are independent (disjoint memo keys), so
    # they refresh CONCURRENTLY from worker threads — Spark's scheduler
    # interleaves their jobs across the executor cores exactly as a
    # warehouse overlaps materialized-view refreshes. Wall time is the
    # longest chain, not the sum; the graph chain orders fwd-edges
    # before its dependent invariants itself.
    from concurrent.futures import ThreadPoolExecutor

    def _graph_chain() -> None:
        trade_edges_fwd(spark, sf_dir).count()
        invs = trade_graph_invariants(spark, sf_dir)
        with ThreadPoolExecutor(3) as inner:
            list(inner.map(lambda df: df.count(), invs))
        # PPR's teleport vector is index state like the invariants
        # above — warm it here so g_ppr_watchlist times steady-state
        # scoring, same as its pagerank sibling (depends on verts, so
        # it follows the invariants sequentially)
        ppr_watchlist_tp_cached(spark, sf_dir).count()

    def _coorder_chain() -> None:
        part_coorder_edges(spark, sf_dir).count()
        coorder_nbrs_cached(spark, sf_dir).count()

    # prbase is persisted index state like the memoized invariants:
    # pre-committing it here keeps the timed warmstart query on the
    # 3-iteration maintenance path whatever the ambient /tmp state
    # (r10 ADVICE — otherwise cold-cache rounds time the one-off
    # 6-iteration base build and round totals compare warm vs cold).
    from erkg_tutorials_spark.plans.graphq2 import ensure_prbase

    chains = [
        ("graph_invariants", _graph_chain),
        ("coorder_edges", _coorder_chain),
        ("minhash_pairs", lambda: minhash_pairs_cached(spark, sf_dir).count()),
        ("ivf_centroids", lambda: ivf_centroids_cached(spark, sf_dir).count()),
        ("pq_codes", lambda: pq_codes_cached(spark, sf_dir).count()),
        ("prbase_snapshot", lambda: ensure_prbase(spark, sf_dir)),
    ]
    timings: dict[str, float] = {}
    # Per-chain (= per-family) cost breakdown (r10 VERDICT item 4):
    # the chains run CONCURRENTLY, so each entry is that chain's own
    # start→finish duration under contention — what a user running one
    # family's first query would roughly pay — while the suite entry
    # stays the wall time of the longest chain.
    shared_breakdown: dict[str, float] = {}

    def _timed(name: str, fn) -> None:
        c0 = time.time()
        fn()
        shared_breakdown[name] = round(time.time() - c0, 3)

    t0 = time.time()
    with ThreadPoolExecutor(len(chains)) as pool:
        futures = [pool.submit(_timed, n, c) for n, c in chains]
        for f in futures:
            f.result()
    timings["shared_materializations"] = round(time.time() - t0, 3)

    # best-of-2 per query (JMH-style): the first run pays per-plan
    # codegen compilation; the second is the throughput number. For
    # the expensive iterative graph family, both runs are also
    # recorded as [best, worst] so ambient variance (SCALING.md
    # "Bench variance") is visible in the artifact instead of folded
    # silently into best-of.
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        runs = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        if name in GRAPH_QUERIES and max(runs) > 3.0:
            spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    # The synthetic hub-clustering runs are evidence for the wedge-join
    # branch, NOT part of the headline suite: they live in a separate
    # "microbench" section so headline_suite_total stays comparable
    # with BENCH_r01..05 (which had no hub entries).
    hub_timings, hub_spread = _bench_hub_clustering(spark, sf_dir)

    here = os.path.dirname(os.path.abspath(__file__))
    control = _run_control(here, sf_dir)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "shared_breakdown": shared_breakdown,
        "microbench": {"queries": hub_timings, "spread": hub_spread},
        "control": control,
        "sf": sf,
    }
    # Persist the COMPLETE artifact in-repo: the driver's capture
    # keeps only the last ~2 KB of stdout, which truncated the front
    # half of the per-query dict in BENCH_r05..r08.json.
    # Round number = 1 + the highest committed driver artifact, unless
    # pinned via SPARK_GRAFT_ROUND.
    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    rnd = int(os.environ.get("SPARK_GRAFT_ROUND", max(rounds, default=0) + 1))
    with open(os.path.join(here, f"BENCH_LOCAL_r{rnd:02d}.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # Full artifact first (local capture / logs), then a compact summary
    # as the FINAL stdout line: the driver stores only a ~2000-char
    # stdout tail and json-parses its last line, so the closer is the
    # one that must fit (r8 VERDICT item 3 — BENCH_r08.json parsed=null).
    summary = _compact_summary(result, here, rnd)
    # the canonical round-over-round sentence, printed by the bench
    # itself so prose/commits quote the artifact instead of re-deriving
    # it (r11 VERDICT item 7: a commit message said "16% faster" where
    # the artifact recorded corrected=0.903): raw geomean / control
    # drift, and the DIRECTION spelled out.
    corr = summary.get("geomean_vs_prev_corrected")
    if corr is not None:
        direction = "faster" if corr < 1 else "slower"
        print(
            f"[bench] drift-corrected geomean vs r{rnd - 1}: "
            f"corrected={corr} (raw={summary['geomean_vs_prev_round']}, "
            f"control drift={summary['control_drift_geomean']}) — "
            f"{abs(1 - corr) * 100:.0f}% {direction} than last round",
            file=sys.stderr,
        )
    print(json.dumps(result))
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

"""Render PLANS.md: formatted physical plans for representative
registry queries, so the plan-shape claims (pushdown, pruning,
broadcasts, codegen spans, single-exchange aggregations) are visible
without running anything. Usage:

    python tools/dump_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erkg_tutorials_spark.plans.registry import QUERIES  # noqa: E402
from erkg_tutorials_spark.session import get_spark  # noqa: E402

# query -> what to look for in its plan
SHOWCASE = [
    (
        "q1_pricing_summary",
        "Filter pushed to the parquet scan (PushedFilters on l_shipdate), "
        "pruned ReadSchema (7 of 11 lineitem columns), partial+final hash "
        "aggregation inside one WholeStageCodegen span per stage.",
    ),
    (
        "q5_region_revenue",
        "Star join: the region/nation/supplier dims broadcast; the only "
        "exchanges are the fact-side aggregations.",
    ),
    (
        "runtime_prefilter_join",
        "Hand-rolled runtime filter: both the coarse-hash prefilter and the "
        "exact confirm are broadcast semi-joins — no SortMergeJoin anywhere.",
    ),
    (
        "sample_bottom_k",
        "Bottom-k hash sampling compiles to TakeOrderedAndProject: "
        "per-partition top-k heaps, never a global sort of the table.",
    ),
    (
        "cdc_apply_changes",
        "CDC apply is ONE exchange (the key window); the change-stream "
        "synthesis is scan-side projection.",
    ),
    (
        "g_clustering_coeff",
        "Edge-centric triangle counting: the adjacency-array table "
        "broadcasts (two BroadcastHashJoins); no wedge set is materialized.",
    ),
    (
        "knn_cosine_pq",
        "Product-quantization ADC: the lookup table broadcasts against the "
        "codes corpus — the codes are never shuffled by (m, code).",
    ),
    (
        "hierarchy_rollup",
        "Materialized-path rollup: the ancestor explosion runs inside the "
        "scan stage; one aggregation exchange total.",
    ),
    (
        "e2_corpus_curation",
        "The composed curation funnel: dedup window + token aggregation are "
        "the only wide stages; every filter is scan-side.",
    ),
    (
        "bucketed_colocated_revenue",
        "Bucketed-layout join (r6): both scans read pre-bucketed catalog "
        "tables. At this dump's tiny SF the optimizer (rightly) broadcasts "
        "the orders side instead of using the bucket layout; with broadcast "
        "disabled the SortMergeJoin runs with NO Exchange on either side — "
        "pinned by tests/test_scale_patterns.py::TestBucketedJoin. Either "
        "way the only shuffle is the final 5-group aggregation.",
    ),
    (
        "heavy_hitters_users",
        "Two-pass heavy hitters (r6): the MapInPandas stage is the bounded "
        "O(K)-state Misra-Gries pruning pass; the exact count runs after a "
        "broadcast semi-join on the candidate set, so the wide aggregation "
        "touches candidates only.",
    ),
    (
        "bloom_prefilter_orders",
        "Bloom prefilter (r6): the fact scan cross-joins ONE broadcast "
        "bitmap row and computes the 3-hash membership verdict map-side "
        "(element_at + shiftrightunsigned on packed 64-bit words) — no "
        "fact-side exchange before the final partial-aggregated scalar "
        "rollup.",
    ),
    (
        "simjoin_prefix_filter",
        "Exact prefix-filtered similarity join (r6): the row_number window "
        "is PARTITIONED by doc_id (rarest-first prefix selection), the "
        "candidate equi-join shuffles prefix tokens only, and the verify "
        "join touches surviving candidate pairs — no cartesian product "
        "anywhere in the plan.",
    ),
    (
        "variant_props_metrics",
        "Spark 4 VARIANT path (r6): parse_json/try_variant_get are plain "
        "Catalyst expressions — the whole extraction runs inside "
        "WholeStageCodegen with no Python boundary; one partial-aggregated "
        "exchange on the low-cardinality event_type key.",
    ),
    (
        "udtf_event_runlengths",
        "Lateral Python UDTF (r6): exactly one ArrowEvalPythonUDTF node, "
        "entered once per user-row AFTER the collect_list groupBy — the "
        "Python boundary sits above the single exchange, never on the "
        "per-event path.",
    ),
    (
        "e3_pretrain_shards",
        "Composed pretraining pipeline (r6): keep-best near-dup, logistic "
        "quality gate, and hash sharding fuse into ONE lazy plan — the "
        "quality logit and shard keys are scan-side projections; the only "
        "exchanges are the memoized MinHash band join, the cluster/feature "
        "groupBys, and the 16-row manifest aggregation.",
    ),
    (
        "e1_senzing_lifecycle",
        "Composed E1 lifecycle (r8): seed match, 2-hop reach, semi/anti "
        "filters, description/type synthesis, and the A1 distribution "
        "join fuse into one DAG — the nation dim broadcasts, the reach "
        "and urgent-order filters are hash semi/anti joins, no "
        "cartesian product.",
    ),
    (
        "dsir_importance_sample",
        "DSIR resampling (r8): the 256-row hashed-bucket log-ratio table "
        "broadcasts into the gram-scoring join; the only wide exchange "
        "is the per-doc score groupBy, and the top-K cut is a "
        "TakeOrderedAndProject.",
    ),
    (
        "g_louvain_communities",
        "Louvain summary stage (r8; the move rounds are checkpoint-backed "
        "LogicalRDDs): the |V|-row label table broadcasts onto BOTH "
        "endpoints of the edge scan for the intra-community count — the "
        "edge table never shuffles.",
    ),
    (
        "g_degree_assortativity",
        "Assortativity (r9): the degree table joins both edge endpoints "
        "as hash joins and collapses to ONE row in DECIMAL(38,0) partial+"
        "final aggregation - no window, no cartesian, no sqrt.",
    ),
    (
        "dp_noisy_counts",
        "DP geometric mechanism (r9): pure column arithmetic (md5 -> conv "
        "-> bin -> length) on the grouped table - exactly the count's own "
        "exchange, no join, no Python boundary.",
    ),
    (
        "split_neardup_leakage",
        "Cross-split leakage (r9): split coins are computed as a pure "
        "projection on the memoized LSH pair table (scan-side hash "
        "arithmetic, no join at all), so the only corpus-scale work "
        "remains the memoized pair build.",
    ),
    (
        "hardneg_mining",
        "Hard-negative mining (r9): knn-bruteforce shape - the 10-row "
        "query set broadcasts onto the partitioned corpus "
        "(BroadcastNestedLoopJoin), scoring is a JVM zip_with/aggregate "
        "fold, and the label filter prunes before the per-query top-k "
        "window.",
    ),
    (
        "simjoin_prefix_filter",
        "PPJoin (r10): candidates come from a prefix x prefix self-join "
        "(each side ships only its n-ceil(tau*n)+1 rarest tokens) with "
        "the integer-exact positional filter applied inside the join "
        "stage - the suffix tokens never reach an exchange; the verify "
        "join touches only surviving pairs.",
    ),
    (
        "g_pagerank_warmstart_lakehouse",
        "Persisted warm-start PageRank (r10): the visible plan reads the "
        "versioned rank snapshot (manifest-pinned parquet file scan) and "
        "runs only the 3 maintenance iterations; the 6-iteration base "
        "chain amortizes across batches inside the lakehouse table.",
    ),
    (
        "bpe_encode_fertility",
        "BPE encode stats (r10): one corpus explode + (source, word) "
        "partial-aggregated groupBy joined against the |vocabulary|-row "
        "symbol-count table; every ratio is an integer div - no Python "
        "boundary, no float.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("erkg-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    print("# PLANS — formatted physical plans for representative queries")
    print()
    print(f"Generated by `python tools/dump_plans.py {sf_dir}`; plan shapes")
    print("are scale-invariant (AQE may re-plan exchanges at runtime, which")
    print("these static plans show as AdaptiveSparkPlan wrappers).")
    for name, note in SHOWCASE:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        print(f"\n## {name}\n\n{note}\n\n```\n{plan}\n```")

    # Streaming micro-batch plan (r6): what batch explain cannot show.
    # Run the watermarked stream-stream interval join to completion and
    # capture the executed micro-batch physical plan — the state-store
    # operators (StreamingSymmetricHashJoin, StateStoreSave, watermark
    # assignment) and the 8-partition state layout (see
    # plans/streamq.py STREAM_SHUFFLE_PARTITIONS) are all visible.
    from erkg_tutorials_spark.plans.streamq import STREAM_SHUFFLE_PARTITIONS
    from erkg_tutorials_spark.streaming.events import read_events_stream
    from erkg_tutorials_spark.streaming.joins import attribution_stream

    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS)
    )
    q = (
        attribution_stream(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("plansdump_attribution")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain()
    print(
        "\n## stream_attribution_pairs (micro-batch physical plan)\n\n"
        "Watermarked stream-stream interval join, as executed: each side "
        "shuffles once into the StreamingSymmetricHashJoin's state "
        f"partitions ({STREAM_SHUFFLE_PARTITIONS} stores — sized by state "
        "volume, not the batch shuffle default; see SCALING.md), watermark "
        "assignment rides the scan stage, and match emission is append-"
        "mode with no post-join exchange. (Captured after the drain, so "
        "the sources show the final no-data micro-batch's empty "
        "LocalTableScan; the operator/exchange/state shape is identical "
        "for data batches.)\n\n"
        f"```\n{buf.getvalue().rstrip()}\n```"
    )
    spark.stop()


if __name__ == "__main__":
    main()

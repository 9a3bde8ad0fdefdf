"""Tests for the RAG preprocessing tier (plans/ragops.py)."""

from pyspark.sql import functions as F

from erkg_tutorials_spark.plans.ragops import (
    CHUNK_S,
    CHUNK_W,
    RRF_TOPK,
    doc_chunks,
    hybrid_rrf_search,
)
from tests.conftest import SF_DIR


class TestDocChunks:
    def test_full_coverage_and_overlap(self, spark):
        rows = doc_chunks(spark, SF_DIR).collect()
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(
                "doc_id",
                F.size(F.split(F.lower("text"), " ")).alias("n_tok"),
            )
            .collect()
        )
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for d in docs:
            chunks = sorted(by_doc[d.doc_id], key=lambda r: r.chunk_id)
            # chunk starts advance by exactly the stride, first at 1
            assert [c.chunk_start for c in chunks] == [
                k * CHUNK_S + 1 for k in range(len(chunks))
            ]
            # every chunk spans min(W, remaining) tokens from its start
            for c in chunks:
                assert c.n_tok == min(CHUNK_W, d.n_tok - c.chunk_start + 1)
            # total coverage: last chunk ends at the document end
            last = chunks[-1]
            assert last.chunk_start + last.n_tok - 1 == d.n_tok
            # token counts in chunk text agree
            for c in chunks:
                assert len(c.chunk_text.split(" ")) == c.n_tok

    def test_reconstruction_via_strides(self, spark):
        # concatenating each chunk's first S tokens (all of the last)
        # reproduces the document
        rows = doc_chunks(spark, SF_DIR).collect()
        texts = {
            r.doc_id: r.text.lower()
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        }
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, chunks in by_doc.items():
            chunks.sort(key=lambda r: r.chunk_id)
            parts = []
            for c in chunks[:-1]:
                parts.extend(c.chunk_text.split(" ")[:CHUNK_S])
            parts.extend(chunks[-1].chunk_text.split(" "))
            assert " ".join(parts) == texts[doc_id]


class TestHybridRrf:
    def test_fusion_structure(self, spark):
        rows = hybrid_rrf_search(spark, SF_DIR).collect()
        assert 0 < len(rows) <= 2 * RRF_TOPK
        for r in rows:
            assert r.rank1 is not None or r.rank2 is not None
            assert r.rrf > 0
        ranks = sorted(r.fused_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))

    def test_doc_in_both_lists_outranks_single_list_peers(self, spark):
        rows = hybrid_rrf_search(spark, SF_DIR).collect()
        both = [r for r in rows if r.rank1 is not None and r.rank2 is not None]
        single = [r for r in rows if r.rank1 is None or r.rank2 is None]
        if both and single:
            # best dual-list doc beats the worst single-list doc
            assert max(r.rrf for r in both) > min(r.rrf for r in single)


class TestChunkRetrieval:
    def test_topk_ranked_and_scores_valid(self, spark):
        from erkg_tutorials_spark.plans.ragops import (
            RETRIEVAL_TOPK,
            chunk_retrieval,
        )

        rows = chunk_retrieval(spark, SF_DIR).collect()
        assert len(rows) == RETRIEVAL_TOPK
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
            range(1, RETRIEVAL_TOPK + 1)
        )
        scores = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert all(0 < s <= 1.0 + 1e-9 for s in scores)
        assert scores == sorted(scores, reverse=True)

    def test_retrieved_chunks_exist(self, spark):
        from erkg_tutorials_spark.plans.ragops import chunk_retrieval, doc_chunks

        hits = {(r.doc_id, r.chunk_id) for r in chunk_retrieval(spark, SF_DIR).collect()}
        chunks = {
            (r.doc_id, r.chunk_id) for r in doc_chunks(spark, SF_DIR).collect()
        }
        assert hits <= chunks

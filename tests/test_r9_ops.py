"""Round-9 operators: GDS node similarity, MMR diversified retrieval,
cluster-balanced curation sampling, and the streaming near-dup gate.

Exact-value correctness is carried by the full DuckDB hash oracle
(tools/check_correctness.py); these tests pin the semantic invariants
and the cross-tier equivalences the oracle can't see."""

from pyspark.sql import functions as F

from erkg_tutorials_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


class TestNodeSimilarity:
    def test_invariants(self, spark):
        rows = QUERIES["g_node_similarity"](spark, SF_DIR).collect()
        assert rows, "sf0.001 trade graph must yield similar supplier pairs"
        for r in rows:
            assert r.s1 < r.s2
            assert r.s1.startswith("s:") and r.s2.startswith("s:")
            assert 1 <= r.n_common <= r.n_union
            assert 0 < r.jaccard_micro <= 1_000_000
        micro = [r.jaccard_micro for r in rows]
        assert micro == sorted(micro, reverse=True)

    def test_jaccard_matches_set_recomputation(self, spark):
        """Recompute one pair's Jaccard from the raw neighbor sets."""
        from erkg_tutorials_spark.plans.graphq import trade_edges_fwd

        top = QUERIES["g_node_similarity"](spark, SF_DIR).limit(1).collect()[0]
        nbrs = {
            s: {
                r.src
                for r in trade_edges_fwd(spark, SF_DIR)
                .where(F.col("dst") == s)
                .collect()
            }
            for s in (top.s1, top.s2)
        }
        inter = len(nbrs[top.s1] & nbrs[top.s2])
        union = len(nbrs[top.s1] | nbrs[top.s2])
        assert top.n_common == inter and top.n_union == union
        assert top.jaccard_micro == round(1_000_000.0 * inter / union)

    def test_no_cartesian_product(self, spark):
        plan = (
            QUERIES["g_node_similarity"](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan


class TestMMR:
    def test_greedy_selection_recomputed(self, spark):
        """Replay the greedy MMR loop in plain Python over the
        candidate micro-cosines and demand the identical picks."""
        from erkg_tutorials_spark.plans.ragops import (
            MMR_CAND,
            MMR_K,
            MMR_QUERY_ID,
            MMR_W_PEN,
            MMR_W_REL,
        )
        from erkg_tutorials_spark.catalog import load_tables

        got = (
            QUERIES["mmr_diversified_topk"](spark, SF_DIR)
            .orderBy("mmr_rank")
            .collect()
        )
        assert [r.mmr_rank for r in got] == list(range(1, MMR_K + 1))
        assert len({r.vec_id for r in got}) == MMR_K

        emb = {
            r.vec_id: r.embedding
            for r in load_tables(spark, SF_DIR)["embeddings"].collect()
        }

        def micro(a, b):
            dot = na = nb = 0.0
            for x, y in zip(a, b):
                dot += float(x) * float(y)
                na += float(x) * float(x)
                nb += float(y) * float(y)
            return round(1_000_000 * dot / (na**0.5 * nb**0.5))

        q = emb[MMR_QUERY_ID]
        rel = {i: micro(v, q) for i, v in emb.items() if i != MMR_QUERY_ID}
        cand = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_CAND]
        picked = []
        for _ in range(MMR_K):
            best = min(
                (i for i in cand if i not in picked),
                key=lambda i: (
                    -(
                        MMR_W_REL * rel[i]
                        - (
                            MMR_W_PEN
                            * max(micro(emb[i], emb[s]) for s in picked)
                            if picked
                            else 0
                        )
                    ),
                    i,
                ),
            )
            picked.append(best)
        assert [r.vec_id for r in got] == picked

    def test_rank1_is_top_relevance_and_later_picks_diversify(self, spark):
        got = (
            QUERIES["mmr_diversified_topk"](spark, SF_DIR)
            .orderBy("mmr_rank")
            .collect()
        )
        # rank 1 is the pure-relevance argmax ...
        assert got[0].rel_micro == max(r.rel_micro for r in got)
        assert got[0].score == 7 * got[0].rel_micro
        # ... and every later pick's score is relevance plus a bounded
        # diversity term (the penalty itself may be negative when the
        # whole selected set is anti-correlated with the candidate, so
        # no sign is asserted — exact scores are replayed in
        # test_greedy_selection_recomputed)
        for r in got[1:]:
            assert abs(r.score - 7 * r.rel_micro) <= 3 * 1_000_000


class TestCurationSample:
    def test_quota_and_totals(self, spark):
        from erkg_tutorials_spark.catalog import load_tables
        from erkg_tutorials_spark.plans.vectorq import CURATION_QUOTA

        rows = QUERIES["curation_cluster_sample"](spark, SF_DIR_01).collect()
        n_vecs = load_tables(spark, SF_DIR_01)["embeddings"].count()
        assert sum(r.n_total for r in rows) == n_vecs
        for r in rows:
            assert r.n_kept == min(r.n_total, CURATION_QUOTA)
        # the quota must actually bind somewhere at sf0.01, or the
        # query demonstrates nothing
        assert any(r.n_total > CURATION_QUOTA for r in rows)
        # fingerprint covers exactly the kept set: non-zero when kept
        assert all(r.kept_fp != 0 for r in rows if r.n_kept > 0)

    def test_deterministic_across_invocations(self, spark):
        a = sorted(
            map(tuple, QUERIES["curation_cluster_sample"](spark, SF_DIR).collect())
        )
        b = sorted(
            map(tuple, QUERIES["curation_cluster_sample"](spark, SF_DIR).collect())
        )
        assert a == b


class TestStreamNearDup:
    def test_matches_batch_cross_parity_pairs(self, spark):
        """The online verdicts must equal the batch corpus-wide pair
        set restricted to (arriving odd, historical even) pairs."""
        from erkg_tutorials_spark.catalog import load_tables
        from erkg_tutorials_spark.dedup.minhash import minhash_lsh_dedup

        got = sorted(
            (r.new_id, r.hist_id, r.jaccard)
            for r in QUERIES["stream_neardup_verdicts"](spark, SF_DIR).collect()
        )
        assert got, "sf0.001 plants cross-parity near-dups"
        docs = load_tables(spark, SF_DIR)["documents"]
        batch = minhash_lsh_dedup(
            docs, k=5, num_hashes=8, bands=2, threshold=0.5
        ).collect()
        want = sorted(
            (
                (r.id_a, r.id_b, r.jaccard)
                if r.id_a % 2 == 1
                else (r.id_b, r.id_a, r.jaccard)
            )
            for r in batch
            if (r.id_a % 2) != (r.id_b % 2)
        )
        assert got == want
        for new_id, hist_id, jac in got:
            assert new_id % 2 == 1 and hist_id % 2 == 0 and jac >= 0.5

    def test_stream_plan_is_stateless(self, spark):
        """The streaming side must need no state store: per-row
        signatures + stream-static join only (no agg, no dedup, no
        stream-stream join before the sink)."""
        from erkg_tutorials_spark.streaming.neardup import (
            historical_band_index,
            mapside_minhash,
            neardup_verdicts_stream,
            read_documents_stream,
        )
        from erkg_tutorials_spark.catalog import load_tables

        docs = load_tables(spark, SF_DIR)["documents"]
        index = historical_band_index(docs.where(F.col("doc_id") % 2 == 0))
        arriving = read_documents_stream(spark, SF_DIR).where(
            F.col("doc_id") % 2 == 1
        )
        v = neardup_verdicts_stream(arriving, index)
        assert v.isStreaming
        logical = v._jdf.queryExecution().logical().toString()
        assert "Aggregate" not in logical.split("Join")[0]

    def test_mapside_signature_matches_groupby_signature(self, spark):
        """The per-row array-expression signature must equal the batch
        explode+groupBy signature for every doc."""
        from erkg_tutorials_spark.catalog import load_tables
        from erkg_tutorials_spark.dedup.minhash import (
            minhash_signature,
            shingles,
        )
        from erkg_tutorials_spark.streaming.neardup import mapside_minhash

        docs = load_tables(spark, SF_DIR)["documents"].limit(200)
        batch_sig = {
            r.doc_id: tuple(r[f"h{i}"] for i in range(8))
            for r in minhash_signature(shingles(docs, k=5)).collect()
        }
        stream_shape = mapside_minhash(docs)  # batch df through the same fn
        per_doc: dict = {}
        for r in (
            stream_shape.select("id", "band", "bkey").collect()
        ):
            per_doc.setdefault(r.id, {})[r.band] = r.bkey
        for doc_id, sig in batch_sig.items():
            assert per_doc[doc_id][0] == "".join(sig[0:4])
            assert per_doc[doc_id][1] == "".join(sig[4:8])
        # unshingleable docs: NULL band keys, absent from batch_sig
        for doc_id, bands_ in per_doc.items():
            if doc_id not in batch_sig:
                assert all(v is None for v in bands_.values())


class TestNeighborSample:
    def test_fanout_bounds_and_edge_validity(self, spark):
        from erkg_tutorials_spark.plans.graphq import (
            NS_FANOUT1,
            NS_FANOUT2,
            trade_edges_fwd,
        )

        rows = QUERIES["g_neighbor_sample"](spark, SF_DIR).collect()
        assert rows
        hop1 = [r for r in rows if r.hop == 1]
        hop2 = [r for r in rows if r.hop == 2]
        assert hop1 and hop2
        per_seed: dict = {}
        for r in hop1:
            assert r.via == r.seed and r.node.startswith("s:")
            per_seed[r.seed] = per_seed.get(r.seed, 0) + 1
        assert max(per_seed.values()) <= NS_FANOUT1
        per_inst: dict = {}
        for r in hop2:
            assert r.node.startswith("c:") and r.via.startswith("s:")
            k = (r.seed, r.via)
            per_inst[k] = per_inst.get(k, 0) + 1
        assert max(per_inst.values()) <= NS_FANOUT2
        # hop-2 draws hang off sampled hop-1 instances only
        h1set = {(r.seed, r.node) for r in hop1}
        assert all((r.seed, r.via) in h1set for r in hop2)
        # every sampled edge is a real edge
        edges = {
            (r.src, r.dst) for r in trade_edges_fwd(spark, SF_DIR).collect()
        }
        assert all((r.seed, r.node) in edges for r in hop1)
        assert all((r.node, r.via) in edges for r in hop2)

    def test_draws_deterministic_and_seed_dependent(self, spark):
        a = sorted(map(tuple, QUERIES["g_neighbor_sample"](spark, SF_DIR).collect()))
        b = sorted(map(tuple, QUERIES["g_neighbor_sample"](spark, SF_DIR).collect()))
        assert a == b
        # hop-2 samples from one shared supplier must differ across
        # seeds somewhere (independent per-instance draws) — if every
        # shared supplier always yielded the same 2 customers, the
        # seed-dependent hash would be pointless. Only assert when a
        # supplier is actually shared with enough neighbors to differ.
        rows = [r for r in QUERIES["g_neighbor_sample"](spark, SF_DIR).collect() if r[1] == 2]
        by_via: dict = {}
        for seed, _hop, via, node in rows:
            by_via.setdefault(via, {}).setdefault(seed, set()).add(node)
        shared = {v: m for v, m in by_via.items() if len(m) >= 2}
        if shared:
            assert any(
                len({frozenset(s) for s in m.values()}) > 1
                for m in shared.values()
            )


class TestSplitLeakageAudit:
    def test_rows_are_cross_split_neardups(self, spark):
        rows = QUERIES["split_leakage_audit"](spark, SF_DIR).collect()
        assert rows, "sf0.001 plants cross-split near-dups"
        pair_set = {
            (r.id_a, r.id_b): r.jaccard
            for r in QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
        }
        for r in rows:
            assert r.split_a != r.split_b
            assert {r.split_a, r.split_b} <= {"train", "val", "test"}
            assert r.jaccard >= 0.5
            assert pair_set.get((r.id_a, r.id_b)) == r.jaccard

    def test_split_labels_match_split_assign_coins(self, spark):
        """The audit must use the exact md5-coin split of split_assign
        (same doc never in two different splits across queries)."""
        import hashlib

        rows = QUERIES["split_leakage_audit"](spark, SF_DIR).collect()

        def coin(doc_id: int) -> str:
            b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[12:16], 16) % 100
            return "train" if b < 80 else ("val" if b < 90 else "test")

        for r in rows:
            assert coin(r.id_a) == r.split_a and coin(r.id_b) == r.split_b

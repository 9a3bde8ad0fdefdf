"""Tests for connected components, SimHash, IVF ANN, entity
resolution, streaming, and multimodal plumbing."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from erkg_tutorials_spark.dedup.simhash import simhash, simhash_near_dup_pairs
from erkg_tutorials_spark.graph.connected_components import connected_components
from erkg_tutorials_spark.pipelines.entity_resolution import resolve_entities


class TestConnectedComponents:
    def test_two_components(self, spark):
        edges = spark.createDataFrame(
            [Row(src=a, dst=b) for a, b in [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)]]
        )
        got = {r.id: r.component for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    def test_chain_collapses(self, spark):
        edges = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(1, 30)])
        comps = {r.component for r in connected_components(edges).collect()}
        assert comps == {1}

    def test_isolated_vertex_self_component(self, spark):
        edges = spark.createDataFrame([Row(src=1, dst=2)])
        verts = connected_components(edges).collect()
        assert {r.id: r.component for r in verts} == {1: 1, 2: 1}


class TestSimHash:
    def test_identical_docs_same_hash(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="alpha beta gamma delta"), Row(doc_id=2, text="alpha beta gamma delta")]
        )
        rows = {r.doc_id: r.simhash for r in simhash(df).collect()}
        assert rows[1] == rows[2]
        assert len(rows[1]) == 16

    def test_near_dup_small_hamming(self, spark):
        base = " ".join(f"w{i}" for i in range(40))
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text=base),
                Row(doc_id=2, text=base + " extra"),
                Row(doc_id=3, text=" ".join(f"z{i}" for i in range(40))),
            ]
        )
        pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dup_pairs(df, max_hamming=10).collect()}
        assert (1, 2) in pairs
        assert (1, 3) not in pairs


class TestEntityResolution:
    def test_clusters_similar_names(self, spark):
        records = spark.createDataFrame(
            [
                Row(record_id=1, name="Acme Holdings S.A."),
                Row(record_id=2, name="ACME Holdings SA"),
                Row(record_id=3, name="Zenith Partners Ltd"),
                Row(record_id=4, name="Zenith Partners Limited"),
                Row(record_id=5, name="Unrelated Company GmbH"),
            ]
        )
        got = {r.record_id: r.cluster_id for r in resolve_entities(records, threshold=0.4).collect()}
        assert got[1] == got[2]
        assert got[3] == got[4]
        assert got[1] != got[3]
        assert got[5] not in (got[1], got[3])


class TestStreaming:
    def test_hourly_rollup_matches_batch(self, spark):
        from erkg_tutorials_spark.plans.eventsq import events_hourly_rollup
        from erkg_tutorials_spark.streaming.events import (
            hourly_rollup_stream,
            read_events_stream,
            run_stream_once,
        )
        from tests.conftest import SF_DIR

        stream = read_events_stream(spark, SF_DIR)
        run_stream_once(hourly_rollup_stream(stream), "hourly_test")
        got = {
            (r.event_type, r.hour_epoch): r.n_events
            for r in spark.table("hourly_test").collect()
        }
        want = {
            (r.event_type, r.hour_epoch): r.n_events
            for r in events_hourly_rollup(spark, SF_DIR).collect()
        }
        assert got == want


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            Row(media_id=1, kind="image", payload=bytes(range(256)) * 4,
                meta=Row(width=64, height=64, sample_rate=None, n_frames=None, format="png")),
            Row(media_id=2, kind="video", payload=bytes(100) * 50,
                meta=Row(width=320, height=240, sample_rate=None, n_frames=30, format="mp4")),
            Row(media_id=3, kind="audio", payload=b"\x01\x02" * 500,
                meta=Row(width=None, height=None, sample_rate=16000, n_frames=None, format="wav")),
        ]
        from erkg_tutorials_spark.multimodal.media import MEDIA_SCHEMA

        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_decode_features_deterministic(self, spark, media):
        from erkg_tutorials_spark.multimodal.media import decode_features

        a = {r.media_id: r.content_hash for r in decode_features(media).collect()}
        b = {r.media_id: r.content_hash for r in decode_features(media).collect()}
        assert a == b and len(a) == 3
        feats = decode_features(media).collect()
        for r in feats:
            assert 0.0 <= r.feat_0 <= 1.0 and r.n_bytes > 0

    def test_resize_updates_meta(self, spark, media):
        from erkg_tutorials_spark.multimodal.media import resize_images

        out = {r.media_id: r.meta for r in resize_images(media, 32, 32).collect()}
        assert out[1].width == 32 and out[1].height == 32

    def test_frame_sampling_only_video(self, spark, media):
        from erkg_tutorials_spark.multimodal.media import sample_frames

        frames = sample_frames(media, every_n=10).collect()
        assert {r.media_id for r in frames} == {2}
        assert sorted(r.frame_no for r in frames) == [0, 10, 20]


class TestDedupClusters:
    def test_transitive_closure_and_canonical(self, spark):
        from erkg_tutorials_spark.dedup.clusters import dedup_assign

        corpus = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
        # near-dup chain 1~2, 2~3 (transitive cluster {1,2,3}); pair {5,6}
        pairs = spark.createDataFrame(
            [(1, 2, 0.9), (2, 3, 0.8), (5, 6, 0.7)], ["id_a", "id_b", "jaccard"]
        )
        out = {
            r["doc_id"]: (r["cluster"], r["is_canonical"])
            for r in dedup_assign(corpus, pairs).collect()
        }
        assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
        assert out[5] == (5, True) and out[6] == (5, False)
        # untouched docs are their own canonical cluster
        assert out[4] == (4, True) and out[7] == (7, True)

    def test_one_canonical_per_cluster(self, spark):
        from erkg_tutorials_spark.dedup.clusters import dedup_assign
        from pyspark.sql import functions as F

        corpus = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
        pairs = spark.createDataFrame(
            [(i, i + 1, 0.9) for i in range(0, 18, 2)], ["id_a", "id_b", "jaccard"]
        )
        per_cluster = (
            dedup_assign(corpus, pairs)
            .groupBy("cluster")
            .agg(F.sum(F.col("is_canonical").cast("int")).alias("n_canon"))
        )
        assert per_cluster.where(F.col("n_canon") != 1).count() == 0

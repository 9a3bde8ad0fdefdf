"""Streaming joins: stream-static enrichment and the stream-stream
interval join, checked for exact parity with their batch twins."""

from pyspark.sql import functions as F

from erkg_tutorials_spark.streaming.events import read_events_stream
from erkg_tutorials_spark.streaming.joins import (
    attribution_stream,
    enrich_each_batch,
    enrich_stream,
)
from tests.conftest import SF_DIR


def _drain(df, name):
    (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


class TestStreamStaticJoin:
    def test_enrich_matches_batch_join(self, spark):
        from erkg_tutorials_spark.catalog import load_tables, read_events

        dim = load_tables(spark, SF_DIR)["customer"].select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        out = enrich_stream(
            read_events_stream(spark, SF_DIR).select("event_id", "user_id", "event_time"),
            dim,
        ).select("event_id", "c_mktsegment")
        _drain(out, "enrich_test")
        got = {
            (r.event_id, r.c_mktsegment) for r in spark.table("enrich_test").collect()
        }
        want = {
            (r.event_id, r.c_mktsegment)
            for r in read_events(spark, SF_DIR)
            .select("event_id", "user_id")
            .join(dim, "user_id", "left")
            .collect()
        }
        assert got == want and len(want) > 0


class TestDimensionRefresh:
    """Pins the two refresh semantics (ADVICE r2): a file-backed static
    side is a plan-time snapshot; enrich_each_batch re-resolves it per
    micro-batch."""

    def _setup(self, spark, tmp_path):
        from pyspark.sql import Row

        dim_dir = str(tmp_path / "dim")
        in_dir = str(tmp_path / "in")
        spark.createDataFrame([Row(user_id=1, tier="gold")]).write.parquet(dim_dir)
        spark.createDataFrame([Row(user_id=1, event_id=10)]).coalesce(1).write.parquet(
            in_dir + "/f0"
        )
        spark.createDataFrame([Row(user_id=2, event_id=20)]).coalesce(1).write.parquet(
            in_dir + "/f1"
        )
        stream = (
            spark.readStream.schema("user_id LONG, event_id LONG")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir + "/*")
        )
        return dim_dir, stream

    def _refresh_dim_after_batch0(self, spark, dim_dir, seen):
        from pyspark.sql import Row

        def sink(df, bid):
            seen.append((bid, sorted((r.user_id, r.tier) for r in df.collect())))
            if bid == 0:
                spark.createDataFrame(
                    [Row(user_id=2, tier="silver")]
                ).write.mode("append").parquet(dim_dir)

        return sink

    def test_static_side_is_plan_time_snapshot(self, spark, tmp_path):
        dim_dir, stream = self._setup(spark, tmp_path)
        seen = []
        sink = self._refresh_dim_after_batch0(spark, dim_dir, seen)
        out = enrich_stream(stream, spark.read.parquet(dim_dir))
        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # batch 1 does NOT see the appended dim row — snapshot semantics
        assert seen == [(0, [(1, "gold")]), (1, [(2, None)])]

    def test_enrich_each_batch_sees_refresh(self, spark, tmp_path):
        dim_dir, stream = self._setup(spark, tmp_path)
        seen = []
        inner = self._refresh_dim_after_batch0(spark, dim_dir, seen)
        fn = enrich_each_batch(lambda: spark.read.parquet(dim_dir), inner)
        q = (
            stream.writeStream.foreachBatch(fn)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # batch 1 DOES see the appended dim row — per-batch re-resolution
        assert seen == [(0, [(1, "gold")]), (1, [(2, "silver")])]


class TestStreamStreamIntervalJoin:
    def test_attribution_matches_batch_microsecond_twin(self, spark):
        """The streaming interval join must emit exactly the pairs the
        same range predicate produces in batch at µs precision. (The
        registered batch operator rounds to whole seconds first, so
        the twin here re-applies the predicate on raw µs times.)"""
        from erkg_tutorials_spark.catalog import read_events

        out = attribution_stream(read_events_stream(spark, SF_DIR))
        _drain(out, "attribution_test")
        got = {
            (r.user_id, r.view_event_id, r.purchase_event_id)
            for r in spark.table("attribution_test").collect()
        }

        e = read_events(spark, SF_DIR).select(
            "user_id", "event_id", "event_type", F.expr("ts_ns div 1000").alias("us")
        )
        v = e.where("event_type = 'view'").select(
            F.col("user_id").alias("u"),
            F.col("event_id").alias("ve"),
            F.col("us").alias("vus"),
        )
        p = e.where("event_type = 'purchase'").select(
            F.col("user_id").alias("u"),
            F.col("event_id").alias("pe"),
            F.col("us").alias("pus"),
        )
        want = {
            (r.u, r.ve, r.pe)
            for r in v.join(p, "u")
            .where(
                (F.col("pus") > F.col("vus"))
                & (F.col("pus") <= F.col("vus") + 3600 * 1_000_000)
            )
            .collect()
        }
        assert got == want and len(want) > 0


class TestStreamStreamOuterJoin:
    def test_left_outer_emits_unmatched_views_after_watermark(
        self, spark, tmp_path
    ):
        """Unmatched views surface with null purchase columns once the
        watermark passes their join bound; views still inside the
        watermark at end-of-input stay in state (absent from output) —
        the documented outer-join semantics."""
        import datetime as dt

        from pyspark.sql import Row

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def ev(eid, uid, typ, minutes):
            return Row(
                event_id=eid,
                user_id=uid,
                event_type=typ,
                event_time=t0 + dt.timedelta(minutes=minutes),
            )

        batch0 = [
            ev(1, 1, "view", 0),        # matched by event 3
            ev(2, 2, "view", 0),        # never matched -> null row
            ev(3, 1, "purchase", 30),   # inside the 1h window of event 1
        ]
        # heartbeats far in the future, in a LATER micro-batch: the
        # watermark only advances between batches, so they must arrive
        # after batch 0 to push the watermark past event 2's bound
        # (0:00 + 1h window + 2h delay) and flush its unmatched row.
        # BOTH event types are needed — the global watermark is the
        # MIN across the two watermarked branches, and each branch's
        # event-time max only advances on its own post-filter rows.
        # The view heartbeat itself stays in state (its bound is in
        # the future) and must NOT appear in the output.
        batch1 = [ev(99, 9, "view", 60 * 24), ev(98, 8, "purchase", 60 * 24)]
        in_dir = str(tmp_path / "events_in")
        spark.createDataFrame(batch0).coalesce(1).write.parquet(in_dir + "/f0")
        spark.createDataFrame(batch1).coalesce(1).write.parquet(in_dir + "/f1")
        stream = (
            spark.readStream.schema(
                "event_id LONG, user_id LONG, event_type STRING, event_time TIMESTAMP"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir + "/*")
        )

        out = attribution_stream(
            stream, window_seconds=3600, watermark="2 hours", how="left_outer"
        )
        _drain(out, "attribution_outer_test")
        got = {
            (r.user_id, r.view_event_id, r.purchase_event_id)
            for r in spark.table("attribution_outer_test").collect()
        }
        assert got == {(1, 1, 3), (2, 2, None)}


class TestStreamStreamFullOuterJoin:
    def test_full_outer_flushes_both_sides_after_watermark(self, spark, tmp_path):
        """full_outer = left_outer's unmatched-view rows PLUS unmatched
        purchases with null view columns, each emitted only once the
        watermark passes that side's join bound; rows still inside the
        watermark at end-of-input stay in state (the heartbeats)."""
        import datetime as dt

        from pyspark.sql import Row

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def ev(eid, uid, typ, minutes):
            return Row(
                event_id=eid,
                user_id=uid,
                event_type=typ,
                event_time=t0 + dt.timedelta(minutes=minutes),
            )

        batch0 = [
            ev(1, 1, "view", 0),       # matched by event 3
            ev(2, 2, "view", 0),       # never matched -> (2, 2, None)
            ev(3, 1, "purchase", 30),  # inside the 1h window of event 1
            ev(4, 3, "purchase", 30),  # never matched -> (3, None, 4)
        ]
        # same heartbeat discipline as the left_outer test: a later
        # micro-batch advances BOTH branch watermarks past every
        # batch-0 bound; the heartbeats themselves stay in state
        batch1 = [ev(99, 9, "view", 60 * 24), ev(98, 8, "purchase", 60 * 24)]
        in_dir = str(tmp_path / "events_in")
        spark.createDataFrame(batch0).coalesce(1).write.parquet(in_dir + "/f0")
        spark.createDataFrame(batch1).coalesce(1).write.parquet(in_dir + "/f1")
        stream = (
            spark.readStream.schema(
                "event_id LONG, user_id LONG, event_type STRING, event_time TIMESTAMP"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir + "/*")
        )

        out = attribution_stream(
            stream, window_seconds=3600, watermark="2 hours", how="full_outer"
        )
        _drain(out, "attribution_full_outer_test")
        got = {
            (r.user_id, r.view_event_id, r.purchase_event_id)
            for r in spark.table("attribution_full_outer_test").collect()
        }
        assert got == {(1, 1, 3), (2, 2, None), (3, None, 4)}

"""Tests for the scraper source (S9), annotation tables (N1), and
stateful streaming sessionization."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from erkg_tutorials_spark.sources.scraper import extract_article_text, scrape_documents
from erkg_tutorials_spark.text.annotations import doc_tokens, sentences

HTML = """
<html><head><title>ignored</title></head><body>
<nav>site chrome ignored</nav>
<header class="post-header"><h1>Offshore Leaks  Revealed</h1></header>
<div class="post-body">
  <p>First paragraph about shell companies.</p>
  <figure><figcaption>A photo caption</figcaption></figure>
  <p>Second   paragraph.</p>
</div>
<footer>ignored footer</footer>
</body></html>
"""


class TestScraper:
    def test_extract_semantics(self):
        """header/body pushdown (F8), h1 gets a '.', newline join (C10)."""
        text = extract_article_text(HTML)
        assert text == (
            "Offshore Leaks Revealed.\n"
            "First paragraph about shell companies.\n"
            "A photo caption\n"
            "Second paragraph."
        )

    def test_scrape_documents_mapinpandas(self, spark):
        urls = spark.createDataFrame(
            [Row(doc_id=1, url="https://example.org/a"), Row(doc_id=2, url="https://example.org/b")]
        )
        got = {
            r.doc_id: r.text
            for r in scrape_documents(urls, fetch=lambda u: HTML).collect()
        }
        assert len(got) == 2 and got[1].startswith("Offshore Leaks Revealed.")

    def test_no_matching_subtree_empty(self):
        assert extract_article_text("<html><p>no post nodes</p></html>") == ""


class TestAnnotations:
    def test_sentences(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="First sentence. Second one! Third?")]
        )
        got = [r.sentence for r in sentences(docs).orderBy("sent_id").collect()]
        assert got == ["First sentence.", "Second one!", "Third?"]

    def test_tokens_positions(self, spark):
        docs = spark.createDataFrame([Row(doc_id=1, text="Alpha Beta gamma")])
        got = [(r.pos, r.token) for r in doc_tokens(docs).orderBy("pos").collect()]
        assert got == [(1, "alpha"), (2, "beta"), (3, "gamma")]


class TestStatefulSessionize:
    def test_stream_sessions_match_batch_closed_sessions(self, spark, tmp_path):
        """The streaming operator must emit exactly the batch sessions
        minus each user's open tail session (which stays in state)."""
        from erkg_tutorials_spark.plans.eventsq import events_sessionize
        from erkg_tutorials_spark.streaming.events import (
            EVENTS_SCHEMA,
            with_event_time,
        )
        from erkg_tutorials_spark.streaming.sessionize import sessionize_stream
        from tests.conftest import SF_DIR

        stream = (
            with_event_time(
                spark.readStream.schema(EVENTS_SCHEMA)
                .option("pathGlobFilter", "events.parquet")
                .parquet(SF_DIR)
            )
            .selectExpr("user_id", "unix_micros(event_time) div 1000000 as ts_sec")
        )
        q = (
            sessionize_stream(stream)
            .writeStream.format("memory")
            .queryName("sessions_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.start_sec, r.end_sec, r.n_events)
            for r in spark.table("sessions_test").collect()
        }

        batch = events_sessionize(spark, SF_DIR).collect()
        # drop each user's last (still-open) session
        last_start = {}
        for r in batch:
            last_start[r.user_id] = max(last_start.get(r.user_id, -1), r.start_sec)
        want = {
            (r.user_id, r.start_sec, r.end_sec, r.n_events)
            for r in batch
            if r.start_sec != last_start[r.user_id]
        }
        assert got == want and len(want) > 0


class TestSlidingAndDedupStreams:
    def test_sliding_stream_matches_batch(self, spark):
        """Streaming sliding-window counts == the batch twin
        (events_sliding_window) on the same input."""
        from erkg_tutorials_spark.plans.eventsq import events_sliding_window
        from erkg_tutorials_spark.streaming.events import (
            read_events_stream,
            sliding_rollup_stream,
        )
        from tests.conftest import SF_DIR

        q = (
            sliding_rollup_stream(
                read_events_stream(spark, SF_DIR),
                window="30 minutes",
                slide="15 minutes",
            )
            .writeStream.format("memory")
            .queryName("sliding_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["win_start"], r["event_type"], r["n_events"])
            for r in spark.table("sliding_test").collect()
        }
        want = {
            (r["w_start"], r["event_type"], r["n_events"])
            for r in events_sliding_window(spark, SF_DIR).collect()
        }
        assert got == want and len(want) > 0

    def test_dedup_stream_drops_replayed_events(self, spark, tmp_path):
        """An at-least-once feed (every event delivered twice) lands
        exactly once through the streaming dedup."""
        import os

        from erkg_tutorials_spark.streaming.events import (
            EVENTS_SCHEMA,
            dedup_stream,
            with_event_time,
        )
        from tests.conftest import SF_DIR

        events = spark.read.schema(EVENTS_SCHEMA).parquet(
            os.path.join(SF_DIR, "events.parquet")
        )
        feed_dir = str(tmp_path / "feed")
        # duplicate every event (two identical files = exact replay)
        events.write.mode("overwrite").parquet(feed_dir)
        events.write.mode("append").parquet(feed_dir)

        stream = with_event_time(spark.readStream.schema(EVENTS_SCHEMA).parquet(feed_dir))
        q = (
            dedup_stream(stream, keys=["event_id"])
            .writeStream.format("memory")
            .queryName("dedup_feed_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_unique = events.select("event_id").distinct().count()
        assert spark.table("dedup_feed_test").count() == n_unique


class TestLateDataDrop:
    def test_dropped_row_accounting_and_emission_boundary(self, spark):
        """The checkpoint-restart phase 2 must drop EXACTLY the late
        slice (numRowsDroppedByWatermark == |oldest-day purchases|)
        and emit nothing new; phase 1's emission stops at the
        watermark boundary (no window end beyond max(on-time) − 90m).
        """
        import os

        from pyspark.sql import functions as F

        from erkg_tutorials_spark.plans.streamq import (
            LATE_WM_US,
            _late_feed_dir,
            _run_late_phases,
        )
        from tests.conftest import SF_DIR

        emitted, progress = _run_late_phases(spark, SF_DIR)
        feed = _late_feed_dir(spark, SF_DIR)
        late = spark.read.parquet(os.path.join(feed, "late.parquet"))
        n_late = late.count()
        assert n_late > 0
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in progress
            for op in p["stateOperators"]
        )
        assert dropped == n_late, (dropped, n_late)
        ontime = spark.read.parquet(os.path.join(feed, "ontime.parquet"))
        ts_type = dict(ontime.dtypes)["ts"]
        max_us = (
            ontime.agg(F.max(F.expr(
                "ts div 1000" if ts_type == "bigint"
                else "unix_micros(cast(ts as timestamp))"
            ))).collect()[0][0]
        )
        wm_us = max_us - LATE_WM_US
        rows = emitted.collect()
        assert rows
        assert all(
            (r.hour_epoch + 3600) * 1_000_000 <= wm_us for r in rows
        )

"""Semantic tests for the temporal tier (plans/temporal.py): as-of
join, bounded range join, cascaded hypertable rollup, funnel, running
total. The DuckDB hash-match runs via tools/check_correctness.py and
test_oracle_parity; these tests pin the *semantics* with brute-force
twins small enough to read.
"""

import pytest
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import load_tables
from erkg_tutorials_spark.plans.temporal import (
    ATTRIBUTION_WINDOW_SECONDS,
    asof_join_last_purchase,
    funnel_signup_view_purchase,
    hypertable_rollup,
    range_join_view_purchase,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_rows(spark):
    return (
        load_tables(spark, SF_DIR)["events"]
        .select("event_id", "user_id", "event_type", F.col("ts_sec").alias("sec"), "value")
        .collect()
    )


class TestAsOfJoin:
    def test_matches_bruteforce(self, spark, events_rows):
        purchases = {}
        for r in events_rows:
            if r.event_type == "purchase":
                purchases.setdefault(r.user_id, []).append((r.sec, r.event_id, r.value))
        want = {}
        for r in events_rows:
            if r.event_type == "purchase":
                continue
            # latest purchase at or before the query row; ties on sec
            # broken by the highest event_id (the composite order key)
            best = max(
                (p for p in purchases.get(r.user_id, []) if p[0] <= r.sec),
                default=None,
            )
            want[r.event_id] = (best[0], best[2]) if best else (None, None)

        got = asof_join_last_purchase(spark, SF_DIR).collect()
        assert len(got) == len(want)
        for r in got:
            w_sec, w_val = want[r.event_id]
            assert r.last_purchase_sec == w_sec
            assert r.last_purchase_value == w_val
            if w_sec is not None:
                assert r.gap_sec == r.sec - w_sec and r.gap_sec >= 0

    def test_every_non_purchase_event_appears_once(self, spark, events_rows):
        n_queries = sum(1 for r in events_rows if r.event_type != "purchase")
        out = asof_join_last_purchase(spark, SF_DIR)
        assert out.count() == n_queries
        assert out.select("event_id").distinct().count() == n_queries


class TestRangeJoin:
    def test_matches_bruteforce(self, spark, events_rows):
        views, purchases = {}, {}
        for r in events_rows:
            if r.event_type == "view":
                views.setdefault(r.user_id, []).append((r.event_id, r.sec))
            elif r.event_type == "purchase":
                purchases.setdefault(r.user_id, []).append((r.event_id, r.sec))
        want = {
            (u, ve, pe)
            for u in views
            for ve, vs in views[u]
            for pe, ps in purchases.get(u, [])
            if vs < ps <= vs + ATTRIBUTION_WINDOW_SECONDS
        }
        got = {
            (r.user_id, r.view_event_id, r.purchase_event_id)
            for r in range_join_view_purchase(spark, SF_DIR).collect()
        }
        assert got == want and len(want) > 0

    def test_bucketed_plan_no_cartesian(self, spark):
        plan = range_join_view_purchase(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestHypertableRollup:
    def test_cascade_matches_direct(self, spark, events_rows):
        # the cascaded day tier must equal a direct day aggregation of
        # raw rows (cents are associative so the cascade is exact)
        want = {}
        for r in events_rows:
            b = (r.sec // 86400) * 86400
            n, c = want.get(b, (0, 0))
            want[b] = (n + 1, c + round(r.value * 100))
        got = {
            r.bucket_start: (r.n_events, round(r.total_value * 100))
            for r in hypertable_rollup(spark, SF_DIR).where("resolution = 'day'").collect()
        }
        assert got == {b: (n, c) for b, (n, c) in want.items()}

    def test_tiers_conserve_totals(self, spark):
        out = hypertable_rollup(spark, SF_DIR)
        totals = {
            r.resolution: (r.n, round(r.v, 2))
            for r in out.groupBy("resolution")
            .agg(F.sum("n_events").alias("n"), F.sum("total_value").alias("v"))
            .collect()
        }
        assert totals["hour"] == totals["day"] == totals["week"]


class TestFunnel:
    def test_stage_ordering_invariants(self, spark):
        rows = funnel_signup_view_purchase(spark, SF_DIR).collect()
        assert len(rows) > 0
        for r in rows:
            if r.first_view_sec is not None:
                assert r.first_view_sec >= r.signup_sec
            if r.first_purchase_sec is not None:
                assert r.first_view_sec is not None
                assert r.first_purchase_sec >= r.first_view_sec
            assert r.completed == (r.first_purchase_sec is not None)

    def test_funnel_counts_monotone(self, spark):
        out = funnel_signup_view_purchase(spark, SF_DIR)
        n_s = out.count()
        n_v = out.where("first_view_sec is not null").count()
        n_p = out.where("completed").count()
        assert n_s >= n_v >= n_p

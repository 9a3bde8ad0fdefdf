"""Semantic tests for the advanced events ops (quantiles, RANGE moving
window, SCD-2 intervals, stratified sampling)."""

from collections import defaultdict

from erkg_tutorials_spark.plans.eventsq import (
    events_moving_7d,
    events_value_quantiles,
    sample_stratified_events,
    scd2_user_state_history,
)
from tests.conftest import SF_DIR


class TestQuantiles:
    def test_monotone(self, spark):
        for r in events_value_quantiles(spark, SF_DIR).collect():
            assert r.p50 <= r.p90 <= r.p99


class TestMovingWindow:
    def test_movsum_matches_bruteforce(self, spark):
        rows = events_moving_7d(spark, SF_DIR).collect()
        daily = {(r.event_type, r.day): r.day_value for r in rows}
        for r in rows:
            want = sum(
                daily.get((r.event_type, d), 0.0)
                for d in range(r.day - 6, r.day + 1)
            )
            assert abs(r.movsum_7d - want) < 1e-6
            n_days = sum(
                1 for d in range(r.day - 6, r.day + 1) if (r.event_type, d) in daily
            )
            assert abs(r.movavg_7d - r.movsum_7d / n_days) < 1e-9


class TestSCD2:
    def test_intervals_chain_and_single_current(self, spark):
        rows = scd2_user_state_history(spark, SF_DIR).collect()
        by_user = defaultdict(list)
        for r in rows:
            by_user[r.user_id].append(r)
        for user, ivs in by_user.items():
            ivs.sort(key=lambda r: (r.valid_from, r.valid_to is None))
            currents = [r for r in ivs if r.is_current]
            assert len(currents) == 1
            assert currents[0].valid_to is None
            closed = [r for r in ivs if not r.is_current]
            for r in closed:
                assert r.valid_to >= r.valid_from
            # every closed interval's end equals some interval's start
            starts = defaultdict(int)
            for r in ivs:
                starts[r.valid_from] += 1
            for r in closed:
                assert starts[r.valid_to] > 0


class TestStratifiedSample:
    def test_rate_and_determinism(self, spark):
        out = sample_stratified_events(spark, SF_DIR)
        a = {r.event_id for r in out.collect()}
        b = {r.event_id for r in sample_stratified_events(spark, SF_DIR).collect()}
        assert a == b
        from erkg_tutorials_spark.catalog import load_tables

        n_total = load_tables(spark, SF_DIR)["events"].count()
        rate = len(a) / n_total
        assert 0.05 < rate < 0.15


class TestAnomalyZScore:
    def test_flags_match_bruteforce(self, spark):
        import statistics

        from erkg_tutorials_spark.catalog import load_tables
        from erkg_tutorials_spark.plans.eventsq import events_anomaly_zscore

        rows = (
            load_tables(spark, SF_DIR)["events"]
            .select("event_id", "event_type", "value")
            .collect()
        )
        by_type = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append((r.event_id, round(r.value * 100)))
        want = set()
        for et, xs in by_type.items():
            vals = [c for _, c in xs]
            mu = statistics.mean(vals)
            sd = statistics.stdev(vals)
            for eid, c in xs:
                if abs(c - mu) > 3 * sd:
                    want.add(eid)
        got = {r.event_id for r in events_anomaly_zscore(spark, SF_DIR).collect()}
        assert got == want and len(want) > 0

    def test_z_magnitude_exceeds_three(self, spark):
        from erkg_tutorials_spark.plans.eventsq import events_anomaly_zscore

        for r in events_anomaly_zscore(spark, SF_DIR).collect():
            assert abs(r.z) > 3
            assert r.is_anomaly


class TestSessionTopPaths:
    def test_paths_bounded_and_counts_match_sessions(self, spark):
        from erkg_tutorials_spark.plans.eventsq import (
            events_sessionize,
            session_top_paths,
        )
        from tests.conftest import SF_DIR

        rows = session_top_paths(spark, SF_DIR).collect()
        n_sessions = events_sessionize(spark, SF_DIR).count()
        assert sum(r.n_sessions for r in rows) == n_sessions
        for r in rows:
            steps = r.path.split(" > ")
            assert 1 <= len(steps) <= 3
            assert all(s in {"click", "error", "purchase", "signup", "view"} for s in steps)


class TestEwmaDaily:
    def test_matches_sequential_recursion(self, spark):
        from erkg_tutorials_spark.plans.eventsq import events_ewma_daily
        from tests.conftest import SF_DIR
        from pyspark.sql import functions as F
        from erkg_tutorials_spark.functions.exact_math import money_cents
        from erkg_tutorials_spark.catalog import load_tables

        got = {r.event_type: (r.n_days, r.ewma)
               for r in events_ewma_daily(spark, SF_DIR).collect()}
        daily = (
            load_tables(spark, SF_DIR)["events"]
            .select("event_type", F.expr("ts_sec div 86400").alias("day"),
                    money_cents(F.col("value")).alias("cents"))
            .groupBy("event_type", "day").agg(F.sum("cents").alias("cents"))
            .collect()
        )
        series = {}
        for r in daily:
            series.setdefault(r.event_type, {})[r.day] = r.cents
        for etype, days in series.items():
            lo, hi = min(days), max(days)
            s = None
            for d in range(lo, hi + 1):
                c = days.get(d, 0)
                s = c if s is None else (c + s) / 2
            assert got[etype][0] == hi - lo + 1
            assert abs(got[etype][1] - round(s / 100.0, 4)) < 1e-9, etype

    def test_long_span_truncates_without_overflow(self, spark, tmp_path):
        """Regression for the >=64-day overflow: 2^(k-1) BIGINT weights
        wrapped (Spark) or errored (DuckDB) once a type's day span
        reached 64. The operator now truncates to the trailing 40 days
        with DECIMAL(38,0) weights; pin both the windowed recursion
        value and the full-span n_days on a 100-day synthetic table."""
        import datetime

        from pyspark.sql import Row

        from erkg_tutorials_spark.plans.eventsq import (
            EWMA_WINDOW_DAYS,
            events_ewma_daily,
        )

        base = datetime.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            Row(
                event_id=d,
                ts=base + datetime.timedelta(days=d),
                user_id=1,
                event_type="click",
                value=float(d + 1),  # distinct per-day values, 1..100
                props="{}",
            )
            for d in range(100)
        ]
        sf_dir = str(tmp_path / "sf_long")
        spark.createDataFrame(rows).write.parquet(f"{sf_dir}/events.parquet")

        got = events_ewma_daily(spark, sf_dir).collect()
        assert len(got) == 1
        assert got[0].n_days == 100  # span reported over ALL days
        # windowed sequential recursion over the trailing 40 days only
        cents = {d: (d + 1) * 100 for d in range(100)}
        s = None
        for d in range(100 - EWMA_WINDOW_DAYS, 100):
            s = cents[d] if s is None else (cents[d] + s) / 2
        assert abs(got[0].ewma - round(s / 100.0, 4)) < 1e-9

        # the DuckDB oracle must survive the same span (it used to
        # raise out-of-range on CAST(power(2, 63) AS BIGINT))
        import duckdb

        import __spark_entry__ as entrymod

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet/*.parquet'"
        )
        duck = con.sql(entrymod.oracle_sql()["events_ewma_daily"]).df()
        assert len(duck) == 1
        assert int(duck.iloc[0]["n_days"]) == 100
        assert abs(float(duck.iloc[0]["ewma"]) - got[0].ewma) < 1e-9

"""Semantic tests for the OLAP + sketch tier (plans/analytics.py).
Engine-parity is covered by the DuckDB oracles; these pin the
semantics themselves.
"""

from pyspark.sql import functions as F

from erkg_tutorials_spark.plans.analytics import (
    hll_distinct_users,
    olap_cube_orders,
    olap_rollup_revenue,
    pii_mask_customers,
    retention_cohorts,
    unpivot_part_metrics,
)
from tests.conftest import SF_DIR


class TestHLL:
    def test_estimate_within_sketch_error(self, spark):
        """m=256 → standard error 1.04/sqrt(256) = 6.5%; allow 4σ."""
        rows = hll_distinct_users(spark, SF_DIR).collect()
        assert len(rows) > 0
        for r in rows:
            assert r.n_exact > 0
            rel = abs(r.hll_estimate - r.n_exact) / r.n_exact
            assert rel < 0.26, (r.event_type, r.n_exact, r.hll_estimate)

    def test_deterministic(self, spark):
        a = {(r.event_type, r.hll_estimate) for r in hll_distinct_users(spark, SF_DIR).collect()}
        b = {(r.event_type, r.hll_estimate) for r in hll_distinct_users(spark, SF_DIR).collect()}
        assert a == b


class TestGroupingSets:
    def test_rollup_subtotals_consistent(self, spark):
        rows = olap_rollup_revenue(spark, SF_DIR).collect()
        grand = [r for r in rows if r.gid == 3]
        regions = [r for r in rows if r.gid == 1]
        leaves = [r for r in rows if r.gid == 0]
        assert len(grand) == 1
        # leaf orders sum to region subtotals, which sum to the grand total
        assert sum(r.n_orders for r in leaves) == grand[0].n_orders
        assert sum(r.n_orders for r in regions) == grand[0].n_orders
        per_region = {}
        for r in leaves:
            per_region[r.r_name] = per_region.get(r.r_name, 0) + r.n_orders
        assert per_region == {r.r_name: r.n_orders for r in regions}

    def test_cube_has_all_four_grouping_sets(self, spark):
        gids = {r.gid for r in olap_cube_orders(spark, SF_DIR).collect()}
        assert gids == {0, 1, 2, 3}

    def test_cube_marginals_match(self, spark):
        rows = olap_cube_orders(spark, SF_DIR).collect()
        grand = next(r for r in rows if r.gid == 3)
        by_year = [r for r in rows if r.gid == 1]
        by_status = [r for r in rows if r.gid == 2]
        assert sum(r.n_orders for r in by_year) == grand.n_orders
        assert sum(r.n_orders for r in by_status) == grand.n_orders


class TestRetention:
    def test_offset_zero_covers_every_cohort_user(self, spark):
        """Every user is active on their own first day, so the
        day_offset=0 cell equals the cohort's size."""
        rows = retention_cohorts(spark, SF_DIR).collect()
        day0 = {r.cohort_day: r.n_active for r in rows if r.day_offset == 0}
        from erkg_tutorials_spark.catalog import load_tables

        e = load_tables(spark, SF_DIR)["events"].select(
            "user_id", F.expr("ts_sec div 86400").alias("day")
        )
        sizes = {
            r.cohort_day: r.n
            for r in e.groupBy("user_id")
            .agg(F.min("day").alias("cohort_day"))
            .groupBy("cohort_day")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert day0 == sizes

    def test_retention_never_exceeds_cohort_size(self, spark):
        rows = retention_cohorts(spark, SF_DIR).collect()
        day0 = {r.cohort_day: r.n_active for r in rows if r.day_offset == 0}
        for r in rows:
            assert r.day_offset >= 0
            assert r.n_active <= day0[r.cohort_day]


class TestUnpivotAndPII:
    def test_unpivot_row_count_and_roundtrip(self, spark):
        from erkg_tutorials_spark.catalog import load_tables

        p = load_tables(spark, SF_DIR)["part"]
        out = unpivot_part_metrics(spark, SF_DIR)
        assert out.count() == 2 * p.count()
        sizes = {
            r.p_partkey: r.value for r in out.where("metric = 'size'").collect()
        }
        want = {r.p_partkey: r.p_size for r in p.select("p_partkey", "p_size").collect()}
        assert sizes == want

    def test_mask_hides_digits_keeps_suffix(self, spark):
        rows = pii_mask_customers(spark, SF_DIR).collect()
        for r in rows[:50]:
            body = r.name_masked[:-2]
            assert not any(ch.isdigit() for ch in body)
        # bucket_k is a true occupancy count
        from collections import Counter

        k = Counter()
        for r in rows:
            k[r.acctbal_bucket] += 1
        for r in rows:
            assert r.bucket_k == k[r.acctbal_bucket]


class TestCountMinSketch:
    def test_estimate_one_sided_and_tight(self, spark):
        from erkg_tutorials_spark.plans.analytics import cm_sketch_user_counts

        rows = cm_sketch_user_counts(spark, SF_DIR).collect()
        assert len(rows) > 0
        for r in rows:
            # CM error is strictly one-sided: estimate >= truth
            assert r.cm_estimate >= r.true_count
            # and bounded: collisions add at most the stream mass / width
            assert r.cm_estimate <= r.true_count + (10000 // 64) * 4


class TestFuzzyNameMatch:
    def test_nearest_by_edit_distance(self, spark):
        from erkg_tutorials_spark.plans.analytics import fuzzy_name_match

        rows = fuzzy_name_match(spark, SF_DIR).collect()
        assert len(rows) > 0
        by_seed = {}
        for r in rows:
            by_seed.setdefault(r.seed_key, []).append(r)
        for seed, rs in by_seed.items():
            rs.sort(key=lambda r: r.rk)
            dists = [r.dist for r in rs]
            assert dists == sorted(dists)
            assert all(r.dist >= 1 for r in rs)  # self excluded


class TestVectorStats:
    def test_norm_consistency(self, spark):
        import math

        from erkg_tutorials_spark.catalog import load_tables
        from erkg_tutorials_spark.plans.vectorq import vector_stats

        got = {r.vec_id: r for r in vector_stats(spark, SF_DIR).collect()}
        sample = (
            load_tables(spark, SF_DIR)["embeddings"]
            .limit(20)
            .select("vec_id", "embedding")
            .collect()
        )
        for r in sample:
            v = [float(x) for x in r.embedding]
            g = got[r.vec_id]
            assert abs(g.l2_norm - math.sqrt(sum(x * x for x in v))) < 1e-4
            assert abs(g.mean_elem - sum(v) / len(v)) < 1e-4
            assert g.min_elem <= g.mean_elem <= g.max_elem


class TestProfile:
    def test_profile_matches_direct_queries(self, spark):
        from erkg_tutorials_spark.catalog import load_tables
        from erkg_tutorials_spark.plans.analytics import profile_orders

        o = load_tables(spark, SF_DIR)["orders"]
        got = {r.col: r for r in profile_orders(spark, SF_DIR).collect()}
        assert set(got) == {
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice_cents", "o_orderpriority",
        }
        assert got["o_orderkey"].n_distinct == o.count()  # unique key
        assert got["o_orderkey"].n_null == 0
        n_status = o.select("o_orderstatus").distinct().count()
        assert got["o_orderstatus"].n_distinct == n_status
        assert int(got["o_custkey"].min_val) <= int(got["o_custkey"].max_val)


class TestHllUnion:
    def test_union_estimate_within_sketch_error(self, spark):
        from erkg_tutorials_spark.plans.analytics import hll_union_users
        from tests.conftest import SF_DIR

        (row,) = hll_union_users(spark, SF_DIR).collect()
        assert row.n_sketches == 5
        # m=256 registers -> relative error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
        assert abs(row.hll_union_estimate - row.n_exact) <= 0.2 * row.n_exact

    def test_union_dominates_each_part(self, spark):
        # merged-register estimate must be >= the largest per-type
        # estimate (register max can only grow under union)
        from erkg_tutorials_spark.plans.analytics import (
            hll_distinct_users,
            hll_union_users,
        )
        from tests.conftest import SF_DIR

        per_type = max(
            r.hll_estimate for r in hll_distinct_users(spark, SF_DIR).collect()
        )
        (row,) = hll_union_users(spark, SF_DIR).collect()
        assert row.hll_union_estimate >= per_type - 1e-9

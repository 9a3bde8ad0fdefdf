"""Session-memo registry (plans/memo.py): build-once semantics,
release() freeing cached storage, and rebuild-after-release."""

import os

from pyspark.sql import functions as F

from erkg_tutorials_spark.plans import memo
from erkg_tutorials_spark.plans.graphq import trade_edges_fwd
from erkg_tutorials_spark.plans.vectorq import ivf_centroids_cached

SF_DIR = "/root/testdata/sf0.001"


def test_memoized_returns_same_handle(spark):
    a = trade_edges_fwd(spark, SF_DIR)
    b = trade_edges_fwd(spark, SF_DIR)
    assert a is b


def test_release_unpersists_and_rebuilds(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(100).select(F.col("id").alias("n"))

    df1 = memo.memoized(spark, SF_DIR, "_test_release", build)
    df1.count()
    assert len(calls) == 1
    assert df1.storageLevel.useMemory or df1.storageLevel.useDisk

    evicted = memo.release(spark, sf_dir=SF_DIR, name="_test_release")
    assert evicted == 1
    # storage actually freed: the old handle reports StorageLevel NONE
    assert not (df1.storageLevel.useMemory or df1.storageLevel.useDisk)

    df2 = memo.memoized(spark, SF_DIR, "_test_release", build)
    assert len(calls) == 2
    assert df2 is not df1
    assert df2.count() == 100
    memo.release(spark, name="_test_release")


def test_release_filters(spark):
    build = lambda: spark.range(1)  # noqa: E731
    memo.memoized(spark, "/a", "_t1", build)
    memo.memoized(spark, "/b", "_t1", build)
    memo.memoized(spark, "/a", "_t2", build)
    assert memo.release(spark, sf_dir="/a") == 2
    assert memo.release(spark, name="_t1") == 1
    assert memo.release(spark, sf_dir="/a") == 0


def test_sweep_drops_foreign_application_entries(spark):
    app = spark.sparkContext.applicationId
    foreign = ("app-0000-dead", SF_DIR, "_ghost")
    memo._MEMO[foreign] = spark.range(1)
    memo.memoized(spark, SF_DIR, "_live", lambda: spark.range(1))
    assert foreign not in memo._MEMO
    assert (app, SF_DIR, "_live") in memo._MEMO
    memo.release(spark, name="_live")


def test_centroid_memo_matches_fresh_training(spark):
    """The memoized centroids are bit-identical to a fresh training
    run — memoization is a pure latency optimization."""
    from erkg_tutorials_spark.plans.vectorq import KMEANS_ITERS, KMEANS_K
    from erkg_tutorials_spark.similarity.kmeans import kmeans_cosine
    from erkg_tutorials_spark.catalog import load_tables

    cached = ivf_centroids_cached(spark, SF_DIR)
    fresh = kmeans_cosine(
        load_tables(spark, SF_DIR)["embeddings"], k=KMEANS_K, iters=KMEANS_ITERS
    )
    a = {r["cent_id"]: r["cvec"] for r in cached.collect()}
    b = {r["cent_id"]: r["cvec"] for r in fresh.collect()}
    assert a == b


class TestCheckpointChain:
    def test_chain_frees_previous_rounds(self, spark):
        from erkg_tutorials_spark.graph.ckpt import CheckpointChain

        sc = spark.sparkContext
        base = len(sc._jsc.sc().getRDDStorageInfo())
        chain = CheckpointChain()
        df = spark.range(100)
        for i in range(5):
            df = chain(df.selectExpr("id + 1 AS id"))
        # exactly ONE checkpoint pinned (the latest); earlier rounds freed
        assert len(sc._jsc.sc().getRDDStorageInfo()) == base + 1
        # the surviving state is the latest and fully readable
        assert df.agg({"id": "sum"}).collect()[0][0] == sum(range(5, 105))

    def test_two_chains_do_not_cross_release(self, spark):
        from erkg_tutorials_spark.graph.ckpt import CheckpointChain

        c1, c2 = CheckpointChain(), CheckpointChain()
        a = c1(spark.range(10))
        b = c2(spark.range(20))
        a2 = c1(a.selectExpr("id * 2 AS id"))  # frees a, must NOT touch b
        assert b.count() == 20
        assert a2.count() == 10


class TestCheckpointAttributionWarning:
    def test_extraction_failure_warns_once(self, spark):
        """A plan that is not a bare LogicalRDD must fail closed AND
        emit a one-time RuntimeWarning (ADVICE r4: a silent None here
        silently reinstates the storage leak this module prevents)."""
        import warnings as w

        from erkg_tutorials_spark.graph import ckpt

        not_checkpointed = spark.range(10).selectExpr("id + 1 AS id")
        old_flag = ckpt._warned_extraction_failure
        ckpt._warned_extraction_failure = False
        try:
            with w.catch_warnings(record=True) as first:
                w.simplefilter("always")
                assert ckpt._checkpointed_rdd_id(not_checkpointed) is None
            assert any(
                issubclass(x.category, RuntimeWarning) for x in first
            ), [str(x.message) for x in first]
            with w.catch_warnings(record=True) as second:
                w.simplefilter("always")
                assert ckpt._checkpointed_rdd_id(not_checkpointed) is None
            assert not second  # one-time only
        finally:
            ckpt._warned_extraction_failure = old_flag


class TestScalarMemo:
    """memoized_scalar: the data-derived-verdict cache (r5 VERDICT
    item 3 — the clustering hub probe must not re-run per query
    invocation)."""

    def test_computes_once_and_releases(self, spark):
        calls = []

        def compute():
            calls.append(1)
            return 42

        assert memo.memoized_scalar(spark, SF_DIR, "_test_scalar", compute) == 42
        assert memo.memoized_scalar(spark, SF_DIR, "_test_scalar", compute) == 42
        assert len(calls) == 1
        assert memo.release(spark, sf_dir=SF_DIR, name="_test_scalar") == 1
        assert memo.memoized_scalar(spark, SF_DIR, "_test_scalar", compute) == 42
        assert len(calls) == 2
        memo.release(spark, sf_dir=SF_DIR, name="_test_scalar")

    def test_falsy_values_cached(self, spark):
        """False is a legitimate verdict (the hubless common case) and
        must be cached, not recomputed."""
        calls = []

        def compute():
            calls.append(1)
            return False

        assert memo.memoized_scalar(spark, SF_DIR, "_test_falsy", compute) is False
        assert memo.memoized_scalar(spark, SF_DIR, "_test_falsy", compute) is False
        assert len(calls) == 1
        memo.release(spark, sf_dir=SF_DIR, name="_test_falsy")

    def test_clustering_plan_construction_job_free_when_warm(self, spark):
        """Once the hub verdict is memoized, constructing the
        g_clustering_coeff plan launches ZERO Spark jobs — asserted by
        running the construction inside a dedicated job group and
        checking the group stays empty (r5 ADVICE: the probe used to
        run a job even for `explain`)."""
        from erkg_tutorials_spark.plans.registry import QUERIES

        QUERIES["g_clustering_coeff"](spark, SF_DIR)  # warm: probe may run here
        sc = spark.sparkContext
        sc.setJobGroup("probe-check", "plan construction must be job-free")
        try:
            QUERIES["g_clustering_coeff"](spark, SF_DIR)  # no action taken
            assert sc.statusTracker().getJobIdsForGroup("probe-check") == []
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)

    def test_hub_probe_verdict_flips_with_cap(self, spark):
        """The memo keys on deg_cap, so a cap below the max degree
        still flips the branch (the fixture guarantee, now through the
        cached path)."""
        from erkg_tutorials_spark.plans.graphq import coorder_has_hubs_cached

        assert coorder_has_hubs_cached(spark, SF_DIR, deg_cap=1) is True
        memo.release(spark, sf_dir=SF_DIR, name="coorder_has_hubs_cap1")


def test_plan_only_explain_is_job_free(spark):
    """r6 VERDICT item 7: `explain g_clustering_coeff` on a COLD
    session must launch zero Spark jobs — the hub probe's verdict
    falls back to its scale-safe default (hybrid) under plan_only()
    instead of probing. Verified via a job group: any job launched
    from this thread during plan construction + explain would be
    tagged and show up in the status tracker."""
    import contextlib
    import io

    from erkg_tutorials_spark.plans.graphq import (
        CLUSTERING_DEG_CAP,
        g_clustering_coeff,
    )

    sc = spark.sparkContext
    # Re-create the cold state: evict the memos this query consults.
    for name in (
        "part_coorder_edges",
        "coorder_nbrs",
        f"coorder_has_hubs_cap{CLUSTERING_DEG_CAP}",
    ):
        memo.release(spark, name=name)

    sc.setJobGroup("plan_only_probe", "explain must be job-free")
    try:
        with memo.plan_only():
            df = g_clustering_coeff(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        jobs = sc.statusTracker().getJobIdsForGroup("plan_only_probe")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == [], f"explain launched jobs: {list(jobs)}"
    # the conservative default picked the HYBRID branch: it unions
    # per_edge_small with the routed wedge count before the halves
    # union, so the plan carries one more Union than the lean branch
    assert buf.getvalue().count("Union") >= 2
    # the default was NOT memoized: the next non-plan-only call probes
    # and lands the measured verdict (sf0.001 co-order graph: hubless)
    from erkg_tutorials_spark.plans.graphq import coorder_has_hubs_cached

    assert coorder_has_hubs_cached(spark, SF_DIR) is False


def test_plan_only_uses_memoized_verdict_when_warm(spark):
    """A session that already probed (or loaded the index) explains
    the MEASURED branch, not the conservative default."""
    from erkg_tutorials_spark.plans.graphq import (
        CLUSTERING_DEG_CAP,
        coorder_has_hubs_cached,
    )

    memo.install_scalar(
        spark, SF_DIR, f"coorder_has_hubs_cap{CLUSTERING_DEG_CAP}", True
    )
    try:
        with memo.plan_only():
            assert coorder_has_hubs_cached(spark, SF_DIR) is True
    finally:
        memo.release(spark, name=f"coorder_has_hubs_cap{CLUSTERING_DEG_CAP}")


def test_catalog_declared_schema_matches_inference(spark):
    """The catalog declares each stable table's schema from a
    driver-side pyarrow footer read (so no per-read inference job);
    this pins that the declared schema is EXACTLY what Spark's own
    inference would produce — any driver-side data regeneration that
    drifts a schema fails here, loudly, not at 100 TB."""
    import os

    from erkg_tutorials_spark.catalog import TABLES, _local_footer_schema

    for t in TABLES:
        if t == "events":  # dual-encoded across rounds; stays inferred
            continue
        path = os.path.join(SF_DIR, f"{t}.parquet")
        declared = _local_footer_schema(spark, path)
        assert declared is not None, t
        inferred = spark.read.parquet(path).schema
        assert declared == inferred, f"{t}: {declared} != {inferred}"


class TestMemoizedEager:
    """memoized_eager (r8 ADVICE): eager builds (Louvain's per-round
    localCheckpoints) run OUTSIDE the global lock so concurrent memo
    users never block on them; a racing duplicate build's orphan cache
    handle is unpersisted, not leaked."""

    def test_build_runs_without_holding_global_lock(self, spark):
        import threading

        observed = []

        def build():
            # the memo lock must be acquirable from ANOTHER thread
            # while this (eager, job-running) build is in flight; the
            # probe runs off-thread because the RLock is reentrant on
            # the build's own thread
            done = threading.Event()
            result = {}

            def try_lock():
                got = memo._LOCK.acquire(timeout=2.0)
                if got:
                    memo._LOCK.release()
                result["got"] = got
                done.set()

            threading.Thread(target=try_lock).start()
            assert done.wait(timeout=5.0)
            observed.append(result["got"])
            return spark.range(10).select(F.col("id").alias("n"))

        memo.memoized_eager(spark, SF_DIR, "_test_eager_lock", build)
        assert observed == [True]
        memo.release(spark, name="_test_eager_lock")

    def test_second_call_returns_cached_handle(self, spark):
        calls = []

        def build():
            calls.append(1)
            return spark.range(7).select(F.col("id").alias("n"))

        a = memo.memoized_eager(spark, SF_DIR, "_test_eager_once", build)
        b = memo.memoized_eager(spark, SF_DIR, "_test_eager_once", build)
        assert a is b and calls == [1]
        memo.release(spark, name="_test_eager_once")

    def test_race_loser_unpersists_orphan(self, spark):
        """Simulate losing the double-checked insert: pre-install the
        key mid-build; the later insert must return the winner and
        unpersist its own freshly built handle."""
        winner = spark.range(3).select(F.col("id").alias("n"))

        def build():
            memo.install(spark, SF_DIR, "_test_eager_race", winner)
            return spark.range(5).select(F.col("id").alias("n"))

        out = memo.memoized_eager(spark, SF_DIR, "_test_eager_race", build)
        assert out.count() == 3  # the pre-installed winner, not ours
        memo.release(spark, name="_test_eager_race")


class TestAnnTrainingShared:
    """r10 VERDICT item 5: every ANN registry query must serve off ONE
    k-means training pass per (session, sf_dir). kmeans.TRAINING_LOG
    records each training run started in this process; running the
    whole ANN family after a memo flush must train each configuration
    exactly once (ivf/ivfpq/semantic-dedup/curation share the
    KMEANS_K pass via ivf_centroids_cached; the cosine-join blocker
    trains its k=8 cells once via the cosjoin_centroids memo)."""

    def test_ann_training_shared(self, spark):
        from erkg_tutorials_spark.plans.vectorq import KMEANS_K, KMEANS_ITERS
        from erkg_tutorials_spark.similarity import kmeans

        import __spark_entry__ as entry

        qs = entry.queries()
        family = [
            "knn_cosine_ivf",
            "knn_cosine_ivfpq",
            "dedup_semantic",
            "curation_cluster_sample",
            "knn_cosine_pq",
            "knn_cosine_sq8",
            "dedup_embedding_cosine",
        ]
        # flush any centroids earlier tests left behind, then log from
        # a clean slate
        memo.release(spark, sf_dir=SF_DIR)
        kmeans.TRAINING_LOG.clear()
        for name in family:
            qs[name](spark, SF_DIR).count()
        ivf_runs = [e for e in kmeans.TRAINING_LOG if e == (KMEANS_K, KMEANS_ITERS)]
        cosjoin_runs = [e for e in kmeans.TRAINING_LOG if e == (8, 1)]
        assert len(ivf_runs) == 1, kmeans.TRAINING_LOG
        assert len(cosjoin_runs) == 1, kmeans.TRAINING_LOG
        # nothing else trains
        assert len(kmeans.TRAINING_LOG) == 2, kmeans.TRAINING_LOG
        # a second pass over the family retrains NOTHING
        for name in family:
            qs[name](spark, SF_DIR).count()
        assert len(kmeans.TRAINING_LOG) == 2, kmeans.TRAINING_LOG


def test_family_isolation_relational_builds_no_memos(spark):
    """r10 VERDICT item 4: a user running ONE relational query must
    not pay for graph/vector/text materializations — cold-start
    q1/q3/w1 builds ZERO memo entries (the shared_materializations
    bench line is opt-in per family, not a suite-wide tax)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    memo.release(spark, sf_dir=SF_DIR)
    before = set(memo._MEMO) | set(memo._SCALAR_MEMO)
    for name in ("q1_pricing_summary", "q3_top_orders",
                 "w1_top3_orders_per_customer", "j1_dim_lookup"):
        qs[name](spark, SF_DIR).count()
    after = set(memo._MEMO) | set(memo._SCALAR_MEMO)
    new = {k for k in after - before if k[1] == SF_DIR}
    assert new == set(), f"relational queries built memos: {new}"

"""Persisted graph-index round-trip (r5 VERDICT item 2).

Reference behavior: the graph lineage persists the derived graph into
Neo4j and re-reads it across sessions (/root/reference/Readme.md:19,
33-36). Here: derive → save_index → wipe the session memos →
load_index → the graph query family must produce byte-identical
results from the loaded state, without re-derivation — and the loaded
session must construct the clustering plan with ZERO probe jobs (the
hub verdict rides in the manifest).
"""

import pytest

from erkg_tutorials_spark.graph.index_store import (
    ARTIFACTS,
    index_params,
    load_index,
    save_index,
)
from erkg_tutorials_spark.plans import memo
from erkg_tutorials_spark.plans.registry import QUERIES

from tests.conftest import SF_DIR

GRAPH_QUERIES = [
    "g5_pagerank_top20",
    "g_ppr_watchlist",
    "g_clustering_coeff",
    "g3_two_hop_reach",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def graph_index_dir(tmp_path_factory, spark):
    """A directory already holding a saved graph index — saved here so
    every test below is independently runnable by node id."""
    path = str(tmp_path_factory.mktemp("graph_index"))
    save_index(spark, SF_DIR, path)
    return path


class TestGraphIndexRoundTrip:
    def test_save_load_identical_results(self, spark, graph_index_dir):
        fresh = {q: _rows(QUERIES[q](spark, SF_DIR)) for q in GRAPH_QUERIES}
        artifacts_before = {
            name: _rows(df) for name, df in _derive_artifacts(spark).items()
        }

        assert memo.release(spark, sf_dir=SF_DIR) > 0  # memos existed; now wiped

        loaded = load_index(spark, SF_DIR, graph_index_dir)
        # 1) every artifact survives the Parquet round trip exactly
        for name in ARTIFACTS:
            assert _rows(loaded[name]) == artifacts_before[name], name
        # 2) loaded state is a file scan, not a re-derivation plan
        for name in ARTIFACTS:
            plan = loaded[name]._jdf.queryExecution().analyzed().toString()
            assert "parquet" in plan, name
        # 3) every graph query replays bit-identically from the index
        for q in GRAPH_QUERIES:
            assert _rows(QUERIES[q](spark, SF_DIR)) == fresh[q], q

    def test_load_makes_clustering_plan_job_free(self, spark, graph_index_dir):
        """After load_index, even a COLD session (memos wiped first)
        constructs g_clustering_coeff without launching the hub-probe
        job — the verdict came from the manifest."""
        memo.release(spark, sf_dir=SF_DIR)
        load_index(spark, SF_DIR, graph_index_dir)
        sc = spark.sparkContext
        sc.setJobGroup("graph-probe-check", "plan construction must be job-free")
        try:
            QUERIES["g_clustering_coeff"](spark, SF_DIR)  # no action taken
            assert sc.statusTracker().getJobIdsForGroup("graph-probe-check") == []
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)

    def test_param_mismatch_fails_closed(self, spark, graph_index_dir, monkeypatch):
        from erkg_tutorials_spark.plans import graphq as gq

        monkeypatch.setattr(gq, "PPR_SEED_MOD", gq.PPR_SEED_MOD + 1)
        with pytest.raises(ValueError, match="ppr_seed_mod"):
            load_index(spark, SF_DIR, graph_index_dir)

    def test_manifest_records_current_params(self, spark, graph_index_dir):
        stored = spark.read.parquet(f"{graph_index_dir}/_manifest").first().asDict()
        hubs = stored.pop("coorder_has_hubs")
        assert stored == index_params()
        assert hubs is False  # the sf0.001 co-order graph is hubless


def _derive_artifacts(spark):
    from erkg_tutorials_spark.graph.index_store import _getters

    return {name: _getters(spark, SF_DIR)[name]() for name in ARTIFACTS}

"""Golden parity: the Spark E1 pipeline vs the pure-Python oracle on
the deterministic fixture (SURVEY.md §5 strategy #2)."""

import math

import pytest

from erkg_tutorials_spark.pipelines.senzing_pipeline import (
    filter_suspicious,
    generate_aliases,
    generate_entities,
    run_senzing_pipeline,
)
from erkg_tutorials_spark.sources.senzing import (
    alias_records,
    entity_features,
    graph_tables,
    read_senzing_report,
)
from erkg_tutorials_spark.sources.tabular import load_countries, load_text_lines
from tests import reference_oracle as oracle
from tests.senzing_fixture import write_fixture


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("senzing")))


@pytest.fixture(scope="module")
def expected(fixture):
    return oracle.oracle_pipeline(fixture["report"], fixture["suspicious"], fixture["countries"])


@pytest.fixture(scope="module")
def raw(spark, fixture):
    return read_senzing_report(spark, fixture["report"]).cache()


class TestGraphTables:
    def test_vertices_match(self, raw, expected):
        vertices, _, _ = graph_tables(raw)
        got = {
            r.entity_uid: (r.name, r.num_recs, r.has_ref) for r in vertices.collect()
        }
        want = {
            uid: (e["name"], e["num_recs"], e["has_ref"])
            for uid, e in expected["graph"].items()
        }
        assert got == want

    def test_records_match(self, raw, expected):
        _, _, records = graph_tables(raw)
        got = {}
        for r in records.collect():
            got.setdefault(r.entity_uid, {})[r.record_uid] = r.match_key
        want = {
            uid: e["records"] for uid, e in expected["graph"].items() if e["records"]
        }
        assert got == want

    def test_edges_match(self, raw, expected):
        _, edges, _ = graph_tables(raw)
        got = {}
        for r in edges.collect():
            got.setdefault(r.src, {})[r.dst] = r.match_level_code
        want = {
            uid: {rid: rel["MATCH_LEVEL_CODE"] for rid, rel in e["related"].items()}
            for uid, e in expected["graph"].items()
            if e["related"]
        }
        assert got == want


class TestFilterSuspicious:
    def test_two_hop_id_set(self, spark, raw, fixture, expected):
        vertices, edges, _ = graph_tables(raw)
        suspicions = load_text_lines(spark, fixture["suspicious"])
        got = {r.entity_id for r in filter_suspicious(suspicions, vertices, edges).collect()}
        assert got == expected["ids"]
        assert len(got) > 5  # fixture guarantees a non-trivial reach


class TestEntities:
    def test_entities_match_oracle(self, spark, raw, fixture, expected):
        countries = load_countries(spark, fixture["countries"])
        ids = spark.createDataFrame(
            [(i,) for i in expected["ids"]], ["entity_id"]
        )
        feats = entity_features(raw).join(ids, "entity_id", "left_semi")
        got = {
            r.entity_id: {"entity_id": r.entity_id, "type": r.type, "name": r.name, "description": r.description}
            for r in generate_entities(feats, countries).collect()
        }
        assert got == expected["entities"]


class TestAliases:
    def test_alias_distributions_match_oracle(self, spark, raw, expected):
        ids = expected["ids"]
        ar = alias_records(raw)
        ar = ar.where(ar["entity"].cast("string").isin(list(ids)))
        got = {
            r.alias: {"entities": r.entities, "probabilities": r.probabilities}
            for r in generate_aliases(ar).collect()
        }
        want = expected["aliases"]
        assert set(got) == set(want)
        for alias in want:
            assert got[alias]["entities"] == want[alias]["entities"], alias
            assert all(
                math.isclose(a, b, rel_tol=1e-12)
                for a, b in zip(got[alias]["probabilities"], want[alias]["probabilities"])
            ), alias

    def test_probabilities_sum_to_one(self, raw, spark):
        got = generate_aliases(alias_records(raw)).collect()
        for r in got:
            assert math.isclose(sum(r.probabilities), 1.0, rel_tol=1e-9)


class TestEndToEnd:
    def test_run_pipeline_writes_jsonl(self, spark, fixture, tmp_path):
        out_e = str(tmp_path / "entities")
        out_a = str(tmp_path / "aliases")
        entities_df, aliases_df = run_senzing_pipeline(
            spark,
            fixture["report"],
            fixture["suspicious"],
            fixture["countries"],
            out_entities=out_e,
            out_aliases=out_a,
        )
        assert entities_df.count() > 0
        assert aliases_df.count() > 0
        back = spark.read.json(out_e)
        assert {"entity_id", "type", "name", "description"} <= set(back.columns)


class TestScaledGolden:
    """E1 at a scaled fixture (2k entities, 25x the unit fixture):
    full-pipeline equality against the pure-Python oracle on a
    deterministic sample of entities — pins that the pipeline's
    semantics don't drift with report size (VERDICT r1 task 6)."""

    @pytest.fixture(scope="class")
    def scaled(self, tmp_path_factory):
        return write_fixture(
            str(tmp_path_factory.mktemp("senzing_scaled")), n_entities=2000
        )

    def test_sampled_entities_and_aliases_match(self, spark, scaled):
        ents_df, aliases_df = run_senzing_pipeline(
            spark, scaled["report"], scaled["suspicious"], scaled["countries"]
        )
        expected = oracle.oracle_pipeline(
            scaled["report"], scaled["suspicious"], scaled["countries"]
        )
        # deterministic sample: every 7th entity id in the filtered set
        sample = {i for i in expected["ids"] if int(i) % 7 == 0}
        got_e = {
            r.entity_id: (r.type, r.name, r.description)
            for r in ents_df.collect()
            if r.entity_id in sample
        }
        want_e = {
            uid: (e["type"], e["name"], e["description"])
            for uid, e in expected["entities"].items()
            if uid in sample
        }
        assert got_e == want_e and len(want_e) > 20

        sample_aliases = {
            a for a, v in expected["aliases"].items()
            if any(int(x) % 7 == 0 for x in v["entities"])
        }
        got_a = {
            r.alias: (r.entities, r.probabilities)
            for r in aliases_df.collect()
            if r.alias in sample_aliases
        }
        for alias in sample_aliases:
            want = expected["aliases"][alias]
            assert got_a[alias][0] == want["entities"], alias
            for gp, wp in zip(got_a[alias][1], want["probabilities"]):
                assert math.isclose(gp, wp, rel_tol=1e-12), alias

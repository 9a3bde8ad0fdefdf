"""OPERATORS.md must stay current with the registry (r5 VERDICT item
8): the committed index is regenerated here and compared verbatim, so
adding/moving/renaming a query without re-running
tools/gen_operator_index.py fails the suite."""

import os

from tools.gen_operator_index import OUT, render


def test_operator_index_is_current():
    assert os.path.exists(OUT), "OPERATORS.md missing; run tools/gen_operator_index.py"
    with open(OUT) as fh:
        committed = fh.read()
    assert committed == render(), (
        "OPERATORS.md is stale; run python tools/gen_operator_index.py"
    )


def test_every_query_indexed_once():
    from erkg_tutorials_spark.plans.registry import QUERIES

    with open(OUT) as fh:
        text = fh.read()
    for name in QUERIES:
        assert f"| `{name}` |" in text, name


def test_every_query_has_description():
    """Every registered query function must carry a one-line docstring
    (r6 VERDICT item 8) — the index's description column is the
    docstring's first line, and an empty cell means an undocumented
    operator."""
    import inspect

    from erkg_tutorials_spark.plans.registry import QUERIES

    undocumented = [
        name
        for name, fn in QUERIES.items()
        if not (inspect.getdoc(inspect.unwrap(fn)) or "").strip()
    ]
    assert not undocumented, f"queries missing docstrings: {undocumented}"


def test_readme_counts_current():
    """README's advertised registry size and test-suite size must match
    the live registry and pytest collection (r7 VERDICT item 7 — the
    pass-count drifted in two consecutive rounds; now it can't)."""
    from tools.gen_operator_index import (
        README,
        collected_test_count,
        updated_readme,
    )
    from erkg_tutorials_spark.plans.registry import QUERIES

    with open(README) as fh:
        text = fh.read()
    assert updated_readme(text, len(QUERIES), collected_test_count()) == text, (
        "README counts are stale; run python tools/gen_operator_index.py"
    )


def test_sf01_sweep_artifact_consistent():
    """CORRECTNESS_SF01.md must be one continuous sweep over the LIVE
    registry (r7 VERDICT item 2: the hand-assembled artifact drifted
    to 221-header / 214-body / 222-registry): header total == number
    of PASS lines == registry size, zero FAIL/weak lines."""
    import re

    from erkg_tutorials_spark.plans.registry import QUERIES
    from tools.gen_sf01_sweep import HEADER_RE, OUT as SWEEP_OUT

    with open(SWEEP_OUT) as fh:
        text = fh.read()
    m = HEADER_RE.search(text)
    assert m, "CORRECTNESS_SF01.md header missing; run tools/gen_sf01_sweep.py"
    n_pass_header, n_total_header = int(m.group(1)), int(m.group(2))
    pass_lines = re.findall(r"(?m)^PASS ", text)
    fail_lines = re.findall(r"(?m)^FAIL ", text)
    assert not fail_lines, "sweep artifact records FAILs"
    assert n_pass_header == len(pass_lines), "header/body disagree"
    assert n_total_header == len(QUERIES), (
        "registry changed since the last sf0.1 sweep; "
        "run python tools/gen_sf01_sweep.py"
    )
    assert n_pass_header == len(QUERIES), "sweep incomplete vs registry"


def test_10x_sweep_artifact_consistent():
    """CORRECTNESS_10X.md (r9 VERDICT item 1: the full-registry sweep
    over the combined key-shifted 10x build) must be one continuous
    run with header == PASS-body and zero FAILs. Unlike the sf0.1
    artifact it pins its own recorded total rather than the live
    registry size — the hours-long sweep is regenerated per round,
    and a registry added to since then shows up as header < registry
    in the artifact text, not as a silently-edited body."""
    import re

    from tools.gen_10x_sweep import HEADER_RE, OUT as SWEEP_OUT

    with open(SWEEP_OUT) as fh:
        text = fh.read()
    m = HEADER_RE.search(text)
    assert m, "CORRECTNESS_10X.md header missing; run tools/gen_10x_sweep.py"
    n_pass_header, n_total_header = int(m.group(1)), int(m.group(2))
    pass_lines = re.findall(r"(?m)^PASS ", text)
    fail_lines = re.findall(r"(?m)^FAIL ", text)
    assert not fail_lines, "10x sweep artifact records FAILs"
    assert n_pass_header == len(pass_lines), "header/body disagree"
    assert n_pass_header == n_total_header, "10x sweep recorded non-PASS rows"

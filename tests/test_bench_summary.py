"""bench.py driver contract: the FINAL stdout line must be one JSON
object short enough to survive the driver's ~2000-char stdout-tail
capture (r8 VERDICT item 3 — BENCH_r08.json recorded parsed=null
because the full 157-query artifact line was ~10 KB)."""

from __future__ import annotations

import importlib.util
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_compact_summary_fits_driver_tail():
    bench = _load_bench()
    with open(os.path.join(HERE, "BENCH_LOCAL_r08.json")) as fh:
        full = json.load(fh)
    summary = bench._compact_summary(full, HERE, 9)
    line = json.dumps(summary)
    assert len(line) <= 2000, f"summary line {len(line)} chars > 2000"
    # driver contract shape
    assert summary["metric"] == "headline_suite_total"
    assert summary["unit"] == "sec"
    assert isinstance(summary["value"], (int, float))
    assert isinstance(summary["queries"], dict)
    assert 0 < len(summary["queries"]) <= 10
    assert summary["n_queries"] == len(full["queries"])
    # vs itself (r8 vs r8) the geomean is exactly 1.0
    assert summary["geomean_vs_prev_round"] == 1.0


def test_compact_summary_no_prev_round():
    bench = _load_bench()
    with open(os.path.join(HERE, "BENCH_LOCAL_r08.json")) as fh:
        full = json.load(fh)
    summary = bench._compact_summary(full, HERE, 1)  # r0 artifact absent
    assert summary["geomean_vs_prev_round"] is None
    assert len(json.dumps(summary)) <= 2000

"""Streaming tier at the 10x distinct-data step (r10 VERDICT item 6).

The 14 `stream_*` registry queries had correctness coverage at three
scales but zero scale-STEP timing: stateful operators (watermark
rollups, stream-stream interval joins, sessionization, dedup state)
are the most likely place a decade of data changes behavior — state
rows grow with keys, the state store pays per-partition commit
overhead per micro-batch, and AvailableNow plans its batches from the
input size at start.

This tool drains a stratified stream panel against the sf0.1 source
AND the combined 10x build (tools/build_sf10x.py — 10x users => 10x
daily traffic on the same calendar), recording per-query:

* drain wall seconds (AvailableNow, fresh checkpoint, same
  STREAM_SHUFFLE_PARTITIONS the engine ships);
* output rows;
* state-store rows + bytes at the last micro-batch, captured via a
  StreamingQueryListener (the footprint evidence — watermark eviction
  should keep state bounded by active windows/sessions, NOT total
  input).

    python tools/stream_scale_step.py [--scales 1 10]

Output: STREAM_SCALE.json at the repo root + a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/root/testdata/sf0.1"

PANEL = [
    "stream_hourly_rollup",       # watermarked tumbling rollup
    "stream_sliding_rollup",      # overlapping windows (state fan-out)
    "stream_sessionize_closed",   # applyInPandasWithState sessionization
    "stream_attribution_pairs",   # stream-stream interval join
    "stream_attribution_outer",   # outer interval join (state until WM)
    "stream_dedup_union",         # dropDuplicates state
    "stream_late_data_drop",      # watermark drop accounting
    "stream_exactly_once_daily",  # two-run checkpoint resume
]


class _Capture:
    """Keeps the LAST progress event's state-operator summary per
    streaming query name (sink names are '<base>_<seq>')."""

    def __init__(self) -> None:
        self.by_name: dict[str, dict] = {}
        self.lock = threading.Lock()

    def listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        cap = self

        class L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                ops = p.stateOperators or []
                with cap.lock:
                    cap.by_name[p.name] = {
                        "state_rows": sum(o.numRowsTotal for o in ops),
                        "state_bytes": sum(o.memoryUsedBytes for o in ops),
                        "batch_id": p.batchId,
                    }

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return L()


def run_panel(spark, sf_dir: str, cap: _Capture) -> dict:
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in PANEL:
        before = set(cap.by_name)
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        secs = round(time.time() - t0, 2)
        # the sink this run created (new '<base>_<seq>' keys); progress
        # events arrive asynchronously, so poll briefly before giving
        # up (a missed event costs the state columns, not the timing)
        new: dict = {}
        for _ in range(20):
            with cap.lock:
                new = {
                    k: v for k, v in cap.by_name.items() if k not in before
                }
            if new:
                break
            time.sleep(0.15)
        state = max(
            new.values(), key=lambda v: v["state_rows"], default=None
        ) if new else None
        out[name] = {
            "secs": secs,
            "rows": n,
            **({"state_rows": state["state_rows"],
                "state_mb": round(state["state_bytes"] / 2**20, 2)}
               if state else {}),
        }
        print(f"[{os.path.basename(sf_dir)}] {name}: {secs}s rows={n} "
              f"state={state}", flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="+", type=int, default=[1, 10])
    args = ap.parse_args()

    from erkg_tutorials_spark.session import get_spark
    from tools.build_sf10x import build

    spark = get_spark("stream-scale", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    cap = _Capture()
    spark.streams.addListener(cap.listener())

    results: dict[str, dict] = {}
    for k in args.scales:
        d = SF1 if k == 1 else build(
            src=SF1, dst=f"/tmp/erkg_sf{k}x_all_v2", copies=k
        )
        results[str(k)] = run_panel(spark, d, cap)

    art = {"src": SF1, "panel": PANEL, "scales": results}
    path = os.path.join(REPO, "STREAM_SCALE.json")
    with open(path, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}")

    if {"1", "10"} <= results.keys():
        print("\n| query | 1x secs | 10x secs | bend | 1x state rows | "
              "10x state rows |")
        print("|---|---|---|---|---|---|")
        for name in PANEL:
            a, b = results["1"][name], results["10"][name]
            bend = round(b["secs"] / a["secs"], 2) if a["secs"] else "-"
            print(f"| {name} | {a['secs']} | {b['secs']} | {bend}x | "
                  f"{a.get('state_rows', '-')} | "
                  f"{b.get('state_rows', '-')} |")
    spark.stop()


if __name__ == "__main__":
    main()

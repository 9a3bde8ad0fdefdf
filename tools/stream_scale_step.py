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
    """Keeps the MAX-over-batches state-operator summary per streaming
    query name (sink names are '<base>_<seq>'). Max, not last: the r11
    artifact sampled the last micro-batch, and AvailableNow plans a
    different batch count per scale — a query whose final batch holds
    little state (e.g. the outer-join's watermark flush) recorded
    40,025 rows at 1x vs 1,470 at 10x, an artifact of WHICH batch was
    sampled, not a state shrink. The per-query maximum is the actual
    footprint the state store must hold, and it means one thing at
    every scale."""

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
                rows = sum(o.numRowsTotal for o in ops)
                byts = sum(o.memoryUsedBytes for o in ops)
                with cap.lock:
                    cur = cap.by_name.get(p.name)
                    if cur is None or rows > cur["state_rows"]:
                        cap.by_name[p.name] = {
                            "state_rows": rows,
                            "state_bytes": byts,
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
        # events arrive asynchronously AND the max-over-batches capture
        # needs the whole event stream, so poll until the snapshot is
        # stable across two consecutive reads (a missed tail event
        # costs the state columns, not the timing)
        new: dict = {}
        prev_snap = None
        for _ in range(20):
            with cap.lock:
                new = {
                    k: dict(v) for k, v in cap.by_name.items()
                    if k not in before
                }
            if new and new == prev_snap:
                break
            prev_snap = new
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

    # 100x sizing, measurement-tool-side only (inside main(), not at
    # import — the scale_100x module-import setdefault was an r11
    # ADVICE finding): the dedup state at 100x needs a real heap
    # (8 g default OOMs serializing the state-store commit), and the
    # panel's memory-sink drain collects the full deduped output
    # (~15M rows at 100x) which trips the 1 g maxResultSize default.
    # Neither conf changes what any query computes.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        "stream-scale",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.maxResultSize": "8g",
        },
    )
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

    ks = sorted(results.keys(), key=int)
    if len(ks) >= 2:
        head = (
            "| query | " + " | ".join(f"{k}x secs" for k in ks)
            + " | " + " | ".join(
                f"{a}→{b}x bend" for a, b in zip(ks, ks[1:])
            )
            + " | " + " | ".join(f"{k}x state rows" for k in ks) + " |"
        )
        print("\n" + head)
        print("|" + "---|" * (head.count("|") - 1))
        for name in PANEL:
            rs = [results[k][name] for k in ks]
            bends = [
                (round(b["secs"] / a["secs"], 2) if a["secs"] else "-")
                for a, b in zip(rs, rs[1:])
            ]
            print(
                f"| {name} | "
                + " | ".join(str(r["secs"]) for r in rs) + " | "
                + " | ".join(f"{b}x" for b in bends) + " | "
                + " | ".join(str(r.get("state_rows", "-")) for r in rs)
                + " |"
            )
    spark.stop()


if __name__ == "__main__":
    main()

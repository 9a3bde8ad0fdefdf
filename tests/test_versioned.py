"""Versioned-manifest table (lakehouse/versioned.py): commit
atomicity, snapshot isolation, and manifest resolution — the
properties the timetravel_orders_snapshot oracle can't see from
aggregate values alone."""

import json
import os

import pytest

from erkg_tutorials_spark.lakehouse.versioned import (
    committed_versions,
    read_manifest,
    read_version,
    write_version,
)


def test_append_and_overwrite_file_lists(spark, tmp_path):
    root = str(tmp_path / "t")
    assert write_version(spark.range(10), root, "overwrite") == 0
    assert write_version(spark.range(10, 15), root, "append") == 1
    assert write_version(spark.range(3), root, "overwrite") == 2
    m0, m1, m2 = (read_manifest(root, i) for i in range(3))
    assert set(m0["files"]) < set(m1["files"])  # append carries parent files
    assert all(f.startswith("data/v2-") for f in m2["files"])  # overwrite resets
    assert read_version(spark, root, 0).count() == 10
    assert read_version(spark, root, 1).count() == 15
    assert read_version(spark, root).count() == 3  # latest = v2


def test_snapshot_isolation_under_later_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(spark.range(100), root, "overwrite")
    snap = read_version(spark, root, 0)  # resolve BEFORE the next commit
    write_version(spark.range(5), root, "overwrite")
    # the resolved snapshot still reads v0's immutable files
    assert snap.count() == 100
    assert read_version(spark, root).count() == 5


def test_torn_manifest_is_invisible(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(spark.range(7), root, "overwrite")
    # simulate a crash between manifest write and rename
    torn = os.path.join(root, "_manifests", "1.json.tmp")
    with open(torn, "w") as fh:
        json.dump({"version": 1, "files": ["data/v1/nope.parquet"]}, fh)
    assert committed_versions(root) == [0]
    assert read_version(spark, root).count() == 7


def test_unknown_version_and_empty_table_raise(spark, tmp_path):
    root = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        read_version(spark, root)
    write_version(spark.range(1), root)
    with pytest.raises(ValueError, match="not committed"):
        read_version(spark, root, 9)
    with pytest.raises(ValueError, match="unknown mode"):
        write_version(spark.range(1), root, "upsert")


def test_compact_rewrites_latest_only(spark, tmp_path):
    from erkg_tutorials_spark.lakehouse.versioned import compact

    root = str(tmp_path / "t")
    write_version(spark.range(50).repartition(8), root, "overwrite")
    assert len(read_manifest(root, 0)["files"]) > 1
    v = compact(spark, root, target_files=1)
    assert v == 1
    assert len(read_manifest(root, 1)["files"]) == 1
    # content identical, old version untouched
    assert read_version(spark, root, 1).count() == 50
    assert read_version(spark, root, 0).count() == 50


def test_vacuum_drops_old_versions_but_keeps_shared_files(spark, tmp_path):
    from erkg_tutorials_spark.lakehouse.versioned import vacuum

    root = str(tmp_path / "t")
    write_version(spark.range(10), root, "overwrite")   # v0
    write_version(spark.range(10, 20), root, "append")  # v1 references v0 files
    write_version(spark.range(20, 25), root, "append")  # v2 references v0+v1
    assert vacuum(root, keep_versions=1) == [0, 1]
    assert committed_versions(root) == [2]
    # v2's append chain still reads all 15 appended rows: vacuum must
    # keep v0/v1 DATA dirs because the surviving manifest lists them
    assert read_version(spark, root).count() == 25
    with pytest.raises(ValueError):
        read_version(spark, root, 0)
    with pytest.raises(ValueError):
        vacuum(root, keep_versions=0)


def test_vacuum_after_overwrite_frees_unreferenced_dirs(spark, tmp_path):
    from erkg_tutorials_spark.lakehouse.versioned import vacuum

    root = str(tmp_path / "t")
    write_version(spark.range(10), root, "overwrite")
    write_version(spark.range(3), root, "overwrite")
    vacuum(root, keep_versions=1)
    dirs = os.listdir(os.path.join(root, "data"))
    assert len(dirs) == 1 and dirs[0].startswith("v1-")
    assert read_version(spark, root).count() == 3


def test_batch_id_commit_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = write_version(spark.range(10), root, "append", batch_id=0)
    v1 = write_version(spark.range(10, 20), root, "append", batch_id=1)
    # a replayed micro-batch (same id, possibly different partitioning)
    # must return the committed version without writing
    again = write_version(spark.range(10, 20).repartition(4), root, "append", batch_id=1)
    assert (v0, v1, again) == (0, 1, 1)
    assert committed_versions(root) == [0, 1]
    assert read_version(spark, root).count() == 20


def test_batch_id_lookup_is_marker_backed_and_self_repairing(spark, tmp_path):
    """The replay check must be O(1) driver file reads via the
    _txns/<id>.json marker, not an O(versions) manifest scan — and a
    marker lost in the crash window between manifest link and marker
    write must be repaired on the next lookup."""
    from erkg_tutorials_spark.lakehouse.versioned import _txn_path

    root = str(tmp_path / "t")
    for b in range(4):
        write_version(spark.range(b, b + 1), root, "append", batch_id=b)
    # every commit left its marker
    for b in range(4):
        assert os.path.exists(_txn_path(root, b))
    # simulate the crash window: newest marker lost before being written
    os.remove(_txn_path(root, 3))
    assert write_version(spark.range(99), root, "append", batch_id=3) == 3
    assert os.path.exists(_txn_path(root, 3))  # repaired
    assert committed_versions(root) == [0, 1, 2, 3]


def test_vacuum_retention_spares_young_unreferenced_dirs(spark, tmp_path):
    from erkg_tutorials_spark.lakehouse.versioned import vacuum

    root = str(tmp_path / "t")
    write_version(spark.range(10), root, "overwrite")
    # an in-flight writer's uuid data dir: written, manifest not linked yet
    inflight = os.path.join(root, "data", "v1-deadbeef")
    os.makedirs(inflight)
    vacuum(root, keep_versions=1, retention_seconds=3600)
    assert os.path.isdir(inflight)  # young: spared
    vacuum(root, keep_versions=1)  # retention 0: reclaimed
    assert not os.path.isdir(inflight)


def test_vacuum_tolerates_missing_data_dir(spark, tmp_path):
    import shutil

    from erkg_tutorials_spark.lakehouse.versioned import vacuum

    root = str(tmp_path / "t")
    write_version(spark.range(1), root, "overwrite")
    shutil.rmtree(os.path.join(root, "data"))
    assert vacuum(root, keep_versions=1) == []  # no raise


# --- model-based property test -----------------------------------------
#
# Random command sequences (append/overwrite/replayed-batch commits)
# against a pure-Python model of the log: after any sequence, every
# committed version's content and the batch-id dedupe behavior must
# match the model exactly. Spark executes once per generated sequence
# (per-example Spark latency rule of test_properties.py).

from hypothesis import given, settings
from hypothesis import strategies as st

_cmd = st.tuples(
    st.sampled_from(["append", "overwrite"]),
    st.integers(min_value=1, max_value=5),   # row count
    st.one_of(st.none(), st.integers(min_value=0, max_value=2)),  # batch_id
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_cmd, min_size=1, max_size=5))
def test_versioned_log_matches_model(spark, tmp_path_factory, cmds):
    import itertools

    root = str(tmp_path_factory.mktemp("vlog") / "t")
    model: list[set[int]] = []  # expected id set per version
    seen_batches: dict[int, int] = {}
    base = itertools.count(0)
    for mode, n, bid in cmds:
        lo = next(base) * 100
        ids = set(range(lo, lo + n))
        v = write_version(
            spark.range(lo, lo + n), root, mode, batch_id=bid
        )
        if bid is not None and bid in seen_batches:
            assert v == seen_batches[bid]  # replay: no new version
            continue
        if bid is not None:
            seen_batches[bid] = v
        model.append(ids if mode == "overwrite" or not model else model[-1] | ids)
        assert v == len(model) - 1
    assert committed_versions(root) == list(range(len(model)))
    for v, expect in enumerate(model):
        got = {r[0] for r in read_version(spark, root, v).collect()}
        assert got == expect, (v, cmds)


def test_concurrent_commit_loser_raises_and_table_intact(spark, tmp_path):
    """Two writers racing for the same version: exactly one wins the
    manifest link; the loser raises ConcurrentCommitError and the
    winner's commit plus all prior versions stay readable."""
    import json as _json

    from erkg_tutorials_spark.lakehouse.versioned import (
        ConcurrentCommitError,
        _manifest_dir,
    )

    from unittest import mock

    import erkg_tutorials_spark.lakehouse.versioned as V

    root = str(tmp_path / "t")
    write_version(spark.range(5), root, "overwrite")
    # race: the loser reads the log (sees [0]), then the winner
    # commits version 1 before the loser's link — modeled by pinning
    # the loser's log read to the stale snapshot
    winner = {"version": 1, "parent": 0, "mode": "append",
              "files": read_manifest(root, 0)["files"]}
    with open(os.path.join(_manifest_dir(root), "1.json"), "w") as fh:
        _json.dump(winner, fh)
    with mock.patch.object(V, "committed_versions", return_value=[0]):
        with pytest.raises(ConcurrentCommitError, match="version 1"):
            V.write_version(spark.range(5, 10), root, "append")
    # winner intact, loser's data dir unreferenced, no torn state
    assert committed_versions(root) == [0, 1]
    assert read_version(spark, root).count() == 5
    # retry after re-reading the log succeeds as version 2
    assert write_version(spark.range(5, 10), root, "append") == 2
    assert read_version(spark, root).count() == 10


def test_buried_crash_window_repaired_under_interleaved_writers(spark, tmp_path):
    """r8 ADVICE: with two writers/streams, a second writer's MARKED
    commit can land above a crashed commit's unmarked manifest. The
    old repair scan stopped at the first marked manifest and missed
    the buried one, letting the replay double-commit. The watermark-
    bounded scan must find and repair it."""
    from erkg_tutorials_spark.lakehouse import versioned as V
    from erkg_tutorials_spark.lakehouse.versioned import _txn_path

    root = str(tmp_path / "t")
    write_version(spark.range(0, 1), root, "append", batch_id=100)  # v0, stream A
    # stream B commits v1 but crashes BEFORE its marker write
    real_record = V._txn_record
    V._txn_record = lambda r, b, v: None if b == 7 else real_record(r, b, v)
    try:
        write_version(spark.range(1, 2), root, "append", batch_id=7)  # v1
    finally:
        V._txn_record = real_record
    assert not os.path.exists(_txn_path(root, 7))
    # stream A then commits a MARKED version above the unmarked v1
    write_version(spark.range(2, 3), root, "append", batch_id=101)  # v2
    # replay of stream B's batch must be recognized, not re-committed
    assert write_version(spark.range(99), root, "append", batch_id=7) == 1
    assert committed_versions(root) == [0, 1, 2]
    assert os.path.exists(_txn_path(root, 7))  # repaired


def test_repair_scan_continues_past_marked_manifests(spark, tmp_path):
    """The racing sub-case: writer A read the version list BEFORE
    writer B's manifest linked, so A's miss-scan never saw B's
    unmarked v1; A then commits a MARKED v2 above it. The replay of
    B's batch must scan PAST the marked head (old code stopped there)
    down to the watermark and find the buried commit."""
    from erkg_tutorials_spark.lakehouse import versioned as V
    from erkg_tutorials_spark.lakehouse.versioned import _txn_path

    root = str(tmp_path / "t")
    write_version(spark.range(0, 1), root, "append", batch_id=100)  # v0
    real_record = V._txn_record
    V._txn_record = lambda r, b, v: None if b == 7 else real_record(r, b, v)
    try:
        write_version(spark.range(1, 2), root, "append", batch_id=7)  # v1, crash
    finally:
        V._txn_record = real_record
    # A's lookup raced: it saw a version list WITHOUT v1, so its scan
    # repaired nothing — simulate by bypassing the lookup entirely
    real_lookup = V._txn_lookup
    V._txn_lookup = lambda r, b, vs: None
    try:
        write_version(spark.range(2, 3), root, "append", batch_id=101)  # v2, marked
    finally:
        V._txn_lookup = real_lookup
    assert not os.path.exists(_txn_path(root, 7))
    assert os.path.exists(_txn_path(root, 101))  # marked manifest above
    assert write_version(spark.range(99), root, "append", batch_id=7) == 1
    assert committed_versions(root) == [0, 1, 2]


def test_repair_scan_is_watermark_bounded(spark, tmp_path):
    """A marker-miss lookup must only read manifests committed since
    the last scan (amortized O(1) per commit), not the whole history:
    manifests below the persisted watermark are never re-opened."""
    from erkg_tutorials_spark.lakehouse import versioned as V

    root = str(tmp_path / "t")
    for b in range(5):
        write_version(spark.range(b, b + 1), root, "append", batch_id=b)
    # first miss-lookup for an unseen batch scans history once and
    # persists the watermark at the head
    assert V._txn_lookup(root, 999, committed_versions(root)) is None
    assert V._read_watermark(root) == 4
    # subsequent miss-lookups must not open any manifest at or below
    # the watermark
    opened = []
    real = V.read_manifest

    def spying(root_, v):
        opened.append(v)
        return real(root_, v)

    V.read_manifest, _ = spying, None
    try:
        assert V._txn_lookup(root, 998, committed_versions(root)) is None
    finally:
        V.read_manifest = real
    assert opened == []


def test_vacuum_prunes_markers_of_dropped_versions(spark, tmp_path):
    """r8 ADVICE: a marker surviving its vacuumed manifest made the
    fast path return a version with no manifest behind it. Vacuum now
    prunes those markers (Delta setTransaction-retention semantics);
    markers of surviving versions stay, so recent-batch replay
    idempotence is untouched."""
    from erkg_tutorials_spark.lakehouse.versioned import _txn_path, vacuum

    root = str(tmp_path / "t")
    for b in range(4):
        write_version(spark.range(b, b + 1), root, "append", batch_id=b)
    assert vacuum(root, keep_versions=2) == [0, 1]
    assert not os.path.exists(_txn_path(root, 0))
    assert not os.path.exists(_txn_path(root, 1))
    assert os.path.exists(_txn_path(root, 2))
    assert os.path.exists(_txn_path(root, 3))
    # surviving batches still replay idempotently
    assert write_version(spark.range(99), root, "append", batch_id=3) == 3
    assert committed_versions(root) == [2, 3]

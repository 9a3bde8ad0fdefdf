"""Versioned-manifest table with snapshot-isolation reads (time
travel) — a minimal Delta/Iceberg-style transaction log over plain
parquet directories.

Layout under a table root:

    <root>/data/v<N>-<uuid>/part-*.parquet  one immutable data dir per commit
    <root>/_manifests/<N>.json        {"version", "parent", "mode",
                                       "files": [relative paths]}

Commit protocol: write the new version's data dir (uuid-suffixed —
concurrent writers never collide on the write path), then publish
the manifest with ``os.link`` — atomic create-if-absent, so exactly
ONE writer wins each version number and the loser raises
``ConcurrentCommitError`` instead of silently replacing the winner
(optimistic concurrency, the Delta log's "manifest-last" rule plus
its conflict check). A reader resolves a version (latest committed,
or AS OF ``n``) to its manifest's FILE LIST and reads only those
files, so:

* snapshot isolation — a concurrent writer never changes any
  committed manifest's file list, so an in-flight read of version n
  is unaffected by version n+1 landing mid-read;
* torn writes are invisible — a crash before the link leaves a
  ``.tmp.<pid>`` the reader never considers, and the orphaned data
  dir is unreferenced (vacuum reclaims it);
* time travel — every committed version stays readable until
  explicitly vacuumed.

``mode='append'`` manifests carry the parent's files plus the new
dir's; ``mode='overwrite'`` carry only the new dir's.

Scale notes (100 TB): the manifest is O(files) driver-side metadata,
like a Delta checkpoint; data files are immutable so reads prune to
the listed files with no directory listing of the table root; commit
cost is one rename regardless of table size. The reference has no
lakehouse layer (its pipeline rereads JSONL inputs, e.g.
/root/reference/dagster_icij/assets.py); this is engine
parity-plus for the batch-ingest lifecycle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the version this writer was claiming.
    The table is intact (the winner's commit is durable; the loser's
    data dir is unreferenced); re-read the log and retry."""


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifests")


def committed_versions(root: str) -> list[int]:
    """Sorted committed version numbers (readers never see .tmp)."""
    try:
        names = os.listdir(_manifest_dir(root))
    except FileNotFoundError:
        return []
    return sorted(
        int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()
    )


def write_version(
    df: DataFrame, root: str, mode: str = "append", batch_id: int | None = None
) -> int:
    """Commit ``df`` as a new version of the table at ``root``;
    returns the committed version number. ``mode='overwrite'``
    replaces the logical content, ``'append'`` adds to it. The
    manifest link is the atomic commit point (create-if-absent).

    ``batch_id`` makes the commit IDEMPOTENT per id — the streaming
    foreachBatch contract: a replayed micro-batch (same id) returns
    the already-committed version without writing, so a sink restart
    can never double-append. Exactly the Delta ``txn`` app-id/version
    dedupe, reduced to one integer."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"versioned table: unknown mode {mode!r}")
    versions = committed_versions(root)
    if batch_id is not None:
        for v in versions:
            m = read_manifest(root, v)
            if m.get("batch_id") == batch_id:
                return v
    n = (versions[-1] + 1) if versions else 0
    parent = versions[-1] if versions else None
    # uuid-suffixed data dir: racing writers never collide on the
    # write path — the manifest link below is the only contended
    # point, and the loser's data dir is unreferenced garbage that
    # vacuum() reclaims
    import uuid

    vdir = f"v{n}-{uuid.uuid4().hex[:8]}"
    data_dir = os.path.join(root, "data", vdir)
    df.write.mode("errorifexists").parquet(data_dir)
    files = sorted(
        os.path.join("data", vdir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    if mode == "append" and parent is not None:
        files = read_manifest(root, parent)["files"] + files
    os.makedirs(_manifest_dir(root), exist_ok=True)
    manifest = {"version": n, "parent": parent, "mode": mode, "files": files}
    if batch_id is not None:
        manifest["batch_id"] = batch_id
    tmp = os.path.join(_manifest_dir(root), f"{n}.json.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    # Optimistic concurrency: claim version n with link(2) — atomic
    # create-if-absent, unlike rename(2), which silently REPLACES an
    # existing target (two racing writers would both "win" n and one
    # commit would be lost). A loser of the race gets EEXIST and
    # raises; callers retry by re-reading the log (Delta's conflict-
    # resolution protocol, reduced to its primitive).
    final = os.path.join(_manifest_dir(root), f"{n}.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise ConcurrentCommitError(
            f"versioned table {root}: version {n} was committed "
            "concurrently; re-read the log and retry"
        ) from None
    finally:
        os.unlink(tmp)
    return n


def read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(root), f"{version}.json")) as fh:
        return json.load(fh)


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read of the table at ``root`` AS OF ``version``
    (default: latest committed). Reads exactly the manifest's file
    list — later commits cannot perturb the returned snapshot."""
    versions = committed_versions(root)
    if not versions:
        raise FileNotFoundError(f"versioned table {root}: no committed version")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(
            f"versioned table {root}: version {version} not committed "
            f"(have {versions})"
        )
    files = [os.path.join(root, f) for f in read_manifest(root, version)["files"]]
    return spark.read.parquet(*files)


def compact(spark: SparkSession, root: str, target_files: int = 1) -> int:
    """Rewrite the LATEST snapshot's content into ``target_files``
    files and commit it as a new overwrite version. Old versions stay
    readable (compaction is just another commit — the Delta OPTIMIZE
    rule); returns the new version number."""
    latest = read_version(spark, root)
    return write_version(latest.coalesce(target_files), root, "overwrite")


def vacuum(root: str, keep_versions: int = 1) -> list[int]:
    """Drop all but the newest ``keep_versions`` manifests and delete
    every data dir no surviving manifest references. Returns the
    removed version numbers. This is the one operation that breaks
    time travel for the dropped versions — by contract, never by
    accident (``keep_versions`` < 1 is rejected)."""
    import shutil

    if keep_versions < 1:
        raise ValueError("vacuum: keep_versions must be >= 1")
    versions = committed_versions(root)
    drop = versions[:-keep_versions]
    survivors = versions[len(drop):]
    referenced = {
        f.split("/")[1]  # data/<vdir>/<file>
        for v in survivors
        for f in read_manifest(root, v)["files"]
    }
    for v in drop:
        os.remove(os.path.join(_manifest_dir(root), f"{v}.json"))
    data_root = os.path.join(root, "data")
    for d in os.listdir(data_root):
        if d not in referenced:
            shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
    return drop

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


def _collect_file_stats(root: str, rel_files: list[str]) -> dict:
    """Per-file min/max zone maps from the parquet footers — a
    driver-side metadata read (no Spark job), the same footer scan the
    commit itself just wrote. Only integer/float columns are statted:
    parquet string statistics may be writer-truncated, and
    timestamp stats don't round-trip JSON — a column without stats is
    simply never prunable, which is conservative by construction.
    Returns {relpath: {col: [min, max]}} (columns with all-null or
    missing stats omitted)."""
    import pyarrow.parquet as pq

    out: dict = {}
    for rel in rel_files:
        md = pq.ParquetFile(os.path.join(root, rel)).metadata
        cols: dict = {}
        unprunable: set = set()
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                name = col.path_in_schema
                if "." in name:  # nested: not prunable here
                    continue
                st = col.statistics
                if st is None:
                    # stats absent but the group may hold data: the
                    # column's true range is unknown -> never prune it
                    unprunable.add(name)
                    continue
                if not st.has_min_max:
                    # an all-null group is fine (nulls never extend
                    # min/max); anything else is unknown range
                    if st.null_count is None or st.null_count != group.num_rows:
                        unprunable.add(name)
                    continue
                lo, hi = st.min, st.max
                if not isinstance(lo, (int, float)) or isinstance(lo, bool):
                    unprunable.add(name)
                    continue
                if name in cols:
                    cols[name] = [min(cols[name][0], lo), max(cols[name][1], hi)]
                else:
                    cols[name] = [lo, hi]
        for name in unprunable:
            cols.pop(name, None)
        # __rows__ rides along so a zero-row file (e.g. an empty
        # partition's part file) is skippable under ANY predicate
        out[rel] = {"__rows__": md.num_rows, **cols}
    return out


def _nullable_schema_json(df: DataFrame) -> str:
    """The commit's schema as JSON, every field forced nullable —
    parquet reads are nullable regardless, and recording it that way
    makes the stored schema a valid read schema verbatim."""
    import json as _json

    from pyspark.sql.types import StructType

    d = _json.loads(df.schema.json())
    for f in d.get("fields", []):
        f["nullable"] = True
    return StructType.fromJson(d).json()


def _check_schema_evolution(
    parent_json: str | None, new_json: str, allow: bool
) -> None:
    """Append-time schema contract: identical is always fine; ADDING
    nullable columns is fine iff ``allow`` (Delta mergeSchema);
    dropping or retyping a column is always an error — old files
    cannot be reinterpreted."""
    import json as _json

    if parent_json is None or parent_json == new_json:
        return
    old = {f["name"]: f["type"] for f in _json.loads(parent_json)["fields"]}
    new = {f["name"]: f["type"] for f in _json.loads(new_json)["fields"]}
    dropped = set(old) - set(new)
    retyped = {c for c in set(old) & set(new) if old[c] != new[c]}
    added = set(new) - set(old)
    if dropped or retyped:
        raise ValueError(
            "versioned table append: incompatible schema change "
            f"(dropped={sorted(dropped)}, retyped={sorted(retyped)}); "
            "commit mode='overwrite' to replace the table schema"
        )
    if added and not allow:
        raise ValueError(
            f"versioned table append adds columns {sorted(added)}; pass "
            "allow_schema_evolution=True to accept (old files read as null)"
        )


def write_version(
    df: DataFrame,
    root: str,
    mode: str = "append",
    batch_id: int | None = None,
    allow_schema_evolution: bool = False,
) -> int:
    """Commit ``df`` as a new version of the table at ``root``;
    returns the committed version number. ``mode='overwrite'``
    replaces the logical content, ``'append'`` adds to it. The
    manifest link is the atomic commit point (create-if-absent).

    ``batch_id`` makes the commit IDEMPOTENT per id — the streaming
    foreachBatch contract: a replayed micro-batch (same id) returns
    the already-committed version without writing, so a sink restart
    can never double-append. Exactly the Delta ``txn`` app-id/version
    dedupe, reduced to one integer.

    Each manifest records its commit's schema; an append that ADDS
    nullable columns is accepted only with
    ``allow_schema_evolution=True`` (reads then serve the new schema,
    old files' missing columns as null — Delta mergeSchema); dropping
    or retyping a column is rejected outright (old files cannot be
    reinterpreted; overwrite instead)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"versioned table: unknown mode {mode!r}")
    versions = committed_versions(root)
    if batch_id is not None:
        v = _txn_lookup(root, batch_id, versions)
        if v is not None:
            return v
    n = (versions[-1] + 1) if versions else 0
    parent = versions[-1] if versions else None
    schema_json = _nullable_schema_json(df)
    if mode == "append" and parent is not None:
        _check_schema_evolution(
            read_manifest(root, parent).get("schema"),
            schema_json,
            allow_schema_evolution,
        )
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
    file_stats = _collect_file_stats(root, files)
    if mode == "append" and parent is not None:
        pm = read_manifest(root, parent)
        files = pm["files"] + files
        # carried files keep their already-computed zone maps
        file_stats = {**pm.get("file_stats", {}), **file_stats}
    os.makedirs(_manifest_dir(root), exist_ok=True)
    manifest = {
        "version": n,
        "parent": parent,
        "mode": mode,
        "files": files,
        "file_stats": file_stats,
        "schema": schema_json,
    }
    if batch_id is not None:
        manifest["batch_id"] = batch_id
    _commit_manifest(root, n, manifest)
    if batch_id is not None:
        _txn_record(root, batch_id, n)
    return n


def _txn_dir(root: str) -> str:
    return os.path.join(root, "_txns")


def _txn_path(root: str, batch_id: int) -> str:
    return os.path.join(_txn_dir(root), f"{batch_id}.json")


def _txn_record(root: str, batch_id: int, version: int) -> None:
    """Materialize the ``batch_id -> version`` marker consulted by
    :func:`_txn_lookup`. Written right after the manifest link wins,
    so the marker never claims a commit that didn't happen."""
    os.makedirs(_txn_dir(root), exist_ok=True)
    tmp = _txn_path(root, batch_id) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, _txn_path(root, batch_id))


def _watermark_path(root: str) -> str:
    return os.path.join(_txn_dir(root), "_repair_watermark.json")


def _read_watermark(root: str) -> int:
    try:
        with open(_watermark_path(root)) as fh:
            return int(json.load(fh)["version"])
    except (FileNotFoundError, json.JSONDecodeError, KeyError, ValueError):
        return -1


def _write_watermark(root: str, version: int) -> None:
    # monotone: a racing scan that finished at an older head must not
    # roll the mark back (a low mark only costs re-scanning, but keep
    # the invariant tight anyway)
    if version <= _read_watermark(root):
        return
    os.makedirs(_txn_dir(root), exist_ok=True)
    tmp = _watermark_path(root) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, _watermark_path(root))


def _txn_lookup(root: str, batch_id: int, versions: list[int]) -> int | None:
    """Idempotency check for the foreachBatch replay contract in O(1)
    on the common path: one stat of the ``_txns/<batch_id>.json``
    marker instead of re-reading every committed manifest (which made
    a streaming run O(V^2) in driver file reads — the exact cost Delta
    avoids with its per-app txn actions). On a marker miss, a
    newest-first REPAIR scan materializes any marker lost in the crash
    window between manifest link and marker write.

    The scan is bounded by a persisted repair WATERMARK rather than by
    "stop at the first marked manifest" (the r8 scheme): with more
    than one writer/stream committing batch_id-bearing versions, a
    second writer's marked commit can land ABOVE a crashed commit's
    unmarked manifest, and an early stop would miss it and let the
    replay double-commit (r8 ADVICE). Every version <= watermark is
    guaranteed marker-consistent (its manifest was read and its marker
    materialized by a previous scan), so each miss-scan only reads the
    manifests committed since the last scan — amortized O(1) per
    commit, multi-writer safe."""
    try:
        with open(_txn_path(root, batch_id)) as fh:
            return json.load(fh)["version"]
    except (FileNotFoundError, json.JSONDecodeError, KeyError):
        pass
    wm = _read_watermark(root)
    found = None
    for v in reversed(versions):
        if v <= wm:
            break
        m = read_manifest(root, v)
        b = m.get("batch_id")
        if b is None:
            continue
        if not os.path.exists(_txn_path(root, b)):
            _txn_record(root, b, v)
        if b == batch_id and found is None:
            found = v  # newest-first: first hit is the newest commit
    if versions:
        _write_watermark(root, versions[-1])
    return found


def _commit_manifest(root: str, n: int, manifest: dict) -> None:
    """The one safety-critical block, shared by every commit path
    (write_version and merge_into). Optimistic concurrency: claim
    version n with link(2) — atomic create-if-absent, unlike
    rename(2), which silently REPLACES an existing target (two racing
    writers would both "win" n and one commit would be lost). A loser
    of the race gets EEXIST and raises ConcurrentCommitError; callers
    retry by re-reading the log (Delta's conflict-resolution protocol,
    reduced to its primitive)."""
    os.makedirs(_manifest_dir(root), exist_ok=True)
    tmp = os.path.join(_manifest_dir(root), f"{n}.json.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
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
    m = read_manifest(root, version)
    return _read_files(spark, root, m, m["files"])


def _read_files(
    spark: SparkSession, root: str, manifest: dict, rel_files: list[str]
) -> DataFrame:
    """Read a manifest's files with its COMMITTED schema: columns an
    older file lacks (additive evolution) come back null, and no
    footer-inference job runs. Legacy manifests (no recorded schema)
    fall back to inference. Every snapshot/pruned/merge-candidate read
    goes through here so mixed-schema file sets are never
    mis-inferred from one arbitrary footer."""
    files = [os.path.join(root, f) for f in rel_files]
    if manifest.get("schema"):
        from pyspark.sql.types import StructType

        return spark.read.schema(
            StructType.fromJson(json.loads(manifest["schema"]))
        ).parquet(*files)
    return spark.read.parquet(*files)


def read_version_pruned(
    spark: SparkSession,
    root: str,
    intervals: dict[str, tuple],
    version: int | None = None,
) -> tuple[DataFrame, dict]:
    """Snapshot read with MANIFEST-LEVEL data skipping: ``intervals``
    maps column -> (lo, hi) (either bound may be None = unbounded); a
    file is read only if its committed zone map intersects every
    constrained interval. Files without a zone map for a constrained
    column are always read — skipping is conservative by construction,
    so the result equals the unpruned read filtered to the same
    predicate (pinned by tests). This is Delta/Iceberg file skipping
    through the transaction log: at 100 TB the planner drops files
    from a driver-side metadata map before Spark ever lists or opens
    them, on top of (not instead of) parquet row-group pruning.

    Returns ``(df, report)`` where report =
    ``{"files_total", "files_read", "files_skipped"}``. The returned
    frame still carries the residual filter — skipping only removes
    whole files; in-file rows outside the interval are filtered by
    the pushed-down predicate as usual.
    """
    from pyspark.sql import functions as F

    versions = committed_versions(root)
    if not versions:
        raise FileNotFoundError(f"versioned table {root}: no committed version")
    if version is None:
        version = versions[-1]
    m = read_manifest(root, version)
    stats = m.get("file_stats", {})
    kept = []
    for f in m["files"]:
        fs = stats.get(f, {})
        keep = fs.get("__rows__") != 0
        for col, (lo, hi) in intervals.items():
            if not keep:
                break
            if col not in fs:
                continue  # no zone map -> cannot skip
            fmin, fmax = fs[col]
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                keep = False
                break
        if keep:
            kept.append(f)
    report = {
        "files_total": len(m["files"]),
        "files_read": len(kept),
        "files_skipped": len(m["files"]) - len(kept),
    }
    if not kept:
        empty = read_version(spark, root, version).limit(0)
        return empty, report
    df = _read_files(spark, root, m, kept)
    cond = F.lit(True)
    for col, (lo, hi) in intervals.items():
        if lo is not None:
            cond = cond & (F.col(col) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(col) <= F.lit(hi))
    return df.where(cond), report


def merge_into(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    on: str | list[str],
    when_matched_delete: str | None = None,
    when_matched_update: bool | str = True,
    when_not_matched_insert: bool = True,
    batch_id: int | None = None,
) -> dict:
    """Delta-style MERGE INTO the latest snapshot, committing the
    result as a new version. Semantics (evaluated per target row
    against at most one source row):

    * WHEN MATCHED AND ``when_matched_delete`` (a SQL boolean over the
      SOURCE row image) → the target row is deleted;
    * WHEN MATCHED (and ``when_matched_update``) → the target row is
      replaced by the source row; pass a SQL boolean string instead of
      True for Delta's ``WHEN MATCHED AND <cond> THEN UPDATE``: the
      expression may reference ``source.<col>`` and ``target.<col>``
      row images (e.g. ``"source.ts >= target.ts"`` makes an upsert
      MONOTONE — an out-of-order older source row can never overwrite
      a newer target row); a condition evaluating to NULL means "don't
      update", and a matched row failing the condition is carried
      unchanged;
    * WHEN NOT MATCHED (and ``when_not_matched_insert``) → the source
      row is inserted;
    * target rows with no source match are carried unchanged.

    A source with two rows for one key is ambiguous — rejected up
    front with ``ValueError`` (the Delta MERGE cardinality rule), not
    resolved arbitrarily. The source lineage is evaluated several
    times (cardinality check, key envelope, discovery, the write) —
    callers whose source is expensive to recompute should persist it
    first (the streaming CDC sink does).

    Scale design: the merge REWRITES ONLY TOUCHED FILES. Matched keys
    are located with one semi-join against ``input_file_name()``; the
    untouched files (at 100 TB, almost all of them) are carried into
    the new manifest by reference, so merge cost is
    O(touched data + source), never O(table). This is the Delta/
    Iceberg copy-on-write MERGE file-pruning strategy; the manifest's
    ``replaced`` field records exactly which files were rewritten.
    Conflict rule: the merge is computed against the parent snapshot,
    so the version claim is parent+1 via the same atomic link — if a
    concurrent commit wins that number, the merge raises
    ``ConcurrentCommitError`` rather than publishing a result derived
    from a stale snapshot.

    Returns ``{"version", "files_total", "files_rewritten",
    "rows_updated", "rows_deleted", "rows_inserted",
    "rows_rewritten_unchanged"}``.
    """
    import uuid

    from pyspark.sql import functions as F

    keys = [on] if isinstance(on, str) else list(on)
    versions = committed_versions(root)
    if not versions:
        raise FileNotFoundError(f"versioned table {root}: no committed version")
    if batch_id is not None:
        # the write_version foreachBatch contract, extended to merges:
        # a replayed micro-batch (same id) returns the already-
        # committed merge's stats without recomputing or re-writing —
        # streaming CDC upserts become exactly-once under restart
        v = _txn_lookup(root, batch_id, versions)
        if v is not None:
            try:
                return {"version": v, **read_manifest(root, v).get("stats", {})}
            except FileNotFoundError:  # vacuumed since — commit still counted
                return {"version": v}
    parent = versions[-1]
    parent_manifest = read_manifest(root, parent)
    parent_files = parent_manifest["files"]
    parent_snapshot = read_version(spark, root, parent)
    target_cols = parent_snapshot.columns
    missing = set(target_cols) - set(source.columns)
    if missing:
        raise ValueError(f"merge source is missing target columns: {sorted(missing)}")
    source = source.select(*target_cols)
    # type enforcement: a drifted source type would write rewrite files
    # the COMMITTED read schema can no longer open (the merge would
    # succeed and brick the head version) — reject up front
    target_types = dict(parent_snapshot.dtypes)
    drift = {
        c: (s, target_types[c])
        for c, s in source.dtypes
        if s != target_types[c]
    }
    if drift:
        raise ValueError(
            "merge source column types differ from the table's "
            f"(source, table): {drift} — cast the source first"
        )

    dup = (
        source.groupBy(*keys)
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        key_repr = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"merge source has multiple rows for key {key_repr} — "
            "MERGE requires at most one source row per target key"
        )

    # Locate the files holding matched keys. Discovery is itself
    # zone-map-pruned: files whose committed key range cannot
    # intersect the source key envelope are never scanned, so on a
    # key-clustered table the discovery scan is O(candidate files),
    # not O(table) — at 100 TB this is the difference between reading
    # the key column of every file and of the touched slice only. A
    # file without a zone map for the key is always a candidate
    # (conservative), and multi-column keys fall back to scanning all
    # files.
    zone_maps = parent_manifest.get("file_stats", {})
    candidates = parent_files
    if len(keys) == 1 and zone_maps:
        k = keys[0]
        env = source.agg(
            F.min(k).alias("lo"),
            F.max(k).alias("hi"),
            # zone maps never cover nulls: a null-keyed source row can
            # match a null-keyed target row in ANY file, so envelope
            # pruning is only sound when the source has no null keys
            (F.count(F.lit(1)) - F.count(k)).alias("n_null"),
        ).collect()[0]
        if env["lo"] is not None and env["n_null"] == 0:
            lo, hi = env["lo"], env["hi"]
            if isinstance(lo, (int, float)) and not isinstance(lo, bool):
                candidates = []
                for f in parent_files:
                    fs = zone_maps.get(f, {})
                    if fs.get("__rows__") == 0:
                        continue  # empty file: nothing to match
                    if k not in fs:
                        candidates.append(f)  # unknown range: must scan
                        continue
                    fmin, fmax = fs[k]
                    if not (fmin > hi or fmax < lo):
                        candidates.append(f)
    files_scanned = len(candidates)
    if candidates:
        target = _read_files(
            spark, root, parent_manifest, candidates
        ).withColumn("_file", F.input_file_name())
        # null-SAFE discovery: the merge join below matches on
        # eqNullSafe, so discovery must too — a null-keyed target row
        # is touched by a null-keyed source row
        src_keys = source.select(
            *[F.col(k).alias(f"_sk_{k}") for k in keys]
        ).distinct()
        semi_cond = [target[k].eqNullSafe(src_keys[f"_sk_{k}"]) for k in keys]
        touched_uris = [
            r["_file"]
            for r in target.join(
                F.broadcast(src_keys), on=semi_cond, how="left_semi"
            )
            .select("_file")
            .distinct()
            .collect()
        ]
    else:
        target = parent_snapshot.withColumn("_file", F.lit(None).cast("string"))
        touched_uris = []
    # input_file_name() returns a URI; match manifest entries by their
    # "<vdir>/<file>" suffix, which is unique within the table.
    touched_suffixes = {"/".join(u.split("/")[-2:]) for u in touched_uris}
    touched = [f for f in parent_files if "/".join(f.split("/")[-2:]) in touched_suffixes]
    touched_set = set(touched)
    kept = [f for f in parent_files if f not in touched_set]
    kept_set = set(kept)

    if touched:
        rewrite_rows = _read_files(spark, root, parent_manifest, touched)
    else:
        rewrite_rows = spark.createDataFrame([], target.drop("_file").schema)

    # coalesce: a predicate evaluating to SQL NULL must mean "don't
    # delete", not "source row absent" — _s_delete doubles as the
    # source-presence marker below, so it must never be null
    delete_col = (
        F.coalesce(F.expr(when_matched_delete), F.lit(False))
        if when_matched_delete is not None
        else F.lit(False)
    )
    # presence markers (non-null literals) rather than key-nullness:
    # correct even for tables whose key columns hold genuine nulls
    src = source.withColumn("_s_delete", delete_col).select(
        *[F.col(c).alias(f"_s_{c}") for c in target_cols], "_s_delete"
    )
    tgt = rewrite_rows.withColumn("_t_present", F.lit(True))
    cond = [tgt[k].eqNullSafe(src[f"_s_{k}"]) for k in keys]
    joined = tgt.join(src, on=cond, how="full_outer")
    matched = src["_s_delete"].isNotNull() & tgt["_t_present"].isNotNull()
    src_only = tgt["_t_present"].isNull()
    if isinstance(when_matched_update, str):
        # conditional update over the two row images; struct columns
        # give the expression the source./target. namespaces and keep
        # evaluation inside codegen. NULL -> don't update.
        clash = {"source", "target"} & set(target_cols)
        if clash:
            raise ValueError(
                f"conditional merge: table columns {sorted(clash)} shadow "
                "the source./target. image namespaces"
            )
        joined = (
            joined.withColumn(
                "source",
                F.struct(*[src[f"_s_{c}"].alias(c) for c in target_cols]),
            )
            .withColumn(
                "target",
                F.struct(*[tgt[c].alias(c) for c in target_cols]),
            )
            .withColumn(
                "_upd_cond",
                F.coalesce(F.expr(when_matched_update), F.lit(False)),
            )
            .drop("source", "target")
        )
        update_action = F.when(F.col("_upd_cond"), F.lit("U")).otherwise(
            F.lit("T")
        )
    else:
        update_action = F.lit("U" if when_matched_update else "T")
    action = (
        F.when(matched & F.col("_s_delete").eqNullSafe(F.lit(True)), F.lit("D"))
        .when(matched, update_action)
        .when(src_only, F.lit("I" if when_not_matched_insert else "X"))
        .otherwise(F.lit("T"))  # target-only: carry unchanged
    )
    take_source = F.col("_action").isin("U", "I")
    from pyspark.sql import Observation

    # observe BEFORE the delete filter so deleted rows are countable;
    # the metrics ride the same write pass (no extra job)
    obs = Observation(f"merge-{uuid.uuid4().hex[:8]}")
    merged = (
        joined.withColumn("_action", action)
        .observe(
            obs,
            F.sum((F.col("_action") == "U").cast("long")).alias("updated"),
            F.sum((F.col("_action") == "I").cast("long")).alias("inserted"),
            F.sum((F.col("_action") == "T").cast("long")).alias("carried"),
            F.sum((F.col("_action") == "D").cast("long")).alias("deleted"),
        )
        .where(~F.col("_action").isin("D", "X"))
        .select(
            *[
                F.when(take_source, src[f"_s_{c}"]).otherwise(tgt[c]).alias(c)
                for c in target_cols
            ],
            "_action",
        )
    )

    n = parent + 1
    vdir = f"v{n}-{uuid.uuid4().hex[:8]}"
    data_dir = os.path.join(root, "data", vdir)
    merged.drop("_action").write.mode("errorifexists").parquet(data_dir)
    stats_raw = obs.get
    new_files = sorted(
        os.path.join("data", vdir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    stats = {
        "version": n,
        "files_total": len(parent_files),
        "files_scanned_for_discovery": files_scanned,
        "files_rewritten": len(touched),
        "rows_updated": int(stats_raw["updated"] or 0),
        "rows_inserted": int(stats_raw["inserted"] or 0),
        "rows_deleted": int(stats_raw["deleted"] or 0),
        "rows_rewritten_unchanged": int(stats_raw["carried"] or 0),
    }
    parent_stats = parent_manifest.get("file_stats", {})
    manifest = {
        "version": n,
        "parent": parent,
        "mode": "merge",
        # a merge never changes the table schema; carry the parent's
        "schema": parent_manifest.get("schema"),
        "files": kept + new_files,
        "replaced": touched,
        "stats": {k: v for k, v in stats.items() if k != "version"},
        "file_stats": {
            **{f: s for f, s in parent_stats.items() if f in kept_set},
            **_collect_file_stats(root, new_files),
        },
    }
    if batch_id is not None:
        manifest["batch_id"] = batch_id
    _commit_manifest(root, n, manifest)
    if batch_id is not None:
        _txn_record(root, batch_id, n)
    return stats


def table_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int,
    on: str | list[str],
) -> DataFrame:
    """Change data feed between two committed versions: the row-level
    diff keyed on ``on``, one output row per change with a
    ``_change_type`` column in (``insert``, ``delete``,
    ``update_preimage``, ``update_postimage``) — Delta CDF semantics
    computed from the two snapshots. An update emits BOTH images.

    Scale: one full-outer join on the key between the two snapshots;
    unchanged rows (the overwhelming majority at 100 TB) are filtered
    by a null-safe struct comparison inside codegen before the
    explode, so the emitted feed is O(changes), not O(table).

    Across a schema-evolution boundary the feed serves the
    DESTINATION version's schema (Delta CDF convention): columns
    added by ``to_version`` read as null in the old images, so a row
    whose only change is a newly added column IS reported; columns
    dropped by a narrowing overwrite don't exist in the feed and
    cannot contribute to change detection.
    """
    from pyspark.sql import functions as F

    keys = [on] if isinstance(on, str) else list(on)
    new = read_version(spark, root, to_version)
    cols = new.columns
    nonkey = [c for c in cols if c not in keys]
    new_types = dict(new.dtypes)
    old_raw = read_version(spark, root, from_version)
    old = old_raw.select(
        *[
            F.col(c)
            if c in old_raw.columns
            else F.lit(None).cast(new_types[c]).alias(c)
            for c in cols
        ]
    )
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.struct(*[F.col(c) for c in nonkey]).alias("_o"),
    )
    nw = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        F.struct(*[F.col(c) for c in nonkey]).alias("_n"),
    )
    cond = [o[k].eqNullSafe(nw[f"_nk_{k}"]) for k in keys]
    j = o.join(nw, on=cond, how="full_outer")
    in_old = o[keys[0]].isNotNull() | o["_o"].isNotNull()
    in_new = nw[f"_nk_{keys[0]}"].isNotNull() | nw["_n"].isNotNull()
    # (presence is detected via the struct side being non-null, which
    # a full-outer join guarantees exactly on the present side, even
    # when key columns are legitimately null-valued). Filter unchanged
    # rows FIRST — it keeps the feed O(changes) and means the images
    # expression below never needs an empty-array branch.
    changed = j.where(~(in_old & in_new & F.col("_o").eqNullSafe(F.col("_n"))))
    images = (
        F.when(~in_new, F.array(F.struct(F.lit("delete").alias("_change_type"), F.col("_o").alias("_img"))))
        .when(~in_old, F.array(F.struct(F.lit("insert").alias("_change_type"), F.col("_n").alias("_img"))))
        .otherwise(
            F.array(
                F.struct(F.lit("update_preimage").alias("_change_type"), F.col("_o").alias("_img")),
                F.struct(F.lit("update_postimage").alias("_change_type"), F.col("_n").alias("_img")),
            )
        )
    )
    exploded = changed.select(
        *[F.coalesce(o[k], nw[f"_nk_{k}"]).alias(k) for k in keys],
        F.explode(images).alias("_c"),
    )
    return exploded.select(
        *keys,
        *[F.col(f"_c._img.{c}").alias(c) for c in nonkey],
        F.col("_c._change_type").alias("_change_type"),
        F.lit(from_version).cast("long").alias("_from_version"),
        F.lit(to_version).cast("long").alias("_to_version"),
    )


def compact(spark: SparkSession, root: str, target_files: int = 1) -> int:
    """Rewrite the LATEST snapshot's content into ``target_files``
    files and commit it as a new overwrite version. Old versions stay
    readable (compaction is just another commit — the Delta OPTIMIZE
    rule); returns the new version number."""
    latest = read_version(spark, root)
    return write_version(latest.coalesce(target_files), root, "overwrite")


def vacuum(
    root: str, keep_versions: int = 1, retention_seconds: float = 0.0
) -> list[int]:
    """Drop all but the newest ``keep_versions`` manifests and delete
    every data dir no surviving manifest references. Returns the
    removed version numbers. This is the one operation that breaks
    time travel for the dropped versions — by contract, never by
    accident (``keep_versions`` < 1 is rejected).

    ``retention_seconds`` is Delta's vacuum retention rule: an
    unreferenced data dir YOUNGER than the threshold is skipped,
    because it may belong to an in-flight writer whose uuid data dir
    lands before its manifest link — reclaiming it mid-commit would
    publish a manifest whose files are gone. The default of 0 suits
    single-writer tables (every test/demo here); any deployment with
    concurrent writers should pass a threshold comfortably above the
    longest write-to-commit gap (Delta defaults to 7 days).

    ``_txns`` markers whose version is dropped are pruned with it
    (r8 ADVICE: a surviving stale marker would make write_version's
    fast path return a version whose manifest no longer exists).
    Delta's setTransaction-retention semantics apply: pruning the
    marker forfeits replay idempotence for THAT batch — safe because
    the foreachBatch replay window only ever covers the newest
    batches, whose versions vacuum keeps (``keep_versions`` >= 1 and
    the head always survives); a replay of a vacuumed-away batch only
    happens if the stream's checkpoint was deleted, where reprocessing
    is expected."""
    import shutil
    import time

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
    # prune markers AFTER their manifests are removed: a crash between
    # the two steps must leave a stale marker (harmless, re-pruned next
    # vacuum), never a missing marker for a still-live manifest (which
    # would let a replay double-commit that batch)
    dropped_set = set(drop)
    try:
        marker_files = os.listdir(_txn_dir(root))
    except FileNotFoundError:
        marker_files = []
    for mf in marker_files:
        if not mf.endswith(".json") or mf.startswith("_") or ".tmp." in mf:
            continue
        path = os.path.join(_txn_dir(root), mf)
        try:
            with open(path) as fh:
                mv = int(json.load(fh)["version"])
        except (OSError, json.JSONDecodeError, KeyError, ValueError):
            continue
        if mv in dropped_set:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
    data_root = os.path.join(root, "data")
    try:
        candidates = os.listdir(data_root)
    except FileNotFoundError:  # all-empty-commit table: no data/ yet
        candidates = []
    cutoff = time.time() - retention_seconds
    for d in candidates:
        p = os.path.join(data_root, d)
        if d in referenced:
            continue
        try:
            if retention_seconds > 0 and os.stat(p).st_mtime > cutoff:
                continue  # possibly an in-flight writer's dir
        except FileNotFoundError:
            continue
        shutil.rmtree(p, ignore_errors=True)
    return drop

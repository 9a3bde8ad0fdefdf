"""MERGE INTO + change data feed over the versioned-manifest table
(lakehouse/versioned.py): merge semantics per action arm, the Delta
cardinality rule, file-pruned rewrite (untouched files carried by
reference), optimistic concurrency on the merge commit, and the
CDF/merge reconciliation invariant (applying the feed to the old
snapshot reproduces the new one exactly)."""

import pytest

from pyspark.sql import functions as F

from erkg_tutorials_spark.lakehouse.versioned import (
    ConcurrentCommitError,
    merge_into,
    read_manifest,
    read_version,
    table_changes,
    write_version,
)


def _base(spark, root, n=100, files=4):
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.concat(F.lit("row-"), F.col("id")).alias("tag"),
        )
        .repartitionByRange(files, "k")
    )
    write_version(df, root, "overwrite")
    return df


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_update_insert_delete_semantics(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=20, files=2)
    # source: update k in {3, 4} (v -> 999), delete k=5, insert k=100
    source = spark.createDataFrame(
        [(3, 999, "upd-3"), (4, 999, "upd-4"), (5, 0, "del-5"), (100, 1, "new")],
        "k long, v long, tag string",
    )
    stats = merge_into(
        spark, root, source, on="k", when_matched_delete="v = 0"
    )
    assert stats["rows_updated"] == 2
    assert stats["rows_inserted"] == 1
    assert stats["rows_deleted"] == 1
    out = {r["k"]: (r["v"], r["tag"]) for r in read_version(spark, root).collect()}
    assert 5 not in out                      # deleted
    assert out[3] == (999, "upd-3")          # updated from source image
    assert out[4] == (999, "upd-4")
    assert out[100] == (1, "new")            # inserted
    assert out[7] == (70, "row-7")           # untouched row carried
    assert len(out) == 20  # 20 - 1 delete + 1 insert


def test_merge_conditional_update_is_monotone(spark, tmp_path):
    """WHEN MATCHED AND <cond> THEN UPDATE: an out-of-order OLDER
    source image must not overwrite a newer target row — the property
    that makes streaming CDC upserts batch-order independent."""
    root = str(tmp_path / "t")
    write_version(
        spark.createDataFrame(
            [(1, 100, "new"), (2, 50, "mid")], "k long, ts long, tag string"
        ),
        root,
        "overwrite",
    )
    # late batch: k=1 older (skip), k=2 newer (update), k=3 unseen (insert)
    late = spark.createDataFrame(
        [(1, 10, "stale"), (2, 60, "fresh"), (3, 5, "ins")],
        "k long, ts long, tag string",
    )
    stats = merge_into(
        spark, root, late, on="k", when_matched_update="source.ts >= target.ts"
    )
    assert stats["rows_updated"] == 1
    assert stats["rows_inserted"] == 1
    out = {r["k"]: (r["ts"], r["tag"]) for r in read_version(spark, root).collect()}
    assert out[1] == (100, "new")   # stale image rejected
    assert out[2] == (60, "fresh")  # newer image applied
    assert out[3] == (5, "ins")


def test_merge_conditional_update_null_means_no_update(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, 100, "keep")], "k long, ts long, tag string"),
        root,
        "overwrite",
    )
    src = spark.createDataFrame(
        [(1, None, "null-ts")], "k long, ts long, tag string"
    )
    stats = merge_into(
        spark, root, src, on="k", when_matched_update="source.ts >= target.ts"
    )
    assert stats["rows_updated"] == 0
    assert read_version(spark, root).collect()[0]["tag"] == "keep"


def test_merge_conditional_update_namespace_clash_rejected(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, 2)], "k long, source long"), root, "overwrite"
    )
    with pytest.raises(ValueError, match="shadow"):
        merge_into(
            spark,
            root,
            spark.createDataFrame([(1, 3)], "k long, source long"),
            on="k",
            when_matched_update="source.source > target.source",
        )


def test_merge_cardinality_violation_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=10, files=1)
    dup = spark.createDataFrame(
        [(3, 1, "a"), (3, 2, "b")], "k long, v long, tag string"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(spark, root, dup, on="k")
    # the failed merge must not have committed anything
    assert read_manifest(root, 0)["version"] == 0
    assert read_version(spark, root).count() == 10


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=100, files=4)  # range-partitioned: k 0..24, 25..49, ...
    m0 = read_manifest(root, 0)
    # all source keys live in the first range file
    source = spark.createDataFrame(
        [(1, -1, "u1"), (2, -2, "u2")], "k long, v long, tag string"
    )
    stats = merge_into(spark, root, source, on="k")
    assert stats["files_total"] == len(m0["files"])
    assert 1 <= stats["files_rewritten"] < len(m0["files"])
    m1 = read_manifest(root, 1)
    assert m1["mode"] == "merge"
    # untouched parent files are carried into the child BY REFERENCE
    kept = set(m0["files"]) - set(m1["replaced"])
    assert kept and kept < set(m1["files"])
    assert set(m1["replaced"]) <= set(m0["files"])
    # content is still exactly right
    out = {r["k"]: r["v"] for r in read_version(spark, root).collect()}
    assert out[1] == -1 and out[2] == -2 and out[99] == 990
    assert len(out) == 100


def test_merge_pure_insert_touches_no_files(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=10, files=2)
    m0 = read_manifest(root, 0)
    source = spark.createDataFrame([(500, 5, "new")], "k long, v long, tag string")
    stats = merge_into(spark, root, source, on="k")
    assert stats["files_rewritten"] == 0
    m1 = read_manifest(root, 1)
    assert set(m0["files"]) < set(m1["files"])  # all parent files kept
    assert read_version(spark, root).count() == 11


def test_merge_insert_disabled_and_update_disabled(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=10, files=1)
    source = spark.createDataFrame(
        [(3, 999, "upd"), (100, 1, "new")], "k long, v long, tag string"
    )
    merge_into(
        spark, root, source, on="k",
        when_matched_update=False, when_not_matched_insert=False,
    )
    out = {r["k"]: r["v"] for r in read_version(spark, root).collect()}
    assert out[3] == 30 and 100 not in out and len(out) == 10


def test_merge_conflicts_with_concurrent_commit(spark, tmp_path, monkeypatch):
    import erkg_tutorials_spark.lakehouse.versioned as V

    root = str(tmp_path / "t")
    _base(spark, root, n=10, files=1)
    source = spark.createDataFrame([(3, 9, "u")], "k long, v long, tag string")

    # land a competing commit between the merge's snapshot read and its
    # manifest link by hooking the data-dir listing step
    real_listdir = V.os.listdir
    fired = {"done": False}

    def racing_listdir(path):
        if "data/v1-" in str(path).replace("\\", "/") and not fired["done"]:
            fired["done"] = True
            write_version(spark.range(3).selectExpr(
                "id as k", "id as v", "'x' as tag"), root, "append")
        return real_listdir(path)

    monkeypatch.setattr(V.os, "listdir", racing_listdir)
    with pytest.raises(ConcurrentCommitError):
        merge_into(spark, root, source, on="k")
    # winner's commit is intact; the loser published nothing
    assert read_version(spark, root).count() == 13
    assert read_manifest(root, 1)["mode"] == "append"


def test_table_changes_matches_merge_and_reapplies(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=30, files=2)
    source = spark.createDataFrame(
        [(3, 999, "u3"), (7, 999, "u7"), (9, 0, "d9"), (200, 1, "n")],
        "k long, v long, tag string",
    )
    merge_into(spark, root, source, on="k", when_matched_delete="v = 0")
    cdf = table_changes(spark, root, 0, 1, on="k")
    by_type = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {
        "delete": 1, "insert": 1,
        "update_preimage": 2, "update_postimage": 2,
    }
    # reconciliation: old snapshot + feed == new snapshot, exactly
    old = read_version(spark, root, 0)
    new = read_version(spark, root, 1)
    feed = cdf.select("k", "v", "tag", "_change_type")
    removed = feed.where(F.col("_change_type").isin("delete", "update_preimage"))
    added = feed.where(F.col("_change_type").isin("insert", "update_postimage"))
    reapplied = (
        old.exceptAll(removed.drop("_change_type"))
        .unionByName(added.drop("_change_type"))
    )
    assert _rows(reapplied) == _rows(new)
    # pre/post images carry the correct values
    pre = {r["k"]: r["v"] for r in cdf.where("_change_type = 'update_preimage'").collect()}
    post = {r["k"]: r["v"] for r in cdf.where("_change_type = 'update_postimage'").collect()}
    assert pre == {3: 30, 7: 70} and post == {3: 999, 7: 999}


def test_table_changes_empty_diff_between_identical_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _base(spark, root, n=10, files=1)
    write_version(df, root, "overwrite")  # identical content, new version
    assert table_changes(spark, root, 0, 1, on="k").count() == 0


def test_merge_batch_id_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=10, files=1)
    source = spark.createDataFrame(
        [(3, 999, "u"), (100, 1, "n")], "k long, v long, tag string"
    )
    s1 = merge_into(spark, root, source, on="k", batch_id=7)
    # replay the same micro-batch: no new commit, same stats returned
    s2 = merge_into(spark, root, source, on="k", batch_id=7)
    assert s1["version"] == s2["version"] == 1
    assert s2["rows_updated"] == 1 and s2["rows_inserted"] == 1
    from erkg_tutorials_spark.lakehouse.versioned import committed_versions
    assert committed_versions(root) == [0, 1]
    # a DIFFERENT batch id still commits
    s3 = merge_into(spark, root, source, on="k", batch_id=8)
    assert s3["version"] == 2


def test_file_stats_recorded_and_carried(spark, tmp_path):
    from erkg_tutorials_spark.lakehouse.versioned import merge_into as _mi

    root = str(tmp_path / "t")
    _base(spark, root, n=100, files=4)
    m0 = read_manifest(root, 0)
    assert set(m0["file_stats"]) == set(m0["files"])
    nonempty = [s for s in m0["file_stats"].values() if s["__rows__"] > 0]
    ranges = sorted(s["k"] for s in nonempty)
    assert ranges[0][0] == 0 and ranges[-1][1] == 99
    # string column has no zone map (writer-truncation hazard); ints do
    assert all("tag" not in s and "v" in s for s in nonempty)
    # append: carried files keep their maps, new file gets one
    write_version(
        spark.createDataFrame([(500, 1, "x")], "k long, v long, tag string"),
        root, "append",
    )
    m1 = read_manifest(root, 1)
    assert set(m1["file_stats"]) == set(m1["files"])
    # merge: kept files keep maps, rewritten dir re-statted
    _mi(spark, root, spark.createDataFrame(
        [(1, -5, "u")], "k long, v long, tag string"), on="k")
    m2 = read_manifest(root, 2)
    assert set(m2["file_stats"]) == set(m2["files"])
    rewritten = [f for f in m2["files"] if f.startswith("data/v2-")]
    assert any(m2["file_stats"][f]["v"][0] == -5 for f in rewritten)


def test_pruned_read_skips_files_and_matches_filter(spark, tmp_path):
    from erkg_tutorials_spark.lakehouse.versioned import read_version_pruned

    root = str(tmp_path / "t")
    _base(spark, root, n=100, files=4)  # ranges ~[0,24][25,49][50,74][75,99]
    df, report = read_version_pruned(spark, root, {"k": (30, 40)})
    assert report["files_total"] == 4
    assert report["files_skipped"] >= 2  # at most 2 range files overlap
    expected = read_version(spark, root).where("k >= 30 and k <= 40")
    assert _rows(df) == _rows(expected)
    # open bounds
    df2, rep2 = read_version_pruned(spark, root, {"k": (90, None)})
    assert rep2["files_read"] == 1 and df2.count() == 10
    # disjoint interval -> zero files, empty frame with the same schema
    df3, rep3 = read_version_pruned(spark, root, {"k": (1000, 2000)})
    assert rep3["files_read"] == 0 and df3.count() == 0
    assert df3.columns == expected.columns


def test_pruned_read_is_conservative_without_zone_map(spark, tmp_path):
    from erkg_tutorials_spark.lakehouse.versioned import read_version_pruned

    root = str(tmp_path / "t")
    _base(spark, root, n=40, files=2)
    # 'tag' is a string column: no zone map, so no file can be skipped,
    # but the residual filter still applies
    df, report = read_version_pruned(spark, root, {"tag": ("row-3", "row-4")})
    assert report["files_skipped"] == 0
    assert _rows(df) == _rows(
        read_version(spark, root).where("tag >= 'row-3' and tag <= 'row-4'")
    )


def test_merge_discovery_is_zone_map_pruned(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=100, files=4)
    # batch confined to the first range file's key envelope
    source = spark.createDataFrame(
        [(2, -2, "u"), (4, -4, "u")], "k long, v long, tag string"
    )
    stats = merge_into(spark, root, source, on="k")
    assert stats["files_scanned_for_discovery"] < stats["files_total"]
    assert stats["files_rewritten"] <= stats["files_scanned_for_discovery"]
    out = {r["k"]: r["v"] for r in read_version(spark, root).collect()}
    assert out[2] == -2 and out[4] == -4 and out[99] == 990 and len(out) == 100
    # envelope fully outside every zone map: pure insert, zero scans
    ins = spark.createDataFrame([(10_000, 1, "n")], "k long, v long, tag string")
    s2 = merge_into(spark, root, ins, on="k")
    assert s2["files_scanned_for_discovery"] == 0
    assert s2["files_rewritten"] == 0
    assert read_version(spark, root).count() == 101


def test_schema_evolution_additive_append(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, 10)], "k long, v long"), root, "overwrite"
    )
    wider = spark.createDataFrame([(2, 20, "x")], "k long, v long, extra string")
    # adding a column requires explicit opt-in
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        write_version(wider, root, "append")
    write_version(wider, root, "append", allow_schema_evolution=True)
    out = read_version(spark, root)
    assert out.columns == ["k", "v", "extra"]
    rows = {r["k"]: r["extra"] for r in out.collect()}
    assert rows == {1: None, 2: "x"}  # old file's missing column -> null
    # the old snapshot still serves its own (narrower) schema
    assert read_version(spark, root, 0).columns == ["k", "v"]


def test_schema_evolution_rejects_drop_and_retype(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, 10)], "k long, v long"), root, "overwrite"
    )
    with pytest.raises(ValueError, match="dropped"):
        write_version(
            spark.createDataFrame([(2,)], "k long"), root, "append",
            allow_schema_evolution=True,
        )
    with pytest.raises(ValueError, match="retyped"):
        write_version(
            spark.createDataFrame([(2, "s")], "k long, v string"), root,
            "append", allow_schema_evolution=True,
        )
    # overwrite always may change the schema
    write_version(spark.createDataFrame([(2, "s")], "k long, v string"),
                  root, "overwrite")
    assert read_version(spark, root).collect()[0]["v"] == "s"


def test_merge_after_schema_evolution_reads_mixed_files(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        root, "overwrite",
    )
    write_version(
        spark.createDataFrame([(3, 30, "x")], "k long, v long, extra string"),
        root, "append", allow_schema_evolution=True,
    )
    # merge touches BOTH the old (2-col) and new (3-col) files; the
    # committed read schema keeps them aligned
    source = spark.createDataFrame(
        [(1, -1, "u1"), (3, -3, "u3")], "k long, v long, extra string"
    )
    merge_into(spark, root, source, on="k")
    out = {r["k"]: (r["v"], r["extra"]) for r in read_version(spark, root).collect()}
    assert out == {1: (-1, "u1"), 2: (20, None), 3: (-3, "u3")}


# --- model-based property test with MERGE in the command set ----------
#
# Random sequences of overwrite / merge commands against a pure-Python
# dict model of the keyed table. After the sequence: every version's
# snapshot matches the model, and table_changes between every
# consecutive pair reconciles the model diff exactly (per change type).

from hypothesis import given, settings
from hypothesis import strategies as st

_DEL = -999  # sentinel: merge rows with v = _DEL request deletion

_merge_cmd = st.dictionaries(
    st.integers(min_value=0, max_value=9),              # key
    st.one_of(st.just(_DEL), st.integers(min_value=0, max_value=50)),
    min_size=1, max_size=4,
)
_over_cmd = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=50),
    min_size=1, max_size=4,
)
_cmd = st.one_of(
    st.tuples(st.just("merge"), _merge_cmd),
    st.tuples(st.just("overwrite"), _over_cmd),
)


@settings(max_examples=6, deadline=None)
@given(st.lists(_cmd, min_size=1, max_size=4))
def test_merge_log_matches_model(spark, tmp_path_factory, cmds):
    root = str(tmp_path_factory.mktemp("mlog") / "t")
    write_version(
        spark.createDataFrame([(0, 0), (1, 10)], "k long, v long"),
        root, "overwrite",
    )
    model: list[dict[int, int]] = [{0: 0, 1: 10}]
    for mode, spec in cmds:
        cur = dict(model[-1])
        if mode == "overwrite":
            cur = dict(spec)
            write_version(
                spark.createDataFrame(list(spec.items()), "k long, v long"),
                root, "overwrite",
            )
        else:
            for k, v in spec.items():
                if k in cur:
                    if v == _DEL:
                        del cur[k]
                    else:
                        cur[k] = v
                elif v != _DEL:
                    cur[k] = v
                else:
                    cur[k] = _DEL  # unmatched delete-request row INSERTS
            merge_into(
                spark, root,
                spark.createDataFrame(list(spec.items()), "k long, v long"),
                on="k", when_matched_delete=f"v = {_DEL}",
            )
        model.append(cur)
    for v, expect in enumerate(model):
        got = {r["k"]: r["v"] for r in read_version(spark, root, v).collect()}
        assert got == expect, (v, cmds)
    # CDF reconciles each hop's model diff exactly
    for v in range(1, len(model)):
        old, new = model[v - 1], model[v]
        expect_counts = {
            "insert": len(set(new) - set(old)),
            "delete": len(set(old) - set(new)),
            "update_preimage": len(
                {k for k in set(old) & set(new) if old[k] != new[k]}
            ),
        }
        expect_counts["update_postimage"] = expect_counts["update_preimage"]
        got_counts = {
            r["_change_type"]: r["n"]
            for r in table_changes(spark, root, v - 1, v, on="k")
            .groupBy("_change_type").agg(F.count("*").alias("n")).collect()
        }
        for ct, n in expect_counts.items():
            assert got_counts.get(ct, 0) == n, (v, ct, cmds)


def test_merge_null_delete_predicate_falls_through_to_update(spark, tmp_path):
    """A when_matched_delete predicate evaluating to SQL NULL must mean
    'don't delete' (Delta falls through to the UPDATE clause), not
    'source row absent'."""
    root = str(tmp_path / "t")
    _base(spark, root, n=5, files=1)
    source = spark.createDataFrame(
        [(3, None, "upd-null")], "k long, v long, tag string"
    )
    stats = merge_into(spark, root, source, on="k", when_matched_delete="v = 0")
    assert stats["rows_updated"] == 1 and stats["rows_deleted"] == 0
    out = {r["k"]: (r["v"], r["tag"]) for r in read_version(spark, root).collect()}
    assert out[3] == (None, "upd-null")
    assert len(out) == 5


def test_merge_null_key_updates_not_duplicates(spark, tmp_path):
    """Null-keyed rows: discovery must be null-SAFE like the merge join
    itself, or the null-key source row inserts a duplicate."""
    root = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(None, 1, "old"), (7, 70, "r7")],
                              "k long, v long, tag string"),
        root, "overwrite",
    )
    source = spark.createDataFrame([(None, 2, "new")], "k long, v long, tag string")
    stats = merge_into(spark, root, source, on="k")
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 0
    rows = read_version(spark, root).collect()
    assert len(rows) == 2
    null_rows = [r for r in rows if r["k"] is None]
    assert len(null_rows) == 1 and null_rows[0]["v"] == 2


def test_merge_rejects_source_type_drift(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, n=5, files=1)
    drifted = spark.createDataFrame([(3, 1.5, "x")], "k long, v double, tag string")
    with pytest.raises(ValueError, match="types differ"):
        merge_into(spark, root, drifted, on="k")
    # nothing committed; table still readable
    assert read_version(spark, root).count() == 5


def test_table_changes_serves_destination_schema(spark, tmp_path):
    """CDF across an additive evolution: a change visible ONLY in the
    added column must be reported (feed serves the destination
    version's schema, old images null in the new column)."""
    root = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        root, "overwrite",
    )
    write_version(
        spark.createDataFrame([(1, 10, "x"), (2, 20, None)],
                              "k long, v long, extra string"),
        root, "overwrite",
    )
    cdf = table_changes(spark, root, 0, 1, on="k")
    by = {(r["k"], r["_change_type"]): r for r in cdf.collect()}
    # k=1: only 'extra' changed (null -> 'x') — must be an update pair
    assert (1, "update_preimage") in by and (1, "update_postimage") in by
    assert by[(1, "update_preimage")]["extra"] is None
    assert by[(1, "update_postimage")]["extra"] == "x"
    # k=2: extra null -> null, v unchanged — NOT a change
    assert not any(k == 2 for k, _ in by)
    assert "extra" in cdf.columns


def test_vacuum_after_merge_keeps_referenced_parent_files(spark, tmp_path):
    """A merge manifest references most of its PARENT's data dirs (the
    untouched files); vacuuming the parent version must drop its
    manifest but keep every dir the merge still points to."""
    import os

    from erkg_tutorials_spark.lakehouse.versioned import vacuum

    root = str(tmp_path / "t")
    _base(spark, root, n=100, files=4)
    merge_into(
        spark, root,
        spark.createDataFrame([(1, -1, "u")], "k long, v long, tag string"),
        on="k",
    )
    dropped = vacuum(root, keep_versions=1)
    assert dropped == [0]
    # the merged head still reads completely: 100 rows, update applied
    out = {r["k"]: r["v"] for r in read_version(spark, root).collect()}
    assert len(out) == 100 and out[1] == -1 and out[99] == 990
    # every file the surviving manifest lists still exists on disk
    m = read_manifest(root, 1)
    assert all(os.path.exists(os.path.join(root, f)) for f in m["files"])


def test_monotone_merge_is_batch_order_independent(spark, tmp_path):
    """Property behind stream_cdc_upsert: splitting a row set into
    batches in ANY order and merging each with the monotone condition
    yields the same final state as the global per-key argmax."""
    import random

    rng = random.Random(88)
    rows = [
        (k, rng.randint(0, 5), i, f"tag{i}")
        for i, k in enumerate(rng.choices(range(6), k=24))
    ]  # (k, ts, uid, tag); uid is the unique tiebreaker
    expect = {}
    for k, ts, uid, tag in rows:
        if k not in expect or (ts, uid) > (expect[k][0], expect[k][1]):
            expect[k] = (ts, uid, tag)

    for trial in range(3):
        shuffled = rows[:]
        rng.shuffle(shuffled)
        batches = [shuffled[i::4] for i in range(4)]  # 4 interleaved batches
        root = str(tmp_path / f"t{trial}")
        write_version(
            spark.createDataFrame([], "k long, ts long, uid long, tag string"),
            root,
            "overwrite",
        )
        for batch in batches:
            if not batch:
                continue
            # per-batch argmax reduce (what the sink does), then merge
            best = {}
            for k, ts, uid, tag in batch:
                if k not in best or (ts, uid) > (best[k][0], best[k][1]):
                    best[k] = (ts, uid, tag)
            src = spark.createDataFrame(
                [(k, *v) for k, v in best.items()],
                "k long, ts long, uid long, tag string",
            )
            merge_into(
                spark,
                root,
                src,
                on="k",
                when_matched_update=(
                    "source.ts > target.ts OR "
                    "(source.ts = target.ts AND source.uid >= target.uid)"
                ),
            )
        got = {
            r["k"]: (r["ts"], r["uid"], r["tag"])
            for r in read_version(spark, root).collect()
        }
        assert got == expect, (trial, got, expect)

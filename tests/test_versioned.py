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
    assert all(f.startswith("data/v2/") for f in m2["files"])  # overwrite resets
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

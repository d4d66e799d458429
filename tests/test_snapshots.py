"""Snapshot manifests (storage.py): pinned file sets survive appends,
version listing/selection, missing-file detection after rewrites,
vacuum semantics (kept + never-snapshotted files untouched)."""

from __future__ import annotations

import glob
import os

import pytest

from zx_spark.storage import (
    list_snapshots,
    read_snapshot,
    snapshot_store,
    vacuum_snapshots,
)


def _write(spark, path, rows, mode="append"):
    # one part file per write: the removal/backup tests pick files by glob
    spark.createDataFrame(rows, "k long, v string").coalesce(1).write.mode(
        mode
    ).parquet(path)


def test_snapshot_pins_file_set_across_appends(spark, tmp_path):
    p = str(tmp_path / "store")
    _write(spark, p, [(1, "a"), (2, "b")])
    v1 = snapshot_store(p)
    _write(spark, p, [(3, "c")])
    v2 = snapshot_store(p)
    _write(spark, p, [(4, "d")])  # never snapshotted

    assert list_snapshots(p) == [v1, v2] == [1, 2]
    assert {r["k"] for r in read_snapshot(spark, p, v1).collect()} == {1, 2}
    assert {r["k"] for r in read_snapshot(spark, p, v2).collect()} == {1, 2, 3}
    # latest by default; live read sees everything
    assert {r["k"] for r in read_snapshot(spark, p).collect()} == {1, 2, 3}
    assert spark.read.parquet(p).count() == 4


def test_snapshot_partitioned_store_keeps_partition_cols(spark, tmp_path):
    p = str(tmp_path / "part")
    spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], "k long, v string, part string"
    ).write.partitionBy("part").parquet(p)
    v = snapshot_store(p)
    snap = read_snapshot(spark, p, v)
    assert "part" in snap.columns
    assert {r["part"] for r in snap.collect()} == {"a", "b"}


def test_missing_files_detected(spark, tmp_path):
    p = str(tmp_path / "gone")
    _write(spark, p, [(1, "a")])
    v = snapshot_store(p)
    for f in glob.glob(f"{p}/*.parquet"):
        os.remove(f)
    with pytest.raises(ValueError, match="missing files"):
        read_snapshot(spark, p, v)
    with pytest.raises(ValueError, match="no snapshots"):
        read_snapshot(spark, str(tmp_path / "never"), None)


def test_vacuum_drops_only_dead_files(spark, tmp_path):
    p = str(tmp_path / "vac")
    _write(spark, p, [(1, "a")])
    snapshot_store(p)  # v1: file set A
    _write(spark, p, [(2, "b")])
    snapshot_store(p)  # v2: A+B
    _write(spark, p, [(3, "c")])
    snapshot_store(p)  # v3: A+B+C
    _write(spark, p, [(4, "d")])  # in-flight, no snapshot

    res = vacuum_snapshots(p, keep=2)
    assert res["manifests_dropped"] == 1 and res["kept_versions"] == [2, 3]
    # v1's files are all still referenced by v2/v3 -> nothing removed
    assert res["files_removed"] == 0
    assert list_snapshots(p) == [2, 3]
    # kept snapshots still read; live data intact (incl. in-flight append)
    assert {r["k"] for r in read_snapshot(spark, p, 2).collect()} == {1, 2}
    assert spark.read.parquet(p).count() == 4
    with pytest.raises(ValueError):
        vacuum_snapshots(p, keep=0)


def test_vacuum_removes_files_only_old_manifests_reference(spark, tmp_path):
    p = str(tmp_path / "vac2")
    _write(spark, p, [(1, "a")])
    snapshot_store(p)  # v1 references file A
    # simulate a rewrite that replaced A: drop A, write B, snapshot
    for f in glob.glob(f"{p}/*.parquet"):
        os.remove(f)
    _write(spark, p, [(2, "b")])
    snapshot_store(p)  # v2 references only B
    res = vacuum_snapshots(p, keep=1)
    assert res["manifests_dropped"] == 1
    assert res["files_removed"] == 0  # A already gone; nothing else dead
    assert {r["k"] for r in read_snapshot(spark, p).collect()} == {2}


def test_vacuum_actually_removes_dead_file(spark, tmp_path):
    import shutil

    p = str(tmp_path / "vac3")
    _write(spark, p, [(1, "a")])
    v1 = snapshot_store(p)  # v1 references file A
    a = glob.glob(f"{p}/*.parquet")[0]
    backup = str(tmp_path / "a.bak")
    shutil.copy(a, backup)
    os.remove(a)  # simulate a rewrite that replaced A (Spark overwrite
    # mode would also clobber _manifests/ -- documented: snapshot stores
    # are append-only; rewrites go through the maintenance ops)
    _write(spark, p, [(2, "b")])
    v2 = snapshot_store(p)  # references only B
    # put A back on disk: now present but referenced ONLY by the old v1
    restored = os.path.join(p, os.path.basename(a))
    shutil.copy(backup, restored)
    res = vacuum_snapshots(p, keep=1)
    assert res["manifests_dropped"] == 1
    assert res["files_removed"] == 1  # A: referenced only by dropped v1
    assert not os.path.exists(restored)
    assert {r["k"] for r in read_snapshot(spark, p, v2).collect()} == {2}

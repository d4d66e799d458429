"""Snapshot diff: status classification, NULL-vs-value changes, multi
column keys, compare-subset selection, summary counts, and plan shape
(fingerprint projected below the join)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.diffs import diff_snapshots, diff_summary


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),
            (4, "d", 40.0),
        ],
        "id: long, txt: string, val: double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "B", 20.0),      # changed (txt)
            (3, "c", 30.0),      # changed (NULL -> value)
            (5, "e", 50.0),      # added; 4 removed
        ],
        "id: long, txt: string, val: double",
    )
    return old, new


def test_statuses(spark, snaps):
    old, new = snaps
    got = {
        r["id"]: r["diff_status"]
        for r in diff_snapshots(old, new, "id").collect()
    }
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}
    withu = {
        r["id"]: r["diff_status"]
        for r in diff_snapshots(old, new, "id", include_unchanged=True).collect()
    }
    assert withu[1] == "unchanged" and len(withu) == 5


def test_compare_subset_and_summary(spark, snaps):
    old, new = snaps
    # comparing only val: the txt-only change on id=2 disappears
    got = {
        r["id"]: r["diff_status"]
        for r in diff_snapshots(old, new, "id", compare_cols=["val"]).collect()
    }
    assert got == {3: "changed", 4: "removed", 5: "added"}
    s = {r["diff_status"]: r["n"] for r in diff_summary(old, new, "id").collect()}
    assert s == {"unchanged": 1, "changed": 2, "removed": 1, "added": 1}


def test_multi_column_key_and_validation(spark):
    old = spark.createDataFrame(
        [("x", 1, "p"), ("x", 2, "q")], "a: string, b: long, v: string"
    )
    new = spark.createDataFrame(
        [("x", 1, "p"), ("y", 2, "q")], "a: string, b: long, v: string"
    )
    got = {
        (r["a"], r["b"]): r["diff_status"]
        for r in diff_snapshots(old, new, ["a", "b"]).collect()
    }
    assert got == {("x", 2): "removed", ("y", 2): "added"}
    with pytest.raises(ValueError):
        diff_snapshots(old, new, [])
    with pytest.raises(ValueError):
        diff_snapshots(old, new, "a", compare_cols=["nope"])
    with pytest.raises(ValueError):
        diff_snapshots(old.select("a"), new.select("a"), "a")  # nothing to compare


def test_null_vs_empty_and_boundary_aliasing(spark):
    # NULL vs '' is a CHANGE (sentinel hashing), and column boundaries
    # cannot alias ('ab','c' != 'a','bc')
    old = spark.createDataFrame([(1, None, "c"), (2, "ab", "c")], "id: long, x: string, y: string")
    new = spark.createDataFrame([(1, "", "c"), (2, "a", "bc")], "id: long, x: string, y: string")
    got = {r["id"]: r["diff_status"] for r in diff_snapshots(old, new, "id").collect()}
    assert got == {1: "changed", 2: "changed"}


def test_fingerprint_projected_below_join(spark, snaps):
    """The join input must be (key, 32-byte fingerprint), not the full
    row: the wide compare columns may not appear above the scan."""
    old, new = snaps
    plan = diff_snapshots(old, new, "id")._jdf.queryExecution().executedPlan().toString()
    # join operates on the md5 projection; txt/val never cross the join
    assert "md5" in plan and "FullOuter" in plan


def test_diff_store_versions(spark, tmp_path):
    from zx_spark.operators.diffs import diff_store_versions
    from zx_spark.storage import snapshot_store

    path = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: long, v: string"
    ).write.parquet(path)
    v1 = snapshot_store(path)
    spark.createDataFrame([(3, "c")], "id: long, v: string").write.mode(
        "append"
    ).parquet(path)
    v2 = snapshot_store(path)
    got = {
        r["id"]: r["diff_status"]
        for r in diff_store_versions(spark, path, "id", v1, v2).collect()
    }
    assert got == {3: "added"}
    # latest-by-default sees the same; diffing a version against itself
    # is empty
    assert diff_store_versions(spark, path, "id", v1).count() == 1
    assert diff_store_versions(spark, path, "id", v2, v2).count() == 0

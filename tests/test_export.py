"""Training-shard export: balance, determinism, hash-order shuffle,
manifest integrity, subset reads, and the Python twin of both the shard
assignment (analytic 48-bit ranges) and the in-shard order."""

from __future__ import annotations

import hashlib

import pytest

from zx_spark.export import (
    read_shard_manifest,
    read_training_shards,
    write_training_shards,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    from zx_spark.storage import read_table

    return read_table(spark, SF, "documents").select("doc_id", "text", "source")


def _py_hash(key, seed):
    return hashlib.md5(f"{key}:{seed}".encode()).hexdigest()


def _py_shard(key, seed, n):
    return (int(_py_hash(key, seed)[:12], 16) * n) >> 48


def test_shards_balanced_assigned_and_ordered_like_python_twin(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    m = write_training_shards(docs, path, n_shards=8, key_col="doc_id", seed=3)
    assert m["n_rows"] == 500 and m["n_shards"] == 8
    counts = [s["rows"] for s in m["shards"]]
    assert sum(counts) == 500 and len(counts) == 8
    assert max(counts) <= 3 * max(min(counts), 1)  # uniform-hash balance
    assert read_shard_manifest(path) == m
    for s in m["shards"]:
        rows = read_training_shards(spark, path, [s["shard"]]).collect()
        ks = [r["doc_id"] for r in rows]
        # exact analytic shard assignment == Python twin
        assert all(_py_shard(k, 3, 8) == s["shard"] for k in ks), s["shard"]
        # in-shard order is the (hash, key) order
        assert ks == sorted(ks, key=lambda k: (_py_hash(k, 3), k))
        # partition column survives
        assert all(r["shard"] == s["shard"] for r in rows)
    covered = {k for s in m["shards"] for k in (
        r["doc_id"] for r in read_training_shards(spark, path, [s["shard"]]).collect())}
    assert len(covered) == 500  # disjoint + exhaustive


def test_export_deterministic_and_seed_reshuffles(spark, docs, tmp_path):
    p1, p2, p3 = (str(tmp_path / n) for n in ("a", "b", "c"))
    m1 = write_training_shards(docs, p1, 4, "doc_id", seed=7)
    m2 = write_training_shards(docs, p2, 4, "doc_id", seed=7)
    assert [s["rows"] for s in m1["shards"]] == [s["rows"] for s in m2["shards"]]
    o1 = [r["doc_id"] for r in read_training_shards(spark, p1, [0]).collect()]
    o2 = [r["doc_id"] for r in read_training_shards(spark, p2, [0]).collect()]
    assert o1 == o2  # same seed -> byte-identical layout
    write_training_shards(docs, p3, 4, "doc_id", seed=8)
    o3 = [r["doc_id"] for r in read_training_shards(spark, p3, [0]).collect()]
    assert o1 != o3  # new seed -> fresh epoch shuffle


def test_subset_reads_and_validation(spark, docs, tmp_path):
    path = str(tmp_path / "s")
    m = write_training_shards(docs, path, 5, "doc_id")
    by = {s["shard"]: s["rows"] for s in m["shards"]}
    two = read_training_shards(spark, path, [0, 3])
    assert two.count() == by[0] + by[3]
    assert read_training_shards(spark, path).count() == 500
    with pytest.raises(ValueError):
        read_training_shards(spark, path, [99])
    with pytest.raises(ValueError):
        write_training_shards(docs, path, 0, "doc_id")
    with pytest.raises(ValueError, match="local"):
        write_training_shards(docs, "s3://bucket/x", 4, "doc_id")


def test_file_uri_export_writes_manifest(spark, docs, tmp_path):
    """ADVICE r5: file:// URIs passed _require_local but the manifest
    glob/open treated 'file:' as a literal directory — the shard write
    succeeded, then the manifest step found zero shards and crashed.
    The scheme must be stripped for every local I/O call."""
    import os

    plain = str(tmp_path / "viauri")
    m = write_training_shards(docs, "file://" + plain, 4, "doc_id", seed=1)
    assert m["n_rows"] == 500 and len(m["shards"]) == 4
    assert os.path.exists(os.path.join(plain, "_shards.json"))
    # manifest reads accept both spellings
    assert read_shard_manifest("file://" + plain) == read_shard_manifest(plain) == m
    assert read_training_shards(spark, "file://" + plain, [0]).count() == m["shards"][0]["rows"]
    with pytest.raises(ValueError, match="absolute"):
        write_training_shards(docs, "file://relative/x", 4, "doc_id")

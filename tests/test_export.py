"""Training-shard export: balance, determinism, hash-order shuffle,
manifest integrity, subset reads, and the Python twin of the global
order."""

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


def test_shards_balanced_ordered_and_manifested(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    m = write_training_shards(docs, path, n_shards=8, key_col="doc_id", seed=3)
    assert m["n_rows"] == 500 and m["n_shards"] == 8
    counts = [s["rows"] for s in m["shards"]]
    assert sum(counts) == 500
    assert max(counts) <= 2.5 * min(counts)  # range split balances
    assert read_shard_manifest(path) == m
    # global order across shards == Python md5 order; within-shard
    # order is the same key order
    got = []
    for s in m["shards"]:
        rows = read_training_shards(spark, path, [s["shard"]]).collect()
        got.extend(r["doc_id"] for r in rows)
    want = sorted((r["doc_id"] for r in docs.collect()),
                  key=lambda k: (_py_hash(k, 3), k))
    # shard files are range-ordered but rows within a collect() may not
    # preserve file order — sort each shard's slice by the hash to check
    # the SPLIT; then check within-shard order separately
    assert sorted(got) == sorted(want)
    ends = []
    for s in m["shards"]:
        ks = [r["doc_id"] for r in read_training_shards(spark, path, [s["shard"]]).collect()]
        assert ks == sorted(ks, key=lambda k: (_py_hash(k, 3), k))  # in-shard order
        if ks:
            ends.append((_py_hash(ks[0], 3), _py_hash(ks[-1], 3)))
    # shards are disjoint hash RANGES in file order
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ends, ends[1:]):
        assert a_hi <= b_lo


def test_export_deterministic_and_seed_reshuffles(spark, docs, tmp_path):
    p1, p2, p3 = (str(tmp_path / n) for n in ("a", "b", "c"))
    m1 = write_training_shards(docs, p1, 4, "doc_id", seed=7)
    m2 = write_training_shards(docs, p2, 4, "doc_id", seed=7)
    assert [s["rows"] for s in m1["shards"]] == [s["rows"] for s in m2["shards"]]
    o1 = [r["doc_id"] for r in read_training_shards(spark, p1, [0]).collect()]
    o2 = [r["doc_id"] for r in read_training_shards(spark, p2, [0]).collect()]
    assert o1 == o2  # same seed -> byte-identical order
    write_training_shards(docs, p3, 4, "doc_id", seed=8)
    o3 = [r["doc_id"] for r in read_training_shards(spark, p3, [0]).collect()]
    assert o1 != o3  # new seed -> fresh epoch shuffle


def test_subset_reads_and_validation(spark, docs, tmp_path):
    path = str(tmp_path / "s")
    m = write_training_shards(docs, path, 5, "doc_id")
    two = read_training_shards(spark, path, [0, 3])
    assert two.count() == m["shards"][0]["rows"] + m["shards"][3]["rows"]
    assert read_training_shards(spark, path).count() == 500
    with pytest.raises(ValueError):
        read_training_shards(spark, path, [99])
    with pytest.raises(ValueError):
        write_training_shards(docs, path, 0, "doc_id")

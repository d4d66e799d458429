"""Streaming vector-index maintenance: availableNow drain over the
driver embeddings equals the batch-built IVF store; queries served from
the streamed store match the batch path; replayed epochs and re-sent
ids do not duplicate the index; the cell filter still prunes."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.similarity import (
    cosine_topk,
    ivf_build_lloyd,
    ivf_topk,
    pq_train,
)
from zx_spark.streaming.vectors import read_vector_index, vector_index_sink

SF = "/root/testdata/sf0.01"
N_CELLS = 4
QUERY = [1.0] + [0.0] * 63


@pytest.fixture(scope="module")
def vecs(spark):
    from zx_spark.storage import read_table

    return read_table(spark, SF, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def model(vecs):
    assigned, centers = ivf_build_lloyd(vecs, n_cells=N_CELLS, iters=3)
    return assigned, [[float(x) for x in c] for c in centers]


def _drain(spark, vecs, centers, dst, ck, src_dir, codebooks=None, **kw):
    stream = (
        spark.readStream.format("parquet")
        .schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    q = vector_index_sink(
        stream, dst, centers, codebooks=codebooks,
        checkpoint_dir=ck, available_now=True, **kw
    )
    q.awaitTermination(120)


def test_streamed_store_equals_batch_assignment(spark, vecs, model, tmp_path):
    assigned, centers = model
    src = str(tmp_path / "src")
    # three files -> three micro-batches
    vecs.filter("vec_id % 3 = 0").coalesce(1).write.parquet(src)
    vecs.filter("vec_id % 3 = 1").coalesce(1).write.mode("append").parquet(src)
    vecs.filter("vec_id % 3 = 2").coalesce(1).write.mode("append").parquet(src)
    dst = str(tmp_path / "store")
    _drain(spark, vecs, centers, dst, str(tmp_path / "ck"), src)
    got = read_vector_index(spark, dst)
    want = {
        (r["vec_id"], r["ivf_cell"]) for r in assigned.select("vec_id", "ivf_cell").collect()
    }
    assert {(r["vec_id"], r["ivf_cell"]) for r in got.collect()} == want
    # serving parity: ivf_topk over the streamed store == batch path
    g = ivf_topk(got, centers, QUERY, k=10, nprobe=N_CELLS)
    b = ivf_topk(assigned, centers, QUERY, k=10, nprobe=N_CELLS)
    assert [tuple(r) for r in g.collect()] == [tuple(r) for r in b.collect()]
    # cell filter prunes partitions in the streamed layout
    plan = (
        got.filter(F.col("ivf_cell") == 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_epoch_replay_and_resent_ids_are_idempotent(spark, vecs, model, tmp_path):
    _, centers = model
    dst = str(tmp_path / "store2")
    src = str(tmp_path / "src2")
    sub = vecs.filter("vec_id < 40")
    sub.coalesce(1).write.parquet(src)
    _drain(spark, vecs, centers, dst, str(tmp_path / "ck2a"), src)
    # re-sent ids in a LATER epoch (fresh checkpoint, same ids): the
    # dedupe read keeps one row per id
    sub.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, vecs, centers, dst, str(tmp_path / "ck2b"), src)
    epochs = [d for d in os.listdir(dst) if d.startswith("epoch=")]
    assert len(epochs) >= 2
    got = read_vector_index(spark, dst)
    assert got.count() == 40
    assert got.groupBy("vec_id").count().filter("count > 1").count() == 0
    raw = read_vector_index(spark, dst, dedupe=False)
    assert raw.count() > 40  # duplicates exist on disk, reader resolves


def test_streamed_pq_store_serves_adc(spark, vecs, model, tmp_path):
    assigned, centers = model
    cb = pq_train(vecs, m=8, k=8, iters=2)
    src = str(tmp_path / "src3")
    vecs.coalesce(1).write.parquet(src)
    dst = str(tmp_path / "store3")
    _drain(
        spark, vecs, centers, dst, str(tmp_path / "ck3"), src,
        codebooks=cb, keep_vectors=True,
    )
    got = read_vector_index(spark, dst)
    assert set(["vec_id", "pq_codes", "ivf_cell", "embedding"]) <= set(got.columns)
    from zx_spark.operators.similarity import ivfpq_topk

    # full probe + full shortlist -> exact by construction (the recall
    # trade-off itself is pinned in test_llm_pipeline); here we verify
    # the STREAMED store serves the composition correctly
    g = ivfpq_topk(
        got, got, centers, cb, QUERY, k_results=5,
        nprobe=N_CELLS, shortlist=600, vectors_cell_col="ivf_cell",
    )
    b = cosine_topk(vecs, QUERY, k=5)
    assert [r["vec_id"] for r in g.collect()] == [r["vec_id"] for r in b.collect()]

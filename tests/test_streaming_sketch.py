"""Streaming count-min sketch (streaming/sketch.py): the drained
epoch-merged model equals the batch sketch on the same data exactly
(disjoint halves), double delivery doubles counters (at-least-once is
visible, replay-overwrite is not), and mixed geometries fail fast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zx_spark.operators.cms import cms_build, cms_estimate_py, cms_merge
from zx_spark.streaming.sketch import cms_sink, read_cms_model

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    from zx_spark.storage import read_table

    return read_table(spark, SF, "documents").select("doc_id", "lang")


def _drain(spark, docs, src, dst, ck):
    stream = (
        spark.readStream.format("parquet")
        .schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = cms_sink(
        stream, "lang", dst, width=64, depth=3,
        checkpoint_dir=ck, available_now=True,
    )
    q.awaitTermination(180)


def test_drained_model_equals_batch(spark, docs, tmp_path):
    """Two disjoint halves streamed file-by-file → epoch-merged model
    == the one-pass batch sketch on the full frame, counter for
    counter; estimates identical for every lang."""
    src, dst, ck = str(tmp_path / "src"), str(tmp_path / "store"), str(tmp_path / "ck")
    docs.filter(F.col("doc_id") % 2 == 0).repartition(1).write.parquet(
        src, mode="append"
    )
    docs.filter(F.col("doc_id") % 2 == 1).repartition(1).write.parquet(
        src, mode="append"
    )
    _drain(spark, docs, src, dst, ck)
    streamed = read_cms_model(spark, dst)
    batch = cms_build(docs, "lang", width=64, depth=3)
    assert streamed == batch
    for r in docs.select("lang").distinct().collect():
        if r["lang"] is not None:
            assert cms_estimate_py(streamed, r["lang"]) == cms_estimate_py(
                batch, r["lang"]
            )


def test_double_delivery_doubles_counters(spark, docs, tmp_path):
    """The same rows delivered twice (two staged copies) double every
    counter — sketch(A)+sketch(A) == 2·sketch(A). At-least-once
    delivery is VISIBLE in a frequency sketch (unlike the dedup'd
    ingest paths); epoch replay-overwrite idempotency is what the sink
    guarantees, not content dedup."""
    sub = docs.filter(F.col("doc_id") % 7 == 0)
    src, dst, ck = str(tmp_path / "src2"), str(tmp_path / "store2"), str(tmp_path / "ck2")
    sub.repartition(1).write.parquet(src, mode="append")
    sub.repartition(1).write.parquet(src, mode="append")
    _drain(spark, docs, src, dst, ck)
    streamed = read_cms_model(spark, dst)
    once = cms_build(sub, "lang", width=64, depth=3)
    assert streamed == cms_merge(once, once)


def test_mixed_geometry_fails_fast(spark, docs, tmp_path):
    sub = docs.limit(50)
    p = str(tmp_path / "store3")
    rows64 = [(0, 1, 5, 64, 3)]
    rows32 = [(0, 1, 5, 32, 3)]
    schema = "row int, bkt int, c long, width int, depth int"
    spark.createDataFrame(rows64, schema).write.parquet(f"{p}/epoch=0")
    spark.createDataFrame(rows32, schema).write.parquet(f"{p}/epoch=1")
    with pytest.raises(ValueError, match="geometries"):
        read_cms_model(spark, p)

"""Streaming retention: the emitted (user, cohort, bucket) pairs,
aggregated, equal the batch retention grid under time-ordered batches;
re-delivered buckets emit once; validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.funnel import retention_cohorts
from zx_spark.streaming.retention import streaming_retention_pairs

SF = "/root/testdata/sf0.01"
BUCKET = 86400.0


def _drain(spark, src, tmp_path, name, **kw):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_retention_pairs(stream, bucket_s=BUCKET, watermark=None, **kw)
    from tests.conftest import drain_memory_sink

    return drain_memory_sink(out, name, str(tmp_path / f"ck_{name}"))


def test_streamed_pairs_aggregate_to_batch_grid(spark, tmp_path):
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("double").alias("ts")
    )
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    c1 = mn + (mx - mn) / 2
    src = str(tmp_path / "src")
    ev.filter(F.col("ts") < c1).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts") >= c1).coalesce(1).write.mode("append").parquet(src)
    from tests.conftest import pin_file_mtimes_by_event_time

    pin_file_mtimes_by_event_time(src)

    pairs = _drain(spark, src, tmp_path, "ret_pairs")
    # no duplicate (user, bucket) emits
    assert (
        pairs.groupBy("user_id", "bucket").count().filter("count > 1").count() == 0
    )
    got = {
        (r["cohort_bucket"] * BUCKET, r["offset"]): r["n"]
        for r in pairs.groupBy("cohort_bucket", "offset")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r["cohort_start"], r["offset"]): r["n_active"]
        for r in retention_cohorts(ev, bucket_s=BUCKET).collect()
    }
    assert got == want and len(want) > 5


def test_validation(spark, tmp_path):
    src = str(tmp_path / "v")
    spark.createDataFrame([(1, 1.0)], "user_id: long, ts: double").write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    with pytest.raises(ValueError):
        streaming_retention_pairs(stream, bucket_s=0)
    with pytest.raises(ValueError):
        streaming_retention_pairs(stream, max_tracked_buckets=0)

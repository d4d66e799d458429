"""Streaming co-occurrence twin: the drained sink aggregated per pair
must equal the batch operator when distinct items fit the cap; each
pair is emitted at most once per group even across micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.basket import cooccurrence_pairs
from zx_spark.streaming.basket import streaming_cooccurrence

SF = "/root/testdata/sf0.01"


def _drain(spark, src, tmp_path, name, **kw):
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    out = streaming_cooccurrence(stream, **kw)
    from tests.conftest import drain_memory_sink

    return drain_memory_sink(out, name, str(tmp_path / f"ck_{name}"))


def test_drained_support_equals_batch(spark, tmp_path):
    """Multi-batch drain (one file per trigger) aggregated per pair ==
    cooccurrence_pairs: pairs never double-emit when a group's items
    arrive spread across micro-batches."""
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events").select(
        F.col("user_id").cast("string").alias("g"), F.col("event_type").alias("item")
    )
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)

    drained = _drain(
        spark, src, tmp_path, "cooc_out", group_col="g", item_col="item"
    )
    got = {
        (r["item_a"], r["item_b"]): r["n"]
        for r in drained.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r["item_a"], r["item_b"]): r["n_groups"]
        for r in cooccurrence_pairs(
            spark.read.parquet(src), "g", "item", min_count=1
        ).collect()
    }
    assert got == want and len(got) > 0
    # and no pair is emitted twice for the same group
    dup = (
        drained.groupBy("g", "item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup == 0


def test_cap_is_arrival_order(spark, tmp_path):
    """Past the cap the stream keeps the first-ARRIVED items: with
    cap=2 and arrivals c, b, a in separate batches, only (b, c) exists
    — the batch operator would keep (a, b) instead (documented
    divergence)."""
    import os
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    for n, item in enumerate(["c", "b", "a"]):
        f = str(tmp_path / f"part_{n}")
        spark.createDataFrame([("g1", item)], "g string, item string").coalesce(
            1
        ).write.parquet(f)
        for p in os.listdir(f):
            if p.endswith(".parquet"):
                os.rename(f"{f}/{p}", f"{src}/{n:02d}.parquet")
                os.utime(f"{src}/{n:02d}.parquet", (base + n, base + n))

    drained = _drain(
        spark, src, tmp_path, "cooc_cap", group_col="g", item_col="item",
        max_items_per_group=2,
    )
    got = sorted((r["item_a"], r["item_b"]) for r in drained.collect())
    assert got == [("b", "c")]


def test_guard(spark):
    df = spark.readStream.format("rate").load().selectExpr(
        "cast(value as string) as g", "cast(value as string) as item"
    )
    with pytest.raises(ValueError, match="max_items_per_group"):
        streaming_cooccurrence(df, "g", "item", max_items_per_group=1)


def test_group_col_clash_guard(spark):
    df = spark.readStream.format("rate").load().selectExpr(
        "cast(value as string) as item_a", "cast(value as string) as item"
    )
    with pytest.raises(ValueError, match="reserved output"):
        streaming_cooccurrence(df, "item_a", "item")

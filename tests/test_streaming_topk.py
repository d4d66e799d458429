"""Streaming heavy hitters: exact when distinct values fit the sketch
(== batch counts), heavy values survive eviction pressure with valid
lower bounds, validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.streaming.topk import streaming_top_values

SF = "/root/testdata/sf0.01"


def _drain(spark, src, tmp_path, name, schema, **kw):
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_top_values(stream, **kw)
    from tests.conftest import drain_memory_sink

    return drain_memory_sink(out, name, str(tmp_path / f"ck_{name}"))


def test_exact_when_sketch_fits(spark, tmp_path):
    """events' 5 event types per user-bucket fit m=64 — final emits are
    exact counts, matching the batch groupBy."""
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events").select(
        (F.col("user_id") % 4).cast("string").alias("g"), "event_type"
    )
    src = str(tmp_path / "src")
    ev.coalesce(2).write.parquet(src)
    got_all = _drain(
        spark, src, tmp_path, "topk_out", spark.read.parquet(src).schema,
        group_col="g", value_col="event_type", k=3, m=64,
    ).collect()
    # latest emit set per group (max total count)
    latest: dict = {}
    for r in got_all:
        latest.setdefault(r["g"], {})
        # later emits have >= counts; keep max per value
        cur = latest[r["g"]].get(r["value"], (0, 0))
        if r["count"] >= cur[0]:
            latest[r["g"]][r["value"]] = (r["count"], r["overcount"])
    batch = {
        (r["g"], r["event_type"]): r["n"]
        for r in ev.groupBy("g", "event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for g, vals in latest.items():
        want_top = sorted(
            ((v, n) for (gg, v), n in batch.items() if gg == g),
            key=lambda t: (-t[1], t[0]),
        )[:3]
        for v, n in want_top:
            assert vals[v] == (n, 0), (g, v)  # exact, overcount 0


def test_heavy_hitter_survives_eviction(spark, tmp_path):
    """m=2 under 3 values: the dominant value keeps a valid lower
    bound (count - overcount <= true count <= count)."""
    rows = [("g", "hot")] * 80 + [("g", "warm")] * 15 + [("g", "cold")] * 5
    df = spark.createDataFrame(rows, "g: string, v: string")
    src = str(tmp_path / "src2")
    df.coalesce(1).write.parquet(src)
    got = _drain(
        spark, src, tmp_path, "topk_small", spark.read.parquet(src).schema,
        group_col="g", value_col="v", k=2, m=2,
    ).collect()
    by_rank = {r["rank"]: r for r in got if r["g"] == "g"}
    assert by_rank[1]["value"] == "hot"
    r1 = by_rank[1]
    assert r1["count"] - r1["overcount"] <= 80 <= r1["count"]
    with pytest.raises(ValueError):
        streaming_top_values(
            spark.readStream.schema(df.schema).parquet(src), "g", "v", k=5, m=2
        )

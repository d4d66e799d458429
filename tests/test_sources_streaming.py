"""Source readers (CSV/JSON/rows), S3/S4 sink + truncate, and the
Structured Streaming windowed aggregation (availableNow batch-parity)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from zx_spark.model import Aggregate, Query, Select
from zx_spark.sources import read_csv_events, read_json_events, rows_to_events
from zx_spark.storage import truncate_events, write_events
from zx_spark.streaming import run_available_now, stream_events, streaming_windowed_agg


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "ev.csv")
    with open(p, "w") as f:
        f.write("ts,service,v\n2024-01-01T00:00:00,api,1.5\n2024-01-01T01:00:00,web,2.5\n")
    df = read_csv_events(spark, p)
    assert "id" in df.columns
    assert [f.dataType.simpleString() for f in df.schema.fields if f.name == "ts"] == ["timestamp"]
    assert df.count() == 2


def test_json_and_rows(spark, tmp_path):
    p = str(tmp_path / "ev.json")
    with open(p, "w") as f:
        f.write('{"ts": 1704067200, "service": "api"}\n{"ts": 1704067260, "service": "web"}\n')
    df = read_json_events(spark, p)
    assert df.selectExpr("min(cast(ts as double))").collect()[0][0] == 1704067200.0

    rows = rows_to_events(spark, [{"ts": 1704067200123, "k": "a"}, {"ts": 1704067200456, "k": "b"}])
    # epoch-millis heuristic
    assert rows.selectExpr("max(cast(ts as double))").collect()[0][0] == 1704067200.456


def test_orc_roundtrip(spark, tmp_path):
    from zx_spark.sources import read_orc_events

    p = str(tmp_path / "ev_orc")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "eid long, service string, v double"
    ).withColumn("ts", F.timestamp_seconds(F.col("eid")))
    write_events(df, p, partition_by_day=False, fmt="orc")
    back = read_orc_events(spark, p)
    assert back.count() == 2
    assert {f.name for f in back.schema.fields} >= {"service", "v", "ts", "id"}


def test_write_and_truncate(spark, tmp_path):
    p = str(tmp_path / "events_table")
    df = spark.createDataFrame([(1, 1.0)], "id long, v double").withColumn(
        "ts", F.timestamp_seconds(F.col("id"))
    )
    write_events(df, p, partition_by_day=False)
    assert spark.read.parquet(p).count() == 1
    truncate_events(spark, p, schema=df.schema)
    assert spark.read.parquet(p).count() == 0  # S4 flush, schema retained


def test_streaming_windowed_agg(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    batch = spark.createDataFrame(
        [(1, "a", 10.0, 0), (2, "a", 20.0, 30), (3, "b", 5.0, 90), (4, None, 7.0, 100)],
        "id long, service string, v double, ts_s long",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_s"))).drop("ts_s")
    batch.write.parquet(src, mode="overwrite")

    stream = stream_events(spark, src, batch.schema)
    assert stream.isStreaming
    q = Query(
        selects=[Select("v", Aggregate.SUM), Select("v", Aggregate.COUNT)],
        group_by=["service"],
        granularity_s=60,
    )
    result = streaming_windowed_agg(stream, q, rate_col=None)
    run_available_now(result, "stream_out", str(tmp_path / "ckpt"))
    rows = {(r["g_service"], r["window_start"]): (r["sum__v"], r["count__v"])
            for r in spark.table("stream_out").collect()}
    # window [0,60): a has rows 10+20; window [60,120): b=5, __nil=7
    assert rows[("a", 0.0)] == (30.0, 2.0)
    assert rows[("b", 60.0)] == (5.0, 1.0)
    assert rows[("__nil", 60.0)] == (7.0, 1.0)


def test_epoch_unit_heuristic(spark):
    # bigint ts in seconds / millis / micros / nanos must all normalize to
    # the same instant (ADVICE r2: micros/nanos previously misread).
    base_s = 1704067200
    df = rows_to_events(
        spark,
        [
            {"k": "s", "ts": base_s},
            {"k": "ms", "ts": base_s * 1_000 + 123},
            {"k": "us", "ts": base_s * 1_000_000 + 123_456},
            {"k": "ns", "ts": base_s * 1_000_000_000 + 123_456_789},
        ],
    )
    got = {r["k"]: r["ts"].timestamp() for r in df.collect()}
    assert got["s"] == base_s
    assert abs(got["ms"] - (base_s + 0.123)) < 1e-6
    assert abs(got["us"] - (base_s + 0.123456)) < 1e-9
    assert abs(got["ns"] - (base_s + 0.123456)) < 1e-9  # nanos truncate to micros

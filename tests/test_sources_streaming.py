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


def test_ts_flavors_normalize_identically(spark, tmp_path):
    # The driver's parquet `ts` flavor has varied across generations:
    # bigint nanos, naive micros (TIMESTAMP_NTZ), and zoned TIMESTAMP.
    # read_table and read_parquet_events must land every flavor on the
    # same session-zoned TimestampType instant (session tz pinned UTC).
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from zx_spark.sources import read_parquet_events
    from zx_spark.storage import read_table

    base_us = 1_704_067_200_123_456  # 2024-01-01 00:00:00.123456 UTC
    naive = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    flavors = {
        "nanos": pa.table(
            {"id": [1], "ts": pa.array([base_us * 1000], pa.timestamp("ns"))}
        ),
        "ntz": pa.table({"id": [1], "ts": pa.array([naive], pa.timestamp("us"))}),
        "ltz": pa.table(
            {"id": [1], "ts": pa.array([naive], pa.timestamp("us", tz="UTC"))}
        ),
    }
    for name, tbl in flavors.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, str(d / f"{name}.parquet"))
        got = read_table(spark, str(d), name)
        assert got.schema["ts"].dataType.typeName() == "timestamp", name
        assert got.collect()[0]["ts"].timestamp() == base_us / 1e6, name
        got2 = read_parquet_events(spark, str(d / f"{name}.parquet"))
        assert got2.schema["ts"].dataType.typeName() == "timestamp", name
        assert got2.collect()[0]["ts"].timestamp() == base_us / 1e6, name


def test_streaming_session_agg_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): sessions close
    either when a later event arrives past the gap (A) or when the
    watermark passes last_ts + gap with no successor (B, timeout path)."""
    import time as _time

    from zx_spark.streaming import streaming_session_agg

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    schema = "id long, service string, v double, ts timestamp"

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "id long, service string, v double, ts_s long"
        ).withColumn("ts", F.timestamp_seconds(F.col("ts_s"))).drop("ts_s")
        df.coalesce(1).write.parquet(str(tmp_path / name))
        import glob, shutil

        part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        dst = f"{src}/{name}.parquet"
        shutil.copy(part, dst)
        return dst

    # Times sit on a base offset: the initial watermark is epoch 0, so
    # epoch-0 events would be dropped as late before reaching the operator.
    B = 1_000_000
    # batch 1: A has a 3-event session (gap 30 keeps +0,+10,+20 together);
    #          B has a single event that will only close by TIMEOUT.
    f1 = write_file("b1", [(1, "A", 1.0, B), (2, "A", 2.0, B + 10), (3, "A", 4.0, B + 20), (4, "B", 9.0, B)])
    _time.sleep(0.05)
    # batch 2: far-future A event — closes A's open session on arrival and
    #          advances the watermark so B's timeout fires next batch.
    f2 = write_file("b2", [(5, "A", 8.0, B + 1000)])
    _time.sleep(0.05)
    # batch 3: advances event time again → closes A's +1000 session and
    #          fires B's event-time timeout.
    f3 = write_file("b3", [(6, "A", 16.0, B + 2000)])
    for i, f in enumerate([f1, f2, f3]):
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    result = streaming_session_agg(
        stream, group_by=["service"], gap_s=30.0, ts_col="ts",
        value_col="v", watermark="0 seconds",
    )
    run_available_now(result, "sess_out", str(tmp_path / "sess_ckpt"), output_mode="append")
    rows = {
        (r["g_service"], r["window_start"], r["window_end"]): (r["sum__value"], r["count__value"])
        for r in spark.table("sess_out").collect()
    }
    B = 1_000_000.0
    assert rows[("A", B, B + 20.0)] == (7.0, 3.0)          # closed by arrival gap
    assert rows[("A", B + 1000.0, B + 1000.0)] == (8.0, 1.0)  # closed by next batch
    assert rows[("B", B, B)] == (9.0, 1.0)                 # closed by TIMEOUT
    # the t=2000 session is still open at end-of-stream: append mode never
    # emits open state
    assert len(rows) == 3


def test_streaming_session_disorder_keeps_state_monotone(spark, tmp_path):
    """ADVICE r3 regression: a late-but-within-watermark batch whose
    events are all OLDER than the stored open-session state must not
    regress last_ts (which made the next on-time event see a spurious
    > gap break and close a session with window_end earlier than events
    already summed into it). With monotone state the disordered events
    fold into ONE session with correct [min, max] bounds."""
    import time as _time

    from zx_spark.streaming import streaming_session_agg

    src = str(tmp_path / "dis_src")
    os.makedirs(src)
    schema = "id long, service string, v double, ts timestamp"

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "id long, service string, v double, ts_s long"
        ).withColumn("ts", F.timestamp_seconds(F.col("ts_s"))).drop("ts_s")
        df.coalesce(1).write.parquet(str(tmp_path / name))
        import glob, shutil

        part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        dst = f"{src}/{name}.parquet"
        shutil.copy(part, dst)
        return dst

    B = 1_000_000
    # b1 opens [B+100, B+110]; b2 is LATE (B+50, inside the 1000s
    # watermark, older than the stored state); b3 is on-time B+130 —
    # within gap of the TRUE last (110), but > gap from the regressed
    # last (50) the pre-fix code stored; b4 closes the session on arrival.
    f1 = write_file("d1", [(1, "A", 1.0, B + 100), (2, "A", 2.0, B + 110)])
    _time.sleep(0.05)
    f2 = write_file("d2", [(3, "A", 4.0, B + 50)])
    _time.sleep(0.05)
    f3 = write_file("d3", [(4, "A", 8.0, B + 130)])
    _time.sleep(0.05)
    f4 = write_file("d4", [(5, "A", 16.0, B + 3000)])
    for i, f in enumerate([f1, f2, f3, f4]):
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    result = streaming_session_agg(
        stream, group_by=["service"], gap_s=30.0, ts_col="ts",
        value_col="v", watermark="1000 seconds",
    )
    run_available_now(result, "dis_out", str(tmp_path / "dis_ckpt"), output_mode="append")
    rows = {
        (r["g_service"], r["window_start"], r["window_end"]): (r["sum__value"], r["count__value"])
        for r in spark.table("dis_out").collect()
    }
    # ONE closed session spanning the disordered events, bounds = [min, max]
    assert rows == {("A", B + 50.0, B + 130.0): (15.0, 4.0)}


def test_streaming_exact_dedup_drops_redelivered_content(spark, tmp_path):
    """Ingestion dedup: identical CONTENT re-delivered across micro-batches
    (different envelope ids) is dropped within the watermark; distinct
    content passes. Keeps the first arrival — the batch exact-dedup
    keep-min rule's streaming twin."""
    import time as _time

    from zx_spark.streaming import run_available_now, streaming_exact_dedup

    src = str(tmp_path / "ded_src")
    os.makedirs(src)
    schema = "id long, text string, ts timestamp"

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "id long, text string, ts_s long"
        ).withColumn("ts", F.timestamp_seconds(F.col("ts_s"))).drop("ts_s")
        df.coalesce(1).write.parquet(str(tmp_path / name))
        import glob, shutil

        part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        shutil.copy(part, f"{src}/{name}.parquet")

    B = 1_000_000
    # b1: two distinct docs (one duplicated in-batch under a new id);
    # b2: re-delivers doc "aaa" under yet another id 100 s later (inside
    #     the 10-min watermark) plus one genuinely new doc.
    write_file("b1", [(1, "aaa", B), (2, "bbb", B + 1), (3, "aaa", B + 2)])
    _time.sleep(0.05)
    write_file("b2", [(4, "aaa", B + 100), (5, "ccc", B + 100)])

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    result = streaming_exact_dedup(stream, "text", ts_col="ts")
    run_available_now(result, "ded_out", str(tmp_path / "ded_ckpt"), output_mode="append")
    rows = {r["id"]: r["text"] for r in spark.table("ded_out").collect()}
    assert rows == {1: "aaa", 2: "bbb", 5: "ccc"}  # first arrival per content


def test_streaming_weighted_agg_matches_batch(spark, tmp_path):
    """§2.5 sample-rate weighting through the STREAMING path: the
    watermarked windowed agg with rate_col must equal the batch compiler
    on the same snapshot (both use agg_expr, so drift is impossible by
    construction — this pins it)."""
    from zx_spark.compiler import compile_query

    src = str(tmp_path / "wstream_src")
    os.makedirs(src)
    batch = spark.createDataFrame(
        [(1, "a", 10.0, 1.0, 30), (2, "a", 20.0, 2.0, 40), (3, "b", 6.0, 1.5, 90)],
        "id long, service string, v double, sample_rate double, ts_s long",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_s"))).drop("ts_s")
    batch.write.parquet(src, mode="overwrite")

    q = Query(
        selects=[Select("v", Aggregate.SUM), Select("v", Aggregate.COUNT)],
        group_by=["service"],
        granularity_s=60,
    )
    result = streaming_windowed_agg(
        stream_events(spark, src, batch.schema), q, rate_col="sample_rate"
    )
    run_available_now(result, "wstream_out", str(tmp_path / "wckpt"))
    got = {
        (r["g_service"], r["window_start"]): (r["sum__v"], r["count__v"])
        for r in spark.table("wstream_out").collect()
    }
    # weighted: sum(v*r), count = sum(r) over non-null v
    assert got[("a", 0.0)] == (10.0 * 1.0 + 20.0 * 2.0, 3.0)
    assert got[("b", 60.0)] == (9.0, 1.5)
    # batch path agrees (same expressions by construction)
    bat = compile_query(batch, q, id_col="id", rate_col="sample_rate")
    brow = {r["g_service"]: r["sum__v"] for r in bat.collect()}
    assert brow["a"] == 50.0 and brow["b"] == 9.0


def test_chained_dedup_then_windowed_agg(spark, tmp_path):
    """Stateful chaining: ingestion dedup feeding the windowed aggregation
    in ONE streaming query (watermark set once by the dedup, inherited by
    the agg via watermark=None — Spark disallows redefining it). Every
    row is delivered twice; the chained result must equal the
    single-delivery batch aggregate."""
    import uuid

    from zx_spark.model import Aggregate, Query, Select
    from zx_spark.streaming import run_available_now, streaming_windowed_agg
    from zx_spark.streaming.dedup import streaming_exact_dedup
    from pyspark.sql import functions as F

    rows = [
        (i, float(1_700_000_000 + 60 * i), f"g{i % 3}", float(i)) for i in range(30)
    ]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        rows, "event_id long, sec double, event_type string, value double"
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "event_type", "value"
    )
    df.coalesce(1).write.parquet(f"{src}/a.parquet")
    df.coalesce(1).write.parquet(f"{src}/b.parquet")  # double delivery
    stream = (
        spark.readStream.schema(df.schema).option("recursiveFileLookup", "true")
        .parquet(src)
    )
    content = F.concat_ws("|", "event_id", "value")
    dd = streaming_exact_dedup(
        stream.withColumn("__c", content), "__c", watermark="2 hours"
    ).drop("__c", "content_hash")
    q = Query(
        selects=[Select("value", Aggregate.SUM)], group_by=["event_type"],
        granularity_s=600,
    )
    name = f"chain_{uuid.uuid4().hex[:6]}"
    run_available_now(
        streaming_windowed_agg(dd, q, rate_col=None, watermark=None),
        name, str(tmp_path / "ck"),
    )
    got = {
        (r["g_event_type"], r["window_start"]): r["sum__value"]
        for r in spark.table(name).collect()
    }
    want = {
        (r["g_event_type"], float(r["w"])): r["s"]
        for r in df.groupBy(
            "event_type", (F.floor(F.col("ts").cast("double") / 600) * 600).alias("w")
        )
        .agg(F.sum("value").alias("s"))
        .withColumnRenamed("event_type", "g_event_type")
        .collect()
    }
    assert got == want  # doubles collapsed, windows identical


def test_streaming_anomaly_flags_batch_parity(spark, tmp_path):
    """Second custom stateful operator (streaming/anomaly.py): bucket
    sums finalize under the watermark and score against the trailing
    finalized history — every emitted row must match the BATCH verb
    (series.flag_anomalies over the same aligned bucket sums)."""
    import time as _time

    from zx_spark.streaming.anomaly import streaming_anomaly_flags

    src = str(tmp_path / "an_src")
    os.makedirs(src)
    schema = "id long, service string, v double, ts timestamp"

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "id long, service string, v double, ts_s long"
        ).withColumn("ts", F.timestamp_seconds(F.col("ts_s"))).drop("ts_s")
        df.coalesce(1).write.parquet(str(tmp_path / name))
        import glob, shutil

        part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        dst = f"{src}/{name}.parquet"
        shutil.copy(part, dst)
        return dst

    B = 1_000_000
    rid = [0]

    def rows_for(bucket_no, per_event, n_events=2):
        out = []
        for j in range(n_events):
            rid[0] += 1
            out.append((rid[0], "A", float(per_event), B + bucket_no * 10 + j))
        return out

    # buckets 0..5: mild variation (sums 10,12,10,14,10,12); bucket 6: spike
    baseline = [5.0, 6.0, 5.0, 7.0, 5.0, 6.0]
    f1 = write_file("b1", [r for i, p in enumerate(baseline) for r in rows_for(i, p)])
    _time.sleep(0.05)
    f2 = write_file("b2", rows_for(6, 100.0))  # spike bucket: sum 200
    _time.sleep(0.05)
    f3 = write_file("b3", rows_for(50, 5.0))  # far future: finalizes 0..6
    for i, f in enumerate([f1, f2, f3]):
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    result = streaming_anomaly_flags(
        stream, group_by=["service"], bucket_s=10.0, n=5, threshold=3.0,
        min_periods=3, ts_col="ts", value_col="v", watermark="0 seconds",
    )
    run_available_now(result, "an_out", str(tmp_path / "an_ckpt"), output_mode="append")
    got = {
        r["bucket"]: (r["sum__value"], r["is_anomaly"], r["zscore"])
        for r in spark.table("an_out").collect()
    }
    # buckets 0..6 finalized; far-future bucket still open -> absent
    assert sorted(got) == [float(i * 10 + B) for i in range(7)]

    # batch twin over the SAME events
    from zx_spark.operators.series import flag_anomalies, rolling_zscore

    ev = spark.read.parquet(src)
    agg = (
        ev.groupBy(
            F.lit("A").alias("g"),
            (F.floor(F.col("ts").cast("double") / 10) * 10).alias("bucket"),
        )
        .agg(F.sum("v").alias("s"))
    )
    batch = flag_anomalies(
        rolling_zscore(agg, "s", "bucket", ["g"], n=5, out_col="z"),
        "s", "bucket", ["g"], n=5, threshold=3.0, min_periods=3,
    )
    expect = {
        r["bucket"]: (r["s"], r["is_anomaly"], r["z"]) for r in batch.collect()
    }
    for b, (s, flag, z) in got.items():
        es, eflag, ez = expect[b]
        assert s == es and flag == eflag, b
        if z is None or ez is None:
            assert z == ez, b
        else:
            assert abs(z - ez) < 1e-9, b
    # the spike bucket is the ONE anomaly
    assert [b for b, (_, f_, _) in got.items() if f_] == [B + 60.0]


def test_read_evolving_parquet_merges_and_contracts(spark, tmp_path):
    import pytest

    from zx_spark.sources.readers import read_evolving_parquet

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id: long, v: string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id: long, v: string, score: double"
    ).write.mode("append").parquet(p)
    df = read_evolving_parquet(spark, p, {"id": "bigint", "score": "double"})
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: 9.5}  # early file surfaces NULL score
    with pytest.raises(ValueError, match="MISSING"):
        read_evolving_parquet(spark, p, {"nope": "double"})
    with pytest.raises(ValueError, match="want string"):
        read_evolving_parquet(spark, p, {"score": "string"})


def test_read_json_permissive_quarantines_bad_lines(spark, tmp_path):
    from pyspark.sql import types as T
    from zx_spark.sources.readers import read_json_permissive

    p = str(tmp_path / "in.json")
    with open(p, "w") as fh:
        fh.write('{"id": 1, "v": "ok"}\n')
        fh.write('{"id": broken!!\n')
        fh.write('{"id": 3, "v": "fine"}\n')
        fh.write('not json at all\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, bad = read_json_permissive(spark, p, schema)
    assert {r["id"] for r in good.collect()} == {1, 3}
    bad_lines = [r["_corrupt_record"] for r in bad.collect()]
    assert len(bad_lines) == 2 and "not json at all" in bad_lines


def test_streaming_hopping_agg_matches_batch_hops(spark, tmp_path):
    """streaming_windowed_agg(slide_s=...) over availableNow == the
    batch hopping-window aggregate (operators.windows
    .with_hopping_windows) on the same data."""
    from zx_spark.model import Aggregate, Query, Select
    from zx_spark.operators.windows import with_hopping_windows
    from zx_spark.sources.readers import read_parquet_events
    from zx_spark.streaming.windowed import (
        run_available_now,
        streaming_windowed_agg,
    )

    src = str(tmp_path / "src")
    ev = read_parquet_events(spark, "/root/testdata/sf0.001/events.parquet")
    ev.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    q = Query(
        selects=[Select("value", Aggregate.SUM)],
        group_by=["event_type"],
        granularity_s=3600.0,
    )
    out = streaming_windowed_agg(stream, q, rate_col=None, slide_s=900.0)
    run_available_now(out, "hop_out", str(tmp_path / "ck"))
    got = {
        (r["g_event_type"], r["window_start"]): round(r["sum__value"], 6)
        for r in spark.table("hop_out").collect()
    }
    batch = (
        with_hopping_windows(
            spark.read.parquet(src), "ts", 3600.0, 900.0
        )
        .groupBy(
            F.coalesce(F.col("event_type").cast("string"), F.lit("__nil")).alias("g"),
            "hop_start",
        )
        .agg(F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("s"))
    )
    want = {
        (r["g"], r["hop_start"]): round(r["s"], 6) for r in batch.collect()
    }
    assert got == want and len(got) > 0
    import pytest

    with pytest.raises(ValueError):
        streaming_windowed_agg(stream, q, slide_s=1000.0)  # not a divisor

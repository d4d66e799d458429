"""Streaming gap-fill: closed real buckets equal the batch aggregate,
silent buckets emit fills (zero and locf), buckets emit exactly once
and in order, and a silent group keeps emitting trailing fills as the
watermark advances past its last event."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.streaming.gapfill import streaming_gapfill

G = 60.0
B0 = 999_999_960.0  # 60-aligned epoch base (divisible by G)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "g: string, epoch: double, value: double"
    ).select(
        "g",
        F.to_timestamp(F.col("epoch")).alias("ts"),
        "value",
    )


@pytest.mark.parametrize("fill", ["zero", "locf"])
def test_streaming_gapfill_fills_and_matches_batch(spark, tmp_path, fill):
    from tests.conftest import drain_memory_sink, pin_file_mtimes_by_event_time

    # group a: buckets 0, 1, 4 have events (2, 3 silent); group b: bucket 2
    rows1 = [
        ("a", B0 + 10.0, 5.0), ("a", B0 + 20.0, 2.0),      # bucket 0 sum 7
        ("a", B0 + 70.0, 4.0),                              # bucket 1 sum 4
        ("b", B0 + 130.0, 9.0),                             # bucket 2 sum 9
    ]
    rows2 = [
        ("a", B0 + 250.0, 6.0),                             # bucket 4 sum 6
        # watermark driver: closes everything through bucket 6 for BOTH
        # groups (watermark is global) — b goes silent after bucket 2
        ("wmdrv", B0 + 600.0 + 600.0, 0.0),
    ]
    src = str(tmp_path / f"src_{fill}")
    _mk(spark, rows1).coalesce(1).write.parquet(src)
    _mk(spark, rows2).coalesce(1).write.mode("append").parquet(src)
    pin_file_mtimes_by_event_time(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_gapfill(
        stream, "value", "ts", ["g"], granularity_s=G, fill=fill,
        watermark="0 seconds",
    )
    got = drain_memory_sink(out, f"gf_{fill}", str(tmp_path / f"ck_{fill}"))
    a = {
        int((r["bucket"] - B0) // G): (r["sum_value"], r["n_events"], r["is_filled"])
        for r in got.filter("g_g = 'a'").collect()
    }
    # real buckets carry the exact batch sums
    assert a[0] == (7.0, 2, False) and a[1] == (4.0, 1, False)
    assert a[4] == (6.0, 1, False)
    # silent buckets 2, 3 filled per mode
    want_fill = 0.0 if fill == "zero" else 4.0  # locf = last real sum
    assert a[2] == (want_fill, 0, True) and a[3] == (want_fill, 0, True)
    # buckets emit once each and in a contiguous run from 0
    ks = sorted(a)
    assert ks == list(range(ks[0], ks[-1] + 1)) and ks[0] == 0
    # group b flatlines after bucket 2: trailing rows are fills
    b = {
        int((r["bucket"] - B0) // G): (r["sum_value"], r["is_filled"])
        for r in got.filter("g_g = 'b'").collect()
    }
    assert b[2] == (9.0, False)
    trailing = [b[k] for k in sorted(b) if k > 2]
    assert len(trailing) >= 2
    want_b = 0.0 if fill == "zero" else 9.0
    assert all(v == (want_b, True) for v in trailing)
    # no duplicates anywhere
    assert got.groupBy("g_g", "bucket").count().filter("count > 1").count() == 0


def test_streaming_gapfill_under_rocksdb_state_store(spark, tmp_path):
    """r6: the stateful twins run unchanged on Spark's bundled RocksDB
    state store (streaming/state.py) — same drained output as the
    default HDFS-backed provider, and the checkpoint actually contains
    RocksDB artifacts (so the knob demonstrably took effect)."""
    import glob

    from tests.conftest import drain_memory_sink, pin_file_mtimes_by_event_time
    from zx_spark.streaming.state import (
        ROCKSDB_PROVIDER,
        current_state_provider,
        use_rocksdb_state,
    )

    rows1 = [("a", B0 + 10.0, 5.0), ("a", B0 + 70.0, 4.0)]
    rows2 = [("a", B0 + 250.0, 6.0), ("wmdrv", B0 + 1200.0, 0.0)]
    src = str(tmp_path / "src_rocks")
    _mk(spark, rows1).coalesce(1).write.parquet(src)
    _mk(spark, rows2).coalesce(1).write.mode("append").parquet(src)
    pin_file_mtimes_by_event_time(src)

    prev = use_rocksdb_state(spark)
    assert current_state_provider(spark) == ROCKSDB_PROVIDER
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1).load(src)
        )
        out = streaming_gapfill(
            stream, "value", "ts", ["g"], granularity_s=G, fill="locf",
            watermark="0 seconds",
        )
        ck = str(tmp_path / "ck_rocks")
        got = drain_memory_sink(out, "gf_rocks", ck)
        a = {
            int((r["bucket"] - B0) // G): (r["sum_value"], r["n_events"], r["is_filled"])
            for r in got.filter("g_g = 'a'").collect()
        }
        # identical semantics to the HDFS-provider drain above
        assert a[0] == (5.0, 1, False) and a[1] == (4.0, 1, False)
        assert a[2] == (4.0, 0, True) and a[3] == (4.0, 0, True)
        assert a[4] == (6.0, 1, False)
        # RocksDB state artifacts present in the checkpoint (the HDFS
        # provider writes .delta files; RocksDB uploads .zip/.changelog)
        arts = glob.glob(f"{ck}/state/**/*", recursive=True)
        assert any(p.endswith((".zip", ".changelog")) for p in arts), arts[:10]
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_gapfill_validates(spark):
    df = _mk(spark, [("a", B0, 1.0)])
    stream = None
    with pytest.raises(ValueError):
        streaming_gapfill(df, granularity_s=0)
    with pytest.raises(ValueError):
        streaming_gapfill(df, fill="linear")

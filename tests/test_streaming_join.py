"""Stream-stream interval join: availableNow drain over file sources must
match the batch join with the same key + BETWEEN condition, across
micro-batch boundaries; left-outer emits unmatched rows post-watermark."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from zx_spark.streaming.joins import streaming_interval_join

# Base offset: the initial stream watermark is epoch 0, so realistic event
# times (not t=0..9) are required for watermark semantics to engage.
BASE = datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "key string, ts timestamp, value double"
# Far-future tail per key: advances the final watermark past every real
# event so left-outer "no match can arrive" decisions become final.
TAIL = BASE + timedelta(days=30)


def _ts(s: float) -> datetime:
    return BASE + timedelta(seconds=s)


def _left_rows():
    return [
        ("a", _ts(0), 1.0),
        ("a", _ts(100), 2.0),
        ("a", _ts(400), 3.0),   # no mark within 60s after
        ("b", _ts(50), 4.0),
        ("b", _ts(500), 5.0),
        ("c", _ts(10), 6.0),    # key with no marks at all
        ("a", TAIL, -1.0),
        ("b", TAIL, -1.0),
    ]


def _right_rows():
    return [
        ("a", _ts(30), 10.0),    # joins left a@0 (within 60s after)
        ("a", _ts(120), 11.0),   # joins left a@100
        ("b", _ts(49), 12.0),    # misses b@50 with before_s=0... ts < left_ts
        ("b", _ts(80), 13.0),    # joins b@50
        ("a", TAIL + timedelta(seconds=1), -1.0),
        ("b", TAIL + timedelta(seconds=1), -1.0),
    ]


@pytest.fixture(scope="module")
def sources(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sjoin")
    lp, rp = str(d / "left"), str(d / "right")
    spark.createDataFrame(_left_rows(), SCHEMA).repartition(2).write.parquet(lp)
    spark.createDataFrame(_right_rows(), SCHEMA).repartition(2).write.parquet(rp)
    return lp, rp


def _drain(spark, result, name: str, checkpoint: str):
    (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name).filter(F.col("value") >= 0)  # drop tail rows


def _stream(spark, path: str):
    # maxFilesPerTrigger=1 forces MULTIPLE micro-batches, so matches that
    # span batches exercise the cross-batch state buffering.
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_inner_join_matches_batch(spark, sources, tmp_path):
    lp, rp = sources
    out = streaming_interval_join(
        _stream(spark, lp), _stream(spark, rp),
        on=["key"], before_s=0, after_s=60, watermark="5 seconds",
    )
    got = _drain(spark, out, "sjoin_inner", str(tmp_path / "cp1"))

    batch_l, batch_r = spark.read.parquet(lp).alias("l"), spark.read.parquet(rp).alias("r")
    want = (
        batch_l.join(
            batch_r,
            (F.col("l.key") == F.col("r.key"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 60 SECONDS")),
        )
        .select("l.key", "l.ts", "l.value", F.col("r.ts").alias("r_ts"), F.col("r.value").alias("r_value"))
        .filter(F.col("value") >= 0)
    )
    got_set = {tuple(r) for r in got.select("key", "ts", "value", "r_ts", "r_value").collect()}
    want_set = {tuple(r) for r in want.collect()}
    assert got_set == want_set
    assert len(want_set) == 3  # a@0→30, a@100→120, b@50→80


def test_left_outer_emits_unmatched_after_watermark(spark, sources, tmp_path):
    lp, rp = sources
    out = streaming_interval_join(
        _stream(spark, lp), _stream(spark, rp),
        on=["key"], before_s=0, after_s=60, watermark="5 seconds", how="left",
    )
    got = _drain(spark, out, "sjoin_outer", str(tmp_path / "cp2"))
    rows = {(r["key"], r["ts"], r["r_value"]) for r in got.collect()}
    # Matched rows identical to inner...
    assert ("a", _ts(0), 10.0) in rows
    assert ("a", _ts(100), 11.0) in rows
    assert ("b", _ts(50), 13.0) in rows
    # ...plus every unmatched left row with a NULL right payload, emitted
    # because the tail advanced the watermark past any possible match.
    assert ("a", _ts(400), None) in rows
    assert ("b", _ts(500), None) in rows
    assert ("c", _ts(10), None) in rows


def test_right_ts_as_equality_key_resolves(spark, sources):
    """right_ts doubling as an equality key keeps its un-prefixed name —
    the interval condition must reference it there, not as r_ts."""
    lp, rp = sources
    out = streaming_interval_join(
        _stream(spark, lp), _stream(spark, rp),
        on=["key", "ts"], before_s=0, after_s=60, watermark="5 seconds",
    )
    # Accessing the schema forces analysis — this raised UNRESOLVED_COLUMN
    # for r_ts before the fix.
    assert set(out.columns) == {"key", "ts", "value", "r_value"}


def test_validation(spark, sources):
    lp, rp = sources
    l, r = _stream(spark, lp), _stream(spark, rp)
    with pytest.raises(ValueError, match="equality key"):
        streaming_interval_join(l, r, on=[])
    with pytest.raises(ValueError, match="non-negative"):
        streaming_interval_join(l, r, on=["key"], before_s=-1)
    with pytest.raises(ValueError, match="'inner'\\|'left'"):
        streaming_interval_join(l, r, on=["key"], how="full")

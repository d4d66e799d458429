"""Streaming funnel: availableNow drain over time-ordered micro-batches
equals the batch funnel operator (both modes), progress emits are
monotone, and state stays O(k)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.funnel import funnel_steps
from zx_spark.streaming.funnel import streaming_funnel

SF = "/root/testdata/sf0.01"
STEPS = ["view", "click", "purchase"]


def _drain(spark, src, tmp_path, name, **kw):
    from tests.conftest import drain_memory_sink

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_funnel(stream, STEPS, **kw)
    return drain_memory_sink(out, name, str(tmp_path / f"ck_{name}"))


@pytest.mark.parametrize("within_s", [None, 400.0])
def test_streaming_equals_batch_under_time_order(spark, tmp_path, within_s):
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("double").alias("ts"), "event_type"
    )
    # three time-ordered micro-batches (cross-batch event-time order
    # holds -> exact batch parity per the documented contract)
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    c1, c2 = mn + (mx - mn) / 3, mn + 2 * (mx - mn) / 3
    src = str(tmp_path / f"src_{within_s}")
    ev.filter(F.col("ts") < c1).coalesce(1).write.parquet(src)
    ev.filter((F.col("ts") >= c1) & (F.col("ts") < c2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.filter(F.col("ts") >= c2).coalesce(1).write.mode("append").parquet(src)
    from tests.conftest import pin_file_mtimes_by_event_time

    pin_file_mtimes_by_event_time(src)

    name = f"funnel_out_{'h' if within_s else 'n'}"
    got_all = _drain(spark, src, tmp_path, name, within_s=within_s, watermark=None).collect()
    # latest emit per user == batch operator state
    latest = {}
    for r in got_all:
        u = int(r["user_id"])
        if u not in latest or r["steps_completed"] >= latest[u][0]:
            latest[u] = (r["steps_completed"], list(r["step_ts"]))
    want = {
        r["user_id"]: (
            r["steps_completed"],
            [x for x in r["step_ts"] if x is not None],  # streaming emits the prefix
        )
        for r in funnel_steps(ev, STEPS, within_s=within_s).collect()
    }
    if within_s is None:
        assert latest == want and len(want) > 0
    else:
        # horizon mode: furthest stage matches exactly; step_ts is the
        # advance-time lineage (batch reports the final re-anchored
        # witness) — documented contract
        assert {u: v[0] for u, v in latest.items()} == {
            u: v[0] for u, v in want.items()
        }
        assert len(want) > 0
    # progress is monotone per user across emits
    seen: dict[int, int] = {}
    for r in got_all:
        u = int(r["user_id"])
        assert r["steps_completed"] >= seen.get(u, 0)
        seen[u] = r["steps_completed"]


def test_reanchor_without_advance_emits_nothing(spark, tmp_path):
    """Repeated step-0 events after an advance move state silently —
    no emit spam (sink volume ∝ advances)."""
    rows = [(1, 1.0, "view")] + [(1, float(10 + i), "view") for i in range(5)]
    df = spark.createDataFrame(rows, "user_id: long, ts: double, event_type: string")
    src = str(tmp_path / "ra")
    # one file per event -> six micro-batches
    for i, (u, t, s) in enumerate(rows):
        spark.createDataFrame([(u, t, s)], df.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    from tests.conftest import pin_file_mtimes_by_event_time

    pin_file_mtimes_by_event_time(src)
    out = _drain(spark, src, tmp_path, "ra_out", within_s=100.0, watermark=None)
    # exactly ONE emit: the first view advances 0 -> 1; later re-anchors
    # are silent
    assert out.count() == 1 and out.collect()[0]["steps_completed"] == 1


def test_streaming_funnel_validates(spark, tmp_path):
    src = str(tmp_path / "v")
    spark.createDataFrame(
        [(1, 1.0, "view")], "user_id: long, ts: double, event_type: string"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError):
        streaming_funnel(stream, [])
    with pytest.raises(ValueError):
        streaming_funnel(stream, ["a", "a"])
    with pytest.raises(ValueError):
        streaming_funnel(stream, STEPS, within_s=-1)


def test_streaming_conversion_counts_match_batch(spark, tmp_path):
    from zx_spark.operators.funnel import conversion_counts
    from zx_spark.storage import read_table
    from zx_spark.streaming.funnel import streaming_conversion_counts
    from tests.conftest import drain_memory_sink, pin_file_mtimes_by_event_time

    ev = read_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("double").alias("ts"), "event_type"
    )
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    c1 = mn + (mx - mn) / 2
    src = str(tmp_path / "cc")
    ev.filter(F.col("ts") < c1).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts") >= c1).coalesce(1).write.mode("append").parquet(src)
    pin_file_mtimes_by_event_time(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_conversion_counts(stream, STEPS, watermark=None)
    got_all = drain_memory_sink(out, "cc_out", str(tmp_path / "cc_ck")).collect()
    latest = {}
    for r in got_all:
        u = int(r["user_id"])
        cur = latest.get(u, (0, None))
        if r["n_conversions"] >= cur[0]:
            latest[u] = (r["n_conversions"], r["last_conversion_ts"])
    want = {
        r["user_id"]: (r["n_conversions"], r["last_conversion_ts"])
        for r in conversion_counts(ev, STEPS).collect()
    }
    assert latest == want and len(want) > 50
    # each emit carries a strictly larger count than any other emit of
    # that user (memory-sink row order is not guaranteed — compare the
    # per-user count SETS, which must be duplicate-free and end at the
    # batch answer)
    per_user: dict[int, list] = {}
    for r in got_all:
        per_user.setdefault(int(r["user_id"]), []).append(r["n_conversions"])
    for u, counts in per_user.items():
        assert len(set(counts)) == len(counts), u
        assert max(counts) == want[u][0], u

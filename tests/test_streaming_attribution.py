"""Streaming attribution: availableNow drain over time-ordered
micro-batches equals the batch attributed_conversions for every model;
state carries touches across batches; the late-data contract holds."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.attribution import attributed_conversions
from zx_spark.streaming.attribution import streaming_attribution

SF = "/root/testdata/sf0.001"
TOUCHES = ["view", "click"]
T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _drain(spark, src, tmp_path, name, model, **kw):
    from tests.conftest import drain_memory_sink

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0, model=model,
        watermark=None, **kw,
    )
    return drain_memory_sink(out, name, str(tmp_path / f"ck_{name}"))


def _key(r, model):
    if model in ("linear", "position"):
        return (r["conv_id"], r["channel"], r["touch_tm"], r["k"])
    return (r["conv_id"], r["channel"], r["touch_tm"])


@pytest.mark.parametrize("model", ["last_touch", "first_touch", "linear", "position"])
def test_streaming_equals_batch_under_time_order(spark, tmp_path, model):
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events").select(
        "event_id", F.col("ts").cast("double").alias("ts"),
        "user_id", "event_type",
    ).filter(F.col("user_id").isNotNull())
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    c1, c2 = mn + (mx - mn) / 3, mn + 2 * (mx - mn) / 3
    src = str(tmp_path / f"src_{model}")
    ev.filter(F.col("ts") < c1).coalesce(1).write.parquet(src)
    ev.filter((F.col("ts") >= c1) & (F.col("ts") < c2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.filter(F.col("ts") >= c2).coalesce(1).write.mode("append").parquet(src)
    from tests.conftest import pin_file_mtimes_by_event_time

    pin_file_mtimes_by_event_time(src)

    got = {
        _key(r, model)
        for r in _drain(spark, src, tmp_path, f"attr_{model}", model).collect()
    }
    want_rows = attributed_conversions(
        ev, TOUCHES, "purchase", window_s=7200.0, model=model
    ).collect()
    want = {_key(r, model) for r in want_rows}
    assert got == want, model
    assert got  # non-vacuous: the driver slice attributes something


def _mk(spark, rows):
    """rows: (event_id, seconds, user, type) — numeric-ts stream."""
    return spark.createDataFrame(
        [(i, float(s), u, t) for (i, s, u, t) in rows],
        "event_id long, ts double, user_id long, event_type string",
    )


def _stage(spark, tmp_path, name, batches):
    import os

    src = str(tmp_path / name)
    for i, rows in enumerate(batches):
        _mk(spark, rows).coalesce(1).write.mode("append").parquet(src)
    # pin mtimes in BATCH order (numeric ts — the conftest helper
    # expects timestamps, so pin by write order via listing mtime)
    files = sorted(
        (f for f in os.listdir(src) if f.endswith(".parquet")),
        key=lambda f: os.path.getmtime(os.path.join(src, f)),
    )
    for i, f in enumerate(files):
        os.utime(os.path.join(src, f), (1_700_000_000 + i,) * 2)
    return src


def test_state_carries_touches_across_batches(spark, tmp_path):
    """Touch in batch 1, conversion in batch 2 — the buffered touch
    attributes it."""
    from tests.conftest import drain_memory_sink

    src = _stage(
        spark, tmp_path, "carry",
        [[(1, 100.0, 1, "view")], [(2, 200.0, 1, "purchase")]],
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0, watermark=None
    )
    got = drain_memory_sink(out, "attr_carry", str(tmp_path / "ck_carry")).collect()
    assert [(r["conv_id"], r["channel"]) for r in got] == [(2, "view")]
    assert got[0]["conv_tm"] - got[0]["touch_tm"] == 100_000_000


def test_late_touch_no_retro_but_counts_forward(spark, tmp_path):
    """The documented contract: a touch arriving AFTER a conversion's
    batch cannot retro-attribute it (view@100 wins for conv@300 even
    though click@200 is event-time later), but it does attribute
    FUTURE conversions (conv@400 → click)."""
    from tests.conftest import drain_memory_sink

    src = _stage(
        spark, tmp_path, "late",
        [
            [(1, 100.0, 1, "view"), (3, 300.0, 1, "purchase")],
            [(2, 200.0, 1, "click"), (4, 400.0, 1, "purchase")],
        ],
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0, watermark=None
    )
    got = {(r["conv_id"], r["channel"]) for r in drain_memory_sink(
        out, "attr_late", str(tmp_path / "ck_late")).collect()}
    assert got == {(3, "view"), (4, "click")}


def test_window_prune_bounds_state_and_drops_stale(spark, tmp_path):
    """A touch older than the lookback never attributes (batch parity),
    and pruned state means a conversion two windows later sees nothing."""
    from tests.conftest import drain_memory_sink

    src = _stage(
        spark, tmp_path, "prune",
        [
            [(1, 0.0, 1, "view")],
            [(2, 50_000.0, 1, "purchase")],  # 50k s > 7200 s window
        ],
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0, watermark=None
    )
    got = drain_memory_sink(out, "attr_prune", str(tmp_path / "ck_prune")).collect()
    assert got == []


def test_validates_args(spark):
    df = _mk(spark, [(1, 0.0, 1, "view")])
    stream = df  # schema probe only — validation happens before start
    with pytest.raises(ValueError, match="model"):
        streaming_attribution(stream, TOUCHES, "purchase", model="shapley")
    with pytest.raises(ValueError, match="touch_types"):
        streaming_attribution(stream, [], "purchase")
    with pytest.raises(ValueError, match="window_s"):
        streaming_attribution(stream, TOUCHES, "purchase", window_s=0.0)


def test_null_id_rows_dropped_not_crash(spark, tmp_path):
    """r8 review: a NULL event_id used to reach the fold as NaN and
    kill the query (int(nan)). The pre-filter drops them — the stream
    survives and attributes the well-formed rows."""
    from tests.conftest import drain_memory_sink

    src = str(tmp_path / "nullid")
    spark.createDataFrame(
        [(1, 100.0, 1, "view"), (None, 150.0, 1, "view"),
         (2, 200.0, 1, "purchase")],
        "event_id long, ts double, user_id long, event_type string",
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0, watermark=None
    )
    got = drain_memory_sink(out, "attr_nullid", str(tmp_path / "ck_ni")).collect()
    assert [(r["conv_id"], r["channel"]) for r in got] == [(2, "view")]


def test_conversion_type_also_touch_matches_batch(spark, tmp_path):
    """r8 review: when conversion_type is ALSO a touch type
    (repeat-purchase attribution), the event must both attribute and
    enter the buffer — exactly the batch semantics (a purchase
    attributes to the preceding purchase)."""
    from tests.conftest import drain_memory_sink

    rows = [(1, 100.0, 1, "view"), (2, 200.0, 1, "purchase"),
            (3, 300.0, 1, "purchase")]
    df = _mk(spark, rows)
    src = str(tmp_path / "selftouch")
    df.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    touches = ["view", "purchase"]
    out = streaming_attribution(
        stream, touches, "purchase", window_s=7200.0, watermark=None
    )
    got = {(r["conv_id"], r["channel"]) for r in drain_memory_sink(
        out, "attr_st", str(tmp_path / "ck_st")).collect()}
    want = {(r["conv_id"], r["channel"]) for r in attributed_conversions(
        df, touches, "purchase", window_s=7200.0).collect()}
    assert got == want == {(2, "view"), (3, "purchase")}


def test_user_column_keeps_input_type(spark, tmp_path):
    """r8 review: the output user column carries the INPUT type (long
    driver ids stay long), not a stringified copy."""
    from tests.conftest import drain_memory_sink

    src = str(tmp_path / "utype")
    _mk(spark, [(1, 100.0, 7, "view"), (2, 200.0, 7, "purchase")]) \
        .coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0, watermark=None
    )
    assert out.schema["user"].dataType.simpleString() == "bigint"
    got = drain_memory_sink(out, "attr_ut", str(tmp_path / "ck_ut")).collect()
    assert got[0]["user"] == 7 and isinstance(got[0]["user"], int)


def test_timestamp_stream_evicts_idle_state(spark, tmp_path):
    """With a watermark (timestamp stream), EventTimeTimeout evicts an
    idle user's buffer once the watermark passes touch + window — and
    the drained attribution output is unaffected."""
    from tests.conftest import drain_memory_sink, pin_file_mtimes_by_event_time

    src = str(tmp_path / "evict")
    rows1 = [(1, T0, 1, "view"), (2, T0 + dt.timedelta(seconds=60), 1, "purchase")]
    rows2 = [(3, T0 + dt.timedelta(days=3), 2, "view"),
             (4, T0 + dt.timedelta(days=3, seconds=60), 2, "purchase")]
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
    pin_file_mtimes_by_event_time(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0, watermark="1 minute"
    )
    got = {(r["conv_id"], r["channel"]) for r in drain_memory_sink(
        out, "attr_ev", str(tmp_path / "ck_ev")).collect()}
    assert got == {(2, "view"), (4, "view")}


def _stage_ts(spark, tmp_path, name, batches):
    """Timestamp-ts staging with mtimes pinned in BATCH order (the
    reorder tests violate event-time order across batches on purpose,
    so event-time mtime pinning would reorder the triggers)."""
    import os

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    src = str(tmp_path / name)
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    files = sorted(
        (f for f in os.listdir(src) if f.endswith(".parquet")),
        key=lambda f: os.path.getmtime(os.path.join(src, f)),
    )
    for i, f in enumerate(files):
        os.utime(os.path.join(src, f), (1_700_000_000 + i,) * 2)
    return src


@pytest.mark.parametrize("model", ["last_touch", "linear"])
def test_reorder_buffer_equals_batch_under_bounded_disorder(
    spark, tmp_path, model
):
    """r9 (VERDICT r8 item 6): with reorder=True a touch landing in a
    LATER batch than its conversion (within the watermark delay) still
    attributes it — drained output equals the batch operator, which
    the documented immediate-mode contract cannot do."""
    from tests.conftest import drain_memory_sink

    s = lambda sec: T0 + dt.timedelta(seconds=sec)
    rows1 = [(1, s(100), 1, "view"), (3, s(300), 1, "purchase")]
    rows2 = [(2, s(200), 1, "click")]  # event-time BEFORE the purchase
    sent1 = [(8, s(5000), 2, "view")]  # advances the watermark...
    sent2 = [(9, s(5001), 2, "view")]  # ...and fires user 1's timeout
    src = _stage_ts(
        spark, tmp_path, f"ro_{model}", [rows1, rows2, sent1, sent2]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0, model=model,
        watermark="10 minutes", reorder=True,
    )
    got = {
        _key(r, model)
        for r in drain_memory_sink(
            out, f"attr_ro_{model}", str(tmp_path / f"ck_ro_{model}")
        ).collect()
    }
    ev = spark.read.parquet(src)
    want = {
        _key(r, model)
        for r in attributed_conversions(
            ev, TOUCHES, "purchase", window_s=7200.0, model=model
        ).collect()
    }
    assert got == want and got, model
    if model == "last_touch":
        # the late click must have WON (it is the latest touch before
        # the conversion) — the immediate mode would report view
        assert {(c, ch) for (c, ch, _t) in got} == {(3, "click")}


def test_reorder_requires_watermark(spark):
    df = _mk(spark, [(1, 0.0, 1, "view")])
    with pytest.raises(ValueError, match="reorder"):
        streaming_attribution(
            df, TOUCHES, "purchase", watermark=None, reorder=True
        )


def test_reorder_in_order_stream_still_matches_batch(spark, tmp_path):
    """reorder=True must be a superset contract: on an already
    time-ordered stream it reproduces the immediate mode's (= batch)
    output exactly."""
    from tests.conftest import drain_memory_sink

    s = lambda sec: T0 + dt.timedelta(seconds=sec)
    batches = [
        [(1, s(100), 1, "view"), (2, s(200), 1, "click")],
        [(3, s(300), 1, "purchase"), (4, s(400), 1, "purchase")],
        [(8, s(5000), 2, "view")],
        [(9, s(5001), 2, "view")],
    ]
    src = _stage_ts(spark, tmp_path, "ro_ord", batches)
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = streaming_attribution(
        stream, TOUCHES, "purchase", window_s=7200.0,
        watermark="10 minutes", reorder=True,
    )
    got = {
        (r["conv_id"], r["channel"])
        for r in drain_memory_sink(
            out, "attr_ro_ord", str(tmp_path / "ck_ro_ord")
        ).collect()
    }
    assert got == {(3, "click"), (4, "click")}

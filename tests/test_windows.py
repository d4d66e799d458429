"""Faithful data-aligned window semantics (SURVEY §2.6; src/lib.rs:665-732).

The reference fixture never splits a window (max gap 9s < 15s granularity),
so these tests pin the behaviors no golden test covers: multi-window
segmentation, the breaking-row drop (src/lib.rs:711-713), the
breaking-row-ts window_start seed, and id-order (not ts-order) traversal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zx_spark.compiler import compile_query
from zx_spark.model import Aggregate, Query, Select
from zx_spark.operators.windows import WINDOW_NO, with_faithful_windows


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double, ts_s long").withColumn(
        "ts", F.timestamp_seconds(F.col("ts_s"))
    )


def test_multi_window_breaking_row_dropped(spark):
    # ids 1..5 at ts [0, 5, 20, 22, 40], granularity 10:
    #   w0 = {ts 0, 5}; ts 20 breaks (dropped, seeds w1 start);
    #   w1 = {ts 22}; ts 40 breaks (dropped, seeds w2, which stays empty).
    rows = [(1, 1.0, 0), (2, 2.0, 5), (3, 4.0, 20), (4, 8.0, 22), (5, 16.0, 40)]
    q = Query(selects=[Select("v", Aggregate.SUM)], granularity_s=10, window_mode="faithful")
    out = sorted(
        compile_query(_df(spark, rows), q, rate_col=None).collect(),
        key=lambda r: r["window_start"],
    )
    assert len(out) == 2  # empty trailing window vanishes (documented divergence)
    w0, w1 = out
    assert (w0["window_start"], w0["window_end"], w0["sum__v"]) == (0.0, 5.0, 3.0)
    # w1 starts at the DROPPED breaking row's ts (20), ends at its one kept row.
    assert (w1["window_start"], w1["window_end"], w1["sum__v"]) == (20.0, 22.0, 8.0)


def test_id_order_not_ts_order(spark):
    # Out-of-order insert: id order 1,2,3 has ts 10, 0, 25 — traversal is by
    # id (src/lib.rs:544). w0 opens at ts=10; id2 (ts=0) joins (0-10 <= g);
    # id3 (ts=25) breaks with granularity 10 (25-10 > 10).
    rows = [(1, 1.0, 10), (2, 2.0, 0), (3, 4.0, 25)]
    q = Query(selects=[Select("v", Aggregate.SUM)], granularity_s=10, window_mode="faithful")
    out = compile_query(_df(spark, rows), q, rate_col=None).collect()
    assert len(out) == 1
    # start = first row's ts (10); end = last kept row in id order (id2, ts 0).
    assert (out[0]["window_start"], out[0]["window_end"], out[0]["sum__v"]) == (10.0, 0.0, 3.0)


def test_inclusive_edge(spark):
    # ts - start == granularity joins the window (inclusive, src/lib.rs:696-700).
    rows = [(1, 1.0, 0), (2, 2.0, 10)]
    q = Query(selects=[Select("v", Aggregate.SUM)], granularity_s=10, window_mode="faithful")
    out = compile_query(_df(spark, rows), q, rate_col=None).collect()
    assert len(out) == 1 and out[0]["sum__v"] == 3.0


def test_per_group_independent_windows(spark):
    # Window recurrences are per group; grouped segmentation must not leak
    # state across groups.
    df = spark.createDataFrame(
        [(1, "a", 1.0, 0), (2, "b", 2.0, 100), (3, "a", 4.0, 50), (4, "b", 8.0, 105)],
        "id long, k string, v double, ts_s long",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
    q = Query(
        selects=[Select("v", Aggregate.SUM)],
        group_by=["k"],
        granularity_s=10,
        window_mode="faithful",
    )
    out = {(r["g_k"], r["window_start"]): r["sum__v"] for r in compile_query(df, q, rate_col=None).collect()}
    # group a: w0={ts0}, ts50 breaks (dropped, seeds empty w1) → one row.
    # group b: both rows in one window.
    assert out == {("a", 0.0): 1.0, ("b", 100.0): 10.0}


def test_session_windows(spark):
    # Gap-based: rows at ts [0, 5, 20, 22, 40] with gap 10 → sessions
    # {0,5}, {20,22}, {40}. Unlike faithful mode, no row is dropped and
    # the 40s row forms its own window.
    rows = [(1, 1.0, 0), (2, 2.0, 5), (3, 4.0, 20), (4, 8.0, 22), (5, 16.0, 40)]
    q = Query(selects=[Select("v", Aggregate.SUM)], granularity_s=10, window_mode="session")
    out = sorted(
        compile_query(_df(spark, rows), q, rate_col=None).collect(),
        key=lambda r: r["window_start"],
    )
    got = [(r["window_start"], r["window_end"], r["sum__v"]) for r in out]
    assert got == [(0.0, 5.0, 3.0), (20.0, 22.0, 12.0), (40.0, 40.0, 16.0)]


def test_session_windows_no_python_in_plan(spark):
    # The scale path must stay JVM-side: no Arrow/Python eval nodes.
    rows = [(1, 1.0, 0), (2, 2.0, 5)]
    q = Query(selects=[Select("v", Aggregate.SUM)], granularity_s=10, window_mode="session")
    plan = compile_query(_df(spark, rows), q, rate_col=None)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan


def test_segmenter_schema_not_mutated(spark):
    # Regression: StructType.add mutated the input DataFrame's schema in
    # place, making applyInPandas fail with UNRESOLVED_COLUMN __window_no.
    df = _df(spark, [(1, 1.0, 0)])
    before = df.schema.jsonValue()
    seg = with_faithful_windows(df, [], "id", "ts", 10)
    assert WINDOW_NO in seg.columns
    assert df.schema.jsonValue() == before


def test_hopping_windows_match_builtin_f_window(spark):
    """with_hopping_windows row-for-row equals Spark's F.window(w, s)
    expansion on the driver events, for two (width, slide) shapes."""
    import pytest
    from zx_spark.operators.windows import with_hopping_windows
    from zx_spark.storage import read_table

    ev = read_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "ts"
    )
    for w, s in [(3600.0, 900.0), (600.0, 300.0)]:
        got = {
            (r["event_id"], r["hop_start"])
            for r in with_hopping_windows(ev, "ts", w, s).collect()
        }
        want = {
            (r["event_id"], r["w"]["start"].timestamp())
            for r in ev.select(
                "event_id", F.window("ts", f"{int(w)} seconds", f"{int(s)} seconds").alias("w")
            ).collect()
        }
        assert got == want and len(got) == ev.count() * int(w / s)
    # an overlapping aggregate over hops == per-window filter sums
    agg = (
        with_hopping_windows(ev, "ts", 3600.0, 1800.0)
        .groupBy("hop_start")
        .count()
    )
    one = agg.orderBy("hop_start").limit(3).collect()[-1]
    lo, hi = one["hop_start"], one["hop_start"] + 3600.0
    direct = ev.filter(
        (F.col("ts").cast("double") >= lo) & (F.col("ts").cast("double") < hi)
    ).count()
    assert one["count"] == direct
    with pytest.raises(ValueError):
        with_hopping_windows(ev, "ts", 100.0, 300.0)
    with pytest.raises(ValueError):
        with_hopping_windows(ev, "ts", 100.0, 33.0)


def test_hopping_windows_drop_null_ts_and_match_oracle_shape(spark):
    """r7 review: the hop driver arm and its DuckDB oracle must agree on
    NULL-ts events. Spark drops them (explode of a NULL sequence emits
    nothing); the oracle now filters ts IS NOT NULL. Pin both engines on
    a frame that actually contains a NULL ts (the driver testdata has
    none, so the divergence was latent)."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from zx_spark.operators.windows import with_hopping_windows

    t0 = dt.datetime(2024, 1, 1, 0, 30, tzinfo=dt.timezone.utc)
    rows = [
        (1, t0, "a", 10.0),
        (2, t0 + dt.timedelta(hours=1), "a", 20.0),
        (3, None, "a", 40.0),          # must appear in NO hop window
        (4, t0 + dt.timedelta(minutes=90), None, 8.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    hop = with_hopping_windows(ev, "ts", 7200.0, 3600.0)
    assert hop.filter("event_id = 3").count() == 0
    got = {
        (r["k"], r["s"]): r["v"]
        for r in hop.groupBy(
            F.coalesce("event_type", F.lit("__nil")).alias("k"),
            F.col("hop_start").cast("long").alias("s"),
        )
        .agg(F.round(F.sum("value"), 3).alias("v"))
        .collect()
    }
    pdf = pd.DataFrame(
        [(i, ts, et, v) for (i, ts, et, v) in rows],
        columns=["event_id", "ts", "event_type", "value"],
    )
    con = duckdb.connect()
    con.register("events", pdf)
    exp = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            "SELECT coalesce(event_type, '__nil') AS k, "
            "((floor(epoch(ts) / 3600)::bigint - k.k) * 3600) AS s, "
            "round(sum(value), 3) AS v "
            "FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k "
            "WHERE ts IS NOT NULL GROUP BY 1, 2"
        ).fetchall()
    }
    assert got == exp

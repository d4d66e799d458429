"""Property-based check (SURVEY §5 item 4): the distributed faithful-window
segmenter must agree with a direct pure-Python transcription of the
reference's window loop on arbitrary inputs — random ids, out-of-order
timestamps, arbitrary granularities."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from zx_spark.operators.windows import WINDOW_NO, with_faithful_windows


def reference_segment(rows: list[tuple[int, float]], g: float):
    """Pure-Python transcription of the reference window loop
    (src/lib.rs:689-725): id-ordered traversal, inclusive edge, breaking
    row dropped but seeding the next window's start."""
    rows = sorted(rows)  # by id
    out = {}  # id -> window_no
    w = 0
    start = rows[0][1] if rows else 0.0
    for rid, ts in rows:
        if ts - start <= g:
            out[rid] = w
        else:
            start = ts
            w += 1
    return out


def reference_sessions(rows: list[tuple[int, float]], g: float):
    """Pure-Python gap-based sessionization (ts order, id tiebreak):
    window increments when the gap to the previous row exceeds g."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out, w, prev = {}, 0, None
    for rid, ts in ordered:
        if prev is not None and ts - prev > g:
            w += 1
        out[rid] = w
        prev = ts
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.floats(min_value=0, max_value=1000, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    ),
    g=st.floats(min_value=0.5, max_value=500, allow_nan=False),
)
def test_session_matches_reference_loop(spark, rows, g):
    from zx_spark.operators.windows import with_session_windows

    df = spark.createDataFrame(
        [(rid, float(ts)) for rid, ts in rows], "id long, ts_d double"
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_d"))).drop("ts_d")
    got = {r["id"]: r[WINDOW_NO] for r in with_session_windows(df, [], "id", "ts", g).collect()}
    truncated = [(rid, int(ts * 1e6) / 1e6) for rid, ts in rows]
    assert got == reference_sessions(truncated, g)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.floats(min_value=0, max_value=1000, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    ),
    g=st.floats(min_value=0.5, max_value=500, allow_nan=False),
)
def test_faithful_matches_reference_loop(spark, rows, g):
    df = spark.createDataFrame(
        [(rid, float(ts)) for rid, ts in rows], "id long, ts_d double"
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_d"))).drop("ts_d")
    seg = with_faithful_windows(df, [], "id", "ts", g)
    got = {r["id"]: r[WINDOW_NO] for r in seg.collect()}
    # Spark's ts roundtrips through micros; mirror that truncation.
    truncated = [(rid, int(ts * 1e6) / 1e6) for rid, ts in rows]
    assert got == reference_segment(truncated, g)


def test_session_parallel_slices_match_classic(spark):
    """The r11 parallel-prefix decomposition (time slices + summary
    stitch) must produce the SAME window numbers as the classic
    one-window-per-group plan — including null-ts rows (sentinel
    slice), exact ts ties at slice boundaries, and groups whose
    timeline spans many/empty slices."""
    import random

    from pyspark.sql import functions as F

    from zx_spark.operators.windows import with_session_windows

    random.seed(7)
    rows = []
    for i in range(4000):
        grp = random.choice(["a", "b", "c", None])
        ts = random.choice([None] + [random.uniform(0, 200000) for _ in range(9)])
        if ts is not None and random.random() < 0.05:
            ts = float(int(ts))  # exact ties
        rows.append((i, grp, ts))
    # g keeps REAL nulls: the summary join must be null-safe — the
    # classic window partitions null groups together, so a plain
    # equi-join against the summary would silently drop those rows
    df = spark.createDataFrame(rows, "id long, g string, ts double")
    for groups in (["g"], []):
        for gap in (5.0, 120.0):
            classic = with_session_windows(df, groups, "id", "ts", gap, n_slices=1)
            par = with_session_windows(df, groups, "id", "ts", gap, n_slices=53)
            auto = with_session_windows(df, groups, "id", "ts", gap)
            cv = sorted((r["id"], r[WINDOW_NO]) for r in classic.collect())
            pv = sorted((r["id"], r[WINDOW_NO]) for r in par.collect())
            av = sorted((r["id"], r[WINDOW_NO]) for r in auto.collect())
            assert cv == pv == av
            # the decomposition must actually split sessions across
            # slices, not trivially agree on one window per group
            assert len({w for _, w in cv}) > 100


def test_session_parallel_helper_columns_dropped(spark):
    from zx_spark.operators.windows import with_session_windows

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 700.0), (3, "a", 701.0)],
        "id long, g string, ts double",
    )
    out = with_session_windows(df, ["g"], "id", "ts", 600.0, n_slices=8)
    assert set(out.columns) == {"id", "g", "ts", WINDOW_NO}
    out_g = with_session_windows(df, [], "id", "ts", 600.0, n_slices=8)
    assert set(out_g.columns) == {"id", "g", "ts", WINDOW_NO}

def test_session_auto_subthreshold_is_lazy_classic(spark, tmp_path):
    """An auto (n_slices=None) call on a sub-threshold frame must stay a
    pure transformation: zero Spark jobs at call time (the row gate reads
    plan STATISTICS — parquet scan bytes — not a count job; VERDICT r11
    item 3 / ADVICE r11) and exactly the classic plan. Parquet-backed on
    purpose: RDD-backed plans report the unknown-size sentinel and keep
    the eager exact-count gate."""
    from zx_spark.operators.windows import with_session_windows

    path = str(tmp_path / "lazy_events.parquet")
    spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i * 37 % 5000)) for i in range(200)],
        "id long, g string, ts double",
    ).write.parquet(path)
    df = spark.read.parquet(path)
    sc = spark.sparkContext
    sc.setJobGroup("session-auto-lazy-probe", "plan construction only")
    try:
        auto = with_session_windows(df, ["g"], "id", "ts", 60.0)
        plan_auto = auto._jdf.queryExecution().optimizedPlan().toString()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("session-auto-lazy-probe")
    assert list(jobs) == [], f"auto sub-threshold call launched jobs: {jobs}"
    classic = with_session_windows(df, ["g"], "id", "ts", 60.0, n_slices=1)
    plan_classic = classic._jdf.queryExecution().optimizedPlan().toString()
    norm = lambda plan: re.sub(r"#\d+", "#x", plan)
    assert norm(plan_auto) == norm(plan_classic)


def test_session_auto_high_cardinality_groups_stays_classic(spark, monkeypatch):
    """ADVICE r11 (medium): with group cardinality >= 4x the shuffle
    parallelism the classic per-group window already fills the cluster —
    auto must NOT build the slice/summary machinery (whose summary would
    scale with groups x slices)."""
    from zx_spark.operators import windows

    monkeypatch.setattr(windows, "SESSION_PARALLEL_MIN_ROWS", 10)
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 400), float(i)) for i in range(1200)],
        "id long, g string, ts double",
    )
    auto = windows.with_session_windows(df, ["g"], "id", "ts", 60.0)
    classic = windows.with_session_windows(df, ["g"], "id", "ts", 60.0, n_slices=1)
    norm = lambda plan: re.sub(r"#\d+", "#x", plan)
    assert norm(auto._jdf.queryExecution().optimizedPlan().toString()) == norm(
        classic._jdf.queryExecution().optimizedPlan().toString()
    )


def test_session_auto_dominant_group_keeps_slicing(spark, monkeypatch):
    """ADVICE r12 (low): cardinality alone cannot see skew — thousands
    of tiny groups plus ONE dominant group must NOT gate to the classic
    plan (which would serialize the dominant timeline onto one task);
    the skew check keeps the slice decomposition, values identical."""
    from zx_spark.operators import windows

    monkeypatch.setattr(windows, "SESSION_PARALLEL_MIN_ROWS", 10)
    rows = [(i, "g%d" % i, float(i)) for i in range(400)] + [
        (1000 + i, "hot", float(i * 211 % 9000)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, ts double")
    auto = windows.with_session_windows(df, ["g"], "id", "ts", 60.0)
    classic = windows.with_session_windows(df, ["g"], "id", "ts", 60.0, n_slices=1)
    norm = lambda plan: re.sub(r"#\d+", "#x", plan)
    assert norm(auto._jdf.queryExecution().optimizedPlan().toString()) != norm(
        classic._jdf.queryExecution().optimizedPlan().toString()
    ), "dominant group was gated to the serial classic plan"
    av = sorted((r["id"], r[WINDOW_NO]) for r in auto.collect())
    cv = sorted((r["id"], r[WINDOW_NO]) for r in classic.collect())
    assert av == cv


def test_session_summary_broadcast_hint_gated(spark, monkeypatch):
    """ADVICE r11 (medium): the groups x slices summary is only
    broadcast-HINTED while its estimated rows stay bounded; past the cap
    the join strategy is left to AQE (no hint), results unchanged."""
    from zx_spark.operators import windows

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i * 211 % 9000)) for i in range(500)],
        "id long, g string, ts double",
    )
    hinted = windows.with_session_windows(df, ["g"], "id", "ts", 30.0, n_slices=8)
    assert "strategy=broadcast" in hinted._jdf.queryExecution().analyzed().toString()
    monkeypatch.setattr(windows, "SESSION_SUMMARY_BROADCAST_MAX", 1)
    unhinted = windows.with_session_windows(df, ["g"], "id", "ts", 30.0, n_slices=8)
    assert "strategy=broadcast" not in unhinted._jdf.queryExecution().analyzed().toString()
    hv = sorted((r["id"], r[WINDOW_NO]) for r in hinted.collect())
    uv = sorted((r["id"], r[WINDOW_NO]) for r in unhinted.collect())
    classic = windows.with_session_windows(df, ["g"], "id", "ts", 30.0, n_slices=1)
    cv = sorted((r["id"], r[WINDOW_NO]) for r in classic.collect())
    assert hv == uv == cv


def test_session_parallel_preserves_colliding_helper_names(spark):
    """ADVICE r11 (low): an input frame already carrying a helper name
    (__slice, __lag_ts, ...) must pass through untouched — temp columns
    are uniquified, not silently overwritten and dropped."""
    from zx_spark.operators.windows import with_session_windows

    df = spark.createDataFrame(
        [(i, "a", float(i * 997 % 8000), i * 10, -float(i)) for i in range(300)],
        "id long, g string, ts double, __slice long, __lag_ts double",
    )
    out = with_session_windows(df, ["g"], "id", "ts", 15.0, n_slices=8)
    assert {"__slice", "__lag_ts"} <= set(out.columns)
    rows = {r["id"]: r for r in out.collect()}
    assert all(rows[i]["__slice"] == i * 10 for i in range(300))
    assert all(rows[i]["__lag_ts"] == -float(i) for i in range(300))
    classic = with_session_windows(
        df.drop("__slice", "__lag_ts"), ["g"], "id", "ts", 15.0, n_slices=1
    )
    cv = {r["id"]: r[WINDOW_NO] for r in classic.collect()}
    assert {i: r[WINDOW_NO] for i, r in rows.items()} == cv


def test_faithful_preserves_colliding_helper_names(spark):
    from zx_spark.operators.windows import with_faithful_windows

    df = spark.createDataFrame(
        [(1, 1.0, "keep"), (2, 2.0, "keep"), (3, 900.0, "keep")],
        "id long, ts double, __ts_unix string",
    )
    out = with_faithful_windows(df, [], "id", "ts", 60.0)
    assert out.filter(F.col("__ts_unix") != "keep").count() == 0

def test_session_borderline_size_estimate_gates_jobfree_via_footers(
    spark, tmp_path, monkeypatch
):
    """r14 (VERDICT r13 item 4): a plain parquet read whose SIZE estimate
    lands in the borderline band (>= threshold/margin) must gate to the
    classic plan with ZERO jobs when the exact parquet FOOTER count is
    below the threshold — the bench w1_session shape no longer pays the
    r13 bounds scan. The margin logic stays intact for frames the footer
    path cannot certify (filters, non-parquet)."""
    from zx_spark.operators import windows

    path = str(tmp_path / "footer_events.parquet")
    spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i * 37 % 5000), "x" * 50) for i in range(500)],
        "id long, g string, ts double, pad string",
    ).write.parquet(path)
    df = spark.read.parquet(path)

    est, trusted = windows._plan_row_stats(df)
    assert est is not None and not trusted
    # force the borderline band: size estimate >= cutoff, exact 500 < MIN
    monkeypatch.setattr(windows, "SESSION_PARALLEL_MIN_ROWS", 10 * est)
    assert windows._exact_parquet_rows(df) == 500
    # a cardinality-changing plan must NOT be footer-certified
    assert windows._exact_parquet_rows(df.filter("id > 10")) is None
    # nor an RDD-backed frame
    assert windows._exact_parquet_rows(
        spark.createDataFrame([(1,)], "id long")
    ) is None

    sc = spark.sparkContext
    sc.setJobGroup("session-footer-gate-probe", "plan construction only")
    try:
        auto = windows.with_session_windows(df, ["g"], "id", "ts", 60.0)
        plan_auto = auto._jdf.queryExecution().optimizedPlan().toString()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("session-footer-gate-probe")
    assert list(jobs) == [], f"borderline footer gate launched jobs: {jobs}"
    classic = windows.with_session_windows(df, ["g"], "id", "ts", 60.0, n_slices=1)
    norm = lambda plan: re.sub(r"#\d+", "#x", plan)
    assert norm(plan_auto) == norm(
        classic._jdf.queryExecution().optimizedPlan().toString()
    )


def test_session_bounds_scan_is_single_pass_with_skew(spark, monkeypatch):
    """ADVICE r13 (low): the skew decision must ride the SAME eager scan
    as the bounds — exactly one job at call time even when the
    high-cardinality branch needs the largest group's count."""
    from zx_spark.operators import windows

    monkeypatch.setattr(windows, "SESSION_PARALLEL_MIN_ROWS", 10)
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 400), float(i)) for i in range(1200)],
        "id long, g string, ts double",
    )
    from pyspark.sql import functions as F

    # reference job count: the fused per-group bounds query, run once
    # (AQE materializes each query stage as its own job, so the number
    # is >1 — what matters is the gate launches EXACTLY this many, i.e.
    # no second aggregate over the input lineage)
    ts = F.col("ts").cast("double")
    sc = spark.sparkContext
    sc.setJobGroup("session-skew-ref", "fused bounds query alone")
    try:
        df.groupBy("g").agg(
            F.count(F.lit(1)).alias("__gn"),
            F.min(ts).alias("__glo"),
            F.max(ts).alias("__ghi"),
        ).agg(
            F.min("__glo"), F.max("__ghi"), F.sum("__gn"),
            F.count(F.lit(1)), F.max("__gn"),
        ).collect()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    ref = len(list(sc.statusTracker().getJobIdsForGroup("session-skew-ref")))

    sc.setJobGroup("session-skew-single-pass", "bounds+skew in one pass")
    try:
        windows.with_session_windows(df, ["g"], "id", "ts", 60.0)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = list(sc.statusTracker().getJobIdsForGroup("session-skew-single-pass"))
    assert len(jobs) == ref, (
        f"gate launched {len(jobs)} jobs vs {ref} for the fused bounds "
        "query alone — a second aggregate re-executed the input lineage"
    )

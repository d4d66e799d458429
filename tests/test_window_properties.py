"""Property-based check (SURVEY §5 item 4): the distributed faithful-window
segmenter must agree with a direct pure-Python transcription of the
reference's window loop on arbitrary inputs — random ids, out-of-order
timestamps, arbitrary granularities."""

from __future__ import annotations

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

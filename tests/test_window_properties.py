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

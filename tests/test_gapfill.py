"""Gap-filling: every bucket in range appears exactly once, observed rows
are untouched, and each fill mode produces its documented values."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from zx_spark.compiler import compile_query
from zx_spark.model import Aggregate, Query, Select
from zx_spark.operators.gapfill import gapfill
from zx_spark.storage import read_table

G = 300.0
BASE = 1_700_000_000 - (1_700_000_000 % 300)  # bucket-aligned epoch


@pytest.fixture(scope="module")
def sparse(spark):
    # Two groups with holes: 'a' observed at buckets 0,1,4 (gap 2-3);
    # 'b' observed at 2,3. Values chosen so linear fill is checkable.
    rows = [
        ("a", BASE + 0 * G, 10.0),
        ("a", BASE + 1 * G, 20.0),
        ("a", BASE + 4 * G, 50.0),
        ("b", BASE + 2 * G, 7.0),
        ("b", BASE + 3 * G, None),  # observed bucket with NULL value
    ]
    return spark.createDataFrame(rows, "g string, window_start double, v double")


def _by_key(df):
    return {
        (r["g"], int((r["window_start"] - BASE) // G)): r["v"] for r in df.collect()
    }


def test_per_group_span_and_modes(sparse):
    # null: holes appear with NULL; observed rows untouched.
    out = _by_key(gapfill(sparse, "window_start", G, ["g"], {"v": "null"}))
    assert set(out) == {("a", 0), ("a", 1), ("a", 2), ("a", 3), ("a", 4),
                        ("b", 2), ("b", 3)}
    assert out[("a", 2)] is None and out[("a", 3)] is None
    assert out[("a", 4)] == 50.0

    zero = _by_key(gapfill(sparse, "window_start", G, ["g"], {"v": "zero"}))
    assert zero[("a", 2)] == 0.0 and zero[("b", 3)] == 0.0

    locf = _by_key(gapfill(sparse, "window_start", G, ["g"], {"v": "locf"}))
    assert locf[("a", 2)] == 20.0 and locf[("a", 3)] == 20.0
    assert locf[("b", 3)] == 7.0  # NULL-valued observed bucket carries too

    lin = _by_key(gapfill(sparse, "window_start", G, ["g"], {"v": "linear"}))
    assert lin[("a", 2)] == pytest.approx(30.0)  # 20 + (50-20) * 1/3
    assert lin[("a", 3)] == pytest.approx(40.0)
    assert lin[("a", 1)] == 20.0  # observed untouched
    assert lin[("b", 3)] is None  # no right neighbor -> stays NULL


def test_explicit_range_snaps_and_pads(sparse):
    out = _by_key(
        gapfill(
            sparse.filter("g = 'a'"), "window_start", G, ["g"], {"v": "locf"},
            start=BASE - 2 * G, end=BASE + 6 * G + 10.0,  # off-multiple end snaps down
        )
    )
    assert set(b for _, b in out) == set(range(-2, 7))
    assert out[("a", -1)] is None          # locf before first observation
    assert out[("a", 6)] == 50.0           # carried past the last


def test_validation(sparse):
    with pytest.raises(ValueError, match="unknown fill mode"):
        gapfill(sparse, "window_start", G, ["g"], {"v": "bogus"})
    with pytest.raises(ValueError, match="not in"):
        gapfill(sparse, "window_start", G, ["g"], {"nope": "null"})
    with pytest.raises(ValueError, match="both start and end"):
        gapfill(sparse, "window_start", G, ["g"], start=0.0)
    with pytest.raises(ValueError, match="max_buckets"):
        gapfill(sparse, "window_start", G, ["g"], {"v": "null"}, max_buckets=3)
    with pytest.raises(ValueError, match="max_buckets"):
        gapfill(sparse, "window_start", G, ["g"], start=0.0, end=1e12)


def _reference_gapfill(obs: dict[int, float | None], mode: str):
    """Pure-Python transcription over one group: obs maps bucket_no ->
    value for observed buckets; returns bucket_no -> filled value over
    the dense [min, max] span."""
    lo, hi = min(obs), max(obs)
    out = {}
    for n in range(lo, hi + 1):
        if n in obs and obs[n] is not None:
            out[n] = obs[n]
            continue
        if mode == "zero":
            out[n] = 0.0
        elif mode == "null":
            out[n] = None
        elif mode == "locf":
            prev = [m for m in obs if m <= n and obs[m] is not None]
            out[n] = obs[max(prev)] if prev else None
        else:  # linear
            prev = [m for m in obs if m <= n and obs[m] is not None]
            nxt = [m for m in obs if m > n and obs[m] is not None]
            if prev and nxt:
                p, q = max(prev), min(nxt)
                out[n] = obs[p] + (obs[q] - obs[p]) * (n - p) / (q - p)
            else:
                out[n] = None
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    obs=st.dictionaries(
        st.integers(min_value=-50, max_value=50),
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=1, max_size=12,
    ),
    mode=st.sampled_from(["null", "zero", "locf", "linear"]),
)
def test_gapfill_matches_reference_model(spark, obs, mode):
    """Distributed gapfill ≡ a pure-Python per-group transcription on
    arbitrary sparse series (random buckets, NULL-valued observations,
    every fill mode)."""
    rows = [("g", BASE + n * G, v) for n, v in obs.items()]
    df = spark.createDataFrame(rows, "g string, window_start double, v double")
    got = _by_key(gapfill(df, "window_start", G, ["g"], {"v": mode}))
    want = _reference_gapfill(obs, mode)
    assert {b for _, b in got} == set(want)
    for (_, b), v in got.items():
        if want[b] is None:
            assert v is None, (b, v)
        else:
            assert v == pytest.approx(want[b]), (b, v, want[b])


def test_gapfill_plan_stays_jvm(sparse):
    """No fill runs in Python and the spine is a distributed Generate,
    not a driver-built range. (Join strategy is AQE's call: broadcast on
    real parquet stats — asserted via the driver-row audit — SMJ on
    statless tiny test frames.)"""
    plan = (
        gapfill(sparse, "window_start", G, ["g"],
                {"v": "linear"})._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Generate explode(sequence" in plan


def test_gapfill_over_compiled_query(spark):
    """End-to-end over the real pipeline: aligned windowed agg -> gapfill
    makes the bucket sequence dense per group."""
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    q = Query(
        selects=[Select("value", Aggregate.SUM)],
        group_by=["event_type"],
        granularity_s=3600.0,
    )
    agg = compile_query(ev, q, id_col="event_id", rate_col=None)
    agg = agg.withColumn(
        "bucket", (F.floor(F.col("window_start") / 3600) * 3600).cast("double")
    )
    filled = gapfill(agg, "bucket", 3600.0, ["g_event_type"], {"sum__value": "zero"})
    per_group = (
        filled.groupBy("g_event_type")
        .agg(
            F.count("*").alias("n"),
            ((F.max("bucket") - F.min("bucket")) / 3600 + 1).alias("span"),
        )
        .collect()
    )
    assert per_group
    for r in per_group:
        assert r["n"] == r["span"]  # dense: one row per bucket in span
    assert filled.filter(F.col("sum__value").isNull()).count() == 0

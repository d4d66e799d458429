"""Derived series verbs (operators/series.py): delta/increase/rate
golden values incl. counter resets and gaps, moving average, grouping
isolation, plan shape (single window exchange, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zx_spark.operators.series import (
    counter_increase,
    counter_rate,
    moving_avg,
    series_delta,
)

ROWS = [
    # (group, t, v): counter grows 10→25, resets to 3, grows to 9
    ("a", 0.0, 10.0),
    ("a", 60.0, 25.0),
    ("a", 120.0, 3.0),
    ("a", 180.0, 9.0),
    ("b", 0.0, 5.0),
    ("b", 60.0, None),
    ("b", 120.0, 7.0),
]


@pytest.fixture()
def series(spark):
    return spark.createDataFrame(ROWS, "g string, t double, v double")


def _by_key(df, col):
    return {(r["g"], r["t"]): r[col] for r in df.collect()}


def test_delta(spark, series):
    d = _by_key(series_delta(series, "v", "t", ["g"]), "v_delta")
    assert d[("a", 0.0)] is None  # first sample
    assert d[("a", 60.0)] == 15.0
    assert d[("a", 120.0)] == -22.0  # raw delta keeps the reset visible
    assert d[("b", 60.0)] is None and d[("b", 120.0)] is None  # NULL gap


def test_counter_increase_reset(spark, series):
    d = _by_key(counter_increase(series, "v", "t", ["g"]), "v_increase")
    assert d[("a", 60.0)] == 15.0
    assert d[("a", 120.0)] == 3.0  # reset: increase since reset = current
    assert d[("a", 180.0)] == 6.0
    assert d[("a", 0.0)] is None


def test_counter_rate(spark, series):
    d = _by_key(counter_rate(series, "v", "t", ["g"]), "v_rate")
    assert d[("a", 60.0)] == 0.25  # 15 / 60s
    assert d[("a", 120.0)] == 0.05  # reset: 3 / 60s
    assert d[("a", 0.0)] is None


def test_rate_refuses_nonincreasing_time(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 10.0, 2.0)], "g string, t double, v double"
    )
    vals = [r["v_rate"] for r in counter_rate(df, "v", "t", ["g"]).collect()]
    assert vals == [None, None]  # t not strictly increasing -> no rate


def test_moving_avg(spark, series):
    d = _by_key(moving_avg(series, "v", "t", ["g"], n=2), "v_ma2")
    assert d[("a", 60.0)] == 17.5
    assert d[("b", 60.0)] == 5.0  # NULL ignored like SQL AVG
    with pytest.raises(ValueError):
        moving_avg(series, "v", "t", ["g"], n=0)


def test_compose_with_gapfill(spark):
    """gapfill then rate: the generated zero-filled bucket yields a reset
    (0 < prev), and the rate after it counts from zero — gaps never
    produce NULL-poisoned rates on a filled series."""
    from zx_spark.operators.gapfill import gapfill

    agg = spark.createDataFrame(
        [("a", 0.0, 10.0), ("a", 120.0, 4.0)], "g string, bucket double, v double"
    )
    filled = gapfill(agg, "bucket", 60.0, ["g"], {"v": "zero"})
    d = _by_key(
        counter_rate(filled, "v", "bucket", ["g"]).withColumnRenamed("bucket", "t"),
        "v_rate",
    )
    assert d[("a", 60.0)] == 0.0  # 0 after 10 -> reset to 0, rate 0
    assert d[("a", 120.0)] == pytest.approx(4.0 / 60.0)


def test_plan_single_window_no_python(spark, series):
    df = counter_rate(
        series_delta(series, "v", "t", ["g"]), "v", "t", ["g"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # both verbs share one (g) sort
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_rolling_zscore_and_anomaly_flag(spark):
    from zx_spark.operators.series import flag_anomalies, rolling_zscore

    rows = [("a", float(t), 10.0) for t in range(6)] + [("a", 6.0, 100.0), ("a", 7.0, 10.0)]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    z = {r["t"]: r["v_zscore"] for r in rolling_zscore(df, "v", "t", ["g"], n=5).collect()}
    assert z[0.0] is None  # no trailing window
    assert z[5.0] is None  # flat window: sd == 0 -> NULL, not inf
    assert z[6.0] is None  # judged against flat baseline -> sd 0
    assert z[7.0] is not None and abs(z[7.0]) < 3  # spike inflates sd
    flags = {
        r["t"]: r["is_anomaly"]
        for r in flag_anomalies(df, "v", "t", ["g"], n=5, threshold=2.0).collect()
    }
    assert flags[0.0] is False and flags[5.0] is False
    # mixed window: put the spike where the baseline has variance
    rows2 = [("a", float(t), float(10 + (t % 3))) for t in range(6)] + [("a", 6.0, 100.0)]
    df2 = spark.createDataFrame(rows2, "g string, t double, v double")
    f2 = {r["t"]: r["is_anomaly"] for r in flag_anomalies(df2, "v", "t", ["g"], n=5, threshold=3.0).collect()}
    assert f2[6.0] is True and not any(v for t, v in f2.items() if t < 6.0)
    import pytest as _pt

    with _pt.raises(ValueError):
        rolling_zscore(df, "v", "t", ["g"], n=1)


def test_ewma_matches_python_twin_and_validates(spark):
    import pytest
    from zx_spark.operators.series import ewma

    rows = [
        ("g", t, [None, 5.0, 8.0, 2.0, 11.0, None, 3.0, 7.0][t])
        for t in range(8)
    ]
    df = spark.createDataFrame(rows, "g: string, t: long, v: double")
    got = {
        r["t"]: r["v_ewma"]
        for r in ewma(df, "v", "t", ["g"], alpha=0.4, n=4).collect()
    }

    def py_ewma(vals, alpha):
        num = den = 0.0
        w = 1.0
        for x in vals:  # newest first
            num += w * x
            den += w
            w *= 1 - alpha
        return num / den if den else None

    series = [r[2] for r in rows]
    for t in range(8):
        frame = [x for x in series[max(0, t - 3): t + 1] if x is not None]
        want = py_ewma(list(reversed(frame)), 0.4)
        if want is None:
            assert got[t] is None
        else:
            assert got[t] == pytest.approx(want, rel=1e-12), t
    # recency bias: after a jump the EWMA sits closer to the new value
    # than the plain mean does
    jump = [1.0] * 6 + [10.0]
    dfj = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(jump)], "g: string, t: long, v: double"
    )
    last = ewma(dfj, "v", "t", ["g"], alpha=0.5, n=7).orderBy("t").collect()[-1]
    assert last["v_ewma"] > (sum(jump) / len(jump))
    with pytest.raises(ValueError):
        ewma(df, "v", "t", alpha=0.0)
    with pytest.raises(ValueError):
        ewma(df, "v", "t", n=0)


def test_rolling_quantile_matches_python(spark):
    import pytest
    from zx_spark.operators.series import rolling_quantile

    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g: string, t: long, v: double"
    )
    got = {
        r["t"]: r["med"]
        for r in rolling_quantile(df, "v", "t", ["g"], q=0.5, n=3, out_col="med").collect()
    }
    for t in range(len(vals)):
        frame = vals[max(0, t - 2): t + 1]
        # Spark's exact percentile interpolates like numpy linear
        import numpy as np

        want = float(np.percentile(frame, 50))
        assert got[t] == pytest.approx(want, rel=1e-12), t
    with pytest.raises(ValueError):
        rolling_quantile(df, "v", "t", q=1.5)


def test_robust_zscore_resists_prior_spike(spark):
    """After a huge earlier spike, the NEXT spike still scores high
    under MAD (the mean/stddev z-score is masked by the inflated
    stddev)."""
    import pytest
    from zx_spark.operators.series import robust_zscore, rolling_zscore

    vals = [10.0, 10.5, 9.5, 10.0, 500.0, 10.0, 10.5, 9.5, 10.0, 480.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g: string, t: long, v: double"
    )
    rz = {r["t"]: r["v_rzscore"] for r in robust_zscore(df, "v", "t", ["g"], n=8).collect()}
    z = {r["t"]: r["v_zscore"] for r in rolling_zscore(df, "v", "t", ["g"], n=8).collect()}
    # the second spike at t=9: robust score stays large, classic score
    # is diluted by the first spike sitting in its window
    assert rz[9] > 10 * max(z[9], 0.1)
    # calm rows don't flag
    assert abs(rz[7]) < 3
    with pytest.raises(ValueError):
        robust_zscore(df, "v", "t", n=1)


# ------------------------------------------------ CUSUM (r7 s2)


def _cusum_py(series, target, k):
    """Twin: [(o, v)] sorted → [(o, sp, sm)]; NULL holds both sums."""
    sp = sm = 0.0
    out = []
    for o, v in series:
        if v is not None:
            sp = max(0.0, sp + (v - target) - k)
            sm = max(0.0, sm - (v - target) - k)
        out.append((o, sp, sm))
    return out


def test_cusum_matches_twin_and_flags_shift(spark):
    """Upward step, downward step and a NULL gap — fold equals the
    python recurrence exactly; the flag trips only after the shift
    accumulates past h (never on single-bucket noise)."""
    from zx_spark.operators.series import cusum_flags

    vals = [1.0] * 8 + [None, 4.0] + [2.5] * 5 + [-1.0] * 6
    rows = [("g", float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    got = {
        r["t"]: (r["v_cusum_hi"], r["v_cusum_lo"], r["v_cusum_flag"])
        for r in cusum_flags(df, "v", "t", ["g"], target=1.0, k=0.5, h=4.0).collect()
    }
    want = _cusum_py([(float(i), v) for i, v in enumerate(vals)], 1.0, 0.5)
    assert len(got) == len(vals)
    for o, sp, sm in want:
        gh, gl, gf = got[o]
        assert abs(gh - sp) < 1e-12 and abs(gl - sm) < 1e-12, o
        assert gf == (sp > 4.0 or sm > 4.0), o
    # the single 4.0 spike alone does not flag; the sustained 2.5 run does
    assert not got[9.0][2]
    assert got[14.0][2]
    # the late negative run trips the LOW side
    assert got[20.0][1] > 4.0 and got[20.0][2]


def test_cusum_per_group_and_passthrough_columns(spark):
    from zx_spark.operators.series import cusum_flags

    rows = [
        ("a", 0.0, 10.0, "x0"), ("a", 1.0, 10.0, "x1"),
        ("b", 0.0, 0.0, "y0"), ("b", 1.0, 0.0, "y1"),
    ]
    df = spark.createDataFrame(rows, "g string, t double, v double, tag string")
    out = {(r["g"], r["t"]): r for r in cusum_flags(
        df, "v", "t", ["g"], target=5.0, k=0.5, h=3.0).collect()}
    assert out[("a", 1.0)]["v_cusum_hi"] == 9.0  # 4.5 + 4.5
    assert out[("b", 1.0)]["v_cusum_lo"] == 9.0
    assert out[("a", 0.0)]["tag"] == "x0"  # passthrough survives the fold
    assert out[("b", 1.0)]["tag"] == "y1"


def test_cusum_matches_duckdb_recursive_cte(spark):
    """Cross-engine: the fold equals a DuckDB RECURSIVE CTE walking the
    same recurrence step by step (the formulation a driver arm oracle
    would use)."""
    import duckdb
    import numpy as np

    from zx_spark.operators.series import cusum_flags

    rng = np.random.RandomState(9)
    rows = [
        (g, float(t), round(float(rng.normal(2.0 if (g == "b" and t > 10) else 0.0, 1.0)) * 64) / 64)
        for g in ("a", "b") for t in range(24)
    ]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    got = {
        (r["g"], r["t"]): (round(r["v_cusum_hi"], 6), round(r["v_cusum_lo"], 6))
        for r in cusum_flags(df, "v", "t", ["g"], k=0.5, h=4.0).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE s (g VARCHAR, t DOUBLE, v DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
    want = dict(
        (
            (r[0], r[1]),
            (r[2], r[3]),
        )
        for r in con.sql(
            "WITH RECURSIVE o AS (SELECT g, t, v, row_number() OVER "
            " (PARTITION BY g ORDER BY t) AS rn FROM s), "
            "c AS ("
            " SELECT g, t, v, rn, greatest(0.0, (v - 0.0) - 0.5) AS sp, "
            "   greatest(0.0, -(v - 0.0) - 0.5) AS sm FROM o WHERE rn = 1 "
            " UNION ALL "
            " SELECT o.g, o.t, o.v, o.rn, "
            "   greatest(0.0, c.sp + (o.v - 0.0) - 0.5), "
            "   greatest(0.0, c.sm - (o.v - 0.0) - 0.5) "
            " FROM c JOIN o ON o.g = c.g AND o.rn = c.rn + 1) "
            "SELECT g, t, round(sp, 6), round(sm, 6) FROM c"
        ).fetchall()
    )
    assert got == want

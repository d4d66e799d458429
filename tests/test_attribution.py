"""Attribution (operators/attribution.py): hand journeys for all three
models, window cutoff, tie-break determinism, python brute-force twin
on the driver events, linear_credit exactness, and DuckDB parity."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _ev(spark, rows):
    """rows: (event_id, minutes, user, type)"""
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), u, t) for (i, m, u, t) in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


TOUCHES = ["ad", "email", "social"]


def test_hand_journey_all_models(spark):
    """u1: ad@0, email@10, buy@20 — last=email, first=ad, linear k=2.
    u2: social@0, buy@5, buy@8 — both conversions credit social (the
    second conversion's preceding window includes the first buy, which
    is not a touch). u3: buy@0 with no touch — unattributed."""
    from zx_spark.operators.attribution import (
        attributed_conversions,
        attribution_report,
    )

    rows = [
        (1, 0, 1, "ad"), (2, 10, 1, "email"), (3, 20, 1, "buy"),
        (4, 0, 2, "social"), (5, 5, 2, "buy"), (6, 8, 2, "buy"),
        (7, 0, 3, "buy"),
    ]
    ev = _ev(spark, rows)
    last = {(r["conv_id"], r["channel"]) for r in attributed_conversions(
        ev, TOUCHES, "buy", model="last_touch").collect()}
    assert last == {(3, "email"), (5, "social"), (6, "social")}
    first = {(r["conv_id"], r["channel"]) for r in attributed_conversions(
        ev, TOUCHES, "buy", model="first_touch").collect()}
    assert first == {(3, "ad"), (5, "social"), (6, "social")}
    lin = {(r["conv_id"], r["channel"], r["k"]) for r in attributed_conversions(
        ev, TOUCHES, "buy", model="linear").collect()}
    assert lin == {
        (3, "ad", 2), (3, "email", 2), (5, "social", 1), (6, "social", 1)
    }
    rep = {r["channel"]: r["conversions"] for r in attribution_report(
        ev, TOUCHES, "buy", model="last_touch").collect()}
    assert rep == {"email": 1, "social": 2}


def test_window_cutoff_and_tiebreak(spark):
    """A touch older than window_s does not qualify; equal timestamps
    break by event_id (higher id = later for last_touch)."""
    from zx_spark.operators.attribution import attributed_conversions

    rows = [
        (1, 0, 1, "ad"), (2, 1000, 1, "buy"),       # 1000 min > 600 window
        (10, 0, 2, "ad"), (11, 0, 2, "email"), (12, 5, 2, "buy"),
    ]
    ev = _ev(spark, rows)
    got = {(r["conv_id"], r["channel"]) for r in attributed_conversions(
        ev, TOUCHES, "buy", window_s=600 * 60, model="last_touch").collect()}
    # conv 2 unattributed (ad outside window); conv 12 → email (id 11 > 10)
    assert got == {(12, "email")}
    first = {(r["conv_id"], r["channel"]) for r in attributed_conversions(
        ev, TOUCHES, "buy", window_s=600 * 60, model="first_touch").collect()}
    assert first == {(12, "ad")}


def test_linear_credit_from_integer_report(spark):
    from zx_spark.operators.attribution import linear_credit

    rep = spark.createDataFrame(
        [("ad", 1, 4), ("ad", 2, 6), ("email", 2, 2), ("email", 4, 2)],
        "channel string, k int, touches long",
    )
    got = {r["channel"]: r["credit"] for r in linear_credit(rep).collect()}
    assert got["ad"] == 7.0        # 4/1 + 6/2
    assert got["email"] == 1.5     # 2/2 + 2/4


def _brute(rows, touches, conv, window_s, model):
    """Python twin over (id, ts_min, user, type) rows."""
    out = []
    by_user = {}
    for r in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(r[2], []).append(r)
    for u, evs in by_user.items():
        for i, (eid, m, _, t) in enumerate(evs):
            if t != conv:
                continue
            prior = [
                p for p in evs[:i]
                if p[3] in touches and (m - p[1]) * 60.0 <= window_s
            ]
            if not prior:
                continue
            if model == "last_touch":
                p = max(prior, key=lambda p: (p[1], p[0]))
                out.append((eid, p[3]))
            elif model == "first_touch":
                p = min(prior, key=lambda p: (p[1], p[0]))
                out.append((eid, p[3]))
            else:
                for p in prior:
                    out.append((eid, p[3], len(prior)))
    return set(out)


def test_matches_brute_force_on_driver_events(spark):
    """Real driver events (sf0.001): all three models equal the python
    twin exactly."""
    from zx_spark.operators.attribution import attributed_conversions
    from zx_spark.storage import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    rows = [
        (r["event_id"], r["ts"].timestamp() / 60.0, r["user_id"], r["event_type"])
        for r in ev.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        ).collect()
    ]
    touches = ["view", "click"]
    for model in ("last_touch", "first_touch", "linear"):
        got = set(
            (
                (r["conv_id"], r["channel"], r["k"])
                if model == "linear"
                else (r["conv_id"], r["channel"])
            )
            for r in attributed_conversions(
                ev, touches, "purchase", window_s=7200.0, model=model
            ).collect()
        )
        want = _brute(rows, touches, "purchase", 7200.0, model)
        assert got == want, model


def test_matches_duckdb_correlated_subquery(spark):
    """last_touch == the DuckDB ORDER BY ts DESC, id DESC LIMIT 1
    correlated formulation (the shape a driver arm oracle would use)."""
    import duckdb
    import pandas as pd

    from zx_spark.operators.attribution import attributed_conversions

    rows = [
        (1, 0, 1, "ad"), (2, 3, 1, "email"), (3, 3, 1, "social"),
        (4, 9, 1, "buy"), (5, 2, 2, "ad"), (6, 700, 2, "buy"),
        (7, 1, 3, "buy"),
    ]
    ev = _ev(spark, rows)
    got = {(r["conv_id"], r["channel"]) for r in attributed_conversions(
        ev, TOUCHES, "buy", window_s=600 * 60, model="last_touch").collect()}
    pdf = pd.DataFrame(
        [(i, float(m * 60), u, t) for (i, m, u, t) in rows],
        columns=["event_id", "tsec", "user_id", "event_type"],
    )
    con = duckdb.connect()
    con.register("e", pdf)
    want = set(
        con.sql(
            "SELECT c.event_id, (SELECT t.event_type FROM e t "
            " WHERE t.user_id = c.user_id AND t.event_type IN ('ad','email','social') "
            " AND (t.tsec, t.event_id) < (c.tsec, c.event_id) "
            " AND c.tsec - t.tsec <= 36000 "
            " ORDER BY t.tsec DESC, t.event_id DESC LIMIT 1) AS ch "
            "FROM e c WHERE c.event_type = 'buy' AND ch IS NOT NULL"
        ).fetchall()
    )
    assert got == want


def test_validates_args(spark):
    from zx_spark.operators.attribution import attributed_conversions

    ev = _ev(spark, [(1, 0, 1, "ad")])
    with pytest.raises(ValueError, match="model"):
        attributed_conversions(ev, TOUCHES, "buy", model="shapley")
    with pytest.raises(ValueError, match="touch_types"):
        attributed_conversions(ev, [], "buy")


def test_subsecond_boundary_all_models_agree(spark):
    """Regression (r8 ADVICE): a touch EXACTLY at the lookback boundary
    with sub-second timestamps. 0.7s stored as µs is exact, but as a
    double it is 0.699999..., and truncating *1e6 to long dropped the
    touch from the RANGE frame (first/linear) while last_touch's raw
    double math kept it — the three models disagreed on the same data.
    All window math now runs on rounded-µs longs: every model must
    include the boundary touch."""
    from zx_spark.operators.attribution import attributed_conversions

    ev = spark.createDataFrame(
        [
            (1, T0 + dt.timedelta(seconds=0.7), 1, "ad"),
            (2, T0 + dt.timedelta(seconds=1.7), 1, "buy"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    for model in ("last_touch", "first_touch", "linear"):
        got = {(r["conv_id"], r["channel"]) for r in attributed_conversions(
            ev, TOUCHES, "buy", window_s=1.0, model=model).collect()}
        assert got == {(2, "ad")}, model
    # and one µs PAST the boundary is excluded by every model
    ev2 = spark.createDataFrame(
        [
            (1, T0 + dt.timedelta(seconds=0.699999), 1, "ad"),
            (2, T0 + dt.timedelta(seconds=1.7), 1, "buy"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    for model in ("last_touch", "first_touch", "linear"):
        got = attributed_conversions(
            ev2, TOUCHES, "buy", window_s=1.0, model=model).count()
        assert got == 0, model


def test_lag_stats_reject_linear(spark):
    """linear emits one row per (conversion, touch) — per-channel lag
    stats over it would be touch-weighted and the count mislabeled, so
    conversion_lag_stats refuses (r8 ADVICE)."""
    from zx_spark.operators.attribution import conversion_lag_stats

    ev = _ev(spark, [(1, 0, 1, "ad"), (2, 5, 1, "buy")])
    with pytest.raises(ValueError, match="linear"):
        conversion_lag_stats(ev, TOUCHES, "buy", model="linear")


def test_conversion_lag_stats(spark):
    """Integer-µs lags: mean and exact median per channel, hand-checked
    (last-touch: conv 3 lags 10min behind email; conv 5/6 lag 5/8min
    behind social)."""
    from zx_spark.operators.attribution import conversion_lag_stats

    rows = [
        (1, 0, 1, "ad"), (2, 10, 1, "email"), (3, 20, 1, "buy"),
        (4, 0, 2, "social"), (5, 5, 2, "buy"), (6, 8, 2, "buy"),
    ]
    ev = _ev(spark, rows)
    got = {r["channel"]: r for r in conversion_lag_stats(
        ev, TOUCHES, "buy", model="last_touch").collect()}
    m = 60_000_000  # one minute in µs
    assert got["email"]["conversions"] == 1
    assert got["email"]["mean_lag_us"] == 10 * m
    assert got["email"]["p50_lag_us"] == 10 * m
    assert got["social"]["conversions"] == 2
    assert got["social"]["mean_lag_us"] == 6.5 * m
    assert got["social"]["p50_lag_us"] == 6.5 * m  # midpoint of 5, 8


def test_attributed_conversions_expose_touch_ts(spark):
    """touch_ts rides along on every model so lag analytics compose."""
    from zx_spark.operators.attribution import attributed_conversions

    rows = [(1, 0, 1, "ad"), (2, 10, 1, "email"), (3, 20, 1, "buy")]
    ev = _ev(spark, rows)
    for model in ("last_touch", "first_touch", "linear"):
        out = attributed_conversions(ev, TOUCHES, "buy", model=model).collect()
        assert all(r["touch_ts"] is not None and r["touch_ts"] < r["conv_ts"]
                   for r in out), model


def test_position_report_hand_journey(spark):
    """u1: ad@0, email@10, social@15, buy@20 — k=3: ad=first,
    email=middle, social=last. u2: ad@0, buy@5 — k=1: ad=first.
    u3: email@0, ad@3, buy@4 — k=2: email=first, ad=last."""
    from zx_spark.operators.attribution import position_credit, position_report

    rows = [
        (1, 0, 1, "ad"), (2, 10, 1, "email"), (3, 15, 1, "social"),
        (4, 20, 1, "buy"),
        (5, 0, 2, "ad"), (6, 5, 2, "buy"),
        (7, 0, 3, "email"), (8, 3, 3, "ad"), (9, 4, 3, "buy"),
    ]
    rep = position_report(_ev(spark, rows), TOUCHES, "buy")
    got = {(r["channel"], r["role"], r["k"]): r["touches"] for r in rep.collect()}
    assert got == {
        ("ad", "first", 3): 1, ("email", "middle", 3): 1,
        ("social", "last", 3): 1, ("ad", "first", 1): 1,
        ("email", "first", 2): 1, ("ad", "last", 2): 1,
    }
    credit = {r["channel"]: r["credit"] for r in position_credit(rep).collect()}
    # ad: 0.4 (first, k=3) + 1.0 (k=1) + 0.5 (last, k=2) = 1.9
    # email: 0.2 (middle of 3) + 0.5 (first, k=2) = 0.7; social: 0.4
    assert credit == {"ad": 1.9, "email": 0.7, "social": 0.4}


def test_position_credit_validates(spark):
    from zx_spark.operators.attribution import (
        attribution_report,
        conversion_lag_stats,
        position_credit,
        position_report,
    )

    ev = _ev(spark, [(1, 0, 1, "ad"), (2, 5, 1, "buy")])
    rep = position_report(ev, TOUCHES, "buy")
    with pytest.raises(ValueError, match="w_first"):
        position_credit(rep, w_first=0.6, w_last=0.5)
    with pytest.raises(ValueError, match="position_report"):
        attribution_report(ev, TOUCHES, "buy", model="position")
    with pytest.raises(ValueError, match="position"):
        conversion_lag_stats(ev, TOUCHES, "buy", model="position")


def test_decay_report_hand_journey(spark):
    """half_life = 10 min: a touch 0-9m59s before the conversion is
    bucket 0, 10-19m59s bucket 1, etc. u1: ad@0 (lag 25m → k=2),
    email@20 (lag 5m → k=0), buy@25."""
    from zx_spark.operators.attribution import decay_credit, decay_report

    rows = [(1, 0, 1, "ad"), (2, 20, 1, "email"), (3, 25, 1, "buy")]
    rep = decay_report(
        _ev(spark, rows), TOUCHES, "buy", half_life_s=600.0
    )
    got = {(r["channel"], r["decay_k"]): r["touches"] for r in rep.collect()}
    assert got == {("ad", 2): 1, ("email", 0): 1}
    credit = {r["channel"]: r["credit"] for r in decay_credit(rep).collect()}
    assert credit == {"ad": 0.25, "email": 1.0}
    with pytest.raises(ValueError, match="half_life"):
        decay_report(_ev(spark, rows), TOUCHES, "buy", half_life_s=0)
    # r8 review: a sub-µs half-life rounds to hl_us=0 and would
    # integer-divide by zero (NULL buckets, silently wrong) — fail fast
    with pytest.raises(ValueError, match="microsecond"):
        decay_report(_ev(spark, rows), TOUCHES, "buy", half_life_s=1e-7)


def test_far_future_timestamps_stay_exact(spark):
    """r8 review: the seconds-as-double round trip is only exact below
    ~2^51 µs (~2041). Timestamp inputs now take unix_micros directly —
    year-2100 events with a sub-second window boundary must behave
    exactly like the 2024 fixture (all models agree, boundary touch
    included; one µs past, excluded)."""
    from zx_spark.operators.attribution import attributed_conversions

    t0 = dt.datetime(2100, 6, 1, tzinfo=dt.timezone.utc)
    ev = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(seconds=0.7), 1, "ad"),
            (2, t0 + dt.timedelta(seconds=1.7), 1, "buy"),
            (3, t0 + dt.timedelta(seconds=9.299999), 2, "ad"),
            (4, t0 + dt.timedelta(seconds=10.3), 2, "buy"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    for model in ("last_touch", "first_touch", "linear"):
        got = {(r["conv_id"], r["channel"]) for r in attributed_conversions(
            ev, TOUCHES, "buy", window_s=1.0, model=model).collect()}
        assert got == {(2, "ad")}, model  # u2's touch is 1.000001s old
    # and the emitted µs lag is exactly 1s
    rows = attributed_conversions(ev, TOUCHES, "buy", window_s=1.0).collect()
    assert rows[0]["conv_tm"] - rows[0]["touch_tm"] == 1_000_000


def _brute_position(rows, touches, conv, window_s):
    """(channel, role, k) -> touches twin."""
    from collections import Counter

    out = Counter()
    by_user = {}
    for r in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(r[2], []).append(r)
    for evs in by_user.values():
        for i, (eid, m, _, t) in enumerate(evs):
            if t != conv:
                continue
            prior = [p for p in evs[:i]
                     if p[3] in touches and (m - p[1]) * 60.0 <= window_s]
            k = len(prior)
            for j, p in enumerate(prior):
                role = ("first" if j == 0
                        else "last" if j == k - 1 else "middle")
                out[(p[3], role, k)] += 1
    return dict(out)


def _brute_decay(rows, touches, conv, window_s, half_life_s):
    """(channel, decay_k) -> touches twin."""
    from collections import Counter

    out = Counter()
    by_user = {}
    for r in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(r[2], []).append(r)
    for evs in by_user.values():
        for i, (eid, m, _, t) in enumerate(evs):
            if t != conv:
                continue
            for p in evs[:i]:
                if p[3] in touches and (m - p[1]) * 60.0 <= window_s:
                    lag_us = int(round((m - p[1]) * 60.0 * 1e6))
                    out[(p[3], lag_us // int(round(half_life_s * 1e6)))] += 1
    return dict(out)


def test_position_and_decay_match_brute_on_driver_events(spark):
    from zx_spark.operators.attribution import decay_report, position_report
    from zx_spark.storage import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    rows = [
        (r["event_id"], r["ts"].timestamp() / 60.0, r["user_id"], r["event_type"])
        for r in ev.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        ).collect()
    ]
    touches = ["view", "click"]
    got_p = {
        (r["channel"], r["role"], r["k"]): r["touches"]
        for r in position_report(ev, touches, "purchase", window_s=7200.0).collect()
    }
    assert got_p == _brute_position(rows, touches, "purchase", 7200.0)
    got_d = {
        (r["channel"], r["decay_k"]): r["touches"]
        for r in decay_report(
            ev, touches, "purchase", window_s=7200.0, half_life_s=1800.0
        ).collect()
    }
    assert got_d == _brute_decay(rows, touches, "purchase", 7200.0, 1800.0)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),                     # user
            st.integers(0, 50),                    # minute
            st.sampled_from(["ad", "email", "buy", "noise"]),
        ),
        min_size=1,
        max_size=30,
    ),
    window_min=st.sampled_from([5, 20, 100]),
    model=st.sampled_from(["last_touch", "first_touch", "linear"]),
)
def test_property_matches_brute(spark, events, window_min, model):
    """Random journeys (duplicate timestamps, interleaved users, noise
    events, every window/model) equal the python twin exactly."""
    from zx_spark.operators.attribution import attributed_conversions

    rows = [(i, m, u, t) for i, (u, m, t) in enumerate(events)]
    ev = _ev(spark, rows)
    ws = window_min * 60.0
    got = set(
        (
            (r["conv_id"], r["channel"], r["k"])
            if model == "linear"
            else (r["conv_id"], r["channel"])
        )
        for r in attributed_conversions(
            ev, ["ad", "email"], "buy", window_s=ws, model=model
        ).collect()
    )
    want = _brute(rows, ["ad", "email"], "buy", ws, model)
    assert got == want, (model, window_min)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 50),
            st.sampled_from(["ad", "email", "buy", "noise"]),
        ),
        min_size=1,
        max_size=30,
    ),
    window_min=st.sampled_from([5, 20, 100]),
)
def test_property_position_decay_match_brute(spark, events, window_min):
    """Random journeys: the position role/k grid and the decay bucket
    grid both equal their python twins exactly."""
    from zx_spark.operators.attribution import decay_report, position_report

    rows = [(i, m, u, t) for i, (u, m, t) in enumerate(events)]
    ev = _ev(spark, rows)
    ws = window_min * 60.0
    got_p = {
        (r["channel"], r["role"], r["k"]): r["touches"]
        for r in position_report(ev, ["ad", "email"], "buy", window_s=ws).collect()
    }
    assert got_p == _brute_position(rows, ["ad", "email"], "buy", ws)
    got_d = {
        (r["channel"], r["decay_k"]): r["touches"]
        for r in decay_report(
            ev, ["ad", "email"], "buy", window_s=ws, half_life_s=420.0
        ).collect()
    }
    assert got_d == _brute_decay(rows, ["ad", "email"], "buy", ws, 420.0)

"""Funnels and retention cohorts: hand-built journeys with known
outcomes, a pure-Python reference sweep over the real driver events,
DuckDB parity for the retention grid, and plan shape (one shuffle)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from zx_spark.operators.funnel import funnel_counts, funnel_steps, retention_cohorts

SF = "/root/testdata/sf0.01"
STEPS = ["view", "click", "purchase"]


def _py_funnel(events, steps, within_s=None):
    """Reference funnel. Without a horizon: earliest-completion greedy.
    With one: the max-anchor DP (slot 0 re-anchors on every step-1
    event; deeper slots adopt a feasible later-anchored lineage) —
    mirrors funnel_steps exactly."""
    idx = {s: i for i, s in enumerate(steps)}
    k = len(steps)
    # sort by (t, step INDEX) — the operators sort structs of
    # (__t, __s), so same-timestamp ties order by index, not step name
    ordered = sorted(
        ((t, idx[s]) for t, s in events if s in idx), key=lambda e: e
    )
    if within_s is None:
        state = [None] * k
        for t, i in ordered:
            if state[i] is not None:
                continue
            if i > 0 and (state[i - 1] is None or not t > state[i - 1]):
                continue
            state[i] = t
        done = 0
        for x in state:
            if x is None:
                break
            done += 1
        return done, state
    anchors = [None] * k
    times = [None] * k
    for t, i in ordered:
        if i == 0:
            anchors[0] = times[0] = t
            continue
        if anchors[i - 1] is None:
            continue
        if not (t > times[i - 1] and t <= anchors[i - 1] + within_s):
            continue
        if anchors[i] is None or anchors[i - 1] > anchors[i]:
            anchors[i] = anchors[i - 1]
            times[i] = t
    done = 0
    for x in times:
        if x is None:
            break
        done += 1
    return done, times


def test_funnel_hand_cases(spark):
    rows = [
        # u1: full journey in order
        (1, 10.0, "view"), (1, 20.0, "click"), (1, 30.0, "purchase"),
        # u2: click before view -> only view counts, then purchase needs click after view
        (2, 10.0, "click"), (2, 20.0, "view"), (2, 30.0, "purchase"),
        # u3: same-timestamp click (strict ordering -> not counted)
        (3, 10.0, "view"), (3, 10.0, "click"),
        # u4: nothing relevant
        (4, 5.0, "error"),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: double, event_type: string")
    got = {
        r["user_id"]: (r["steps_completed"], r["step_ts"])
        for r in funnel_steps(df, STEPS).collect()
    }
    assert got[1] == (3, [10.0, 20.0, 30.0])
    assert got[2][0] == 1 and got[2][1] == [20.0, None, None]
    assert got[3] == (1, [10.0, None, None])
    assert 4 not in got  # no funnel events at all
    # horizon: u1 with within_s=15 loses the purchase (30 > 10+15)
    h = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(df, STEPS, within_s=15.0).collect()
    }
    assert h[1] == 2
    # RE-ANCHORING (the windowed-funnel case): the first attempt
    # expires, the user starts over and converts — counts
    rows2 = [
        (9, 0.0, "view"), (9, 50.0, "view"), (9, 55.0, "click"),
        (9, 58.0, "purchase"),
        # u10: only the SECOND view anchors a valid click
        (10, 0.0, "view"), (10, 20.0, "view"), (10, 25.0, "click"),
    ]
    df2 = spark.createDataFrame(rows2, "user_id: long, ts: double, event_type: string")
    h2 = {
        r["user_id"]: (r["steps_completed"], r["step_ts"])
        for r in funnel_steps(df2, STEPS, within_s=10.0).collect()
    }
    assert h2[9][0] == 3 and h2[9][1] == [50.0, 55.0, 58.0]
    assert h2[10][0] == 2 and h2[10][1][0] == 20.0
    # the Python twin agrees on these
    for uid in (9, 10):
        evs = [(t, s) for u, t, s in rows2 if u == uid]
        assert _py_funnel(evs, STEPS, within_s=10.0)[0] == h2[uid][0]
    with pytest.raises(ValueError):
        funnel_steps(df, [])
    with pytest.raises(ValueError):
        funnel_steps(df, ["a", "a"])
    with pytest.raises(ValueError):
        funnel_steps(df, STEPS, within_s=0)


def test_funnel_matches_python_reference_on_driver_events(spark):
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("double").alias("ts"), "event_type"
    )
    got = {
        r["user_id"]: (r["steps_completed"], [x for x in r["step_ts"]])
        for r in funnel_steps(ev, STEPS).collect()
    }
    raw = {}
    for r in ev.collect():
        raw.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    for u, evs in raw.items():
        want_done, want_state = _py_funnel(evs, STEPS)
        if all(s not in STEPS for _, s in evs):
            assert u not in got
            continue
        assert got[u][0] == want_done, u
        assert got[u][1] == want_state, u
    # horizon mode: the max-anchor DP agrees with its twin over every
    # driver user too
    goth = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(ev, STEPS, within_s=400.0).collect()
    }
    for u, evs in raw.items():
        if u in goth:
            assert goth[u] == _py_funnel(evs, STEPS, within_s=400.0)[0], u
    # funnel_counts is monotone and consistent with per-user stages
    fc = {r["stage"]: r["n_users"] for r in funnel_counts(ev, STEPS).collect()}
    for stage in fc:
        assert fc[stage] == sum(1 for d, _ in got.values() if d >= stage)
    assert fc[1] >= fc.get(2, 0) >= fc.get(3, 0)


def test_funnel_is_single_shuffle(spark):
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events")
    plan = (
        funnel_steps(ev, STEPS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one hash shuffle on the user key
    assert "BatchEvalPython" not in plan and "mapInPandas" not in plan


def test_retention_matches_duckdb(spark):
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events")
    got = {
        (r["cohort_start"], r["offset"]): (r["n_active"], r["retained_frac"])
        for r in retention_cohorts(ev, bucket_s=86400.0).collect()
    }
    want = duckdb.sql(
        f"""
        WITH ev AS (SELECT user_id, floor(epoch(ts) / 86400) AS b
                    FROM read_parquet('{SF}/events.parquet')),
        first AS (SELECT user_id, min(b) AS cohort FROM ev GROUP BY user_id),
        act AS (SELECT DISTINCT e.user_id, e.b, f.cohort
                FROM ev e JOIN first f USING (user_id)),
        grid AS (SELECT cohort, (b - cohort)::int AS off, count(*) AS n
                 FROM act GROUP BY 1, 2)
        SELECT cohort * 86400.0, off, n,
               round(n / (max(CASE WHEN off = 0 THEN n END)
                          OVER (PARTITION BY cohort))::double, 6)
        FROM grid
        """
    ).fetchall()
    assert got == {(c, o): (n, f) for c, o, n, f in want}
    assert all(
        got[k][0] <= got[(k[0], 0)][0] for k in got
    )  # offset-0 is the cohort max
    with pytest.raises(ValueError):
        retention_cohorts(ev, bucket_s=0)


def test_funnel_matches_duckdb_sql_twin(spark):
    """Without a horizon the greedy funnel is plain SQL (sequential
    filtered mins) — pin funnel_steps against DuckDB on the driver
    events, value-for-value."""
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("double").alias("ts"), "event_type"
    )
    got = {
        r["user_id"]: (r["steps_completed"], [x for x in r["step_ts"]])
        for r in funnel_steps(ev, STEPS).collect()
    }
    want = {}
    for uid, t1, t2, t3 in duckdb.sql(
        f"""
        WITH ev AS (SELECT user_id, epoch(ts) AS ts, event_type
                    FROM read_parquet('{SF}/events.parquet')),
        a AS (SELECT user_id, min(ts) AS t1 FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
        b AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e JOIN a USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY e.user_id),
        c AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e JOIN b USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY e.user_id)
        SELECT a.user_id, a.t1, b.t2, c.t3
        FROM a LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)
        """
    ).fetchall():
        done = 1 + (t2 is not None) + (t3 is not None)
        want[uid] = (done, [t1, t2, t3])
    # users whose only funnel events are non-'view' appear in got with
    # 0 steps but not in the SQL twin's anchor set
    got_anchored = {u: v for u, v in got.items() if v[0] >= 1}
    assert got_anchored == want and len(want) > 100


def _py_conversions(events, steps):
    """Reference: greedy non-overlapping journey counter (ties ordered
    by step index like the operator's struct sort)."""
    idx = {s: i for i, s in enumerate(steps)}
    k = len(steps)
    slots = [None] * k
    n, last = 0, None
    for t, i in sorted(
        ((t, idx[s]) for t, s in events if s in idx), key=lambda e: e
    ):
        if slots[i] is not None:
            continue
        if i > 0 and (slots[i - 1] is None or not t > slots[i - 1]):
            continue
        slots[i] = t
        if slots[k - 1] is not None:
            n += 1
            last = slots[k - 1]
            slots = [None] * k
    return n, last


def test_conversion_counts_hand_and_driver_sweep(spark):
    from zx_spark.operators.funnel import conversion_counts
    from zx_spark.storage import read_table

    rows = [
        # u1: two full journeys + a dangling view
        (1, 1.0, "view"), (1, 2.0, "click"), (1, 3.0, "purchase"),
        (1, 4.0, "view"), (1, 5.0, "click"), (1, 6.0, "purchase"),
        (1, 7.0, "view"),
        # u2: one journey interleaved with noise
        (2, 1.0, "view"), (2, 1.5, "error"), (2, 2.0, "click"),
        (2, 9.0, "purchase"),
        # u3: never completes
        (3, 1.0, "view"), (3, 2.0, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: double, event_type: string")
    got = {
        r["user_id"]: (r["n_conversions"], r["last_conversion_ts"])
        for r in conversion_counts(df, STEPS).collect()
    }
    assert got == {1: (2, 6.0), 2: (1, 9.0)}  # u3 filtered (0 conversions)

    # full driver sweep vs the Python twin
    ev = read_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("double").alias("ts"), "event_type"
    )
    got_all = {
        r["user_id"]: (r["n_conversions"], r["last_conversion_ts"])
        for r in conversion_counts(ev, STEPS).collect()
    }
    raw = {}
    for r in ev.collect():
        raw.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    for u, evs in raw.items():
        n, last = _py_conversions(evs, STEPS)
        if n == 0:
            assert u not in got_all
        else:
            assert got_all[u] == (n, last), u
    assert sum(n for n, _ in got_all.values()) > 100  # repeat journeys exist
    with pytest.raises(ValueError):
        conversion_counts(df, [])

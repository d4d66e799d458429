"""Materialized-view routing: a compatible query answered from the
rollup equals compile_query over the raw events; every incompatibility
falls back (with a reason), never silently approximates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zx_spark.compiler import compile_query
from zx_spark.model import Aggregate, Condition, Cmp, Query, Select
from zx_spark.operators.rollup import (
    answer_query_from_rollup,
    build_query_rollup,
    rollup_route_reason,
    run_with_rollup,
)
from zx_spark.storage import read_table

SF = "/root/testdata/sf0.001"
BASE = 300.0  # rollup base granularity


@pytest.fixture(scope="module")
def events(spark):
    return read_table(spark, SF, "events")


@pytest.fixture(scope="module")
def rollup(spark, events):
    return build_query_rollup(
        events, ["value"], ["event_type"], granularity_s=BASE, rate_col=None
    ).cache()


KEYS = ["g_event_type"]


def _norm(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(round(x, 6) if isinstance(x, float) else x for x in (r[c] for c in cols))
        for r in df.collect()
    )


SEL = [
    Select("value", Aggregate.SUM),
    Select("value", Aggregate.COUNT),
    Select("value", Aggregate.MIN),
    Select("value", Aggregate.MAX),
    Select("value", Aggregate.MEAN),
]


def test_routed_equals_compiled_hourly(events, rollup):
    q = Query(selects=SEL, group_by=["event_type"], granularity_s=3600.0)
    routed = answer_query_from_rollup(rollup, q, BASE, KEYS, empty_sentinels=False)
    assert routed is not None
    direct = compile_query(
        events, q, id_col="event_id", rate_col=None, empty_sentinels=False
    )
    assert _norm(routed) == _norm(direct)


def test_routed_equals_compiled_no_granularity(events, rollup):
    q = Query(selects=SEL, group_by=["event_type"])
    routed = answer_query_from_rollup(rollup, q, BASE, KEYS, empty_sentinels=False)
    assert routed is not None
    direct = compile_query(
        events, q, id_col="event_id", rate_col=None, empty_sentinels=False
    )
    assert _norm(routed) == _norm(direct)


def test_routed_equals_compiled_time_bounds(events, rollup):
    # bucket-edge-aligned bounds route; result equals the raw scan
    t0 = 1704153600.0  # 2024-01-02, divisible by 3600
    t1 = 1704412800.0  # 2024-01-05
    q = Query(
        selects=[Select("value", Aggregate.SUM)],
        group_by=["event_type"],
        granularity_s=3600.0,
        t_start=t0,
        t_end=t1,
    )
    routed = answer_query_from_rollup(rollup, q, BASE, KEYS, empty_sentinels=False)
    assert routed is not None
    direct = compile_query(
        events, q, id_col="event_id", rate_col=None, empty_sentinels=False
    )
    # the documented boundary nuance: routing excludes the bucket AT
    # t_end; equality holds when no event sits exactly on t_end (true
    # for the driver data's microsecond timestamps)
    assert _norm(routed) == _norm(direct)


def test_routed_eq_ne_conditions(events, rollup):
    for cond in (
        Condition("event_type", Cmp.EQ, "click"),
        Condition("event_type", Cmp.NE, "click"),
    ):
        q = Query(
            selects=[Select("value", Aggregate.SUM), Select("value", Aggregate.COUNT)],
            conditions=[cond],
            group_by=["event_type"],
            granularity_s=3600.0,
        )
        routed = answer_query_from_rollup(rollup, q, BASE, KEYS, empty_sentinels=False)
        assert routed is not None, cond
        direct = compile_query(
            events, q, id_col="event_id", rate_col=None, empty_sentinels=False
        )
        assert _norm(routed) == _norm(direct), cond


def test_routed_int_eq_condition_on_extra_key(events):
    # int-valued EQ on a key the query doesn't group by
    r2 = build_query_rollup(
        events, ["value"], ["event_type", "user_id"], granularity_s=BASE,
        rate_col=None,
    )
    some_uid = int(events.select("user_id").first()["user_id"])
    q = Query(
        selects=[Select("value", Aggregate.SUM)],
        conditions=[Condition("user_id", Cmp.EQ, some_uid)],
        group_by=["event_type"],
        granularity_s=3600.0,
    )
    routed = answer_query_from_rollup(
        r2, q, BASE, ["g_event_type", "g_user_id"], empty_sentinels=False
    )
    assert routed is not None
    direct = compile_query(
        events, q, id_col="event_id", rate_col=None, empty_sentinels=False
    )
    assert _norm(routed) == _norm(direct)


def test_fallback_reasons(rollup):
    base = dict(selects=SEL, group_by=["event_type"], granularity_s=3600.0)
    cases = [
        (Query(**{**base, "granularity_s": 450.0}), "nest"),
        (Query(**{**base, "selects": [Select("value", Aggregate.P50)]}), "not rollup-answerable"),
        (Query(**{**base, "selects": [Select("props", Aggregate.SUM)]}), "no partials"),
        (Query(**{**base, "group_by": ["user_id"]}), "not in rollup keys"),
        (Query(**{**base, "t_start": 1704153601.0}), "bucket edge"),
        (Query(**{**base, "conditions": [Condition("value", Cmp.GT, 5.0)]}), "raw events"),
        (Query(**{**base, "conditions": [Condition("props", Cmp.EQ, "x")]}), "not a rollup group key"),
        (Query(**{**base, "conditions": [Condition("event_type", Cmp.EQ, 1.5)]}), "canonical string form"),
        (Query(**{**base, "selects": []}), "no selects"),
        (
            Query(**{**base, "selects": [Select("value", Aggregate.P50_APPROX)]}),
            "without quantile_bins",
        ),
    ]
    for q, frag in cases:
        reason = rollup_route_reason(rollup, q, BASE, KEYS)
        assert reason and frag in reason, (frag, reason)
        assert answer_query_from_rollup(rollup, q, BASE, KEYS) is None


def test_run_with_rollup_routes_and_falls_back(events, rollup, spark, tmp_path):
    # the realistic shape: the rollup is STORED; a routed query's plan
    # must scan only the rollup store, never the events
    store = str(tmp_path / "rollup.parquet")
    rollup.write.mode("overwrite").parquet(store)
    stored = spark.read.parquet(store)
    q_ok = Query(selects=[Select("value", Aggregate.SUM)], group_by=["event_type"],
                 granularity_s=3600.0)
    q_fallback = Query(selects=[Select("value", Aggregate.P50)], group_by=["event_type"],
                       granularity_s=3600.0)
    routed = run_with_rollup(events, q_ok, stored, BASE, KEYS,
                             id_col="event_id", rate_col=None)
    fell_back = run_with_rollup(events, q_fallback, stored, BASE, KEYS,
                                id_col="event_id", rate_col=None)
    routed_plan = routed._jdf.queryExecution().toString()
    assert "events.parquet" not in routed_plan
    # the scan reads the rollup store's partial-aggregate schema
    assert "value__sum_wx" in routed_plan
    assert "p50__value" in fell_back.columns
    assert fell_back.count() > 0


def test_route_drops_extra_group_key(events, spark):
    # rollup grouped by (event_type, user_id); query only by event_type —
    # partials re-merge over the dropped key
    r2 = build_query_rollup(
        events, ["value"], ["event_type", "user_id"], granularity_s=BASE,
        rate_col=None,
    )
    q = Query(selects=[Select("value", Aggregate.SUM), Select("value", Aggregate.MEAN)],
              group_by=["event_type"], granularity_s=3600.0)
    routed = answer_query_from_rollup(
        r2, q, BASE, ["g_event_type", "g_user_id"], empty_sentinels=False
    )
    assert routed is not None
    direct = compile_query(events, q, id_col="event_id", rate_col=None,
                           empty_sentinels=False)
    assert _norm(routed) == _norm(direct)


def test_boundary_event_at_t_end_falls_back(spark):
    # compile_query's scan is CLOSED-right (ts <= t_end) but buckets are
    # open-right; with an event at exactly t_end the router must detect
    # it (first_ts == t_end in the bucket starting at t_end) and fall
    # back so run_with_rollup still matches the raw answer.
    t_end = 1704067200.0  # bucket edge for both 300s and 3600s
    rows = [
        (1, t_end - 600.0, "a", 10.0),
        (2, t_end - 1.0, "a", 20.0),
        (3, t_end, "a", 40.0),  # ON the boundary
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, sec double, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        "event_type",
        "value",
    )
    r = build_query_rollup(ev, ["value"], ["event_type"], granularity_s=BASE,
                           rate_col=None)
    q = Query(
        selects=[Select("value", Aggregate.SUM)],
        group_by=["event_type"],
        granularity_s=3600.0,
        t_start=t_end - 3600.0,
        t_end=t_end,
    )
    reason = rollup_route_reason(r, q, BASE, KEYS)
    assert reason and "exactly t_end" in reason
    assert answer_query_from_rollup(r, q, BASE, KEYS) is None
    out = run_with_rollup(ev, q, r, BASE, KEYS, id_col="event_id", rate_col=None)
    direct = compile_query(ev, q, id_col="event_id", rate_col=None)
    assert _norm(out) == _norm(direct)  # includes the boundary event (70.0)
    # and with NO event on the boundary, the same query routes
    ev2 = ev.filter(F.col("event_id") != 3)
    r2 = build_query_rollup(ev2, ["value"], ["event_type"], granularity_s=BASE,
                            rate_col=None)
    assert rollup_route_reason(r2, q, BASE, KEYS) is None


def test_float_raw_dtype_condition_falls_back(events):
    # EQ routing compares stringified keys; a float raw column casts
    # 7 -> '7.0' so key comparison diverges from the native one — the
    # dtype stashed at build time must reject it.
    r = build_query_rollup(
        events, ["value"], ["event_type", "value"], granularity_s=BASE,
        rate_col=None,
    )
    ks = ["g_event_type", "g_value"]
    q = Query(
        selects=[Select("value", Aggregate.SUM)],
        conditions=[Condition("value", Cmp.EQ, 7)],
        group_by=["event_type"],
        granularity_s=3600.0,
    )
    reason = rollup_route_reason(r, q, BASE, ks)
    assert reason and "raw dtype" in reason
    # string / integer raw columns still route
    q_str = Query(
        selects=[Select("value", Aggregate.SUM)],
        conditions=[Condition("event_type", Cmp.EQ, "click")],
        group_by=["event_type"],
        granularity_s=3600.0,
    )
    assert rollup_route_reason(r, q_str, BASE, ks) is None


def test_raw_dtype_metadata_survives_parquet(events, rollup, spark, tmp_path):
    # the dtype guard must hold for STORED rollups, not just in-session
    store = str(tmp_path / "r.parquet")
    rollup.write.mode("overwrite").parquet(store)
    stored = spark.read.parquet(store)
    md = stored.schema["g_event_type"].metadata
    assert md.get("zx_raw_dtype") == "string"


def test_assume_no_boundary_event_skips_probe(spark):
    # the opt-out knob routes WITHOUT the boundary probe even when an
    # event sits on t_end — open-right semantics, explicitly acknowledged
    t_end = 1704067200.0
    rows = [(1, t_end - 600.0, "a", 10.0), (2, t_end, "a", 40.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, sec double, event_type string, value double"
    ).select(
        "event_id", F.timestamp_seconds(F.col("sec")).alias("ts"),
        "event_type", "value",
    )
    r = build_query_rollup(ev, ["value"], ["event_type"], granularity_s=BASE,
                           rate_col=None)
    q = Query(
        selects=[Select("value", Aggregate.SUM)],
        group_by=["event_type"],
        granularity_s=3600.0,
        t_end=t_end,
    )
    assert rollup_route_reason(r, q, BASE, KEYS) is not None  # probe fires
    assert rollup_route_reason(
        r, q, BASE, KEYS, assume_no_boundary_event=True
    ) is None
    routed = answer_query_from_rollup(
        r, q, BASE, KEYS, empty_sentinels=False, assume_no_boundary_event=True
    )
    got = routed.collect()
    assert len(got) == 1 and got[0]["sum__value"] == 10.0  # open-right

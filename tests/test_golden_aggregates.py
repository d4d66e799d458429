"""Golden windowed-aggregate tests — ports of reference aggregate_* tests
(src/test.rs:116-457) and group_test (src/test.rs:86-114).

Expectations pinned in FIXTURES.md §1: granularity 15s, group by ``y`` —
one window per group at fixture scale; ``window_starts``/``window_ends`` are
first/last event ts in the window. Both window modes (aligned, faithful)
must produce the same numbers on the fixture (its max intra-group ts gap is
9s < 15s, so no window ever splits).
"""

from __future__ import annotations

import pytest

from zx_spark.compiler import compile_query
from zx_spark.model import NIL, Aggregate, Query, Select
from zx_spark.storage import zx_fixture


def rows_by_group(df):
    return {r["g_y"]: r.asDict() for r in df.collect()}


def q(agg: Aggregate, col: str = "foo", mode: str = "faithful") -> Query:
    return Query(
        selects=[Select(col, agg)],
        group_by=["y"],
        granularity_s=15,
        window_mode=mode,
    )


@pytest.fixture(scope="module", params=["faithful", "aligned"])
def mode(request):
    return request.param


def test_group_test(spark, mode):
    # group_test (src/test.rs:86-114): y=1 {1}, y=9 {4,10}, y=__nil {rest}.
    out = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.COUNT, mode=mode)))
    assert set(out) == {"1", "9", NIL}


def test_aggregate_sum(spark, mode):
    out = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.SUM, mode=mode)))
    assert out["1"]["sum__foo"] == 100.0
    assert out["9"]["sum__foo"] == 1400.0
    assert out[NIL]["sum__foo"] == 4000.0
    # Window report timestamps: first/last event ts (src/lib.rs:702-708).
    assert (out["9"]["window_start"], out["9"]["window_end"]) == (3.0, 9.0)
    assert (out[NIL]["window_start"], out[NIL]["window_end"]) == (1.0, 8.0)
    assert (out["1"]["window_start"], out["1"]["window_end"]) == (0.0, 0.0)


def test_aggregate_sum_of_group_col(spark, mode):
    # sum(y) for the y=9 group → 18.0 (src/test.rs:164-183).
    out = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.SUM, col="y", mode=mode)))
    assert out["9"]["sum__y"] == 18.0


def test_aggregate_max_min(spark, mode):
    mx = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.MAX, mode=mode)))
    mn = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.MIN, mode=mode)))
    assert (mx["1"]["max__foo"], mx["9"]["max__foo"], mx[NIL]["max__foo"]) == (100.0, 1000.0, 900.0)
    assert (mn["1"]["min__foo"], mn["9"]["min__foo"], mn[NIL]["min__foo"]) == (100.0, 400.0, 200.0)


def test_aggregate_count(spark, mode):
    out = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.COUNT, mode=mode)))
    assert (out["1"]["count__foo"], out["9"]["count__foo"], out[NIL]["count__foo"]) == (1.0, 2.0, 7.0)


def test_aggregate_count_distinct(spark, mode):
    # count_distinct(y) grouped by y: each group has exactly one distinct
    # value — and for __nil, NULL itself counts as one (src/lib.rs:624-636).
    out = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.COUNT_DISTINCT, col="y", mode=mode)))
    assert (out["1"]["count_distinct__y"], out["9"]["count_distinct__y"], out[NIL]["count_distinct__y"]) == (1.0, 1.0, 1.0)


def test_aggregate_mean(spark, mode):
    out = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.MEAN, mode=mode)))
    assert out["1"]["mean__foo"] == 100.0
    assert out["9"]["mean__foo"] == 700.0
    # The golden value from src/test.rs:452.
    assert out[NIL]["mean__foo"] == 571.4285714285714


def test_p50_and_raw(spark, mode):
    out = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.P50, mode=mode)))
    assert out["9"]["p50__foo"] == 700.0  # median of {400, 1000}
    raw = rows_by_group(compile_query(zx_fixture(spark), q(Aggregate.RAW, mode=mode)))
    assert raw["9"]["raw__foo"] == [400.0, 1000.0]


def test_weighted_sample_rate(spark):
    # Head-sampling compensation (§2.5): rate r ⇒ row stands for r events.
    # sum = Σ r·x, count = Σ r, mean weights by int-truncated r
    # (src/lib.rs:563-651).
    df = spark.createDataFrame(
        [(1, 10.0, 2.5), (2, 20.0, 1.0), (3, None, 4.0)],
        "id long, v double, sample_rate double",
    ).selectExpr("id", "timestamp_seconds(id) as ts", "v", "sample_rate")
    qq = Query(
        selects=[
            Select("v", Aggregate.SUM),
            Select("v", Aggregate.COUNT),
            Select("v", Aggregate.MEAN),
        ]
    )
    row = compile_query(df, qq, rate_col="sample_rate").collect()[0]
    assert row["sum__v"] == 10.0 * 2.5 + 20.0 * 1.0  # missing v → contributes 0
    assert row["count__v"] == 2.5 + 1.0  # present-only Σr
    # mean: int-truncated rates (2.5→2): (10*2 + 20*1) / (2+1)
    assert row["mean__v"] == pytest.approx(40.0 / 3.0)


def test_empty_sentinels(spark):
    # MAX/MIN over an all-missing window → f64::MIN / f64::MAX
    # (src/lib.rs:578, 594).
    df = spark.createDataFrame([(1, None)], "id long, v double").selectExpr(
        "id", "timestamp_seconds(id) as ts", "v"
    )
    qq = Query(selects=[Select("v", Aggregate.MAX), Select("v", Aggregate.MIN)])
    row = compile_query(df, qq, rate_col=None).collect()[0]
    assert row["max__v"] == -1.7976931348623157e308
    assert row["min__v"] == 1.7976931348623157e308


def test_heatmap_parameterized(spark):
    # Data far outside the default [0,1000) domain — per-query params.
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([-5.0, 0.0, 2.0, 3.9, 4.0, 7.9, 8.0, 100.0])],
        "id long, v double",
    ).selectExpr("id", "timestamp_seconds(id) as ts", "v")
    qq = Query(selects=[Select("v", Aggregate.HEATMAP, params=(0.0, 8.0, 4))])
    row = compile_query(df, qq, rate_col=None).collect()[0]
    # bins of width 2 over [0,8): [-5,0,...clamp lo] [2,3.9] [4] [7.9, 8, 100 clamp hi]
    assert row["heatmap__v"] == [2.0, 2.0, 1.0, 3.0]


def test_multi_column_group_by(spark, mode):
    """Two group keys (reference group keys are a COLUMN LIST,
    src/lib.rs:60 group_by: Vec<String>): every (y, tag) combination gets
    its own __nil-coalesced group."""
    query = Query(
        selects=[Select("foo", Aggregate.SUM), Select("foo", Aggregate.COUNT)],
        group_by=["y", "tag"],
        granularity_s=15,
        window_mode=mode,
    )
    out = {
        (r["g_y"], r["g_tag"]): (r["sum__foo"], r["count__foo"])
        for r in compile_query(zx_fixture(spark), query).collect()
    }
    # fixture rows: (y, tag) → ids: (1,t1)->1; (nil,'t1,t2')->2; (nil,t3)->3,6;
    # (9,t2)->4; (nil,nil)->5,7,8,9; (9,nil)->10
    assert out[("1", "t1")] == (100.0, 1.0)
    assert out[(NIL, "t1,t2")] == (200.0, 1.0)
    assert out[(NIL, "t3")] == (300.0 + 600.0, 2.0)
    assert out[("9", "t2")] == (400.0, 1.0)
    assert out[(NIL, NIL)] == (500.0 + 700.0 + 800.0 + 900.0, 4.0)
    assert out[("9", NIL)] == (1000.0, 1.0)
    assert len(out) == 6

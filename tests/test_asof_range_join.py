"""asof_join and range_join: brute-force equivalence + plan shape.

The brute-force twins are the O(n·m) formulations the operators exist to
avoid — equality on small data pins the semantics, the plan assertions pin
that the scale formulation is actually used (equi-join / single window
pass, no nested-loop)."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from zx_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        # (trade_id, sym, t)
        (1, "A", 5), (2, "A", 10), (3, "A", 10), (4, "A", 99),
        (5, "B", 3), (6, "B", 50), (7, None, 7), (8, "C", 1),
    ]
    return spark.createDataFrame(rows, "trade_id long, sym string, t long")


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        # (sym, t, px) — unique per (sym, t); includes a NULL px row and a
        # quote exactly AT a trade timestamp (t=10) to pin <= semantics.
        ("A", 4, 1.0), ("A", 10, 2.0), ("A", 60, None),
        ("B", 3, 9.0), ("D", 1, 7.0),
    ]
    return spark.createDataFrame(rows, "sym string, t long, px double")


def _brute_asof(spark, trades, quotes):
    """O(n·m) reference: for each trade, the quote with max t' <= t."""
    j = trades.alias("l").join(
        quotes.alias("r"),
        (F.col("l.sym") == F.col("r.sym")) & (F.col("r.t") <= F.col("l.t")),
        "left",
    )
    w = Window.partitionBy("l.trade_id").orderBy(F.col("r.t").desc_nulls_last())
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("l.trade_id", "l.sym", "l.t", F.col("r.px").alias("px"))
    )


def test_asof_matches_brute_force(spark, trades, quotes):
    got = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], how="left",
    )
    exp = {r.trade_id: r.px for r in _brute_asof(spark, trades, quotes).collect()}
    rows = {r.trade_id: r.px for r in got.collect()}
    assert rows == exp
    # pin the interesting cases explicitly
    assert rows[2] == 2.0      # quote AT trade ts matches (<=, not <)
    assert rows[4] is None     # latest quote has NULL px — carried, not skipped
    assert rows[7] is None     # NULL key: no quotes with NULL sym
    assert rows[8] is None     # no quote at-or-before


@pytest.mark.parametrize("bucket", [1, 7, 100])
def test_asof_time_bucket_presplit_matches_base(spark, trades, quotes, bucket):
    """The hot-key pre-split (time_bucket_s) must reproduce the base
    single-window result ROW-FOR-ROW at every bucket width: width 1 forces
    carry-ins across many empty buckets, width 7 mixes in-bucket matches
    with boundary stitches, width 100 degenerates to one bucket (pure
    in-bucket path)."""
    base = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], how="left",
    )
    split = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], how="left", time_bucket_s=bucket,
    )
    b = {r.trade_id: r.px for r in base.collect()}
    s = {r.trade_id: r.px for r in split.collect()}
    assert s == b
    # inner mode too
    bi = {r.trade_id for r in asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], how="inner").collect()}
    si = {r.trade_id for r in asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], how="inner", time_bucket_s=bucket).collect()}
    assert si == bi


def test_asof_time_bucket_accepts_timestamp_ts(spark):
    """The hot-key pre-split must work on TimestampType ts (the events
    convention), not just numeric ts — bucketing casts through epoch
    seconds first."""
    t = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 200)], "trade_id long, sym string, ts_s long"
    ).withColumn("t", F.timestamp_seconds(F.col("ts_s"))).drop("ts_s")
    q = spark.createDataFrame(
        [("A", 90, 1.0), ("A", 150, 2.0)], "sym string, ts_s long, px double"
    ).withColumn("qt", F.timestamp_seconds(F.col("ts_s"))).drop("ts_s")
    got = {
        r.trade_id: r.px
        for r in asof_join(
            t, q, on=["sym"], left_ts="t", right_ts="qt",
            right_cols=["px"], time_bucket_s=60,
        ).collect()
    }
    assert got == {1: 1.0, 2: 2.0}


def test_asof_inner_drops_unmatched(spark, trades, quotes):
    got = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], how="inner",
    )
    ids = {r.trade_id for r in got.collect()}
    # trade 8 ("C", t=1) has no quote at-or-before; 7 has NULL key.
    # 4 matches the NULL-px quote (a real quote row) so it stays.
    assert ids == {1, 2, 3, 4, 5, 6}


def test_asof_plan_single_window_no_join(spark, trades, quotes):
    plan = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_cols=["px"], how="left",
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Window") == 1


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, "A" if i % 2 == 0 else "B", i * 7 % 100) for i in range(60)]
    return spark.createDataFrame(rows, "pid long, k string, p long")


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        ("A", 0, 10), ("A", 5, 40), ("B", 90, 99), ("B", 20, 21),
        ("A", 95, 180),  # interval longer than bin_width spans many bins
    ]
    return spark.createDataFrame(rows, "k string, s long, e long")


def test_range_join_matches_brute_force(spark, points, intervals):
    got = range_join(
        points, intervals, point_col="p", start_col="s", end_col="e",
        on=["k"], bin_width=16,
    )
    exp = (
        points.alias("l")
        .join(
            intervals.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & F.col("l.p").between(F.col("r.s"), F.col("r.e")),
        )
        .select("l.pid", "r.s", "r.e")
    )
    assert {tuple(r) for r in got.select("pid", "s", "e").collect()} == {
        tuple(r) for r in exp.collect()
    }
    # no duplicate (point, interval) pairs even when an interval spans bins
    n = got.count()
    assert n == got.select("pid", "s", "e").distinct().count()


def test_range_join_plan_is_equi_join(spark, points, intervals):
    plan = range_join(
        points, intervals, point_col="p", start_col="s", end_col="e",
        on=["k"], bin_width=16,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_join_requires_bin_width(spark, points, intervals):
    with pytest.raises(ValueError):
        range_join(points, intervals, point_col="p", start_col="s", end_col="e")


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_rows=st.lists(
        st.tuples(st.sampled_from("AB"), st.integers(0, 50)), min_size=1, max_size=25
    ),
    right_rows=st.lists(
        st.tuples(st.sampled_from("ABC"), st.integers(0, 50), st.integers(-5, 5)),
        max_size=15,
    ),
)
def test_asof_property_matches_python_reference(spark, left_rows, right_rows):
    """asof_join vs a pure-Python reference on random keyed timelines —
    duplicates on the right are pre-deduped (the operator's contract)."""
    trades = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "trade_id long, sym string, t long",
    )
    dedup = {}
    for k, t, v in right_rows:
        dedup[(k, t)] = float(v)
    quotes_rows = [(k, t, v) for (k, t), v in sorted(dedup.items())]
    quotes = spark.createDataFrame(
        quotes_rows or [("Z", -1, 0.0)], "sym string, t long, px double"
    )

    got = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="t", right_ts="t",
            right_cols=["px"], how="left",
        ).collect()
    }

    by_key: dict[str, list[tuple[int, float]]] = {}
    for k, t, v in (quotes_rows or [("Z", -1, 0.0)]):
        by_key.setdefault(k, []).append((t, v))
    expected = {}
    for i, (k, t) in enumerate(left_rows):
        cands = [(qt, v) for qt, v in by_key.get(k, []) if qt <= t]
        expected[i] = max(cands)[1] if cands else None
    assert got == expected


def test_join_column_collisions_rejected(spark, trades, quotes, points, intervals):
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades, quotes.withColumnRenamed("px", "t"),
            on=["sym"], left_ts="t", right_ts="t", right_cols=["t"],
        )
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(
            points.withColumn("s", F.lit(1)), intervals,
            point_col="p", start_col="s", end_col="e", on=["k"], bin_width=16,
        )

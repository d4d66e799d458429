"""Table profiling: exact-mode parity against DuckDB on the driver
events table, approx-mode sanity, non-atomic column handling, top-k
frequency ranks, and the one-job plan shape."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from zx_spark.operators.profile import profile_table, profile_top_values

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    from zx_spark.storage import read_table

    return read_table(spark, SF, "events")


def test_profile_exact_matches_duckdb(spark, events):
    cols = ["event_id", "user_id", "event_type", "value"]
    got = {
        r["column"]: (r["n_rows"], r["n_nonnull"], r["n_distinct"], r["min_value"], r["max_value"])
        for r in profile_table(events, cols, exact_distinct=True).collect()
    }
    con = duckdb.connect()
    for c in cols:
        n, nn, nd, mn, mx = con.sql(
            f"SELECT count(*), count({c}), count(DISTINCT {c}), "
            f"min({c})::VARCHAR, max({c})::VARCHAR "
            f"FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()
        g = got[c]
        assert (g[0], g[1], g[2]) == (n, nn, nd), c
        if c != "value":  # float-to-string rendering differs; counts suffice
            assert (g[3], g[4]) == (mn, mx), c


def test_profile_approx_and_defaults(spark, events):
    out = profile_table(events)  # all columns, HLL distinct
    rows = {r["column"]: r for r in out.collect()}
    assert set(rows) == set(events.columns)
    exact = {
        r["column"]: r["n_distinct"]
        for r in profile_table(events, ["user_id"], exact_distinct=True).collect()
    }
    approx = rows["user_id"]["n_distinct"]
    # HLL within its documented ~2-4% band
    assert abs(approx - exact["user_id"]) / exact["user_id"] < 0.1


def test_profile_non_atomic_and_validation(spark):
    df = spark.createDataFrame(
        [(1, [1, 2], "x")], "id: long, arr: array<long>, s: string"
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["arr"]["n_nonnull"] == 1
    assert rows["arr"]["n_distinct"] is None and rows["arr"]["min_value"] is None
    assert rows["id"]["min_value"] == "1"
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError):
        profile_top_values(df, ["arr"])  # nothing atomic selected


def test_top_values_ranks_and_ties(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",), (None,)], "v: string"
    )
    got = [
        (r["value"], r["n"], r["rank"])
        for r in profile_top_values(df, ["v"], k=2).orderBy("rank").collect()
    ]
    # a and b tie at 2 — value breaks the tie; NULL excluded; c cut by k
    assert got == [("a", 2, 1), ("b", 2, 2)]


def test_profile_is_one_aggregation_job(spark, events):
    plan = (
        profile_table(events, ["event_id", "value"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # approx mode must not plan an Expand (that is the exact-distinct
    # shape); one partial+final HashAggregate pair over the scan
    assert "Expand" not in plan


def test_column_correlations_match_duckdb(spark, events):
    from zx_spark.operators.profile import column_correlations

    got = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in column_correlations(
            events, ["event_id", "user_id", "value"]
        ).collect()
    }
    con = duckdb.connect()
    for (a, b), (c, n) in got.items():
        want_c, want_n = con.sql(
            f"SELECT round(corr({a}, {b}), 6), "
            f"count(CASE WHEN {a} IS NOT NULL AND {b} IS NOT NULL THEN 1 END) "
            f"FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()
        assert n == want_n and c == pytest.approx(want_c, abs=2e-6), (a, b)
    assert len(got) == 3  # C(3,2)
    # a derived column correlates at ~1
    d = events.withColumn("v2", F.col("value") * 3 + 1)
    r = {
        (x["col_a"], x["col_b"]): x["corr"]
        for x in column_correlations(d, ["value", "v2"]).collect()
    }
    assert r[("value", "v2")] == pytest.approx(1.0, abs=1e-6)
    with pytest.raises(ValueError):
        column_correlations(events, ["value"])
    with pytest.raises(ValueError):
        column_correlations(events, ["value", "event_type"])
    with pytest.raises(ValueError):
        column_correlations(events, ["event_id", "user_id", "value"], max_cols=2)


def test_check_expectations_gate(spark, events):
    from zx_spark.operators.profile import check_expectations

    report = check_expectations(
        events,
        {
            "event_id": {"not_null": True, "unique": True},
            "value": {"null_frac_max": 0.5, "min_at_least": 0.0,
                      "max_at_most": 1e6},
            "event_type": {"distinct_at_least": 3, "distinct_at_most": 10},
        },
    )
    rows = {(r["column"], r["rule"]): r["passed"] for r in report.collect()}
    assert all(rows.values()), rows  # healthy driver data passes everything
    # planted violations flag with actuals
    broken = events.withColumn(
        "value", F.when(F.col("event_id") % 2 == 0, F.col("value"))
    )
    rep2 = {
        (r["column"], r["rule"]): (r["passed"], r["actual"])
        for r in check_expectations(
            broken, {"value": {"null_frac_max": 0.1}}
        ).collect()
    }
    ok, actual = rep2[("value", "null_frac_max")]
    assert not ok and actual > 0.4
    import pytest

    with pytest.raises(ValueError):
        check_expectations(events, {})
    with pytest.raises(ValueError):
        check_expectations(events, {"value": {"nope": 1}})


def test_check_expectations_reuses_supplied_profile(spark, events):
    """r6: a caller already profiling a batch can hand the collected
    rows to check_expectations — identical report, no second
    exact-distinct pass; a profile missing a rule column raises."""
    from zx_spark.operators.profile import check_expectations

    rules = {"event_id": {"unique": True}, "value": {"max_at_most": 1e9}}
    rows = profile_table(events, ["event_id", "value"], exact_distinct=True).collect()
    direct = sorted(map(tuple, check_expectations(events, rules).collect()))
    reused = sorted(
        map(tuple, check_expectations(events, rules, profile=rows).collect())
    )
    assert direct == reused
    with pytest.raises(ValueError, match="lacks rule columns"):
        check_expectations(events, {"user_id": {"unique": True}}, profile=rows)


def test_check_expectations_non_atomic_cardinality_raises(spark):
    """ADVICE r5: n_distinct is NULL for complex-typed columns, which
    made distinct_at_most silently PASS while distinct_at_least failed
    on the same column — all cardinality/unique rules must now raise,
    matching the range rules' explicit error."""
    from zx_spark.operators.profile import check_expectations

    df = spark.createDataFrame([(1, [1, 2])], "id: long, arr: array<long>")
    for rule in ("distinct_at_most", "distinct_at_least", "unique"):
        with pytest.raises(ValueError, match="atomic"):
            check_expectations(df, {"arr": {rule: 1 if rule != "unique" else True}})
    # nullability rules remain fine on complex columns
    rep = check_expectations(df, {"arr": {"not_null": True}}).collect()
    assert rep[0]["passed"]

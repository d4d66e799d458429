"""plan_report / assert_scaling_plan / key_skew_report: the
programmatic plan-quality gates, checked against known plan shapes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.plan import assert_scaling_plan, key_skew_report, plan_report

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def tables(spark):
    from zx_spark.storage import read_table

    return (
        read_table(spark, SF, "customer"),
        read_table(spark, SF, "nation"),
        read_table(spark, SF, "events"),
    )


def test_report_reads_pushdown_and_joins(spark, tables):
    cust, nation, ev = tables
    q = (
        cust.filter(F.col("c_acctbal") > 1000)
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q.collect()  # AQE finalizes the plan (codegen spans appear)
    r = plan_report(q)
    assert "BroadcastHashJoin" in r["joins"] and not r["has_cartesian"]
    assert any("c_acctbal" in p for p in r["pushed_filters"])  # pushdown seen
    assert r["n_codegen_spans"] > 0 and r["n_python"] == 0
    # the gate passes for the same properties and returns the report
    g = assert_scaling_plan(
        q, no_python=True, require_pushed_filter="c_acctbal"
    )
    assert g["joins"] == r["joins"]


def test_gates_raise_with_plan_attached(spark, tables):
    cust, nation, ev = tables
    cart = cust.limit(5).crossJoin(nation.limit(5))
    with pytest.raises(AssertionError, match="cartesian"):
        assert_scaling_plan(cart)
    with pytest.raises(AssertionError, match="exchanges"):
        assert_scaling_plan(
            ev.groupBy("event_type").count(), max_exchanges=0
        )
    with pytest.raises(AssertionError, match="pushed filter"):
        assert_scaling_plan(ev, require_pushed_filter="nope_col")


def test_key_skew_report(spark):
    rows = [(i, "hot" if i < 900 else f"k{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id: long, k: string")
    r = key_skew_report(df, "k")
    assert r["n_keys"] == 101 and r["max_count"] == 900
    assert r["skew_factor"] > 80 and r["recommendation"] == "aqe"
    assert r["top"][0] == {"key": ("hot",), "count": 900}
    uniform = key_skew_report(spark.range(1000).select((F.col("id") % 10).alias("k")), "k")
    assert uniform["recommendation"] == "ok"
    assert key_skew_report(df.limit(0), "k")["n_keys"] == 0

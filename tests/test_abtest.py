"""A/B statistics (operators/abtest.py): erf accuracy vs math.erf,
Welch t vs an independent python twin, planted separation/null effect,
two-proportion z hand-check, degenerate-arm NULLs, DuckDB formula
parity, and the no-extra-shuffle plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_erf_approx_accuracy(spark):
    """|approx − math.erf| ≤ 1.5e-7 across the useful range, signs
    handled."""
    from zx_spark.operators.abtest import erf_approx

    xs = [x / 10.0 for x in range(-40, 41)]
    rows = (
        spark.createDataFrame([(x,) for x in xs], "x double")
        .select("x", erf_approx(F.col("x")).alias("e"))
        .collect()
    )
    for r in rows:
        assert abs(r["e"] - math.erf(r["x"])) <= 1.6e-7, r["x"]


def _welch_py(xs_a, xs_b):
    na, nb = len(xs_a), len(xs_b)
    ma, mb = sum(xs_a) / na, sum(xs_b) / nb
    va = (sum(x * x for x in xs_a) - sum(xs_a) ** 2 / na) / (na - 1)
    vb = (sum(x * x for x in xs_b) - sum(xs_b) ** 2 / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    p = 1.0 - math.erf(abs(t) / math.sqrt(2.0))
    return t, dof, p


def test_welch_matches_python_twin(spark):
    """Seeded dyadic-grid samples (exact float sums in any order) —
    t and df equal the twin to fp noise, p within the erf approx
    tolerance."""
    import numpy as np

    rng = np.random.RandomState(5)
    xs_a = [round(float(v) * 64) / 64 for v in rng.normal(10.0, 2.0, 400)]
    xs_b = [round(float(v) * 64) / 64 for v in rng.normal(10.6, 2.5, 350)]
    rows = [("a", v) for v in xs_a] + [("b", v) for v in xs_b]
    df = spark.createDataFrame(rows, "g string, v double")
    from zx_spark.operators.abtest import welch_t_test

    r = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    t, dof, p = _welch_py(xs_a, xs_b)
    assert abs(r["t"] - t) < 1e-9
    assert abs(r["df"] - dof) < 1e-6
    assert abs(r["p"] - p) < 1e-6
    assert r["n_a"] == 400 and r["n_b"] == 350
    # the planted 0.6 shift on ~750 samples is significant at 5%
    assert r["p"] < 0.05 and r["t"] < 0


def test_welch_null_effect_and_degenerate_arms(spark):
    from zx_spark.operators.abtest import welch_t_test

    same = [("a", float(i % 7)) for i in range(200)] + [
        ("b", float(i % 7)) for i in range(200)
    ]
    df = spark.createDataFrame(same, "g string, v double")
    r = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    assert abs(r["t"]) < 1e-9 and r["p"] > 0.999
    # single-row arm -> NULL statistic, no division error
    tiny = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "g string, v double"
    )
    r = welch_t_test(tiny, "g", "v", "a", "b").collect()[0]
    assert r["t"] is None and r["p"] is None
    # zero-variance both arms -> NULL (se2 == 0)
    flat = spark.createDataFrame(
        [("a", 3.0)] * 5 + [("b", 3.0)] * 5, "g string, v double"
    )
    r = welch_t_test(flat, "g", "v", "a", "b").collect()[0]
    assert r["t"] is None


def test_two_proportion_hand_check(spark):
    """120/400 vs 90/400: z from the pooled formula by hand."""
    from zx_spark.operators.abtest import two_proportion_z_test

    rows = (
        [("a", 1)] * 120 + [("a", 0)] * 280
        + [("b", 1)] * 90 + [("b", 0)] * 310
    )
    df = spark.createDataFrame(rows, "g string, y int")
    r = two_proportion_z_test(df, "g", "y", "a", "b").collect()[0]
    pool = 210 / 800
    se = math.sqrt(pool * (1 - pool) * (1 / 400 + 1 / 400))
    z = (0.30 - 0.225) / se
    assert abs(r["z"] - z) < 1e-12
    assert abs(r["p"] - (1.0 - math.erf(abs(z) / math.sqrt(2)))) < 1e-6
    assert r["p"] < 0.05  # the planted lift is significant
    # degenerate: all-success pool -> NULL
    allwin = spark.createDataFrame(
        [("a", 1)] * 5 + [("b", 1)] * 5, "g string, y int"
    )
    assert two_proportion_z_test(allwin, "g", "y", "a", "b").collect()[0]["z"] is None


def test_welch_matches_duckdb_formula(spark):
    """The whole test — sums, variances, t, erf-based p — re-derived in
    DuckDB with the same literals equals the operator at 6dp (the
    construction a driver arm would use)."""
    import duckdb

    from zx_spark.operators.abtest import welch_t_test

    rows = [("a", (i % 13) / 4.0) for i in range(97)] + [
        ("b", (i % 11) / 4.0 + 0.25) for i in range(83)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_t_test(df, "g", "v", "a", "b").select(
        F.round("t", 6).alias("t"), F.round("p", 6).alias("p")
    ).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    t_sql, p_sql = con.sql(
        "WITH a AS (SELECT count(*)::double n, sum(v) s, sum(v*v) ss FROM t0 WHERE g='a'), "
        "b AS (SELECT count(*)::double n, sum(v) s, sum(v*v) ss FROM t0 WHERE g='b'), "
        "st AS (SELECT (a.s/a.n - b.s/b.n) / sqrt( "
        " ((a.ss - a.s*a.s/a.n)/(a.n-1))/a.n + ((b.ss - b.s*b.s/b.n)/(b.n-1))/b.n) AS t "
        " FROM a, b), "
        "x AS (SELECT t, abs(t)/sqrt(2.0) AS ax FROM st), "
        "u AS (SELECT t, ax, 1.0/(1.0 + 0.3275911*ax) AS u FROM x) "
        "SELECT round(t, 6), "
        "round(1.0 - (1.0 - (((((1.061405429*u + -1.453152027)*u + 1.421413741)*u "
        "+ -0.284496736)*u + 0.254829592)*u) * exp(-(ax*ax))), 6) FROM u"
    ).fetchall()[0]
    assert got["t"] == t_sql
    assert got["p"] == p_sql


def test_single_agg_pass_per_arm(spark):
    """Each arm is one filtered aggregate; the join of the two one-row
    frames is a broadcast, not a data shuffle."""
    from zx_spark.operators.abtest import welch_t_test

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 3.0)], "g string, v double"
    )
    plan = (
        welch_t_test(df, "g", "v", "a", "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan

"""Count-min sketch (operators/cms.py): never-underestimate and
epsilon-bound guarantees, exact-on-no-collision, shard mergeability,
column/python twin agreement, DuckDB full-sketch parity, weighted
build, and the no-shuffle estimation plan."""

import math

import pytest
from pyspark.sql import functions as F


def _values_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


def _true_counts(values):
    out = {}
    for v in values:
        if v is not None:
            out[v] = out.get(v, 0) + 1
    return out


def test_never_underestimates_and_eps_bound(spark):
    """est >= true for EVERY value (hard guarantee), and the average
    overestimate respects the epsilon*N shape with a planted skewed
    multiset."""
    from zx_spark.operators.cms import cms_build, cms_estimate_py

    values = (
        ["hot"] * 500
        + ["warm"] * 120
        + [f"cold{i}" for i in range(400)]
        + [f"cold{i}" for i in range(200)]  # half the cold keys twice
    )
    df = _values_df(spark, values)
    m = cms_build(df, "v", width=256, depth=4)
    true = _true_counts(values)
    assert m["n"] == len(values)
    over = []
    for v, t in true.items():
        est = cms_estimate_py(m, v)
        assert est >= t, v  # the one-sided guarantee
        over.append(est - t)
    # eps = e/width; P(over > eps*N) < e^-depth per value — check the
    # 95th percentile with wide margin (planted margins, not luck)
    eps_n = math.e / 256 * len(values)
    over.sort()
    assert over[int(len(over) * 0.95)] <= 2 * eps_n


def test_exact_when_width_dwarfs_cardinality(spark):
    """With width >> distinct values, collisions are absent for these
    keys and every estimate is exact."""
    from zx_spark.operators.cms import cms_build, cms_estimate_py

    values = ["a"] * 7 + ["b"] * 3 + ["c"] * 1
    m = cms_build(_values_df(spark, values), "v", width=4096, depth=4)
    for v, t in _true_counts(values).items():
        assert cms_estimate_py(m, v) == t


def test_merge_equals_union_build(spark):
    """Sketch(A) + Sketch(B) == Sketch(A ∪ B), counter for counter —
    the property that makes per-shard/per-epoch builds composable."""
    from zx_spark.operators.cms import cms_build, cms_merge

    a = ["x"] * 5 + ["y"] * 2 + ["z"]
    b = ["y"] * 4 + ["w"] * 3
    ma = cms_build(_values_df(spark, a), "v", width=128, depth=3)
    mb = cms_build(_values_df(spark, b), "v", width=128, depth=3)
    mu = cms_build(_values_df(spark, a + b), "v", width=128, depth=3)
    merged = cms_merge(ma, mb)
    assert merged == mu
    with pytest.raises(ValueError, match="geometry"):
        cms_merge(ma, cms_build(_values_df(spark, b), "v", width=64, depth=3))


def test_column_estimator_matches_python_twin_and_nulls(spark):
    from zx_spark.operators.cms import (
        cms_build,
        cms_estimate_col,
        cms_estimate_py,
    )

    values = ["p"] * 9 + ["q"] * 4 + ["r"] + [None, None]
    df = _values_df(spark, values)
    m = cms_build(df, "v", width=64, depth=4)
    assert m["n"] == 14  # NULLs excluded
    got = {
        r["v"]: r["est"]
        for r in df.distinct()
        .select("v", cms_estimate_col(F.col("v"), m).alias("est"))
        .collect()
    }
    assert got[None] is None
    for v in ("p", "q", "r"):
        assert got[v] == cms_estimate_py(m, v)


def test_weighted_build(spark):
    from zx_spark.operators.cms import cms_build, cms_estimate_py

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 2)], "v string, w long"
    )
    m = cms_build(df, "v", width=512, depth=3, weight_col="w")
    assert m["n"] == 17
    assert cms_estimate_py(m, "a") == 15
    assert cms_estimate_py(m, "b") == 2


def test_full_sketch_matches_duckdb(spark):
    """The ENTIRE sketch is ANSI-SQL reproducible: DuckDB rebuilds the
    salted md5-60-bit counters and the least-of-lookups estimates
    value-for-value (the construction the driver's cms arm uses)."""
    import duckdb

    from zx_spark.operators.cms import cms_build, cms_estimate_py

    values = ["en"] * 30 + ["de"] * 11 + ["fr"] * 7 + ["ja"] * 2
    m = cms_build(_values_df(spark, values), "v", width=32, depth=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    bks = ", ".join(
        f"('0x'||substr(md5('cms{i}:'||v),1,15))::bigint % 32 AS b{i}"
        for i in range(3)
    )
    joins = " ".join(
        f"JOIN (SELECT b{i}, count(*) c{i} FROM b GROUP BY b{i}) c{i} USING (b{i})"
        for i in range(3)
    )
    rows = con.sql(
        f"WITH b AS (SELECT v, {bks} FROM t), "
        "d AS (SELECT DISTINCT * FROM b) "
        f"SELECT v, least(c0.c0, c1.c1, c2.c2) FROM d {joins}"
    ).fetchall()
    for v, est in rows:
        assert est == cms_estimate_py(m, v), v


def test_estimation_plan_has_no_shuffle(spark):
    from zx_spark.operators.cms import cms_build, cms_estimate_col

    df = _values_df(spark, ["a", "b", "a"])
    m = cms_build(df, "v", width=64, depth=4)
    plan = (
        df.select(cms_estimate_col(F.col("v"), m).alias("e"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_validates_geometry(spark):
    from zx_spark.operators.cms import cms_build

    with pytest.raises(ValueError, match="width"):
        cms_build(_values_df(spark, ["a"]), "v", width=1, depth=4)


def test_screen_never_drops_a_true_heavy_hitter(spark):
    """The one-sided estimate makes the screen safe: on a skewed
    multiset with a DELIBERATELY collision-heavy geometry (width 8),
    every value with true count >= threshold survives the screen, and
    heavy_hitters returns the exact heavy set with exact counts."""
    from zx_spark.operators.cms import cms_build, cms_screen, heavy_hitters

    values = (
        ["hh1"] * 40 + ["hh2"] * 25
        + [f"noise{i}" for i in range(60) for _ in range(2)]
    )
    df = _values_df(spark, values)
    true = _true_counts(values)
    m = cms_build(df, "v", width=8, depth=2)  # collisions guaranteed
    kept = {r["v"] for r in cms_screen(df, "v", m, 20).distinct().collect()}
    for v, t in true.items():
        if t >= 20:
            assert v in kept, v  # safety: never dropped
    hh = {r["value"]: r["n"] for r in heavy_hitters(df, "v", 20, model=m).collect()}
    assert hh == {v: t for v, t in true.items() if t >= 20}  # exact


def test_heavy_hitters_builds_own_model(spark):
    from zx_spark.operators.cms import heavy_hitters

    values = ["a"] * 10 + ["b"] * 3 + ["c"]
    hh = {r["value"]: r["n"] for r in heavy_hitters(
        _values_df(spark, values), "v", 3, width=64, depth=3).collect()}
    assert hh == {"a": 10, "b": 3}

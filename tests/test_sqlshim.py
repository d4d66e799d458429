"""SQL dialect shim tests (Q2) — zx grammar, compat flags, documented
divergences, and the Spark-SQL fallthrough."""

from __future__ import annotations

import pytest

from zx_spark.model import NIL, Aggregate, Cmp
from zx_spark.sqlshim import Passthrough, ZxCompat, parse_zx_sql, zx_sql
from zx_spark.sqlshim.translate import ZxSqlError
from zx_spark.storage import zx_fixture


def test_parse_full_query():
    q = parse_zx_sql(
        "SELECT sum(foo), count_distinct(tag) WHERE $T_START > 0 AND foo >= 100 "
        "AND tag LIKE t1 GROUP BY y GRANULARITY 15"
    )
    assert [(s.column, s.aggregate) for s in q.selects] == [
        ("foo", Aggregate.SUM),
        ("tag", Aggregate.COUNT_DISTINCT),
    ]
    assert q.t_start == 0.0 and q.t_end is None
    assert [(c.column, c.cmp) for c in q.conditions] == [
        ("foo", Cmp.GTE),
        ("tag", Cmp.CONTAINS),  # LIKE = substring (src/expr.rs:81-89)
    ]
    assert q.group_by == ["y"] and q.granularity_s == 15.0


def test_lowercasing_and_dotted_columns():
    # Whole query is lowercased (src/lib.rs:818-820); dotted identifiers are
    # flat column names (src/expr.rs:148-157).
    q = parse_zx_sql("SELECT COUNT(Repo.Name) GROUP BY Events")
    assert q.selects[0].column == "repo.name"
    assert q.group_by == ["events"]


def test_neq_compat_flag():
    fixed = parse_zx_sql("select count(foo) where x != 1")
    assert fixed.conditions[0].cmp is Cmp.NE
    buggy = parse_zx_sql("select count(foo) where x != 1", compat=ZxCompat(neq_is_eq_bug=True))
    assert buggy.conditions[0].cmp is Cmp.EQ  # reference bug, src/expr.rs:66-74


def test_from_query_is_passthrough():
    q = parse_zx_sql("select l_returnflag, count(*) from lineitem group by l_returnflag")
    assert isinstance(q, Passthrough)


def test_rejects_reference_panics():
    with pytest.raises(ZxSqlError):
        parse_zx_sql("select count(foo) where a > 1 or b > 2")  # OR panics (src/expr.rs:99)
    with pytest.raises(ZxSqlError):
        parse_zx_sql("select a + b")  # computed projection panics (src/expr.rs:162)
    with pytest.raises(ZxSqlError):
        parse_zx_sql("delete from x")


def test_end_to_end_on_fixture(spark):
    out = zx_sql(
        spark,
        "select sum(foo) group by y granularity 15",
        df=zx_fixture(spark),
        compat=ZxCompat(faithful_windows=True),
    )
    got = {r["g_y"]: r["sum__foo"] for r in out.collect()}
    assert got == {"1": 100.0, "9": 1400.0, NIL: 4000.0}


def test_order_by_routes_to_sorted(spark):
    out = zx_sql(
        spark,
        "select mean(foo) group by y order by mean(foo) desc",
        df=zx_fixture(spark),
    )
    assert [r["mean__foo"] for r in out.collect()] == [700.0, 571.4285714285714, 100.0]


def test_raw_projection(spark):
    # Bare identifiers = plain distributed projection (reference panics,
    # src/lib.rs:660 — documented divergence).
    out = zx_sql(spark, "select foo, x where foo > 800", df=zx_fixture(spark))
    assert sorted([tuple(r) for r in out.collect()]) == [("1000", "0"), ("900", "8")]


def test_passthrough_runs_spark_sql(spark):
    zx_fixture(spark).createOrReplaceTempView("zx_events_view")
    out = zx_sql(spark, "select count(*) as n from zx_events_view where y is not null")
    assert out.collect()[0]["n"] == 3


def test_quoted_from_not_passthrough():
    # 'from' inside a string literal must not route to spark.sql.
    q = parse_zx_sql("select count(value) where event_type like 'from x'")
    assert not isinstance(q, Passthrough)
    assert q.conditions[0].column == "event_type"
    assert q.conditions[0].value == "from x"


def test_escaped_quote_literal_keeps_from_masked():
    """ADVICE r3: '' is a quote ESCAPE inside a literal — a literal like
    'it''s from x' must mask as ONE literal, not two with the middle
    (and its 'from') exposed to clause detection."""
    q = parse_zx_sql("select count(value) where event_type = 'it''s from x'")
    assert not isinstance(q, Passthrough)
    assert q.conditions[0].column == "event_type"
    assert q.conditions[0].value == "it's from x"


def test_real_pattern_like_routes_to_native(spark):
    """Mixed %/_ patterns no longer raise in real-pattern mode: they route
    to the Spark-native LIKE comparator. In reference-compat mode the same
    text stays plain-substring (src/expr.rs:81-89)."""
    q = parse_zx_sql(
        "select count(value) where event_type like '%a_b%'",
        compat=ZxCompat(like_is_contains=False),
    )
    assert q.conditions[0].cmp is Cmp.LIKE
    assert q.conditions[0].value == "%a_b%"
    qc = parse_zx_sql("select count(value) where event_type like '%a_b%'")
    assert qc.conditions[0].cmp is Cmp.CONTAINS

    df = spark.createDataFrame(
        [("aXb",), ("a_b",), ("ab",), (None,)], "event_type string"
    )
    from zx_spark.operators.filters import apply_conditions

    got = {r["event_type"] for r in apply_conditions(df, q.conditions).collect()}
    assert got == {"aXb", "a_b"}  # _ matches any one char
    gotc = {r["event_type"] for r in apply_conditions(df, qc.conditions).collect()}
    # compat: the reference treats the WHOLE pattern (incl. %) as a
    # literal substring — nothing contains "%a_b%".
    assert gotc == set()
    qn = parse_zx_sql(
        "select count(value) where event_type not like '%a_b%'",
        compat=ZxCompat(like_is_contains=False),
    )
    gotn = {r["event_type"] for r in apply_conditions(df, qn.conditions).collect()}
    assert gotn == {"ab"}  # NULL excluded, like the other NOT_* comparators


def test_passthrough_grouping_sets_having_except(spark):
    """SQL surfaces the reference lacks entirely (SURVEY §2.2 'absent'
    rows) work through the shim's spark.sql passthrough: GROUPING SETS,
    HAVING, EXCEPT."""
    spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0), ("b", "y", 4.0)],
        "k string, s string, v double",
    ).createOrReplaceTempView("shim_t")

    gs = zx_sql(
        spark,
        "select k, s, sum(v) as sv from shim_t "
        "group by grouping sets ((k), (s), ())",
    ).collect()
    rows = {(r["k"], r["s"]): r["sv"] for r in gs}
    assert rows[("a", None)] == 3.0 and rows[(None, "x")] == 4.0
    assert rows[(None, None)] == 10.0

    hav = zx_sql(
        spark,
        "select k, sum(v) as sv from shim_t group by k having sum(v) > 4",
    ).collect()
    assert [(r["k"], r["sv"]) for r in hav] == [("b", 7.0)]

    exc = zx_sql(
        spark,
        "select k from shim_t except select k from shim_t where k = 'a'",
    ).collect()
    assert [r["k"] for r in exc] == ["b"]


def test_pnn_percentile_dialect_extension(spark):
    """pNN select items (beyond the reference fn table) parse to the
    mergeable QUANTILE_APPROX aggregate; p50 stays the reference-exact
    percentile."""
    import pytest
    from zx_spark.model import Aggregate
    from zx_spark.sqlshim.translate import ZxSqlError, parse_zx_sql

    q = parse_zx_sql("select p90(value), p99(value) group by event_type")
    assert [s.aggregate for s in q.selects] == [Aggregate.QUANTILE_APPROX] * 2
    assert [s.params for s in q.selects] == [(0.9,), (0.99,)]
    assert parse_zx_sql("select p50(value)").selects[0].aggregate is Aggregate.P50
    with pytest.raises(ZxSqlError):
        parse_zx_sql("select p0(value)")
    with pytest.raises(ZxSqlError):
        parse_zx_sql("select q90(value)")


# ------------------------- multidim GROUP BY (CUBE/ROLLUP/GROUPING SETS, r7)


def test_parse_multidim_group_by():
    q = parse_zx_sql("select sum(foo) group by cube(x, y)")
    assert q.group_mode == "cube" and q.group_by == ["x", "y"]
    q = parse_zx_sql("select sum(foo) group by rollup(x, y)")
    assert q.group_mode == "rollup" and q.group_by == ["x", "y"]
    q = parse_zx_sql("select sum(foo) group by grouping sets((x, y), (y), ())")
    assert q.group_mode == [["x", "y"], ["y"], []]
    assert q.group_by == ["x", "y"]
    with pytest.raises(ZxSqlError):
        parse_zx_sql("select sum(foo) group by grouping sets(())")
    with pytest.raises(ZxSqlError):
        parse_zx_sql("select sum(foo) group by grouping sets((x), y)")


def test_parse_multidim_space_before_paren():
    """Regression (r8 ADVICE): `CUBE (a, b)` — whitespace before the
    paren, as GROUPING SETS already allowed — used to fall through to
    the plain-dim parser and die with a misleading bad-identifier
    error."""
    q = parse_zx_sql("select sum(foo) group by cube (x, y)")
    assert q.group_mode == "cube" and q.group_by == ["x", "y"]
    q = parse_zx_sql("select sum(foo) group by rollup  (x)")
    assert q.group_mode == "rollup" and q.group_by == ["x"]


def test_multidim_requires_aggregates(spark):
    with pytest.raises(ZxSqlError, match="bare columns"):
        zx_sql(spark, "select foo group by cube(x, y)", df=zx_fixture(spark))
    with pytest.raises(ZxSqlError, match="ORDER BY"):
        zx_sql(
            spark,
            "select sum(foo) group by cube(x, y) order by sum(foo)",
            df=zx_fixture(spark),
        )


def _rows(df):
    # rolled-up dims are NULL — sort on a None-safe repr key
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_shim_cube_matches_multidim_agg(spark):
    """The shim's CUBE/ROLLUP/GROUPING SETS spellings must produce the
    exact one-Expand multidim_agg frame (same __nil conventions, same
    grouping_id bits) — shim users get the same single-scan plan as API
    users."""
    from zx_spark.model import Aggregate, Select
    from zx_spark.operators.olap import multidim_agg

    df = zx_fixture(spark)
    sels = [Select("foo", Aggregate.SUM), Select("foo", Aggregate.COUNT)]
    for spelling, mode in [
        ("cube(x, y)", "cube"),
        ("rollup(x, y)", "rollup"),
        ("grouping sets((x, y), (x), ())", [["x", "y"], ["x"], []]),
    ]:
        got = zx_sql(
            spark, f"select sum(foo), count(foo) group by {spelling}", df=df
        )
        exp = multidim_agg(df, ["x", "y"], sels, mode=mode)
        assert _rows(got) == _rows(exp), spelling
        assert got.columns == ["g_x", "g_y", "grouping_id", "sum__foo", "count__foo"]


def test_shim_cube_values_match_duckdb(spark):
    import duckdb
    import pandas as pd

    from zx_spark.storage import ZX_FIXTURE_ROWS

    got = {
        (r["g_x"], r["g_y"], r["grouping_id"]): r["sum__foo"]
        for r in zx_sql(
            spark, "select sum(foo) group by cube(x, y)", df=zx_fixture(spark)
        ).collect()
    }
    pdf = pd.DataFrame(
        [(x, y, float(foo)) for (_, _, foo, x, y, _) in ZX_FIXTURE_ROWS],
        columns=["x", "y", "foo"],
    )
    con = duckdb.connect()
    con.register("fx", pdf)
    exp = {
        (r[0], r[1], r[2]): r[3]
        for r in con.sql(
            "WITH t AS (SELECT coalesce(x, '__nil') AS g_x, "
            "coalesce(y, '__nil') AS g_y, foo FROM fx) "
            "SELECT g_x, g_y, GROUPING(g_x, g_y)::bigint, sum(foo) "
            "FROM t GROUP BY CUBE(g_x, g_y)"
        ).fetchall()
    }
    assert got == exp


def test_multidim_explicit_granularity_raises(spark):
    """r7 review: an explicit GRANULARITY clause with CUBE/ROLLUP used to
    be silently dropped (un-windowed totals for a query that asked for
    hourly windows) — it must raise like the ORDER BY case. The session
    DEFAULT granularity (no clause in the text) must still be fine."""
    df = zx_fixture(spark)
    with pytest.raises(ZxSqlError, match="GRANULARITY"):
        zx_sql(spark, "select sum(foo) granularity 1h group by cube(x, y)", df=df)
    # no explicit clause -> the (ignored-for-cube) session default is fine
    assert zx_sql(
        spark, "select sum(foo) group by cube(x)", df=df, granularity_s=3600.0
    ).count() > 0


def test_multidim_without_rate_col(spark):
    """r7 review: the multidim branch must apply the same rate_col
    existence guard as compile_query — a frame with no sample_rate
    column used to crash with UNRESOLVED_COLUMN through the cube path
    while working through plain GROUP BY."""
    df = zx_fixture(spark).drop("sample_rate")
    plain = zx_sql(spark, "select sum(foo) group by x", df=df, granularity_s=None)
    cubed = zx_sql(spark, "select sum(foo) group by cube(x)", df=df)
    assert plain.count() > 0
    rows = {r["g_x"]: r["sum__foo"] for r in cubed.filter("grouping_id = 0").collect()}
    want = {r["g_x"]: r["sum__foo"] for r in plain.collect()}
    assert rows == want


def test_limit_top_k(spark):
    """r7 s2 beyond-reference LIMIT: deterministic top-k after the wired
    ORDER BY (the reference has neither, src/lib.rs:840); ties closed by
    the group key so the cut is stable. Values pinned vs DuckDB."""
    import duckdb
    import pandas as pd

    from zx_spark.storage import ZX_FIXTURE_ROWS

    df = zx_fixture(spark)
    got = [
        (r["g_x"], r["sum__foo"])
        for r in zx_sql(
            spark,
            "select sum(foo) group by x order by sum(foo) desc limit 3",
            df=df,
            granularity_s=None,
        ).collect()
    ]
    assert len(got) == 3
    pdf = pd.DataFrame(
        [(x, float(foo)) for (_, _, foo, x, _, _) in ZX_FIXTURE_ROWS],
        columns=["x", "foo"],
    )
    con = duckdb.connect()
    con.register("fx", pdf)
    want = con.sql(
        "SELECT coalesce(x, '__nil') g_x, sum(foo) s FROM fx "
        "GROUP BY 1 ORDER BY s DESC, g_x LIMIT 3"
    ).fetchall()
    assert got == [(x, s) for x, s in want]


def test_limit_validation(spark):
    df = zx_fixture(spark)
    with pytest.raises(ZxSqlError, match="LIMIT requires ORDER BY"):
        zx_sql(spark, "select sum(foo) group by x limit 3", df=df)
    with pytest.raises(ZxSqlError, match="bad LIMIT"):
        zx_sql(
            spark,
            "select sum(foo) group by x order by sum(foo) limit 0",
            df=df,
        )
    with pytest.raises(ZxSqlError, match="bad LIMIT"):
        zx_sql(
            spark,
            "select sum(foo) group by x order by sum(foo) limit -2",
            df=df,
        )


def test_having_filters_aggregates(spark):
    """r7 s2 beyond-reference HAVING: post-aggregation predicates on
    aggregate keys, AND-composed, across the plain, ordered and cube
    paths; values pinned vs DuckDB."""
    import duckdb
    import pandas as pd

    from zx_spark.storage import ZX_FIXTURE_ROWS

    df = zx_fixture(spark)
    pdf = pd.DataFrame(
        [(x, float(foo)) for (_, _, foo, x, _, _) in ZX_FIXTURE_ROWS],
        columns=["x", "foo"],
    )
    con = duckdb.connect()
    con.register("fx", pdf)
    # plain grouped path (no windows)
    got = {
        (r["g_x"], r["sum__foo"], r["count__foo"])
        for r in zx_sql(
            spark,
            "select sum(foo), count(foo) group by x "
            "having sum(foo) > 300 and count(foo) >= 1",
            df=df,
            granularity_s=None,
        ).collect()
    }
    want = {
        (x, s, c)
        for (x, s, c) in con.sql(
            "SELECT coalesce(x, '__nil'), sum(foo), count(foo)::double FROM fx "
            "GROUP BY 1 HAVING sum(foo) > 300 AND count(foo) >= 1"
        ).fetchall()
    }
    assert got == want and got
    # ordered + limit path composes
    rows = zx_sql(
        spark,
        "select sum(foo) group by x having sum(foo) > 300 "
        "order by sum(foo) desc limit 2",
        df=df,
        granularity_s=None,
    ).collect()
    assert len(rows) == 2 and all(r["sum__foo"] > 300 for r in rows)
    # cube path: every surviving row (incl. subtotals) clears the bar
    cube = zx_sql(
        spark, "select sum(foo) group by cube(x) having sum(foo) > 300", df=df
    ).collect()
    assert cube and all(r["sum__foo"] > 300 for r in cube)
    assert any(r["grouping_id"] == 1 for r in cube)  # grand total survives


def test_having_validation(spark):
    df = zx_fixture(spark)
    with pytest.raises(ZxSqlError, match="not in SELECT"):
        zx_sql(spark, "select sum(foo) group by x having mean(foo) > 1", df=df)
    with pytest.raises(ZxSqlError, match="bad HAVING"):
        zx_sql(spark, "select sum(foo) group by x having foo > 1", df=df)


def test_having_pnn_and_heatmap(spark):
    """r7 s2 review: p90(col) must resolve in HAVING (its $$key is the
    shared quantile_approx key — resolution goes by alias); heatmap is
    rejected with a clean parse error, not a downstream
    AnalysisException."""
    df = zx_fixture(spark)
    rows = zx_sql(
        spark,
        "select p90(foo) group by x having p90(foo) > 0",
        df=df,
        granularity_s=None,
    ).collect()
    assert rows and all(r["p90_approx__foo"] > 0 for r in rows)
    with pytest.raises(ZxSqlError, match="numeric aggregate"):
        zx_sql(
            spark,
            "select heatmap(foo), sum(foo) group by x having heatmap(foo) > 1",
            df=df,
        )


def test_keyword_named_columns_inside_parens(spark):
    """r7 s2 review: adding limit/having to the clause splitter must not
    reserve them INSIDE parentheses — sum(limit) / count(having) are
    plain column references there (keywords stay reserved at clause
    position, standard SQL)."""
    from pyspark.sql import functions as F

    df = zx_fixture(spark).withColumn(
        "limit", F.col("foo")
    ).withColumn("having", F.col("foo"))
    rows = zx_sql(
        spark,
        "select sum(limit), count(having) group by x",
        df=df,
        granularity_s=None,
    ).collect()
    assert rows and all(r["sum__limit"] is not None for r in rows)

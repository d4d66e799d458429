"""Multi-dimensional CUBE / ROLLUP / GROUPING SETS aggregation: full
parity against DuckDB's GROUP BY CUBE on the driver documents table,
grouping_id bit-order pinning, explicit grouping sets, __nil vs
rolled-up NULL disambiguation, and the one-Expand-one-Aggregate plan
shape."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from zx_spark.model import Aggregate, Select
from zx_spark.operators.olap import multidim_agg

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    from zx_spark.storage import read_table

    return read_table(spark, SF, "documents")


def _duck_cube(by: str):
    con = duckdb.connect()
    return con.sql(
        "WITH base AS (SELECT coalesce(lang, '__nil') AS g_lang, "
        "coalesce(source, '__nil') AS g_source, n_chars "
        f"FROM read_parquet('{SF}/documents.parquet')) "
        "SELECT g_lang, g_source, GROUPING(g_lang, g_source) AS gid, "
        "count(*)::BIGINT AS n, sum(n_chars)::DOUBLE AS s "
        f"FROM base GROUP BY {by}"
    ).fetchall()


def _spark_rows(out):
    return {
        (r["g_lang"], r["g_source"], r["grouping_id"]): (
            int(r["count__n_chars"]),
            r["sum__n_chars"],
        )
        for r in out.collect()
    }


def test_cube_matches_duckdb(spark, docs):
    out = multidim_agg(
        docs,
        ["lang", "source"],
        [
            Select("n_chars", Aggregate.COUNT),
            Select("n_chars", Aggregate.SUM),
        ],
    )
    got = _spark_rows(out)
    exp = {(g1, g2, gid): (n, s) for g1, g2, gid, n, s in _duck_cube("CUBE(g_lang, g_source)")}
    assert got == exp
    # 2-dim cube = 4 grouping sets, all present
    assert {gid for _, _, gid in got} == {0, 1, 2, 3}
    # grand-total row equals the table size
    [(total, _)] = [v for (a, b, gid), v in got.items() if gid == 3]
    assert total == docs.count()


def test_rollup_matches_duckdb(spark, docs):
    out = multidim_agg(
        docs,
        ["lang", "source"],
        [
            Select("n_chars", Aggregate.COUNT),
            Select("n_chars", Aggregate.SUM),
        ],
        mode="rollup",
    )
    got = _spark_rows(out)
    exp = {
        (g1, g2, gid): (n, s)
        for g1, g2, gid, n, s in _duck_cube("ROLLUP(g_lang, g_source)")
    }
    assert got == exp
    # rollup = hierarchical prefixes only: (lang,source), (lang), ()
    assert {gid for _, _, gid in got} == {0, 1, 3}


def test_grouping_id_bit_order(spark, docs):
    """First dim = most significant bit (SQL standard, shared by
    DuckDB's GROUPING): rows with lang kept but source rolled up must
    carry gid=1, the mirror set gid=2."""
    out = multidim_agg(
        docs, ["lang", "source"], [Select("n_chars", Aggregate.COUNT)]
    ).collect()
    for r in out:
        expect = (2 if r["g_lang"] is None else 0) + (
            1 if r["g_source"] is None else 0
        )
        assert r["grouping_id"] == expect


def test_explicit_grouping_sets(spark, docs):
    out = multidim_agg(
        docs,
        ["lang", "source"],
        [Select("n_chars", Aggregate.COUNT)],
        mode=[["lang"], []],
    )
    got = {
        (r["g_lang"], r["g_source"], r["grouping_id"]): int(r["count__n_chars"])
        for r in out.collect()
    }
    # source is in no requested set, so its grouping bit (LSB) is always
    # 1 and DuckDB may not reference it in GROUPING() at all
    con = duckdb.connect()
    exp = {
        (g1, None, gid * 2 + 1): n
        for g1, gid, n in con.sql(
            "WITH base AS (SELECT coalesce(lang, '__nil') AS g_lang "
            f"FROM read_parquet('{SF}/documents.parquet')) "
            "SELECT g_lang, GROUPING(g_lang) AS g, count(*)::BIGINT AS n "
            "FROM base GROUP BY GROUPING SETS ((g_lang), ())"
        ).fetchall()
    }
    assert got == exp
    assert {gid for _, _, gid in got} == {1, 3}


def test_nil_vs_rolled_up_null(spark):
    """A genuine NULL key surfaces as '__nil' (house convention); a NULL
    in the output means rolled-up — the two never collide."""
    df = spark.createDataFrame(
        [(None, "x", 1.0), ("a", "x", 2.0)], "k string, j string, v double"
    )
    out = multidim_agg(df, ["k", "j"], [Select("v", Aggregate.SUM)])
    rows = {(r["g_k"], r["g_j"]): r["sum__v"] for r in out.collect()}
    assert rows[("__nil", "x")] == 1.0
    assert rows[("a", "x")] == 2.0
    assert rows[(None, "x")] == 3.0  # k rolled up, not missing
    assert rows[(None, None)] == 3.0


def test_sketch_aggregates_participate(spark, docs):
    """COUNT_DISTINCT (exact, recomputed per grouping set from raw rows
    via Expand) is consistent across levels: the grand-total distinct
    equals a direct countDistinct, and every finer set's distinct is
    <= the sum over its rows' children."""
    out = multidim_agg(
        docs, ["lang"], [Select("source", Aggregate.COUNT_DISTINCT)]
    ).collect()
    direct = docs.select(F.countDistinct("source")).collect()[0][0]
    total = [r for r in out if r["g_lang"] is None]
    assert len(total) == 1 and int(total[0]["count_distinct__source"]) == direct


def test_single_expand_single_scan(spark, docs):
    """One Expand feeding one (partial) aggregate — not 2^d scans."""
    out = multidim_agg(
        docs,
        ["lang", "source"],
        [Select("n_chars", Aggregate.SUM)],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    assert plan.count("Scan parquet") <= 1
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_input_validation(spark, docs):
    with pytest.raises(ValueError):
        multidim_agg(docs, [], [Select("n_chars", Aggregate.SUM)])
    with pytest.raises(ValueError):
        multidim_agg(docs, ["lang"], [])
    with pytest.raises(ValueError):
        multidim_agg(docs, ["lang"], [Select("n_chars", Aggregate.SUM)], mode="bogus")
    with pytest.raises(ValueError):
        multidim_agg(
            docs,
            ["lang"],
            [Select("n_chars", Aggregate.SUM)],
            mode=[["nope"]],
        )


def test_cube_equals_union_of_plain_groupbys(spark, docs):
    """Property (r7): the one-Expand cube frame must equal the union of
    the 2^d independently-computed plain GROUP BYs — each grouping set's
    rows match the direct aggregation bit for bit (values, __nil keys,
    grouping_id)."""
    sels = [Select("n_chars", Aggregate.SUM), Select("n_chars", Aggregate.COUNT)]
    dims = ["lang", "source"]
    cube = multidim_agg(docs, dims, sels, mode="cube")
    got = {}
    for r in cube.collect():
        got[(r["g_lang"], r["g_source"], r["grouping_id"])] = (
            r["sum__n_chars"], r["count__n_chars"],
        )
    exp = {}
    for gid, keep in [(0, (True, True)), (1, (True, False)), (2, (False, True)), (3, (False, False))]:
        keys = [
            F.coalesce(F.col(d).cast("string"), F.lit("__nil")).alias(f"g_{d}")
            for d, k in zip(dims, keep)
            if k
        ]
        agg = docs.groupBy(*keys).agg(
            F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("s"),
            F.count("n_chars").cast("double").alias("c"),
        ) if keys else docs.agg(
            F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("s"),
            F.count("n_chars").cast("double").alias("c"),
        )
        for r in agg.collect():
            key = (
                r["g_lang"] if keep[0] else None,
                r["g_source"] if keep[1] else None,
                gid,
            )
            exp[key] = (r["s"], r["c"])
    assert got == exp

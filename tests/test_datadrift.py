"""Batch PSI drift: zero on identical data, sensitive to planted
shifts, equal to the pure-Python fold on DuckDB-derived counts (an
independent derivation), and a single-scan-per-side plan."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from zx_spark.operators.datadrift import (
    categorical_psi,
    drift_report,
    numeric_psi,
    psi_python,
    quantile_edges,
    top_categories,
)

SF0 = "/root/testdata/sf0.001"
SF1 = "/root/testdata/sf0.01"


def test_identical_distributions_zero_psi(spark):
    df = spark.createDataFrame(
        [(float(i % 100),) for i in range(1000)], "v double"
    )
    row = numeric_psi(df, df, "v", bins=10).collect()[0]
    assert row["psi"] == 0.0
    assert row["n_base"] == row["n_cur"] == 1000


def test_planted_shift_flags(spark):
    base = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    cur = base.select((F.col("v") + 50.0).alias("v"))
    row = numeric_psi(base, cur, "v", bins=10).collect()[0]
    assert row["psi"] > 0.25  # major shift by the conventional reading


def test_nulls_excluded_and_validation(spark):
    base = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    row = numeric_psi(base, base, "v", bins=2).collect()[0]
    assert row["n_base"] == 2 and row["psi"] == 0.0
    with pytest.raises(ValueError):
        quantile_edges(base, "v", bins=1)
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError):
        quantile_edges(empty, "v")
    with pytest.raises(ValueError):
        drift_report(base, base)


def test_categorical_psi_shift(spark):
    base = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20, "v string"
    )
    same = categorical_psi(base, base, "v", top_k=2).collect()[0]
    assert same["psi"] == 0.0
    cur = spark.createDataFrame(
        [("a",)] * 20 + [("b",)] * 30 + [("c",)] * 50, "v string"
    )
    row = categorical_psi(base, cur, "v", top_k=2).collect()[0]
    # a and b are the base top-2; c falls into __other
    want = psi_python([50, 30, 20], [20, 30, 50])
    assert row["psi"] == pytest.approx(want, abs=1e-6)
    assert top_categories(base, "v", 2) == ["a", "b"]


def test_duckdb_independent_derivation(spark):
    """sf0.001 as base vs sf0.01 as current: DuckDB derives the edges
    and bin counts independently; psi_python folds them; Spark's
    numeric_psi must agree."""
    from zx_spark.storage import read_table

    base = read_table(spark, SF0, "documents")
    cur = read_table(spark, SF1, "documents")
    got = numeric_psi(base, cur, "n_chars", bins=10).collect()[0]

    con = duckdb.connect()
    edges = [
        round(float(v), 6)
        for v in con.execute(
            f"SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) "
            f"FROM '{SF0}/documents.parquet'"
        ).fetchone()[0]
    ]

    def duck_counts(path):
        counts = []
        for i in range(10):
            conds = ["n_chars IS NOT NULL"]
            if i > 0:
                conds.append(f"n_chars > {edges[i - 1]!r}")
            if i < 9:
                conds.append(f"n_chars <= {edges[i]!r}")
            counts.append(
                con.execute(
                    f"SELECT count(*) FROM '{path}/documents.parquet' "
                    f"WHERE {' AND '.join(conds)}"
                ).fetchone()[0]
            )
        return counts

    want = psi_python(duck_counts(SF0), duck_counts(SF1))
    assert got["psi"] == pytest.approx(want, abs=1e-6)


def test_drift_report_shape(spark):
    from zx_spark.storage import read_table

    base = read_table(spark, SF0, "documents")
    rows = {
        (r["column"], r["kind"]): r["psi"]
        for r in drift_report(
            base, base, numeric_cols=["n_chars"], categorical_cols=["lang"]
        ).collect()
    }
    assert rows == {("n_chars", "numeric"): 0.0, ("lang", "categorical"): 0.0}


def test_single_scan_per_side(spark):
    """Each side's bin counts are ONE conditional-sum aggregation: the
    plan scans base twice (edges + counts) and cur once — never more."""
    from zx_spark.storage import read_table

    base = read_table(spark, SF0, "documents")
    cur = read_table(spark, SF1, "documents")
    edges = quantile_edges(base, "n_chars", 10)
    plan = (
        numeric_psi(base, cur, "n_chars", edges=edges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 2  # one per side; edges were given
    assert "CartesianProduct" not in plan


def test_empty_side_yields_null_psi(spark):
    """ADVICE r6: a side with zero non-NULL values must not raise a raw
    ANSI DIVIDE_BY_ZERO — psi is NULL, counts still reported."""
    base = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,)], "v double"
    )
    empty = spark.createDataFrame([(None,)], "v double")
    row = numeric_psi(base, empty, "v", bins=2).collect()[0]
    assert row["psi"] is None and row["n_cur"] == 0 and row["n_base"] == 4
    # explicit edges let the BASE side be the empty one too
    row2 = numeric_psi(empty, base, "v", bins=2, edges=[2.5]).collect()[0]
    assert row2["psi"] is None and row2["n_base"] == 0

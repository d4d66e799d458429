"""Classifier evaluation: tie-aware exact AUC vs a pure-Python
Mann-Whitney reference, confusion/PR consistency, edge cases, DuckDB
parity on the driver documents, and the bounded-window plan shape."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from zx_spark.operators.evaluate import confusion_at, pr_curve, roc_auc

SF = "/root/testdata/sf0.01"


def _py_auc(pairs):
    """Tie-aware Mann-Whitney AUC: average ranks ascending by score."""
    pairs = [(s, bool(y)) for s, y in pairs if s is not None and y is not None]
    n_pos = sum(1 for _, y in pairs if y)
    n_neg = len(pairs) - n_pos
    if n_pos == 0 or n_neg == 0:
        return None
    by_score: dict = {}
    for s, y in pairs:
        c, p = by_score.get(s, (0, 0))
        by_score[s] = (c + 1, p + (1 if y else 0))
    u = 0.0
    below = 0
    for s in sorted(by_score):
        c, p = by_score[s]
        u += p * (below + (c + 1) / 2.0)
        below += c
    return (u - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


CASES = [
    # perfect separation
    [(1.0, False), (2.0, False), (3.0, True), (4.0, True)],
    # inverted
    [(4.0, False), (3.0, False), (2.0, True), (1.0, True)],
    # heavy ties
    [(1.0, True), (1.0, False), (1.0, True), (2.0, False), (2.0, True)],
    # random-ish
    [(0.1, False), (0.9, True), (0.4, True), (0.35, False), (0.8, False),
     (0.8, True), (0.8, True), (0.05, False)],
]


@pytest.mark.parametrize("case", CASES)
def test_auc_matches_python_reference(spark, case):
    df = spark.createDataFrame(case, "score double, label boolean")
    row = roc_auc(df, "score", "label").collect()[0]
    assert row["auc"] == pytest.approx(_py_auc(case), abs=1e-6)
    assert row["n_pos"] == sum(1 for _, y in case if y)
    assert row["n_neg"] == sum(1 for _, y in case if not y)


def test_auc_degenerate_and_nulls(spark):
    one_class = spark.createDataFrame(
        [(1.0, True), (2.0, True)], "score double, label boolean"
    )
    assert roc_auc(one_class, "score", "label").collect()[0]["auc"] is None
    with_nulls = spark.createDataFrame(
        [(1.0, False), (None, True), (3.0, None), (2.0, True)],
        "score double, label boolean",
    )
    row = roc_auc(with_nulls, "score", "label").collect()[0]
    assert row["n_pos"] == 1 and row["n_neg"] == 1 and row["auc"] == 1.0


def test_binned_null_scores_are_excluded(spark):
    """NULL scores must be dropped under bins too — F.least(NULL, k) and
    the hi==lo branch would otherwise misfile them into a real bucket
    (review finding: n_neg inflated, AUC corrupted)."""
    df = spark.createDataFrame(
        [(0.1, False), (0.9, True), (None, False), (0.4, True)],
        "score double, label boolean",
    )
    row = roc_auc(df, "score", "label", bins=10).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (2, 1)
    assert row["auc"] == 1.0
    # hi==lo degenerate range with a NULL mixed in
    const = spark.createDataFrame(
        [(5.0, True), (5.0, False), (None, True)], "score double, label boolean"
    )
    r2 = roc_auc(const, "score", "label", bins=10).collect()[0]
    assert (r2["n_pos"], r2["n_neg"]) == (1, 1) and r2["auc"] == 0.5


def test_pr_curve_cut_is_in_score_units(spark):
    """cut must be the bucket's lower bound in SCORE units — a caller
    deploys `score >= cut` directly (review finding: it was the bare
    bucket index)."""
    df = spark.createDataFrame(
        [(0.0, False), (0.5, True), (1.0, True)], "score double, label boolean"
    )
    cuts = sorted(r["cut"] for r in pr_curve(df, "score", "label", bins=4).collect())
    for c in cuts:
        assert 0.0 <= c <= 1.0, cuts
    assert cuts[0] == 0.0 and cuts[-1] == pytest.approx(0.75, abs=1e-9)


def test_confusion_plan_single_scan(spark):
    """All thresholds come from ONE aggregation of ONE scan — not a
    union of per-threshold branches over aggregate copies."""
    from zx_spark.storage import read_table

    docs = read_table(spark, SF, "documents")
    from pyspark.sql import functions as F
    scored = docs.select(
        F.col("n_chars").cast("double").alias("s"),
        (F.col("lang") == "en").alias("y"),
    )
    plan = (
        confusion_at(scored, "s", "y", [100.0, 200.0, 300.0, 400.0])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert "Union" not in plan


def test_auc_binned_quantization(spark):
    case = CASES[3]
    df = spark.createDataFrame(case, "score double, label boolean")
    exact = roc_auc(df, "score", "label").collect()[0]["auc"]
    binned = roc_auc(df, "score", "label", bins=1000).collect()[0]["auc"]
    assert binned == pytest.approx(exact, abs=1e-3)
    # constant score → all one bucket → AUC 0.5 (pure ties)
    const = spark.createDataFrame(
        [(5.0, True), (5.0, False)], "score double, label boolean"
    )
    assert roc_auc(const, "score", "label", bins=10).collect()[0]["auc"] == 0.5
    with pytest.raises(ValueError):
        roc_auc(df, "score", "label", bins=1)


def test_confusion_and_f1(spark):
    case = [(0.9, True), (0.8, True), (0.7, False), (0.3, True), (0.1, False)]
    df = spark.createDataFrame(case, "score double, label boolean")
    rows = {r["threshold"]: r for r in
            confusion_at(df, "score", "label", [0.5, 0.95]).collect()}
    r5 = rows[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (2, 1, 1, 1)
    assert r5["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert r5["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert r5["f1"] == pytest.approx(2 / 3, abs=1e-6)
    r95 = rows[0.95]
    assert (r95["tp"], r95["fp"]) == (0, 0)
    assert r95["precision"] is None and r95["f1"] is None
    with pytest.raises(ValueError):
        confusion_at(df, "score", "label", [])


def test_pr_curve_consistency(spark):
    case = CASES[3]
    df = spark.createDataFrame(case, "score double, label boolean")
    rows = sorted(
        pr_curve(df, "score", "label", bins=4).collect(),
        key=lambda r: -r["cut"],
    )
    # n_ge and tp are non-decreasing as the cut drops; last row covers all
    n_prev, tp_prev = 0, 0
    for r in rows:
        assert r["n_ge"] >= n_prev and r["tp"] >= tp_prev
        n_prev, tp_prev = r["n_ge"], r["tp"]
    assert rows[-1]["n_ge"] == len(case)
    assert rows[-1]["recall"] == 1.0


def test_duckdb_parity_on_driver_documents(spark):
    """AUC of the en-stopword micro score against lang=='en' — the same
    construction the driver arm uses — vs an independent DuckDB
    formulation."""
    from zx_spark.storage import read_table

    docs = read_table(spark, SF, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit(""))
    sw = F.array(*[F.lit(w) for w in
                   ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"]])
    score = F.round(
        F.lit(1e6) * F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        / F.greatest(F.size(toks), F.lit(1))
    ).cast("long")
    scored = docs.select(score.alias("s"), (F.col("lang") == "en").alias("y"))
    got = roc_auc(scored, "s", "y").collect()[0]
    want = duckdb.connect().execute(f"""
        WITH sc AS (
          SELECT round(1e6 * len(list_filter(
                   list_filter(string_split_regex(lower(text), '\\s+'), t -> t != ''),
                   t -> list_contains(['the','a','and','of','to','in','is','that','it','for'], t)))
                 / greatest(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')), 1))::bigint AS s,
                 (lang = 'en') AS y
          FROM '{SF}/documents.parquet' WHERE lang IS NOT NULL
        ),
        per AS (SELECT s, count(*) AS c, sum(y::int) AS p FROM sc GROUP BY s),
        rk AS (SELECT *, coalesce(sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below FROM per)
        SELECT round((sum(p * (below + (c + 1) / 2.0)) - sum(p) * (sum(p) + 1) / 2.0)
                     / (sum(p) * sum(c - p)), 6) AS auc,
               sum(p) AS n_pos, sum(c - p) AS n_neg
        FROM rk
    """).fetchone()
    assert got["auc"] == pytest.approx(float(want[0]), abs=1e-6)
    assert (got["n_pos"], got["n_neg"]) == (int(want[1]), int(want[2]))


def test_plan_no_global_sort_of_rows(spark):
    """The rank window must run AFTER the per-score aggregation: the plan
    sorts the distinct-score frame, never the raw rows (no Sort below the
    first HashAggregate)."""
    from zx_spark.storage import read_table

    docs = read_table(spark, SF, "documents")
    scored = docs.select(
        F.col("n_chars").cast("double").alias("s"),
        (F.col("lang") == "en").alias("y"),
    )
    plan = (
        roc_auc(scored, "s", "y")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly one Sort — the single-partition window over the DISTINCT
    # scores (above the per-score HashAggregate) — and no range-partition
    # global sort of the raw rows anywhere
    assert plan.count("Sort ") == 1
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" in plan and "HashAggregate" in plan

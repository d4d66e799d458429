"""Line-level boilerplate scrub (operators/decontaminate.py
scrub_repeated_lines): exact rewrite semantics, order/whitespace
preservation, NULL handling, broadcast ≡ join methods, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zx_spark.operators.decontaminate import (
    repeated_line_hashes,
    scrub_repeated_lines,
)

DOCS = [
    (1, "intro one\nCOOKIE BANNER\nbody text a"),
    (2, "intro two\ncookie banner\nCOOKIE BANNER\nbody text b"),
    (3, "  COOKIE BANNER  \nunique line three"),  # trimmed form matches
    (4, "all original\nnothing shared"),
    (5, ""),  # single empty line, never counted
    (6, None),
    (7, "COOKIE BANNER"),  # whole doc is boilerplate -> scrubs to ''
    (8, "a\n\n  \nb"),  # whitespace-only lines preserved verbatim
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repeated_line_hashes_threshold(spark, docs):
    # 'COOKIE BANNER' in docs 1,2,3,7 (distinct per doc); nothing else repeats
    hot = repeated_line_hashes(docs, min_docs=2).collect()
    assert len(hot) == 1
    assert hot[0]["n_docs"] == 4
    assert repeated_line_hashes(docs, min_docs=5).count() == 0
    with pytest.raises(ValueError):
        repeated_line_hashes(docs, min_docs=1)


EXPECT = {
    1: ("intro one\nbody text a", 1),
    2: ("intro two\ncookie banner\nbody text b", 1),  # case-sensitive
    3: ("unique line three", 1),
    4: ("all original\nnothing shared", 0),
    5: ("", 0),
    6: (None, None),
    7: ("", 1),
    8: ("a\n\n  \nb", 0),
}


@pytest.mark.parametrize("method", ["broadcast", "join"])
def test_scrub_semantics(spark, docs, method):
    out = {
        r["doc_id"]: (r["scrubbed"], r["n_lines_dropped"])
        for r in scrub_repeated_lines(docs, min_docs=2, method=method).collect()
    }
    assert out == EXPECT


def test_methods_identical_on_corpus(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    a = scrub_repeated_lines(docs, min_docs=2, method="broadcast")
    b = scrub_repeated_lines(docs, min_docs=2, method="join")
    cols = ["doc_id", "scrubbed", "n_lines_dropped"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_no_rows_lost_or_gained(spark, docs):
    for method in ("broadcast", "join"):
        assert scrub_repeated_lines(docs, method=method).count() == len(DOCS)


def test_broadcast_plan_no_reassembly_shuffle(spark, docs):
    plan = (
        scrub_repeated_lines(docs, min_docs=2, method="broadcast")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchange feeds the tiny hot-set aggregation, which is then
    # broadcast; the corpus side must not be repartitioned or grouped
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_invalid_method(spark, docs):
    with pytest.raises(ValueError):
        scrub_repeated_lines(docs, method="nope")

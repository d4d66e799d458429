"""Duplicated-span detection: hand corpus with a pure-Python reference,
zero-fill/strip behavior, DuckDB value parity on the driver documents
table, and plan shape (skew-safe groupBy+join, no cartesian products)."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from zx_spark.operators.spans import (
    duplicated_span_stats,
    duplicated_spans,
    strip_duplicated_spans,
)

SF = "/root/testdata/sf0.01"

_RUN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
DOCS = [
    (1, f"one two {_RUN} three four"),
    (2, f"x {_RUN} y z"),
    (3, "unique words only here nothing repeats at all ever once"),
    (4, "short"),
    (5, ""),
]


def _py_spans(docs, n=8, min_count=2):
    toked = {i: [t for t in txt.lower().split() if t] for i, txt in docs}
    c = Counter()
    for ts in toked.values():
        for p in range(len(ts) - n + 1):
            c[" ".join(ts[p : p + n])] += 1
    out = {}
    for i, ts in toked.items():
        pos = [
            p
            for p in range(len(ts) - n + 1)
            if c[" ".join(ts[p : p + n])] >= min_count
        ]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] + n:
                spans[-1][1] = p
                spans[-1][2] += 1
            else:
                spans.append([p, p, 1])
        if spans:
            out[i] = [(s, lp + n - 1, cnt) for s, lp, cnt in spans]
    return out


def test_hand_corpus_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {}
    for r in duplicated_spans(df, n=8).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_dup_shingles"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    want = _py_spans(DOCS, n=8)
    assert got == want
    # docs 1 and 2 share the 10-token run; with n=8 the duplicated
    # shingles are the 3 shingles fully inside the run
    assert 1 in got and 2 in got and 3 not in got
    # doc 1: run starts at token 2 → span covers [2, 11]
    assert got[1] == [(2, 11, 3)]
    assert got[2] == [(1, 10, 3)]


def test_stats_zero_fill_and_fraction(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in duplicated_span_stats(df, n=8).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[1]["dup_spans"] == 1 and rows[1]["dup_tokens"] == 10
    assert rows[1]["dup_fraction"] == pytest.approx(10 / 14, abs=1e-6)
    assert rows[3]["dup_spans"] == 0 and rows[3]["dup_fraction"] == 0.0
    assert rows[5]["n_tokens"] == 0 and rows[5]["dup_fraction"] == 0.0


def test_strip_removes_exactly_span_tokens(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = {
        r["doc_id"]: r["text_stripped"]
        for r in strip_duplicated_spans(df, n=8).collect()
    }
    assert rows[1] == "one two three four"
    assert rows[2] == "x y z"
    assert rows[3] == DOCS[2][1]
    assert rows[4] == "short"
    assert rows[5] == ""


def test_strip_preserves_null_text(spark):
    """NULL text is 'no content', distinct from empty (dedup.exact_dedup
    contract) — strip must not rewrite it to ''."""
    df = spark.createDataFrame(
        [(1, f"a b {_RUN}"), (2, f"c d {_RUN}"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["text_stripped"]
            for r in strip_duplicated_spans(df, n=8).collect()}
    assert rows[3] is None
    assert rows[1] == "a b" and rows[2] == "c d"


def test_param_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        duplicated_spans(df, n=0)
    with pytest.raises(ValueError):
        duplicated_spans(df, min_count=1)
    with pytest.raises(ValueError):
        duplicated_spans(df, hash_family="sha9")


def test_xx64_same_spans_as_md5(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = sorted(map(tuple, duplicated_spans(df, n=8).collect()))
    b = sorted(map(tuple, duplicated_spans(df, n=8, hash_family="xx64").collect()))
    assert a == b


_DUCK_SPANS = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
  FROM '{path}'
),
sh AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(toks[i:i+{n}-1], ' ')), 1, 15))::bigint AS h
  FROM toks, unnest(generate_series(1, greatest(len(toks) - {n} + 1, 0))) AS u(i)
),
dup AS (
  SELECT doc_id, pos FROM sh
  WHERE h IN (SELECT h FROM sh GROUP BY h HAVING count(*) >= 2)
),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {n}
              THEN 1 ELSE 0 END AS b
  FROM dup
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
)
SELECT doc_id, min(pos) AS span_start, max(pos) + {n} - 1 AS span_end,
       count(*) AS n_dup_shingles
FROM isl GROUP BY doc_id, island
"""


def test_duckdb_parity_on_driver_documents(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, SF, "documents")
    got = sorted(map(tuple, duplicated_spans(docs, n=8).collect()))
    want = sorted(
        tuple(int(x) for x in row)
        for row in duckdb.connect()
        .execute(_DUCK_SPANS.format(path=f"{SF}/documents.parquet", n=8))
        .fetchall()
    )
    assert len(got) > 0, "driver corpus should contain duplicated spans"
    assert got == want


def test_plan_shape(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, SF, "documents")
    plan = (
        duplicated_spans(docs, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the shingle-count aggregation must have a map-side partial pass
    assert "partial_count" in plan or "HashAggregate" in plan


def test_rejects_duplicate_doc_ids(spark):
    """ADVICE r6 (reworked r8): duplicate ids would silently merge two
    documents' position streams into one gaps-and-islands pass. The
    guard is now IN-PLAN (sentinel markers + raise_error riding the
    existing window shuffle, no eager validation pass), so it fires at
    ACTION time as a Spark error carrying the message."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (1, "a b c d e f g h j")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="unique"):
        duplicated_spans(df, "text", "doc_id", n=8).collect()
    with pytest.raises(Exception, match="unique"):
        duplicated_span_stats(df, "text", "doc_id", n=8).collect()
    # even when the colliding docs share NO duplicated shingle — the
    # marker rows alone detect the collision
    df2 = spark.createDataFrame(
        [(1, "p q r s t u v w x"), (1, "hh ii jj kk ll mm nn oo pp")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="unique"):
        duplicated_spans(df2, "text", "doc_id", n=8).collect()


def test_assume_unique_skips_guard_and_no_eager_jobs(spark):
    """assume_unique=True skips the marker guard; and building the plan
    (either mode) runs NO Spark job — the r7 guard was an eager
    .count() at call time, the r8 ADVICE fix."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    plan = duplicated_spans(df, n=8)  # build only — no action
    plan2 = duplicated_spans(df, n=8, assume_unique=True)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "building the span plan must not run jobs"
    a = sorted(map(tuple, plan.collect()))
    b = sorted(map(tuple, plan2.collect()))
    assert a == b  # unique input: both modes agree

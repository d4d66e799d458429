"""BM25 keyword search: hand-built corpus with known ordering, DuckDB
value parity over the real driver documents table, and plan shape (the
query-term filter reaches the scan side; corpus never shuffles whole)."""

from __future__ import annotations

import math

import duckdb
import pytest

from zx_spark.operators.search import _query_terms, bm25_search, keyword_search

SF = "/root/testdata/sf0.01"

DOCS = [
    (1, "spark fast join fast fast"),
    (2, "slow scan slow"),
    (3, "fast join hash join"),
    (4, "the the the the the the"),
    (5, ""),
]


def _py_bm25(docs, query, k1=1.2, b=0.75):
    """Reference implementation, straight from the formula."""
    terms = _query_terms(query)
    toked = [(i, t.lower().split()) for i, t in docs]
    n = len(toked)
    avgdl = sum(len(ts) for _, ts in toked) / n
    dfreq = {
        t: sum(1 for _, ts in toked if t in ts) for t in terms
    }
    out = {}
    for i, ts in toked:
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            out[i] = round(s, 6)
    return out


def test_hand_corpus_scores_and_ranks(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["bm25"], r["rank"])
        for r in bm25_search(df, {"q": "fast join"}, k=10).collect()
    }
    want = _py_bm25(DOCS, "fast join")
    assert set(got) == set(want)
    for d, score in want.items():
        assert got[d][0] == pytest.approx(score, abs=1e-6)
    # rank: rounded score desc, then doc_id asc
    ordered = sorted(got.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert [kv[1][1] for kv in ordered] == list(range(1, len(ordered) + 1))


def test_doc_with_zero_matches_absent(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = keyword_search(df, "hash", k=10).collect()
    assert {r["doc_id"] for r in got} == {3}


def test_k_truncates_and_multi_query(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = bm25_search(df, {"a": "fast", "b": "slow the"}, k=1).collect()
    by_q = {r["query_id"]: r for r in out}
    assert set(by_q) == {"a", "b"}
    assert all(r["rank"] == 1 for r in out)


def test_empty_and_missing_terms(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_search(df, {})
    with pytest.raises(ValueError):
        bm25_search(df, {"q": "   "})
    # term absent from corpus contributes nothing; query still runs
    got = keyword_search(df, "zzz hash", k=5).collect()
    assert {r["doc_id"] for r in got} == {3}


def test_query_terms_dedupe_and_case():
    assert _query_terms("Fast  FAST join") == ["fast", "join"]


def test_duckdb_parity_on_driver_documents(spark):
    """Value-for-value vs an independent DuckDB formulation at sf0.01."""
    from zx_spark.storage import read_table

    docs = read_table(spark, SF, "documents")
    got = sorted(
        (r["query_id"], r["doc_id"], r["bm25"], r["rank"])
        for r in bm25_search(
            docs, {"q0": "fast hash join", "q1": "slow scan"}, k=8
        ).collect()
    )
    want = sorted(
        (str(q), d, float(s), int(rk))
        for q, d, s, rk in duckdb.connect()
        .execute(_DUCK_BM25.format(path=f"{SF}/documents.parquet", k=8))
        .fetchall()
    )
    assert got == want


_DUCK_BM25 = """
WITH q(query_id, token) AS (
  VALUES ('q0','fast'),('q0','hash'),('q0','join'),('q1','slow'),('q1','scan')
),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
  FROM '{path}'
),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM toks),
ex AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM toks
),
tf AS (
  SELECT doc_id, token, any_value(dl) AS dl, count(*) AS tf
  FROM ex WHERE token IN (SELECT DISTINCT token FROM q)
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(*) AS dfc FROM tf GROUP BY token),
sc AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           ln(1 + (n_docs - dfc + 0.5) / (dfc + 0.5))
           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
         ), 6) AS bm25
  FROM tf JOIN dfreq USING (token) JOIN q USING (token) CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY bm25 DESC, doc_id ASC) AS rank FROM sc
)
SELECT query_id, doc_id, bm25, rank FROM r WHERE rank <= {k}
"""


def test_plan_shape_no_corpus_shuffle_of_tokens(spark):
    """The isin(term-set) filter must sit below the first aggregation so
    only candidate postings shuffle, and the only cross join is the
    broadcast single-row stats frame."""
    from zx_spark.storage import read_table

    docs = read_table(spark, SF, "documents")
    plan = (
        bm25_search(docs, {"q": "fast join"}, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # term-set filter applied at the scan side, before any Exchange
    assert "IN (fast,join)" in plan
    # exactly two corpus scans: one for (N, avgdl), one for postings —
    # document frequency must NOT trigger a third scan+explode
    assert plan.count("FileScan parquet") == 2
    # the only nested-loop join is the broadcast 1-row stats frame
    assert "CartesianProduct" not in plan

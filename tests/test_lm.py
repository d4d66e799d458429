"""Hashed bigram LM (functions/lm.py): exact-count golden, Spark ≡
Python-twin training, scoring arithmetic (BOS, empty/NULL), the filter
gate, and plan shape (no shuffle/Python at score time)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from zx_spark.functions.lm import (
    BOS,
    MICRO,
    _bucket_py,
    lm_filter,
    lm_score,
    lm_score_python,
    lm_train,
    lm_train_python,
)


def test_golden_counts_tiny_corpus():
    # "a b a" → bigrams (<s>,a) (a,b) (b,a); contexts <s>, a, b
    m = lm_train_python(["a b a"], n_buckets=64, alpha=0.5)
    bi = [0] * 64
    ctx = [0] * 64
    for p, c in [(BOS, "a"), ("a", "b"), ("b", "a")]:
        ctx[_bucket_py(p, 64)] += 1
        bi[_bucket_py(f"{p} {c}", 64)] += 1
    for b in range(64):
        assert m["logbi_micro"][b] == round(math.log(bi[b] + 0.5) * MICRO)
        assert m["logctx_micro"][b] == round(math.log(ctx[b] + 0.5 * 64) * MICRO)


def test_score_python_decomposition():
    m = lm_train_python(["a b a", "b b"], n_buckets=32, alpha=1.0)
    got = lm_score_python("a b", m)
    micro = (
        m["logbi_micro"][_bucket_py(f"{BOS} a", 32)]
        - m["logctx_micro"][_bucket_py(BOS, 32)]
        + m["logbi_micro"][_bucket_py("a b", 32)]
        - m["logctx_micro"][_bucket_py("a", 32)]
    )
    from decimal import ROUND_HALF_UP, Decimal

    v = micro / (float(MICRO) * 2)
    assert got == float(
        Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def test_spark_train_equals_python_twin(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    m = lm_train(docs, n_buckets=256, alpha=0.1)
    texts = [r["text"] for r in docs.select("text").collect()]
    assert m == lm_train_python(texts, n_buckets=256, alpha=0.1)


def test_spark_score_equals_python_twin(spark):
    m = lm_train_python(["the cat sat", "the dog sat", "cat and dog"], n_buckets=64)
    rows = [(1, "the cat"), (2, "dog sat on the cat"), (3, ""), (4, None), (5, "  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", lm_score(F.col("text"), m).alias("s")).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == lm_score_python(text, m), (doc_id, text)
    assert got[3] is None and got[4] is None and got[5] is None


def test_in_domain_scores_above_gibberish(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    m = lm_train(docs, n_buckets=1024)
    probe = spark.createDataFrame(
        [
            (1, "key agg row scan slow fast table value part hash"),  # in-domain
            (2, "zzq qqz xkcd vwxyz frobnicate zorp"),  # out-of-domain
        ],
        "doc_id long, text string",
    )
    s = {
        r["doc_id"]: r["s"]
        for r in probe.select(
            "doc_id", lm_score(F.col("text"), m).alias("s")
        ).collect()
    }
    assert s[1] > s[2]


def test_lm_filter_gate(spark):
    m = lm_train_python(["a b c a b c", "a b a b"], n_buckets=64)
    df = spark.createDataFrame(
        [(1, "a b"), (2, "zz qq xx")], "doc_id long, text string"
    )
    s1 = lm_score_python("a b", m)
    kept = lm_filter(df, m, min_avg_logprob=s1 - 1e-9)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # perplexity bound translates to the same exact gate
    kept2 = lm_filter(df, m, max_perplexity=math.exp(-(s1 - 1e-9)))
    assert [r["doc_id"] for r in kept2.collect()] == [1]
    with pytest.raises(ValueError):
        lm_filter(df, m)
    with pytest.raises(ValueError):
        lm_filter(df, m, min_avg_logprob=0.0, max_perplexity=1.0)


def test_score_plan_is_narrow(spark):
    m = lm_train_python(["a b"], n_buckets=32)
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        df.select(lm_score(F.col("text"), m).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan

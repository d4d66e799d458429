"""DSIR importance weights: Spark training/scoring must be byte-/value-
identical to the pure-Python twins; target-like raw documents must
outrank off-target ones; empty text scores NULL."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from zx_spark.functions.dsir import (
    dsir_log_weight,
    dsir_log_weight_python,
    dsir_train,
    dsir_train_python,
)

TARGET = [
    "the theorem follows from the lemma",
    "we prove the bound by induction",
    "the proof of the theorem is complete",
]
RAW = [
    "buy cheap pills online now",
    "click here to win a prize now",
    "we prove the theorem by induction",   # target-like
    "the lemma gives the bound",           # target-like
    "cheap prize pills click now",
    "",
    None,
]


@pytest.fixture(scope="module")
def model(spark):
    raw = spark.createDataFrame([(t,) for t in RAW], "text string")
    tgt = spark.createDataFrame([(t,) for t in TARGET], "text string")
    return dsir_train(raw, tgt, n_buckets=512, alpha=0.1)


def test_model_matches_python_twin(spark, model):
    twin = dsir_train_python(RAW, TARGET, n_buckets=512, alpha=0.1)
    assert model == twin


def test_scores_match_python_twin(spark, model):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(RAW)], "i int, text string")
    got = {
        r["i"]: r["w"]
        for r in df.select(
            "i", dsir_log_weight(F.col("text"), model).alias("w")
        ).collect()
    }
    for i, t in enumerate(RAW):
        assert got[i] == dsir_log_weight_python(t, model), (i, t)


def test_target_like_docs_outrank(spark, model):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(RAW)], "i int, text string")
    got = {
        r["i"]: r["w"]
        for r in df.select(
            "i", dsir_log_weight(F.col("text"), model).alias("w")
        ).collect()
    }
    target_like = {2, 3}
    off_target = {0, 1, 4}
    assert min(got[i] for i in target_like) > max(got[i] for i in off_target)
    assert got[5] is None and got[6] is None  # empty / NULL text


def test_guards(spark):
    df = None
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_train(df, df, n_buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_train(df, df, alpha=0.0)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(st.text(alphabet="abc x", max_size=20), min_size=1, max_size=8),
    tgt=st.lists(st.text(alphabet="abc x", max_size=20), min_size=1, max_size=8),
)
def test_property_engine_equals_twin(spark, raw, tgt):
    raw_df = spark.createDataFrame([(t,) for t in raw], "text string")
    tgt_df = spark.createDataFrame([(t,) for t in tgt], "text string")
    m = dsir_train(raw_df, tgt_df, n_buckets=64, alpha=0.5)
    assert m == dsir_train_python(raw, tgt, n_buckets=64, alpha=0.5)
    got = [
        r["w"]
        for r in raw_df.select(
            dsir_log_weight(F.col("text"), m).alias("w")
        ).collect()
    ]
    want = [dsir_log_weight_python(t, m) for t in raw]
    assert sorted(got, key=lambda v: (v is None, v)) == sorted(
        want, key=lambda v: (v is None, v)
    )


def test_unicode_whitespace_parity(spark):
    """Engines split on ASCII whitespace only (Java/RE2 \\s); the twins
    must too — a non-breaking space is PART of a token, not a split."""
    texts = ["hello world other", "hello world other"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    m = dsir_train(df, df, n_buckets=64, alpha=0.5)
    assert m == dsir_train_python(texts, texts, n_buckets=64, alpha=0.5)
    got = sorted(
        r["w"] for r in df.select(dsir_log_weight(F.col("text"), m).alias("w")).collect()
    )
    want = sorted(dsir_log_weight_python(t, m) for t in texts)
    assert got == want

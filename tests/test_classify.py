"""NB hashed-unigram classifier (functions/classify.py): exact-count
golden, Spark ≡ Python-twin training, scoring arithmetic, separation on
the driver corpus, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from zx_spark.functions.classify import (
    MICRO,
    _bucket_py,
    nb_predict,
    nb_score,
    nb_train,
    nb_train_python,
)


def test_golden_weights_tiny_corpus():
    # two docs, two buckets worth of tokens — weights checked by hand
    rows = [("cat cat", True), ("dog", False)]
    m = nb_train_python(rows, n_buckets=8, alpha=1.0)
    bc, bd = _bucket_py("cat", 8), _bucket_py("dog", 8)
    # pos: cat×2 of 2 tokens; neg: dog×1 of 1 token; V=8
    w_cat = round((math.log((2 + 1) / (2 + 8)) - math.log((0 + 1) / (1 + 8))) * MICRO)
    w_dog = round((math.log((0 + 1) / (2 + 8)) - math.log((1 + 1) / (1 + 8))) * MICRO)
    assert m["weights_micro"][bc] == w_cat
    assert m["weights_micro"][bd] == w_dog
    assert m["prior_micro"] == round(math.log((1 + 1) / (1 + 1)) * MICRO) == 0


def test_spark_train_equals_python_twin(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    m = nb_train(docs.withColumn("label", F.col("lang") == "en"), "text", "label")
    rows = [(r["text"], r["lang"] == "en") for r in docs.select("text", "lang").collect()]
    assert m == nb_train_python(rows)


def test_score_is_exact_fold(spark):
    rows = [("cat cat", True), ("dog", False)]
    m = nb_train_python(rows, n_buckets=8)
    df = spark.createDataFrame(
        [(1, "cat dog"), (2, ""), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", nb_score(F.col("text"), m).alias("s")).collect()}
    bc, bd = _bucket_py("cat", 8), _bucket_py("dog", 8)
    expect = round(
        (m["weights_micro"][bc] + m["weights_micro"][bd] + m["prior_micro"]) / MICRO, 6
    )
    assert got[1] == expect
    assert got[2] == round(m["prior_micro"] / MICRO, 6)  # empty text → prior
    assert got[3] is None  # NULL text → NULL score (no content ≠ prior belief)


def test_separates_driver_corpus_languages(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    labeled = docs.withColumn("label", F.col("lang") == "en")
    m = nb_train(labeled, "text", "label")
    rows = labeled.select("label", nb_score(F.col("text"), m).alias("s")).collect()
    pos = [r["s"] for r in rows if r["label"]]
    neg = [r["s"] for r in rows if not r["label"]]
    assert pos and neg
    # the classifier must at least order the class means correctly
    assert sum(pos) / len(pos) > sum(neg) / len(neg)
    pred = labeled.select("label", nb_predict(F.col("text"), m).alias("p")).collect()
    acc = sum(1 for r in pred if r["p"] == r["label"]) / len(pred)
    assert acc > 0.5  # better than chance on its own training data


def test_scoring_plan_is_pure_catalyst(spark):
    rows = [("cat cat", True), ("dog", False)]
    m = nb_train_python(rows, n_buckets=8)
    df = spark.createDataFrame([(1, "cat dog")], "doc_id long, text string")
    plan = (
        df.select(nb_score(F.col("text"), m).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_missing_class_is_guarded():
    m = nb_train_python([("cat", True)], n_buckets=8)
    # no negative docs: smoothing keeps weights finite
    assert all(isinstance(w, int) for w in m["weights_micro"])
    assert m["prior_micro"] == round(math.log(2 / 1) * MICRO)

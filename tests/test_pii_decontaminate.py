"""PII scrub and benchmark decontamination: detection/redaction values,
NULL behavior, sequential-claim semantics, and the decontamination
overlap math — plus plan shape (map-side, broadcast probe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zx_spark.functions.pii import PII_TYPES, with_pii_scrubbed
from zx_spark.operators.decontaminate import decontaminate, drop_contaminated


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "mail jo.doe+x@ex-a.co.uk or admin@x.io, ip 10.0.255.7 ssn 123-45-6789"),
        (2, "card 4111-1111-1111-1111 and 4111111111111111 call +14155552671"),
        (3, "no pii just words 1234 12.5"),
        (4, None),
        (5, "us-style 415-555.1234 and 999.999.999.999"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_detection_and_redaction(pii_df):
    got = {r["doc_id"]: r for r in with_pii_scrubbed(pii_df).collect()}
    assert got[1]["pii_redacted"] == "mail <EMAIL> or <EMAIL>, ip <IP> ssn <SSN>"
    assert got[1]["pii_n_email"] == 2
    assert got[1]["pii_n_ipv4"] == 1
    assert got[1]["pii_n_ssn"] == 1
    assert got[1]["pii_n_total"] == 4
    assert got[2]["pii_n_credit_card"] == 2
    assert got[2]["pii_n_phone"] == 1
    assert got[2]["pii_redacted"] == "card <CC> and <CC> call <PHONE>"
    assert got[3]["pii_n_total"] == 0
    assert got[3]["pii_redacted"] == got[3]["text"]


def test_pii_null_text(pii_df):
    r = with_pii_scrubbed(pii_df).filter("doc_id = 4").collect()[0]
    assert r["pii_redacted"] is None
    assert r["pii_n_total"] == 0
    for t in PII_TYPES:
        assert r[f"pii_n_{t}"] == 0


def test_pii_counts_equal_tokens_in_redacted(pii_df):
    # sequential claim: n_<type> is exactly the number of <TYPE> tokens
    # present in the final redacted text (no span claimed twice)
    out = with_pii_scrubbed(pii_df).filter("text IS NOT NULL").collect()
    token = {"email": "<EMAIL>", "ipv4": "<IP>", "ssn": "<SSN>",
             "credit_card": "<CC>", "phone": "<PHONE>"}
    for r in out:
        for t in PII_TYPES:
            assert r[f"pii_n_{t}"] == r["pii_redacted"].count(token[t]), (
                r["doc_id"], t)


def test_pii_is_narrow_plan(pii_df):
    plan = with_pii_scrubbed(pii_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.fixture(scope="module")
def corpus_bench(spark):
    # benchmark doc B shares a 5-gram run with corpus docs 10 (verbatim
    # copy) and 11 (partial); doc 12 is clean.
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),  # full copy
            (11, "xx alpha beta gamma delta epsilon yy zz ww vv uu"),  # one 5-gram
            (12, "completely different words with no shared runs at all"),
        ],
        "doc_id long, text string",
    )
    return corpus, bench


def test_decontaminate_flags_overlap(corpus_bench):
    corpus, bench = corpus_bench
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=5).collect()}
    assert set(got) == {10, 11}
    # doc 10 is a verbatim copy: every one of its shingles is in the benchmark
    assert got[10]["n_overlap"] == got[10]["n_ngrams"]
    assert got[10]["contamination"] == 1.0
    # doc 11 shares exactly the one aligned 5-gram run
    assert got[11]["n_overlap"] == 1
    assert 0 < got[11]["contamination"] < 1


def test_decontaminate_min_overlap_threshold(corpus_bench):
    corpus, bench = corpus_bench
    got = decontaminate(corpus, bench, n=5, min_overlap=2).collect()
    assert {r["doc_id"] for r in got} == {10}


def test_drop_contaminated(corpus_bench):
    corpus, bench = corpus_bench
    kept = drop_contaminated(corpus, bench, n=5)
    assert [r["doc_id"] for r in kept.collect()] == [12]


def test_decontaminate_broadcast_probe(corpus_bench):
    corpus, bench = corpus_bench
    plan = (
        decontaminate(corpus, bench, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles to probe
    assert "SortMergeJoin" not in plan


def test_decontaminate_validates_args(corpus_bench):
    corpus, bench = corpus_bench
    with pytest.raises(ValueError):
        decontaminate(corpus, bench, n=0)
    with pytest.raises(ValueError):
        decontaminate(corpus, bench, min_overlap=0)


def test_repetition_signals(spark):
    from zx_spark.functions.text import repetition_signals

    rows = [
        (1, "menu\nmenu\nmenu\nabout us"),        # 2 distinct / 4 lines
        (2, "spam spam spam spam"),                # 1 distinct / 4 tokens
        (3, "all words here are different"),       # no repetition
        (4, ""),                                   # empty: both 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = repetition_signals(F.col("text"))
    got = {
        x["doc_id"]: x
        for x in df.select(
            "doc_id",
            r["dup_line_fraction"].alias("dl"),
            r["dup_token_fraction"].alias("dt"),
        ).collect()
    }
    assert got[1]["dl"] == 0.5
    assert got[2]["dt"] == 0.75
    assert got[3]["dl"] == 0.0 and got[3]["dt"] == 0.0
    assert got[4]["dl"] == 0.0 and got[4]["dt"] == 0.0


def test_dup_components_chain_and_clique(spark):
    from zx_spark.operators.dedup import dup_components

    # chain 1-2-3 (1 and 3 never paired), separate pair 10-11, isolated
    # pairs 20-21 / 21-22 / 20-22 (clique)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["component"] for r in dup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dup_components_long_chain_converges(spark):
    from zx_spark.operators.dedup import dup_components

    # a 12-node path graph needs several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["component"] for r in dup_components(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_drop_by_components_vs_greedy(spark):
    from zx_spark.operators.dedup import drop_by_components

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 9)], "doc_id long, text string"
    )
    # 1-3 and 2-3 paired; greedy per-pair drop keeps {1, 2}; components
    # collapse {1,2,3} to the min id 1. Doc 9 untouched.
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"] for r in drop_by_components(docs, pairs, "doc_id").collect()
    )
    assert kept == [1, 9]


def test_top_ngram_fraction(spark):
    from zx_spark.functions.text import top_ngram_fraction

    rows = [
        (1, "a b a b a b"),     # 2-grams: ab ba ab ba ab -> top 3/5
        (2, "x y z w"),         # all distinct -> 1/3
        (3, "solo"),            # < n tokens: whole text is one shingle -> 1/1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["top_2gram_fraction"] for r in top_ngram_fraction(df).collect()}
    assert got[1] == 0.6
    assert abs(got[2] - 1 / 3) < 1e-6
    assert got[3] == 1.0


def test_dup_components_warns_when_not_converged(spark):
    import pytest as _pytest

    from zx_spark.operators.dedup import dup_components

    # a 10-node chain needs more than 2 min-label rounds to collapse
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    with _pytest.warns(RuntimeWarning, match="max_iter=2"):
        dup_components(pairs, max_iter=2).collect()
    # converged runs stay silent
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = {r["doc_id"]: r["component"] for r in dup_components(pairs).collect()}
    assert set(got.values()) == {0}


# ---------------------------------------------------------------- boilerplate


@pytest.fixture(scope="module")
def boiler_corpus(spark):
    footer = "all rights reserved by the example site network"
    rows = [
        (1, "alpha beta gamma delta epsilon " + footer),
        (2, "zeta eta theta iota kappa " + footer),
        (3, "lambda mu nu xi omicron " + footer),
        (4, "unique words only appear here once nothing shared"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_shingles_are_the_shared_footer(spark, boiler_corpus):
    from zx_spark.operators.decontaminate import boilerplate_shingles

    got = boilerplate_shingles(boiler_corpus, n=5, min_docs=3).collect()
    # the 8-word footer has 4 distinct 5-gram windows fully inside it;
    # every one appears in docs 1-3 and nowhere else
    assert len(got) == 4
    assert all(r["n_docs"] == 3 for r in got)


def test_boilerplate_fractions_flag_footer_docs_only(spark, boiler_corpus):
    from zx_spark.operators.decontaminate import boilerplate_fractions

    got = {r["doc_id"]: r for r in boilerplate_fractions(
        boiler_corpus, n=5, min_docs=3).collect()}
    assert set(got) == {1, 2, 3}
    for r in got.values():
        # 13 tokens -> 9 distinct 5-grams; 4 of them are footer windows
        assert r["n_ngrams"] == 9
        assert r["n_overlap"] == 4
        assert abs(r["ratio"] - 4 / 9) < 1e-6


def test_drop_boilerplate_docs_threshold(spark, boiler_corpus):
    from zx_spark.operators.decontaminate import drop_boilerplate_docs

    kept = {r["doc_id"] for r in drop_boilerplate_docs(
        boiler_corpus, n=5, min_docs=3, max_ratio=0.4).collect()}
    assert kept == {4}  # footer docs are 4/9 > 0.4 boilerplate
    kept_all = {r["doc_id"] for r in drop_boilerplate_docs(
        boiler_corpus, n=5, min_docs=3, max_ratio=0.5).collect()}
    assert kept_all == {1, 2, 3, 4}


def test_boilerplate_validates_min_docs(spark, boiler_corpus):
    from zx_spark.operators.decontaminate import boilerplate_shingles

    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_shingles(boiler_corpus, min_docs=1)


# ------------------------------------------- semantic contamination


def test_semantic_contamination_planted_and_methods_agree(spark):
    import numpy as np
    import pytest
    from zx_spark.operators.decontaminate import semantic_contamination
    from zx_spark.storage import read_table

    vecs = read_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    )
    # benchmark = scaled copies of three corpus vectors (cosine is scale
    # invariant -> max_cosine 1.0) plus one orthogonal-ish decoy
    base = {r["vec_id"]: list(r["embedding"]) for r in vecs.filter(
        "vec_id in (3, 77, 411)").collect()}
    bench_rows = [(9000 + i, [x * 2.5 for x in base[k]]) for i, k in enumerate(sorted(base))]
    decoy = [0.0] * 64
    decoy[63] = 1.0
    bench_rows.append((9999, decoy))
    bench = spark.createDataFrame(bench_rows, "vec_id: long, embedding: array<double>")

    got = {
        r["vec_id"]: (r["nearest_bench_id"], r["max_cosine"])
        for r in semantic_contamination(vecs, bench, threshold=0.999).collect()
    }
    assert set(base) <= set(got)
    for i, k in enumerate(sorted(base)):
        assert got[k][0] == 9000 + i and got[k][1] >= 0.999
    # numpy and jvm paths agree exactly (rounding included)
    nv = semantic_contamination(vecs, bench, threshold=0.5, method="numpy")
    jv = semantic_contamination(vecs, bench, threshold=0.5, method="jvm")
    a = {(r["vec_id"], r["nearest_bench_id"], r["max_cosine"]) for r in nv.collect()}
    b = {(r["vec_id"], r["nearest_bench_id"], r["max_cosine"]) for r in jv.collect()}
    assert a == b and len(a) > 0
    # jvm path stays JVM-side
    plan = jv._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan
    with pytest.raises(ValueError):
        semantic_contamination(vecs, bench, threshold=1.5)
    with pytest.raises(ValueError):
        semantic_contamination(vecs, bench.limit(0))


def test_semantic_contamination_string_bench_ids_jvm(spark):
    """Eval-set ids are commonly strings — the jvm literal path must
    accept them (and reject mixed-type id columns loudly)."""
    import pytest
    from zx_spark.operators.decontaminate import semantic_contamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id: long, embedding: array<double>"
    )
    bench = spark.createDataFrame(
        [("mmlu_00421", [2.0, 0.0])], "bid: string, embedding: array<double>"
    )
    for method in ("jvm", "numpy"):
        got = semantic_contamination(
            corpus, bench, threshold=0.99, bench_id_col="bid", method=method
        ).collect()
        assert [(r["vec_id"], r["nearest_bench_id"]) for r in got] == [(1, "mmlu_00421")], method
    # ADVICE r5: mixed int/str benchmark ids must be rejected on BOTH
    # paths (previously only jvm checked) — np.asarray would silently
    # stringify the numpy path's ids and then clash with the declared
    # bench_id_field dtype in the Arrow output schema. Spark columns are
    # homogeneously typed, so present the mixed collect through a patch
    # of the collect boundary and assert the hoisted guard fires.
    import unittest.mock as mock

    concrete = type(bench.select("bid"))  # pyspark 4 concrete DataFrame class
    for method in ("jvm", "numpy"):
        with mock.patch.object(
            concrete,
            "collect",
            lambda self: [("mmlu_1", [2.0, 0.0]), (7, [0.0, 2.0])],
        ):
            with pytest.raises(ValueError, match="mix types"):
                semantic_contamination(
                    corpus, bench, threshold=0.5, bench_id_col="bid", method=method
                )


def test_boilerplate_complement_equals_join_path(spark):
    """r7: for min_docs=2 the complement plan (n_overlap = n_ngrams −
    corpus-unique count, attributed via min(id)) must equal the probe
    join row for row — on the driver documents AND with a shared
    pre-hashed frame."""
    from zx_spark.operators.decontaminate import (
        boilerplate_fractions,
        shingle_hash_frame,
    )
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    hf = shingle_hash_frame(docs, "text", "doc_id", n=5)
    comp = {
        r["doc_id"]: (r["n_overlap"], r["n_ngrams"], r["ratio"])
        for r in boilerplate_fractions(docs, min_docs=2, hashed=hf).collect()
    }
    # replicate the join path by forcing min_docs=3 semantics off: call
    # the join branch directly through min_docs=3 on a doubled corpus is
    # NOT equivalent — instead rebuild the join plan inline
    from pyspark.sql import functions as FF

    doc_grams = hf.select("doc_id", "n_ngrams", FF.explode_outer("__hs").alias("__h"))
    boiler = (
        doc_grams.groupBy("__h")
        .agg(FF.count(FF.lit(1)).alias("n_docs"))
        .filter(FF.col("n_docs") >= 2)
        .select("__h")
    )
    join_path = (
        doc_grams.join(boiler, "__h")
        .groupBy("doc_id")
        .agg(
            FF.count(FF.lit(1)).alias("n_overlap"),
            FF.first("n_ngrams").alias("n_ngrams"),
        )
    )
    exp = {
        r["doc_id"]: (
            r["n_overlap"],
            r["n_ngrams"],
            round(r["n_overlap"] / r["n_ngrams"], 6),
        )
        for r in join_path.collect()
    }
    assert comp == exp and len(comp) > 0


def test_boilerplate_min_docs_3_uses_join_path(spark, boiler_corpus):
    """min_docs > 2 falls back to the probe join; a shingle in exactly 2
    docs must NOT count at min_docs=3."""
    from zx_spark.operators.decontaminate import boilerplate_fractions

    two = boilerplate_fractions(boiler_corpus, min_docs=2).count()
    three = boilerplate_fractions(boiler_corpus, min_docs=3).count()
    assert three <= two


def _py_shingle_hashes(text, n=5):
    import hashlib

    from zx_spark.functions.hashing import toks_py

    toks = toks_py(text)
    if not toks:
        shingles = [""]
    elif len(toks) < n:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return {
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles
    }


def test_source_overlap_matrix_hand_corpus(spark):
    from zx_spark.operators.decontaminate import source_overlap_matrix

    run = "alpha beta gamma delta epsilon zeta"  # 6 tokens → 2 5-shingles
    rows = [
        (1, "a", f"{run} unique-a one two three four"),
        (2, "b", f"{run} other words here now then"),
        (3, "c", "totally different content with no overlap at all here"),
        (4, "b", "more b-only text that matches nothing else anywhere"),
        (5, None, run),  # NULL source excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["source_a"], r["source_b"]): (r["n_shared"], r["n_a"], r["n_b"])
        for r in source_overlap_matrix(df).collect()
    }
    # python twin
    vocab = {}
    for _, src, text in ((r[0], r[1], r[2]) for r in rows):
        if src is None:
            continue
        vocab.setdefault(src, set()).update(_py_shingle_hashes(text))
    exp = {}
    srcs = sorted(vocab)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            shared = len(vocab[sa] & vocab[sb])
            if shared:
                exp[(sa, sb)] = (shared, len(vocab[sa]), len(vocab[sb]))
    assert got == exp and ("a", "b") in got and ("a", "c") not in got


def test_source_overlap_matrix_driver_docs(spark):
    """Value parity on the real driver documents table vs the pure-Python
    twin (same tokenizer, same md5-60-bit hashes)."""
    from collections import defaultdict

    from zx_spark.operators.decontaminate import source_overlap_matrix
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_shared"], r["n_a"], r["n_b"], r["jaccard"],
        )
        for r in source_overlap_matrix(docs).collect()
    }
    vocab = defaultdict(set)
    for r in docs.select("source", "text").collect():
        if r["source"] is not None:
            vocab[r["source"]].update(_py_shingle_hashes(r["text"]))
    srcs = sorted(vocab)
    exp = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            sh = len(vocab[sa] & vocab[sb])
            if sh:
                na, nb = len(vocab[sa]), len(vocab[sb])
                exp[(sa, sb)] = (sh, na, nb, round(sh / (na + nb - sh), 6))
    assert got == exp and len(got) > 0


def test_source_overlap_plan_no_cartesian(spark):
    from zx_spark.operators.decontaminate import source_overlap_matrix
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    df = source_overlap_matrix(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_boilerplate_fractions_null_id_fails_fast(spark):
    """r7 review: under the min_docs=2 complement plan a NULL-id doc
    cannot be reached by the min(id) attribution and used to come out
    as ~100% boilerplate. Non-NULL ids are now enforced in-plan."""
    import pytest
    from zx_spark.operators.decontaminate import boilerplate_fractions

    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (None, "eta theta iota kappa lambda mu")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # Usually a SparkRuntimeException [USER_RAISED_EXCEPTION]; when two
    # AQE stages of the complement plan both hit the raise before the
    # abort lands, Spark 4.1 wraps them in a SparkException
    # [STAGE_MATERIALIZATION_MULTIPLE_FAILURES] (surfaced as a raw
    # Py4JJavaError) — a scheduling race. The pinned contract is the
    # fail-fast MESSAGE, not the wrapper type.
    with pytest.raises(Exception, match="NULL doc_id"):
        boilerplate_fractions(df, n=5, min_docs=2).collect()

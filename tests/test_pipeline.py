"""curate_corpus: end-to-end composition over the driver documents table
— every stage observable, deterministic across runs, no cartesian
products in the composed plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.pipeline import curate_corpus
from zx_spark.storage import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


def test_full_pipeline_stages_compose(spark, docs):
    n0 = docs.count()
    out = curate_corpus(
        docs,
        quality_min=0.2,
        languages=["en", "und"],
        near_dup_threshold=0.8,
        sample_rate=0.9,
        split_weights=[0.8, 0.2],
        seed=1,
    )
    rows = out.collect()
    assert 0 < len(rows) < n0
    assert set(out.columns) >= {"doc_id", "text", "lang", "split"}
    assert {r.split for r in rows} <= {0, 1}
    assert all(r.lang in ("en", "und") for r in rows)
    # exact duplicates removed: texts unique
    texts = [r.text for r in rows]
    assert len(texts) == len(set(texts))


def test_pipeline_deterministic(spark, docs):
    kw = dict(quality_min=0.2, near_dup_threshold=0.8, sample_rate=0.5, seed=9)
    a = {r.doc_id for r in curate_corpus(docs, **kw).collect()}
    b = {r.doc_id for r in curate_corpus(docs, **kw).collect()}
    assert a == b and a


def test_pipeline_component_mode(spark):
    # chain a~b, b~c (c differs from a beyond threshold in principle but
    # identical here): components keep only the min id of the cluster
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " x"), (3, base + " x y"), (9, "totally other words here now")],
        "doc_id long, text string",
    )
    kept = curate_corpus(docs, near_dup_threshold=0.7, near_dup_mode="components")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 9]
    with pytest.raises(ValueError):
        curate_corpus(docs, near_dup_threshold=0.7, near_dup_mode="nope")


def test_pipeline_pii_and_decontamination_stages(spark, docs):
    # plant an email on a known doc; use another doc's 30-word excerpt as
    # the "benchmark" so decontamination must drop that doc.
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 1, F.concat(F.col("text"), F.lit(" mail me a@b.co"))
        ).otherwise(F.col("text")),
    )
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit(""))
    bench = planted.filter(F.col("doc_id") == 2).select(
        F.array_join(F.slice(toks, 1, 30), " ").alias("text")
    )
    out = curate_corpus(planted, scrub_pii=True, benchmark=bench)
    rows = {r.doc_id: r for r in out.collect()}
    assert "pii_n_total" in out.columns
    assert 2 not in rows  # contaminated by its own excerpt
    assert rows[1]["text"].endswith("mail me <EMAIL>")
    assert rows[1]["pii_n_total"] == 1
    # dedup ran over the SCRUBBED text (column replaced before hashing)
    assert "pii_redacted" not in out.columns


def test_near_dup_stage_drops_planted_duplicate(spark, docs):
    # plant a near-duplicate of doc 0 (append one token) with a high id
    src = docs.select("doc_id", "text")
    first = src.filter("doc_id = 0").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    out = curate_corpus(src.unionByName(first), near_dup_threshold=0.5)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 0 in ids and 1_000_000 not in ids  # greedy keeps the lower id


def test_pipeline_plan_no_cartesian(spark, docs):
    plan = curate_corpus(
        docs, quality_min=0.2, near_dup_threshold=0.8, split_weights=[0.9, 0.1]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_pipeline_mixing_stage(spark, docs):
    out = curate_corpus(
        docs, mix_proportions={"src0": 0.6, "src1": 0.4}, mix_group_col="source"
    )
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert set(got) == {"src0", "src1"}  # unlisted sources dropped
    total = sum(got.values())
    assert abs(got["src0"] / total - 0.6) < 0.15  # small groups, coarse hash


def test_token_budget(spark, docs):
    from zx_spark.functions.text import token_budget

    per_source = {r["source"]: r for r in token_budget(docs, group_col="source").collect()}
    assert all(r["n_tokens"] > r["n_docs"] for r in per_source.values())
    whole = token_budget(docs).collect()[0]
    assert whole["n_docs"] == docs.count()
    assert whole["n_tokens"] == sum(r["n_tokens"] for r in per_source.values())


def test_pipeline_mixing_in_tokens(spark):
    from zx_spark.functions.text import token_budget

    # sources whose doc- and token-proportions disagree hard: A has few
    # long docs, B many short ones (texts unique per doc — curate_corpus
    # always exact-dedups first)
    rows = [(i, "A", f"u{i} " + "tok " * 100) for i in range(60)] + [
        (i, "B", f"u{i} " + "tok " * 10) for i in range(60, 660)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, source string, text string")
    props = {"A": 0.5, "B": 0.5}
    by_tok = curate_corpus(
        corpus, mix_proportions=props, mix_in_tokens=True, seed=2
    )
    got = {
        r["source"]: r["n_tokens"]
        for r in token_budget(by_tok, group_col="source").collect()
    }
    share = got["A"] / (got["A"] + got["B"])
    assert 0.38 < share < 0.62, share  # token share ~ 50/50
    # doc-count mixing on the same corpus lands far from token parity:
    # equal DOC counts means A holds ~10x B's tokens
    by_doc = curate_corpus(corpus, mix_proportions=props, seed=2)
    got_doc = {
        r["source"]: r["n_tokens"]
        for r in token_budget(by_doc, group_col="source").collect()
    }
    share_doc = got_doc["A"] / (got_doc["A"] + got_doc["B"])
    assert share_doc > 0.75, share_doc
    # the helper weight column never leaks into the output
    assert "__mix_n_tokens" not in by_tok.columns


def test_pipeline_classifier_gate(spark, docs):
    from zx_spark.functions.classify import nb_train

    labeled = docs.withColumn("label", F.col("lang") == "en")
    model = nb_train(labeled, "text", "label")
    out = curate_corpus(docs, classifier_model=model, classifier_min_logodds=-0.5)
    n, n0 = out.count(), docs.count()
    assert 0 < n < n0  # the gate actually cuts, but not everything


def test_pipeline_boilerplate_stage(spark):
    footer = "all rights reserved by the example site network"
    rows = [(i, "web", f"doc {i} unique words number {i * 7} " + footer) for i in range(6)]
    rows.append((99, "web", "completely original text with no shared template at all"))
    corpus = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curate_corpus(
        corpus, boilerplate_max_ratio=0.2, boilerplate_min_docs=3
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 99 in kept  # the original doc survives
    assert all(i not in kept for i in range(6))  # templated docs dropped


def test_pipeline_semantic_dedup_stage(spark):
    # two docs with near-identical embeddings + one distinct: SemDeDup
    # keeps one of the near pair; a doc without an embedding row passes.
    base = [0.1 * (i % 7) + 0.05 for i in range(16)]
    near = [v + 0.001 for v in base]
    far = [1.0 if i == 3 else 0.01 for i in range(16)]
    corpus = spark.createDataFrame(
        [(1, "first text"), (2, "second text"), (3, "third text"), (4, "no embedding")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, embedding array<double>"
    )
    out = curate_corpus(
        corpus, embeddings=emb, semantic_threshold=0.99, semantic_n_cells=2
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 4 in kept and 3 in kept
    assert len(kept & {1, 2}) == 1  # exactly one of the near pair survives


def test_pipeline_lm_gate_stage(spark, docs):
    from zx_spark.functions.lm import lm_score_python, lm_train_python

    # train on the corpus, gate just below doc 1's own score: doc 1 must
    # survive, a planted gibberish doc must not
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    m = lm_train_python([t for _, t in rows], n_buckets=512)
    gib = "zzq qqz xkcd frobnicate zorp vwxyz"
    planted = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame([(999999, gib)], "doc_id long, text string")
    )
    # gate just above the gibberish doc's own score: the kept set must be
    # EXACTLY the docs the python twin scores at/above the gate
    gate = lm_score_python(gib, m) + 1e-6
    out = curate_corpus(planted, lm_model=m, lm_min_avg_logprob=gate)
    ids = {r.doc_id for r in out.collect()}
    expected = {
        i for i, t in rows + [(999999, gib)] if lm_score_python(t, m) >= gate
    }
    assert ids == expected
    assert 999999 not in ids and ids
    with pytest.raises(ValueError):
        curate_corpus(docs, lm_model=m)  # threshold required


def test_pipeline_dsir_gate_stage(spark, docs):
    from zx_spark.functions.dsir import dsir_log_weight_python, dsir_train_python

    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    texts = [t for _, t in rows]
    # target = first half of the corpus; gate at the twin-scored median
    # so the kept set is EXACTLY the python twin's at-or-above slice
    m = dsir_train_python(texts, texts[: len(texts) // 2], n_buckets=512)
    scores = sorted(dsir_log_weight_python(t, m) for t in texts)
    gate = scores[len(scores) // 2]
    out = curate_corpus(docs, dsir_model=m, dsir_min_logw=gate)
    ids = {r.doc_id for r in out.collect()}
    expected = {i for i, t in rows if dsir_log_weight_python(t, m) >= gate}
    assert ids == expected and ids and len(ids) < len(rows)
    with pytest.raises(ValueError):
        curate_corpus(docs, dsir_model=m)  # threshold required


def test_pipeline_line_scrub_stage(spark):
    footer = "all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, "alpha body\n" + footer),
            (2, "beta body\n" + footer),
            (3, "gamma body"),
        ],
        "doc_id long, text string",
    )
    out = curate_corpus(docs, scrub_lines=True)
    texts = {r.doc_id: r.text for r in out.collect()}
    assert texts == {1: "alpha body", 2: "beta body", 3: "gamma body"}
    assert "scrubbed" not in out.columns and "n_lines_dropped" not in out.columns


def test_pipeline_scrub_feeds_dedup(spark):
    # after scrubbing the shared footer, docs 1/2 become EXACT duplicates
    # and exact dedup keeps only the lower id — proving the rewrite
    # happens before the hashing stages
    footer = "(c) same footer everywhere"
    docs = spark.createDataFrame(
        [
            (1, "same body\n" + footer + " one"),
            (2, "same body\n" + footer + " two"),
            (3, footer + " one\nother body\n" + footer + " two"),
        ],
        "doc_id long, text string",
    )
    out = curate_corpus(docs, scrub_lines=True)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3]


def test_pipeline_semantic_from_text(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " dog"),  # near-identical -> same hashed direction
            (3, "completely different legal boilerplate text follows here now"),
        ],
        "doc_id long, text string",
    )
    out = curate_corpus(
        docs, semantic_from_text=True, semantic_threshold=0.9, semantic_n_cells=2
    )
    ids = sorted(r.doc_id for r in out.collect())
    assert 3 in ids and len(ids) == 2  # one of the near-pair dropped
    with pytest.raises(ValueError, match="not both"):
        curate_corpus(
            docs,
            semantic_from_text=True,
            embeddings=docs.selectExpr("doc_id", "array(1.0) AS embedding"),
        )


def test_pipeline_normalize_history_and_semantic_decon_stages(spark, docs):
    from zx_spark.operators.dedup import signature_table
    from zx_spark.functions.text import with_hashed_embedding

    # normalization: casing/whitespace variants of the same doc dedup
    # together only when the stage is on
    base = docs.limit(0)
    rows = [
        (1, "The Quick   Brown Fox jumps over the dog", "s"),
        (2, "the quick brown fox JUMPS over the dog", "s"),
        (3, "entirely different content for the corpus here", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    off = curate_corpus(df)
    on = curate_corpus(df, normalize=True)
    assert off.count() == 3  # exact dedup misses the variants
    assert on.count() == 2 and {r["doc_id"] for r in on.collect()} == {1, 3}
    # normalized text is what survives
    assert "quick brown fox" in on.filter("doc_id = 1").collect()[0]["text"]

    # history dedup: a stored signature table knocks out re-ingested docs
    hist_rows = [(100, "The Quick   Brown Fox jumps over the dog", "s")]
    hist = spark.createDataFrame(hist_rows, "doc_id: long, text: string, source: string")
    hist_sigs = signature_table(
        curate_corpus(hist, normalize=True).select("doc_id", "text"), "text", "doc_id"
    )
    kept = curate_corpus(
        df, normalize=True, history_signatures=hist_sigs, history_threshold=0.9
    )
    assert {r["doc_id"] for r in kept.collect()} == {3}

    # semantic benchmark decontamination via hashed embeddings: a
    # benchmark row embedding-identical to doc 3 removes it
    bench_emb = with_hashed_embedding(
        spark.createDataFrame(
            [(900, "entirely different content for the corpus here")],
            "doc_id: long, text: string",
        ),
        "text",
    ).select("doc_id", "hashed_emb")
    out = curate_corpus(
        df,
        normalize=True,
        semantic_from_text=True,
        semantic_threshold=1.01,  # disable SemDeDup pair drops
        embedding_vec_col="hashed_emb",
        benchmark_embeddings=bench_emb,
        semantic_contamination_threshold=0.999,
    )
    assert {r["doc_id"] for r in out.collect()} == {1}
    with pytest.raises(ValueError):
        curate_corpus(df, benchmark_embeddings=bench_emb)  # no corpus embeddings


def test_curation_audit_per_source(spark):
    from zx_spark.pipeline import curation_audit

    before = spark.createDataFrame(
        [(i, "src_a" if i < 6 else "src_b", "alpha beta gamma"[: 5 + i]) for i in range(10)],
        "doc_id: long, source: string, text: string",
    )
    # keep only even src_a docs; drop src_b entirely
    after = before.filter("source = 'src_a' AND doc_id % 2 = 0")
    rep = {r["source"]: r for r in curation_audit(before, after).collect()}
    assert rep["src_a"]["docs_before"] == 6 and rep["src_a"]["docs_after"] == 3
    assert rep["src_a"]["doc_keep_rate"] == 0.5
    assert rep["src_b"]["docs_after"] == 0 and rep["src_b"]["token_keep_rate"] == 0.0
    assert rep["src_a"]["tokens_after"] <= rep["src_a"]["tokens_before"]


def test_curation_audit_custom_text_col(spark):
    from zx_spark.pipeline import curation_audit

    df = spark.createDataFrame(
        [(1, "s", "alpha beta"), (2, "s", "gamma")],
        "doc_id: long, source: string, body: string",
    )
    rep = curation_audit(df, df.limit(1), text_col="body").collect()[0]
    assert rep["docs_before"] == 2 and rep["docs_after"] == 1
    assert rep["tokens_before"] == 3

"""Incremental near-dup: a new batch against a stored signature table.
Pinned by equivalence with the full-corpus run (same signatures → same
bands → identical candidate structure) and by planted cross-batch
duplicates; the historical text is never touched."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.dedup import (
    incremental_near_dups,
    jaccard_pairs,
    minhash_candidate_pairs,
    signature_est_jaccard,
    signature_table,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    from zx_spark.storage import read_table

    return read_table(spark, SF, "documents").select("doc_id", "text")


def test_incremental_equals_full_run_on_split_corpus(spark, docs):
    """Split the corpus into history (< 250) and batch (>= 250): the
    incremental result must equal the full-corpus LSH candidates that
    touch the batch, at the same estimator threshold."""
    old = signature_table(docs.filter("doc_id < 250"), "text", "doc_id")
    new = signature_table(docs.filter("doc_id >= 250"), "text", "doc_id")
    got = {
        (r["new_id"], r["matched_id"], r["is_historical"])
        for r in incremental_near_dups(new, old, threshold=0.5).collect()
    }
    full = signature_table(docs, "text", "doc_id")
    sigs = {r["doc_id"]: r["minhash"] for r in full.collect()}
    cands = minhash_candidate_pairs(docs, "text", "doc_id")

    def est(a, b):
        sa, sb = sigs[a], sigs[b]
        return sum(1 for x, y in zip(sa, sb) if x == y) / len(sa)

    want = set()
    for r in cands.collect():
        a, b = r["id_a"], r["id_b"]
        if est(a, b) < 0.5:
            continue
        if a >= 250 and b >= 250:
            want.add((min(a, b), max(a, b), False))
        elif a >= 250 or b >= 250:
            new_id, matched = (a, b) if a >= 250 else (b, a)
            want.add((new_id, matched, True))
    assert got == want and len(got) > 0


def test_planted_cross_batch_duplicate(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    old = spark.createDataFrame(
        [(1, base), (2, "completely different historical content here " * 4)],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [
            (10, base + " tiny tail edit"),           # near-dup of 1
            (11, "fresh unrelated new material " * 5),
            (12, "fresh unrelated new material " * 5),  # exact dup of 11
        ],
        "doc_id: long, text: string",
    )
    so = signature_table(old, "text", "doc_id")
    sn = signature_table(new, "text", "doc_id")
    rows = {
        (r["new_id"], r["matched_id"]): (r["is_historical"], r["est_jaccard"])
        for r in incremental_near_dups(sn, so, threshold=0.5).collect()
    }
    assert (10, 1) in rows and rows[(10, 1)][0] is True
    assert (11, 12) in rows and rows[(11, 12)][0] is False
    assert rows[(11, 12)][1] == 1.0  # exact dup → all minhashes agree
    # new-vs-new suppressed on demand (history matches remain)
    only_old = {
        (r["new_id"], r["matched_id"])
        for r in incremental_near_dups(
            sn, so, threshold=0.5, include_new_pairs=False
        ).collect()
    }
    assert (10, 1) in only_old and (11, 12) not in only_old
    with pytest.raises(ValueError):
        incremental_near_dups(sn, so, bands=7)
    with pytest.raises(ValueError):
        incremental_near_dups(sn, so, threshold=1.5)


def test_signature_width_mismatch_raises_in_pipeline(spark, docs):
    """A store signed with different num_hashes must fail LOUDLY when
    the job runs (in-pipeline assert — the former eager first() probes
    cost two full signing jobs under the agg engine)."""
    from zx_spark.operators.dedup import incremental_near_dups, signature_table

    sn = signature_table(docs, "text", "doc_id", num_hashes=32)
    so = signature_table(docs, "text", "doc_id", num_hashes=16)
    with pytest.raises(Exception, match="num_hashes"):
        incremental_near_dups(sn, so, num_hashes=32).collect()


def test_estimator_tracks_exact_jaccard(spark, docs):
    """On real near-dup candidates the signature estimator must sit
    close to the exact shingle Jaccard (32 hashes → stderr ~0.09)."""
    sub = docs
    cands = minhash_candidate_pairs(sub, "text", "doc_id")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(sub, cands, "text", "doc_id").collect()
    }
    sigs = signature_table(sub, "text", "doc_id")
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("minhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("minhash").alias("sb"))
    est = {
        (r["id_a"], r["id_b"]): r["est"]
        for r in cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            signature_est_jaccard(F.col("sa"), F.col("sb")).alias("est"),
        )
        .collect()
    }
    assert len(exact) > 5
    for k, j in exact.items():
        assert abs(est[k] - j) < 0.35, (k, est[k], j)


def test_historical_side_plan_is_narrow(spark, docs):
    """The incremental join must not re-tokenize or re-shingle anything:
    both inputs are signature tables, so the executed plan contains no
    regexp tokenizer (that happened when the store was WRITTEN)."""
    old = signature_table(docs.filter("doc_id < 250"), "text", "doc_id")
    new = signature_table(docs.filter("doc_id >= 250"), "text", "doc_id")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        old.write.parquet(f"{d}/old")
        new.write.parquet(f"{d}/new")
        so = spark.read.parquet(f"{d}/old")
        sn = spark.read.parquet(f"{d}/new")
        plan = (
            incremental_near_dups(sn, so)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert "split" not in plan and "sentences" not in plan
    assert "BatchEvalPython" not in plan

"""BPE tokenizer (functions/bpe.py): golden merges on a hand-checked
corpus, determinism, encode/apply parity, distributed-vs-local training
equivalence, vocabulary cap, Arrow-batched application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zx_spark.functions.bpe import (
    END_OF_WORD,
    bpe_token_count,
    bpe_tokens,
    bpe_train,
    encode_word,
    train_merges_from_counts,
    word_counts,
)


def test_golden_merges_sennrich_style():
    # The classic worked example shape: 'low'×5 'lowest'×2 'newer'×6
    # 'wider'×3. Hand-derived first merges with (count desc, pair asc)
    # tie-breaks:
    counts = [("low", 5), ("lowest", 2), ("newer", 6), ("wider", 3)]
    merges = train_merges_from_counts(counts, num_merges=4, min_frequency=2)
    # pair counts round 1: (e,r)=9 is the unique max (newer 6 + wider 3)
    assert merges[0] == ("e", "r")
    # round 2: (er,</w>)=9 now the max
    assert merges[1] == ("er", END_OF_WORD)
    # round 3: l,o=7 (low 5 + lowest 2)
    assert merges[2] == ("l", "o")
    # round 4: lo,w=7
    assert merges[3] == ("lo", "w")


def test_encode_word_follows_merge_ranks():
    counts = [("low", 5), ("lowest", 2), ("newer", 6), ("wider", 3)]
    merges = train_merges_from_counts(counts, num_merges=10, min_frequency=2)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert encode_word("low", ranks) == ["low" + END_OF_WORD]  # fully merged
    # an unseen word decomposes to known subwords/chars, never fails
    toks = encode_word("lower", ranks)
    assert "".join(toks) == "lower" + END_OF_WORD


def test_min_frequency_stops_training():
    counts = [("ab", 1), ("cd", 1)]
    assert train_merges_from_counts(counts, 10, min_frequency=2) == []


def test_distributed_train_matches_local(spark):
    rows = [(1, "low low low low low lowest lowest"),
            (2, "newer newer newer newer newer newer wider wider wider")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, num_merges=4)
    local = train_merges_from_counts(
        [("low", 5), ("lowest", 2), ("newer", 6), ("wider", 3)], 4
    )
    assert merges == local


def test_word_counts_cap_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c")], "doc_id long, text string"
    )
    got = [(r["word"], r["count"]) for r in word_counts(df, max_vocab=2).collect()]
    assert got == [("b", 3), ("a", 2)]  # count desc, word asc


def test_bpe_tokens_column_and_count(spark):
    rows = [(1, "low lowest newer"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_merges_from_counts(
        [("low", 5), ("lowest", 2), ("newer", 6), ("wider", 3)], 8
    )
    out = df.select(
        "doc_id",
        bpe_tokens(F.col("text"), merges).alias("toks"),
        bpe_token_count(F.col("text"), merges).alias("n"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # reconstruction: concatenated tokens spell the lowered words + markers
    assert "".join(by_id[1]["toks"]).replace(END_OF_WORD, " ").strip() == "low lowest newer"
    assert by_id[1]["n"] == len(by_id[1]["toks"])
    assert by_id[2]["toks"] == [] and by_id[2]["n"] == 0
    assert by_id[3]["toks"] == [] and by_id[3]["n"] == 0


def test_train_determinism_on_driver_corpus(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    m1 = bpe_train(docs, num_merges=50, max_vocab=5000)
    m2 = bpe_train(docs, num_merges=50, max_vocab=5000)
    assert m1 == m2 and len(m1) == 50


def test_apply_on_driver_corpus_reconstructs(spark):
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    merges = bpe_train(docs, num_merges=50, max_vocab=5000)
    got = docs.select(
        "doc_id", "text", bpe_tokens(F.col("text"), merges).alias("toks")
    ).collect()
    for r in got:
        expect = " ".join(r["text"].lower().split())
        assert "".join(r["toks"]).replace(END_OF_WORD, " ").strip() == expect


def test_sql_oracle_matches_trainer_on_adversarial_corpus(spark):
    """The unrolled DuckDB merge-learning oracle (__spark_entry__.
    _bpe_oracle_cte) vs bpe_train on a corpus built to hit the hard
    cases the driver corpus may never exercise: overlapping same-symbol
    runs ('aaaa' under merge (a,a) must pair greedily left-to-right),
    exact count ties (lexicographic pair tie-break), and a merged token
    that re-participates in later merges."""
    import duckdb

    import __spark_entry__ as entry

    texts = [
        "aaaa aaaa aa",          # run-parity: (a,a) then (aa,aa)
        "abab abab ab",          # tie candidates (a,b) vs (b,a)
        "zz zz zz zz",           # high-count two-char words
        "aaaa abab zz",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = bpe_train(df, num_merges=6, min_frequency=2)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id bigint, text varchar)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = [
        (a, b)
        for _, a, b in con.execute(
            entry._bpe_oracle_cte(6) + " ORDER BY rank"
        ).fetchall()
    ]
    assert got == want
    # early stop: a corpus where nothing reaches min_frequency=2 after
    # the first merges — both sides must truncate identically
    texts2 = [("xy",), ("qr",)]
    df2 = spark.createDataFrame([(i, t[0]) for i, t in enumerate(texts2)], "doc_id long, text string")
    want2 = bpe_train(df2, num_merges=6, min_frequency=2)
    con2 = duckdb.connect()
    con2.execute("CREATE TABLE documents(doc_id bigint, text varchar)")
    con2.executemany("INSERT INTO documents VALUES (?, ?)", [(i, t[0]) for i, t in enumerate(texts2)])
    got2 = [
        (a, b)
        for _, a, b in con2.execute(
            entry._bpe_oracle_cte(6) + " ORDER BY rank"
        ).fetchall()
    ]
    assert got2 == want2


def test_sql_oracle_reproduces_max_vocab_cap(spark):
    """The oracle's wc CTE must truncate to the trainer's max_vocab with
    the same (count desc, word asc) rule — on a corpus larger than the
    cap, an uncapped oracle trains on words the trainer never saw."""
    import duckdb

    import __spark_entry__ as entry

    # cap = 2 keeps {xy, xz}; the excluded zz/zy still carry enough
    # (z,</w>) mass to flip the first merge if the cap were missing
    words = ["xy"] * 9 + ["xz"] * 8 + ["zz"] * 7 + ["zy"] * 7
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = bpe_train(df, num_merges=4, max_vocab=2, min_frequency=2)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id bigint, text varchar)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = [
        (a, b)
        for _, a, b in con.execute(
            entry._bpe_oracle_cte(4, max_vocab=2) + " ORDER BY rank"
        ).fetchall()
    ]
    assert got == want
    # and the uncapped oracle must differ here, proving the cap binds
    uncapped = [
        (a, b)
        for _, a, b in con.execute(
            entry._bpe_oracle_cte(4) + " ORDER BY rank"
        ).fetchall()
    ]
    assert uncapped != want

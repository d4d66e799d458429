"""Byte-pair-encoding tokenizer: distributed frequency training, Arrow-
batched application.

The classic subword tokenizer (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", 2016) structured for
Spark's execution model:

- **Training input is a word-frequency table, not the corpus.** BPE
  merge learning only ever consumes (word, count) pairs, so the ONLY
  distributed stage is one hash aggregation (map-side combined, output ∝
  vocabulary not corpus) plus a TakeOrdered cap on the vocabulary —
  exactly how production trainers operate on web-scale corpora. The
  merge loop itself runs driver-side over that small table and is fully
  deterministic (ties broken by (count desc, pair lexicographic)).
- **Application is vocabulary-cached Arrow batches.** Encoding is
  inherently per-word sequential (each merge depends on the previous),
  so it cannot be a Catalyst expression; it runs as a pandas UDF with a
  per-executor word→tokens cache, making the per-batch cost O(distinct
  words), not O(tokens). For a whitespace corpus the distinct-word set
  is tiny relative to the token stream (Zipf), so the Python cost
  amortizes to a dict lookup per word.

Determinism: training twice on the same data yields byte-identical merge
lists; encoding is a pure function of (text, merges). Both are pinned by
tests/test_bpe.py. Merge learning also has a DRIVER-VERIFIED SQL oracle
for any fixed number of merges: an unrolled per-step CTE chain (pair
counts → argmax with the exact tie-break → greedy left-to-right
application via gaps-and-islands parity) re-learns the first K merges
independently in DuckDB (__spark_entry__._bpe_oracle_cte, the
``text_tfidf`` bpe arm) — only the unbounded production num_merges
stays driver-side.

No reference parity — the reference engine (src/lib.rs) has no
tokenizer; beyond-reference surface for LLM corpus curation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ASCII-whitespace twin tokenizer (functions/hashing.py): word_counts
# trains on Java-regex \s+ tokens, so the Arrow-side encoder must
# split the SAME way — Python str.split() would diverge on Unicode
# whitespace (U+00A0 etc.), tokenizing words the trainer never saw.
from zx_spark.functions.hashing import toks_py as _bpe_toks_py

END_OF_WORD = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", max_vocab: int = 50_000
) -> DataFrame:
    """Distributed (word, count) aggregation feeding the trainer: lowercase
    whitespace words (the package-wide tokenize convention), one hash
    shuffle with map-side partial counts, capped to the ``max_vocab`` most
    frequent words via TakeOrdered (count desc, word asc — deterministic).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_vocab)
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for symbols, cnt in vocab.items():
        for i in range(len(symbols) - 1):
            p = (symbols[i], symbols[i + 1])
            pairs[p] = pairs.get(p, 0) + cnt
    return pairs


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    merged = pair[0] + pair[1]
    out: dict[tuple[str, ...], int] = {}
    for symbols, cnt in vocab.items():
        new: list[str] = []
        i = 0
        while i < len(symbols):
            if (
                i < len(symbols) - 1
                and symbols[i] == pair[0]
                and symbols[i + 1] == pair[1]
            ):
                new.append(merged)
                i += 2
            else:
                new.append(symbols[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + cnt
    return out


def train_merges_from_counts(
    counts: list[tuple[str, int]], num_merges: int, min_frequency: int = 2
) -> list[tuple[str, str]]:
    """Driver-side BPE merge learning over a (word, count) table — the
    classic algorithm, deterministic: each round merges the most frequent
    adjacent symbol pair (ties: lexicographically smallest pair), stopping
    at ``num_merges`` or when no pair reaches ``min_frequency``."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in counts:
        sym = tuple(word) + (END_OF_WORD,)
        vocab[sym] = vocab.get(sym, 0) + cnt
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        top = max(pairs.values())
        if top < min_frequency:
            break
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_vocab: int = 50_000,
    min_frequency: int = 2,
) -> list[tuple[str, str]]:
    """End-to-end training: distributed word counts → driver-side merge
    learning. Returns the ordered merge list (rank = index)."""
    counts = [
        (r["word"], int(r["count"]))
        for r in word_counts(df, text_col, max_vocab).collect()
    ]
    return train_merges_from_counts(counts, num_merges, min_frequency)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encoding of one word: repeatedly apply the
    lowest-rank merge present until none applies (the standard
    inference rule — merge order follows training order)."""
    symbols: list[str] = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        ranked = [
            (ranks[(symbols[i], symbols[i + 1])], i)
            for i in range(len(symbols) - 1)
            if (symbols[i], symbols[i + 1]) in ranks
        ]
        if not ranked:
            break
        rank = min(r for r, _ in ranked)
        # ranks are unique (merge-list indexes), so `rank` names exactly
        # one pair type; merge its occurrences left to right
        new: list[str] = []
        i = 0
        while i < len(symbols):
            if (
                i < len(symbols) - 1
                and ranks.get((symbols[i], symbols[i + 1])) == rank
            ):
                new.append(symbols[i] + symbols[i + 1])
                i += 2
            else:
                new.append(symbols[i])
                i += 1
        symbols = new
    return symbols


def _encoder(merges: list[tuple[str, str]]):
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    cache: dict[str, list[str]] = {}

    def enc(text: str | None) -> list[str]:
        if not text:
            return []
        out: list[str] = []
        for w in _bpe_toks_py(text):
            toks = cache.get(w)
            if toks is None:
                toks = encode_word(w, ranks)
                cache[w] = toks
            out.extend(toks)
        return out

    return enc


def bpe_tokens(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Column of BPE tokens (array<string>) for ``text_col`` under the
    trained ``merges``. Arrow-batched pandas UDF with a per-executor
    word→tokens cache (Zipf makes the cache hit rate ≈ 1 at corpus
    scale); the merge list travels once per executor in the closure, not
    per row."""
    # built once and pickled into the UDF: each Python worker unpickles
    # ONE encoder whose word cache then persists across Arrow batches
    enc = _encoder(merges)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(enc)

    return _tok(text_col)


def bpe_token_count(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Exact trained-BPE token count per document (the real-tokenizer
    upgrade of text.bpe_ish_token_count's regex estimate)."""
    return F.size(bpe_tokens(text_col, merges))

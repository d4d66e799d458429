"""fastText-style linear text classifier: Naive Bayes over hashed
unigrams — the cheap supervised scorer web-corpus pipelines use for
quality / language filtering (CCNet-style), built Spark-first:

- **Training is one distributed aggregation.** The only corpus-scale
  stage is a (bucket, label) token-count hash agg (map-side combined;
  shuffle volume ∝ n_buckets × 2, thousands of rows, not corpus); the
  log-odds arithmetic runs driver-side on exact integer counts.
- **The hashing trick bounds the model.** Tokens hash into ``n_buckets``
  via the package-wide md5-60-bit construction (ANSI-SQL-reproducible —
  the same bucket the sampling/dedup oracles replay), so the weight
  vector is a fixed-size array literal that BROADCASTS into a pure
  Catalyst scoring expression: no join, no shuffle, no Python at
  score time. Score = one in-row fold over the token array.
- **Integer micro-log-odds make scoring engine-exact.** Weights are
  stored as round(log_odds · 1e6) integers: per-document sums are exact
  integer arithmetic (order-free — safe under any partial-agg order on
  either engine), divided by 1e6 once at the end. A driver-side pure-
  Python twin (``nb_train_python``) re-derives the identical weights
  from the raw data, which is what lets the DuckDB oracle verify the
  whole train+score pipeline value-for-value.

No reference parity — the reference engine has no text classifier;
beyond-reference surface for LLM corpus curation (quality gates,
language filters) alongside text_quality's heuristic signals.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zx_spark.util import lit_array

MICRO = 1_000_000


# Shared package-wide primitives (functions/hashing.py) — see that
# module's tokenization-parity note.
from zx_spark.functions.hashing import bucket as _bucket
from zx_spark.functions.hashing import bucket_py as _bucket_py
from zx_spark.functions.hashing import toks_py as _toks_py


def _weights_from_counts(
    pos: list[int], neg: list[int], n_pos_docs: int, n_neg_docs: int, alpha: float
) -> dict:
    n_buckets = len(pos)
    tot_pos, tot_neg = sum(pos), sum(neg)
    weights = [
        round(
            (
                math.log((pos[b] + alpha) / (tot_pos + alpha * n_buckets))
                - math.log((neg[b] + alpha) / (tot_neg + alpha * n_buckets))
            )
            * MICRO
        )
        for b in range(n_buckets)
    ]
    prior = round(math.log((n_pos_docs + alpha) / (n_neg_docs + alpha)) * MICRO)
    return {"weights_micro": weights, "prior_micro": prior, "n_buckets": n_buckets}


def nb_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 256,
    alpha: float = 1.0,
) -> dict:
    """Train on a DataFrame with a boolean ``label_col``. One distributed
    (bucket, label) count agg + one label-count agg; everything else is
    exact driver-side integer arithmetic. Returns the model dict
    (micro-log-odds weights + prior), byte-identical to
    ``nb_train_python`` on the same rows."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    # ONE scan, ONE shuffle, ONE job: a NULL sentinel element prepended
    # to every document's token array becomes the per-label DOC counter
    # (bucket(NULL) is NULL, which groups apart from every real bucket),
    # so token counts and doc counts ride the same map-side-combined agg
    # instead of two separate actions.
    marked = F.concat(
        F.array(F.lit(None).cast("string")),
        F.coalesce(toks, F.array().cast("array<string>")),  # NULL text is still a doc
    )
    # r14 opt: spread the scan (the tokenize+md5 pass is CPU-bound and
    # a small parquet source is ONE partition otherwise; no-op on wide
    # inputs) and materialize the marked token array in its own
    # projection so the generate's inferred size()>0 filter cannot be
    # pushed below the repartition and re-evaluate the chain unspread.
    from zx_spark.util import spread as _spread

    counts = (
        _spread(df)
        .select(F.col(label_col).alias("__lab"), marked.alias("__m"))
        .select("__lab", F.explode("__m").alias("__t"))
        .groupBy(_bucket(F.col("__t"), n_buckets).alias("__b"), "__lab")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    pos = [0] * n_buckets
    neg = [0] * n_buckets
    docs = {True: 0, False: 0}
    for r in counts:
        if r["__b"] is None:
            docs[bool(r["__lab"])] = int(r["__n"])
        else:
            (pos if r["__lab"] else neg)[int(r["__b"])] = int(r["__n"])
    return _weights_from_counts(pos, neg, docs.get(True, 0), docs.get(False, 0), alpha)


def nb_train_python(
    rows: list[tuple[str | None, bool]], n_buckets: int = 256, alpha: float = 1.0
) -> dict:
    """Pure-Python twin of ``nb_train`` (same tokenization, same bucket
    hash, same exact counts) — used by tests to pin Spark ≡ Python and by
    the DuckDB oracle to embed the weights as literals without a
    SparkSession."""
    pos = [0] * n_buckets
    neg = [0] * n_buckets
    n_pos = n_neg = 0
    for text, label in rows:
        if label:
            n_pos += 1
        else:
            n_neg += 1
        side = pos if label else neg
        for w in _toks_py(text):
            side[_bucket_py(w, n_buckets)] += 1
    return _weights_from_counts(pos, neg, n_pos, n_neg, alpha)


def nb_score(text_col: Column, model: dict) -> Column:
    """Per-document log-odds under the trained model, rounded to 6
    decimals. Pure Catalyst: token split → bucket hash → literal-array
    weight lookup → exact integer fold → one division. No shuffle, no
    join, no Python — scores at scan speed on 100 TB.

    NULL text scores NULL (no content is not evidence, so it does not
    collapse to the prior); empty text scores exactly the prior."""
    n_buckets = model["n_buckets"]
    w = lit_array([int(x) for x in model["weights_micro"]])
    toks = F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != F.lit(""))
    micro_sum = F.aggregate(
        F.transform(toks, lambda t: F.element_at(w, (_bucket(t, n_buckets) + 1).cast("int"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.round(
        (micro_sum + F.lit(int(model["prior_micro"]))).cast("double") / F.lit(float(MICRO)),
        6,
    )


def nb_predict(text_col: Column, model: dict, threshold: float = 0.0) -> Column:
    """Boolean decision column: log-odds > threshold."""
    return nb_score(text_col, model) > F.lit(float(threshold))

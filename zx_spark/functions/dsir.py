"""DSIR-style importance weights for data selection — score every raw
document by how target-like it is (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023), built
Spark-first on the house hashed-feature conventions:

- **Features are hashed n-grams.** Each document's unigrams and
  bigrams hash into ``n_buckets`` via the package-wide md5-60-bit
  construction (ANSI-SQL-reproducible — the same bucket the NB/LM
  oracles replay), so both corpus distributions are fixed-size integer
  count arrays.
- **Training is one aggregation per corpus.** A single explode +
  map-side-combined count of feature buckets for the RAW corpus and
  one for the TARGET corpus (shuffle ∝ n_buckets each, never corpus-
  sized); totals are exact integers. The per-bucket log ratio
  ``log p_target(b) − log p_raw(b)`` (add-alpha smoothed) is
  precomputed driver-side as ``round(log(·)·1e6)`` micro-integers.
- **Scoring is an exact bigint fold.** A document's log importance
  weight is the SUM of its features' micro-log-ratios — order-free
  integer arithmetic, one literal-array lookup per feature, no join,
  no shuffle, no Python: scan-speed whole-stage codegen at 100 TB.
  Pure-Python twins (``dsir_train_python``/``dsir_log_weight_python``)
  re-derive identical arrays/scores from raw data, which is what lets
  a DuckDB oracle verify train+score end to end.

Selection: rank by ``dsir_log_weight`` and keep the top slice, or do
true importance RESAMPLING by composing with the existing machinery —
``weighted_sample_n(df, n, weight_col=F.exp(logw - max_logw), ...)``
(subtract a corpus max or clamp before exp; the A-ES priorities only
need weights up to a positive scale factor).

No reference parity — the reference engine has no text surface
(SURVEY §2.2); beyond-reference operator for LLM corpus curation,
companion to the NB (classify.py) and bigram-LM (lm.py) gates.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared package-wide primitives (functions/hashing.py) — see that
# module's tokenization-parity note.
from zx_spark.functions.hashing import bucket as _bucket
from zx_spark.functions.hashing import bucket_py as _bucket_py
from zx_spark.functions.hashing import toks_py as _toks_py

MICRO = 1_000_000


def _feature_buckets(text: Column, n_buckets: int) -> Column:
    """array<long> of hashed feature buckets: every unigram plus every
    adjacent bigram (space-joined — tokens cannot contain whitespace, so
    the join is collision-free and distinct from any unigram)."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
    uni = F.transform(toks, lambda t: _bucket(t, n_buckets))
    bi = F.when(
        F.size(toks) > 1,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: _bucket(F.concat_ws(" ", a, b), n_buckets),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.concat(uni, bi)


def _features_py(text: str | None) -> list[str]:
    toks = _toks_py(text)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _count_buckets(df: DataFrame, text_col: str, n_buckets: int) -> list[int]:
    rows = (
        df.select(
            F.explode(_feature_buckets(F.col(text_col), n_buckets)).alias("__b")
        )
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    counts = [0] * n_buckets
    for r in rows:
        counts[int(r["__b"])] = int(r["__n"])
    return counts


def _model_from_counts(
    target: list[int], raw: list[int], alpha: float, n_buckets: int
) -> dict:
    # Driver-side float arithmetic on exact integer counts: both training
    # paths (Spark collect and the pure-Python twin) run this same
    # function, so the array is byte-identical.
    t_total = sum(target) + alpha * n_buckets
    r_total = sum(raw) + alpha * n_buckets
    ratio = [
        round(
            (
                math.log(target[b] + alpha)
                - math.log(t_total)
                - math.log(raw[b] + alpha)
                + math.log(r_total)
            )
            * MICRO
        )
        for b in range(n_buckets)
    ]
    return {"logratio_micro": ratio, "n_buckets": n_buckets, "alpha": alpha}


def dsir_train(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.1,
) -> dict:
    """Fit the hashed-feature importance model: one bucket-count
    aggregation over each corpus, driver-side log-ratio finisher.
    Returns the model dict (one micro-log-ratio integer array),
    byte-identical to ``dsir_train_python`` on the same rows."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    target = _count_buckets(target_df, text_col, n_buckets)
    raw = _count_buckets(raw_df, text_col, n_buckets)
    return _model_from_counts(target, raw, alpha, n_buckets)


def dsir_train_python(
    raw_texts: list[str | None],
    target_texts: list[str | None],
    n_buckets: int = 4096,
    alpha: float = 0.1,
) -> dict:
    """Pure-Python twin of ``dsir_train`` (same tokenization, same
    feature set, same bucket hash) — the oracle's independent
    re-derivation path."""
    def count(texts: list[str | None]) -> list[int]:
        counts = [0] * n_buckets
        for t in texts:
            for f in _features_py(t):
                counts[_bucket_py(f, n_buckets)] += 1
        return counts

    return _model_from_counts(
        count(target_texts), count(raw_texts), alpha, n_buckets
    )


def dsir_log_weight(text_col: Column, model: dict) -> Column:
    """Per-document log importance weight ``log p_target(x) −
    log p_raw(x)`` under the hashed-feature multinomials: the exact
    bigint sum of the features' micro-log-ratios, divided by 1e6 once
    and rounded to 6 dp. Token-less/NULL text scores NULL (no features
    is no evidence in either direction). Raw likelihood-ratio
    convention: longer documents score more extreme — rank within
    comparable slices or normalize per feature if that matters for the
    selection policy."""
    n_buckets = model["n_buckets"]
    lr = F.lit([int(x) for x in model["logratio_micro"]])
    feats = _feature_buckets(text_col, n_buckets)
    micro = F.aggregate(
        F.transform(
            feats, lambda b: F.element_at(lr, (b + 1).cast("int"))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.when(
        F.size(feats) > 0,
        F.round(micro.cast("double") / F.lit(float(MICRO)), 6),
    )


def dsir_log_weight_python(text: str | None, model: dict) -> float | None:
    """Driver-side twin of ``dsir_log_weight`` for one document. Same
    HALF_UP 6-dp finisher as the engines (lm.py discipline)."""
    from decimal import ROUND_HALF_UP, Decimal

    n_buckets = model["n_buckets"]
    feats = _features_py(text)
    if not feats:
        return None
    total = sum(model["logratio_micro"][_bucket_py(f, n_buckets)] for f in feats)
    v = total / float(MICRO)
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

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
from zx_spark.util import lit_array

MICRO = 1_000_000


def _feats_from_toks(toks: Column, n_buckets: int) -> Column:
    """Feature buckets from an ALREADY MATERIALIZED token-array column
    (the functions.text.tokenize projection-boundary discipline: hot
    frame paths tokenize once per row, not once per reference — the
    bigram zip_with below references the token array three times)."""
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


def _feature_buckets(text: Column, n_buckets: int) -> Column:
    """array<long> of hashed feature buckets: every unigram plus every
    adjacent bigram (space-joined — tokens cannot contain whitespace, so
    the join is collision-free and distinct from any unigram)."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
    return _feats_from_toks(toks, n_buckets)


def _features_py(text: str | None) -> list[str]:
    toks = _toks_py(text)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _count_rows_to_list(rows, key: str, n_buckets: int) -> list[int]:
    counts = [0] * n_buckets
    for r in rows:
        counts[int(r["__b"])] = int(r[key])
    return counts


def _feats_exploded(
    df: DataFrame, text_col: str, n_buckets: int, tag: Column | None = None
) -> DataFrame:
    """(__b [, __t]) — one exploded feature-bucket row per feature
    (``__t`` carries ``tag`` when given). Tokenizes through a projection
    boundary (tokenize discipline) and spreads the scan first: the md5
    hashing pass is the CPU-dominant stage and a small parquet source is
    ONE partition otherwise (r14 opt: single-core → cluster-wide; no-op
    on already-wide inputs). explode_outer, not explode:
    InferFiltersFromGenerate would push a ``size(feats) > 0`` filter
    below the spread repartition and re-evaluate the whole tokenize+hash
    chain on the unspread scan (the decontaminate.py hazard); token-less
    docs yield a NULL bucket row, filtered AFTER the generate."""
    from zx_spark.util import spread as _spread

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    first = [toks.alias("__toks")] + ([tag.alias("__t")] if tag is not None else [])
    second = [
        F.explode_outer(_feats_from_toks(F.col("__toks"), n_buckets)).alias("__b")
    ] + ([F.col("__t")] if tag is not None else [])
    return _spread(df).select(*first).select(*second).filter(F.col("__b").isNotNull())


def _count_buckets(df: DataFrame, text_col: str, n_buckets: int) -> list[int]:
    rows = (
        _feats_exploded(df, text_col, n_buckets)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    return _count_rows_to_list(rows, "__n", n_buckets)


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
    target_df: DataFrame | None = None,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.1,
    target_filter: Column | None = None,
) -> dict:
    """Fit the hashed-feature importance model: one bucket-count
    aggregation over each corpus, driver-side log-ratio finisher.
    Returns the model dict (one micro-log-ratio integer array),
    byte-identical to ``dsir_train_python`` on the same rows.

    ``target_filter`` (r14 opt, exclusive with ``target_df``): when the
    target corpus is a row-filter of the raw corpus — the common "train
    against my own high-quality slice" shape — pass the predicate
    instead of a second frame and BOTH distributions ride ONE hashing
    pass + ONE shuffle (the raw count and the filter-conditional count
    share the aggregation), instead of hashing the target rows twice
    across two jobs. Counts are identical: a NULL predicate row counts
    into raw only, exactly like ``raw_df.filter(...)`` would."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if (target_df is None) == (target_filter is None):
        raise ValueError("pass exactly one of target_df / target_filter")
    if target_filter is not None:
        rows = (
            _feats_exploded(raw_df, text_col, n_buckets, tag=target_filter)
            .groupBy("__b")
            .agg(
                F.count(F.lit(1)).alias("__raw"),
                F.count(F.when(F.col("__t"), 1)).alias("__tgt"),
            )
            .collect()
        )
        raw = _count_rows_to_list(rows, "__raw", n_buckets)
        target = _count_rows_to_list(rows, "__tgt", n_buckets)
    else:
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
    lr = lit_array([int(x) for x in model["logratio_micro"]])
    feats = _feature_buckets(text_col, n_buckets)
    # ONE struct fold referencing `feats` exactly once: the former
    # ``when(size(feats) > 0, aggregate(transform(feats, ...)))`` shape
    # evaluated the whole tokenize+md5 feature chain twice per row
    # (higher-order lambdas are interpreted — no codegen subexpression
    # elimination merges them; measured 2.65s → 0.52s on the sf0.1
    # scoring pass, r14). The feature count rides the fold and the
    # finish lambda applies the same empty→NULL rule.
    return F.aggregate(
        feats,
        F.struct(
            F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("n")
        ),
        lambda acc, b: F.struct(
            (acc["s"] + F.element_at(lr, (b + 1).cast("int"))).alias("s"),
            (acc["n"] + F.lit(1)).alias("n"),
        ),
        lambda acc: F.when(
            acc["n"] > 0,
            F.round(acc["s"].cast("double") / F.lit(float(MICRO)), 6),
        ),
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

"""Hashed bigram language model for perplexity-based quality filtering —
the CCNet-style corpus gate (train a small LM on "good" text, keep
documents whose perplexity under it is low), built Spark-first:

- **Training is one distributed aggregation.** The only corpus-scale
  stage is a single pass that explodes each document's (context, token)
  bigrams — context = previous token, ``<s>`` before the first — and
  hash-counts context buckets and bigram buckets together (map-side
  combined; shuffle volume ∝ 2 × n_buckets, thousands of rows, never
  corpus-sized). The smoothing arithmetic runs driver-side on exact
  integer counts.
- **The hashing trick bounds the model.** Tokens and bigram strings
  hash into ``n_buckets`` via the package-wide md5-60-bit construction
  (ANSI-SQL-reproducible — the same bucket the sampling/dedup/NB
  oracles replay), so the model is two fixed-size integer arrays that
  BROADCAST into a pure Catalyst scoring expression: no join, no
  shuffle, no Python at score time.
- **Integer micro-log-probs make scoring engine-exact.** Per token,
  ``log P(cur | prev)`` under add-alpha smoothing decomposes as
  ``log(bi[b(prev⧺cur)] + α) − log(ctx[b(prev)] + α·n_buckets)``; both
  logs are precomputed per bucket as ``round(log(·)·1e6)`` integers, so
  a document's total is an exact bigint sum (order-free — safe under
  any partial-agg order on either engine), divided by ``1e6 · n_tokens``
  once at the end. A pure-Python twin (``lm_train_python``) re-derives
  identical arrays from the raw data, which is what lets the DuckDB
  oracle verify train+score end to end.

At 100 TB: training is one scan + a 2·n_buckets-row shuffle; scoring is
scan-speed whole-stage codegen (two array lookups and an integer add per
token). ``perplexity`` is a convenience wrapper; pipelines filter on
``avg_logprob`` directly (monotone in perplexity).

No reference parity — the reference engine has no text surface
(SURVEY §2.2); beyond-reference operator for LLM corpus curation,
companion to the NB classifier gate (functions/classify.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
BOS = "<s>"


# Shared package-wide primitives (functions/hashing.py) — one home for
# the md5-60-bit bucket and the ASCII-whitespace twin tokenizer, so the
# NB/LM/DSIR trio cannot drift apart.
from zx_spark.functions.hashing import bucket as _bucket
from zx_spark.functions.hashing import bucket_py as _bucket_py
from zx_spark.functions.hashing import toks_py as _toks_py


def _toks(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def _model_from_counts(
    bi: list[int], ctx: list[int], alpha: float, n_buckets: int
) -> dict:
    # Python round on driver-side floats: both training paths (Spark
    # collect and the pure-Python twin) run this same function on the
    # same exact integer counts, so the arrays are byte-identical.
    lb = [round(math.log(bi[b] + alpha) * MICRO) for b in range(n_buckets)]
    lc = [
        round(math.log(ctx[c] + alpha * n_buckets) * MICRO)
        for c in range(n_buckets)
    ]
    return {
        "logbi_micro": lb,
        "logctx_micro": lc,
        "n_buckets": n_buckets,
        "alpha": alpha,
    }


def _pairs(text: Column) -> Column:
    """array<struct<prev,cur>> of bigrams with a BOS context: prev_1 =
    ``<s>``, prev_i = token_{i-1}. Tokens cannot contain whitespace
    (split on ``\\s+``), so ``prev ⧺ ' ' ⧺ cur`` is collision-free."""
    toks = _toks(text)
    prevs = F.concat(
        F.array(F.lit(BOS)),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    # guard: for empty token arrays zip_with would null-pad the single
    # BOS context into a phantom pair — callers filter on size > 0
    return F.when(
        F.size(toks) > 0,
        F.zip_with(
            prevs, toks, lambda p, c: F.struct(p.alias("prev"), c.alias("cur"))
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))


def lm_train(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.1,
) -> dict:
    """Train the hashed bigram LM in ONE distributed pass: explode
    bigrams, count context buckets and bigram buckets in a single
    two-row-per-bigram agg. Returns the model dict (two micro-log
    integer arrays), byte-identical to ``lm_train_python`` on the same
    rows."""
    # ONE corpus scan, ONE explode, ONE map-side-combined shuffle of
    # ≤ 2·n_buckets rows per partition: each bigram emits its context
    # bucket (kind 0) and bigram bucket (kind 1) from a single
    # evaluation of the bigram walk (flatten of per-pair 2-arrays —
    # Catalyst does not CSE across separate transform branches, so a
    # concat of two transforms would derive the walk twice)
    both = F.flatten(
        F.transform(
            _pairs(F.col(text_col)),
            lambda p: F.array(
                F.struct(
                    F.lit(0).alias("__k"),
                    _bucket(p["prev"], n_buckets).alias("__b"),
                ),
                F.struct(
                    F.lit(1).alias("__k"),
                    _bucket(
                        F.concat_ws(" ", p["prev"], p["cur"]), n_buckets
                    ).alias("__b"),
                ),
            ),
        )
    )
    counts = (
        df.select(F.explode(both).alias("__kb"))
        .groupBy(F.col("__kb.__k").alias("__k"), F.col("__kb.__b").alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    bi = [0] * n_buckets
    ctx = [0] * n_buckets
    for r in counts:
        (ctx if r["__k"] == 0 else bi)[int(r["__b"])] = int(r["__n"])
    return _model_from_counts(bi, ctx, alpha, n_buckets)


def lm_train_python(
    texts: list[str | None], n_buckets: int = 4096, alpha: float = 0.1
) -> dict:
    """Pure-Python twin of ``lm_train`` (same tokenization, same BOS
    convention, same bucket hash, same exact counts) — pins Spark ≡
    Python in tests and lets the DuckDB oracle embed the arrays as
    literals without a SparkSession."""
    bi = [0] * n_buckets
    ctx = [0] * n_buckets
    for text in texts:
        toks = (text or "").lower().split()
        prev = BOS
        for cur in toks:
            ctx[_bucket_py(prev, n_buckets)] += 1
            bi[_bucket_py(f"{prev} {cur}", n_buckets)] += 1
            prev = cur
    return _model_from_counts(bi, ctx, alpha, n_buckets)


def lm_score(text_col: Column, model: dict) -> Column:
    """Per-document average log-probability under the trained model,
    rounded to 6 decimals. Pure Catalyst: bigram arrays → two literal-
    array lookups per token → exact bigint fold → one division. No
    shuffle, no join, no Python — scores at scan speed on 100 TB.

    NULL and token-less text score NULL (an average over zero tokens is
    undefined; no content is not evidence of quality either way)."""
    n_buckets = model["n_buckets"]
    lb = F.lit([int(x) for x in model["logbi_micro"]])
    lc = F.lit([int(x) for x in model["logctx_micro"]])
    pairs = _pairs(text_col)
    micro = F.aggregate(
        F.transform(
            pairs,
            lambda p: F.element_at(
                lb,
                (
                    _bucket(
                        F.concat_ws(" ", p["prev"], p["cur"]), n_buckets
                    )
                    + 1
                ).cast("int"),
            )
            - F.element_at(lc, (_bucket(p["prev"], n_buckets) + 1).cast("int")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    n = F.size(pairs)
    return F.when(
        n > 0,
        F.round(micro.cast("double") / (F.lit(float(MICRO)) * n.cast("double")), 6),
    )


def lm_score_python(text: str | None, model: dict) -> float | None:
    """Driver-side twin of ``lm_score`` for one document (tests).

    The finisher replicates the ENGINE discipline exactly: the same IEEE
    division, then HALF_UP-away-from-zero at 6 dp (Spark F.round /
    DuckDB round) — Python's built-in banker's ``round`` diverges at
    exact .5e-6 boundaries (found by hypothesis: micro totals divisible
    by the token count land there routinely)."""
    from decimal import ROUND_HALF_UP, Decimal

    n_buckets = model["n_buckets"]
    toks = _toks_py(text)
    if not toks:
        return None
    total = 0
    prev = BOS
    for cur in toks:
        total += model["logbi_micro"][_bucket_py(f"{prev} {cur}", n_buckets)]
        total -= model["logctx_micro"][_bucket_py(prev, n_buckets)]
        prev = cur
    v = total / (float(MICRO) * len(toks))
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def perplexity(avg_logprob: Column) -> Column:
    """exp(−avg_logprob) — the conventional filter statistic. Kept out
    of hash-verified rows (transcendental finishers can differ in the
    last ulp across engines); filter on ``avg_logprob`` directly when
    exactness matters."""
    return F.exp(-avg_logprob)


def lm_filter(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    min_avg_logprob: float | None = None,
    max_perplexity: float | None = None,
) -> DataFrame:
    """Keep documents the LM finds sufficiently natural — a map-side
    gate (no shuffle), composable ahead of the expensive dedup stages in
    ``pipeline.curate_corpus``. Exactly one threshold must be given;
    ``max_perplexity`` is translated to the equivalent exact
    ``avg_logprob`` bound."""
    if (min_avg_logprob is None) == (max_perplexity is None):
        raise ValueError("give exactly one of min_avg_logprob / max_perplexity")
    if max_perplexity is not None:
        min_avg_logprob = -math.log(max_perplexity)
    score = lm_score(F.col(text_col), model)
    return df.filter(score >= F.lit(float(min_avg_logprob)))

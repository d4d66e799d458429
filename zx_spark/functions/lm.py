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

from zx_spark.util import lit_array

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
    return _pairs_from_toks(_toks(text))


def _pairs_from_toks(toks: Column) -> Column:
    """The bigram walk from an ALREADY MATERIALIZED token-array column
    (tokenize discipline: this expression references ``toks`` four
    times, so inlining the tokenizer re-splits the text per reference —
    r14 opt)."""
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
    # ≤ 2·n_buckets rows per partition: each bigram contributes its
    # context bucket (even-encoded: 2·b) and bigram bucket (odd-encoded:
    # 2·b + 1) as PLAIN LONGS — r14 opt: the former per-pair
    # struct<kind,bucket> walk (pair structs built, re-wrapped, exploded
    # as structs) measured 3× slower than this flat encoding at sf0.1
    # (2.0 s → 0.68 s). The scan is spread (CPU-bound hashing; a small
    # parquet source is ONE partition otherwise), the tokenizer runs
    # through a projection boundary (the prevs/zip_with walk references
    # the token array three times), and the encoded array materializes
    # in a third projection so the generate's inferred size()>0 filter
    # cannot be pushed below the repartition and re-evaluate the chain
    # unspread (the decontaminate hazard).
    from zx_spark.util import spread as _spread

    tk = F.col("__toks")
    prevs = F.concat(
        F.array(F.lit(BOS)),
        F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
    )
    enc = F.when(
        F.size(tk) > 0,
        F.concat(
            F.transform(prevs, lambda p: _bucket(p, n_buckets) * 2),
            F.zip_with(
                prevs,
                tk,
                lambda p, c: _bucket(F.concat_ws(" ", p, c), n_buckets) * 2
                + 1,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    counts = (
        _spread(df)
        .select(_toks(F.col(text_col)).alias("__toks"))
        .select(enc.alias("__kb_arr"))
        .select(F.explode_outer("__kb_arr").alias("__kb"))
        .filter(F.col("__kb").isNotNull())
        .groupBy("__kb")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    bi = [0] * n_buckets
    ctx = [0] * n_buckets
    for r in counts:
        v = int(r["__kb"])
        (bi if v % 2 else ctx)[v // 2] = int(r["__n"])
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
    lb = lit_array([int(x) for x in model["logbi_micro"]])
    lc = lit_array([int(x) for x in model["logctx_micro"]])
    # ONE running-prev fold over the TOKEN array, referenced exactly
    # once: the former ``when(size(pairs) > 0, aggregate(transform(
    # pairs, ...)) / size)`` shape referenced the tokenize+pair chain
    # three times per row (and ``_pairs`` itself references the token
    # array four more), and higher-order lambdas are interpreted — no
    # codegen subexpression elimination merges them (the dsir.py r14
    # finding). Carrying the previous token through the accumulator
    # replaces the materialized pair structs outright; the token count
    # rides the fold; the finish lambda applies the same empty→NULL rule
    # and the identical IEEE division + 6-dp HALF_UP finisher. The sum
    # is the same exact bigint total in the same left-to-right order.
    return F.aggregate(
        _toks(text_col),
        F.struct(
            F.lit(BOS).alias("p"),
            F.lit(0).cast("long").alias("s"),
            F.lit(0).cast("long").alias("n"),
        ),
        lambda acc, t: F.struct(
            t.alias("p"),
            (
                acc["s"]
                + F.element_at(
                    lb,
                    (
                        _bucket(F.concat_ws(" ", acc["p"], t), n_buckets) + 1
                    ).cast("int"),
                )
                - F.element_at(
                    lc, (_bucket(acc["p"], n_buckets) + 1).cast("int")
                )
            ).alias("s"),
            (acc["n"] + F.lit(1)).alias("n"),
        ),
        lambda acc: F.when(
            acc["n"] > 0,
            F.round(
                acc["s"].cast("double")
                / (F.lit(float(MICRO)) * acc["n"].cast("double")),
                6,
            ),
        ),
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

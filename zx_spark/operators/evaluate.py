"""Binary-classifier evaluation — the calibration half of a quality
gate. Training-data pipelines ship scores (NB log-odds, LM perplexity,
heuristic ratios); choosing the THRESHOLD needs ROC-AUC and the
confusion/precision/recall trade-off, computed on the corpus itself.

Beyond-reference (the reference engine has no ML surface); pairs with
functions/classify.py and functions/lm.py.

Distributed shape (what survives 100 TB):

- ``roc_auc`` groups by the score FIRST (one shuffle, cardinality =
  distinct scores), then runs the rank arithmetic as a window over that
  aggregated frame. With quantized scores (integers, micro-fixed-point,
  or the ``bins`` option) distinct scores are BOUNDED, so the
  single-partition cumulative window sees thousands of rows regardless
  of corpus size — the Mann-Whitney statistic without a global sort of
  the data. Raw continuous doubles would make distinct ≈ rows; pass
  ``bins`` to quantize in that case.
- ``confusion_at`` is ONE map-side conditional-sum aggregation for all
  thresholds at once — no shuffle beyond the final single-row agg.
- Ties are handled exactly (average ranks), so AUC matches the
  textbook Mann-Whitney value under heavy score collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _scored(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int | None,
    keep_cut: bool = False,
):
    raw = F.col(f"`{score_col}`").cast("double")
    s = raw
    cut = raw
    if bins is not None:
        if bins < 2:
            raise ValueError(f"bins must be >= 2, got {bins}")
        # quantize into `bins` equal-width buckets over the observed
        # range; the bucket index becomes the score (ordering-preserving).
        # The whole expression is guarded on a non-NULL raw score: both
        # F.least(NULL, k) and the hi==lo branch would otherwise swallow
        # the NULL and misfile NULL-score rows into a real bucket.
        lo, hi = F.min(raw), F.max(raw)
        r = df.agg(lo.alias("__lo"), hi.alias("__hi"))
        df = df.crossJoin(F.broadcast(r))
        width = (F.col("__hi") - F.col("__lo")) / bins
        idx = F.when(
            raw.isNotNull(),
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.floor((raw - F.col("__lo")) / width), F.lit(bins - 1)
                )
            ),
        )
        s = idx.cast("double")
        # the bucket's inclusive lower bound in SCORE units — what a
        # caller can actually deploy as `score >= cut`
        cut = F.when(
            raw.isNotNull(), F.col("__lo") + idx * width
        ).cast("double")
    cols = [s.alias("__s"), F.col(f"`{label_col}`").cast("boolean").alias("__y")]
    if keep_cut:
        cols.append(cut.alias("__cut"))
    return df.select(*cols).filter(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """One-row frame ``(auc, n_pos, n_neg)`` — exact tie-aware
    Mann-Whitney AUC of ``score_col`` against boolean ``label_col``.

    ``auc`` is NULL when either class is empty. NULL scores/labels are
    excluded. ``bins`` quantizes continuous scores first (see module
    docstring); integer or fixed-point scores need no binning.
    """
    sc = _scored(df, score_col, label_col, bins)
    per_score = sc.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(F.col("__y").cast("long")).alias("__p"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "__below", F.coalesce(F.sum("__c").over(w), F.lit(0))
    ).withColumn(
        "__avg_rank", F.col("__below") + (F.col("__c") + F.lit(1)) / 2.0
    )
    agg = ranked.agg(
        F.sum(F.col("__p") * F.col("__avg_rank")).alias("__u"),
        F.sum("__p").alias("n_pos"),
        F.sum(F.col("__c") - F.col("__p")).alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (F.col("__u") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            round_dp,
        ),
    )
    return agg.select(auc.alias("auc"), "n_pos", "n_neg")


def confusion_at(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
    round_dp: int = 6,
) -> DataFrame:
    """Per-threshold confusion counts and derived rates, one aggregation
    pass for ALL thresholds: ``(threshold, tp, fp, fn, tn, precision,
    recall, f1)``. Predicted positive ⇔ ``score >= threshold``.
    precision is NULL with no predicted positives, recall NULL with no
    actual positives, f1 NULL when either is NULL or p+r = 0."""
    if not thresholds:
        raise ValueError("confusion_at: thresholds must be non-empty")
    sc = _scored(df, score_col, label_col, bins=None)
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col("__s") >= F.lit(float(t))
        y = F.col("__y")
        aggs += [
            F.sum((pred & y).cast("long")).alias(f"__tp{i}"),
            F.sum((pred & ~y).cast("long")).alias(f"__fp{i}"),
            F.sum((~pred & y).cast("long")).alias(f"__fn{i}"),
            F.sum((~pred & ~y).cast("long")).alias(f"__tn{i}"),
        ]
    one = sc.agg(*aggs)
    # One exploded struct array over the SINGLE aggregate row — not a
    # union of per-threshold branches, which would put N copies of the
    # corpus aggregation in the plan and lean on exchange reuse to
    # deduplicate them.
    per_t = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"__tp{i}").alias("tp"),
                F.col(f"__fp{i}").alias("fp"),
                F.col(f"__fn{i}").alias("fn"),
                F.col(f"__tn{i}").alias("tn"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    ex = one.select(F.explode(per_t).alias("r")).select("r.*")
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2 * prec * rec / (prec + rec),
    )
    return ex.select(
        "threshold", "tp", "fp", "fn", "tn",
        F.round(prec, round_dp).alias("precision"),
        F.round(rec, round_dp).alias("recall"),
        F.round(f1, round_dp).alias("f1"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """Precision/recall at every quantized score cut, from ONE histogram
    pass: ``(cut, n_ge, tp, precision, recall)`` where ``cut`` is the
    bucket's inclusive lower bound in SCORE units (deploy as
    ``score >= cut``) and recall's denominator is derived from the same
    ≤ ``bins``-row frame — the corpus is scanned exactly once, and the
    descending-cumulative windows never see raw rows."""
    sc = _scored(df, score_col, label_col, bins, keep_cut=True)
    per = sc.groupBy(F.col("__s"), F.col("__cut").alias("cut")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(F.col("__y").cast("long")).alias("__p"),
    )
    w = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy(F.col("__s")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        per.withColumn("n_ge", F.sum("__c").over(w))
        .withColumn("tp", F.sum("__p").over(w))
        .withColumn("__npos", F.sum("__p").over(w_all))
    )
    return cum.select(
        "cut",
        "n_ge",
        "tp",
        F.round(F.col("tp") / F.col("n_ge"), round_dp).alias("precision"),
        F.when(
            F.col("__npos") > 0,
            F.round(F.col("tp") / F.col("__npos"), round_dp),
        ).alias("recall"),
    )

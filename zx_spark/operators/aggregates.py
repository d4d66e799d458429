"""Aggregate expressions A1-A9 with exact zx semantics (SURVEY §2.1, §2.5).

Reference: ``aggregate_window`` src/lib.rs:558-663. Every aggregate here is a
single Catalyst expression usable inside ``groupBy().agg(...)`` — JVM-side,
whole-stage-codegen'd, with map-side partial aggregation. No UDAFs needed.

Sample-rate semantics (reference src/lib.rs §2.5): a row with
``sample_rate = r`` stands for r original events (head-based sampling
compensation). SUM/COUNT/MEAN are weighted; MAX/MIN/COUNT_DISTINCT are
rate-invariant. Missing rate defaults to 1 (src/lib.rs:565, 615, 645).

Null conventions reproduced exactly:
- SUM: missing value contributes 0 (src/lib.rs:566-572)
- COUNT: counts only rows where the column is present (src/lib.rs:613-617)
- COUNT_DISTINCT: exact distinct +1 if any row lacks the column — NULL counts
  as one distinct value (src/lib.rs:624-636)
- MEAN: over present values only, weighted by integer-truncated rate
  (src/lib.rs:643-651)
- MAX/MIN on an all-missing window: f64::MIN / f64::MAX sentinels
  (src/lib.rs:578, 594) — behind ``empty_sentinels`` (default True for
  reference fidelity; pass False for SQL-friendly NULLs)

P50/RAW/HEATMAP are ``unimplemented!()`` in the reference (src/lib.rs:659-661);
implemented for real here (SURVEY §7 M2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from zx_spark.model import Aggregate, Select

F64_MIN = -1.7976931348623157e308
F64_MAX = 1.7976931348623157e308

# Default HEATMAP domain, used when Select.params doesn't override it.
HEATMAP_LO = 0.0
HEATMAP_HI = 1000.0
HEATMAP_BINS = 10


def _rate(rate_col: str | None) -> Column:
    if rate_col is None:
        return F.lit(1.0)
    return F.coalesce(F.col(f"`{rate_col}`").cast("double"), F.lit(1.0))


def agg_expr(
    sel: Select,
    rate_col: str | None = "sample_rate",
    empty_sentinels: bool = True,
) -> Column:
    """Build the aggregate Column for one Select; aliased to ``sel.alias``."""
    col = F.col(f"`{sel.column}`")
    x = col.cast("double")
    r = _rate(rate_col)
    a = sel.aggregate

    if a is Aggregate.SUM:
        expr = F.sum(F.coalesce(x, F.lit(0.0)) * r)
        expr = F.coalesce(expr, F.lit(0.0))
    elif a is Aggregate.MAX:
        expr = F.max(x)
        if empty_sentinels:
            expr = F.coalesce(expr, F.lit(F64_MIN))
    elif a is Aggregate.MIN:
        expr = F.min(x)
        if empty_sentinels:
            expr = F.coalesce(expr, F.lit(F64_MAX))
    elif a is Aggregate.COUNT:
        expr = F.sum(F.when(col.isNotNull(), r).otherwise(F.lit(0.0)))
        expr = F.coalesce(expr, F.lit(0.0))
    elif a is Aggregate.COUNT_DISTINCT:
        expr = (
            F.countDistinct(col)
            + F.max(F.when(col.isNull(), F.lit(1)).otherwise(F.lit(0)))
        ).cast("double")
    elif a is Aggregate.COUNT_DISTINCT_APPROX:
        # HLL++ sketch (rsd from params, default 5%): mergeable partial
        # aggregate, no exact-distinct shuffle — the 100 TB variant. Keeps
        # the reference's NULL-counts-as-one-distinct rule.
        rsd = float(sel.params[0]) if sel.params else 0.05
        expr = (
            F.approx_count_distinct(col, rsd)
            + F.max(F.when(col.isNull(), F.lit(1)).otherwise(F.lit(0)))
        ).cast("double")
    elif a is Aggregate.MEAN:
        # Reference parses the rate as isize for mean (src/lib.rs:643-646):
        # integer-truncate before weighting.
        ri = F.floor(r).cast("double")
        num = F.sum(F.when(x.isNotNull(), x * ri))
        den = F.sum(F.when(x.isNotNull(), ri))
        expr = num / den
    elif a is Aggregate.P50:
        expr = F.expr(f"percentile(cast(`{sel.column}` as double), 0.5)")
    elif a is Aggregate.P50_APPROX:
        # Mergeable sketch — the 100 TB path (exact percentile buffers
        # every value per group; the sketch is bounded-memory).
        expr = approx_quantiles(sel.column, [0.5])[0]
    elif a is Aggregate.QUANTILE_APPROX:
        if not sel.params or not 0.0 < float(sel.params[0]) < 1.0:
            raise ValueError(
                f"QUANTILE_APPROX needs params=(q, ...) with 0 < q < 1, "
                f"got {sel.params!r}"
            )
        if float(sel.params[0]) == 0.5:
            # q=0.5 would alias to 'p50_approx__<col>', colliding with
            # P50_APPROX on the same column — reject rather than emit
            # silent duplicate column names
            raise ValueError(
                "QUANTILE_APPROX with q=0.5 duplicates P50_APPROX's "
                "alias — use Aggregate.P50_APPROX instead"
            )
        expr = approx_quantiles(sel.column, [float(sel.params[0])])[0]
    elif a is Aggregate.RAW:
        expr = F.sort_array(F.collect_list(x))
    elif a is Aggregate.HEATMAP:
        lo, hi, bins = sel.params or (HEATMAP_LO, HEATMAP_HI, HEATMAP_BINS)
        if not (hi > lo and bins > 0):
            raise ValueError(f"bad heatmap domain ({lo}, {hi}, {bins})")
        expr = histogram(x, float(lo), float(hi), int(bins))
    else:
        raise ValueError(f"unknown aggregate {a}")
    return expr.alias(sel.alias)


def histogram(x: Column, lo: float, hi: float, bins: int) -> Column:
    """Deterministic equi-width histogram as an array of counts.

    One F.sum per bin — each is a plain partial-aggregatable expression, so
    this scales (unlike collect_list-then-bucket). Values outside [lo, hi)
    clamp into the edge bins. The reference's HEATMAP never ran
    (src/lib.rs:661); its intended output type was ``AggregateResult::List``
    (src/lib.rs:41), which this matches.
    """
    width = (hi - lo) / bins
    bucket = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    )
    return F.array(
        *[
            F.coalesce(
                F.sum(F.when(x.isNotNull() & (bucket == i), 1).otherwise(0)), F.lit(0)
            ).cast("double")
            for i in range(bins)
        ]
    )


def is_numeric_result(sel: Select) -> bool:
    """run_sorted keeps only Number-valued aggregates (src/lib.rs:746)."""
    return sel.aggregate not in (Aggregate.RAW, Aggregate.HEATMAP)


def approx_quantiles(column: str, probabilities: list[float], accuracy: int = 10000) -> Column:
    """Mergeable quantile sketch (percentile_approx) — the scale variant of
    exact P50 for 100 TB inputs."""
    probs = ", ".join(str(p) for p in probabilities)
    return F.expr(
        f"percentile_approx(cast(`{column}` as double), array({probs}), {accuracy})"
    )

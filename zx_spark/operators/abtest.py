"""A/B experiment statistics over event streams — Welch's t, the
two-proportion z, and a Catalyst-expressible normal tail.

The reference is an events engine; "did variant B move the metric?" is
the events question its aggregates stop one step short of. This module
finishes the step with textbook formulas (Welch 1947; the A&S 7.1.26
erf approximation) kept deliberately inside pure Catalyst so the whole
test — means, variances, statistic, p-value — is ANSI-SQL reproducible
and therefore driver-hash-verifiable.

Distributed shape: ONE filtered aggregation pass computes both arms'
(n, Σx, Σx²) with map-side combine — no shuffle beyond the single
grouped agg — then a broadcast single-row crossJoin shapes the
statistic (the stat-frame pattern of evaluate.py / datadrift.py).
Nothing is ever collected.

Determinism contract (same discipline as the weighted-aggregate arm):
float Σx/Σx² are order-dependent in general; quantize the metric to a
dyadic grid first (e.g. ``F.round(col*64)/64``) and both sums are
EXACT under any partial-agg order while Σx² stays below 2^53 (values
≤~1000 ⇒ safe beyond 500M rows). The p-value uses the NORMAL
approximation of the t tail — exact Student-t needs the incomplete
beta function, which no SQL engine exposes; at experiment-scale n the
difference is < 1e-3 and the Welch df is reported so callers can see
when the approximation is thin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Abramowitz & Stegun 7.1.26 constants — |error| <= 1.5e-7 over all x.
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erf_approx(x: Column) -> Column:
    """A&S 7.1.26 rational erf approximation as a pure Catalyst
    expression (|err| ≤ 1.5e-7). Written as an explicit Horner chain so
    an independent SQL re-derivation using the same literals produces
    bit-identical doubles."""
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_ERF_P) * ax)
    a1, a2, a3, a4, a5 = (F.lit(a) for a in _ERF_A)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    e = F.lit(1.0) - poly * F.exp(-(ax * ax))
    return F.when(x < 0, -e).otherwise(e)


def normal_p_two_sided(z: Column) -> Column:
    """Two-sided tail of the standard normal: p = 1 − erf(|z|/√2)."""
    return F.lit(1.0) - erf_approx(F.abs(z) / F.sqrt(F.lit(2.0)))


def _arm_stats(df: DataFrame, group_col: str, metric_col: str, label) -> DataFrame:
    g = F.col(f"`{group_col}`")
    x = F.col(f"`{metric_col}`").cast("double")
    return df.filter(g.eqNullSafe(F.lit(label)) & x.isNotNull()).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.coalesce(F.sum(x), F.lit(0.0)).alias("s"),
        F.coalesce(F.sum(x * x), F.lit(0.0)).alias("ss"),
    )


def welch_t_test(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """One row: ``(n_a, n_b, mean_a, mean_b, diff, t, df, p)``.

    Welch's unequal-variance t: t = (x̄_a − x̄_b) / √(s²_a/n_a + s²_b/n_b),
    df by Welch–Satterthwaite, p two-sided via the normal tail (see
    module note). Sample variance s² = (Σx² − (Σx)²/n)/(n−1); arms with
    n < 2 or zero pooled variance yield NULL t/p rather than a
    division error."""
    a = _arm_stats(df, group_col, metric_col, group_a).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("ss").alias("ss_a")
    )
    b = _arm_stats(df, group_col, metric_col, group_b).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("ss").alias("ss_b")
    )
    j = a.crossJoin(F.broadcast(b))  # two single-row stat frames
    mean_a = F.col("s_a") / F.col("n_a")
    mean_b = F.col("s_b") / F.col("n_b")
    var_a = (F.col("ss_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - F.lit(1.0)
    )
    var_b = (F.col("ss_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - F.lit(1.0)
    )
    va_n = var_a / F.col("n_a")
    vb_n = var_b / F.col("n_b")
    se2 = va_n + vb_n
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    t = F.when(ok, (mean_a - mean_b) / F.sqrt(se2))
    dof = F.when(
        ok,
        (se2 * se2)
        / (
            va_n * va_n / (F.col("n_a") - F.lit(1.0))
            + vb_n * vb_n / (F.col("n_b") - F.lit(1.0))
        ),
    )
    return j.select(
        F.col("n_a"),
        F.col("n_b"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        (mean_a - mean_b).alias("diff"),
        t.alias("t"),
        dof.alias("df"),
        F.when(ok, normal_p_two_sided(t)).alias("p"),
    )


def two_proportion_z_test(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """One row: ``(n_a, n_b, p_a, p_b, diff, z, p)`` for a boolean (or
    0/1) success column — the conversion-rate test. Pooled-variance z:
    z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)). Degenerate pools
    (all success / all failure / empty arm) yield NULL z/p."""
    g = F.col(f"`{group_col}`")
    y = F.col(f"`{success_col}`").cast("double")

    def arm(label, suffix):
        return df.filter(g.eqNullSafe(F.lit(label)) & y.isNotNull()).agg(
            F.count(F.lit(1)).cast("double").alias(f"n_{suffix}"),
            F.coalesce(F.sum(y), F.lit(0.0)).alias(f"k_{suffix}"),
        )

    j = arm(group_a, "a").crossJoin(F.broadcast(arm(group_b, "b")))
    p_a = F.col("k_a") / F.col("n_a")
    p_b = F.col("k_b") / F.col("n_b")
    pool = (F.col("k_a") + F.col("k_b")) / (F.col("n_a") + F.col("n_b"))
    se2 = pool * (F.lit(1.0) - pool) * (
        F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b")
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se2 > 0)
    z = F.when(ok, (p_a - p_b) / F.sqrt(se2))
    return j.select(
        F.col("n_a"),
        F.col("n_b"),
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        (p_a - p_b).alias("diff"),
        z.alias("z"),
        F.when(ok, normal_p_two_sided(z)).alias("p"),
    )

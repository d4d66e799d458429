"""Derived time-series operators — the PromQL/observability verbs a
dashboard runs over windowed aggregates: delta, counter-reset-aware
increase, per-second rate, moving average.

Beyond-reference in the reference's own domain (its engine stops at the
windowed aggregate, src/lib.rs:693-718; every monitoring stack then
derives rates client-side). All pure window functions over
(group, bucket) — one shuffle+sort on the group key, JVM only, and each
verb composes with ``gapfill`` (fill first, derive second, so a gap
doesn't masquerade as a counter reset).

Semantics follow the PromQL conventions:

- ``series_delta``  — ``v − lag(v)``; NULL at each group's first bucket
  and across NULL neighbors (a gap yields no delta, not a zero).
- ``counter_increase`` — delta, except a DECREASE means the counter
  reset and the increase since reset is the current value itself.
- ``counter_rate`` — increase / elapsed seconds between the two
  samples; per-second like PromQL ``rate``, adjacent-sample like
  ``irate`` (range-window extrapolation belongs to the query layer).
- ``moving_avg`` — mean over the trailing ``n`` buckets (row-based).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _w(group_cols: list[str] | None, order_col: str):
    return W.partitionBy(*(group_cols or [F.lit(1)])).orderBy(F.col(f"`{order_col}`"))


def series_delta(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    w = _w(group_cols, order_col)
    v = F.col(f"`{value_col}`").cast("double")
    return df.withColumn(out_col or f"{value_col}_delta", v - F.lag(v).over(w))


def counter_increase(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    w = _w(group_cols, order_col)
    v = F.col(f"`{value_col}`").cast("double")
    prev = F.lag(v).over(w)
    inc = F.when(prev.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(v >= prev, v - prev).otherwise(v)  # decrease == counter reset
    )
    return df.withColumn(out_col or f"{value_col}_increase", inc)


def counter_rate(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Per-second rate between adjacent samples; ``order_col`` must be
    unix seconds (e.g. a gapfill bucket)."""
    w = _w(group_cols, order_col)
    v = F.col(f"`{value_col}`").cast("double")
    t = F.col(f"`{order_col}`").cast("double")
    prev, prev_t = F.lag(v).over(w), F.lag(t).over(w)
    inc = F.when(v >= prev, v - prev).otherwise(v)
    rate = F.when(
        prev.isNull() | prev_t.isNull() | (t <= prev_t),
        F.lit(None).cast("double"),
    ).otherwise(inc / (t - prev_t))
    return df.withColumn(out_col or f"{value_col}_rate", rate)


def moving_avg(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    n: int = 5,
    out_col: str | None = None,
) -> DataFrame:
    """Trailing-``n``-bucket mean (row-based, NULLs ignored like SQL
    AVG) — the dashboard smoothing verb."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = _w(group_cols, order_col).rowsBetween(-(n - 1), W.currentRow)
    v = F.col(f"`{value_col}`").cast("double")
    return df.withColumn(out_col or f"{value_col}_ma{n}", F.avg(v).over(w))


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    n: int = 20,
    out_col: str | None = None,
) -> DataFrame:
    """How many trailing-window standard deviations the current sample
    sits from the trailing mean — the standard streaming anomaly score.
    The window EXCLUDES the current row (a spike must not raise the
    baseline it is judged against); NULL until the trailing window has
    two samples or while its stddev is zero (a first-ever change on a
    flat series is flagged by ``flag_anomalies``' ``min_periods``
    instead of dividing by zero)."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = _w(group_cols, order_col).rowsBetween(-n, -1)
    v = F.col(f"`{value_col}`").cast("double")
    mu, sd = F.avg(v).over(w), F.stddev_samp(v).over(w)
    return df.withColumn(
        out_col or f"{value_col}_zscore",
        F.when(sd > 0, (v - mu) / sd),
    )


def flag_anomalies(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    n: int = 20,
    threshold: float = 3.0,
    min_periods: int = 3,
    out_col: str = "is_anomaly",
) -> DataFrame:
    """Boolean anomaly flag: |rolling z-score| > ``threshold`` with at
    least ``min_periods`` trailing samples (early buckets never flag).
    One window pass, JVM only — runs inline on a gap-filled series at
    scan speed."""
    w = _w(group_cols, order_col).rowsBetween(-n, -1)
    v = F.col(f"`{value_col}`").cast("double")
    scored = rolling_zscore(df, value_col, order_col, group_cols, n, "__z")
    scored = scored.withColumn("__cnt", F.count(v).over(w))
    return (
        scored.withColumn(
            out_col,
            F.coalesce(
                (F.abs(F.col("__z")) > threshold) & (F.col("__cnt") >= min_periods),
                F.lit(False),
            ),
        )
        .drop("__z", "__cnt")
    )


def ewma(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.3,
    n: int = 50,
    out_col: str | None = None,
) -> DataFrame:
    """Exponentially weighted moving average (the dashboard smoothing
    verb with recency bias): the ADJUSTED form
    ``y_t = Σ_j (1-α)^j x_{t-j} / Σ_j (1-α)^j`` over the trailing ``n``
    ROWS (NULLs inside the frame are skipped, so a gappy series
    averages fewer than ``n`` samples). Truncating the frame at ``n``
    rows bounds memory and, when the frame is full of samples, loses at
    most ``(1-α)^n`` of the weight mass (< 1e-7 at the defaults; a
    frame with k < n samples loses ``(1-α)^k``) — the exact recursive
    EWMA is order-sequential and does not parallelize; this form is one
    window pass + an O(n) JVM fold per row, no Python. NULL until the
    trailing frame has a sample."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = _w(group_cols, order_col).rowsBetween(-(n - 1), W.currentRow)
    v = F.col(f"`{value_col}`").cast("double")
    # collect_list over an ordered frame preserves frame order and
    # skips NULLs; reverse -> newest first, weights decay with age
    vals = F.reverse(F.collect_list(v).over(w))
    acc = F.aggregate(
        vals,
        F.struct(
            F.lit(0.0).alias("num"), F.lit(0.0).alias("den"), F.lit(1.0).alias("w")
        ),
        lambda a, x: F.struct(
            (a["num"] + a["w"] * x).alias("num"),
            (a["den"] + a["w"]).alias("den"),
            (a["w"] * (1.0 - alpha)).alias("w"),
        ),
        lambda a: F.when(a["den"] > 0, a["num"] / a["den"]),
    )
    return df.withColumn(out_col or f"{value_col}_ewma", acc)


def rolling_quantile(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    q: float = 0.5,
    n: int = 20,
    out_col: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Trailing-``n``-bucket quantile (rolling median at the default) —
    the robust baseline for noisy series. ``exact=True`` uses
    ``percentile`` (buffers the n-row frame — n is small by
    construction); ``exact=False`` uses the ``percentile_approx``
    sketch, the choice for large ``n``. One window pass, JVM only."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = _w(group_cols, order_col).rowsBetween(-(n - 1), W.currentRow)
    fn = "percentile" if exact else "percentile_approx"
    expr = F.expr(f"{fn}(cast(`{value_col}` as double), {q})")
    return df.withColumn(out_col or f"{value_col}_q{q:g}".replace(".", "_"),
                         expr.over(w))


def robust_zscore(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    n: int = 20,
    out_col: str | None = None,
) -> DataFrame:
    """Outlier-robust anomaly score: (x − median) / (1.4826 · MAD) over
    the trailing window EXCLUDING the current row — unlike the
    mean/stddev ``rolling_zscore``, a single earlier spike cannot
    inflate the denominator and mask the next one. NULL while the
    window has < 2 samples or zero MAD (flat window). Two window
    passes (median of values, then median of |x − med|), JVM only."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = _w(group_cols, order_col).rowsBetween(-n, -1)
    v = F.col(f"`{value_col}`").cast("double")
    med = F.expr(f"percentile(cast(`{value_col}` as double), 0.5)").over(w)
    df = df.withColumn("__rz_med", med)
    dev_med = F.expr("percentile(abs(cast(`__rz_dev` as double)), 0.5)")
    df = df.withColumn("__rz_dev", v - F.col("__rz_med"))
    # MAD needs the median of |x - med_t| for the TRAILING values with
    # the CURRENT row's med — that is not a plain window over a stored
    # column. Standard practical form (used by most monitoring stacks):
    # MAD over the trailing window of each row's own deviation from its
    # trailing median — one extra window pass, self-consistent, robust.
    mad = dev_med.over(w)
    out = df.withColumn(
        out_col or f"{value_col}_rzscore",
        F.when(mad > 0, (v - F.col("__rz_med")) / (F.lit(1.4826) * mad)),
    )
    return out.drop("__rz_med", "__rz_dev")


def cusum_flags(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    target: float = 0.0,
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM change-point detection (Page 1954) per group:

    ``S⁺_t = max(0, S⁺_{t-1} + (x_t − target) − k)``
    ``S⁻_t = max(0, S⁻_{t-1} − (x_t − target) − k)``

    appended as ``<v>_cusum_hi`` / ``<v>_cusum_lo`` / ``<v>_cusum_flag``
    (flag when either side exceeds ``h``). The recurrence accumulates
    small persistent shifts a per-bucket z-score never sees — the
    standard drift alarm on metric series. Feed standardized values
    (robust_zscore) and keep the textbook k≈0.5σ, h≈4-5σ.

    Distributed shape: the recurrence is inherently sequential IN t, so
    it runs AFTER aggregation over the per-group BUCKET series — one
    collect_list per group (state ∝ series length = time-range /
    granularity, never raw events), an in-row JVM fold (interpreted
    higher-order expression — bounded by the same series length, the
    deliberate trade documented for ewma), and a posexplode back to
    rows. NULL values hold both sums (no evidence either way), matching
    the recursive-CTE oracle.
    """
    gcols = list(group_cols or [])
    v = F.col(f"`{value_col}`").cast("double")
    o = F.col(f"`{order_col}`").cast("double")
    other = [
        c for c in df.columns
        if c not in gcols and c != order_col and c != value_col
    ]
    packed = df.groupBy(*[F.col(f"`{c}`") for c in gcols]).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    o.alias("o"),
                    v.alias("v"),
                    F.struct(*[F.col(f"`{c}`") for c in other]).alias("rest"),
                )
            )
        ).alias("__s")
    )
    elem_t = (
        "array<struct<o:double,v:double,sp:double,sm:double>>"
    )
    folded = F.aggregate(
        F.col("__s"),
        F.struct(
            F.lit(0.0).alias("sp"),
            F.lit(0.0).alias("sm"),
            F.expr(f"cast(array() as {elem_t})").alias("out"),
        ),
        lambda a, x: F.struct(
            F.when(
                x["v"].isNotNull(),
                F.greatest(F.lit(0.0), a["sp"] + (x["v"] - F.lit(target)) - F.lit(k)),
            ).otherwise(a["sp"]).alias("sp"),
            F.when(
                x["v"].isNotNull(),
                F.greatest(F.lit(0.0), a["sm"] - (x["v"] - F.lit(target)) - F.lit(k)),
            ).otherwise(a["sm"]).alias("sm"),
            F.array_append(
                a["out"],
                F.struct(
                    x["o"].alias("o"),
                    x["v"].alias("v"),
                    F.when(
                        x["v"].isNotNull(),
                        F.greatest(
                            F.lit(0.0), a["sp"] + (x["v"] - F.lit(target)) - F.lit(k)
                        ),
                    ).otherwise(a["sp"]).alias("sp"),
                    F.when(
                        x["v"].isNotNull(),
                        F.greatest(
                            F.lit(0.0), a["sm"] - (x["v"] - F.lit(target)) - F.lit(k)
                        ),
                    ).otherwise(a["sm"]).alias("sm"),
                ),
            ).alias("out"),
        ),
        lambda a: a["out"],
    )
    # re-pair the fold output (o, sp, sm) with the original packed rows
    # positionally — same array, same order
    out = packed.select(
        *[F.col(f"`{c}`") for c in gcols],
        F.posexplode(F.arrays_zip(F.col("__s"), folded)).alias("__p", "__z"),
    ).select(
        *[F.col(f"`{c}`") for c in gcols],
        F.col("__z")["__s"]["o"].alias(order_col),
        F.col("__z")["__s"]["v"].alias(value_col),
        F.col("__z")["__s"]["rest"].alias("__rest"),
        F.col("__z")["1"]["sp"].alias(f"{value_col}_cusum_hi"),
        F.col("__z")["1"]["sm"].alias(f"{value_col}_cusum_lo"),
        (
            (F.col("__z")["1"]["sp"] > F.lit(h))
            | (F.col("__z")["1"]["sm"] > F.lit(h))
        ).alias(f"{value_col}_cusum_flag"),
    )
    for c in other:
        out = out.withColumn(c, F.col("__rest")[c])
    return out.drop("__rest")

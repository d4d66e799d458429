"""Conversion attribution — which touch gets credit for a conversion.

The marketing-analytics verb next to funnel.py (did users convert) and
paths.py (how they moved): for every conversion event, find the user's
touch events inside a lookback window and assign credit by the
standard models — ``last_touch`` / ``first_touch`` (the nearest /
earliest qualifying touch gets 1.0) and ``linear`` (the k qualifying
touches split 1/k each).

Distributed shape (what survives 100 TB):

- ONE user-keyed shuffle over ONLY the touch and conversion rows (all
  other event types are filtered before the window). Last-touch is a
  running MAX over a (ts, id, channel) struct — O(1) window state.
  First-touch/linear collect touch structs over a RANGE frame bounded
  by the lookback window itself (state ∝ the user's touches within
  ``window_s``, NOT their full history), with the strict (ts, id)
  before-order imposed in-row; ``max_touches`` additionally caps the
  per-conversion list (newest kept) — never a conversions×touches
  join.
- ONE time domain: every window comparison (the RANGE frame, the
  in-array strictly-before filter, the last-touch lookback check) runs
  on the same microsecond longs (``__tm``). TimestampType inputs take
  ``unix_micros`` — the raw stored µs, EXACT for any date, no double
  round-trip. Numeric-seconds inputs take ``round(x·1e6)``, which
  recovers the µs grid the seconds-as-double representation perturbs
  (0.7s → 699999.99...; truncation would drop a boundary touch from
  first/linear that last-touch's double math kept) — exact while the
  µs value stays below ~2^51 (two roundings, each up to 0.25µs of
  combined error budget; epoch seconds are safe through ~2041, after
  which pass timestamps, not doubles). Lag statistics subtract the
  same ``__tm`` longs (exposed as ``conv_tm``/``touch_tm``), so they
  inherit the same exactness.
- Credit aggregation is a tiny (channel[, k]) hash agg.
- Determinism: every emitted count is an integer; the fractional 1/k
  linear credit is derived ON the small (channel, k) frame
  (``linear_credit``), so the big pass never sums order-sensitive
  floats.

Reference scope note: the reference engine (src/lib.rs) has no
sequence surface; beyond-reference, next to funnel.py / paths.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def micros_col(df: DataFrame, ts_col: str):
    """Microsecond longs — the ONE time domain every attribution window
    comparison (batch AND streaming) runs in: ``unix_micros`` for
    TimestampType (the stored µs, exact for any date);
    ``round(x·1e6)`` for numeric-seconds inputs (exact below ~2^51 µs
    — module docstring). Shared so the two operators cannot drift."""
    tcol = F.col(f"`{ts_col}`")
    if isinstance(df.schema[ts_col].dataType, T.TimestampType):
        return F.unix_micros(tcol)
    return F.round(tcol.cast("double") * F.lit(1e6)).cast("long")


def _prep(df, user_col, ts_col, id_col):
    tcol = F.col(f"`{ts_col}`")
    return df.filter(
        F.col(f"`{user_col}`").isNotNull() & tcol.isNotNull()
    ).select(
        F.col(f"`{user_col}`").alias("__u"),
        tcol.cast("double").alias("__t"),
        F.col(f"`{id_col}`").cast("long").alias("__i"),
        micros_col(df, ts_col).alias("__tm"),
        "*",
    )


def attributed_conversions(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    window_s: float = 86400.0,
    model: str = "last_touch",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_touches: int = 1000,
) -> DataFrame:
    """Per-conversion attribution rows.

    ``last_touch`` / ``first_touch`` → one row per ATTRIBUTED
    conversion: ``(user, conv_id, conv_ts, channel)`` — the nearest /
    earliest touch within ``window_s`` strictly before the conversion
    ((ts, id) order breaks timestamp ties deterministically).
    Conversions with no qualifying touch are absent (unattributed).

    ``linear`` → one row per (conversion, qualifying touch):
    ``(user, conv_id, conv_ts, channel, k)`` with ``k`` the
    conversion's qualifying-touch count — integer rows; divide by k
    downstream (``linear_credit`` does this on the small frame).

    ``position`` → the linear rows plus ``pos`` (the touch's 0-based
    index in the conversion's (ts, id)-ordered qualifying list) — the
    raw material for position-based (U-shaped) credit, which needs to
    know WHICH touch was first/last/middle. Integer rows; the 40/40/20
    weights are applied downstream on the small frame
    (``position_credit``).
    """
    if model not in ("last_touch", "first_touch", "linear", "position"):
        raise ValueError(f"unknown model: {model!r}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    e = _prep(df, user_col, ts_col, id_col)
    tc = F.col(f"`{type_col}`")
    is_touch = tc.isin(list(touch_types))
    is_conv = tc == F.lit(conversion_type)
    # only touches and conversions matter — drop everything else BEFORE
    # the user shuffle and window state
    e = e.filter(is_touch | is_conv)
    # ONE time domain for every window comparison: the µs longs __tm
    # from _prep (unix_micros for timestamps — exact; rounded for
    # numeric seconds), so the RANGE frame, the strictly-before filter,
    # and the last-touch lookback check all agree at the window
    # boundary (see module docstring).
    window_us = int(round(float(window_s) * 1e6))
    touch_struct = F.when(
        is_touch,
        F.struct(F.col("__tm"), F.col("__i"), tc.alias("__ch"), F.col("__t")),
    )
    w = (
        Window.partitionBy("__u")
        .orderBy("__tm", "__i")
        .rowsBetween(Window.unboundedPreceding, -1)  # strictly before
    )
    # the collected frame is RANGE-bounded by the lookback itself, so
    # per-row state is the user's in-window touches, never their whole
    # history; the strict (ts, id) before-order (ties included by the
    # range frame) is imposed in-row. rangeBetween takes LONGS, so the
    # order key is the same rounded microseconds.
    wr = (
        Window.partitionBy("__u")
        .orderBy("__tm")
        .rangeBetween(-window_us, 0)
    )
    touches = F.filter(
        F.collect_list(touch_struct).over(wr),
        lambda s: (s["__tm"] < F.col("__tm"))
        | ((s["__tm"] == F.col("__tm")) & (s["__i"] < F.col("__i"))),
    )
    if model == "last_touch":
        # running MAX is O(1) window state and needs no array: if the
        # latest preceding touch is outside the window, so is every
        # earlier one — the in-window check composes with max
        out = (
            e.withColumn("__tt", F.max(touch_struct).over(w))
            .filter(
                is_conv
                & F.col("__tt").isNotNull()
                & (F.col("__tm") - F.col("__tt.__tm") <= F.lit(window_us))
            )
            .select(
                F.col("__u").alias("user"),
                F.col("__i").alias("conv_id"),
                F.col("__t").alias("conv_ts"),
                F.col("__tt.__ch").alias("channel"),
                F.col("__tt.__t").alias("touch_ts"),
                F.col("__tm").alias("conv_tm"),
                F.col("__tt.__tm").alias("touch_tm"),
            )
        )
        return out
    if model == "first_touch":
        # the globally earliest touch may fall OUTSIDE the window while
        # a later one qualifies — running MIN does not compose with the
        # in-window check, so first-touch reads the windowed array;
        # array_min picks the (ts, id)-earliest element regardless of
        # the range frame's tie order
        return (
            e.withColumn("__ts", touches)
            .filter(is_conv & (F.size("__ts") > 0))
            .select(
                F.col("__u").alias("user"),
                F.col("__i").alias("conv_id"),
                F.col("__t").alias("conv_ts"),
                F.array_min("__ts")["__ch"].alias("channel"),
                F.array_min("__ts")["__t"].alias("touch_ts"),
                F.col("__tm").alias("conv_tm"),
                F.array_min("__ts")["__tm"].alias("touch_tm"),
            )
        )
    base_rows = (
        # sorted so the newest-K slice is deterministic whatever order
        # the range frame collected equal-ts elements in
        e.withColumn("__all", F.array_sort(touches))
        .withColumn(
            "__ts",
            # newest-K cap; a negative slice start beyond the array
            # length is not defined as "whole array", so guard on size
            F.when(
                F.size("__all") <= F.lit(max_touches), F.col("__all")
            ).otherwise(F.slice("__all", -max_touches, max_touches)),
        )
        .filter(is_conv & (F.size("__ts") > 0))
        .select(
            F.col("__u").alias("user"),
            F.col("__i").alias("conv_id"),
            F.col("__t").alias("conv_ts"),
            F.col("__tm").alias("conv_tm"),
            F.size("__ts").alias("k"),
            F.posexplode("__ts").alias("pos", "__tch"),
        )
        .select(
            "user",
            "conv_id",
            "conv_ts",
            F.col("__tch.__ch").alias("channel"),
            F.col("__tch.__t").alias("touch_ts"),
            "conv_tm",
            F.col("__tch.__tm").alias("touch_tm"),
            "k",
            "pos",
        )
    )
    if model == "position":
        return base_rows
    return base_rows.drop("pos")


def attribution_report(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    window_s: float = 86400.0,
    model: str = "last_touch",
    **kw,
) -> DataFrame:
    """Per-channel totals. last/first touch → ``(channel,
    conversions)``. linear → ``(channel, k, touches)`` integer rows —
    feed ``linear_credit`` for the fractional rollup. For the
    position-based grid use ``position_report`` (it needs the role
    split this report would collapse)."""
    if model == "position":
        raise ValueError(
            "use position_report for the position-based model (the "
            "per-channel report needs the first/last/middle role split)"
        )
    rows = attributed_conversions(
        df, touch_types, conversion_type, window_s, model, **kw
    )
    if model in ("last_touch", "first_touch"):
        return rows.groupBy("channel").agg(
            F.count(F.lit(1)).alias("conversions")
        )
    return rows.groupBy("channel", "k").agg(F.count(F.lit(1)).alias("touches"))


def position_report(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    window_s: float = 86400.0,
    **kw,
) -> DataFrame:
    """Position-based (U-shaped) attribution, integer phase:
    ``(channel, role, k, touches)`` where ``role`` is the touch's slot
    in the conversion's (ts, id)-ordered qualifying list — ``first``,
    ``last`` or ``middle`` (a k=1 touch is ``first``). Pure counts —
    the 40/40/20 weights are applied by ``position_credit`` on this
    tiny frame, so the corpus-sized pass never sums floats (the same
    integer-rows discipline as the linear model). Note the list is the
    ``max_touches``-capped one (newest kept): with the default cap of
    1000 this is the full qualifying list for any realistic journey."""
    rows = attributed_conversions(
        df, touch_types, conversion_type, window_s, "position", **kw
    )
    role = (
        F.when(F.col("pos") == 0, F.lit("first"))
        .when(F.col("pos") == F.col("k") - 1, F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    return rows.groupBy("channel", role.alias("role"), "k").agg(
        F.count(F.lit(1)).alias("touches")
    )


def position_credit(
    report: DataFrame, w_first: float = 0.4, w_last: float = 0.4
) -> DataFrame:
    """(channel, role, k, touches) → (channel, credit): the U-shaped
    40/40/20 rollup on the tiny grouped frame. Weights: k=1 → 1.0;
    k=2 → the first/last weights renormalized over just the two ends
    (0.5/0.5 at the defaults); k>=3 → ``w_first``/``w_last`` at the
    ends and ``(1 − w_first − w_last)/(k−2)`` per middle touch.
    Rounded 6dp."""
    if not (0.0 < w_first < 1.0 and 0.0 < w_last < 1.0 and w_first + w_last < 1.0):
        raise ValueError(
            f"need 0 < w_first, w_last and w_first + w_last < 1, "
            f"got {w_first}, {w_last}"
        )
    k = F.col("k")
    ends = F.lit(w_first) + F.lit(w_last)
    w = (
        F.when(k == 1, F.lit(1.0))
        .when(
            F.col("role") == "first",
            F.when(k == 2, F.lit(w_first) / ends).otherwise(F.lit(w_first)),
        )
        .when(
            F.col("role") == "last",
            F.when(k == 2, F.lit(w_last) / ends).otherwise(F.lit(w_last)),
        )
        .otherwise((F.lit(1.0) - ends) / (k - F.lit(2)))
    )
    return (
        report.withColumn("__c", F.col("touches") * w)
        .groupBy("channel")
        .agg(F.round(F.sum("__c"), 6).alias("credit"))
    )


def decay_report(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    window_s: float = 86400.0,
    half_life_s: float = 604800.0,
    **kw,
) -> DataFrame:
    """Time-decay attribution, integer phase: ``(channel, decay_k,
    touches)`` where ``decay_k = floor(lag_us / half_life_us)`` — the
    touch's age at conversion in whole half-lives, computed in the
    rounded-µs long domain (exact). Pure counts; ``decay_credit``
    applies the ``2^-decay_k`` halving weights on this tiny frame.
    This is the UNNORMALIZED time-decay variant (each touch earns its
    decayed weight independently; channel credit = Σ 2^-k). The
    per-conversion-normalized variant divides by the conversion's
    weight total — a per-conversion float, deliberately not emitted
    from the big pass; derive it from ``attributed_conversions(model=
    'linear')`` rows when needed. Note the qualifying list is the
    ``max_touches``-capped one (newest kept, inherited from the linear
    model): with the default cap of 1000 this is the full qualifying
    list for any realistic journey."""
    hl_us = int(round(float(half_life_s) * 1e6))
    if hl_us < 1:
        # a sub-µs half-life would integer-divide by zero below —
        # NULL buckets under non-ANSI semantics, a runtime error under
        # ANSI; neither is the fail-fast this guard owes
        raise ValueError(
            f"half_life_s must be >= 1 microsecond, got {half_life_s}"
        )
    rows = attributed_conversions(
        df, touch_types, conversion_type, window_s, "linear", **kw
    )
    return (
        # lag from the exact µs longs the window math used; integer
        # `div`, not a double division + cast: exact for any long lag
        # (the packing.py pack-id discipline — doubles lose integers
        # past 2^53)
        rows.select(
            "channel", (F.col("conv_tm") - F.col("touch_tm")).alias("__lag")
        )
        .select("channel", F.expr(f"__lag div {hl_us}").alias("decay_k"))
        .groupBy("channel", "decay_k")
        .agg(F.count(F.lit(1)).alias("touches"))
    )


def decay_credit(report: DataFrame) -> DataFrame:
    """(channel, decay_k, touches) → (channel, credit): Σ touches ·
    2^-decay_k on the tiny grouped frame. 2^-k is an exact dyadic
    double for any k in range, so the only rounding is the final 6dp."""
    return (
        report.withColumn(
            "__c", F.col("touches") * F.pow(F.lit(2.0), -F.col("decay_k"))
        )
        .groupBy("channel")
        .agg(F.round(F.sum("__c"), 6).alias("credit"))
    )


def linear_credit(report: DataFrame) -> DataFrame:
    """(channel, k, touches) → (channel, credit): Σ touches/k, computed
    on the tiny grouped frame (k-distinct rows per channel) so the
    corpus-sized pass stayed integer-only. Rounded 6dp."""
    return (
        report.withColumn("__c", F.col("touches") / F.col("k"))
        .groupBy("channel")
        .agg(F.round(F.sum("__c"), 6).alias("credit"))
    )


def conversion_lag_stats(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    window_s: float = 86400.0,
    model: str = "last_touch",
    **kw,
) -> DataFrame:
    """Per-channel time-to-convert: ``(channel, conversions,
    mean_lag_us, p50_lag_us)`` — how long after the (attributed) touch
    the conversion landed. Lags are INTEGER microseconds — the same
    ``__tm`` longs the window math ran on (``conv_tm − touch_tm``) —
    so the sum behind the mean is exact under any aggregation order
    and the exact median's midpoint interpolation is engine-identical;
    no rounding discipline needed. One extra tiny agg over the
    attribution rows; the heavy pass is unchanged.

    ``model`` must be ``last_touch`` or ``first_touch``: under
    ``linear`` the attribution rows are one per (conversion, touch),
    so a per-channel count would be attributed TOUCHES and the lag
    stats touch-weighted — a different statistic; raise instead of
    mislabeling it."""
    if model in ("linear", "position"):
        raise ValueError(
            "conversion_lag_stats needs one row per conversion; "
            f"model={model!r} emits one row per (conversion, touch) so the "
            "stats would be touch-weighted — use last_touch/first_touch"
        )
    rows = attributed_conversions(
        df, touch_types, conversion_type, window_s, model, **kw
    )
    return (
        rows.withColumn("__lag", F.col("conv_tm") - F.col("touch_tm"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            (F.sum("__lag") / F.count(F.lit(1))).alias("mean_lag_us"),
            F.expr("percentile(__lag, 0.5)").alias("p50_lag_us"),
        )
    )

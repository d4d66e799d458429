"""Time-bucket gap-filling — emit EVERY bucket in a range, not just the
ones with data, with null / zero / locf / linear fills.

Beyond-reference operator in the reference's own domain: its windowed
aggregates (src/lib.rs:693-718) only emit buckets that contain events, so
a dashboard query over a sparse series silently skips time — the classic
observability fix is `time_bucket_gapfill` (TimescaleDB) / `FILL()`
(InfluxQL). This is that, Spark-first.

Plan shape, built for scale:

- The bucket spine is GENERATED, never scanned: one tiny per-group
  aggregate finds each group's [lo, hi] bucket range (or an explicit
  global range), then ``explode(sequence(...))`` materializes bucket ids
  distributed across the cluster — no driver-side loop, no range table on
  the driver.
- The spine joins the aggregated frame on (group, bucket) — an equi-join
  whose left side is groups × buckets rows, orders of magnitude smaller
  than the events that produced the aggregate.
- locf / linear fills are window functions over (group, bucket) — one
  shuffle+sort on the group key, all JVM, no Python.
- A ``max_buckets`` guard refuses pathological spines (a mis-typed
  granularity over a year of nanos would otherwise OOM the join).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

FILL_MODES = ("null", "zero", "locf", "linear")


def gapfill(
    df: DataFrame,
    bucket_col: str,
    granularity_s: float,
    group_cols: list[str] | None = None,
    fills: dict[str, str] | None = None,
    start: float | None = None,
    end: float | None = None,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Fill missing time buckets in an aggregated frame.

    ``df`` has one row per (group, bucket) — e.g. ``compile_query``
    output with ``bucket_col="window_start"`` — where ``bucket_col``
    holds the bucket start in unix seconds, a multiple of
    ``granularity_s``. ``fills`` maps value columns to a fill mode:

      null   -> emit the bucket, leave the value NULL
      zero   -> NULL -> 0.0
      locf   -> last observation carried forward (NULL before the first)
      linear -> interpolate between nearest observed neighbors (NULL
                outside the observed range, matching time_bucket_gapfill)

    Columns not named in ``fills`` are carried as-is (NULL on generated
    rows). The spine spans each group's own [min, max] bucket, or the
    explicit global ``[start, end]`` when given (both inclusive,
    snapped to bucket multiples).
    """
    group_cols = list(group_cols or [])
    fills = dict(fills or {})
    g = float(granularity_s)
    if g <= 0:
        raise ValueError(f"granularity must be positive, got {granularity_s}s")
    for c, mode in fills.items():
        if mode not in FILL_MODES:
            raise ValueError(f"unknown fill mode {mode!r} for {c!r} (use {FILL_MODES})")
        if c not in df.columns:
            raise ValueError(f"fill column {c!r} not in {df.columns}")
    if (start is None) != (end is None):
        raise ValueError("give both start and end, or neither (per-group span)")

    b = F.col(f"`{bucket_col}`").cast("double")
    # Work in integer bucket numbers (bucket / g) so sequence() steps by
    # exactly 1 — no float-accumulation drift over long spans.
    if start is not None:
        if end < start:
            raise ValueError(f"end {end} < start {start}")
        lo_n = int(math.floor(start / g))
        hi_n = int(math.floor(end / g))
        if hi_n - lo_n + 1 > max_buckets:
            raise ValueError(
                f"spine of {hi_n - lo_n + 1} buckets exceeds max_buckets="
                f"{max_buckets}; coarsen the granularity or narrow the range"
            )
        spine = (
            df.select(*group_cols).distinct()
            if group_cols
            else df.sparkSession.range(1).select()
        )
        spine = spine.withColumn("__lo_n", F.lit(lo_n)).withColumn(
            "__hi_n", F.lit(hi_n)
        )
    else:
        # localCheckpoint the spine aggregate (groups × 2 longs): the
        # guard below AND the join spine both read it, so the caller's
        # upstream pipeline executes once per gapfill call instead of
        # once for the guard and again for the join — a full redundant
        # input pass at any scale (r14).
        spine = df.groupBy(*group_cols).agg(
            F.floor(F.min(b) / g).cast("long").alias("__lo_n"),
            F.floor(F.max(b) / g).cast("long").alias("__hi_n"),
        ).localCheckpoint()
        # Executor-side guard (one tiny scan over the checkpointed spine
        # aggregate), so a bad span fails before the explode.
        worst = spine.select(
            F.max(F.col("__hi_n") - F.col("__lo_n") + 1).alias("n")
        ).first()["n"]
        if worst is not None and worst > max_buckets:
            raise ValueError(
                f"spine of {worst} buckets exceeds max_buckets={max_buckets}; "
                "coarsen the granularity or narrow the range"
            )

    spine = spine.select(
        *group_cols,
        F.explode(F.sequence(F.col("__lo_n"), F.col("__hi_n"))).alias("__n"),
    ).select(
        *group_cols, (F.col("__n") * g).cast("double").alias(bucket_col)
    )
    # merge hint: both sides are grid-sized (groups × buckets — the
    # observed aggregate is a subset of the spine), which grows without
    # bound at fine granularities over long ranges; the agg side's
    # estimate can land under the broadcast threshold and ship the whole
    # observed grid (SCALE.md r12 class). Sort-merge spills, and the
    # window functions below need a (group, bucket) sort anyway.
    filled = spine.join(df.hint("merge"), on=[*group_cols, bucket_col], how="left")

    order = W.partitionBy(*(group_cols or [F.lit(1)])).orderBy(bucket_col)
    behind = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    ahead = order.rowsBetween(W.currentRow, W.unboundedFollowing)
    for c, mode in fills.items():
        x = F.col(f"`{c}`").cast("double")
        if mode == "zero":
            filled = filled.withColumn(c, F.coalesce(x, F.lit(0.0)))
        elif mode == "locf":
            filled = filled.withColumn(c, F.last(x, ignorenulls=True).over(behind))
        elif mode == "linear":
            bb = F.col(f"`{bucket_col}`").cast("double")
            prev_v = F.last(x, ignorenulls=True).over(behind)
            prev_b = F.last(
                F.when(x.isNotNull(), bb), ignorenulls=True
            ).over(behind)
            next_v = F.first(x, ignorenulls=True).over(ahead)
            next_b = F.first(
                F.when(x.isNotNull(), bb), ignorenulls=True
            ).over(ahead)
            # Ratio first: (Δb / span) rounds to the same double as the
            # bucket-number ratio, keeping the result bit-identical to an
            # engine working in bucket numbers (the scaled product would
            # differ by an ulp).
            lerp = prev_v + (next_v - prev_v) * ((bb - prev_b) / (next_b - prev_b))
            filled = filled.withColumn(
                c,
                F.when(x.isNotNull(), x).otherwise(
                    F.when(prev_b.isNotNull() & next_b.isNotNull(), lerp)
                ),
            )
        # "null": the left join already produced the NULL.
    return filled

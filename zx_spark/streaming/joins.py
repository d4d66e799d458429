"""Stream-stream interval join — watermarked joining of two live streams.

Beyond-reference operator (the reference has no joins at all, SURVEY §2.2,
and no streaming). The canonical observability shape: enrich an event
stream with a second stream (alerts↔deploy marks, clicks↔impressions)
where a match means "same key, within a bounded time interval".

Spark-first design (no custom state management):

- both sides carry a watermark, and the join condition bounds
  ``right_ts`` to a window around ``left_ts`` — together these let the
  engine EVICT buffered rows once they can no longer match (state is
  bounded by watermark + interval width, not by stream length; an
  unconstrained stream-stream join would buffer forever at 100 TB/day);
- the equality keys make it a hash join per micro-batch under the hood —
  the same shuffle shape as the batch equi-join, incremental over time;
- inner joins emit as soon as both sides arrive; ``how='left'`` (left
  outer) additionally emits unmatched left rows, but only after the
  watermark proves no match can still arrive — so outer results lag by
  the watermark delay by design.

Batch parity: the emitted rows equal the batch join with the same key and
BETWEEN condition, minus any rows a late source delivered past the
watermark (✓test with availableNow over file sources).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_s: float = 0.0,
    after_s: float = 300.0,
    watermark: str = "10 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two streams on equal ``on`` keys where
    ``left_ts - before_s <= right_ts <= left_ts + after_s``.

    Right-side non-key columns are prefixed with ``right_prefix`` in the
    output (both streams commonly share column names like ``ts``).
    Returns a streaming DataFrame; write with append output mode.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"streaming_interval_join supports 'inner'|'left', got {how!r}")
    if before_s < 0 or after_s < 0:
        raise ValueError("before_s/after_s are non-negative widths")
    if not on:
        raise ValueError("stream-stream joins need at least one equality key")

    l = left.withWatermark(left_ts, watermark).alias("l")
    renames = {c: right_prefix + c for c in right.columns if c not in on}
    clash = set(renames.values()) & set(left.columns)
    if clash:
        raise ValueError(f"prefixed right columns {sorted(clash)} collide with left")
    r = right.withColumnsRenamed(renames).withWatermark(
        right_prefix + right_ts if right_ts not in on else right_ts, watermark
    ).alias("r")

    # Key columns keep their name (renames excludes keys) — if right_ts
    # is itself an equality key, reference it un-prefixed.
    rt_name = right_ts if right_ts in on else right_prefix + right_ts
    rt = f"r.`{rt_name}`"
    lt = f"l.`{left_ts}`"
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"l.`{k}`") == F.col(f"r.`{k}`") for k in on],
    )
    # The interval bound is what lets the state store evict: right rows
    # older than (watermark + after_s) below max(left_ts) can never match.
    cond = (
        cond
        & F.expr(f"{rt} >= {lt} - INTERVAL {float(before_s)} SECONDS")
        & F.expr(f"{rt} <= {lt} + INTERVAL {float(after_s)} SECONDS")
    )
    joined = l.join(r, cond, "inner" if how == "inner" else "leftOuter")
    # Drop the duplicated right-side key columns; keep left schema +
    # prefixed right payload.
    return joined.select(
        *[F.col(f"l.`{c}`") for c in left.columns],
        *[F.col(f"r.`{v}`") for v in renames.values()],
    )

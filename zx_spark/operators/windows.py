"""Time-window segmentation (W1) — the reference's one genuinely
non-standard operator (SURVEY §2.6; reference src/lib.rs:665-732).

Two modes:

- ``aligned`` (default, the scale path): epoch-aligned tumbling windows via
  ``F.window(ts, granularity)``. Pure Catalyst — partial aggregation,
  whole-stage codegen, no Python. Reported ``window_start``/``window_end``
  are the first/last *event* timestamps inside the bucket, matching the
  reference's result convention (src/lib.rs:702-708: first/last actual event
  ts, not bucket boundaries).

- ``faithful``: reference-exact *data-aligned* windows. Per group, rows are
  ordered by row id (insert order, NOT ts — src/lib.rs:544); the first row
  opens a window at its ts; a row joins while ``ts - window_start_ts <=
  granularity`` (inclusive, src/lib.rs:696-700); the breaking row is
  DROPPED but its ts seeds the next window's start (src/lib.rs:711-713).
  Window starts depend on the previous window's breaking row, so the
  recurrence is inherently sequential per group — implemented as an
  ``applyInPandas`` segmenter that only ASSIGNS window numbers (aggregation
  stays JVM-side afterwards). Scale note: this shuffles each group to one
  task; fine for compat/oracle use, not the default at 100 TB — use
  ``aligned`` there.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_NO = "__window_no"


def with_aligned_windows(df: DataFrame, ts_col: str, granularity_s: float) -> DataFrame:
    """Epoch-aligned tumbling window id (bucket start, unix seconds)."""
    w = F.window(F.col(ts_col), f"{int(granularity_s)} seconds")
    return df.withColumn(WINDOW_NO, w.start.cast("double"))


def with_faithful_windows(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    ts_col: str,
    granularity_s: float,
) -> DataFrame:
    """Reference-exact data-aligned window numbers; drops breaking rows.

    ``group_cols`` are the (already-materialized, __nil-coalesced) group key
    columns. Output = input columns + ``__window_no`` (long), with breaking
    rows removed — downstream groupBy(group_cols + [__window_no]) then
    aggregates natively.
    """
    ts_unix = "__ts_unix"
    work = df.withColumn(ts_unix, F.col(ts_col).cast("double"))
    out_schema = work.schema.add(WINDOW_NO, "long")
    g = float(granularity_s)

    def segment(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ts = pdf[ts_unix].to_numpy()
        n = len(ts)
        window_no = [0] * n
        keep = [True] * n
        w = 0
        start = ts[0] if n else 0.0
        for i in range(n):
            if ts[i] - start <= g:
                window_no[i] = w
            else:
                # Breaking row: dropped, but its ts seeds the next window
                # (reference src/lib.rs:711-713 — window_start_idx = i + 1).
                keep[i] = False
                start = ts[i]
                w += 1
        pdf[WINDOW_NO] = pd.Series(window_no, dtype="int64")
        return pdf[pd.Series(keep)]

    if group_cols:
        seg = work.groupBy(*group_cols).applyInPandas(segment, schema=out_schema)
    else:
        seg = work.groupBy(F.lit(1)).applyInPandas(segment, schema=out_schema)
    return seg.drop(ts_unix)

"""Streaming windowed aggregation — the W1/A1-A6 semantics as an
incremental Structured Streaming query.

Design notes (scale-first):

- tumbling ``F.window`` + watermark: state store holds only open windows;
  late rows beyond the watermark are dropped deterministically rather than
  recomputing history (the reference recomputes everything per query —
  src/lib.rs:191-218 — which cannot scale to a stream);
- aggregates reuse ``zx_spark.operators.aggregates.agg_expr``, so the
  sample-rate weighting and null conventions match the batch path exactly
  (one semantics, two execution modes);
- ``availableNow`` trigger for tests/backfills: processes the current
  source snapshot incrementally and stops — the batch/stream parity mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zx_spark.model import NIL, Query
from zx_spark.operators.aggregates import agg_expr


def stream_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "parquet",
) -> DataFrame:
    """File-based streaming source (new files under ``path`` become
    micro-batches). Schema is required — streaming sources cannot infer."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def streaming_windowed_agg(
    stream: DataFrame,
    q: Query,
    ts_col: str = "ts",
    rate_col: str | None = "sample_rate",
    watermark: str | None = "10 minutes",
    slide_s: float | None = None,
) -> DataFrame:
    """Incremental version of ``compile_query`` for aligned windows.
    ``slide_s`` (< granularity) switches to HOPPING windows — each event
    lands in width/slide overlapping buckets, state ∝ open windows ×
    that factor; batch twin = operators.windows.with_hopping_windows
    (parity-pinned in tests).

    Output: group keys (``g_<col>``, __nil-coalesced), ``window_start``/
    ``window_end`` (bucket bounds as unix seconds — a stream cannot know
    per-window first/last event ts until the window closes), one column per
    select aliased as in the batch path.

    ``watermark=None`` inherits the UPSTREAM watermark instead of setting
    one — required when chaining stateful operators (e.g.
    ``streaming_exact_dedup`` → this agg): Spark disallows redefining the
    watermark mid-query."""
    if q.granularity_s is None:
        raise ValueError("streaming aggregation needs a granularity")
    if rate_col is not None and rate_col not in stream.columns:
        rate_col = None
    from zx_spark.compiler import group_alias

    keys = []
    df = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    for c in q.group_by:
        a = group_alias(c)  # same rule as batch — parity tests depend on it
        df = df.withColumn(a, F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(NIL)))
        keys.append(a)
    w_ms = int(round(q.granularity_s * 1000))
    if slide_s is None:
        win = F.window(F.col(ts_col), f"{w_ms} milliseconds")
    else:
        s_ms = int(round(slide_s * 1000))
        if s_ms <= 0 or s_ms > w_ms or w_ms % s_ms != 0:
            raise ValueError(
                f"slide_s must divide granularity_s (got {slide_s}, {q.granularity_s})"
            )
        win = F.window(
            F.col(ts_col), f"{w_ms} milliseconds", f"{s_ms} milliseconds"
        )
    aggs = [agg_expr(s, rate_col=rate_col) for s in q.selects]
    out = df.groupBy(win.alias("__w"), *keys).agg(*aggs)
    return out.select(
        *keys,
        F.col("__w.start").cast("double").alias("window_start"),
        F.col("__w.end").cast("double").alias("window_end"),
        *[s.alias for s in q.selects],
    )


def run_available_now(
    result: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> None:
    """Drain the current source snapshot into an in-memory table named
    ``query_name`` (read back with ``spark.table(query_name)``), then stop.
    Used by tests and batch-parity backfills."""
    (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

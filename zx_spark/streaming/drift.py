"""Streaming data-quality drift monitor: per-micro-batch column profiles
compared against a pinned baseline — the guard a 100 TB ingest runs so a
schema-compatible-but-broken upstream (nulls exploding, a constant
column, cardinality collapse, range shift) is caught at the batch that
introduced it, not at training time.

Composition: ``profile_table`` (one aggregation pass per micro-batch —
the batch is small by definition) against a baseline profile captured
once from a known-good corpus. Profiles land in an epoch-keyed store
(same replay-idempotent layout as rollup_sink), so the monitor's own
history is queryable and a crash-replayed batch overwrites itself.

What counts as drift is deliberately simple and explainable: relative
shift in null fraction / distinct rate beyond a tolerance, min/max
escaping the baseline range. Model-based drift scores can layer on top;
the expensive part — one-pass per-batch profiling with replay-safe
history — is this module."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zx_spark.operators.profile import profile_table


def baseline_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """The pinned known-good profile (persist with .write.parquet and
    hand read back to the monitor)."""
    return profile_table(df, cols)


def profile_drift(
    current: DataFrame,
    baseline: DataFrame,
    null_frac_tol: float = 0.1,
    distinct_rate_tol: float = 0.5,
    check_range: bool = True,
) -> DataFrame:
    """Join a current profile against the baseline and flag drift:

    - ``null_drift``    — |null_frac − base_null_frac| > ``null_frac_tol``
      (absolute fractions, so empty→10% null flags even off a 0 base);
    - ``distinct_drift``— cardinality COLLAPSE (current distinct fell
      more than ``distinct_rate_tol`` below what this batch could show:
      ``min(base_distinct, batch_nonnull)`` — the min makes the test
      sample-size invariant, a clean half-batch of a unique column
      shows half the distincts and passes) or EXPLOSION (current
      distinct exceeds base by the same relative tolerance — checked
      only for columns the baseline shows as bounded-cardinality, since
      a unique column's distinct count legitimately grows with the
      batch);
    - ``range_drift``   — numeric min/max escaped the baseline range
      (strings excluded: lexicographic range says little);
    - ``missing_column`` / ``new_column`` — the batch's profile lost or
      gained a column vs the baseline (full-outer join, so a silently
      renamed upstream field flags instead of vanishing).

    Output: one row per column with both profiles' numbers and boolean
    flags + ``any_drift``. Tiny frames — this is metadata math."""
    b = baseline.select(
        F.col("column"),
        # greatest(n_rows, 1): an all-filtered-away profile reads as
        # zero nulls, not an ANSI divide-by-zero
        (1 - F.col("n_nonnull") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
            "__b_null_frac"
        ),
        F.col("n_distinct").alias("__b_distinct"),
        F.col("n_nonnull").alias("__b_nonnull"),
        F.col("min_value").try_cast("double").alias("__b_min"),
        F.col("max_value").try_cast("double").alias("__b_max"),
    )
    c = current.select(
        F.col("column"),
        F.col("n_rows"),
        F.col("n_nonnull").alias("__c_nonnull"),
        (1 - F.col("n_nonnull") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
            "null_frac"
        ),
        F.col("n_distinct"),
        F.col("min_value"),
        F.col("max_value"),
    )
    # FULL outer: a column missing from the batch (upstream stopped
    # emitting / renamed it) or newly appearing is itself drift — an
    # inner join would silently blind the monitor to exactly that
    j = c.join(b, "column", "full_outer")
    missing = F.col("n_rows").isNull()
    appeared = F.col("__b_nonnull").isNull() & F.col("n_rows").isNotNull()
    null_drift = (
        F.abs(F.col("null_frac") - F.col("__b_null_frac")) > null_frac_tol
    )
    reachable = F.least(F.col("__b_distinct"), F.col("__c_nonnull"))
    collapse = F.col("n_distinct") < reachable * (1.0 - distinct_rate_tol)
    bounded = F.col("__b_distinct") < 0.5 * F.col("__b_nonnull")
    explosion = bounded & (
        F.col("n_distinct") > F.col("__b_distinct") * (1.0 + distinct_rate_tol)
    )
    distinct_drift = collapse | explosion
    if check_range:
        cur_min = F.col("min_value").try_cast("double")
        cur_max = F.col("max_value").try_cast("double")
        range_drift = (
            cur_min.isNotNull()
            & F.col("__b_min").isNotNull()
            & ((cur_min < F.col("__b_min")) | (cur_max > F.col("__b_max")))
        )
    else:
        range_drift = F.lit(False)
    out = j.select(
        "column",
        "n_rows",
        F.round("null_frac", 6).alias("null_frac"),
        F.round("__b_null_frac", 6).alias("base_null_frac"),
        F.col("n_distinct"),
        F.col("__b_distinct").alias("base_n_distinct"),
        "min_value",
        "max_value",
        F.coalesce(null_drift, F.lit(False)).alias("null_drift"),
        F.coalesce(distinct_drift, F.lit(False)).alias("distinct_drift"),
        F.coalesce(range_drift, F.lit(False)).alias("range_drift"),
        missing.alias("missing_column"),
        appeared.alias("new_column"),
    )
    return out.withColumn(
        "any_drift",
        F.col("null_drift")
        | F.col("distinct_drift")
        | F.col("range_drift")
        | F.col("missing_column")
        | F.col("new_column"),
    )


def drift_monitor_sink(
    stream: DataFrame,
    path: str,
    baseline: DataFrame,
    cols: list[str] | None = None,
    null_frac_tol: float = 0.1,
    distinct_rate_tol: float = 0.5,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Start the monitor: each micro-batch is profiled, compared to the
    (cached) baseline, and its per-column drift report written to
    ``path/epoch=<batch_id>`` — replay-idempotent like rollup_sink.
    Query the store for ``any_drift`` rows to alert. Returns the started
    StreamingQuery."""
    base = baseline.cache()
    base.count()  # materialize once; every batch compares against it

    def _batch(df: DataFrame, epoch: int) -> None:
        if not df.take(1):
            return
        report = profile_drift(
            profile_table(df, cols), base, null_frac_tol, distinct_rate_tol
        )
        report.write.mode("overwrite").parquet(
            f"{path.rstrip('/')}/epoch={int(epoch)}"
        )

    w = stream.writeStream.foreachBatch(_batch)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()

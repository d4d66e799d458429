"""Drift monitor: flag semantics on controlled profile shifts, clean
batch passes clean, streaming sink writes replay-idempotent epoch
reports over a planted-drift batch sequence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.streaming.drift import (
    baseline_profile,
    drift_monitor_sink,
    profile_drift,
)


@pytest.fixture(scope="module")
def base_df(spark):
    return spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 100).alias("user_id"),
        (F.col("id") % 5).cast("string").alias("kind"),
        (F.col("id") % 400 / 2.0).alias("value"),
    )


def test_clean_batch_is_clean(spark, base_df):
    """A hash-random half of the baseline corpus must not flag (a
    MODULAR slice like id%2=0 would — it correlates with modular
    columns and genuinely halves their cardinality)."""
    base = baseline_profile(base_df)
    half = base_df.filter(F.substring(F.md5(F.col("id").cast("string")), 1, 1) < "8")
    rep = profile_drift(baseline_profile(half), base)
    bad = [r["column"] for r in rep.collect() if r["any_drift"]]
    assert bad == []


def test_flags_fire_on_planted_shifts(spark, base_df):
    base = baseline_profile(base_df)
    # nulls explode in value; kind collapses to a constant; user_id range
    # escapes the baseline
    broken = base_df.select(
        "id",
        F.when(F.col("id") % 100 == 0, F.col("user_id")).otherwise(
            F.col("user_id") + 1000
        ).alias("user_id"),
        F.lit("only").alias("kind"),
        F.when(F.col("id") % 3 == 0, F.col("value")).alias("value"),
    )
    rep = {r["column"]: r for r in profile_drift(baseline_profile(broken), base).collect()}
    assert rep["value"]["null_drift"] and rep["value"]["any_drift"]
    assert rep["kind"]["distinct_drift"]
    assert rep["user_id"]["range_drift"]
    assert not rep["id"]["any_drift"]


def test_streaming_monitor_epochs(spark, base_df, tmp_path):
    base = baseline_profile(base_df)
    src = str(tmp_path / "src")
    # batch 1: clean slice; batch 2: null explosion in value
    base_df.filter("id < 500").coalesce(1).write.parquet(src)
    base_df.filter("id >= 500").withColumn(
        "value", F.when(F.col("id") % 10 == 0, F.col("value"))
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(base_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "reports")
    q = drift_monitor_sink(
        stream, out, base,
        checkpoint_dir=str(tmp_path / "ck"), available_now=True,
    )
    q.awaitTermination(120)
    rep = spark.read.option("basePath", out).parquet(out)
    per_epoch = {
        r["epoch"]: r["n"]
        for r in rep.filter("column = 'value' AND any_drift")
        .groupBy("epoch").agg(F.count("*").alias("n")).collect()
    }
    # exactly one of the two batches drifted on value
    assert len(per_epoch) == 1 and set(per_epoch.values()) == {1}
    assert rep.select("epoch").distinct().count() == 2


def test_missing_and_new_columns_flag(spark, base_df):
    base = baseline_profile(base_df)
    cur = baseline_profile(base_df.drop("kind").withColumn("extra", F.lit(1)))
    rep = {r["column"]: r for r in profile_drift(cur, base).collect()}
    assert rep["kind"]["missing_column"] and rep["kind"]["any_drift"]
    assert rep["extra"]["new_column"] and rep["extra"]["any_drift"]
    assert not rep["id"]["missing_column"] and not rep["id"]["new_column"]

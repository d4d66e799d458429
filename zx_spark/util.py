"""Small helpers shared across operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism — lets CPU-heavy
    per-row stages (signature hashing, embedding dot products, Arrow
    UDFs) use every core even when the source is one small parquet file.
    Guarded by the SOURCE FILE COUNT (``inputFiles()``, no RDD lineage
    materialization): an input already wider than the cluster is left
    alone — an explicit ``repartition(n)`` there would COLLAPSE its
    partitions down to n and lose parallelism, which AQE cannot undo (it
    only merges, never splits)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    return df.repartition(target)

"""Streaming ingestion dedup — exact content dedup at the stream edge.

A training-data ingestion stream re-delivers documents (at-least-once
sources, crawler retries, replayed partitions). Deduping at ingestion
keeps every downstream stage (near-dup LSH, sampling, splits) from
paying for copies. Batch exact dedup (operators/dedup.py) re-shuffles
the corpus per run; this is the incremental twin:

- the dedup key is the md5 CONTENT hash (same key as the batch
  ``exact_dedup_groups``), not a message id — re-sent payloads dedupe
  even when their envelope differs;
- ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival and bounds
  the key state by the event-time watermark — a key that goes quiet is
  evicted, so state is O(distinct keys per watermark window), not
  O(corpus). That bound is what makes the operator runnable forever;
  the tradeoff (a duplicate arriving LATER than the watermark delay is
  re-emitted) is inherent to bounded state and documented at the call
  site — run the batch dedup downstream for the exactness guarantee.

Scale shape: one shuffle on the hash key per micro-batch (same key →
same state-store partition), RocksDB-backed state, no Python in the
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Keep the first-arriving row per md5(``content_col``) within the
    watermark; later identical payloads are dropped. Emits the input
    columns plus ``hash_col`` (the batch pipeline joins on it)."""
    return (
        stream.withColumn(hash_col, F.md5(F.col(content_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([hash_col])
    )

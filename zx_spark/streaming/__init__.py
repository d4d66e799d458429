"""Structured Streaming surface.

The reference has no true streaming (SURVEY §2.2: inserts are incremental
but every query recomputes from storage). This package is the Spark-native
upgrade: the same windowed-aggregate semantics as the batch compiler,
expressed as an incremental streaming query with watermarked late-data
handling — the shape a 100 TB observability pipeline actually runs."""

from zx_spark.streaming.dedup import streaming_exact_dedup
from zx_spark.streaming.anomaly import streaming_anomaly_flags
from zx_spark.streaming.sessions import streaming_session_agg
from zx_spark.streaming.state import current_state_provider, use_rocksdb_state
from zx_spark.streaming.windowed import (
    run_available_now,
    stream_events,
    streaming_windowed_agg,
)

__all__ = [
    "current_state_provider",
    "run_available_now",
    "stream_events",
    "streaming_exact_dedup",
    "streaming_anomaly_flags",
    "streaming_session_agg",
    "streaming_windowed_agg",
    "use_rocksdb_state",
]

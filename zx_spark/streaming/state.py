"""State-store selection for the stateful streaming operators.

Every ``applyInPandasWithState`` twin (gapfill, funnel, retention,
topk, anomaly, drift, sessions) and the built-in streaming aggregates
keep per-key state in Spark's state store. The default HDFS-backed
provider holds the WHOLE store for a partition in executor memory
between batches — fine for the watermark-bounded O(k)-per-key state
these operators keep, but at very large key cardinality (per-user
funnels over 10^9 users) the working set should live off-heap and
on local disk instead.

``use_rocksdb_state`` switches the session to Spark's bundled RocksDB
provider (``RocksDBStateStoreProvider``, in-box since Spark 3.2):
state lives in a local RocksDB instance per partition — memory holds
only the block cache + memtable, snapshots/changelogs still go to the
checkpoint location, and key lookups stay O(log n) on disk. The knob
is a session conf read at QUERY START, so set it before ``start()``;
running queries keep the provider they started with (the provider
class is also pinned in each query's checkpoint — resuming a
checkpoint under a different provider fails fast rather than
corrupting state).

Scale guidance: choose RocksDB when (keys × state-per-key) per
partition approaches executor heap — the streaming twins keep O(k)
per key (SCALE.md), so the trigger is key cardinality, not event
rate. Changelog checkpointing
(``spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled``)
uploads deltas instead of full snapshots — worth enabling for large
stores; left to the caller since it changes checkpoint layout.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession, enabled: bool = True) -> str:
    """Point subsequently STARTED streaming queries at the RocksDB
    (``enabled=True``) or default HDFS-backed (``False``) state store.
    Returns the previous provider conf value (or '' if unset) so a
    caller can restore it."""
    prev = spark.conf.get(_PROVIDER_CONF, "")
    spark.conf.set(
        _PROVIDER_CONF, ROCKSDB_PROVIDER if enabled else HDFS_PROVIDER
    )
    return prev


def current_state_provider(spark: SparkSession) -> str:
    """The provider class newly started queries will use (the Spark
    default — HDFS-backed — if the conf is unset)."""
    return spark.conf.get(_PROVIDER_CONF, HDFS_PROVIDER)

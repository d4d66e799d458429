"""Batch source readers.

The reference ingests exactly one way: raw Redis commands piped into the
server (`ZX.I`/`ZADD`, fixtures/test.cmd, Makefile:1-2), RDB snapshots as
the storage format. Here every common lake format maps onto the same event
conventions:

- ``ts`` may arrive as a timestamp, ISO-8601 string, or epoch
  seconds/millis — ``_normalize_ts`` handles all three declaratively;
- a missing ``id`` gets ``monotonically_increasing_id()`` (the reference's
  ``INCR LAST-ID``, src/lib.rs:264-267 — unique, not dense, which is the
  distributed-safe contract);
- a missing ``sample_rate`` is left absent (aggregates default it to 1.0,
  src/lib.rs:565).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    if ts_col not in df.columns:
        return df
    dt = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[ts_col]
    col = F.col(f"`{ts_col}`")
    if isinstance(dt, T.TimestampType):
        return df
    if isinstance(dt, T.TimestampNTZType):
        # naive timestamp: interpret in the session zone (pinned UTC) so
        # epoch casts stay legal and oracle-comparable
        return df.withColumn(ts_col, col.cast("timestamp"))
    if isinstance(dt, (T.LongType, T.IntegerType)):
        # Heuristic epoch unit by magnitude: > 1e16 → nanos (the driver's
        # own parquet format arrives as bigint nanos under nanosAsLong),
        # > 1e14 → micros, > ~1e11 → millis, else seconds. Integer `div`
        # for nanos — doubles can't represent 1e18 exactly.
        return df.withColumn(
            ts_col,
            F.when(
                col > F.lit(10_000_000_000_000_000),
                F.expr(f"timestamp_micros(`{ts_col}` div 1000)"),
            )
            .when(col > F.lit(100_000_000_000_000), F.timestamp_micros(col))
            .when(col > F.lit(99_999_999_999), F.timestamp_millis(col))
            .otherwise(F.timestamp_seconds(col)),
        )
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return df.withColumn(ts_col, F.timestamp_seconds(col))
    # try_to_timestamp: a malformed string becomes a NULL-ts row instead of
    # failing the whole job under ANSI mode — at pipeline scale one bad row
    # must not kill a 100 TB ingest.
    return df.withColumn(ts_col, F.try_to_timestamp(col))


def _ensure_id(df: DataFrame, id_col: str = "id") -> DataFrame:
    if id_col in df.columns:
        return df
    return df.withColumn(id_col, F.monotonically_increasing_id())


def read_parquet_events(spark: SparkSession, path: str) -> DataFrame:
    return _ensure_id(_normalize_ts(spark.read.parquet(path)))


def read_orc_events(spark: SparkSession, path: str) -> DataFrame:
    """ORC is the other first-class columnar lake format (same pruning and
    vectorized-read properties as parquet in Spark)."""
    return _ensure_id(_normalize_ts(spark.read.orc(path)))


def read_csv_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return _ensure_id(_normalize_ts(reader.csv(path)))


def read_json_events(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return _ensure_id(_normalize_ts(reader.json(path)))


def rows_to_events(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """The ``ZX.I`` analog (src/lib.rs:846-856): sparse dict rows → events
    DataFrame. Missing keys become NULL columns (the sparse convention)."""
    return _ensure_id(_normalize_ts(spark.createDataFrame(rows)))

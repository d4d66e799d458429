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


def _merge_json_schema(values: list[str]) -> T.StructType:
    """Union-of-keys schema over sampled JSON strings: scalars type as
    long/double/boolean/string (conflicts widen to string), nested
    objects recurse, arrays stay as raw JSON strings (the reference's
    comma-joined-tags convention keeps list-ish values stringly)."""
    import json

    def merge(a, b):
        if a is None:
            return b
        if b is None or a == b:
            return a
        if isinstance(a, dict) and isinstance(b, dict):
            return {k: merge(a.get(k), b.get(k)) for k in {*a, *b}}
        num = {"long", "double"}
        if {a, b} <= num:
            return "double"
        return "string"

    def infer(v):
        if isinstance(v, dict):
            return {k: infer(x) for k, x in v.items()}
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        return "string"

    shape: dict | None = None
    for s in values:
        try:
            v = json.loads(s)
        except (ValueError, TypeError):
            continue
        if isinstance(v, dict):
            shape = merge(shape, infer(v))

    def to_struct(d: dict) -> T.StructType:
        fields = []
        for k in sorted(d):
            t = d[k]
            if isinstance(t, dict):
                ft: T.DataType = to_struct(t)
            else:
                ft = {
                    "long": T.LongType(),
                    "double": T.DoubleType(),
                    "boolean": T.BooleanType(),
                }.get(t, T.StringType())
            fields.append(T.StructField(k, ft))
        return T.StructType(fields)

    return to_struct(shape or {})


def flatten_json_props(
    df: DataFrame,
    json_col: str = "props",
    schema: T.StructType | str | None = None,
    sample: int = 1000,
    stringly: bool = False,
    drop: bool = True,
) -> DataFrame:
    """Flatten a JSON-string column into flat DOTTED columns — the
    reference's ingest convention (clients send pre-flattened
    ``repo.name`` keys, src/expr.rs:148-157; here nested JSON flattens
    to the same shape at read time, so ``select sum(props.k) …`` works
    through the SQL shim end to end).

    ``schema=None`` infers a union-of-keys schema from up to ``sample``
    distinct values (one tiny collect — a scale TRADEOFF: keys absent
    from the sample are missed; pass an explicit schema for exactness on
    a 100 TB ingest). Parsing is one ``from_json`` projection — map-side,
    no Python. ``stringly=True`` casts every leaf to string, matching
    the reference's all-strings value model (src/lib.rs:31-32); the
    default keeps inferred types for Spark-native querying. Malformed
    JSON rows yield NULLs (never fail the ingest)."""
    col = F.col(f"`{json_col}`")
    if schema is None:
        vals = [
            r[0]
            for r in df.select(col).filter(col.isNotNull()).distinct().limit(sample).collect()
        ]
        schema = _merge_json_schema(vals)
    parsed = F.from_json(col, schema)
    st = parsed

    def leaves(t: T.DataType, path: list[str]):
        if isinstance(t, T.StructType):
            for f in t.fields:
                yield from leaves(f.dataType, path + [f.name])
        else:
            yield path

    sch = (
        schema
        if isinstance(schema, T.StructType)
        else T._parse_datatype_string(schema)  # type: ignore[attr-defined]
    )
    out = df.withColumn("__props", parsed)
    cols = [F.col(f"`{c}`") for c in df.columns if not (drop and c == json_col)]
    for path in leaves(sch, []):
        leaf = F.col("__props")
        for p in path:
            leaf = leaf[p]
        if stringly:
            leaf = leaf.cast("string")
        cols.append(leaf.alias(".".join([json_col, *path])))
    return out.select(*cols)


def read_evolving_parquet(
    spark: SparkSession, path: str, expect_cols: dict[str, str] | None = None
) -> DataFrame:
    """Read a parquet store whose schema EVOLVED across appends
    (columns added over time): ``mergeSchema`` unions every file's
    footer schema, so early files surface the later columns as NULL —
    the additive-evolution contract a long-lived ingest needs.
    ``expect_cols`` (name → dtype) optionally asserts the merged
    schema contains each, failing fast with the actual schema instead
    of letting a misspelled column NULL its way through a pipeline.

    Scale note: mergeSchema reads EVERY file's footer at planning time
    — fine for daily appends, noticeable on a million-file store; after
    compaction (storage.compact_store) all files share one schema and
    the default single-footer read is enough."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expect_cols:
        have = dict(df.dtypes)
        problems = [
            f"{c}: want {t}, have {have.get(c, 'MISSING')}"
            for c, t in expect_cols.items()
            if have.get(c) != t
        ]
        if problems:
            raise ValueError(
                f"schema contract violated: {problems}; merged schema: {df.dtypes}"
            )
    return df


def read_json_permissive(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON ingest that QUARANTINES malformed lines instead of failing
    the job or silently dropping them: returns ``(good, bad)`` where
    ``bad`` carries the raw offending line in ``corrupt_col``. The
    standard PERMISSIVE-mode pattern with the two outcomes split so a
    pipeline can land good rows and route the quarantine to operators.

    One scan feeds both frames lazily; a malformed-input rate worth
    alerting on is ``bad.count() / (good.count() + bad.count())`` —
    wire it to the drift monitor's null checks for continuous ingest."""
    full = T.StructType(
        [*schema.fields, T.StructField(corrupt_col, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    # Spark requires caching/materializing before referencing only the
    # corrupt column (the lazy parser would otherwise prune the fields
    # it needs to decide corruption)
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad

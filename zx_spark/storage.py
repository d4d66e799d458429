"""Storage layer — Parquet-backed event tables + the reference fixture.

The reference's storage is one redis-server process per column (src/proc.rs,
"separated storage and computing layers"). In Spark, columnar Parquet on an
object store IS the separated serverless storage layer — nothing to build
beyond conventions:

- events schema: ``id BIGINT, ts TIMESTAMP, sample_rate DOUBLE,
  <attr> STRING...`` — nullable attr columns encode sparsity (NULL = the
  reference's "column absent for this row").
- at scale, write partitioned by time (``partitionBy(date(ts))``) so the
  reference's TS-index range scan (src/lib.rs:305-331) becomes partition
  pruning + row-group stat pruning.

``zx_fixture`` materializes the reference's only dataset — the 10-row
fixture from fixtures/test.cmd:1-66 (schema + rows pinned in FIXTURES.md) —
for the golden-value tests ported from src/test.rs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZX_FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("foo", T.StringType(), True),
        T.StructField("x", T.StringType(), True),
        T.StructField("y", T.StringType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("sample_rate", T.DoubleType(), True),
    ]
)

# fixtures/test.cmd:8-66 — (id, ts_unix_s, foo, x, y, tag); sample_rate never
# set in the fixture (defaults to 1, src/lib.rs:565).
ZX_FIXTURE_ROWS = [
    (1, 0, "100", "7", "1", "t1"),
    (2, 1, "200", "1", None, "t1,t2"),
    (3, 2, "300", "3", None, "t3"),
    (4, 3, "400", "2", "9", "t2"),
    (5, 4, "500", "4", None, None),
    (6, 5, "600", "5", None, "t3"),
    (7, 6, "700", "6", None, None),
    (8, 7, "800", "9", None, None),
    (9, 8, "900", "8", None, None),
    (10, 9, "1000", "0", "9", None),
]


def zx_fixture(spark: SparkSession) -> DataFrame:
    """The reference 10-row fixture as a DataFrame (ts = unix seconds 0-9)."""
    rows = [
        {"id": i, "ts_s": ts, "foo": foo, "x": x, "y": y, "tag": tag}
        for (i, ts, foo, x, y, tag) in ZX_FIXTURE_ROWS
    ]
    df = spark.createDataFrame(rows)
    return df.select(
        F.col("id").cast("long").alias("id"),
        F.timestamp_seconds(F.col("ts_s")).alias("ts"),
        "foo",
        "x",
        "y",
        "tag",
        F.lit(None).cast("double").alias("sample_rate"),
    )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md).

    The driver writes ``ts`` as INT64 TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as bigint nanos.
    Normalize to a micros TIMESTAMP by integer-truncating (``div 1000``) —
    the same truncation DuckDB applies reading nanos parquet, so oracle
    comparisons see identical timestamps.
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        # The caller's session may not be ours (the driver passes its own):
        # make sure nanos-timestamp parquet is readable and timestamp
        # literals parse in UTC regardless.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    return _normalize_ts(spark.read.parquet(path), path)


def _normalize_ts(df: DataFrame, path: str) -> DataFrame:
    """The driver-parquet timestamp normalization shared by plain reads
    and the stats-backed catalog-table views."""
    types = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))
    for col in _nanos_timestamp_cols(path):
        if isinstance(types[col], T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    # Parquet micros TIMESTAMP with isAdjustedToUTC=false arrives as
    # TIMESTAMP_NTZ; with the session pinned to UTC, casting to the
    # session-zoned TIMESTAMP is value-identical to DuckDB's naive read,
    # and keeps every downstream epoch cast (`ts.cast("double")`,
    # F.window(...).start.cast("double")) legal.
    for col, dt in types.items():
        if isinstance(dt, T.TimestampNTZType):
            df = df.withColumn(col, F.col(f"`{col}`").cast("timestamp"))
    return df


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer (these
    arrive as bigint under nanosAsLong and need normalization). ``path``
    may be a single file or a Spark-written directory of part files —
    one footer is representative either way."""
    import glob
    import os

    import pyarrow.parquet as pq
    import pyarrow.types as pat

    if os.path.isdir(path):
        # recursive: partitioned writes nest part files under key=val dirs
        parts = sorted(glob.glob(f"{path}/**/*.parquet", recursive=True))
        if not parts:
            return []
        path = parts[0]
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


# (applicationId, catalog table name) pairs already ANALYZEd — stats
# collection scans the table, so pay it once per session per store.
_ANALYZED: set[tuple[str, str]] = set()


def _stats_digest(path: str) -> str:
    import hashlib
    import os

    return hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:10]


def invalidate_stats(spark: SparkSession, path: str) -> None:
    """Invalidate a store's ANALYZE statistics after a mutation.

    Statistics are per STORE VERSION: ``_stats_backed_df`` memoizes the
    ANALYZE per (applicationId, table), so a store that is appended to,
    merged, truncated, compacted or re-clustered AFTER registration
    would otherwise keep its stale rowCount/ndv for the rest of the
    session — and CBO would reorder joins (and the session-window gate
    would threshold) on cardinalities that can be 100× off: the exact
    failure the stats exist to prevent (VERDICT r12 What's-wrong #1).
    Every library write path calls this; external writers must call it
    (or ``register_views`` again after it) themselves.

    Also refreshes Spark's cached FILE INDEX — by catalog TABLE NAME,
    matched on the path digest (``refreshTable``, deliberately not
    ``refreshByPath``: the catalog stores a ``file:`` URI that need not
    string-match the raw path, and a missed refresh makes the next
    ANALYZE scan the stale listing). Note the invalidation is one half
    of the contract: already-materialized views keep serving the OLD
    stats until ``register_views`` runs again and re-ANALYZEs — a
    mutation site that queries before re-registering still plans on
    stale rowCounts (ADVICE r12/r13)."""
    suffix = f"_{_stats_digest(path)}"
    app = spark.sparkContext.applicationId
    for k in [k for k in _ANALYZED if k[0] == app and k[1].endswith(suffix)]:
        _ANALYZED.discard(k)
    # refresh by TABLE NAME, matched on the path digest (not
    # refreshByPath: the catalog stores a file: URI that need not
    # string-match the raw path, and a missed refresh makes the NEXT
    # ANALYZE scan the stale listing — measured: re-ANALYZE after an
    # append kept rowCount=100 on a 10000-row store). Matching by
    # digest also catches tables whose memo entry is already gone
    # (second mutation before re-registration).
    try:
        for t in spark.catalog.listTables():
            if t.name.endswith(suffix):
                spark.catalog.refreshTable(t.name)
    except Exception:
        pass


def _stats_backed_df(spark: SparkSession, path: str, name: str) -> DataFrame | None:
    """The table at ``path`` as a catalog-table-backed DataFrame carrying
    ANALYZE statistics (rowCount + per-column ndv/min/max/nullCount), ts
    normalization applied on top. None when the session's catalog can't
    host it (the caller falls back to the plain read).

    Why: without rowCount/column stats Catalyst keeps the WRITTEN join
    order of a passthrough query — the r11 Q5 measurement (SCALE.md r11)
    showed a dim-first FROM clause chaining broadcasts onto a
    one-partition streamed side with a 768 MiB build. With CBO enabled
    and stats present, `CostBasedJoinReorder` compiles the same text to
    the reduced-side-first plan, so users don't have to hand-order FROM
    clauses. At 100 TB the ANALYZE scan is paid once per store version
    (a metastore persists it across sessions; this in-memory catalog
    pays it once per session, memoized here)."""
    import os

    tbl = f"zx_stats_{name}_{_stats_digest(path)}"
    key = (spark.sparkContext.applicationId, tbl)
    try:
        if key not in _ANALYZED:
            loc = os.path.abspath(path).replace("'", "''")
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS `{tbl}` USING parquet LOCATION '{loc}'"
            )
            try:
                spark.sql(
                    f"ANALYZE TABLE `{tbl}` COMPUTE STATISTICS FOR ALL COLUMNS"
                )
            except Exception:
                # FOR ALL COLUMNS REJECTS nested types rather than
                # skipping them (ARRAY<FLOAT> on the embeddings table:
                # UNSUPPORTED_FEATURE.ANALYZE_UNSUPPORTED_COLUMN_TYPE) —
                # fall to the scalar columns, else table-level stats;
                # rowCount alone still drives CostBasedJoinReorder and
                # the session-window gate, so an embedding-bearing table
                # must not degrade all the way to a stats-less view.
                scalars = [
                    f.name
                    for f in spark.table(tbl).schema.fields
                    if not isinstance(
                        f.dataType, (T.ArrayType, T.MapType, T.StructType)
                    )
                ]
                if scalars:
                    cols = ", ".join(f"`{c}`" for c in scalars)
                    spark.sql(
                        f"ANALYZE TABLE `{tbl}` COMPUTE STATISTICS "
                        f"FOR COLUMNS {cols}"
                    )
                else:
                    spark.sql(f"ANALYZE TABLE `{tbl}` COMPUTE STATISTICS")
            _ANALYZED.add(key)
        return _normalize_ts(spark.table(tbl), path)
    except Exception:
        return None


def register_views(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str] | None = None,
    with_stats: bool = True,
) -> None:
    """Register the store's tables as temp views for SQL.

    ``with_stats`` (default): views sit on ANALYZEd catalog tables and
    the session gets ``spark.sql.cbo.enabled`` +
    ``spark.sql.cbo.joinReorder.enabled`` — passthrough SQL then owns
    its join order (stats-based reordering) instead of inheriting the
    user's FROM order. Falls back per-table to plain parquet-scan views
    if the catalog refuses (read-only metastore, unsupported path) —
    with a RuntimeWarning, because a stats-less view silently disables
    CostBasedJoinReorder for every join involving it (ADVICE r12).

    Statistics are per STORE VERSION: every library write path
    (``write_events``/``merge_upsert``/``compact_store``/
    ``cluster_store``/``truncate_events``) invalidates them via
    ``invalidate_stats``, and calling ``register_views`` again then
    re-ANALYZEs. A store mutated by an EXTERNAL writer must get an
    explicit ``invalidate_stats(spark, path)`` (or a fresh
    ``register_views``) before its next query, or CBO plans on stale
    rowCounts. ``with_stats=False`` opts out entirely (plain
    re-listed-per-query parquet views, no CBO)."""
    names = tables or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    try:
        # The caller's session may not be ours (the driver passes its
        # own): the same parquet-flavor confs read_table pins.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    if with_stats:
        try:
            spark.conf.set("spark.sql.cbo.enabled", "true")
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        except Exception:
            with_stats = False
    for n in names:
        df = None
        if with_stats:
            df = _stats_backed_df(spark, f"{sf_dir}/{n}.parquet", n)
            if df is None:
                import warnings

                warnings.warn(
                    f"register_views: stats-backed registration failed for "
                    f"{n!r}; falling back to a plain view. "
                    "CostBasedJoinReorder will NOT reorder joins involving "
                    "it — passthrough SQL inherits the written FROM order "
                    "(the r11 dim-first broadcast cliff).",
                    RuntimeWarning,
                    stacklevel=2,
                )
        if df is None:
            df = read_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    buckets: int = 32,
) -> None:
    """Write a bucketed+sorted parquet table (hash-bucketed on
    ``bucket_col``). Two tables bucketed on the same key with the same
    bucket count join WITHOUT a shuffle — the co-located-join layout for
    repeated large joins at 100 TB (e.g. events⋈users on user_id), where
    paying one bucketed write amortizes every subsequent join's exchange.
    Verified by plan test: no Exchange under the SortMergeJoin."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def truncate_events(spark: SparkSession, path: str, schema: T.StructType | None = None) -> None:
    """S4 init/flush equivalent (reference ``init``/``flushall``,
    src/lib.rs:248-261): overwrite the events table with an empty frame,
    PRESERVING the store's own schema — defaulting to the fixture schema
    would silently replace a custom store's columns. Falls back to the
    fixture schema only when the store doesn't exist yet (true init)."""
    if schema is None:
        try:
            schema = spark.read.parquet(path).schema
        except Exception:
            schema = ZX_FIXTURE_SCHEMA
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(path)
    invalidate_stats(spark, path)


def compact_store(
    spark: SparkSession,
    path: str,
    target_file_mb: float = 128.0,
    partition_cols: list[str] | None = None,
) -> dict:
    """Compact a parquet store's small files into ~``target_file_mb`` files.

    The operational reality behind every streaming/append sink at scale:
    micro-batch appends (``write_events``, ``foreachBatch``) accrete
    thousands of KB-sized part files per partition, and scan cost becomes
    file-open overhead instead of I/O — a 100 TB store with 10 M files is
    unqueryable regardless of plan quality. Compaction rewrites the data
    in place at the target file size and preserves the partition layout
    (so partition pruning keeps working).

    Plan shape: one count pass sizes each partition, then ONE shuffle
    keyed on (partition columns, salt) — the salt modulus per partition
    value is ``ceil(partition_rows / rows_per_target_file)``, so a cold
    day compacts in one task while a hot 1-TB day fans out across many
    tasks (one task per output file), never funneling a whole partition
    through a single executor. ``maxRecordsPerFile`` still caps file
    size — both knobs are sized from the store's own measured bytes/row,
    so ``target_file_mb`` is real on-disk MB, not a row guess.
    Unpartitioned stores repartition to ``ceil(bytes/target)``.

    The rewrite goes to a sibling temp dir, then swaps via two renames —
    crash-safe for the data (both copies exist until the final rename;
    an interrupted run is healed on the next call by ``_recover_swap``)
    but not concurrent-writer-safe: pause appends during the swap (same
    contract as every non-transactional lake compactor; a table format
    with optimistic commits is the 100 TB answer for concurrent writers).

    Returns ``{files_before, files_after, bytes, rows}``.
    """
    import glob
    import math
    import os

    if target_file_mb <= 0:
        raise ValueError(f"target_file_mb must be positive, got {target_file_mb}")

    def _parts(p: str) -> list[str]:
        return sorted(glob.glob(f"{p}/**/*.parquet", recursive=True))

    _recover_swap(path)
    before = _parts(path)
    if not before:
        raise ValueError(f"no parquet files under {path}")
    total_bytes = sum(os.path.getsize(f) for f in before)

    if partition_cols is None:
        partition_cols = _discover_partition_cols(path)
    df = spark.read.parquet(path)
    rows = df.count()
    if rows == 0:
        return {"files_before": len(before), "files_after": len(before),
                "bytes": total_bytes, "rows": 0}
    max_records = max(1, int(target_file_mb * 2**20 * rows / total_bytes))

    if partition_cols:
        # Per-partition salt: spread each partition value over exactly as
        # many tasks as it needs output files. The per-value row counts
        # are a tiny aggregate, broadcast back onto the data.
        counts = (
            df.groupBy(*partition_cols)
            .count()
            .withColumn(
                "__salt_mod",
                F.greatest(
                    F.lit(1), F.ceil(F.col("count") / F.lit(max_records))
                ).cast("int"),
            )
            .drop("count")
        )
        hashable = [
            f.name
            for f in df.schema.fields
            if f.name not in partition_cols
            and not isinstance(f.dataType, T.MapType)
        ]
        salt = (
            F.pmod(F.xxhash64(*[F.col(f"`{c}`") for c in hashable]), F.col("__salt_mod"))
            if hashable
            else F.lit(0)
        )
        n_tasks = max(
            spark.sparkContext.defaultParallelism,
            math.ceil(total_bytes / (target_file_mb * 2**20)),
        )
        out = (
            df.join(F.broadcast(counts), partition_cols)
            .withColumn("__salt", salt)
            .repartition(n_tasks, *[F.col(c) for c in partition_cols], F.col("__salt"))
            .drop("__salt", "__salt_mod")
        )
        writer = out.write.partitionBy(*partition_cols)
    else:
        out = df.repartition(max(1, math.ceil(total_bytes / (target_file_mb * 2**20))))
        writer = out.write
    tmp, _ = _swap_paths(path)
    writer.mode("overwrite").option("maxRecordsPerFile", max_records).parquet(tmp)

    _finish_swap(path)
    invalidate_stats(spark, path)
    return {
        "files_before": len(before),
        "files_after": len(_parts(path)),
        "bytes": total_bytes,
        "rows": rows,
    }


def _swap_paths(path: str) -> tuple[str, str]:
    """(tmp, old) sibling paths for the compaction two-rename swap; the
    tmp dir is pre-cleaned so a dead prior rewrite can't pollute ours."""
    import shutil

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    return tmp, old


def _recover_swap(path: str) -> None:
    """Heal an interrupted prior compaction before touching the store.

    Crash points and their remedies: died during the final cleanup →
    ``path`` is the new data and ``__compact_old`` is removable garbage;
    died between the two renames → ``path`` is missing and
    ``__compact_old`` IS the store, so restore it."""
    import os
    import shutil

    old = path.rstrip("/") + "__compact_old"
    if not os.path.exists(old):
        return
    if os.path.exists(path):
        shutil.rmtree(old)
    else:
        os.rename(old, path)


def _finish_swap(path: str) -> None:
    """path -> old, tmp -> path, drop old (call after writing tmp)."""
    import os
    import shutil

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def cluster_store(
    spark: SparkSession,
    path: str,
    cols: list[str],
    target_file_mb: float = 128.0,
    zorder: bool = False,
    zorder_bits: int = 8,
) -> dict:
    """Rewrite a parquet store CLUSTERED on ``cols`` so the reader can
    skip row groups (and whole files) whose min/max statistics exclude a
    predicate — the data-layout lever that turns a full 100 TB scan into
    a few-gigabyte one for selective filters, with zero query-side
    changes (parquet stat pruning is automatic).

    Two layouts:

    - ``zorder=False`` (default): range-cluster — ``repartitionByRange``
      + ``sortWithinPartitions`` on ``cols``. Min/max spans become tight
      on the LEADING column (and secondarily within ties). The right
      choice when one column dominates the filters.
    - ``zorder=True``: interleave the bits of per-column quantile-bucket
      ranks (``zorder_bits`` per column) into a Z-order key and
      range-cluster on that — every listed column gets bounded row-group
      spans, so filters on ANY of them skip. Numeric columns only (a
      hash-bucketed string would not tighten the raw column's min/max
      stats). Bucket ranks use a uniform grid over the column's
      [p1, p99] (one driver-side approxQuantile per column — a handful
      of doubles); heavy skew inside the grid softens, but never breaks,
      the clustering.

    Same swap/crash-recovery contract as ``compact_store``. Returns
    ``{files, row_groups, rows}`` for the rewritten store.
    """
    import glob
    import math

    if not cols:
        raise ValueError("cluster_store needs at least one column")
    _recover_swap(path)
    df = spark.read.parquet(path)
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"cluster column {c!r} not in {df.columns}")
    files = glob.glob(f"{path}/**/*.parquet", recursive=True)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    import os

    total_bytes = sum(os.path.getsize(f) for f in files)
    rows = df.count()
    if rows == 0:
        return {"files": len(files), "row_groups": 0, "rows": 0}
    max_records = max(1, int(target_file_mb * 2**20 * rows / total_bytes))
    n_tasks = max(
        spark.sparkContext.defaultParallelism,
        math.ceil(total_bytes / (target_file_mb * 2**20)),
    )

    if zorder:
        numeric = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                   T.FloatType, T.DoubleType, T.DecimalType)
        for c in cols:
            if not isinstance(df.schema[c].dataType, numeric):
                raise ValueError(
                    f"zorder needs numeric columns, {c!r} is "
                    f"{df.schema[c].dataType.simpleString()} — use "
                    "zorder=False (range-cluster) for strings/timestamps"
                )
        nb = 1 << zorder_bits
        ranks = []
        for c in cols:
            q01, q99 = df.stat.approxQuantile(c, [0.01, 0.99], 0.001)
            if q99 <= q01:  # constant-ish column: every row in bucket 0
                ranks.append(F.lit(0))
                continue
            x = F.col(f"`{c}`").cast("double")
            r = F.floor((x - F.lit(q01)) / F.lit((q99 - q01) / nb))
            ranks.append(
                F.when(x.isNull(), F.lit(0))
                .otherwise(F.least(F.greatest(r, F.lit(0)), F.lit(nb - 1)))
                .cast("long")
            )
        # Interleave: bit i of column j lands at position i*len(cols)+j —
        # the classic Morton code, generalized to N columns.
        zkey = F.lit(0).cast("long")
        for i in range(zorder_bits):
            for j, r in enumerate(ranks):
                bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
                zkey = zkey + F.shiftleft(bit, i * len(cols) + j)
        out = (
            df.withColumn("__zkey", zkey)
            .repartitionByRange(n_tasks, F.col("__zkey"))
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
        out = df.repartitionByRange(
            n_tasks, *[F.col(f"`{c}`") for c in cols]
        ).sortWithinPartitions(*cols)

    tmp, _ = _swap_paths(path)
    out.write.mode("overwrite").option("maxRecordsPerFile", max_records).parquet(tmp)
    _finish_swap(path)

    new_files = glob.glob(f"{path}/**/*.parquet", recursive=True)
    try:
        import pyarrow.parquet as pq

        rgs = sum(pq.ParquetFile(f).metadata.num_row_groups for f in new_files)
    except Exception:  # pragma: no cover - pyarrow always present here
        rgs = -1
    invalidate_stats(spark, path)
    return {"files": len(new_files), "row_groups": rgs, "rows": rows}


def _discover_partition_cols(path: str) -> list[str]:
    """Walk ``key=value`` directory levels to the leaf files — Spark
    partition layouts nest (day=…/region=…), so one readdir at the root
    sees only the first level and a rewrite from it would silently
    flatten the deeper ones."""
    import os

    cols: list[str] = []
    p = path
    while True:
        subs = [
            e
            for e in sorted(os.listdir(p))
            if "=" in e and os.path.isdir(os.path.join(p, e))
        ]
        if not subs:
            return cols
        keys = {e.split("=", 1)[0] for e in subs}
        if len(keys) != 1:
            raise ValueError(
                f"inconsistent partition directories under {p}: {sorted(keys)}"
            )
        cols.append(keys.pop())
        p = os.path.join(p, subs[0])


def write_events(
    df: DataFrame, path: str, partition_by_day: bool = True, fmt: str = "parquet"
) -> None:
    """Append-only insert sink (S3 equivalent; reference insert
    src/lib.rs:263-303). Partitioned by event date so time-range queries
    prune partitions at scale; ``fmt`` is any columnar lake format
    ("parquet" or "orc")."""
    writer = df.write.mode("append")
    if partition_by_day:
        df = df.withColumn("event_date", F.to_date("ts"))
        writer = df.write.mode("append").partitionBy("event_date")
    writer.format(fmt).save(path)
    invalidate_stats(df.sparkSession, path)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
    delete_col: str | None = None,
) -> dict:
    """MERGE (upsert + optional delete) into a parquet store — the CDC /
    late-correction maintenance primitive next to ``compact_store`` /
    ``cluster_store``: store rows matching an update key are replaced,
    unmatched updates are inserted, and updates flagged true in
    ``delete_col`` remove their matched rows instead.

    Scale shape — **only touched partitions are rewritten**: the distinct
    partition values present in ``updates`` (a tiny driver-side list —
    CDC batches touch few partitions) become literal OR/AND predicates,
    so the store read is partition-pruned, the merge (one anti-join +
    union) sees only those partitions' rows, and the write uses dynamic
    partition overwrite — a 100 TB store pays for the partitions it
    corrects, never a full rewrite. Unpartitioned stores do a full
    rewrite through the same crash-safe two-rename swap as
    ``compact_store`` (and share its concurrency contract: pause other
    writers; a transactional table format is the answer for concurrent
    ones).

    ``updates`` must carry every store column (plus ``delete_col`` if
    used; delete rows may leave non-key columns NULL) and at most one
    row per key. Returns ``{rows_upserted, rows_deleted,
    partitions_rewritten}`` (-1 = unpartitioned full rewrite).
    """
    import os
    import shutil
    from functools import reduce

    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if partition_cols is None:
        partition_cols = _discover_partition_cols(path)
    _recover_swap(path)
    store = spark.read.parquet(path)
    missing = [c for c in store.columns if c not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing store columns {missing}")

    dels = (
        updates.filter(F.col(f"`{delete_col}`")) if delete_col else None
    )
    ins = (
        updates.filter(
            ~F.coalesce(F.col(f"`{delete_col}`"), F.lit(False))
        )
        if delete_col
        else updates
    )
    n_upserted = ins.count()
    n_deleted = dels.count() if dels is not None else 0

    if partition_cols:
        touched = updates.select(*partition_cols).distinct().collect()
        if not touched:
            return {"rows_upserted": 0, "rows_deleted": 0, "partitions_rewritten": 0}
        pred = reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda x, y: x & y,
                    [F.col(f"`{c}`") == F.lit(r[c]) for c in partition_cols],
                )
                for r in touched
            ],
        )
        sub = store.filter(pred)
        merged = sub.join(updates.select(key_cols), key_cols, "left_anti").unionByName(
            ins.select(store.columns)
        )
        # dynamic overwrite only replaces partitions it WRITES: a touched
        # partition whose rows were all deleted produces no output and
        # would silently keep its old files. Find those BEFORE the write
        # (afterwards the lineage would re-read already-replaced files).
        remaining = {
            tuple(r) for r in merged.select(*partition_cols).distinct().collect()
        }
        (
            merged.repartition(*[F.col(f"`{c}`") for c in partition_cols])
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
        for r in touched:
            if tuple(r) not in remaining:
                d = os.path.join(
                    path, *[f"{c}={r[c]}" for c in partition_cols]
                )
                shutil.rmtree(d, ignore_errors=True)
        invalidate_stats(spark, path)
        return {
            "rows_upserted": n_upserted,
            "rows_deleted": n_deleted,
            "partitions_rewritten": len(touched),
        }

    merged = store.join(updates.select(key_cols), key_cols, "left_anti").unionByName(
        ins.select(store.columns)
    )
    tmp, _ = _swap_paths(path)
    merged.write.mode("overwrite").parquet(tmp)
    _finish_swap(path)
    invalidate_stats(spark, path)
    return {
        "rows_upserted": n_upserted,
        "rows_deleted": n_deleted,
        "partitions_rewritten": -1,
    }


# ------------------------------------------------------- snapshots
#
# Dataset versioning for append-only stores — the reproducibility story
# training pipelines need: a snapshot pins the EXACT parquet file set at
# a point in time, so a training job reads the same bytes months later
# even as ingestion keeps appending. A manifest is one JSON file written
# atomically (tmp + rename); reads list exactly its files (with basePath
# so partition columns survive).
#
# Scope contract (documented, not hidden): snapshots compose with
# APPEND-style writers (write_events, streaming sinks) — appends never
# touch old files. The rewrite maintenance ops (compact_store,
# cluster_store, merge_upsert) replace files and therefore INVALIDATE
# older snapshots; snapshot again after maintenance. A transactional
# table format is the 100 TB answer when rewrites must be versioned too.


def snapshot_store(path: str) -> int:
    """Record the store's current parquet file set as the next manifest
    version; returns the version number."""
    import glob
    import json
    import os
    import time

    files = sorted(
        os.path.relpath(f, path)
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
    )
    mdir = os.path.join(path, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    version = max(list_snapshots(path), default=0) + 1
    manifest = {
        "version": version,
        "created_unix": time.time(),
        "n_files": len(files),
        "files": files,
    }
    tmp = os.path.join(mdir, f".v{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(mdir, f"v{version}.json"))
    return version


def list_snapshots(path: str) -> list[int]:
    import glob
    import os
    import re

    out = []
    for f in glob.glob(os.path.join(path, "_manifests", "v*.json")):
        m = re.fullmatch(r"v(\d+)\.json", os.path.basename(f))
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read EXACTLY the files a manifest pinned (latest version by
    default) — concurrent appends after the snapshot are invisible.
    ``basePath`` keeps ``key=value`` partition columns in the schema."""
    import json
    import os

    versions = list_snapshots(path)
    if not versions:
        raise ValueError(f"no snapshots under {path} (run snapshot_store first)")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"snapshot v{version} not found (have {versions})")
    with open(os.path.join(path, "_manifests", f"v{version}.json")) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise ValueError(
            f"snapshot v{version} references {len(missing)} missing files "
            f"(store rewritten since? e.g. {missing[0]}); snapshot again "
            "after maintenance ops"
        )
    if not files:
        return spark.read.schema("__empty string").parquet(path).limit(0)
    return spark.read.option("basePath", path).parquet(*files)


def vacuum_snapshots(path: str, keep: int = 2) -> dict:
    """Drop all but the newest ``keep`` manifests, then delete data files
    that only dropped manifests reference. Files referenced by a kept
    manifest — or by NO manifest (in-flight appends, never snapshotted)
    — are untouched."""
    import json
    import os

    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    versions = list_snapshots(path)
    dropped_v, kept_v = versions[:-keep], versions[-keep:]

    def _files(v: int) -> set[str]:
        with open(os.path.join(path, "_manifests", f"v{v}.json")) as fh:
            return set(json.load(fh)["files"])

    kept_files: set[str] = set().union(*[_files(v) for v in kept_v]) if kept_v else set()
    dead: set[str] = set()
    for v in dropped_v:
        dead |= _files(v) - kept_files
    removed = 0
    for rel in sorted(dead):
        f = os.path.join(path, rel)
        if os.path.exists(f):
            os.remove(f)
            removed += 1
    for v in dropped_v:
        os.remove(os.path.join(path, "_manifests", f"v{v}.json"))
    return {
        "manifests_dropped": len(dropped_v),
        "files_removed": removed,
        "kept_versions": kept_v,
    }


def store_stats(path: str, columns: list[str] | None = None) -> dict:
    """Data-skipping diagnostics from parquet FOOTERS only (no data
    read): per-store file/row-group/byte totals plus per-column row-group
    min/max summaries — the observability for ``cluster_store`` /
    ``compact_store`` decisions ("is this store skippable on ts?" /
    "how fragmented is it?"). At 100 TB footers are KBs per file; the
    driver-side loop is bounded by file count, which compaction keeps
    sane (and which this util is how you notice it isn't).

    Returns ``{files, row_groups, rows, bytes, avg_rows_per_group,
    columns: {col: {n_groups, overlap_fraction, min, max}}}`` where
    ``overlap_fraction`` estimates how UNskippable the column is: the
    mean fraction of OTHER row groups each group's [min, max] range
    overlaps (1.0 → every predicate touches every group; ~0 →
    range-clustered, pruning works)."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path}/**/*.parquet", recursive=True))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    n_groups = 0
    rows = 0
    nbytes = 0
    ranges: dict[str, list[tuple]] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        n_groups += md.num_row_groups
        rows += md.num_rows
        nbytes += md.serialized_size
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            nbytes += rg.total_byte_size
            for ci in range(rg.num_columns):
                col = rg.column(ci)
                name = col.path_in_schema
                if columns is not None and name not in columns:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                ranges.setdefault(name, []).append((st.min, st.max))
    out_cols = {}
    for name, rs in ranges.items():
        overlap = 0.0
        if len(rs) > 1:
            n_overlap = 0
            for i, (lo, hi) in enumerate(rs):
                for j, (lo2, hi2) in enumerate(rs):
                    if i != j and not (hi < lo2 or hi2 < lo):
                        n_overlap += 1
            overlap = n_overlap / (len(rs) * (len(rs) - 1))
        out_cols[name] = {
            "n_groups": len(rs),
            "overlap_fraction": round(overlap, 4),
            "min": min(lo for lo, _ in rs),
            "max": max(hi for _, hi in rs),
        }
    return {
        "files": len(files),
        "row_groups": n_groups,
        "rows": rows,
        "bytes": nbytes,
        "avg_rows_per_group": rows // max(n_groups, 1),
        "columns": out_cols,
    }

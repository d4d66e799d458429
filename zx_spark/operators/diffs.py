"""Snapshot diff — added / removed / changed rows between two versions
of a table (two store snapshots, a pre- and post-curation corpus, a
replica vs its source).

Beyond-reference: the reference engine has no notion of comparing table
versions (its store is append-only per-second state, src/lib.rs); a
training-data pipeline audits every rewrite (dedup pass, PII scrub,
re-ingest) by exactly this diff, so it is first-class here.

Spark shape at 100 TB: each side is PROJECTED to (key, fingerprint) at
the scan — the md5 fingerprint collapses arbitrarily wide compare
columns into 32 bytes, so the full-outer join shuffles ~40 bytes/row
instead of the row. One shuffle per side on the key (sort-merge); when
both snapshots are bucketed/bucket-written by the key (storage.py
write_bucketed) the join plans with NO Exchange at all. Output is only
the differing rows — for two mostly-equal 100 TB snapshots the result
is the (small) symmetric difference, never a materialized copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x1e"

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def row_fingerprint(cols: list[str]):
    """md5 over the stringified columns with unit-separator joins and a
    NULL sentinel — NULL and '' hash apart, and column boundaries cannot
    alias (the same construction as dedup's content hash, so the
    fingerprint is ANSI-SQL-reproducible when an oracle needs it)."""
    if not cols:
        raise ValueError("fingerprint needs at least one column")
    return F.md5(
        F.concat_ws(
            _SEP,
            *[F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(_NULL)) for c in cols],
        )
    )


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
    status_col: str = "diff_status",
    include_unchanged: bool = False,
) -> DataFrame:
    """Rows whose content differs between ``old`` and ``new``, keyed by
    ``key_cols``: status ``added`` (key only in new), ``removed`` (only
    in old), ``changed`` (both, differing ``compare_cols``), and — only
    with ``include_unchanged=True`` — ``unchanged``.

    ``compare_cols`` defaults to every column the two frames share
    except the keys. Keys must be unique and non-NULL per side (a NULL
    key never equi-joins, so it would surface as an added+removed pair;
    duplicate keys fan out the join) — enforce upstream, this is a
    diff, not a validator."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    shared = [c for c in old.columns if c in set(new.columns)]
    if compare_cols is None:
        compare_cols = [c for c in shared if c not in keys]
    missing = [
        c
        for c in [*keys, *compare_cols]
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"columns {missing} must exist in both snapshots")
    if not compare_cols:
        raise ValueError("no columns to compare (key-only frames)")
    o = old.select(*keys, row_fingerprint(compare_cols).alias("__old_fp"))
    n = new.select(*keys, row_fingerprint(compare_cols).alias("__new_fp"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__old_fp").isNull(), F.lit(ADDED))
        .when(F.col("__new_fp").isNull(), F.lit(REMOVED))
        .when(F.col("__old_fp") != F.col("__new_fp"), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    out = j.withColumn(status_col, status)
    if not include_unchanged:
        out = out.filter(F.col(status_col) != UNCHANGED)
    return out.drop("__old_fp", "__new_fp")


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(diff_status, n) counts including ``unchanged`` — the one-line
    audit a pipeline logs after each rewrite. Same single-join plan; the
    count aggregation is map-side partial over the join output."""
    return (
        diff_snapshots(
            old, new, key_cols, compare_cols, include_unchanged=True
        )
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def diff_store_versions(
    spark,
    path: str,
    key_cols: list[str] | str,
    old_version: int,
    new_version: int | None = None,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data view between two SNAPSHOT VERSIONS of one store
    (storage.snapshot_store manifests): what an append-only ingest added
    — or, for keyed re-ingests, changed — between ``old_version`` and
    ``new_version`` (latest by default). Composes ``read_snapshot`` +
    ``diff_snapshots``; each side reads exactly its manifest's files, so
    the diff is reproducible months later regardless of appends since."""
    from zx_spark.storage import read_snapshot

    old = read_snapshot(spark, path, old_version)
    new = read_snapshot(spark, path, new_version)
    return diff_snapshots(old, new, key_cols, compare_cols)

"""Training-shard export — the last mile between a curated corpus and a
data loader: deterministically pre-shuffled, size-balanced parquet
shards plus a JSON manifest the loader can trust without listing/
stat-ing the store.

Why pre-shuffle at export: training wants examples in hash-random order,
and a loader that shuffles 100 TB itself needs either a giant buffer or
multi-pass IO. A deterministic global order by ``md5(key:seed)`` gives
every run (and every resume) the SAME shuffle for free — the property
that makes "epoch 2 starts at shard 741, row 12000" a meaningful
checkpoint.

Shard boundaries are ANALYTIC, not sampled: md5 is uniform, so shard
``i`` is exactly the hash range ``[i/n, (i+1)/n)`` of the 48-bit hash
prefix. (``repartitionByRange`` would balance too, but its
RangePartitioner SAMPLES boundary keys with a run-dependent seed — two
runs could split borderline rows differently, breaking the resume
contract at real scale. Analytic ranges are a pure function of the
row.) Hash uniformity makes the shards row-balanced to ~±1/sqrt(rows
per shard).

Spark shape: ONE hash shuffle on the shard id (every row of a shard
lands in one task; a task holding two shard values still writes one
file per shard via the partitioned writer), rows sorted by (hash, key)
within each shard. Nothing collects on the driver; the manifest is
footer metadata only.

Store scope: manifests are written with local filesystem I/O — the same
contract as storage.py's snapshot manifests. Distributed URIs
(s3://, hdfs://) fail loudly instead of writing a manifest beside the
wrong filesystem."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HASH = "__shard_hash"
_HASH_BITS = 48  # 48-bit prefix: h * n_shards stays far inside int64


def _require_local(path: str) -> str:
    """Validate the store path is local and return its plain-filesystem
    form: ``file://`` URIs are accepted (Spark writes them fine) but the
    manifest step uses glob/open, which treat ``file:`` as a literal
    directory — so the scheme is stripped here, once, and every local
    I/O call uses the returned path."""
    if path.startswith("file://"):
        local = path[len("file://") :]
        if not local.startswith("/"):
            raise ValueError(
                f"{path!r}: file:// URIs must be absolute (file:///...)"
            )
        return local
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path):
        raise ValueError(
            f"{path!r} is not a local/file path — the shard manifest is "
            "written with local filesystem I/O (same scope as storage.py "
            "snapshots); mount the store or write the manifest via your "
            "object-store client"
        )
    return path


def _shard_expr(key, seed: int, n_shards: int):
    h = F.md5(
        F.concat(
            F.coalesce(key.cast("string"), F.lit("__null__")), F.lit(f":{seed}")
        )
    )
    # EXACT integer boundary math: shard = (h48 * n) >> 48 — no float
    # division whose rounding could flip a borderline row, and
    # h48 * n_shards stays inside int64 for any sane shard count
    h48 = F.conv(F.substring(h, 1, _HASH_BITS // 4), 16, 10).cast("long")
    shard = F.shiftright(h48 * F.lit(n_shards), _HASH_BITS).cast("int")
    return h, shard


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    seed: int = 0,
) -> dict:
    """Write ``n_shards`` hash-shuffled parquet shards
    (``shard=<i>/part-*.parquet``) + ``_shards.json``.

    Every row's shard AND position are a pure function of
    ``(key, seed)``: shard = the analytic md5 range, order = (hash, key)
    within the shard. Re-running with the same inputs reproduces the
    identical layout; a different ``seed`` is a fresh epoch-level
    shuffle of the same corpus.

    Returns the manifest dict: ``{n_shards, n_rows, seed, key_col,
    shards: [{shard, dir, rows}, ...]}`` (an empty hash range writes no
    directory and is omitted — only possible when shards ≫ rows)."""
    if not 1 <= n_shards <= 32768:
        raise ValueError(f"n_shards must be in 1..32768, got {n_shards}")
    local_path = _require_local(path)
    key = F.col(f"`{key_col}`")
    h, shard = _shard_expr(key, seed, n_shards)
    arranged = (
        df.withColumn(_HASH, h)
        .withColumn("shard", shard)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(F.col("shard"), F.col(_HASH), key)
        .drop(_HASH)
    )
    arranged.write.mode("overwrite").partitionBy("shard").parquet(path)
    # manifest from the written store (counts observed, not assumed) —
    # footer reads only, no Spark jobs
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    shards = []
    total = 0
    for d in sorted(
        glob.glob(os.path.join(local_path, "shard=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    ):
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )
        shards.append(
            {"shard": int(d.rsplit("=", 1)[1]), "dir": os.path.basename(d), "rows": n}
        )
        total += n
    manifest = {
        "n_shards": n_shards,
        "n_rows": total,
        "seed": seed,
        "key_col": key_col,
        "shards": shards,
    }
    tmp = os.path.join(local_path, "._shards.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(local_path, "_shards.json"))
    return manifest


def read_shard_manifest(path: str) -> dict:
    import json
    import os

    local_path = _require_local(path)
    with open(os.path.join(local_path, "_shards.json")) as fh:
        return json.load(fh)


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read the export — all shards, or an explicit subset (a loader
    resuming mid-epoch, or a worker reading its assignment). Subsets
    read ONLY those shard directories (no full listing scan); the
    ``shard`` column survives as a partition column either way."""
    import os

    if shards is None:
        return spark.read.option("basePath", path).parquet(path)
    m = read_shard_manifest(path)
    by_no = {s["shard"]: s["dir"] for s in m["shards"]}
    missing = [s for s in shards if s not in by_no]
    if missing:
        raise ValueError(
            f"shards {missing} not in manifest (have {sorted(by_no)})"
        )
    return spark.read.option("basePath", path).parquet(
        *[os.path.join(path, by_no[s]) for s in shards]
    )

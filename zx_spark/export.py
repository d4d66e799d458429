"""Training-shard export — the last mile between a curated corpus and a
data loader: deterministically pre-shuffled, size-balanced parquet
shards plus a JSON manifest the loader can trust without listing/
stat-ing the store.

Why pre-shuffle at export: training wants examples in hash-random order,
and a loader that shuffles 100 TB itself needs either a giant buffer or
multi-pass IO. A deterministic global order by ``md5(id)`` gives every
run (and every resume) the SAME shuffle for free — the property that
makes "epoch 2 starts at shard 741, row 12000" a meaningful checkpoint.

Spark shape: ONE range-partitioning shuffle on the hash key
(``repartitionByRange`` samples the key distribution, so shards come
out row-balanced without a driver-side histogram), rows sorted by the
hash within each shard (``sortWithinPartitions`` — no extra exchange),
one file per shard via the partition writer. At 100 TB this is exactly
one full-data shuffle — the same cost any shuffled-materialization
pays — and nothing collects on the driver except the per-shard counts
for the manifest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HASH = "__shard_hash"


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    seed: int = 0,
) -> dict:
    """Write ``n_shards`` hash-shuffled parquet shards + ``_shards.json``.

    Every row's position is a pure function of ``(key, seed)``: rows are
    globally ordered by ``md5(key:seed)`` (ties by key), range-split
    into ``n_shards`` balanced shards, one file per shard. Re-running
    with the same inputs reproduces byte-identical order; a different
    ``seed`` is a fresh epoch-level shuffle of the same corpus.

    Returns the manifest dict: ``{n_shards, n_rows, seed, key_col,
    shards: [{shard, rows}, ...]}``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(f"`{key_col}`")
    h = F.md5(
        F.concat(
            F.coalesce(key.cast("string"), F.lit("__null__")), F.lit(f":{seed}")
        )
    )
    hashed = df.withColumn(_HASH, h)
    arranged = hashed.repartitionByRange(
        n_shards, F.col(_HASH), key
    ).sortWithinPartitions(F.col(_HASH), key)
    arranged.drop(_HASH).write.mode("overwrite").parquet(path)
    # manifest from the written store (counts observed, not assumed) —
    # footer reads only, no Spark jobs
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    shards = []
    total = 0
    for i, f in enumerate(files):
        n = pq.ParquetFile(f).metadata.num_rows
        shards.append({"shard": i, "file": os.path.basename(f), "rows": n})
        total += n
    manifest = {
        "n_shards": len(files),
        "n_rows": total,
        "seed": seed,
        "key_col": key_col,
        "shards": shards,
    }
    tmp = os.path.join(path, "._shards.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(path, "_shards.json"))
    return manifest


def read_shard_manifest(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "_shards.json")) as fh:
        return json.load(fh)


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read the export — all shards, or an explicit subset (a loader
    resuming mid-epoch, or a worker reading its assignment). Subsets
    read ONLY those files (no full listing scan)."""
    import os

    if shards is None:
        return spark.read.parquet(path)
    m = read_shard_manifest(path)
    by_no = {s["shard"]: s["file"] for s in m["shards"]}
    missing = [s for s in shards if s not in by_no]
    if missing:
        raise ValueError(f"shards {missing} not in manifest (0..{m['n_shards']-1})")
    return spark.read.parquet(*[os.path.join(path, by_no[s]) for s in shards])

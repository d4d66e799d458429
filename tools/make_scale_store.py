"""Build a ~10x replica of an sf store for the second-scale bench point.

Each replica shifts its join/id keys by a disjoint offset so joins stay
consistent WITHIN a replica and never match ACROSS replicas — input size
scales 10x and join output scales 10x (duplicating rows without shifting
would grow join fan-out quadratically and measure the wrong thing).
Dimension tables (region, nation) keep one copy, like real scale-ups.
Document text gets a per-replica per-token prefix so cross-replica rows
are not near-duplicates of each other (otherwise the MinHash candidate
buckets would grow quadratically instead of linearly); the per-replica
internal dup structure is preserved exactly.

Usage: python tools/make_scale_store.py [dst_dir] [n_replicas]
Then:  SPARK_GRAFT_SF_DIR=<dst_dir> python bench.py
"""

from __future__ import annotations

import sys
from functools import reduce

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000  # > every key in the sf0.1 store

SHIFT_KEYS: dict[str, list[str]] = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> None:
    from pyspark.sql import functions as F

    from zx_spark.session import get_spark
    from zx_spark.storage import read_table

    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zx_scale/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("make_scale_store")

    for t in DIMS:
        # read_table normalizes nanos timestamps to TimestampType so the
        # rewritten store round-trips through plain spark.read.
        read_table(spark, SRC, t).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"# {t}: 1 copy (dimension)", file=sys.stderr)

    for t, keys in SHIFT_KEYS.items():
        src = read_table(spark, SRC, t)
        parts = []
        for i in range(n):
            d = src
            for k in keys:
                d = d.withColumn(k, (F.col(k) + F.lit(i * OFF)).cast("long"))
            if t == "documents" and i:
                d = d.withColumn(
                    "text", F.regexp_replace(F.col("text"), r"(\S+)", f"r{i}x$1")
                ).withColumn("source", F.concat(F.col("source"), F.lit(f"_r{i}")))
            parts.append(d)
        out = reduce(lambda a, b: a.unionByName(b), parts)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"# {t}: {n} replicas", file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()

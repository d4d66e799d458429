"""Similarity search over embedding columns (``array<float>``).

Three tiers, all deterministic:

- ``cosine_topk``        — brute-force exact top-k (the correctness
                           baseline; one scan + one small top-k reduce).
- ``rp_lsh_*``           — random-hyperplane LSH: sign-bit bucket keys from
                           seeded hyperplanes; near-dup pairs come from a
                           bucket equi-join (never all-pairs).
- ``ivf_build/ivf_topk`` — IVF coarse index via Spark ML KMeans: search
                           only the ``nprobe`` nearest cells — the 100 TB
                           path (prunes the scan by cluster id, which a
                           Parquet layout partitioned by cell turns into
                           partition pruning).

Dot products/norms use ``F.zip_with`` + ``F.aggregate`` — JVM-side, no
Python in the scan.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to cluster parallelism — embedding dot
    products are CPU-heavy per row and small parquet inputs otherwise run
    as a single task. No-op when the input is already well-partitioned."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.greatest(_norm(a) * _norm(b), F.lit(1e-12))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to one query vector.

    One distributed projection + Spark's TakeOrdered (per-partition top-k,
    then a k-sized merge on the driver) — no full sort, no shuffle of the
    data itself."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    return (
        _spread(df).select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_lsh_bucket(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane sign-bit bucket id (SimHash for vectors): bit i =
    sign(v · h_i) with seeded hyperplanes embedded as literal arrays."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = vec.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, h) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def rp_lsh_near_pairs(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 3,
) -> DataFrame:
    """Embedding near-duplicate pairs: candidates from ``n_tables``
    independent LSH bucket equi-joins (union), verified with exact cosine ≥
    threshold. All joins are equality joins on (table, bucket)."""
    buckets = _spread(df).select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(
            F.array(
                *[
                    rp_lsh_bucket(F.col(vec_col), dim, n_planes, seed=1000 + t)
                    for t in range(n_tables)
                ]
            )
        ).alias("table_no", "bucket"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.table_no") == F.col("b.table_no"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col(f"a.{vec_col}").cast("array<double>"),
                           F.col(f"b.{vec_col}").cast("array<double>")), 6).alias("cosine"),
        )
        .distinct()
    )
    return cands.filter(F.col("cosine") >= threshold)


def ivf_build(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
):
    """Fit an IVF coarse quantizer (Spark ML KMeans) and assign every vector
    to its cell. Returns (assigned_df with ``ivf_cell``, centers ndarray).

    At 100 TB the assigned table is written partitioned by ``ivf_cell`` so
    a probe reads only nprobe/n_cells of the data (partition pruning)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    feat = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="__features", predictionCol="ivf_cell").fit(feat)
    assigned = model.transform(feat).drop("__features")
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centers


def ivf_topk(
    assigned: DataFrame,
    centers: np.ndarray,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k: score only the ``nprobe`` cells whose centroids are
    nearest the query (computed driver-side on the tiny centers array),
    then exact cosine within them."""
    q = np.asarray(query_vec, dtype=float)
    sims = centers @ q / (np.linalg.norm(centers, axis=1) * np.linalg.norm(q) + 1e-12)
    probe_cells = [int(c) for c in np.argsort(-sims)[:nprobe]]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine(F.col(vec_col).cast("array<double>"), qcol)
    return (
        assigned.filter(F.col("ivf_cell").isin(probe_cells))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )

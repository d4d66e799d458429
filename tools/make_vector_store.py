"""Synthetic clustered embedding store for the distributed-fit regime
measurement (SCALE.md r11, VERDICT r10 item 1): the replica stores top
out at 100x the 2k-row sf0.1 embeddings table, far below the >=10^7-row
regime ``ivf2_fit_dist`` exists for, so this writes an N-row clustered
corpus DISTRIBUTED (mapInPandas over ``spark.range`` — the corpus never
exists driver-side, matching the regime's own constraint).

Shape matches tools/ann_recall.py's clustered case: ``kc`` gaussian
cluster centers, within-cluster sigma 0.3 — the structure real
embedding corpora have and the structure an IVF fit must recover.
Every value is a pure function of (vec_id, dim index): cluster choice
and noise come from splitmix64-keyed Box-Muller, so the store is
byte-reproducible regardless of partitioning (no RNG state shared
across rows; Date-free per the workflow-resume rule). Schema matches
the driver testdata (vec_id int64, embedding list<float>).

This is a MEASUREMENT store: nothing oracle-replays it (the fits under
test carry their own numpy twins); determinism here is for rerunnable
measurements, not correctness gates.

Usage: python tools/make_vector_store.py <dst> <n> [dim=64] [kc=1024]
Then:  python tools/ann_dist_regime.py <dst> --arm dist ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

U64 = np.uint64


def _sm64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (wrapping arithmetic is
    the algorithm, not an accident)."""
    x = (x + U64(0x9E3779B97F4A7C15)).astype(U64)
    x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
    return x ^ (x >> U64(31))


def _unit(x: np.ndarray) -> np.ndarray:
    """uint64 -> uniform in (0, 1): top 53 bits, nudged off exact 0 so
    log() below is finite."""
    return (x >> U64(11)).astype(np.float64) * (2.0**-53) + 1e-300


def make_batch(ids: np.ndarray, centers: np.ndarray, sigma: float) -> np.ndarray:
    """(len(ids), dim) float32 block — cluster pick + Box-Muller noise,
    all keyed on vec_id so any partitioning yields the same rows."""
    kc, dim = centers.shape
    cl = (_sm64(ids.astype(U64)) % U64(kc)).astype(np.int64)
    # counter = id * 2*dim + 2*j (+1) — a disjoint stream per (row, dim)
    base = ids.astype(U64)[:, None] * U64(2 * dim)
    j2 = (U64(2) * np.arange(dim, dtype=U64))[None, :]
    u1 = _unit(_sm64(base + j2))
    u2 = _unit(_sm64(base + j2 + U64(1)))
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return (centers[cl] + sigma * z).astype(np.float32)


def main() -> None:
    dst = sys.argv[1]
    n = int(sys.argv[2])
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    kc = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

    import pandas as pd

    from zx_spark.session import get_spark

    # cluster centers are tiny (kc x dim) and ride the task closure
    centers = np.random.RandomState(7).randn(kc, dim)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            X = make_batch(ids, centers, sigma=0.3)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(X)})

    spark = get_spark("make_vector_store")
    # ~2^17 rows/partition: each task's generation block stays ~128 MB
    # and the written files land near the 128 MB scan-split sweet spot
    parts = max(32, n // (1 << 17))
    (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(f"{dst}/embeddings.parquet")
    )
    print(f"# wrote {n} x {dim} ({kc} clusters) -> {dst}/embeddings.parquet",
          file=sys.stderr)


if __name__ == "__main__":
    main()

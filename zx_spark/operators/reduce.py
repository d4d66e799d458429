"""PCA dimensionality reduction for embedding pipelines — the standard
pre-ANN compression stage (project d-dim vectors onto the top-k principal
components before indexing/search), built Spark-first with an EXACT
integer moment computation:

- **Vectors are micro-quantized first** (``q = round(v·1e6)`` bigints),
  so the corpus moments — count, per-dimension sums, and the d×d Gramian
  ``ΣqqᵀT`` — are exact integer arithmetic: order-free under any
  partitioning, any partial-agg order, any engine. This is a stronger
  determinism discipline than the 6-dp-rounded Lloyd averages the IVF/PQ
  quantizers use (those round away fp-order noise; here there is none).
- **One distributed pass.** ``mapInPandas`` emits per-batch integer
  moment rows (d + d² bigints each — thousands of bytes, not corpus);
  the driver sums them with Python ints (unbounded, overflow-free) and
  eigendecomposes the scatter matrix ``N·Σqqᵀ − (Σq)(Σq)ᵀ`` once.
  Eigenvectors are deterministic because the eigh INPUT is bit-identical
  however the corpus was partitioned — ``pca_fit_numpy`` re-derives the
  same model from raw parquet, which is what lets the DuckDB oracle
  embed the components as literals.
- **Projection is engine-exact.** Components are stored as micro
  integers; a projected coordinate is ``(q·cₖ − offₖ)/1e12`` where the
  bigint dot and the precomputed mean offset are exact — one double
  division at the end, identical IEEE on every engine. Pure Catalyst:
  no join, no shuffle, no Python at projection time.

At 100 TB: the fit is one scan emitting ~d² ints per batch; projection
is scan-speed whole-stage codegen; downstream ANN (cosine_topk, IVF, PQ)
runs on out_dim ≪ d arrays — a d/out_dim× scan-byte cut that composes
with int8/PQ compression.

No reference parity — the reference has no vector surface (SURVEY §2.2);
beyond-reference operator extending the ANN family
(operators/similarity.py).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zx_spark.util import lit_array
from pyspark.sql import types as T

MICRO = 1_000_000
MICRO2 = float(MICRO) * float(MICRO)  # 1e12, the double both engines divide by


def _quantize_col(v: Column) -> Column:
    """array<bigint> of round(v·1e6) — HALF_UP away from zero, matching
    DuckDB ``round(x*1000000)::bigint`` (the int8-arm precedent)."""
    return F.transform(
        v.cast("array<double>"), lambda x: F.round(x * MICRO).cast("long")
    )


def _quantize_py(x: float) -> int:
    # Decimal HALF_UP over the exact double — equivalent to Spark's
    # BigDecimal round and DuckDB's std::round for every representable
    # input (shortest-repr vs exact-binary can only disagree at a .5
    # boundary, where the shortest repr IS exact).
    return int(Decimal(float(x) * MICRO).quantize(Decimal(1), ROUND_HALF_UP))


def _round_half_away(num: int, den: int) -> int:
    """Exact HALF_UP-away-from-zero of the rational num/den (den > 0)."""
    if num >= 0:
        return (2 * num + den) // (2 * den)
    return -((-2 * num + den) // (2 * den))


def _model_from_moments(n: int, s: list[int], G, out_dim: int) -> dict:
    """Moments → model. ``s``/``G`` are EXACT integers (Python int /
    object-dtype matrix), so the float64 scatter matrix handed to eigh is
    bit-identical however the moments were accumulated."""
    d = len(s)
    sv = np.array(s, dtype=object)
    scatter = np.asarray(G, dtype=object) * n - np.outer(sv, sv)
    vals, vecs = np.linalg.eigh(np.array(scatter, dtype=np.float64))
    order = np.argsort(vals, kind="stable")[::-1][:out_dim]
    comps: list[list[int]] = []
    eig: list[float] = []
    for j in order:
        c = vecs[:, j]
        # sign convention: the largest-|entry| coordinate (first index on
        # ties) is positive — eigh's sign is arbitrary, this pins it
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c = -c
        comps.append([_quantize_py(float(x)) for x in c])
        eig.append(float(vals[j]) / (float(n) * float(n) * MICRO2))
    offs = [
        _round_half_away(sum(int(si) * int(ci) for si, ci in zip(s, comp)), n)
        for comp in comps
    ]
    return {
        "n": n,
        "dim": d,
        "out_dim": out_dim,
        "components_micro": comps,
        "offsets_micro2": offs,
        "explained_variance": eig,
    }


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    dim: int | None = None,
) -> dict:
    """Fit PCA in one distributed pass: micro-quantize, emit per-batch
    integer moments, driver-sum exactly, eigendecompose the scatter
    matrix once. Deterministic under ANY partitioning (the moments are
    exact integers); byte-identical to ``pca_fit_numpy`` on the same
    rows.

    Per-batch Gramian entries stay far from int64 overflow: |q| ≲ 1e6
    for unit-scale embeddings, so ~1e12 per product, ~1e16-1e17 per
    10k-row Arrow batch — the driver accumulates across batches in
    unbounded Python ints."""
    if dim is None:
        dim = len(df.select(F.col(vec_col)).first()[0])
    q = df.select(_quantize_col(F.col(vec_col)).alias("__q"))
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.LongType())),
            T.StructField("g", T.ArrayType(T.LongType())),
        ]
    )
    d = dim

    def moments(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.array(pdf["__q"].to_list(), dtype=np.int64)
            G = Q.T @ Q
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "s": [Q.sum(axis=0).tolist()],
                    "g": [G.reshape(-1).tolist()],
                }
            )

    n = 0
    s = [0] * d
    G = [[0] * d for _ in range(d)]
    for r in q.mapInPandas(moments, schema).collect():
        n += int(r["n"])
        rs, rg = r["s"], r["g"]
        for i in range(d):
            s[i] += int(rs[i])
            Gi = G[i]
            base = i * d
            for j in range(d):
                Gi[j] += int(rg[base + j])
    if n == 0:
        raise ValueError("cannot fit PCA on an empty table")
    if out_dim > d:
        raise ValueError(f"out_dim {out_dim} > dim {d}")
    return _model_from_moments(n, s, G, out_dim)


def pca_fit_numpy(X, out_dim: int = 16) -> dict:
    """Driver-side twin of ``pca_fit`` — same quantization, same exact
    integer moments (order-free, so identical regardless of how Spark
    batched them), same eigh, same sign/rounding. Pins Spark ≡ numpy in
    tests and lets the DuckDB oracle re-derive the components from raw
    parquet without a SparkSession."""
    Q = np.array(
        [[_quantize_py(float(x)) for x in row] for row in np.asarray(X)],
        dtype=np.int64,
    )
    n, d = Q.shape
    if out_dim > d:
        raise ValueError(f"out_dim {out_dim} > dim {d}")
    G = (Q.T.astype(object)) @ (Q.astype(object))  # exact (object ints)
    s = [int(x) for x in Q.sum(axis=0)]
    return _model_from_moments(n, s, G, out_dim)


def _project_exprs(v: Column, model: dict) -> list[Column]:
    q = _quantize_col(v)
    out = []
    for comp, off in zip(model["components_micro"], model["offsets_micro2"]):
        cm = lit_array([int(x) for x in comp])
        dot = F.aggregate(
            F.zip_with(q, cm, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        out.append((dot - F.lit(int(off))).cast("double") / F.lit(MICRO2))
    return out


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Replace ``vec_col`` with its ``out_dim``-dim projection (other
    columns pass through). Pure Catalyst — one bigint fold per component,
    one division each; values are exact multiples of 1e-12, identical on
    every engine."""
    return df.withColumn(out_col, F.array(*_project_exprs(F.col(vec_col), model)))


def pca_project_py(vec, model: dict) -> list[float]:
    """Driver-side twin of ``pca_project`` for one vector (query vectors,
    tests) — exact same integer arithmetic, same single division."""
    q = [_quantize_py(float(x)) for x in vec]
    out = []
    for comp, off in zip(model["components_micro"], model["offsets_micro2"]):
        dot = sum(qi * ci for qi, ci in zip(q, comp))
        out.append((dot - off) / MICRO2)
    return out


def pca_topk(
    df: DataFrame,
    model: dict,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine top-k in the reduced space: project corpus and query with
    the same exact arithmetic, then brute-force top-k over out_dim-wide
    arrays — a dim/out_dim× cheaper scan than full-width search, the
    standard recall/throughput dial ahead of (or instead of) IVF/PQ."""
    from zx_spark.operators.similarity import cosine_topk

    proj = pca_project(df, model, vec_col).select(id_col, "pca")
    return cosine_topk(proj, pca_project_py(query_vec, model), vec_col="pca", id_col=id_col, k=k)

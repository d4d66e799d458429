"""PCA (operators/reduce.py): exact-integer moments, Spark ≡ numpy-twin
fit, engine-exact projection, geometric properties (component recovery,
distance preservation at full rank), plan shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from zx_spark.operators.reduce import (
    MICRO,
    MICRO2,
    _quantize_py,
    _round_half_away,
    pca_fit,
    pca_fit_numpy,
    pca_project,
    pca_project_py,
    pca_topk,
)


def test_round_helpers():
    assert _quantize_py(1.2345675) in (1234567, 1234568)  # fp boundary, sane
    assert _quantize_py(0.5e-6) == 1  # half rounds away from zero
    assert _quantize_py(-0.5e-6) == -1
    assert _round_half_away(5, 2) == 3
    assert _round_half_away(-5, 2) == -3
    assert _round_half_away(4, 2) == 2


def _emb_df(spark):
    from zx_spark.storage import read_table

    return read_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_spark_fit_equals_numpy_twin(spark):
    df = _emb_df(spark)
    m = pca_fit(df, out_dim=4, dim=64)
    X = np.array([r["embedding"] for r in df.select("embedding").collect()])
    mt = pca_fit_numpy(X, out_dim=4)
    assert m == mt


def test_fit_deterministic_under_repartitioning(spark):
    df = _emb_df(spark)
    m1 = pca_fit(df.repartition(17), out_dim=3, dim=64)
    m2 = pca_fit(df.coalesce(1), out_dim=3, dim=64)
    assert m1 == m2  # exact integer moments: order-free by construction


def test_recovers_planted_direction(spark):
    # points along a fixed direction + small orthogonal noise: the first
    # component must align with the direction (|cos| ~ 1)
    rng = np.random.RandomState(7)
    d = 8
    direction = np.ones(d) / math.sqrt(d)
    t = rng.uniform(-2, 2, size=200)
    noise = rng.normal(scale=0.01, size=(200, d))
    X = np.outer(t, direction) + noise
    m = pca_fit_numpy(X, out_dim=2)
    c0 = np.array(m["components_micro"][0], dtype=np.float64) / MICRO
    cos = abs(float(c0 @ direction) / (np.linalg.norm(c0)))
    assert cos > 0.999
    assert m["explained_variance"][0] > m["explained_variance"][1]


def test_projection_spark_equals_python_twin(spark):
    df = _emb_df(spark).limit(50)
    X = np.array([r["embedding"] for r in df.select("embedding").collect()])
    m = pca_fit_numpy(X, out_dim=5)
    got = {
        r["vec_id"]: list(r["pca"])
        for r in pca_project(df, m).select("vec_id", "pca").collect()
    }
    rows = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for vid, vec in rows.items():
        assert got[vid] == pca_project_py(vec, m), vid


def test_full_rank_preserves_distances():
    # out_dim == dim → orthogonal transform + translation: pairwise
    # euclidean distances survive up to quantization error (~1e-6/coord)
    rng = np.random.RandomState(3)
    X = rng.normal(size=(40, 6))
    m = pca_fit_numpy(X, out_dim=6)
    P = np.array([pca_project_py(x, m) for x in X])
    for a, b in [(0, 1), (5, 17), (20, 39)]:
        d_orig = np.linalg.norm(X[a] - X[b])
        d_proj = np.linalg.norm(P[a] - P[b])
        assert abs(d_orig - d_proj) < 1e-4


def test_components_orthonormal():
    rng = np.random.RandomState(11)
    X = rng.normal(size=(100, 10))
    m = pca_fit_numpy(X, out_dim=4)
    C = np.array(m["components_micro"], dtype=np.float64) / MICRO
    G = C @ C.T
    assert np.allclose(G, np.eye(4), atol=1e-5)


def test_pca_topk_shape_and_projection_plan(spark):
    df = _emb_df(spark)
    m = pca_fit(df, out_dim=8, dim=64)
    top = pca_topk(df, m, [1.0] + [0.0] * 63, k=5).collect()
    assert len(top) == 5
    assert top[0]["cosine"] >= top[-1]["cosine"]
    plan = (
        pca_project(df, m)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_out_dim_validation(spark):
    rng = np.random.RandomState(1)
    with pytest.raises(ValueError):
        pca_fit_numpy(rng.normal(size=(10, 4)), out_dim=5)

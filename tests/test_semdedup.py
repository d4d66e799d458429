"""SemDeDup-style semantic dedup (operators/semdedup.py): planted-pair
recall, keep-rule correctness, numpy-twin center parity, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zx_spark.operators.semdedup import (
    centroid_cosine,
    semantic_dedup,
    semantic_dedup_fit,
    semantic_dropped_ids,
    semantic_pairs,
)
from zx_spark.storage import read_table

SF_DIR = "/root/testdata/sf0.001"


def _with_planted(spark, sf_dir=SF_DIR):
    """The driver-row construction: each embedding unioned with a
    deterministically perturbed copy at vec_id + 1_000_000."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.lit(0.01) * (F.pmod(i, F.lit(5)).cast("double") - F.lit(2.0)) / F.lit(2.0),
        ).alias("embedding"),
    )
    return emb.unionByName(planted)


@pytest.fixture(scope="module")
def fitted(spark):
    allv = _with_planted(spark)
    annotated, centers = semantic_dedup_fit(allv, n_cells=8, iters=5, dim=64)
    annotated = annotated.localCheckpoint()
    return allv, annotated, centers


def test_semantic_pairs_recall_and_precision(spark, fitted):
    allv, annotated, _ = fitted
    pairs = semantic_pairs(annotated, threshold=0.95).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    n = allv.count() // 2
    planted = {(i, i + 1_000_000) for i in range(n)}
    # Planted cosine ~0.9984; random-pair cosine ~0 → every found pair is
    # planted. Recall is bounded only by cluster-boundary splits (the
    # documented SemDeDup limitation) — ≥90% in practice at 8 cells.
    assert found <= planted
    assert len(found) >= 0.9 * n
    for r in pairs:
        assert r["cosine"] >= 0.95


def test_keep_rule_drops_exactly_the_pair_losers(spark, fitted):
    allv, annotated, _ = fitted
    pairs = semantic_pairs(annotated, threshold=0.95)
    rows = pairs.collect()
    losers = set()
    for r in rows:
        a_wins = (r["ccos_a"], r["id_a"]) < (r["ccos_b"], r["id_b"])
        losers.add(r["id_b"] if a_wins else r["id_a"])
    dropped = {r["vec_id"] for r in semantic_dropped_ids(pairs).collect()}
    assert dropped == losers
    kept = semantic_dedup(allv, n_cells=8, iters=5, threshold=0.95, dim=64)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert kept_ids == {r["vec_id"] for r in allv.select("vec_id").collect()} - losers


def test_keep_priority_prefers_far_from_centroid(spark, fitted):
    # Per the paper: the survivor of each pair is the one LESS similar to
    # its cluster centroid.
    _, annotated, _ = fitted
    pairs = semantic_pairs(annotated, threshold=0.95)
    dropped = {r["vec_id"] for r in semantic_dropped_ids(pairs).collect()}
    for r in pairs.collect():
        if r["ccos_a"] != r["ccos_b"]:
            loser = r["id_a"] if r["ccos_a"] > r["ccos_b"] else r["id_b"]
            assert loser in dropped


def test_centers_match_numpy_twin(spark, fitted):
    # The centers over the planted union must be re-derivable by
    # ivf_centers_numpy from raw parquet + a pure-Python perturbation —
    # that is what lets the DuckDB oracle embed them as literals.
    import pyarrow.parquet as pq

    from zx_spark.operators.similarity import ivf_centers_numpy

    _, _, centers = fitted
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    pert = np.array(
        [
            [v + (0.01 * ((i % 5) - 2.0)) / 2.0 for i, v in enumerate(row)]
            for row in X.tolist()
        ]
    )
    all_ids = np.concatenate([ids, ids + 1_000_000])
    all_X = np.vstack([X, pert])
    twin = ivf_centers_numpy(all_ids, all_X, n_cells=8, iters=5)
    assert np.array_equal(np.asarray(centers), twin)


def test_centroid_cosine_is_exact(spark, fitted):
    _, annotated, centers = fitted
    row = annotated.select("vec_id", "embedding", "ivf_cell", "centroid_cos").first()
    v = np.array(row["embedding"], dtype=np.float64)
    c = np.asarray(centers)[row["ivf_cell"]]
    expect = float(v @ c) / max(np.linalg.norm(v) * np.linalg.norm(c), 1e-12)
    assert row["centroid_cos"] == pytest.approx(round(expect, 6), abs=1e-9)


def test_no_cartesian_and_no_python_in_plan(spark, fitted):
    allv, annotated, _ = fitted
    plan = semantic_pairs(annotated, threshold=0.95)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    kplan = (
        semantic_dedup(allv, n_cells=8, iters=5, threshold=0.95, dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in kplan


def test_determinism_across_runs(spark, fitted):
    allv, _, _ = fitted
    a = semantic_dedup(allv, n_cells=8, iters=5, threshold=0.95, dim=64)
    b = semantic_dedup(allv, n_cells=8, iters=5, threshold=0.95, dim=64)
    assert sorted(r["vec_id"] for r in a.select("vec_id").collect()) == sorted(
        r["vec_id"] for r in b.select("vec_id").collect()
    )


def test_kmeans_method_drops_planted_dups_too(spark):
    # throughput path: Spark ML KMeans cells instead of the deterministic
    # Lloyd fit — same pair/drop semantics, no oracle reproducibility
    allv = _with_planted(spark)
    kept = semantic_dedup(
        allv, n_cells=8, threshold=0.95, dim=64, method="kmeans"
    )
    n = kept.count()
    assert 500 <= n <= 520  # ~497 of 1000 dropped, same as the lloyd path


def test_fit_rejects_unknown_method(spark):
    allv = _with_planted(spark)
    with pytest.raises(ValueError, match="method"):
        semantic_dedup_fit(allv, method="dbscan")


def test_suggest_n_cells_sqrt_rule():
    """suggest_n_cells = clamp(round(sqrt(N))) — the sizing rule the
    SCALE.md knn+triangles caveat prescribes (fixed cells at 10x data
    measured 7.3x; resized cells return the build to trend)."""
    import pytest

    from zx_spark.operators.similarity import suggest_n_cells

    assert suggest_n_cells(1) == 8          # floor
    assert suggest_n_cells(2000) == 45
    assert suggest_n_cells(20000) == 141
    assert suggest_n_cells(200000) == 447
    assert suggest_n_cells(10**12) == 65536  # cap
    with pytest.raises(ValueError):
        suggest_n_cells(0)

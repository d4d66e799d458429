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


def test_sampled_method_drops_planted_dups_and_bounds_cells(spark):
    """r9: the hash-sample + rebalance fit — same pair/drop semantics
    as lloyd (planted twins still drop), deterministic across reruns,
    and no cell holds more than ~2x the implied target (the quadratic
    pair-join tax the split exists to cut)."""
    import numpy as np

    from zx_spark.operators.semdedup import semantic_dedup_fit

    allv = _with_planted(spark)
    kept = semantic_dedup(
        allv, n_cells=8, threshold=0.95, dim=64, method="sampled"
    )
    n = kept.count()
    assert 500 <= n <= 520  # same drop mass as the lloyd/kmeans paths
    ann, centers = semantic_dedup_fit(
        allv, n_cells=8, dim=64, method="sampled"
    )
    ann2, centers2 = semantic_dedup_fit(
        allv, n_cells=8, dim=64, method="sampled"
    )
    assert np.array_equal(np.asarray(centers), np.asarray(centers2))
    import math

    total = allv.count()
    # the library bound is 2*ceil(total/n_cells), BEST-EFFORT under
    # max_rounds (r9 review: // was tighter than the contract and
    # passed only because the fixture divides evenly)
    target = math.ceil(total / 8)
    sizes = [r["n"] for r in ann.groupBy("ivf_cell").count()
             .withColumnRenamed("count", "n").collect()]
    assert max(sizes) <= 2 * target, (max(sizes), target)


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


# --------------------------------------------- two-level IVF (r8 scale path)


def _emb(spark, n=400, dim=16, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    X = rng.randn(n, dim)
    return (
        spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        ),
        np.arange(n),
        X,
    )


def test_ivf2_assign_exact_when_full_probe(spark):
    """p_super == n_super scores every child — assignment must equal
    the single-level ivf_assign argmin cell-for-cell."""
    from zx_spark.operators.similarity import (
        ivf2_assign, ivf2_fit_numpy, ivf_assign)

    df, ids, X = _emb(spark)
    centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=24, n_super=5)
    a1 = {r["vec_id"]: r["ivf_cell"] for r in ivf_assign(
        df, [[float(x) for x in c] for c in centers], "embedding").collect()}
    a2 = {r["vec_id"]: r["ivf_cell"] for r in ivf2_assign(
        df, centers, supers, children, p_super=len(supers)).collect()}
    assert a1 == a2


def test_ivf2_children_partition_cells(spark):
    """Every cell belongs to exactly one super."""
    from zx_spark.operators.similarity import ivf2_fit_numpy

    _, ids, X = _emb(spark)
    centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=24, n_super=5)
    flat = [c for ch in children for c in ch]
    assert sorted(flat) == list(range(len(centers)))
    assert all(ch == sorted(ch) for ch in children)


def test_knn2_equals_knn_pairs_at_full_probe(spark):
    """p_super == n_super makes the two-level probe list equal the
    single-level one — the k-NN edges must match row-for-row."""
    from zx_spark.operators.similarity import (
        ivf2_fit_numpy, ivf_assign, knn_pairs, knn_pairs_2level)

    df, ids, X = _emb(spark, n=300)
    centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=16, n_super=4)
    C = [[float(x) for x in c] for c in centers]
    assigned = ivf_assign(df, C, "embedding")
    a = sorted(map(tuple, knn_pairs(
        assigned, centers, k=3, nprobe=4).collect()))
    b = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4,
        p_super=len(supers)).collect()))
    assert a == b and a


def test_knn2_recall_floor_with_partial_probe(spark):
    """The point of the hierarchy: partial super probing keeps useful
    recall vs exact brute-force top-k while scoring far fewer centers."""
    import numpy as np

    from zx_spark.operators.similarity import (
        ivf2_assign, ivf2_fit_numpy, knn_pairs_2level)

    df, ids, X = _emb(spark, n=300)
    centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=16, n_super=4)
    assigned = ivf2_assign(df, centers, supers, children, p_super=2)
    got = {}
    for r in knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2
    ).collect():
        got.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    # exact brute-force cosine top-3
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn.T
    np.fill_diagonal(sims, -2)
    hits = total = 0
    for i in range(len(ids)):
        want = set(np.argsort(-sims[i])[:3])
        total += 3
        hits += len(want & got.get(i, set()))
    assert hits / total >= 0.5, hits / total


def test_ivf2_validates(spark):
    import pytest

    from zx_spark.operators.similarity import (
        ivf2_assign, ivf2_fit_numpy, knn_pairs_2level)

    df, ids, X = _emb(spark, n=60)
    centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=8, n_super=3)
    with pytest.raises(ValueError, match="p_super"):
        ivf2_assign(df, centers, supers, children, p_super=0)
    with pytest.raises(ValueError, match="nprobe"):
        knn_pairs_2level(df, centers, supers, children, nprobe=0, p_super=2)


def test_ivf2_arrow_engine_matches_catalyst(spark):
    """The vectorized (BLAS) probe path selects the same cells and
    edges as the interpreted Catalyst expression on real-valued data
    (ulp ties are measure-zero on random doubles)."""
    from zx_spark.operators.similarity import (
        ivf2_assign, ivf2_fit_numpy, knn_pairs_2level)

    df, ids, X = _emb(spark, n=300)
    centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=16, n_super=4)
    a_cat = {r["vec_id"]: r["ivf_cell"] for r in ivf2_assign(
        df, centers, supers, children, p_super=2).collect()}
    a_arr = {r["vec_id"]: r["ivf_cell"] for r in ivf2_assign(
        df, centers, supers, children, p_super=2, engine="arrow").collect()}
    assert a_cat == a_arr
    assigned = ivf2_assign(df, centers, supers, children, p_super=2,
                           engine="arrow")
    e_cat = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2
    ).collect()))
    e_arr = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="arrow").collect()))
    assert e_cat == e_arr and e_cat
    import pytest

    with pytest.raises(ValueError, match="engine"):
        ivf2_assign(df, centers, supers, children, engine="gpu")


def test_ivf2_defaults_work_at_small_n_and_nulls_survive_arrow(spark):
    """r8 review: (a) the all-defaults flow (fit defaults + assign/knn
    defaults) must work at ANY corpus size — p_super defaults to
    min(4, n_super); (b) a NULL or wrong-length embedding must not
    crash the arrow probe UDF (it gets a NULL cell, matching the
    Catalyst engine's null propagation)."""
    from zx_spark.operators.similarity import (
        ivf2_assign, ivf2_fit_numpy, knn_pairs_2level)

    df, ids, X = _emb(spark, n=200)  # n_cells=8 -> n_super=3 < 4
    centers, supers, children = ivf2_fit_numpy(ids, X, target_cell=128)
    assigned = ivf2_assign(df, centers, supers, children)  # all defaults
    assert assigned.filter(F.col("ivf_cell").isNull()).count() == 0
    edges = knn_pairs_2level(assigned, centers, supers, children,
                             k=2, nprobe=2)  # default p_super
    assert edges.count() > 0
    # null + ragged rows through the arrow engine
    bad = spark.createDataFrame(
        [(900, None), (901, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    mixed = df.limit(5).unionByName(bad)
    out = ivf2_assign(mixed, centers, supers, children, engine="arrow")
    rows = {r["vec_id"]: r["ivf_cell"] for r in out.collect()}
    assert rows[900] is None and rows[901] is None
    assert all(v is not None for k, v in rows.items() if k < 900)
    # r9 (ADVICE r8): the CATALYST engine must gate the same rows to
    # NULL — ungated, the struct sort over NULL distances still emitted
    # real cell ids (bad rows silently landed in cell 0)
    out_cat = ivf2_assign(mixed, centers, supers, children)
    rows_cat = {r["vec_id"]: r["ivf_cell"] for r in out_cat.collect()}
    assert rows_cat == rows
    # and the catalyst knn probe list must emit NO edges for bad
    # queries (they exploded to bogus edges before the gate)
    mixed_assigned = out_cat
    e = knn_pairs_2level(mixed_assigned, centers, supers, children,
                         k=2, nprobe=2)
    bad_q = e.filter(F.col("vec_id").isin(900, 901)).count()
    assert bad_q == 0


def test_dist_method_drops_planted_dups_exact_n_cells(spark):
    """r10: the distributed fit rung — same pair/drop semantics as the
    other methods (planted twins still drop), exactly n_cells centers
    (full-corpus-count apportionment), deterministic across reruns."""
    import numpy as np

    from zx_spark.operators.semdedup import semantic_dedup_fit

    allv = _with_planted(spark)
    kept = semantic_dedup(
        allv, n_cells=8, threshold=0.95, dim=64, method="dist"
    )
    n = kept.count()
    assert 500 <= n <= 520  # same drop mass as lloyd/kmeans/sampled
    ann, centers = semantic_dedup_fit(allv, n_cells=8, dim=64, method="dist")
    assert len(centers) == 8
    ann2, centers2 = semantic_dedup_fit(allv, n_cells=8, dim=64, method="dist")
    assert np.array_equal(np.asarray(centers), np.asarray(centers2))


def test_assign_2level_annotation_and_validation(spark):
    """r11 (r10 advisor): assign='2level' annotates through the fitted
    hierarchy (ivf2_assign — ~√n_cells per row instead of the flat
    O(n_cells) argmin); rejected for methods that fit no hierarchy and
    for unknown values. On a corpus whose cells are well-separated the
    two paths agree everywhere (boundary rows are the documented
    approximation)."""
    from zx_spark.operators.similarity import ivf2_assign, ivf2_fit_dist

    allv = _with_planted(spark)
    ann2, centers = semantic_dedup_fit(
        allv, n_cells=8, dim=64, method="dist", assign="2level"
    )
    # the annotation IS ivf2_assign over the dist model
    c, s, ch = ivf2_fit_dist(allv, n_cells=8)
    want = {
        r["vec_id"]: r["ivf_cell"]
        for r in ivf2_assign(allv, c, s, ch).collect()
    }
    got = {r["vec_id"]: r["ivf_cell"] for r in ann2.collect()}
    assert got == want
    with pytest.raises(ValueError, match="fits none"):
        semantic_dedup_fit(allv, n_cells=8, method="lloyd", assign="2level")
    with pytest.raises(ValueError, match="assign must be"):
        semantic_dedup_fit(allv, n_cells=8, method="dist", assign="exact")

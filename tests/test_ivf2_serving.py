"""Round-9 serving integration of the two-level IVF quantizer
(VERDICT r8 item 1): ivf_topk / ivf_topk_batch / ivfpq_topk probe
selection through (supers, children), the (super, cell) hierarchical
store layout, the Arrow-scored join-side cosine, and the auto engine
threshold."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zx_spark.operators.similarity import (
    ARROW_AUTO_CELLS,
    _resolve_engine,
    ivf2_assign,
    ivf2_fit_numpy,
    ivf_assign,
    ivf_topk,
    ivf_topk_batch,
    ivfpq_topk,
    knn_pairs,
    knn_pairs_2level,
    pq_encode,
    pq_train,
    probe_cells,
    probe_cells_2level,
    read_ivf_store,
    super_of_cells,
    with_super_col,
    write_ivf_store,
)


def _emb(spark, n=400, dim=16, seed=7):
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


@pytest.fixture(scope="module")
def model(spark):
    df, ids, X = _emb(spark)
    centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=24, n_super=5)
    C = [[float(x) for x in c] for c in centers]
    assigned = ivf_assign(df, C, "embedding").localCheckpoint()
    return df, ids, X, centers, supers, children, assigned


def test_probe_2level_equals_flat_at_full_super(model):
    """p_super == n_super scores every cell with the same cosine
    formula — the serving probe must equal probe_cells exactly."""
    _, _, X, centers, supers, children, _ = model
    q = [float(x) for x in X[11]]
    for nprobe in (1, 3, 8, 24):
        flat = probe_cells(centers, q, nprobe)
        two = probe_cells_2level(
            centers, supers, children, q, nprobe, p_super=len(supers)
        )
        assert flat == two, (nprobe, flat, two)


def test_probe_2level_partial_is_subset_of_probed_supers(model):
    _, _, X, centers, supers, children, _ = model
    q = [float(x) for x in X[42]]
    cells = probe_cells_2level(centers, supers, children, q, 4, p_super=2)
    assert len(cells) == 4 and len(set(cells)) == 4
    owner = super_of_cells(children, len(centers))
    assert len({owner[c] for c in cells}) <= 2
    with pytest.raises(ValueError, match="p_super"):
        probe_cells_2level(centers, supers, children, q, 4, p_super=0)


def test_probe_2level_empty_children_and_small_nprobe(model):
    """A selected super owning zero cells must not crash; candidate
    exhaustion returns what exists."""
    _, _, X, centers, supers, _, _ = model
    q = [float(x) for x in X[0]]
    empty_kids = [[] for _ in supers]
    assert probe_cells_2level(centers, supers, empty_kids, q, 4) == []
    one = [[0]] + [[] for _ in supers[1:]]
    got = probe_cells_2level(centers, supers, one, q, 4, p_super=len(supers))
    assert got == [0]


def test_ivf_topk_two_level_equals_flat_at_full_super(model):
    _, _, X, centers, supers, children, assigned = model
    q = [float(x) for x in X[5]]
    flat = ivf_topk(assigned, centers, q, k=5, nprobe=4).collect()
    two = ivf_topk(
        assigned, centers, q, k=5, nprobe=4,
        supers=supers, children=children, p_super=len(supers),
    ).collect()
    assert [tuple(r) for r in flat] == [tuple(r) for r in two] and flat


def test_ivf_topk_batch_two_level_equals_per_query(model):
    _, _, X, centers, supers, children, assigned = model
    qs = [[float(x) for x in X[5]], [float(x) for x in X[77]]]
    batch = ivf_topk_batch(
        assigned, centers, qs, k=5, nprobe=3,
        supers=supers, children=children, p_super=2,
    ).collect()
    for qno, q in enumerate(qs):
        single = ivf_topk(
            assigned, centers, q, k=5, nprobe=3,
            supers=supers, children=children, p_super=2,
        ).collect()
        got = sorted(
            (r["vec_id"], r["cosine"]) for r in batch if r["query_no"] == qno
        )
        want = sorted((r["vec_id"], r["cosine"]) for r in single)
        assert got == want and got


def test_ivfpq_topk_two_level_equals_flat_at_full_super(spark, model):
    df, _, X, centers, supers, children, assigned = model
    books = pq_train(df, m=4, k=16, iters=2, dim=16)
    codes = pq_encode(assigned, books, keep_cols=["ivf_cell"])
    q = [float(x) for x in X[9]]
    kw = dict(k_results=5, nprobe=4, shortlist=30,
              vectors_cell_col="ivf_cell")
    flat = ivfpq_topk(codes, assigned, centers, books, q, **kw).collect()
    two = ivfpq_topk(
        codes, assigned, centers, books, q,
        supers=supers, children=children, p_super=len(supers), **kw
    ).collect()
    assert [tuple(r) for r in flat] == [tuple(r) for r in two] and flat


def test_super_of_cells_validates():
    assert super_of_cells([[0, 2], [1]], 3) == [0, 1, 0]
    with pytest.raises(ValueError, match="no super"):
        super_of_cells([[0], [1]], 3)
    with pytest.raises(ValueError, match="owned by supers"):
        super_of_cells([[0, 1], [1, 2]], 3)
    with pytest.raises(ValueError, match="out of range"):
        super_of_cells([[0, 5]], 3)


def test_hierarchical_store_layout_and_pruned_serving(spark, model, tmp_path):
    """(super, cell) partitioned store: directory layout is
    hierarchical, reads recover the columns, and two-level serving with
    the super filter returns the same rows as without it."""
    import os

    _, _, X, centers, supers, children, assigned = model
    ann = with_super_col(assigned, children, len(centers))
    path = str(tmp_path / "store2")
    write_ivf_store(ann, path, super_col="ivf_super")
    tops = sorted(
        d for d in os.listdir(path) if d.startswith("ivf_super=")
    )
    assert tops and all("=" in d for d in tops)
    inner = os.listdir(os.path.join(path, tops[0]))
    assert any(d.startswith("ivf_cell=") for d in inner)
    store = read_ivf_store(spark, path)
    q = [float(x) for x in X[3]]
    served = ivf_topk(
        store, centers, q, k=5, nprobe=4,
        supers=supers, children=children, p_super=2, super_col="ivf_super",
    ).collect()
    plain = ivf_topk(
        store, centers, q, k=5, nprobe=4,
        supers=supers, children=children, p_super=2,
    ).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in plain] and served
    # the super filter reaches the scan as a partition filter
    pruned = ivf_topk(
        store, centers, q, k=5, nprobe=4,
        supers=supers, children=children, p_super=2, super_col="ivf_super",
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "ivf_super" in plan


def test_ivf_topk_batch_store_equals_full_store_read(spark, model, tmp_path):
    """r13: direct-path serving (ivf_topk_batch_store reads ONLY the
    probed super=/cell= directories) must return exactly what
    ivf_topk_batch returns over the full store read — the directories
    ARE the cell filter. Also pins that the pruned read's file index
    holds only the probed cells' files, which is the point (planning
    O(probed cells) instead of O(catalog), SCALE.md r13)."""
    from zx_spark.operators.similarity import (
        _serving_probe,
        ivf_topk_batch,
        ivf_topk_batch_store,
    )

    _, _, X, centers, supers, children, assigned = model
    ann = with_super_col(assigned, children, len(centers))
    path = str(tmp_path / "store3")
    write_ivf_store(ann, path, super_col="ivf_super")
    store = read_ivf_store(spark, path)
    qs = [[float(x) for x in X[i]] for i in (0, 7, 19)]

    full = ivf_topk_batch(
        store, centers, qs, k=5, nprobe=4, supers=supers, children=children,
        super_col="ivf_super",
    ).collect()
    direct = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=4, supers=supers,
        children=children,
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, full))

    probed = {
        c
        for q in qs
        for c in _serving_probe(centers, q, 4, supers, children, None)
    }
    for f in direct.inputFiles():
        cell = int(f.split("ivf_cell=")[1].split("/")[0])
        assert cell in probed, f
    with pytest.raises(ValueError, match="probed cell directories"):
        ivf_topk_batch_store(
            spark, str(tmp_path / "nope"), centers, qs,
            supers=supers, children=children,
        )


def test_ivf_topk_batch_where_filter(spark, model, tmp_path):
    """r13 filtered vector search: ``where=`` equals serving over the
    pre-filtered frame (post-filter semantics — same probe list, top-k
    of the passing rows), and on a store the predicate reaches the
    parquet scan as a pushed filter on top of the directory pruning."""
    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import ivf_topk_batch, ivf_topk_batch_store
    from zx_spark.plan import plan_report

    _, _, X, centers, supers, children, assigned = model
    ann = with_super_col(assigned, children, len(centers))
    pred = F.col("vec_id") < 200
    qs = [[float(x) for x in X[i]] for i in (2, 11)]
    a = ivf_topk_batch(
        ann, centers, qs, k=5, nprobe=4, supers=supers, children=children,
        where=pred,
    ).collect()
    b = ivf_topk_batch(
        ann.filter(pred), centers, qs, k=5, nprobe=4, supers=supers,
        children=children,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a
    assert all(r["vec_id"] < 200 for r in a)

    path = str(tmp_path / "store4")
    write_ivf_store(ann, path, super_col="ivf_super")
    direct = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=4, supers=supers,
        children=children, where=pred,
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, a))
    pushed = plan_report(direct)["pushed_filters"]
    assert any("vec_id" in p for p in pushed), pushed


def test_ivf_topk_batch_arrow_engine_equals_catalyst(spark, model):
    """r13 arrow batch scorer: same rows/ids/cosines as the Catalyst
    struct-array path on real-valued data (BLAS matmul + np.round vs JVM
    fold + F.round — the documented last-ulp trade), including probe
    gating, NULL/ragged embeddings, and the where= filter."""
    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import ivf_topk_batch

    df, _, X, centers, supers, children, assigned = model
    ann = with_super_col(assigned, children, len(centers))
    # plant a NULL and a ragged embedding — both engines must drop them
    bad = spark.createDataFrame(
        [(9001, None, 0, 0), (9002, [1.0, 2.0], 0, 0)],
        "vec_id long, embedding array<double>, ivf_cell int, ivf_super int",
    )
    ann = ann.unionByName(bad)
    qs = [[float(x) for x in X[i]] for i in (1, 5, 23)]
    for where in (None, F.col("vec_id") % 3 != 1):
        a = ivf_topk_batch(
            ann, centers, qs, k=6, nprobe=5, supers=supers,
            children=children, where=where, engine="catalyst",
        ).collect()
        b = ivf_topk_batch(
            ann, centers, qs, k=6, nprobe=5, supers=supers,
            children=children, where=where, engine="arrow",
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a

    import pytest as _pytest

    with _pytest.raises(ValueError, match="engine"):
        ivf_topk_batch(ann, centers, qs, engine="nope")


def test_with_super_col_null_cell_gets_null_super(spark, model):
    _, _, _, centers, supers, children, _ = model
    bad = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    out = with_super_col(
        ivf2_assign(bad, centers, supers, children), children, len(centers)
    ).collect()[0]
    assert out["ivf_cell"] is None and out["ivf_super"] is None


def test_knn_score_engine_arrow_equals_catalyst(model):
    """The BLAS-scored join cosine must reproduce the interpreted
    zip_with fold's 6-dp values on real-valued data (both levels)."""
    _, _, _, centers, supers, children, assigned = model
    cat = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="catalyst").collect()))
    arr = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="arrow").collect()))
    assert cat == arr and cat
    cat1 = sorted(map(tuple, knn_pairs(
        assigned, centers, k=3, nprobe=4, score_engine="catalyst").collect()))
    arr1 = sorted(map(tuple, knn_pairs(
        assigned, centers, k=3, nprobe=4, score_engine="arrow").collect()))
    assert cat1 == arr1 and cat1


def test_knn_score_engine_int8(model):
    """int8 candidate scoring + exact re-rank (r10): with a shortlist
    covering every candidate nothing can truncate, so the result equals
    the catalyst engine exactly (the re-rank IS exact 6-dp cosine);
    small shortlists stay k-rowed and deterministic; shortlist < k
    rejects."""
    _, _, _, centers, supers, children, assigned = model
    cat = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="catalyst").collect()))
    i8 = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="int8", shortlist=1000).collect()))
    assert cat == i8 and cat
    tight = knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="int8", shortlist=3)
    per_q = tight.groupBy("vec_id").count().collect()
    assert per_q and all(r["count"] <= 3 for r in per_q)
    t1 = sorted(map(tuple, tight.collect()))
    t2 = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="int8", shortlist=3).collect()))
    assert t1 == t2
    with pytest.raises(ValueError, match="shortlist"):
        knn_pairs_2level(
            assigned, centers, supers, children, k=3, nprobe=4,
            score_engine="int8", shortlist=2,
        ).collect()
    # single-level path accepts the engine too
    one = sorted(map(tuple, knn_pairs(
        assigned, centers, k=3, nprobe=4, score_engine="int8",
        shortlist=1000).collect()))
    flat = sorted(map(tuple, knn_pairs(
        assigned, centers, k=3, nprobe=4,
        score_engine="catalyst").collect()))
    assert one == flat and one


def test_resolve_engine_threshold():
    assert _resolve_engine("auto", ARROW_AUTO_CELLS - 1) == "catalyst"
    assert _resolve_engine("auto", ARROW_AUTO_CELLS) == "arrow"
    assert _resolve_engine("catalyst", 10**6) == "catalyst"
    assert _resolve_engine("arrow", 1) == "arrow"
    with pytest.raises(ValueError, match="engine"):
        _resolve_engine("gpu", 8)
    with pytest.raises(ValueError, match="engine"):
        knn_pairs_2level(None, [[0.0]], [[0.0]], [[0]], score_engine="gpu")


def test_vector_index_sink_two_level(spark, model, tmp_path):
    """Streaming maintenance through the two-level quantizer: drained
    store equals the batch ivf2_assign + with_super_col frame, carries
    the (super, cell) layout, and serves identically."""
    df, _, X, centers, supers, children, _ = model
    from zx_spark.streaming.vectors import read_vector_index, vector_index_sink

    src = str(tmp_path / "src")
    store = str(tmp_path / "vstore")
    cp = str(tmp_path / "cp")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    C = [[float(x) for x in c] for c in centers]
    q = vector_index_sink(
        stream, store, C,
        checkpoint_dir=cp, available_now=True,
        super_centers=[[float(x) for x in s] for s in supers],
        children=children, p_super=len(supers),
    )
    assert q.awaitTermination(120)
    got = read_vector_index(spark, store)
    assert set(got.columns) >= {"vec_id", "embedding", "ivf_cell", "ivf_super"}
    want = with_super_col(
        ivf2_assign(df, centers, supers, children, p_super=len(supers)),
        children, len(centers),
    )
    g = {r["vec_id"]: (r["ivf_cell"], r["ivf_super"]) for r in got.collect()}
    w = {r["vec_id"]: (r["ivf_cell"], r["ivf_super"]) for r in want.collect()}
    assert g == w
    qv = [float(x) for x in X[2]]
    served = ivf_topk(
        got, centers, qv, k=5, nprobe=4,
        supers=supers, children=children, p_super=2, super_col="ivf_super",
    ).collect()
    batch = ivf_topk(
        want, centers, qv, k=5, nprobe=4,
        supers=supers, children=children, p_super=2,
    ).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in batch] and served


def test_serving_probe_validates_paired_args(model):
    """r9 review: supers without children (either way) must fail fast
    with a ValueError, not a TypeError deep in the child lookup —
    and in vector_index_sink BEFORE the stream starts."""
    _, _, X, centers, supers, children, assigned = model
    q = [float(x) for x in X[0]]
    with pytest.raises(ValueError, match="children"):
        ivf_topk(assigned, centers, q, supers=supers)
    with pytest.raises(ValueError, match="supers"):
        ivf_topk(assigned, centers, q, children=children)
    from zx_spark.streaming.vectors import vector_index_sink

    with pytest.raises(ValueError, match="together"):
        vector_index_sink(
            assigned, "/tmp/nowhere", [[0.0]],
            super_centers=[[0.0]],
        )
    # r9 advisor: super_col without the hierarchy must also fail fast —
    # silently skipping the top-level prune hands back an un-pruned
    # full listing with no error
    with pytest.raises(ValueError, match="super_col"):
        ivf_topk(assigned, centers, q, super_col="ivf_super")
    with pytest.raises(ValueError, match="super_col"):
        ivf_topk_batch(assigned, centers, [q], super_col="ivf_super")


def test_suggest_probe_from_measured_grid():
    """suggest_probe returns the smallest MEASURED grid point meeting
    the recall target (SCALE.md r9 grid), p_super capped at the knee."""
    from zx_spark.operators.similarity import suggest_probe

    assert suggest_probe(12) == (4, 4)                      # clustered 0.95
    assert suggest_probe(12, target_recall=0.999) == (8, 4)
    assert suggest_probe(12, target_recall=0.7) == (1, 4)
    assert suggest_probe(2) == (4, 2)                        # small hierarchies
    # structureless: nothing measured reaches 0.95 — largest point
    assert suggest_probe(12, clustered=False) == (16, 4)
    assert suggest_probe(12, target_recall=0.2, clustered=False) == (4, 4)
    with pytest.raises(ValueError, match="target_recall"):
        suggest_probe(12, target_recall=0.0)


def test_ivf2_rebalance_splits_hot_cells():
    """A planted hot cluster (half the corpus in one tight ball) must
    be split to ~target_cell-sized cells; balanced cells untouched;
    the hierarchy stays a valid partition of the new center list."""
    from zx_spark.operators.similarity import (
        ivf2_fit_numpy,
        ivf2_rebalance,
    )

    rng = np.random.RandomState(9)
    hot = 0.05 * rng.randn(600, 8) + 5.0     # tight ball far away
    rest = rng.randn(600, 8)
    X = np.vstack([hot, rest])
    ids = np.arange(len(X))
    centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=8, n_super=3)
    c2, s2, ch2 = ivf2_rebalance(ids, X, centers, target_cell=100)
    assert len(c2) > len(centers)
    # new hierarchy is a partition of the new centers
    flat = sorted(c for ch in ch2 for c in ch)
    assert flat == list(range(len(c2)))
    # the rebalanced assignment ENFORCES the documented bound (the
    # split iterates to a fixed point — a single Voronoi pass can
    # re-concentrate members above it, r9 review finding)
    C = np.asarray(c2)
    d = (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
    counts = np.bincount(d.argmin(axis=1), minlength=len(C))
    assert counts.max() <= 2 * 100, counts.max()
    # balanced corpora pass through unchanged
    Xb = rng.randn(800, 8)
    cb, _, _ = ivf2_fit_numpy(np.arange(800), Xb, n_cells=8, n_super=3)
    cb2, _, _ = ivf2_rebalance(np.arange(800), Xb, cb, target_cell=200)
    assert np.array_equal(np.asarray(cb), np.asarray(cb2))
    with pytest.raises(ValueError, match="target_cell"):
        ivf2_rebalance(ids, X, centers, target_cell=0)
    with pytest.raises(ValueError, match="max_ratio"):
        ivf2_rebalance(ids, X, centers, max_ratio=0.5)


def test_ivf2_fit_sampled(spark):
    """Sampled fit: deterministic md5 pick, full-corpus cell sizing,
    model usable end-to-end; reruns are identical; undersized samples
    fail fast."""
    from zx_spark.operators.similarity import (
        ivf2_assign,
        ivf2_fit_sampled,
        knn_pairs_2level,
    )

    df, ids, X = _emb(spark, n=600)
    c1, s1, ch1, sid1 = ivf2_fit_sampled(
        df, sample_n=200, target_cell=50
    )  # n_cells = 600 // 50 = 12
    assert len(c1) >= 12 and len(sid1) == 200
    c2, s2, ch2, sid2 = ivf2_fit_sampled(df, sample_n=200, target_cell=50)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(sid1, sid2)
    assigned = ivf2_assign(df, c1, s1, ch1)
    assert assigned.filter(F.col("ivf_cell").isNull()).count() == 0
    edges = knn_pairs_2level(assigned, c1, s1, ch1, k=2, nprobe=2)
    assert edges.count() > 0
    with pytest.raises(ValueError, match="sample"):
        ivf2_fit_sampled(df, sample_n=8, target_cell=10)  # 60 cells > 8
    with pytest.raises(ValueError, match="sample_n"):
        ivf2_fit_sampled(df, sample_n=2)


def test_rebalance_no_progress_on_unsplittable_mass():
    """r9 third review: a cell of identical vectors is
    Voronoi-unsplittable — the loop must stop early instead of
    appending duplicate empty centers for max_rounds rounds."""
    from zx_spark.operators.similarity import (
        ivf2_fit_numpy,
        ivf2_rebalance,
    )

    rng = np.random.RandomState(3)
    dup = np.tile(rng.randn(1, 8), (300, 1))      # 300 identical rows
    rest = rng.randn(100, 8) + 100.0              # far away: pure dup cell
    X = np.vstack([dup, rest])
    ids = np.arange(len(X))
    centers, _, _ = ivf2_fit_numpy(ids, X, n_cells=4, n_super=2)
    c2, s2, ch2 = ivf2_rebalance(ids, X, centers, target_cell=100)
    # one wasted split round at most — NOT max_rounds worth of clones
    assert len(c2) <= len(centers) + 4, (len(centers), len(c2))
    flat = sorted(c for ch in ch2 for c in ch)
    assert flat == list(range(len(c2)))


def test_fit_sampled_rejects_string_ids(spark):
    from zx_spark.operators.similarity import ivf2_fit_sampled

    df = spark.createDataFrame(
        [("a", [1.0, 2.0])], "doc_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="integer-typed"):
        ivf2_fit_sampled(df, id_col="doc_id", sample_n=8)


def test_suggest_probe_accepts_unsorted_grid():
    """r11 (r10 advisor): the grid scan assumes ascending nprobe —
    suggest_probe now sorts the caller's grid instead of silently
    returning an oversized point."""
    from zx_spark.operators.similarity import suggest_probe

    g = [(8, 0.99), (1, 0.40), (4, 0.96), (2, 0.80)]
    assert suggest_probe(12, target_recall=0.95, grid=g) == (4, 4)
    assert suggest_probe(12, target_recall=0.95, grid=sorted(g)) == (4, 4)


def test_knn_score_engine_pq(model):
    """PQ candidate scoring + exact re-rank (r11, VERDICT r10 item 2):
    with a shortlist covering every candidate nothing can truncate, so
    the result equals the catalyst engine exactly (the re-rank IS
    exact 6-dp cosine); tight shortlists stay k-rowed and
    deterministic; codebooks are required for 'pq' and rejected
    elsewhere; shortlist < k rejects."""
    from zx_spark.operators.similarity import knn_pairs, pq_codebooks_numpy

    _, _, X, centers, supers, children, assigned = model
    books = pq_codebooks_numpy(X, m=4, k=16, iters=3)
    cat = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="catalyst").collect()))
    pq = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="pq", shortlist=1000,
        codebooks=books).collect()))
    assert cat == pq and cat
    tight = knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="pq", shortlist=6, codebooks=books)
    per_q = tight.groupBy("vec_id").count().collect()
    assert per_q and all(r["count"] <= 3 for r in per_q)
    t1 = sorted(map(tuple, tight.collect()))
    t2 = sorted(map(tuple, knn_pairs_2level(
        assigned, centers, supers, children, k=3, nprobe=4, p_super=2,
        engine="catalyst", score_engine="pq", shortlist=6,
        codebooks=books).collect()))
    assert t1 == t2
    # single-level path accepts the engine too
    one = sorted(map(tuple, knn_pairs(
        assigned, centers, k=3, nprobe=4, score_engine="pq",
        shortlist=1000, codebooks=books).collect()))
    flat = sorted(map(tuple, knn_pairs(
        assigned, centers, k=3, nprobe=4,
        score_engine="catalyst").collect()))
    assert one == flat and one
    with pytest.raises(ValueError, match="needs codebooks"):
        knn_pairs_2level(
            assigned, centers, supers, children, k=3, nprobe=4,
            score_engine="pq",
        )
    with pytest.raises(ValueError, match="codebooks apply only"):
        knn_pairs_2level(
            assigned, centers, supers, children, k=3, nprobe=4,
            score_engine="catalyst", codebooks=books,
        )
    with pytest.raises(ValueError, match="shortlist"):
        knn_pairs_2level(
            assigned, centers, supers, children, k=3, nprobe=4,
            score_engine="pq", shortlist=2, codebooks=books,
        ).collect()

def test_ivf_store_manifest_roundtrip_and_serving(spark, model, tmp_path):
    """r14 (VERDICT r13 item 2): write_ivf_store emits a manifest whose
    cells/supers/rows match the written tree; ivf_topk_batch_store
    resolves probed directories FROM it (no os.path.exists), returning
    exactly the fallback (POSIX-walk) rows; a pre-manifest store is
    upgradeable in place with write_ivf_manifest."""
    import json
    import os

    from zx_spark.operators.similarity import (
        IVF_MANIFEST,
        ivf_topk_batch_store,
        read_ivf_manifest,
        write_ivf_manifest,
    )

    _, _, X, centers, supers, children, assigned = model
    ann = with_super_col(assigned, children, len(centers))
    path = str(tmp_path / "store_m")
    write_ivf_store(ann, path, super_col="ivf_super")

    man = read_ivf_manifest(spark, path)
    assert man is not None and man["cell_col"] == "ivf_cell"
    assert man["super_col"] == "ivf_super"
    # manifest == the on-disk tree, entry by entry (and rows add up)
    on_disk = {}
    for sup in os.listdir(path):
        if not sup.startswith("ivf_super="):
            continue
        s = int(sup.split("=")[1])
        for cell in os.listdir(os.path.join(path, sup)):
            if cell.startswith("ivf_cell="):
                on_disk[cell.split("=")[1]] = s
    assert {c: e["super"] for c, e in man["cells"].items()} == on_disk
    assert sum(e["rows"] for e in man["cells"].values()) == ann.count()

    qs = [[float(x) for x in X[i]] for i in (0, 7, 19)]
    via_manifest = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=4, supers=supers,
        children=children,
    ).collect()
    # remove the manifest: the POSIX fallback must return the same rows
    os.remove(os.path.join(path, IVF_MANIFEST))
    fallback = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=4, supers=supers,
        children=children,
    ).collect()
    assert sorted(map(tuple, via_manifest)) == sorted(map(tuple, fallback))
    assert via_manifest

    # in-place upgrade of a pre-manifest store
    man2 = write_ivf_manifest(spark, path, super_col="ivf_super")
    assert man2["cells"] == man["cells"]
    with open(os.path.join(path, IVF_MANIFEST)) as fh:
        assert json.load(fh) == man2
    again = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=4, supers=supers,
        children=children,
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, via_manifest))


def test_ivf_store_custom_cell_col_serves(spark, model, tmp_path):
    """ADVICE r13 (medium): a store written AND served with a
    non-default cell_col must work end-to-end — the column name now
    threads through ivf_topk_batch and the arrow scorer instead of
    crashing on a hardcoded 'ivf_cell'."""
    from zx_spark.operators.similarity import ivf_topk_batch_store

    _, _, X, centers, supers, children, assigned = model
    ann = with_super_col(
        assigned.withColumnRenamed("ivf_cell", "cellz"),
        children,
        len(centers),
        cell_col="cellz",
        super_col="superz",
    )
    path = str(tmp_path / "store_cc")
    write_ivf_store(ann, path, cell_col="cellz", super_col="superz")
    qs = [[float(x) for x in X[i]] for i in (3, 12)]
    for engine in ("catalyst", "arrow"):
        got = ivf_topk_batch_store(
            spark, path, centers, qs, k=5, nprobe=4, supers=supers,
            children=children, cell_col="cellz", super_col="superz",
            engine=engine,
        ).collect()
        ref = ivf_topk_batch(
            assigned, centers, qs, k=5, nprobe=4, supers=supers,
            children=children, engine=engine,
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, ref)) and got
    # layout mismatch fails fast instead of AnalysisException downstream
    with pytest.raises(ValueError, match="cell_col"):
        ivf_topk_batch_store(
            spark, path, centers, qs, supers=supers, children=children,
        )


# ------------------------------------------------ r14: store ingest lifecycle


def test_ivf_store_append_incremental_and_serving(spark, model, tmp_path):
    """r14: ivf_store_append folds new vectors into a live store —
    serving after append ≡ serving a store rebuilt from the union, the
    manifest update is incremental (touched cells recounted from disk,
    new cells folded in, rows_appended exact), and the quantizer
    fingerprint rejects a mismatched model at append AND serve time."""
    import os

    from zx_spark.operators.similarity import (
        ivf_store_append,
        ivf_topk_batch_store,
        read_ivf_manifest,
    )

    _, _, X, centers, supers, children, assigned = model
    ann = with_super_col(assigned, children, len(centers))
    # hold back one whole cell plus a slice of ids: the append exercises
    # both grow-an-existing-cell and first-vectors-of-a-new-cell
    held_cell = int(ann.select("ivf_cell").first()[0])
    base_part = ann.filter(
        (F.col("ivf_cell") != held_cell) & (F.col("vec_id") < 350)
    )
    appended = ann.filter(
        (F.col("ivf_cell") == held_cell) | (F.col("vec_id") >= 350)
    )
    n_app = appended.count()
    path = str(tmp_path / "store_app")
    write_ivf_store(base_part, path, super_col="ivf_super", centers=centers)
    man0 = read_ivf_manifest(spark, path)
    assert man0["version"] == 2 and man0["centers_sha"]
    assert all(e["files"] >= 1 for e in man0["cells"].values())

    got = ivf_store_append(
        appended, path, super_col="ivf_super", centers=centers
    )
    assert got["rows_appended"] == n_app
    assert got["cells_new"] >= 1
    man1 = read_ivf_manifest(spark, path)
    assert sum(e["rows"] for e in man1["cells"].values()) == ann.count()
    assert str(held_cell) in man1["cells"]
    # coalesce_batch: one append adds AT MOST one file per cell (the
    # batch is pre-shuffled on the super key before the write)
    for c, e in man1["cells"].items():
        prev = man0["cells"].get(c, {}).get("files", 0)
        assert e["files"] - prev in (0, 1), (c, prev, e["files"])

    # serving off the appended store == serving a store rebuilt whole
    rebuilt = str(tmp_path / "store_whole")
    write_ivf_store(ann, rebuilt, super_col="ivf_super", centers=centers)
    qs = [[float(x) for x in X[i]] for i in (2, 9, 365)]
    a = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=6, supers=supers,
        children=children,
    ).collect()
    b = ivf_topk_batch_store(
        spark, rebuilt, centers, qs, k=5, nprobe=6, supers=supers,
        children=children,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a

    # a different quantizer is rejected before it can poison the store
    wrong = [[c + 0.5 for c in row] for row in centers]
    with pytest.raises(ValueError, match="quantizer mismatch"):
        ivf_store_append(appended, path, super_col="ivf_super", centers=wrong)
    with pytest.raises(ValueError, match="quantizer mismatch"):
        ivf_topk_batch_store(
            spark, path, wrong, qs, k=5, nprobe=6, supers=supers,
            children=children,
        )
    # a cell arriving under the wrong super = two dirs for one cell
    bad = appended.limit(3).withColumn(
        "ivf_super", (F.col("ivf_super") + 1) % F.lit(len(supers))
    )
    with pytest.raises(ValueError, match="different\\s+hierarchy"):
        ivf_store_append(bad, path, super_col="ivf_super", centers=centers)
    # layout mismatch fails fast
    with pytest.raises(ValueError, match="mismatched layout"):
        ivf_store_append(appended, path, centers=centers)
    # the store on disk is still exactly base ∪ appended
    assert spark.read.parquet(path).count() == ann.count()


def test_ivf_store_append_premanifest_upgrades(spark, model, tmp_path):
    """Appending to a pre-manifest (r12-era) store upgrades it in place:
    one full-tree manifest build, after which serving uses the direct
    manifest path."""
    import os

    from zx_spark.operators.similarity import (
        IVF_MANIFEST,
        ivf_store_append,
        read_ivf_manifest,
    )

    _, _, X, centers, _, _, assigned = model
    path = str(tmp_path / "store_pre")
    first = assigned.filter(F.col("vec_id") < 300)
    rest = assigned.filter(F.col("vec_id") >= 300)
    write_ivf_store(first, path, manifest=False)
    assert not os.path.exists(os.path.join(path, IVF_MANIFEST))
    n_rest = rest.count()
    got = ivf_store_append(rest, path)
    assert got["rows_appended"] == n_rest
    man = read_ivf_manifest(spark, path)
    assert man is not None
    assert sum(e["rows"] for e in man["cells"].values()) == assigned.count()


def test_ivf_store_compact_rewrites_only_hot_cells(spark, model, tmp_path):
    """r14: ivf_store_compact picks victims from the manifest's file
    counts (no tree listing), rewrites ONLY cells above the threshold
    (untouched cells keep byte-identical files), restores one file per
    cell, preserves served rows exactly, and no-ops when already
    compact."""
    import glob
    import os

    from zx_spark.operators.similarity import (
        ivf_store_append,
        ivf_store_compact,
        ivf_topk_batch_store,
        read_ivf_manifest,
    )

    _, _, X, centers, supers, children, assigned = model
    ann = with_super_col(assigned, children, len(centers))
    path = str(tmp_path / "store_cmp")
    # seed with the low ids, then drip the rest in three micro-batches:
    # every touched cell accretes one file per batch
    write_ivf_store(
        ann.filter(F.col("vec_id") < 250), path, super_col="ivf_super",
        centers=centers,
    )
    for lo, hi in ((250, 300), (300, 350), (350, 400)):
        ivf_store_append(
            ann.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path, super_col="ivf_super", centers=centers,
        )
    man = read_ivf_manifest(spark, path)
    hot = {c for c, e in man["cells"].items() if e["files"] > 1}
    cold = {c for c, e in man["cells"].items() if e["files"] == 1}
    assert hot, "drip appends must have accreted multi-file cells"
    # the incremental file bookkeeping (distinct-partition counts from
    # the batch, never a disk listing) must equal on-disk truth
    for c, e in man["cells"].items():
        d = os.path.join(path, f"ivf_super={e['super']}", f"ivf_cell={c}")
        n_disk = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
        assert n_disk == e["files"], (c, n_disk, e["files"])

    def _files_of(cell: str) -> dict:
        e = man["cells"][cell]
        d = os.path.join(
            path, f"ivf_super={e['super']}", f"ivf_cell={cell}"
        )
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    cold_before = {c: _files_of(c) for c in cold}
    qs = [[float(x) for x in X[i]] for i in (1, 8, 377)]
    served_before = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=6, supers=supers,
        children=children,
    ).collect()

    got = ivf_store_compact(spark, path, max_files_per_cell=1)
    assert got["cells_rewritten"] == len(hot)
    assert got["files_after"] == len(hot)  # one file per rewritten cell
    assert got["files_before"] > got["files_after"]

    man2 = read_ivf_manifest(spark, path)
    assert all(man2["cells"][c]["files"] == 1 for c in hot)
    # rows survived, per cell and in total
    assert {c: e["rows"] for c, e in man2["cells"].items()} == {
        c: e["rows"] for c, e in man["cells"].items()
    }
    # untouched cells: same files, same mtimes (dynamic overwrite never
    # visited their directories)
    assert {c: _files_of(c) for c in cold} == cold_before
    served_after = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=6, supers=supers,
        children=children,
    ).collect()
    assert sorted(map(tuple, served_before)) == sorted(map(tuple, served_after))
    assert served_before

    again = ivf_store_compact(spark, path, max_files_per_cell=1)
    assert again["cells_rewritten"] == 0


def test_ivf_store_compact_upgrades_v1_manifest(spark, model, tmp_path):
    """A v1 manifest (rows only, r13-era) is upgraded in place before
    compaction — file counts are recomputed, then the threshold
    applies. Flat (cell-only) layout covered here too."""
    import json
    import os

    from zx_spark.operators.similarity import (
        IVF_MANIFEST,
        ivf_store_append,
        ivf_store_compact,
        read_ivf_manifest,
    )

    _, _, X, centers, _, _, assigned = model
    path = str(tmp_path / "store_v1")
    write_ivf_store(assigned.filter(F.col("vec_id") < 300), path)
    ivf_store_append(assigned.filter(F.col("vec_id") >= 300), path)
    # rewrite the manifest as v1: strip the file counts
    fpath = os.path.join(path, IVF_MANIFEST)
    with open(fpath) as fh:
        man = json.load(fh)
    for e in man["cells"].values():
        e.pop("files")
    man["version"] = 1
    man.pop("centers_sha", None)
    with open(fpath, "w") as fh:
        json.dump(man, fh)
    got = ivf_store_compact(spark, path, max_files_per_cell=1)
    assert got["cells_rewritten"] >= 1
    man2 = read_ivf_manifest(spark, path)
    assert man2["version"] == 2
    assert all(e["files"] == 1 for e in man2["cells"].values())
    assert sum(e["rows"] for e in man2["cells"].values()) == assigned.count()


def test_ivf_store_sink_streams_into_serving_store(spark, model, tmp_path):
    """r14: ivf_store_sink drains micro-batches straight into the
    manifest-served write_ivf_store layout — drained store serves
    identically to a batch-built store over the same rows, the manifest
    ingest_epoch high-water mark advances per batch, and a replayed
    epoch id is skipped (effective exactly-once on monotonic ids)."""
    import os

    from zx_spark.operators.similarity import (
        ivf_store_append,
        ivf_topk_batch_store,
        read_ivf_manifest,
    )
    from zx_spark.streaming.vectors import ivf_store_sink

    _, _, X, centers, supers, children, assigned = model
    ann = with_super_col(assigned, children, len(centers))
    C = [[float(x) for x in c] for c in centers]
    path = str(tmp_path / "serve_store")
    # seed the serving store with the low ids, stream in the rest
    write_ivf_store(
        ann.filter(F.col("vec_id") < 300), path, super_col="ivf_super",
        centers=C,
    )
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    late = assigned.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(300, 400)],
        "vec_id long, embedding array<double>",
    )
    # two staged files, pinned mtimes + one-file triggers => two epochs
    late.filter(F.col("vec_id") < 350).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    part2 = str(tmp_path / "src2")
    late.filter(F.col("vec_id") >= 350).coalesce(1).write.mode(
        "overwrite"
    ).parquet(part2)
    files = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )
    os.utime(os.path.join(src, files[0]), (1_000_000, 1_000_000))
    extra = [f for f in os.listdir(part2) if f.endswith(".parquet")]
    os.rename(
        os.path.join(part2, extra[0]), os.path.join(src, "part-z.parquet")
    )
    os.utime(os.path.join(src, "part-z.parquet"), (2_000_000, 2_000_000))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ivf_store_sink(
        stream, path, C, checkpoint_dir=cp, available_now=True,
        super_centers=[[float(x) for x in s] for s in supers],
        children=children, p_super=len(supers),
    )
    assert q.awaitTermination(120)
    man = read_ivf_manifest(spark, path)
    assert man["ingest_epoch"] == 1  # two micro-batches: ids 0, 1
    assert sum(e["rows"] for e in man["cells"].values()) == 400
    # a replayed epoch id must be skipped, not double-appended
    replay = ivf_store_append(
        ann.filter(F.col("vec_id") >= 350), path, super_col="ivf_super",
        centers=C, epoch_id=1,
    )
    assert replay == {
        "rows_appended": 0, "cells_touched": 0, "cells_new": 0,
        "skipped": True, "epoch_id": 1,
    }
    # the streamed store serves exactly like a batch-built one
    rebuilt = str(tmp_path / "serve_whole")
    write_ivf_store(ann, rebuilt, super_col="ivf_super", centers=C)
    qs = [[float(x) for x in X[i]] for i in (4, 360)]
    a = ivf_topk_batch_store(
        spark, path, centers, qs, k=5, nprobe=6, supers=supers,
        children=children,
    ).collect()
    b = ivf_topk_batch_store(
        spark, rebuilt, centers, qs, k=5, nprobe=6, supers=supers,
        children=children,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a


def test_ivf_store_health_from_manifest_alone():
    """r14: health diagnosis is a driver-side fold over the manifest —
    size_bias is the size-biased expected probed-cell amplification
    (Σ size²/(N·mean)), hot/fragmented cells rank by severity, and the
    recommendations trip on the documented thresholds. v1 manifests
    (no file counts) degrade to None fragmentation, never a crash."""
    from zx_spark.operators.similarity import ivf_store_health

    balanced = {
        "cells": {
            str(c): {"super": None, "rows": 100, "files": 1} for c in range(8)
        }
    }
    h = ivf_store_health(balanced)
    assert h["size_bias"] == 1.0
    assert h["hot_cells"] == [] and h["fragmented_cells"] == []
    assert not h["recommend_compact"] and not h["recommend_rebalance"]

    # one cell holds half the store: bias = (16*400^2/(3200*400))... use
    # exact: sizes 7x100 + 1x2500, N=3200, mean=400
    skewed = {
        "cells": {
            **{str(c): {"super": None, "rows": 100, "files": 1}
               for c in range(7)},
            "7": {"super": None, "rows": 2500, "files": 9},
        }
    }
    h = ivf_store_health(skewed)
    want = (7 * 100 * 100 + 2500 * 2500) / (3200 * 400)
    assert h["size_bias"] == round(want, 3) and h["size_bias"] > 2
    assert h["hot_cells"] == ["7"] and h["fragmented_cells"] == ["7"]
    assert h["recommend_rebalance"] and h["recommend_compact"]
    assert h["max_cell_rows"] == 2500 and h["max_files_per_cell"] == 9

    # explicit target: all 100-row cells hot when target is 30
    h2 = ivf_store_health(balanced, target_cell=30)
    assert len(h2["hot_cells"]) == 8 and h2["recommend_rebalance"]

    # v1 manifest: rows-only entries, file fields degrade to None
    v1 = {"cells": {"0": {"super": None, "rows": 10},
                    "1": {"super": None, "rows": 12}}}
    h3 = ivf_store_health(v1)
    assert h3["files"] is None and h3["fragmented_cells"] is None
    assert not h3["recommend_compact"]

    assert ivf_store_health({"cells": {}})["rows"] == 0


def test_ivfpq_topk_store_direct_path(spark, model, tmp_path):
    """r14: the PQ serving rung on the direct path — one manifest-
    resolved pruned read feeds ADC + exact re-rank (codes+vectors
    store) or pure-ADC (codes-only store), equal to the in-memory
    twins over the same model; a wrong quantizer fails fast."""
    from zx_spark.operators.similarity import (
        ivfpq_topk_store,
        pq_topk,
    )

    _, _, X, centers, supers, children, assigned = model
    books = pq_train(assigned, m=4, k=16, iters=2, dim=16)
    ann = with_super_col(assigned, children, len(centers))
    full = pq_encode(
        ann, books, keep_cols=["ivf_cell", "ivf_super", "embedding"]
    )
    q = [float(x) for x in X[13]]
    kw = dict(k_results=5, nprobe=4, shortlist=30, supers=supers,
              children=children, p_super=2)

    # codes + vectors: ADC shortlist then exact re-rank, all pruned
    path = str(tmp_path / "pq_store")
    C = [[float(x) for x in c] for c in centers]
    write_ivf_store(full, path, super_col="ivf_super", centers=C)
    got = ivfpq_topk_store(spark, path, centers, books, q, **kw).collect()
    codes = pq_encode(assigned, books, keep_cols=["ivf_cell"])
    want = ivfpq_topk(
        codes, assigned, centers, books, q,
        vectors_cell_col="ivf_cell", **kw,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and got

    # codes-only store: pure ADC (the 4*d/m x smaller layout)
    path2 = str(tmp_path / "pq_only")
    write_ivf_store(
        full.drop("embedding"), path2, super_col="ivf_super", centers=C
    )
    got2 = ivfpq_topk_store(spark, path2, centers, books, q, **kw).collect()
    cells = probe_cells_2level(centers, supers, children, q, 4, p_super=2)
    want2 = pq_topk(
        codes.filter(F.col("ivf_cell").isin([int(c) for c in cells])),
        books, q, 5,
    ).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in want2] and got2

    # manifest fingerprint guards this entry point too
    wrong = [[c + 0.5 for c in row] for row in centers]
    with pytest.raises(ValueError, match="quantizer mismatch"):
        ivfpq_topk_store(spark, path, wrong, books, q, **kw)


def test_pq_encode_numpy_keeps_vec_col(spark, model):
    """r14 regression: keep_cols carrying the VECTOR column (an IVF-PQ
    store that keeps raw vectors for re-rank) must work under
    method='numpy' — the duplicated column in the worker's input batch
    used to raise KeyError. Codes and kept columns equal the jvm path."""
    _, _, _, centers, _, _, assigned = model
    books = pq_train(assigned, m=4, k=16, iters=2, dim=16)
    keep = ["ivf_cell", "embedding"]
    j = pq_encode(assigned, books, keep_cols=keep, method="jvm").collect()
    n = pq_encode(assigned, books, keep_cols=keep, method="numpy").collect()
    jd = {r["vec_id"]: (list(r["pq_codes"]), r["ivf_cell"], r["embedding"]) for r in j}
    nd = {r["vec_id"]: (list(r["pq_codes"]), r["ivf_cell"], r["embedding"]) for r in n}
    assert jd == nd and len(jd) == 400


def test_residual_pq_pipeline(spark, model, tmp_path):
    """r14: canonical IVF-PQ residual encoding — with_residuals is the
    exact per-cell centroid subtraction, residual ADC scores equal the
    driver-side bias + table sum, the exactness contract (full probe +
    full shortlist == brute-force cosine) survives the residual path,
    and the store entry point serves it identically."""
    from zx_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk_store,
        pq_topk,
        with_residuals,
    )

    df, _, X, centers, supers, children, assigned = model
    C = np.asarray(centers)
    res = with_residuals(assigned, centers)
    rows = res.select("vec_id", "ivf_cell", "embedding", "residual").collect()
    for r in rows[:20]:
        want = np.asarray(r["embedding"]) - C[r["ivf_cell"]]
        assert np.allclose(np.asarray(r["residual"]), want)

    books = pq_train(res, vec_col="residual", m=4, k=16, iters=2, dim=16)
    codes = pq_encode(
        res, books, vec_col="residual", keep_cols=["ivf_cell", "embedding"]
    )
    q = [float(x) for x in X[21]]

    # ADC score == driver-side bias + table sum (one row, exact)
    one = codes.filter(F.col("vec_id") == 5).first()
    B = np.asarray(books)
    tab = 0.0
    sub = 4
    for s in range(4):
        tab += round(
            float(np.dot(q[s * sub:(s + 1) * sub], B[s][one["pq_codes"][s]])), 9
        )
    bias = round(float(np.dot(q, C[one["ivf_cell"]])), 9)
    got = pq_topk(
        codes, books, q, k_results=400, cell_col="ivf_cell",
        residual_centers=centers,
    ).filter(F.col("vec_id") == 5).first()["adc_score"]
    assert abs(got - round(bias + tab, 6)) < 1e-9

    # exactness contract: full probe + full shortlist == brute force
    full = ivfpq_topk(
        codes, assigned, centers, books, q, k_results=5,
        nprobe=len(centers), shortlist=1000, vectors_cell_col="ivf_cell",
        residual=True,
    ).collect()
    brute = cosine_topk(df, q, k=5).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in brute]

    # store round-trip with residual codes
    path = str(tmp_path / "pq_res")
    store_frame = with_super_col(codes, children, len(centers))
    Cl = [[float(x) for x in c] for c in centers]
    write_ivf_store(store_frame, path, super_col="ivf_super", centers=Cl)
    got_s = ivfpq_topk_store(
        spark, path, centers, books, q, k_results=5, nprobe=4,
        shortlist=30, supers=supers, children=children, p_super=2,
        residual=True,
    ).collect()
    want_s = ivfpq_topk(
        codes, assigned, centers, books, q, k_results=5, nprobe=4,
        shortlist=30, vectors_cell_col="ivf_cell", supers=supers,
        children=children, p_super=2, residual=True,
    ).collect()
    assert [tuple(r) for r in got_s] == [tuple(r) for r in want_s] and got_s


def test_with_residuals_arrow_equals_literal(spark, model):
    """r14: the arrow residual engine (numpy closure, no n_cells x dim
    literal expression tree) equals the literal zip_with exactly,
    including NULL-cell rows."""
    from zx_spark.operators.similarity import with_residuals

    _, _, _, centers, _, _, assigned = model
    withnull = assigned.withColumn(
        "ivf_cell",
        F.when(F.col("vec_id") % 50 == 0, F.lit(None)).otherwise(
            F.col("ivf_cell")
        ),
    )
    lit = {
        r["vec_id"]: r["residual"]
        for r in with_residuals(withnull, centers, engine="literal").collect()
    }
    arw = {
        r["vec_id"]: r["residual"]
        for r in with_residuals(withnull, centers, engine="arrow").collect()
    }
    assert set(lit) == set(arw) and len(lit) == 400
    for v, want in lit.items():
        got = arw[v]
        if want is None:
            assert got is None
        else:
            assert np.allclose(np.asarray(got), np.asarray(want))

"""Round-10: the hierarchical IVF fit family (VERDICT r9 item 1 — the
flat driver-side Lloyd was the last Θ(N²)-class step in the ANN
family), its hierarchy-aware rebalance, the numpy assignment/probe
twins they share with tools/ann_recall.py, and the fit-time recall
grid (VERDICT r9 item 4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zx_spark.operators.similarity import (
    _apportion,
    _md5_take,
    _nearest_center_chunked,
    _two_level_sorted_cells,
    assign_2level_numpy,
    ivf2_assign,
    ivf2_fit_hier,
    ivf2_fit_numpy,
    ivf2_fit_sampled,
    ivf2_rebalance_hier,
    ivf_centers_numpy,
    knn_pairs_2level,
    measure_recall_grid,
    probe_2level_numpy,
    suggest_probe,
)


def _clustered(n=600, dim=8, kc=12, seed=5):
    rng = np.random.RandomState(seed)
    cc = rng.randn(kc, dim) * 3.0
    asg = rng.randint(0, kc, size=n)
    X = cc[asg] + 0.3 * rng.randn(n, dim)
    return np.arange(n), X


# ------------------------------------------------------------- apportionment


def test_apportion_exact_total_and_caps():
    counts = np.array([100, 50, 25, 25, 0])
    k = _apportion(counts, 8)
    assert k.sum() == 8
    assert k[4] == 0 and (k[:4] >= 1).all()
    assert k[0] == 4 and k[1] == 2 and k[2] == 1 and k[3] == 1
    # never more children than members
    k2 = _apportion(np.array([2, 1, 1000]), 50)
    assert k2.sum() == 50 and k2[0] <= 2 and k2[1] <= 1
    # total above the member count clamps to one center per member
    k3 = _apportion(np.array([3, 2]), 100)
    assert list(k3) == [3, 2]
    # total below the active-block count bumps to one each
    k4 = _apportion(np.array([5, 5, 5]), 1)
    assert list(k4) == [1, 1, 1]
    assert _apportion(np.array([0, 0]), 4).sum() == 0
    # deterministic
    assert np.array_equal(_apportion(counts, 8), k)


# ------------------------------------------------------------------ hier fit


def test_fit_hier_children_partition_and_determinism():
    ids, X = _clustered()
    c, s, ch = ivf2_fit_hier(ids, X, n_cells=24, n_super=5)
    assert len(c) == 24 and len(s) == 5
    flat = sorted(x for kids in ch for x in kids)
    assert flat == list(range(len(c)))
    # children are CONTIGUOUS ascending per super (by construction)
    for kids in ch:
        assert kids == sorted(kids)
        if kids:
            assert kids == list(range(kids[0], kids[-1] + 1))
    c2, s2, ch2 = ivf2_fit_hier(ids, X, n_cells=24, n_super=5)
    assert np.array_equal(c, c2) and np.array_equal(s, s2) and ch == ch2


def test_fit_hier_replays_blockwise_recipe():
    """The fit IS the documented recipe: super Lloyd, exact owner
    argmin, apportion, per-super member-only Lloyds — replayed here
    step by step with the shared primitives."""
    ids, X = _clustered(n=300)
    c, s, ch = ivf2_fit_hier(ids, X, n_cells=12, n_super=4)
    S = ivf_centers_numpy(ids, X, 4, 5)
    assert np.array_equal(s, S)
    owner = _nearest_center_chunked(X, S)
    k = _apportion(np.bincount(owner, minlength=4), 12)
    off = 0
    for sid in range(4):
        if k[sid] == 0:
            assert ch[sid] == []
            continue
        m = np.flatnonzero(owner == sid)
        sub = np.asarray(ivf_centers_numpy(ids[m], X[m], int(k[sid]), 5))
        assert np.array_equal(c[off : off + len(sub)], sub)
        assert ch[sid] == list(range(off, off + len(sub)))
        off += len(sub)
    assert off == len(c)


def test_fit_hier_defaults_and_validation():
    ids, X = _clustered(n=400)
    c, s, ch = ivf2_fit_hier(ids, X, target_cell=50)  # n_cells = 8
    assert len(c) == 8
    with pytest.raises(ValueError, match="n_cells"):
        ivf2_fit_hier(ids, X, n_cells=0)
    with pytest.raises(ValueError, match="at least one"):
        ivf2_fit_hier(np.array([]), np.empty((0, 4)))
    # degenerate: fewer vectors than requested cells → clamped
    c3, _, ch3 = ivf2_fit_hier(np.arange(5), X[:5], n_cells=64)
    assert len(c3) <= 5
    assert sorted(x for kk in ch3 for x in kk) == list(range(len(c3)))


def test_fit_hier_model_serves_end_to_end(spark):
    ids, X = _clustered()
    c, s, ch = ivf2_fit_hier(ids, X, n_cells=24, n_super=5)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    assigned = ivf2_assign(df, c, s, ch)
    assert assigned.filter(F.col("ivf_cell").isNull()).count() == 0
    edges = knn_pairs_2level(assigned, c, s, ch, k=2, nprobe=2)
    assert edges.count() > 0


# --------------------------------------------------------------- numpy twins


def test_assign_2level_numpy_equals_spark(spark):
    ids, X = _clustered(n=200)
    c, s, ch = ivf2_fit_numpy(ids, X, n_cells=16, n_super=4)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["ivf_cell"]
        for r in ivf2_assign(df, c, s, ch, p_super=2, engine="catalyst").collect()
    }
    want = assign_2level_numpy(X, c, s, ch, p_super=2)
    assert got == {int(i): int(want[i]) for i in ids}
    with pytest.raises(ValueError, match="p_super"):
        assign_2level_numpy(X, c, s, ch, p_super=0)


def test_probe_2level_numpy_equals_catalyst(spark):
    ids, X = _clustered(n=80)
    c, s, ch = ivf2_fit_numpy(ids, X, n_cells=10, n_super=3)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    C = [[float(x) for x in r] for r in c]
    S = [[float(x) for x in r] for r in s]
    cells = F.slice(
        _two_level_sorted_cells(
            F.col("embedding").cast("array<double>"), C, S, ch, 2
        ),
        1,
        3,
    )
    got = {
        r["vec_id"]: list(r["p"])
        for r in df.select("vec_id", cells.alias("p")).collect()
    }
    want = probe_2level_numpy(X, c, s, ch, p_super=2, nprobe=3)
    assert got == {int(i): [int(x) for x in want[i]] for i in ids}


def test_twins_handle_childless_selection():
    ids, X = _clustered(n=40)
    c, s, _ = ivf2_fit_numpy(ids, X, n_cells=6, n_super=2)
    empty = [[] for _ in s]
    assert (assign_2level_numpy(X, c, s, empty) == -1).all()
    assert all(
        len(p) == 0 for p in probe_2level_numpy(X, c, s, empty, 2, 3)
    )


# ------------------------------------------------------------ hier rebalance


def test_rebalance_hier_splits_hot_cells_supers_fixed():
    rng = np.random.RandomState(9)
    hot = 0.05 * rng.randn(600, 8) + 5.0
    rest = rng.randn(600, 8)
    X = np.vstack([hot, rest])
    ids = np.arange(len(X))
    # note: the hier fit's APPORTIONMENT already pre-balances (the hot
    # super gets proportionally more children), so a breach needs a
    # tighter bound than the flat-rebalance test's
    c, s, ch = ivf2_fit_hier(ids, X, n_cells=8, n_super=3)
    c2, s2, ch2 = ivf2_rebalance_hier(ids, X, c, s, ch, target_cell=50)
    assert len(c2) > len(c)
    # supers are FIXED — parentage is known, no refit
    assert np.array_equal(np.asarray(s), np.asarray(s2))
    flat = sorted(x for kids in ch2 for x in kids)
    assert flat == list(range(len(c2)))
    # bound enforced under the hierarchy's own counting rule
    assign = assign_2level_numpy(X, c2, s2, ch2)
    counts = np.bincount(assign[assign >= 0], minlength=len(c2))
    assert counts.max() <= 2 * 50, counts.max()
    # balanced corpora pass through unchanged
    idb, Xb = _clustered(n=400, seed=3)
    cb, sb, chb = ivf2_fit_hier(idb, Xb, n_cells=4, n_super=2)
    cb2, _, chb2 = ivf2_rebalance_hier(idb, Xb, cb, sb, chb, target_cell=200)
    assert np.array_equal(np.asarray(cb), np.asarray(cb2)) and chb == chb2
    with pytest.raises(ValueError, match="target_cell"):
        ivf2_rebalance_hier(ids, X, c, s, ch, target_cell=0)
    with pytest.raises(ValueError, match="max_ratio"):
        ivf2_rebalance_hier(ids, X, c, s, ch, max_ratio=0.5)


def test_rebalance_hier_no_progress_on_dup_mass():
    rng = np.random.RandomState(3)
    dup = np.tile(rng.randn(1, 8), (300, 1))
    rest = rng.randn(100, 8) + 100.0
    X = np.vstack([dup, rest])
    ids = np.arange(len(X))
    c, s, ch = ivf2_fit_hier(ids, X, n_cells=4, n_super=2)
    c2, _, ch2 = ivf2_rebalance_hier(ids, X, c, s, ch, target_cell=100)
    assert len(c2) <= len(c) + 4, (len(c), len(c2))
    assert sorted(x for kids in ch2 for x in kids) == list(range(len(c2)))


# ------------------------------------------------- sampled-fit wiring (r10)


def test_fit_sampled_hier_deterministic_and_serves(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(600, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(600)],
        "vec_id long, embedding array<double>",
    )
    c1, s1, ch1, sid1 = ivf2_fit_sampled(
        df, sample_n=200, target_cell=50, fit="hier"
    )
    c2, s2, ch2, sid2 = ivf2_fit_sampled(
        df, sample_n=200, target_cell=50, fit="hier"
    )
    assert np.array_equal(np.asarray(c1), np.asarray(c2)) and ch1 == ch2
    assert np.array_equal(sid1, sid2)
    assigned = ivf2_assign(df, c1, s1, ch1)
    assert assigned.filter(F.col("ivf_cell").isNull()).count() == 0
    assert knn_pairs_2level(assigned, c1, s1, ch1, k=2, nprobe=2).count() > 0
    # small models auto-route to the flat path byte-for-byte
    ca, sa, cha, _ = ivf2_fit_sampled(df, sample_n=200, target_cell=50)
    cf, sf, chf, _ = ivf2_fit_sampled(
        df, sample_n=200, target_cell=50, fit="flat"
    )
    assert np.array_equal(np.asarray(ca), np.asarray(cf)) and cha == chf
    with pytest.raises(ValueError, match="fit"):
        ivf2_fit_sampled(df, sample_n=200, target_cell=50, fit="bogus")


def test_fit_sampled_missing_id_col_fails_fast(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not in schema"):
        ivf2_fit_sampled(df, id_col="nope", sample_n=8)


# ----------------------------------------------------- fit-time recall grid


def test_fit_sampled_recall_grid_matches_library(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(300, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    out = ivf2_fit_sampled(
        df, sample_n=300, target_cell=30, recall_grid=True
    )
    assert len(out) == 5
    c, s, ch, sids, grid = out
    assert [g[0] for g in grid] == sorted({g[0] for g in grid})
    assert all(0.0 <= g[1] <= 1.0 for g in grid)
    # recall is monotone non-decreasing in nprobe
    rs = [g[1] for g in grid]
    assert rs == sorted(rs)
    # the 5th element IS measure_recall_grid on the same sample
    Xs = np.array(
        [X[int(i)] for i in sids]
    )
    want = measure_recall_grid(np.asarray(sids), Xs, c, s, ch)
    assert grid == want


def test_measure_recall_grid_brute_force_pin():
    """Independent recall computation (plain loops, no library probe
    helpers) must agree with measure_recall_grid on a tiny corpus."""
    ids, X = _clustered(n=60, dim=4, kc=4)
    c, s, ch = ivf2_fit_numpy(ids, X, n_cells=6, n_super=2)
    k = 3
    grid = measure_recall_grid(
        ids, X, c, s, ch, k=k, p_super=2, nprobes=(1, 2), max_queries=60
    )
    # brute force
    C = np.asarray(c)
    S = np.asarray(s)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    owner_cells = assign_2level_numpy(X, c, s, ch, p_super=2)
    import hashlib

    qorder = sorted(
        range(60),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    for nprobe, want_recall in grid:
        hits = 0
        for q in qorder:
            sd = ((S - X[q]) ** 2).sum(axis=1)
            sel = np.argsort(sd, kind="stable")[:2]
            kids = sorted(int(x) for sid in sel for x in ch[sid])
            cd = [((C[cc] - X[q]) ** 2).sum() for cc in kids]
            probe = [
                kids[i] for i in np.argsort(cd, kind="stable")[:nprobe]
            ]
            cand = [
                i
                for i in range(60)
                if i != q and owner_cells[i] in probe
            ]
            if not cand:
                continue
            sims = [float(Xn[i] @ Xn[q]) for i in cand]
            top = [
                cand[i] for i in np.argsort(-np.asarray(sims), kind="stable")[:k]
            ]
            exact_sims = Xn @ Xn[q]
            exact_sims[q] = -2.0
            exact = set(np.argsort(-exact_sims, kind="stable")[:k])
            hits += len(set(top) & exact)
        assert round(hits / (k * 60), 3) == want_recall, nprobe
    with pytest.raises(ValueError, match="at least two"):
        measure_recall_grid(ids[:1], X[:1], c, s, ch)


def test_suggest_probe_grid_and_clamp():
    # per-model grid overrides the static table
    assert suggest_probe(12, target_recall=0.9, grid=[(1, 0.5), (2, 0.95)]) == (2, 4)
    assert suggest_probe(12, target_recall=0.99, grid=[(1, 0.5), (2, 0.95)]) == (2, 4)
    # n_cells clamps the static table's 16 down to the model's cells
    assert suggest_probe(12, clustered=False, n_cells=6) == (6, 4)
    assert suggest_probe(12, n_cells=2) == (2, 4)
    with pytest.raises(ValueError, match="grid"):
        suggest_probe(12, grid=[])


def test_md5_take_is_prefix_stable():
    ids = np.arange(50)
    t10 = _md5_take(ids, 10)
    t20 = _md5_take(ids, 20)
    assert list(t20[:10]) == list(t10)
    assert len(set(map(int, t20))) == 20

# ---------------------------------------------------- distributed child fit


def _dist_replay(ids, X, n_super, target_cell, super_sample_n, iters=5,
                 super_iters=5, max_group_rows=None):
    """Driver-side numpy replay of the ivf2_fit_dist recipe."""
    import math

    from zx_spark.operators.similarity import (
        _md5_take,
        _nearest_center_chunked,
        ivf_centers_numpy,
    )

    take = _md5_take(ids, min(super_sample_n, len(ids)))
    S = ivf_centers_numpy(ids[take], X[take], n_super, super_iters)
    owner = _nearest_center_chunked(X, S)
    blocks, children = [], [[] for _ in range(len(S))]
    off = 0
    for s in range(len(S)):
        m = np.flatnonzero(owner == s)
        if len(m) == 0:
            continue
        k_s = int(math.ceil(len(m) / target_cell))
        if max_group_rows is not None and len(m) > max_group_rows:
            m = m[_md5_take(ids[m], max_group_rows)]
            k_s = min(k_s, len(m))
        # selection by md5, FIT ORDER ascending by id — the r11 block
        # order rule (_fit_block sorts whatever shuffle order arrives)
        m = m[np.argsort(ids[m], kind="stable")]
        sub = np.asarray(ivf_centers_numpy(ids[m], X[m], k_s, iters))
        blocks.append(sub)
        children[s] = list(range(off, off + len(sub)))
        off += len(sub)
    return np.vstack(blocks), S, children


def test_fit_dist_matches_numpy_replay(spark):
    from zx_spark.operators.similarity import ivf2_fit_dist

    ids, X = _clustered(n=500)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    c, s, ch = ivf2_fit_dist(
        df, target_cell=50, n_super=4, super_sample_n=500, engine="catalyst"
    )
    cw, sw, chw = _dist_replay(ids, X, 4, 50, 500)
    assert np.array_equal(np.asarray(s), sw)
    assert np.array_equal(np.asarray(c), cw)
    assert ch == chw
    # arrow super-assignment produces the same model on real-valued data
    ca, sa, cha = ivf2_fit_dist(
        df, target_cell=50, n_super=4, super_sample_n=500, engine="arrow"
    )
    assert np.array_equal(np.asarray(ca), np.asarray(c)) and cha == ch
    # children contiguous ascending, a partition of the centers
    assert sorted(x for kk in ch for x in kk) == list(range(len(c)))
    for kk in ch:
        if kk:
            assert kk == list(range(kk[0], kk[-1] + 1))


def test_fit_dist_model_serves(spark):
    from zx_spark.operators.similarity import ivf2_fit_dist

    ids, X = _clustered(n=400)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    c, s, ch = ivf2_fit_dist(df, target_cell=40, super_sample_n=400)
    assigned = ivf2_assign(df, c, s, ch)
    assert assigned.filter(F.col("ivf_cell").isNull()).count() == 0
    assert knn_pairs_2level(assigned, c, s, ch, k=2, nprobe=2).count() > 0


def test_fit_dist_group_cap_replays(spark):
    from zx_spark.operators.similarity import ivf2_fit_dist

    ids, X = _clustered(n=300, kc=3)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    c, s, ch = ivf2_fit_dist(
        df, target_cell=30, n_super=3, super_sample_n=300,
        engine="catalyst", max_group_rows=60,
    )
    cw, sw, chw = _dist_replay(ids, X, 3, 30, 300, max_group_rows=60)
    assert np.array_equal(np.asarray(c), cw) and ch == chw


def test_fit_dist_validations(spark):
    from zx_spark.operators.similarity import ivf2_fit_dist

    sdf = spark.createDataFrame(
        [("a", [1.0])], "doc_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="integer-typed"):
        ivf2_fit_dist(sdf, id_col="doc_id")
    with pytest.raises(ValueError, match="not in schema"):
        ivf2_fit_dist(sdf, id_col="nope")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least one"):
        ivf2_fit_dist(empty)
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="super_sample_n"):
        ivf2_fit_dist(df, n_super=8, super_sample_n=4)
    with pytest.raises(ValueError, match="super_sample_n"):
        ivf2_fit_dist(df, super_sample_n=0)


def test_ivf_assign_arrow_equals_catalyst(spark):
    from zx_spark.operators.similarity import ivf_assign, ivf_assign_arrow

    ids, X = _clustered(n=150)
    c, _, _ = ivf2_fit_numpy(ids, X, n_cells=10, n_super=3)
    C = [[float(x) for x in r] for r in c]
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids]
        + [(999, None)],
        "vec_id long, embedding array<double>",
    )
    cat = {r["vec_id"]: r["ivf_cell"]
           for r in ivf_assign(df, C, "embedding").collect()}
    arr = {r["vec_id"]: r["ivf_cell"]
           for r in ivf_assign_arrow(df, C, "embedding").collect()}
    # single-level catalyst assign does NOT null-gate (pre-r8 contract);
    # compare on the valid rows, and pin the arrow path's NULL gate
    assert arr[999] is None
    assert {k: v for k, v in cat.items() if k != 999} == {
        k: v for k, v in arr.items() if k != 999
    }

# ------------------------------------- streaming store through the r10 fit


def test_streaming_store_through_sampled_hier_fit(spark, tmp_path):
    """VERDICT r9 item 5 end-to-end: sampled HIER fit (+ hier
    rebalance) → streaming vector_index_sink through the two-level
    quantizer → drained (super, cell) store serves ivf_topk with
    plan-asserted top-level pruning, identical to batch."""
    from zx_spark.operators.similarity import ivf_topk, with_super_col
    from zx_spark.streaming.vectors import read_vector_index, vector_index_sink

    rng = np.random.RandomState(23)
    cc = rng.randn(6, 12) * 3.0
    X = cc[rng.randint(0, 6, size=500)] + 0.3 * rng.randn(500, 12)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(500)],
        "vec_id long, embedding array<double>",
    )
    c, s, ch, _sid = ivf2_fit_sampled(
        df, sample_n=300, target_cell=40, fit="hier", rebalance=True
    )
    src = str(tmp_path / "src")
    store = str(tmp_path / "vstore")
    cp = str(tmp_path / "cp")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = vector_index_sink(
        stream, store,
        [[float(x) for x in r] for r in c],
        checkpoint_dir=cp, available_now=True,
        super_centers=[[float(x) for x in r] for r in s],
        children=ch,
    )
    assert q.awaitTermination(120)
    got = read_vector_index(spark, store)
    want = with_super_col(ivf2_assign(df, c, s, ch), ch, len(c))
    g = {r["vec_id"]: (r["ivf_cell"], r["ivf_super"]) for r in got.collect()}
    w = {r["vec_id"]: (r["ivf_cell"], r["ivf_super"]) for r in want.collect()}
    assert g == w
    qv = [float(x) for x in X[7]]
    pruned = ivf_topk(
        got, c, qv, k=5, nprobe=3,
        supers=s, children=ch, p_super=2, super_col="ivf_super",
    )
    plain = ivf_topk(
        got, c, qv, k=5, nprobe=3, supers=s, children=ch, p_super=2,
    ).collect()
    assert [tuple(r) for r in pruned.collect()] == [tuple(r) for r in plain]
    assert plain
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "ivf_super" in plan

# ------------------------------------------------ r10 review regressions


def test_twins_chunking_invariance(monkeypatch):
    """r10 review: the per-group child matrix must be sub-chunked too
    (under super skew it can approach rows x n_cells). Forcing a tiny
    FIT_BLOCK_ENTRIES must not change a single assignment or probe."""
    import zx_spark.operators.similarity as sim

    ids, X = _clustered(n=250, kc=3)
    c, s, ch = ivf2_fit_numpy(ids, X, n_cells=12, n_super=3)
    a_big = assign_2level_numpy(X, c, s, ch, p_super=2)
    p_big = probe_2level_numpy(X, c, s, ch, p_super=2, nprobe=3)
    monkeypatch.setattr(sim, "FIT_BLOCK_ENTRIES", 64)
    a_small = sim.assign_2level_numpy(X, c, s, ch, p_super=2)
    p_small = sim.probe_2level_numpy(X, c, s, ch, p_super=2, nprobe=3)
    assert np.array_equal(a_big, a_small)
    assert all(np.array_equal(a, b) for a, b in zip(p_big, p_small))


def test_fit_hier_tiny_budget_deterministic(monkeypatch):
    """With a forced tiny matrix budget every subsample path (super
    fit cap, block cap, md5-rank reuse) runs — the fit must stay
    deterministic and structurally valid."""
    import zx_spark.operators.similarity as sim

    ids, X = _clustered(n=300, kc=4)
    monkeypatch.setattr(sim, "FIT_BLOCK_ENTRIES", 512)
    c1, s1, ch1 = sim.ivf2_fit_hier(ids, X, n_cells=12, n_super=3)
    c2, s2, ch2 = sim.ivf2_fit_hier(ids, X, n_cells=12, n_super=3)
    assert np.array_equal(c1, c2) and ch1 == ch2
    assert sorted(x for kk in ch1 for x in kk) == list(range(len(c1)))
    # the capped super subsample is exactly the md5-first prefix
    super_fit_n = min(300, max(3, 512 // 3))
    take = _md5_take(ids, super_fit_n)
    S = ivf_centers_numpy(ids[take], X[take], 3, 5)
    assert np.array_equal(np.asarray(s1), np.asarray(S))
    # rebalance under the tiny budget also stays deterministic
    r1 = sim.ivf2_rebalance_hier(ids, X, c1, s1, ch1, target_cell=20)
    r2 = sim.ivf2_rebalance_hier(ids, X, c1, s1, ch1, target_cell=20)
    assert np.array_equal(r1[0], r2[0]) and r1[2] == r2[2]


def test_shortlist_rejected_on_exact_engines(spark):
    """r10 review: shortlist is the int8 recall knob — the exact
    engines must reject it, not silently ignore it."""
    ids, X = _clustered(n=60)
    c, s, ch = ivf2_fit_numpy(ids, X, n_cells=6, n_super=2)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    assigned = ivf2_assign(df, c, s, ch)
    with pytest.raises(ValueError, match="shortlist"):
        knn_pairs_2level(
            assigned, c, s, ch, k=2, nprobe=2,
            score_engine="catalyst", shortlist=8,
        )
    from zx_spark.operators.similarity import knn_pairs

    with pytest.raises(ValueError, match="shortlist"):
        knn_pairs(assigned, c, k=2, nprobe=2,
                  score_engine="catalyst", shortlist=8)


def test_recall_grid_rejects_bad_k():
    ids, X = _clustered(n=40)
    c, s, ch = ivf2_fit_numpy(ids, X, n_cells=4, n_super=2)
    with pytest.raises(ValueError, match="k must be"):
        measure_recall_grid(ids, X, c, s, ch, k=0)


def test_fit_sampled_skips_corpus_count_when_n_cells_given(spark):
    """r10 review: with n_cells supplied, the corpus count must not
    run (it exists only to derive n_cells) — job-count pinned via a
    dedicated job group (the r9 lesson)."""
    rng = np.random.RandomState(2)
    X = rng.randn(100, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    sc = spark.sparkContext
    tracker = spark.sparkContext.statusTracker()
    sc.setJobGroup("fit_with_cells", "r10")
    ivf2_fit_sampled(df, sample_n=50, n_cells=4)
    with_cells = len(tracker.getJobIdsForGroup("fit_with_cells"))
    sc.setJobGroup("fit_no_cells", "r10")
    ivf2_fit_sampled(df, sample_n=50, target_cell=25)
    no_cells = len(tracker.getJobIdsForGroup("fit_no_cells"))
    sc.setJobGroup(None, None)
    assert with_cells < no_cells, (with_cells, no_cells)


def test_compact_hierarchical_vector_store(spark, tmp_path):
    """storage.compact_store must preserve the (epoch, super, cell)
    streaming-store layout — partition discovery is generic, but
    nothing pinned the three-level vector layout until r10: after
    compaction the directory levels survive, read_vector_index dedups
    identically, and two-level serving returns the same rows."""
    import os

    from zx_spark.operators.similarity import ivf_topk
    from zx_spark.storage import compact_store
    from zx_spark.streaming.vectors import read_vector_index, vector_index_sink

    rng = np.random.RandomState(31)
    X = rng.randn(200, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    c, s, ch = ivf2_fit_hier(np.arange(200), X, n_cells=6, n_super=2)
    src = str(tmp_path / "src")
    store = str(tmp_path / "vstore")
    # two files -> two epochs (maxFilesPerTrigger=1)
    df.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    df.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = vector_index_sink(
        stream, store, [[float(x) for x in r] for r in c],
        checkpoint_dir=str(tmp_path / "cp"), available_now=True,
        super_centers=[[float(x) for x in r] for r in s], children=ch,
    )
    assert q.awaitTermination(120)
    qv = [float(x) for x in X[3]]
    before = ivf_topk(
        read_vector_index(spark, store), c, qv, k=5, nprobe=3,
        supers=s, children=ch, p_super=2, super_col="ivf_super",
    ).collect()
    report = compact_store(spark, store, target_file_mb=64)
    assert report["rows"] == 200
    # the three-level directory layout survives
    eps = sorted(d for d in os.listdir(store) if d.startswith("epoch="))
    assert len(eps) == 2
    sup_dirs = [
        d for d in os.listdir(os.path.join(store, eps[0]))
        if d.startswith("ivf_super=")
    ]
    assert sup_dirs
    cell_dirs = os.listdir(os.path.join(store, eps[0], sup_dirs[0]))
    assert any(d.startswith("ivf_cell=") for d in cell_dirs)
    after = ivf_topk(
        read_vector_index(spark, store), c, qv, k=5, nprobe=3,
        supers=s, children=ch, p_super=2, super_col="ivf_super",
    ).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before] and after


def test_fit_dist_exact_n_cells_apportionment(spark):
    """r10: n_cells passed to ivf2_fit_dist apportions children over
    FULL-corpus super counts — exactly n_cells centers when feasible,
    still a contiguous valid hierarchy."""
    from zx_spark.operators.similarity import ivf2_fit_dist

    ids, X = _clustered(n=400, kc=5)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    c, s, ch = ivf2_fit_dist(
        df, n_super=3, super_sample_n=400, n_cells=10, engine="catalyst"
    )
    assert len(c) == 10
    assert sorted(x for kk in ch for x in kk) == list(range(10))
    with pytest.raises(ValueError, match="n_cells"):
        ivf2_fit_dist(df, super_sample_n=400, n_cells=0)


def test_fit_dist_exact_n_cells_beyond_toy_scale(spark):
    """r10 third review: with n_cells SMALLER than the N-derived super
    count, the old sizing returned more than n_cells centers (the
    apportion floor gives every non-empty super one child). n_super
    must derive from the supplied n_cells, like ivf2_fit_hier."""
    from zx_spark.operators.similarity import ivf2_fit_dist

    ids, X = _clustered(n=2000, kc=6, seed=13)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    c, s, ch = ivf2_fit_dist(df, super_sample_n=500, n_cells=2)
    assert len(c) == 2 and len(s) <= 2
    assert sorted(x for kk in ch for x in kk) == [0, 1]
    with pytest.raises(ValueError, match="n_cells"):
        ivf2_fit_dist(df, super_sample_n=500, n_cells=0)


def test_fit_dist_skips_corpus_count_when_n_cells_given(spark):
    """r10 third review: the count-skip discipline applies to the dist
    rung too — with n_cells supplied, no full-corpus count() runs."""
    rng = np.random.RandomState(4)
    X = rng.randn(120, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    from zx_spark.operators.similarity import ivf2_fit_dist

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("dist_with_cells", "r10")
    ivf2_fit_dist(df, super_sample_n=120, n_cells=4)
    with_cells = len(tracker.getJobIdsForGroup("dist_with_cells"))
    sc.setJobGroup("dist_no_cells", "r10")
    ivf2_fit_dist(df, super_sample_n=120, target_cell=30)
    no_cells = len(tracker.getJobIdsForGroup("dist_no_cells"))
    sc.setJobGroup(None, None)
    assert with_cells < no_cells, (with_cells, no_cells)


def test_fit_dist_single_corpus_scan(spark):
    """r11 (r10 verdict item 1): the count job and the child-fit job
    share ONE corpus assignment — the frame is persisted between the
    two actions, so source rows are read exactly twice end-to-end
    (once by the TakeOrdered super sample, once materializing the
    persist), never three times."""
    from zx_spark.operators.similarity import ivf2_fit_dist

    rng = np.random.RandomState(7)
    n = 300
    X = rng.randn(n, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    acc = spark.sparkContext.accumulator(0)

    def count_rows(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    counted = df.mapInPandas(count_rows, df.schema)
    c, s, ch = ivf2_fit_dist(
        counted, n_super=4, super_sample_n=n, target_cell=30,
        engine="catalyst",
    )
    assert len(c) > 0
    assert acc.value == 2 * n, acc.value


def test_fit_dist_model_is_source_order_independent(spark):
    """r11 (r10 advisor): _fit_block imposes ascending-id fit order, so
    the model cannot depend on shuffle arrival order — pinned by
    fitting the same rows from two differently-ordered sources."""
    from zx_spark.operators.similarity import ivf2_fit_dist

    ids, X = _clustered(n=400)
    rows = [(int(i), [float(x) for x in X[i]]) for i in ids]
    schema = "vec_id long, embedding array<double>"
    fwd = spark.createDataFrame(rows, schema).repartition(7)
    rev = spark.createDataFrame(rows[::-1], schema).repartition(3)
    kw = dict(target_cell=40, n_super=4, super_sample_n=400, engine="catalyst")
    c1, s1, ch1 = ivf2_fit_dist(fwd, **kw)
    c2, s2, ch2 = ivf2_fit_dist(rev, **kw)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert ch1 == ch2


def test_fit_dist_rebalance_composes(spark):
    """r11: rebalance=True is exactly ivf2_rebalance_hier over the
    super sample with the pro-rated bound, applied to the plain fit's
    model — and a sample smaller than the fitted cell count is
    rejected (per-cell sample counts would be sub-1 noise)."""
    from zx_spark.operators.similarity import (
        _md5_take,
        ivf2_fit_dist,
        ivf2_rebalance_hier,
    )

    ids, X = _clustered(n=500, kc=4)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    kw = dict(target_cell=50, n_super=3, super_sample_n=500, engine="catalyst")
    c0, s0, ch0 = ivf2_fit_dist(df, **kw)
    cr, sr, chr_ = ivf2_fit_dist(df, rebalance=True, **kw)
    take = _md5_take(ids, 500)
    sample_cell = int(np.ceil(500 / len(c0)))
    cw, sw, chw = ivf2_rebalance_hier(
        ids[take], X[take], c0, s0, ch0, target_cell=sample_cell, iters=5
    )
    assert np.array_equal(np.asarray(cr), np.asarray(cw))
    assert np.array_equal(np.asarray(sr), np.asarray(sw))
    assert chr_ == chw
    with pytest.raises(ValueError, match="rebalance=True needs"):
        ivf2_fit_dist(
            df, rebalance=True, target_cell=10, n_super=3,
            super_sample_n=20, engine="catalyst",
        )


def test_fit_dist_numpy_twin_pins_spark(spark):
    """r11: the LIBRARY twin (ivf2_fit_dist_numpy — the one the DuckDB
    oracle replays the dist arm with) equals the Spark fit on every
    path: target_cell allocation, exact-n_cells apportionment, member
    cap, and rebalance composition."""
    from zx_spark.operators.similarity import (
        ivf2_fit_dist,
        ivf2_fit_dist_numpy,
    )

    ids, X = _clustered(n=500)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    grids = [
        dict(target_cell=50, n_super=4, super_sample_n=500),
        dict(n_cells=8, super_sample_n=300),
        dict(target_cell=30, n_super=3, super_sample_n=300, max_group_rows=60),
        dict(target_cell=50, n_super=4, super_sample_n=500, rebalance=True),
    ]
    for kw in grids:
        c, s, ch = ivf2_fit_dist(df, engine="catalyst", **kw)
        cw, sw, chw = ivf2_fit_dist_numpy(ids, X, **kw)
        assert np.array_equal(np.asarray(c), cw), kw
        assert np.array_equal(np.asarray(s), sw), kw
        assert ch == chw, kw
    with pytest.raises(ValueError, match="sample rows"):
        ivf2_fit_dist_numpy(ids, X, n_super=8, super_sample_n=4)
    with pytest.raises(ValueError, match="at least one"):
        ivf2_fit_dist_numpy(np.array([]), np.empty((0, 4)))


def test_recall_grid_metric_modes():
    """r11 (r10 verdict #3): the grid's default squared-L2 probe equals
    the cosine serving probe only for L2-normalized embeddings —
    metric='cosine' measures the serving selection itself
    (probe_cells_2level per query, pinned here), and on a deliberately
    UNNORMALIZED corpus the two modes pick different probe lists."""
    from zx_spark.operators.similarity import probe_cells_2level

    rng = np.random.RandomState(13)
    # two directions, very different NORMS: L2 picks the near-in-space
    # center, cosine the near-in-angle one
    X = np.vstack([
        rng.randn(200, 6) * 0.1 + np.array([4.0, 0, 0, 0, 0, 0]),
        rng.randn(200, 6) * 0.1 + np.array([0, 0.5, 0, 0, 0, 0]),
    ])
    ids = np.arange(len(X))
    c, s, ch = ivf2_fit_numpy(ids, X, n_cells=8, n_super=2)
    # queries in the divergence region: L2-near the small-norm cluster,
    # cosine-near the big-norm one (cos picks direction, L2 position)
    Q = np.array([[1.2, 0.4, 0, 0, 0, 0], [0.9, 0.25, 0, 0, 0, 0]])
    pl2 = probe_2level_numpy(Q, c, s, ch, p_super=1, nprobe=3)
    pcos = probe_2level_numpy(Q, c, s, ch, p_super=1, nprobe=3,
                              metric="cosine")
    # cosine mode IS the serving selection
    for i in range(len(Q)):
        want = probe_cells_2level(c, s, ch, [float(t) for t in Q[i]], 3, 1)
        assert list(pcos[i]) == [int(x) for x in want]
    assert any(list(a) != list(b) for a, b in zip(pl2, pcos))
    # normalized rows: the two rankings coincide
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cn, sn, chn = ivf2_fit_numpy(ids, Xn, n_cells=8, n_super=2)
    gl2 = measure_recall_grid(ids, Xn, cn, sn, chn, k=2, max_queries=64)
    gcos = measure_recall_grid(ids, Xn, cn, sn, chn, k=2, max_queries=64,
                               metric="cosine")
    assert gl2 == gcos
    with pytest.raises(ValueError, match="metric"):
        measure_recall_grid(ids, X, c, s, ch, metric="dot")
    with pytest.raises(ValueError, match="metric"):
        probe_2level_numpy(X[:2], c, s, ch, 1, 2, metric="dot")


def test_md5_sample_narrow_path_matches_classic(spark, monkeypatch):
    """The big-sample two-pass (threshold filter + ids-only TakeOrdered
    + semi-join fetch, r11) must select the SAME rows in the SAME
    (md5, id) order as the classic orderBy().limit().collect() — the
    fits' per-cell float sums are input-order-sensitive, so the twin
    replay depends on the exact sequence."""
    import numpy as np

    import zx_spark.operators.similarity as sim

    rng = np.random.RandomState(3)
    rows = [
        (int(i), [float(x) for x in rng.randn(8)]) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sel = df.selectExpr(
        "vec_id as __id", "cast(embedding as array<double>) as __v"
    )
    classic = sim._md5_sample_rows(sel, 300, None)  # n <= threshold
    monkeypatch.setattr(sim, "SAMPLE_NARROW_ROWS", 100)
    narrow = sim._md5_sample_rows(sel, 300, 5000)
    narrow_counted = sim._md5_sample_rows(sel, 300, None)  # derives count
    got_c = [(int(r["__id"]), list(r["__v"])) for r in classic]
    got_n = [(int(r["__id"]), list(r["__v"])) for r in narrow]
    got_nc = [(int(r["__id"]), list(r["__v"])) for r in narrow_counted]
    assert got_c == got_n == got_nc
    # undershoot safety: an n_total wildly too LARGE shrinks the
    # threshold below n survivors — the helper must fall back to the
    # classic exact path, not return a short sample
    short = sim._md5_sample_rows(sel, 300, 50_000_000)
    assert [(int(r["__id"])) for r in short] == [i for i, _ in got_c]


def test_fit_sampled_narrow_sample_same_model(spark, monkeypatch):
    """ivf2_fit_sampled through the narrow sample path returns the
    byte-identical model (same rows, same order, same Lloyd)."""
    import numpy as np

    import zx_spark.operators.similarity as sim

    rng = np.random.RandomState(9)
    rows = [
        (int(i), [float(x) for x in rng.randn(8)]) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1, s1, ch1, sid1 = sim.ivf2_fit_sampled(
        df, sample_n=400, target_cell=50, n_total=3000
    )
    monkeypatch.setattr(sim, "SAMPLE_NARROW_ROWS", 128)
    c2, s2, ch2, sid2 = sim.ivf2_fit_sampled(
        df, sample_n=400, target_cell=50, n_total=3000
    )
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert ch1 == ch2
    assert list(sid1) == list(sid2)


def test_md5_sample_narrow_duplicate_ids_fall_back_classic(spark, monkeypatch):
    """ADVICE r11 (low): duplicate __id values collapse in the narrow
    path's order dict and fan out in the semi-join fetch — the helper
    must detect the mismatch and return the classic exact result."""
    import numpy as np

    import zx_spark.operators.similarity as sim

    rng = np.random.RandomState(11)
    rows = [
        (int(i % 400), [float(x) for x in rng.randn(4)]) for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sel = df.selectExpr(
        "vec_id as __id", "cast(embedding as array<double>) as __v"
    )
    classic = sim._md5_sample_rows(sel, 250, None)  # n <= threshold
    monkeypatch.setattr(sim, "SAMPLE_NARROW_ROWS", 64)
    narrow = sim._md5_sample_rows(sel, 250, 1200)
    # With duplicate ids the (md5, id) tie-break among a duplicate's
    # rows is arbitrary even classically, so pin the deterministic part:
    # EXACTLY n rows (no semi-join fan-out past n) in classic id order.
    assert len(narrow) == 250
    assert [int(r["__id"]) for r in narrow] == [int(r["__id"]) for r in classic]

"""Recall-vs-cost grid for the two-level IVF (SCALE.md r9, VERDICT r8
item 5): measures top-k recall of the two-level probe selection across
(p_super, nprobe) on BOTH a random-gaussian corpus (the adversarial
no-structure case) and a clustered mixture (the realistic embedding
case), entirely in numpy via the SAME selection math the Spark
operators run (ivf2_assign / knn_pairs_2level probe selection is
test-pinned identical to this arithmetic), so the grid is the
operator's recall without a cluster in the loop.

Cost column = centers scored per query (n_super + p_super*avg_child)
plus candidates scanned (nprobe * avg cell size) — the two terms the
hierarchy trades.

Run: python tools/ann_recall.py [n] [dim]  (defaults 20000 x 64)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _corpus(kind: str, n: int, dim: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    if kind == "random":
        return rng.randn(n, dim)
    # clustered: 64 gaussian clusters, within-cluster sigma 0.3 of the
    # center scale — the shape real embedding corpora actually have
    kc = 64
    centers = rng.randn(kc, dim)
    asg = rng.randint(0, kc, size=n)
    return centers[asg] + 0.3 * rng.randn(n, dim)


def _exact_topk(X: np.ndarray, k: int, chunk: int = 2048) -> np.ndarray:
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    n = len(X)
    out = np.empty((n, k), dtype=np.int64)
    for s in range(0, n, chunk):
        sims = Xn[s : s + chunk] @ Xn.T
        for i in range(sims.shape[0]):
            sims[i, s + i] = -2.0
        out[s : s + chunk] = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return out


def _assign(X, centers, supers, children, p_super):
    """ivf2_assign twin — since r10 the library owns this arithmetic
    (assign_2level_numpy, shared with ivf2_rebalance_hier and
    measure_recall_grid); the tool delegates so the measured grid IS
    the operator's selection."""
    from zx_spark.operators.similarity import assign_2level_numpy

    return assign_2level_numpy(X, centers, supers, children, p_super)


def _probe(X, centers, supers, children, p_super, nprobe):
    from zx_spark.operators.similarity import probe_2level_numpy

    return probe_2level_numpy(X, centers, supers, children, p_super, nprobe)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = 4
    from zx_spark.operators.similarity import ivf2_fit_numpy

    results = []
    for kind in ("random", "clustered"):
        X = _corpus(kind, n, dim)
        ids = np.arange(n)
        centers, supers, children = ivf2_fit_numpy(ids, X, target_cell=128)
        ns, nc = len(supers), len(centers)
        truth = _exact_topk(X, k)
        cells = _assign(X, centers, supers, children, p_super=4)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        cell_rows = {c: np.flatnonzero(cells == c) for c in range(nc)}
        avg_child = nc / ns
        avg_cell = n / nc
        for p_super in (1, 2, 4, min(8, ns), ns):
            for nprobe in (1, 2, 4, 8, 16):
                probes = _probe(X, centers, supers, children, p_super, nprobe)
                hits = 0
                for i in range(n):
                    cand = np.concatenate(
                        [cell_rows[c] for c in probes[i] if len(cell_rows[c])]
                        or [np.empty(0, dtype=np.int64)]
                    )
                    cand = cand[cand != i]
                    if len(cand) == 0:
                        continue
                    sims = Xn[cand] @ Xn[i]
                    top = cand[np.argsort(-sims, kind="stable")[:k]]
                    hits += len(set(top) & set(truth[i]))
                cost = ns + p_super * avg_child + nprobe * avg_cell
                results.append(
                    {
                        "corpus": kind,
                        "p_super": int(p_super),
                        "nprobe": int(nprobe),
                        "recall": round(hits / (k * n), 3),
                        "cost_per_query": round(cost, 0),
                    }
                )
                print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()

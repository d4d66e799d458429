"""Measure the distributed IVF fit IN ITS REGIME (VERDICT r10 item 1):
at corpus sizes where n_cells = N/target_cell dwarfs any driver-side
sample, compare ``ivf2_fit_dist`` (supers on a small hash sample,
children fit in parallel on executors over the full corpus) against
``ivf2_fit_sampled`` (the whole fit driver-side on sample_n rows) on
the SAME store with the SAME evaluation:

  - fit wall-clock + peak driver RSS (the resource the dist rung
    exists to bound),
  - full-corpus model quality through the model's OWN serving
    assignment (``ivf2_assign``, arrow engine): mean cosine of every
    row to its assigned cell center (the k-means objective, cosine
    form) and the size-biased mean cell size sum(c^2)/N — the
    candidate rows a knn/SemDeDup query pays PER ROW, where cell skew
    hurts quadratically (SCALE.md r9),
  - serving recall@k for the first ``--queries`` vec_ids through
    ``ivf_topk_batch`` at (nprobe, p_super) vs exact
    ``cosine_topk_batch`` ground truth (one distributed scan each).

Run EXCLUSIVELY (ZX_DRIVER_MEMORY=48g for >=10^7-row stores — local
mode's driver heap is the whole execution heap):
    python tools/ann_dist_regime.py /tmp/zx_vec/n5e7 --arm dist --sample 786432
    python tools/ann_dist_regime.py /tmp/zx_vec/n5e7 --arm sampled --sample 786432

Prints one JSON line per run. ``--sample`` is super_sample_n for the
dist arm (supers + the sample-side rebalance resolution) and sample_n
for the sampled arm (must be >= n_cells or the library refuses — that
refusal IS the regime boundary this tool documents).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    args = sys.argv[1:]
    store = args[0]
    arm = args[args.index("--arm") + 1] if "--arm" in args else "dist"
    sample = int(args[args.index("--sample") + 1]) if "--sample" in args else 786432
    target_cell = (
        int(args[args.index("--target-cell") + 1])
        if "--target-cell" in args else 256
    )
    n_q = int(args[args.index("--queries") + 1]) if "--queries" in args else 64
    nprobe = int(args[args.index("--nprobe") + 1]) if "--nprobe" in args else 8
    # recall at SEVERAL nprobe points in one session (one extra pruned
    # scan each): candidates/query = nprobe x size-biased cell, so the
    # grid lets SCALE.md read recall at a MATCHED candidate budget
    # across arms whose cell sizes differ 3x (VERDICT r11 item 4) —
    # fixed-nprobe recall flatters the fatter-celled arm.
    grid = (
        [int(x) for x in args[args.index("--nprobe-grid") + 1].split(",")]
        if "--nprobe-grid" in args
        else [nprobe]
    )
    k = int(args[args.index("--k") + 1]) if "--k" in args else 10
    no_rebalance = "--no-rebalance" in args
    if arm not in ("dist", "sampled"):
        print("--arm must be dist or sampled")
        sys.exit(2)

    import pyarrow.dataset as pads
    import pandas as pd

    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import (
        cosine_topk_batch,
        ivf2_assign,
        ivf2_fit_dist,
        ivf2_fit_sampled,
        ivf_topk_batch,
    )
    from zx_spark.session import get_spark

    # the sampled arm at quality-matched sample sizes collects the
    # sample's full rows (~530 B/row at 64d): past ~2M rows that one
    # irreducible collect crosses the 1 GiB spark.driver.maxResultSize
    # default — raised HERE (measurement tool) so the arm's cost can be
    # measured past the wall; the library keeps the default, and
    # SCALE.md records the wall as part of the regime boundary
    spark = get_spark(
        "ann_dist_regime", extra_conf={"spark.driver.maxResultSize": "16g"}
    )
    path = f"{store}/embeddings.parquet"
    n = pads.dataset(path, format="parquet").count_rows()
    emb = spark.read.parquet(path).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    t0 = time.time()
    if arm == "dist":
        centers, supers, children = ivf2_fit_dist(
            emb,
            target_cell=target_cell,
            super_sample_n=sample,
            n_total=n,
            rebalance=not no_rebalance,
        )
    else:
        centers, supers, children, _sid = ivf2_fit_sampled(
            emb,
            sample_n=sample,
            target_cell=target_cell,
            n_total=n,
            rebalance=not no_rebalance,
        )
    fit_s = time.time() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024
    n_cells = len(np.asarray(centers))

    # ---- quality: one scan through the model's own serving assignment
    C = np.asarray(centers, dtype=np.float64)
    Cn = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)

    def cell_stats(batches):
        # partial per-cell (count, cosine sum) per arrow batch — only
        # n_cells rows ever leave a partition
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            cells = pdf["ivf_cell"].to_numpy()
            Xn = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12
            )
            cos = np.einsum("ij,ij->i", Xn, Cn[cells])
            cnt = np.bincount(cells, minlength=len(C))
            s = np.bincount(cells, weights=cos, minlength=len(C))
            nz = np.nonzero(cnt)[0]
            yield pd.DataFrame(
                {"cell": nz, "cnt": cnt[nz], "cos_sum": s[nz]}
            )

    t0 = time.time()
    assigned = ivf2_assign(emb, centers, supers, children, engine="arrow")
    stats = (
        assigned.mapInPandas(cell_stats, "cell int, cnt long, cos_sum double")
        .groupBy("cell")
        .agg(F.sum("cnt").alias("cnt"), F.sum("cos_sum").alias("cos_sum"))
        .collect()
    )
    eval_s = time.time() - t0
    cnts = np.array([r["cnt"] for r in stats], dtype=np.float64)
    mean_cos = float(sum(r["cos_sum"] for r in stats) / max(1.0, cnts.sum()))
    sb_cell = float((cnts**2).sum() / max(1.0, cnts.sum()))
    max_cell = int(cnts.max()) if len(cnts) else 0

    # ---- serving recall vs exact ground truth, same queries both arms
    qt = pads.dataset(path, format="parquet").to_table(
        filter=pads.field("vec_id") < n_q, columns=["vec_id", "embedding"]
    )
    order = np.argsort(qt["vec_id"].to_numpy())
    qvecs = [
        [float(x) for x in v]
        for v in np.array(qt["embedding"].to_pylist(), dtype=np.float64)[order]
    ]
    t0 = time.time()
    gt = {
        (r["query_no"], r["vec_id"])
        for r in cosine_topk_batch(emb, qvecs, k=k).collect()
    }
    gt_s = time.time() - t0
    recalls: dict[str, float] = {}
    cand_per_q: dict[str, float] = {}
    serve_secs: dict[str, float] = {}
    for np_i in grid:
        t0 = time.time()
        got = {
            (r["query_no"], r["vec_id"])
            for r in ivf_topk_batch(
                assigned, centers, qvecs, k=k, nprobe=np_i,
                supers=supers, children=children,
            ).collect()
        }
        serve_secs[str(np_i)] = round(time.time() - t0, 1)
        recalls[str(np_i)] = round(len(gt & got) / max(1, len(gt)), 4)
        # expected candidate rows scored per query: probed-cell size is
        # size-biased (hot cells are probed more)
        cand_per_q[str(np_i)] = round(np_i * sb_cell, 1)
    nprobe = grid[0]
    recall = recalls[str(nprobe)]
    serve_s = serve_secs[str(nprobe)]

    print(
        json.dumps(
            {
                "store": store,
                "n": n,
                "arm": arm,
                "sample": sample,
                "rebalance": not no_rebalance,
                "target_cell": target_cell,
                "n_cells": n_cells,
                "fit_sec": round(fit_s, 1),
                "peak_driver_rss_gb": round(peak_gb, 2),
                "assign_eval_sec": round(eval_s, 1),
                "mean_assigned_cosine": round(mean_cos, 4),
                "size_biased_mean_cell": round(sb_cell, 1),
                "max_cell": max_cell,
                "recall_at_k": round(recall, 4),
                "k": k,
                "nprobe": nprobe,
                "recall_by_nprobe": recalls,
                "candidates_per_query_by_nprobe": cand_per_q,
                "serve_sec_by_nprobe": serve_secs,
                "queries": n_q,
                "gt_sec": round(gt_s, 1),
                "serve_sec": serve_s,
            }
        )
    )


if __name__ == "__main__":
    main()

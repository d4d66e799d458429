"""Measure IVF SERVING latency on a (super, cell)-partitioned store at
regime scale (VERDICT r12 item 3; SCALE.md r12 honesty note).

The r12 recall grid ran each serving point as a FULL flat scan
(~18 min/point at 5x10^7) because the measurement store was a plain
127-partition parquet table. This tool writes the SAME dist-arm model's
assignment through ``write_ivf_store`` (``ivf_super=<s>/ivf_cell=<c>/``
layout — the production layout the library documents) and re-runs the
serving grid on the PRUNED store, so SCALE.md's serving-latency column
reflects what a probe actually reads: the union of the probed cells'
files, not the corpus.

Phases, each resumable from its artifact:
  1. fit   — ``ivf2_fit_dist(target_cell, super_sample_n, rebalance)``,
             cached to ``<out>/model.npz`` (the fit is deterministic;
             r12 reproduced it byte-identically vs r11).
  2. write — ``ivf2_assign`` (arrow) + ``with_super_col`` +
             ``write_ivf_store`` to ``<out>/store``, pre-shuffled by
             the super key so each leaf cell dir gets ONE file.
             Skipped when ``<out>/store/_SUCCESS`` exists.
  3. serve — exact ground truth once (``cosine_topk_batch``, one full
             scan — the price of RECALL, not of serving), then
             ``ivf_topk_batch`` per nprobe grid point on the pruned
             store, recording store-listing time, per-point wall, and
             recall (must reproduce the r12 flat-scan numbers — same
             model, same queries).

Run exclusively (local mode's driver heap is the execution heap):
    ZX_DRIVER_MEMORY=48g python tools/ann_store_serving.py \
        /tmp/zx_vec/n5e7 --out /tmp/zx_vec/n5e7_ivf \
        --nprobe-grid 8,12,16,24,32 --engines catalyst,arrow,filter

``--engines`` picks serving paths per grid point: ``catalyst`` /
``arrow`` go through ``ivf_topk_batch_store`` (probed-directory reads;
arrow = the BLAS batch scorer), ``filter`` reads the whole store and
relies on partition pruning (pays the full file-index listing — the
r13 baseline column). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    args = sys.argv[1:]
    store = args[0]
    out = (
        args[args.index("--out") + 1]
        if "--out" in args
        else store.rstrip("/") + "_ivf"
    )
    target_cell = (
        int(args[args.index("--target-cell") + 1])
        if "--target-cell" in args else 256
    )
    sample = int(args[args.index("--sample") + 1]) if "--sample" in args else 786432
    n_q = int(args[args.index("--queries") + 1]) if "--queries" in args else 64
    k = int(args[args.index("--k") + 1]) if "--k" in args else 10
    grid = [
        int(x)
        for x in (
            args[args.index("--nprobe-grid") + 1]
            if "--nprobe-grid" in args
            else "8,12,16,24,32"
        ).split(",")
    ]
    # serving engines to time per grid point: 'catalyst' (oracle-grade
    # JVM fold), 'arrow' (BLAS batch scorer), and/or 'filter' (read the
    # whole store and rely on partition pruning — the r13 baseline)
    engines = (
        args[args.index("--engines") + 1].split(",")
        if "--engines" in args
        else ["catalyst"]
    )
    # --repeat N: THROUGHPUT mode (VERDICT r13 item 3) — per grid point,
    # serve N consecutive batches of DISTINCT queries (each batch pays
    # its own probe selection + pruned-directory planning, the
    # production shape) and report per-batch walls + QPS. Ground truth /
    # recall are skipped: the recall surface is identical to the
    # single-batch grid (same model, same serving math) and was pinned
    # in r12/r13.
    repeat = int(args[args.index("--repeat") + 1]) if "--repeat" in args else 0
    # --concurrent T: with --repeat, submit the N batches from T driver
    # threads (Spark's scheduler interleaves the jobs — the multi-client
    # serving shape); wall-clock QPS then reflects scheduler overlap,
    # not just sequential batch latency.
    concurrent = (
        int(args[args.index("--concurrent") + 1]) if "--concurrent" in args else 1
    )

    import pyarrow.dataset as pads

    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import (
        cosine_topk_batch,
        ivf2_assign,
        ivf2_fit_dist,
        ivf_topk_batch,
        ivf_topk_batch_store,
        read_ivf_manifest,
        with_super_col,
        write_ivf_manifest,
        write_ivf_store,
    )
    from zx_spark.session import get_spark

    spark = get_spark(
        "ann_store_serving",
        extra_conf={"spark.driver.maxResultSize": "16g"},
    )
    raw = f"{store}/embeddings.parquet"
    n = pads.dataset(raw, format="parquet").count_rows()
    emb = spark.read.parquet(raw).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    timings: dict[str, float] = {}
    os.makedirs(out, exist_ok=True)
    model_path = f"{out}/model.npz"

    # ---- phase 1: fit (deterministic; cache so re-runs skip 36 min)
    if os.path.exists(model_path):
        m = np.load(model_path)
        centers = m["centers"]
        supers = m["supers"]
        lens = m["children_len"]
        flat = m["children_flat"]
        off = np.concatenate([[0], np.cumsum(lens)])
        children = [
            [int(c) for c in flat[off[i] : off[i + 1]]] for i in range(len(lens))
        ]
        timings["fit_sec"] = float(m["fit_sec"])
        fit_cached = True
    else:
        t0 = time.time()
        centers, supers, children = ivf2_fit_dist(
            emb,
            target_cell=target_cell,
            super_sample_n=sample,
            n_total=n,
            rebalance=True,
        )
        timings["fit_sec"] = round(time.time() - t0, 1)
        np.savez_compressed(
            model_path,
            centers=np.asarray(centers, dtype=np.float64),
            supers=np.asarray(supers, dtype=np.float64),
            children_flat=np.array(
                [c for kids in children for c in kids], dtype=np.int64
            ),
            children_len=np.array([len(kids) for kids in children], dtype=np.int64),
            fit_sec=timings["fit_sec"],
        )
        fit_cached = False
    n_cells = len(np.asarray(centers))

    # ---- phase 2: assign + partitioned write (the production layout)
    store_path = f"{out}/store"
    if not os.path.exists(f"{store_path}/_SUCCESS"):
        t0 = time.time()
        assigned = ivf2_assign(emb, centers, supers, children, engine="arrow")
        assigned = with_super_col(assigned, children, n_cells)
        # one shuffle on the super key: each task then owns whole supers,
        # so every ivf_cell leaf dir gets exactly one file instead of one
        # per upstream partition (127x fewer files at 2x10^5 cells)
        n_super = len(np.asarray(supers))
        write_ivf_store(
            assigned.repartition(n_super, "ivf_super"),
            store_path,
            super_col="ivf_super",
        )
        timings["assign_write_sec"] = round(time.time() - t0, 1)

    # ---- phase 2b: manifest (r14) — upgrade a pre-manifest store in
    # place so the direct path resolves probed dirs from the manifest
    # (the object-store-safe resolution); the one full-tree listing +
    # partition-column count is paid HERE, write-side, and timed.
    if read_ivf_manifest(spark, store_path) is None:
        t0 = time.time()
        write_ivf_manifest(spark, store_path, super_col="ivf_super")
        timings["manifest_write_sec"] = round(time.time() - t0, 1)

    # ---- phase 3: serving on the pruned store
    n_files = -1
    stored = None
    if "filter" in engines:
        t0 = time.time()
        stored = spark.read.parquet(store_path)
        # force the file-index build (the catalog cost the hierarchical
        # layout bounds): planning any query lists the partition tree once
        stored.select(F.lit(1)).limit(1).collect()
        timings["store_listing_sec"] = round(time.time() - t0, 1)
        n_files = len(stored.inputFiles())

    n_qvecs = n_q * max(1, repeat)
    qt = pads.dataset(raw, format="parquet").to_table(
        filter=pads.field("vec_id") < n_qvecs, columns=["vec_id", "embedding"]
    )
    order = np.argsort(qt["vec_id"].to_numpy())
    qvecs = [
        [float(x) for x in v]
        for v in np.array(qt["embedding"].to_pylist(), dtype=np.float64)[order]
    ]

    if repeat:
        # ---- throughput mode: N warm batches per engine per nprobe
        batches = [qvecs[i * n_q : (i + 1) * n_q] for i in range(repeat)]

        def _serve_one(eng, np_i, b):
            t0 = time.time()
            if eng == "filter":
                out_df = ivf_topk_batch(
                    stored, centers, b, k=k, nprobe=np_i,
                    supers=supers, children=children,
                    super_col="ivf_super",
                )
            else:
                out_df = ivf_topk_batch_store(
                    spark, store_path, centers, b, k=k, nprobe=np_i,
                    supers=supers, children=children, engine=eng,
                )
            rows = out_df.collect()
            assert len(rows) == k * len(b), (eng, np_i, len(rows))
            return time.time() - t0

        thr: dict[str, dict] = {}
        for eng in engines:
            if eng == "filter" and stored is None:
                stored = spark.read.parquet(store_path)
            for np_i in grid:
                t_all = time.time()
                if concurrent > 1:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(concurrent) as pool:
                        walls = list(
                            pool.map(lambda b: _serve_one(eng, np_i, b), batches)
                        )
                else:
                    walls = [_serve_one(eng, np_i, b) for b in batches]
                wall_total = time.time() - t_all
                key = f"{np_i}/{eng}"
                thr[key] = {
                    "batch_secs": [round(w, 2) for w in walls],
                    "mean_sec": round(sum(walls) / len(walls), 2),
                    "min_sec": round(min(walls), 2),
                    "wall_sec": round(wall_total, 2),
                    "batches_per_min": round(60.0 * len(walls) / wall_total, 2),
                    "qps": round(n_q * len(walls) / wall_total, 1),
                }
        print(
            json.dumps(
                {
                    "mode": "throughput",
                    "store": store,
                    "out": out,
                    "n": n,
                    "n_cells": n_cells,
                    "queries_per_batch": n_q,
                    "batches": repeat,
                    "concurrent": concurrent,
                    "k": k,
                    "throughput": thr,
                    **timings,
                }
            )
        )
        return

    t0 = time.time()
    gt = {
        (r["query_no"], r["vec_id"])
        for r in cosine_topk_batch(emb, qvecs, k=k).collect()
    }
    timings["gt_sec"] = round(time.time() - t0, 1)

    recalls: dict[str, float] = {}
    serve_secs: dict[str, float] = {}
    for eng in engines:
        for np_i in grid:
            t0 = time.time()
            if eng == "filter":
                out_df = ivf_topk_batch(
                    stored,
                    centers,
                    qvecs,
                    k=k,
                    nprobe=np_i,
                    supers=supers,
                    children=children,
                    super_col="ivf_super",
                )
            else:
                out_df = ivf_topk_batch_store(
                    spark,
                    store_path,
                    centers,
                    qvecs,
                    k=k,
                    nprobe=np_i,
                    supers=supers,
                    children=children,
                    engine=eng,
                )
            got = {(r["query_no"], r["vec_id"]) for r in out_df.collect()}
            key = str(np_i) if engines == ["catalyst"] else f"{np_i}/{eng}"
            serve_secs[key] = round(time.time() - t0, 1)
            recalls[key] = round(len(gt & got) / max(1, len(gt)), 4)

    print(
        json.dumps(
            {
                "store": store,
                "out": out,
                "n": n,
                "n_cells": n_cells,
                "n_super": len(np.asarray(supers)),
                "n_files": n_files,
                "target_cell": target_cell,
                "sample": sample,
                "fit_cached": fit_cached,
                "queries": n_q,
                "k": k,
                "recall_by_nprobe": recalls,
                "serve_sec_by_nprobe": serve_secs,
                **timings,
            }
        )
    )


if __name__ == "__main__":
    main()

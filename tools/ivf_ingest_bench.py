"""Measure the IVF serving-store INGEST lifecycle in its regime
(r14): ``ivf_store_append`` micro-batches into a ≥10⁷-row
``write_ivf_store`` layout, file accretion's serving tax, and
``ivf_store_compact``'s touched-cell-only repair.

Why this needs its own regime run: the lifecycle's costs are all
catalog-shaped — append pays one aggregate over the batch plus one
file per (task, touched cell); accretion multiplies the files a probe
opens; compaction's victim selection must NOT scale with the tree.
None of that is visible at the 2k-row test scale where every cost is
a constant.

Phases (store artifacts reuse tools/ann_store_serving.py layout —
``<out>/model.npz`` + ``<out>/store`` — so a prior serving run's
store can be ingested into directly):
  1. fit+write — ``ivf2_fit_dist`` + ``ivf2_assign`` +
     ``write_ivf_store`` exactly as ann_store_serving phases 1-2,
     skipped when the artifacts exist. The manifest is (re)written
     with file counts (v2) if absent or v1.
  2. serve-0 — one 64-query arrow batch on the pristine store
     (baseline serving latency; min of 2).
  3. append ×B — B micro-batches of ``--batch-rows`` NEW vectors
     (ids beyond the corpus, same deterministic generator as
     tools/make_vector_store.py), each: arrow assign + super
     annotation + ``ivf_store_append``; per-batch wall split into
     assign vs append+manifest.
  4. serve-N — the same 64-query batch on the accreted store (the
     file-open tax the appends created).
  5. compact — ``ivf_store_compact(max_files_per_cell=1)``; wall,
     files before/after, victim count.
  6. serve-C — same batch again (the tax reclaimed; must also return
     rows consistent with serve-N minus nothing: appended ids can
     enter the top-k, so serve-N == serve-C is the pinned equality,
     serve-0 is not).

Run exclusively (contention inflates every wall):
    ZX_DRIVER_MEMORY=48g python tools/ivf_ingest_bench.py \
        /tmp/zx_vec/n1e7 --out /tmp/zx_vec/n1e7_ivf \
        --batches 8 --batch-rows 100000

Prints one JSON line.
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
    corpus = args[0].rstrip("/")
    out = (
        args[args.index("--out") + 1]
        if "--out" in args
        else corpus + "_ivf"
    )
    target_cell = (
        int(args[args.index("--target-cell") + 1])
        if "--target-cell" in args else 256
    )
    sample = int(args[args.index("--sample") + 1]) if "--sample" in args else 786432
    batches = int(args[args.index("--batches") + 1]) if "--batches" in args else 8
    batch_rows = (
        int(args[args.index("--batch-rows") + 1])
        if "--batch-rows" in args else 100_000
    )
    n_q = int(args[args.index("--queries") + 1]) if "--queries" in args else 64
    k = int(args[args.index("--k") + 1]) if "--k" in args else 10
    nprobe = int(args[args.index("--nprobe") + 1]) if "--nprobe" in args else 16
    dim = int(args[args.index("--dim") + 1]) if "--dim" in args else 64
    kc = int(args[args.index("--kc") + 1]) if "--kc" in args else 1024

    import pandas as pd
    import pyarrow.dataset as pads

    from pyspark.sql import functions as F

    from make_vector_store import make_batch
    from zx_spark.operators.similarity import (
        ivf2_assign,
        ivf2_fit_dist,
        ivf_store_append,
        ivf_store_compact,
        ivf_store_health,
        ivf_topk_batch_store,
        read_ivf_manifest,
        with_super_col,
        write_ivf_manifest,
        write_ivf_store,
    )
    from zx_spark.session import get_spark

    spark = get_spark(
        "ivf_ingest_bench",
        extra_conf={"spark.driver.maxResultSize": "16g"},
    )
    # the batch generator's make_batch is pickled BY REFERENCE to its
    # module — ship the module to executor Python workers
    spark.sparkContext.addPyFile(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "make_vector_store.py"
        )
    )
    raw = f"{corpus}/embeddings.parquet"
    n = pads.dataset(raw, format="parquet").count_rows()
    emb = spark.read.parquet(raw).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    res: dict = {"n": n, "batches": batches, "batch_rows": batch_rows,
                 "nprobe": nprobe, "n_q": n_q}
    os.makedirs(out, exist_ok=True)
    model_path = f"{out}/model.npz"

    # ---- phase 1: model + store (ann_store_serving artifact layout)
    if os.path.exists(model_path):
        m = np.load(model_path)
        centers, supers = m["centers"], m["supers"]
        lens, flat = m["children_len"], m["children_flat"]
        off = np.concatenate([[0], np.cumsum(lens)])
        children = [
            [int(c) for c in flat[off[i]: off[i + 1]]] for i in range(len(lens))
        ]
        res["fit_sec"] = float(m["fit_sec"])
    else:
        t0 = time.time()
        centers, supers, children = ivf2_fit_dist(
            emb, target_cell=target_cell, super_sample_n=sample,
            n_total=n, rebalance=True,
        )
        res["fit_sec"] = round(time.time() - t0, 1)
        np.savez_compressed(
            model_path,
            centers=np.asarray(centers, dtype=np.float64),
            supers=np.asarray(supers, dtype=np.float64),
            children_flat=np.array(
                [c for kids in children for c in kids], dtype=np.int64
            ),
            children_len=np.array(
                [len(kids) for kids in children], dtype=np.int64
            ),
            fit_sec=res["fit_sec"],
        )
    n_cells = len(np.asarray(centers))
    res["n_cells"] = n_cells

    store_path = f"{out}/store"
    if not os.path.exists(f"{store_path}/_SUCCESS"):
        t0 = time.time()
        assigned = ivf2_assign(emb, centers, supers, children, engine="arrow")
        assigned = with_super_col(assigned, children, n_cells)
        write_ivf_store(
            assigned.repartition(len(np.asarray(supers)), "ivf_super"),
            store_path, super_col="ivf_super",
        )
        res["assign_write_sec"] = round(time.time() - t0, 1)
    man = read_ivf_manifest(spark, store_path)
    if man is None or any("files" not in e for e in man["cells"].values()):
        t0 = time.time()
        man = write_ivf_manifest(spark, store_path, super_col="ivf_super")
        res["manifest_write_sec"] = round(time.time() - t0, 1)
    res["files_0"] = sum(e["files"] for e in man["cells"].values())
    res["rows_0"] = sum(e["rows"] for e in man["cells"].values())

    # ---- queries: first n_q corpus vectors (same as ann_store_serving)
    qt = pads.dataset(raw, format="parquet").to_table(
        filter=pads.field("vec_id") < n_q, columns=["vec_id", "embedding"]
    )
    order = np.argsort(qt["vec_id"].to_numpy())
    qvecs = [
        [float(x) for x in v]
        for v in np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)[order]
    ]

    def serve(tag: str):
        walls, rows = [], None
        for _ in range(2):
            t0 = time.time()
            rows = ivf_topk_batch_store(
                spark, store_path, centers, qvecs, k=k, nprobe=nprobe,
                supers=supers, children=children, engine="arrow",
            ).collect()
            walls.append(round(time.time() - t0, 2))
        res[f"serve_{tag}_sec"] = min(walls)
        return sorted((r["query_no"], r["vec_id"], round(r["cosine"], 9))
                      for r in rows)

    serve("0")

    # ---- phase 3: drip appends of NEW ids from the SAME generator
    gen_centers = np.random.RandomState(7).randn(kc, dim)

    def gen(batches_iter):
        for pdf in batches_iter:
            ids = pdf["id"].to_numpy()
            X = make_batch(ids, gen_centers, sigma=0.3)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(X)})

    app_walls = []
    touched = []
    appended_total = 0
    for b in range(batches):
        lo = n + b * batch_rows
        t0 = time.time()
        batch = (
            spark.range(lo, lo + batch_rows, 1, 32)
            .mapInPandas(gen, "vec_id long, embedding array<float>")
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"),
            )
        )
        assigned = with_super_col(
            ivf2_assign(batch, centers, supers, children, engine="arrow"),
            children, n_cells,
        ).localCheckpoint()  # deterministic frame for the count-then-write pair
        t1 = time.time()
        got = ivf_store_append(assigned, store_path, super_col="ivf_super")
        t2 = time.time()
        app_walls.append(
            {"assign_sec": round(t1 - t0, 2), "append_sec": round(t2 - t1, 2)}
        )
        touched.append(got["cells_touched"])
        appended_total += got["rows_appended"]
        print(f"# append {b}: {got} assign={t1-t0:.1f}s append={t2-t1:.1f}s",
              file=sys.stderr)
    res["appends"] = app_walls
    res["cells_touched_per_batch"] = touched
    res["rows_appended"] = appended_total
    man = read_ivf_manifest(spark, store_path)
    res["files_after_appends"] = sum(e["files"] for e in man["cells"].values())
    res["rows_after_appends"] = sum(e["rows"] for e in man["cells"].values())
    h = ivf_store_health(man, target_cell=target_cell)
    res["health_after_appends"] = {
        "size_bias": h["size_bias"],
        "max_files_per_cell": h["max_files_per_cell"],
        "n_hot": len(h["hot_cells"]),
        "n_fragmented": len(h["fragmented_cells"]),
        "recommend_compact": h["recommend_compact"],
        "recommend_rebalance": h["recommend_rebalance"],
    }

    after_rows = serve("accreted")

    # ---- phase 5: compact back to one file per cell
    t0 = time.time()
    cres = ivf_store_compact(spark, store_path, max_files_per_cell=1)
    res["compact_sec"] = round(time.time() - t0, 1)
    res["compact"] = cres

    compacted_rows = serve("compacted")
    res["serve_rows_equal"] = after_rows == compacted_rows
    print(json.dumps(res))


if __name__ == "__main__":
    main()

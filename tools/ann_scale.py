"""End-to-end ANN scale measurement: two-level fit -> assign ->
knn_pairs_2level(k=4, nprobe=4, p_super=4) -> triangle_counts -> sum,
over a scale store's embeddings table (the SCALE.md r8/r9 protocol).

Run EXCLUSIVELY, warm best-of-N:
    python tools/ann_scale.py /tmp/zx_scale/sf1 [--engine auto]
        [--score auto] [--single-level] [--rebalance] [--sample N]
        [--no-rebalance] [-n 2]

Modes: default = full-corpus two-level fit (--rebalance opts the skew
split in); --sample N = ivf2_fit_sampled, which rebalances BY DEFAULT
like the library (--no-rebalance opts out); --single-level = the flat
baseline (neither sampling nor rebalance apply — combining them is an
error, not a silent ignore). The JSON line records the EFFECTIVE
rebalance so recorded measurements carry their provenance.

Prints one JSON line with the fit/assign/knn+tri timings and the
triangle-sum (a value consumer — the vacuous-`.count()` lesson)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    store = args[0]
    engine = args[args.index("--engine") + 1] if "--engine" in args else "auto"
    score = args[args.index("--score") + 1] if "--score" in args else "auto"
    single = "--single-level" in args
    sample = int(args[args.index("--sample") + 1]) if "--sample" in args else 0
    fit = args[args.index("--fit") + 1] if "--fit" in args else "auto"
    if fit != "auto" and not sample:
        print("--fit applies only to the sampled fit (--sample N); "
              "for --fit dist, --sample N sets super_sample_n")
        sys.exit(2)
    if single and any(
        f in args for f in ("--rebalance", "--no-rebalance", "--sample")
    ):
        print("--rebalance/--no-rebalance/--sample apply only to the "
              "two-level fit")
        sys.exit(2)
    if "--rebalance" in args and "--no-rebalance" in args:
        print("--rebalance conflicts with --no-rebalance")
        sys.exit(2)
    if sample:
        # the sampled fit rebalances by default (the library default);
        # --rebalance is redundant there, --no-rebalance opts out
        rebalance = "--no-rebalance" not in args
    else:
        rebalance = "--rebalance" in args
    n_best = int(args[args.index("-n") + 1]) if "-n" in args else 2
    shortlist = (
        int(args[args.index("--shortlist") + 1])
        if "--shortlist" in args else None
    )

    import pyarrow.parquet as pq

    from zx_spark.operators.graph import triangle_counts
    from zx_spark.operators.similarity import (
        ivf2_assign,
        ivf2_fit_numpy,
        ivf_assign,
        knn_pairs,
        knn_pairs_2level,
        suggest_n_cells,
    )
    from zx_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("ann_scale")
    emb = spark.read.parquet(f"{store}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # ds.dataset handles BOTH a single parquet file and a Spark-written
    # part-file DIRECTORY (read_metadata only handles the former — the
    # scale stores are directories; r9 review regression)
    import pyarrow.dataset as pads

    n = pads.dataset(
        f"{store}/embeddings.parquet", format="parquet"
    ).count_rows()

    def corpus_numpy():
        # only the non-sampled fits need the whole corpus driver-side —
        # reading it unconditionally would defeat (and OOM) the very
        # bounded-memory mode --sample exists to measure
        import numpy as np

        t = pq.read_table(
            f"{store}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return (
            t["vec_id"].to_numpy(),
            np.array(t["embedding"].to_pylist(), dtype=np.float64),
        )

    t0 = time.time()
    if single:
        from zx_spark.operators.similarity import ivf_centers_numpy

        ids, X = corpus_numpy()
        centers = ivf_centers_numpy(ids, X, suggest_n_cells(n))
        supers = children = None
    elif sample and fit == "dist":
        # the third rung: supers driver-side on the hash-sample,
        # children fit in PARALLEL on executors over the FULL corpus
        # (one persisted applyInPandas scan per super block, r11).
        # --rebalance composes the sample-side ivf2_rebalance_hier
        # pass over the dist model (the SCALE.md r10 follow-up) —
        # within-super cell skew the per-super k_s allocation cannot
        # see. --engine forwarded so the recorded provenance governs
        # the super assignment too.
        from zx_spark.operators.similarity import ivf2_fit_dist

        rebalance = "--rebalance" in args
        centers, supers, children = ivf2_fit_dist(
            emb, target_cell=128, super_sample_n=sample, engine=engine,
            rebalance=rebalance,
        )
    elif sample:
        from zx_spark.operators.similarity import ivf2_fit_sampled

        centers, supers, children, _sid = ivf2_fit_sampled(
            emb, sample_n=sample, target_cell=128, rebalance=rebalance,
            fit=fit,
        )
    else:
        ids, X = corpus_numpy()
        centers, supers, children = ivf2_fit_numpy(ids, X, target_cell=128)
        if rebalance:
            from zx_spark.operators.similarity import ivf2_rebalance

            centers, supers, children = ivf2_rebalance(
                ids, X, centers, target_cell=128
            )
    fit_s = time.time() - t0

    # --score pq: train the codebooks ONCE, distributed (pq_train — the
    # corpus never comes driver-side), outside the timed knn loop but
    # recorded separately so the variant row carries its full cost
    books = None
    pq_train_s = None
    if score == "pq":
        from zx_spark.operators.similarity import pq_train

        t0 = time.time()
        books = pq_train(emb, m=8, k=16, iters=3)
        pq_train_s = round(time.time() - t0, 1)

    best = None
    for _ in range(n_best):
        t0 = time.time()
        if single:
            assigned = ivf_assign(
                emb, [[float(x) for x in c] for c in centers], "embedding"
            )
            edges = knn_pairs(assigned, centers, k=4, nprobe=4,
                              score_engine=score, shortlist=shortlist,
                              codebooks=books)
        else:
            assigned = ivf2_assign(
                emb, centers, supers, children, p_super=4, engine=engine
            )
            edges = knn_pairs_2level(
                assigned, centers, supers, children, k=4, nprobe=4,
                p_super=4, engine=engine, score_engine=score,
                shortlist=shortlist, codebooks=books,
            )
        tri = (
            triangle_counts(
                edges.select(
                    F.col("vec_id").alias("src"),
                    F.col("neighbor_id").alias("dst"),
                )
            )
            .agg(F.sum("triangles").alias("s"))
            .collect()[0]["s"]
        )
        el = time.time() - t0
        spark.catalog.clearCache()
        if best is None or el < best:
            best = el
    print(
        json.dumps(
            {
                "store": store,
                "n": n,
                "n_cells": len(centers),
                "engine": engine,
                "score_engine": score,
                "single_level": single,
                "rebalance": rebalance,
                "sample": sample,
                "fit": fit,
                "fit_sec": round(fit_s, 1),
                "shortlist": shortlist,
                "pq_train_sec": pq_train_s,
                "end_to_end_sec": round(best, 1),
                "triangle_sum": int(tri) if tri is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()

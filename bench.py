"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

The headline set covers every engine layer: time-scan + filter, __nil
grouping, aligned windowed aggregation, heatmap, top-groups, the zx SQL
shim, TPC-H join shapes through Spark SQL, MinHash-LSH dedup, ANN top-k,
and text analysis. Each query is timed to full materialization (count of
the result), not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Pin policy (r6): every name times ONE fixed shape forever. When a
# driver row gains arms, the old name keeps timing the originally
# pinned shape (via __spark_entry__.BENCH_COMPAT) and the grown row
# pins a fresh "<name>_v2" baseline at its first measurement — so
# per-name drift always means regression, never added work. Lineage is
# documented in BASELINE.md "Per-query pin table". Streaming rows stay
# un-benched (drain cost is source staging, not engine time).
HEADLINE = [
    "s1_time_scan",
    "f1_contains",
    "g1_group_nil",         # r2 pin shape: group arm only (compat)
    "g1_group_nil_v2",      # r6 pin: + profile/corr/expectations arms
    "g1_group_nil_v3",      # r7 pin: + top-values arm
    "w1_aligned_windows",   # r2 pin shape: tumbling arm only (compat)
    "w1_aligned_windows_v2",  # r7 pin: + hopping-windows arm
    "w1_session_windows",
    "a5_count_distinct",
    "a9_heatmap",
    "o1_top_groups",
    "o1_top_groups_v2",      # r6 pin: + multidim cube arm
    "q2_sql_zx_dialect",
    "sql_tpch_q1_pricing",
    "sql_tpch_q3_segment_revenue",
    "sql_tpch_q5_region_revenue",
    "sql_window_first_order",
    "dedup_exact_groups",     # r4 pin shape: exact arm only (compat)
    "dedup_exact_groups_v2",  # r6 pin: + snapshot-diff arm
    "dedup_minhash_pairs",     # r2 pin shape: pairs only (compat)
    "dedup_minhash_pairs_v2",  # r6 pin: + connected-components arm
    "dedup_minhash_pairs_v3",  # r8 pin: + incremental (signed-store) arm
    "ann_topk",
    "text_quality",      # r2 pin shape: heuristic columns (compat)
    "text_quality_v2",   # r6 pin: + in-query NB + bigram-LM training
    # added r3 (no r2 baseline entry — first measurement pins them)
    "asof_join_marks",
    "range_join_incidents",
    # added r4. jaccard_wordset_pairs is deliberately NOT here: it is
    # the SQL-expressible oracle twin (md5-per-token, ~5.5s at sf0.1);
    # dedup_minhash_pairs is the production near-dup path.
    "sampling_suite",     # r4 pin shape: split + strat arms (compat)
    "sampling_suite_v2",  # r6 pin: + mix/budget/wsamp arms
    "sampling_suite_v3",  # r8 pin: + leakage-safe-split arm
    # added r4: continuous-aggregate path (build 5m partials → coarsen to
    # hourly → finalize).
    "rollup_hourly_agg",
    # added r4: gap-filled sparse series + derived/anomaly/EWMA verbs
    # (the r5 shape; the r6 stream-drain arm lives only in the driver
    # correctness row, per the no-streaming-bench policy above).
    "w_gapfill",
    "w_gapfill_v2",   # r7 pin: + rolling-median / robust-z columns
    # added r4: curation additions — PII regex scrub (map-side) and
    # benchmark decontamination (broadcast n-gram probe).
    "text_pii_redact",
    "decontaminate_ngrams",     # r4→r7 pin shape: bench + boiler arms (compat)
    "decontaminate_ngrams_v2",  # r8 pin: + source-overlap arm
    # added r5 s4 (first measurement pins them): funnel (one user-key
    # shuffle), snapshot diff (fingerprint full-outer join), table
    # profile (one agg pass), incremental near-dup (batch signing +
    # band join vs stored sigs).
    "op_funnel_counts",
    "op_snapshot_diff",
    "op_profile_events",
    "op_incremental_dedup",
    # added r6 (first measurement pins it): retention cohort grid.
    "op_retention_cohorts",
    # added r6 (first measurement pins them): exact tie-aware AUC
    # (evaluate.py) and duplicated-span exposure (spans.py).
    "op_eval_auc",
    "op_dup_spans",
    "op_psi_drift",
    "op_common_paths",
    # added r6 s3 (first measurement pins them): exact-recall fuzzy
    # dedup (PassJoin), co-occurrence pair counts, DSIR train+score.
    "op_fuzzy_dedup",
    "op_cooccurrence",
    "op_dsir_score",
    # added r7 (first measurement pins them): cross-source n-gram
    # overlap matrix (data-mixing audit over the documents table), and
    # PageRank over the symmetrized user-event co-engagement graph
    # (edge build + 5 power iterations, lazy no-dangling path).
    "op_source_overlap",
    "op_pagerank",
]


def _executor_task_ms(spark) -> int | None:
    """Cumulative executor task time (ms) across all executors, from the
    AppStatusStore. Deltas around a timed query separate EXECUTOR compute
    from driver overhead (plan analysis / scheduling / py4j): at a
    compute-bound scale the delta tracks cores while wall-clock shrinks;
    at an overhead-bound scale (sf0.1) wall-clock is flat across core
    counts BECAUSE the task-time share is small — which the r14 scaling
    probe could not see from wall-clock alone (VERDICT r14 item 2)."""
    try:
        els = spark.sparkContext._jsc.sc().statusStore().executorList(False)
        return sum(els.apply(i).totalDuration() for i in range(els.size()))
    except Exception:
        return None


def main() -> None:
    import __spark_entry__ as entry
    from zx_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("zx_spark_bench")

    qs = entry.queries()
    # Single-comparator callables kept outside the (capped) driver registry
    # so headline timings stay comparable with the pinned r2 baseline.
    qs.update(entry.BENCH_COMPAT)
    # Warm the JVM/session on a trivial action so query timings measure the
    # engine, not first-stage setup.
    spark.range(1).count()

    # Min over 4 ROUND-ROBIN passes: this host shows 10-25x noisy-neighbor
    # stalls in multi-second BURSTS (measured: the same stage at 1.4s and
    # 50s back to back; dedup_minhash at 2.3s vs 17.4s across bench runs).
    # Back-to-back repeats of one query all land inside one burst, so the
    # passes interleave the whole list — a burst inflates different
    # queries each pass and the per-query min stays an engine time.
    # Caches are dropped AFTER each timed query (outside the timed
    # window): queries that persist() an intermediate (e.g. the shared
    # shingle_hash_frame in decontaminate_ngrams) would otherwise have
    # passes 2-4 read the pass-1 cache — CacheManager matches the
    # identical plan — so the pinned min-of-4 would time cache reads,
    # not the engine, and the cached corpus-sized frame would stay
    # resident for every subsequent row of the run.
    times: dict[str, float] = {}
    # Per-name EXECUTOR task-time (sum over tasks, from the same pass
    # that won the wall-clock min) — emitted alongside wall-clock so the
    # driver's c8-vs-c32 scaling probe can tell "overhead-bound at this
    # SF" (task_sec << wall, ratios ~1) from "serial engine" (task_sec
    # ~ wall and not tracking cores). VERDICT r14 item 2.
    task_sec: dict[str, float] = {}
    for _ in range(4):
        for name in HEADLINE:
            tm0 = _executor_task_ms(spark)
            t0 = time.time()
            try:
                rows = qs[name](spark, sf_dir).count()
            except Exception as e:
                # name the query — a bare py4j traceback from deep in a
                # 200-run sweep is otherwise unattributable (r10 sf10)
                raise RuntimeError(
                    f"bench query {name!r} failed at {sf_dir}"
                ) from e
            el = time.time() - t0
            tm1 = _executor_task_ms(spark)
            spark.catalog.clearCache()
            if name not in times or el < times[name]:
                times[name] = el
                if tm0 is not None and tm1 is not None:
                    task_sec[name] = (tm1 - tm0) / 1000.0
    times = {n: round(v, 3) for n, v in times.items()}
    task_sec = {n: round(v, 3) for n, v in task_sec.items()}
    for name in HEADLINE:
        print(f"# {name}: {times[name]:.3f}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # scaling legibility (additive keys; the driver contract
                # only requires metric/value/unit/queries/sf)
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
                or spark.sparkContext.defaultParallelism,
                "parallelism": spark.sparkContext.defaultParallelism,
                "task_sec": task_sec,
            }
        )
    )


if __name__ == "__main__":
    main()

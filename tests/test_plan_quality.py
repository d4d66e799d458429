"""Plan-shape assertions — the 100 TB contract, checked on real plans.

These tests pin the optimizer behaviors the engine's scale story depends
on: predicate pushdown into the parquet scan, column pruning of the
ReadSchema, broadcast joins for small dimensions, whole-stage codegen on
the aggregate path, and no Python eval in any default-mode query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zx_spark.compiler import compile_query
from zx_spark.model import Aggregate, Cmp, Condition, Query, Select
from zx_spark.storage import read_table, register_views

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    q = Query(
        selects=[Select("value", Aggregate.SUM)],
        conditions=[Condition("event_type", Cmp.EQ, "click")],
        group_by=["event_type"],
    )
    plan = _executed(compile_query(read_table(spark, SF, "events"), q, id_col="event_id", rate_col=None))
    # The equality predicate must reach the parquet reader as a pushed filter.
    assert "PushedFilters: [" in plan
    assert "event_type" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning(spark):
    q = Query(selects=[Select("value", Aggregate.SUM)], group_by=["event_type"])
    plan = _executed(compile_query(read_table(spark, SF, "events"), q, id_col="event_id", rate_col=None))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # Only the referenced columns are read — props/user_id must be pruned.
    assert "props" not in read_schema and "user_id" not in read_schema


def test_broadcast_join_small_dim(spark):
    register_views(spark, SF)
    plan = _executed(
        spark.sql(
            "SELECT n_name, count(*) AS n FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        )
    )
    assert "BroadcastHashJoin" in plan  # 25-row nation must broadcast


def test_codegen_on_aggregate_path(spark):
    q = Query(selects=[Select("value", Aggregate.SUM)], group_by=["event_type"])
    plan = _executed(compile_query(read_table(spark, SF, "events"), q, id_col="event_id", rate_col=None))
    # Codegen'd operators print as "*(n) Op"; the aggregate must be one,
    # and the map side must do partial aggregation.
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan
    assert "partial_sum" in plan


def test_no_python_in_default_paths(spark):
    # aligned windows + every numeric aggregate: zero Python eval nodes.
    q = Query(
        selects=[
            Select("value", a)
            for a in (
                Aggregate.SUM,
                Aggregate.MAX,
                Aggregate.MIN,
                Aggregate.COUNT,
                Aggregate.COUNT_DISTINCT,
                Aggregate.COUNT_DISTINCT_APPROX,
                Aggregate.MEAN,
                Aggregate.P50,
            )
        ],
        group_by=["event_type"],
        granularity_s=3600,
    )
    plan = _executed(compile_query(read_table(spark, SF, "events"), q, id_col="event_id", rate_col=None))
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_no_global_sort_by_default(spark):
    # The result sort is opt-in (sort=True): the default compiled plan must
    # not pay a range-partitioned Sort exchange on the final result.
    q = Query(selects=[Select("value", Aggregate.SUM)], group_by=["event_type"], granularity_s=3600)
    df = compile_query(read_table(spark, SF, "events"), q, id_col="event_id", rate_col=None)
    plan = _executed(df)
    assert "rangepartitioning" not in plan.lower()
    sorted_plan = _executed(
        compile_query(read_table(spark, SF, "events"), q, id_col="event_id", rate_col=None, sort=True)
    )
    assert "rangepartitioning" in sorted_plan.lower()


def test_approx_count_distinct_close_to_exact(spark):
    df = read_table(spark, SF, "events")
    exact = df.select(F.countDistinct("user_id")).collect()[0][0]
    q = Query(selects=[Select("user_id", Aggregate.COUNT_DISTINCT_APPROX, params=(0.02,))])
    approx = compile_query(df, q, id_col="event_id", rate_col=None).collect()[0][
        "count_distinct_approx__user_id"
    ]
    assert abs(approx - exact) / exact < 0.1


def test_partition_pruning_on_day_partitioned_store(spark, tmp_path):
    """write_events(partition_by_day=True) + a one-day time filter must
    prune the scan to that day's partition — the mechanism that turns the
    reference's TS-index range scan into free partition pruning at 100 TB."""
    from zx_spark.storage import write_events

    path = str(tmp_path / "day_store")
    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 5:02d} 12:00:00", float(i)) for i in range(50)],
        "event_id long, ts_s string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    write_events(df, path, partition_by_day=True)

    scan = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-03")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_date" in plan
    # the pruned scan reads exactly one day
    assert scan.count() == 10
    # and the file listing actually contains day directories
    import os

    assert any(d.startswith("event_date=") for d in os.listdir(path))


def test_boilerplate_complement_plan_has_no_corpus_join(spark):
    """r7 (amended r13): the min_docs=2 complement plan must not join
    the EXPLODED SHINGLE frame against a vocabulary (the corpus-sized
    probe join it replaced) — only the per-doc left join against the
    unique-counts frame. r13 pins that join sort-merge (both sides are
    doc-keyed aggs — the estimate-small data-sized broadcast class,
    SCALE.md r12; see tests/test_broadcast_audit.py), so the plan now
    carries exactly ONE SMJ: the doc-keyed one, never a shingle-keyed
    one (the join keys prove which)."""
    from zx_spark.operators.decontaminate import boilerplate_fractions

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    plan = _executed(boilerplate_fractions(docs, min_docs=2))
    import re

    # AQE's toString dumps the plan twice (final + initial) — dedup keys
    smj_keys = set(re.findall(r"SortMergeJoin(?:\(\d+\))? \[([^\]]*)\]", plan))
    assert len(smj_keys) <= 1, plan
    for keys in smj_keys:
        assert "__h" not in keys, plan  # never the shingle-hash join
    assert "CartesianProduct" not in plan
    # un-persisted: per-doc branch + exploded DF branch re-scan (callers
    # persist shingle_hash_frame to collapse these, as the driver row
    # does) — but never a corpus-sized join re-scan on top
    assert plan.count("FileScan parquet") <= 3


def test_hop_arm_single_shuffle(spark):
    """r7: the hopping-window aggregate is a narrow map-side fan-out
    (explode) feeding ONE partially-aggregated shuffle — no join, no
    extra exchange."""
    from zx_spark.operators.windows import with_hopping_windows

    ev = read_table(spark, SF, "events")
    hop = with_hopping_windows(ev, "ts", 7200.0, 3600.0)
    agg = hop.groupBy("event_type", "hop_start").agg(
        F.sum("value").alias("s")
    )
    plan = _executed(agg)
    # AQE prints the final plan followed by the initial one — count
    # shuffles in the FINAL section only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1
    assert "Generate" in final


def test_pagerank_plan_no_cartesian(spark):
    """r7 s2: the PageRank iteration plan must contain no Cartesian
    product; with no dangling nodes there is no broadcast nested loop
    either (the single-row dangling-mass crossJoin is the only
    permitted BNLJ, and only on dangling graphs)."""
    from zx_spark.operators.graph import pagerank

    ev = read_table(spark, SF, "events").limit(20000)
    b = ev.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        F.col("user_id").cast("string").alias("u"),
        F.concat(F.lit("et:"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = b.select(F.col("u").alias("src"), F.col("t").alias("dst")).unionByName(
        b.select(F.col("t").alias("src"), F.col("u").alias("dst"))
    )
    pr = pagerank(edges, iters=3)
    plan = _executed(pr)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # symmetric ⇒ no dangling
    spark.catalog.clearCache()

"""Plan and skew diagnostics — the operability half of "would this
survive 100×": read WHAT THE OPTIMIZER ACTUALLY PLANNED (pushed
filters, pruned schema, exchanges, codegen coverage, join strategies)
and WHAT THE KEYS ACTUALLY LOOK LIKE (skew factors) instead of
guessing.

``plan_report`` is the programmatic form of the assertions
tests/test_plan_quality.py makes ad hoc — exposed so pipelines can
gate on plan shape in CI ("this query must broadcast", "no cartesian
ever") the same way they gate on results."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_report(df: DataFrame) -> dict:
    """Summarize the EXECUTED plan: counts of exchanges / sorts /
    python evals, join strategies used, pushed parquet filters, read
    schemas, and whole-stage-codegen span count. Pure string analysis
    of the physical plan — no job runs. NOTE: under AQE the codegen
    span count is only populated AFTER the query has executed at least
    once (the pre-execution adaptive plan hides codegen stages); the
    other fields are accurate either way."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    simple = df._jdf.queryExecution().simpleString()

    def count(pat: str) -> int:
        return len(re.findall(pat, plan))

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: ([^\n]+)", plan)
    joins = sorted(
        set(
            m
            for m in re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        )
    )
    return {
        # standalone Exchange nodes of ANY partitioning (hash, range,
        # round-robin, single) — \bExchange\b cannot match inside
        # BroadcastExchange/ReusedExchange (no word boundary there)
        "n_exchanges": count(r"\bExchange\b"),
        "n_broadcast_exchanges": count(r"BroadcastExchange"),
        "n_sorts": count(r"\bSort \["),
        "n_python": count(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"),
        # AQE's executedPlan string hides WholeStageCodegen nodes until
        # execution; the *(n) markers in the simple string are the
        # codegen stage ids either way
        "n_codegen_spans": max(
            count(r"WholeStageCodegen"),
            len(set(re.findall(r"\*\((\d+)\)", simple))),
        ),
        "joins": joins,
        "has_cartesian": "CartesianProduct" in plan
        or "BroadcastNestedLoopJoin" in plan,
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": [s.strip() for s in schemas],
        "plan": simple,
    }


def assert_scaling_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    no_cartesian: bool = True,
    no_python: bool = False,
    require_pushed_filter: str | None = None,
) -> dict:
    """Gate a query on plan shape (raises AssertionError with the plan
    attached). Returns the report for logging."""
    r = plan_report(df)
    if no_cartesian and r["has_cartesian"]:
        raise AssertionError(f"plan contains a cartesian/BNL join:\n{r['plan']}")
    if max_exchanges is not None and r["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {r['n_exchanges']} exchanges (max {max_exchanges}):\n{r['plan']}"
        )
    if no_python and r["n_python"] > 0:
        raise AssertionError(f"plan evaluates Python:\n{r['plan']}")
    if require_pushed_filter is not None and not any(
        require_pushed_filter in p for p in r["pushed_filters"]
    ):
        raise AssertionError(
            f"no pushed filter matching {require_pushed_filter!r} "
            f"(pushed: {r['pushed_filters']}):\n{r['plan']}"
        )
    return r


def key_skew_report(
    df: DataFrame, key_cols: list[str] | str, top_k: int = 10
) -> dict:
    """Pre-join skew diagnosis for a key: top-``k`` hottest key values,
    and the skew factor ``max_count / avg_count`` — the number that
    says whether a shuffle on this key funnels into one task. One
    aggregation over the keys (map-side partial).

    Rule of thumb the report encodes: factor < 10 shuffles fine, 10-100
    relies on AQE skew splitting, > 100 wants salting
    (operators.joins.salted_join) or a broadcast of the other side."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.avg("__n").alias("avg"),
        F.max("__n").alias("mx"),
    ).collect()[0]
    if stats["n_keys"] == 0:
        return {"n_keys": 0, "skew_factor": 0.0, "top": []}
    top = [
        {"key": tuple(r[k] for k in keys), "count": r["__n"]}
        for r in counts.orderBy(F.col("__n").desc(), *keys).limit(top_k).collect()
    ]
    factor = float(stats["mx"]) / float(stats["avg"])
    return {
        "n_keys": stats["n_keys"],
        "avg_count": float(stats["avg"]),
        "max_count": int(stats["mx"]),
        "skew_factor": round(factor, 2),
        "recommendation": (
            "ok" if factor < 10 else "aqe" if factor < 100 else "salt_or_broadcast"
        ),
        "top": top,
    }

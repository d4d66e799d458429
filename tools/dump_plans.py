"""Dump ``explain("formatted")`` for bench names into plans/<tag>/.

Usage: ``python tools/dump_plans.py <tag> [name ...]``

Writes ``plans/<tag>/<name>_<suffix>.txt`` for every requested bench
name (default: all of bench.py's HEADLINE). ``tag`` is e.g. ``r14`` and
``suffix`` comes from ``--suffix before|after`` (default ``before``).

Plan capture only — no timing discipline; query-builder side jobs
(eager profile collects, tmp-store writes) do run, so expect a few
minutes for the full list. Queries whose builders drain streaming
sources are skipped with a note rather than hanging the dump.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    suffix = "before"
    if "--suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--suffix") + 1]
        args = [a for a in args if a != suffix]
    if not args:
        print("usage: dump_plans.py <tag> [name ...] [--suffix before|after]")
        sys.exit(2)
    tag, names = args[0], args[1:]

    import bench
    import __spark_entry__ as entry
    from zx_spark.session import get_spark

    if not names:
        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("zx_spark_dump_plans")
    qs = entry.queries()
    qs.update(entry.BENCH_COMPAT)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: unknown")
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception:
            print(f"FAIL {name}:")
            traceback.print_exc()
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = sum(plan.count(k) for k in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "FlatMapGroupsInPandas"))
        joins = [k for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct") if k in plan]
        print(f"OK   {name}: Exchange={n_ex} python={n_py} joins={joins}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

"""Exclusive min-of-N re-measure for a subset of bench names.

The pin table sometimes needs a provenance-grade number for a FEW names
without paying a full bench run (e.g. the r8 SQL-passthrough drift
adjudication): this reruns exactly ``bench.py``'s timing discipline —
same session config, warm-up, round-robin passes, clearCache after
every timed query, per-name min — over the names given on the command
line.

Run EXCLUSIVELY (no concurrent pytest/bench): ``python
tools/bench_some.py sql_tpch_q1_pricing sql_window_first_order [-n 6]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_passes = 4
    if "-n" in sys.argv:
        n_passes = int(sys.argv[sys.argv.index("-n") + 1])
        args = [a for a in args if a != str(n_passes)]
    if not args:
        print("usage: bench_some.py <name> [<name>...] [-n passes]")
        sys.exit(2)

    import __spark_entry__ as entry
    from zx_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("zx_spark_bench")
    qs = entry.queries()
    qs.update(entry.BENCH_COMPAT)
    missing = [a for a in args if a not in qs]
    if missing:
        print(f"unknown bench names: {missing}")
        sys.exit(2)
    spark.range(1).count()

    times: dict[str, float] = {}
    for _ in range(n_passes):
        for name in args:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            el = time.time() - t0
            spark.catalog.clearCache()
            if name not in times or el < times[name]:
                times[name] = el
    print(json.dumps({n: round(v, 3) for n, v in times.items()}))


if __name__ == "__main__":
    main()

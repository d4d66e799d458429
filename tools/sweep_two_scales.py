"""Interleaved two-scale sweep of the FULL bench headline (SCALE.md's
100x table): every name timed at BOTH sf dirs in ONE session, passes
round-robin across (name, scale) so a host burst inflates different
cells each pass and the per-cell min stays an engine time — and both
ends of every ratio share the host's current speed (the BASELINE.md
method note: judge drift from the full round-robin, never from
cross-session columns).

Run EXCLUSIVELY:  python tools/sweep_two_scales.py [sf_a] [sf_b] [-n 2]
Prints one JSON line: {"a": {...}, "b": {...}, "sf_a": ..., "sf_b": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_passes = 2
    if "-n" in sys.argv:
        n_passes = int(sys.argv[sys.argv.index("-n") + 1])
        args = [a for a in args if a != str(n_passes)]
    sf_a = args[0] if args else "/root/testdata/sf0.1"
    sf_b = args[1] if len(args) > 1 else "/tmp/zx_scale/sf10"

    import __spark_entry__ as entry
    from bench import HEADLINE
    from zx_spark.session import get_spark

    spark = get_spark("zx_sweep_two_scales")
    qs = entry.queries()
    qs.update(entry.BENCH_COMPAT)
    spark.range(1).count()

    times: dict[str, dict[str, float]] = {"a": {}, "b": {}}
    for p in range(n_passes):
        for name in HEADLINE:
            for side, sf in (("a", sf_a), ("b", sf_b)):
                t0 = time.time()
                try:
                    qs[name](spark, sf).count()
                except Exception as e:
                    raise RuntimeError(f"{name!r} failed at {sf}") from e
                el = time.time() - t0
                spark.catalog.clearCache()
                cur = times[side]
                if name not in cur or el < cur[name]:
                    cur[name] = el
        print(f"# pass {p + 1}/{n_passes} done", file=sys.stderr)
    out = {
        "a": {n: round(v, 3) for n, v in times["a"].items()},
        "b": {n: round(v, 3) for n, v in times["b"].items()},
        "sf_a": sf_a,
        "sf_b": sf_b,
        "total_a": round(sum(times["a"].values()), 2),
        "total_b": round(sum(times["b"].values()), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

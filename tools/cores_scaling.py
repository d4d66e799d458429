"""Cores-scaling check for the CPU-bound rows (VERDICT r6 item 4).

The 100 TB claim for the md5-CPU scan paths (MinHash signing,
decontamination, incremental dedup) rests on "embarrassingly parallel
scan — a real cluster absorbs it linearly". Demonstrate it on one box:
run the same fixed shapes at the 100× store under local[8] and
local[32] and compare throughput. Near-4× at 4× cores = the scan
parallelizes as claimed; a flat ratio would mean a serial bottleneck
(driver work, single-partition stage) hiding in the plan.

One process per core count (a SparkSession pins its master for the
process lifetime): run this script twice —

    SPARK_GRAFT_CPUS=8  python tools/cores_scaling.py /tmp/zx_scale/sf10
    SPARK_GRAFT_CPUS=32 python tools/cores_scaling.py /tmp/zx_scale/sf10

Prints one line per op: name, cores, warm best-of-2 seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

OPS = ["dedup_minhash_pairs", "op_incremental_dedup", "decontaminate_ngrams"]


def main() -> None:
    store = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zx_scale/sf10"
    import __spark_entry__ as entry
    from zx_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    spark = get_spark(f"cores_scaling_{cpus}")
    spark.range(1).count()
    qs = entry.queries()
    qs.update(entry.BENCH_COMPAT)
    for name in OPS:
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, store).count()
            el = time.time() - t0
            best = el if best is None or el < best else best
        print(f"CORES {cpus} {name} {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()

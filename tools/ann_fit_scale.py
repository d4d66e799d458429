"""Fit-path scale measurement (SCALE.md r10, VERDICT r9 item 1): time
the driver-side IVF fits over a synthetic clustered sample at growing
(sample_n, n_cells) under the constant-cell-size rule n_cells =
sample_n / 100 — the regime where the flat ``ivf2_fit_numpy`` Lloyd's
(sample_n × n_cells) distance matrix is quadratic in N and the
hierarchical ``ivf2_fit_hier`` is Θ(sample_n·√n_cells·dim) with one
≤256 MB matrix at a time.

The synthetic corpus is a deterministic gaussian mixture (the
clustered shape real embeddings have — same generator family as
tools/ann_recall.py); ids are 0..n-1. Peak RSS is reported so
"bounded driver memory" is a number, not a claim.

Run EXCLUSIVELY:
    python tools/ann_fit_scale.py <n> <n_cells> <flat|hier> [dim]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n = int(sys.argv[1])
    n_cells = int(sys.argv[2])
    method = sys.argv[3]
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    if method not in ("flat", "hier"):
        print("method must be flat or hier")
        sys.exit(2)
    from zx_spark.operators.similarity import ivf2_fit_hier, ivf2_fit_numpy

    rng = np.random.RandomState(11)
    kc = 256
    cc = rng.randn(kc, dim) * 3.0
    asg = rng.randint(0, kc, size=n)
    X = cc[asg] + 0.3 * rng.randn(n, dim)
    del asg
    ids = np.arange(n)

    t0 = time.time()
    if method == "flat":
        centers, supers, children = ivf2_fit_numpy(ids, X, n_cells=n_cells)
    else:
        centers, supers, children = ivf2_fit_hier(ids, X, n_cells=n_cells)
    fit_s = time.time() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024
    print(
        json.dumps(
            {
                "n": n,
                "n_cells_requested": n_cells,
                "n_cells": len(centers),
                "n_super": len(supers),
                "dim": dim,
                "method": method,
                "fit_sec": round(fit_s, 1),
                "peak_rss_gb": round(peak_gb, 2),
                # a value consumer so the fit isn't dead-code-eliminable
                "center_sum": round(float(np.asarray(centers).sum()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Stage-profile decontaminate_ngrams at a given store (default the
sf10 replica store) — the r6 MinHash playbook: time each pipeline stage
in isolation (warm best-of-N, exclusive), so the fix targets the
measured cost, not a guess.

Stages:
  tok      read + tokenize (array materialized via array_size sum)
  shingle  + n-gram string construction (slice + concat_ws transform)
  md5      + md5/conv 60-bit hashing transform
  distinct + array_distinct
  full     decontaminate() bench arm end-to-end
  boiler   boilerplate_fractions() end-to-end

Variants (same stages, alternate hash constructions):
  xx64     xxhash64(shingle string) instead of md5/conv
  tokhash  per-token xxhash64 once, then a polynomial combine per
           shingle window — no shingle STRING is ever built

Usage: python tools/profile_decontaminate.py [store_dir] [n_reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from zx_spark.functions.text import shingles_from_tokens, tokenize  # noqa: E402
from zx_spark.session import get_spark  # noqa: E402
from zx_spark.util import spread  # noqa: E402

N = 5


def _force(df):
    # array_max forces full per-element materialization (size() could in
    # principle be simplified past the transform); length-of-string-cast
    # makes the reduction type-agnostic (string and long arrays alike)
    return df.agg(
        F.sum(F.length(F.array_max("arr").cast("string")))
    ).collect()[0][0]


def timed(name, fn, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None or el < best else best
    print(f"{name:10s} {best:7.2f}s")
    return best


def main() -> None:
    store = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zx_scale/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("profile_decon")
    spark.range(1).count()
    docs = spread(
        spark.read.parquet(f"{store}/documents.parquet").select("doc_id", "text")
    )
    docs.count()

    toks = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    sh = toks.select("doc_id", shingles_from_tokens(F.col("toks"), N).alias("arr"))
    md5h = sh.select(
        "doc_id",
        F.transform(
            "arr",
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        ).alias("arr"),
    )
    dis = md5h.select("doc_id", F.array_distinct("arr").alias("arr"))

    timed("tok", lambda: toks.select(F.col("toks").alias("arr"))
          .agg(F.sum(F.size("arr"))).collect(), reps)
    timed("shingle", lambda: _force(sh), reps)
    timed("md5", lambda: _force(md5h), reps)
    timed("distinct", lambda: _force(dis), reps)

    # hash variants over the same shingle arrays
    xx = sh.select(
        "doc_id", F.transform("arr", lambda s: F.xxhash64(s)).alias("arr")
    )
    timed("xx64", lambda: _force(xx), reps)

    # tokhash: hash each token ONCE, combine per window arithmetically —
    # the shingle string never exists
    th = toks.select(
        "doc_id",
        F.transform("toks", lambda t: F.xxhash64(t)).alias("th"),
        F.size("toks").alias("nt"),
    )
    # rotate-xor mix: pure bit ops, no ANSI overflow, position-sensitive
    comb = F.when(
        F.col("nt") > 0,
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.col("nt") - N, F.lit(0))),
            lambda i: F.aggregate(
                F.slice("th", i + 1, N),
                F.lit(0).cast("long"),
                lambda a, x: F.shiftleft(a, 13)
                .bitwiseOR(F.shiftrightunsigned(a, 51))
                .bitwiseXOR(x),
            ),
        ),
    ).otherwise(F.array(F.lit(0).cast("long")))
    tk = th.select("doc_id", comb.alias("arr"))
    timed("tokhash", lambda: _force(tk), reps)

    from zx_spark.operators.decontaminate import (
        boilerplate_fractions,
        decontaminate,
    )

    tok_src = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    bench = docs.filter(F.col("doc_id") % 10 == 3).select(
        F.array_join(F.slice(tok_src, 1, 40), " ").alias("text")
    )
    timed("full", lambda: decontaminate(docs, bench, "text", "doc_id", 5).count(), reps)
    timed("boiler", lambda: boilerplate_fractions(docs, "text", "doc_id", 5, 2).count(), reps)


if __name__ == "__main__":
    main()

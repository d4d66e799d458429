"""Count-min sketch — mergeable bounded-memory frequency estimation.

The third leg of the package's sketch family: Bloom (bloom.py) answers
membership, HLL (rollup.py distinct sketches) answers cardinality, CMS
answers FREQUENCY — "how often does this value occur?" — in O(d·w)
counters no matter how large the corpus (Cormode & Muthukrishnan 2005).
The curation uses: per-shard token/domain/fingerprint frequency tables
cheap enough to broadcast, heavy-hitter screens before an exact pass,
and window-keyed frequency partials that MERGE (counter-wise addition)
across shards, days, or streaming epochs exactly like the rollup
layer's sum partials.

Guarantees (standard): estimate ≥ true count always (only hash
collisions inflate, never deflate); estimate ≤ true + εN with
probability ≥ 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Distributed shape (what survives 100 TB):

- Build is ONE aggregation pass: d salted md5 buckets per row fan out
  through a narrow posexplode, and the (row, bucket) hash aggregation
  combines map-side — shuffle volume is ≤ d·w counters per map
  partition, NEVER corpus-sized. The collected model is d·w ints
  (default 4×2048 = 64 KB) — the same driver-sized literal-model
  pattern as the NB/DSIR/bigram-LM gates.
- Estimation is scan-speed pure Catalyst: d literal-array lookups and
  a least() — no join, no shuffle, no Python.
- Merge is counter-wise addition of same-geometry models — partials
  from shards/epochs combine associatively, so sketches can be built
  per-partition-tree exactly like sum partials.
- The md5-60-bit salted construction (functions/hashing.bucket with a
  ``cms{i}:`` salt prefix) makes the ENTIRE sketch ANSI-SQL
  reproducible — the driver oracle rebuilds counters and estimates
  value-for-value, so CMS rows are hash-verifiable, not merely
  bound-checkable.

Reference scope note: the reference engine (src/lib.rs) has no sketch
surface; beyond-reference, next to bloom.py and the rollup HLL column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zx_spark.functions.hashing import bucket, bucket_py


def _salted(s: Column, i: int, width: int) -> Column:
    return bucket(F.concat(F.lit(f"cms{i}:"), s), width)


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
    weight_col: str | None = None,
) -> dict:
    """One aggregation pass → ``{"width", "depth", "n", "counters"}``
    (``counters``: depth lists of width ints; ``n``: total weight).
    NULL values are excluded (a NULL has no frequency identity).
    ``weight_col`` counts each row that many times (long-cast)."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2 and depth >= 1, got {width}x{depth}")
    s = F.col(f"`{col}`").cast("string")
    w = (
        F.col(f"`{weight_col}`").cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = (
        df.filter(s.isNotNull())
        .select(
            F.posexplode(
                F.array(*[_salted(s, i, width) for i in range(depth)])
            ).alias("__row", "__bkt"),
            w.alias("__w"),
        )
        .groupBy("__row", "__bkt")
        .agg(F.sum("__w").alias("__c"))
        .collect()  # ≤ depth·width rows — the model, not the data
    )
    counters = [[0] * width for _ in range(depth)]
    for r in rows:
        counters[r["__row"]][r["__bkt"]] = r["__c"]
    return {
        "width": width,
        "depth": depth,
        "n": sum(counters[0]),
        "counters": counters,
    }


def cms_merge(*models: dict) -> dict:
    """Counter-wise addition of same-geometry sketches — the partial-
    merge that makes CMS shard/epoch-composable."""
    if not models:
        raise ValueError("need at least one model")
    w, d = models[0]["width"], models[0]["depth"]
    for m in models[1:]:
        if (m["width"], m["depth"]) != (w, d):
            raise ValueError(
                f"geometry mismatch: {w}x{d} vs {m['width']}x{m['depth']}"
            )
    counters = [
        [sum(m["counters"][i][j] for m in models) for j in range(w)]
        for i in range(d)
    ]
    return {"width": w, "depth": d, "n": sum(counters[0]), "counters": counters}


def cms_estimate_col(value: Column, model: dict) -> Column:
    """Scan-speed point estimate: least over the d literal-array
    lookups. NULL in → NULL out."""
    w = model["width"]
    lookups = [
        F.element_at(
            F.array(*[F.lit(int(c)) for c in model["counters"][i]]),
            (_salted(value.cast("string"), i, w) + F.lit(1)).cast("int"),
        )
        for i in range(model["depth"])
    ]
    return F.when(value.isNotNull(), F.least(*lookups))


def cms_estimate_py(model: dict, value: str) -> int:
    """Driver-side twin of ``cms_estimate_col`` — identical for any
    UTF-8 string (same salted md5-60-bit buckets)."""
    w = model["width"]
    return min(
        model["counters"][i][bucket_py(f"cms{i}:{value}", w)]
        for i in range(model["depth"])
    )


def cms_screen(
    df: DataFrame,
    col: str,
    model: dict,
    min_count: int,
) -> DataFrame:
    """Map-side heavy-hitter screen: keep rows whose value's CMS
    estimate is ≥ ``min_count``. Because estimates NEVER underestimate,
    the screen is a SAFE prefilter — no value with true count ≥
    min_count is ever dropped; collisions only let some sub-threshold
    values through, and the exact aggregation that follows removes
    them. The standard two-phase heavy-hitter plan at scale: a
    scan-speed literal-lookup filter cuts the corpus to the candidate
    sliver BEFORE the exact groupBy shuffles anything."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    return df.filter(
        cms_estimate_col(F.col(f"`{col}`"), model) >= F.lit(min_count)
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    width: int = 2048,
    depth: int = 4,
    model: dict | None = None,
) -> DataFrame:
    """Exact values with count ≥ min_count, via the two-phase plan:
    CMS screen (scan-speed, no shuffle) → exact count over the
    surviving sliver only → threshold filter. Result is EXACT — the
    sketch only bounds what the exact pass must shuffle. Pass a
    prebuilt ``model`` (e.g. merged from shards/epochs) to skip the
    build pass."""
    if model is None:
        model = cms_build(df, col, width=width, depth=depth)
    return (
        cms_screen(df, col, model, min_count)
        .groupBy(F.col(f"`{col}`").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )

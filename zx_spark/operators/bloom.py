"""Bloom-prefilter semi/anti joins — EXACT results, no corpus shuffle.

The membership problem at 100 TB: "keep corpus rows whose key appears
in a large key set". A plain ``left_semi`` shuffles the FULL corpus on
the key; a broadcast semi-join needs the exact key set to fit in
executor memory (100 M URLs × 60 B ≈ 6 GB — too big to broadcast). The
middle regime is where a Bloom filter wins: the same 100 M keys at a
1% false-positive rate fit in ~120 MB of bits, and ~1.2 MB covers 1 M
keys — 50-100× smaller than the exact set, independent of key LENGTH.

Shape here (the model-as-literal house pattern, like the NB/LM/DSIR
models): k md5-derived bit positions per key (the package ``bucket``
construction, one hash family everywhere), ONE aggregation builds the
m-bit bitmap as packed 64-bit words, the driver collects the m/64
longs and embeds them as a single array literal, and the corpus is
then pruned MAP-SIDE — whole-stage codegen, zero Python, zero corpus
shuffle. Bloom filters have no false negatives, so the prefilter keeps
a superset of the true members; the small survivor set then goes
through an exact join, making the final result EXACT — false positives
cost only wasted candidates, never wrong rows. (Spark's own
runtime-bloom-filter rule does this transparently for big shuffle
joins; this operator makes the plan explicit, sized by the caller, and
usable where the rule's 10 GB scan thresholds never fire.)

Scale notes: the bitmap literal ships with the task closure — m is
bounded by ``max_bits`` (default 2^26 bits = 8 MB ≈ 7 M keys at 1%
fpp). Above that, prefer the exact broadcast join (keys already fit
comfortably) or a pre-partitioned/bucketed join. NULL corpus keys
never match (SQL semi-join semantics) and always survive the anti
join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from zx_spark.functions.hashing import bucket


def _positions(key: Column, k: int, m: int) -> Column:
    """k md5-derived bit positions in [0, m): the package ``bucket``
    hash of ``<key>:<i>`` — independent-enough per i, and reproducible
    in ANSI SQL should an oracle ever need the bitmap itself."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: bucket(
            F.concat(key.cast("string"), F.lit(":"), i.cast("string")), m
        ),
    )


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    m_bits: int | None = None,
    k: int | None = None,
    max_bits: int = 1 << 26,
) -> tuple[list[int], int, int, int]:
    """Build the packed bitmap: ``(words, m, k, n_keys)``.

    One distinct + one count job size the filter (skipped when the
    caller pins ``m_bits`` AND ``k``), one explode + bit_or aggregation
    packs it; the driver holds m/64 longs — model-sized, never
    data-sized."""
    kd = (
        keys.select(F.col(f"`{key_col}`").cast("string").alias("__k"))
        .dropna()
        .distinct()
    )
    if m_bits is None or k is None:
        n = kd.count()
        if m_bits is None:
            if not 0.0 < fpp < 1.0:
                raise ValueError(f"fpp must be in (0, 1), got {fpp}")
            m_bits = max(64, int(-max(n, 1) * math.log(fpp) / math.log(2) ** 2))
            if m_bits > max_bits:
                raise ValueError(
                    f"{n} keys at fpp={fpp} need {m_bits} bits > max_bits="
                    f"{max_bits}; raise max_bits (costs plan size) or use "
                    "an exact broadcast/shuffle semi-join instead"
                )
        if k is None:
            k = min(16, max(1, round(m_bits / max(n, 1) * math.log(2))))
    else:
        n = -1  # not sized here; caller pinned the geometry
    m_bits = ((m_bits + 63) // 64) * 64
    words_df = (
        kd.select(F.explode(_positions(F.col("__k"), k, m_bits)).alias("__pos"))
        .select(
            (F.col("__pos") / F.lit(64)).cast("long").alias("__w"),
            F.expr("shiftleft(1L, cast(__pos % 64 AS INT))").alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__word"))
    )
    words = [0] * (m_bits // 64)
    for r in words_df.collect():
        words[r["__w"]] = r["__word"]
    return words, m_bits, k, n


def _passes(key: Column, words: list[int], m: int, k: int) -> Column:
    """Membership test against the literal bitmap: all k probed bits
    set. NULL key → NULL (never a spurious True/False)."""
    lit_words = F.lit(words)
    return F.forall(
        _positions(key, k, m),
        lambda pos: F.getbit(
            F.element_at(lit_words, (pos / F.lit(64)).cast("int") + F.lit(1)),
            (pos % 64).cast("int"),
        )
        == F.lit(1),
    )


def bloom_semi_join(
    df: DataFrame,
    keys: DataFrame,
    on: str,
    right_on: str | None = None,
    fpp: float = 0.01,
    m_bits: int | None = None,
    k: int | None = None,
    max_bits: int = 1 << 26,
    exact: bool = True,
) -> DataFrame:
    """Exact ``left_semi`` with a Bloom prefilter: the corpus is pruned
    map-side to bloom-passing rows (true members + ~fpp false
    positives), and only THAT sliver joins the key set exactly — the
    full corpus never shuffles. ``exact=False`` skips the verify join
    and returns the prefiltered superset (for pipelines that tolerate
    fpp, e.g. candidate generation)."""
    right_on = right_on or on
    words, m, kk, _ = bloom_bitmap(keys, right_on, fpp, m_bits, k, max_bits)
    pre = df.filter(
        F.coalesce(_passes(F.col(f"`{on}`"), words, m, kk), F.lit(False))
    )
    if not exact:
        return pre
    # merge hint: kd is the key SET — data-sized in general, but its
    # distinct-agg estimate can land under the broadcast threshold
    # (SCALE.md r12 class). The documented plan is "only the sliver
    # shuffles for the verify"; sort-merge is that plan, and it spills.
    kd = keys.select(F.col(f"`{right_on}`").alias(on)).dropna().distinct()
    return pre.join(kd.hint("merge"), on=on, how="left_semi")


def bloom_anti_join(
    df: DataFrame,
    keys: DataFrame,
    on: str,
    right_on: str | None = None,
    fpp: float = 0.01,
    m_bits: int | None = None,
    k: int | None = None,
    max_bits: int = 1 << 26,
) -> DataFrame:
    """Exact ``left_anti`` via the same bitmap: rows FAILING the
    prefilter are definite non-members (no false negatives) and pass
    straight through map-side; only the bloom-passing sliver needs the
    exact anti-join to weed out false positives. The corpus is read in
    two map-side passes (both scans keep pushdown/pruning) but never
    shuffles; only ~|members| rows shuffle for the verify. NULL-keyed
    rows are kept, matching ``left_anti``."""
    right_on = right_on or on
    words, m, kk, _ = bloom_bitmap(keys, right_on, fpp, m_bits, k, max_bits)
    p = F.coalesce(_passes(F.col(f"`{on}`"), words, m, kk), F.lit(False))
    definite_miss = df.filter(~p)
    # merge hint: same data-sized key-set rationale as bloom_semi_join
    kd = keys.select(F.col(f"`{right_on}`").alias(on)).dropna().distinct()
    false_pos = df.filter(p).join(kd.hint("merge"), on=on, how="left_anti")
    return definite_miss.unionByName(false_pos)

"""Sequence packing — turning a curated corpus into fixed-length
training windows, the last step before a loader reads shards.

Two standard disciplines:

- ``pack_concat`` (GPT-style): documents are concatenated in a
  deterministic global order and the token stream is cut every
  ``target_len`` tokens. Zero internal padding (only the final pack's
  tail); documents crossing a boundary are split across adjacent
  packs. The assignment is a pure function of the global running token
  count, so it is engine-reproducible and ANSI-SQL-expressible.
- ``pack_greedy`` (doc-preserving): first-fit-decreasing within each
  partition — no document is ever split, at the cost of padding waste
  and per-partition (not global) optimality. The FFD recurrence is
  sequential, so it runs as an Arrow ``applyInPandas`` per salt
  partition; waste is bounded by the per-partition tail.

Distributed shape of ``pack_concat`` (what survives 100 TB): the global
cumulative sum is the classic TWO-PHASE scan — rows are range-bucketed
by LITERAL order-key quantile bounds (deterministic across jobs, unlike
repartitionByRange's re-sampled boundaries), one per-bucket length
total (``n_parts`` rows to the driver, the Lloyd-centers-sized model),
prefix offsets broadcast back, then a per-bucket window cumsum. No
single-partition global window ever exists in the plan; the output is
invariant to the bucket boundaries because the cumsum depends only on
the total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_concat(
    df: DataFrame,
    len_col: str,
    order_col: str,
    id_col: str,
    target_len: int,
    n_parts: int = 32,
) -> DataFrame:
    """Assign every document its place in the concatenated token stream.

    Returns the input columns plus ``tok_start`` (0-based position of
    the doc's first token in the global stream), ``first_pack`` /
    ``last_pack`` (the ``target_len``-token windows the doc touches;
    equal unless the doc crosses a boundary), ``offset_in_pack``
    (position of the doc's first token inside ``first_pack``) and
    ``n_splits`` (``last_pack - first_pack``, 0 = not split).

    Order is (``order_col``, ``id_col``) ascending — fully
    deterministic. NULL or non-positive lengths are rejected.
    """
    if target_len < 1:
        raise ValueError(f"target_len must be >= 1, got {target_len}")
    if n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    ln = F.col(f"`{len_col}`").cast("long")
    ov = F.col(f"`{order_col}`").cast("double")
    # r14 opt: the bad-row probe, the duplicate-key probe and the
    # quantile sketch ride ONE aggregation job (they were three eager
    # driver jobs — most of this operator's fixed cost at bench scale).
    # Shape matters: a flat agg mixing COUNT(DISTINCT (order, id)) with
    # percentile_approx triggers Spark's single-distinct rewrite, whose
    # FIRST aggregate is keyed on the (order, id) struct and therefore
    # builds one ApproximatePercentile buffer PER KEY — corpus-many
    # sketch buffers, a scale-killer. Instead aggregate in two explicit
    # levels: per-(order, id) counts first (narrow rows, plain longs),
    # then one global agg whose quantile sketch runs over the level-1
    # KEYS. When keys are unique — the only path that doesn't raise —
    # the key multiset IS the row multiset, so the sketch is identical;
    # in the raise paths the bounds are never used. The sketch stays
    # percentile_approx — mergeable bounded memory, not an exact
    # percentile funnel.
    qs = [i / n_parts for i in range(1, n_parts)]
    per_key = df.groupBy(
        F.col(f"`{order_col}`").alias("__okey"),
        F.col(f"`{id_col}`").alias("__ikey"),
    ).agg(
        F.count(F.lit(1)).alias("__c"),
        F.count(
            F.when(ln.isNull() | (ln <= 0) | ov.isNull(), 1)
        ).alias("__badc"),
    )
    kov = F.col("__okey").cast("double")
    validation_aggs = [
        F.coalesce(F.sum("__badc"), F.lit(0)).alias("__bad"),
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"),
        F.count(F.lit(1)).alias("__nk"),
    ]
    if n_parts > 1:
        validation_aggs.append(
            F.percentile_approx(kov, F.lit(qs), F.lit(10000)).alias("__b")
        )
    stat = per_key.agg(*validation_aggs).collect()[0]
    if stat["__bad"]:
        raise ValueError(
            f"pack_concat: {len_col} must be positive and {order_col} "
            "non-NULL for every row"
        )
    # duplicate (order, id) keys would make the cumsum order — and hence
    # every downstream token position — nondeterministic; fail fast
    if stat["__n"] != stat["__nk"]:
        raise ValueError(
            f"pack_concat: ({order_col}, {id_col}) must be unique per row"
        )
    # Deterministic range partitioning by LITERAL quantile bounds (the
    # PSI-edges discipline) — repartitionByRange would re-SAMPLE its
    # boundaries on each job, and the prefix offsets collected in the
    # first job must describe exactly the partitions the second job
    # windows over. All rows sharing an order value share a partition,
    # so the (order, id) tie-break never crosses a boundary.
    if n_parts > 1:
        row = stat["__b"]
        bounds = [float(b) for b in row] if row is not None else []
        # plain comparison-indicator sum, not a higher-order filter over
        # an array literal: lambda variables are interpreted per row and
        # their binding across the downstream broadcast join is what
        # intermittently threw INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND; a
        # codegen'd CASE chain over ≤ n_parts-1 literals is equivalent
        # (count of bounds strictly below ov) and join-safe.
        pid = F.lit(0)
        for b in bounds:
            pid = pid + (ov > F.lit(b)).cast("int")
    else:
        pid = F.lit(0)
    parted = df.withColumn("__pid", pid)
    totals = parted.groupBy("__pid").agg(F.sum(ln).alias("__ptot"))
    # prefix offsets: tiny driver-side model (≤ n_parts rows), broadcast
    rows = sorted(
        (r["__pid"], r["__ptot"]) for r in totals.collect()
    )
    offsets, acc = [], 0
    for p, tot in rows:
        offsets.append((p, acc))
        acc += tot
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, "__pid int, __poff long")
    # explicit ROWS frame: the default RANGE frame would give rows tied
    # on the order key identical (overlapping) cumulative sums
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(f"`{order_col}`"), F.col(f"`{id_col}`"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        parted.join(F.broadcast(off), "__pid")
        .withColumn("__cum_local", F.sum(ln).over(w))
        .withColumn("tok_start", F.col("__poff") + F.col("__cum_local") - ln)
        # integer `div`, not double division: floating /(target_len) is
        # only exact while the global token count stays below 2^53; the
        # oracle's integer // must match at any magnitude
        .withColumn("first_pack", F.expr(f"tok_start div {target_len}L"))
        .withColumn(
            "last_pack",
            F.expr(
                f"(tok_start + cast(`{len_col}` as long) - 1) "
                f"div {target_len}L"
            ),
        )
        .withColumn(
            "offset_in_pack", F.col("tok_start") % target_len
        )
        .withColumn("n_splits", F.col("last_pack") - F.col("first_pack"))
        .drop("__pid", "__poff", "__cum_local")
    )
    return out


def pack_concat_stats(
    df: DataFrame,
    len_col: str,
    target_len: int,
) -> DataFrame:
    """One row: ``(total_tokens, n_packs, tail_padding, waste_frac)`` —
    concat packing pads only the final pack."""
    if target_len < 1:
        raise ValueError(f"target_len must be >= 1, got {target_len}")
    ln = F.col(f"`{len_col}`").cast("long")
    agg = df.agg(F.sum(ln).alias("total_tokens"))
    n_packs = F.ceil(F.col("total_tokens") / target_len).cast("long")
    pad = n_packs * target_len - F.col("total_tokens")
    return agg.select(
        "total_tokens",
        n_packs.alias("n_packs"),
        pad.alias("tail_padding"),
        F.round(pad / (n_packs * target_len), 6).alias("waste_frac"),
    )


def pack_greedy(
    df: DataFrame,
    len_col: str,
    id_col: str,
    target_len: int,
    n_parts: int = 32,
) -> DataFrame:
    """Doc-preserving first-fit-decreasing packing WITHIN each of
    ``n_parts`` deterministic salt partitions (md5 of the id). Returns
    the input plus ``pack_id`` (string ``"<salt>:<local bin>"``) and
    ``pack_fill`` (the bin's total tokens, repeated on each member).

    Documents longer than ``target_len`` raise — split them first
    (functions.text.chunk_documents) or use ``pack_concat``. Per-salt
    FFD is the standard distributed approximation: waste is bounded by
    one tail bin per salt; global FFD would serialize the corpus.
    """
    if target_len < 1:
        raise ValueError(f"target_len must be >= 1, got {target_len}")
    if n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    import pandas as pd

    ln = F.col(f"`{len_col}`").cast("long")
    too_big = (
        df.filter(
            ln.isNull()
            | (ln <= 0)
            | (ln > target_len)
            | F.col(f"`{id_col}`").isNull()
        )
        .limit(1)
        .count()
    )
    if too_big:
        raise ValueError(
            f"pack_greedy: every {len_col} must be in [1, {target_len}] "
            f"and {id_col} non-NULL"
        )
    salted = df.withColumn(
        "__salt",
        (
            F.conv(F.substring(F.md5(F.col(f"`{id_col}`").cast("string")), 1, 8), 16, 10)
            % n_parts
        ).cast("int"),
    )
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in salted.schema.fields
    ) + ", pack_id string, pack_fill long"

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        salt = int(pdf["__salt"].iloc[0])
        order = sorted(
            range(len(pdf)),
            key=lambda i: (-int(pdf[len_col].iloc[i]), pdf[id_col].iloc[i]),
        )
        bins: list[int] = []  # remaining capacity per bin
        assign = [0] * len(pdf)
        for i in order:
            need = int(pdf[len_col].iloc[i])
            for b, rem in enumerate(bins):
                if rem >= need:
                    bins[b] = rem - need
                    assign[i] = b
                    break
            else:
                bins.append(target_len - need)
                assign[i] = len(bins) - 1
        out = pdf.copy()
        out["pack_id"] = [f"{salt}:{b}" for b in assign]
        fill = {b: target_len - rem for b, rem in enumerate(bins)}
        out["pack_fill"] = [fill[b] for b in assign]
        return out

    return (
        salted.groupBy("__salt")
        .applyInPandas(ffd, schema)
        .drop("__salt")
    )

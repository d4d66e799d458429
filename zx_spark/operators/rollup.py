"""Hypertable rollup / continuous aggregates — pre-aggregated time buckets
that answer coarser-granularity queries WITHOUT rescanning the events.

Beyond-reference scale operator (the reference recomputes every query from
raw storage, src/lib.rs:191-218). At 100 TB the standard observability
pattern (TimescaleDB continuous aggregates, Druid rollup segments, M3
downsampling) is: maintain per-bucket MERGEABLE partial aggregates at a
fine base granularity, then answer any query whose window is a multiple of
the base from the rollup — a table that is orders of magnitude smaller
than the raw events (one row per (group, bucket) instead of per event).

Everything here is a plain Catalyst aggregation; the partials are chosen so
that every re-aggregation is itself a partial-aggregatable expression:

    SUM   -> sum of Σ r·x            (merge: SUM)
    COUNT -> sum of Σ r·[present]    (merge: SUM)
    MIN   -> min of per-bucket mins  (merge: MIN)
    MAX   -> max of per-bucket maxes (merge: MAX)
    MEAN  -> Σ x·⌊r⌋ / Σ ⌊r⌋         (merge: SUM / SUM — never avg-of-avgs)
    COUNT_DISTINCT_APPROX -> HLL sketch binary (merge: hll_union_agg) —
        sketches are the ONLY mergeable distinct representation; exact
        COUNT_DISTINCT and exact P50 are NOT derivable from a rollup and
        must run on the raw events (documented, not silently approximated).
    P50_APPROX -> equi-width histogram bin counts (merge: per-bin SUM;
        opt-in via ``quantile_bins``) — finalized by within-bin linear
        interpolation, error bounded by one bin width. The same
        pre-aggregate-then-interpolate shape every downsampling TSDB uses
        for quantiles-over-rollups.

Incremental maintenance falls out of mergeability: rollup(new_events) can
be unioned with the stored rollup and re-merged (``merge_rollups``) — no
read-modify-write of history, late data just lands in its bucket.

Window semantics match ``compile_query(window_mode="aligned")`` exactly:
buckets are epoch-aligned tumbling windows (``with_aligned_windows``), and
``first_ts``/``last_ts`` partials reproduce the reference's convention of
reporting the first/last *event* timestamp per window (src/lib.rs:702-708).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zx_spark.model import NIL, Aggregate, Cmp, Select
from zx_spark.operators.aggregates import F64_MAX, F64_MIN, _rate
from zx_spark.operators.windows import WINDOW_NO, with_aligned_windows

BUCKET = "bucket_start"
FIRST_TS = "first_ts"
LAST_TS = "last_ts"
N_ROWS = "n_rows"

# Suffix → merge function. A rollup column is either a shared column
# (bucket/ts bounds/row count) or "<value_col>__<suffix>".
_MERGE_BY_SUFFIX = {
    "sum_wx": F.sum,
    "cnt_w": F.sum,
    "mean_num": F.sum,
    "mean_den": F.sum,
    "min": F.min,
    "max": F.max,
    "any_null": F.max,
    "hll": lambda c: F.hll_union_agg(c, True),
}
_MERGE_SHARED = {N_ROWS: F.sum, FIRST_TS: F.min, LAST_TS: F.max}
_QBIN = re.compile(r"q\d+")  # histogram bin-count columns, <v>__q<i>

# Aggregates a rollup can answer exactly (vs agg_expr on raw events), plus
# the sketch-backed approximate distinct. Exact COUNT_DISTINCT / P50 / RAW /
# HEATMAP-with-arbitrary-domain need the raw events.
ROLLUP_AGGREGATES = (
    Aggregate.SUM,
    Aggregate.MAX,
    Aggregate.MIN,
    Aggregate.COUNT,
    Aggregate.MEAN,
    Aggregate.COUNT_DISTINCT_APPROX,
    Aggregate.P50_APPROX,
    Aggregate.QUANTILE_APPROX,
)


def _quantile_q_domain(s) -> tuple:
    """(q, histogram domain) for a quantile select: P50_APPROX carries
    the domain in ``params``; QUANTILE_APPROX leads with q, then the
    optional domain."""
    if s.aggregate is Aggregate.P50_APPROX:
        return 0.5, tuple(s.params or QUANTILE_BINS)
    if not s.params or not 0.0 < float(s.params[0]) < 1.0:
        raise ValueError(
            f"QUANTILE_APPROX needs params=(q, ...) with 0 < q < 1, "
            f"got {s.params!r}"
        )
    if float(s.params[0]) == 0.5:
        # same alias-collision guard as aggregates.py — q=0.5 would
        # shadow P50_APPROX's 'p50_approx__<col>' column name
        raise ValueError(
            "QUANTILE_APPROX with q=0.5 duplicates P50_APPROX's alias — "
            "use Aggregate.P50_APPROX instead"
        )
    domain = tuple(s.params[1:]) if len(s.params) > 1 else QUANTILE_BINS
    return float(s.params[0]), domain

# Default histogram domain for quantile partials — matches the HEATMAP
# default domain (aggregates.py) with a finer grid, since quantile error
# is one bin width.
QUANTILE_BINS = (0.0, 1000.0, 32)


def build_rollup(
    df: DataFrame,
    value_cols: list[str],
    group_cols: list[str] | None = None,
    ts_col: str = "ts",
    granularity_s: float = 300.0,
    rate_col: str | None = "sample_rate",
    distinct_sketch: bool = True,
    quantile_bins: tuple[float, float, int] | None = None,
) -> DataFrame:
    """One pass over the events → per-(group, bucket) mergeable partials.

    One shuffle keyed on (group_cols, bucket) with map-side partial
    aggregation — the same cost as a single windowed aggregate query, paid
    once and amortized over every query answered from the rollup.

    ``quantile_bins=(lo, hi, bins)`` additionally stores per-bin row
    counts (``<v>__q<i>`` columns — plain SUMs, so they merge and coarsen
    like everything else), enabling ``P50_APPROX`` answers. Counts are
    unweighted rows, matching exact P50's semantics (reference percentile
    ignores the sample rate, aggregates.py:95-96). Values outside
    [lo, hi) clamp into the edge bins — size the domain to the data.
    """
    if granularity_s <= 0:
        raise ValueError(f"granularity must be positive, got {granularity_s}s")
    group_cols = list(group_cols or [])
    if rate_col is not None and rate_col not in df.columns:
        if rate_col == "sample_rate":
            rate_col = None  # default convention, compiler.py:86-87
        else:
            # An explicitly-requested weight column that doesn't exist
            # must fail loudly — a silently unweighted rollup is wrong
            # in a way no downstream check can see.
            raise ValueError(f"rate_col {rate_col!r} not in {df.columns}")
    df = with_aligned_windows(df, ts_col, granularity_s).withColumnRenamed(
        WINDOW_NO, BUCKET
    )
    r = _rate(rate_col)
    ts_unix = F.col(f"`{ts_col}`").cast("double")

    aggs = [
        F.min(ts_unix).alias(FIRST_TS),
        F.max(ts_unix).alias(LAST_TS),
        F.count(F.lit(1)).alias(N_ROWS),
    ]
    for v in value_cols:
        col = F.col(f"`{v}`")
        x = col.cast("double")
        ri = F.floor(r).cast("double")
        aggs += [
            F.sum(F.coalesce(x, F.lit(0.0)) * r).alias(f"{v}__sum_wx"),
            F.sum(F.when(col.isNotNull(), r).otherwise(F.lit(0.0))).alias(f"{v}__cnt_w"),
            F.min(x).alias(f"{v}__min"),
            F.max(x).alias(f"{v}__max"),
            F.sum(F.when(x.isNotNull(), x * ri)).alias(f"{v}__mean_num"),
            F.sum(F.when(x.isNotNull(), ri)).alias(f"{v}__mean_den"),
            F.max(F.when(col.isNull(), F.lit(1)).otherwise(F.lit(0))).alias(
                f"{v}__any_null"
            ),
        ]
        if distinct_sketch:
            # lgConfigK=12 ≈ 1.6KB/sketch, ~2.5% rsd — mergeable across
            # buckets AND groups, unlike any exact-distinct representation.
            aggs.append(F.hll_sketch_agg(col.cast("string"), 12).alias(f"{v}__hll"))
        if quantile_bins is not None:
            lo, hi, nb = quantile_bins
            if not (hi > lo and int(nb) > 0):
                raise ValueError(f"bad quantile domain {quantile_bins}")
            width = (float(hi) - float(lo)) / int(nb)
            b_idx = F.least(
                F.greatest(F.floor((x - F.lit(float(lo))) / F.lit(width)), F.lit(0)),
                F.lit(int(nb) - 1),
            )
            for b in range(int(nb)):
                aggs.append(
                    F.coalesce(
                        F.sum(F.when(x.isNotNull() & (b_idx == b), 1).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("double")
                    .alias(f"{v}__q{b}")
                )
    return df.groupBy(*group_cols, BUCKET).agg(*aggs)


def _merge(df: DataFrame, group_cols: list[str], bucket_col) -> DataFrame:
    """Re-aggregate rollup partials under a (possibly coarser) bucket."""
    aggs = []
    for c in df.columns:
        if c in (BUCKET, *group_cols):
            continue
        if c in _MERGE_SHARED:
            aggs.append(_MERGE_SHARED[c](F.col(c)).alias(c))
            continue
        suffix = c.rsplit("__", 1)[-1]
        if suffix in _MERGE_BY_SUFFIX:
            aggs.append(_MERGE_BY_SUFFIX[suffix](F.col(c)).alias(c))
        elif _QBIN.fullmatch(suffix):
            aggs.append(F.sum(F.col(c)).alias(c))  # histogram bin counts
        else:
            raise ValueError(f"unknown rollup column {c!r}")
    return df.groupBy(*group_cols, bucket_col.alias(BUCKET)).agg(*aggs)


def merge_rollups(*rollups: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union same-granularity rollups and re-merge their partials — THE
    incremental-maintenance primitive: ``merge_rollups(stored,
    build_rollup(new_events, ...))``. Late events just re-merge into their
    bucket; nothing is read-modified in place."""
    group_cols = list(group_cols or [])
    out = rollups[0]
    for other in rollups[1:]:
        out = out.unionByName(other)
    return _merge(out, group_cols, F.col(BUCKET))


def coarsen_rollup(
    rollup: DataFrame,
    from_granularity_s: float,
    to_granularity_s: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Re-bucket a rollup to a coarser granularity (must be an integer
    multiple — epoch-aligned buckets nest exactly then)."""
    ratio = to_granularity_s / from_granularity_s
    if ratio != int(ratio) or ratio < 1:
        raise ValueError(
            f"target granularity {to_granularity_s}s must be an integer "
            f"multiple of the base {from_granularity_s}s"
        )
    g = float(to_granularity_s)
    bucket = F.floor(F.col(BUCKET) / g) * g
    return _merge(rollup, list(group_cols or []), bucket.cast("double"))


def rollup_sink(
    stream: DataFrame,
    path: str,
    value_cols: list[str],
    group_cols: list[str] | None = None,
    ts_col: str = "ts",
    granularity_s: float = 300.0,
    rate_col: str | None = "sample_rate",
    distinct_sketch: bool = True,
    quantile_bins: tuple[float, float, int] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Maintain a rollup store FROM A STREAM: each micro-batch aggregates
    to its own partial rows and writes them to an epoch-keyed
    subdirectory (``foreachBatch``) — mergeability does the rest at read
    time (``read_merged_rollup``).

    This needs no stateful streaming operator, no watermark, and drops
    nothing: a late event just lands another partial row for its
    (group, bucket), merged on read. State is zero (vs a watermarked
    streaming agg whose store holds every open window), at the cost of
    duplicate bucket rows between compactions — bounded by batches ×
    groups, reclaimed by ``compact_rollup``.

    Exactly-once despite foreachBatch's at-least-once contract: each
    batch OVERWRITES ``path/epoch=<batch_id>``, so a micro-batch replay
    after a crash-before-checkpoint rewrites the same directory instead
    of appending a double-counting duplicate. The checkpoint and the
    store are one unit: deleting the checkpoint without clearing the
    store leaves stale high-numbered epochs behind if the rerun batches
    differently. Returns the started StreamingQuery."""
    kw = dict(
        value_cols=value_cols, group_cols=group_cols, ts_col=ts_col,
        granularity_s=granularity_s, rate_col=rate_col,
        distinct_sketch=distinct_sketch, quantile_bins=quantile_bins,
    )

    def _batch(df: DataFrame, epoch: int) -> None:
        build_rollup(df, **kw).write.mode("overwrite").parquet(
            f"{path.rstrip('/')}/epoch={int(epoch)}"
        )

    w = stream.writeStream.foreachBatch(_batch)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_merged_rollup(
    spark, path: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Read a stream-maintained rollup store, merging duplicate
    (group, bucket) partial rows across epochs (one shuffle over the
    tiny rollup). The ``epoch`` partition column is bookkeeping, not
    data — dropped before the merge."""
    from zx_spark.storage import _recover_swap

    _recover_swap(path)
    df = spark.read.parquet(path)
    if "epoch" in df.columns:
        df = df.drop("epoch")
    return merge_rollups(df, group_cols=group_cols)


def compact_rollup(spark, path: str, group_cols: list[str] | None = None) -> None:
    """Rewrite an epoch-accreted rollup store to one row per
    (group, bucket) — the periodic maintenance that bounds merge-on-read
    cost. The merged result lands under the reserved ``epoch=-1``
    directory so later stream batches (epochs ≥ 0) keep accreting next
    to it. Two-rename swap with the same crash-recovery contract as
    ``storage.compact_store``."""
    from zx_spark.storage import _finish_swap, _swap_paths

    merged = read_merged_rollup(spark, path, group_cols)
    tmp, _ = _swap_paths(path)
    merged.write.mode("overwrite").parquet(f"{tmp}/epoch=-1")
    _finish_swap(path)


def _hist_quantile_cols(rollup: DataFrame, v: str, domain: tuple) -> tuple:
    """Helper-column expressions for a histogram quantile over the
    ``<v>__q<i>`` bin counts: ``(arr_expr, cum_of)`` where ``arr_expr``
    packs the bins into one array and ``cum_of(arr_col)`` is its
    cumulative-sum array (ONE aggregate pass; left-to-right additions —
    the same fp association as a chained sum). Materialize both as named
    columns before calling ``_hist_quantile_est`` — that keeps the whole
    quantile plan O(bins) expression nodes. The previous when-chain
    formulation inlined the full cumulative sum into every branch
    (~bins² nodes), costing ~2 s of driver-side analysis per fresh plan
    at 32 bins."""
    lo, hi, nb = domain
    lo, hi, nb = float(lo), float(hi), int(nb)
    missing = [b for b in range(nb) if f"{v}__q{b}" not in rollup.columns]
    if missing or f"{v}__q{nb}" in rollup.columns:
        raise ValueError(
            f"rollup has no {nb}-bin histogram for {v!r} — build_rollup "
            f"with quantile_bins=({lo}, {hi}, {nb}) (Select.params must "
            "match the build domain)"
        )
    arr = F.array(*[F.coalesce(F.col(f"`{v}__q{b}`"), F.lit(0.0)) for b in range(nb)])

    def cum_of(arr_col: Column) -> Column:
        return F.aggregate(
            arr_col,
            F.array().cast("array<double>"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.when(F.size(acc) > 0, F.element_at(acc, -1)).otherwise(
                        F.lit(0.0)
                    )
                    + x
                ),
            ),
        )

    return arr, cum_of


def _hist_quantile_est(
    arr_col: Column, cum_col: Column, domain: tuple, q: float
) -> Column:
    """Quantile estimate from materialized bin/cumulative arrays: find
    the first bin whose cumulative count crosses q·total (empty bins
    skipped), interpolate linearly inside it. Pure Catalyst — no shuffle,
    no Python. The estimate lands in the bin holding the ⌈q·n⌉-th order
    statistic, i.e. within one bin width of ``percentile_disc(q)`` for
    in-domain data (the *interpolating* percentile can sit further away
    in tiny windows, when the two middle values straddle bins)."""
    lo, hi, nb = domain
    lo, hi, nb = float(lo), float(hi), int(nb)
    width = (hi - lo) / nb
    total = F.element_at(cum_col, nb)
    target = total * F.lit(q)
    prev_of = lambda i: F.when(i > 1, F.element_at(cum_col, i - 1)).otherwise(  # noqa: E731
        F.lit(0.0)
    )
    found = F.aggregate(
        F.sequence(F.lit(1), F.lit(nb)),
        F.lit(None).cast("double"),
        lambda acc, i: F.coalesce(
            acc,
            F.when(
                (F.element_at(cum_col, i) >= target)
                & (F.element_at(arr_col, i) > 0),
                F.lit(lo)
                + F.lit(width)
                * (
                    (i - F.lit(1)).cast("double")
                    + (target - prev_of(i)) / F.element_at(arr_col, i)
                ),
            ),
        ),
    )
    return F.when(total > 0, found)


def rollup_answer(
    rollup: DataFrame,
    selects: list[Select],
    group_cols: list[str] | None = None,
    empty_sentinels: bool = True,
) -> DataFrame:
    """Finalize rollup partials into query results — same output shape and
    zx null semantics as ``compile_query`` (window_start/window_end = the
    first/last event ts in the bucket, src/lib.rs:702-708). The input scan
    is the (tiny) rollup table; the raw events are never touched."""
    group_cols = list(group_cols or [])
    # Materialize quantile helper arrays (bins, cumulative) as named
    # columns FIRST — projection boundaries that keep the quantile
    # expression O(bins); see _hist_quantile_cols. Helper columns are
    # keyed by SELECT INDEX, not just column name: two P50_APPROX
    # selects on the same column with different params must not
    # overwrite each other's bin domains.
    for i, s in enumerate(selects):
        if s.aggregate in (Aggregate.P50_APPROX, Aggregate.QUANTILE_APPROX):
            v = s.column
            _, domain = _quantile_q_domain(s)
            arr, cum_of = _hist_quantile_cols(rollup, v, domain)
            rollup = rollup.withColumn(f"__qarr_{v}_{i}", arr).withColumn(
                f"__qcum_{v}_{i}", cum_of(F.col(f"__qarr_{v}_{i}"))
            )
    cols = [F.col(c) for c in group_cols] + [
        F.col(FIRST_TS).alias("window_start"),
        F.col(LAST_TS).alias("window_end"),
    ]
    for i, s in enumerate(selects):
        v = s.column
        if s.aggregate not in ROLLUP_AGGREGATES:
            raise ValueError(
                f"{s.aggregate.value} is not answerable from a rollup — "
                "exact distinct/quantiles/raw need the raw events "
                f"(rollup-answerable: {[a.value for a in ROLLUP_AGGREGATES]})"
            )
        if s.aggregate is Aggregate.SUM:
            expr = F.coalesce(F.col(f"{v}__sum_wx"), F.lit(0.0))
        elif s.aggregate is Aggregate.COUNT:
            expr = F.coalesce(F.col(f"{v}__cnt_w"), F.lit(0.0))
        elif s.aggregate is Aggregate.MIN:
            expr = F.col(f"{v}__min")
            if empty_sentinels:
                expr = F.coalesce(expr, F.lit(F64_MAX))
        elif s.aggregate is Aggregate.MAX:
            expr = F.col(f"{v}__max")
            if empty_sentinels:
                expr = F.coalesce(expr, F.lit(F64_MIN))
        elif s.aggregate is Aggregate.MEAN:
            expr = F.col(f"{v}__mean_num") / F.col(f"{v}__mean_den")
        elif s.aggregate in (Aggregate.P50_APPROX, Aggregate.QUANTILE_APPROX):
            q, domain = _quantile_q_domain(s)
            expr = _hist_quantile_est(
                F.col(f"__qarr_{v}_{i}"),
                F.col(f"__qcum_{v}_{i}"),
                domain,
                q,
            )
        else:  # COUNT_DISTINCT_APPROX
            expr = (
                F.hll_sketch_estimate(F.col(f"{v}__hll")) + F.col(f"{v}__any_null")
            ).cast("double")
        cols.append(expr.alias(s.alias))
    return rollup.select(*cols)


# ------------------------------------------------------- query routing
#
# The materialized-view half of the continuous-aggregate story: given a
# stored rollup and a compiled-query shape, answer from the (tiny) rollup
# when the query is exactly expressible over it, fall back to the raw
# events otherwise. The routing rules are CONSERVATIVE — a query routes
# only when the rollup answer provably equals compile_query's answer
# (granularity nests, aggregates mergeable, group keys covered, time
# bounds on bucket edges); everything else falls back loudly via the
# returned reason string, never silently approximates.
#
# One documented boundary nuance: compile_query's scan is INCLUSIVE of
# t_end (reference src/lib.rs:305-331), but a rollup cannot see inside a
# bucket, so routing excludes the bucket starting exactly at t_end. The
# two differ only for an event whose timestamp equals t_end to the
# microsecond; queries that must honor that point should not route.


def build_query_rollup(
    events: DataFrame,
    value_cols: list[str],
    group_by: list[str],
    ts_col: str = "ts",
    granularity_s: float = 300.0,
    rate_col: str | None = "sample_rate",
    **kwargs,
) -> DataFrame:
    """Build a rollup keyed exactly the way ``compile_query`` groups:
    ``g_<col>`` string aliases with the ``__nil`` missing-value
    convention — so ``answer_query_from_rollup`` output matches the
    compiler's column-for-column."""
    from zx_spark.compiler import group_alias

    dtypes = dict(events.dtypes)
    keys = []
    for c in group_by:
        a = group_alias(c)
        # Stash the RAW column dtype in the key's field metadata (survives
        # groupBy and Spark's parquet round-trip): EQ/NE routing compares
        # the stringified key, which only matches compile_query's native
        # comparison for string/integer raw columns — rollup_route_reason
        # reads this to reject e.g. float columns where `col == 7` matches
        # 7.0 natively but key '7.0' != '7'.
        events = events.withColumn(
            a,
            F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(NIL)).alias(
                a, metadata={"zx_raw_dtype": dtypes.get(c, "")}
            ),
        )
        keys.append(a)
    return build_rollup(
        events, value_cols, keys, ts_col, granularity_s, rate_col, **kwargs
    )


def rollup_route_reason(
    rollup: DataFrame,
    q,
    rollup_granularity_s: float,
    rollup_group_cols: list[str],
    assume_no_boundary_event: bool = False,
) -> str | None:
    """``None`` when ``q`` is exactly answerable from the rollup, else a
    human-readable fallback reason (also the test/debug surface).

    ``assume_no_boundary_event=True`` skips the t_end boundary probe (a
    pruned one-bucket scan of the rollup — exact but one Spark job per
    routed query): opt in when the caller KNOWS no event timestamp can
    sit exactly on a bucket edge (e.g. microsecond-resolution event
    times make edge collision measure-zero) or in a high-QPS routing
    layer where the probe cost matters; the routed answer then follows
    the documented open-right boundary instead of being provably
    closed-right-equal."""
    from zx_spark.compiler import group_alias

    if not q.selects:
        return "no selects"
    for c in q.conditions:
        # EQ/NE on a rollup group key routes: the key is
        # coalesce(cast(col as string), '__nil'), NULL rows land on
        # '__nil', and correct EQ/NE are NULL-rejecting — so filtering
        # the key column is row-for-row equivalent. Values stay limited
        # to str/int (canonical string forms); float reprs can diverge
        # from Spark's cast.
        if c.cmp not in (Cmp.EQ, Cmp.NE):
            return f"condition {c.cmp.value} on {c.column!r} needs the raw events"
        ga = group_alias(c.column)
        if ga not in rollup_group_cols:
            return f"condition column {c.column!r} is not a rollup group key"
        if not isinstance(c.value, (str, int)) or isinstance(c.value, bool):
            return f"condition value {c.value!r} has no canonical string form"
        if str(c.value) == NIL:
            return f"condition value collides with the {NIL!r} sentinel"
        # The stringified key only reproduces compile_query's NATIVE
        # comparison for string/integer raw columns (a float column casts
        # 7 -> '7.0', so key '7.0' != str(7)). build_query_rollup stashes
        # the raw dtype in field metadata; when present and not
        # string/integral, fall back. Keys built by hand carry no
        # metadata — then the existing str/int value limit applies.
        if ga in rollup.columns:
            raw_dtype = (rollup.schema[ga].metadata or {}).get("zx_raw_dtype")
            if raw_dtype and raw_dtype not in (
                "string",
                "tinyint",
                "smallint",
                "int",
                "bigint",
            ):
                return (
                    f"condition column {c.column!r} has raw dtype "
                    f"{raw_dtype!r} — stringified key comparison diverges "
                    "from the native comparison"
                )
    if q.granularity_s is not None and q.window_mode != "aligned":
        return f"window_mode {q.window_mode!r} is not bucket-composable"
    for s in q.selects:
        if s.aggregate not in ROLLUP_AGGREGATES:
            return f"{s.aggregate.value} is not rollup-answerable"
        v = s.column
        if f"{v}__sum_wx" not in rollup.columns:
            return f"rollup has no partials for column {v!r}"
        if (
            s.aggregate in (Aggregate.P50_APPROX, Aggregate.QUANTILE_APPROX)
            and f"{v}__q0" not in rollup.columns
        ):
            return f"rollup built without quantile_bins for {v!r}"
        if (
            s.aggregate is Aggregate.COUNT_DISTINCT_APPROX
            and f"{v}__hll" not in rollup.columns
        ):
            return f"rollup built without distinct_sketch for {v!r}"
    keys = [group_alias(c) for c in q.group_by]
    missing = [k for k in keys if k not in rollup_group_cols]
    if missing:
        return f"group keys {missing} not in rollup keys {rollup_group_cols}"
    if q.granularity_s is not None:
        ratio = q.granularity_s / rollup_granularity_s
        if ratio != int(ratio) or ratio < 1:
            return (
                f"granularity {q.granularity_s}s does not nest rollup "
                f"buckets of {rollup_granularity_s}s"
            )
    align = q.granularity_s or rollup_granularity_s
    for name, t in (("t_start", q.t_start), ("t_end", q.t_end)):
        if t is not None and float(t) % align != 0:
            return f"{name}={t} is not on a {align}s bucket edge"
    if q.t_end is not None and not assume_no_boundary_event:
        # compile_query's scan is INCLUSIVE of t_end (reference
        # src/lib.rs:305-331) but the routed filter is BUCKET < t_end; the
        # two differ only when an event's ts equals t_end to the
        # microsecond. t_end is on a base-bucket edge (checked above), so
        # such an event necessarily lands in the bucket STARTING at t_end
        # with first_ts == t_end exactly. Probe that one bucket (pruned
        # scan of the tiny rollup) and fall back when a boundary event
        # provably exists — routing stays exact, never approximate.
        te = float(q.t_end)
        boundary = rollup.filter(
            (F.col(BUCKET) == te) & (F.col(FIRST_TS) == te)
        ).limit(1)
        if boundary.count() > 0:
            return (
                f"an event at exactly t_end={q.t_end} exists — the "
                "closed-right boundary is not expressible from buckets"
            )
    return None


def answer_query_from_rollup(
    rollup: DataFrame,
    q,
    rollup_granularity_s: float,
    rollup_group_cols: list[str],
    empty_sentinels: bool = True,
    assume_no_boundary_event: bool = False,
) -> DataFrame | None:
    """The rollup answer for ``q``, or ``None`` when it must fall back
    (see ``rollup_route_reason``). Scans only the rollup — the raw events
    are never touched."""
    from zx_spark.compiler import group_alias

    if rollup_route_reason(
        rollup, q, rollup_granularity_s, rollup_group_cols,
        assume_no_boundary_event,
    ):
        return None
    keys = [group_alias(c) for c in q.group_by]
    r = rollup
    if q.t_start is not None:
        r = r.filter(F.col(BUCKET) >= float(q.t_start))
    if q.t_end is not None:
        r = r.filter(F.col(BUCKET) < float(q.t_end))
    for c in q.conditions:  # EQ/NE on group keys (validated above)
        ga = F.col(group_alias(c.column))
        if c.cmp is Cmp.EQ:
            r = r.filter(ga == str(c.value))
        else:
            r = r.filter((ga != str(c.value)) & (ga != NIL))
    # a finer-keyed rollup answers a coarser grouping: drop the extra
    # keys and let the re-merge aggregate the partials over them
    extra = [c for c in rollup_group_cols if c not in keys]
    if extra:
        r = r.drop(*extra)
    if q.granularity_s is not None:
        if (
            q.granularity_s != rollup_granularity_s
            or set(keys) != set(rollup_group_cols)
        ):
            r = coarsen_rollup(r, rollup_granularity_s, q.granularity_s, keys)
    else:
        # one window per group (run_sorted-style): merge every bucket
        r = _merge(r, keys, F.lit(0.0).cast("double"))
    return rollup_answer(
        r, q.selects, group_cols=keys, empty_sentinels=empty_sentinels
    )


def run_with_rollup(
    events: DataFrame,
    q,
    rollup: DataFrame,
    rollup_granularity_s: float,
    rollup_group_cols: list[str],
    id_col: str = "id",
    ts_col: str = "ts",
    rate_col: str | None = "sample_rate",
    empty_sentinels: bool = True,
    assume_no_boundary_event: bool = False,
) -> DataFrame:
    """Transparent routing: the rollup answer when exact, otherwise
    ``compile_query`` over the raw events — the standard
    materialized-view rewrite, done explicitly."""
    out = answer_query_from_rollup(
        rollup, q, rollup_granularity_s, rollup_group_cols, empty_sentinels,
        assume_no_boundary_event,
    )
    if out is not None:
        return out
    from zx_spark.compiler import compile_query

    return compile_query(
        events,
        q,
        id_col=id_col,
        ts_col=ts_col,
        rate_col=rate_col,
        empty_sentinels=empty_sentinels,
    )

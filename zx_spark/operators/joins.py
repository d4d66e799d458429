"""Join operators Spark lacks natively, built scale-first: salted joins
for AQE-resistant skew, backward as-of joins (one window pass, one
shuffle), and bucketed interval/range joins (equi-join on time bins, not
a nested-loop).

The session enables AQE skew-join splitting (zx_spark.session), which
handles most skew at runtime by splitting oversized sort-merge partitions.
``salted_join`` is the explicit fallback for the cases AQE can't fix —
e.g. a single hot key whose matching SMALL-side rows must be replicated so
the hot key's rows spread over ``salts`` reducers instead of one:

    big ⋈ small on k   →   big+[salt = row_id % s]  ⋈  small×[salt = 0..s-1]
                            on (k, salt)

Correctness: every big row keeps exactly one salt and the small side
carries all salts for each key, so the (k, salt) equi-join matches exactly
the pairs of the original join — verified by test against the unsalted
result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salts``
    reducers. ``small`` is replicated ``salts``× — use only when the small
    side is small enough to replicate (the usual skew shape: huge fact,
    modest dim, one hot key)."""
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        # Replicating the small side salts× would emit each unmatched
        # small-side row salts times under right/full-outer joins —
        # silently wrong results, so refuse.
        raise ValueError(f"salted_join supports inner/left/semi/anti joins, got {how!r}")
    b = big.withColumn(SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int"))
    s = small.withColumn(
        SALT, F.explode(F.lit(list(range(salts))).cast("array<int>"))
    )
    out = b.join(s, on=[on, SALT], how=how)
    return out.drop(SALT)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
    time_bucket_s: float | None = None,
) -> DataFrame:
    """Backward as-of join: each left row is matched to the right row with
    the greatest ``right_ts <= left_ts`` in the same ``on`` key group —
    the time-series enrichment join (trades↔quotes, events↔config marks)
    that Spark has no native operator for.

    Spark-first plan: union both sides tagged, then ONE window pass per key
    group (``last(..., ignorenulls=True)`` over rows-unbounded-preceding)
    carries the most recent right-side payload forward onto left rows.
    Cost = a single shuffle + sort on ``on`` — identical shape to a
    sort-merge join, no Python, no per-row loop; at 100 TB this is the
    minimal-shuffle formulation (an inequality join would be O(n·m) per
    key; this is O((n+m) log) per partition via the sort).

    Ties: a right row AT the left timestamp matches (``<=`` semantics, the
    same as DuckDB ``ASOF JOIN ... ON l.t >= r.t``). ``right`` should be
    unique per ``(on, right_ts)`` — pre-aggregate duplicates, otherwise
    which duplicate wins is plan-dependent.

    ``how='left'`` keeps unmatched left rows (right cols null);
    ``'inner'`` drops them.

    Scale limit (same as session windows, SCALE.md): the per-key window
    pass serializes WITHIN a key, so one pathologically hot key becomes
    one task — inherent to ordered-recurrence semantics. For that case
    pass ``time_bucket_s``: rows split on ``floor(t / bucket)`` so the
    window runs per (key, bucket) — parallel across buckets — and
    carry-in payloads stitch the boundaries: per-bucket right-side tails
    (a tiny table, one row per non-empty bucket) get a cumulative
    last-non-null window over the BUCKET sequence, and left rows with no
    in-bucket match coalesce from their bucket's carry-in. Same result,
    row-for-row (✓test), at the cost of two extra small shuffles —
    opt-in for skew, not the default. One divergence: the stitch joins on
    the keys, so NULL-keyed RIGHT rows never carry across buckets in this
    mode (the base window groups NULLs together) — coalesce such keys
    first if they are meaningful.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns — alias "
            "them on the right frame before joining"
        )
    payload = "__asof_payload"
    side = "__asof_side"
    t = "__asof_t"

    # Right rows carry their payload as ONE struct so a legitimately-NULL
    # right column doesn't make last(ignorenulls) skip back to an older row.
    payload_type = right.select(
        F.struct(*[F.col(c) for c in right_cols]).alias(payload)
    ).schema[0].dataType
    left_only = [c for c in left.columns if c not in on]

    l2 = left.select(
        *left.columns,
        F.lit(1).alias(side),
        F.col(left_ts).alias(t),
        F.lit(None).cast(payload_type).alias(payload),
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.lit(0).alias(side),
        F.col(right_ts).alias(t),
        F.struct(*[F.col(c) for c in right_cols]).alias(payload),
    )
    unioned = l2.unionByName(r2.select(*l2.columns))

    if time_bucket_s is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(t).asc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = unioned.withColumn(
            payload, F.last(payload, ignorenulls=True).over(w)
        ).filter(F.col(side) == 1)
    else:
        # Hot-key pre-split: window per (key, bucket) — parallel across
        # buckets — then stitch boundaries with per-bucket carry-ins.
        # Correct because floor(rt/W) < floor(lt/W) implies rt < lt, so a
        # strictly-earlier bucket's tail is always an eligible (older)
        # match, and the cumulative-last over the bucket sequence picks
        # the latest among them.
        b = "__asof_bucket"
        # cast to double first: epoch seconds for TimestampType ts (a
        # direct timestamp/number division fails analysis), identity for
        # numeric ts.
        bucket_of = lambda c: F.floor(  # noqa: E731
            c.cast("double") / F.lit(float(time_bucket_s))
        ).cast("long")
        unioned = unioned.withColumn(b, bucket_of(F.col(t)))
        wb = (
            Window.partitionBy(*on, b)
            .orderBy(F.col(t).asc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(payload, F.last(payload, ignorenulls=True).over(wb))
        # One tail row per (key, bucket) that contains right rows: the
        # payload of its latest right row.
        tails = (
            r2.withColumn(b, bucket_of(F.col(t)))
            .groupBy(*on, b)
            .agg(F.max_by(payload, F.col(t)).alias("__asof_tail"))
        )
        # Bucket spine (every bucket seen on either side) -> carry-in =
        # latest tail among STRICTLY earlier buckets. This window runs
        # over buckets, not rows — tiny even for a year of seconds.
        spine = (
            unioned.select(*on, b)
            .distinct()
            .join(tails, on=[*on, b], how="left")
        )
        wc = (
            Window.partitionBy(*on)
            .orderBy(F.col(b).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = spine.withColumn(
            "__asof_carry", F.last("__asof_tail", ignorenulls=True).over(wc)
        ).select(*on, b, "__asof_carry")
        out = (
            carried.filter(F.col(side) == 1)
            .join(carry, on=[*on, b], how="left")
            .withColumn(payload, F.coalesce(F.col(payload), F.col("__asof_carry")))
        )
    if how == "inner":
        out = out.filter(F.col(payload).isNotNull())
    return out.select(
        *left.columns,
        *[F.col(f"{payload}.{c}").alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_width: int | None = None,
) -> DataFrame:
    """Interval containment join: left rows whose ``point_col`` falls in
    ``[start_col, end_col]`` of a right interval (plus optional ``on``
    equality keys). Spark's naive formulation is a BroadcastNestedLoopJoin
    (O(n·m)); this is the bucketed equi-join formulation that scales:

    - left rows get bin ``floor(point / w)``;
    - each interval explodes to the bins it overlaps (``sequence(
      floor(start/w), floor(end/w))`` — ≤ len/w + 1 rows);
    - equi-join on ``(on..., bin)`` (shuffle- or broadcast-hash, AQE-
      eligible), then the exact ``BETWEEN`` filter.

    Each (left row, interval) pair meets in exactly one bin — the left
    row's own — so no dedup pass is needed. Pick ``bin_width`` near the
    typical interval length: smaller bins replicate intervals more, larger
    bins fatten the per-bin candidate set."""
    if bin_width is None or bin_width <= 0:
        raise ValueError("range_join requires a positive bin_width")
    on = list(on or [])
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(
            f"left/right share non-key columns {sorted(clash)} — the joined "
            "result would be ambiguous; alias one side first"
        )
    bin_col = "__range_bin"
    lb = left.withColumn(bin_col, F.floor(F.col(point_col) / bin_width).cast("long"))
    rb = right.withColumn(
        bin_col,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width).cast("long"),
                F.floor(F.col(end_col) / bin_width).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, on=[*on, bin_col], how="inner")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop(bin_col)
    )


def _even_segment(length: Column, i: Column, n_seg: int) -> tuple[Column, Column]:
    """0-based (start, len) of segment ``i`` when a string of ``length``
    chars is split into ``n_seg`` contiguous pieces as evenly as possible
    (the first ``length % n_seg`` pieces get the extra char)."""
    base = F.floor(length / F.lit(n_seg)).cast("int")
    rem = (length % F.lit(n_seg)).cast("int")
    seg_len = base + F.when(i < rem, F.lit(1)).otherwise(F.lit(0))
    seg_start = i * base + F.least(i, rem)
    return seg_start, seg_len


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_id: str,
    right_id: str,
    max_dist: int = 1,
) -> DataFrame:
    """Fuzzy (Levenshtein ≤ ``max_dist``) join as a bucketed equi-join —
    record linkage without a cross join, with EXACT recall.

    Blocking is the PassJoin pigeonhole (Li, Deng, Feng — "PASS-JOIN: a
    partition-based method for similarity joins", PVLDB 2012): split every
    left string into ``k+1`` even segments; if ``ed(s, t) <= k`` then at
    least one segment of ``s`` survives UNEDITED in ``t``, shifted by at
    most ``k`` positions (each edit moves later chars by ≤1). So:

    - left explodes to its ``k+1`` segments keyed ``(len(s), i, seg)``;
    - right explodes to every substring that could BE such a segment:
      for each candidate left length ``L ∈ [len(t)-k, len(t)+k]`` (a
      match needs ``|len(s)-len(t)| <= k``), segment index ``i``, and
      start within ``±k`` of the segment's home position — ≤
      ``(2k+1)·(k+1)·(2k+1)`` rows (18 at k=1, 75 at k=2), deduped
      per-row with ``array_distinct``;
    - hash equi-join on ``(L, i, seg)``, ``distinct`` the candidate id
      pairs, then verify with the JVM ``levenshtein(s, t, k)`` (early-
      exit threshold form; no Python, no UDF).

    Unlike the recall-tradeoff blockings (``jaccard_wordset_pairs``'s
    band key), the pigeonhole is a NECESSARY condition — the result
    equals the brute-force nested loop exactly, which is what the DuckDB
    oracle runs. Scale shape: the exploded sides carry only (id,
    segment key) — fixed-width rows — through the two big shuffles
    (segment join, pair distinct); both strings join back by id only
    for the distinct surviving pairs, so string bytes never multiply by
    the explode factor. The segment key includes ``(L, i)`` so hot
    segments spread, and AQE skew-split covers the rest. Cost grows
    O(k³) per right row — ``max_dist`` is capped at 3;
    at that point you want token-level similarity (MinHash) anyway.

    Null texts on either side are dropped (they can't match anything).
    Returns ``(left_id, right_id, distance)`` with the caller's column
    names; distance is the exact edit distance.

    Reference scope note: the reference has no join at all (single
    implicit table, src/lib.rs:33 ``Dataset`` unused); this is
    beyond-reference surface for entity resolution in data curation.
    """
    if not 0 <= max_dist <= 3:
        raise ValueError(f"max_dist must be in [0, 3], got {max_dist}")
    if left_id == right_id:
        raise ValueError(
            "left_id and right_id would collide in the output — alias one "
            "side first (or use edit_distance_dedup_pairs for self-joins)"
        )
    k = max_dist
    n_seg = k + 1

    s, t = F.col("__ed_s"), F.col("__ed_t")

    def _left_segments() -> Column:
        length = F.length(s)

        def one(i: Column) -> Column:
            start, seg_len = _even_segment(length, i.cast("int"), n_seg)
            return F.struct(
                length.cast("int").alias("slen"),
                i.cast("int").alias("seg_i"),
                F.substring(s, start + 1, seg_len).alias("seg"),
            )

        return F.transform(F.sequence(F.lit(0), F.lit(k)), one)

    def _right_candidates() -> Column:
        m = F.length(t)

        def per_shift(d_l: Column) -> Column:
            cand_len = (m + d_l).cast("int")

            def per_seg(i: Column) -> Column:
                home, seg_len = _even_segment(cand_len, i.cast("int"), n_seg)
                lo = F.greatest(home - k, F.lit(0))
                hi = F.least(home + k, m.cast("int") - seg_len)
                starts = F.when(
                    (cand_len >= 0) & (lo <= hi), F.sequence(lo, hi)
                ).otherwise(F.array().cast("array<int>"))
                return F.transform(
                    starts,
                    lambda st: F.struct(
                        cand_len.alias("slen"),
                        i.cast("int").alias("seg_i"),
                        F.substring(t, st + 1, seg_len).alias("seg"),
                    ),
                )

            return F.flatten(F.transform(F.sequence(F.lit(0), F.lit(k)), per_seg))

        return F.array_distinct(
            F.flatten(F.transform(F.sequence(F.lit(-k), F.lit(k)), per_shift))
        )

    # Both exploded sides carry ONLY (id, join key) — never the text —
    # so the two big shuffles (segment join, candidate distinct) move
    # fixed-width rows; each side's string joins back by id once, after
    # the candidate pair set has collapsed to its distinct survivors.
    lstr = (
        left.select(F.col(left_id).alias("__ed_lid"), F.col(left_text).alias("__ed_s"))
        .filter(s.isNotNull())
    )
    rstr = (
        right.select(F.col(right_id).alias("__ed_rid"), F.col(right_text).alias("__ed_t"))
        .filter(t.isNotNull())
    )
    lex = (
        lstr.select("__ed_lid", F.explode(_left_segments()).alias("__ed_k"))
        .select("__ed_lid", "__ed_k.slen", "__ed_k.seg_i", "__ed_k.seg")
    )
    rex = (
        rstr.select("__ed_rid", F.explode(_right_candidates()).alias("__ed_k"))
        .select("__ed_rid", "__ed_k.slen", "__ed_k.seg_i", "__ed_k.seg")
    )
    # merge hints: every side here is data-sized (exploded segments,
    # the distinct candidate pairs, the id→string maps) but each is an
    # agg/explode output whose estimate can land under the broadcast
    # threshold (SCALE.md r12 class) — the design IS the two big
    # shuffles; pin it so Catalyst never ships a corpus-sized build.
    candidates = (
        lex.join(rex.hint("merge"), on=["slen", "seg_i", "seg"])
        .select("__ed_lid", "__ed_rid")
        .distinct()
    )
    return (
        candidates.join(lstr.hint("merge"), on="__ed_lid")
        .join(rstr.hint("merge"), on="__ed_rid")
        .withColumn("__ed_d", F.levenshtein(s, t, k))
        .filter(F.col("__ed_d") >= 0)
        .select(
            F.col("__ed_lid").alias(left_id),
            F.col("__ed_rid").alias(right_id),
            F.col("__ed_d").alias("distance"),
        )
    )


def edit_distance_dedup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_dist: int = 1
) -> DataFrame:
    """Self-join form of ``edit_distance_join``: all unordered id pairs
    whose ``text_col`` values are within ``max_dist`` edits — near-
    identical record detection (typo'd names, off-by-one SKUs). Returns
    ``(id_a, id_b, distance)`` with ``id_a < id_b``; exact-recall like
    the two-table form (the DuckDB brute-force oracle matches it
    row-for-row)."""
    out = edit_distance_join(
        df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ed_txt")),
        df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__ed_txt")),
        "__ed_txt",
        "__ed_txt",
        "id_a",
        "id_b",
        max_dist=max_dist,
    )
    return out.filter(F.col("id_a") < F.col("id_b"))


def resolve_entities(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    max_iter: int = 20,
    broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """End-to-end entity resolution: fuzzy self-match → connected
    components → canonical id. Adds an ``entity_id`` column: the minimum
    id reachable through any CHAIN of ≤``max_dist``-edit matches ("Jon
    Smith" ~ "John Smith" ~ "John Smyth" collapse to one entity even
    though the ends are 2 edits apart); records with no fuzzy match keep
    their own id. Composition of the two scale-safe primitives —
    ``edit_distance_dedup_pairs`` (exact-recall PassJoin blocking) and
    ``dup_components`` (label propagation over the PAIR list, never the
    corpus) — so the iterative part touches only matched ids. The
    components table (matched ids only — usually a sliver of the
    corpus) is broadcast when it has at most ``broadcast_threshold``
    rows, so the corpus itself never shuffles; on a high-duplication
    corpus where most records match (components near corpus size) a
    forced broadcast would hit Spark's 8 GB broadcast cap or OOM the
    driver, so past the threshold the planner picks the join (the
    count is one tiny job — comp is already localCheckpointed by the
    label-propagation rounds)."""
    from zx_spark.operators.dedup import dup_components

    clash = {"entity_id", "component"} & set(df.columns)
    if clash:
        raise ValueError(
            f"df already has column(s) {sorted(clash)} — the result would "
            "be ambiguous or silently overwritten; rename them first"
        )
    pairs = edit_distance_dedup_pairs(df, text_col, id_col, max_dist=max_dist)
    comp = dup_components(pairs, "id_a", "id_b", max_iter=max_iter).select(
        F.col("doc_id").alias(id_col), "component"
    )
    if comp.count() <= broadcast_threshold:
        comp = F.broadcast(comp)
    else:
        # past the measured bound the label frame must NOT be left to
        # Catalyst's agg-output estimate (the r12 estimate-small OOM
        # class) — pin the spillable join
        comp = comp.hint("merge")
    return (
        df.join(comp, on=id_col, how="left")
        .withColumn("entity_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )

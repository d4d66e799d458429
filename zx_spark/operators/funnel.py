"""Event-sequence analytics over the events table: funnels (ordered
step completion within a horizon) and retention cohorts (first-seen
bucket × later-activity bucket).

Beyond-reference in the reference's own domain — its engine aggregates
single event streams per window (src/lib.rs:693-718); "did A then B
then C within an hour" and "of users first seen in week W, how many
returned in week W+k" are the next two questions every events store is
asked.

Scale shape:
- ``funnel_steps`` is ONE hash shuffle on the user key; per-user state
  is a k-slot timestamp array folded over the user's (sorted) events by
  a JVM ``aggregate`` expression — no Python, no per-step self-join
  (the textbook alternative is k joins = k shuffles). Per-user memory
  is that user's event count; a pathological hot user (bot) is a skew
  problem to cap upstream, same as any sessionizer.
- ``retention_cohorts`` is two aggregations: first-seen per user (one
  shuffle), then cohort × bucket distinct-user counts re-using the SAME
  user-keyed partitioning (Catalyst plans the second agg without a new
  exchange until the final small cohort-grid merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    within_s: float | None = None,
) -> DataFrame:
    """Per-user furthest funnel stage: one row per user with
    ``steps_completed`` (0..len(steps)) and ``step_ts`` (completion
    timestamp per reached step, NULL beyond). A step counts only
    STRICTLY AFTER the previous step's completion time.

    Without ``within_s``, the EARLIEST valid completion is taken (the
    standard greedy funnel — optimal there: the earliest step time
    never excludes a completion another choice would allow).

    With ``within_s`` the journey must fit ``[anchor, anchor + T]``
    where the anchor is SOME step-1 occurrence — a user whose first
    attempt expires but who starts over and converts COUNTS (the
    windowed-funnel answer). Greedy earliest-anchor undercounts that
    user, so this mode runs a max-anchor dynamic program instead: slot
    0 re-anchors to each later step-1 event, and a deeper slot adopts a
    later-anchored lineage when one completes it — a later anchor only
    relaxes the remaining deadline, so prefix reachability is exact.
    ``step_ts[i]`` reports slot i's adopted lineage; the DEEPEST slot's
    lineage is always a valid journey. (Tie nuance: events sharing a
    timestamp never chain, and an adopted lineage's later completion
    time can suppress a same-timestamp follow-up a discarded lineage
    would have allowed.)"""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    if within_s is not None and within_s <= 0:
        raise ValueError(f"within_s must be > 0, got {within_s}")
    k = len(steps)
    u, t, s = (F.col(f"`{c}`") for c in (user_col, ts_col, step_col))
    step_idx = F.lit(None).cast("int")
    for i in range(k - 1, -1, -1):
        step_idx = F.when(s == steps[i], F.lit(i)).otherwise(step_idx)
    ev = df.select(
        u.alias("__u"),
        t.cast("double").alias("__t"),
        step_idx.alias("__s"),
    ).filter(F.col("__s").isNotNull() & F.col("__t").isNotNull())
    per_user = ev.groupBy("__u").agg(
        F.sort_array(F.collect_list(F.struct("__t", "__s"))).alias("__evs")
    )
    if within_s is None:
        # earliest-completion greedy: state[i] = earliest completion
        # time of step i (NULL = not reached), set once
        init = F.array(*[F.lit(None).cast("double") for _ in range(k)])

        def _advance(acc: Column, e: Column) -> Column:
            slots = []
            for i in range(k):
                prev_done = (
                    F.lit(True) if i == 0 else F.element_at(acc, i).isNotNull()
                )
                prev_t = F.lit(0.0) if i == 0 else F.element_at(acc, i)
                take = (
                    F.element_at(acc, i + 1).isNull()
                    & (e["__s"] == i)
                    & prev_done
                    & (e["__t"] > prev_t if i > 0 else F.lit(True))
                )
                slots.append(
                    F.when(take, e["__t"]).otherwise(F.element_at(acc, i + 1))
                )
            return F.array(*slots)

        state = F.aggregate(F.col("__evs"), init, _advance)
    else:
        # max-anchor DP: per slot keep (anchor, completion time) of the
        # latest-anchored lineage reaching it — slot 0 re-anchors on
        # every step-1 event, slot i>0 adopts a feasible lineage with a
        # strictly later anchor than its current one
        T = float(within_s)
        null_arr = F.array(*[F.lit(None).cast("double") for _ in range(k)])
        init = F.struct(null_arr.alias("a"), null_arr.alias("t"))

        def _advance(acc: Column, e: Column) -> Column:
            anchors, times = acc["a"], acc["t"]
            new_a, new_t = [], []
            for i in range(k):
                cur_a = F.element_at(anchors, i + 1)
                cur_t = F.element_at(times, i + 1)
                if i == 0:
                    take = e["__s"] == 0
                    new_a.append(F.when(take, e["__t"]).otherwise(cur_a))
                    new_t.append(F.when(take, e["__t"]).otherwise(cur_t))
                else:
                    prev_a = F.element_at(anchors, i)
                    prev_t = F.element_at(times, i)
                    feasible = (
                        prev_a.isNotNull()
                        & (e["__s"] == i)
                        & (e["__t"] > prev_t)
                        & (e["__t"] <= prev_a + F.lit(T))
                    )
                    better = cur_a.isNull() | (prev_a > cur_a)
                    take = feasible & better
                    new_a.append(F.when(take, prev_a).otherwise(cur_a))
                    new_t.append(F.when(take, e["__t"]).otherwise(cur_t))
            return F.struct(F.array(*new_a).alias("a"), F.array(*new_t).alias("t"))

        state = F.aggregate(F.col("__evs"), init, _advance)["t"]
    done = F.aggregate(
        F.transform(state, lambda x: F.when(x.isNotNull(), 1).otherwise(0)),
        F.lit(0),
        lambda a, x: a + x,
    )
    # slots fill strictly in order, so steps_completed = filled prefix
    return per_user.select(
        F.col("__u").alias(user_col),
        done.alias("steps_completed"),
        state.alias("step_ts"),
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    within_s: float | None = None,
) -> DataFrame:
    """The funnel report: for each stage 1..k, how many users reached
    AT LEAST that stage (monotone non-increasing), with the conversion
    fraction vs stage 1. Tiny output (k rows)."""
    per_user = funnel_steps(df, steps, user_col, ts_col, step_col, within_s)
    k = len(steps)
    stage = per_user.select(
        F.explode(
            F.filter(
                F.sequence(F.lit(1), F.lit(k)),
                lambda i: i <= F.col("steps_completed"),
            )
        ).alias("stage")
    )
    counts = stage.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))
    # conversion vs stage 1: running-first window over the k-row frame
    # (k rows total — the single-partition window is fine)
    from pyspark.sql import Window

    w = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, 0)
    return (
        counts.withColumn("step", F.element_at(F.lit(steps), F.col("stage")))
        .withColumn(
            "conversion",
            F.round(F.col("n_users") / F.first("n_users").over(w), 6),
        )
        .orderBy("stage")
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: float = 7 * 86400.0,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention grid: users are cohorted by the bucket of their
    FIRST event; for each (cohort_bucket, offset) the count of cohort
    users active ``offset`` buckets later (offset 0 = the cohort size)
    and the retained fraction. Output is the tiny cohort × offset
    grid."""
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be > 0, got {bucket_s}")
    u, t = F.col(f"`{user_col}`"), F.col(f"`{ts_col}`").cast("double")
    b = F.floor(t / bucket_s)
    ev = df.select(u.alias("__u"), b.alias("__b")).filter(
        F.col("__u").isNotNull() & F.col("__b").isNotNull()
    )
    first = ev.groupBy("__u").agg(F.min("__b").alias("__cohort"))
    # merge hint: the per-user first-bucket frame is user-sized (∝ data)
    # but its agg-output estimate can land under the broadcast threshold
    # — the source_overlap_matrix class (SCALE.md r12); sort-merge spills.
    act = ev.distinct().join(first.hint("merge"), "__u")
    act = act.withColumn("__off", (F.col("__b") - F.col("__cohort")).cast("int"))
    if max_offset is not None:
        act = act.filter(F.col("__off") <= max_offset)
    grid = act.groupBy("__cohort", "__off").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__cohort")
    size = F.max(F.when(F.col("__off") == 0, F.col("n_active"))).over(w)
    return grid.select(
        (F.col("__cohort") * bucket_s).alias("cohort_start"),
        F.col("__off").alias("offset"),
        "n_active",
        F.round(F.col("n_active") / size, 6).alias("retained_frac"),
    )


def conversion_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
) -> DataFrame:
    """REPEATED conversions per user: how many NON-OVERLAPPING complete
    journeys (each step strictly after the previous, journeys strictly
    after each other) the user's event sequence contains, plus the last
    completion time — repeat-purchase analytics, where ``funnel_steps``
    stops at the first completion.

    Same single-shuffle JVM fold as ``funnel_steps``: the k-slot state
    resets each time the last slot fills, bumping a counter. The greedy
    earliest-completion choice maximizes the number of non-overlapping
    journeys (classic interval-scheduling argument: finishing a journey
    at the earliest possible time never excludes a later one)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    k = len(steps)
    u, t, s = (F.col(f"`{c}`") for c in (user_col, ts_col, step_col))
    step_idx = F.lit(None).cast("int")
    for i in range(k - 1, -1, -1):
        step_idx = F.when(s == steps[i], F.lit(i)).otherwise(step_idx)
    ev = df.select(
        u.alias("__u"),
        t.cast("double").alias("__t"),
        step_idx.alias("__s"),
    ).filter(F.col("__s").isNotNull() & F.col("__t").isNotNull())
    per_user = ev.groupBy("__u").agg(
        F.sort_array(F.collect_list(F.struct("__t", "__s"))).alias("__evs")
    )
    null_arr = F.array(*[F.lit(None).cast("double") for _ in range(k)])
    init = F.struct(
        null_arr.alias("slots"),
        F.lit(0).cast("long").alias("n"),
        F.lit(None).cast("double").alias("last"),
    )

    def _advance(acc: Column, e: Column) -> Column:
        slots = acc["slots"]
        new_slots = []
        for i in range(k):
            prev_done = (
                F.lit(True) if i == 0 else F.element_at(slots, i).isNotNull()
            )
            prev_t = F.lit(0.0) if i == 0 else F.element_at(slots, i)
            take = (
                F.element_at(slots, i + 1).isNull()
                & (e["__s"] == i)
                & prev_done
                & (e["__t"] > prev_t if i > 0 else F.lit(True))
            )
            new_slots.append(
                F.when(take, e["__t"]).otherwise(F.element_at(slots, i + 1))
            )
        completed = new_slots[k - 1].isNotNull()
        return F.struct(
            F.when(completed, null_arr).otherwise(F.array(*new_slots)).alias("slots"),
            (acc["n"] + F.when(completed, 1).otherwise(0)).alias("n"),
            F.when(completed, new_slots[k - 1]).otherwise(acc["last"]).alias("last"),
        )

    state = F.aggregate(F.col("__evs"), init, _advance)
    return per_user.select(
        F.col("__u").alias(user_col),
        state["n"].alias("n_conversions"),
        state["last"].alias("last_conversion_ts"),
    ).filter(F.col("n_conversions") > 0)

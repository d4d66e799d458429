"""Event path analysis — the most common step sequences users take,
the "what do people actually do" counterpart to funnels (which ask
about ONE prescribed sequence).

Distributed shape (what survives 100 TB):

- One user-keyed shuffle collects each user's time-ordered step list
  (the same single-shuffle contract as funnel_steps — state per user is
  their own events, optionally truncated by ``max_len``).
- Path n-grams explode from the per-user array as a JVM transform
  (positions × n), then one hash aggregation with map-side combining
  counts them; top-k is a TakeOrdered on the aggregated (path, count)
  table — cardinality ∝ distinct paths, never events.
- Deterministic: ordering ties break on the event id; top-k ties break
  on the path string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def user_step_sequences(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: str | None = None,
    max_len: int | None = None,
) -> DataFrame:
    """(user, steps) — each user's step values in (time, id) order.
    NULL users/steps/timestamps are excluded; ``max_len`` keeps only the
    first N steps per user (bounds state under pathological users)."""
    if max_len is not None and max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    order = [F.col(f"`{ts_col}`").cast("double").alias("__t")]
    if id_col is not None:
        order.append(F.col(f"`{id_col}`").alias("__i"))
    cond = (
        F.col("__u").isNotNull()
        & F.col("__s").isNotNull()
        & F.col("__t").isNotNull()
    )
    if id_col is not None:
        # NULL tie-break ids sort FIRST in Spark's sort_array but LAST
        # in SQL ORDER BY — exclude them so both engines agree
        cond = cond & F.col("__i").isNotNull()
    ev = df.select(
        F.col(f"`{user_col}`").alias("__u"),
        F.col(f"`{step_col}`").cast("string").alias("__s"),
        *order,
    ).filter(cond)
    sort_struct = (
        F.struct("__t", "__i", "__s") if id_col is not None else F.struct("__t", "__s")
    )
    seq = ev.groupBy("__u").agg(
        F.transform(
            F.sort_array(F.collect_list(sort_struct)), lambda e: e["__s"]
        ).alias("steps")
    )
    if max_len is not None:
        seq = seq.select("__u", F.slice("steps", 1, max_len).alias("steps"))
    return seq.withColumnRenamed("__u", user_col)


def common_paths(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: str | None = None,
    max_len: int | None = None,
    unique_per_user: bool = False,
    sep: str = ">",
) -> DataFrame:
    """Top-``k`` length-``n`` step paths across all users:
    ``(path, n_occurrences, n_users)``, ordered by occurrences desc then
    path asc (deterministic). ``unique_per_user=True`` counts each path
    at most once per user (``n_occurrences == n_users``).

    ``sep`` must not occur in step values, or distinct paths collide
    into one string (e.g. ["a>b","c"] vs ["a","b>c"] under the default
    ``">"``); pass ``"\\x1f"`` (the unit separator) for arbitrary step
    taxonomies."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    seq = user_step_sequences(df, user_col, ts_col, step_col, id_col, max_len)
    grams: Column = F.when(
        F.size("steps") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("steps") - n),
            lambda i: F.array_join(F.slice(F.col("steps"), i + 1, n), sep),
        ),
    ).otherwise(F.array().cast("array<string>"))
    if unique_per_user:
        grams = F.array_distinct(grams)
    # explode_outer + null-filter, not plain explode: Catalyst's
    # InferFiltersFromGenerate would otherwise push a size(grams) > 0
    # filter that re-builds the whole n-gram array per row (the tf_idf
    # hazard); gram elements are never NULL so the filter restores inner
    # semantics exactly
    ex = (
        seq.select(F.col(user_col).alias("__u"), F.explode_outer(grams).alias("path"))
        .filter(F.col("path").isNotNull())
    )
    agg = ex.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("__u").alias("n_users"),
    )
    return agg.orderBy(F.col("n_occurrences").desc(), F.col("path").asc()).limit(k)


def next_step_distribution(
    df: DataFrame,
    from_step: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Where users go AFTER ``from_step``: ``(next_step, n, frac)`` over
    every adjacent transition out of ``from_step`` (the Markov row a
    sankey/flow view plots).

    A direct filtered aggregation — the ``from_step`` filter applies
    BEFORE the count, so the shuffle carries only matching transitions
    and no global sort or top-k ever exists in the plan; the total for
    ``frac`` is a window over the aggregated (≤ distinct next steps)
    frame, never a second pass over the data."""
    from pyspark.sql import Window

    seq = user_step_sequences(df, user_col, ts_col, step_col, id_col)
    bigrams = F.when(
        F.size("steps") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("steps") - 2),
            lambda i: F.struct(
                F.element_at(F.col("steps"), i + 1).alias("cur"),
                F.element_at(F.col("steps"), i + 2).alias("nxt"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<cur:string,nxt:string>>"))
    ex = (
        seq.select(F.explode_outer(bigrams).alias("bg"))
        .filter(F.col("bg").isNotNull() & (F.col("bg.cur") == from_step))
    )
    agg = ex.groupBy(F.col("bg.nxt").alias("next_step")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        agg.withColumn("__tot", F.sum("n").over(w_all))
        .select(
            "next_step", "n",
            F.round(F.col("n") / F.col("__tot"), round_dp).alias("frac"),
        )
        .orderBy(F.col("n").desc(), F.col("next_step").asc())
    )

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

_US = "\x1f"  # unit separator — unambiguous path join for splitting back


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
    ev = df.select(
        F.col(f"`{user_col}`").alias("__u"),
        F.col(f"`{step_col}`").cast("string").alias("__s"),
        *order,
    ).filter(
        F.col("__u").isNotNull()
        & F.col("__s").isNotNull()
        & F.col("__t").isNotNull()
    )
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
    at most once per user (``n_occurrences == n_users``)."""
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
    sankey/flow view plots). Derived from the same bigram explode."""
    # unit-separator join so step values containing spaces or '>' split
    # back unambiguously
    pairs = common_paths(
        df, n=2, k=2**31 - 1, user_col=user_col, ts_col=ts_col,
        step_col=step_col, id_col=id_col, sep=_US,
    )
    out = (
        pairs.withColumn("__parts", F.split("path", _US))
        .filter(F.col("__parts")[0] == from_step)
        .select(
            F.col("__parts")[1].alias("next_step"),
            F.col("n_occurrences").alias("n"),
        )
    )
    total = out.agg(F.sum("n").alias("__tot"))
    return (
        out.crossJoin(F.broadcast(total))
        .select(
            "next_step", "n", F.round(F.col("n") / F.col("__tot"), round_dp).alias("frac")
        )
        .orderBy(F.col("n").desc(), F.col("next_step").asc())
    )

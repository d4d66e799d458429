"""Within-group item co-occurrence (market-basket pair counts), built
scale-first.

The naive formulation — self-join the (group, item) table on the group
key — explodes quadratically on hot groups (a user who touched 10k
distinct items contributes 50M pairs). This module bounds the blow-up
BEFORE any pair is materialized:

- distinct (group, item) first (one shuffle, map-side combined), so
  repeat interactions never multiply pairs;
- a per-group cap applied via ``row_number`` over the item order (NOT
  ``collect_set`` then truncate — the window bounds executor memory
  even when one group holds millions of distinct items); the cap keeps
  the first ``max_items_per_group`` items lexicographically, a
  deterministic rule the SQL oracle reproduces exactly;
- pairs generated per group from the capped sorted array with an
  index-comprehension transform (i < j), ≤ cap²/2 structs per group,
  all map-side;
- one final hash aggregation on the pair key with a ``min_count``
  support floor.

Scale shape: three keyed shuffles — distinct on (group, item), the cap
window on group (a DIFFERENT key, so this exchange is not elidable;
the collect_list groupBy after it does reuse the window's
partitioning), and the pair agg on (item_a, item_b) — plus a bounded
explode. No crossJoin, no self-join, no per-row Python. The
memory-bounded cap is worth its extra exchange: the one-shuffle
alternative (collect_set then truncate) materializes a hot group's
full distinct-item set on one executor before capping.

Reference scope: the reference engine (src/lib.rs) has no join or
array machinery; beyond-reference surface for affinity analysis over
the events store (which event types co-occur per user) and token/tag
co-occurrence in corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 2,
    max_items_per_group: int = 64,
) -> DataFrame:
    """Unordered item pairs that co-occur within a group, with the number
    of groups containing both: ``(item_a, item_b, n_groups)`` where
    ``item_a < item_b``. Null groups/items are dropped; a group's item
    set is capped at the lexicographically-first ``max_items_per_group``
    distinct items (deterministic — document the cap when reporting
    support counts over long-tailed groups)."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if not 2 <= max_items_per_group <= 256:
        raise ValueError(
            f"max_items_per_group must be in [2, 256], got {max_items_per_group}"
        )
    rn = "__cooc_rn"
    di = (
        df.select(F.col(group_col).alias("__cooc_g"), F.col(item_col).alias("__cooc_i"))
        .filter(F.col("__cooc_g").isNotNull() & F.col("__cooc_i").isNotNull())
        .distinct()
    )
    capped = (
        di.withColumn(
            rn,
            F.row_number().over(
                Window.partitionBy("__cooc_g").orderBy("__cooc_i")
            ),
        )
        .filter(F.col(rn) <= max_items_per_group)
        .drop(rn)
    )
    sets = capped.groupBy("__cooc_g").agg(
        F.array_sort(F.collect_list("__cooc_i")).alias("__items")
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(__items, (x, i) -> "
                "transform(slice(__items, i + 2, size(__items)), "
                "y -> struct(x AS item_a, y AS item_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .filter(F.col("n_groups") >= min_count)
    )

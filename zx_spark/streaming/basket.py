"""Streaming within-group co-occurrence — the operators/basket.py twin
as a stateful operator: "which event types co-occur per user", updated
continuously.

State per group is the bounded distinct-item set (≤
``max_items_per_group`` strings), NEVER the stream. Each batch emits
only the NEW pairs formed by items the group has not seen before —
every unordered pair is emitted at most once per group, so aggregating
the sink (count rows per (item_a, item_b)) yields exactly the batch
operator's support counts.

Parity contract (pinned in tests): the drained aggregate equals
``cooccurrence_pairs`` whenever each group's distinct items fit the
cap. Past the cap the two diverge by construction — batch keeps the
lexicographically-first items, the stream keeps the first ARRIVED
(append mode cannot retract already-emitted pairs to honor a late
smaller item) — the same documented-not-hidden tradeoff as the other
twins' watermark carve-outs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_cooccurrence(
    stream: DataFrame,
    group_col: str,
    item_col: str,
    max_items_per_group: int = 64,
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Emit ``(group, item_a, item_b)`` once per unordered pair per
    group, the batch over which a consumer (or the drain tests) counts
    support. Null groups/items are dropped — the batch contract. State
    per group: the sorted distinct-item list, capped at
    ``max_items_per_group`` by arrival order."""
    if not 2 <= max_items_per_group <= 256:
        raise ValueError(
            f"max_items_per_group must be in [2, 256], got {max_items_per_group}"
        )
    if group_col in ("item_a", "item_b"):
        # the output dict would silently overwrite the group column with
        # pair values (duplicate key) — same guard family as
        # resolve_entities' clash error
        raise ValueError(
            f"group_col {group_col!r} collides with the reserved output "
            "columns item_a/item_b — alias it first"
        )
    cap = max_items_per_group
    wm = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    cols = [
        F.col(f"`{group_col}`").cast("string").alias("__g"),
        F.col(f"`{item_col}`").cast("string").alias("__i"),
    ]
    if watermark is not None:
        # keep the watermarked column in the stateful operator's input so
        # the late-event filter actually applies (sessions.py rule)
        cols.append(F.col(f"`{ts_col}`"))
    src = wm.select(*cols).filter(
        F.col("__g").isNotNull() & F.col("__i").isNotNull()
    )

    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("item_a", T.StringType()),
            T.StructField("item_b", T.StringType()),
        ]
    )
    state_schema = "items array<string>"

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        items: set[str] = set(state.get[0]) if state.exists else set()
        n_before = len(items)
        new_pairs: list[tuple[str, str]] = []
        for pdf in pdfs:
            for v in pdf["__i"]:
                if v in items or len(items) >= cap:
                    continue
                new_pairs.extend(
                    (v, j) if v < j else (j, v) for j in items
                )
                items.add(v)
        if len(items) != n_before:
            state.update((sorted(items),))
        if not new_pairs:
            return
        g = str(key[0]) if key[0] is not None else None
        yield pd.DataFrame(
            {
                group_col: [g] * len(new_pairs),
                "item_a": [a for a, _ in new_pairs],
                "item_b": [b for _, b in new_pairs],
            }
        )

    return src.groupBy("__g").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Streaming per-group heavy hitters — the Space-Saving sketch
(Metwally et al.) as a stateful operator: "top pages per host", "top
error codes per service", continuously.

State per group is the m-counter sketch (value → (count, overcount)),
NEVER the stream: the classic guarantee holds — any value with true
frequency > N/m is in the sketch, and ``count - overcount`` is an exact
lower bound (``overcount`` 0 means the count is exact; when the group's
distinct values fit in m the sketch IS exact counting). Each batch
folds its group's values through the sketch and emits the current
top-k with both numbers, append-mode — a consumer keeps the latest
emit per (group, rank).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _space_saving(counts: dict, overs: dict, values, m: int) -> None:
    for v in values:
        if v in counts:
            counts[v] += 1
        elif len(counts) < m:
            counts[v] = 1
            overs[v] = 0
        else:
            evict = min(counts, key=lambda k: (counts[k], str(k)))
            c = counts.pop(evict)
            overs.pop(evict)
            counts[v] = c + 1
            overs[v] = c  # may have over-counted by up to c


def streaming_top_values(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 10,
    m: int = 256,
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Emit each group's current top-``k`` values after every batch that
    changes its sketch: ``(group, value, count, overcount, rank)``.
    ``count - overcount`` is a guaranteed lower bound on the true
    frequency; rank ties break on the value string. ``m >= k`` bounds
    state; with ``m`` >= the group's distinct values the counts are
    EXACT (pinned in tests)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if m < k:
        raise ValueError(f"m must be >= k, got m={m}, k={k}")
    wm = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    # keep the watermarked column in the stateful operator's input so
    # the late-event filter actually applies (sessions.py rule)
    cols = [
        F.col(f"`{group_col}`").cast("string").alias("__g"),
        F.col(f"`{value_col}`").cast("string").alias("__v"),
    ]
    if watermark is not None:
        cols.append(F.col(f"`{ts_col}`"))
    src = wm.select(*cols).filter(F.col("__v").isNotNull())

    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("overcount", T.LongType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    state_schema = "vals array<string>, counts array<long>, overs array<long>"

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, cnts, ovs = state.get
            counts = dict(zip(vals, (int(c) for c in cnts)))
            overs = dict(zip(vals, (int(o) for o in ovs)))
        else:
            counts, overs = {}, {}
        n_new = 0
        for pdf in pdfs:
            vs = list(pdf["__v"])
            n_new += len(vs)
            _space_saving(counts, overs, vs, m)
        if n_new == 0:
            return
        items = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        state.update(
            (
                [v for v, _ in items],
                [c for _, c in items],
                [overs[v] for v, _ in items],
            )
        )
        top = items[:k]
        yield pd.DataFrame(
            {
                # a null group stays null, not the string 'None'
                group_col: [
                    str(key[0]) if key[0] is not None else None
                ] * len(top),
                "value": [v for v, _ in top],
                "count": [c for _, c in top],
                "overcount": [overs[v] for v, _ in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return src.groupBy("__g").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

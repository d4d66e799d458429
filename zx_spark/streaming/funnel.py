"""Streaming funnel — live conversion tracking as a CUSTOM STATEFUL
operator (``applyInPandasWithState``), the incremental twin of
``operators.funnel.funnel_steps``.

State per user is O(k): the k completion timestamps (plus k anchors in
horizon mode) — never the events. Each micro-batch folds its per-user
events in event-time order through exactly the batch operator's
recurrence (earliest-completion greedy without ``within_s``; the
max-anchor re-anchoring DP with it), and emits the user's row ONLY
when the furthest stage ADVANCES (state still persists silent
re-anchors) — append-mode progress records a dashboard consumes as
"latest per user"; sink volume ∝ stage advances, never raw events.

Late-data contract (same as streaming/sessions.py): events are folded
in event-time order WITHIN a batch; an event arriving in a later batch
than its timestamp warranted cannot retro-enable a completion an
earlier fold already passed over. Under cross-batch event-time order
(or a watermark-sized reorder buffer upstream) the final
``steps_completed`` equals the batch operator's for every user — pinned
in tests; without a horizon the emitted ``step_ts`` matches too. In
horizon mode a silent re-anchor after the last advance updates STATE
but emits nothing, so the last emitted ``step_ts`` is the
advance-time lineage while the batch operator reports the final
re-anchored one — same furthest stage, possibly different witness
times. steps_completed is monotone per user by construction, so a
consumer keeping the latest emit never regresses."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _fold(
    times: list,
    anchors: list,
    events,  # iterable of (ts, step_idx), pre-sorted
    k: int,
    within_s: float | None,
) -> bool:
    """Advance the slot state through ``events``; returns True if any
    slot changed. Mirrors operators.funnel.funnel_steps exactly —
    parity is pinned by tests against the JVM fold."""
    changed = False
    for t, i in events:
        if within_s is None:
            if times[i] is not None:
                continue
            if i > 0 and (times[i - 1] is None or not t > times[i - 1]):
                continue
            times[i] = t
            changed = True
        else:
            if i == 0:
                anchors[0] = times[0] = t
                changed = True
                continue
            if anchors[i - 1] is None:
                continue
            if not (t > times[i - 1] and t <= anchors[i - 1] + within_s):
                continue
            if anchors[i] is None or anchors[i - 1] > anchors[i]:
                anchors[i] = anchors[i - 1]
                times[i] = t
                changed = True
    return changed


def _prep_stream(
    stream: DataFrame,
    keep_cols: list,
    ts_col: str,
    watermark: str | None,
):
    """Watermark + projection shared by the funnel-family operators.
    The WATERMARKED column itself must survive into the stateful
    operator's input or Spark builds no late-event filter (the
    streaming/sessions.py rule)."""
    wm = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    cols = list(keep_cols)
    if watermark is not None:
        cols.append(F.col(f"`{ts_col}`"))
    return wm.select(*cols)


def streaming_funnel(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    within_s: float | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Emit ``(user, steps_completed, step_ts)`` whenever a user's
    furthest funnel stage advances (``step_ts`` holds the completed
    steps' times — length == steps_completed). Write append-mode; drain
    availableNow for backfills (batch parity pinned in tests).

    ``watermark`` needs a TIMESTAMP ``ts_col``; pass ``None`` for
    numeric-ts streams or when the upstream already set one (state here
    is O(k) per user under NoTimeout either way — the watermark only
    gates Spark's late-event drop, not this operator's memory)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    if within_s is not None and within_s <= 0:
        raise ValueError(f"within_s must be > 0, got {within_s}")
    k = len(steps)
    idx = {s: i for i, s in enumerate(steps)}
    src = _prep_stream(
        stream,
        [
            F.col(f"`{user_col}`").alias("__u"),
            F.col(f"`{ts_col}`").cast("double").alias("__t"),
            F.col(f"`{step_col}`").alias("__s"),
        ],
        ts_col,
        watermark,
    ).filter(F.col("__s").isin(list(steps)) & F.col("__t").isNotNull())

    out_schema = T.StructType(
        [
            T.StructField(user_col, T.StringType()),
            T.StructField("steps_completed", T.IntegerType()),
            T.StructField("step_ts", T.ArrayType(T.DoubleType())),
        ]
    )
    state_schema = "times array<double>, anchors array<double>"

    def _pad(xs: list) -> list:
        return list(xs) + [None] * (k - len(xs))

    def _prefix(xs: list) -> list:
        out = []
        for x in xs:
            if x is None:
                break
            out.append(x)
        return out

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # state/output arrays carry NO nulls (Arrow's state codec cannot
        # round-trip null elements): slots fill as a prefix, so the
        # prefix IS the state — padded back to k slots for the fold
        if state.exists:
            st_times, st_anchors = state.get
            done_before = len(st_times)
            times, anchors = _pad(st_times), _pad(st_anchors)
        else:
            done_before = 0
            times, anchors = [None] * k, [None] * k
        evs = []
        for pdf in pdfs:
            evs.extend(
                (float(t), idx[s]) for t, s in zip(pdf["__t"], pdf["__s"])
            )
        evs.sort()
        if _fold(times, anchors, evs, k, within_s):
            tp = _prefix(times)
            # horizon mode: anchors' fill pattern mirrors times'
            state.update((tp, _prefix(anchors)))
            if len(tp) <= done_before:
                return  # state moved (re-anchor) but no stage advance
            yield pd.DataFrame(
                {
                    # a null key stays null (batch-twin parity), not 'None'
                    user_col: [str(key[0]) if key[0] is not None else None],
                    "steps_completed": [len(tp)],
                    "step_ts": [tp],
                }
            )

    return src.groupBy("__u").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_conversion_counts(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Live repeat-conversion counter — the streaming twin of
    ``operators.funnel.conversion_counts``: per micro-batch the k-slot
    fold runs with reset-on-completion, and the user's row
    ``(user, n_conversions, last_conversion_ts)`` is emitted whenever
    the count ADVANCES. State is the open journey's slot prefix plus
    two scalars. Same cross-batch event-time-order contract as
    ``streaming_funnel``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    k = len(steps)
    idx = {s: i for i, s in enumerate(steps)}
    src = _prep_stream(
        stream,
        [
            F.col(f"`{user_col}`").alias("__u"),
            F.col(f"`{ts_col}`").cast("double").alias("__t"),
            F.col(f"`{step_col}`").alias("__s"),
        ],
        ts_col,
        watermark,
    ).filter(F.col("__s").isin(list(steps)) & F.col("__t").isNotNull())
    out_schema = T.StructType(
        [
            T.StructField(user_col, T.StringType()),
            T.StructField("n_conversions", T.LongType()),
            T.StructField("last_conversion_ts", T.DoubleType()),
        ]
    )
    state_schema = "slots array<double>, n long, last double"

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st_slots, n, last = state.get
            slots = list(st_slots) + [None] * (k - len(st_slots))
            n = int(n)
            last = float(last) if last is not None else None
        else:
            slots, n, last = [None] * k, 0, None
        n0 = n
        evs = []
        for pdf in pdfs:
            evs.extend((float(t), idx[s]) for t, s in zip(pdf["__t"], pdf["__s"]))
        evs.sort()
        changed = False
        # the slot recurrence mirrors _fold's no-horizon branch plus the
        # reset-on-completion — keep the four sites (operators/funnel.py
        # fold, its _py twin, _fold above, this loop) in lockstep
        for t, i in evs:
            if slots[i] is not None:
                continue
            if i > 0 and (slots[i - 1] is None or not t > slots[i - 1]):
                continue
            slots[i] = t
            changed = True
            if slots[k - 1] is not None:
                n += 1
                last = slots[k - 1]
                slots = [None] * k
        if not changed:
            return  # nothing folded — skip the state-store write
        prefix = []
        for x in slots:
            if x is None:
                break
            prefix.append(x)
        state.update((prefix, n, last))
        if n > n0:
            yield pd.DataFrame(
                {
                    user_col: [str(key[0]) if key[0] is not None else None],
                    "n_conversions": [n],
                    "last_conversion_ts": [last],
                }
            )

    return src.groupBy("__u").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

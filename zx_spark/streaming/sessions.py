"""Streaming session windows — a CUSTOM STATEFUL operator via
``applyInPandasWithState``.

The batch engine's session windows (operators/windows.py session mode:
a new window opens when the gap since the previous event in the key
exceeds ``gap_s``) re-expressed incrementally: per key group we hold the
one OPEN session in the state store, close it either when a later event
arrives past the gap or when the event-time watermark passes
``last_ts + gap`` (EventTimeTimeout), and emit closed sessions
append-mode.

Scale notes (the reason this shape is right at 100 TB/day of events):

- state per key is O(1) — five scalars, NOT the events of the session;
  a billion-key stream holds a billion small state rows, RocksDB-backed.
- arriving micro-batches are processed as Arrow-batched pandas per key
  (vectorized sort + cumulative gap scan), so per-event Python cost is
  amortized across the batch.
- the watermark bounds state lifetime: a key that goes quiet is flushed
  by timeout and its state removed — no unbounded growth.
- emitted rows are final (append mode): downstream sinks never see
  retractions.

Known semantics vs batch: events that arrive AFTER the watermark already
closed their session are dropped by Spark before the function runs (the
standard late-data contract); the batch operator, running over complete
data, has no such cutoff. Within the watermark, state updates are kept
MONOTONE (window_start only shrinks, last_ts only grows), so disordered
micro-batches can't split an open session; the residual divergence is the
opposite direction — a late event landing inside what was (on event time)
a > gap silence MERGES the neighboring sessions here, where the batch
operator, seeing the full order, would keep them split. Exact parity
under arbitrary disorder would require buffering per-key events until the
watermark passes them — O(events) state instead of O(1).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from zx_spark.model import NIL

_STATE_SCHEMA = (
    "window_start double, last_ts double, sum_value double, "
    "n_rows long, n_values long"
)


def _out_schema(key_cols: list[str]) -> T.StructType:
    fields = [T.StructField(k, T.StringType()) for k in key_cols]
    fields += [
        T.StructField("window_start", T.DoubleType()),
        T.StructField("window_end", T.DoubleType()),
        T.StructField("sum__value", T.DoubleType()),
        T.StructField("count__value", T.DoubleType()),
    ]
    return T.StructType(fields)


def streaming_session_agg(
    stream: DataFrame,
    group_by: list[str],
    gap_s: float,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Incremental session windows: SUM + COUNT of ``value_col`` per
    (group, session), sessions split on ``gap_s``-second silences.

    Output matches the batch session-window result row shape
    (``g_<key>``, window_start/end as epoch seconds of the first/last
    event, ``sum__value``, ``count__value``) for every session that has
    CLOSED under the watermark. Run with an ``availableNow`` drain plus a
    watermark-advancing tail batch to get batch parity in tests."""
    from zx_spark.compiler import group_alias

    keys = [group_alias(c) for c in group_by]
    df = stream.withWatermark(ts_col, watermark)
    for c, a in zip(group_by, keys):
        df = df.withColumn(a, F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(NIL)))
    # Keep the watermarked timestamp column itself in the frame —
    # EventTimeTimeout requires the event-time attribute to survive into
    # the stateful operator's input.
    df = df.select(
        *keys,
        F.col(ts_col),
        F.col(ts_col).cast("double").alias("__ts"),
        F.col(value_col).cast("double").alias("__v"),
    )
    out_schema = _out_schema(keys)
    gap = float(gap_s)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def emit(rows: list[tuple[float, float, float, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                [
                    dict(
                        **{k: key[i] for i, k in enumerate(keys)},
                        window_start=ws,
                        window_end=we,
                        sum__value=sv,
                        count__value=float(nv),
                    )
                    for (ws, we, sv, _nr, nv) in rows
                ],
                columns=[*keys, "window_start", "window_end", "sum__value", "count__value"],
            )

        if state.hasTimedOut:
            ws, last, sv, nr, nv = state.get
            state.remove()
            yield emit([(ws, last, sv, nr, nv)])
            return

        parts = list(pdfs)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values(
            "__ts", kind="mergesort"
        )
        ts = pdf["__ts"].to_numpy()
        vals = pdf["__v"]
        closed: list[tuple[float, float, float, int, int]] = []

        if state.exists:
            ws, last, sv, nr, nv = state.get
        else:
            ws = last = None  # type: ignore[assignment]
            sv, nr, nv = 0.0, 0, 0

        # Vectorized gap scan: session boundaries inside the batch.
        import numpy as np

        n = len(ts)
        brk = np.zeros(n, dtype=bool)
        if n:
            brk[0] = last is not None and (ts[0] - last) > gap
            if n > 1:
                brk[1:] = (ts[1:] - ts[:-1]) > gap
        seg = np.cumsum(brk)
        # segment 0 is empty when the batch's first row already breaks from
        # the open session (brk[0]) — iterate only ids actually present
        for s_id in np.unique(seg):
            m = seg == s_id
            seg_ts = ts[m]
            seg_sum = float(vals[m].sum(skipna=True))
            seg_nv = int(vals[m].notna().sum())
            seg_nr = int(m.sum())
            if s_id == 0 and last is not None and not brk[0]:
                # Continues the open session. State must stay MONOTONE
                # under intra-watermark disorder: a late-but-allowed batch
                # can be entirely OLDER than the stored bounds, so take
                # max/min rather than overwrite — otherwise `last`
                # regresses and the next on-time event sees a spurious gap
                # break, closing a session whose window_end predates
                # events already summed into it.
                sv, nr, nv = sv + seg_sum, nr + seg_nr, nv + seg_nv
                ws = min(ws, float(seg_ts[0]))
                last = max(last, float(seg_ts[-1]))
            else:
                if last is not None:
                    closed.append((ws, last, sv, nr, nv))
                ws, last = float(seg_ts[0]), float(seg_ts[-1])
                sv, nr, nv = seg_sum, seg_nr, seg_nv

        if last is not None:
            state.update((ws, last, sv, nr, nv))
            # flush the open session once event time passes last_ts + gap
            state.setTimeoutTimestamp(int((last + gap) * 1000))
        if closed:  # skip empty frames (pandas concat FutureWarning + waste)
            yield emit(closed)

    return (
        df.groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

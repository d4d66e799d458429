"""Streaming conversion attribution — the incremental twin of
``operators.attribution.attributed_conversions`` as a CUSTOM STATEFUL
operator (``applyInPandasWithState``), next to streaming/funnel.py.

State per user is the IN-WINDOW touch buffer only: ``(tm, id,
channel)`` triples newer than ``newest_seen − window`` (capped at
``max_touches`` newest) — the same "state ∝ in-window touches, never
the history" bound the batch RANGE frame guarantees, enforced here by
pruning after every fold. A conversion is attributed the moment its
micro-batch folds it: the buffer at that point IS the batch operator's
collected window, so the emitted rows carry the identical
``(user, conv_id, conv_ts, channel, touch_ts, conv_tm, touch_tm
[, k, pos])`` columns.

Time domain: the same µs longs as the batch side —
``unix_micros`` for TimestampType, rounded seconds·1e6 otherwise —
so window-boundary decisions are bit-identical to
``attributed_conversions`` (attribution.py module docstring).

Late-data contract (the streaming/funnel.py / sessions.py rule):
events fold in event-time ``(tm, id)`` order WITHIN a batch; a touch
arriving in a later batch than an already-folded conversion cannot
retro-attribute it (the conversion's row was already emitted —
append-mode sinks are immutable), though it does enter the buffer for
FUTURE conversions. Under cross-batch event-time order (or a
watermark-sized reorder buffer upstream) the drained output equals
the batch operator row-for-row — pinned in tests on the driver
events. NULL-id events are dropped at the pre-filter (the stateful
fold orders by (tm, id) tuples, which need real ids; give events
ids). Idle users' buffers are EVICTED once the watermark passes
``newest touch + window`` (EventTimeTimeout + ``state.remove()``, the
sessions.py pattern) — with ``watermark=None`` there is no event-time
clock, so state lives until the user's next batch prunes it
(documented NoTimeout trade-off; pass a watermark on unbounded
user populations).

Reference scope note: the reference engine (src/lib.rs) has no
sequence surface; beyond-reference, completing the streaming-twin
family (funnel, retention, basket, gapfill, sketch, vectors).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from zx_spark.streaming.funnel import _prep_stream


def streaming_attribution(
    stream: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    window_s: float = 86400.0,
    model: str = "last_touch",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_touches: int = 1000,
    watermark: str | None = "10 minutes",
    reorder: bool = False,
) -> DataFrame:
    """Attribute conversions as they stream in; same models and output
    columns as the batch ``attributed_conversions`` (``linear`` /
    ``position`` add ``k``/``pos``; last/first omit them). Write
    append-mode; drain availableNow for backfills — batch parity
    pinned in tests. ``watermark`` needs a TIMESTAMP ``ts_col``; pass
    ``None`` for numeric-ts streams (state stays bounded by the
    window prune either way — the watermark only gates Spark's
    late-event drop).

    ``reorder=True`` (r9, closing the late-data contract's named gap)
    HOLDS each conversion in state until the watermark passes its
    event time, then attributes it against the by-then-complete touch
    buffer — so the drained output equals the batch operator under any
    BOUNDED disorder (every event within the watermark delay), not
    just cross-batch event-time order. The price is the standard
    watermark trade: results trail the stream by the delay, and state
    additionally holds the un-ripened conversions. Requires a
    ``watermark`` (the buffer is watermark-sized by construction);
    held conversions flush via EventTimeTimeout even if their user
    never appears again. In this mode the newest-K state cap is NOT
    applied to the touch buffer (a pending conversion may need a
    touch the cap would drop); state stays bounded by
    window + watermark-delay × event rate."""
    if model not in ("last_touch", "first_touch", "linear", "position"):
        raise ValueError(f"unknown model: {model!r}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if reorder and watermark is None:
        raise ValueError(
            "reorder=True needs a watermark — the reorder buffer ripens "
            "conversions when the event-time watermark passes them"
        )
    window_us = int(round(float(window_s) * 1e6))
    if window_us < 1:
        raise ValueError(f"window_s must be >= 1 microsecond, got {window_s}")
    from zx_spark.operators.attribution import micros_col

    tcol = F.col(f"`{ts_col}`")
    src = _prep_stream(
        stream,
        [
            F.col(f"`{user_col}`").alias("__u"),
            micros_col(stream, ts_col).alias("__tm"),
            tcol.cast("double").alias("__t"),
            F.col(f"`{id_col}`").cast("long").alias("__i"),
            F.col(f"`{type_col}`").alias("__ty"),
        ],
        ts_col,
        watermark,
    ).filter(
        F.col("__u").isNotNull()
        & F.col("__tm").isNotNull()
        & F.col("__i").isNotNull()  # the (tm, id) fold needs real ids
        & (F.col("__ty").isin(list(touch_types)) | (F.col("__ty") == conversion_type))
    )

    per_pair = model in ("linear", "position")
    fields = [
        # the user column keeps the INPUT type — batch parity includes
        # the schema, not just the values
        T.StructField("user", stream.schema[user_col].dataType),
        T.StructField("conv_id", T.LongType()),
        T.StructField("conv_ts", T.DoubleType()),
        T.StructField("channel", T.StringType()),
        T.StructField("touch_ts", T.DoubleType()),
        T.StructField("conv_tm", T.LongType()),
        T.StructField("touch_tm", T.LongType()),
    ]
    if per_pair:
        fields += [
            T.StructField("k", T.IntegerType()),
            T.StructField("pos", T.IntegerType()),
        ]
    out_schema = T.StructType(fields)
    # touch buffer columns (parallel arrays: the Arrow state codec
    # cannot round-trip null elements, and these are all non-null).
    # The reorder mode ADDS its pending-conversion buffer; the extra
    # fields are gated on reorder so a reorder=False query restarted
    # from a pre-r9 checkpoint decodes its old 4-field state unchanged
    # (an unconditional schema growth would crash every existing
    # stream on upgrade — r9 review finding)
    state_schema = (
        "tms array<long>, tids array<long>, chs array<string>, "
        "tts array<double>"
    )
    if reorder:
        state_schema += (
            ", ctms array<long>, cids array<long>, ctss array<double>"
        )
    touch_set = set(touch_types)

    evict = watermark is not None  # EventTimeTimeout needs a watermark

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            got = [list(x) for x in state.get]
            tms, tids, chs, tts = got[:4]
            ctms, cids, ctss = got[4:] if reorder else ([], [], [])
        else:
            tms, tids, chs, tts, ctms, cids, ctss = ([] for _ in range(7))
        if evict and state.hasTimedOut and not ctms:
            # the watermark passed newest-touch + window and nothing is
            # pending: nothing in this buffer can ever attribute again
            state.remove()
            return
        # buffer is kept (tm, id)-sorted across batches (events fold in
        # that order and arrive non-decreasing under the cross-batch
        # contract; a late batch's touches insert via re-sort below)
        evs = []
        for pdf in pdfs:
            evs.extend(
                zip(
                    (int(x) for x in pdf["__tm"]),
                    (int(x) for x in pdf["__i"]),
                    pdf["__ty"],
                    (float(x) for x in pdf["__t"]),
                )
            )
        if not evs and not (reorder and ctms):
            return
        evs.sort(key=lambda e: (e[0], e[1]))
        out: list[tuple] = []
        ukey = key[0]  # raw — the output column keeps the input type

        def attribute(etm: int, eid: int, et: float) -> None:
            # qualifying = strictly before (tm, id), within the
            # window — the buffer slice mirrors the batch RANGE
            # frame + strictly-before filter exactly. In reorder mode
            # the buffer may also hold NEWER touches; the same
            # strictly-before predicate excludes them.
            qual = [
                i
                for i in range(len(tms))
                if (tms[i], tids[i]) < (etm, eid)
                and etm - tms[i] <= window_us
            ]
            if per_pair and len(qual) > max_touches:
                # newest-K cap — the batch rule applies to the
                # linear/position list only (last/first uncapped)
                qual = qual[-max_touches:]
            if qual:
                if model == "last_touch":
                    i = qual[-1]
                    out.append((ukey, eid, et, chs[i], tts[i], etm, tms[i]))
                elif model == "first_touch":
                    i = qual[0]
                    out.append((ukey, eid, et, chs[i], tts[i], etm, tms[i]))
                else:
                    kq = len(qual)
                    for p, i in enumerate(qual):
                        out.append(
                            (ukey, eid, et, chs[i], tts[i], etm, tms[i], kq, p)
                        )

        for etm, eid, ety, et in evs:
            # NOT mutually exclusive: a conversion_type that is ALSO a
            # touch type attributes first (strictly-before excludes the
            # event itself), then enters the buffer as a touch for
            # later conversions — exactly the batch semantics (a
            # repeat-purchase journey attributes each purchase to the
            # preceding one)
            if ety == conversion_type:
                if reorder:
                    # hold until the watermark passes (etm, eid): only
                    # then is the touch buffer complete before it
                    j = len(ctms)
                    while j > 0 and (ctms[j - 1], cids[j - 1]) > (etm, eid):
                        j -= 1
                    ctms.insert(j, etm)
                    cids.insert(j, eid)
                    ctss.insert(j, et)
                else:
                    attribute(etm, eid, et)
            if ety in touch_set:
                # insertion keeping (tm, id) order: a late in-batch
                # touch older than buffered ones lands in place
                j = len(tms)
                while j > 0 and (tms[j - 1], tids[j - 1]) > (etm, eid):
                    j -= 1
                tms.insert(j, etm)
                tids.insert(j, eid)
                chs.insert(j, ety)
                tts.insert(j, et)
        if reorder:
            # ripen: a conversion is safe to attribute once the
            # watermark strictly passes its event time (rows at the
            # watermark can still arrive, so ctm == wm is NOT ripe —
            # a same-µs lower-id touch could still show up)
            wm_us = state.getCurrentWatermarkMs() * 1000
            ripe = [j for j in range(len(ctms)) if ctms[j] < wm_us]
            for j in ripe:
                attribute(ctms[j], cids[j], ctss[j])
            if ripe:
                keep_c = [j for j in range(len(ctms)) if ctms[j] >= wm_us]
                ctms = [ctms[j] for j in keep_c]
                cids = [cids[j] for j in keep_c]
                ctss = [ctss[j] for j in keep_c]
            # prune: future conversions have ctm >= wm (Spark drops
            # older rows at the watermark), so a touch can only still
            # qualify if tm >= min(wm, oldest pending) - window. The
            # newest-seen prune is INVALID here — late touches below
            # newest_seen are the whole point of the mode.
            floor = min([wm_us] + ctms)
            horizon = floor - window_us
            keep = [i for i in range(len(tms)) if tms[i] >= horizon]
            # no newest-K state cap (see docstring): a pending
            # conversion may need a touch the cap would drop
        else:
            # prune: a touch older than newest_seen - window can never
            # qualify again under the cross-batch order contract —
            # state stays ∝ in-window touches. The newest-K cap
            # additionally bounds it for the capped models;
            # first_touch is NOT capped (the batch operator reads the
            # UNCAPPED window array there — capping state would drop
            # the earliest touch it reports)
            horizon = evs[-1][0] - window_us
            keep = [i for i in range(len(tms)) if tms[i] >= horizon]
            if model != "first_touch" and len(keep) > max_touches:
                keep = keep[-max_touches:]
        if keep or ctms:
            new_state = (
                [tms[i] for i in keep],
                [tids[i] for i in keep],
                [chs[i] for i in keep],
                [tts[i] for i in keep],
            )
            if reorder:
                new_state += (ctms, cids, ctss)
            state.update(new_state)
            if evict:
                # wake when the oldest pending conversion ripens, else
                # evict once the watermark passes the newest touch's
                # attribution horizon (ms granularity, rounded up);
                # clamped above the current watermark — Spark rejects
                # a timeout that is already in the past (a very late
                # touch's horizon can be)
                if ctms:
                    target = ctms[0] // 1000 + 1
                elif keep:
                    target = (tms[keep[-1]] + window_us) // 1000 + 1
                else:
                    target = 0
                state.setTimeoutTimestamp(
                    max(target, state.getCurrentWatermarkMs() + 1)
                )
        elif state.exists:
            state.remove()  # emptied buffer: drop the key, not ([],...)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in fields])

    return src.groupBy("__u").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )

"""Streaming gap-fill — DENSE per-group bucket series from a sparse
stream: every bucket from a group's first event onward emits exactly
once when the event-time watermark closes it, and SILENT buckets emit
a fill (zero or locf) instead of vanishing. The live twin of
``operators.gapfill.gapfill`` — the batch operator fills gaps a scan
can see; a dashboard needs the gaps the stream hasn't sent yet, which
only event-time timeouts can produce.

Mechanics (``applyInPandasWithState`` + EventTimeTimeout): per group
the state holds the next bucket to emit, the last REAL value (for
locf), and the pending (bucket → partial sum/count) map for buckets
still open under the watermark — bounded by watermark horizon /
granularity, not by the stream. Arriving batches fold into pending;
buckets strictly below the watermark emit in order, absent ones as
fills; when a group goes silent the armed timeout fires as the
watermark advances and keeps emitting fills — a flatlined series keeps
rendering, which is exactly the point.

Late-data contract: an event later than the watermark allows is
dropped by Spark before this operator runs (standard); within the
watermark, events land in their pending bucket regardless of arrival
order, so closed buckets equal the batch aggregate exactly (pinned in
tests)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from zx_spark.model import NIL

_FILLS = ("zero", "locf")


def streaming_gapfill(
    stream: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    granularity_s: float = 60.0,
    fill: str = "zero",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit ``(keys..., bucket, sum_value, n_events, is_filled)`` for
    EVERY bucket a group's series covers, in bucket order, append-mode
    — real buckets carry the event sum, silent ones the fill (``zero``
    → 0.0; ``locf`` → the last real sum, NULL before the first). The
    watermark needs a TIMESTAMP ``ts_col`` (it drives both bucket
    closure and the silent-bucket timeouts)."""
    if granularity_s <= 0:
        raise ValueError(f"granularity_s must be > 0, got {granularity_s}")
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {_FILLS}, got {fill!r}")
    g = float(granularity_s)
    keys = [f"g_{c}" for c in (group_cols or [])]
    df = stream.withWatermark(ts_col, watermark)
    for c, a in zip(group_cols or [], keys):
        df = df.withColumn(a, F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(NIL)))
    src = df.select(
        *keys,
        F.col(f"`{ts_col}`"),  # the watermarked column itself
        F.col(f"`{ts_col}`").cast("double").alias("__ts"),
        F.col(f"`{value_col}`").cast("double").alias("__v"),
    ).filter(F.col("__ts").isNotNull())

    out_schema = T.StructType(
        [
            *[T.StructField(k, T.StringType()) for k in keys],
            T.StructField("bucket", T.DoubleType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("is_filled", T.BooleanType()),
        ]
    )
    state_schema = (
        "next_bucket long, last_value double, "
        "pend_b array<long>, pend_s array<double>, pend_n array<long>"
    )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            next_b, last_v, pb, ps, pn = state.get
            next_b = int(next_b)
            last_v = float(last_v) if last_v is not None else None
            pending = {
                int(b): (float(s), int(n)) for b, s, n in zip(pb, ps, pn)
            }
        else:
            next_b, last_v, pending = None, None, {}

        for pdf in pdfs:
            for t, v in zip(pdf["__ts"], pdf["__v"]):
                b = int(float(t) // g)
                s, n = pending.get(b, (0.0, 0))
                pending[b] = (s + (float(v) if pd.notna(v) else 0.0), n + 1)
        if next_b is None:
            if not pending:
                return
            next_b = min(pending)

        wm_ms = state.getCurrentWatermarkMs()
        closed_until = int((wm_ms / 1000.0) // g)  # buckets < this are closed
        rows = []
        b = next_b
        while b < closed_until:
            if b in pending:
                s, n = pending.pop(b)
                last_v = s
                rows.append((b * g, s, n, False))
            else:
                fv = 0.0 if fill == "zero" else last_v
                rows.append((b * g, fv, 0, True))
            b += 1
        next_b = b
        state.update(
            (
                next_b,
                last_v,
                sorted(pending),
                [pending[x][0] for x in sorted(pending)],
                [pending[x][1] for x in sorted(pending)],
            )
        )
        # re-arm: fire when the watermark passes the next bucket's end,
        # so a silent group keeps emitting fills
        state.setTimeoutTimestamp(int((next_b + 1) * g * 1000))
        if rows:
            yield pd.DataFrame(
                [
                    dict(
                        **{k: key[i] for i, k in enumerate(keys)},
                        bucket=bb,
                        sum_value=sv,
                        n_events=ne,
                        is_filled=fl,
                    )
                    for bb, sv, ne, fl in rows
                ],
                columns=[*keys, "bucket", "sum_value", "n_events", "is_filled"],
            )

    return src.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

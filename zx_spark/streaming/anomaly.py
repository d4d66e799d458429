"""Streaming anomaly detection — a CUSTOM STATEFUL operator via
``applyInPandasWithState`` (the second arbitrary-state operator next to
``sessions.py``).

The batch verb (``operators.series.flag_anomalies`` over an aligned
windowed aggregate) re-expressed incrementally: per key we accumulate
OPEN bucket sums in state, finalize a bucket once the event-time
watermark passes its end, score it against the trailing window of the
last ``n`` finalized buckets (mean/stddev EXCLUDING the bucket itself,
exactly like the batch verb), emit the flagged row append-mode, and
push it into the trailing history.

Scale shape:

- state per key is O(n + open buckets): the trailing ``n`` finalized
  sums plus the few buckets the watermark hasn't passed — never the
  events; a million-key stream holds small bounded rows, RocksDB-backed.
- arriving micro-batches fold into the open-bucket sums vectorized
  (pandas groupby per Arrow batch); per-event Python cost amortizes.
- the watermark both FINALIZES buckets (correctness: a bucket is scored
  once, with all its intra-watermark data) and bounds state lifetime;
  an ``EventTimeTimeout`` flushes quiet keys' remaining open buckets.

Late data past the watermark is dropped by Spark before the function
runs (the standard contract); the batch verb over complete data has no
cutoff — the availableNow parity test drives both over the same drained
events.
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
    "open_b array<long>, open_s array<double>, "
    "hist_s array<double>"
)


def _out_schema(key_cols: list[str]) -> T.StructType:
    fields = [T.StructField(k, T.StringType()) for k in key_cols]
    fields += [
        T.StructField("bucket", T.DoubleType()),
        T.StructField("sum__value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
    return T.StructType(fields)


def streaming_anomaly_flags(
    stream: DataFrame,
    group_by: list[str],
    bucket_s: float,
    n: int = 20,
    threshold: float = 3.0,
    min_periods: int = 3,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-(key, ``bucket_s`` bucket) SUM of ``value_col``, scored and
    flagged against the key's trailing ``n`` finalized buckets — the
    streaming twin of ``gapfill-less`` batch ``flag_anomalies`` over an
    aligned windowed aggregate (same trailing-window-excluding-current
    z-score, same ``min_periods`` guard). Emits one final row per
    finalized bucket: ``(g_<key>…, bucket, sum__value, zscore,
    is_anomaly)``."""
    from zx_spark.compiler import group_alias

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    keys = [group_alias(c) for c in group_by]
    df = stream.withWatermark(ts_col, watermark)
    for c, a in zip(group_by, keys):
        df = df.withColumn(a, F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(NIL)))
    df = df.select(
        *keys,
        F.col(ts_col),
        F.floor(F.col(ts_col).cast("double") / bucket_s).cast("long").alias("__bn"),
        F.col(value_col).cast("double").alias("__v"),
    )
    out_schema = _out_schema(keys)
    bs = float(bucket_s)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            open_b, open_s, hist_s = state.get
            opens = dict(zip(open_b, open_s))
            hist = list(hist_s)
        else:
            opens, hist = {}, []

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for bn, sv in pdf.groupby("__bn")["__v"].sum(min_count=0).items():
                opens[int(bn)] = opens.get(int(bn), 0.0) + float(sv)

        # finalize buckets the event-time watermark has passed — on a
        # quiet-key TIMEOUT the same criterion applies (the timeout only
        # wakes the key; a bucket the watermark hasn't reached must keep
        # waiting for possible intra-watermark data)
        wm = state.getCurrentWatermarkMs() / 1000.0
        done = sorted(bn for bn in opens if (bn + 1) * bs <= wm)
        rows = []
        for bn in done:
            sv = opens.pop(bn)
            window = hist[-n:]
            z = None
            if len(window) >= 2:
                mu = float(np.mean(window))
                sd = float(np.std(window, ddof=1))
                if sd > 0:
                    z = (sv - mu) / sd
            flag = (
                z is not None
                and abs(z) > threshold
                and len(window) >= min_periods
            )
            rows.append(
                dict(
                    **{k: key[i] for i, k in enumerate(keys)},
                    bucket=bn * bs,
                    sum__value=sv,
                    zscore=z,
                    is_anomaly=bool(flag),
                )
            )
            hist.append(sv)
        hist = hist[-n:]

        if opens or hist:
            ob = sorted(opens)
            state.update(([int(b) for b in ob], [opens[b] for b in ob], hist))
            if opens:
                # wake when the earliest open bucket can finalize
                state.setTimeoutTimestamp(int((min(opens) + 1) * bs * 1000))
        elif state.exists:
            state.remove()
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[*keys, "bucket", "sum__value", "zscore", "is_anomaly"],
            )

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

"""Streaming retention — the live half of ``operators.funnel
.retention_cohorts``: a stateful first-seen tracker emits one
``(user, cohort_bucket, activity_bucket)`` row per NEW (user, bucket)
pair; the cohort grid is then an ordinary streaming (or batch)
aggregation over those emits.

Why split it this way: the only genuinely stateful fact in retention is
each user's FIRST-SEEN bucket and which buckets they were already
counted in — O(1) + O(active buckets) per user. The grid itself
(cohort × offset distinct-user counts) needs no custom state once
emits are deduplicated at the source, so it composes with any
downstream sink or rollup.

State per user: first-seen bucket + the set of already-emitted activity
buckets, capped at ``max_tracked_buckets`` most-recent (a user active
in more distinct buckets than that can re-emit an old pair after it
falls out of the cap — harmless for the grid if the consumer
deduplicates, exact under the cap otherwise). Late-data contract: the
first-seen bucket is first-ARRIVAL at the operator; with cross-batch
event-time order (the same contract as streaming/funnel.py) it equals
the batch min-bucket."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_retention_pairs(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: float = 7 * 86400.0,
    watermark: str | None = "10 minutes",
    max_tracked_buckets: int = 64,
) -> DataFrame:
    """Emit ``(user, cohort_bucket, bucket, offset)`` once per new
    (user, activity-bucket). Aggregate downstream for the grid::

        pairs.groupBy("cohort_bucket", "offset").count()

    matches ``retention_cohorts`` on the same data (pinned in tests)."""
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be > 0, got {bucket_s}")
    if max_tracked_buckets < 1:
        raise ValueError(
            f"max_tracked_buckets must be >= 1, got {max_tracked_buckets}"
        )
    wm = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    # keep the watermarked column in the stateful operator's input so
    # the late-event filter actually applies (sessions.py rule)
    cols = [
        F.col(f"`{user_col}`").alias("__u"),
        F.floor(F.col(f"`{ts_col}`").cast("double") / bucket_s)
        .cast("long")
        .alias("__b"),
    ]
    if watermark is not None:
        cols.append(F.col(f"`{ts_col}`"))
    src = wm.select(*cols).filter(
        F.col("__u").isNotNull() & F.col("__b").isNotNull()
    )

    out_schema = T.StructType(
        [
            T.StructField(user_col, T.StringType()),
            T.StructField("cohort_bucket", T.LongType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
    state_schema = "cohort long, seen array<long>"

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        bs: set[int] = set()
        for pdf in pdfs:
            bs.update(int(b) for b in pdf["__b"])
        if not bs:
            return
        if state.exists:
            cohort, seen_list = state.get
            cohort = int(cohort)
            seen = set(int(x) for x in seen_list)
        else:
            cohort = min(bs)  # first-arrival batch: earliest bucket IN it
            seen = set()
        new = sorted(b for b in bs if b not in seen)
        if not new:
            return
        seen.update(new)
        keep = sorted(seen)[-max_tracked_buckets:]
        state.update((cohort, keep))
        yield pd.DataFrame(
            {
                user_col: [str(key[0])] * len(new),
                "cohort_bucket": [cohort] * len(new),
                "bucket": new,
                "offset": [int(b - cohort) for b in new],
            }
        )

    return src.groupBy("__u").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

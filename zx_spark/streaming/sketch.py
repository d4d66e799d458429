"""Streaming count-min sketch maintenance: fold a stream into a
bounded-memory frequency table that ``cms_estimate_col`` can serve from
at any moment.

The merge property does ALL the work (operators/cms.py): same-geometry
sketches add counter-wise, so each micro-batch is sketched
independently (one map-side-combined agg pass, model-sized collect)
and written under its own epoch directory; the live model is the
counter-wise SUM across epochs — one tiny aggregation over ≤
epochs·d·w counter rows, never over the stream. A crash-replayed
micro-batch OVERWRITES its own epoch directory (same replay
idempotency as rollup_sink / vector_index_sink), so at-least-once
delivery never double-counts.

State is O(d·w) per epoch regardless of stream volume — the
frequency-table analog of the watermark-bounded state the other
streaming twins keep."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zx_spark.operators.cms import cms_build

_SCHEMA = "row int, bkt int, c long, width int, depth int"


def cms_sink(
    stream: DataFrame,
    col: str,
    path: str,
    width: int = 2048,
    depth: int = 4,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Start the maintenance query: per micro-batch, build the batch's
    sketch and write its non-zero counters (plus geometry columns) to
    ``path/epoch=<batch_id>/``. Returns the started StreamingQuery."""

    def _batch(df: DataFrame, epoch: int) -> None:
        m = cms_build(df, col, width=width, depth=depth, weight_col=weight_col)
        rows = [
            (i, j, int(c), width, depth)
            for i, counter_row in enumerate(m["counters"])
            for j, c in enumerate(counter_row)
            if c
        ]
        df.sparkSession.createDataFrame(rows, _SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{path.rstrip('/')}/epoch={int(epoch)}")

    w = stream.writeStream.foreachBatch(_batch)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_cms_model(spark, path: str) -> dict:
    """Merge every epoch's counters into one live model (counter-wise
    sum — exactly ``cms_merge`` over the epoch sketches). Raises on
    mixed geometries."""
    df = spark.read.parquet(path)
    geom = df.select("width", "depth").distinct().collect()
    if len(geom) != 1:
        raise ValueError(
            f"mixed sketch geometries in {path}: "
            f"{sorted((g['width'], g['depth']) for g in geom)}"
        )
    width, depth = geom[0]["width"], geom[0]["depth"]
    counters = [[0] * width for _ in range(depth)]
    for r in (
        df.groupBy("row", "bkt").agg(F.sum("c").alias("c")).collect()
    ):
        counters[r["row"]][r["bkt"]] = r["c"]
    return {
        "width": width,
        "depth": depth,
        "n": sum(counters[0]),
        "counters": counters,
    }

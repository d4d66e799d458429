"""Streaming vector-index maintenance: ingest embeddings continuously
into an IVF (optionally IVF-PQ) store that ``ivf_topk`` / ``ivfpq_topk``
can serve from at any moment.

Beyond-reference (no vector surface in the reference, SURVEY §2.2) —
this is the missing online half of the similarity stack: the coarse
quantizer and PQ codebooks are trained offline (similarity.py); new
vectors then only need ASSIGNMENT (a map-side literal-centers argmin)
and ENCODING (literal-codebook argmin), both pure codegen — so stream
maintenance costs no training, no shuffle, no Python.

Store layout: ``path/epoch=<batch_id>/ivf_cell=<c>/*.parquet``. Cell
stays a partition column, so a probe's cell filter is still Parquet
partition pruning across every epoch; the epoch level gives the same
replay idempotency as rollup_sink (a crash-replayed micro-batch
OVERWRITES its own epoch directory instead of double-appending).
Compaction (storage.compact_store) folds epochs once the store
fragments."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zx_spark.operators.similarity import ivf_assign, pq_encode


def vector_index_sink(
    stream: DataFrame,
    path: str,
    centers: list[list[float]],
    codebooks: list | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
    keep_vectors: bool = True,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Start the maintenance query: per micro-batch, assign each vector
    its IVF cell; with ``codebooks`` also store the m-byte PQ codes
    (``keep_vectors=False`` drops the raw vectors — pure-ADC serving, a
    4·d/m× smaller store; keep them for exact re-rank). Returns the
    started StreamingQuery."""

    def _batch(df: DataFrame, epoch: int) -> None:
        assigned = ivf_assign(df, centers, vec_col, cell_col)
        if codebooks is not None:
            out = pq_encode(
                assigned,
                codebooks,
                vec_col,
                id_col,
                keep_cols=(
                    [cell_col, vec_col] if keep_vectors else [cell_col]
                ),
            )
        else:
            out = assigned
        out.write.mode("overwrite").partitionBy(cell_col).parquet(
            f"{path.rstrip('/')}/epoch={int(epoch)}"
        )

    w = stream.writeStream.foreachBatch(_batch)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_vector_index(
    spark,
    path: str,
    id_col: str = "vec_id",
    dedupe: bool = True,
) -> DataFrame:
    """Read a stream-maintained store. ``dedupe`` keeps each id's
    FIRST-epoch row (an id re-sent in a later batch does not duplicate
    the index — same first-arrival-wins contract as streaming ingest
    dedup; one window shuffle on the id, skip it for append-only id
    streams). The cell column survives as a partition column, so
    downstream ``ivf_topk``-style cell filters still prune."""
    df = spark.read.option("basePath", path).parquet(path)
    if not dedupe:
        return df.drop("epoch")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("epoch").asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "epoch")
    )

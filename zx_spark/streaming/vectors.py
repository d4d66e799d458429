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

from zx_spark.operators.similarity import (
    ivf2_assign,
    ivf_assign,
    ivf_store_append,
    pq_encode,
    with_super_col,
)


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
    super_centers: list[list[float]] | None = None,
    children: list[list[int]] | None = None,
    p_super: int | None = None,
    super_col: str = "ivf_super",
    engine: str = "auto",
):
    """Start the maintenance query: per micro-batch, assign each vector
    its IVF cell; with ``codebooks`` also store the m-byte PQ codes
    (``keep_vectors=False`` drops the raw vectors — pure-ADC serving, a
    4·d/m× smaller store; keep them for exact re-rank). Returns the
    started StreamingQuery.

    With ``super_centers``/``children`` (an ``ivf2_fit_numpy``
    hierarchy) each micro-batch assigns through the TWO-LEVEL quantizer
    — n_super + p_super·avg-child dots per vector instead of n_cells,
    the only affordable shape once n_cells ∝ N — and the store gains a
    ``super_col`` partition level (``epoch/super=<s>/cell=<c>``), so
    ``ivf_topk(..., supers=, children=, super_col=)`` prunes the top
    directory level before the leaf listing. Flat single-level
    assignment (the default) is byte-identical to rounds ≤8."""
    if (super_centers is None) != (children is None):
        # fail BEFORE the query starts — inside foreachBatch this
        # would surface only as an opaque StreamingQueryException
        raise ValueError("super_centers and children must be passed together")

    def _batch(df: DataFrame, epoch: int) -> None:
        if super_centers is not None:
            assigned = with_super_col(
                ivf2_assign(
                    df,
                    centers,
                    super_centers,
                    children,
                    vec_col,
                    cell_col,
                    p_super,
                    engine,
                ),
                children,
                len(centers),
                cell_col,
                super_col,
            )
            part_cols = [super_col, cell_col]
            keep = [super_col, cell_col]
        else:
            assigned = ivf_assign(df, centers, vec_col, cell_col)
            part_cols = [cell_col]
            keep = [cell_col]
        if codebooks is not None:
            out = pq_encode(
                assigned,
                codebooks,
                vec_col,
                id_col,
                keep_cols=(keep + [vec_col] if keep_vectors else keep),
            )
        else:
            out = assigned
        out.write.mode("overwrite").partitionBy(*part_cols).parquet(
            f"{path.rstrip('/')}/epoch={int(epoch)}"
        )

    w = stream.writeStream.foreachBatch(_batch)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def ivf_store_sink(
    stream: DataFrame,
    path: str,
    centers: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    super_centers: list[list[float]] | None = None,
    children: list[list[int]] | None = None,
    p_super: int | None = None,
    super_col: str = "ivf_super",
    engine: str = "auto",
):
    """Stream embeddings straight into a ``write_ivf_store`` layout —
    the one ``ivf_topk_batch_store`` serves via its manifest — so the
    ANN serving store stays live under continuous ingest with no
    epoch-folding step in between (``vector_index_sink`` above keeps
    the epoch layout for PQ stores and replay-exact reads; THIS sink is
    the serving-store path).

    Per micro-batch: two-level (or flat) assignment — map-side
    literal-centers argmin, no training, no Python — then
    ``ivf_store_append``, which pre-shuffles the batch on the layout
    key (one file per touched cell per batch), increments the manifest
    from the batch itself (O(batch), nothing re-reads the store), and
    records the batch id as the manifest's ``ingest_epoch`` high-water
    mark: a crash-replayed micro-batch is SKIPPED, giving effective
    exactly-once on the monotonic foreachBatch ids (the narrow
    crash-between-append-and-manifest at-least-once edge is documented
    on ``ivf_store_append``). Compact with ``ivf_store_compact`` once
    file counts accrete — victims come from the same manifest the sink
    maintains. The target store must already exist (fit the quantizer
    offline, ``write_ivf_store(..., centers=)``); appending under a
    different model fails fast on the manifest fingerprint.

    Batch sizing (measured at 10⁷/39k cells, SCALE.md r14): append
    wall is FILE-CREATION-bound — a uniform batch touches ~90% of
    cells and commits one file per touched cell (~87 s for 35k files)
    regardless of batch rows, so size micro-batches to ≳ a few ×
    n_cells rows (trigger intervals / maxFilesPerTrigger are the
    knobs). For unavoidably tiny high-frequency batches use the
    epoch-layout ``vector_index_sink`` + a periodic fold instead —
    the two sinks are complementary regimes."""
    if (super_centers is None) != (children is None):
        raise ValueError("super_centers and children must be passed together")

    def _batch(df: DataFrame, epoch: int) -> None:
        if super_centers is not None:
            assigned = with_super_col(
                ivf2_assign(
                    df, centers, super_centers, children, vec_col,
                    cell_col, p_super, engine,
                ),
                children, len(centers), cell_col, super_col,
            )
            sc = super_col
        else:
            assigned = ivf_assign(df, centers, vec_col, cell_col)
            sc = None
        ivf_store_append(
            assigned, path, cell_col=cell_col, super_col=sc,
            centers=centers, epoch_id=int(epoch),
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

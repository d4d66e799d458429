"""SemDeDup-style semantic deduplication over embedding columns.

Published technique (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023, arXiv:2303.09540):
cluster the corpus embeddings with k-means, compute pairwise cosine
similarity only WITHIN each cluster, and keep one representative per
duplicate group — the item LEAST similar to its cluster centroid
(dropping redundant cluster cores while preserving edge examples).

Spark shape (scales to 100 TB):

- the coarse quantizer is the deterministic Lloyd fit from
  ``similarity.ivf_build_lloyd`` — every communicated center is rounded
  to 6 decimals, so a numpy twin (``ivf_centers_numpy``) and therefore
  the DuckDB oracle re-derive the centers bit-identically from the raw
  parquet;
- cluster assignment + centroid cosine are pure codegen'd projections
  over broadcast literal centers — no shuffle, no Python;
- candidate pairs come from a self-EQUI-join on the cluster id. The
  cluster bounds the quadratic: pick ``n_cells`` proportional to
  corpus_size / target_cell_size (the paper uses ~50k clusters for 5B
  examples) and the per-cell work stays constant while the join remains
  ONE hash shuffle on the cell key — never a crossJoin. Oversized cells
  can additionally be thinned with ``similarity.rp_lsh_near_pairs``
  within the cell;
- the keep rule is a single pair-loser anti-join, not an iterative
  clustering: x is dropped iff SOME same-cell near-dup y outranks it
  (lower centroid-cosine wins; id breaks ties). This matches the
  released SemDeDup implementation's rule (drop every example that has
  a DIRECT above-threshold neighbor of higher keep priority); for
  transitive-chain clustering compose the pair list with
  ``dedup.dup_components`` instead.

No reference parity — the reference engine (src/lib.rs) has no
embedding operators; this is beyond-reference surface for LLM corpus
curation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zx_spark.operators.similarity import (
    _dot,
    _norm,
    cosine,
    ivf_build,
    ivf_build_lloyd,
)
from zx_spark.util import lit_array
from zx_spark.util import spread as _spread


def centroid_cosine(
    df: DataFrame,
    centers: list[list[float]] | np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    out_col: str = "centroid_cos",
) -> Column | DataFrame:
    """Cosine of every vector to ITS OWN cluster's centroid, rounded to 6
    decimals (the keep-priority key — rounding makes the cross-engine
    ordering exact, same convention as every communicated similarity in
    this package). Centers travel as one flattened array literal and the
    row's center is a ``slice`` at ``cell*dim`` — O(1) expression-tree
    size in k·d, no shuffle."""
    centers = [[float(x) for x in c] for c in np.asarray(centers)]
    dim = len(centers[0])
    flat = lit_array([float(x) for c in centers for x in c])
    norms = lit_array([float(np.sqrt(sum(x * x for x in c))) for c in centers])
    v = F.col(vec_col).cast("array<double>")
    c = F.slice(flat, F.col(cell_col) * dim + 1, dim)
    cn = F.element_at(norms, F.col(cell_col) + 1)
    cos = _dot(v, c) / F.greatest(_norm(v) * cn, F.lit(1e-12))
    return df.withColumn(out_col, F.round(cos, 6))


def _assign_resolved(df: DataFrame, centers, vec_col: str) -> DataFrame:
    """Full-corpus FLAT-argmin assignment for the sampled/dist fit
    branches, engine-resolved like ``ivf2_fit_dist``'s own super pass:
    the Catalyst fold is the oracle-grade path below ARROW_AUTO_CELLS
    (every test/driver scale), the BLAS UDF above it.

    Cost contract (r10 advisor): even the BLAS path is O(n_cells·dim)
    PER ROW — at the ≳10⁸-row scale the dist rung targets, with
    n_cells ∝ N, that is the expensive-but-exact choice. It keeps
    exact-argmin parity with the lloyd/kmeans annotation (every row in
    its true nearest cell). Callers who can accept the two-level
    assignment's super-boundary approximation pass
    ``assign='2level'`` to ``semantic_dedup_fit`` and pay ~√n_cells
    per row instead."""
    from zx_spark.operators.similarity import (
        _resolve_engine,
        ivf_assign,
        ivf_assign_arrow,
    )

    if _resolve_engine("auto", len(centers)) == "arrow":
        return ivf_assign_arrow(df, centers, vec_col)
    return ivf_assign(df, centers, vec_col)


def semantic_dedup_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    iters: int = 5,
    dim: int | None = None,
    method: str = "lloyd",
    sample_n: int = 65536,
    assign: str = "flat",
):
    """Fit the coarse quantizer and annotate every row with its cluster
    and centroid cosine. Returns ``(annotated_df, centers)``.

    ``assign`` — how the sampled/dist models annotate the full corpus:
    ``'flat'`` (default) is the exact argmin over all ``n_cells``
    centers, O(n_cells·dim) per row even on the BLAS path — exact
    parity with the lloyd/kmeans annotation; ``'2level'`` routes
    through the fitted hierarchy (``ivf2_assign``, ~√n_cells per row
    — the serving arithmetic), APPROXIMATE at super boundaries: a row
    whose true nearest cell lives under an unprobed super lands in its
    second-best cell, which can only LOWER within-cell recall, never
    corrupt the keep rule (pairs are still scored with exact cosine).
    At the ≳10⁸-row/n_cells ∝ N scale the dist rung targets, '2level'
    is the honest default trade (r10 advisor). Rejected for
    lloyd/kmeans, which fit no hierarchy.

    ``method='lloyd'`` (default): the deterministic 6-dp-rounded Lloyd
    fit — engine-reproducible (numpy twin / DuckDB oracle), but cluster
    assignment costs O(k·d) per row in fold expressions, which dominates
    at large k. ``method='kmeans'``: Spark ML KMeans — the throughput
    choice for production-scale cell counts (the paper runs ~50k
    clusters), JVM-vectorized, at the cost of oracle reproducibility —
    the same md5-vs-xx64 tradeoff the dedup hashes expose.
    ``method='sampled'`` (r9): the hash-sample fit + skew rebalance
    from ``similarity.ivf2_fit_sampled`` — deterministic like
    ``lloyd`` but fit on ``sample_n`` vectors (driver memory ∝
    max(sample_n, n_cells)·dim — see ivf2_fit_sampled's memory note)
    and with oversized cells SPLIT: the
    within-cell self-join pays cell-size skew QUADRATICALLY (pair
    volume = Σ cell², and the measured size-biased mean cell on a
    clustered corpus was 206 vs the designed 128 — SCALE.md r9), so
    balancing cuts the pair join ~1.6× where it hurts most. May
    return MORE than ``n_cells`` centers (the split); recall at cell
    boundaries has the same SemDeDup caveat either way.
    ``method='dist'`` (r10): the distributed fit from
    ``similarity.ivf2_fit_dist`` — supers driver-side on a
    ``sample_n`` hash-sample, children fit in parallel on executors
    over the FULL corpus; exactly ``n_cells`` centers (apportioned
    over full-corpus super counts). The rung for corpora where even
    the fit sample outgrows the driver (≳10⁸ rows)."""
    if assign not in ("flat", "2level"):
        raise ValueError(f"assign must be 'flat' or '2level', got {assign!r}")
    if assign == "2level" and method not in ("sampled", "dist"):
        raise ValueError(
            f"assign='2level' needs a fitted hierarchy — method "
            f"{method!r} fits none (use 'sampled' or 'dist')"
        )

    def _annotate(centers, sup, ch) -> DataFrame:
        if assign == "2level":
            from zx_spark.operators.similarity import ivf2_assign

            return ivf2_assign(df, centers, sup, ch, vec_col=vec_col)
        return _assign_resolved(df, centers, vec_col)

    if method == "kmeans":
        assigned, centers = ivf_build(df, vec_col=vec_col, n_cells=n_cells)
        centers = [[round(float(x), 6) for x in c] for c in centers]
    elif method == "lloyd":
        assigned, centers = ivf_build_lloyd(
            df, vec_col=vec_col, id_col=id_col, n_cells=n_cells, iters=iters, dim=dim
        )
    elif method == "dist":
        # the r10 third rung: supers driver-side on a hash-sample,
        # children fit in PARALLEL on executors over the FULL corpus
        # (one applyInPandas block per super) — for corpora where even
        # the fit sample outgrows the driver. n_cells passed EXACTLY
        # (apportioned over full-corpus super counts), matching the
        # lloyd/sampled granularity contract. No sample rebalance: the
        # full-count allocation balances at the super level, and the
        # children never see less than the whole corpus.
        from zx_spark.operators.similarity import ivf2_fit_dist

        fitted, _sup, _ch = ivf2_fit_dist(
            df,
            vec_col=vec_col,
            id_col=id_col,
            super_sample_n=sample_n,
            iters=iters,
            n_cells=n_cells,
        )
        centers = [[float(x) for x in c] for c in np.asarray(fitted)]
        assigned = _annotate(centers, _sup, _ch)
    elif method == "sampled":
        from zx_spark.operators.similarity import ivf2_fit_sampled, ivf_assign

        # pass n_cells EXACTLY (r9 review: the n_cells -> target_cell
        # -> n_cells floor-division round-trip plus the max(8, .) floor
        # silently changed the granularity vs the lloyd path); the
        # pro-rated rebalance bound inside uses ceil(sample/n_cells).
        # No n_total: ivf2_fit_sampled only reads it to DERIVE n_cells,
        # so counting the corpus here was a wasted full scan per fit —
        # significant at the 10^9-row scale this mode targets (r9
        # advisor finding).
        fitted, _sup, _ch, _sid = ivf2_fit_sampled(
            df,
            vec_col=vec_col,
            id_col=id_col,
            sample_n=sample_n,
            rebalance=True,
            iters=iters,
            n_cells=n_cells,
        )
        centers = [[float(x) for x in c] for c in np.asarray(fitted)]
        assigned = _annotate(centers, _sup, _ch)
    else:
        raise ValueError(
            f"method must be 'lloyd', 'kmeans', 'sampled' or 'dist', "
            f"got {method!r}"
        )
    return centroid_cosine(assigned, centers, vec_col), centers


def semantic_pairs(
    annotated: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
    ccos_col: str = "centroid_cos",
) -> DataFrame:
    """Within-cluster near-duplicate pairs: self-equi-join on the cluster
    id (one hash shuffle — the cluster key bounds the quadratic), exact
    cosine on the joined pair, keep pairs with 6-dp-rounded cosine ≥
    threshold. Output: (id_a, id_b, cosine, ccos_a, ccos_b) with
    id_a < id_b."""
    side = _spread(annotated).select(
        F.col(id_col),
        F.col(cell_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.col(ccos_col),
    )
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col(f"a.{cell_col}") == F.col(f"b.{cell_col}"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6).alias("cosine"),
            F.col(f"a.{ccos_col}").alias("ccos_a"),
            F.col(f"b.{ccos_col}").alias("ccos_b"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dropped_ids(pairs: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """The drop set under the SemDeDup keep rule: every pair's LOSER — the
    side with the HIGHER (centroid_cos, id) — is dropped; a row survives
    iff it loses no pair. Lower centroid-cosine wins (the paper keeps the
    example least similar to the centroid); ids break exact 6-dp ties
    deterministically."""
    a_wins = (F.col("ccos_a") < F.col("ccos_b")) | (
        (F.col("ccos_a") == F.col("ccos_b")) & (F.col("id_a") < F.col("id_b"))
    )
    loser = F.when(a_wins, F.col("id_b")).otherwise(F.col("id_a"))
    return pairs.select(loser.alias(id_col)).distinct()


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    iters: int = 5,
    threshold: float = 0.95,
    dim: int | None = None,
    method: str = "lloyd",
    sample_n: int = 65536,
    assign: str = "flat",
) -> DataFrame:
    """One-call SemDeDup: fit → within-cluster pairs → drop losers.
    Returns the kept rows of ``df`` (original columns). The drop set is
    the duplicate mass — ∝ the corpus in the worst case — so the
    anti-join broadcasts only when a runtime count verifies it fits
    (``anti_join_ids``); past the threshold it pins sort-merge.
    ``sample_n`` sizes the fit sample for ``method='sampled'`` AND the
    driver-side super sample for ``method='dist'`` (ignored by
    lloyd/kmeans); ``assign`` picks the full-corpus annotation path (see
    ``semantic_dedup_fit``)."""
    from zx_spark.operators.dedup import anti_join_ids

    annotated, _ = semantic_dedup_fit(
        df, vec_col=vec_col, id_col=id_col, n_cells=n_cells, iters=iters, dim=dim,
        method=method, sample_n=sample_n, assign=assign,
    )
    pairs = semantic_pairs(
        annotated, threshold=threshold, vec_col=vec_col, id_col=id_col
    )
    dropped = semantic_dropped_ids(pairs, id_col=id_col)
    return anti_join_ids(df, dropped, id_col)

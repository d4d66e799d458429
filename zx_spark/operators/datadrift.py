"""Batch distribution drift between two corpus/table versions — PSI
(population stability index), the standard train/serve-skew and
data-version QA metric. Complements diffs.py (row-level what changed)
and streaming/drift.py (per-micro-batch ingest guard) with the
DISTRIBUTION-level "how much did this column shift".

PSI = Σ_bins (p_cur - p_base) · ln(p_cur / p_base); conventional
reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 major shift.

Distributed shape (what survives 100 TB):

- Numeric binning edges are the BASE side's exact quantiles — a
  bins-1-value model collected to the driver (the Lloyd-centers
  discipline: tiny, deterministic, embeddable as literals by an
  oracle). Each side's bin counts are then ONE map-side
  conditional-sum aggregation — no shuffle carries rows, and the PSI
  fold runs on a single broadcast-joined row pair.
- Categorical categories are the base side's top-k values (one count
  agg, shuffle ∝ distinct values) + an ``__other`` bucket; proportions
  again via one conditional-sum pass per side.
- Zero proportions are floored at ``eps`` (default 1e-6) before the
  log, the standard PSI smoothing — deterministic in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def quantile_edges(
    df: DataFrame, col: str, bins: int = 10, round_dp: int = 6
) -> list[float]:
    """The base side's interior quantile edges (bins-1 values, rounded
    for cross-engine determinism). NULLs are ignored by percentile."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    qs = [i / bins for i in range(1, bins)]
    row = df.agg(
        F.percentile(F.col(f"`{col}`").cast("double"), F.lit(qs)).alias("e")
    ).collect()[0]
    if row["e"] is None:
        raise ValueError(f"quantile_edges: column {col!r} has no non-NULL values")
    return [round(float(v), round_dp) for v in row["e"]]


def _bin_counts(df: DataFrame, col: str, edges: list[float]):
    """One conditional-sum pass: counts per quantile bin (bin i = number
    of edges strictly below the value; value == edge → lower bin) plus
    the non-NULL total."""
    v = F.col(f"`{col}`").cast("double")
    aggs = []
    n_bins = len(edges) + 1
    for i in range(n_bins):
        cond = v.isNotNull()
        if i > 0:
            cond = cond & (v > F.lit(edges[i - 1]))
        if i < len(edges):
            cond = cond & (v <= F.lit(edges[i]))
        aggs.append(F.sum(cond.cast("long")).alias(f"__c{i}"))
    aggs.append(F.sum(v.isNotNull().cast("long")).alias("__n"))
    return df.agg(*aggs), n_bins


def _psi_from_counts(pair: DataFrame, n_bins: int, round_dp: int):
    """PSI fold over the joined (base-counts, cur-counts) single row.

    PSI is NULL when either side has zero non-NULL values — the CASE
    guard also keeps the proportion divisions out of the taken branch,
    so ANSI mode never sees a division by zero."""
    terms = []
    for i in range(n_bins):
        pb = F.greatest(
            F.col(f"__bc{i}") / F.col("__bn"), F.lit(_EPS)
        )
        pc = F.greatest(
            F.col(f"__cc{i}") / F.col("__cn"), F.lit(_EPS)
        )
        terms.append((pc - pb) * F.log(pc / pb))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    both = (F.col("__bn") > 0) & (F.col("__cn") > 0)
    return pair.select(
        F.round(F.when(both, total), round_dp).alias("psi"),
        F.col("__bn").alias("n_base"),
        F.col("__cn").alias("n_cur"),
    )


def numeric_psi(
    base: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int = 10,
    edges: list[float] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """One-row ``(column, kind, psi, n_base, n_cur)``: PSI of ``col``'s
    numeric distribution in ``cur`` vs ``base``, binned by the base
    side's exact quantiles (or explicit ``edges``). NULLs are excluded
    from both sides' proportions."""
    if edges is None:
        edges = quantile_edges(base, col, bins, round_dp)
    bc, n_bins = _bin_counts(base, col, edges)
    cc, _ = _bin_counts(cur, col, edges)
    bc = bc.select(
        *[F.col(f"__c{i}").alias(f"__bc{i}") for i in range(n_bins)],
        F.col("__n").alias("__bn"),
    )
    cc = cc.select(
        *[F.col(f"__c{i}").alias(f"__cc{i}") for i in range(n_bins)],
        F.col("__n").alias("__cn"),
    )
    out = _psi_from_counts(bc.crossJoin(F.broadcast(cc)), n_bins, round_dp)
    return out.select(
        F.lit(col).alias("column"), F.lit("numeric").alias("kind"),
        "psi", "n_base", "n_cur",
    )


def top_categories(
    df: DataFrame, col: str, top_k: int = 20
) -> list[str]:
    """The base side's ``top_k`` most frequent non-NULL categories
    (ties by value ascending — deterministic)."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    rows = (
        df.filter(F.col(f"`{col}`").isNotNull())
        .groupBy(F.col(f"`{col}`").cast("string").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("v").asc())
        .limit(top_k)
        .collect()
    )
    return [r["v"] for r in rows]


def categorical_psi(
    base: DataFrame,
    cur: DataFrame,
    col: str,
    top_k: int = 20,
    categories: list[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """One-row ``(column, kind, psi, n_base, n_cur)``: PSI over the base
    side's top-k categories plus an ``__other`` bucket (everything else,
    NULL excluded)."""
    if categories is None:
        categories = top_categories(base, col, top_k)
    v = F.col(f"`{col}`").cast("string")

    def counts(df: DataFrame, prefix: str):
        aggs = [
            F.sum((v == F.lit(c)).cast("long")).alias(f"__{prefix}{i}")
            for i, c in enumerate(categories)
        ]
        aggs.append(
            F.sum(
                (v.isNotNull() & ~v.isin(categories)).cast("long")
            ).alias(f"__{prefix}{len(categories)}")
        )
        aggs.append(F.sum(v.isNotNull().cast("long")).alias(f"__{prefix}n"))
        return df.agg(*aggs)

    bc = counts(base, "bc").withColumnRenamed("__bcn", "__bn")
    cc = counts(cur, "cc").withColumnRenamed("__ccn", "__cn")
    out = _psi_from_counts(
        bc.crossJoin(F.broadcast(cc)), len(categories) + 1, round_dp
    )
    return out.select(
        F.lit(col).alias("column"), F.lit("categorical").alias("kind"),
        "psi", "n_base", "n_cur",
    )


def drift_report(
    base: DataFrame,
    cur: DataFrame,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    bins: int = 10,
    top_k: int = 20,
    round_dp: int = 6,
) -> DataFrame:
    """Per-column PSI report between two table versions: one row per
    column, ``(column, kind, psi, n_base, n_cur)``. The per-column
    passes are independent single aggregations; at cluster scale submit
    them as concurrent jobs if wall-clock matters."""
    numeric_cols = numeric_cols or []
    categorical_cols = categorical_cols or []
    if not numeric_cols and not categorical_cols:
        raise ValueError("drift_report: no columns given")
    # r14 opt: the per-column MODEL passes (base-side quantile edges /
    # top categories) are independent eager jobs — submit them
    # concurrently so the report pays one round of scheduling, not one
    # per column (the q_text_quality thread-pool pattern; job
    # descriptions are thread-local so the UI stays labelled).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max(1, min(4, len(numeric_cols) + len(categorical_cols)))) as pool:
        edge_f = {
            c: pool.submit(quantile_edges, base, c, bins, round_dp)
            for c in numeric_cols
        }
        cat_f = {
            c: pool.submit(top_categories, base, c, top_k)
            for c in categorical_cols
        }
        edges = {c: f.result() for c, f in edge_f.items()}
        cats = {c: f.result() for c, f in cat_f.items()}
    frames = [
        numeric_psi(base, cur, c, bins=bins, edges=edges[c], round_dp=round_dp)
        for c in numeric_cols
    ] + [
        categorical_psi(
            base, cur, c, top_k=top_k, categories=cats[c], round_dp=round_dp
        )
        for c in categorical_cols
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def psi_python(
    base_counts: list[int], cur_counts: list[int], eps: float = _EPS
) -> float:
    """Pure-Python PSI twin for tests/oracles."""
    nb, nc = sum(base_counts), sum(cur_counts)
    s = 0.0
    for b, c in zip(base_counts, cur_counts):
        pb = max(b / nb, eps)
        pc = max(c / nc, eps)
        s += (pc - pb) * math.log(pc / pb)
    return s

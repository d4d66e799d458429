"""BM25 keyword search over a document corpus — the inverted-index query
shape, expressed Spark-first.

Beyond-reference (the reference engine, src/lib.rs, has no text-retrieval
surface); this is the standard curation/eval primitive for large text
stores: "which documents best match these terms" without an external
search service.

Distributed shape (what survives 100 TB):

- The query set is DRIVER-SIDE TINY (a handful of strings). Its term set
  becomes a broadcast ``isin`` literal filter applied at the corpus scan,
  so only postings for query terms ever enter a shuffle — the corpus
  itself never shuffles.
- Corpus statistics (N docs, average document length) are ONE map-side
  partial aggregation to a single broadcast row.
- Document frequencies are a window count over the candidate postings
  (re-shuffling only those postings by token — never a second corpus
  scan).
- Final scoring is per-(query, doc) with a sum aggregation keyed on
  (query_id, doc id) — cardinality ∝ matching docs, not corpus — and a
  per-query top-k window over that small frame.

Tokenization matches functions/text.py (:func:`_tokens`): lowercase,
whitespace split, empties dropped — so BM25 ranks the same token stream
TF-IDF weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from zx_spark.functions.text import _tokens


def _query_terms(text: str) -> list[str]:
    """Driver-side twin of functions/text._tokens: lowercase, whitespace
    split, empties dropped, de-duplicated preserving first occurrence
    (classic BM25 ignores query-term multiplicity)."""
    seen: dict[str, None] = {}
    for t in text.lower().split():
        if t and t not in seen:
            seen[t] = None
    return list(seen)


def bm25_search(
    df: DataFrame,
    queries: dict[str, str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    ``queries`` maps query_id → query text. Returns
    ``(query_id, <id_col>, bm25, rank)`` with ``bm25`` rounded to 6dp and
    ``rank`` the deterministic 1-based position (rounded score desc, then
    id asc — ties never depend on partitioning).

    IDF uses the always-positive Lucene form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` so terms present in most
    documents still contribute ≥ 0 (the textbook ``ln(N/df)`` goes
    negative past df > N/2 and makes scores non-monotonic in match
    count). Per-term weight is
    ``idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))``.

    Documents with no tokens never produce postings and are absent from
    results (they still count toward N and avgdl via dl = 0, matching the
    corpus-statistics convention of counting every stored document).
    """
    if not queries:
        raise ValueError("bm25_search: queries must be a non-empty dict")
    if k < 1:
        raise ValueError(f"bm25_search: k must be >= 1, got {k}")
    term_rows = [
        (qid, t) for qid, qtext in queries.items() for t in _query_terms(qtext)
    ]
    if not term_rows:
        raise ValueError("bm25_search: no query produced any token")
    spark = df.sparkSession
    terms = spark.createDataFrame(term_rows, ["query_id", "token"])
    all_terms = sorted({t for _, t in term_rows})

    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__toks"))
    # One corpus pass for N and avgdl (empty docs contribute dl=0).
    stats = toks.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg(F.size("__toks")).alias("__avgdl"),
    )
    # Candidate postings only: the term-set filter is a broadcast literal
    # applied before the (doc, token) aggregation, so shuffle volume is
    # ∝ postings of query terms, never the corpus token stream.
    ex = (
        toks.select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            F.explode_outer("__toks").alias("token"),
        )
        .filter(F.col("token").isin(all_terms))
    )
    tf = ex.groupBy(id_col, "token", "__dl").agg(F.count(F.lit(1)).alias("__tf"))
    # Document frequency as a window count over the candidate postings —
    # NOT a groupBy + join back, which would re-scan and re-explode the
    # whole corpus a second time (Catalyst does not reuse the exchange
    # across the self-referencing aggregation). The window's token
    # re-shuffle moves only candidate postings (≤ |terms| × matching
    # docs rows), never corpus tokens.
    tf = tf.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    )

    idf: Column = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    norm = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    weight = idf * F.col("__tf") * F.lit(k1 + 1.0) / norm

    scored = (
        tf.crossJoin(F.broadcast(stats))
        .join(F.broadcast(terms), "token")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(weight), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "bm25", "rank")
    )


def keyword_search(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    **kw,
) -> DataFrame:
    """Single-query convenience wrapper: ``(doc id, bm25, rank)``."""
    out = bm25_search(df, {"q": query}, text_col, id_col, k=k, **kw)
    return out.drop("query_id")

"""Exact duplicated-span detection — find every run of ≥ n tokens that
occurs more than once ACROSS the corpus, per document, and optionally
strip it.

This is the substring-level exact dedup from "Deduplicating Training
Data Makes Language Models Better" (Lee et al., 2021), re-expressed at
n-token-shingle granularity for Spark: a span is duplicated iff every
n-shingle inside it is globally duplicated, so marking duplicated
shingles and merging overlapping positions (gaps-and-islands) recovers
maximal duplicated spans without a suffix array. Boilerplate headers,
license blocks and copy-pasted passages — the things document-level
near-dedup misses — surface here.

Distributed shape (what survives 100 TB):

- One posexplode produces the (doc, position, shingle-hash) stream;
  the global occurrence count is a hash aggregation on the shingle hash
  WITH map-side partial aggregation (hot boilerplate shingles combine
  before the shuffle), then an equi-join back onto the stream keyed on
  the same hash. AQE's skew-join handles pathological shingles. A
  window count over the hash would avoid the join's second scan but
  serializes every occurrence of a hot shingle into one partition — the
  groupBy+join shape is the skew-safe one, at the cost of re-scanning
  the corpus for the join's probe side (scan + tokenize are the cheap,
  embarrassingly parallel part).
- Span merging is per-document: one window (lag) + running-group cumsum
  keyed on the doc id — shuffle volume ∝ duplicated positions only.
- ``hash_family="md5"`` is the DuckDB-reproducible default;
  ``"xx64"`` swaps in xxhash64 for production CPU (same plan).

Reference scope note: the reference engine (src/lib.rs) has no text
surface; this operator belongs to the beyond-reference LLM-curation
family next to dedup.py and decontaminate.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from zx_spark.functions.text import _tokens


def _shingle_hash(sh: Column, hash_family: str) -> Column:
    if hash_family == "md5":
        # first 15 hex digits → 60-bit bigint, the corpus-hash convention
        # shared with functions/text.document_fingerprint
        return F.conv(F.substring(F.md5(sh), 1, 15), 16, 10).cast("long")
    if hash_family == "xx64":
        return F.xxhash64(sh)
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def _dup_positions(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    min_count: int,
    hash_family: str,
) -> DataFrame:
    """(id, pos) of every n-shingle whose hash occurs ≥ min_count times
    corpus-wide. pos is the 0-based token index of the shingle start."""
    if n < 1:
        raise ValueError(f"duplicated_spans: n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(
            f"duplicated_spans: min_count must be >= 2, got {min_count}"
        )
    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__toks"))
    # docs shorter than n tokens produce an empty sequence → no shingles
    sh = toks.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size("__toks") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - n),
                    # n unrolled ordinal lookups, not concat_ws(slice(...)):
                    # the slice allocates an n-element array per position
                    # inside the interpreted lambda (the
                    # shingles_from_tokens r14 measurement, 6.5-6.8×);
                    # every position here is complete (size >= n), so the
                    # strings are identical by construction
                    lambda i: F.concat_ws(
                        " ", *[F.get(F.col("__toks"), i + j) for j in range(n)]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "__sh"),
    ).select(id_col, "pos", _shingle_hash(F.col("__sh"), hash_family).alias("__h"))
    counts = (
        sh.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("__h")
    )
    # merge hint: the duplicated-shingle vocabulary is DATA-SIZED (∝
    # corpus distinct shingles) but Catalyst estimate-sizes the agg
    # output under the broadcast threshold — the source_overlap_matrix
    # class (SCALE.md r12, fatal at scale regardless of local heap
    # slack). Sort-merge is spillable; gated by tests/test_broadcast_audit.
    return sh.join(counts.hint("merge"), "__h").select(id_col, "pos")


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
    hash_family: str = "md5",
    assume_unique: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns ``(<id_col>, span_start, span_end, n_dup_shingles)`` with
    token indices 0-based and ``span_end`` INCLUSIVE: the span covers
    tokens ``[span_start, span_end]``. Two duplicated shingle positions
    p1 < p2 merge into one span iff ``p2 <= p1 + n`` (overlapping or
    exactly adjacent coverage). ``n_dup_shingles`` counts the duplicated
    shingle starts inside the span.

    Duplicate ids would merge two documents' position streams into one
    gaps-and-islands pass, silently mixing spans across documents. The
    guard is IN-PLAN (r8, was an eager extra corpus pass): a sentinel
    marker row per document (an id-only column-pruned scan — the text
    column is never read) rides the gaps-and-islands shuffle, and a
    per-id marker count ≥ 2 hits a scan-speed ``raise_error`` at action
    time — the boilerplate_fractions fail-fast discipline. Cost: one
    extra row per DOCUMENT in the (already duplicated-positions-sized)
    window shuffle, no extra job. ``assume_unique=True`` skips even
    that for pipeline paths that just deduped.
    """
    dup = _dup_positions(df, text_col, id_col, n, min_count, hash_family)
    if not assume_unique:
        markers = df.select(F.col(id_col), F.lit(-1).alias("pos"))
        wid = Window.partitionBy(id_col)
        nmark = F.sum(
            F.when(F.col("pos") == -1, F.lit(1)).otherwise(F.lit(0))
        ).over(wid)
        guard = F.when(nmark <= 1, F.col("pos")).otherwise(
            F.raise_error(
                F.lit(
                    f"duplicated_spans: {id_col} must be unique per row"
                ).cast("string")
            )
        )
        dup = (
            dup.unionByName(markers)
            .withColumn("pos", guard)
            .filter(F.col("pos") != -1)
        )
    w = Window.partitionBy(id_col).orderBy("pos")
    # positions are sorted per doc, so the previous shingle's coverage
    # end is lag(pos)+n-1 and a new island starts when pos > lag(pos)+n
    grouped = dup.withColumn(
        "__brk",
        F.when(
            F.col("pos") > F.lag("pos").over(w) + n, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("__island", F.sum("__brk").over(w))
    return (
        grouped.groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_shingles"),
        )
        .drop("__island")
    )


def duplicated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
    hash_family: str = "md5",
    round_dp: int = 6,
    assume_unique: bool = False,
) -> DataFrame:
    """Per-document duplication exposure: ``(<id_col>, n_tokens,
    dup_spans, dup_tokens, dup_fraction)`` — every input document
    appears (zero-filled when nothing is duplicated). ``dup_fraction``
    is dup_tokens / n_tokens (0.0 for empty docs), rounded."""
    spans = duplicated_spans(
        df, text_col, id_col, n, min_count, hash_family, assume_unique
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    base = df.select(
        F.col(id_col), F.size(_tokens(F.col(text_col))).alias("n_tokens")
    )
    # merge hint: per_doc is doc-keyed (∝ corpus), estimate-small
    # (SCALE.md r12 class); sort-merge spills
    joined = base.join(per_doc.hint("merge"), id_col, "left")
    frac = F.when(
        F.col("n_tokens") > 0,
        F.round(
            F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"),
            round_dp,
        ),
    ).otherwise(F.lit(0.0))
    return joined.select(
        id_col,
        "n_tokens",
        F.coalesce("dup_spans", F.lit(0)).alias("dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        frac.alias("dup_fraction"),
    )


def strip_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
    hash_family: str = "md5",
    out_col: str = "text_stripped",
    assume_unique: bool = False,
) -> DataFrame:
    """Rewrite each document with duplicated-span tokens removed
    (whitespace-normalized: surviving tokens re-joined with single
    spaces). Adds ``out_col``; untouched documents keep their token
    stream verbatim. The span table is aggregated per doc and joined
    back (shuffle ∝ docs WITH duplicated spans; the filter itself is a
    JVM higher-order function, no Python)."""
    spans = (
        duplicated_spans(
            df, text_col, id_col, n, min_count, hash_family, assume_unique
        )
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
        )
    )
    # materialize the token array as a NAMED column referenced many
    # times below — inlining _tokens into the per-position lambda would
    # re-tokenize the text once per token index (the O(len²) Catalyst
    # hazard functions.text.tokenize documents)
    # merge hint: the span table is doc-keyed (∝ docs with duplicated
    # spans — unbounded) but estimate-small (SCALE.md r12 class)
    joined = df.join(spans.hint("merge"), id_col, "left").withColumn(
        "__toks", _tokens(F.col(text_col))
    )
    toks = F.col("__toks")
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda i: F.struct(
                i.alias("i"), F.element_at(toks, i + 1).alias("t")
            ),
        ),
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["i"] >= sp["span_start"])
            & (s["i"] <= sp["span_end"]),
        ),
    )
    # NULL text stays NULL (this codebase treats NULL as "no content",
    # distinct from empty — see dedup.exact_dedup); untouched documents
    # keep their token stream verbatim
    stripped = F.when(F.col(f"`{text_col}`").isNull(), F.lit(None).cast("string")).when(
        F.col("__spans").isNull() | (F.size(toks) == 0),
        F.concat_ws(" ", toks),
    ).otherwise(F.concat_ws(" ", F.transform(kept, lambda s: s["t"])))
    return joined.withColumn(out_col, stripped).drop("__spans", "__toks")

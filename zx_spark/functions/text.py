"""Text-analysis columns for training-data pipelines — all native Catalyst
expressions (no Python in the hot path), so they whole-stage-codegen and
scale linearly with executors.

These generalize beyond the reference (which has no scalar functions,
SURVEY §2.2); they are first-class operators for the 100 TB documents
pipeline: quality scoring, language id, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# Deliberately small: language id at pipeline scale needs a cheap, fully
# vectorizable signal, not a model.
_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}

_TOKEN_SPLIT = r"\s+"
# BPE-ish pre-tokenizer: word pieces, numbers, or runs of punctuation —
# the shape GPT-style byte-pair pre-tokenization produces, as one regex so
# counting stays a single JVM expression.
_BPE_ISH = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), _TOKEN_SPLIT), lambda t: t != F.lit(""))


def text_quality(text: Column) -> Column:
    """Struct of quality signals: n_chars, n_tokens, avg_token_len,
    punct_ratio, stopword_ratio (en), upper_ratio, and a composite
    quality_score in [0, 1] (heuristic length/punct/stopword mix)."""
    toks = _tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    punct_ratio = n_punct.cast("double") / safe_chars
    stop_ratio = n_stop.cast("double") / safe_tokens
    upper_ratio = n_upper.cast("double") / safe_chars
    avg_len = (n_chars.cast("double") - (n_tokens - 1).cast("double")) / safe_tokens
    # Composite: long-enough docs with normal punctuation and some stopwords
    # score high; degenerate (all-punct / all-caps / no-stopword) docs low.
    length_score = F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0))
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    quality = (length_score + punct_score + stop_score) / F.lit(3.0)
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


def language_id(text: Column) -> Column:
    """Heuristic language id: argmax of per-language stopword hit counts
    over whitespace tokens; ``und`` (undetermined) when nothing matches.

    One pass per language over the token array — still a single Catalyst
    projection, no shuffle, no Python.
    """
    toks = _tokens(text)

    def lang_score(words: list[str]) -> Column:
        wordset = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))

    scored = F.array(
        *[
            F.struct(lang_score(words).alias("score"), F.lit(lang).alias("lang"))
            for lang, words in _STOPWORDS.items()
        ]
    )
    best = F.array_max(scored)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under a BPE-style pre-tokenizer regex (single JVM
    expression — the cheap proxy for "how many tokens will training pay
    for")."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_ISH), 0))


# Control characters EXCEPT \t\n\r (those are whitespace — squashing
# handles them; stripping them first would glue words together).
_CONTROL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(
    text: Column,
    lower: bool = True,
    strip_control: bool = True,
    squash_whitespace: bool = True,
) -> Column:
    """Canonicalize text BEFORE any hash-keyed operator (exact dedup,
    MinHash, fingerprints): lowercase, strip non-whitespace control
    characters, collapse whitespace runs to single spaces and trim.
    Pure JVM expressions — codegen, no shuffle, scan-speed at 100 TB.

    Unicode canonical composition is deliberately a SEPARATE step
    (``nfc_normalized``): it needs Python (the JVM expression library
    has no NFC), so compose ``normalize_text(nfc_normalized(c))`` only
    when the corpus actually carries decomposed sequences."""
    out = text
    if lower:
        out = F.lower(out)
    if strip_control:
        out = F.regexp_replace(out, _CONTROL, "")
    if squash_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def nfc_normalized(text: Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) — the one text verb
    that genuinely needs Python, as an Arrow-batched pandas UDF (the
    sanctioned slow path; still vectorized transfer, never per-row
    pickling). Decomposed sequences ("e" + U+0301) and their composed
    forms ("é") hash apart without this — run it once at ingest,
    store the normalized text, and every downstream hash operator stays
    JVM-only."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")
    import pandas as pd  # noqa: F401 — annotation target for the UDF
    from pyspark.sql.functions import pandas_udf

    # `from __future__ import annotations` stringifies the hints and
    # pyspark resolves them against the function's MODULE globals, so
    # the annotation must be importable there, not a closure local.
    globals().setdefault("pd", pd)

    @pandas_udf("string")
    def _nfc(s: "pd.Series") -> "pd.Series":
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _nfc(text)


def tokenize(text: Column) -> Column:
    """Lowercased whitespace tokens (the shared tokenizer). Materialize
    this as a NAMED COLUMN in its own select before any per-position
    consumer (``shingles_from_tokens``) — a projection boundary whose
    alias is referenced more than once survives Catalyst's
    CollapseProject, so the text is tokenized once per row instead of
    once per shingle position (measured ~6× on the driver documents)."""
    return _tokens(text)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """n-word shingles from an ALREADY MATERIALIZED token-array column —
    the fast path every shingle consumer should use (see ``tokenize``).
    Documents shorter than ``n`` words yield their whole (joined) text as
    one shingle so they still participate in dedup.

    The per-position body is ``n`` unrolled null-safe ordinal lookups
    joined by one ``concat_ws`` (``n`` is a plan-time constant at every
    call site) — NOT ``array_join(slice(...))``, which allocates an
    n-element array per shingle position inside the interpreted lambda:
    measured 6.5× (n=3) / 6.8× (n=5) slower at 300k × 150-token rows
    (r14). Identical strings: ``F.get`` returns NULL past the end and
    ``concat_ws`` skips NULLs, exactly as ``slice`` truncates; both
    forms skip NULL elements and keep empty-string tokens."""
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array(F.lit("")))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of n-word shingles straight from text — convenience form.
    In a hot path, prefer ``tokenize`` in its own select +
    ``shingles_from_tokens``: inlined here, the tokenizer expression is
    re-evaluated per shingle position by Catalyst."""
    return shingles_from_tokens(_tokens(text), n)


def token_budget(
    df: DataFrame, text_col: str = "text", group_col: str | None = None
) -> DataFrame:
    """Token accounting under the BPE-ish counter: (group,) n_docs,
    n_tokens — the numbers a data-mixing plan budgets against ("how many
    tokens does each source contribute?"). One hash aggregation; the
    count itself is a single codegen'd expression per row."""
    cnt = bpe_ish_token_count(F.coalesce(F.col(f"`{text_col}`"), F.lit("")))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(cnt).cast("long").alias("n_tokens"),
    ]
    if group_col is None:
        return df.agg(*aggs)
    return df.groupBy(group_col).agg(*aggs)


def repetition_signals(text: Column) -> Column:
    """Struct of repetition-based quality signals (the cheap, map-side
    subset of the published pretraining-filter heuristics):

    - ``dup_line_fraction``: 1 − distinct/total over trimmed non-empty
      lines — boilerplate and scraped-menu pages score high;
    - ``dup_token_fraction``: 1 − distinct/total over tokens — degenerate
      keyword-stuffed text scores high.

    Both are O(len) array expressions (no shuffle, no Python). The
    per-n-gram top-frequency signal needs a per-doc aggregation — see
    ``top_ngram_fraction`` for the DataFrame form."""
    toks = _tokens(text)
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n_toks = F.size(toks)
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    dup_tok = F.when(
        n_toks > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_toks,
    ).otherwise(F.lit(0.0))
    return F.struct(
        F.round(dup_line, 4).alias("dup_line_fraction"),
        F.round(dup_tok, 4).alias("dup_token_fraction"),
    )


def top_ngram_fraction(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Per-document fraction of n-grams claimed by the single most
    frequent n-gram (the Gopher-style "top n-gram" repetition filter).

    Needs per-(doc, gram) counting, so unlike ``repetition_signals`` it
    is a DataFrame op: explode → two hash aggregations keyed on the
    unique doc id (no skew) — scales as a pair of map-side-combined
    shuffles, never a per-doc Python loop."""
    ex = (
        df.select(
            F.col(f"`{id_col}`"), tokenize(F.col(f"`{text_col}`")).alias("__toks")
        )
        .select(
            F.col(f"`{id_col}`"),
            shingles_from_tokens(F.col("__toks"), n).alias("__grams"),
        )
        .select(
            F.col(f"`{id_col}`"),
            F.size("__grams").alias("__n"),
            # outer + null-filter: keeps InferFiltersFromGenerate from
            # pushing a re-derived size() filter below the projections
            F.explode_outer("__grams").alias("__g"),
        )
        .filter(F.col("__g").isNotNull())
    )
    per_gram = ex.groupBy(id_col, "__g").agg(
        F.count(F.lit(1)).alias("__c"), F.first("__n").alias("__n")
    )
    return (
        per_gram.groupBy(id_col)
        .agg(F.max("__c").alias("__top"), F.first("__n").alias("__n"))
        .select(
            F.col(f"`{id_col}`"),
            F.round(F.col("__top") / F.col("__n"), 6).alias(
                f"top_{n}gram_fraction"
            ),
        )
    )


def tf_idf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, token) TF-IDF weights: ``tf = count(token in doc) /
    n_tokens(doc)``, ``idf = ln(N_docs / doc_freq(token))``, rounded to 6dp.

    Distributed shape: explode → one hash aggregation per (doc, token) →
    one per token for document frequency → sort-merge join back (the
    vocabulary is corpus-sized — smaller than the corpus but unbounded,
    so it is pinned off the broadcast path) → cross join with the
    single-row corpus count (broadcast). No collect, no window over the
    whole corpus.
    """
    # Materialize the token array behind a projection boundary (see
    # tokenize), and explode_outer + null-filter instead of a plain
    # explode: InferFiltersFromGenerate would otherwise push a
    # size(tokens) > 0 filter below the projection, re-tokenizing every
    # row at the scan. A null token only arises from an empty array, so
    # the post-filter restores inner-explode semantics exactly.
    ex = (
        df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").alias("__n_toks"),
            F.explode_outer("__toks").alias("token"),
        )
        .filter(F.col("token").isNotNull())
    )
    tf = ex.groupBy(id_col, "token", "__n_toks").agg(F.count(F.lit(1)).alias("__cnt"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("__n_docs"))
    score = (F.col("__cnt") / F.col("__n_toks")) * F.log(
        F.col("__n_docs") / F.col("__df")
    )
    return (
        # merge hint: dfreq is the DISTINCT TOKEN VOCABULARY — grows with
        # the corpus, but its agg-output estimate can land under the
        # broadcast threshold (SCALE.md r12 class); sort-merge spills.
        # The single-row corpus count below stays a broadcast.
        tf.join(dfreq.hint("merge"), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(F.col(id_col), F.col("token"), F.round(score, 6).alias("tfidf"))
    )


def tf_idf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (deterministic tie-break on the
    rounded score then token) — the usual keyword-extraction shape. One
    extra shuffle on ``id_col`` for the per-doc row_number."""
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        tf_idf(df, text_col, id_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pre-tokenization step of a training-data pipeline. Returns
    one row per chunk: (id, chunk_no, chunk_text, n_tokens).

    Pure JVM: tokenize once, ``sequence`` over window starts,
    ``posexplode`` + ``slice`` + ``array_join`` — a narrow transform, no
    shuffle, no Python; output rows ≈ len/stride per doc. Chunk starts
    step by ``chunk_tokens - overlap_tokens``; the final window is the
    (possibly short) remainder, and a document shorter than one chunk
    yields exactly one chunk. Empty/whitespace docs yield one empty
    chunk (n_tokens 0) so no document silently disappears."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = "__chunk_toks"
    # coalesce: NULL text must behave like empty (one empty chunk,
    # n_tokens 0) — otherwise size(NULL)=NULL under ANSI and F.least
    # SKIPS the null, reporting n_tokens = chunk_tokens for no content.
    out = df.withColumn(toks, _tokens(F.coalesce(F.col(text_col), F.lit(""))))
    n = F.greatest(F.size(toks), F.lit(1))
    # number of windows = ceil(max(n - overlap, 1) / stride)
    n_chunks = F.ceil(F.greatest(n - F.lit(overlap_tokens), F.lit(1)) / F.lit(stride))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    return (
        out.select(
            F.col(id_col),
            F.col(toks),
            F.posexplode(starts).alias("chunk_no", "__start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.array_join(
                F.slice(F.col(toks), F.col("__start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.size(toks) - F.col("__start"), F.lit(chunk_tokens)
            ).cast("long").alias("n_tokens"),
        )
        .withColumn("n_tokens", F.greatest(F.col("n_tokens"), F.lit(0)))
    )


def document_fingerprint(text: Column, n: int = 5, mod: int = 8) -> Column:
    """Winnowing-style document fingerprint: hash every n-word shingle
    (md5-derived 60-bit int, JVM-side — ANSI-SQL-reproducible as
    ``('0x'||substr(md5(s),1,15))::bigint`` so the driver oracle can
    verify it) and keep the deterministic 1/``mod`` sample
    (``hash % mod == 0``), sorted. Near-identical documents share most
    fingerprint hashes; the sample keeps the array O(len/mod).
    Hot path: ``fingerprint_from_tokens`` over a materialized token
    column (see ``tokenize``)."""
    return fingerprint_from_tokens(_tokens(text), n, mod)


def fingerprint_from_tokens(toks: Column, n: int = 5, mod: int = 8) -> Column:
    """``document_fingerprint`` from an already materialized token-array
    column — tokenizes once per row instead of once per shingle."""
    hashes = F.transform(
        shingles_from_tokens(toks, n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    kept = F.filter(hashes, lambda h: F.pmod(h, F.lit(mod)) == 0)
    return F.array_sort(kept)


def hashed_embedding(text: Column, dim: int = 64, norm: bool = True) -> Column:
    """Deterministic feature-hashing embedding: token counts scattered
    into ``dim`` md5-60-bit buckets with a ±1 sign hash (the classic
    hashing-trick / SimHash-style text vector), optionally L2-normalized
    — array<double> ready for every vector operator in the engine
    (cosine_topk, RP-LSH, IVF/PQ, SemDeDup, PCA).

    The point is the BRIDGE: raw text becomes a queryable vector with no
    model, no Python, no external service — a pure Catalyst projection
    (bucket array materialized once per row, then ``dim`` JVM count
    folds), so text→vector→ANN runs end-to-end at scan speed and the
    whole path stays ANSI-SQL-reproducible. Swap in a real encoder
    behind the same column contract when one is available."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    toks = _tokens(text)
    h = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    # bucket = h % dim; sign from the parity of h div dim so counts
    # cancel instead of all piling positive (SimHash-style). The parity
    # is computed as ``h mod 2·dim < dim`` — pure 64-bit integer mod
    # (``floor(h / dim)`` would route a 60-bit hash through a double and
    # lose the low bits, making the sign ill-defined cross-engine).
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            h,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(
                F.pmod(x, F.lit(dim)) == i,
                F.when(F.pmod(x, F.lit(2 * dim)) < dim, 1).otherwise(-1),
            ).otherwise(0),
        ).cast("double"),
    )
    if norm:
        n2 = F.sqrt(
            F.aggregate(counts, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        counts = F.transform(counts, lambda x: x / F.greatest(n2, F.lit(1e-12)))
    # NULL text -> NULL vector (not an array of NULL elements)
    return F.when(text.isNotNull(), counts)


def with_hashed_embedding(
    df: "DataFrame",
    text_col: str = "text",
    dim: int = 64,
    norm: bool = True,
    out_col: str = "hashed_emb",
) -> "DataFrame":
    """DataFrame form of ``hashed_embedding`` — identical values, built
    through PROJECTION BOUNDARIES so each stage materializes once per
    row: the inline Column form nests the token-hash array inside ``dim``
    count folds and the counts inside the normalizer, and Catalyst
    inlines each reference (measured ~5× slower at dim=32 on the driver
    corpus). Use this for corpus-scale jobs; the Column form stays the
    convenience for ad-hoc expressions."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    text = F.col(f"`{text_col}`")
    h = F.transform(
        _tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            F.col("__he_h"),
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(
                F.pmod(x, F.lit(dim)) == i,
                F.when(F.pmod(x, F.lit(2 * dim)) < dim, 1).otherwise(-1),
            ).otherwise(0),
        ).cast("double"),
    )
    out = df.withColumn("__he_h", h).withColumn("__he_c", counts)
    vec = F.col("__he_c")
    if norm:
        n2 = F.sqrt(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        out = out.withColumn("__he_n2", n2)
        vec = F.transform(
            vec, lambda x: x / F.greatest(F.col("__he_n2"), F.lit(1e-12))
        )
    out = out.withColumn(out_col, F.when(text.isNotNull(), vec))
    return out.drop("__he_h", "__he_c", "__he_n2")

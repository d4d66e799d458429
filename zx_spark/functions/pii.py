"""PII detection & redaction for training-data pipelines — pure Catalyst
regex expressions (no Python in the hot path), whole-stage-codegen'd.

A corpus headed for training must have personally identifiable
information scrubbed; at 100 TB this has to be a map-side projection,
never a shuffle or a Python loop. Every detector is a single regex kept
deliberately inside the common subset of Java regex (Spark) and RE2
(DuckDB): character classes, bounded repetition, ``\\b`` word boundaries,
alternation — no lookaround, no backreferences — so the DuckDB oracle
reproduces detection *and* redaction byte-for-byte.

Redaction is SEQUENTIAL over the type list: each pattern counts and
replaces on the text as redacted so far, so one span is never claimed by
two types and the count/replace order is deterministic on both engines.

The reference has no scalar-function surface at all (SURVEY §2.2); this
module is part of the beyond-reference LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (type, pattern, replacement) — ORDER MATTERS: more-specific numeric
# shapes (ssn, credit card) run before the catch-all phone detector so a
# 16-digit card is never half-eaten as a phone number.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "credit_card",
        r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b|\b[0-9]{15,16}\b",
        "<CC>",
    ),
    (
        "phone",
        r"\+[0-9]{7,15}\b|\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
        "<PHONE>",
    ),
]

PII_TYPES = [t for t, _, _ in PII_PATTERNS]


def pii_scrub(text: Column) -> Column:
    """Struct ``(redacted, n_<type>..., n_pii)``: the text with every
    detected span replaced by its ``<TYPE>`` token, plus per-type match
    counts. One projection — counts and redaction share the sequential
    pass, so ``n_<type>`` is exactly the number of ``<TYPE>`` tokens in
    ``redacted``. NULL text yields NULL redacted and zero counts."""
    cur = F.coalesce(text, F.lit(""))
    counts: list[Column] = []
    for typ, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(f"n_{typ}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    redacted = F.when(text.isNull(), F.lit(None).cast("string")).otherwise(cur)
    return F.struct(redacted.alias("redacted"), *counts)


def with_pii_scrubbed(df, text_col: str = "text", out_prefix: str = "pii_"):
    """DataFrame form: adds ``<prefix>redacted``, one ``<prefix>n_<type>``
    per detector, and ``<prefix>n_total``. A narrow projection — no
    shuffle, no Python; drop the raw column afterwards to ship a clean
    corpus."""
    s = pii_scrub(F.col(f"`{text_col}`"))
    out = df.withColumn("__pii", s)
    out = out.withColumn(f"{out_prefix}redacted", F.col("__pii.redacted"))
    for typ in PII_TYPES:
        out = out.withColumn(f"{out_prefix}n_{typ}", F.col(f"__pii.n_{typ}"))
    total = None
    for typ in PII_TYPES:
        c = F.col(f"{out_prefix}n_{typ}")
        total = c if total is None else total + c
    return out.withColumn(f"{out_prefix}n_total", total).drop("__pii")

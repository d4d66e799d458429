"""Scalar/column function library for the LLM-data-pipeline surface.

The reference has no scalar functions at all (SURVEY §2.2 "absent"); this
package is the engine's generalization for training-data pipelines: text
statistics, language id, token counting, fingerprinting — all built from
native ``pyspark.sql.functions`` so they stay JVM-side and codegen'd.
"""

from zx_spark.functions.text import (
    bpe_ish_token_count,
    document_fingerprint,
    language_id,
    text_quality,
    word_shingles,
)

__all__ = [
    "bpe_ish_token_count",
    "document_fingerprint",
    "language_id",
    "text_quality",
    "word_shingles",
]

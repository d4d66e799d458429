"""The package-wide hashed-feature primitives, in ONE place.

Three modules (classify.py NB gate, lm.py bigram LM, dsir.py importance
weights) hash tokens into fixed bucket spaces with the md5-60-bit
construction and re-derive models driver-side through pure-Python
twins. Those helpers used to be triplicated; a change to any of them
(hash width, tokenization) must hit every module at once or the
modules silently disagree with each other and with the shared DuckDB
``_TOKS`` / bucket SQL — so they live here.

Tokenization parity note: the engines split on ASCII whitespace only —
Java regex ``\\s`` is ``[ \\t\\n\\x0B\\f\\r]`` and DuckDB/RE2 ``\\s``
is the same set — while Python's ``str.split()`` splits on ALL Unicode
whitespace (U+00A0, U+2028, ...). The Python twin must therefore use
the explicit ASCII class, or a document containing a non-breaking
space trains a different model in the twin than in the engines.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java \s == RE2 \s == this class. NOT Python str.split().
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def bucket(s: Column, n_buckets: int) -> Column:
    """md5-60-bit hash bucket — the ANSI-SQL-reproducible construction
    (``('0x'||substr(md5(s),1,15))::bigint % n`` in DuckDB)."""
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def bucket_py(s: str, n_buckets: int) -> int:
    """Driver-side twin of ``bucket`` — identical for any UTF-8 string."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n_buckets


def toks(text: Column) -> Column:
    """The package-wide tokenization: lowercase, split on whitespace,
    drop empties — matches DuckDB ``_TOKS`` exactly."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def toks_py(text: str | None) -> list[str]:
    """Driver-side twin of ``toks``: ASCII-whitespace split (see module
    note — ``str.split()`` would diverge on Unicode whitespace)."""
    return [t for t in _ASCII_WS.split((text or "").lower()) if t]

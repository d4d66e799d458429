"""zx SQL dialect shim (Q2) — the reference's main entry point, Spark-first.

Reference surface: ``ZX.SQL <query>`` (src/lib.rs:815-844) parsed by
src/expr.rs:106-230. Grammar accepted there (SURVEY §2.4)::

    SELECT <item> [, <item>]*
    [WHERE <cond> [AND <cond>]*]
    [GROUP BY ident [, ident]*]
    [ORDER BY ident|fn(col) [ASC|DESC] [, ...]]

plus our ``GRANULARITY <seconds>`` extension (the reference hardcodes 300 s,
src/expr.rs:224-227). Anything with a FROM clause is NOT zx dialect — it
falls through verbatim to ``spark.sql()``, which instantly provides the full
Spark SQL surface (joins, set ops, window functions, scalar functions) the
reference lacks.

Faithfulness decisions (documented divergences, src file:line cites inline):

- whole query lowercased before parsing, as the reference does
  (src/lib.rs:818-820);
- ``$T_START``/``$T_END`` pseudo-columns are stripped from WHERE into the
  scan range (src/expr.rs:171-185); the reference defaults ``t_end`` to
  ``now()`` (src/expr.rs:107-108, non-deterministic) — we default to
  unbounded instead;
- ``!=``/``<>``: the reference SQL layer mis-maps them to ``=``
  (src/expr.rs:66-74, a bug). We implement correct NE by default;
  ``ZxCompat(neq_is_eq_bug=True)`` reproduces the bug bit-for-bit;
- ``LIKE`` means plain substring in the reference (no ``%``/``_`` patterns,
  src/expr.rs:81-89). Default keeps that (``like_is_contains=True``);
  turning it off maps LIKE to real SQL LIKE patterns;
- ORDER BY is parsed but IGNORED by the reference's SQL path
  (src/lib.rs:840). Here it is wired for real: its presence routes the query
  through the aggregate-then-sort path (O1, ``run_sorted``);
- a query whose select items are all bare identifiers (``Aggregate::Raw``,
  which the reference declares then panics on, src/expr.rs:120-125 +
  src/lib.rs:660) compiles to a plain distributed projection — the path a
  SQL user expects — instead of panicking.
"""

from zx_spark.sqlshim.translate import Passthrough, ZxCompat, parse_zx_sql, zx_sql

__all__ = ["Passthrough", "ZxCompat", "parse_zx_sql", "zx_sql"]

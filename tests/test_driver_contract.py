"""Driver-contract invariants (no SparkSession needed — fast):

- the registry holds EXACTLY 50 queries (the driver's cap: fewer wastes
  coverage, more means some queries are never checked);
- every query has an oracle and vice versa (the round-4 board is 50/50
  hash-verified; a drifting key silently downgrades a row to unchecked);
- oracle_sql() never throws and every SQL string is non-trivial — one
  raising entry would kill the WHOLE dict and fail all 50 comparisons;
- BENCH_COMPAT callables don't shadow registry names (bench merges the
  two dicts; a collision would time the wrong query).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def test_registry_is_exactly_50_with_aligned_oracles():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) == 50
    assert set(qs) == set(oracles)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and len(sql) > 20, name


def test_bench_compat_does_not_shadow_registry():
    import __spark_entry__ as entry

    qs = entry.queries()
    assert not (set(entry.BENCH_COMPAT) & set(qs))


def test_bench_headline_names_resolve():
    import importlib

    import __spark_entry__ as entry

    bench = importlib.import_module("bench")
    available = set(entry.queries()) | set(entry.BENCH_COMPAT)
    missing = [n for n in bench.HEADLINE if n not in available]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"

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


def test_bench_compat_shadows_only_versioned_pins():
    """r6 pin policy: a BENCH_COMPAT name may shadow a registry row ONLY
    as a versioned pin — the compat entry times the originally pinned
    (v1) shape, a distinct callable from the grown registry row, and the
    grown row is timed under the highest ``<name>_vN`` (except
    w_gapfill, whose registry row includes the stream-drain arm —
    excluded from bench by policy, so its versions pin the batch
    subsets instead)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    overlap = set(entry.BENCH_COMPAT) & set(qs)
    assert overlap == {
        "g1_group_nil",
        "w_gapfill",
        "w1_aligned_windows",
        "text_quality",
        "sampling_suite",
        "dedup_exact_groups",
        "dedup_minhash_pairs",
        "decontaminate_ngrams",
        "o1_top_groups",
    }
    for name in overlap:
        assert entry.BENCH_COMPAT[name] is not qs[name], name
        versions = [
            int(k.rsplit("_v", 1)[1])
            for k in entry.BENCH_COMPAT
            if k.startswith(f"{name}_v") and k.rsplit("_v", 1)[1].isdigit()
        ]
        assert versions, name
        latest = f"{name}_v{max(versions)}"
        if name != "w_gapfill":
            assert entry.BENCH_COMPAT[latest] is qs[name], name
        # every intermediate version is a distinct frozen callable
        assert len({id(entry.BENCH_COMPAT[f'{name}_v{v}']) for v in versions}) == len(
            versions
        ), name


def test_bench_headline_names_resolve():
    import importlib

    import __spark_entry__ as entry

    bench = importlib.import_module("bench")
    available = set(entry.queries()) | set(entry.BENCH_COMPAT)
    missing = [n for n in bench.HEADLINE if n not in available]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_baseline_pin_table_matches_artifacts():
    """Every `<sec>s (BENCH_rNN)` citation in BASELINE.md's pin table
    must equal what that artifact actually records (VERDICT r7
    What's-wrong #3: three rows cited BENCH_r02 with values from later
    exclusive re-measurements — the 2x gate is only auditable when the
    number and its named source agree)."""
    import importlib.util
    import pathlib

    tools = pathlib.Path(__file__).resolve().parent.parent / "tools"
    spec = importlib.util.spec_from_file_location(
        "check_baseline_pins", tools / "check_baseline_pins.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0

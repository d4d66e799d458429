"""Co-occurrence pair counts vs a DuckDB re-derivation, plus cap/floor
semantics and the no-quadratic-join plan shape."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zx_spark.operators.basket import cooccurrence_pairs

ROWS = [
    (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # repeats must not inflate
    (2, "a"), (2, "b"),
    (3, "b"), (3, "c"),
    (4, "a"), (4, "b"),
    (5, "z"),                                 # singleton group: no pairs
    (6, None), (None, "a"),                   # nulls dropped
]


@pytest.fixture(scope="module")
def baskets(spark):
    return spark.createDataFrame(ROWS, "g int, item string").cache()


def test_matches_duckdb(spark, baskets):
    got = sorted(
        tuple(r) for r in cooccurrence_pairs(baskets, "g", "item", min_count=1).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g int, item varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT a.item, b.item, count(*) FROM "
            "(SELECT DISTINCT g, item FROM t WHERE g IS NOT NULL AND item IS NOT NULL) a "
            "JOIN (SELECT DISTINCT g, item FROM t WHERE g IS NOT NULL AND item IS NOT NULL) b "
            "ON a.g = b.g AND a.item < b.item GROUP BY 1, 2"
        ).fetchall()
    )
    assert got == want
    assert ("a", "b", 3) in got and ("b", "c", 2) in got


def test_min_count_floor(spark, baskets):
    got = {(r[0], r[1]): r[2] for r in cooccurrence_pairs(baskets, "g", "item", min_count=2).collect()}
    assert got == {("a", "b"): 3, ("b", "c"): 2}


def test_cap_is_lexicographic_prefix(spark):
    rows = [(1, c) for c in "abcdef"] + [(2, c) for c in "abz"]
    df = spark.createDataFrame(rows, "g int, item string")
    got = sorted(
        tuple(r)
        for r in cooccurrence_pairs(df, "g", "item", min_count=1, max_items_per_group=2).collect()
    )
    # each group keeps only its two lexicographically-first items
    assert got == [("a", "b", 2)]


def test_guards(spark, baskets):
    with pytest.raises(ValueError, match="min_count"):
        cooccurrence_pairs(baskets, "g", "item", min_count=0)
    with pytest.raises(ValueError, match="max_items_per_group"):
        cooccurrence_pairs(baskets, "g", "item", max_items_per_group=1)
    with pytest.raises(ValueError, match="max_items_per_group"):
        cooccurrence_pairs(baskets, "g", "item", max_items_per_group=1000)


def test_no_cartesian_or_self_join_in_plan(spark, baskets):
    plan = (
        cooccurrence_pairs(baskets, "g", "item")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # pair generation is an in-row array transform, not a join at all
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_driver_events_shape(spark):
    from zx_spark.storage import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    out = cooccurrence_pairs(ev, "user_id", "event_type", min_count=2).collect()
    assert all(r["item_a"] < r["item_b"] for r in out)
    assert len(out) >= 1


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.sampled_from("abcdef")),
        min_size=1,
        max_size=40,
    ),
    min_count=st.integers(min_value=1, max_value=3),
)
def test_property_equals_brute_force(spark, rows, min_count):
    import itertools

    df = spark.createDataFrame(rows, "g int, item string")
    got = sorted(
        tuple(r)
        for r in cooccurrence_pairs(df, "g", "item", min_count=min_count).collect()
    )
    sets = {}
    for g, i in rows:
        sets.setdefault(g, set()).add(i)
    counts = {}
    for items in sets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = sorted((a, b, n) for (a, b), n in counts.items() if n >= min_count)
    assert got == want

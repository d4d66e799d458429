"""Edit-distance (fuzzy) join: the PassJoin pigeonhole blocking is a
NECESSARY condition, so the blocked equi-join must equal the brute-force
nested loop row-for-row — pinned here against DuckDB ``levenshtein`` and
a pure-Python DP, plus a hypothesis sweep over random typo corpora."""

from __future__ import annotations

import itertools

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from zx_spark.operators.joins import edit_distance_dedup_pairs, edit_distance_join


def _ed(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


NAMES = [
    "alpha beta",
    "alpha betr",  # 1 sub from alpha beta
    "alpha bet",  # 1 del
    "lpha beta",  # 1 del at pos 0
    "alpha betaX",  # 1 append
    "gamma delta",
    "gamma-delta",
    "epsilon",
    "epsilon",  # exact dup
    "zeta",
    "zeta!",
    "xx",
    "x",
    "",
    "a",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(NAMES)], "id int, name string"
    ).cache()


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_dedup_pairs_equal_brute_force(spark, corpus, k):
    got = sorted(tuple(r) for r in edit_distance_dedup_pairs(corpus, "name", "id", max_dist=k).collect())
    want = sorted(
        (i, j, _ed(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(NAMES), 2)
        if _ed(a, b) <= k
    )
    assert got == want


def test_two_table_join_matches_duckdb(spark):
    left = [(i, n) for i, n in enumerate(NAMES)]
    right = [(100 + i, n + ("x" if i % 3 == 0 else "")) for i, n in enumerate(NAMES)]
    ldf = spark.createDataFrame(left, "lid int, lname string")
    rdf = spark.createDataFrame(right, "rid int, rname string")
    got = sorted(
        tuple(r)
        for r in edit_distance_join(ldf, rdf, "lname", "rname", "lid", "rid", max_dist=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(lid int, lname varchar); CREATE TABLE r(rid int, rname varchar)")
    con.executemany("INSERT INTO l VALUES (?, ?)", left)
    con.executemany("INSERT INTO r VALUES (?, ?)", right)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT lid, rid, levenshtein(lname, rname) FROM l, r "
            "WHERE levenshtein(lname, rname) <= 2"
        ).fetchall()
    )
    assert got == want


def test_null_texts_dropped(spark):
    df = spark.createDataFrame(
        [(0, "abc"), (1, None), (2, "abd")], "id int, name string"
    )
    got = edit_distance_dedup_pairs(df, "name", "id", max_dist=1).collect()
    assert [tuple(r) for r in got] == [(0, 2, 1)]


def test_guards(spark, corpus):
    with pytest.raises(ValueError, match=r"max_dist"):
        edit_distance_join(corpus, corpus, "name", "name", "id", "id2", max_dist=4)
    with pytest.raises(ValueError, match=r"max_dist"):
        edit_distance_join(corpus, corpus, "name", "name", "id", "id2", max_dist=-1)
    with pytest.raises(ValueError, match=r"collide"):
        edit_distance_join(corpus, corpus, "name", "name", "id", "id")


def test_no_cartesian_in_plan(spark, corpus):
    """The whole point: candidate generation is a hash equi-join on the
    segment key, never a nested loop over the pair space."""
    plan = edit_distance_dedup_pairs(corpus, "name", "id", max_dist=1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    strings=st.lists(
        st.text(alphabet="abcx ", min_size=0, max_size=12), min_size=2, max_size=12
    ),
    k=st.integers(min_value=0, max_value=2),
)
def test_property_equals_brute_force(spark, strings, k):
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id int, name string")
    got = sorted(tuple(r) for r in edit_distance_dedup_pairs(df, "name", "id", max_dist=k).collect())
    want = sorted(
        (i, j, _ed(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _ed(a, b) <= k
    )
    assert got == want


def test_resolve_entities_chains_collapse(spark):
    """'jon smith' ~ 'john smith' ~ 'john smyth' are pairwise within 1
    edit of a shared neighbor but the chain ends are 2 apart — all three
    must still share one entity_id (the minimum id in the chain)."""
    from zx_spark.operators.joins import resolve_entities

    rows = [
        (10, "jon smith"),
        (11, "john smith"),
        (12, "john smyth"),
        (20, "alice jones"),
        (21, "alice jones"),   # exact dup
        (30, "unrelated name"),
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    got = {r["id"]: r["entity_id"] for r in resolve_entities(df, "name", "id", max_dist=1).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}
    # original columns survive
    cols = resolve_entities(df, "name", "id").columns
    assert cols == ["id", "name", "entity_id"]


def test_resolve_entities_clash_guard(spark):
    from zx_spark.operators.joins import resolve_entities

    df = spark.createDataFrame([(1, "x", 9)], "id int, name string, entity_id int")
    with pytest.raises(ValueError, match="rename them first"):
        resolve_entities(df, "name", "id")
    df2 = spark.createDataFrame([(1, "x", 9)], "id int, name string, component int")
    with pytest.raises(ValueError, match="rename them first"):
        resolve_entities(df2, "name", "id")

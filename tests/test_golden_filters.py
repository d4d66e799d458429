"""Golden filter tests — ports of reference filter_test (src/test.rs:23-84).

Expected id sets are pinned in FIXTURES.md §1 (derived from the reference's
10-row fixture, fixtures/test.cmd:1-66). Each comparator from §2.3 of SURVEY
is exercised against the same fixture.
"""

from __future__ import annotations

import pytest

from zx_spark.model import Cmp, Condition
from zx_spark.operators.filters import apply_conditions
from zx_spark.storage import zx_fixture

ALL = set(range(1, 11))

CASES = [
    (Condition("foo", Cmp.EQ, "200"), {2}),
    (Condition("foo", Cmp.NE, "200"), ALL - {2}),
    (Condition("foo", Cmp.GT, 200), {3, 4, 5, 6, 7, 8, 9, 10}),
    (Condition("foo", Cmp.LT, 200), {1}),
    (Condition("foo", Cmp.LTE, 200), {1, 2}),
    (Condition("foo", Cmp.GTE, 100), ALL),
    (Condition("y", Cmp.EXISTS), {1, 4, 10}),
    (Condition("y", Cmp.NOT_EXISTS), {2, 3, 5, 6, 7, 8, 9}),
    (Condition("tag", Cmp.CONTAINS, "t1"), {1, 2}),
    (Condition("tag", Cmp.NOT_CONTAINS, "t1"), {3, 4, 6}),
    (Condition("tag", Cmp.STARTS_WITH, "t2"), {4}),
    (Condition("tag", Cmp.NOT_STARTS_WITH, "t2"), {1, 2, 3, 6}),
]


@pytest.mark.parametrize("cond,expected", CASES, ids=[f"{c.cmp.value}" for c, _ in CASES])
def test_filter_golden(spark, cond, expected):
    df = apply_conditions(zx_fixture(spark), [cond])
    got = {r["id"] for r in df.select("id").collect()}
    assert got == expected


def test_and_chain(spark):
    # foo > 200 AND y EXISTS → {4, 10} (successive intersections,
    # reference src/lib.rs:197-200).
    conds = [Condition("foo", Cmp.GT, 200), Condition("y", Cmp.EXISTS)]
    got = {r["id"] for r in apply_conditions(zx_fixture(spark), conds).select("id").collect()}
    assert got == {4, 10}

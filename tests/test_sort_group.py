"""O1 aggregate-then-sort golden test — port of sort_group_test
(src/test.rs:459-526): one aggregate per whole group (no windows), groups
multi-key sorted asc/desc by the aggregate key."""

from __future__ import annotations

from zx_spark.compiler import run_sorted
from zx_spark.model import NIL, Aggregate, Query, Select
from zx_spark.storage import zx_fixture


def _order(spark, asc: bool):
    q = Query(
        selects=[Select("foo", Aggregate.MEAN)],
        group_by=["y"],
        order_by=[("$$mean(foo)", asc)],
    )
    return [(r["g_y"], r["mean__foo"]) for r in run_sorted(zx_fixture(spark), q).collect()]


def test_sort_group_asc(spark):
    assert _order(spark, True) == [
        ("1", 100.0),
        (NIL, 571.4285714285714),
        ("9", 700.0),
    ]


def test_sort_group_desc(spark):
    assert _order(spark, False) == [
        ("9", 700.0),
        (NIL, 571.4285714285714),
        ("1", 100.0),
    ]


def test_order_by_bare_group_column(spark):
    """ORDER BY a group-by column (a shape the SQL parser accepts): after
    the aggregate the column only exists as g_<col> — ordering must
    resolve through the alias, not crash UNRESOLVED_COLUMN."""
    q = Query(
        selects=[Select("foo", Aggregate.SUM)],
        group_by=["y"],
        order_by=[("y", False)],
    )
    got = [r["g_y"] for r in run_sorted(zx_fixture(spark), q).collect()]
    assert got == sorted(got, reverse=True)

"""CBO / table-statistics tests (r12): the SQL passthrough must OWN its
join order instead of inheriting the user's FROM clause.

The r11 Q5 measurement (SCALE.md r11) showed that without rowCount /
column statistics Catalyst keeps the WRITTEN join order: a dim-first
TPC-H Q5 chained broadcasts onto a one-partition streamed side with a
768 MiB orders build (8.3x growth for 100x data). register_views now
backs each view with an ANALYZEd catalog table and enables
spark.sql.cbo.(joinReorder.)enabled, so CostBasedJoinReorder compiles
the same dim-first text to a reduced-side-first plan.
"""

from __future__ import annotations

import re

from zx_spark.storage import register_views

SF = "/root/testdata/sf0.01"

TPCH_TABLES = ["region", "nation", "customer", "supplier", "orders", "lineitem"]

# The natural dims-first TPC-H Q5 phrasing — the shape every passthrough
# user writes first, and the one that measured the r11 cliff.
DIM_FIRST_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue
FROM region JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def _leaf_order(plan: str) -> list[str]:
    """Join-leaf table names in plan-print order (written order ==
    left-deep chain order when no reordering fired)."""
    names = re.findall(r"Relation[^\n\[]*?(\w+)\[", plan)
    # catalog tables print as spark_catalog.default.zx_stats_<name>_<digest>
    out = []
    for n in names:
        m = re.match(r"zx_stats_([a-z]+)_[0-9a-f]+", n)
        out.append(m.group(1) if m else n)
    return out


def test_register_views_attaches_rowcount_stats(spark):
    register_views(spark, SF, tables=TPCH_TABLES)
    assert spark.conf.get("spark.sql.cbo.enabled") == "true"
    assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "true"
    stats = (
        spark.table("lineitem")
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
    )
    assert stats.rowCount().isDefined(), "ANALYZE rowCount missing on lineitem view"
    assert int(str(stats.rowCount().get())) > 0


def test_dim_first_q5_join_order_is_reordered(spark):
    """The ORIGINAL dim-first Q5 text must NOT compile to the written
    left-deep chain: CBO reorders so the lineitem fact joins against a
    reduced subtree instead of streaming through a dim-chain broadcast."""
    register_views(spark, SF, tables=TPCH_TABLES)
    df = spark.sql(DIM_FIRST_Q5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    order = _leaf_order(plan)
    assert sorted(order) == sorted(TPCH_TABLES), order
    written = ["region", "nation", "customer", "orders", "lineitem", "supplier"]
    assert order != written, "CostBasedJoinReorder did not change the join order"
    # the fact table must sit at the TOP of the join tree (joined last,
    # against the fully-reduced side), not mid-chain feeding more joins
    assert order[-1] == "lineitem" or order[-2:] == ["lineitem", "supplier"], order
    # and the reordered plan still returns rows
    assert df.count() > 0


def test_dim_first_matches_fact_first_values(spark):
    """Same rows whichever way the user wrote the FROM clause."""
    register_views(spark, SF, tables=TPCH_TABLES)
    fact_first = (
        "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue "
        "FROM lineitem JOIN ("
        "SELECT o_orderkey, c_nationkey, n_name FROM orders "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation ON n_nationkey = c_nationkey "
        "JOIN region ON r_regionkey = n_regionkey "
        "WHERE r_name = 'ASIA') oc ON l_orderkey = oc.o_orderkey "
        "JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = oc.c_nationkey "
        "GROUP BY n_name"
    )
    a = {(r["n_name"], r["revenue"]) for r in spark.sql(DIM_FIRST_Q5).collect()}
    b = {(r["n_name"], r["revenue"]) for r in spark.sql(fact_first).collect()}
    assert a == b and len(a) > 0


def test_register_views_plain_fallback(spark):
    """with_stats=False keeps the r11 behavior: plain parquet-scan temp
    views, no catalog tables required."""
    register_views(spark, SF, tables=["nation"], with_stats=False)
    assert spark.table("nation").count() == 25

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


def _leaf_order(df) -> list[str]:
    """Join-leaf table names in tree order — a STRUCTURAL depth-first
    walk of the optimized logical plan's JVM tree (VERDICT r12 item 4:
    no string parsing of plan output, so a Spark upgrade that changes
    ``Relation`` printing cannot silently weaken the assertions).
    Catalog-table leaves resolve through ``catalogTable`` (the
    ``zx_stats_<name>_<digest>`` backing tables map back to their store
    name); path-backed leaves through the relation's root path."""
    out: list[str] = []

    def _leaf_name(node) -> str | None:
        try:
            ct = node.catalogTable()
            if ct.isDefined():
                return str(ct.get().identifier().table())
        except Exception:
            pass
        try:
            rp = node.relation().location().rootPaths()
            base = rp.apply(0).toString().rstrip("/").rsplit("/", 1)[-1]
            return base[:-8] if base.endswith(".parquet") else base
        except Exception:
            return None

    def _walk(node):
        kids = node.children()
        n = kids.size()
        if n == 0:
            name = _leaf_name(node)
            if name is not None:
                m = re.match(r"zx_stats_([a-z]+)_[0-9a-f]+", name)
                out.append(m.group(1) if m else name)
            return
        for i in range(n):
            _walk(kids.apply(i))

    _walk(df._jdf.queryExecution().optimizedPlan())
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
    order = _leaf_order(df)
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


def _mk_events(spark, n: int, id_offset: int = 0):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") + id_offset).alias("event_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") % 10).cast("double").alias("value"),
    )


def test_stats_lifecycle_on_append(spark, tmp_path):
    """VERDICT r12 item 2 / What's-wrong #1: statistics are per STORE
    VERSION. A store appended to AFTER registration must not keep its
    stale rowCount for the rest of the session — ``write_events``
    invalidates the ANALYZE memo, so re-registering re-ANALYZEs and
    both CBO and the session-window gate (``_plan_row_estimate``) see
    the 100×-grown cardinality."""
    from zx_spark.operators.windows import _plan_row_estimate
    from zx_spark.storage import write_events

    sf_dir = str(tmp_path)
    path = f"{sf_dir}/events.parquet"
    _mk_events(spark, 100).write.mode("overwrite").parquet(path)
    register_views(spark, sf_dir, tables=["events"])
    assert _plan_row_estimate(spark.table("events")) == 100

    write_events(_mk_events(spark, 9900, id_offset=100), path, partition_by_day=False)
    register_views(spark, sf_dir, tables=["events"])
    est = _plan_row_estimate(spark.table("events"))
    assert est == 10000, f"stale rowCount survived the append: {est}"


def test_stats_lifecycle_on_truncate_refreshes_file_listing(spark, tmp_path):
    """The in-place rewrite half (ADVICE r12 low): after truncate the
    catalog must not serve the OLD file listing (deleted part files) —
    ``invalidate_stats`` runs ``refreshByPath``, so the re-registered
    view reads the new (empty) store and carries its rowCount."""
    from zx_spark.operators.windows import _plan_row_estimate
    from zx_spark.storage import truncate_events

    sf_dir = str(tmp_path)
    path = f"{sf_dir}/events.parquet"
    _mk_events(spark, 500).write.mode("overwrite").parquet(path)
    register_views(spark, sf_dir, tables=["events"])
    assert spark.table("events").count() == 500

    truncate_events(spark, path)
    register_views(spark, sf_dir, tables=["events"])
    assert spark.table("events").count() == 0
    assert _plan_row_estimate(spark.table("events")) == 0


def test_register_views_array_table_gets_rowcount(spark):
    """r13: ANALYZE FOR ALL COLUMNS REJECTS nested types (ARRAY<FLOAT>
    on embeddings) — the registration must fall to scalar-column stats
    instead of silently degrading to a stats-less view (which would
    disable CostBasedJoinReorder for every join touching the table)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        register_views(spark, SF, tables=["embeddings"])
    stats = (
        spark.table("embeddings")._jdf.queryExecution().optimizedPlan().stats()
    )
    assert stats.rowCount().isDefined(), "embeddings view lost its rowCount"
    assert int(str(stats.rowCount().get())) > 0


def test_register_views_plain_fallback(spark):
    """with_stats=False keeps the r11 behavior: plain parquet-scan temp
    views, no catalog tables required."""
    register_views(spark, SF, tables=["nation"], with_stats=False)
    assert spark.table("nation").count() == 25

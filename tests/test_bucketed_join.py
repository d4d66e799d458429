"""Co-located join via bucketing: two tables bucketed on the join key with
equal bucket counts must sort-merge-join with NO shuffle exchange — the
repeated-big-join layout for 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from zx_spark.storage import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    events = spark.range(0, 2000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
    )
    users = spark.range(0, 100).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )
    write_bucketed(events, "ev_b", str(tmp_path / "ev"), "user_id", buckets=8)
    write_bucketed(users, "us_b", str(tmp_path / "us"), "user_id", buckets=8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("ev_b").join(spark.table("us_b"), "user_id")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # The whole point: bucket layout replaces the shuffle.
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS us_b")

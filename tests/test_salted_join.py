"""Salted skew-join: result must equal the plain join exactly; the plan
must shuffle on (key, salt) so a hot key spreads over reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from zx_spark.operators.joins import salted_join


def test_salted_join_matches_plain_join(spark):
    # Heavily skewed big side: 90% of rows share key 0.
    big = spark.range(0, 5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2.0).alias("v"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    plain = big.join(small, "k").select("row_id", "k", "v", "name")
    salted = salted_join(big, small, "k", salts=8).select("row_id", "k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left(spark):
    big = spark.range(0, 50).select(F.col("id").alias("k"))
    small = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("name"))
    out = salted_join(big, small, "k", salts=4, how="left")
    assert out.count() == 50
    assert out.filter(F.col("name").isNull()).count() == 40  # unmatched keys kept


def test_salted_join_rejects_outer(spark):
    import pytest

    big = spark.range(0, 5).select(F.col("id").alias("k"))
    small = spark.range(0, 2).select(F.col("id").alias("k"), F.lit("x").alias("name"))
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)

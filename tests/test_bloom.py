"""Bloom-prefilter semi/anti joins: exactness against plain
left_semi/left_anti on the driver events table, NULL-key semantics,
the no-shuffle prefilter plan shape, pinned-geometry path, and sizing
validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.bloom import (
    bloom_anti_join,
    bloom_bitmap,
    bloom_semi_join,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    from zx_spark.storage import read_table

    return read_table(spark, SF, "events")


@pytest.fixture(scope="module")
def error_users(spark, events):
    return events.filter(F.col("event_type") == "error").select("user_id")


def _ids(df):
    return sorted(r["event_id"] for r in df.select("event_id").collect())


def test_semi_exactness(spark, events, error_users):
    got = bloom_semi_join(events, error_users, "user_id")
    exp = events.join(error_users.distinct(), "user_id", "left_semi")
    assert _ids(got) == _ids(exp)
    assert len(_ids(got)) > 0


def test_anti_exactness(spark, events, error_users):
    got = bloom_anti_join(events, error_users, "user_id")
    exp = events.join(error_users.distinct(), "user_id", "left_anti")
    assert _ids(got) == _ids(exp)
    # semi + anti partition the corpus
    assert len(_ids(got)) + events.join(
        error_users.distinct(), "user_id", "left_semi"
    ).count() == events.count()


def test_null_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, k string"
    )
    keys = spark.createDataFrame([("a",)], "k string")
    semi = bloom_semi_join(df, keys, "k", m_bits=512, k=3)
    anti = bloom_anti_join(df, keys, "k", m_bits=512, k=3)
    assert sorted(r["id"] for r in semi.collect()) == [1]
    # NULL-keyed row survives the anti join, like Spark's left_anti
    assert sorted(r["id"] for r in anti.collect()) == [2, 3]


def test_prefilter_superset_and_fpp(spark):
    corpus = spark.range(0, 20000).select(F.col("id").alias("k"))
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    pre = bloom_semi_join(corpus, keys, "k", fpp=0.01, exact=False)
    n_pre = pre.count()
    assert n_pre >= 500  # no false negatives, ever
    # ~1% fpp on 19.5k non-members — allow a generous 5x margin
    assert n_pre - 500 <= 0.05 * 19500


def test_prefilter_is_pure_map_side(spark, events, error_users):
    """exact=False is the scale contract: a literal-bitmap Filter over
    the scan — no join, no shuffle, no Python."""
    pre = bloom_semi_join(events, error_users, "user_id", exact=False)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_join_only_shuffles_survivors(spark, events, error_users):
    got = bloom_semi_join(events, error_users, "user_id")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the corpus side entering the join is the bloom-Filtered scan
    assert "forall" in plan or "exists" in plan or "element_at" in plan


def test_pinned_geometry_skips_sizing(spark, events, error_users):
    got = bloom_semi_join(events, error_users, "user_id", m_bits=8192, k=5)
    exp = events.join(error_users.distinct(), "user_id", "left_semi")
    assert got.count() == exp.count()


def test_bitmap_shape(spark, error_users):
    words, m, k, n = bloom_bitmap(error_users, "user_id", fpp=0.01)
    assert m % 64 == 0 and len(words) == m // 64
    assert 1 <= k <= 16 and n > 0
    assert any(w != 0 for w in words)


def test_sizing_validation(spark, error_users):
    with pytest.raises(ValueError):
        bloom_semi_join(
            spark.range(10).select(F.col("id").alias("k")),
            spark.range(10).select(F.col("id").alias("k")),
            "k",
            fpp=1.5,
        )
    with pytest.raises(ValueError):
        # absurdly tight fpp forces m past max_bits
        bloom_bitmap(error_users, "user_id", fpp=1e-300, max_bits=1 << 12)


@pytest.mark.parametrize(
    "n,m,k",
    [
        (2000, 1 << 14, 5),   # theoretical fpp ~2.0%
        (2000, 1 << 13, 3),   # ~14%
        (4000, 1 << 15, 6),   # ~2.0%
    ],
)
def test_measured_fpp_matches_theory(spark, n, m, k):
    """Property (r7): the md5-derived positions behave like independent
    uniform hashes — the MEASURED false-positive rate of the
    ``exact=False`` prefilter over disjoint probe keys lands within a
    3-sigma-ish band of the textbook (1 - e^{-kn/m})^k, across m/k
    geometries. Also pins the no-false-negative guarantee."""
    import math

    probes_n = 20000
    members = spark.range(n).select(F.col("id").cast("string").alias("key"))
    probes = spark.range(n, n + probes_n).select(
        F.col("id").cast("string").alias("key")
    )
    # no false negatives: every member passes its own filter
    kept = bloom_semi_join(members, members, "key", m_bits=m, k=k, exact=False)
    assert kept.count() == n
    fp = bloom_semi_join(probes, members, "key", m_bits=m, k=k, exact=False).count()
    theo = (1.0 - math.exp(-k * n / m)) ** k
    measured = fp / probes_n
    sigma = math.sqrt(theo * (1.0 - theo) / probes_n)
    assert abs(measured - theo) < 4 * sigma + 0.15 * theo, (
        f"measured fpp {measured:.5f} vs theoretical {theo:.5f} (m={m}, k={k})"
    )

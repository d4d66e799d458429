"""cluster_store: rewriting a store clustered (range or Z-order) makes
row-group min/max statistics selective — the physical property parquet
readers use to skip row groups — while the data stays identical."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from zx_spark.storage import cluster_store, read_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    df = read_table(spark, SF_DIR, "events").drop("props").cache()
    yield df
    df.unpersist()


def _match_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups whose [min, max] stats intersect [lo, hi] —
    exactly the row groups a stats-pruning reader must read."""
    hit = total = 0
    for f in glob.glob(f"{path}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:  # no stats: must read
                hit += 1
            elif st.min <= hi and st.max >= lo:
                hit += 1
    assert total >= 8, f"need enough row groups to measure, got {total}"
    return hit / total


def _checksum(spark, path):
    return sorted(map(tuple, spark.read.parquet(path).collect()))


def test_range_cluster_tightens_leading_column(spark, events, tmp_path):
    path = str(tmp_path / "store")
    events.repartition(8).write.parquet(path)  # round-robin: scrambled
    before = _checksum(spark, path)
    uid = events.select("user_id").first()["user_id"]

    base = _match_fraction(path, "user_id", uid, uid)
    assert base >= 0.8  # every scrambled row group spans the id range

    report = cluster_store(spark, path, ["user_id"], target_file_mb=0.02)
    assert report["rows"] == len(before)
    assert _checksum(spark, path) == before

    frac = _match_fraction(path, "user_id", uid, uid)
    assert frac <= 0.2, f"range cluster left {frac:.0%} row groups matching"


def test_zorder_tightens_both_columns(spark, events, tmp_path):
    # target_file_mb sized for ~38 row groups (r8): at the old 0.02 the
    # store came out at ~15 groups, where the rewrite's inherent
    # geometry jitter (range-exchange sampling + approxQuantile grid,
    # ±1-2 groups run-to-run) left u_frac ≈ 0.38-0.43 against the 0.5
    # bound — a one-in-many-runs flake the r7 verdict caught. More,
    # smaller groups concentrate the fraction at ~0.2 with 2.5× margin.
    path = str(tmp_path / "store")
    events.repartition(8).write.parquet(path)
    before = _checksum(spark, path)
    uid = events.select("user_id").first()["user_id"]

    assert _match_fraction(path, "user_id", uid, uid) >= 0.8
    assert _match_fraction(path, "value", 100.0, 110.0) >= 0.8

    cluster_store(spark, path, ["user_id", "value"],
                  target_file_mb=0.008, zorder=True)
    assert _checksum(spark, path) == before

    u_frac = _match_fraction(path, "user_id", uid, uid)
    v_frac = _match_fraction(path, "value", 100.0, 110.0)
    # Z-order bounds BOTH dimensions; single-column sort would leave the
    # trailing column's fraction at ~1.0.
    assert u_frac <= 0.5, f"user_id row-group match fraction {u_frac:.0%}"
    assert v_frac <= 0.5, f"value row-group match fraction {v_frac:.0%}"


def test_cluster_validation(spark, events, tmp_path):
    path = str(tmp_path / "v")
    events.limit(10).write.parquet(path)
    with pytest.raises(ValueError, match="at least one column"):
        cluster_store(spark, path, [])
    with pytest.raises(ValueError, match="not in"):
        cluster_store(spark, path, ["nope"])
    with pytest.raises(ValueError, match="numeric"):
        cluster_store(spark, path, ["event_type"], zorder=True)


def test_store_stats_reports_skippability(spark, tmp_path):
    import pytest

    from zx_spark.storage import cluster_store, store_stats

    p = str(tmp_path / "stats_store")
    spark.range(0, 20000).selectExpr(
        "id AS k", "cast(id % 97 AS double) AS v"
    ).repartition(8).write.parquet(p)
    pre = store_stats(p, columns=["k", "v"])
    assert pre["files"] >= 8 and pre["rows"] == 20000
    assert pre["columns"]["k"]["min"] == 0 and pre["columns"]["k"]["max"] == 19999
    # random layout: k ranges overlap heavily across groups
    assert pre["columns"]["k"]["overlap_fraction"] > 0.8
    cluster_store(spark, p, ["k"], target_file_mb=1.0)
    post = store_stats(p, columns=["k"])
    # range clustering makes k row groups (nearly) disjoint
    assert post["columns"]["k"]["overlap_fraction"] < 0.3
    assert post["rows"] == 20000
    with pytest.raises(ValueError):
        store_stats(str(tmp_path / "missing"))

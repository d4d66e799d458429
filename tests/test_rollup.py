"""Hypertable rollup (continuous aggregates): rollup-derived answers must
EXACTLY match the direct windowed-aggregate path, merges must be lossless,
and the rollup must actually be small."""

from __future__ import annotations

import glob
import math

import pytest
from pyspark.sql import functions as F

from zx_spark.compiler import compile_query
from zx_spark.model import Aggregate, Query, Select
from zx_spark.operators.rollup import (
    BUCKET,
    build_rollup,
    coarsen_rollup,
    merge_rollups,
    rollup_answer,
)
from zx_spark.storage import read_table

SF_DIR = "/root/testdata/sf0.001"
BASE_S = 300.0
COARSE_S = 3600.0
EXACT_SELECTS = [
    Select("value", Aggregate.SUM),
    Select("value", Aggregate.COUNT),
    Select("value", Aggregate.MIN),
    Select("value", Aggregate.MAX),
    Select("value", Aggregate.MEAN),
]


@pytest.fixture(scope="module")
def events(spark):
    # g_event_type mirrors compile_query's __nil group-key materialization
    # so rollup output columns line up with the compiler's. Unpersist on
    # teardown so the cached plan can't be substituted into other tests'
    # plan-shape assertions.
    df = (
        read_table(spark, SF_DIR, "events")
        .withColumn("g_event_type", F.coalesce(F.col("event_type"), F.lit("__nil")))
        .cache()
    )
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def base_rollup(events):
    df = build_rollup(
        events,
        value_cols=["value"],
        group_cols=["g_event_type"],
        granularity_s=BASE_S,
        rate_col=None,
    ).cache()
    yield df
    df.unpersist()


def _by_key(rows, aliases):
    out = {}
    for r in rows:
        key = (r["g_event_type"], round(r["window_start"], 6), round(r["window_end"], 6))
        out[key] = tuple(r[a] for a in aliases)
    return out


def test_rollup_answers_match_direct_query(spark, events, base_rollup):
    """coarsen(base 5m -> 1h) + finalize == compile_query aligned 1h —
    value-for-value, including window_start/end event-ts conventions."""
    coarse = coarsen_rollup(base_rollup, BASE_S, COARSE_S, group_cols=["g_event_type"])
    got = rollup_answer(coarse, EXACT_SELECTS, group_cols=["g_event_type"]).collect()

    q = Query(selects=EXACT_SELECTS, group_by=["event_type"], granularity_s=COARSE_S)
    want = compile_query(
        events, q, id_col="event_id", ts_col="ts", rate_col=None
    ).collect()

    aliases = [s.alias for s in EXACT_SELECTS]
    got_m, want_m = _by_key(got, aliases), _by_key(want, aliases)
    assert set(got_m) == set(want_m)
    assert len(got_m) > 1
    for k, vals in want_m.items():
        for g, w in zip(got_m[k], vals):
            assert g == pytest.approx(w, rel=1e-9), (k, got_m[k], vals)


def test_merge_rollups_is_incremental_maintenance(events, base_rollup):
    """rollup(half A) ⊎ rollup(half B) == rollup(all) — the late-data /
    incremental-update path is just union + re-merge of partials."""
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    kw = dict(
        value_cols=["value"], group_cols=["g_event_type"],
        granularity_s=BASE_S, rate_col=None,
    )
    merged = merge_rollups(
        build_rollup(half_a, **kw), build_rollup(half_b, **kw),
        group_cols=["g_event_type"],
    )
    sel = EXACT_SELECTS
    aliases = [s.alias for s in sel]
    got = _by_key(rollup_answer(merged, sel, group_cols=["g_event_type"]).collect(), aliases)
    want = _by_key(rollup_answer(base_rollup, sel, group_cols=["g_event_type"]).collect(), aliases)
    assert set(got) == set(want)
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert g == pytest.approx(w, rel=1e-9)


def test_hll_distinct_survives_merge(events, base_rollup):
    """Sketch-backed distinct stays within tolerance after coarsening —
    the mergeable path exact COUNT_DISTINCT cannot take."""
    sel = [Select("user_id", Aggregate.COUNT_DISTINCT_APPROX)]
    rolled = build_rollup(
        events, value_cols=["user_id"], group_cols=["g_event_type"],
        granularity_s=BASE_S, rate_col=None,
    )
    coarse = coarsen_rollup(rolled, BASE_S, COARSE_S, group_cols=["g_event_type"])
    got = rollup_answer(coarse, sel, group_cols=["g_event_type"]).collect()

    exact = (
        events.groupBy(
            "g_event_type",
            (F.floor(F.col("ts").cast("double") / COARSE_S) * COARSE_S).alias("b"),
        )
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    )
    exact_m = {(r["g_event_type"], r["b"]): r["d"] for r in exact}
    assert len(got) == len(exact_m)
    for r in got:
        key = (r["g_event_type"], math.floor(r["window_start"] / COARSE_S) * COARSE_S)
        est = r[sel[0].alias]
        assert est == pytest.approx(exact_m[key], rel=0.06), key


def test_rollup_is_small_and_validates(events, base_rollup):
    # Structural invariants (compression itself grows with events-per-
    # bucket, so a fixed ratio would just test the fixture's time span):
    # rows = one per (group, bucket), n_rows partials account for every
    # event exactly once, and coarsening strictly compresses.
    n_events = events.count()
    coarse = coarsen_rollup(base_rollup, BASE_S, 86400.0, group_cols=["g_event_type"])
    assert base_rollup.agg(F.sum(F.col("n_rows"))).collect()[0][0] == n_events
    assert coarse.agg(F.sum(F.col("n_rows"))).collect()[0][0] == n_events
    assert coarse.count() < base_rollup.count() < n_events
    with pytest.raises(ValueError, match="integer"):
        coarsen_rollup(base_rollup, BASE_S, 450.0)
    with pytest.raises(ValueError, match="not answerable"):
        rollup_answer(base_rollup, [Select("value", Aggregate.P50)])
    with pytest.raises(ValueError, match="positive"):
        build_rollup(events, value_cols=["value"], granularity_s=0)


def test_streaming_rollup_sink_matches_batch_build(spark, events, base_rollup, tmp_path):
    """foreachBatch-appended partials, merged on read (and after
    compaction), equal the one-shot batch rollup — late data and batch
    boundaries are invisible to mergeable partials."""
    from zx_spark.operators.rollup import compact_rollup, read_merged_rollup, rollup_sink

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    # 4 source files → 4 micro-batches with maxFilesPerTrigger=1, so the
    # same (group, bucket) accretes partial rows across batches.
    events.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rollup_sink(
        stream, store, value_cols=["value"], group_cols=["g_event_type"],
        granularity_s=BASE_S, rate_col=None,
        checkpoint_dir=str(tmp_path / "cp"), available_now=True,
    ).awaitTermination()

    raw = spark.read.parquet(store)
    assert raw.count() > base_rollup.count()  # duplicate buckets pre-merge

    aliases = [s.alias for s in EXACT_SELECTS]
    want = _by_key(
        rollup_answer(base_rollup, EXACT_SELECTS, group_cols=["g_event_type"]).collect(),
        aliases,
    )

    def check(rollup_df):
        got = _by_key(
            rollup_answer(rollup_df, EXACT_SELECTS, group_cols=["g_event_type"]).collect(),
            aliases,
        )
        assert set(got) == set(want)
        for k in want:
            for g, w in zip(got[k], want[k]):
                assert g == pytest.approx(w, rel=1e-9)

    check(read_merged_rollup(spark, store, group_cols=["g_event_type"]))

    # At-least-once replay: re-delivering a micro-batch overwrites its
    # epoch directory instead of double-counting (foreachBatch retries).
    epochs = sorted(glob.glob(f"{store}/epoch=*"))
    assert len(epochs) == 4
    replay = spark.read.parquet(epochs[0])
    replay.write.mode("overwrite").parquet(str(tmp_path / "replay_stage"))
    spark.read.parquet(str(tmp_path / "replay_stage")).write.mode(
        "overwrite"
    ).parquet(epochs[0])
    check(read_merged_rollup(spark, store, group_cols=["g_event_type"]))

    compact_rollup(spark, store, group_cols=["g_event_type"])
    compacted = read_merged_rollup(spark, store, group_cols=["g_event_type"])
    assert compacted.count() == base_rollup.count()  # one row per bucket
    check(compacted)


def test_p50_approx_from_histogram_partials(spark, events):
    """Quantiles from per-bin count partials: estimate within one bin
    width of the discrete median (the ⌈n/2⌉-th order statistic — the
    histogram's bound target) at BOTH granularities (bin sums coarsen
    losslessly), and a domain mismatch fails loudly."""
    from zx_spark.operators.rollup import QUANTILE_BINS

    lo, hi, nb = QUANTILE_BINS
    bin_w = (hi - lo) / nb
    r5m = build_rollup(
        events, ["value"], ["g_event_type"], granularity_s=BASE_S,
        rate_col=None, distinct_sketch=False, quantile_bins=QUANTILE_BINS,
    )
    sel = [Select("value", Aggregate.P50_APPROX)]

    for rollup_df, gran in ((r5m, BASE_S),
                            (coarsen_rollup(r5m, BASE_S, COARSE_S,
                                            group_cols=["g_event_type"]), COARSE_S)):
        got = {
            (r["g_event_type"], r["window_start"] // gran): r["p50_approx__value"]
            for r in rollup_answer(
                rollup_df, sel, group_cols=["g_event_type"]
            ).collect()
        }
        vals = {
            (r["g_event_type"], r["b"]): sorted(r["vs"])
            for r in events.groupBy(
                "g_event_type",
                F.floor(F.col("ts").cast("double") / gran).alias("b"),
            )
            .agg(F.collect_list(F.col("value").cast("double")).alias("vs"))
            .collect()
        }
        assert set(got) == set(vals)
        for k, vs in vals.items():
            if not vs:  # all-null window
                assert got[k] is None
            else:
                want = vs[math.ceil(0.5 * len(vs)) - 1]  # percentile_disc
                assert abs(got[k] - want) <= bin_w, (k, got[k], want)

    with pytest.raises(ValueError, match="no 64-bin histogram"):
        rollup_answer(
            r5m, [Select("value", Aggregate.P50_APPROX, params=(lo, hi, 64))],
            group_cols=["g_event_type"],
        )
    no_hist = build_rollup(
        events, ["value"], ["g_event_type"], granularity_s=BASE_S,
        rate_col=None, distinct_sketch=False,
    )
    with pytest.raises(ValueError, match="no 32-bin histogram"):
        rollup_answer(no_hist, sel, group_cols=["g_event_type"])


def test_rollup_answer_scans_only_rollup(spark, base_rollup, tmp_path):
    """Answering from a stored rollup reads the rollup parquet, not events —
    and the finalize is a pure projection (no shuffle, no Python)."""
    path = str(tmp_path / "rollup_5m")
    base_rollup.write.parquet(path)
    stored = spark.read.parquet(path)
    plan = rollup_answer(
        stored, EXACT_SELECTS, group_cols=["g_event_type"]
    )._jdf.queryExecution().executedPlan().toString()
    # The scan's ReadSchema is the rollup's partial columns, not event rows.
    assert "value__sum_wx" in plan
    assert "events" not in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_p50_approx_repeated_select_no_helper_collision(spark, events):
    """Helper columns are keyed by select index: repeating P50_APPROX in
    one select list (and mixing it with other columns' quantiles) must
    not cross-wire the bin arrays (ADVICE r4)."""
    from zx_spark.operators.rollup import QUANTILE_BINS

    r5m = build_rollup(
        events, ["value", "user_id"], ["g_event_type"], granularity_s=BASE_S,
        rate_col=None, distinct_sketch=False, quantile_bins=QUANTILE_BINS,
    )
    single_v = {
        (r["g_event_type"], r["window_start"]): r["p50_approx__value"]
        for r in rollup_answer(
            r5m, [Select("value", Aggregate.P50_APPROX)], group_cols=["g_event_type"]
        ).collect()
    }
    single_u = {
        (r["g_event_type"], r["window_start"]): r["p50_approx__user_id"]
        for r in rollup_answer(
            r5m, [Select("user_id", Aggregate.P50_APPROX)], group_cols=["g_event_type"]
        ).collect()
    }
    both = rollup_answer(
        r5m,
        [
            Select("value", Aggregate.P50_APPROX),
            Select("user_id", Aggregate.P50_APPROX),
            Select("value", Aggregate.P50_APPROX),
        ],
        group_cols=["g_event_type"],
    )
    assert both.columns.count("p50_approx__value") == 2
    for r in both.collect():
        k = (r["g_event_type"], r["window_start"])
        vals = [r[i] for i in range(len(both.columns))]
        got_v1, got_u, got_v2 = vals[-3], vals[-2], vals[-1]
        assert got_v1 == single_v[k] == got_v2
        assert got_u == single_u[k]


def test_quantile_approx_p90_raw_and_rollup_paths(spark):
    """QUANTILE_APPROX: percentile_approx on raw events; histogram
    interpolation from rollup partials — both within a bin width of the
    exact order statistic, and P50_APPROX == QUANTILE_APPROX(0.5)."""
    import pytest
    from zx_spark.compiler import compile_query
    from zx_spark.model import Aggregate, Query, Select
    from zx_spark.operators.rollup import (
        build_rollup,
        rollup_answer,
        _merge,
    )
    from zx_spark.storage import read_table

    ev = read_table(spark, "/root/testdata/sf0.01", "events")
    q90 = Query(
        selects=[Select("value", Aggregate.QUANTILE_APPROX, params=(0.9,))],
        group_by=["event_type"],
    )
    raw = {
        r["g_event_type"]: r["p90_approx__value"]
        for r in compile_query(ev, q90, id_col="event_id", rate_col=None).collect()
    }
    exact = {
        r["event_type"]: r["p90"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.9)").alias("p90"))
        .collect()
        if r["event_type"] is not None
    }
    for k, want in exact.items():
        assert abs(raw[k] - want) / max(abs(want), 1) < 0.05, k

    # rollup path: p90 and p50 from the same histogram partials
    evg = ev.withColumn(
        "g_event_type", F.coalesce(F.col("event_type").cast("string"), F.lit("__nil"))
    )
    r5m = build_rollup(
        evg, ["value"], ["g_event_type"], granularity_s=300, rate_col=None,
        distinct_sketch=False, quantile_bins=(0.0, 1000.0, 32),
    )
    merged = _merge(r5m.drop("bucket"), ["g_event_type"], F.lit(0.0).cast("double"))
    out = rollup_answer(
        merged,
        [
            Select("value", Aggregate.QUANTILE_APPROX, params=(0.9, 0.0, 1000.0, 32)),
            Select("value", Aggregate.P50_APPROX),
        ],
        group_cols=["g_event_type"],
    )
    bin_w = 1000.0 / 32
    for r in out.collect():
        g = r["g_event_type"]
        if g == "__nil" or g not in exact:
            continue
        assert abs(r["p90_approx__value"] - exact[g]) <= 2 * bin_w, g
        assert r["p50_approx__value"] is not None
    with pytest.raises(ValueError):
        compile_query(
            ev,
            Query(selects=[Select("value", Aggregate.QUANTILE_APPROX)]),
            id_col="event_id", rate_col=None,
        )
    # ADVICE r5: QUANTILE_APPROX(0.5) would alias to 'p50_approx__value',
    # silently duplicating P50_APPROX's column — both paths must reject it
    with pytest.raises(ValueError, match="P50_APPROX"):
        compile_query(
            ev,
            Query(selects=[Select("value", Aggregate.QUANTILE_APPROX, params=(0.5,))]),
            id_col="event_id", rate_col=None,
        )
    with pytest.raises(ValueError, match="P50_APPROX"):
        rollup_answer(
            merged,
            [Select("value", Aggregate.QUANTILE_APPROX, params=(0.5,))],
            group_cols=["g_event_type"],
        )

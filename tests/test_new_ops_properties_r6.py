"""Property tests for the round-6 operators (hypothesis): invariants
that hold for ANY input, not just the fixtures — AUC monotone-transform
invariance, packing conservation laws, span/strip consistency, and
path-count identities under input permutation."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------- AUC

scored_rows = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.booleans(),
    ),
    min_size=4,
    max_size=40,
).filter(lambda rs: any(y for _, y in rs) and any(not y for _, y in rs))


@SET
@given(rows=scored_rows)
def test_auc_invariant_under_monotone_transform(spark, rows):
    """AUC depends only on the score ORDERING: any strictly increasing
    transform (here 3x+7, and cubing which preserves order on ints)
    leaves it unchanged, ties included."""
    from zx_spark.operators.evaluate import roc_auc

    df = spark.createDataFrame(rows, "s long, y boolean")
    base = roc_auc(df, "s", "y").collect()[0]["auc"]
    lin = df.selectExpr("s * 3 + 7 AS s", "y")
    cub = df.selectExpr("CAST(s AS DOUBLE) * s * s AS s", "y")
    assert roc_auc(lin, "s", "y").collect()[0]["auc"] == base
    assert roc_auc(cub, "s", "y").collect()[0]["auc"] == pytest.approx(
        base, abs=1e-6
    )


@SET
@given(rows=scored_rows)
def test_auc_label_flip_complements(spark, rows):
    """Flipping every label maps AUC -> 1 - AUC (rank-sum symmetry)."""
    from zx_spark.operators.evaluate import roc_auc

    df = spark.createDataFrame(rows, "s long, y boolean")
    a = roc_auc(df, "s", "y").collect()[0]["auc"]
    b = roc_auc(df.selectExpr("s", "NOT y AS y"), "s", "y").collect()[0]["auc"]
    assert a + b == pytest.approx(1.0, abs=2e-6)


# ------------------------------------------------------------ packing

pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**6),  # id (unique-ified below)
        st.integers(min_value=0, max_value=1000),   # order
        st.integers(min_value=1, max_value=50),     # length
    ),
    min_size=1,
    max_size=40,
)


@SET
@given(rows=pack_rows, target=st.integers(min_value=1, max_value=64))
def test_pack_concat_conservation(spark, rows, target):
    """Token positions tile the stream exactly: sorted tok_starts are
    the prefix sums of lengths, every doc's window count is
    last-first+1, and the max end equals the total token count."""
    from zx_spark.operators.packing import pack_concat

    rows = [(i, float(o), l) for i, (_, o, l) in enumerate(rows)]  # unique ids
    df = spark.createDataFrame(rows, "doc_id long, ord double, n_tok long")
    out = pack_concat(df, "n_tok", "ord", "doc_id", target, n_parts=3).collect()
    by_order = sorted(out, key=lambda r: (r["ord"], r["doc_id"]))
    cum = 0
    for r in by_order:
        assert r["tok_start"] == cum
        assert r["first_pack"] == cum // target
        assert r["last_pack"] == (cum + r["n_tok"] - 1) // target
        assert r["offset_in_pack"] == cum % target
        assert r["n_splits"] == r["last_pack"] - r["first_pack"]
        cum += r["n_tok"]
    assert cum == sum(l for _, _, l in rows)


@SET
@given(
    rows=pack_rows,
    target=st.integers(min_value=50, max_value=120),
    n_parts=st.integers(min_value=1, max_value=4),
)
def test_pack_greedy_capacity_and_conservation(spark, rows, target, n_parts):
    """Every bin respects capacity; every doc appears exactly once; the
    per-bin fill equals the sum of its members."""
    from zx_spark.operators.packing import pack_greedy

    rows = [(i, l) for i, (_, _, l) in enumerate(rows)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_greedy(df, "n_tok", "doc_id", target, n_parts=n_parts).collect()
    assert sorted(r["doc_id"] for r in out) == [i for i, _ in rows]
    fills: dict = {}
    for r in out:
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["n_tok"]
    for r in out:
        assert fills[r["pack_id"]] == r["pack_fill"] <= target


# -------------------------------------------------------------- spans

texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab cd"),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@SET
@given(ts=texts, n=st.integers(min_value=1, max_value=4))
def test_span_stats_strip_consistency(spark, ts, n):
    """dup_tokens from the stats equals the tokens removed by strip, per
    document — two independent code paths over the same spans."""
    from zx_spark.operators.spans import (
        duplicated_span_stats,
        strip_duplicated_spans,
    )

    rows = [(i, t) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r["doc_id"]: r for r in duplicated_span_stats(df, n=n).collect()
    }
    stripped = {
        r["doc_id"]: r["text_stripped"]
        for r in strip_duplicated_spans(df, n=n).collect()
    }
    for i, t in rows:
        kept_tokens = len([w for w in (stripped[i] or "").split() if w])
        assert kept_tokens == stats[i]["n_tokens"] - stats[i]["dup_tokens"], (
            i, t, stripped[i], dict(stats[i].asDict()),
        )


# --------------------------------------------------------------- paths

events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),   # user
        st.integers(min_value=0, max_value=30),  # ts
        st.sampled_from(["a", "b", "c"]),        # step
    ),
    min_size=1,
    max_size=40,
)


@SET
@given(evs=events, n=st.integers(min_value=1, max_value=3))
def test_paths_row_order_invariance_and_totals(spark, evs, n):
    """common_paths is invariant to input row order, and total
    occurrences equal sum over users of max(len(steps)-n+1, 0)."""
    from zx_spark.operators.paths import common_paths

    rows = [(i, u, float(t), s) for i, (u, t, s) in enumerate(evs)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts double, event_type string")
    rev = spark.createDataFrame(list(reversed(rows)), df.schema)
    a = sorted(
        map(tuple, common_paths(df, n=n, k=1000, id_col="event_id").collect())
    )
    b = sorted(
        map(tuple, common_paths(rev, n=n, k=1000, id_col="event_id").collect())
    )
    assert a == b
    from collections import Counter

    per_user = Counter(u for u, _, _ in evs)
    want_total = sum(max(c - n + 1, 0) for c in per_user.values())
    assert sum(o for _, o, _ in a) == want_total

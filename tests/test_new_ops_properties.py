"""Hypothesis property tests for the round-5 session-3 operators:
line scrub vs a pure-Python reference, LM scoring vs its twin over
generated corpora, PCA projection exactness over random vectors."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# bounded alphabets keep Spark round-trips cheap and deterministic
_WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "y2"])
_LINE = st.lists(_WORD, min_size=0, max_size=4).map(" ".join)
_DOC = st.lists(_LINE, min_size=0, max_size=5).map("\n".join)


def _scrub_py(texts: list[str], min_docs: int = 2):
    """Pure-Python reference of scrub_repeated_lines (same trimmed-line
    DF statistics, same drop rule, same rejoin)."""
    from collections import Counter

    df_count: Counter = Counter()
    for t in texts:
        seen = {l.strip() for l in t.split("\n") if l.strip() != ""}
        df_count.update(seen)
    hot = {l for l, c in df_count.items() if c >= min_docs}
    out = []
    for t in texts:
        lines = t.split("\n")
        kept = [l for l in lines if l.strip() == "" or l.strip() not in hot]
        out.append(("\n".join(kept), len(lines) - len(kept)))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_scrub_matches_python_reference(spark, docs_texts):
    from zx_spark.operators.decontaminate import scrub_repeated_lines

    df = spark.createDataFrame(
        list(enumerate(docs_texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["scrubbed"], r["n_lines_dropped"])
        for r in scrub_repeated_lines(df, min_docs=2).collect()
    }
    expect = _scrub_py(docs_texts)
    for i, pair in enumerate(expect):
        assert got[i] == pair, (i, docs_texts[i])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(_WORD, min_size=0, max_size=6).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_lm_spark_scoring_matches_twin(spark, texts):
    from pyspark.sql import functions as F

    from zx_spark.functions.lm import lm_score, lm_score_python, lm_train_python

    m = lm_train_python(texts, n_buckets=64, alpha=0.3)
    df = spark.createDataFrame(list(enumerate(texts)), "i long, text string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", lm_score(F.col("text"), m).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == lm_score_python(t, m), (i, t)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=12,
    )
)
def test_pca_projection_exactness_random(spark, X):
    """pca_project over arbitrary float vectors equals the Python twin
    bit-for-bit (exact integer dot − offset, one shared division)."""
    from zx_spark.operators.reduce import pca_fit_numpy, pca_project, pca_project_py

    m = pca_fit_numpy(X, out_dim=2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: list(r["pca"]) for r in pca_project(df, m).collect()}
    for i, row in enumerate(X):
        assert got[i] == pca_project_py(row, m), i


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.floats(-100.0, 100.0, allow_nan=False), min_size=1, max_size=20))
def test_counter_increase_never_negative(spark, vals):
    from zx_spark.operators.series import counter_increase

    rows = [("g", float(t), float(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    out = [
        r["v_increase"]
        for r in counter_increase(df, "v", "t", ["g"]).orderBy("t").collect()
    ]
    assert out[0] is None
    for prev, cur, inc in zip(vals, vals[1:], out[1:]):
        assert inc is not None and not math.isnan(inc)
        if cur >= prev:
            assert inc == cur - prev
        else:
            assert inc == cur  # reset counts from current value


# ------------------------------------------- session-4 property tests


_VAL = st.one_of(st.none(), st.integers(min_value=0, max_value=3).map(str))
_ROWS = st.dictionaries(
    st.integers(min_value=0, max_value=15), st.tuples(_VAL, _VAL),
    min_size=0, max_size=12,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_ROWS, _ROWS)
def test_diff_matches_dict_reference(spark, old_rows, new_rows):
    """diff_snapshots == the obvious dict diff, for arbitrary keyed
    tables with NULLs in compare columns."""
    from zx_spark.operators.diffs import diff_snapshots

    schema = "id: long, a: string, b: string"
    old = spark.createDataFrame([(k, *v) for k, v in old_rows.items()], schema)
    new = spark.createDataFrame([(k, *v) for k, v in new_rows.items()], schema)
    got = {
        r["id"]: r["diff_status"]
        for r in diff_snapshots(old, new, "id", include_unchanged=True).collect()
    }
    want = {}
    for k in set(old_rows) | set(new_rows):
        if k not in old_rows:
            want[k] = "added"
        elif k not in new_rows:
            want[k] = "removed"
        elif old_rows[k] != new_rows[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.floats(0.5, 50.0)),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
    st.integers(1, 10),
    st.integers(0, 3),
)
def test_weighted_sample_matches_python_twin_property(spark, rows, n, seed):
    """weighted_sample_n's kept set == the Python A-ES twin for random
    weights/sizes/seeds (n may exceed the population)."""
    import hashlib, math

    from zx_spark.operators.sampling import weighted_sample_n

    df = spark.createDataFrame(rows, "k: long, w: double")
    got = {r["k"] for r in weighted_sample_n(df, n, "w", "k", seed=seed).collect()}

    def pri(k, w):
        b = int(hashlib.md5(f"{k}:{seed}".encode()).hexdigest()[:15], 16) % 1_000_000
        return math.log((b + 0.5) / 1_000_000.0) / w

    want = {
        k for k, _ in sorted(rows, key=lambda t: (-pri(*t), t[0]))[:n]
    }
    assert got == want


def test_session4_operators_handle_empty_inputs(spark):
    """Every session-4 operator degrades to an empty (or all-zero
    profile) result on empty inputs instead of erroring — the property
    an automated pipeline needs when a filter chain eats everything."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([], "doc_id: long, text: string, source: string, n_chars: int")
    ev = spark.createDataFrame([], "user_id: long, ts: double, event_type: string")

    from zx_spark.operators.funnel import funnel_counts, retention_cohorts
    assert funnel_counts(ev, ["a", "b"]).count() == 0
    assert retention_cohorts(ev).count() == 0
    from zx_spark.operators.diffs import diff_snapshots
    assert diff_snapshots(docs, docs, "doc_id").count() == 0
    from zx_spark.operators.profile import profile_table
    prof = {r["column"]: r["n_rows"] for r in profile_table(docs).collect()}
    assert set(prof) == set(docs.columns) and set(prof.values()) == {0}
    from zx_spark.operators.sampling import weighted_sample_n
    assert weighted_sample_n(docs, 5, "n_chars", "doc_id").count() == 0
    from zx_spark.operators.dedup import incremental_near_dups, signature_table
    sigs = signature_table(docs, "text", "doc_id")
    assert incremental_near_dups(sigs, sigs).count() == 0
    from zx_spark.operators.windows import with_hopping_windows
    assert with_hopping_windows(ev, "ts", 100.0, 50.0).count() == 0
    from zx_spark.streaming.drift import baseline_profile, profile_drift
    rep = profile_drift(baseline_profile(docs), baseline_profile(docs))
    assert rep.filter("any_drift").count() == 0

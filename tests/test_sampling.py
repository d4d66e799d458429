"""Deterministic sampling: stability, exact stratum counts, split
disjointness/coverage, and plan shape (map-side filter, no shuffle for
hash_sample)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    from zx_spark.storage import read_table

    return read_table(spark, SF, "documents")


def test_hash_sample_deterministic_and_near_rate(spark, corpus):
    a = {r.doc_id for r in hash_sample(corpus, 0.3, "doc_id", seed=7).collect()}
    b = {r.doc_id for r in hash_sample(corpus, 0.3, "doc_id", seed=7).collect()}
    assert a == b  # same run-to-run
    assert 0.2 < len(a) / 2000 < 0.4  # near the requested rate
    c = {r.doc_id for r in hash_sample(corpus, 0.3, "doc_id", seed=8).collect()}
    assert a != c  # seed changes the sample
    # monotone: a higher rate is a superset (same seed)
    d = {r.doc_id for r in hash_sample(corpus, 0.5, "doc_id", seed=7).collect()}
    assert a <= d


def test_null_keys_are_sampled_and_split(spark):
    """NULL keys must bucket (sentinel), not vanish: md5(NULL)=NULL would
    silently drop them from hash_sample even at rate=1.0 and funnel every
    NULL-key row into the LAST split."""
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c"), (2, "d")], "doc_id long, x string"
    )
    assert hash_sample(df, 1.0, "doc_id").count() == 4  # rate 1.0 keeps ALL
    out = train_test_split(df, [0.5, 0.5], "doc_id")
    splits = {r["x"]: r["split"] for r in out.collect()}
    assert len(splits) == 4  # exhaustive incl. NULL keys
    assert splits["a"] == splits["b"]  # same (null) key -> same split


def test_hash_sample_no_shuffle(spark, corpus):
    plan = hash_sample(corpus, 0.5, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side filter


def test_stratified_exact_counts(spark, corpus):
    out = stratified_sample(corpus, ["lang"], 50, "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 50, "1": 50, "2": 50, "3": 50}
    # small stratum: capped at its size
    tiny = corpus.filter("doc_id < 6")  # lang 0: ids 0,4 → 2 rows
    out2 = stratified_sample(tiny, ["lang"], 50, "doc_id")
    assert out2.filter("lang = '0'").count() == 2


def test_train_test_split_disjoint_exhaustive_stable(spark, corpus):
    out = train_test_split(corpus, [0.8, 0.1, 0.1], "doc_id", seed=3)
    assert out.count() == 2000  # exhaustive: every row gets a split
    sizes = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {0, 1, 2}
    assert sizes[0] > sizes[1] and sizes[0] > sizes[2]
    assert 0.7 < sizes[0] / 2000 < 0.9
    # stability: same assignment on re-run
    again = train_test_split(corpus, [0.8, 0.1, 0.1], "doc_id", seed=3)
    diff = out.alias("a").join(again.alias("b"), "doc_id").filter("a.split != b.split")
    assert diff.count() == 0


def test_validation(spark, corpus):
    with pytest.raises(ValueError):
        hash_sample(corpus, 1.5, "doc_id")
    with pytest.raises(ValueError):
        stratified_sample(corpus, ["lang"], 0, "doc_id")
    with pytest.raises(ValueError):
        train_test_split(corpus, [], "doc_id")


def test_mix_by_rates_downsample_and_epochs(spark):
    from zx_spark.operators.sampling import mix_by_rates

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_by_rates(df, "source", {"a": 0.5, "b": 2.5}, "doc_id",
                       copy_col="copy_no")
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert abs(got["a"] - 500) < 60          # ~0.5 of 1000
    assert abs(got["b"] - 2500) < 60         # ~2.5 epochs of 1000
    # copies are numbered 1..n per key and deterministic
    per_key = out.filter("source = 'b'").groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("copy_no").alias("mx")).collect()
    assert all(r["n"] == r["mx"] and r["n"] in (2, 3) for r in per_key)
    again = mix_by_rates(df, "source", {"a": 0.5, "b": 2.5}, "doc_id",
                         copy_col="copy_no")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_mix_by_rates_default_drops_unlisted(spark):
    from zx_spark.operators.sampling import mix_by_rates

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "doc_id long, source string"
    )
    out = mix_by_rates(df, "source", {"a": 1.0}, "doc_id").collect()
    assert [r["doc_id"] for r in out] == [1]  # b and NULL dropped


def test_mix_to_proportions_downsample_only(spark):
    from zx_spark.operators.sampling import mix_to_proportions

    rows = [(i, "big" if i < 3000 else "small") for i in range(3500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    mixed, rates = mix_to_proportions(
        df, "source", {"big": 0.5, "small": 0.5}, "doc_id"
    )
    assert rates["small"] == 1.0 and 0 < rates["big"] < 0.2
    got = {r["source"]: r["cnt"] for r in
           mixed.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    # scarcest source caps the total; proportions ~50/50
    assert got["small"] == 500
    assert abs(got["big"] - 500) < 60
    assert "mix_copy_no" not in mixed.columns  # no duplication


def test_mix_to_proportions_upsample_keeps_total(spark):
    from zx_spark.operators.sampling import mix_to_proportions

    rows = [(i, "big" if i < 3000 else "small") for i in range(3500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    mixed, rates = mix_to_proportions(
        df, "source", {"big": 0.5, "small": 0.5}, "doc_id", allow_upsample=True
    )
    assert rates["small"] > 1.0  # scarce source repeats
    total = mixed.count()
    assert abs(total - 3500) < 120  # corpus size preserved (~)
    got = {r["source"]: r["cnt"] for r in
           mixed.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert abs(got["big"] - got["small"]) < 130


def test_mix_validates(spark):
    from zx_spark.operators.sampling import mix_by_rates, mix_to_proportions

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        mix_by_rates(df, "source", {"a": -0.1}, "doc_id")
    with pytest.raises(ValueError):
        mix_to_proportions(df, "source", {}, "doc_id")
    with pytest.raises(ValueError):
        mix_to_proportions(df, "source", {"nope": 1.0}, "doc_id")


def test_mix_to_proportions_token_weighted(spark):
    """Token-proportion mixing (weight_col / precomputed counts): where
    doc- and token-proportions disagree, the token target is hit and the
    derived rates differ from the doc-count mix; counts= skips the extra
    corpus aggregation but yields the identical mix."""
    from zx_spark.functions.text import token_budget
    from zx_spark.operators.sampling import mix_to_proportions

    rows = [(i, "A", "tok " * 100) for i in range(200)] + [
        (i, "B", "tok " * 10) for i in range(200, 2200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from zx_spark.functions.text import bpe_ish_token_count
    from pyspark.sql import functions as F

    df = df.withColumn("n_tok", bpe_ish_token_count(F.col("text")))
    props = {"A": 0.25, "B": 0.75}

    mixed_tok, rates_tok = mix_to_proportions(
        df, "source", props, "doc_id", seed=5, weight_col="n_tok"
    )
    _, rates_doc = mix_to_proportions(df, "source", props, "doc_id", seed=5)
    # doc- and token-based rates must disagree on this corpus
    assert abs(rates_tok["A"] - rates_doc["A"]) > 0.1
    assert rates_doc["A"] == 1.0 and abs(rates_doc["B"] - 0.3) < 0.01
    assert rates_tok["B"] == 1.0 and abs(rates_tok["A"] - 1 / 3) < 0.01
    # achieved TOKEN share ~ target (hash-sampling noise at 200 docs)
    got = {
        r["source"]: r["n_tokens"]
        for r in token_budget(mixed_tok, group_col="source").collect()
    }
    share_a = got["A"] / (got["A"] + got["B"])
    assert 0.18 < share_a < 0.32, share_a
    # precomputed counts (the token_budget a mixing plan already ran)
    # produce the identical mix with zero extra passes
    budget = {
        r["source"]: r["n_tokens"]
        for r in token_budget(df, group_col="source").collect()
    }
    mixed_pre, rates_pre = mix_to_proportions(
        df, "source", props, "doc_id", seed=5, counts=budget
    )
    assert rates_pre == rates_tok
    assert sorted(r["doc_id"] for r in mixed_pre.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in mixed_tok.select("doc_id").collect()
    )


# ------------------------------------------------- weighted sampling (A-ES)


def _py_priority(key, weight, seed):
    """Pure-Python twin of weighted_sample_n's priority: md5 bucket ->
    u in (0,1) -> ln(u)/w (Efraimidis-Spirakis)."""
    import hashlib, math

    b = int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16) % 1_000_000
    return math.log((b + 0.5) / 1_000_000.0) / weight


def test_weighted_sample_exact_top_n_vs_python_twin(spark):
    from zx_spark.operators.sampling import weighted_sample_n

    rows = [(i, float(1 + i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id: long, n_tokens: double")
    got = {
        r.doc_id
        for r in weighted_sample_n(df, 40, "n_tokens", "doc_id", seed=5).collect()
    }
    want = {
        k
        for k, _ in sorted(
            rows, key=lambda t: (-_py_priority(t[0], t[1], 5), t[0])
        )[:40]
    }
    assert got == want and len(got) == 40


def test_weighted_sample_prefers_heavy_rows(spark):
    from zx_spark.operators.sampling import weighted_sample_n

    # 100 heavy rows (w=100) among 900 light (w=1): a 50-row weighted
    # sample should be dominated by heavy rows (each heavy row carries
    # 100x the mass); a uniform sample would pick ~5.
    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id: long, w: double")
    got = weighted_sample_n(df, 50, "w", "doc_id", seed=1)
    heavy = got.filter(F.col("doc_id") < 100).count()
    assert got.count() == 50 and heavy >= 35


def test_weighted_sample_strata_null_weights_and_validation(spark):
    from zx_spark.operators.sampling import weighted_sample_n

    rows = [(i, "a" if i % 2 == 0 else "b", [None, 0.0, 2.0, 5.0][i % 4]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id: long, src: string, w: double")
    out = weighted_sample_n(
        df, 10, "w", "doc_id", seed=2, strata_cols=["src"], priority_col="pri"
    )
    per = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": 10, "b": 10}
    # NULL / zero weights never sampled; priority column exposed & ordered
    assert out.filter(F.col("w").isNull() | (F.col("w") <= 0)).count() == 0
    assert "pri" in out.columns
    # determinism
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in weighted_sample_n(
            df, 10, "w", "doc_id", seed=2, strata_cols=["src"]
        ).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        weighted_sample_n(df, 0, "w", "doc_id")


# ------------------------------------------------------- cap_per_key


def _cap_duck(sf, n, seed):
    import duckdb

    con = duckdb.connect()
    return {
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM (SELECT doc_id, row_number() OVER ("
            f"PARTITION BY source ORDER BY "
            f"('0x'||substr(md5(doc_id::VARCHAR || ':{seed}'),1,15))::bigint % 1000000, "
            f"doc_id) AS rn FROM read_parquet('{sf}/documents.parquet')) "
            f"WHERE rn <= {n}"
        ).fetchall()
    }


def test_cap_per_key_matches_duckdb(spark, docs):
    from zx_spark.operators.sampling import cap_per_key

    got = {
        r["doc_id"]
        for r in cap_per_key(docs, ["source"], 7, "doc_id", seed=5).collect()
    }
    assert got == _cap_duck(SF, 7, 5)
    # every source capped at 7
    counts = (
        cap_per_key(docs, ["source"], 7, "doc_id", seed=5)
        .groupBy("source")
        .count()
        .collect()
    )
    assert counts and all(r["count"] <= 7 for r in counts)


def test_cap_per_key_salted_identical(spark, docs):
    from zx_spark.operators.sampling import cap_per_key

    plain = {
        r["doc_id"]
        for r in cap_per_key(docs, ["source"], 9, "doc_id", seed=2).collect()
    }
    for s in (2, 5):
        salted = {
            r["doc_id"]
            for r in cap_per_key(
                docs, ["source"], 9, "doc_id", seed=2, n_salts=s
            ).collect()
        }
        assert salted == plain, s


def test_cap_per_key_priority_col(spark, docs):
    from zx_spark.operators.sampling import cap_per_key

    kept = cap_per_key(
        docs, ["source"], 3, "doc_id", priority_col="n_chars", ascending=False
    )
    rows = kept.select("source", "n_chars").collect()
    import collections

    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["n_chars"])
    # per source: the 3 kept are the 3 largest n_chars values
    full = collections.defaultdict(list)
    for r in docs.select("source", "n_chars").collect():
        full[r["source"]].append(r["n_chars"])
    for s, vals in by_src.items():
        assert sorted(vals, reverse=True) == sorted(full[s], reverse=True)[:3], s


def test_cap_per_key_null_handling(spark):
    from zx_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (None, "a"), (4, "a")],
        "doc_id long, src string",
    )
    out = cap_per_key(df, ["src"], 2, "doc_id", seed=0).collect()
    # NULL key group capped like any other; NULL id excluded
    assert sorted(r["doc_id"] for r in out if r["src"] is None) != []
    assert all(r["doc_id"] is not None for r in out)
    assert [r["doc_id"] for r in out if r["src"] == "a"] == [4]


def test_cap_per_key_validation(spark, docs):
    from zx_spark.operators.sampling import cap_per_key

    import pytest as _pytest

    with _pytest.raises(ValueError):
        cap_per_key(docs, ["source"], 0, "doc_id")
    with _pytest.raises(ValueError):
        cap_per_key(docs, ["source"], 5, "doc_id", n_salts=0)


def test_cap_per_key_null_priority_never_outranks(spark):
    """ADVICE r6: NULL priorities must sort LAST either direction —
    they fill leftover quota, never displace a scored row."""
    from zx_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, "a", 1.0), (4, "a", None)],
        "doc_id long, src string, score double",
    )
    asc = {
        r["doc_id"]
        for r in cap_per_key(
            df, ["src"], 2, "doc_id", priority_col="score", ascending=True
        ).collect()
    }
    desc = {
        r["doc_id"]
        for r in cap_per_key(
            df, ["src"], 2, "doc_id", priority_col="score", ascending=False
        ).collect()
    }
    assert asc == {2, 3} and desc == {2, 3}
    # NULL-priority rows still fill quota when scored rows run out
    wide = {
        r["doc_id"]
        for r in cap_per_key(
            df, ["src"], 3, "doc_id", priority_col="score", ascending=True
        ).collect()
    }
    assert wide == {1, 2, 3}  # id tie-break picks doc 1 of the two NULLs


# ------------------------------------------------- leakage_safe_split


def test_leakage_safe_split_chains_stay_together(spark):
    """A near-dup CHAIN a~b, b~c (a and c never a direct pair) must land
    entirely in one split for every seed; singletons split exactly like
    the plain per-id splitter."""
    from zx_spark.operators.sampling import leakage_safe_split, train_test_split

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    for seed in (0, 1, 7):
        out = {
            r["doc_id"]: r["split"]
            for r in leakage_safe_split(
                df, [0.5, 0.5], pairs=pairs, seed=seed
            ).collect()
        }
        assert out[1] == out[2] == out[3], seed
        plain = {
            r["doc_id"]: r["split"]
            for r in train_test_split(df, [0.5, 0.5], "doc_id", seed=seed).collect()
        }
        for i in (4, 5, 6, 7):
            assert out[i] == plain[i], (seed, i)


def test_leakage_safe_split_driver_docs_no_straddle(spark, docs):
    """On the real driver documents: no MinHash near-dup pair straddles
    the boundary, fractions are sane, and the assignment is
    deterministic. Precomputed pairs and precomputed components must
    give identical splits."""
    from zx_spark.operators.dedup import dup_components, near_dup_pairs
    from zx_spark.operators.sampling import leakage_safe_split

    d = docs.select("doc_id", "text")
    pairs = near_dup_pairs(d, "text", "doc_id", threshold=0.5)
    comps = dup_components(pairs)
    a = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(d, [0.8, 0.2], pairs=pairs, seed=3).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(
            d, [0.8, 0.2], components=comps, seed=3
        ).collect()
    }
    assert a == b
    for r in pairs.collect():
        assert a[r["id_a"]] == a[r["id_b"]], (r["id_a"], r["id_b"])
    n = len(a)
    frac0 = sum(1 for s in a.values() if s == 0) / n
    assert 0.7 < frac0 < 0.9
    # deterministic re-run
    again = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(d, [0.8, 0.2], pairs=pairs, seed=3).collect()
    }
    assert again == a

"""LLM-data-pipeline operator tests: dedup (exact/MinHash/SimHash),
similarity search (brute-force/LSH/IVF), text analysis, multimodal
plumbing. Includes plan-shape assertions: no cartesian product in any
near-dup path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zx_spark.functions.text import (
    bpe_ish_token_count,
    chunk_documents,
    document_fingerprint,
    language_id,
    text_quality,
)
from zx_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    near_dup_pairs,
    simhash_near_dup_pairs,
)
from zx_spark.operators.multimodal import (
    attach_media,
    decode_image,
    resize_image,
    sample_frames,
)
from zx_spark.operators.similarity import (
    cosine_topk,
    ivf_build,
    ivf_topk,
    rp_lsh_near_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2, "the quick brown fox jumps over the lazy dog and runs far away now"),  # near-dup of 1
    (3, "completely different text about spark engines and distributed query planning"),
    (4, "the quick brown fox jumps over the lazy dog and runs far away home"),  # exact dup of 1
    (5, "der hund läuft schnell und die katze ist nicht da für den mann auf"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = {r["keep_id"]: r["dup_count"] for r in exact_dedup_groups(docs, "text", "doc_id").collect()}
    assert groups[1] == 2  # doc 4 is an exact dup of doc 1
    kept = {r["doc_id"] for r in exact_dedup(docs, "text", "doc_id").collect()}
    assert kept == {1, 2, 3, 5}


def test_exact_dedup_null_text_passthrough(spark):
    """NULL text is NOT content: md5(NULL)=NULL would otherwise collapse
    every NULL-text row (e.g. media-only docs) into one survivor."""
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in exact_dedup(df, "text", "doc_id").collect()}
    assert kept == {1, 3, 4, 5}  # dup 2 dropped; ALL null-text rows kept


def test_lsh_knob_validation(spark, docs):
    """Silent-recall-loss knob combinations must raise, not degrade:
    non-divisor bands truncate the signature; bands > num_hashes makes
    every band empty (full cross-product); max_hamming >= chunks breaks
    the pigeonhole guarantee."""
    with pytest.raises(ValueError, match="bands"):
        near_dup_pairs(docs, "text", "doc_id", num_hashes=32, bands=6)
    with pytest.raises(ValueError, match="bands"):
        near_dup_pairs(docs, "text", "doc_id", num_hashes=4, bands=8)
    from zx_spark.operators.dedup import simhash_near_dup_pairs

    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=4)


def test_minhash_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in near_dup_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dups always survive
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5  # near-dup caught
    assert all(3 not in p and 5 not in p for p in pairs)  # distinct docs unpaired


def test_minhash_agg_engine_identical_to_fold(spark):
    """The r6 codegen signing engine (explode + groupBy-min) must produce
    BIT-IDENTICAL signatures to the per-row fold for every doc shape:
    normal, short (< shingle_n tokens → whole-text shingle), empty and
    NULL text ('' shingle) — the guarantee that lets candidate_pairs and
    signature_table switch engines without touching the oracle."""
    from zx_spark.operators.dedup import minhash_signatures
    from zx_spark.storage import read_table

    edge = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the dog"), (2, "too short"),
         (3, ""), (4, None), (5, "   "), (6, "one")],
        "doc_id long, text string",
    )
    real = read_table(spark, "/root/testdata/sf0.001", "documents")
    for df in (edge, real):
        a = {r["doc_id"]: list(r["minhash"])
             for r in minhash_signatures(df, "text", "doc_id", engine="agg").collect()}
        b = {r["doc_id"]: list(r["minhash"])
             for r in minhash_signatures(df, "text", "doc_id", engine="fold").collect()}
        assert a == b and len(a) == df.count()
    with pytest.raises(ValueError, match="engine"):
        minhash_signatures(edge, "text", "doc_id", engine="turbo")
    # duplicate and NULL ids must stay ONE SIGNATURE PER ROW — a plain
    # groupBy(id) would merge them into union-of-shingles signatures
    # (review finding); the per-row grouping key preserves the fold
    dup = spark.createDataFrame(
        [(1, "aa bb cc dd"), (1, "xx yy zz ww"), (None, "pp qq rr"),
         (None, "ss tt uu")],
        "doc_id long, text string",
    )
    def rows(engine):
        return sorted(
            (
                (r["doc_id"], tuple(r["minhash"]))
                for r in minhash_signatures(
                    dup, "text", "doc_id", engine=engine
                ).collect()
            ),
            key=lambda t: (t[0] is None, t[0] or 0, t[1]),
        )

    a, b = rows("agg"), rows("fold")
    assert len(a) == 4 and a == b


def test_minhash_agg_engine_plan_is_codegen(spark, docs):
    """The agg engine's min aggregates must sit inside HashAggregate
    (codegen), with no higher-order fold left in the signing plan."""
    from zx_spark.operators.dedup import minhash_signatures

    plan = (
        minhash_signatures(docs, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in plan
    assert "aggregate(" not in plan  # the interpreted fold is gone


def test_minhash_bands_static_equals_dynamic(spark):
    """The r14 static band unroll (plan-time ``sig_len`` → codegen'd
    concat_ws/ordinal expressions) must emit the IDENTICAL
    (id, band_no, band_hash) multiset as the dynamic higher-order form
    for real signatures — the guarantee that lets every banding caller
    pass ``sig_len=num_hashes`` without touching the oracle."""
    from zx_spark.operators.dedup import minhash_bands, minhash_signatures
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=32).localCheckpoint()
    key = lambda r: (r["doc_id"], r["band_no"], r["band_hash"])  # noqa: E731
    dyn = sorted(map(key, minhash_bands(sigs, "doc_id", "minhash", 8).collect()))
    stat = sorted(
        map(key, minhash_bands(sigs, "doc_id", "minhash", 8, sig_len=32).collect())
    )
    assert dyn == stat and len(dyn) == 8 * sigs.count()
    with pytest.raises(ValueError, match="divide"):
        minhash_bands(sigs, "doc_id", "minhash", 7, sig_len=32)


def test_jaccard_union_arithmetic_identical(spark, docs):
    """|A ∪ B| = |A| + |B| − |A ∩ B| for the distinct shingle sets: the
    r14 union-size arithmetic must reproduce the materialized
    array_union jaccard bit-for-bit on real candidate pairs."""
    from pyspark.sql import functions as F

    from zx_spark.functions.text import shingles_from_tokens, tokenize
    from zx_spark.operators.dedup import (
        jaccard_pairs,
        minhash_candidate_pairs,
    )

    cands = minhash_candidate_pairs(docs, "text", "doc_id").localCheckpoint()
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, cands, "text", "doc_id").collect()
    }
    sets_df = docs.select(
        F.col("doc_id"),
        F.array_distinct(
            shingles_from_tokens(tokenize(F.col("text")), 3)
        ).alias("sh"),
    )
    ref_frame = (
        cands.join(
            sets_df.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        ).join(
            sets_df.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double")
    ref = {
        (r["id_a"], r["id_b"]): r["j"]
        for r in ref_frame.select(
            "id_a", "id_b",
            F.round(inter / F.greatest(union, F.lit(1.0)), 6).alias("j"),
        ).collect()
    }
    assert got == ref and len(got) > 0


def test_shingles_unrolled_equals_slice_join(spark):
    """The r14 shingle body (n unrolled null-safe ordinal lookups +
    one concat_ws) must emit the IDENTICAL shingle arrays as the
    reference ``array_join(slice(...))`` form for every document shape —
    normal, shorter-than-n (whole-text shingle via get()'s NULL +
    concat_ws's NULL-skip, exactly slice truncation), single-token,
    empty and NULL text — on edge rows and the real corpus."""
    from pyspark.sql import functions as F

    from zx_spark.functions.text import shingles_from_tokens, tokenize
    from zx_spark.storage import read_table

    def reference(toks, n):
        return F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.lit("")))

    edge = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the dog"), (2, "too short"),
         (3, ""), (4, None), (5, "   "), (6, "one"), (7, "a b")],
        "doc_id long, text string",
    )
    real = read_table(spark, "/root/testdata/sf0.001", "documents")
    for df in (edge, real):
        base = df.select("doc_id", tokenize(F.col("text")).alias("__toks"))
        for n in (2, 3, 5, 8):
            bad = base.select(
                (
                    F.array_join(
                        shingles_from_tokens(F.col("__toks"), n), "|"
                    )
                    != F.array_join(reference(F.col("__toks"), n), "|")
                ).alias("d")
            ).filter("d").count()
            assert bad == 0, f"shingle mismatch at n={n}"


def test_simhash_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=3).collect()}
    assert pairs.get((1, 4)) == 0  # identical text → identical signature
    assert all(3 not in p for p in pairs)


def test_simhash_agg_engine_identical_to_fold(spark):
    """The r14 explode+groupBy-sum signing engine (``_simhash_signatures``,
    the pairs path) must produce BIT-IDENTICAL signatures to the per-row
    fold (``simhash``) for every doc shape — normal, repeated-token,
    single-token, empty, whitespace-only and NULL text (NULL stays NULL,
    zero-token stays 0) — and on the real corpus; duplicate and NULL ids
    stay one signature per ROW."""
    from zx_spark.operators.dedup import _simhash_signatures, simhash
    from zx_spark.storage import read_table

    edge = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the dog"), (2, "too short"),
         (3, ""), (4, None), (5, "   "), (6, "one"), (7, "x y x y x")],
        "doc_id long, text string",
    )
    real = read_table(spark, "/root/testdata/sf0.001", "documents")
    for df in (edge, real):
        a = {r["doc_id"]: r["simhash"]
             for r in simhash(df, "text").select("doc_id", "simhash").collect()}
        b = {r["doc_id"]: r["simhash"]
             for r in _simhash_signatures(df, "text", "doc_id").collect()}
        assert a == b and len(a) == df.count()
    dup = spark.createDataFrame(
        [(1, "aa bb cc"), (1, "xx yy zz"), (None, "pp qq"), (None, "ss tt")],
        "doc_id long, text string",
    )
    rows = sorted(
        ((r["doc_id"], r["simhash"]) for r in _simhash_signatures(dup, "text", "doc_id").collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1]),
    )
    ref = sorted(
        ((r["doc_id"], r["simhash"]) for r in simhash(dup, "text").select("doc_id", "simhash").collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1]),
    )
    assert len(rows) == 4 and rows == ref


def test_simhash_columns_dispatch_routes_to_agg_engine(spark):
    """``simhash(columns=[...])`` (r15) must route narrow consumers to
    the codegen agg engine — plan shows the groupBy exchange, NOT the
    per-row fold's interpreted transform — with values identical to the
    fold and carried columns preserved (including duplicates/NULLs);
    unknown columns fail fast; default keeps the zero-shuffle fold."""
    from zx_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, "s0", "aa bb cc"), (1, "s0", "xx yy zz"), (None, "s1", "pp qq"),
         (3, None, ""), (4, "s2", None)],
        "doc_id long, src string, text string",
    )
    narrow = simhash(df, "text", columns=["doc_id", "src"])
    assert narrow.columns == ["doc_id", "src", "simhash"]
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan  # the agg engine, not the fold
    wide = simhash(df, "text")
    assert wide.columns == df.columns + ["simhash"]
    assert "HashAggregate" not in (
        wide._jdf.queryExecution().executedPlan().toString()
    )  # default stays the zero-shuffle per-row fold
    key = lambda r: (r[0] is None, r[0] or 0, r[1] or "", r[2] or -1)
    got = sorted(((r["doc_id"], r["src"], r["simhash"]) for r in narrow.collect()), key=key)
    ref = sorted(
        ((r["doc_id"], r["src"], r["simhash"])
         for r in wide.select("doc_id", "src", "simhash").collect()),
        key=key,
    )
    assert got == ref and len(got) == 5
    try:
        simhash(df, "text", columns=["nope"])
        assert False, "unknown column must raise"
    except ValueError as e:
        assert "nope" in str(e)


def test_no_cartesian_in_dedup_plans(spark, docs):
    for df in (
        near_dup_pairs(docs, "text", "doc_id"),
        simhash_near_dup_pairs(docs, "text", "doc_id"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_simhash_plan_is_jvm_side(spark, docs):
    # The signature stage must be pure Catalyst — no Arrow/Python eval node
    # anywhere in the SimHash pipeline.
    plan = (
        simhash_near_dup_pairs(docs, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan


def test_text_quality_and_tokens(spark, docs):
    out = docs.select("doc_id", text_quality(F.col("text")).alias("q"),
                      bpe_ish_token_count(F.col("text")).alias("n_bpe")).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["q"]["n_tokens"] == 14
    assert by_id[1]["q"]["punct_ratio"] == 0.0
    assert by_id[1]["n_bpe"] == 14  # plain words, no punctuation splits
    assert 0.0 <= by_id[1]["q"]["quality_score"] <= 1.0
    # en text has high stopword ratio; german text scores ~0 on en stopwords
    assert by_id[1]["q"]["stopword_ratio"] > by_id[5]["q"]["stopword_ratio"]


def test_language_id(spark, docs):
    out = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", language_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en" and out[5] == "de"
    und = spark.createDataFrame([(9, "xyzzy plugh 12345")], "doc_id long, text string")
    assert und.select(language_id(F.col("text")).alias("l")).collect()[0]["l"] == "und"


def test_document_fingerprint(spark, docs):
    fp = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", document_fingerprint(F.col("text"), n=3, mod=2).alias("fp")).collect()}
    assert fp[1] == fp[4]  # identical docs → identical fingerprints
    shared = set(fp[1]) & set(fp[2])
    assert len(shared) > 0  # near-dups share most fingerprint hashes
    assert not (set(fp[1]) & set(fp[3]))


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.99, 0.1, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.0, 1.0, 0.0]),
    (4, [-1.0, 0.0, 0.0, 0.0]),
    (5, [0.98, 0.05, 0.01, 0.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def test_cosine_topk(spark, vecs):
    top = cosine_topk(vecs, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top] == [0, 5, 1]
    assert top[0]["cosine"] == 1.0


def test_ivf_matches_bruteforce_top1(spark, vecs):
    assigned, centers = ivf_build(vecs, n_cells=3)
    approx = ivf_topk(assigned, centers, [1.0, 0.0, 0.0, 0.0], k=1, nprobe=2).collect()
    assert approx[0]["vec_id"] == 0


def test_rp_lsh_near_pairs(spark, vecs):
    pairs = {(r["id_a"], r["id_b"]) for r in rp_lsh_near_pairs(vecs, dim=4, threshold=0.99).collect()}
    assert (0, 5) in pairs or (0, 1) in pairs  # near-identical vectors found
    assert all({a, b} != {0, 4} for a, b in pairs)  # opposite vectors never pair


def test_rp_lsh_finds_planted_pairs(spark):
    # The driver-query shape: union each embedding with a perturbed copy
    # (id + offset) and assert the LSH path recovers the planted
    # near-pairs — a non-vacuous recall check on real data.
    import __spark_entry__ as entry
    from zx_spark.storage import read_table

    sf_dir = "/root/testdata/sf0.001"
    found = {
        (r["id_a"], r["id_b"])
        for r in entry.q_emb_near_pairs_lsh(spark, sf_dir).collect()
        if r["arm"] == "rp_lsh"
    }
    n_vecs = read_table(spark, sf_dir, "embeddings").count()
    planted = {(i, i + 1_000_000) for (i,) in
               read_table(spark, sf_dir, "embeddings").select("vec_id").collect()}
    recovered = found & planted
    # 3 tables x 12 planes at cosine ~0.999 → near-total recall.
    assert len(recovered) >= 0.9 * n_vecs
    assert found, "LSH query returned no rows"


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, b"0123456789abcdef" * 8, "png", 4, 4), (2, b"\x00" * 100, "jpg", 10, 10)],
        "doc_id long, payload binary, fmt string, w int, h int",
    )
    media = attach_media(df, "payload", "fmt", "w", "h")
    metas = {r["doc_id"]: r["media_meta"] for r in media.collect()}
    assert metas[1]["n_bytes"] == 128 and metas[1]["format"] == "png"

    feats = decode_image(media, decoder="fake", n_features=4).collect()
    assert all(len(r["features"]) == 4 for r in feats)
    again = decode_image(media, decoder="fake", n_features=4).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))  # deterministic

    with pytest.raises(Exception, match="NotImplementedError|real image decoding"):
        decode_image(media).collect()

    frames = sample_frames(media, every_n_bytes=64, frame_bytes=16).collect()
    assert sum(1 for r in frames if r["doc_id"] == 1) == 2

    resized = {r["doc_id"]: r for r in resize_image(media, 8, 4, decoder="fake").collect()}
    assert len(resized[1]["media"]) == 32  # exactly width*height bytes
    assert resized[1]["media_meta"]["width"] == 8 and resized[1]["media_meta"]["height"] == 4
    with pytest.raises(Exception, match="NotImplementedError|real image resizing"):
        resize_image(media, 8, 4).collect()


def test_ivf_exhaustive_probe_equals_bruteforce(spark):
    """nprobe = n_cells makes IVF exact: its top-k must equal brute force
    on the real driver embeddings — pins that cell pruning is the ONLY
    approximation in the IVF path."""
    from pyspark.sql import functions as F

    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = [0.1] * 64
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    assigned, centers = ivf_build(emb, n_cells=4)
    approx = [
        r["vec_id"] for r in ivf_topk(assigned, centers, q, k=5, nprobe=4).collect()
    ]
    assert approx == exact


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunking: full token coverage, exact overlap, remainder chunk
    sizes, single-chunk shorts, and empty docs yielding one empty chunk."""
    words = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=256, overlap_tokens=32)
    rows = {
        (r["doc_id"], r["chunk_no"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    # doc 1: 300 tokens -> chunks at 0 and 224
    assert rows[(1, 0)][1] == 256 and rows[(1, 0)][0].startswith("w0 ")
    assert rows[(1, 1)][1] == 76 and rows[(1, 1)][0].startswith("w224 ")
    # overlap: tokens 224..255 appear in both chunks
    assert rows[(1, 0)][0].split()[-32:] == rows[(1, 1)][0].split()[:32]
    # reconstruction: chunk0 + chunk1-minus-overlap == the document
    assert rows[(1, 0)][0].split() + rows[(1, 1)][0].split()[32:] == words.split()
    # short, empty, and NULL docs (NULL must not report phantom tokens —
    # ANSI size(NULL) is NULL and F.least would skip it)
    assert rows[(2, 0)] == ("a b c", 3)
    assert rows[(3, 0)] == ("", 0)
    assert rows[(4, 0)] == ("", 0)
    assert len(rows) == 5
    # plan: narrow transform, no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_property_reconstruction(spark):
    """Property (driven grid, not hypothesis — one Spark job for all
    cases): for every (n_tokens, chunk, overlap) combination, chunk
    starts step by stride, every token appears, consecutive chunks share
    exactly `overlap` tokens (except a short final remainder), and
    stitching chunks minus overlaps reproduces the document."""
    cases = [
        (n, c, o)
        for n in (0, 1, 5, 7, 16, 33)
        for (c, o) in ((4, 0), (4, 1), (8, 3), (16, 15), (5, 4))
    ]
    rows = [
        (i, " ".join(f"t{j}" for j in range(n)))
        for i, (n, _c, _o) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for (c, o) in sorted({(c, o) for _n, c, o in cases}):
        out = chunk_documents(df, chunk_tokens=c, overlap_tokens=o)
        got = {}
        for r in out.collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_no"], r["chunk_text"].split() if r["chunk_text"] else [])
            )
        for i, (n, _c, _o) in enumerate(cases):
            chunks = [t for _, t in sorted(got[i])]
            stride = c - o
            expect = [f"t{j}" for j in range(n)]
            stitched = chunks[0] + [t for ch in chunks[1:] for t in ch[o:]]
            assert stitched == expect, (n, c, o)
            for ch in chunks[:-1]:
                assert len(ch) == c, (n, c, o)  # only the tail may be short
            if len(chunks) > 1:
                for a, b in zip(chunks, chunks[1:]):
                    assert a[stride:] == b[: len(a[stride:])], (n, c, o)


def test_cosine_topk_batch_equals_per_query(spark):
    """Multi-query ANN (one scan, per-partition numpy top-k, candidate-only
    shuffle) must return EXACTLY what cosine_topk returns per query after
    6dp rounding — same ids, same order, same cosines."""
    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import cosine_topk, cosine_topk_batch
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = [[1.0] + [0.0] * 63, [0.1] * 64, [(-1.0) ** i for i in range(64)]]
    batch = cosine_topk_batch(emb, queries, k=5)
    got = {
        qno: [(r["vec_id"], r["cosine"]) for r in batch.filter(F.col("query_no") == qno)
              .orderBy(F.col("cosine").desc(), "vec_id").collect()]
        for qno in range(3)
    }
    for qno, q in enumerate(queries):
        exact = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, k=5).collect()]
        assert got[qno] == exact


def test_quantized_embeddings_preserve_cosine(spark):
    """int8 quantization: tinyint storage (4-8x fewer scan bytes), cosine
    scale-invariance — similarity on the quantized vectors matches the
    exact cosine within quantization error, and top-1 is preserved on the
    real driver embeddings."""
    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import cosine, cosine_topk, quantize_embeddings
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qdf = quantize_embeddings(emb)
    assert dict(qdf.dtypes)["q_embedding"] == "array<tinyint>"

    q = [0.1] * 64
    qcol = F.array(*[F.lit(v) for v in q])
    approx = {
        r["vec_id"]: r["c"]
        for r in qdf.select(
            "vec_id",
            F.round(cosine(F.col("q_embedding").cast("array<double>"), qcol), 6).alias("c"),
        ).collect()
    }
    exact = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", F.round(cosine(F.col("embedding"), qcol), 6).alias("c")
        ).collect()
    }
    worst = max(abs(approx[i] - exact[i]) for i in exact)
    assert worst < 0.02  # int8 quantization error bound
    top1 = cosine_topk(emb, q, k=1).collect()[0]["vec_id"]
    qtop1 = max(approx.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    assert qtop1 == top1


def test_ivf_lloyd_centers_match_numpy_twin(spark):
    """The deterministic Lloyd quantizer must produce BIT-IDENTICAL
    centers in Spark (distributed assign + groupBy-avg, 6-dp rounding of
    every communicated center) and in the numpy twin reading the same
    parquet — this equality is what lets the driver's DuckDB oracle embed
    the centers as literals and hash-verify the whole IVF pipeline."""
    import numpy as np
    import pyarrow.parquet as pq

    from zx_spark.operators.similarity import ivf_build_lloyd, ivf_centers_numpy
    from zx_spark.storage import read_table

    sf_dir = "/root/testdata/sf0.001"
    emb = read_table(spark, sf_dir, "embeddings")
    _, centers = ivf_build_lloyd(emb, n_cells=4, iters=3, dim=64)

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    twin = ivf_centers_numpy(
        t["vec_id"].to_numpy(),
        np.array(t["embedding"].to_pylist(), dtype=np.float64),
        n_cells=4,
        iters=3,
    )
    assert np.array_equal(centers, twin)


def test_ivf_store_partition_pruning(spark, tmp_path):
    """The cell-partitioned IVF layout must turn the nprobe filter into
    Parquet PARTITION PRUNING — the executed plan carries a PartitionFilters
    entry on ivf_cell and the probe's top-k equals running ivf_topk on the
    in-memory assigned frame. This is the claim SCALE.md makes for the
    100 TB ANN path, asserted on a real executed plan."""
    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import (
        ivf_build_lloyd,
        ivf_topk,
        read_ivf_store,
        write_ivf_store,
    )
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    assigned, centers = ivf_build_lloyd(emb, n_cells=4, iters=2, dim=64)
    path = str(tmp_path / "ivf_store")
    write_ivf_store(assigned, path)

    store = read_ivf_store(spark, path)
    q = [0.1] * 64
    probe = ivf_topk(store, centers, q, k=5, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "ivf_cell" in plan
    mem = ivf_topk(assigned, centers, q, k=5, nprobe=2)
    assert [r["vec_id"] for r in probe.collect()] == [
        r["vec_id"] for r in mem.collect()
    ]
    import os

    assert any(d.startswith("ivf_cell=") for d in os.listdir(path))


def test_ivf_lloyd_exhaustive_probe_equals_bruteforce(spark):
    """Same exactness pin as the Spark-ML variant: with nprobe = n_cells
    the Lloyd IVF reduces to brute force — cell pruning is the only
    approximation."""
    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import ivf_build_lloyd
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = [0.1] * 64
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    assigned, centers = ivf_build_lloyd(emb, n_cells=4, iters=3, dim=64)
    approx = [
        r["vec_id"] for r in ivf_topk(assigned, centers, q, k=5, nprobe=4).collect()
    ]
    assert approx == exact


def test_pq_exact_on_reconstructible_vectors(spark):
    """Vectors built FROM a small set of subvector values quantize
    losslessly, so ADC scores equal exact dots and PQ top-k == brute
    force — the correctness core, independent of recall tuning."""
    import itertools
    import random

    from zx_spark.operators.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    rnd = random.Random(7)
    # 4 subspaces x 4 distinct subvector values (8 dims each)
    vocab = [[[round(rnd.uniform(-1, 1), 3) for _ in range(8)] for _ in range(4)]
             for _ in range(4)]
    rows = []
    for i, combo in enumerate(itertools.product(range(4), repeat=4)):
        vec = [x for s, c in enumerate(combo) for x in vocab[s][c]]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=4, k=4, iters=4)
    codes = pq_encode(df, books)
    q = rows[137][1]
    approx = [r["vec_id"] for r in pq_topk(codes, books, q, 10).collect()]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    # dot-product order equals cosine order here? Not in general — compare
    # against exact DOT ranking instead.
    import numpy as np

    X = np.array([v for _, v in rows])
    dots = X @ np.array(q)
    expect = list(np.argsort(-dots, kind="stable")[:10])
    assert approx == [int(x) for x in expect]


def test_pq_recall_and_shape_on_driver_embeddings(spark):
    from zx_spark.operators.similarity import pq_encode, pq_topk, pq_train
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    books = pq_train(emb, m=8, k=16, iters=3)
    books2 = pq_train(emb, m=8, k=16, iters=3)
    assert books == books2  # deterministic
    codes = pq_encode(emb, books)
    row = codes.first()
    assert len(row["pq_codes"]) == 8
    assert dict(codes.dtypes)["pq_codes"] == "array<tinyint>"

    q = emb.orderBy("vec_id").first()["embedding"]
    q = [float(x) for x in q]
    approx = {r["vec_id"] for r in pq_topk(codes, books, q, 10).collect()}

    import numpy as np

    X = np.array(emb.orderBy("vec_id").select("embedding").rdd.map(lambda r: r[0]).collect())
    ids = [r["vec_id"] for r in emb.orderBy("vec_id").select("vec_id").collect()]
    dots = X @ np.array(q)
    exact = {ids[i] for i in np.argsort(-dots)[:10]}
    recall = len(approx & exact) / 10
    assert recall >= 0.3, recall  # coarse codes on random data; floor pins sanity
    assert ids[0] in approx  # the query's own vector must surface


def test_pq_rerank_beats_plain_adc(spark):
    import numpy as np

    from zx_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_topk_rerank,
        pq_train,
    )
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    books = pq_train(emb, m=8, k=16, iters=3)
    codes = pq_encode(emb, books).cache()
    rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([r["embedding"] for r in rows])

    def recall(fn):
        hits = []
        for qi in range(0, 100, 25):
            q = [float(x) for x in X[qi]]
            approx = {r["vec_id"] for r in fn(q).collect()}
            sims = (X @ np.array(q)) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
            exact = {ids[i] for i in np.argsort(-sims)[:10]}
            hits.append(len(approx & exact) / 10)
        return sum(hits) / len(hits)

    r_adc = recall(lambda q: pq_topk(codes, books, q, 10))
    r_rr = recall(lambda q: pq_topk_rerank(codes, emb, books, q, 10, shortlist=100))
    assert r_rr >= r_adc  # exact re-rank can only help
    assert r_rr >= 0.5, (r_adc, r_rr)
    # re-rank output is exact-cosine-ordered (cosine col, desc)
    q = [float(x) for x in X[0]]
    out = pq_topk_rerank(codes, emb, books, q, 10, shortlist=100).collect()
    sims = [r["cosine"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_ivfpq_exhaustive_probe_equals_bruteforce(spark):
    """IVF-PQ composition: with every cell probed and a corpus-wide
    shortlist, the exact re-rank makes the pipeline equal brute force —
    pins that the cell routing and code plumbing lose nothing."""
    from zx_spark.operators.similarity import (
        cosine_topk,
        ivf_build_lloyd,
        ivfpq_topk,
        pq_encode,
        pq_train,
    )
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    assigned, centers = ivf_build_lloyd(emb, n_cells=8, iters=3)
    books = pq_train(emb, m=8, k=16, iters=2)
    codes = pq_encode(assigned, books, keep_cols=["ivf_cell"])
    assert set(codes.columns) == {"vec_id", "pq_codes", "ivf_cell"}
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    n = emb.count()
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivfpq_topk(codes, emb, centers, books, q,
                            k_results=10, nprobe=8, shortlist=n).collect()
    ]
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, k=10).collect()]
    assert got == want
    # a partial probe still returns k results from the probed cells
    part = ivfpq_topk(codes, emb, centers, books, q,
                      k_results=10, nprobe=2, shortlist=100).collect()
    assert len(part) == 10
    # pruned re-rank (cell-partitioned raw store) stays exact: shortlist
    # ids live in probed cells by construction
    got_pruned = [
        (r["vec_id"], r["cosine"])
        for r in ivfpq_topk(codes, assigned, centers, books, q,
                            k_results=10, nprobe=8, shortlist=n,
                            vectors_cell_col="ivf_cell").collect()
    ]
    assert got_pruned == want


def test_pq_encode_numpy_equals_jvm(spark):
    from zx_spark.operators.similarity import pq_encode, pq_train
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    books = pq_train(emb, m=8, k=16, iters=2)
    jvm = {r["vec_id"]: list(r["pq_codes"])
           for r in pq_encode(emb, books, method="jvm").collect()}
    npy = {r["vec_id"]: list(r["pq_codes"])
           for r in pq_encode(emb, books, method="numpy").collect()}
    assert jvm == npy
    with_keep = pq_encode(emb.withColumn("cell", emb.vec_id % 4), books,
                          keep_cols=["cell"], method="numpy")
    assert set(with_keep.columns) == {"vec_id", "pq_codes", "cell"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pq_encode(emb, books, method="nope")


def test_pq_train_rejects_k_above_signed_tinyint(spark):
    import pytest as _pytest

    from zx_spark.operators.similarity import pq_train

    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="signed tinyint"):
        pq_train(df, m=2, k=200, dim=8)
    # 128 (max code 127) is still allowed
    books = pq_train(df, m=2, k=128, iters=1, dim=8)
    assert len(books[0]) == 128


def test_pq_codebooks_numpy_twin_matches_spark(spark):
    """pq_codebooks_numpy must re-derive pq_train's codebooks
    BIT-IDENTICALLY from the raw parquet — the property the DuckDB
    oracle's literal embedding (driver row ann_ivf_topk, pq arms)
    rests on."""
    import numpy as np
    import pyarrow.parquet as pq_

    from zx_spark.operators.similarity import pq_codebooks_numpy, pq_train
    from zx_spark.storage import read_table

    sf = "/root/testdata/sf0.001"
    emb = read_table(spark, sf, "embeddings")
    books = pq_train(emb, m=8, k=16, iters=3)
    t = pq_.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    assert pq_codebooks_numpy(X, m=8, k=16, iters=3) == books


def test_ivf_topk_batch_equals_per_query(spark):
    """Batch IVF serving (one scan over the union of probed cells,
    null-gated per-query scoring, per-query window top-k) must return
    EXACTLY what ivf_topk returns per query — same ids, same order, same
    cosines — and its scan must prune to the probed cells."""
    from pyspark.sql import functions as F

    from zx_spark.operators.similarity import (
        ivf_build_lloyd,
        ivf_topk,
        ivf_topk_batch,
    )
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    assigned, centers = ivf_build_lloyd(emb, n_cells=8, iters=3, dim=64)
    queries = [[1.0] + [0.0] * 63, [0.1] * 64, [(-1.0) ** i for i in range(64)]]
    batch = ivf_topk_batch(assigned, centers, queries, k=5, nprobe=3)
    got = {
        qno: [
            (r["vec_id"], r["cosine"])
            for r in batch.filter(F.col("query_no") == qno)
            .orderBy(F.col("cosine").desc(), "vec_id")
            .collect()
        ]
        for qno in range(3)
    }
    for qno, q in enumerate(queries):
        exact = [
            (r["vec_id"], r["cosine"])
            for r in ivf_topk(assigned, centers, q, k=5, nprobe=3).collect()
        ]
        assert got[qno] == exact, qno
    import pytest

    with pytest.raises(ValueError):
        ivf_topk_batch(assigned, centers, [], k=5)


def test_hashed_embedding_bridge(spark):
    """Feature-hashing text vectors: deterministic, L2-normalized, and a
    working bridge into the vector operators — near-duplicate texts land
    near each other under cosine while unrelated texts don't."""
    from pyspark.sql import functions as F

    from zx_spark.functions.text import hashed_embedding
    from zx_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated legal boilerplate follows here"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", hashed_embedding(F.col("text"), dim=32).alias("emb")
    )
    rows = {r["doc_id"]: r["emb"] for r in out.collect()}
    import math

    assert math.isclose(sum(x * x for x in rows[1]), 1.0, rel_tol=1e-9)
    assert rows[4] is None  # NULL text -> NULL vector
    assert all(x == 0.0 for x in rows[5])  # empty text -> zero vector
    # determinism
    rows_b = {r["doc_id"]: r["emb"] for r in out.collect()}
    assert rows == rows_b
    sim = df.alias("a").crossJoin(df.alias("b")).filter(
        (F.col("a.doc_id") == 1) & (F.col("b.doc_id").isin(2, 3))
    ).select(
        F.col("b.doc_id").alias("other"),
        cosine(
            hashed_embedding(F.col("a.text"), 32),
            hashed_embedding(F.col("b.text"), 32),
        ).alias("cos"),
    )
    s = {r["other"]: r["cos"] for r in sim.collect()}
    assert s[2] > 0.7 > s[3]
    # plan: pure Catalyst, no Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_with_hashed_embedding_equals_column_form(spark):
    from pyspark.sql import functions as F

    from zx_spark.functions.text import hashed_embedding, with_hashed_embedding
    from zx_spark.storage import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    a = {
        r["doc_id"]: r["e"]
        for r in docs.select(
            "doc_id", hashed_embedding(F.col("text"), dim=16).alias("e")
        ).collect()
    }
    b = {
        r["doc_id"]: r["hashed_emb"]
        for r in with_hashed_embedding(docs, dim=16).select(
            "doc_id", "hashed_emb"
        ).collect()
    }
    assert a == b
    # temp columns cleaned up
    assert set(with_hashed_embedding(docs, dim=16).columns) == set(docs.columns) | {"hashed_emb"}


def test_knn_pairs_exact_at_full_probe_and_composes_with_components(spark):
    """knn graph: with nprobe = n_cells it equals brute-force k-NN per
    row (same ids, cosines); edges feed dup_components."""
    import numpy as np
    from pyspark.sql import functions as F

    from zx_spark.operators.dedup import dup_components
    from zx_spark.operators.similarity import (
        cosine_topk,
        ivf_build_lloyd,
        knn_pairs,
    )
    from zx_spark.storage import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").limit(60)
    assigned, centers = ivf_build_lloyd(emb, n_cells=4, iters=2, dim=64)
    g = knn_pairs(assigned, centers, k=3, nprobe=4)
    got = {
        r["vec_id"]: (r["neighbor_id"], r["cosine"])
        for r in g.filter(F.col("cosine").isNotNull()).collect()
        if True
    }
    # spot-check 5 rows against per-query brute force (excluding self)
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    by_q = {}
    for r in g.collect():
        by_q.setdefault(r["vec_id"], []).append((r["neighbor_id"], r["cosine"]))
    for qid in list(rows)[:5]:
        exact = [
            (r["vec_id"], r["cosine"])
            for r in cosine_topk(
                emb.filter(F.col("vec_id") != qid), list(rows[qid]), k=3
            ).collect()
        ]
        assert sorted(by_q[qid], key=lambda t: (-t[1], t[0])) == exact, qid
    # graph edges -> connected components machinery accepts them
    comps = dup_components(
        g.filter(F.col("cosine") > 0.9).select(
            F.col("vec_id").alias("id_a"), F.col("neighbor_id").alias("id_b")
        )
    )
    assert comps.count() >= 0  # composes without error
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    import pytest as _pt

    with _pt.raises(ValueError):
        knn_pairs(assigned, centers, k=3, nprobe=9)


def test_normalize_text_and_nfc(spark):
    """normalize_text: lower + control-strip + whitespace squash, with
    \t\n\r treated as whitespace (squashed), not control (stripped);
    nfc_normalized composes decomposed sequences so they hash together
    with their composed forms."""
    import pytest
    from zx_spark.functions.text import nfc_normalized, normalize_text

    rows = [
        (1, "  Hello\tWORLD\n\nx  "),
        (2, "a\u0007b\u0000c"),          # control chars stripped, no glue-space
        (3, None),
        (4, "Cafe\u0301 latte"),          # decomposed e + U+0301
        (5, "Caf\u00e9 LATTE"),           # composed
    ]
    df = spark.createDataFrame(rows, "id: long, t: string")
    out = {
        r["id"]: r["n"]
        for r in df.select(
            "id", normalize_text(nfc_normalized(F.col("t"))).alias("n")
        ).collect()
    }
    assert out[1] == "hello world x"
    assert out[2] == "abc"
    assert out[3] is None
    assert out[4] == out[5] == "caf\u00e9 latte"  # NFC + lower unify them
    # without NFC the decomposed form stays distinct (the reason the
    # step exists)
    raw = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_text(F.col("t")).alias("n")).collect()
    }
    assert raw[4] != raw[5]
    # knobs off = passthrough of that step
    keep = {
        r["id"]: r["n"]
        for r in df.select(
            "id",
            normalize_text(
                F.col("t"), lower=False, strip_control=False, squash_whitespace=False
            ).alias("n"),
        ).collect()
    }
    assert keep[1] == "  Hello\tWORLD\n\nx  "
    with pytest.raises(ValueError):
        df.select(nfc_normalized(F.col("t"), form="NFX"))


def test_pq_topk_batch_equals_per_query(spark):
    """Batched ADC serving == per-query pq_topk (rounding, ordering and
    tie-breaks included), one scan for all queries."""
    import pytest
    from zx_spark.operators.similarity import pq_encode, pq_topk, pq_topk_batch, pq_train
    from zx_spark.storage import read_table

    vecs = read_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    )
    cb = pq_train(vecs, m=8, k=8, iters=2)
    codes = pq_encode(vecs, cb).cache()
    queries = [
        [1.0] + [0.0] * 63,
        [0.0] * 32 + [1.0] + [0.0] * 31,
        [0.5] * 64,
    ]
    batch = pq_topk_batch(codes, cb, queries, k_results=7).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_no"], []).append((r["vec_id"], r["adc_score"]))
    for qno, q in enumerate(queries):
        want = [(r["vec_id"], r["adc_score"]) for r in pq_topk(codes, cb, q, 7).collect()]
        assert got[qno] == want, qno
    with pytest.raises(ValueError):
        pq_topk_batch(codes, cb, [])
    with pytest.raises(ValueError):
        pq_topk_batch(codes, cb, [[1.0] * 10])


def _png(w, h):
    import struct, zlib
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def _gif(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _jpeg(w, h):
    import struct
    # SOI, APP0 (JFIF), DHT (skipped segment), SOF0 with dims
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + app0 + dht + sof


def _wav(sr, ch):
    import struct
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 0))


def test_probe_media_parses_real_headers(spark):
    """Header-level probing is REAL parsing (stdlib struct over the
    bytes) — hand-built PNG/GIF/JPEG/WAV containers round-trip their
    dimensions/audio params; junk and truncated payloads come back
    invalid instead of erroring the executor."""
    from zx_spark.operators.multimodal import probe_media, probe_media_bytes

    rows = [
        (1, _png(640, 480)),
        (2, _gif(13, 37)),
        (3, _jpeg(1920, 1080)),
        (4, _wav(44100, 2)),
        (5, b"not media at all"),
        (6, _png(9, 9)[:15]),   # truncated before IHDR dims
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id: long, media: binary")
    got = {r["id"]: r["probe"].asDict() for r in probe_media(df).collect()}
    assert got[1]["format"] == "png" and (got[1]["width"], got[1]["height"]) == (640, 480)
    assert got[2]["format"] == "gif" and (got[2]["width"], got[2]["height"]) == (13, 37)
    assert got[3]["format"] == "jpeg" and (got[3]["width"], got[3]["height"]) == (1920, 1080)
    assert got[4]["format"] == "wav" and got[4]["sample_rate"] == 44100 and got[4]["n_channels"] == 2
    for bad in (5, 6, 7):
        assert not got[bad]["valid"] and got[bad]["format"] is None
    # distributed probe == driver-side twin, byte for byte
    for rid, payload in rows:
        assert got[rid] == probe_media_bytes(payload), rid
    # narrow plan: no shuffle for the probe itself
    plan = probe_media(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

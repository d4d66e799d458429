"""Corpus curation: the end-to-end training-data pipeline composed from
the engine's operators, staged in scale order.

Stage order is the 100 TB order — cheap map-side filters first so every
shuffle downstream sees the smallest possible corpus:

1. quality gate     — pure Catalyst projection, no shuffle
2. classifier gate  — trained NB score (functions/classify.py), pure
                      Catalyst literal-array fold, no shuffle
3. LM perplexity gate — trained bigram-LM score (functions/lm.py,
                      CCNet-style), pure Catalyst fold, no shuffle
4. language gate    — pure Catalyst projection, no shuffle
5. normalization    — lower/control/whitespace canonicalization (+
                      optional NFC) so every hashing stage below keys
                      on canonical text; after the case-sensitive
                      quality gates, map-side
6. PII scrub        — map-side regex redaction, no shuffle
7. line scrub       — corpus-repeated lines REMOVED from every text
                      (one hot-set agg + map-side rewrite); before any
                      hashing stage so dedup keys on the scrubbed text
8. boilerplate drop — corpus-internal repeated-n-gram load (two keyed
                      aggs + probe join); runs BEFORE doc dedup so
                      template spans repeated by duplicates still count
                      as repeated (the C4 order: span-level hygiene,
                      then document identity)
9. exact dedup      — one hash shuffle (min-id semi-join)
10. near-dup removal — MinHash-LSH bucketed pairs on the already-thinned
                      corpus; greedy keep-lowest-id per pair
11. semantic dedup  — SemDeDup over a supplied embedding table
                      (cluster-bounded pair join, keep-least-central)
12. history dedup   — incremental near-dup vs a STORED signature
                      table (daily-ingest shape: history is never
                      re-read, only this batch signs)
13. decontamination — broadcast n-gram probe vs the benchmark set
                      (corpus never shuffles to be probed), plus the
                      embedding-cosine probe vs benchmark embeddings
                      for paraphrased leakage
14. source mixing   — one size agg (doc counts, or token totals with
                      ``mix_in_tokens``) + map-side per-group rates
                      (downsample-only here; upsampling belongs after
                      the split)
15. hash sample     — map-side filter
16. train/test split — map-side bucket assignment

Every stage is deterministic (hash-keyed, fixed seeds), so the curated
corpus is reproducible row-for-row across runs, retries, and cluster
layouts — the property that makes dataset versioning meaningful.

Near-dup removal is the standard greedy: any doc appearing as the HIGHER
id of a verified pair is dropped. On chains (a~b, b~c but a!~c) this
keeps only the lowest id of each connected component's pairs it sees —
the usual web-dedup tradeoff vs. full union-find connectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zx_spark.functions.pii import PII_TYPES, with_pii_scrubbed
from zx_spark.functions.text import language_id, text_quality
from zx_spark.operators.decontaminate import drop_contaminated
from zx_spark.operators.dedup import (
    anti_join_ids,
    drop_by_components,
    exact_dedup,
    near_dup_pairs,
)
from zx_spark.operators.sampling import (
    hash_sample,
    mix_to_proportions,
    train_test_split,
)


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_min: float | None = None,
    classifier_model: dict | None = None,
    classifier_min_logodds: float = 0.0,
    lm_model: dict | None = None,
    lm_min_avg_logprob: float | None = None,
    dsir_model: dict | None = None,
    dsir_min_logw: float | None = None,
    languages: list[str] | None = None,
    scrub_pii: bool = False,
    scrub_lines: bool = False,
    line_scrub_min_docs: int = 2,
    boilerplate_max_ratio: float | None = None,
    boilerplate_min_docs: int = 2,
    boilerplate_ngram: int = 5,
    near_dup_threshold: float | None = None,
    near_dup_mode: str = "pairs",
    embeddings: DataFrame | None = None,
    embedding_vec_col: str = "embedding",
    semantic_from_text: bool = False,
    semantic_hash_dim: int = 64,
    semantic_threshold: float = 0.95,
    semantic_n_cells: int = 64,
    normalize: bool = False,
    normalize_nfc: bool = False,
    history_signatures: DataFrame | None = None,
    history_threshold: float = 0.5,
    benchmark: DataFrame | None = None,
    decontaminate_ngram: int = 5,
    benchmark_embeddings: DataFrame | None = None,
    semantic_contamination_threshold: float = 0.9,
    mix_proportions: dict[str, float] | None = None,
    mix_group_col: str = "source",
    mix_in_tokens: bool = False,
    sample_rate: float | None = None,
    split_weights: list[float] | None = None,
    seed: int = 0,
    hash_method: str = "md5",
) -> DataFrame:
    """Filter → scrub → dedup → decontaminate → sample → split, any stage
    skippable (None / False).

    Adds ``lang`` when ``languages`` is given and ``split`` when
    ``split_weights`` is given; ``scrub_pii=True`` REPLACES ``text_col``
    with its redacted form (and adds ``pii_n_total``) before any hashing
    stage, so duplicate detection keys on the scrubbed text a trained
    model would actually see. ``benchmark`` drops documents sharing
    ``decontaminate_ngram``-gram hashes with it. ``hash_method='xx64'``
    switches every hashing stage (MinHash, sampling, split) to xxhash64
    for max throughput (md5 default keeps them SQL-verifiable).

    ``classifier_model`` (an ``nb_train`` dict) gates on the trained
    score; ``dsir_model`` (a ``dsir_train`` dict) gates on the DSIR log
    importance weight (target-likeness) with ``dsir_min_logw`` as the
    floor; ``boilerplate_max_ratio`` drops documents whose repeated-
    n-gram load exceeds it; ``embeddings`` (``(id_col, embedding_vec_col)``
    rows joining the corpus on ``id_col``) enables SemDeDup — documents
    without an embedding row pass through unexamined.
    ``semantic_from_text=True`` enables SemDeDup with NO embedding table:
    vectors come from ``hashed_embedding`` (functions/text.py) over the
    current (scrubbed) text — the model-free bridge; pass a real
    ``embeddings`` table instead when an encoder exists."""
    out = df
    if quality_min is not None:
        out = out.filter(
            text_quality(F.col(text_col))["quality_score"] >= quality_min
        )
    if classifier_model is not None:
        from zx_spark.functions.classify import nb_score

        out = out.filter(
            nb_score(F.col(text_col), classifier_model)
            > F.lit(float(classifier_min_logodds))
        )
    if lm_model is not None:
        from zx_spark.functions.lm import lm_filter

        if lm_min_avg_logprob is None:
            raise ValueError("lm_model requires lm_min_avg_logprob")
        out = lm_filter(
            out, lm_model, text_col, min_avg_logprob=lm_min_avg_logprob
        )
    if dsir_model is not None:
        # target-likeness gate (functions/dsir.py): keep documents whose
        # DSIR log importance weight clears the floor — same map-side
        # literal-array scoring as the NB/LM gates, so the three trained
        # filters fuse into one scan. NULL weights (token-less docs)
        # drop, like the other trained gates' NULL scores.
        from zx_spark.functions.dsir import dsir_log_weight

        if dsir_min_logw is None:
            raise ValueError("dsir_model requires dsir_min_logw")
        out = out.filter(
            dsir_log_weight(F.col(text_col), dsir_model)
            >= F.lit(float(dsir_min_logw))
        )
    if languages is not None:
        out = out.withColumn("lang", language_id(F.col(text_col))).filter(
            F.col("lang").isin(list(languages))
        )
    if normalize:
        # canonicalize BEFORE every hashing stage (scrubs, boilerplate,
        # dedup all key on text) but AFTER the case-sensitive quality
        # gates; NFC is the optional Python step (see functions.text)
        from zx_spark.functions.text import nfc_normalized, normalize_text

        t = F.col(text_col)
        if normalize_nfc:
            t = nfc_normalized(t)
        out = out.withColumn(text_col, normalize_text(t))
    if scrub_pii:
        out = (
            with_pii_scrubbed(out, text_col)
            .withColumn(text_col, F.col("pii_redacted"))
            .drop("pii_redacted", *[f"pii_n_{t}" for t in PII_TYPES])
        )
    if scrub_lines:
        from zx_spark.operators.decontaminate import scrub_repeated_lines

        out = (
            scrub_repeated_lines(
                out, text_col, id_col, min_docs=line_scrub_min_docs
            )
            .withColumn(text_col, F.col("scrubbed"))
            .drop("scrubbed", "n_lines_dropped")
        )
    if boilerplate_max_ratio is not None:
        from zx_spark.operators.decontaminate import drop_boilerplate_docs

        out = drop_boilerplate_docs(
            out,
            text_col,
            id_col,
            n=boilerplate_ngram,
            min_docs=boilerplate_min_docs,
            max_ratio=boilerplate_max_ratio,
        )
    out = exact_dedup(out, text_col, id_col)
    if near_dup_threshold is not None:
        pairs = near_dup_pairs(
            out, text_col, id_col, threshold=near_dup_threshold, hash_method=hash_method
        )
        if near_dup_mode == "components":
            # union-find clustering: ONE survivor per connected component
            # (a~b, b~c collapses all three) — the aggressive web-corpus
            # standard; see dedup.dup_components
            out = drop_by_components(out, pairs, id_col)
        elif near_dup_mode == "pairs":
            # greedy per-pair: drop the higher id of each verified pair
            drop = pairs.select(
                F.greatest("id_a", "id_b").alias(id_col)
            ).distinct()
            out = out.join(drop, on=id_col, how="left_anti")
        else:
            raise ValueError(
                f"near_dup_mode must be 'pairs' or 'components', got {near_dup_mode!r}"
            )
    if semantic_from_text:
        if embeddings is not None:
            raise ValueError("pass embeddings OR semantic_from_text, not both")
        from zx_spark.functions.text import with_hashed_embedding

        embeddings = with_hashed_embedding(
            out, text_col, dim=semantic_hash_dim, out_col=embedding_vec_col
        ).select(id_col, embedding_vec_col)
    if embeddings is not None:
        from zx_spark.operators.semdedup import (
            semantic_dedup_fit,
            semantic_dropped_ids,
            semantic_pairs,
        )

        # SemDeDup over the SURVIVING corpus's embeddings only (semi-join
        # first so already-dropped docs don't pull survivors down with
        # them); docs without an embedding row pass through unexamined.
        emb = embeddings.join(out.select(id_col), id_col, "left_semi")
        annotated, _ = semantic_dedup_fit(
            emb, vec_col=embedding_vec_col, id_col=id_col,
            n_cells=semantic_n_cells,
        )
        pairs = semantic_pairs(
            annotated, threshold=semantic_threshold,
            vec_col=embedding_vec_col, id_col=id_col,
        )
        # drop set ∝ semantic-duplicate mass: runtime count-gated
        # broadcast (anti_join_ids), never an unmeasured hint
        out = anti_join_ids(out, semantic_dropped_ids(pairs, id_col), id_col)
    if history_signatures is not None:
        # cross-batch dedup: drop docs near-duplicating the HISTORICAL
        # corpus — only this batch is signed, history moves as (id,
        # band keys), new-vs-new was already handled above
        from zx_spark.operators.dedup import (
            incremental_near_dups,
            signature_table,
        )

        batch_sigs = signature_table(
            out, text_col, id_col, hash_method=hash_method
        )
        hits = incremental_near_dups(
            batch_sigs,
            history_signatures,
            id_col=id_col,
            threshold=history_threshold,
            include_new_pairs=False,
        ).select(F.col("new_id").alias(id_col)).distinct()
        out = out.join(hits, id_col, "left_anti")
    if benchmark is not None:
        out = drop_contaminated(
            out, benchmark, text_col, id_col, n=decontaminate_ngram
        )
    if benchmark_embeddings is not None:
        if embeddings is None and not semantic_from_text:
            raise ValueError(
                "benchmark_embeddings needs corpus embeddings "
                "(pass embeddings or semantic_from_text=True)"
            )
        from zx_spark.operators.decontaminate import semantic_contamination

        emb = embeddings.join(out.select(id_col), id_col, "left_semi")
        leaks = semantic_contamination(
            emb,
            benchmark_embeddings,
            threshold=semantic_contamination_threshold,
            vec_col=embedding_vec_col,
            id_col=id_col,
        ).select(id_col).distinct()
        # leak set ∝ benchmark × near-dup rate — corpus-sized under
        # adversarial overlap, so the same count-gated anti-join
        out = anti_join_ids(out, leaks, id_col)
    if mix_proportions is not None:
        # downsample-only: mixing must not duplicate rows ahead of the
        # leak-proof split (a repeated key would land whole in one split,
        # skewing sizes; epoch-style upsampling belongs after splitting).
        # mix_in_tokens=True measures proportions in BPE-ish tokens (what
        # pretraining actually budgets) instead of document counts — the
        # per-group size aggregation weighs each doc by its token count.
        if mix_in_tokens:
            from zx_spark.functions.text import bpe_ish_token_count

            tok = "__mix_n_tokens"
            out, _ = mix_to_proportions(
                out.withColumn(
                    tok, bpe_ish_token_count(F.coalesce(F.col(text_col), F.lit("")))
                ),
                mix_group_col, mix_proportions, id_col,
                seed=seed, hash_method=hash_method, weight_col=tok,
            )
            out = out.drop(tok)
        else:
            out, _ = mix_to_proportions(
                out, mix_group_col, mix_proportions, id_col,
                seed=seed, hash_method=hash_method,
            )
    if sample_rate is not None:
        out = hash_sample(out, sample_rate, id_col, seed=seed, hash_method=hash_method)
    if split_weights is not None:
        out = train_test_split(
            out, split_weights, id_col, seed=seed, hash_method=hash_method
        )
    return out


def curation_audit(
    before: DataFrame,
    after: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The report a curation run logs: per-``group_col`` document and
    token counts before vs after, with keep rates — the numbers that
    say WHICH sources the gates actually ate. Two aggregations (one per
    side), joined on the group; sources dropped entirely still appear
    (outer join, zeros). Token unit = the BPE-ish counter
    (functions.text.token_budget), the same unit mixing budgets use."""
    from zx_spark.functions.text import token_budget

    b = token_budget(
        before.select(group_col, text_col), text_col=text_col, group_col=group_col
    ).select(
        F.col(group_col),
        F.col("n_docs").alias("docs_before"),
        F.col("n_tokens").alias("tokens_before"),
    )
    a = token_budget(
        after.select(group_col, text_col), text_col=text_col, group_col=group_col
    ).select(
        F.col(group_col),
        F.col("n_docs").alias("docs_after"),
        F.col("n_tokens").alias("tokens_after"),
    )
    j = b.join(a, group_col, "full_outer").na.fill(
        {"docs_before": 0, "tokens_before": 0, "docs_after": 0, "tokens_after": 0}
    )
    return j.select(
        group_col,
        "docs_before",
        "docs_after",
        "tokens_before",
        "tokens_after",
        F.round(
            F.col("docs_after") / F.greatest(F.col("docs_before"), F.lit(1)), 6
        ).alias("doc_keep_rate"),
        F.round(
            F.col("tokens_after") / F.greatest(F.col("tokens_before"), F.lit(1)), 6
        ).alias("token_keep_rate"),
    )

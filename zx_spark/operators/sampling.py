"""Deterministic sampling for training-data pipelines.

`df.sample()` is nondeterministic across retries/partitions reshuffles —
useless for reproducible corpus construction. Everything here keys the
decision on a HASH of a stable id, so membership is a pure function of
the row (survives retries, re-partitioning, incremental reruns) and the
predicate is a Catalyst expression (pushed into the scan where possible,
no Python).

At 100 TB:
- `hash_sample` is a map-side filter — no shuffle, scales with scan.
- `stratified_sample` shuffles once on the strata key (row_number over a
  hash order); cap `n_per_stratum` memory via the window, not a collect.
- `train_test_split` is the leak-proof split: the same key ALWAYS lands
  in the same side, so near-duplicate leakage across splits reduces to
  the dedup problem (run dedup first), not the splitter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key, seed: int, hash_method: str = "md5"):
    """Stable bucket in [0, 1e6), JVM-side.

    ``md5`` (default): first 15 hex digits (60 bits, positive in int64)
    of md5("<key>:<seed>") — reproducible in ANSI SQL
    (``('0x'||substr(md5(key||':seed'),1,15))::bigint % 1000000``), which
    is what lets the driver's DuckDB oracle verify sampling decisions
    value-for-value (same trick as dedup.base_hash).

    ``xx64``: xxhash64 of (key, seed) — the max-throughput choice when no
    SQL oracle needs to reproduce the buckets.

    NOTE: the default changed from xx64 to md5 in round 4 — bucket
    assignments differ from earlier versions. Pipelines that persisted a
    split under the old default must pass ``hash_method='xx64'`` to
    reproduce it (determinism is per-method, not across methods)."""
    if hash_method == "xx64":
        return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BUCKETS))
    if hash_method != "md5":
        raise ValueError(f"hash_method must be 'md5' or 'xx64', got {hash_method!r}")
    # NULL keys must still land in a bucket (md5(NULL) is NULL, which
    # would silently DROP them from hash_sample even at rate=1.0 and
    # funnel them into the last split) — coalesce to a sentinel so all
    # NULL keys bucket together, same shape as xxhash64's null handling.
    s = F.concat(
        F.coalesce(key.cast("string"), F.lit("__null__")), F.lit(f":{seed}")
    )
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"), F.lit(_BUCKETS)
    )


def split_bounds(weights: list[float]) -> list[int]:
    """Cumulative bucket bounds for ``train_test_split`` — exposed so the
    DuckDB oracle embeds the IDENTICAL integer constants."""
    total = float(sum(weights))
    bounds: list[int] = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w / total
        bounds.append(int(acc * _BUCKETS))
    return bounds


def hash_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 0, hash_method: str = "md5"
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by ``key_col``.

    Pure filter expression — no shuffle, repeatable across runs and
    cluster layouts, and rows with the same key are kept/dropped
    together (sampling users, not user-events)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(
        _bucket(F.col(key_col), seed, hash_method) < int(rate * _BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    seed: int = 0,
    hash_method: str = "md5",
) -> DataFrame:
    """Exactly ``min(n, stratum_size)`` rows per stratum, chosen by hash
    order (deterministic, unbiased within the hash). One shuffle on the
    strata key."""
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    w = Window.partitionBy(*strata_cols).orderBy(
        _bucket(F.col(key_col), seed, hash_method), F.col(key_col)
    )
    rn = "__strat_rn"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= n_per_stratum)
        .drop(rn)
    )


def train_test_split(
    df: DataFrame,
    weights: list[float],
    key_col: str,
    seed: int = 0,
    split_col: str = "split",
    hash_method: str = "md5",
) -> DataFrame:
    """Assign every row a split id (0..len(weights)-1) by hash bucket —
    disjoint, exhaustive, and stable: the same key lands in the same
    split in every run and on any cluster. Map-side expression only."""
    if not weights or any(w < 0 for w in weights):
        raise ValueError(f"weights must be non-negative, got {weights}")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    bounds = split_bounds(weights)
    b = _bucket(F.col(key_col), seed, hash_method)
    expr = F.lit(len(weights) - 1)
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(b < bounds[i], F.lit(i)).otherwise(expr)
    return df.withColumn(split_col, expr)


def leakage_safe_split(
    df: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs: DataFrame | None = None,
    components: DataFrame | None = None,
    threshold: float = 0.8,
    seed: int = 0,
    split_col: str = "split",
    hash_method: str = "md5",
) -> DataFrame:
    """``train_test_split`` that near-duplicates cannot straddle: every
    document is split by its near-dup COMPONENT label (the min id
    reachable through any chain of pairs) instead of its own id, so a
    benchmark answer and its paraphrase-by-copy land on the SAME side of
    the train/val boundary — the leakage mode a plain per-id split
    cannot prevent (the module docstring's "run dedup first", made
    first-class).

    Inputs, most-precomputed-first: ``components`` (a ``dup_components``
    frame, ``(doc_id, component)``), else ``pairs`` (near-dup pairs
    ``(id_a, id_b)`` from any of the dedup family — MinHash, SimHash,
    fuzzy, semantic), else both are computed here via
    ``near_dup_pairs(threshold=...)``. Pipelines that already ran dedup
    pass what they have and pay nothing twice.

    Scale shape: the component map is ∝ documents-in-duplicate-clusters
    (a small fraction of the corpus), so the left join is
    AQE-broadcastable; the split itself stays the same map-side hash
    expression as ``train_test_split`` — singleton documents hash their
    own id, so their assignment is IDENTICAL to the plain splitter and
    adding dedup info never reshuffles the non-duplicated majority."""
    if components is None:
        if pairs is None:
            from zx_spark.operators.dedup import near_dup_pairs

            pairs = near_dup_pairs(
                df, text_col=text_col, id_col=id_col, threshold=threshold
            )
        from zx_spark.operators.dedup import dup_components

        components = dup_components(pairs)
    comp = components.select(
        F.col("doc_id").alias("__lnode"), F.col("component").alias("__lcomp")
    )
    keyed = df.join(
        comp, F.col(f"`{id_col}`") == F.col("__lnode"), "left"
    ).withColumn("__lkey", F.coalesce(F.col("__lcomp"), F.col(f"`{id_col}`")))
    return train_test_split(
        keyed, weights, "__lkey", seed, split_col, hash_method
    ).drop("__lnode", "__lcomp", "__lkey")


def mix_by_rates(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: int = 0,
    hash_method: str = "md5",
    default_rate: float = 0.0,
    copy_col: str | None = None,
) -> DataFrame:
    """Per-group sampling/duplication rates — the data-MIXING primitive
    (so a training corpus hits target source proportions / epochs):

    - rate <= 1  → deterministic hash-sample of the group (map-side
      filter, same keep-set semantics as ``hash_sample``);
    - rate > 1   → every row repeats ``floor(rate)`` times and the
      fractional remainder is hash-sampled — "2.3 epochs of source X".
      Repeats come from exploding a tiny per-row sequence; ``copy_col``
      (optional) numbers the copies so downstream shuffles can
      de-collide them.

    Everything is a Catalyst expression on a stable key hash: no
    shuffle, reproducible across runs/retries/cluster layouts. Groups
    not named in ``rates`` get ``default_rate`` (0.0 = dropped — make
    the corpus composition explicit)."""
    for g, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for {g!r} must be >= 0, got {r}")
    if default_rate < 0:
        raise ValueError(f"default_rate must be >= 0, got {default_rate}")
    rate = F.lit(float(default_rate))
    for g, r in rates.items():
        rate = F.when(F.col(f"`{group_col}`") == g, F.lit(float(r))).otherwise(rate)
    b = _bucket(F.col(key_col), seed, hash_method)
    frac_keep = b < ((rate - F.floor(rate)) * _BUCKETS).cast("long")
    n_copies = (
        F.floor(rate).cast("int") + F.when(frac_keep, 1).otherwise(0)
    )
    out = (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            copy_col or "__copy_no",
            F.explode(F.sequence(F.lit(1), F.col("__n_copies"))),
        )
        .drop("__n_copies")
    )
    return out if copy_col else out.drop("__copy_no")


def mix_to_proportions(
    df: DataFrame,
    group_col: str,
    proportions: dict[str, float],
    key_col: str,
    seed: int = 0,
    hash_method: str = "md5",
    allow_upsample: bool = False,
    counts: dict[str, float] | None = None,
    weight_col: str | None = None,
) -> tuple[DataFrame, dict[str, float]]:
    """Derive per-group rates that land the corpus on target
    ``proportions`` and apply them. Returns ``(mixed_df, rates)`` so the
    mix is auditable.

    Downsample-only (default): the achievable total is limited by the
    scarcest source (``count_g / p_g`` minimized), every other group is
    thinned to match — no row is duplicated. ``allow_upsample=True``
    keeps the corpus size instead and lets scarce sources repeat
    (epoch-style). The apply step is ``mix_by_rates`` (map-side).

    Proportions are measured in whatever unit the group sizes are:

    - default — row counts (one count aggregation over ``df``);
    - ``weight_col`` — ``sum(weight_col)`` per group instead, e.g. a
      token-count column → TOKEN-proportion mixing, the unit real
      pretraining mixes target (rates stay per-ROW keep probabilities,
      so the achieved token share matches in expectation — exact only
      when weights are uniform within a group);
    - ``counts`` — precomputed sizes (e.g. ``token_budget``'s n_tokens
      per source, which a real mixing plan computes anyway): skips the
      aggregation entirely, so mixing adds ZERO extra passes over a
      100 TB corpus."""
    if not proportions:
        raise ValueError("proportions must be non-empty")
    if any(p < 0 for p in proportions.values()):
        raise ValueError(f"proportions must be >= 0: {proportions}")
    if counts is not None and weight_col is not None:
        raise ValueError("pass counts OR weight_col, not both")
    total_p = float(sum(proportions.values()))
    if total_p <= 0:
        raise ValueError("proportions must sum to > 0")
    norm = {g: p / total_p for g, p in proportions.items()}
    if counts is not None:
        counts = {g: float(c) for g, c in counts.items() if g in norm}
    else:
        size = (
            F.count(F.lit(1))
            if weight_col is None
            else F.sum(F.col(f"`{weight_col}`").cast("double"))
        )
        counts = {
            r[group_col]: float(r["__size"])
            for r in df.groupBy(group_col).agg(size.alias("__size")).collect()
            if r[group_col] in norm and r["__size"] is not None
        }
    missing = [g for g, p in norm.items() if p > 0 and not counts.get(g)]
    if missing:
        raise ValueError(f"groups {missing} have no rows to mix from")
    if allow_upsample:
        target_total = float(sum(counts.values()))
    else:
        target_total = min(counts[g] / p for g, p in norm.items() if p > 0)
    rates = {
        g: (norm[g] * target_total / counts[g]) if counts.get(g) else 0.0
        for g in norm
    }
    if not allow_upsample:
        # guard fp drift: downsample-only must never exceed 1
        rates = {g: min(1.0, r) for g, r in rates.items()}
    return (
        mix_by_rates(
            df, group_col, rates, key_col, seed, hash_method,
            copy_col="mix_copy_no" if allow_upsample else None,
        ),
        rates,
    )


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    seed: int = 0,
    strata_cols: list[str] | None = None,
    hash_method: str = "md5",
    priority_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): keep the ``n`` rows with the largest priority
    ``ln(u) / w``, where ``u`` is the row's stable hash bucket mapped
    into (0, 1) and ``w`` its weight — inclusion probability is
    proportional to weight, membership is a pure function of the row
    (survives retries/re-partitioning, like every sampler here). The
    pretraining use: "sample N documents proportional to token count"
    without materializing per-row randomness.

    ``strata_cols`` switches to n PER STRATUM (one shuffle on the strata
    key, same shape as ``stratified_sample``); global top-n is a
    TakeOrdered — no full sort, driver holds n rows' worth of keys only.
    Rows with NULL or non-positive weight are excluded (they carry zero
    sampling mass). ``priority_col`` exposes the priority for audits.

    The priority is reproducible in ANSI SQL (same md5 bucket +
    ``ln(u)/w``); ``ln`` differs between engines only in the last ulp,
    which flips a ranking only when two priorities all but tie —
    the hash-distinct buckets make that measure-zero, and the
    (priority, key) tie-break keeps the order total either way."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = F.col(f"`{weight_col}`").cast("double")
    u = (_bucket(F.col(key_col), seed, hash_method) + 0.5) / float(_BUCKETS)
    pri = F.ln(u) / w
    out = df.filter(w > 0).withColumn(priority_col or "__wpri", pri)
    pc = priority_col or "__wpri"
    if strata_cols:
        rn = F.row_number().over(
            Window.partitionBy(*strata_cols).orderBy(
                F.col(pc).desc(), F.col(key_col)
            )
        )
        out = out.withColumn("__wrn", rn).filter(F.col("__wrn") <= n).drop("__wrn")
    else:
        out = out.orderBy(F.col(pc).desc(), F.col(key_col)).limit(n)
    return out if priority_col else out.drop("__wpri")


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    id_col: str,
    seed: int = 0,
    n_salts: int = 1,
    hash_method: str = "md5",
    priority_col: str | None = None,
    ascending: bool = True,
) -> DataFrame:
    """Deterministic per-key quota cap: keep at most ``n`` rows per
    ``key_cols`` group — the web-corpus "domain cap" primitive (bound
    any one domain/source/shard's share of the training mix). Which
    rows survive is a pure function of the data: rank by the stable md5
    bucket of ``id_col`` (uniform "random" but replayable, same
    ``_bucket`` family as every sampler here), or by an explicit
    ``priority_col`` (e.g. a quality score; ``ascending=False`` keeps
    the highest). Ties always break on ``id_col``, so the order is
    total and engines agree.

    ``n_salts > 1`` is the hot-key path: one giant key (a crawl's top
    domain can be 1e8 pages) would otherwise sort in a single window
    partition. Stage 1 ranks within (key, salt) — salt = a stable hash
    of the id, so each of the ``n_salts`` sub-partitions is ~1/S of the
    hot key — and keeps each sub-partition's top ``n``; stage 2 ranks
    the ≤ n·S survivors per key exactly. The result is IDENTICAL to
    the unsalted rank: any row in a key's true top ``n`` has at most
    n-1 rows ahead of it overall, hence at most n-1 ahead of it in its
    own salt bucket, so stage 1 can never drop it. Cost: two bounded
    window shuffles instead of one unbounded one.

    NULL keys form their own group (capped like any other); NULL ids
    are excluded (no stable identity → no replayable decision). NULL
    priorities sort LAST in either direction — a row with no score can
    never outrank a scored row, it only fills leftover quota."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    pri = (
        F.col(f"`{priority_col}`")
        if priority_col
        else _bucket(F.col(f"`{id_col}`"), seed, hash_method)
    )
    out = df.filter(F.col(f"`{id_col}`").isNotNull()).withColumn("__cpri", pri)
    order = [
        # nulls LAST both ways: under Spark's default nulls-first asc, a
        # NULL priority would preferentially consume the per-key quota
        F.col("__cpri").asc_nulls_last()
        if ascending
        else F.col("__cpri").desc_nulls_last(),
        F.col(f"`{id_col}`").asc(),
    ]
    if n_salts > 1:
        salt = _bucket(F.col(f"`{id_col}`"), seed + 1, hash_method) % n_salts
        w1 = Window.partitionBy(*key_cols, "__csalt").orderBy(*order)
        out = (
            out.withColumn("__csalt", salt)
            .withColumn("__crn", F.row_number().over(w1))
            .filter(F.col("__crn") <= n)
            .drop("__csalt", "__crn")
        )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        out.withColumn("__crn", F.row_number().over(w))
        .filter(F.col("__crn") <= n)
        .drop("__crn", "__cpri")
    )

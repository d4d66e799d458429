"""A/B: dup_components min-label propagation vs alternating
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) — VERDICT r14 item 5.

Two distributions:
- REAL: the MinHash near-dup pair list at sf0.1 (near-clique clusters,
  label-prop converges in 2-3 rounds) — the distribution the shipped
  bench rows (dedup_minhash_pairs_v2, sampling_suite_v3) actually see.
- CHAIN: a synthetic path graph (the adversarial long-diameter case
  where label-prop needs diameter rounds and star needs O(log n)).

Run EXCLUSIVELY: ``python tools/ab_components_star.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_components(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                    max_iter: int = 40) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star over an undirected edge list.
    Returns (labels (doc_id, component), rounds_run). Each round is one
    large-star + one small-star; each star op is one groupBy-min join
    back over the edges (2 shuffles per op → 4 per round) plus the
    convergence count."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )

    def min_nbr(e: DataFrame) -> DataFrame:
        # m(u) = min over N(u) ∪ {u}; neighbors of u on both sides
        both = e.select("u", "v").unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        return (
            both.groupBy("u")
            .agg(F.min("v").alias("m"))
            .select("u", F.least("u", "m").alias("m"))
        )

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: for each u connect every neighbor v > u's min... the
        # canonical form: edges (u,v) with v>u keyed by the SMALLER-side
        # convention. Using the (u=max, v=min) orientation above:
        # large-star(u): emit (x, m(u)) for every neighbor x > m(u)?  The
        # standard formulation operates per node over its full adjacency:
        both = edges.select("u", "v").unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mn = min_nbr(edges).hint("shuffle_hash")
        # large-star: (x, m(u)) for x in N(u), x > u
        ls = (
            both.join(mn, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # keep (v<=u) edges as-is for the next op
        keep = both.filter(F.col("v") < F.col("u")).select("u", "v")
        e1 = (
            ls.unionAll(keep)
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: (x, m(u)) for x in N(u) ∪ {u}, x <= u (x < u here)
        both1 = e1.select("u", "v").unionAll(
            e1.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mn1 = min_nbr(e1).hint("shuffle_hash")
        ss = (
            both1.join(mn1, "u")
            .filter(F.col("v") < F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(e1.select(F.col("u"), F.col("v")).limit(0))
        )
        # u itself connects to m too (keeps the root edge)
        selfe = mn1.filter(F.col("u") != F.col("m")).select(
            F.col("u"), F.col("m").alias("v")
        )
        e2 = (
            ss.unionAll(selfe)
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # converged when every edge already points at the component min:
        # e2 is star-shaped iff large-star would change nothing — test by
        # edge-set equality (both checkpointed, cheap at these sizes)
        changed = e2.exceptAll(edges).limit(1).count()
        edges = e2
        if changed == 0:
            break
    labels = (
        edges.select(F.col("u").alias("doc_id"), F.col("v").alias("component"))
        .unionAll(
            edges.select(F.col("v").alias("doc_id"), F.col("v").alias("component"))
        )
        .groupBy("doc_id")
        .agg(F.min("component").alias("component"))
    )
    return labels, rounds


def main() -> None:
    from zx_spark.operators.dedup import dup_components, near_dup_pairs
    from zx_spark.session import get_spark
    from zx_spark.storage import read_table

    spark = get_spark("ab_star")
    spark.range(1).count()

    print("== REAL distribution: minhash pairs at sf0.1 ==")
    docs = read_table(spark, "/root/testdata/sf0.1", "documents")
    pairs = near_dup_pairs(docs, "text", "doc_id", threshold=0.5).select(
        "id_a", "id_b"
    ).localCheckpoint()
    n_pairs = pairs.count()
    print(f"pairs: {n_pairs}")
    for _ in range(3):
        t0 = time.time()
        lp = dup_components(pairs)
        n1 = lp.count()
        t1 = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        st, rounds = star_components(pairs)
        n2 = st.count()
        t2 = time.time() - t0
        spark.catalog.clearCache()
        print(f"label-prop {t1:.2f}s ({n1} nodes) | star {t2:.2f}s "
              f"({n2} nodes, {rounds} rounds)")
    a = sorted(map(tuple, lp.collect()))
    b = sorted(map(tuple, st.collect()))
    print("labels identical:", a == b)

    print("== CHAIN synthetic: 3000-node path ==")
    chain = spark.range(3000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    ).localCheckpoint()
    t0 = time.time()
    stc, rounds = star_components(chain)
    got = stc.groupBy("component").count().count()
    t2 = time.time() - t0
    print(f"star: {t2:.2f}s, {rounds} rounds, {got} component(s)")
    t0 = time.time()
    lpc = dup_components(chain, max_iter=8)  # bounded probe: time/round
    lpc.count()
    t1 = time.time() - t0
    print(f"label-prop (8 rounds, NOT converged — diameter 3000): {t1:.2f}s "
          f"→ {t1/8:.2f}s/round → full convergence would need ~3000 rounds")


if __name__ == "__main__":
    main()

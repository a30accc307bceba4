"""Graph analytics over edge relations (beyond-reference extension; the
dedup stack's connected components and triangle counting live in ext/dedup —
this module holds the general-purpose iterative algorithms expressed as
unrolled declarative plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_unrolled(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int = 3,
    damping: float = 0.85,
    ndigits: int = 8,
) -> DataFrame:
    """PageRank with a FIXED number of unrolled iterations — one declarative
    plan, no driver-side loop state, no collect. Each iteration is
    contributions = edges ⋈ ranks (shuffle on src) → groupBy dst (shuffle on
    dst). The edge list and its degree join are MATERIALIZED once
    (localCheckpoint): Catalyst does NOT reuse un-exchanged subtrees
    across unrolled iterations, so the lazy form re-derived the edges
    from the raw fact table every iteration AND on both sides of the
    iteration join — measured 22 lineitem scans for the 3-iteration
    co-purchase entry, 1 after materialization. (Production PageRank
    persists its edge RDD for exactly this reason.) Unrolling (vs.
    iterate-to-convergence) is the right shape when k is a product
    decision (web-scale deployments run fixed k too); the
    convergence-driven variant needs per-round checkpointing like
    ext.dedup.near_dup_clusters and is the named upgrade path.

    Assumes no dangling nodes (every src has outdegree ≥ 1 — true for
    symmetric edge sets like co-occurrence graphs; a general deployment
    adds the dangling-mass redistribution term).

    Output: (node, pr) — pr rounded to ``ndigits`` (per-node contribution
    sums accumulate in engine-specific order; at rank magnitudes ~1/N the
    FP spread is ~1e-15, far below the rounding grid)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    n = deg.agg(F.count("*").alias("n"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("pr")
    )
    # deg/e_deg re-plan from the materialized e — cheap shuffles on the
    # edge table, no fact-table re-derivation; a second checkpoint of
    # e_deg measured slower at harness scale (double materialization)
    # without removing any corpus work.
    e_deg = e.join(deg, "src")
    for _ in range(iterations):
        contribs = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("d")).alias("mass"))
        )
        ranks = contribs.crossJoin(F.broadcast(n)).select(
            F.col("dst").alias("node"),
            ((1.0 - damping) / F.col("n") + damping * F.col("mass")).alias("pr"),
        )
    return ranks.select("node", F.round("pr", ndigits).alias("pr"))


def label_propagation_unrolled(
    edges: DataFrame, src: str, dst: str, iterations: int = 3
) -> DataFrame:
    """Synchronous label propagation (community detection) with a FIXED
    number of unrolled iterations and a deterministic update rule: each
    node adopts the most frequent label among its neighbors, frequency
    ties broken by the SMALLEST label. Classic async LPA is
    famously nondeterministic (update order changes communities); the
    synchronous min-tie-break form is a pure function of the edge set,
    which is what makes it hash-oracle-checkable — and is the variant a
    reproducible pipeline wants anyway.

    Plan shape mirrors pagerank_unrolled: edges symmetrized and
    MATERIALIZED once (localCheckpoint — Catalyst re-derives
    un-exchanged subtrees per unrolled iteration), then each iteration
    is one join (labels onto edge endpoints, shuffle on the node key)
    + one (node, label) count + one max_by pick per node; every
    intermediate is node- or edge-cardinality-sized. Iterate-to-
    convergence needs per-round checkpointing (the near_dup_clusters
    pattern) and is the named upgrade path; fixed k is the production
    norm for bounded-latency community refreshes.

    Output: (node, label) — label = min node id of the community seed
    each node converged toward after k rounds."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(iterations):
        nbr = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "lbl")
        cnt = nbr.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
        # lexicographic max of (count, -label) = max count, min label
        labels = cnt.groupBy("node").agg(
            F.max_by("lbl", F.struct(F.col("c"), -F.col("lbl"))).alias("lbl")
        )
    return labels.select("node", F.col("lbl").alias("label"))

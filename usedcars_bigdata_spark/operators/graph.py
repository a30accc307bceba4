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

"""Distributed PageRank (fixed-iteration, deterministic).

The second iterative graph operator next to connected components
(components.py): rank mass flows along directed edges, damped. Built for
oracle replay — fixed iteration count, every per-node rank ROUNDED to 8
decimals at each step (so a SQL engine replays training bit-identically;
the kmeans_centroids discipline), dangling nodes simply leak their mass
(the standard simplified variant — no global dangling-mass redistribution
term, which would add a per-iteration scalar fetch for no test value).

Scale: per iteration one (src-keyed) join edges->ranks + one dst-keyed
hash aggregation — the same shuffle profile as one connected-components
round; nothing is all-pairs, nothing collects to the driver. The
edges/nodes/out-degree relations are derived once and lazily
checkpointed, so iteration i doesn't re-derive the lineage of i-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Rank every node of the directed graph ``edges`` (distinct
    (src, dst) pairs are taken internally). Returns (node, pr) with pr
    rounded to 8 decimals — reproducible across engines at any partition
    count."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # The (src, dst, deg) relation is ITERATION-INVARIANT — join it once
    # and materialize, instead of re-running the edges->outdeg join (and
    # its shuffle) inside every iteration.
    e_deg = e.join(outdeg, "src").localCheckpoint(eager=False)
    # |V| as a broadcast one-row relation — never a driver fetch.
    n_rel = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    pr = nodes.crossJoin(F.broadcast(n_rel)).select(
        "node", F.round(F.lit(1.0) / F.col("n"), 8).alias("pr")
    )
    for _ in range(iterations):
        contribs = (
            e_deg.join(pr, e_deg.src == pr.node)
            .groupBy("dst")
            .agg(F.round(F.sum(F.col("pr") / F.col("deg")), 8).alias("s"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(n_rel))
            .join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("s"), F.lit(0.0)),
                    8,
                ).alias("pr"),
            )
        )
    return pr

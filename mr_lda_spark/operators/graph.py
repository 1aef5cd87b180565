"""Iterative graph algorithms as join-chained DataFrame plans — the
Pregel-shaped family (sibling of the hash-min connected components in
``operators/dedup.py``; no counterpart in the reference, which has no
graph surface).

PageRank here is INTEGER-EXACT: ranks live in micro-units (scale
10^6) and every step is integer arithmetic (floor division for the
per-edge contribution, integer damping), so two engines that agree on
BIGINT division agree on every bit of every iteration — the property
that makes a cross-engine oracle possible for an iterative float-ish
algorithm (the same trick as the kmeans/ADC integer-exact oracles;
see the project's r6/r8 notes).  With damping d = num/den:

    pr0(v)  = scale
    pr_k(v) = (scale·(den-num)) // den
            + (num · Σ_{u→v} (pr_{k-1}(u) // outdeg(u))) // den

Scale shape (100 TB): each iteration is one edges⋈ranks⋈degree join
(all shuffles on the node key, AQE-splittable on hot nodes) plus a
map-side-combined groupBy — the rank relation is node-sized, never
driver-sized; the iteration count is the only driver state.  Lineage
is cut per iteration with ``localCheckpoint`` like the connected-
components rounds, so deep iteration counts don't stack a
quadratically-replanned DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    checkpoint: bool = True,
) -> DataFrame:
    """Integer-exact PageRank over directed ``edges`` (columns
    ``src``, ``dst``) → (node, pr) with micro-unit BIGINT ranks.

    Dangling nodes (out-degree 0) keep only the teleport term — their
    mass is dropped, not redistributed, matching the unrolled SQL
    oracle; feed a symmetrized edge list if every node should emit
    (the registered query does).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Loop-invariant: the (src, dst, deg) relation and the node set
    # are reused by every iteration (and the final left join) — hoist
    # the degree join out of the loop and persist both, or each
    # iteration re-executes the caller's whole edge lineage (measured
    # at registration: 11.0 s → 4-ish s for the 3-iteration
    # customer↔supplier query, see PERF_NOTES_r09).
    ed = edges.join(deg, "src").select("src", "dst", "deg").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ed.count()
    nodes.count()
    base = scale * (damping_den - damping_num) // damping_den
    ranks = nodes.withColumn("pr", F.lit(scale).cast("long"))
    for _ in range(int(iterations)):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("pr div deg").alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(s, 0L))"
                        f" div {damping_den}"
                    )
                ).alias("pr"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks

"""Iterative graph algorithms as DataFrame fixpoint loops.

PageRank is the representative: each iteration is one equi-join
(edges ⋈ ranks on src) plus one aggregation (sum of contributions per
dst) — both AQE-managed shuffles on the same key, no Python in the
loop body.  The driver only orchestrates; per-iteration state is a
(node, rank) DataFrame that gets ``localCheckpoint``-ed and REPLACED.
Checkpointing (not mere persist!) is load-bearing: each iteration's
plan references the previous one ~3× (dangling mass, contributions,
and the rank update), so an uncheckpointed loop grows a 3^k-node
LOGICAL PLAN — at 10 iterations the driver OOMs just *printing* the
tree, long before any data moves (found by this module's own tests).
``persist`` caches data but keeps the nested plan; ``localCheckpoint``
truncates lineage to the cached blocks.

Dangling nodes (no out-edges) are handled per the canonical
formulation: their rank mass redistributes uniformly each iteration,
so total rank stays 1 and the result matches the power-iteration
definition other engines (and the SQL oracle) compute.

Node ids are caller-provided strings; at 100 TB you'd dictionary-
encode ids to int64 first (one groupBy) — the loop is id-type
agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Returns (node, rank) for every node appearing as src or dst,
    after ``iterations`` rounds from a uniform start. Parallel edges
    should be pre-deduplicated by the caller if unwanted (they act as
    edge weights otherwise, which is often what you want).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()  # also materializes the persist
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg) once — the loop reuses it every iteration
    ej = e.join(outdeg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ej.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(iterations):
        prev = ranks
        # dangling mass: rank held by nodes with no out-edges
        dang = (
            prev.join(outdeg, prev["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("mass"))
        )
        contrib = (
            ej.join(prev, ej["src"] == prev["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .join(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("mass") / n)
                ).alias("rank"),
            )
        )
        # truncate lineage every iteration (eager: also materializes,
        # so the old iteration's blocks are no longer referenced)
        ranks = ranks.localCheckpoint(eager=True)
    # the result is checkpointed → it no longer references these blocks
    nodes.unpersist()
    ej.unpersist()
    return ranks

"""Link-graph analytics: PageRank over (src, dst) edge tables — the
domain-authority signal web-corpus curation pipelines weight quality by
(Common Crawl publishes exactly this kind of centrality for its host
graph; seed-quality lists are rank-thresholded link graphs).

The iterative sibling of ``dedup.neardup_clusters``: bounded rounds of
pure DataFrame joins/aggregations with per-round checkpoint truncation
(the lineage would otherwise grow linearly and re-execute the whole
history on any recompute). Same scale contract — per-round cost is one
edges⋈ranks equi-join (shuffle on node id; AQE handles hub skew) plus
one node-keyed aggregation, and the rank table is node-sized, never
edge-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Power-iteration PageRank: (node, rank) after ``n_iters`` rounds
    of ``rank = (1-d)/N + d·(Σ in-neighbor rank/out_degree +
    dangling_mass/N)`` — the standard formulation with dangling-node
    mass redistributed uniformly, so ``SUM(rank) = 1`` every round
    (pinned in tests against a numpy power-iteration reference).

    Nodes are every DISTINCT id appearing as src or dst; duplicate
    (src, dst) rows count as parallel edges (weight by multiplicity —
    dedup upstream if the graph is simple). Each round: one
    contributions join keyed on src (edge-sized, the only big shuffle),
    one dst-keyed sum, one left-join back to the node table for
    zero-in-degree nodes, then a checkpoint truncating lineage
    (``reliable_checkpoint`` as in ``neardup_clusters``: executor-local
    by default, real checkpoint dir on a cluster). The dangling mass is
    a one-row aggregate of the node-sized rank table, broadcast back as
    a literal-free join-less scalar via collect (bounded: one double).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("pagerank: damping must be in (0, 1)")
    if n_iters < 1:
        raise ValueError("pagerank: n_iters must be >= 1")

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable_checkpoint else df.localCheckpoint()

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = _ckpt(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    # edges annotated with the sender's out-degree, checkpointed once —
    # every round reuses this materialized table
    contrib_edges = _ckpt(e.join(out_deg, "src"))

    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(n_iters):
        sending = contrib_edges.join(
            ranks.select(F.col("node").alias("src"), "rank"), "src"
        )
        received = (
            sending.groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_in"))
        )
        # dangling nodes (no outgoing edges) leak their mass — collect
        # it (one double) and spread uniformly, keeping SUM(rank) = 1
        dangling = (
            ranks.join(out_deg.select(F.col("src").alias("node")),
                       "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        spread = base + damping * dangling / n_nodes
        ranks = _ckpt(
            nodes.join(received, "node", "left")
            .select(
                "node",
                (
                    F.lit(spread)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 8).alias("rank"))

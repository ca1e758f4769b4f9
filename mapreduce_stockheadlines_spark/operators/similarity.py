"""Similarity search over embedding columns (§2.2 extension).

Baseline: brute-force cosine top-k — correct at any scale if the query set
is small (broadcast) even when the corpus is huge; the scan is
embarrassingly parallel and never shuffles the corpus.

Scale path: LSH-bucketed (random-hyperplane sign buckets) variant that
prunes the candidate set before the exact re-rank, turning the cross
product into a bucket-equijoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, dot


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    The query side is broadcast (BroadcastNestedLoopJoin over the corpus
    scan — one pass, no corpus shuffle); ranking shuffles only
    |queries| × |corpus| *scored* rows, and per-query top-k is a window
    over a small partition count.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank"
        )
    )


def neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine > threshold.

    Brute-force variant for oracle checking; at scale use
    ``lsh_bucketed_pairs`` to block before scoring.
    """
    a = emb.select(F.col(id_col).alias("id_a"), as_double(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), as_double(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim")
        )
        .filter(F.col("sim") > threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no numpy dependency at
    plan-build time, reproducible across runs)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bucket expression: bit i = (v · plane_i) > 0 — random-hyperplane
    LSH for cosine. Returns an int bucket id column."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec_col, plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        bucket = bucket + bit
    return bucket


def lsh_bucketed_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Scale path: bucket by hyperplane signs, score only same-bucket pairs
    (equijoin on bucket id → shuffle co-location, no cross product), then
    exact cosine verify. Recall < 1 by construction (documented; raise
    recall with multiple tables / fewer planes)."""
    planes = _hyperplanes(dim, n_planes)
    bucketed = emb.select(
        F.col(id_col).alias("id"),
        as_double(vec_col).alias("v"),
        lsh_bucket(as_double(vec_col), planes).alias("bucket"),
    )
    a = bucketed.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket"
    )
    b = bucketed.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") > threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
        .distinct()
    )

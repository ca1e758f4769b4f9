"""Similarity search over embedding columns (§2.2 extension).

Baseline: brute-force cosine — exact at any scale. Both the all-pairs and
top-k variants run the quadratic math as vectorized numpy matrix products
inside Arrow-batched Pandas functions (the hot path is BLAS, not per-row
expression evaluation):

- ``neardup_pairs``: block-decomposed A·Bᵀ. Rows are hashed into fixed-size
  blocks; each unordered block pair becomes one task holding at most two
  blocks in memory. Shuffle volume is n·B rows (B = block count) and
  per-task memory is bounded by ``block_rows`` regardless of total n —
  the compute is inherently O(n²) (use ``lsh_bucketed_pairs`` as the
  scale path), but no single task ever materializes more than two blocks.
- ``cosine_topk``: the (small) query side is broadcast as one dense
  matrix; the corpus streams through ``mapInPandas`` with a per-batch
  local top-k, so only |queries|·k rows per batch reach the final
  global top-k window. The corpus is never shuffled.

Scale path: LSH-bucketed (random-hyperplane sign buckets) variant that
prunes the candidate set before the exact re-rank, turning the cross
product into a bucket-equijoin.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot


def _to_matrix(series: pd.Series) -> np.ndarray:
    """Stack an Arrow list column into a dense float64 matrix, L2-normalized
    row-wise (zero vectors stay zero → cosine 0, matching 0/||0|| guards)."""
    m = np.array(list(series), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    The query side is collected and broadcast as one normalized numpy
    matrix (it is a query *set* — semantically small, like the build side
    of a broadcast join); the corpus streams through ``mapInPandas`` in
    Arrow batches. Each batch emits only its local top-k per query, so the
    final global window ranks ≤ |queries|·k rows per batch instead of
    |queries|·|corpus| scored rows.
    """
    q_pdf = (
        queries.select(
            F.col(id_col).cast("long").alias("query_id"),
            as_double(vec_col).alias("qv"),
        )
        .toPandas()
        .sort_values("query_id")
    )
    q_ids = q_pdf["query_id"].to_numpy()
    q_mat = _to_matrix(q_pdf["qv"])
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_c = pdf["neighbor_id"].to_numpy()
            mat_c = _to_matrix(pdf["cv"])
            sims = mat_q @ mat_c.T  # |Q| x batch
            sims[ids_q[:, None] == ids_c[None, :]] = -np.inf  # mask self
            kk = min(k, sims.shape[1])
            # per-query local top-k: argpartition then exact sort of k items
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(ids_q, kk)
            cols = part.ravel()
            vals = np.take_along_axis(sims, part, axis=1).ravel()
            keep = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": rows[keep],
                    "neighbor_id": ids_c[cols[keep]],
                    "sim": vals[keep],
                }
            )

    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
    )
    scored = c.mapInPandas(
        local_topk, "query_id long, neighbor_id long, sim double"
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
    block_rows: int = 4096,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine > threshold — exact, blocked.

    Rows are hashed into B ≈ n/block_rows blocks; every unordered block
    pair (pa ≤ pb) is one ``applyInPandas`` group whose task computes the
    sub-matrix product with numpy. Per-task memory is ≤ 2·block_rows
    vectors however large n grows; the replication factor of the
    broadcast pair-map join is B per row. Brute force is O(n²) compute by
    definition — ``lsh_bucketed_pairs`` is the sub-quadratic scale path.
    """
    n = emb.count()
    nblocks = max(1, math.ceil(n / block_rows))
    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).cast("long").alias("id"), as_double(vec_col).alias("v")
    ).withColumn("g", F.pmod(F.xxhash64(F.col("id")), F.lit(nblocks)).cast("int"))
    pair_map = spark.createDataFrame(
        [
            (pa, pb, g)
            for pa in range(nblocks)
            for pb in range(pa, nblocks)
            for g in ({pa, pb})
        ],
        "pa int, pb int, g int",
    )
    joined = base.join(F.broadcast(pair_map), "g")

    def score_block_pair(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pa, pb = key
        side_a = pdf[pdf["g"] == pa]
        side_b = pdf[pdf["g"] == pb] if pa != pb else side_a
        if len(side_a) == 0 or len(side_b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"}
            )
        ids_a = side_a["id"].to_numpy()
        ids_b = side_b["id"].to_numpy()
        sims = _to_matrix(side_a["v"]) @ _to_matrix(side_b["v"]).T
        if pa == pb:
            # every unordered pair appears twice in the square matrix;
            # keep the upper triangle (id_a < id_b) once
            ia, ib = np.nonzero(
                (sims > threshold) & (ids_a[:, None] < ids_b[None, :])
            )
            lo, hi = ids_a[ia], ids_b[ib]
        else:
            # cross-block: each unordered pair appears exactly once and only
            # in this group — keep all, orient as (min, max)
            ia, ib = np.nonzero(sims > threshold)
            lo = np.minimum(ids_a[ia], ids_b[ib])
            hi = np.maximum(ids_a[ia], ids_b[ib])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": sims[ia, ib]})

    return (
        joined.groupBy("pa", "pb")
        .applyInPandas(score_block_pair, "id_a long, id_b long, sim double")
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    into ``n_centroids`` cells, probe only the ``n_probe`` cells nearest
    each query, exact-rescore the candidates.

    Scale path vs brute force: the candidate join prunes the corpus to
    ~n_probe/n_centroids of its rows BEFORE any scoring work; the probe
    table (|queries| x n_probe rows) broadcasts, so the corpus is never
    shuffled — candidates flow straight into a vectorized rescore and a
    per-query top-k window. Centroids are the ``n_centroids``
    lowest-id corpus vectors (deterministic, no iterative training —
    swap in k-means offline for production recall).

    Recall < 1 by construction (rows-only check; recall is pinned by a
    property test against the exact ``cosine_topk``).
    """
    spark = corpus.sparkSession
    cent_pdf = (
        corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
        .orderBy(id_col)
        .limit(n_centroids)
        .toPandas()
    )
    cent_mat = _to_matrix(cent_pdf["v"])
    bc = spark.sparkContext.broadcast(cent_mat)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cmat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _to_matrix(pdf["cv"])
            # argmax picks the FIRST maximal centroid → deterministic ties
            cl = np.argmax(m @ cmat.T, axis=1).astype("int32")
            yield pd.DataFrame(
                {"cluster": cl, "neighbor_id": pdf["neighbor_id"], "cv": pdf["cv"]}
            )

    assigned = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
    ).mapInPandas(assign, "cluster int, neighbor_id long, cv array<double>")

    q_pdf = (
        queries.select(
            F.col(id_col).cast("long").alias("query_id"),
            as_double(vec_col).alias("qv"),
        )
        .toPandas()
        .sort_values("query_id")
    )
    q_ids = q_pdf["query_id"].to_numpy()
    q_mat = _to_matrix(q_pdf["qv"])
    probe_order = np.argsort(-(q_mat @ cent_mat.T), axis=1)[:, :n_probe]
    probes = spark.createDataFrame(
        [
            (int(qid), int(c))
            for qid, row in zip(q_ids, probe_order)
            for c in row
        ],
        "query_id long, cluster int",
    )
    bq = spark.sparkContext.broadcast(
        {int(qid): q_mat[i] for i, qid in enumerate(q_ids)}
    )

    def rescore(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qvs = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _to_matrix(pdf["cv"])
            qm = np.stack([qvs[int(q)] for q in pdf["query_id"]])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "sim": np.einsum("ij,ij->i", qm, m),
                }
            )

    candidates = assigned.join(F.broadcast(probes), "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = candidates.select("query_id", "neighbor_id", "cv").mapInPandas(
        rescore, "query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
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
        F.col(id_col).cast("long").alias("id"),
        as_double(vec_col).alias("v"),
        lsh_bucket(as_double(vec_col), planes).alias("bucket"),
    )

    def score_bucket(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        sims = _to_matrix(pdf["v"]) @ _to_matrix(pdf["v"]).T
        ia, ib = np.nonzero((sims > threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "sim": sims[ia, ib]}
        )

    return (
        bucketed.groupBy("bucket")
        .applyInPandas(score_bucket, "id_a long, id_b long, sim double")
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
        .distinct()
    )

"""Count → sort → rank → format pipeline (SURVEY.md §2.1 O10-O15).

The reference materializes every group in a single reducer's HashMap and
sorts in ``cleanup`` (/root/reference/src/StockCount.java:37-66,
WordCount.java:68-93) — its own README flags that as the scalability
bottleneck. Here:

- counting is ``groupBy().count()`` → partial (map-side combine) + final
  HashAggregate with spill — the combiner the reference discusses but never
  implements (WordCount.java:104);
- top-k is ``orderBy().limit()`` → ``TakeOrderedAndProject`` (per-partition
  heaps, no global sort);
- full ranked output sorts the *aggregated* table (cardinality = #distinct
  keys, orders of magnitude smaller than the input even at 100 TB), so the
  single-partition row_number window runs over thousands of rows, not
  billions.

Ties: the reference's rank order on equal counts is nondeterministic
(HashMap iteration, StockCount.java:54-58); the engine adds a ``key ASC``
tiebreaker — documented intentional divergence (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def count_by_key(df: DataFrame, key: str, count_col: str = "cnt") -> DataFrame:
    """O10+O11: hash-partition exchange + COUNT per key."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias(count_col))


def ranked(df: DataFrame, key: str, count_col: str = "cnt",
           rank_col: str = "rank", limit: int | None = None) -> DataFrame:
    """O12+O13(+O14): order by count desc (key asc tiebreak) and assign
    row_number ranks; optional top-k."""
    w = Window.orderBy(F.desc(count_col), F.asc(key))
    out = df.withColumn(rank_col, F.row_number().over(w).cast("int"))
    if limit is not None:
        out = out.orderBy(F.desc(count_col), F.asc(key)).limit(limit)
    return out


def count_rank_format(df: DataFrame, key: str, fmt: str = "%d: %s, %d",
                      limit: int | None = None) -> DataFrame:
    """Full O10-O15 pipeline with the reference's output line format
    ``"<rank>: <key>, <cnt>"`` (StockCount.java:63) /
    ``"<rank>: <word>"`` + count (WordCount.java:91)."""
    counted = count_by_key(df, key)
    r = ranked(counted, key, limit=limit)
    return r.select(
        F.format_string(fmt, F.col("rank"), F.col(key), F.col("cnt")).alias("line")
    )


def assign_global_ids(
    df: DataFrame,
    key_col: str,
    id_col: str = "global_id",
    bucket_bits: int = 8,
) -> DataFrame:
    """Dense 0-based global row ids WITHOUT a single-partition global
    sort — the id-assignment step of corpus construction, where
    ``row_number().over(Window.orderBy(...))`` would funnel 100 TB
    through one task.

    Order is unsigned-xxhash64-of-key order (a deterministic shuffle
    order, like ``sampling.deterministic_shuffle``), keys tie-broken by
    value; ``key_col`` must be unique per row for ids to be well-defined.

    Construction: bucket = the hash's top ``bucket_bits`` bits (so
    (bucket ASC, hash ASC) IS global unsigned-hash order and ids are
    INVARIANT to the bucket count — pinned in tests); per-bucket counts
    aggregate map-side down to 2^bucket_bits rows for a driver-held
    cumulative-offset table (broadcast back); final id = bucket offset +
    row_number within the bucket's window. Everything is a pure function
    of the DATA — no partitioner boundary sampling, no
    spark_partition_id — so re-execution of any stage reproduces the
    same ids. Cost: one tiny counts job + ONE corpus shuffle (the
    bucket-partitioned window); per-task sort is n / 2^bucket_bits rows
    (raise bucket_bits at larger scale).
    """
    if not 1 <= bucket_bits <= 30:
        raise ValueError("assign_global_ids: bucket_bits must be in [1, 30]")
    h = F.xxhash64(F.col(key_col))
    # top bits of the UNSIGNED hash: sign bit becomes the bucket's MSB,
    # and within a bucket every hash shares that sign, so signed ordering
    # within a bucket equals unsigned ordering — bucket-count-invariant.
    bucket = F.shiftrightunsigned(h, 64 - bucket_bits).cast("int")
    with_b = df.withColumn("_bucket", bucket)
    counts = {
        r._bucket: r.n
        for r in with_b.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # ≤ 2^bucket_bits rows — broadcast-side sized
    }
    spark = df.sparkSession
    running = 0
    rows = []
    for b in sorted(counts):
        rows.append((b, running))
        running += counts[b]
    offsets = spark.createDataFrame(rows, "_bucket int, _offset long")
    w = Window.partitionBy("_bucket").orderBy(h.asc(), F.col(key_col).asc())
    return (
        with_b.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            id_col,
            (F.col("_offset") + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_bucket", "_offset")
    )

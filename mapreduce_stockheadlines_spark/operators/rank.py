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

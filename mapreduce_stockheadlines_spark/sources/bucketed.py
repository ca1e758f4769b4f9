"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

At 100 TB the same fact⋈fact join key (e.g. orderkey) is joined daily;
bucketing both tables on that key at write time moves the shuffle from
every query to the single write: a join of two tables bucketed into the
same bucket count on the join key needs NO Exchange — each task reads
matching buckets from both sides (verified by tests/test_bucketed.py on
the physical plan).

Uses the session catalog's ``bucketBy().sortBy().saveAsTable`` (bucketed
layout is a table-catalog property, not a bare-path property — Spark
cannot bucket ``.parquet(path)`` writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table. Sorting
    within buckets additionally removes the Sort below a sort-merge join."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

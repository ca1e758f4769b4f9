"""Sinks (SURVEY.md §2.1 O16).

The reference writes a single text part via TextOutputFormat from its single
reducer (/root/reference/src/StockCount.java:64,81). Engine default is
partitioned parquet; single-file text output exists only for golden parity
(explicit ``coalesce(1)`` — never the default at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_text_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Golden-parity sink: one text file, one column. ``coalesce(1)`` is a
    deliberate scale anti-pattern confined to parity jobs."""
    df.coalesce(1).write.mode(mode).text(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line — splittable at scale)."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    """ORC sink with the same partition layout semantics as parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: str,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Cluster-by-column parquet layout: range-repartition on the column,
    sort within each partition, write one file per partition.

    The point is DATA SKIPPING at read time: each output file covers a
    narrow, (near-)disjoint range of ``cluster_by``, so a pushed-down
    range/equality filter prunes whole files from the parquet footer
    min/max statistics before any IO — the cheap single-column cousin of
    Z-ordering, and the difference between scanning 100 TB and scanning
    one file for a selective predicate. (Range boundaries come from a
    sample sort; boundary values may straddle two files.)"""
    out = df.repartitionByRange(
        *( [num_files] if num_files is not None else [] ),
        cluster_by,
    ).sortWithinPartitions(cluster_by)
    out.write.mode(mode).parquet(path)

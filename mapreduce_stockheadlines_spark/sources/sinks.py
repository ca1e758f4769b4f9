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

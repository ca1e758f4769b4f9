"""Skew mitigation (SURVEY.md §7.4 hard part #4: key frequencies in the
reference data span 1,174 → 1 across 5,903 keys — real workloads are worse).

First line of defense is AQE skew-join splitting (on by default in
session.py). These operators are the explicit fallbacks for when a skewed
shuffle must be restructured in the plan itself:

- ``salted_join``: N-way salt on the skewed (large) side, replicate the
  build side once per salt value — a hot key's rows spread over N tasks
  instead of one straggler.
- ``two_phase_count``: aggregation under a salt, then re-aggregation —
  only needed for aggregates Spark can't partially compute (e.g.
  collect-style); for sums/counts Spark's partial aggregation already
  handles skew, which the docstring of q02 relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys would straggle one task.

    The skewed side gets a deterministic salt in [0, n_salt) derived from
    the whole row (xxhash64 of all columns — no random(), so the plan is
    re-executable and speculative tasks agree); ``other`` is replicated
    n_salt times via an exploded literal range. Join key becomes
    (key, salt): each hot key now hashes to n_salt distinct partitions.
    Cost: other side shuffles n_salt copies — use for large⋈medium skew;
    for large⋈small just broadcast instead.
    """
    salted = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salt)).cast(
            "int"
        ),
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return salted.join(replicated, [key, "__salt"], how).drop("__salt")


def two_phase_count(df: DataFrame, key: str, n_salt: int = 8) -> DataFrame:
    """COUNT per key in two aggregation phases under a salt. Result is
    identical to ``groupBy(key).count()``; the intermediate keyspace is
    (key, salt) so no single reducer owns a hot key's full row set even
    when partial aggregation is unavailable.

    The salt mixes spark_partition_id (spreads identical rows that sit in
    different input partitions) with the row content (spreads a partition's
    rows over salts). Both inputs are stable under task retry — a retried
    partition recomputes the same rows with the same partition id — unlike
    monotonically_increasing_id, whose values depend on launch order and
    can double-count or drop rows when a partial stage recomputes."""
    salted = df.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), *[F.col(c) for c in df.columns]),
            F.lit(n_salt),
        ).cast("int"),
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("long").alias("count"))

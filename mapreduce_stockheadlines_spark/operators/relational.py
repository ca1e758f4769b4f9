"""Relational operator surface (SURVEY.md §2.2 — categories the reference
lacks entirely: general joins, rich aggregation, windows, set ops).

Thin, typed wrappers over the DataFrame API. Deliberately thin: the point
is to *declare* the plan and let Catalyst/AQE pick physical strategies
(broadcast vs sort-merge, skew splitting, partial aggregation). The
wrappers add the engine's conventions: explicit broadcast for dims under a
size hint, deterministic ordering helpers, alias discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi/theta join; ``broadcast_right=True`` pins BroadcastHashJoin for
    known-small dims (otherwise Catalyst decides via AQE stats)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_anti")


def aggregate(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """groupBy + aliased aggregates (alias discipline: every computed column
    is named, so results are oracle-comparable)."""
    exprs = [expr.alias(name) for name, expr in aggs.items()]
    return df.groupBy(*keys).agg(*exprs)


def topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """orderBy + limit → TakeOrderedAndProject (per-partition heaps, no
    global sort) — the distributed top-k the reference lacked."""
    return df.orderBy(*order).limit(k)


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    """Multiset EXCEPT ALL (left multiplicities minus right's)."""
    return a.exceptAll(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT (DISTINCT): distinct rows of ``a`` not present in ``b``.

    Correct even when ``a`` has duplicate rows — ``exceptAll(b).distinct()``
    is NOT: a row appearing 3x left and 1x right survives the multiset
    subtraction and the trailing distinct, where SQL EXCEPT drops it."""
    return a.subtract(b)


def having(df_grouped: DataFrame, predicate: Column) -> DataFrame:
    """Post-aggregation filter (HAVING) — a Filter above the final
    HashAggregate."""
    return df_grouped.filter(predicate)

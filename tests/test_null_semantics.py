"""Null semantics (SURVEY.md §2.2 — 'full Spark SQL type system'): the
driver tables are null-free, so pin the engine's inherited NULL behavior
explicitly on literal frames. These are the ANSI behaviors a user of any
SQL engine expects; a regression here (e.g. from a future custom operator
rewrite) must fail loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id int, k string"
    )
    right = spark.createDataFrame([("a", 10), (None, 20)], "k string, v int")
    return left, right


def test_null_join_keys_never_match(spark):
    left, right = _frames(spark)
    out = left.join(right, "k").collect()
    # only the 'a' row joins; NULL = NULL is not true in join predicates
    assert [(r.id, r.v) for r in out] == [(1, 10)]


def test_null_keys_group_together(spark):
    left, _ = _frames(spark)
    counts = {r.k: r["count"] for r in left.groupBy("k").count().collect()}
    assert counts[None] == 2 and counts["a"] == 1 and counts["b"] == 1


def test_count_col_skips_nulls_count_star_does_not(spark):
    left, _ = _frames(spark)
    row = left.agg(
        F.count(F.lit(1)).alias("star"), F.count("k").alias("col")
    ).first()
    assert (row.star, row.col) == (4, 2)


def test_agg_functions_ignore_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id int, v double"
    )
    row = df.agg(
        F.sum("v").alias("s"), F.avg("v").alias("a"), F.min("v").alias("m")
    ).first()
    assert (row.s, row.a, row.m) == (40.0, 20.0, 10.0)


def test_null_sort_order_and_null_safe_equal(spark):
    left, _ = _frames(spark)
    asc = [r.k for r in left.orderBy(F.asc("k"), "id").collect()]
    assert asc[:2] == [None, None]  # Spark default: NULLS FIRST on asc
    desc = [r.k for r in left.orderBy(F.desc("k"), "id").collect()]
    assert desc[-2:] == [None, None]
    # null-safe equality (<=>) DOES match NULL to NULL
    l, r = _frames(spark)
    out = l.join(r, l["k"].eqNullSafe(r["k"])).count()
    assert out == 3  # 'a' match + two NULL left rows x one NULL right row


def test_anti_join_keeps_null_keyed_rows(spark):
    left, right = _frames(spark)
    kept = {r.id for r in left.join(right, "k", "left_anti").collect()}
    # NULL keys never match → they survive the anti join; 'b' unmatched too
    assert kept == {2, 3, 4}

"""Tests for skew salting and bucketed co-located joins — correctness
(results identical to the plain operators) plus the plan property each
exists for (skew spread over salt partitions; no Exchange on a
bucketed⋈bucketed join)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from mapreduce_stockheadlines_spark.operators.skew import (
    salted_join,
    two_phase_count,
)
from mapreduce_stockheadlines_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _skewed_frames(spark):
    # one hot key ('hot' x 500) + a long tail
    rows = [(f"k{i}", i) for i in range(50)] + [("hot", i) for i in range(500)]
    left = spark.createDataFrame(rows, "key string, v int")
    right = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k7", 3.0)], "key string, w double"
    )
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "key").select("key", "v", "w")
    salted = salted_join(left, right, "key", n_salt=4).select("key", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer_preserves_unmatched(spark):
    left, right = _skewed_frames(spark)
    out = salted_join(left, right, "key", n_salt=4, how="left")
    assert out.count() == left.count()
    # matched rows: 500 x 'hot' + 1 x 'k1' + 1 x 'k7' = 502
    assert out.filter(F.col("w").isNull()).count() == left.count() - 502


def test_two_phase_count_matches_groupby_count(spark):
    left, _ = _skewed_frames(spark)
    plain = {r.key: r["count"] for r in left.groupBy("key").count().collect()}
    two = {r.key: r["count"] for r in two_phase_count(left, "key", 4).collect()}
    assert plain == two


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """The point of bucketing: both sides bucketed on the join key with the
    same bucket count → sort-merge join without any shuffle Exchange."""
    o = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    l = spark.range(0, 4000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("b")
    )
    write_bucketed(o, "t_orders_b", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(l, "t_lineitem_b", ["k"], num_buckets=8, sort_cols=["k"])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = read_table(spark, "t_orders_b").join(
            read_table(spark, "t_lineitem_b"), "k"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout IS the shuffle
        assert joined.count() == 4000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")

"""Mergeable HLL sketch artifacts (operators/sketches.py): the
union-of-sketches == sketch-of-union algebra that makes incremental
distinct-counting exact over the sketch, plus the tolerance contract
against exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_stockheadlines_spark.operators.sketches import (
    distinct_sketches,
    merge_sketches,
    upsert_sketches,
)
from mapreduce_stockheadlines_spark.plans.catalog import table


def test_sketch_estimates_within_tolerance(spark, sf_dir):
    """Per-group estimates land within HLL's error bound of the exact
    distinct counts (lgK=12 → use a generous 5% gate)."""
    ev = table(spark, sf_dir, "events")
    sk = merge_sketches(
        distinct_sketches(ev, "user_id", ["event_type"]), ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact")
    )
    rows = sk.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        assert abs(r.distinct_estimate - r.exact) <= max(0.05 * r.exact, 2), (
            r.event_type, r.distinct_estimate, r.exact,
        )


def test_incremental_merge_equals_batch(spark, sf_dir):
    """The artifact property: building per-period sketches and folding
    them with upsert_sketches answers EXACTLY like one batch sketch
    over all data — merge loses nothing, and history is never re-read."""
    ev = table(spark, sf_dir, "events").withColumn(
        "period", (F.col("user_id") % 3).alias("period")
    )
    batch = merge_sketches(
        distinct_sketches(ev, "user_id", ["event_type"]), ["event_type"]
    )
    artifact = None
    for p in (0, 1, 2):
        day = distinct_sketches(
            ev.filter(F.col("period") == p), "user_id", ["event_type"]
        )
        artifact = upsert_sketches(artifact, day, ["event_type"])
    inc = merge_sketches(artifact, ["event_type"])
    got = {r.event_type: (r.distinct_estimate, r.n_rows) for r in inc.collect()}
    want = {r.event_type: (r.distinct_estimate, r.n_rows) for r in batch.collect()}
    assert got == want


def test_upsert_appends_new_groups_and_merges_existing(spark):
    """Full-outer fold semantics: overlapping group merges, new group
    appends, absent group survives untouched."""
    a = spark.createDataFrame(
        [("x", i) for i in range(50)] + [("y", i) for i in range(20)],
        "g string, v int",
    )
    b = spark.createDataFrame(
        [("x", i) for i in range(25, 75)] + [("z", i) for i in range(10)],
        "g string, v int",
    )
    art = upsert_sketches(
        distinct_sketches(a, "v", ["g"]),
        distinct_sketches(b, "v", ["g"]),
        ["g"],
    )
    got = {r.g: (r.distinct_estimate, r.n_rows) for r in merge_sketches(art, ["g"]).collect()}
    assert set(got) == {"x", "y", "z"}
    assert got["x"][1] == 100 and abs(got["x"][0] - 75) <= 4  # 50 ∪ [25,75)
    assert got["y"] == (20, 20) and got["z"] == (10, 10)


def test_sketch_artifact_is_small_and_persistable(spark, tmp_path, sf_dir):
    """The artifact round-trips through parquet and is KB-sized — the
    property that makes merge-time cost independent of history size."""
    ev = table(spark, sf_dir, "events")
    sk = distinct_sketches(ev, "user_id", ["event_type"])
    p = str(tmp_path / "artifact")
    sk.write.parquet(p)
    back = spark.read.parquet(p)
    est = merge_sketches(back, ["event_type"])
    assert est.count() == sk.count()
    max_len = sk.select(F.max(F.length("sketch"))).collect()[0][0]
    assert max_len < 16_384  # a few KB per sketch, never value-sized


def test_sketch_estimates_partitioning_invariant(spark, sf_dir):
    """HLL union is register-wise max — merge order and partitioning
    must never change an estimate (the property that makes a
    distributed artifact build deterministic)."""
    ev = table(spark, sf_dir, "events")
    a = merge_sketches(
        distinct_sketches(ev, "user_id", ["event_type"]), ["event_type"]
    )
    b = merge_sketches(
        distinct_sketches(ev.repartition(17), "user_id", ["event_type"]),
        ["event_type"],
    )
    got_a = {r.event_type: r.distinct_estimate for r in a.collect()}
    got_b = {r.event_type: r.distinct_estimate for r in b.collect()}
    assert got_a == got_b


def test_sketch_ingest_sink_folds_batches_idempotently(spark, tmp_path):
    """Streaming artifact maintenance: batches fold incrementally into
    a versioned sketch table, a replayed batch is a no-op, the final
    estimates equal a from-scratch batch build, and the version history
    time-travels."""
    from mapreduce_stockheadlines_spark.sources.versioned import read_table
    from mapreduce_stockheadlines_spark.streaming.ingest import (
        sketch_ingest_sink,
    )

    art = str(tmp_path / "artifact")
    sink = sketch_ingest_sink(["g"], "v", art)
    b0 = spark.createDataFrame(
        [("x", i) for i in range(40)] + [("y", i) for i in range(10)],
        "g string, v int",
    )
    b1 = spark.createDataFrame(
        [("x", i) for i in range(20, 60)] + [("z", i) for i in range(5)],
        "g string, v int",
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # at-least-once replay: must not fold twice

    got = {
        r.g: (r.distinct_estimate, r.n_rows)
        for r in merge_sketches(
            read_table(spark, art).select("g", "sketch", "n_rows"), ["g"]
        ).collect()
    }
    want = {
        r.g: (r.distinct_estimate, r.n_rows)
        for r in merge_sketches(
            distinct_sketches(b0.unionAll(b1), "v", ["g"]), ["g"]
        ).collect()
    }
    assert got == want  # incremental == batch, replay included
    assert got["x"][1] == 80 and abs(got["x"][0] - 60) <= 3
    # version history: v1 holds only batch 0's state
    v1 = {
        r.g: r.n_rows
        for r in merge_sketches(
            read_table(spark, art, version=1).select("g", "sketch", "n_rows"),
            ["g"],
        ).collect()
    }
    assert v1 == {"x": 40, "y": 10}

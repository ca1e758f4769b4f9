"""Deterministic sampling operators: reproducibility, disjointness,
fraction accuracy, and cross-engine portability of the hash primitive."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from mapreduce_stockheadlines_spark.operators.sampling import (
    deterministic_sample,
    hash_fraction,
    train_test_split,
    weighted_source_mix,
)
from mapreduce_stockheadlines_spark.plans.catalog import table


def test_sample_is_deterministic_and_partition_invariant(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.3).collect())
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), "doc_id", 0.3).collect()
    )
    assert a == b and len(a) > 0
    # fraction lands near target (md5 uniformity; 500 docs → loose bound)
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n


def test_sample_is_monotone_in_fraction(spark, sf_dir):
    """fraction f1 < f2 → sample(f1) ⊆ sample(f2): growing a sample never
    swaps rows out (the property per-task RNG sampling lacks)."""
    docs = table(spark, sf_dir, "documents")
    small = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    big = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5).collect()}
    assert small <= big


def test_train_test_split_partitions_exactly(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    train, test = train_test_split(docs, "doc_id", test_fraction=0.2)
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == docs.count()
    assert len(te) > 0


def test_split_membership_stable_under_growth(spark, sf_dir):
    """A row's side must not change when the corpus grows (no leakage on
    refresh): split of a subset agrees with split of the full set."""
    docs = table(spark, sf_dir, "documents")
    subset = docs.filter(F.col("doc_id") < 100)
    _, test_full = train_test_split(docs, "doc_id", 0.2)
    _, test_sub = train_test_split(subset, "doc_id", 0.2)
    full_ids = {r.doc_id for r in test_full.filter(F.col("doc_id") < 100).collect()}
    sub_ids = {r.doc_id for r in test_sub.collect()}
    assert full_ids == sub_ids


def test_weighted_source_mix(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    sources = [r.source for r in docs.select("source").distinct().collect()]
    keep_all, drop_all = sources[0], sources[1]
    out = weighted_source_mix(
        docs, "source", "doc_id", {keep_all: 1.0, drop_all: 0.0}
    )
    got = {r.source for r in out.select("source").distinct().collect()}
    assert keep_all in got and drop_all not in got
    # unlisted sources dropped entirely
    assert got <= {keep_all}
    n_src = docs.filter(F.col("source") == keep_all).count()
    assert out.count() == n_src


def test_hash_fraction_portable_to_duckdb(spark, sf_dir):
    """The sampler primitive is plain md5 hex — DuckDB computes the exact
    same membership, so a split made elsewhere agrees row-for-row."""
    docs = table(spark, sf_dir, "documents")
    spark_ids = sorted(
        r.doc_id for r in deterministic_sample(docs, "doc_id", 0.25, salt="s").collect()
    )
    con = duckdb.connect()
    duck_ids = [
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE CAST(('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) / 4294967296.0 < 0.25
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert spark_ids == duck_ids and len(spark_ids) > 0


def test_deterministic_shuffle_is_stable_permutation(spark, sf_dir):
    from mapreduce_stockheadlines_spark.operators.sampling import (
        deterministic_shuffle,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    a = [r.doc_id for r in deterministic_shuffle(docs, "doc_id").collect()]
    b = [
        r.doc_id
        for r in deterministic_shuffle(docs.repartition(7), "doc_id").collect()
    ]
    assert a == b  # pure function of the data, not of partitioning
    assert sorted(a) == sorted(r.doc_id for r in docs.collect())  # permutation
    assert a != sorted(a)  # actually shuffled
    c = [
        r.doc_id
        for r in deterministic_shuffle(docs, "doc_id", salt="epoch2").collect()
    ]
    assert c != a and sorted(c) == sorted(a)  # new salt, new permutation


def test_quantile_threshold_filter(spark, sf_dir):
    from mapreduce_stockheadlines_spark.operators.sampling import (
        quantile_threshold_filter,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("double").alias("score")
    )
    kept = quantile_threshold_filter(docs, "score", keep_top=0.25)
    n, k = docs.count(), kept.count()
    assert 0.2 * n <= k <= 0.3 * n  # approx quantile: near the target rate
    # everything kept scores >= everything dropped
    min_kept = kept.agg(F.min("score")).first()[0]
    dropped = docs.join(kept.select("doc_id"), "doc_id", "left_anti")
    max_dropped = dropped.agg(F.max("score")).first()[0]
    assert min_kept >= max_dropped
    import pytest

    with pytest.raises(ValueError, match="keep_top"):
        quantile_threshold_filter(docs, "score", keep_top=0.0)

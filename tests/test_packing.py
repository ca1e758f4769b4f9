"""Sequence packing: exactly-once assignment, budget respected, oversized
flagged, determinism under input partitioning, packing efficiency."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_stockheadlines_spark.operators.packing import pack_sequences
from mapreduce_stockheadlines_spark.operators.textstats import (
    whitespace_token_count,
)
from mapreduce_stockheadlines_spark.plans.catalog import table


def _docs_with_counts(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", whitespace_token_count("text").alias("n_tokens")
    )


def test_packing_invariants(spark, sf_dir):
    counted = _docs_with_counts(spark, sf_dir)
    packed = pack_sequences(counted, "doc_id", "n_tokens", budget=256).toPandas()
    # every doc exactly once
    assert sorted(packed.id) == sorted(
        r.doc_id for r in counted.collect()
    )
    # budget respected for every non-truncate pack
    sums = packed[~packed["truncate"]].groupby("pack_id").n_tokens.sum()
    assert (sums <= 256).all()
    # truncate packs are singletons holding only oversized docs
    tr = packed[packed["truncate"]]
    assert (tr["n_tokens"] > 256).all()
    assert (~packed[~packed["truncate"]].pack_id.isin(tr["pack_id"])).all()
    assert tr["pack_id"].is_unique
    # oversized docs exist in this corpus at budget 256 or the test is vacuous
    assert len(tr) + len(sums) == packed.pack_id.nunique()


def test_packing_is_partitioning_invariant(spark, sf_dir):
    counted = _docs_with_counts(spark, sf_dir)
    a = pack_sequences(counted, "doc_id", "n_tokens", 256).toPandas()
    b = pack_sequences(
        counted.repartition(7), "doc_id", "n_tokens", 256
    ).toPandas()
    key = lambda df: sorted(zip(df.id, df.pack_id, df["truncate"]))
    assert key(a) == key(b)


def test_packing_efficiency(spark, sf_dir):
    """FFD within partitions must land reasonably close to the lower bound
    ceil(total/budget) — a regression here means packing degenerated to
    one-doc-per-pack."""
    import math

    counted = _docs_with_counts(spark, sf_dir)
    packed = pack_sequences(counted, "doc_id", "n_tokens", 512).toPandas()
    normal = packed[~packed["truncate"]]
    lower = math.ceil(normal.n_tokens.sum() / 512)
    n_packs = normal.pack_id.nunique()
    # 64 partitions each waste at most a partial bin; allow 2x + slack
    assert n_packs <= 2 * lower + 64


def test_packing_rejects_bad_budget(spark, sf_dir):
    counted = _docs_with_counts(spark, sf_dir)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(counted, "doc_id", "n_tokens", 0)

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_stockheadlines_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def assert_column_nondegenerate(df, col: str, context: str = "") -> None:
    """Promotion guard (the round-7 x17 ``same_bucket_t2`` lesson): a
    newly-registry-pinned flag/tag column must take at least TWO distinct
    values at the SF it is checked at — a constant column hash-matches
    trivially and pins nothing. Use in the promotion commit's test, at
    the largest SF where the value actually varies (and document that SF
    if it is not the default test SF)."""
    vals = {r[0] for r in df.select(col).distinct().limit(3).collect()}
    assert len(vals) >= 2, (
        f"promoted column {col!r} is degenerate ({vals}) {context}: "
        "it would hash-match even if the operator were broken"
    )

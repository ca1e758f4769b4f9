"""DuckDB-oracle parity tests (SURVEY.md §5.2.2) — every declared query
with an oracle is executed on Spark and DuckDB at sf0.001 and compared the
way the driver's t2 gate does (rowcount + schema + canonicalized values).

The heavier sf0.01 sweep lives in scripts/check_oracle.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_stockheadlines_spark.oracle_compare import (
    arrow_type_kinds,
    compare,
    spark_type_kinds,
)
from mapreduce_stockheadlines_spark.plans.catalog import TABLES
from mapreduce_stockheadlines_spark.plans.registry import ALL_QUERIES

ORACLED = sorted(n for n, s in ALL_QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in ALL_QUERIES.items() if s.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, con, name):
    spec = ALL_QUERIES[name]
    spark_df = spec.builder(spark, sf_dir)
    skinds = spark_type_kinds(spark_df.schema)
    sdf = spark_df.toPandas()
    # .arrow() (not fetchdf) so DATE vs TIMESTAMP survives extraction
    tbl = con.sql(spec.oracle).arrow()
    problems = compare(sdf, tbl.to_pandas(), skinds, arrow_type_kinds(tbl.schema))
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_an_oracle():
    """Since round 4 the registry carries no rows-only entries: SimHash
    hash-checks via the portable md5 bit mode and approx aggregates via
    the tolerance contract. Regression guard — a new oracle-less query
    must be a deliberate, documented decision, not an accident."""
    assert ROWS_ONLY == [], f"queries without oracles: {ROWS_ONLY}"

"""Unified query registry: the driver-facing ``queries()`` /
``oracle_sql()`` dicts (driver contract in /root/repo/__spark_entry__.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_conf
from .advanced import ADV_QUERIES
from .core import CORE_QUERIES, QuerySpec
from .extensions import EXT_QUERIES

ALL_QUERIES: dict[str, QuerySpec] = {
    **CORE_QUERIES,
    **ADV_QUERIES,
    **EXT_QUERIES,
}


def _wrap(spec: QuerySpec) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        apply_runtime_conf(spark)
        return spec.builder(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(spec) for name, spec in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in ALL_QUERIES.items()
        if spec.oracle is not None
    }

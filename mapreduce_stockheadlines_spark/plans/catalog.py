"""Table catalog over the driver-provided parquet test data (TESTDATA.md).

The reference's only 'catalog' is a positional CSV path argument
(/root/reference/src/StockCount.java:80). Here sources are columnar parquet
— Catalyst gets predicate pushdown, column pruning and partition pruning
for free on every scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; parquet scan → FileSourceScanExec with
    pushdown/pruning.

    ``events.parquet`` has shipped with two physical ``ts`` encodings
    across testdata generations: TIMESTAMP(NANOS) (which Spark's parquet
    reader rejects by default — read nanos as long via the legacy conf and
    convert; exact, the source values are microsecond-resolution) and
    TIMESTAMP(MICROS) without timezone (reads as TIMESTAMP_NTZ — cast to
    the session-timezone TimestampType, identity wall-clock under the
    UTC session this engine pins). Adapt to whichever the file has.
    """
    if name == "events":
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer div: double division would lose precision above 2^53 ns
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def parallel_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan-parallelized table load for CPU-heavy per-row pipelines (regex
    tokenization, scoring): if the parquet scan yields fewer splits than
    the cluster has slots (single-file/single-row-group inputs — true of
    all local test files), round-robin repartition to default parallelism
    so the expression work fans out. The shuffle moves only the scanned
    bytes (small by construction when the split count is low); on real
    multi-file/multi-row-group data the scan already splits and this is a
    no-op returning the plain scan.
    """
    df = table(spark, sf_dir, name)
    slots = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= slots:
        return df.repartition(slots)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() entry points."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)

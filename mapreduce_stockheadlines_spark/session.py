"""SparkSession factory.

Replaces the reference's imperative Hadoop job configuration
(/root/reference/src/StockCount.java:70-83, WordCount.java:97-110) with a
declarative session: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow on (vectorized Python interchange), UTC session timezone
(deterministic timestamp semantics vs. the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "mrsh-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # COUNT/MIN/MAX answered from parquet footer statistics
        .config("spark.sql.parquet.aggregatePushDown", "true")
        # TIMESTAMP(NANOS) parquet (one events.parquet generation) reads
        # as long; plans/catalog.table converts exactly. Session-level so
        # no read path ever mutates shared conf mid-query.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Runtime bloom-filter join pruning ON by default (pinned, not
        # inherited from the Spark version's default): with the stock
        # production thresholds (creation side <= 10MB, probe scan >=
        # 10GB) it only fires where it pays — the 100 TB fact ⋈
        # filtered-dim case — and never on test-scale data, so callers
        # need not remember enable_runtime_filtering (which remains the
        # threshold-tuning hook; plan shape pinned in tests/test_plans.py).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def enable_runtime_filtering(
    spark: SparkSession,
    creation_side_threshold: str = "10MB",
    application_side_threshold: str = "10GB",
) -> SparkSession:
    """Turn on Catalyst's runtime bloom-filter join pruning and set its
    size gates.

    For a shuffle join where one side carries a selective filter, the
    optimizer injects ``bloom_filter_agg`` over the filtered side's join
    keys and a ``might_contain`` probe into the OTHER side's scan — rows
    that cannot match are dropped BEFORE the big side is shuffled. On a
    100 TB fact table joined to a filtered dimension too large to
    broadcast, this is the difference between shuffling the whole fact
    table and shuffling the ~matching fraction.

    Spark's defaults only fire when the probe side's scan exceeds
    ``application_side_threshold`` (10 GB) — correct at scale, never on
    test data — so tests pass tiny thresholds to pin the plan shape
    (tests/test_plans.py) while production keeps the defaults.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_threshold,
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        application_side_threshold,
    )
    return spark


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable confs on an externally-provided session.

    The correctness driver hands us its own SparkSession; timezone and AQE
    are runtime confs, so pin the ones correctness depends on.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet TIMESTAMP(NANOS) handling (see get_spark): pinned here
    # once at session adoption, not inside plans/catalog.table — a conf
    # flipped as a side effect of a table read could change how unrelated
    # code reads nano-timestamp parquet (VERDICT r3).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark

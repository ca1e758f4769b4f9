"""Session sizing math (pure functions — no SparkSession needed)."""

from __future__ import annotations

import pytest

from mapreduce_stockheadlines_spark.session import conf_for_scale


def test_conf_for_scale_100tb_reference_cluster():
    conf = conf_for_scale(100 << 40, executors=1000, cores_per_executor=4,
                          executor_mem_gb=16)
    assert conf["spark.sql.files.maxPartitionBytes"] == str(128 << 20)
    # 100 TB / 128 MB = 819200 — dominates the 8000-slot floor
    assert conf["spark.sql.shuffle.partitions"] == "819200"
    assert (
        conf["spark.sql.adaptive.coalescePartitions.initialPartitionNum"]
        == "819200"
    )


def test_conf_for_scale_small_input_floors_at_slots():
    conf = conf_for_scale(1 << 30, executors=10, cores_per_executor=4,
                          executor_mem_gb=16)
    # 1 GB / 128 MB = 8 partitions — the 2x-slots floor (80) wins
    assert conf["spark.sql.shuffle.partitions"] == "80"


def test_conf_for_scale_shuffle_fraction_scales_count():
    full = conf_for_scale(10 << 40, executors=100)
    tenth = conf_for_scale(10 << 40, executors=100, shuffle_fraction=0.1)
    assert int(tenth["spark.sql.shuffle.partitions"]) < int(
        full["spark.sql.shuffle.partitions"]
    )


def test_conf_for_scale_rejects_spill_prone_shape():
    with pytest.raises(ValueError, match="headroom"):
        conf_for_scale(1 << 40, executors=10, cores_per_executor=16,
                       executor_mem_gb=2)
    with pytest.raises(ValueError, match="positive"):
        conf_for_scale(0, executors=10)

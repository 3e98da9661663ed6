"""`spread()`'s small-scan test must not build RDD lineage at plan
time: it estimates the file-scan task count with Spark's own
split-sizing formula (`io._scan_task_estimate`). These tests pin the
estimate to the exact (RDD-derived) partition count closely enough
that the spread/no-spread DECISION is identical for every benchmark
table at every scale factor present.
"""

from __future__ import annotations

import pytest

from cae_polars_tools_spark.io import TABLES, _scan_task_estimate, read_table

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_estimate_matches_actual_decision(spark, sf_dir):
    n = spark.sparkContext.defaultParallelism
    for name in TABLES:
        df = read_table(spark, sf_dir, name)
        est = _scan_task_estimate(df)
        assert est is not None and est >= 1
        actual = df.rdd.getNumPartitions()
        assert (est >= n) == (actual >= n), (
            f"{sf_dir}/{name}: estimate {est} and actual {actual} "
            f"disagree on the spread decision at parallelism {n}"
        )
        # the packing simulation mirrors FilePartition.getFilePartitions
        # exactly — any drift means Spark changed its packing rules
        assert est == actual


def test_non_file_plan_falls_back_to_none(spark):
    rows = spark.range(10).selectExpr("id", "id * 2 AS v")
    assert _scan_task_estimate(rows) is None


def test_multi_file_estimate_is_upper_bound(spark, tmp_path):
    """Splits never span files but small splits DO pack together, so
    neither a padded-total ceiling (under-counts: would trigger a
    needless repartition shuffle) nor a per-file split sum
    (over-counts: would skip a parallelism-restoring spread) gets a
    many-small-files layout right — only the packing simulation
    does."""
    src = str(tmp_path / "many")
    spark.range(100_000).selectExpr(
        "id", "id * 2 AS v"
    ).repartition(12).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)
    est = _scan_task_estimate(df)
    actual = df.rdd.getNumPartitions()
    assert est == actual
    n = spark.sparkContext.defaultParallelism
    assert (est >= n) == (actual >= n)

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


def test_spread_target_bytes_override(spark, tmp_path):
    """Callers with heavier-than-text kernels pass a smaller
    ``target_bytes``; the repartition width must follow
    ceil(input_bytes / target), capped at cores, and the default path
    must stay on ``SPREAD_TARGET_BYTES``."""
    from cae_polars_tools_spark.io import (
        SPREAD_TARGET_BYTES,
        _scan_file_sizes,
        spread,
    )

    src = str(tmp_path / "one")
    spark.range(20_000).selectExpr(
        "id", "repeat(uuid(), 4) AS payload"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)
    assert df.rdd.getNumPartitions() == 1
    size = sum(_scan_file_sizes(df))
    n = spark.sparkContext.defaultParallelism
    target = max(1, size // 7)  # → ceil gives 7 or 8 tasks
    want = min(n, -(-size // target))
    assert want > 1
    assert spread(df, target_bytes=target).rdd.getNumPartitions() == want
    # default path unchanged: sized by SPREAD_TARGET_BYTES
    k_default = min(n, max(1, -(-size // SPREAD_TARGET_BYTES)))
    out = spread(df)
    got = out.rdd.getNumPartitions()
    assert got == (1 if k_default <= 1 else k_default)


def test_spread_no_cap_fans_out_to_all_cores(spark, tmp_path):
    """``target_bytes=SPREAD_NO_CAP`` (0) disables the byte-matched
    task cap: JVM-expression consumers (text_stats/text_language_id)
    pay no Python-worker dispatch, so a single-split scan fans out to
    the session's full parallelism regardless of input size."""
    from cae_polars_tools_spark.io import SPREAD_NO_CAP, spread

    src = str(tmp_path / "tiny")
    spark.range(2_000).selectExpr(
        "id", "repeat(uuid(), 2) AS payload"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)
    assert df.rdd.getNumPartitions() == 1
    n = spark.sparkContext.defaultParallelism
    assert (
        spread(df, target_bytes=SPREAD_NO_CAP).rdd.getNumPartitions() == n
    )


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


@pytest.mark.parametrize(
    "layout",
    [
        # around the defaultParallelism (32) boundary: fewer, exactly,
        # and more files than cores, equal and skewed sizes — the
        # regimes where bytesPerCore vs maxPartitionBytes flips the
        # split size and packing order could change the count
        [2_000] * 30,
        [2_000] * 32,
        [2_000] * 40,
        [200_000] + [50] * 31,           # one giant + many tiny
        [100_000, 70_000, 40_000] + [20] * 35,
        sorted(range(10, 4000, 117), reverse=True),  # smooth skew
    ],
    ids=["under", "exact", "over", "giant+tiny", "mixed", "sweep"],
)
def test_estimate_matches_actual_on_skewed_layouts(spark, tmp_path, layout):
    """Empirical pin of the packing simulation against Spark's real
    createReadRDD across the parallelism boundary, with split sizes
    forced small enough (maxPartitionBytes conf) that multi-split
    files and bin-packing both occur. Any per-file vs global split
    ordering divergence from Spark's would surface here as a count
    mismatch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "skewed"
    src.mkdir()
    for i, n in enumerate(layout):
        pq.write_table(
            pa.table({"id": pa.array(range(n), type=pa.int64())}),
            str(src / f"part-{i:04d}.parquet"),
        )
    conf = spark.conf
    old = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
        )
    }
    conf.set("spark.sql.files.maxPartitionBytes", "16384")
    conf.set("spark.sql.files.openCostInBytes", "1024")
    try:
        df = spark.read.parquet(str(src))
        est = _scan_task_estimate(df)
        actual = df.rdd.getNumPartitions()
        assert est == actual, (layout[:5], est, actual)
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)

"""Parquet table helpers for the synthetic benchmark tables.

The driver supplies TPC-H-ish parquet tables (see /root/repo/TESTDATA.md):
``region nation customer supplier part orders lineitem events documents
embeddings`` under ``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Plain parquet scan — Catalyst handles
    column pruning and predicate pushdown from the downstream plan.

    ``events.parquet`` stores nanosecond timestamps, which Spark's
    vectorized parquet reader rejects (PARQUET_TYPE_ILLEGAL). We read
    nanos as int64 via the legacy conf and rebuild a microsecond
    timestamp with integer division — deterministic truncation, no
    double-precision round-trip (int64 ns exceeds 2^53).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")

    # session.get_spark sets these up front; only touch session state
    # for foreign sessions (e.g. the grading driver's). The tables
    # store timestamp[us] with isAdjustedToUTC=false — Spark 4 would
    # infer TIMESTAMP_NTZ, which breaks instant functions
    # (unix_micros) and diverges from the DuckDB oracle's
    # naive-as-UTC reading — so read them as UTC instants.
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name != "events":
        return spark.read.parquet(path)

    from pyspark.sql import functions as F

    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan up to the session's parallelism —
    but ONLY if the scan yields fewer partitions than cores.

    Why: parquet splitting is row-group-granular, so a small input (one
    file, one row group — exactly the shape of a dim-table or a
    small-SF test table) scans as ONE task no matter how many cores
    exist, and every downstream narrow op (tokenize, shingle, pandas
    UDF) runs single-threaded. For CPU-heavy per-row operators the
    repartition shuffle (bytes ≈ input size, which is small precisely
    when this fires) buys back full parallelism.

    At real scale this is a no-op by construction: a 100 TB table scans
    as ~10⁵ row-group splits ≥ parallelism, so no exchange is added to
    the plan. Decision rule (measured at sf0.1 on local[32]): spread
    when per-row compute dominates — shingling/tokenizing (4× faster),
    pandas-UDF scoring, blocked self-joins; do NOT spread cheap-per-row
    plans — a 600k-row groupBy got 3× slower (the extra exchange costs
    more than the single-task map side), and md5-fingerprint /
    persisted-LSH-bucket pipelines regressed ~2×.
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def read_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every synthetic table into a dict."""
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql use."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)

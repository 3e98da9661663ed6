#!/usr/bin/env python3
"""cae-polars-tools-spark example: reading Zarr climate data into Spark.

The Spark-first mirror of the reference's ``examples/basic_usage.py``
(reference examples/basic_usage.py:27,181,284,319,407 — basic read,
advanced analysis, dataset info, memory-efficient streaming, local
file), demonstrating the same flows on the Spark DataFrame API.

The reference's demos read a public S3 LOCA2 store
(``s3://cadcat/loca2/...`` with ``storage_options={"anon": True}``).
This script is self-contained instead: it generates a small local
demo store so it runs anywhere, and every ``scan_data`` call works
unchanged against remote URLs::

    scan_data(spark, "s3://bucket/store.zarr", "tasmax",
              storage_options={"anon": True})      # via fsspec/s3fs
    scan_data(spark, "https://host/store.zarr", "tasmax")
    # http(s):// needs no extra dependency (stdlib ranged GETs)

Run: ``python examples/basic_usage.py``
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cae_polars_tools_spark.session import get_spark  # noqa: E402
from cae_polars_tools_spark.sources.zarr_format import write_group  # noqa: E402
from cae_polars_tools_spark.sources.zarr_scan import (  # noqa: E402
    get_zarr_data_info,
    register_zarr_source,
    scan_data,
)
from cae_polars_tools_spark.sources.zarr_write import write_zarr  # noqa: E402


def make_demo_store(root: str) -> str:
    """A small monthly-temperature store shaped like the reference's
    LOCA2 data: tasmax[time, lat, lon] in Kelvin + 1-D coordinates."""
    t, la, lo = np.indices((24, 20, 30))
    seasonal = 10 * np.sin(2 * np.pi * (t % 12) / 12)
    tasmax = (285 + seasonal - 0.4 * la + 0.1 * lo).astype(np.float32)
    write_group(
        root,
        arrays={"tasmax": tasmax},
        dims={"tasmax": ("time", "lat", "lon")},
        coords={
            "time": np.arange(24, dtype=np.int32),
            "lat": (30 + 0.5 * np.arange(20)).astype(np.float32),
            "lon": (-120 + 0.25 * np.arange(30)).astype(np.float32),
        },
        chunks={"tasmax": (6, 10, 15)},
    )
    return root


def basic_example(spark, store: str) -> None:
    """Basic read with dimension selection (reference :27)."""
    print("=" * 60)
    print("Basic Example: Reading Temperature Data")
    print("=" * 60)
    df = scan_data(
        spark,
        store,
        "tasmax",
        select_dims={"time": slice(0, 12), "lat": slice(5, 15)},
    )
    print(f"Columns: {df.columns}")
    print(f"Rows: {df.count()}")
    df.select(
        F.min("value").alias("min_k"),
        F.max("value").alias("max_k"),
        F.avg("value").alias("mean_k"),
    ).show()
    # the same subset selected by coordinate VALUE (label slices,
    # inclusive both ends — the reference-docs surface): lat runs
    # 30..39.5 in 0.5° steps, so positions 5..14 are 32.5..37.0
    by_value = scan_data(
        spark,
        store,
        "tasmax",
        select_ranges={"time": slice(0, 11), "lat": slice(32.5, 37.0)},
    )
    assert by_value.count() == df.count()
    print(f"select_ranges selected the same {df.count()} rows by label")


def advanced_analysis_example(spark, store: str) -> None:
    """Monthly/seasonal statistics — the reference's Polars pipeline
    (reference :181) as the equivalent Spark plan; Catalyst fuses the
    filter, projection, and both aggregations into pruned scans."""
    print("=" * 60)
    print("Advanced Example: Climate Data Analysis")
    print("=" * 60)
    lf = scan_data(spark, store, "tasmax")
    monthly = (
        lf.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .withColumn("temp_celsius", F.col("value") - F.lit(273.15))
        .withColumn("month", (F.col("time") % 12 + 1).cast("int"))
        .groupBy("lat", "lon", "month")
        .agg(
            F.avg("temp_celsius").alias("monthly_avg_temp"),
            F.max("temp_celsius").alias("monthly_max_temp"),
            F.min("temp_celsius").alias("monthly_min_temp"),
            F.stddev("temp_celsius").alias("monthly_temp_std"),
            F.count(F.lit(1)).alias("data_points"),
        )
    )
    print("Monthly temperature statistics (first rows):")
    monthly.orderBy("lat", "lon", "month").show(5)

    seasonal = (
        monthly.withColumn(
            "season",
            F.when(F.col("month").isin(12, 1, 2), "Winter")
            .when(F.col("month").isin(3, 4, 5), "Spring")
            .when(F.col("month").isin(6, 7, 8), "Summer")
            .otherwise("Fall"),
        )
        .groupBy("season")
        .agg(
            F.avg("monthly_avg_temp").alias("seasonal_avg"),
            F.max("monthly_max_temp").alias("seasonal_max"),
            F.min("monthly_min_temp").alias("seasonal_min"),
        )
        .orderBy(F.desc("seasonal_avg"))
    )
    print("Seasonal summary:")
    seasonal.show()


def dataset_info_example(store: str) -> None:
    """Store metadata without any Spark job (reference :284)."""
    print("=" * 60)
    print("Dataset Information Example")
    print("=" * 60)
    info = get_zarr_data_info(store)
    print(f"Store path: {info['store_path']}")
    print(f"Available arrays: {list(info['arrays'])}")
    for name, a in info["arrays"].items():
        print(
            f"  {name}: shape={a['shape']} dtype={a['dtype']} "
            f"dims={a['dimensions']} chunks={a['chunks']}"
        )


def memory_efficient_example(spark, store: str) -> None:
    """Chunk-bounded distributed scan (reference :319): ``chunk_size``
    caps rows per Spark partition, so executor memory stays flat no
    matter how large the array is — the reference's "streaming"
    becomes ordinary partition parallelism here."""
    print("=" * 60)
    print("Memory-Efficient Scan Example")
    print("=" * 60)
    df = scan_data(spark, store, "tasmax", chunk_size=2000)
    print(f"Partitions: {df.rdd.getNumPartitions()} (≤2000 rows each)")
    df.groupBy((F.col("time") % 12 + 1).alias("month")).agg(
        F.avg("value").alias("avg_k")
    ).orderBy("month").show(12)


def datasource_and_sink_example(spark, store: str, out: str) -> None:
    """Beyond the reference: the ``spark.read.format("zarr")`` data
    source (WHERE clauses prune zarr chunks before any byte is
    fetched) and the distributed sink writing a store back."""
    print("=" * 60)
    print("Data Source API + Distributed Sink Example")
    print("=" * 60)
    register_zarr_source(spark)
    pruned = (
        spark.read.format("zarr")
        .option("array", "tasmax")
        .load(store)
        .filter("time >= 12 AND lat < 35.0")
    )
    print(f"Pruned scan rows: {pruned.count()}")

    summary = write_zarr(
        scan_data(spark, store, "tasmax"),
        out,
        chunks=(6, 10, 15),
    )
    print(
        f"Sink wrote {summary['chunks_written']} chunk objects, "
        f"{summary['bytes']} bytes, shape {summary['shape']}"
    )
    assert scan_data(spark, out, "value").count() == 24 * 20 * 30


def streaming_loop_example(spark, out: str, tmp: str) -> None:
    """Beyond the reference: the store-to-store ARRAY STREAMING loop —
    ``spark.readStream.format("zarr")`` treats the previous example's
    sink as a growing source (offset = its time length), a dimension
    APPEND extends it, and ``foreachBatch`` + the ingest sink land the
    transformed slabs in a second store with exactly-once semantics
    (the append high-watermark absorbs redeliveries)."""
    print("=" * 60)
    print("Streaming Loop Example (append -> readStream -> ingest)")
    print("=" * 60)
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.sources.zarr_write import (
        append_zarr,
        zarr_ingest_sink,
    )

    dst = os.path.join(tmp, "stream_dst.zarr")
    ckpt = os.path.join(tmp, "stream_ckpt")
    sink = zarr_ingest_sink(dst, append_dim="time", chunks=(6, 10, 15))

    def pump() -> None:
        q = (
            spark.readStream.format("zarr")
            .option("array", "value")
            .load(out)
            .withColumn("value", F.col("value") + 100.0)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pump()  # drains the 24 existing time steps
    base = scan_data(spark, out, "value")
    grown = base.filter("time >= 22").withColumn(
        "time", (F.col("time") + 2).cast("int")
    )
    summary = append_zarr(grown, out, append_dim="time")
    print(f"Appended {summary['appended']} time steps to the source")
    pump()  # only the new slab flows through

    n = scan_data(spark, dst, "value").count()
    print(f"Streamed store rows: {n}")
    assert n == (24 + 2) * 20 * 30


def main() -> None:
    spark = get_spark(app_name="cae-polars-tools-spark-examples")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        store = make_demo_store(os.path.join(tmp, "demo.zarr"))
        basic_example(spark, store)
        advanced_analysis_example(spark, store)
        dataset_info_example(store)
        memory_efficient_example(spark, store)
        datasource_and_sink_example(
            spark, store, os.path.join(tmp, "sink.zarr")
        )
        streaming_loop_example(
            spark, os.path.join(tmp, "sink.zarr"), tmp
        )
    print("All examples completed.")


if __name__ == "__main__":
    main()

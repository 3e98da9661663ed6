"""Distributed zarr v2 sink: long-format DataFrame → chunked store.

The inverse of ``scan_data`` — and a capability the reference does not
have at all (its CLI only reads zarr INTO parquet,
``/root/reference/src/cli.py:143-166``; writing back requires
zarr-python on one node). Spark-first design:

* **One shuffle, keyed by chunk.** Each row is mapped to its global
  grid position with per-dimension broadcast joins (the axes — the
  sorted distinct coordinate values — are driver-collected; they are
  bounded by the array's side lengths and are needed for the store
  metadata anyway, exactly like the reference's coordinate handling).
  The only wide exchange is the ``groupBy(chunk_id)`` that co-locates
  each chunk's cells.
* **Embarrassingly parallel chunk writes.** A zarr chunk is one
  immutable object with a deterministic key, so every ``applyInPandas``
  task writes its own chunks straight to the store — no commit
  protocol, no renames, and task retries/speculation are naturally
  idempotent (same bytes, same key). This is what makes the sink hold
  at 100 TB / 1000 executors: aggregate write bandwidth scales with
  the executor count, and the driver handles only axes + metadata.
* **Metadata from the driver.** ``.zgroup`` / ``.zarray`` / ``.zattrs``
  (xarray's ``_ARRAY_DIMENSIONS`` convention) plus coordinate arrays
  are written up front, and ``.zmetadata`` is consolidated from the
  metadata already in hand — zero listing round-trips, so it works on
  any ByteStore (local, fsspec/S3, memory://).

Missing grid cells get ``fill_value``; duplicate cells raise (a silent
last-writer-wins would hide upstream join bugs).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cae_polars_tools_spark.sources.zarr_format import (
    ByteStore,
    _encode_bytes,
)

_SPARK_TO_NP = {
    "boolean": "|b1",
    "tinyint": "|i1",
    "smallint": "<i2",
    "int": "<i4",
    "bigint": "<i8",
    "float": "<f4",
    "double": "<f8",
}


def _np_dtype_of(df: DataFrame, col: str) -> np.dtype:
    spark_type = dict(df.dtypes)[col]
    np_str = _SPARK_TO_NP.get(spark_type)
    if np_str is None:
        raise ValueError(
            f"column {col!r} has Spark type {spark_type!r}, which the "
            f"zarr sink cannot store (supported: {sorted(_SPARK_TO_NP)})"
        )
    return np.dtype(np_str)


def _collect_axes(df: DataFrame, dims: tuple[str, ...]) -> dict[str, np.ndarray]:
    """Sorted distinct coordinate values of every dimension in ONE
    aggregation job (``collect_set`` per dim, partial-combined
    map-side): one pass over the input instead of one scan per
    dimension; result sizes are the axis lengths, not the row count.
    The driver-side sort is O(axis log axis)."""
    row = df.agg(
        *[F.collect_set(d).alias(d) for d in dims]
    ).collect()[0]
    return {
        d: np.sort(
            np.asarray(row[d]).astype(_np_dtype_of(df, d), copy=False)
        )
        for d in dims
    }


def write_zarr(
    df: DataFrame,
    path: str,
    value_col: str = "value",
    dims: tuple[str, ...] | None = None,
    chunks: tuple[int, ...] | None = None,
    compressor: dict | None = {"id": "zlib", "level": 5},
    fill_value: Any = 0,
    mode: str = "overwrite",
    storage_options: dict | None = None,
) -> dict:
    """Write a long-format DataFrame (dim columns + one value column,
    the shape ``scan_data`` produces) as a dense zarr v2 array with
    1-D coordinate arrays, consolidated metadata included.

    Returns a summary dict: shape, chunks, chunks_written, bytes.
    """
    if dims is None:
        dims = tuple(c for c in df.columns if c != value_col)
    if not dims:
        raise ValueError("write_zarr needs at least one dimension column")
    if mode not in ("overwrite", "error"):
        raise ValueError(f"unknown mode {mode!r} (use 'overwrite'|'error')")

    store = ByteStore.for_path(path, storage_options)
    if store.get(".zgroup") is not None or store.get("zarr.json") is not None:
        if mode == "error":
            raise FileExistsError(f"zarr store already exists at {path!r}")
        store.delete_prefix()

    axes = _collect_axes(df, dims)
    shape = tuple(len(axes[d]) for d in dims)
    if chunks is None:
        chunks = tuple(min(s, 64) or 1 for s in shape)
    chunks = tuple(int(c) for c in chunks)
    if len(chunks) != len(dims) or any(c < 1 for c in chunks):
        raise ValueError(f"bad chunk shape {chunks} for dims {dims}")
    dtype = _np_dtype_of(df, value_col)

    # ---- metadata + coordinate arrays (driver; small by construction)
    spark = df.sparkSession
    zmeta: dict[str, dict] = {}

    def put_meta(key: str, meta: dict) -> None:
        zmeta[key] = meta
        store.put(key, json.dumps(meta).encode())

    put_meta(".zgroup", {"zarr_format": 2})
    put_meta(".zattrs", {})
    for d in dims:
        ax = axes[d]
        put_meta(
            f"{d}/.zarray",
            {
                "zarr_format": 2,
                "shape": [len(ax)],
                "chunks": [max(len(ax), 1)],
                "dtype": ax.dtype.str,
                "compressor": compressor,
                "fill_value": 0,
                "order": "C",
                "filters": None,
            },
        )
        put_meta(f"{d}/.zattrs", {"_ARRAY_DIMENSIONS": [d]})
        store.put(
            f"{d}/0",
            _encode_bytes(ax.tobytes(), compressor, typesize=ax.dtype.itemsize),
        )
    put_meta(
        f"{value_col}/.zarray",
        {
            "zarr_format": 2,
            "shape": list(shape),
            "chunks": list(chunks),
            "dtype": dtype.str,
            "compressor": compressor,
            "fill_value": fill_value,
            "order": "C",
            "filters": None,
        },
    )
    put_meta(f"{value_col}/.zattrs", {"_ARRAY_DIMENSIONS": list(dims)})
    store.put(
        ".zmetadata",
        json.dumps({"zarr_format": 2, "metadata": zmeta}).encode(),
    )

    # ---- map rows to grid positions: per-dim broadcast position joins
    pos_cols = [f"__pos_{i}" for i in range(len(dims))]
    mapped = df.select(*dims, F.col(value_col).alias("__value"))
    for i, d in enumerate(dims):
        ax = axes[d]
        pos_df = spark.createDataFrame(
            list(zip((v.item() for v in ax), range(len(ax)))),
            schema=f"`{d}` {dict(df.dtypes)[d]}, {pos_cols[i]} bigint",
        )
        mapped = mapped.join(F.broadcast(pos_df), on=d, how="inner")

    # linear chunk id (row-major over the chunk grid) — the shuffle key
    grid = tuple(-(-s // c) for s, c in zip(shape, chunks))
    strides = _strides(grid)
    chunk_id = sum(
        F.floor(F.col(pc) / chunks[i]).cast("bigint") * strides[i]
        for i, pc in enumerate(pos_cols)
    )
    mapped = mapped.select(
        chunk_id.alias("__chunk"), *pos_cols, "__value"
    )

    n_dims, chunks_b, grid_b, dtype_str = len(dims), chunks, grid, dtype.str
    fill_b, comp_b, path_b, so_b = fill_value, compressor, path, storage_options
    vcol_b = value_col

    def write_one_chunk(pdf) -> "Any":
        """One task = one chunk: assemble the dense block from this
        chunk's cells and put it at its deterministic key. Re-runs
        (retry/speculation) rewrite identical bytes — idempotent."""
        import pandas as pd

        w_store = ByteStore.for_path(path_b, so_b)
        dt = np.dtype(dtype_str)
        rem = int(pdf["__chunk"].iloc[0])
        idx = []
        for s_ in _strides(grid_b):
            idx.append(rem // s_)
            rem %= s_
        within = [
            pdf[f"__pos_{i}"].to_numpy() - idx[i] * chunks_b[i]
            for i in range(n_dims)
        ]
        lin = np.ravel_multi_index(within, chunks_b)
        if len(np.unique(lin)) != len(lin):
            raise ValueError(
                f"duplicate cells in chunk {tuple(idx)} of "
                f"{vcol_b!r}: the (dims) key is not unique"
            )
        block = np.full(chunks_b, fill_b, dtype=dt)
        block.reshape(-1)[lin] = pdf["__value"].to_numpy().astype(dt, copy=False)
        payload = _encode_bytes(
            np.ascontiguousarray(block).tobytes(), comp_b, typesize=dt.itemsize
        )
        key = f"{vcol_b}/{'.'.join(str(int(i)) for i in idx) or '0'}"
        w_store.put(key, payload)
        return pd.DataFrame(
            {"chunk_key": [key], "nbytes": [len(payload)], "cells": [len(pdf)]}
        )

    stats = (
        mapped.groupBy("__chunk")
        .applyInPandas(
            lambda _key, pdf: write_one_chunk(pdf),
            schema="chunk_key string, nbytes long, cells long",
        )
        .collect()  # one row per written chunk — bounded by the grid
    )
    return {
        "path": path,
        "shape": shape,
        "chunks": chunks,
        "chunks_written": len(stats),
        "bytes": int(sum(r["nbytes"] for r in stats)),
        "cells": int(sum(r["cells"] for r in stats)),
    }


def _strides(grid: tuple[int, ...]) -> list[int]:
    s = [1] * len(grid)
    for i in range(len(grid) - 2, -1, -1):
        s[i] = s[i + 1] * grid[i + 1]
    return s


__all__ = ["write_zarr"]

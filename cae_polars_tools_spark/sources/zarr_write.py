"""Distributed zarr sink: long-format DataFrame → chunked store
(v2, v3, or v3 + sharding_indexed).

The inverse of ``scan_data`` — and a capability the reference does not
have at all (its CLI only reads zarr INTO parquet,
``/root/reference/src/cli.py:143-166``; writing back requires
zarr-python on one node). Spark-first design:

* **One shuffle, keyed by storage object.** Each row is mapped to its
  global grid position by an Arrow-batched ``searchsorted`` against
  the broadcast axes (the axes — the sorted distinct coordinate
  values — are bounded by the array's side lengths and are needed for
  the store metadata anyway, exactly like the reference's coordinate
  handling; callers that already know them, e.g. a store-to-store
  copy, pass ``axes=`` and skip the one ``collect_set`` gathering
  job). All per-dim position lookups run in ONE ArrowEvalPython
  stage — no join, no extra exchange — so the only wide exchange is
  the ``groupBy(object_id)`` that co-locates each chunk's — or each
  SHARD's — cells.
* **Embarrassingly parallel object writes.** A zarr chunk/shard is one
  immutable object with a deterministic key, so every ``applyInPandas``
  task writes its own objects straight to the store — no commit
  protocol, no renames, and task retries/speculation are naturally
  idempotent (same bytes, same key). Aggregate write bandwidth scales
  with the executor count; the driver handles only axes + metadata.
* **Sharding for object-count control.** At 100 TB a chunk-per-object
  layout is billions of small objects; ``shard_chunks`` switches the
  v3 output to ``sharding_indexed`` — each task assembles one shard
  (many gzip'd inner chunks + the crc32c'd offset index) and puts ONE
  object, cutting object count by the inner-chunks-per-shard factor
  while this engine's sharded reader still prunes and range-reads at
  inner-chunk granularity.
* **Metadata from the driver.** v2: ``.zgroup``/``.zarray``/``.zattrs``
  (xarray's ``_ARRAY_DIMENSIONS``) + consolidated ``.zmetadata``. v3:
  per-node ``zarr.json`` + zarr-python-style root-level
  ``consolidated_metadata`` — both built from the metadata already in
  hand, zero listing round-trips, so any ByteStore works (local,
  fsspec/S3, memory://).

Missing grid cells get ``fill_value``; duplicate cells raise (a silent
last-writer-wins would hide upstream join bugs).
"""

from __future__ import annotations

import gzip as _gzip
import json
import os
import zlib as _zlib
from typing import Any

import numpy as np
import pandas as pd

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


def _position_udf(axes_bc, dim: str):
    """Arrow-batched axis→position lookup: ``searchsorted`` over the
    broadcast sorted axis (O(log axis) per row, vectorized per batch).
    A value not on the axis is an error — it means caller-supplied
    ``axes`` don't cover the data, where silently dropping or clamping
    would corrupt the store."""

    @F.pandas_udf("long")
    def pos(vals: pd.Series) -> pd.Series:
        ax = axes_bc.value[dim]
        v = vals.to_numpy()
        if v.dtype != ax.dtype:
            v = v.astype(ax.dtype)
        idx = np.minimum(np.searchsorted(ax, v), len(ax) - 1)
        if not np.array_equal(ax[idx], v):
            raise ValueError(
                f"write_zarr: {dim!r} values not on the provided axis"
            )
        return pd.Series(idx.astype(np.int64))

    return pos


def _strides(grid: tuple[int, ...]) -> list[int]:
    s = [1] * len(grid)
    for i in range(len(grid) - 2, -1, -1):
        s[i] = s[i + 1] * grid[i + 1]
    return s


def _v3_codecs(compressor: dict | None) -> list[dict]:
    """v3 inner codec pipeline equivalent to the v2 ``compressor``."""
    codecs: list[dict] = [
        {"name": "bytes", "configuration": {"endian": "little"}}
    ]
    if compressor is not None:
        cid = compressor.get("id")
        if cid not in ("gzip", "zlib"):
            raise ValueError(
                f"v3 sink supports gzip/zlib compression, not {cid!r}"
            )
        codecs.append(
            {
                "name": cid,
                "configuration": {"level": int(compressor.get("level", 5))},
            }
        )
    return codecs


def _v3_compress(payload: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return payload
    level = int(compressor.get("level", 5))
    if compressor.get("id") == "gzip":
        return _gzip.compress(payload, compresslevel=level)
    return _zlib.compress(payload, level)


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
    zarr_format: int = 2,
    shard_chunks: tuple[int, ...] | None = None,
    axes: dict[str, Any] | None = None,
) -> dict:
    """Write a long-format DataFrame (dim columns + one value column,
    the shape ``scan_data`` produces) as a dense zarr array with 1-D
    coordinate arrays and consolidated metadata.

    ``zarr_format=3`` emits a v3 store; ``shard_chunks`` (implies v3)
    makes each stored object one ``sharding_indexed`` shard of many
    ``chunks``-shaped inner chunks. ``axes`` supplies the per-dimension
    coordinate values when the caller already knows them (store-to-store
    copy, fixed grid), skipping the distinct-gathering job — every
    input row's coordinates must be covered. Returns a summary dict:
    shape, chunks, chunks_written (storage objects), bytes, cells.
    """
    if dims is None:
        dims = tuple(c for c in df.columns if c != value_col)
    if not dims:
        raise ValueError("write_zarr needs at least one dimension column")
    if mode not in ("overwrite", "error"):
        raise ValueError(f"unknown mode {mode!r} (use 'overwrite'|'error')")
    if shard_chunks is not None:
        zarr_format = 3
    if zarr_format not in (2, 3):
        raise ValueError(f"unsupported zarr_format {zarr_format}")

    store = ByteStore.for_path(path, storage_options)
    # read the predecessor's generation BEFORE the wipe — the
    # deterministic increment is what busts executor caches on an
    # in-place overwrite
    generation = _next_generation(store)
    if store.get(".zgroup") is not None or store.get("zarr.json") is not None:
        if mode == "error":
            raise FileExistsError(f"zarr store already exists at {path!r}")
        store.delete_prefix()

    if axes is None:
        axes = _collect_axes(df, dims)
    else:
        # a None value is what extract_coordinate_arrays yields for an
        # absent coordinate array — treat it as missing, not as data
        missing = [d for d in dims if axes.get(d) is None]
        if missing:
            raise ValueError(f"axes missing dimensions: {missing}")
        axes = {
            d: np.sort(
                np.asarray(axes[d]).astype(_np_dtype_of(df, d), copy=False)
            )
            for d in dims
        }
    shape = tuple(len(axes[d]) for d in dims)
    if chunks is None:
        chunks = tuple(min(s, 64) or 1 for s in shape)
    chunks = tuple(int(c) for c in chunks)
    if len(chunks) != len(dims) or any(c < 1 for c in chunks):
        raise ValueError(f"bad chunk shape {chunks} for dims {dims}")
    if shard_chunks is not None:
        shard_chunks = tuple(int(s) for s in shard_chunks)
        if len(shard_chunks) != len(dims) or any(
            s % c for s, c in zip(shard_chunks, chunks)
        ):
            raise ValueError(
                f"shard_chunks {shard_chunks} must be a per-dim multiple "
                f"of chunks {chunks}"
            )
    dtype = _np_dtype_of(df, value_col)

    # one storage object per entry of this grid: chunks, or shards
    storage_chunks = shard_chunks or chunks

    if zarr_format == 2:
        _write_v2_metadata(
            store, axes, dims, shape, chunks, dtype, compressor,
            fill_value, value_col, generation,
        )
    else:
        _write_v3_metadata(
            store, axes, dims, shape, chunks, dtype, compressor,
            fill_value, value_col, shard_chunks, generation,
        )

    # ---- map rows to grid positions: Arrow-batched searchsorted over
    # the broadcast axes. All dims' lookups land in ONE ArrowEvalPython
    # stage (adjacent pandas UDFs are batch-evaluated together) — no
    # joins, no extra exchange; the axes broadcast is bounded by the
    # array side lengths.
    spark = df.sparkSession
    axes_bc = spark.sparkContext.broadcast(axes)
    pos_cols = [f"__pos_{i}" for i in range(len(dims))]
    mapped = df.select(
        F.col(value_col).alias("__value"),
        *[
            _position_udf(axes_bc, d)(F.col(d)).alias(pos_cols[i])
            for i, d in enumerate(dims)
        ],
    )

    # linear object id (row-major over the storage grid) — the shuffle key
    grid = tuple(-(-s // c) for s, c in zip(shape, storage_chunks))
    strides = _strides(grid)
    object_id = sum(
        F.floor(F.col(pc) / storage_chunks[i]).cast("bigint") * strides[i]
        for i, pc in enumerate(pos_cols)
    )
    mapped = mapped.select(object_id.alias("__chunk"), *pos_cols, "__value")

    n_dims, chunks_b, grid_b, dtype_str = len(dims), chunks, grid, dtype.str
    fill_b, comp_b, path_b, so_b = fill_value, compressor, path, storage_options
    vcol_b, fmt_b, shard_b = value_col, zarr_format, shard_chunks
    storage_b = storage_chunks

    def encode_inner(block: np.ndarray) -> bytes:
        raw = np.ascontiguousarray(block).tobytes()
        if fmt_b == 2:
            return _encode_bytes(raw, comp_b, typesize=block.dtype.itemsize)
        return _v3_compress(raw, comp_b)

    def write_one_object(pdf) -> "Any":
        """One task = one storage object (chunk, or whole shard):
        assemble it from this object's cells and put it at its
        deterministic key. Re-runs rewrite identical bytes."""
        import pandas as pd

        w_store = ByteStore.for_path(path_b, so_b)
        dt = np.dtype(dtype_str)
        rem = int(pdf["__chunk"].iloc[0])
        idx = []
        for s_ in _strides(grid_b):
            idx.append(rem // s_)
            rem %= s_
        within = np.stack(
            [
                pdf[f"__pos_{i}"].to_numpy() - idx[i] * storage_b[i]
                for i in range(n_dims)
            ]
        )
        raw_vals = pdf["__value"].to_numpy()
        if (
            np.issubdtype(dt, np.integer)
            and raw_vals.dtype.kind == "f"
            and np.isnan(raw_vals).any()
        ):
            # Spark nulls surface as NaN in the Arrow float batch;
            # astype(int) would silently write INT64_MIN garbage cells
            raise ValueError(
                f"null values in integer value column {vcol_b!r}: "
                "zarr integer arrays have no null representation — "
                "fill or filter nulls upstream, or write a float dtype"
            )
        vals = raw_vals.astype(dt, copy=False)
        lin = np.ravel_multi_index(tuple(within), storage_b)
        if len(np.unique(lin)) != len(lin):
            raise ValueError(
                f"duplicate cells in object {tuple(idx)} of {vcol_b!r}: "
                "the (dims) key is not unique"
            )
        if fmt_b == 2:
            key = f"{vcol_b}/{'.'.join(str(int(i)) for i in idx) or '0'}"
        else:
            key = f"{vcol_b}/{'/'.join(('c', *(str(int(i)) for i in idx)))}"

        if shard_b is None:
            block = np.full(chunks_b, fill_b, dtype=dt)
            block.reshape(-1)[lin] = vals
            payload = encode_inner(block)
        else:
            # assemble one shard: encode each present inner chunk,
            # build the (offset, nbytes) index, crc32c it, append
            from cae_polars_tools_spark.sources.zarr_v3 import (
                _SHARD_MISSING,
                _crc32c_value,
            )

            cps = tuple(s // c for s, c in zip(shard_b, chunks_b))
            inner_of = tuple(
                within[i] // chunks_b[i] for i in range(n_dims)
            )
            inner_lin = np.ravel_multi_index(inner_of, cps)
            order = np.argsort(inner_lin, kind="stable")
            index = np.full((*cps, 2), _SHARD_MISSING, dtype="<u8")
            body = bytearray()
            for inner_id in np.unique(inner_lin):
                sel = order[
                    np.searchsorted(inner_lin[order], inner_id): np.searchsorted(
                        inner_lin[order], inner_id, side="right"
                    )
                ]
                block = np.full(chunks_b, fill_b, dtype=dt)
                w_in = tuple(
                    within[i][sel] % chunks_b[i] for i in range(n_dims)
                )
                block[w_in] = vals[sel]
                payload = encode_inner(block)
                index.reshape(-1, 2)[inner_id] = (len(body), len(payload))
                body.extend(payload)
            idx_bytes = index.tobytes()
            idx_bytes += _crc32c_value(idx_bytes).to_bytes(4, "little")
            payload = bytes(body) + idx_bytes

        w_store.put(key, payload)
        return pd.DataFrame(
            {"chunk_key": [key], "nbytes": [len(payload)], "cells": [len(pdf)]}
        )

    stats = (
        mapped.groupBy("__chunk")
        .applyInPandas(
            lambda _key, pdf: write_one_object(pdf),
            schema="chunk_key string, nbytes long, cells long",
        )
        .collect()  # one row per written object — bounded by the grid
    )
    return {
        "path": path,
        "shape": shape,
        "chunks": chunks,
        "chunks_written": len(stats),
        "bytes": int(sum(r["nbytes"] for r in stats)),
        "cells": int(sum(r["cells"] for r in stats)),
    }


def _next_generation(store) -> int:
    """Engine-internal write generation: the previous store's
    ``_generation`` + 1 (0 for a fresh path). Deterministic — the same
    write sequence reproduces byte-identical metadata — while still
    changing on every overwrite at a reused path, which is all the
    executor group cache (keyed by the metadata etag,
    ``zarr_store.group_meta_etag``) needs to evict stale handles and
    shard-index caches. Underscore-prefixed and absent from reader
    output: group attrs feed only the etag."""
    for key in (".zattrs", "zarr.json"):
        raw = store.get(key)
        if raw is None:
            continue
        try:
            doc = json.loads(raw)
        except (ValueError, UnicodeDecodeError):
            continue
        attrs = doc.get("attributes", doc) if key == "zarr.json" else doc
        gen = attrs.get("_generation") if isinstance(attrs, dict) else None
        if isinstance(gen, int):
            return gen + 1
        if gen is not None:
            # pre-fix stores carried a random hex nonce — any
            # overwrite of one bumps to a fresh deterministic epoch
            return 1
    return 0


def _write_v2_metadata(
    store, axes, dims, shape, chunks, dtype, compressor, fill_value,
    value_col, generation: int = 0,
) -> None:
    zmeta: dict[str, dict] = {}

    def put_meta(key: str, meta: dict) -> None:
        zmeta[key] = meta
        store.put(key, json.dumps(meta).encode())

    put_meta(".zgroup", {"zarr_format": 2})
    # deterministic write generation: a same-shape overwrite at a
    # reused path still changes the metadata fingerprint, so executor
    # group caches (keyed by the plan etag) can never serve the old
    # store's handle — or its stale shard-index cache — against
    # rewritten bytes; unlike a random nonce, identical write
    # sequences reproduce byte-identical stores
    put_meta(".zattrs", {"_generation": generation})
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
        # zarr-python's ConsolidatedMetadataStore validates this exact
        # key — "zarr_format" here would make external readers reject
        # the document (see consolidate_metadata, zarr_format.py)
        json.dumps({"zarr_consolidated_format": 1, "metadata": zmeta}).encode(),
    )


def _write_v3_metadata(
    store, axes, dims, shape, chunks, dtype, compressor, fill_value,
    value_col, shard_chunks, generation: int = 0,
) -> None:
    """Per-node zarr.json + zarr-python-style root consolidated
    metadata (one GET to open — this engine's v3 reader uses it)."""

    def array_meta(a_shape, grid_shape, a_dtype, a_fill, dim_names, sharded):
        inner = _v3_codecs(compressor)
        if sharded:
            codecs = [
                {
                    "name": "sharding_indexed",
                    "configuration": {
                        "chunk_shape": list(chunks),
                        "codecs": inner,
                        "index_codecs": [
                            {
                                "name": "bytes",
                                "configuration": {"endian": "little"},
                            },
                            {"name": "crc32c"},
                        ],
                        "index_location": "end",
                    },
                }
            ]
        else:
            codecs = inner
        return {
            "zarr_format": 3,
            "node_type": "array",
            "shape": list(a_shape),
            "data_type": a_dtype.name,
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": list(grid_shape)},
            },
            "chunk_key_encoding": {
                "name": "default",
                "configuration": {"separator": "/"},
            },
            "fill_value": a_fill,
            "codecs": codecs,
            "attributes": {},
            "dimension_names": list(dim_names),
        }

    consolidated: dict[str, dict] = {}
    for d in dims:
        ax = axes[d]
        meta = array_meta((len(ax),), (max(len(ax), 1),), ax.dtype, 0, (d,), False)
        consolidated[d] = meta
        store.put(f"{d}/zarr.json", json.dumps(meta).encode())
        store.put(
            f"{d}/c/0", _v3_compress(np.ascontiguousarray(ax).tobytes(), compressor)
        )
    meta = array_meta(
        shape, shard_chunks or chunks, dtype, fill_value, dims,
        shard_chunks is not None,
    )
    consolidated[value_col] = meta
    store.put(f"{value_col}/zarr.json", json.dumps(meta).encode())
    store.put(
        "zarr.json",
        json.dumps(
            {
                "zarr_format": 3,
                "node_type": "group",
                # same-shape-overwrite cache busting; see the v2 branch
                "attributes": {"_generation": generation},
                "consolidated_metadata": {
                    "kind": "inline",
                    "must_understand": False,
                    "metadata": consolidated,
                },
            }
        ).encode(),
    )


__all__ = ["write_zarr", "append_zarr", "zarr_ingest_sink"]


def _compressor_of_v3_codecs(codecs: list) -> dict | None:
    """Inverse of :func:`_v3_codecs`: recover the (id, level) compressor
    this sink can RE-ENCODE from a v3 codec pipeline, or raise for
    pipelines we can only decode (blosc/transpose/crc32c/...)."""
    names = [c.get("name") for c in codecs]
    if not names or names[0] != "bytes":
        raise NotImplementedError(
            f"append_zarr cannot re-encode v3 codec pipeline {names!r}"
        )
    endian = (codecs[0].get("configuration") or {}).get("endian", "little")
    if endian != "little":
        raise NotImplementedError(
            "append_zarr supports little-endian bytes codecs only"
        )
    if len(names) == 1:
        return None
    if len(names) == 2 and names[1] in ("gzip", "zlib"):
        return {
            "id": names[1],
            "level": int(
                (codecs[1].get("configuration") or {}).get("level", 5)
            ),
        }
    raise NotImplementedError(
        f"append_zarr cannot re-encode v3 codec pipeline {names!r}"
    )


def _assemble_shard(
    r_arr,
    idx,
    within,
    vals,
    dt,
    chunks,
    shard_chunks,
    fill,
    comp,
    conf,
    is_boundary,
):
    """Assemble one ``sharding_indexed`` shard for append: encode every
    inner chunk that has new cells OR already exists in the old
    boundary shard (read through the array's own ranged-read path and
    overlaid), build the (offset, nbytes) index, and return
    ``(payload, key)``. Non-boundary shards carry only new cells —
    the pre-append store has no bytes there."""
    from cae_polars_tools_spark.sources.zarr_v3 import (
        _SHARD_MISSING,
        _crc32c_value,
    )

    from cae_polars_tools_spark.sources.zarr_v3 import _shard_index_nbytes

    n_dims = len(chunks)
    cps = tuple(s // c for s, c in zip(shard_chunks, chunks))
    inner_of = tuple(within[i] // chunks[i] for i in range(n_dims))
    inner_lin = np.ravel_multi_index(inner_of, cps)

    # Task-retry idempotency: a retried boundary task on a reused
    # worker must see the CURRENT shard object, not the handle's
    # LRU-cached pre-put index (offsets into bytes the first attempt
    # already replaced). Re-merging against the already-merged shard
    # is byte-idempotent (old cells unchanged, new cells overlay the
    # same values), so fresh-per-task state is both safe and correct.
    r_arr.__dict__.pop("_shard_idx_cache", None)

    to_write = set(int(i) for i in np.unique(inner_lin))
    old_index = r_arr._shard_index(tuple(idx)) if is_boundary else None
    if old_index is not None:
        flat = old_index.reshape(-1, 2)
        to_write |= {
            int(i)
            for i in range(flat.shape[0])
            if int(flat[i, 0]) != _SHARD_MISSING
        }

    index = np.full((*cps, 2), _SHARD_MISSING, dtype="<u8")
    body = bytearray()
    for inner_id in sorted(to_write):
        inner_pos = np.unravel_index(inner_id, cps)
        had_old = old_index is not None and int(
            old_index.reshape(-1, 2)[inner_id, 0]
        ) != _SHARD_MISSING
        if had_old:
            g_inner = tuple(
                int(idx[i]) * cps[i] + int(inner_pos[i])
                for i in range(n_dims)
            )
            block = r_arr.read_chunk(g_inner).astype(dt, copy=True)
        else:
            block = np.full(chunks, fill, dtype=dt)
        sel = np.nonzero(inner_lin == inner_id)[0]
        if len(sel):
            w_in = tuple(within[i][sel] % chunks[i] for i in range(n_dims))
            block[w_in] = vals[sel]
        payload = _v3_compress(np.ascontiguousarray(block).tobytes(), comp)
        index.reshape(-1, 2)[inner_id] = (len(body), len(payload))
        body.extend(payload)

    # Offsets are ABSOLUTE within the shard object (the convention of
    # _read_inner_chunk/_decode_shard_full, which get_range from the
    # object start): with the index at the END the body starts at 0,
    # but with index_location='start' every chunk sits after the
    # fixed-size index, so offsets shift by its on-disk size.
    if conf.get("index_location", "end") == "start":
        shift = _shard_index_nbytes(conf, int(np.prod(cps)) if cps else 1)
        flat = index.reshape(-1, 2)
        stored = flat[:, 0] != _SHARD_MISSING
        flat[stored, 0] += np.uint64(shift)
    idx_bytes = index.tobytes()
    index_codec_names = [
        c.get("name") for c in (conf.get("index_codecs") or [])
    ]
    if "crc32c" in index_codec_names:
        idx_bytes += _crc32c_value(idx_bytes).to_bytes(4, "little")
    if conf.get("index_location", "end") == "start":
        payload = idx_bytes + bytes(body)
    else:
        payload = bytes(body) + idx_bytes
    return payload, r_arr._chunk_key(tuple(int(i) for i in idx))


def _put_coord_chunks(
    store, coord_arr, combined, old_len, cs, comp, version
) -> None:
    """(Re)write the coordinate chunks a dimension-append touches,
    keeping the array's OWN chunk size: chunks strictly before the old
    length are untouched, the straddling chunk (if any) is rewritten
    with identical bytes in its pre-append-visible prefix, and fresh
    chunks cover the appended tail. v2 stores every chunk at full
    chunk shape, so blocks pad with zeros past the axis end."""
    first = old_len // cs
    n_chunks = -(-len(combined) // cs)
    for ci in range(first, n_chunks):
        block = np.zeros(cs, dtype=combined.dtype)
        seg = combined[ci * cs: min((ci + 1) * cs, len(combined))]
        block[: len(seg)] = seg
        raw = np.ascontiguousarray(block).tobytes()
        if version == 2:
            payload = _encode_bytes(
                raw, comp, typesize=combined.dtype.itemsize
            )
        else:
            payload = _v3_compress(raw, comp)
        store.put(coord_arr._chunk_key((ci,)), payload)


def append_zarr(
    df: DataFrame,
    path: str,
    append_dim: str,
    value_col: str = "value",
    storage_options: dict | None = None,
) -> dict:
    """Append a long-format DataFrame to an EXISTING zarr v2 store
    along one dimension — the time-series ingest mode (xarray's
    ``to_zarr(append_dim=…)``): each run appends the next day/month of
    data without rewriting history.

    Contract: the new rows' ``append_dim`` coordinates must all be
    STRICTLY GREATER than the store's current maximum (monotone
    ingest; overlap would silently repaint history), every other
    dimension's coordinates must already exist on the store's axes,
    and the value dtype must match the array's. Supported stores: v2
    (no filters) and v3 with a ``bytes``(+``gzip``/``zlib``) codec
    pipeline, including ``sharding_indexed`` — i.e. everything
    :func:`write_zarr` produces. A sharded append reassembles only
    the BOUNDARY shard (old inner chunks read through the ranged-read
    path, overlaid, re-indexed); every other shard is written fresh
    from its new cells.

    Scale shape mirrors :func:`write_zarr` — one ``groupBy(chunk)``
    shuffle, embarrassingly parallel idempotent chunk puts — plus ONE
    boundary subtlety: when the old axis length is not a chunk
    multiple, the straddling chunk already holds history, so exactly
    those tasks read-modify-write it (decode via the engine's own
    read path, overlay the new cells — which land strictly beyond the
    old length, so no old cell is ever changed). Metadata (grown
    shape, extended coordinate array, refreshed consolidated doc) is
    rewritten by the driver LAST: a concurrent reader sees the old
    shape until the flip, and every pre-flip visible byte is
    unchanged. Readers in long-lived reused workers re-open via the
    plan's ``meta_etag`` (see ``zarr_store.group_meta_etag``).
    """
    from cae_polars_tools_spark.sources import coordinates as C
    from cae_polars_tools_spark.sources.zarr_store import ZarrStore
    from cae_polars_tools_spark.sources.zarr_v3 import ZarrV3Array

    store_handle = ZarrStore(path, storage_options=storage_options)
    group = store_handle.open_zarr_group()
    arr = group.get_array(value_col)
    # ZarrV3Array SUBCLASSES ZarrV2Array (shared read API), so version
    # detection must use the v3-specific type, not the base
    version = 3 if isinstance(arr, ZarrV3Array) else 2
    sharded = version == 3 and arr.shard_conf is not None
    if sharded:
        from cae_polars_tools_spark.sources.zarr_v3 import (
            _shard_index_nbytes,
        )

        # raises for index pipelines we cannot relocate/rewrite
        _shard_index_nbytes(arr.shard_conf, 1)
        compressor = _compressor_of_v3_codecs(
            arr.shard_conf.get("codecs") or [{"name": "bytes"}]
        )
    elif version == 3:
        compressor = _compressor_of_v3_codecs(arr.codecs)
    else:
        if arr.filters:
            raise NotImplementedError(
                "append_zarr cannot re-encode stores with v2 filters"
            )
        if arr.order != "C":
            raise NotImplementedError(
                "append_zarr supports C-order arrays"
            )
        compressor = arr.compressor
    dims = tuple(C.resolve_dims(arr.attrs, arr.ndim))
    if append_dim not in dims:
        raise ValueError(
            f"append_dim {append_dim!r} is not a dimension of "
            f"{value_col!r} (dims: {dims})"
        )
    missing_cols = [c for c in (*dims, value_col) if c not in df.columns]
    if missing_cols:
        raise ValueError(f"DataFrame lacks column(s) {missing_cols}")
    dtype = _np_dtype_of(df, value_col)
    if dtype != arr.dtype:
        raise ValueError(
            f"value dtype {dtype} does not match the store's {arr.dtype}"
        )
    ad = dims.index(append_dim)

    # existing axes (1-D coordinate arrays, bounded by side lengths)
    old_axes: dict[str, np.ndarray] = {}
    for d in dims:
        try:
            coord = group.get_array(d)
        except KeyError:
            raise ValueError(
                f"store has no coordinate array for dimension {d!r}; "
                "append needs real coordinates to align against"
            ) from None
        old_axes[d] = np.asarray(coord[slice(None)])

    # Validate the append-dim COORDINATE array's re-encodability up
    # front: discovering an unsupported coord codec/filter at the
    # metadata flip would waste the whole distributed chunk job, and
    # silently re-encoding past a v2 filter (e.g. delta on a monotone
    # time axis) would corrupt every coordinate read.
    coord_arr = group.get_array(append_dim)
    if version == 2:
        if coord_arr.filters:
            raise NotImplementedError(
                f"append_zarr cannot re-encode the {append_dim!r} "
                "coordinate array: it declares v2 filters"
            )
        coord_comp = coord_arr.compressor
    else:
        if getattr(coord_arr, "shard_conf", None) is not None:
            raise NotImplementedError(
                f"append_zarr cannot extend a SHARDED coordinate "
                f"array ({append_dim!r})"
            )
        coord_comp = _compressor_of_v3_codecs(coord_arr.codecs)
    coord_cs = int(coord_arr.chunks[0])

    new_axes = _collect_axes(df, dims)
    new_ap = new_axes[append_dim].astype(old_axes[append_dim].dtype)
    if len(new_ap) == 0:
        raise ValueError("no rows to append")
    old_ap = old_axes[append_dim]
    if len(old_ap) and new_ap.min() <= old_ap.max():
        raise ValueError(
            f"append coordinates must be strictly greater than the "
            f"store's current {append_dim!r} max ({old_ap.max()!r}); "
            f"got min {new_ap.min()!r}"
        )
    for d in dims:
        if d == append_dim:
            continue
        extra = np.setdiff1d(
            new_axes[d].astype(old_axes[d].dtype), old_axes[d]
        )
        if len(extra):
            raise ValueError(
                f"dimension {d!r} has coordinates not on the store's "
                f"axis (first few: {extra[:5].tolist()}); append only "
                f"grows {append_dim!r}"
            )

    old_len = len(old_ap)
    chunks = tuple(arr.chunks)
    storage_chunks = tuple(arr.shard_chunks) if sharded else chunks
    fill_value = arr.fill_value if arr.fill_value is not None else 0
    new_shape = tuple(
        len(old_axes[d]) if d != append_dim else old_len + len(new_ap)
        for d in dims
    )

    # row → grid position: existing axes for the fixed dims, the NEW
    # slice (+ old_len offset) for the append dim
    lookup_axes = {
        d: (new_ap if d == append_dim else old_axes[d]) for d in dims
    }
    spark = df.sparkSession
    axes_bc = spark.sparkContext.broadcast(lookup_axes)
    pos_cols = [f"__pos_{i}" for i in range(len(dims))]
    mapped = df.select(
        F.col(value_col).alias("__value"),
        *[
            (
                _position_udf(axes_bc, d)(F.col(d))
                + (F.lit(old_len) if d == append_dim else F.lit(0))
            ).alias(pos_cols[i])
            for i, d in enumerate(dims)
        ],
    )
    grid = tuple(-(-s // c) for s, c in zip(new_shape, storage_chunks))
    strides = _strides(grid)
    object_id = sum(
        F.floor(F.col(pc) / storage_chunks[i]).cast("bigint") * strides[i]
        for i, pc in enumerate(pos_cols)
    )
    mapped = mapped.select(object_id.alias("__chunk"), *pos_cols, "__value")

    boundary_idx = (
        old_len // storage_chunks[ad] if old_len % storage_chunks[ad] else -1
    )
    from cae_polars_tools_spark.sources.zarr_store import group_meta_etag

    etag_before = group_meta_etag(group)
    n_dims, chunks_b, grid_b, dtype_str = len(dims), chunks, grid, dtype.str
    fill_b, comp_b, path_b, so_b = fill_value, compressor, path, storage_options
    vcol_b, ad_b, boundary_b = value_col, ad, boundary_idx
    fmt_b, storage_b, sharded_b = version, storage_chunks, sharded
    shard_conf_b = dict(arr.shard_conf) if sharded else None

    def append_one_chunk(pdf) -> "Any":
        import pandas as pd

        from cae_polars_tools_spark.sources.zarr_format import ByteStore
        from cae_polars_tools_spark.sources.zarr_store import executor_group

        w_store = ByteStore.for_path(path_b, so_b)
        # the PRE-append group handle (etag pins the pre-flip
        # metadata): supplies version-correct chunk keys and, for the
        # boundary, the engine's own decode path
        r_arr = executor_group(
            path_b, so_b, None, None, meta_etag=etag_before
        ).get_array(vcol_b)
        dt = np.dtype(dtype_str)
        rem = int(pdf["__chunk"].iloc[0])
        idx = []
        for s_ in _strides(grid_b):
            idx.append(rem // s_)
            rem %= s_
        idx = tuple(int(i) for i in idx)
        within = np.stack(
            [
                pdf[f"__pos_{i}"].to_numpy() - idx[i] * storage_b[i]
                for i in range(n_dims)
            ]
        )
        raw_vals = pdf["__value"].to_numpy()
        if (
            np.issubdtype(dt, np.integer)
            and raw_vals.dtype.kind == "f"
            and np.isnan(raw_vals).any()
        ):
            raise ValueError(
                f"null values in integer value column {vcol_b!r}"
            )
        vals = raw_vals.astype(dt, copy=False)
        lin = np.ravel_multi_index(tuple(within), storage_b)
        if len(np.unique(lin)) != len(lin):
            raise ValueError(
                f"duplicate cells in chunk {tuple(idx)} of {vcol_b!r}"
            )
        if sharded_b:
            payload, key = _assemble_shard(
                r_arr, idx, within, vals, dt,
                chunks_b, storage_b, fill_b, comp_b, shard_conf_b,
                is_boundary=idx[ad_b] == boundary_b,
            )
            w_store.put(key, payload)
            return pd.DataFrame(
                {
                    "chunk_key": [key],
                    "nbytes": [len(payload)],
                    "cells": [len(pdf)],
                }
            )
        if idx[ad_b] == boundary_b:
            # straddling chunk: overlay onto the existing block (its
            # stored cells cover positions < old_len only — the new
            # cells are strictly beyond, so no old cell changes).
            # read_chunk also yields the fill-filled block when the
            # chunk object does not exist yet.
            block = r_arr.read_chunk(idx).astype(dt, copy=True)
        else:
            block = np.full(chunks_b, fill_b, dtype=dt)
        block.reshape(-1)[lin] = vals
        raw = np.ascontiguousarray(block).tobytes()
        if fmt_b == 2:
            payload = _encode_bytes(raw, comp_b, typesize=dt.itemsize)
        else:
            payload = _v3_compress(raw, comp_b)
        key = r_arr._chunk_key(idx)
        w_store.put(key, payload)
        return pd.DataFrame(
            {"chunk_key": [key], "nbytes": [len(payload)], "cells": [len(pdf)]}
        )

    stats = (
        mapped.groupBy("__chunk")
        .applyInPandas(
            lambda _key, pdf: append_one_chunk(pdf),
            schema="chunk_key string, nbytes long, cells long",
        )
        .collect()
    )

    # ---- metadata flip (LAST): grown value shape, extended append
    # coordinate (single-chunk, the writer's coord convention), and a
    # refreshed consolidated document when one exists.
    store = ByteStore.for_path(path, storage_options)
    combined = np.concatenate([old_ap, new_ap])
    if version == 2:
        updates: dict[str, dict] = {}
        vmeta = json.loads(store.get(f"{value_col}/.zarray"))
        vmeta["shape"] = list(new_shape)
        updates[f"{value_col}/.zarray"] = vmeta
        cmeta = json.loads(store.get(f"{append_dim}/.zarray"))
        cmeta["shape"] = [len(combined)]
        # chunk size is PRESERVED: only chunks at/after the old length
        # are (re)written, and a straddling chunk's visible prefix is
        # byte-identical under the old metadata — so a concurrent
        # reader holding the pre-flip .zarray never decodes a chunk
        # whose length contradicts it
        updates[f"{append_dim}/.zarray"] = cmeta
        _put_coord_chunks(
            store, coord_arr, combined, old_len, coord_cs, coord_comp, 2
        )
        for key, meta in updates.items():
            store.put(key, json.dumps(meta).encode())
        zmeta_raw = store.get(".zmetadata")
        if zmeta_raw is not None:
            doc = json.loads(zmeta_raw)
            doc.get("metadata", {}).update(updates)
            store.put(".zmetadata", json.dumps(doc).encode())
    else:
        v_updates: dict[str, dict] = {}
        vmeta = json.loads(store.get(f"{value_col}/zarr.json"))
        vmeta["shape"] = list(new_shape)
        v_updates[value_col] = vmeta
        cmeta = json.loads(store.get(f"{append_dim}/zarr.json"))
        cmeta["shape"] = [len(combined)]
        # chunk grid preserved — see the v2 branch's rationale
        v_updates[append_dim] = cmeta
        _put_coord_chunks(
            store, coord_arr, combined, old_len, coord_cs, coord_comp, 3
        )
        for name, meta in v_updates.items():
            store.put(f"{name}/zarr.json", json.dumps(meta).encode())
        root_raw = store.get("zarr.json")
        if root_raw is not None:
            root = json.loads(root_raw)
            cons = root.get("consolidated_metadata") or {}
            if isinstance(cons.get("metadata"), dict):
                cons["metadata"].update(v_updates)
                store.put("zarr.json", json.dumps(root).encode())

    return {
        "path": path,
        "shape": new_shape,
        "appended": int(len(new_ap)),
        "chunks_written": len(stats),
        "bytes": int(sum(r["nbytes"] for r in stats)),
        "cells": int(sum(r["cells"] for r in stats)),
    }


def zarr_ingest_sink(
    path: str,
    append_dim: str,
    value_col: str = "value",
    dims: tuple[str, ...] | None = None,
    chunks: tuple[int, ...] | None = None,
    storage_options: dict | None = None,
    **write_kwargs,
) -> "Any":
    """Structured-Streaming bridge: a ``foreachBatch`` function that
    lands each micro-batch in a zarr store — the streaming ingest
    counterpart of ``append_zarr``. The first batch CREATES the store
    (:func:`write_zarr`, forwarding ``chunks``/``write_kwargs``);
    every later batch appends along ``append_dim``.

    Exactly-once on top of foreachBatch's at-least-once: the append
    contract (coordinates strictly beyond the store's max) doubles as
    a high-watermark. A REDELIVERED batch — every coordinate ≤ the
    stored max — is recognized and skipped idempotently; a batch that
    OVERLAPS the watermark without being a pure redelivery raises
    (out-of-order ingest would need reprocessing, not silent
    repainting). Use with ``writeStream.foreachBatch(...)`` and an
    event-time-ordered source (e.g. a watermarked, windowed
    aggregation emitting closed windows in order).
    """

    marker = ".ingest_incomplete"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store = ByteStore.for_path(path, storage_options)
        exists = (
            store.get(".zgroup") is not None
            or store.get("zarr.json") is not None
        )
        if not exists or store.get(marker) is not None:
            # CREATE (or resume a half-finished create): write_zarr
            # flips metadata FIRST, so without the marker a crash
            # between its metadata and its chunk job would make a
            # redelivered first batch look like a pure redelivery and
            # be skipped — permanently losing the unwritten chunks.
            # The marker brackets the create: wipe, mark, write,
            # unmark; any redelivery that still sees the marker redoes
            # the create idempotently.
            #
            # Wipe ONLY what we own: a resumed half-create (marker
            # present) or an empty/absent destination. A populated
            # directory with neither zarr metadata nor our marker is
            # someone else's data at a mistyped path — refuse rather
            # than rmtree it (write_zarr itself only overwrites
            # confirmed zarr stores, and this path must not be more
            # destructive than the batch sink it wraps).
            if store.get(marker) is None:
                try:
                    children = store.list_prefix()
                except (NotImplementedError, FileNotFoundError, OSError):
                    children = []
                if children:
                    raise ValueError(
                        f"zarr_ingest_sink: destination {path!r} exists "
                        "and is not a zarr store (no .zgroup/zarr.json) "
                        "— refusing to delete unrecognized content; "
                        "point the sink at an empty path or remove the "
                        "directory yourself"
                    )
            store.delete_prefix()
            store.put(marker, b"1")
            write_zarr(
                batch_df,
                path,
                value_col=value_col,
                dims=dims,
                chunks=chunks,
                storage_options=storage_options,
                **write_kwargs,
            )
            store.delete_prefix(marker)
            return
        from cae_polars_tools_spark.sources.zarr_store import ZarrStore

        group = ZarrStore(
            path, storage_options=storage_options
        ).open_zarr_group()
        axis = np.asarray(group.get_array(append_dim)[slice(None)])
        hi = (
            batch_df.agg(
                F.max(append_dim).alias("hi"), F.min(append_dim).alias("lo")
            ).collect()[0]
        )
        if len(axis) and hi["hi"] <= axis.max():
            return  # pure redelivery below the high-watermark: skip
        if len(axis) and hi["lo"] <= axis.max():
            raise ValueError(
                f"zarr_ingest_sink: batch {batch_id} straddles the "
                f"store's {append_dim!r} high-watermark "
                f"({axis.max()!r}) — neither a redelivery nor a clean "
                "append"
            )
        append_zarr(
            batch_df,
            path,
            append_dim=append_dim,
            value_col=value_col,
            storage_options=storage_options,
        )

    return ingest

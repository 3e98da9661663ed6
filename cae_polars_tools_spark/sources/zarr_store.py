"""High-level read-only Zarr store handle.

Spark-side equivalent of the reference's ``S3ZarrStore``
(zarr_storage.py:97-416): opens a store (local path, or s3://… /
http://… via optional fsspec), handles consolidated-metadata
fast-open with graceful fallback, caches handles, lists arrays, and
produces per-array metadata dicts. All driver-side planning — no
Spark imports here so executors can reuse it too.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

import numpy as np

from cae_polars_tools_spark.sources.zarr_format import (
    ZarrV2Array,
    ZarrV2Group,
    open_group,
)


class ZarrStore:
    """Read-only handle to a zarr v2 store (+ optional subgroup).

    Parameters mirror the reference (zarr_storage.py:140-188):
    ``storage_options`` passes fsspec credentials (key/secret/token/
    anon/region_name…); ``group`` navigates to a subgroup;
    ``consolidated`` True forces consolidated metadata, None
    auto-detects with fallback, False skips it.
    """

    def __init__(
        self,
        store_path: str,
        storage_options: dict | None = None,
        group: str | None = None,
        consolidated: bool | None = None,
    ):
        self.store_path = store_path
        self.storage_options = storage_options or {}
        self.group = group
        self.consolidated = consolidated
        self._group_handle: ZarrV2Group | None = None

    # -- open / cache ------------------------------------------------------
    def open_zarr_group(self) -> ZarrV2Group:
        """Open (and cache) the group handle; consolidated-metadata
        attempt with fallback ladder, failures wrapped in ValueError
        (reference zarr_storage.py:213-283)."""
        if self._group_handle is None:
            try:
                self._group_handle = open_group(
                    self.store_path,
                    storage_options=self.storage_options,
                    group=self.group,
                    consolidated=self.consolidated,
                )
            except ValueError:
                raise
            except Exception as e:
                raise ValueError(
                    f"failed to open zarr store at {self.store_path!r}: {e}"
                ) from e
        return self._group_handle

    # -- enumeration -------------------------------------------------------
    def list_arrays(self) -> list[str]:
        """Names of members that are arrays (have shape+dtype); subgroups
        and unreadable members are skipped (zarr_storage.py:285-325)."""
        return self.open_zarr_group().array_names()

    def get_array(self, array_name: str) -> ZarrV2Array:
        """Lazy array handle; KeyError when missing
        (zarr_storage.py:327-360)."""
        return self.open_zarr_group().get_array(array_name)

    def get_array_info(self, array_name: str) -> dict[str, Any]:
        """Per-array metadata dict (zarr_storage.py:362-416)."""
        arr = self.get_array(array_name)
        dims = arr.attrs.get(
            "_ARRAY_DIMENSIONS", [f"dim_{i}" for i in range(arr.ndim)]
        )
        return {
            "name": array_name,
            "shape": tuple(arr.shape),
            "dtype": str(arr.dtype),
            "chunks": tuple(arr.chunks),
            "dimensions": list(dims),
            "fill_value": arr.fill_value,
            "compressor": arr.compressor,
            "filters": arr.filters,
            "attributes": {
                k: v for k, v in arr.attrs.items() if k != "_ARRAY_DIMENSIONS"
            },
            "size_bytes": int(arr.size) * arr.dtype.itemsize,
            # v3 sharded arrays: `chunks` above is the INNER chunk shape
            # (read/pruning granularity); this is the stored-object shape
            **(
                {"shard_chunks": tuple(arr.shard_chunks)}
                if getattr(arr, "shard_chunks", None) is not None
                else {}
            ),
        }


def group_meta_etag(group: ZarrV2Group) -> str:
    """Fingerprint of a group's metadata. Carried in every ScanPlan and
    keyed into the executor group cache so an in-place change at a
    reused path (``append_zarr`` growing the shape, ``write_zarr``
    overwriting — its attrs carry a per-write generation nonce) forces
    long-lived reused Python workers to re-open instead of serving the
    stale handle.

    With consolidated metadata the whole document (plus group attrs)
    hashes with ZERO extra I/O; otherwise the array walk runs — and a
    store that cannot enumerate (plain HTTP without .zmetadata)
    degrades to the empty etag, i.e. exactly the pre-etag caching
    behavior instead of a new failure mode on a previously working
    scan path. Metadata only — no chunk bytes are hashed."""
    import hashlib
    import json as _json

    try:
        attrs = _json.dumps(group.attrs, sort_keys=True, default=str)
        if group.consolidated is not None:
            doc = _json.dumps(
                group.consolidated, sort_keys=True, default=str
            )
            return hashlib.md5((doc + attrs).encode()).hexdigest()
        parts = [attrs]
        for name in sorted(group.array_names()):
            a = group.get_array(name)
            parts.append(
                f"{name}:{a.shape}:{a.chunks}:{a.dtype.str}:"
                f"{_json.dumps(a.attrs, sort_keys=True, default=str)}"
            )
        return hashlib.md5("|".join(parts).encode()).hexdigest()
    except Exception:
        return ""


@lru_cache(maxsize=32)
def _cached_group(
    store_path: str,
    storage_options_json: str,
    group: str | None,
    consolidated: bool | None,
    meta_etag: str,
) -> ZarrV2Group:
    import json

    return open_group(
        store_path,
        storage_options=json.loads(storage_options_json),
        group=group,
        consolidated=consolidated,
    )


def executor_group(
    store_path: str,
    storage_options: dict | None,
    group: str | None,
    consolidated: bool | None,
    meta_etag: str = "",
) -> ZarrV2Group:
    """Per-process cached group handle for Spark executors — each
    executor opens store metadata once, not once per partition
    (the functional version of the reference's handle caching,
    zarr_storage.py:209-240).

    The cache key is canonical JSON, not a sorted item tuple: fsspec
    storage options routinely NEST dicts (``client_kwargs={...}``),
    which are unhashable and crashed every executor task for exactly
    the documented remote-credentials use case."""
    import json

    key = json.dumps(storage_options or {}, sort_keys=True, default=str)
    return _cached_group(store_path, key, group, consolidated, meta_etag)


def spark_type_for_dtype(dtype: np.dtype):
    """numpy dtype → Spark type, with documented widenings for types
    Spark lacks (SURVEY §7.3): uint8→short, uint16→int, uint32→long,
    float16→float; uint64 and others raise."""
    from pyspark.sql import types as T

    dt = np.dtype(dtype)
    mapping = {
        "int8": T.ByteType(),
        "int16": T.ShortType(),
        "int32": T.IntegerType(),
        "int64": T.LongType(),
        "uint8": T.ShortType(),
        "uint16": T.IntegerType(),
        "uint32": T.LongType(),
        "float16": T.FloatType(),
        "float32": T.FloatType(),
        "float64": T.DoubleType(),
        "bool": T.BooleanType(),
    }
    if dt.name in mapping:
        return mapping[dt.name]
    if dt.kind == "M":  # datetime64
        return T.TimestampNTZType()
    raise ValueError(
        f"zarr dtype {dt} has no supported Spark mapping "
        "(uint64/complex/object are unsupported)"
    )


def widen_numpy(arr: np.ndarray) -> np.ndarray:
    """Apply the same widenings on the data itself so Arrow batches
    match the declared Spark schema."""
    dt = arr.dtype
    if dt == np.uint8:
        return arr.astype(np.int16)
    if dt == np.uint16:
        return arr.astype(np.int32)
    if dt == np.uint32:
        return arr.astype(np.int64)
    if dt == np.float16:
        return arr.astype(np.float32)
    if dt.kind == "M":
        return arr.astype("datetime64[us]")
    return arr

"""NetCDF-3 (classic) source: the OTHER standard climate-data format.

The reference's domain is climate/CAE arrays; its storage layer reads
zarr. NetCDF classic is the same domain's legacy interchange format
and — unlike NetCDF-4/HDF5 — is a SIMPLE flat binary layout
(CDF magic, dim/attr/var header, contiguous big-endian data), so it is
hand-parseable the way the codecs in ``operators/`` are. This module
scans a variable into the SAME long format as the zarr path (one
column per dimension from the CF coordinate variables, integer indices
when absent, plus ``value``), with the same partition-window execution
model: one Spark partition per flat row window, each reading only its
own byte ranges.

Format support (the classic spec family — CDF-1, CDF-2/64-bit-offset
and CDF-5/64-bit-data as produced by pnetcdf): dimensions incl. the
record (unlimited) dimension, attributes (parsed and exposed; values
skipped correctly), fixed and record variables, the six classic
external types plus CDF-5's NC_UBYTE/USHORT/UINT/INT64/UINT64 (the
unsigned types widen through the zarr path's documented mapping;
uint64 has no Spark type and refuses loudly at scan). The only
refused container is NetCDF-4/HDF5 (magic ``\\x89HDF``) —
``NotImplementedError``.

Selection: ``select_dims`` with int (drops the dimension) / slice /
list — resolved driver-side into per-dimension position arrays, so an
executor window gathers exactly its selected cells (the read span per
window covers min..max of its source offsets; a highly-sparse inner
selection still reads the covering span — the zarr path with real
chunking is the scale answer for that shape).

Scale notes: the header and 1-D coordinate variables load on the
DRIVER (bounded by axis lengths, like the zarr plan); executors open
the file independently and seek — no driver data motion. Local paths
(and file:// URIs) only; remote object stores should mount or use the
zarr path (fsspec seam documented).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Any, Iterator

import numpy as np

from cae_polars_tools_spark.sources.zarr_store import (
    spark_type_for_dtype,
    widen_numpy,
)

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

_NC_DTYPES = {
    1: np.dtype(">i1"),  # NC_BYTE
    2: np.dtype("S1"),   # NC_CHAR
    3: np.dtype(">i2"),  # NC_SHORT
    4: np.dtype(">i4"),  # NC_INT
    5: np.dtype(">f4"),  # NC_FLOAT
    6: np.dtype(">f8"),  # NC_DOUBLE
    # CDF-5 (64-bit-data) additions
    7: np.dtype(">u1"),  # NC_UBYTE
    8: np.dtype(">u2"),  # NC_USHORT
    9: np.dtype(">u4"),  # NC_UINT
    10: np.dtype(">i8"),  # NC_INT64
    11: np.dtype(">u8"),  # NC_UINT64
}


@dataclass
class NcVar:
    name: str
    dim_ids: tuple[int, ...]
    nc_type: int
    vsize: int
    begin: int
    attrs: dict


@dataclass
class NcMeta:
    path: str
    version: int
    numrecs: int
    dim_names: list[str]
    dim_sizes: list[int]  # record dim stored as its actual numrecs
    record_dim: int | None
    attrs: dict
    vars: dict[str, NcVar]
    recsize: int  # bytes per record across all record variables


class _Cursor:
    def __init__(self, data: bytes, wide: bool = False) -> None:
        self.d = data
        self.p = 0
        # CDF-5: every NON_NEG field (list/name/attr counts, dim
        # sizes, ndims, DIMENSION IDS, vsize) widens to 64 bits —
        # dimid is NON_NEG in the classic grammar, so it widens too;
        # only tags and nc_type ids stay 32-bit per the pnetcdf spec
        self.wide = wide

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.d, self.p)
        self.p += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.d, self.p)
        self.p += 8
        return v

    def nn(self) -> int:
        """One NON_NEG field at this format version's width."""
        return self.u64() if self.wide else self.u32()

    def name(self) -> str:
        n = self.nn()
        s = self.d[self.p : self.p + n].decode("utf-8")
        self.p += n + ((-n) % 4)  # names pad to 4-byte boundaries
        return s

    def skip_values(self, nc_type: int, count: int) -> Any:
        if nc_type not in _NC_DTYPES:
            # hostile-bytes guard: an unknown type id must surface as
            # the parser's documented ValueError, not a KeyError
            raise ValueError(f"bad netCDF attribute type {nc_type}")
        size = _NC_DTYPES[nc_type].itemsize
        total = size * count
        raw = self.d[self.p : self.p + total]
        self.p += total + ((-total) % 4)
        if nc_type == 2:
            return raw.decode("utf-8", "replace")
        return np.frombuffer(raw, dtype=_NC_DTYPES[nc_type]).tolist()


def _parse_attrs(c: _Cursor) -> dict:
    tag = c.u32()
    n = c.nn()
    if tag == 0 and n == 0:
        return {}
    if tag != _NC_ATTRIBUTE:
        raise ValueError(f"bad netCDF attribute list tag {tag}")
    out = {}
    for _ in range(n):
        name = c.name()
        nc_type = c.u32()
        count = c.nn()
        out[name] = c.skip_values(nc_type, count)
    return out


def parse_netcdf3(path: str) -> NcMeta:
    """Parse a classic netCDF header (the whole header region; data
    stays on disk). Raises ValueError for non-netCDF bytes and
    NotImplementedError for NetCDF-4/HDF5 files."""
    if path.startswith("file://"):
        path = path[len("file://"):]
    # read the HEADER region only, growing on demand — never the whole
    # file (a 100 GB dataset's header is still kilobytes; reading the
    # data region onto the driver would break the scale contract)
    head = b""
    with open(path, "rb") as fh:
        for size in (1 << 20, 1 << 24, 1 << 28):
            fh.seek(0)
            head = fh.read(size)
            try:
                return _parse_netcdf3_header(head, path)
            except (struct.error, IndexError):
                if len(head) < size:  # whole file read and still bad
                    raise ValueError("truncated or corrupt netCDF header")
    raise ValueError("netCDF header exceeds 256 MB — corrupt file?")


def _parse_netcdf3_header(head: bytes, path: str) -> NcMeta:
    if head[:4] == b"\x89HDF":
        raise NotImplementedError(
            "NetCDF-4 files are HDF5 containers — out of hand-parse "
            "scope (convert to classic or zarr)"
        )
    if head[:3] != b"CDF" or head[3] not in (1, 2, 5):
        raise ValueError("not a netCDF classic payload")
    version = head[3]
    wide = version == 5
    c = _Cursor(head, wide=wide)
    c.p = 4
    numrecs = c.nn()
    streaming = numrecs == (0xFFFFFFFFFFFFFFFF if wide else 0xFFFFFFFF)

    tag = c.u32()
    n = c.nn()
    dim_names: list[str] = []
    dim_sizes: list[int] = []
    record_dim = None
    if tag == _NC_DIMENSION:
        for i in range(n):
            dim_names.append(c.name())
            size = c.nn()
            if size == 0:
                record_dim = i
            dim_sizes.append(size)
    elif not (tag == 0 and n == 0):
        raise ValueError(f"bad netCDF dimension list tag {tag}")

    gatts = _parse_attrs(c)

    tag = c.u32()
    n = c.nn()
    vars_: dict[str, NcVar] = {}
    order: list[NcVar] = []
    if tag == _NC_VARIABLE:
        for _ in range(n):
            name = c.name()
            ndims = c.nn()
            dids = tuple(c.nn() for _ in range(ndims))
            vatts = _parse_attrs(c)
            nc_type = c.u32()
            if nc_type not in _NC_DTYPES:
                raise ValueError(f"bad netCDF type {nc_type} for {name!r}")
            vsize = c.nn()
            begin = c.u64() if version in (2, 5) else c.u32()
            v = NcVar(name, dids, nc_type, vsize, begin, vatts)
            vars_[name] = v
            order.append(v)
    elif not (tag == 0 and n == 0):
        raise ValueError(f"bad netCDF variable list tag {tag}")

    rec_vars = [
        v for v in order if record_dim is not None and v.dim_ids[:1] == (record_dim,)
    ]
    # per the spec, vsize of each record variable is its per-record
    # slab (padded to 4); recsize is their sum — EXCEPT with exactly
    # one record variable, where no padding applies
    if len(rec_vars) == 1:
        v = rec_vars[0]
        inner = 1
        for d in v.dim_ids[1:]:
            inner *= dim_sizes[d]
        recsize = inner * _NC_DTYPES[v.nc_type].itemsize
    else:
        recsize = sum(v.vsize for v in rec_vars)

    if record_dim is not None:
        if streaming or numrecs == 0:
            if rec_vars and recsize:
                first = min(v.begin for v in rec_vars)
                numrecs = max(0, (os.path.getsize(path) - first) // recsize)
            else:
                numrecs = 0
        dim_sizes[record_dim] = int(numrecs)

    return NcMeta(
        path=path,
        version=version,
        numrecs=int(numrecs),
        dim_names=dim_names,
        dim_sizes=dim_sizes,
        record_dim=record_dim,
        attrs=gatts,
        vars=vars_,
        recsize=recsize,
    )


def netcdf3_info(path: str) -> dict:
    """Store-info view (the ``get_zarr_data_info`` analogue): dims,
    per-variable shape/dtype, global attributes."""
    m = parse_netcdf3(path)
    return {
        "format": f"netcdf3-cdf{m.version}",
        "dimensions": dict(zip(m.dim_names, m.dim_sizes)),
        "record_dimension": (
            m.dim_names[m.record_dim] if m.record_dim is not None else None
        ),
        "attributes": m.attrs,
        "variables": {
            name: {
                "dims": [m.dim_names[d] for d in v.dim_ids],
                "shape": [m.dim_sizes[d] for d in v.dim_ids],
                "dtype": _NC_DTYPES[v.nc_type].newbyteorder("=").name
                if v.nc_type != 2
                else "char",
            }
            for name, v in m.vars.items()
        },
    }


def _positions(sel: Any, n: int, dim: str) -> tuple[np.ndarray, bool]:
    """Resolve one dimension's selection → (source positions, drop)."""
    if sel is None:
        return np.arange(n, dtype=np.int64), False
    if isinstance(sel, int):
        if not -n <= sel < n:
            raise IndexError(f"index {sel} out of bounds for dim {dim!r}")
        return np.array([sel % n], dtype=np.int64), True
    if isinstance(sel, slice):
        return np.arange(n, dtype=np.int64)[sel], False
    arr = np.asarray(list(sel), dtype=np.int64)
    if arr.size and (arr.min() < -n or arr.max() >= n):
        raise IndexError(f"index list out of bounds for dim {dim!r}")
    return arr % n, False


def _read_var_window(
    meta: NcMeta,
    var: NcVar,
    pos: list[np.ndarray],
    start: int,
    end: int,
) -> np.ndarray:
    """Read flat-selected cells [start, end) of ``var``: map each
    selected cell to its source flat index, read the covering byte
    span(s), gather. Record variables group by record (their slabs
    are strided by recsize)."""
    dtype = _NC_DTYPES[var.nc_type]
    item = dtype.itemsize
    sel_shape = [len(p) for p in pos]
    flat = np.arange(start, end, dtype=np.int64)
    idx = []
    rem = flat
    for d in range(len(sel_shape) - 1, -1, -1):
        idx.append(pos[d][rem % sel_shape[d]])
        rem = rem // sel_shape[d]
    idx.reverse()  # per-dim SOURCE positions for each output row

    shape = [meta.dim_sizes[d] for d in var.dim_ids]
    is_record = meta.record_dim is not None and var.dim_ids[:1] == (
        meta.record_dim,
    )
    with open(meta.path, "rb") as fh:
        if not is_record:
            strides = np.ones(len(shape), dtype=np.int64)
            for d in range(len(shape) - 2, -1, -1):
                strides[d] = strides[d + 1] * shape[d + 1]
            src = np.zeros(len(flat), dtype=np.int64)
            for d in range(len(shape)):
                src += idx[d] * strides[d]
            if len(src) == 0:
                return np.empty(0, dtype=dtype.newbyteorder("="))
            lo, hi = int(src.min()), int(src.max())
            fh.seek(var.begin + lo * item)
            buf = fh.read((hi - lo + 1) * item)
            arr = np.frombuffer(buf, dtype=dtype)
            return widen_nc(arr[src - lo])
        # record variable: inner flat index within the record + rec id
        inner_shape = shape[1:]
        strides = np.ones(len(inner_shape), dtype=np.int64)
        for d in range(len(inner_shape) - 2, -1, -1):
            strides[d] = strides[d + 1] * inner_shape[d + 1]
        inner = np.zeros(len(flat), dtype=np.int64)
        for d in range(len(inner_shape)):
            inner += idx[d + 1] * strides[d]
        recs = idx[0]
        out = np.empty(len(flat), dtype=dtype.newbyteorder("="))
        # flat order makes records contiguous runs — one read per run
        if len(flat):
            boundaries = np.flatnonzero(np.diff(recs)) + 1
            starts = np.concatenate([[0], boundaries])
            ends = np.concatenate([boundaries, [len(flat)]])
            for s, e in zip(starts, ends):
                rec = int(recs[s])
                seg = inner[s:e]
                lo, hi = int(seg.min()), int(seg.max())
                fh.seek(var.begin + rec * meta.recsize + lo * item)
                buf = fh.read((hi - lo + 1) * item)
                arr = np.frombuffer(buf, dtype=dtype)
                out[s:e] = arr[seg - lo]
        return widen_nc(out)


def widen_nc(arr: np.ndarray) -> np.ndarray:
    """Native byte order (Spark/Arrow want little-endian) — the
    classic format stores big-endian."""
    return np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("=")))


@dataclass
class NcScanPlan:
    """Everything an executor needs to read its window independently
    (the netCDF twin of the zarr ``ScanPlan``); plain picklable data."""

    meta: NcMeta
    var_name: str
    dims: list[str]
    keep: list[bool]
    pos: list[np.ndarray]
    coords: dict[str, np.ndarray]
    sel_shape: list[int]
    total: int


def _check_var_extent(meta: NcMeta, var: NcVar) -> None:
    """Sanity-check a variable's header-claimed extent against the
    actual file size BEFORE any allocation sized by it — a corrupt
    header claiming a 10^12-element axis must fail here, not OOM the
    driver materializing coordinates."""
    size = os.path.getsize(meta.path)
    item = _NC_DTYPES[var.nc_type].itemsize
    shape = [meta.dim_sizes[d] for d in var.dim_ids]
    is_record = meta.record_dim is not None and var.dim_ids[:1] == (
        meta.record_dim,
    )
    if is_record:
        inner = 1
        for d in var.dim_ids[1:]:
            inner *= meta.dim_sizes[d]
        need = var.begin + max(0, meta.numrecs - 1) * meta.recsize + (
            inner * item if meta.numrecs else 0
        )
    else:
        n = 1
        for d in shape:
            n *= d
        need = var.begin + n * item
    if need > size:
        raise ValueError(
            f"netCDF variable {var.name!r} claims {need} bytes but the "
            f"file holds {size} — truncated or corrupt header"
        )


def plan_nc_scan(
    path: str,
    var_name: str,
    select_dims: dict[str, Any] | None = None,
) -> NcScanPlan:
    """Driver-side planning: parse the header, resolve the selection
    into per-dimension position arrays, load the (bounded) coordinate
    variables for surviving dims."""
    meta = parse_netcdf3(path)
    if var_name not in meta.vars:
        raise KeyError(
            f"variable {var_name!r} not in {sorted(meta.vars)}"
        )
    var = meta.vars[var_name]
    _check_var_extent(meta, var)
    dims = [meta.dim_names[d] for d in var.dim_ids]
    shape = [meta.dim_sizes[d] for d in var.dim_ids]
    select_dims = dict(select_dims or {})
    unknown = set(select_dims) - set(dims)
    if unknown:
        raise KeyError(f"select_dims names unknown dims {sorted(unknown)}")

    pos: list[np.ndarray] = []
    keep: list[bool] = []
    for dim, n in zip(dims, shape):
        p, drop = _positions(select_dims.get(dim), n, dim)
        pos.append(p)
        keep.append(not drop)

    # driver-side coordinate values for surviving dims (bounded by
    # axis length, exactly like the zarr plan)
    coords: dict[str, np.ndarray] = {}
    for di, dim in enumerate(dims):
        if not keep[di]:
            continue
        cvar = meta.vars.get(dim)
        if cvar is not None and len(cvar.dim_ids) == 1 and cvar.nc_type != 2:
            _check_var_extent(meta, cvar)
            full = _read_var_window(
                meta, cvar, [np.arange(meta.dim_sizes[cvar.dim_ids[0]])],
                0, meta.dim_sizes[cvar.dim_ids[0]],
            )
            coords[dim] = full[pos[di]]
        else:
            coords[dim] = pos[di].copy()

    sel_shape = [len(p) for p in pos]
    total = 1
    for s in sel_shape:
        total *= s
    return NcScanPlan(
        meta=meta, var_name=var_name, dims=dims, keep=keep, pos=pos,
        coords=coords, sel_shape=sel_shape, total=total,
    )


def refine_nc_plan(plan: NcScanPlan, masks: dict[str, np.ndarray]) -> NcScanPlan:
    """Compose per-dimension boolean masks (over the already-selected
    coordinate VALUES) into a narrower plan — the netCDF twin of the
    zarr ``refine_plan``: surviving positions shrink, so executors
    read fewer / narrower byte spans (``_read_var_window`` sizes every
    read from the position extents)."""
    import math

    pos = list(plan.pos)
    coords = dict(plan.coords)
    di_by_dim = {dim: i for i, dim in enumerate(plan.dims)}
    for dim, m in masks.items():
        di = di_by_dim[dim]
        pos[di] = pos[di][m]
        coords[dim] = coords[dim][m]
    sel_shape = [len(p) for p in pos]
    return NcScanPlan(
        meta=plan.meta,
        var_name=plan.var_name,
        dims=plan.dims,
        keep=plan.keep,
        pos=pos,
        coords=coords,
        sel_shape=sel_shape,
        total=math.prod(sel_shape),
    )


def nc_schema_for_plan(plan: NcScanPlan):
    from pyspark.sql import types as T

    fields = []
    for di, dim in enumerate(plan.dims):
        if plan.keep[di]:
            fields.append(
                T.StructField(
                    dim,
                    spark_type_for_dtype(
                        widen_numpy(plan.coords[dim]).dtype
                    ),
                    False,
                )
            )
    var = plan.meta.vars[plan.var_name]
    value_np = _NC_DTYPES[var.nc_type].newbyteorder("=")
    fields.append(T.StructField("value", spark_type_for_dtype(value_np), True))
    return T.StructType(fields)


def nc_window_to_arrow(plan: NcScanPlan, s: int, e: int):
    """One flat window [s, e) → a pyarrow RecordBatch (runs on the
    executor that owns the window)."""
    import pyarrow as pa

    var = plan.meta.vars[plan.var_name]
    vals = _read_var_window(plan.meta, var, plan.pos, s, e)
    flat = np.arange(s, e, dtype=np.int64)
    cols = {}
    rem = flat
    per_dim = []
    for d in range(len(plan.sel_shape) - 1, -1, -1):
        per_dim.append(rem % plan.sel_shape[d])
        rem = rem // plan.sel_shape[d]
    per_dim.reverse()
    names = []
    for di, dim in enumerate(plan.dims):
        if plan.keep[di]:
            cols[dim] = widen_numpy(plan.coords[dim][per_dim[di]])
            names.append(dim)
    cols["value"] = widen_numpy(vals)
    names.append("value")
    return pa.record_batch([pa.array(cols[n]) for n in names], names=names)


def scan_netcdf3(
    spark,
    path: str,
    var_name: str,
    select_dims: dict[str, Any] | None = None,
    chunk_size: int = 2_000_000,
):
    """Scan one netCDF-3 variable → long-format DataFrame (the
    ``scan_data`` analogue): a column per surviving dimension — values
    from the CF coordinate variable of the same name when present,
    integer indices otherwise — plus ``value``. One Spark partition
    per ``chunk_size``-row flat window; every partition opens the file
    itself and reads only its covering byte spans."""
    plan = plan_nc_scan(path, var_name, select_dims)
    schema = nc_schema_for_plan(plan)
    n_parts = max(1, -(-plan.total // chunk_size))
    ranges = [
        (i * chunk_size, min((i + 1) * chunk_size, plan.total))
        for i in range(n_parts)
    ]

    def gen(batch_iter) -> Iterator:
        for batch in batch_iter:
            for pid in batch.column("id").to_pylist():
                s, e = ranges[pid]
                yield nc_window_to_arrow(plan, s, e)

    seed = spark.range(0, n_parts, 1, numPartitions=n_parts)
    return seed.mapInArrow(gen, schema)


# ---------------------------------------------------------------------------
# spark.read.format("netcdf3") — Python Data Source (Spark >= 4.0)
# ---------------------------------------------------------------------------


class _NcPartition:
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


def _nc_decode_select(spec):
    if spec is None:
        return None
    import json as _json

    if isinstance(spec, str):
        spec = _json.loads(spec)
    out = {}
    for dim, sel in spec.items():
        if isinstance(sel, dict):
            out[dim] = slice(
                sel.get("start"), sel.get("stop"), sel.get("step")
            )
        else:
            out[dim] = sel
    return out


def make_netcdf3_datasource(pushdown: bool = True):
    """Build the DataSource class lazily (the datasource API needs
    Spark >= 4.0; importing it at module import time would couple the
    plain scan path to it). ``pushdown=False`` builds the degraded
    variant for sessions where ``spark.sql.python.filterPushdown.
    enabled`` is false — Spark refuses to initialize a reader that
    merely HAS a ``pushFilters`` attribute under that conf (the same
    split as the zarr source's two reader variants)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class NcWindowPartition(InputPartition):
        def __init__(self, start: int, end: int) -> None:
            self.start = start
            self.end = end

    class _NcReaderCore(DataSourceReader):
        def __init__(self, plan: NcScanPlan, chunk_size: int) -> None:
            self._plan = plan
            self._chunk = chunk_size

        def partitions(self):
            n = max(1, -(-self._plan.total // self._chunk))
            return [
                NcWindowPartition(
                    i * self._chunk,
                    min((i + 1) * self._chunk, self._plan.total),
                )
                for i in range(n)
            ]

        def read(self, partition):
            yield nc_window_to_arrow(
                self._plan, partition.start, partition.end
            )

    class NetCDF3Reader(_NcReaderCore):
        def pushFilters(self, filters):
            """WHERE → byte-span pruning, mirroring the zarr source's
            ``ZarrScanReader.pushFilters``: a predicate on a dimension
            column is exactly a positional selection (the column's
            values ARE the selected coordinate array, driver-resident
            and bounded by axis length), so supported comparisons
            become position masks composed into the plan —
            ``_read_var_window`` then reads only the byte spans the
            surviving positions cover, and the filter is fully
            consumed. Filters on ``value`` or of unsupported shapes
            are yielded back for post-scan evaluation."""
            from pyspark.sql.datasource import (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                In,
                IsNotNull,
                LessThan,
                LessThanOrEqual,
            )

            masks: dict[str, np.ndarray] = {}
            for f in filters:
                attr = getattr(f, "attribute", ())
                dim = attr[0] if len(attr) == 1 else None
                if dim not in self._plan.coords:
                    yield f
                    continue
                if isinstance(f, IsNotNull):
                    continue  # dim columns are never null — satisfied
                vals = self._plan.coords[dim]
                if isinstance(f, EqualTo):
                    m = vals == f.value
                elif isinstance(f, GreaterThan):
                    m = vals > f.value
                elif isinstance(f, GreaterThanOrEqual):
                    m = vals >= f.value
                elif isinstance(f, LessThan):
                    m = vals < f.value
                elif isinstance(f, LessThanOrEqual):
                    m = vals <= f.value
                elif isinstance(f, In):
                    m = np.isin(vals, list(f.value))
                else:
                    yield f
                    continue
                masks[dim] = masks[dim] & m if dim in masks else m
            if masks:
                self._plan = refine_nc_plan(self._plan, masks)

    reader_cls = NetCDF3Reader if pushdown else _NcReaderCore

    class NetCDF3DataSource(DataSource):
        """``spark.read.format("netcdf3").option("variable", V)
        .load(path)`` — options: ``variable`` (required),
        ``select_dims`` (JSON, same grammar as the zarr source),
        ``chunk_size``."""

        @classmethod
        def name(cls) -> str:
            return "netcdf3"

        def _plan(self) -> NcScanPlan:
            path = self.options.get("path")
            var = self.options.get("variable")
            if not path or not var:
                raise ValueError(
                    "netcdf3 data source requires .load(<file>) and "
                    ".option('variable', <name>)"
                )
            cached = getattr(self, "_plan_cache", None)
            if cached is None:
                cached = plan_nc_scan(
                    path,
                    var,
                    _nc_decode_select(self.options.get("select_dims")),
                )
                self._plan_cache = cached
            return cached

        def schema(self):
            return nc_schema_for_plan(self._plan())

        def reader(self, schema):
            return reader_cls(
                self._plan(),
                int(self.options.get("chunk_size", 2_000_000)),
            )

    # distinct class names so the per-session registration cache can
    # tell the variants apart (register_cached keys on __name__)
    if not pushdown:
        NetCDF3DataSource.__name__ = "NetCDF3DataSourceNoPushdown"
        NetCDF3DataSource.__qualname__ = "NetCDF3DataSourceNoPushdown"
    return NetCDF3DataSource


def register_netcdf_source(spark) -> None:
    """Register ``format("netcdf3")`` on the session, picking the
    pushdown-capable reader when ``spark.sql.python.filterPushdown.
    enabled`` is true and the degraded (post-scan filtering) variant
    otherwise — the zarr ``register_zarr_source`` contract."""
    from cae_polars_tools_spark.sources.zarr_scan import (
        PUSHDOWN_CONF,
        register_cached,
    )

    try:
        enabled = str(spark.conf.get(PUSHDOWN_CONF, "false")).lower() == "true"
    except Exception:
        enabled = False
    register_cached(spark, make_netcdf3_datasource(pushdown=enabled))


# ---------------------------------------------------------------------------
# Minimal writer (the sink side): enough to materialize classic files
# for interchange and the demo corpus entry. The READER's correctness
# anchor is the independent in-test writer in tests/test_netcdf3.py,
# not this one.
# ---------------------------------------------------------------------------

_NC_TYPE_OF = {
    np.dtype("int8"): 1,
    np.dtype("int16"): 3,
    np.dtype("int32"): 4,
    np.dtype("float32"): 5,
    np.dtype("float64"): 6,
}

# CDF-5-only external types (rejected at version=1: a classic reader
# has no representation for them)
_NC_TYPE_OF_CDF5 = {
    np.dtype("uint8"): 7,
    np.dtype("uint16"): 8,
    np.dtype("uint32"): 9,
    np.dtype("int64"): 10,
    np.dtype("uint64"): 11,
}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 4)


def _nc_name(s: str, wide: bool = False) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">Q" if wide else ">I", len(raw)) + _pad4(raw)


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
    record_dim: str | None = None,
    version: int = 1,
) -> str:
    """Write a classic netCDF file — CDF-1 by default, ``version=2``
    for 64-bit offsets (datasets whose data region passes 2 GiB), or
    ``version=5`` for the pnetcdf 64-bit-data variant (every NON_NEG
    header field widens to 64 bits, offsets are 64-bit, and the
    int64/unsigned external types become writable): ``dims`` name→size (the
    ``record_dim`` entry's size is taken from the data), ``variables``
    name → (dim names, ndarray). 1-D variables named like a dimension
    act as CF coordinate variables on read. Big-endian on disk, per
    the spec; record variables must lead with the record dimension."""
    if version not in (1, 2, 5):
        raise ValueError("write_netcdf3: version must be 1, 2 or 5")
    wide = version == 5
    nnf = ">Q" if wide else ">I"
    type_of = dict(_NC_TYPE_OF)
    if wide:
        type_of.update(_NC_TYPE_OF_CDF5)
    dim_names = list(dims)
    dim_idx = {d: i for i, d in enumerate(dim_names)}
    numrecs = 0
    if record_dim is not None:
        for _name, (vdims, data) in variables.items():
            if vdims[:1] == (record_dim,):
                numrecs = max(numrecs, data.shape[0])

    order = list(variables.items())
    fixed = [
        (n, v) for n, v in order if record_dim is None or v[0][:1] != (record_dim,)
    ]
    rec = [(n, v) for n, v in order if (n, v) not in fixed]

    entries = []
    for name, (vdims, data) in fixed + rec:
        arr = np.ascontiguousarray(data)
        if arr.dtype not in type_of:
            raise ValueError(
                f"unsupported dtype {arr.dtype} for {name!r}"
                + (" (CDF-5-only type; pass version=5)"
                   if arr.dtype in _NC_TYPE_OF_CDF5 else "")
            )
        nc_type = type_of[arr.dtype]
        item = _NC_DTYPES[nc_type].itemsize
        is_rec = record_dim is not None and vdims[:1] == (record_dim,)
        slab_shape = arr.shape[1:] if is_rec else arr.shape
        slab = int(np.prod(slab_shape)) * item if slab_shape else item
        vsize = slab + ((-slab) % 4)
        entries.append((name, vdims, arr, nc_type, vsize, is_rec))

    # header size with placeholder begins (u32 offsets for CDF-1;
    # CDF-5 widens every NON_NEG — including dimension ids — and the
    # begin offsets to 64 bits; only tags and nc_type ids stay 32-bit)
    def header(begins: list[int]) -> bytes:
        out = bytearray(b"CDF" + bytes([version]))
        out += struct.pack(nnf, numrecs)
        out += struct.pack(">I", _NC_DIMENSION)
        out += struct.pack(nnf, len(dim_names))
        for d in dim_names:
            out += _nc_name(d, wide)
            out += struct.pack(
                nnf, 0 if d == record_dim else int(dims[d])
            )
        out += struct.pack(">I", 0) + struct.pack(nnf, 0)  # no gatts
        out += struct.pack(">I", _NC_VARIABLE)
        out += struct.pack(nnf, len(entries))
        for (name, vdims, _arr, nc_type, vsize, _r), begin in zip(
            entries, begins
        ):
            out += _nc_name(name, wide)
            out += struct.pack(nnf, len(vdims))
            for d in vdims:
                out += struct.pack(nnf, dim_idx[d])
            out += struct.pack(">I", 0) + struct.pack(nnf, 0)  # no vatts
            out += struct.pack(">I", nc_type)
            out += struct.pack(nnf, vsize)
            # CDF-2 (64-bit-offset) and CDF-5 both widen begin
            out += struct.pack(">Q" if version in (2, 5) else ">I", begin)
        return bytes(out)

    hlen = len(header([0] * len(entries)))
    begins = []
    off = hlen
    single_rec = sum(1 for e in entries if e[5]) == 1
    for name, vdims, arr, nc_type, vsize, is_rec in entries:
        if not is_rec:
            begins.append(off)
            total = arr.size * _NC_DTYPES[nc_type].itemsize
            off += total + ((-total) % 4)
    rec_start = off
    for name, vdims, arr, nc_type, vsize, is_rec in entries:
        if is_rec:
            begins_rec = rec_start
            begins.append(begins_rec)
            rec_start += (
                arr[0:1].size * _NC_DTYPES[nc_type].itemsize
                if single_rec
                else vsize
            )
    # reorder begins to match entries order (fixed first already)
    body = bytearray(header(begins))
    for name, vdims, arr, nc_type, vsize, is_rec in entries:
        if not is_rec:
            raw = arr.astype(_NC_DTYPES[nc_type]).tobytes()
            body += _pad4(raw)
    recsize_entries = [e for e in entries if e[5]]
    for r in range(numrecs):
        for name, vdims, arr, nc_type, vsize, is_rec in recsize_entries:
            # np.asarray, not arr[r].astype: a 1-D record variable's
            # arr[r] is a numpy SCALAR, and scalar astype silently
            # ignores byte order — the slab would land native-endian
            raw = np.asarray(arr[r], dtype=_NC_DTYPES[nc_type]).tobytes()
            body += raw if single_rec else _pad4(raw)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(bytes(body))
    return path

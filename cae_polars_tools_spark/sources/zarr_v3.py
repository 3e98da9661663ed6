"""Zarr v3 format support (read + minimal write), layered on the v2
machinery.

Implemented against the public Zarr v3 core spec
(https://zarr-specs.readthedocs.io/, v3):

* one ``zarr.json`` per node: ``node_type`` group/array; arrays carry
  ``shape``, ``data_type``, ``chunk_grid`` (regular), ``chunk_key_encoding``
  (default → ``c/i/j`` keys; v2 → ``i.j``), ``fill_value`` (JSON,
  with ``"NaN"``/``"Infinity"`` spellings), ``codecs`` pipeline and
  ``dimension_names``;
* codec pipeline: ``transpose`` array→array codecs, a ``bytes``
  (endian) or ``sharding_indexed`` array→bytes codec, then
  bytes→bytes codecs — ``gzip`` / ``zlib`` (stdlib), ``blosc``
  (numcodecs preferred automatically, vendored pure-Python decoder as
  fallback — same ladder as the v2 path), ``crc32c`` (chunk bodies
  verified via a C implementation when importable or the pure-Python
  fallback for small payloads; shard indexes ALWAYS verified),
  unknown codecs tried through numcodecs by id;
* ``sharding_indexed``: sharded arrays surface their INNER chunk grid
  to the pruning/scan machinery, and each inner chunk is fetched with
  two ranged reads (index + chunk) instead of a whole-shard download
  — nested shards and ``index_location`` start/end both handled;
* zarr-python's root-level ``consolidated_metadata`` is used when
  present (one GET to open, like v2 ``.zmetadata``).

``dimension_names`` is surfaced through the same
``attrs["_ARRAY_DIMENSIONS"]`` slot the v2 path uses, so the scan
planner, CLI and Spark data source work identically on both formats
(reference parity: its zarr-python dependency reads both, SURVEY §2).

The reference handles v2 and v3 through zarr-python
(``zarr_storage.py:248-283`` opens either); this module gives the
Spark engine the same span without that dependency.
"""

from __future__ import annotations

import itertools
import json
import math
import zlib as _zlib
import gzip as _gzip
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from cae_polars_tools_spark.sources.zarr_format import (
    ByteStore,
    LocalByteStore,
    ZarrV2Array,
)

_V3_DTYPES = {
    "bool": "bool",
    "int8": "i1", "int16": "i2", "int32": "i4", "int64": "i8",
    "uint8": "u1", "uint16": "u2", "uint32": "u4", "uint64": "u8",
    "float16": "f2", "float32": "f4", "float64": "f8",
}


def _np_dtype(data_type: str, endian: str) -> np.dtype:
    code = _V3_DTYPES.get(data_type)
    if code is None:
        raise ValueError(f"unsupported zarr v3 data_type {data_type!r}")
    if code == "bool" or code.endswith("1"):
        return np.dtype(code)
    return np.dtype(("<" if endian == "little" else ">") + code)


def _fill_value(raw: Any, dtype: np.dtype) -> Any:
    if isinstance(raw, str) and dtype.kind == "f":
        special = {
            "NaN": math.nan,
            "Infinity": math.inf,
            "-Infinity": -math.inf,
        }
        if raw in special:
            return special[raw]
        # the v3 spec also permits float fills as hex bit patterns
        # ("0x7fc00000") — e.g. NaN payloads zarr-python can emit
        if raw.startswith("0x"):
            nbytes = dtype.itemsize
            try:
                bits = int(raw, 16).to_bytes(nbytes, "big")
            except (ValueError, OverflowError) as exc:
                raise ValueError(
                    f"invalid hex fill_value {raw!r} for dtype {dtype}"
                ) from exc
            return float(np.frombuffer(bits, dtype=dtype.newbyteorder(">"))[0])
        raise ValueError(
            f"unsupported string fill_value {raw!r} for dtype {dtype}"
        )
    return raw


def _find_endian(codecs: list) -> str:
    """Endianness declared by the pipeline's ``bytes`` codec —
    recursing into ``sharding_indexed``, where the codec that actually
    serializes array elements lives in the inner pipeline."""
    for c in codecs:
        name = c.get("name")
        conf = c.get("configuration") or {}
        if name == "bytes":
            return conf.get("endian", "little")
        if name == "sharding_indexed":
            return _find_endian(conf.get("codecs") or [])
    return "little"


def _crc32c_impl():
    """Best-available C CRC-32C implementation, or None. Cached so the
    import probe runs once per process."""
    global _CRC32C
    if _CRC32C is _UNSET:
        _CRC32C = None
        try:
            import crc32c  # type: ignore

            _CRC32C = crc32c.crc32c
        except ImportError:
            try:
                import google_crc32c  # type: ignore

                _CRC32C = lambda b: google_crc32c.value(bytes(b))  # noqa: E731
            except ImportError:
                pass
    return _CRC32C


_UNSET = object()
_CRC32C: Any = _UNSET
_CRC32C_TABLE: list[int] | None = None

# Pure-Python CRC-32C is ~1 MB/s — fine for 16-bytes-per-chunk shard
# indexes, pathological for multi-MB chunk bodies. Bodies above this
# size are only verified when a C implementation is importable.
_PURE_CRC_BODY_LIMIT = 1 << 18


def _crc32c_pure(data: bytes) -> int:
    """Table-driven CRC-32C (Castagnoli, reflected poly 0x82F63B78) —
    the checksum zarr v3's ``crc32c`` codec and the sharding index
    use. Pure-Python fallback so shard indexes (tiny) are always
    verifiable and writable without the optional ``crc32c`` package."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            table.append(c)
        _CRC32C_TABLE = table
    crc = 0xFFFFFFFF
    tab = _CRC32C_TABLE
    for b in data:
        crc = (crc >> 8) ^ tab[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _crc32c_value(data: bytes) -> int:
    impl = _crc32c_impl()
    return (impl(data) & 0xFFFFFFFF) if impl is not None else _crc32c_pure(data)


def _verify_crc32c(body: bytes, crc: bytes, force: bool = False) -> bytes:
    """Check a v3 crc32c codec's trailing checksum. A C implementation
    (``crc32c`` / ``google-crc32c``) is used when importable; otherwise
    the pure-Python fallback verifies small payloads (shard indexes,
    small chunks) and payloads above ``_PURE_CRC_BODY_LIMIT`` are
    stripped UNVERIFIED rather than paying ~1 s/MB of Python loop —
    corruption there surfaces only through downstream size/value
    checks. ``force=True`` (shard indexes) always verifies."""
    import struct

    if _crc32c_impl() is None and not force and len(body) > _PURE_CRC_BODY_LIMIT:
        return body
    if len(crc) != 4:
        # hostile-bytes guard: a truncated chunk leaves < 4 trailing
        # bytes — that's corruption, not an internal struct.error
        raise ValueError(
            f"zarr v3 crc32c trailer truncated ({len(crc)} bytes)"
        )
    expect = struct.unpack("<I", crc)[0]
    got = _crc32c_value(body)
    if got != expect:
        raise ValueError(
            f"zarr v3 crc32c checksum mismatch: stored {expect:#010x}, "
            f"computed {got:#010x} — chunk is corrupted"
        )
    return body


# --------------------------------------------------------------------------
# v3 codec pipeline
# --------------------------------------------------------------------------

_SHARD_MISSING = (1 << 64) - 1  # spec sentinel: inner chunk not stored


def _split_codecs(codecs: list) -> tuple[list, dict | None, list]:
    """Split a v3 codec list into (array→array, array→bytes,
    bytes→bytes): codecs before the first array→bytes codec
    (``bytes`` or ``sharding_indexed``) are array→array, everything
    after it is bytes→bytes — the pipeline structure the spec fixes."""
    aa: list = []
    ab: dict | None = None
    bb: list = []
    for c in codecs:
        name = c.get("name")
        if ab is None and name in ("bytes", "sharding_indexed"):
            ab = c
        elif ab is None:
            aa.append(c)
        else:
            bb.append(c)
    return aa, ab, bb


def _undo_bytes_codecs(raw: bytes, bytes_codecs: list) -> bytes:
    """Undo bytes→bytes codecs in reverse pipeline order. Corrupt
    compressed bodies surface as the parser's documented ValueError —
    the stdlib decompressors raise BadGzipFile (an OSError) /
    zlib.error, which would otherwise escape a hostile-bytes caller
    as internal errors."""
    for codec in reversed(bytes_codecs):
        cname = codec.get("name")
        conf = codec.get("configuration") or {}
        try:
            raw = _undo_one_bytes_codec(raw, cname, conf)
        except (ValueError, NotImplementedError):
            raise
        except (OSError, EOFError, _zlib.error, RuntimeError, IndexError) as e:
            raise ValueError(
                f"corrupt {cname} chunk bytes: {e!r}"
            ) from e
    return raw


def _undo_one_bytes_codec(raw: bytes, cname: str, conf: dict) -> bytes:
    if cname == "gzip":
        return _gzip.decompress(raw)
    if cname == "zlib":
        return _zlib.decompress(raw)
    if cname == "blosc":
        # Same ladder as the v2 path: numcodecs (C codecs — covers
        # zstd/snappy/blosclz inner codecs) preferred automatically,
        # vendored pure-Python decoder as the fallback.
        from cae_polars_tools_spark.sources.zarr_format import (
            _decode_bytes,
        )

        return _decode_bytes(raw, {"id": "blosc", **conf})
    if cname == "crc32c":
        return _verify_crc32c(raw[:-4], raw[-4:])
    # Unknown bytes→bytes codec (zstd, lz4 standalone, ...):
    # numcodecs can often decode by codec id before we give up.
    from cae_polars_tools_spark.sources.zarr_format import (
        _numcodecs_decode,
    )

    via = _numcodecs_decode(raw, {"id": cname, **conf})
    if via is None:
        raise ValueError(
            f"unsupported zarr v3 codec {cname!r}: install "
            "'numcodecs' (or read the store with the 'zarr' v3 "
            "package)"
        )
    return via


def _transpose_perm(array_codecs: list, ndim: int) -> list[int]:
    """Combined axis permutation of the array→array codecs, applied in
    pipeline (encode) order: ``encoded = A.transpose(perm)``."""
    perm = list(range(ndim))
    for codec in array_codecs:
        cname = codec.get("name")
        if cname != "transpose":
            raise ValueError(
                f"unsupported zarr v3 array→array codec {cname!r}"
            )
        order = (codec.get("configuration") or {}).get("order")
        if order is None or sorted(order) != list(range(ndim)):
            raise ValueError(
                f"zarr v3 transpose codec has invalid order {order!r} "
                f"for a {ndim}-D chunk"
            )
        perm = [perm[o] for o in order]
    return perm


def _index_codec_names(conf: dict) -> list[str]:
    return [
        c.get("name")
        for c in (conf.get("index_codecs") or [{"name": "bytes"}])
    ]


def _shard_index_nbytes(conf: dict, n_inner: int) -> int:
    """On-disk size of a shard's index: 16 bytes per inner chunk, +4
    when the index pipeline ends with crc32c. Only fixed-size index
    pipelines (bytes, crc32c) are supported — a compressed index has
    no spec-computable offset."""
    names = _index_codec_names(conf)
    if any(n not in ("bytes", "crc32c") for n in names):
        raise ValueError(
            "unsupported zarr v3 shard index_codecs "
            f"{names!r}: only fixed-size pipelines (bytes, crc32c) can "
            "be located inside a shard"
        )
    return 16 * n_inner + (4 if "crc32c" in names else 0)


def _decode_shard_index(
    raw_idx: bytes, conf: dict, cps: tuple[int, ...]
) -> np.ndarray:
    """Decode a shard index to a ``(*cps, 2)`` uint64 array of
    (offset, nbytes) pairs. The index checksum is ALWAYS verified
    (``force=True`` — it is tiny and guards every offset arithmetic
    downstream)."""
    endian = "little"
    for codec in reversed(conf.get("index_codecs") or [{"name": "bytes"}]):
        cname = codec.get("name")
        if cname == "crc32c":
            raw_idx = _verify_crc32c(raw_idx[:-4], raw_idx[-4:], force=True)
        elif cname == "bytes":
            endian = (codec.get("configuration") or {}).get("endian", "little")
    dt = np.dtype(("<" if endian == "little" else ">") + "u8")
    n = int(np.prod(cps)) if cps else 1
    idx = np.frombuffer(raw_idx, dtype=dt)
    if idx.size != 2 * n:
        raise ValueError(
            f"zarr v3 shard index has {idx.size} uint64s, expected {2 * n}"
        )
    return idx.reshape((*cps, 2))


def _decode_shard_full(
    raw: bytes,
    conf: dict,
    dtype: np.dtype,
    shard_shape: tuple[int, ...],
    fill: Any,
) -> np.ndarray:
    """Decode an entire in-memory shard: parse the index, decode each
    present inner chunk through the inner codec pipeline (recursing —
    nested sharding is legal), fill the missing ones."""
    inner = tuple(conf.get("chunk_shape") or shard_shape)
    if len(inner) != len(shard_shape) or any(
        s % i for s, i in zip(shard_shape, inner)
    ):
        raise ValueError(
            f"zarr v3 shard chunk_shape {inner} does not evenly divide "
            f"the shard shape {shard_shape}"
        )
    cps = tuple(s // i for s, i in zip(shard_shape, inner))
    n = int(np.prod(cps)) if cps else 1
    idx_nbytes = _shard_index_nbytes(conf, n)
    loc = conf.get("index_location", "end")
    raw_idx = raw[-idx_nbytes:] if loc == "end" else raw[:idx_nbytes]
    index = _decode_shard_index(raw_idx, conf, cps)
    inner_codecs = conf.get("codecs") or [{"name": "bytes"}]
    out = np.full(shard_shape, fill, dtype=dtype)
    for combo in itertools.product(*(range(c) for c in cps)):
        offset, nbytes = (int(x) for x in index[combo])
        if offset == _SHARD_MISSING:
            continue
        block = _decode_chunk_bytes(
            raw[offset:offset + nbytes], inner_codecs, dtype, inner, fill
        )
        sl = tuple(
            slice(i * c, (i + 1) * c) for i, c in zip(combo, inner)
        )
        out[sl] = block
    return out


def _decode_chunk_bytes(
    raw: bytes,
    codecs: list,
    dtype: np.dtype,
    chunk_shape: tuple[int, ...],
    fill: Any,
) -> np.ndarray:
    """Run a stored chunk's bytes backwards through a full v3 codec
    pipeline (bytes→bytes, then the array→bytes codec — ``bytes`` or
    a whole-``sharding_indexed`` shard — then inverse array→array
    transposes) to a ``chunk_shape``-d ndarray."""
    aa, ab, bb = _split_codecs(codecs)
    raw = _undo_bytes_codecs(raw, bb)
    perm = _transpose_perm(aa, len(chunk_shape))
    stored_shape = tuple(chunk_shape[p] for p in perm)
    if ab is not None and ab.get("name") == "sharding_indexed":
        arr = _decode_shard_full(
            raw, ab.get("configuration") or {}, dtype, stored_shape, fill
        )
    else:
        arr = np.frombuffer(raw, dtype=dtype)
        if arr.size != int(np.prod(stored_shape)):
            raise ValueError(
                f"chunk has {arr.size} elements, expected "
                f"{int(np.prod(stored_shape))}"
            )
        arr = arr.reshape(stored_shape)
    if perm != list(range(len(chunk_shape))):
        arr = np.ascontiguousarray(arr.transpose(np.argsort(perm)))
    return arr


@dataclass
class ZarrV3Array(ZarrV2Array):
    """v3 array handle: same orthogonal indexing / chunk-pruning as v2
    (inherited), with v3 chunk keys and the v3 codec pipeline.

    For ``sharding_indexed`` arrays (the v3 default for large arrays),
    ``chunks`` is the INNER chunk shape and ``shard_chunks`` the
    stored shard shape — so the inherited ``oindex`` pruning, the
    scan planner's chunk windows and Spark partition alignment all
    operate at inner-chunk granularity for free. ``read_chunk`` then
    fetches only the shard's (tiny, always-checksummed) index plus
    the one inner chunk it needs via ``ByteStore.get_range`` — on
    object storage that is two ranged GETs instead of a whole-shard
    download, which is the entire point of sharding at 100 TB scale."""

    codecs: list = field(default_factory=list)
    key_encoding: str = "default"  # "default" → c/i/j, "v2" → i.j
    shard_conf: dict | None = None  # sharding_indexed configuration
    shard_chunks: tuple[int, ...] | None = None  # stored shard shape

    def _chunk_key(self, chunk_idx: tuple[int, ...]) -> str:
        if self.key_encoding == "v2":
            name = self.dimension_separator.join(str(i) for i in chunk_idx) or "0"
        else:
            name = "/".join(("c", *map(str, chunk_idx)))
        return f"{self.path}/{name}" if self.path else name

    def _fill(self) -> Any:
        return 0 if self.fill_value is None else self.fill_value

    def _shard_index(self, shard_idx: tuple[int, ...]) -> np.ndarray | None:
        """(offset, nbytes) index of one shard, None when the shard
        object is absent. LRU-cached (8 shards) so a scan over the
        inner chunks of one shard reads its index once."""
        cache = self.__dict__.setdefault("_shard_idx_cache", {})
        if shard_idx in cache:
            cache[shard_idx] = cache.pop(shard_idx)  # refresh LRU slot
            return cache[shard_idx]
        conf = self.shard_conf or {}
        cps = tuple(
            s // c for s, c in zip(self.shard_chunks, self.chunks)
        )
        idx_nbytes = _shard_index_nbytes(conf, int(np.prod(cps)) if cps else 1)
        loc = conf.get("index_location", "end")
        raw = self.store.get_range(
            self._chunk_key(shard_idx),
            -idx_nbytes if loc == "end" else 0,
            idx_nbytes,
        )
        out = None if raw is None else _decode_shard_index(raw, conf, cps)
        if len(cache) >= 8:
            cache.pop(next(iter(cache)))
        cache[shard_idx] = out
        return out

    def _read_inner_chunk(self, inner_idx: tuple[int, ...]) -> np.ndarray:
        conf = self.shard_conf or {}
        cps = tuple(s // c for s, c in zip(self.shard_chunks, self.chunks))
        shard_idx = tuple(i // p for i, p in zip(inner_idx, cps))
        within = tuple(i % p for i, p in zip(inner_idx, cps))
        index = self._shard_index(shard_idx)
        if index is None:
            return np.full(self.chunks, self._fill(), dtype=self.dtype)
        offset, nbytes = (int(x) for x in index[within])
        if offset == _SHARD_MISSING:
            return np.full(self.chunks, self._fill(), dtype=self.dtype)
        raw = self.store.get_range(self._chunk_key(shard_idx), offset, nbytes)
        if raw is None or len(raw) != nbytes:
            raise ValueError(
                f"shard {shard_idx} truncated: inner chunk {within} spans "
                f"[{offset}, {offset + nbytes}) but the ranged read failed"
            )
        return _decode_chunk_bytes(
            raw,
            conf.get("codecs") or [{"name": "bytes"}],
            self.dtype,
            self.chunks,
            self._fill(),
        )

    def read_chunk(self, chunk_idx: tuple[int, ...]) -> np.ndarray:
        if self.shard_conf is not None:
            return self._read_inner_chunk(chunk_idx)
        raw = self.store.get(self._chunk_key(chunk_idx))
        if raw is None:
            return np.full(self.chunks, self._fill(), dtype=self.dtype)
        return _decode_chunk_bytes(
            raw, self.codecs, self.dtype, self.chunks, self._fill()
        )


class ZarrV3Group:
    """v3 group: same duck-typed surface as ZarrV2Group (member_names /
    array_names / get_array / subgroup / attrs)."""

    def __init__(
        self,
        store: ByteStore,
        path: str = "",
        consolidated: dict | None = None,
        attrs: dict | None = None,
    ):
        self.store = store
        self.path = path
        self.consolidated = consolidated  # {relpath: node zarr.json}
        self.attrs = attrs or {}

    def _key(self, *parts: str) -> str:
        return "/".join(p for p in (self.path, *parts) if p)

    def _node_meta(self, name: str = "") -> dict | None:
        rel = self._key(name) if name else self.path
        if self.consolidated is not None:
            if not rel:
                return None  # root meta handled at open time
            return self.consolidated.get(rel)
        raw = self.store.get(f"{rel}/zarr.json" if rel else "zarr.json")
        return None if raw is None else json.loads(raw.decode())

    def subgroup(self, name: str) -> "ZarrV3Group":
        g = self
        for part in name.strip("/").split("/"):
            meta = g._node_meta(part)
            if meta is None or meta.get("node_type") != "group":
                raise KeyError(f"no subgroup {part!r} under {g.path!r}")
            g = ZarrV3Group(
                store=self.store,
                path=g._key(part),
                consolidated=self.consolidated,
                attrs=meta.get("attributes") or {},
            )
        return g

    def member_names(self) -> list[str]:
        if self.consolidated is not None:
            prefix = f"{self.path}/" if self.path else ""
            names = {
                k[len(prefix):].split("/", 1)[0]
                for k in self.consolidated
                if k.startswith(prefix) and k[len(prefix):]
            }
            return sorted(names)
        return [
            n
            for n in self.store.list_prefix(self.path)
            if n != "zarr.json" and not n.startswith(".")
        ]

    def array_names(self) -> list[str]:
        out = []
        for n in self.member_names():
            try:
                meta = self._node_meta(n)
                if meta is not None and meta.get("node_type") == "array":
                    out.append(n)
            except Exception:
                continue  # unreadable members skipped, like v2
        return out

    def get_array(self, name: str) -> ZarrV3Array:
        meta = self._node_meta(name)
        if meta is None or meta.get("node_type") != "array":
            raise KeyError(f"array {name!r} not found in group {self.path!r}")
        codecs = meta.get("codecs") or []
        dtype = _np_dtype(meta["data_type"], _find_endian(codecs))
        grid = meta.get("chunk_grid") or {}
        if grid.get("name") not in (None, "regular"):
            raise ValueError(
                f"unsupported zarr v3 chunk grid {grid.get('name')!r}"
            )
        chunks = tuple(
            (grid.get("configuration") or {}).get("chunk_shape", meta["shape"])
        )
        # sharding_indexed as the sole codec (how zarr-python writes
        # sharded arrays): expose INNER chunks to the pruning/scan
        # machinery and range-read per inner chunk. Exotic pipelines
        # (transpose/compression wrapped AROUND the shard) fall through
        # to the general whole-chunk decoder at shard granularity.
        shard_conf = None
        shard_chunks = None
        if len(codecs) == 1 and codecs[0].get("name") == "sharding_indexed":
            conf = codecs[0].get("configuration") or {}
            inner = tuple(conf.get("chunk_shape") or chunks)
            if len(inner) != len(chunks) or any(
                c % i for c, i in zip(chunks, inner)
            ):
                raise ValueError(
                    f"zarr v3 sharding_indexed chunk_shape {inner} does "
                    f"not evenly divide the shard shape {chunks}"
                )
            _shard_index_nbytes(conf, 1)  # validate index_codecs early
            shard_conf = conf
            shard_chunks = chunks
            chunks = inner
        enc = meta.get("chunk_key_encoding") or {}
        attrs = dict(meta.get("attributes") or {})
        if meta.get("dimension_names"):
            # surface through the v2 attribute slot so every consumer
            # (scan planner, CLI, data source) stays format-agnostic
            attrs.setdefault("_ARRAY_DIMENSIONS", list(meta["dimension_names"]))
        return ZarrV3Array(
            store=self.store,
            path=self._key(name),
            shape=tuple(meta["shape"]),
            chunks=chunks,
            dtype=dtype,
            compressor=None,
            fill_value=_fill_value(meta.get("fill_value"), dtype),
            order="C",
            dimension_separator=(enc.get("configuration") or {}).get(
                "separator", "/" if enc.get("name") != "v2" else "."
            ),
            filters=None,
            attrs=attrs,
            codecs=codecs,
            key_encoding=enc.get("name") or "default",
            shard_conf=shard_conf,
            shard_chunks=shard_chunks,
        )


def open_group_v3(
    store: ByteStore, root_meta: dict, group: str | None = None
) -> ZarrV3Group:
    """Build the root v3 group from its already-loaded zarr.json; uses
    zarr-python's root-level consolidated metadata when present."""
    cmeta = None
    cm = root_meta.get("consolidated_metadata")
    if isinstance(cm, dict) and isinstance(cm.get("metadata"), dict):
        cmeta = cm["metadata"]
    g = ZarrV3Group(
        store=store,
        path="",
        consolidated=cmeta,
        attrs=root_meta.get("attributes") or {},
    )
    return g.subgroup(group) if group else g


# --------------------------------------------------------------------------
# Minimal v3 writer (tests / round trips)
# --------------------------------------------------------------------------


def write_group_v3(
    root: str,
    arrays: dict[str, np.ndarray],
    dims: dict[str, tuple[str, ...]] | None = None,
    coords: dict[str, np.ndarray] | None = None,
    chunks: dict[str, tuple[int, ...]] | None = None,
    gzip_level: int | None = 5,
    group_attrs: dict | None = None,
    shards: dict[str, tuple[int, ...]] | None = None,
) -> str:
    """Write a local zarr v3 store: regular grid, default chunk key
    encoding (``c/i/j``), ``bytes``(little) + optional ``gzip`` codecs,
    ``dimension_names`` for labeled arrays + 1-D coordinate arrays.

    ``shards[name]`` (a shard shape; per-dim multiple of the array's
    chunk shape) switches that array to ``sharding_indexed``: each
    stored object is one shard of many gzip'd inner chunks plus a
    crc32c'd (offset, nbytes) index at the end — the layout
    zarr-python v3 writes by default for large arrays. All-fill inner
    chunks are elided with the spec's 2^64-1 sentinel."""
    store = LocalByteStore(root)
    store.put(
        "zarr.json",
        json.dumps(
            {
                "zarr_format": 3,
                "node_type": "group",
                "attributes": group_attrs or {},
            }
        ).encode(),
    )
    dims = dims or {}

    def inner_codecs() -> list[dict]:
        codecs: list[dict] = [
            {"name": "bytes", "configuration": {"endian": "little"}}
        ]
        if gzip_level is not None:
            codecs.append({"name": "gzip", "configuration": {"level": gzip_level}})
        return codecs

    def encode_block(le: np.ndarray, sl: tuple, chunk_shape: tuple) -> bytes:
        block = le[sl]
        if block.shape != chunk_shape:
            padded = np.zeros(chunk_shape, dtype=le.dtype)
            padded[tuple(slice(0, e) for e in block.shape)] = block
            block = padded
        payload = np.ascontiguousarray(block).tobytes()
        if gzip_level is not None:
            payload = _gzip.compress(payload, compresslevel=gzip_level)
        return payload

    def put_array(
        name: str, data: np.ndarray, dim_names, chunk_shape, shard_shape
    ) -> None:
        data = np.ascontiguousarray(data)
        chunk_shape = tuple(chunk_shape or (min(s, 64) or 1 for s in data.shape))
        if shard_shape is not None:
            shard_shape = tuple(shard_shape)
            if len(shard_shape) != data.ndim or any(
                s % c for s, c in zip(shard_shape, chunk_shape)
            ):
                raise ValueError(
                    f"shard shape {shard_shape} must be a per-dim multiple "
                    f"of the chunk shape {chunk_shape}"
                )
            codecs = [
                {
                    "name": "sharding_indexed",
                    "configuration": {
                        "chunk_shape": list(chunk_shape),
                        "codecs": inner_codecs(),
                        "index_codecs": [
                            {"name": "bytes", "configuration": {"endian": "little"}},
                            {"name": "crc32c"},
                        ],
                        "index_location": "end",
                    },
                }
            ]
            grid_shape = shard_shape
        else:
            codecs = inner_codecs()
            grid_shape = chunk_shape
        dtype_name = data.dtype.name
        if dtype_name not in _V3_DTYPES:
            raise ValueError(f"unsupported v3 write dtype {data.dtype}")
        meta = {
            "zarr_format": 3,
            "node_type": "array",
            "shape": list(data.shape),
            "data_type": dtype_name,
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": list(grid_shape)},
            },
            "chunk_key_encoding": {
                "name": "default",
                "configuration": {"separator": "/"},
            },
            "fill_value": 0,
            "codecs": codecs,
            "attributes": {},
        }
        if dim_names:
            meta["dimension_names"] = list(dim_names)
        store.put(f"{name}/zarr.json", json.dumps(meta).encode())
        le = data.astype(data.dtype.newbyteorder("<"), copy=False)
        ngrid = tuple(-(-s // c) for s, c in zip(data.shape, grid_shape))
        for idx in itertools.product(*(range(n) for n in ngrid)) if ngrid else [()]:
            if shard_shape is None:
                sl = tuple(
                    slice(i * c, min((i + 1) * c, s))
                    for i, c, s in zip(idx, grid_shape, data.shape)
                )
                key = "/".join(("c", *map(str, idx)))
                store.put(f"{name}/{key}", encode_block(le, sl, chunk_shape))
                continue
            # one shard: concatenated inner chunks + uint64 index + crc32c
            cps = tuple(s // c for s, c in zip(shard_shape, chunk_shape))
            index = np.full((*cps, 2), _SHARD_MISSING, dtype="<u8")
            body = bytearray()
            for within in itertools.product(*(range(p) for p in cps)):
                origin = tuple(
                    i * s + w * c
                    for i, s, w, c in zip(idx, shard_shape, within, chunk_shape)
                )
                if any(o >= s for o, s in zip(origin, data.shape)):
                    continue  # inner chunk entirely outside the array
                sl = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(origin, chunk_shape, data.shape)
                )
                if not np.count_nonzero(le[sl]):
                    continue  # all-fill inner chunk → 2^64-1 sentinel
                payload = encode_block(le, sl, chunk_shape)
                index[within] = (len(body), len(payload))
                body.extend(payload)
            idx_bytes = index.tobytes()
            idx_bytes += _crc32c_value(idx_bytes).to_bytes(4, "little")
            key = "/".join(("c", *map(str, idx)))
            store.put(f"{name}/{key}", bytes(body) + idx_bytes)

    for name, data in arrays.items():
        put_array(
            name,
            data,
            dims.get(name),
            (chunks or {}).get(name),
            (shards or {}).get(name),
        )
    for cname, cdata in (coords or {}).items():
        put_array(cname, np.asarray(cdata), (cname,), None, None)
    return root


__all__ = [
    "ZarrV3Array",
    "ZarrV3Group",
    "open_group_v3",
    "write_group_v3",
]

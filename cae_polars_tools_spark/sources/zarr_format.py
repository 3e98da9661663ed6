"""Minimal self-contained Zarr v2 format support.

The reference engine reads Zarr stores through the ``zarr`` +
``s3fs`` packages (reference zarr_storage.py). This environment has
neither, so the format layer is implemented from scratch against the
public Zarr v2 spec (https://zarr-specs.readthedocs.io/, v2):

* a store is a directory tree; group metadata in ``.zgroup`` /
  ``.zattrs``; array metadata in ``<name>/.zarray`` (+ ``.zattrs``);
  optional consolidated metadata in ``.zmetadata``;
* chunks are files named ``i.j.k`` (or ``i/j/k`` when
  ``dimension_separator`` is ``/``), each holding the compressed
  C-order bytes of one chunk; missing chunk files mean
  ``fill_value``.

Supported codecs: raw (``compressor: null``), ``zlib`` / ``gzip``
(stdlib), and ``blosc`` frames whose inner codec is lz4, zlib or
memcpyed — the zarr-python *default* compressor — via the vendored
pure-Python decoder in
:mod:`cae_polars_tools_spark.sources.blosc_codec`. Filters: ``delta``
natively. Anything else (zstd, snappy, blosclz, bit-shuffle, other
filters) is delegated to ``numcodecs`` when that package imports
successfully — the preferred production path, tried FIRST for every
non-stdlib codec — and otherwise raises an error naming the codec
and the package to install.

Everything here is plain numpy + stdlib and is safe to run inside
Spark executors (no Spark imports).
"""

from __future__ import annotations

import gzip as _gzip
import itertools
import json
import os
import zlib as _zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np

# --------------------------------------------------------------------------
# Byte-store abstraction: local directory now; s3/http via fsspec when
# available. Executors instantiate these from a plain path string.
# --------------------------------------------------------------------------


class ByteStore:
    """Key-value view of a zarr store root ('a/b/.zarray' → bytes)."""

    #: scheme → factory(path, storage_options) registry: deployments
    #: (and tests) plug custom stores in by URI scheme without
    #: patching this module — ``register_scheme("s3", ...)`` overrides
    #: the fsspec default for that scheme everywhere ``for_path`` is
    #: used (every manifest, pointer, CoW verb, and zarr read).
    _SCHEME_FACTORIES: dict = {}

    def __init__(self, root: str, storage_options: dict | None = None):
        self.root = root.rstrip("/")
        self.storage_options = storage_options or {}

    # -- factory -----------------------------------------------------------
    @classmethod
    def register_scheme(cls, scheme: str, factory) -> None:
        """Route ``scheme://...`` paths to ``factory(path,
        storage_options)`` in :meth:`for_path`. Later registrations
        replace earlier ones; ``unregister_scheme`` removes."""
        cls._SCHEME_FACTORIES[scheme] = factory

    @classmethod
    def unregister_scheme(cls, scheme: str) -> None:
        cls._SCHEME_FACTORIES.pop(scheme, None)

    @staticmethod
    def for_path(path: str, storage_options: dict | None = None) -> "ByteStore":
        if "://" in path:
            scheme = path.split("://", 1)[0]
            factory = ByteStore._SCHEME_FACTORIES.get(scheme)
            if factory is not None:
                return factory(path, storage_options)
        if path.startswith(("http://", "https://")):
            # fsspec (when fully installed — its http filesystem also
            # needs aiohttp) keeps full storage_options semantics
            # (auth kwargs etc. pass through) — unchanged behavior for
            # existing callers; the stdlib store is the
            # zero-dependency fallback. The fallback only engages when
            # there are no storage_options beyond the keys the stdlib
            # store understands: silently dropping fsspec auth kwargs
            # would send unauthenticated requests.
            try:
                return FsspecByteStore(path, storage_options)
            except ImportError:
                if set(storage_options or {}) <= {
                    "timeout",
                    "retries",
                    "headers",
                }:
                    return HttpByteStore(path, storage_options)
                raise
        if "://" in path and not path.startswith("file://"):
            return FsspecByteStore(path, storage_options)
        return LocalByteStore(path.removeprefix("file://"), storage_options)

    # -- interface ---------------------------------------------------------
    def get(self, key: str) -> bytes | None:
        """Bytes for key, or None if absent."""
        raise NotImplementedError

    def get_range(self, key: str, offset: int, length: int) -> bytes | None:
        """``length`` bytes at ``offset`` (negative offset = from the
        end, like an HTTP suffix range), or None if the key is absent.

        Default implementation reads the whole object and slices —
        correct everywhere; subclasses override with a real ranged
        read (seek / HTTP Range / S3 GetObject Range) so shard-index
        and inner-chunk fetches touch only the bytes they need."""
        data = self.get(key)
        if data is None:
            return None
        start = offset if offset >= 0 else max(0, len(data) + offset)
        return data[start:start + length]

    def put(self, key: str, data: bytes) -> None:
        """Write bytes at key (used by the zarr sink; chunk objects are
        independent, so concurrent puts from many executors need no
        coordination)."""
        raise NotImplementedError(
            f"{type(self).__name__} is read-only; writing requires a "
            "store with put()"
        )

    def delete_prefix(self, prefix: str = "") -> None:
        """Remove every object under prefix (sink overwrite mode)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support deletion"
        )

    def list_prefix(self, prefix: str = "") -> list[str]:
        """Immediate child names under prefix (directories and files)."""
        raise NotImplementedError

    def size(self, key: str) -> int | None:
        """Object size in bytes, or None if absent. Default reads the
        whole object — subclasses override with a metadata call
        (stat / HEAD / S3 HeadObject) so manifest sizing never pulls
        data bytes."""
        data = self.get(key)
        return None if data is None else len(data)

    def copy(self, src: str, dst: str) -> None:
        """Copy one object inside this store. Default streams through
        the caller (get then put) — correct everywhere; subclasses
        override with a server-side copy (S3 CopyObject, local
        hardlink) so a copy-on-write rewrite never moves data through
        the driver."""
        data = self.get(src)
        if data is None:
            raise FileNotFoundError(f"{src!r} not found in {self.root!r}")
        self.put(dst, data)

    # -- Spark path translation ---------------------------------------
    #
    # A key has TWO addresses: the store's (metadata I/O through this
    # class) and Spark's (the string the JVM reader/writer resolves).
    # They usually coincide, but the split is load-bearing wherever the
    # metadata client and the Hadoop connector spell the same location
    # differently — s3:// (fsspec/s3fs) vs s3a:// (hadoop-aws) is the
    # canonical production case. Every CoW verb builds its Spark reads
    # and writes through spark_path() and normalizes what Spark reports
    # back (input_file_name / inputFiles) through ref_from_spark_uri(),
    # so a deployment only has to get the mapping right ONCE, here.

    def spark_path(self, key: str = "") -> str:
        """The path string Spark's reader/writer uses for ``key``
        (default: the store address itself). ``spark_scheme`` in
        ``storage_options`` rewrites the scheme — e.g. a store rooted
        at ``s3://bucket/t`` with ``spark_scheme="s3a"`` hands Spark
        ``s3a://bucket/t/...`` while metadata stays on s3fs.
        ``spark_root`` replaces the WHOLE root — the general remap for
        deployments where the metadata client and the JVM address the
        same bytes through entirely different namespaces (a fuse
        mount, a translated bucket alias, a test harness's memory://
        twin)."""
        root = self.storage_options.get("spark_root")
        if root:
            root = root.rstrip("/")
            return f"{root}/{key}" if key else root
        root = self.root
        spark_scheme = self.storage_options.get("spark_scheme")
        if spark_scheme and "://" in root:
            root = f"{spark_scheme}://{root.split('://', 1)[1]}"
        return f"{root}/{key}" if key else root

    def ref_from_spark_uri(self, uri: str) -> str:
        """Root-relative ref of a file URI Spark reported
        (``input_file_name()`` / ``inputFiles()``) — the inverse of
        :meth:`spark_path`. Affected-file classification in the CoW
        verbs compares THESE normalized refs, never raw URI strings
        (schemes and percent-encoding differ between what Spark
        reports and what the manifest records; a silent mismatch would
        both reference AND rewrite a file, duplicating its rows)."""
        import posixpath
        from urllib.parse import unquote, urlparse

        spark_root = self.storage_options.get("spark_root")
        if spark_root and "://" not in spark_root:
            # whole-root remap to a LOCAL location: invert through the
            # abspath-normalizing local rule (file:/ URIs, %-encoding)
            from cae_polars_tools_spark.manifest import uri_to_ref

            return uri_to_ref(uri, spark_root)
        # the error must name the root the comparison actually RAN
        # against — in a spark_root-remapped deployment that is the
        # remap, and pointing the operator at the metadata root would
        # send them debugging the wrong namespace
        compared = spark_root or self.root
        u = urlparse(uri)
        r = urlparse(compared)
        if u.scheme and r.netloc and u.netloc != r.netloc:
            raise ValueError(
                f"file {uri!r} is outside the Spark-facing store "
                f"root {compared!r}"
            )
        rel = posixpath.relpath(unquote(u.path) or "/", r.path or "/")
        if rel.startswith(".."):
            raise ValueError(
                f"file {uri!r} is outside the Spark-facing store "
                f"root {compared!r}"
            )
        return posixpath.normpath(rel)

    def canon(self) -> str:
        """Canonical identity of the root for overlap/containment
        checks (two stores whose canon strings nest address the same
        bytes). Local stores canonicalize the filesystem path; URI
        stores are already canonical."""
        return self.root

    # -- conditional / bulk primitives ---------------------------------

    #: True when :meth:`put_if_absent` is a real store-level
    #: compare-and-swap (exactly one concurrent caller wins). The base
    #: check-then-put is detection-grade only — callers that need hard
    #: exclusion (the Table commit protocol) consult this flag to know
    #: whether losing a race is impossible or merely unlikely.
    cas_atomic = False

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Write ``key`` only if absent; True when THIS call created
        it. Base implementation is check-then-put (non-atomic —
        ``cas_atomic`` False); stores with a conditional write
        (local ``link()``, S3 ``If-None-Match:*``) override with the
        real thing."""
        if self.size(key) is not None:
            return False
        self.put(key, data)
        return True

    def list_prefix_detail(self, prefix: str = "") -> list[tuple[str, int | None]]:
        """``(name, size)`` of immediate children under ``prefix``;
        ``size`` is None for directories/prefixes. Object-store LIST
        responses carry sizes for free, so manifest commits use this
        to record per-file sizes WITHOUT a stat/HEAD per file; the
        default composes ``list_prefix`` + ``size`` for stores without
        a richer listing."""
        out = []
        for name in self.list_prefix(prefix):
            key = f"{prefix}/{name}" if prefix else name
            out.append((name, self.size(key)))
        return out

    def copy_to(self, src_key: str, dst_store: "ByteStore", dst_key: str) -> None:
        """Copy one object into ``dst_store`` (possibly a different
        root). Default streams get→put through the caller; same-class
        subclasses override with server-side copies so the legacy
        copy-untouched CoW path never moves data through the driver."""
        data = self.get(src_key)
        if data is None:
            raise FileNotFoundError(
                f"{src_key!r} not found in {self.root!r}"
            )
        dst_store.put(dst_key, data)

    # -- executor reconstruction ----------------------------------------

    def executor_spec(self) -> tuple | None:
        """A picklable spec a Spark EXECUTOR can rebuild this store
        from (:meth:`from_spec`), or None when it cannot — the seam
        that lets commit-time footer accounting run as a distributed
        job instead of a serial driver loop. None is the safe default:
        ``register_scheme`` registrations are driver-process-local, so
        a scheme-routed store reconstructed on an executor would
        resolve to the WRONG backend. Local stores qualify always
        (the path means the same thing in every local-mode worker and
        on a shared filesystem); fsspec stores qualify when the
        library is installed cluster-wide (their override).
        ``storage_options={"distributed_footers": False}`` opts any
        store out."""
        return None

    @staticmethod
    def from_spec(spec: tuple) -> "ByteStore":
        """Rebuild a store from :meth:`executor_spec`'s value — runs
        INSIDE Spark tasks, so only stdlib/for_path machinery."""
        kind = spec[0]
        if kind == "local":
            return LocalByteStore(spec[1])
        if kind == "path":
            return ByteStore.for_path(spec[1], spec[2])
        raise ValueError(f"unknown ByteStore executor spec {spec!r}")


class LocalByteStore(ByteStore):
    def get(self, key: str) -> bytes | None:
        p = os.path.join(self.root, key)
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as f:
            return f.read()

    def get_range(self, key: str, offset: int, length: int) -> bytes | None:
        p = os.path.join(self.root, key)
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as f:
            if offset < 0:
                # clamp like an HTTP suffix range: a tail longer than
                # the object starts at 0 (a raw SEEK_END seek would
                # throw EINVAL on a negative absolute position)
                size = os.fstat(f.fileno()).st_size
                f.seek(max(0, size + offset))
            else:
                f.seek(offset)
            return f.read(length)

    def put(self, key: str, data: bytes) -> None:
        # write-then-rename: readers of an existing key (metadata
        # pointers, chunk overwrites) see the old bytes or the new
        # ones, never a torn file — matching object-store PUT
        # semantics so callers can rely on atomic visibility
        # regardless of which ByteStore backs them
        import tempfile

        p = os.path.join(self.root, key)
        d = os.path.dirname(p)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".__put__")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            os.replace(tmp, p)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise

    def delete_prefix(self, prefix: str = "") -> None:
        import shutil

        p = os.path.join(self.root, prefix) if prefix else self.root
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.isfile(p):
            # a prefix naming exactly one object (e.g. the ingest
            # marker) must delete it, not silently no-op
            os.remove(p)

    def list_prefix(self, prefix: str = "") -> list[str]:
        p = os.path.join(self.root, prefix) if prefix else self.root
        if not os.path.isdir(p):
            return []
        return sorted(os.listdir(p))

    def size(self, key: str) -> int | None:
        p = os.path.join(self.root, key)
        return os.path.getsize(p) if os.path.isfile(p) else None

    def copy(self, src: str, dst: str) -> None:
        # hardlink when the filesystem allows it: CoW version files
        # are immutable after their pointer flip, so sharing inodes is
        # safe and makes the copy zero-byte; cross-device or
        # link-hostile filesystems fall back to a byte copy
        import shutil

        sp = os.path.join(self.root, src)
        dp = os.path.join(self.root, dst)
        if not os.path.isfile(sp):
            raise FileNotFoundError(f"{src!r} not found in {self.root!r}")
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        try:
            os.link(sp, dp)
        except OSError:
            shutil.copyfile(sp, dp)

    def canon(self) -> str:
        return os.path.abspath(self.root)

    def ref_from_spark_uri(self, uri: str) -> str:
        # local Spark reports file:/… or file:///… with percent-
        # encoding, and the root may be relative — delegate to the
        # abspath-normalizing uri_to_ref (manifest.py), the historical
        # single implementation for local CoW classification
        from cae_polars_tools_spark.manifest import uri_to_ref

        return uri_to_ref(uri, self.root)

    cas_atomic = True

    def put_if_absent(self, key: str, data: bytes) -> bool:
        # true compare-and-swap via link(2): the tmp file is written
        # COMPLETELY first, then linked into place — link is atomic
        # and fails with EEXIST when the key exists, so exactly one
        # concurrent caller wins and no reader ever sees a torn value
        # (a bare O_EXCL create would expose partially-written bytes)
        import tempfile

        p = os.path.join(self.root, key)
        d = os.path.dirname(p)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".__cas__")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            try:
                os.link(tmp, p)
                return True
            except FileExistsError:
                return False
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    def list_prefix_detail(self, prefix: str = "") -> list[tuple[str, int | None]]:
        # one scandir: names AND sizes from the same directory read,
        # no per-file stat round-trips
        p = os.path.join(self.root, prefix) if prefix else self.root
        if not os.path.isdir(p):
            return []
        out = []
        with os.scandir(p) as it:
            for e in it:
                out.append(
                    (e.name, e.stat().st_size if e.is_file() else None)
                )
        return sorted(out)

    def executor_spec(self) -> tuple | None:
        # absolute path: executors may not share the driver's cwd.
        # RoutedLocalByteStore inherits this — its ``root`` IS the
        # local backing directory, so a plain LocalByteStore over it
        # on the executor reads the same bytes the scheme'd driver
        # store addresses.
        if self.storage_options.get("distributed_footers") is False:
            return None
        return ("local", os.path.abspath(self.root))

    def copy_to(self, src_key: str, dst_store: "ByteStore", dst_key: str) -> None:
        if isinstance(dst_store, LocalByteStore):
            # same-machine CoW: hardlink across roots (immutable-file
            # rule, see copy()); cross-device falls back to a byte copy
            import shutil

            sp = os.path.join(self.root, src_key)
            dp = os.path.join(dst_store.root, dst_key)
            if not os.path.isfile(sp):
                raise FileNotFoundError(
                    f"{src_key!r} not found in {self.root!r}"
                )
            os.makedirs(os.path.dirname(dp), exist_ok=True)
            try:
                os.link(sp, dp)
            except OSError:
                shutil.copyfile(sp, dp)
            return
        super().copy_to(src_key, dst_store, dst_key)


class RoutedLocalByteStore(LocalByteStore):
    """A scheme'd (URI-rooted) store backed by a local directory — the
    reference implementation of the metadata/data path split the
    ``spark_path`` seam exists for (s3:// metadata client vs s3a://
    Hadoop connector in production). Register it for a scheme and
    every ``ByteStore.for_path`` consumer — manifests, pointers, CoW
    verbs, the ``Table`` facade — runs against the URI root while
    Spark reads and writes the translated local location::

        ByteStore.register_scheme(
            "demo",
            lambda p, so=None: RoutedLocalByteStore(p, base_dir, so),
        )
        Table.create(spark, "demo://tbl", df)

    Used by the object-store lifecycle corpus entry and tests; a real
    deployment replaces the local backing with its object-store
    client and keeps the exact same interface."""

    def __init__(
        self,
        uri_root: str,
        base_dir: str,
        storage_options: dict | None = None,
    ):
        self.uri_root = uri_root.rstrip("/")
        rel = self.uri_root.split("://", 1)[1]
        super().__init__(
            os.path.join(base_dir, *rel.split("/")), storage_options
        )


class HttpByteStore(ByteStore):
    """Read-only store over plain HTTP(S) using only the standard
    library — no optional dependency, so the remote-store branch is
    executable (and tested, tests/test_http_store.py) even where
    fsspec/s3fs are absent. Mirrors the reference's remote-first
    design (reference zarr_storage.py:190-211) for the one remote
    protocol reachable in any environment.

    * Ranged reads use the HTTP ``Range`` header — a positive offset
      maps to ``bytes=start-end``, a negative offset to a suffix range
      ``bytes=-N`` — so shard-index and inner-chunk fetches transfer
      only the bytes they need. A server that ignores ``Range``
      (responds 200, not 206) degrades gracefully: the body is sliced
      locally.
    * Missing keys (404) → ``None``, matching the store contract;
      a 416 beyond-EOF range → ``b""``, matching ``LocalByteStore``'s
      seek-past-end behavior.
    * Transient failures (5xx, connection errors, timeouts) retry
      with exponential backoff; ``storage_options`` accepts
      ``timeout`` (s), ``retries``, and ``headers`` (e.g. auth).
    * Listing is impossible over plain HTTP, so stores must be opened
      via consolidated metadata (``.zmetadata`` / root ``zarr.json``)
      or direct array paths — ``list_prefix`` raises with that hint.
    """

    def __init__(self, root: str, storage_options: dict | None = None):
        super().__init__(root, storage_options)
        self._timeout = float(self.storage_options.get("timeout", 10.0))
        self._retries = int(self.storage_options.get("retries", 2))
        self._headers = dict(self.storage_options.get("headers", {}))

    def _fetch(self, key: str, range_header: str | None) -> tuple[int, bytes] | None:
        """(status, body) for GET root/key, None on 404; retries
        transient errors. Auth/proxy behavior is urllib's."""
        import time as _time
        import urllib.error
        import urllib.parse
        import urllib.request

        url = f"{self.root}/{urllib.parse.quote(key)}"
        headers = dict(self._headers)
        if range_header:
            headers["Range"] = range_header
        for attempt in range(self._retries + 1):
            req = urllib.request.Request(url, headers=headers)
            try:
                with urllib.request.urlopen(req, timeout=self._timeout) as r:
                    return r.status, r.read()
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    return None
                if e.code == 416:
                    return e.code, b""
                if e.code >= 500 and attempt < self._retries:
                    _time.sleep(0.1 * (2 ** attempt))
                    continue
                raise
            except (urllib.error.URLError, TimeoutError, OSError):
                if attempt < self._retries:
                    _time.sleep(0.1 * (2 ** attempt))
                    continue
                raise
        raise AssertionError("unreachable")

    def get(self, key: str) -> bytes | None:
        got = self._fetch(key, None)
        return None if got is None else got[1]

    def get_range(self, key: str, offset: int, length: int) -> bytes | None:
        if length <= 0:
            # existence probe only — 1-byte range, not a full download
            return None if self._fetch(key, "bytes=0-0") is None else b""
        if offset >= 0:
            rng = f"bytes={offset}-{offset + length - 1}"
        else:
            rng = f"bytes=-{-offset}"
        got = self._fetch(key, rng)
        if got is None:
            return None
        status, body = got
        if status == 206:
            return body[:length] if offset < 0 else body
        if status == 416:
            return b""
        # Range ignored: full body — apply the base slicing semantics.
        start = offset if offset >= 0 else max(0, len(body) + offset)
        return body[start:start + length]

    def list_prefix(self, prefix: str = "") -> list[str]:
        raise NotImplementedError(
            "plain HTTP cannot list objects; open http(s):// stores via "
            "consolidated metadata (.zmetadata / root zarr.json)"
        )


class FsspecByteStore(ByteStore):
    """S3/HTTP/... store via fsspec/s3fs — optional dependency.

    Mirrors the reference's S3-first design (zarr_storage.py:190-211
    builds an s3fs filesystem from storage_options); raises a clear
    ImportError when the extra isn't installed.
    """

    def __init__(self, root: str, storage_options: dict | None = None):
        super().__init__(root, storage_options)
        try:
            import fsspec  # type: ignore
        except ImportError as e:  # pragma: no cover - optional dep
            raise ImportError(
                f"reading {root!r} requires the optional 'fsspec' (and for "
                "s3:// URLs 's3fs') package; only local paths are supported "
                "without it"
            ) from e
        self._fs, self._root = fsspec.core.url_to_fs(root, **(storage_options or {}))
        self._root = self._root.rstrip("/")

    def get(self, key: str) -> bytes | None:
        path = f"{self._root}/{key}"
        try:
            with self._fs.open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def get_range(self, key: str, offset: int, length: int) -> bytes | None:
        path = f"{self._root}/{key}"
        try:
            if offset < 0:
                # suffix range needs the object size (fsspec cat_file
                # has no suffix syntax; one HEAD-equivalent call)
                offset = max(0, self._fs.size(path) + offset)
            return self._fs.cat_file(path, start=offset, end=offset + length)
        except FileNotFoundError:
            return None
        except Exception:
            return super().get_range(key, offset, length)

    def put(self, key: str, data: bytes) -> None:
        self._fs.pipe_file(f"{self._root}/{key}", data)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        # fsspec's mode="create" maps to a CONDITIONAL write on
        # backends that have one (s3fs → S3 If-None-Match:* since the
        # 2024 conditional-write API; raises FileExistsError on the
        # 412) — a real CAS there. Backends/versions without the
        # kwarg fall back to the base check-then-put; cas_atomic
        # stays False because this class cannot promise the backend
        # honors the condition (a deployment that knows its backend
        # subclasses and sets it True).
        path = f"{self._root}/{key}"
        try:
            self._fs.pipe_file(path, data, mode="create")
            return True
        except FileExistsError:
            return False
        except (TypeError, ValueError, NotImplementedError):
            return super().put_if_absent(key, data)

    def delete_prefix(self, prefix: str = "") -> None:
        path = f"{self._root}/{prefix}" if prefix else self._root
        try:
            self._fs.rm(path, recursive=True)
        except FileNotFoundError:
            pass

    def list_prefix(self, prefix: str = "") -> list[str]:
        path = f"{self._root}/{prefix}" if prefix else self._root
        try:
            return sorted(
                p.rstrip("/").rsplit("/", 1)[-1] for p in self._fs.ls(path)
            )
        except FileNotFoundError:
            return []

    def size(self, key: str) -> int | None:
        try:
            return self._fs.size(f"{self._root}/{key}")
        except FileNotFoundError:
            return None

    def copy(self, src: str, dst: str) -> None:
        # fsspec routes this to the filesystem's native copy — for
        # s3fs that is S3 CopyObject, a true server-side copy: the
        # bytes never transit the driver
        self._fs.copy(f"{self._root}/{src}", f"{self._root}/{dst}")

    def list_prefix_detail(self, prefix: str = "") -> list[tuple[str, int | None]]:
        # one LIST call returns names AND sizes (S3 ListObjectsV2
        # semantics) — the manifest-commit sizing path never HEADs
        # per file
        path = f"{self._root}/{prefix}" if prefix else self._root
        try:
            entries = self._fs.ls(path, detail=True)
        except FileNotFoundError:
            return []
        out = []
        for e in entries:
            name = e["name"].rstrip("/").rsplit("/", 1)[-1]
            size = e.get("size") if e.get("type") == "file" else None
            out.append((name, size))
        return sorted(out)

    #: fsspec protocols whose bytes live in the DRIVER PROCESS (or a
    #: driver-local cache) — an executor rebuilding one would read an
    #: empty/unrelated namespace, so they never distribute.
    _PROCESS_LOCAL_SCHEMES = (
        "memory",
        "filecache",
        "blockcache",
        "simplecache",
    )

    def executor_spec(self) -> tuple | None:
        # fsspec stores rebuild on executors through the SAME
        # for_path machinery (fsspec must be installed cluster-wide —
        # it was importable on the driver to construct this instance,
        # and a cluster shipping this package ships its deps).
        # Process-local protocols (memory://, cache wrappers) are
        # excluded: their bytes exist only in the driver's process,
        # and a rebuilt executor store would raise FileNotFoundError
        # on every footer where the serial loop worked.
        # ``distributed_footers=False`` opts out anything else the
        # rule can't see — e.g. credentials that exist only on the
        # driver.
        if self.storage_options.get("distributed_footers") is False:
            return None
        scheme = self.root.split("://", 1)[0] if "://" in self.root else ""
        if scheme in self._PROCESS_LOCAL_SCHEMES:
            return None
        opts = {
            k: v
            for k, v in self.storage_options.items()
            if k != "distributed_footers"
        }
        return ("path", self.root, opts or None)

    def copy_to(self, src_key: str, dst_store: "ByteStore", dst_key: str) -> None:
        if isinstance(dst_store, FsspecByteStore) and type(
            dst_store._fs
        ) is type(self._fs):
            # same filesystem class (e.g. both s3fs): server-side copy
            self._fs.copy(
                f"{self._root}/{src_key}",
                f"{dst_store._root}/{dst_key}",
            )
            return
        super().copy_to(src_key, dst_store, dst_key)


# --------------------------------------------------------------------------
# Codecs
# --------------------------------------------------------------------------


def _numcodecs_decode(raw: bytes, config: dict) -> bytes | None:
    """Decode via numcodecs when installed (the production path for
    codecs the pure-Python layer doesn't cover); None when the package
    is absent."""
    try:
        import numcodecs  # type: ignore
    except ImportError:
        return None
    codec = numcodecs.get_codec(dict(config))
    out = codec.decode(raw)
    return bytes(out) if not isinstance(out, bytes) else out


def _decode_bytes(raw: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "zlib":
        return _zlib.decompress(raw)
    if cid == "gzip":
        return _gzip.decompress(raw)
    if cid == "blosc":
        # Prefer the C implementation when present; else the vendored
        # pure-Python frame decoder (lz4/zlib/memcpyed inner codecs).
        via_numcodecs = _numcodecs_decode(raw, compressor)
        if via_numcodecs is not None:
            return via_numcodecs
        from cae_polars_tools_spark.sources.blosc_codec import (
            BloscFormatError,
            blosc_decompress,
        )

        try:
            return blosc_decompress(raw)
        except BloscFormatError as e:
            raise ValueError(
                f"blosc chunk not decodable by the pure-Python path ({e}); "
                "install 'numcodecs' (or 'zarr') on driver and executors "
                "for full blosc support"
            ) from e
    via_numcodecs = _numcodecs_decode(raw, compressor)
    if via_numcodecs is not None:
        return via_numcodecs
    raise ValueError(
        f"unsupported zarr compressor {cid!r}: the pure-Python reader "
        "supports null/zlib/gzip/blosc(lz4); install 'numcodecs' for "
        f"{cid!r} stores"
    )


def _encode_bytes(data: bytes, compressor: dict | None, typesize: int = 1) -> bytes:
    if compressor is None:
        return data
    cid = compressor.get("id")
    level = int(compressor.get("level", 5))
    if cid == "zlib":
        return _zlib.compress(data, level)
    if cid == "gzip":
        return _gzip.compress(data, compresslevel=level)
    if cid == "blosc":
        from cae_polars_tools_spark.sources.blosc_codec import (
            blosc_compress_memcpy,
        )

        return blosc_compress_memcpy(data, typesize=typesize)
    raise ValueError(f"unsupported compressor {cid!r} for writing")


def _apply_filters_decode(
    buf: bytes, filters: list[dict], dtype: np.dtype
) -> np.ndarray:
    """Undo the filter chain (last filter encoded last ⇒ decode in
    reverse). Natively: ``delta`` (numcodecs semantics — stored as
    ``astype`` diffs, cumulative-summed back in wraparound arithmetic);
    anything else via numcodecs when installed."""
    data: Any = buf
    for config in reversed(filters):
        fid = config.get("id")
        if fid == "delta":
            astype = np.dtype(config.get("astype", config["dtype"]))
            out_dtype = np.dtype(config["dtype"])
            enc = np.frombuffer(data, dtype=astype)
            # cumsum in the output dtype: integer wraparound matches
            # numcodecs' Delta.decode (cumsum into a dtype-typed out).
            dec = np.cumsum(enc, dtype=out_dtype)
            data = dec.astype(out_dtype, copy=False).tobytes()
            continue
        try:
            import numcodecs  # type: ignore
        except ImportError:
            raise ValueError(
                f"zarr filter {fid!r} is not supported by the pure-Python "
                "reader (only 'delta'); install 'numcodecs' for this store"
            ) from None
        out = numcodecs.get_codec(dict(config)).decode(data)
        data = bytes(out) if not isinstance(out, bytes) else out
    return np.frombuffer(data, dtype=dtype)


# --------------------------------------------------------------------------
# Array
# --------------------------------------------------------------------------


@dataclass
class ZarrV2Array:
    """Lazy handle to one Zarr v2 array; reads only requested chunks.

    Equivalent role to ``zarr.Array`` in the reference (opened via
    zarr_storage.py:327-360); indexing is orthogonal (per-dimension
    int / slice / integer-list), matching how the reference applies
    ``select_dims`` (zarr_reader.py:319-322).
    """

    store: ByteStore
    path: str  # prefix inside store ('' for root-level arrays)
    shape: tuple[int, ...]
    chunks: tuple[int, ...]
    dtype: np.dtype
    compressor: dict | None
    fill_value: Any
    order: str = "C"
    dimension_separator: str = "."
    filters: list | None = None
    attrs: dict = field(default_factory=dict)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def nchunks(self) -> tuple[int, ...]:
        return tuple(
            -(-s // c) for s, c in zip(self.shape, self.chunks)
        )  # ceil-div

    # -- chunk IO ----------------------------------------------------------
    def _chunk_key(self, chunk_idx: tuple[int, ...]) -> str:
        name = self.dimension_separator.join(str(i) for i in chunk_idx) or "0"
        return f"{self.path}/{name}" if self.path else name

    def read_chunk(self, chunk_idx: tuple[int, ...]) -> np.ndarray:
        """Decode one chunk to its full chunk-shaped ndarray (edge chunks
        are stored at full chunk shape in v2)."""
        raw = self.store.get(self._chunk_key(chunk_idx))
        if raw is None:
            fill = 0 if self.fill_value is None else self.fill_value
            return np.full(self.chunks, fill, dtype=self.dtype)
        buf = _decode_bytes(raw, self.compressor)
        if self.filters:
            arr = _apply_filters_decode(buf, self.filters, self.dtype)
        else:
            arr = np.frombuffer(buf, dtype=self.dtype)
        if arr.size != int(np.prod(self.chunks)):
            raise ValueError(
                f"chunk {chunk_idx} has {arr.size} elements, expected "
                f"{int(np.prod(self.chunks))}"
            )
        arr = arr.reshape(self.chunks, order=self.order)
        if self.order == "F":
            arr = np.ascontiguousarray(arr)
        return arr

    # -- orthogonal indexing ----------------------------------------------
    def oindex(self, selection: tuple) -> np.ndarray:
        """Orthogonal (outer) indexing with per-dim int/slice/list.

        Only chunks intersecting the selection are fetched+decoded —
        this is the reference's selection-pushdown-to-storage
        (zarr_reader.py:311-322) and the basis for Spark partition
        pruning.
        """
        if len(selection) != self.ndim:
            raise ValueError(
                f"selection has {len(selection)} entries for a "
                f"{self.ndim}-D array"
            )
        idx_per_dim: list[np.ndarray] = []
        squeeze: list[bool] = []
        for d, sel in enumerate(selection):
            n = self.shape[d]
            if isinstance(sel, (int, np.integer)):
                i = int(sel)
                if i < 0:
                    i += n
                if not 0 <= i < n:
                    raise IndexError(f"index {sel} out of bounds for dim {d} (size {n})")
                idx_per_dim.append(np.array([i], dtype=np.int64))
                squeeze.append(True)
            elif isinstance(sel, slice):
                idx_per_dim.append(np.arange(*sel.indices(n), dtype=np.int64))
                squeeze.append(False)
            else:  # integer list/array
                arr = np.asarray(sel, dtype=np.int64)
                arr = np.where(arr < 0, arr + n, arr)
                if arr.size and (arr.min() < 0 or arr.max() >= n):
                    raise IndexError(f"index out of bounds for dim {d} (size {n})")
                idx_per_dim.append(arr)
                squeeze.append(False)

        out_shape = tuple(len(ix) for ix in idx_per_dim)
        out = np.empty(out_shape, dtype=self.dtype)
        if out.size:
            chunk_of = [ix // c for ix, c in zip(idx_per_dim, self.chunks)]
            within = [ix % c for ix, c in zip(idx_per_dim, self.chunks)]
            uniq = [np.unique(co) for co in chunk_of]
            for combo in itertools.product(*(u.tolist() for u in uniq)):
                pos = [np.nonzero(chunk_of[d] == combo[d])[0] for d in range(self.ndim)]
                if any(p.size == 0 for p in pos):
                    continue
                chunk = self.read_chunk(combo)
                src = tuple(within[d][pos[d]] for d in range(self.ndim))
                out[np.ix_(*pos)] = chunk[np.ix_(*src)]
        sq = tuple(0 if s else slice(None) for s in squeeze)
        return out[sq]

    def __getitem__(self, selection) -> np.ndarray:
        if not isinstance(selection, tuple):
            selection = (selection,)
        return self.oindex(selection)


# --------------------------------------------------------------------------
# Group / store metadata
# --------------------------------------------------------------------------


def _load_json(store: ByteStore, key: str) -> dict | None:
    raw = store.get(key)
    return None if raw is None else json.loads(raw.decode("utf-8"))


@dataclass
class ZarrV2Group:
    """A zarr v2 group: arrays + subgroups + attributes."""

    store: ByteStore
    path: str = ""  # prefix inside store
    consolidated: dict | None = None  # {".zgroup": {...}, "a/.zarray": ...}
    attrs: dict = field(default_factory=dict)

    def _key(self, *parts: str) -> str:
        return "/".join(p for p in (self.path, *parts) if p)

    def _meta(self, key: str) -> dict | None:
        if self.consolidated is not None:
            return self.consolidated.get(self._key(key) if self.path else key)
        return _load_json(self.store, self._key(key))

    def _child_meta(self, name: str, meta_file: str) -> dict | None:
        if self.consolidated is not None:
            return self.consolidated.get(self._key(name, meta_file))
        return _load_json(self.store, self._key(name, meta_file))

    # -- navigation --------------------------------------------------------
    def subgroup(self, name: str) -> "ZarrV2Group":
        for part in name.strip("/").split("/"):
            gmeta = (
                self.consolidated.get(self._key(part, ".zgroup"))
                if self.consolidated is not None
                else _load_json(self.store, self._key(part, ".zgroup"))
            )
            if gmeta is None:
                raise KeyError(f"no subgroup {part!r} under {self.path!r}")
            attrs = (
                self.consolidated.get(self._key(part, ".zattrs"))
                if self.consolidated is not None
                else _load_json(self.store, self._key(part, ".zattrs"))
            ) or {}
            self = ZarrV2Group(
                store=self.store,
                path=self._key(part),
                consolidated=self.consolidated,
                attrs=attrs,
            )
        return self

    def member_names(self) -> list[str]:
        """Immediate children (array or group names)."""
        if self.consolidated is not None:
            prefix = f"{self.path}/" if self.path else ""
            names = set()
            for key in self.consolidated:
                if not key.startswith(prefix):
                    continue
                rest = key[len(prefix):]
                if "/" in rest:
                    names.add(rest.split("/", 1)[0])
            return sorted(names)
        return [
            n
            for n in self.store.list_prefix(self.path)
            if not n.startswith(".")
        ]

    def array_names(self) -> list[str]:
        """Children that are arrays (have .zarray → shape+dtype), mirroring
        the reference's 'has shape and dtype' filter (zarr_storage.py:312)."""
        out = []
        for n in self.member_names():
            try:
                if self._child_meta(n, ".zarray") is not None:
                    out.append(n)
            except Exception:  # skip unreadable members, like the reference
                continue
        return out

    def get_array(self, name: str) -> ZarrV2Array:
        zmeta = self._child_meta(name, ".zarray")
        if zmeta is None:
            raise KeyError(f"array {name!r} not found in group {self.path!r}")
        attrs = self._child_meta(name, ".zattrs") or {}
        if zmeta.get("zarr_format") != 2:
            raise ValueError(
                f"array {name!r}: only zarr v2 is supported by the minimal "
                f"reader (zarr_format={zmeta.get('zarr_format')!r})"
            )
        return ZarrV2Array(
            store=self.store,
            path=self._key(name),
            shape=tuple(zmeta["shape"]),
            chunks=tuple(zmeta["chunks"]),
            dtype=np.dtype(zmeta["dtype"]),
            compressor=zmeta.get("compressor"),
            fill_value=zmeta.get("fill_value"),
            order=zmeta.get("order", "C"),
            dimension_separator=zmeta.get("dimension_separator", "."),
            filters=zmeta.get("filters"),
            attrs=attrs,
        )


def open_group(
    store_path: str,
    storage_options: dict | None = None,
    group: str | None = None,
    consolidated: bool | None = None,
) -> "ZarrV2Group":
    """Open a zarr store read-only. v2: the reference's consolidated-
    metadata ladder (zarr_storage.py:213-283) — try ``.zmetadata`` when
    consolidated is True/None, fall back to per-file metadata, wrap
    failures in ValueError. A store with no v2 metadata but a root
    ``zarr.json`` dispatches to the v3 path (sources/zarr_v3.py),
    which returns a duck-type-compatible group handle."""
    store = ByteStore.for_path(store_path, storage_options)

    cmeta: dict | None = None
    if consolidated is not False:
        try:
            doc = _load_json(store, ".zmetadata")
            if doc is not None:
                cmeta = doc["metadata"]
        except Exception:
            if consolidated is True:
                raise ValueError(
                    f"consolidated metadata requested but unreadable at "
                    f"{store_path!r}/.zmetadata"
                )
            cmeta = None
        # _load_json returns None for a MISSING document without
        # raising — "True forces consolidated metadata" must fail
        # loudly here too, not fall back to per-file reads (which on a
        # list-less HTTP store would die much later with an unrelated
        # cannot-list error)
        if consolidated is True and cmeta is None:
            raise ValueError(
                f"consolidated metadata requested but absent at "
                f"{store_path!r}/.zmetadata"
            )

    root_group_meta = (
        cmeta.get(".zgroup") if cmeta is not None else _load_json(store, ".zgroup")
    )
    root_array_meta = (
        cmeta.get(".zarray") if cmeta is not None else _load_json(store, ".zarray")
    )
    if root_group_meta is None and root_array_meta is None:
        # Not v2 — v3 stores carry one zarr.json per node instead.
        v3_meta = _load_json(store, "zarr.json")
        if v3_meta is not None and v3_meta.get("zarr_format") == 3:
            from cae_polars_tools_spark.sources.zarr_v3 import open_group_v3

            return open_group_v3(store, v3_meta, group=group)
        raise ValueError(
            f"failed to open zarr store at {store_path!r}: no v2 "
            ".zgroup/.zarray and no v3 zarr.json metadata found"
        )
    attrs = (
        cmeta.get(".zattrs") if cmeta is not None else _load_json(store, ".zattrs")
    ) or {}
    g = ZarrV2Group(store=store, path="", consolidated=cmeta, attrs=attrs)
    if group:
        g = g.subgroup(group)
    return g


# --------------------------------------------------------------------------
# Writer (tests / demos / `read`-style round trips)
# --------------------------------------------------------------------------


def _delta_encode(flat: np.ndarray, config: dict) -> np.ndarray:
    """numcodecs-Delta-compatible encode (wraparound subtraction)."""
    astype = np.dtype(config.get("astype", config["dtype"]))
    enc = np.empty(flat.shape, dtype=astype)
    if len(flat):
        enc[0] = flat[0]
        np.subtract(flat[1:], flat[:-1], out=enc[1:], casting="unsafe")
    return enc


def write_array(
    root: str,
    name: str,
    data: np.ndarray,
    chunks: tuple[int, ...] | None = None,
    compressor: dict | None = None,
    attrs: dict | None = None,
    fill_value: Any = 0,
    filters: list[dict] | None = None,
) -> None:
    """Write one array into a local zarr v2 store directory. Writable
    filters: ``delta`` only (reading supports more via numcodecs)."""
    store = LocalByteStore(root)
    data = np.asarray(data)
    if chunks is None:
        chunks = tuple(min(s, 64) or 1 for s in data.shape)
    for f in filters or []:
        if f.get("id") != "delta":
            raise ValueError(f"unsupported write filter {f.get('id')!r}")
    zmeta = {
        "zarr_format": 2,
        "shape": list(data.shape),
        "chunks": list(chunks),
        "dtype": data.dtype.str,
        "compressor": compressor,
        "fill_value": fill_value,
        "order": "C",
        "filters": filters or None,
    }
    store.put(f"{name}/.zarray", json.dumps(zmeta).encode())
    store.put(f"{name}/.zattrs", json.dumps(attrs or {}).encode())
    nchunks = tuple(-(-s // c) for s, c in zip(data.shape, chunks)) or ()
    for idx in itertools.product(*(range(n) for n in nchunks)) if nchunks else [()]:
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, data.shape)
        )
        block = data[sl]
        # v2 stores edge chunks padded to full chunk shape
        if block.shape != tuple(chunks):
            padded = np.full(chunks, fill_value if fill_value is not None else 0, dtype=data.dtype)
            padded[tuple(slice(0, e) for e in block.shape)] = block
            block = padded
        key = f"{name}/{'.'.join(str(i) for i in idx) or '0'}"
        flat = np.ascontiguousarray(block).reshape(-1)
        for f in filters or []:
            flat = _delta_encode(flat, f)
        store.put(
            key,
            _encode_bytes(
                flat.tobytes(), compressor, typesize=data.dtype.itemsize
            ),
        )


def write_group(
    root: str,
    arrays: dict[str, np.ndarray],
    dims: dict[str, tuple[str, ...]] | None = None,
    coords: dict[str, np.ndarray] | None = None,
    chunks: dict[str, tuple[int, ...]] | None = None,
    attrs: dict | None = None,
    compressor: dict | None = {"id": "zlib", "level": 5},
    consolidate: bool = True,
    group_attrs: dict | None = None,
) -> str:
    """Write a local zarr v2 store: data arrays + 1-D coordinate arrays
    named after dimensions (the xarray `_ARRAY_DIMENSIONS` convention
    the reference relies on, zarr_storage.py:392-395)."""
    store = LocalByteStore(root)
    store.put(".zgroup", json.dumps({"zarr_format": 2}).encode())
    store.put(".zattrs", json.dumps(group_attrs or {}).encode())
    dims = dims or {}
    for name, data in arrays.items():
        a_attrs = dict((attrs or {}).get(name, {})) if attrs else {}
        if name in dims:
            a_attrs["_ARRAY_DIMENSIONS"] = list(dims[name])
        write_array(
            root,
            name,
            data,
            chunks=(chunks or {}).get(name),
            compressor=compressor,
            attrs=a_attrs,
        )
    for cname, cdata in (coords or {}).items():
        write_array(
            root,
            cname,
            np.asarray(cdata),
            compressor=compressor,
            attrs={"_ARRAY_DIMENSIONS": [cname]},
        )
    if consolidate:
        consolidate_metadata(root)
    return root


def consolidate_metadata(root: str) -> None:
    """Build ``.zmetadata`` from per-file metadata (one S3 GET at open
    time instead of N — the reference's fast-open path)."""
    meta: dict[str, Any] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        rel = "" if rel == "." else rel.replace(os.sep, "/")
        for fn in filenames:
            if fn in (".zgroup", ".zattrs", ".zarray"):
                key = f"{rel}/{fn}" if rel else fn
                with open(os.path.join(dirpath, fn), "rb") as f:
                    meta[key] = json.loads(f.read().decode())
    doc = {"metadata": meta, "zarr_consolidated_format": 1}
    with open(os.path.join(root, ".zmetadata"), "wb") as f:
        f.write(json.dumps(doc).encode())

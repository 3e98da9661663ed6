"""Manifest-based dataset versions — metadata-only commits.

The round-12 copy-on-write machinery made every version a
SELF-CONTAINED directory: files the verb did not touch were copied
byte-for-byte into the fresh version (``storage._copy_untouched``),
so a one-key merge or an ADD COLUMN paid O(table) I/O through a
driver-side loop — correct at bench scale, a scale-killer at 100 TB.

This module is the Delta/Iceberg-class answer: a version is a
**manifest of file references** plus whatever new files the verb
actually wrote. Untouched files are *shared* across versions (they
stay in the version directory that first wrote them), the pointer
flip stays atomic, and vacuum becomes reference-counted — a file is
deleted only when no retained version references it.

Layout invariants:

* every data file lives in the version directory that CREATED it and
  never moves;
* ``vN/_MANIFEST.json`` lists the version's files as POSIX paths
  relative to the table root (``"v0/part-....parquet"``), plus the
  schema the version commits to (Spark schema JSON) — so an empty
  version and a schema-evolved version both read correctly;
* a directory WITHOUT a manifest is a legacy self-contained version
  (read the whole directory) — old tables keep working;
* vacuum demotes a version whose files are still shared into a
  **husk**: sidecars deleted, a ``_TOMBSTONE.json`` written (the
  version is no longer readable), shared data files kept until the
  last referencing version is itself vacuumed.

Hive-partitioned layouts are supported: a reference like
``bands_v0/shard=3/part-....parquet`` re-derives its partition
columns at read time by grouping references by their birth directory
and scanning each group under its own ``basePath`` (Spark refuses a
single ``basePath`` across version directories —
CONFLICTING_DIRECTORY_STRUCTURES — so the read is a union of
per-birth-dir scans; filters and partition pruning push into every
branch).

Nothing here is a port of the reference (``/root/reference`` has no
writers at all — its storage layer only reads zarr stores); the
design follows the public Delta/Iceberg snapshot-manifest model.
"""

from __future__ import annotations

import json
import os
import posixpath
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"
TOMBSTONE = "_TOMBSTONE.json"

#: Above this many file refs a manifest SHARDS: the pointer document
#: stays a bounded metadata read (Delta checkpoint-parts shape) and
#: the ref list splits into ``_MANIFEST-<token>-NNNNN.json`` side
#: objects the main document names. Tests shrink this to exercise the
#: path; production tables hit it around the million-file mark.
MANIFEST_SHARD_REFS = 100_000

_HIVE_SEG = re.compile(r"^[^=/]+=[^=/]*$")

__all__ = [
    "MANIFEST",
    "TOMBSTONE",
    "MANIFEST_SHARD_REFS",
    "split_ref",
    "group_refs",
    "read_refs",
    "data_file_refs",
    "data_file_stats",
    "write_job_uuids",
    "snapshot_dir",
    "write_manifest",
    "load_manifest",
    "refs_of",
    "sizes_of",
    "rows_of",
    "stats_of",
    "parquet_footer_rows",
    "parquet_footer_stats",
    "footer_accounting",
    "DISTRIBUTE_FOOTER_MIN",
    "refs_intersecting",
    "id_range_of",
    "rewrite_accounting",
    "ref_sizes",
    "uri_to_ref",
    "is_tombstoned",
    "vacuum_refcount",
]


def split_ref(ref: str) -> tuple[str, list[str]]:
    """``(birth_dir, partition_cols)`` of one root-relative file ref.

    Partition directories are the contiguous run of ``key=value``
    segments immediately above the file name (hive layout); everything
    before that run is the birth directory — the directory the verb
    that created the file wrote into, which is the ``basePath`` its
    partition values resolve against."""
    segs = ref.split("/")
    if len(segs) < 1 or not segs[-1]:
        raise ValueError(f"not a file reference: {ref!r}")
    j = len(segs) - 1
    while j - 1 >= 0 and _HIVE_SEG.match(segs[j - 1]):
        j -= 1
    return "/".join(segs[:j]), [s.split("=", 1)[0] for s in segs[j:-1]]


def group_refs(refs: list[str]) -> tuple[dict[str, list[str]], list[str]]:
    """Group refs by birth directory; validate one consistent
    partition-column sequence across the whole set (a mixed layout
    would mis-assign partition values on rewrite — refused, the
    ``storage._dataset_layout`` rule)."""
    groups: dict[str, list[str]] = {}
    pcols: list[str] | None = None
    for r in refs:
        base, cols = split_ref(r)
        if pcols is None:
            pcols = cols
        elif cols != pcols:
            raise ValueError(
                f"mixed partition layouts in manifest ({pcols} vs "
                f"{cols} at {r!r}); repair the layout first"
            )
        groups.setdefault(base, []).append(r)
    return groups, pcols or []


def read_refs(
    spark: SparkSession,
    root: str,
    refs: list[str],
    read_schema=None,
    store=None,
) -> DataFrame:
    """One DataFrame over a manifest's file references.

    Refs sharing a birth directory scan together (one relation, its
    own ``basePath`` so hive partition columns re-materialize); birth
    directories union by name. The union is a narrow plan node —
    filters, column pruning, and partition pruning push into every
    branch, and the branch count equals the number of verbs since the
    last compaction (compaction resets it to 1).

    With ``store`` the Spark-facing paths route through
    ``store.spark_path`` (the s3://-metadata vs s3a://-Spark split);
    without it the paths are plain ``root/ref`` joins — identical for
    local roots, which keeps every historical caller byte-stable."""
    if not refs:
        raise ValueError("read_refs needs at least one file reference")
    root = root.rstrip("/")
    spath = (
        store.spark_path
        if store is not None
        else (lambda key="": f"{root}/{key}" if key else root)
    )
    groups, pcols = group_refs(refs)
    frames = []
    for base in sorted(groups):
        reader = (
            spark.read if read_schema is None else spark.read.schema(read_schema)
        )
        if pcols:
            reader = reader.option("basePath", spath(base))
        frames.append(reader.parquet(*[spath(r) for r in groups[base]]))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def data_file_stats(store, prefix: str = "") -> list[tuple[str, int]]:
    """Recursively list the parquet data files under ``prefix`` as
    ``(root-relative ref, byte size)`` — the post-write inventory of a
    fresh version directory (sidecars, ``_SUCCESS`` markers, and
    ``.crc`` shadows are not data). Sizes come from the directory
    LISTING itself (``list_prefix_detail`` — one scandir / LIST page
    per directory), never a per-file stat, so commit-time sizing adds
    zero metadata round-trips over the listing the inventory already
    pays."""
    out: list[tuple[str, int]] = []
    for name, size in store.list_prefix_detail(prefix):
        n = name.rstrip("/")
        if n.startswith(("_", ".")):
            continue
        child = f"{prefix}/{n}" if prefix else n
        if n.endswith(".parquet"):
            if size is None:
                # a backend whose LIST omits file sizes must not make
                # a data file vanish from the inventory (it would be
                # silently excluded from the manifest — invisible
                # rows): fall back to a per-file stat, recurse only if
                # the name really is a directory, and otherwise refuse
                size = store.size(child)
                if size is None:
                    if store.list_prefix(child):
                        out.extend(data_file_stats(store, child))
                        continue
                    raise FileNotFoundError(
                        f"data file {child!r} appeared in the listing "
                        f"of {store.root!r} but has no size and is "
                        "not a directory — refusing to inventory a "
                        "file the commit cannot account for"
                    )
            out.append((child, size))
        elif size is None:
            out.extend(data_file_stats(store, child))
    return sorted(out)


def data_file_refs(store, prefix: str = "") -> list[str]:
    """Ref-only view of :func:`data_file_stats`."""
    return [r for r, _ in data_file_stats(store, prefix)]


#: Spark part-file naming: ``part-NNNNN-<job uuid>-c000[.codec].parquet``
#: (the uuid is per WRITE JOB, shared by every task of one write) —
#: the attribution handle :func:`write_job_uuids` parses.
_PART_UUID = re.compile(
    r"part-\d+-([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-"
    r"[0-9a-f]{12})[-.]"
)


def write_job_uuids(refs: list[str]) -> set[str] | None:
    """The distinct Spark write-job UUIDs embedded in the part-file
    names, or None when any name carries no parseable uuid (foreign
    writer, custom committer — no attribution possible, callers skip
    their check). One Spark write = one uuid across every task and
    hive partition, so a fresh version directory inventoried after a
    single-write verb must show EXACTLY one — a second uuid is
    another writer's interleaved output."""
    out: set[str] = set()
    for r in refs:
        m = _PART_UUID.search(r.rsplit("/", 1)[-1])
        if m is None:
            return None
        out.add(m.group(1))
    return out


def snapshot_dir(store, prefix: str = "") -> set[str]:
    """The physical data files present NOW — taken immediately before
    an append write so the commit can adopt exactly the post-minus-pre
    delta (crash orphans from an earlier attempt are in the snapshot,
    so they are never silently adopted as fresh data)."""
    return {r for r, _ in data_file_stats(store, prefix)}


def _shard_token(refs: list[str]) -> str:
    import hashlib

    return hashlib.md5("\n".join(refs).encode()).hexdigest()[:12]


def _footer_metadata(store, ref: str, size: int | None = None):
    """The parquet FOOTER of one store object as pyarrow FileMetaData,
    via ranged reads — never a data scan, works on any ByteStore (two
    ``get_range`` calls: the 8-byte tail for the footer length, then
    the Thrift-encoded footer itself, wrapped back into the minimal
    ``PAR1 + footer + len + PAR1`` container pyarrow parses)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if size is None:
        size = store.size(ref)
        if size is None:
            raise FileNotFoundError(f"{ref!r} not found in {store.root!r}")
    tail = store.get_range(ref, size - 8, 8)
    if tail is None or len(tail) != 8 or tail[4:] != b"PAR1":
        raise ValueError(f"{ref!r} is not a parquet file (bad tail)")
    flen = int.from_bytes(tail[:4], "little")
    foot = store.get_range(ref, size - 8 - flen, flen)
    buf = b"PAR1" + foot + tail
    return pq.ParquetFile(pa.BufferReader(buf)).metadata


def parquet_footer_rows(store, ref: str, size: int | None = None) -> int:
    """Row count of one parquet file from its footer
    (:func:`_footer_metadata`). Commit-time row accounting uses this
    so later merges size themselves from the manifest instead of
    running a count job over the whole table."""
    return _footer_metadata(store, ref, size).num_rows


#: Stats values longer than this are DROPPED rather than truncated:
#: a truncated string min stays a sound lower bound, but a truncated
#: max is not a sound upper bound (parquet itself must increment the
#: last byte), so the manifest simply records nothing — the file
#: stays a candidate for every probe on that column.
STATS_MAX_STRLEN = 64


def _stat_bounds(col) -> tuple | None:
    """Sound ``(lo, hi)`` bounds for one column CHUNK's statistics, or
    None when the chunk cannot prune soundly. The single place the
    per-type soundness rules live — :func:`parquet_footer_stats`
    documents them."""
    st = col.statistics
    if st is None or not st.has_min_max:
        return None
    lt = st.logical_type
    t = lt.type if lt is not None else None
    if t == "TIMESTAMP" and col.physical_type == "INT64":
        # record timestamps as EPOCH-MICROS ints — parquet stores them
        # as int64, ordering on the int equals ordering on time, and
        # there is no NaN hole. Only isAdjustedToUTC instants qualify:
        # the probe side converts its batch range with unix_micros()
        # (UTC-based, deterministic under any session timezone), so a
        # wall-clock NTZ file would compare across semantics. Millis
        # scale exactly; nanos floor the min and CEIL the max so the
        # recorded box always contains the true values.
        info = json.loads(lt.to_json())
        if not info.get("isAdjustedToUTC"):
            return None
        unit = info.get("timeUnit")
        if unit == "microseconds":
            return st.min_raw, st.max_raw
        if unit == "milliseconds":
            return st.min_raw * 1000, st.max_raw * 1000
        if unit == "nanoseconds":
            return st.min_raw // 1000, -(-st.max_raw // 1000)
        return None
    if t == "DATE" and col.physical_type == "INT32":
        # dates record as EPOCH-DAYS ints (the physical encoding);
        # the probe side converts with unix_date()
        return st.min_raw, st.max_raw
    if t == "DECIMAL":
        # decimals record as UNSCALED ints TAGGED with their scale
        # ([lo, hi, {"t": "dec", "s": N}]): exact integer ordering,
        # no float round-trip. The tag makes the encoding explicit —
        # refs_intersecting compares a range only against a probe
        # carrying the IDENTICAL tag, so a scale drift between files
        # (foreign writers) degrades to candidacy, never a wrong
        # prune. Physical encodings per the parquet spec: INT32/INT64
        # hold the unscaled value directly; (FIXED_LEN_)BYTE_ARRAY is
        # big-endian two's-complement. NB pyarrow's converted st.min
        # RAISES on int-physical decimals, so this branch must come
        # before the generic path.
        info = json.loads(lt.to_json())
        s = info.get("scale")
        if s is None:
            return None
        if col.physical_type in ("INT32", "INT64"):
            lo, hi = st.min_raw, st.max_raw
        elif col.physical_type in ("FIXED_LEN_BYTE_ARRAY", "BYTE_ARRAY"):
            lo = int.from_bytes(st.min_raw, "big", signed=True)
            hi = int.from_bytes(st.max_raw, "big", signed=True)
        else:
            return None
        return lo, hi, {"t": "dec", "s": s}
    try:
        lo, hi = st.min, st.max
    except Exception:
        # pyarrow cannot convert every physical/logical combination
        # (ArrowNotImplementedError on some) — an unconvertible stat
        # is no stat, and a commit must never crash over one
        return None
    for v in (lo, hi):
        if isinstance(v, bool) or not isinstance(v, (int, str)):
            return None
        if isinstance(v, str) and len(v) > STATS_MAX_STRLEN:
            return None
    return lo, hi


def parquet_footer_stats(
    store, ref: str, size: int | None = None
) -> tuple[int, dict]:
    """``(num_rows, {column: [min, max]})`` of one parquet file from
    its footer — the per-file pruning statistics a commit records so
    later merges skip files whose key range cannot intersect the
    batch (Delta/Iceberg file-skipping shape), without ever opening
    them.

    Soundness rules (a wrong bound would silently drop updates, so
    every doubt resolves to "no stat → always a candidate"):

    * int/str leaf values are kept as-is. FLOATS ARE EXCLUDED on
      purpose: parquet writers record finite min/max that silently
      exclude NaN, while Spark's join semantics treat NaN = NaN as a
      match — a file holding a NaN key would carry a range that
      denies it, and a NaN-keyed merge would prune the very file it
      must rewrite. Binary and nested paths are likewise dropped
      (JSON round-trip and cross-engine comparison semantics are not
      worth the risk);
    * TIMESTAMP columns (int64, ``isAdjustedToUTC`` only) record as
      epoch-MICROS ints and DATE columns as epoch-DAYS ints — the
      most common CDC/event clustering keys must prune
      (``_stat_bounds`` carries the unit/semantics rules; the merge
      probe converts with ``unix_micros``/``unix_date``). NB Spark
      writes INT96 timestamps by default, which carry no statistics
      at all — set ``spark.sql.parquet.outputTimestampType=
      TIMESTAMP_MICROS`` on tables clustered by a timestamp key;
    * DECIMAL columns record as UNSCALED ints tagged with their scale
      (``[lo, hi, {"t": "dec", "s": N}]``); tagged ranges compare
      only against probes carrying the identical tag, so a scale
      drift degrades to candidacy, never a wrong prune;
    * a column must carry min/max in EVERY row group, else it is
      dropped for the whole file;
    * strings longer than :data:`STATS_MAX_STRLEN` drop the column
      (see the constant's note on truncation)."""
    meta = _footer_metadata(store, ref, size)
    stats: dict = {}
    dropped: set = set()
    for g in range(meta.num_row_groups):
        rg = meta.row_group(g)
        for c in range(rg.num_columns):
            col = rg.column(c)
            name = col.path_in_schema
            if name in dropped or "." in name:
                continue
            bounds = _stat_bounds(col)
            if bounds is None:
                dropped.add(name)
                stats.pop(name, None)
                continue
            lo, hi = bounds[0], bounds[1]
            tag = list(bounds[2:])  # encoding tag (e.g. decimal scale)
            if name in stats:
                prev = stats[name]
                if prev[2:] != tag:  # inconsistent encodings: drop
                    dropped.add(name)
                    stats.pop(name, None)
                    continue
                stats[name] = [min(prev[0], lo), max(prev[1], hi)] + tag
            else:
                stats[name] = [lo, hi] + tag
    return meta.num_rows, stats


#: At or above this many fresh files, commit-time footer accounting
#: runs as a SPARK JOB over the refs instead of a serial driver loop —
#: below it, two ranged GETs per file from the driver are cheaper than
#: a job launch. The threshold matters for the verbs that re-emit
#: every file (``compact``/``zorder``): at 100 TB / 128 MB targets
#: that is ~800k files, and a serial loop would add O(files)
#: sequential object-store round-trips of commit latency; distributed,
#: the driver's round-trips stay O(1) and the manifest still records
#: full rows + column stats. Merges stay under the threshold by
#: construction (fresh files = rewritten candidates).
DISTRIBUTE_FOOTER_MIN = 64


def footer_accounting(
    store, items: list[tuple[str, int]], spark=None
) -> tuple[dict, dict]:
    """``(rows, col_stats)`` for ``(ref, size)`` items via parquet
    footer reads (:func:`parquet_footer_stats` — two ranged GETs per
    file, never a data scan).

    With a SparkSession, :data:`DISTRIBUTE_FOOTER_MIN` or more items,
    and a store whose ``executor_spec()`` says executors can rebuild
    it, the reads fan out as a Spark job (``mapPartitions`` over the
    refs, one store per partition) and only the resulting accounting
    returns to the driver — the collect is bounded metadata (exactly
    what the manifest is about to persist anyway). Everything else —
    small commits, scheme-routed stores whose registry is
    driver-local, opted-out deployments — takes the driver loop."""
    items = list(items)
    rows: dict = {}
    col_stats: dict = {}
    spec = store.executor_spec() if spark is not None else None
    if spec is not None and len(items) >= DISTRIBUTE_FOOTER_MIN:
        sc = spark.sparkContext
        slices = min(len(items), max(1, sc.defaultParallelism))

        def _part(it):
            from cae_polars_tools_spark.manifest import (
                parquet_footer_stats,
            )
            from cae_polars_tools_spark.sources.zarr_format import (
                ByteStore,
            )

            st = ByteStore.from_spec(spec)
            for ref, sz in it:
                n, cst = parquet_footer_stats(st, ref, size=sz)
                yield ref, n, cst

        for ref, n, cst in (
            sc.parallelize(items, slices).mapPartitions(_part).collect()
        ):
            rows[ref] = n
            if cst:
                col_stats[ref] = cst
        return rows, col_stats
    for ref, sz in items:
        n, cst = parquet_footer_stats(store, ref, size=sz)
        rows[ref] = n
        if cst:
            col_stats[ref] = cst
    return rows, col_stats


def id_range_of(values) -> tuple | None:
    """``(lo, hi)`` of an id list for stats pruning, or None when the
    list cannot prune soundly — the ONE implementation of the
    range-derivation rules every pruned-delete caller shares
    (``Table.delete_keys``, the index takedown fast paths): Nones
    drop out (an equi-probe never matches NULL), only int/str/date
    values qualify (floats excluded — the NaN-equality hole
    :func:`parquet_footer_stats` documents; bool is an int subclass
    and excluded explicitly; ``datetime.datetime`` excluded because a
    naive Python datetime's epoch conversion is session-timezone-
    dependent — conservative, the file stays a candidate), and mixed
    incomparable types return None rather than guess. Dates convert
    to epoch-DAYS ints, matching the manifest's recorded encoding."""
    import datetime as _dt

    vals = [v for v in values if v is not None]
    if not vals:
        return None
    if all(
        isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
        for v in vals
    ):
        epoch = _dt.date(1970, 1, 1)
        days = [(v - epoch).days for v in vals]
        return min(days), max(days)
    if any(
        isinstance(v, bool) or not isinstance(v, (int, str))
        for v in vals
    ):
        return None
    try:
        return min(vals), max(vals)
    except TypeError:
        return None


def refs_intersecting(
    file_stats: dict, refs: list[str], ranges: dict
) -> list[str]:
    """The refs that MAY contain a key inside ``ranges`` (``{col:
    (lo, hi)}``) according to the manifest's per-file stats — the
    merge-discovery pruning step. Conservative by construction: a ref
    without stats, a column without a recorded range, or a type
    mismatch all keep the ref a candidate; a ref is pruned only when
    some probed column's recorded [min, max] is PROVABLY disjoint
    from the batch range.

    Ranges and recorded stats may carry an ENCODING TAG as a third
    element (decimal scale: ``[lo, hi, {"t": "dec", "s": N}]``) —
    a range compares against a recorded stat only when the tags are
    IDENTICAL (both absent counts); any mismatch keeps the ref a
    candidate, so two files whose writers scaled a decimal key
    differently can never prune each other's updates."""
    out = []
    for r in refs:
        st = file_stats.get(r)
        keep = True
        if st:
            for col, pr in ranges.items():
                lo, hi = pr[0], pr[1]
                ptag = list(pr[2:])
                rng = st.get(col)
                if not rng or lo is None or hi is None:
                    continue
                if list(rng[2:]) != ptag:
                    continue  # different encodings: stay a candidate
                fmin, fmax = rng[0], rng[1]
                try:
                    if fmax < lo or fmin > hi:
                        keep = False
                        break
                except TypeError:
                    continue  # incomparable types: stay a candidate
        if keep:
            out.append(r)
    return out


def write_manifest(
    store,
    version_dir: str,
    refs: list[str],
    schema_json: dict | None = None,
    extra: dict | None = None,
    sizes: dict | None = None,
    rows: dict | None = None,
    col_stats: dict | None = None,
) -> None:
    """Commit a version's file-reference manifest (atomic PUT through
    the ByteStore seam — readers see the previous manifest or this
    one, never a torn write). ``sizes`` records per-file byte sizes
    keyed by ref — CoW verbs then size rewrites from the manifest
    instead of a stat/HEAD per referenced file (the Delta/Iceberg
    per-file-stats convention); refs without a recorded size fall back
    to a stat in :func:`ref_sizes`.

    ``rows`` records per-file ROW counts the same way (taken from
    parquet footers at commit — :func:`parquet_footer_rows`), so a
    merge sizes its bytes-per-row estimate by manifest arithmetic
    instead of a count job over the whole table. ``col_stats``
    records per-file column min/max (``{ref: {col: [min, max]}}``,
    :func:`parquet_footer_stats`) — the file-skipping statistics that
    let a merge prune its affected-file discovery to the files whose
    key range can intersect the batch.

    Past :data:`MANIFEST_SHARD_REFS` refs the list splits into side
    shard objects written BEFORE the main document: shard names embed
    a content token, so a crashed commit can never overwrite a shard
    an OLDER manifest still references, and a retry rewrites the same
    names idempotently. Readers resolve shards in
    :func:`load_manifest`; stale shards from superseded commits are
    ignored by name and stripped with the other sidecars at vacuum."""
    refs = sorted(refs)
    sizes = {r: sizes[r] for r in refs if sizes and r in sizes} or None
    rows = {r: rows[r] for r in refs if rows and r in rows} or None
    col_stats = {
        r: col_stats[r] for r in refs if col_stats and r in col_stats
    } or None
    if len(refs) > MANIFEST_SHARD_REFS:
        token = _shard_token(refs)
        shard_names = []
        for i in range(0, len(refs), MANIFEST_SHARD_REFS):
            part = refs[i:i + MANIFEST_SHARD_REFS]
            name = f"_MANIFEST-{token}-{i // MANIFEST_SHARD_REFS:05d}.json"
            doc = {"files": part}
            if sizes:
                doc["sizes"] = {r: sizes[r] for r in part if r in sizes}
            if rows:
                doc["rows"] = {r: rows[r] for r in part if r in rows}
            if col_stats:
                doc["stats"] = {
                    r: col_stats[r] for r in part if r in col_stats
                }
            store.put(f"{version_dir}/{name}", json.dumps(doc).encode())
            shard_names.append(name)
        main = {
            "format": 2,
            "shards": shard_names,
            "n_files": len(refs),
            "schema": schema_json,
        }
        if extra:
            main.update(extra)
        store.put(f"{version_dir}/{MANIFEST}", json.dumps(main).encode())
        return
    doc = {"format": 1, "files": refs, "schema": schema_json}
    if sizes:
        doc["sizes"] = sizes
    if rows:
        doc["rows"] = rows
    if col_stats:
        doc["stats"] = col_stats
    if extra:
        doc.update(extra)
    store.put(f"{version_dir}/{MANIFEST}", json.dumps(doc).encode())


def load_manifest(store, version_dir: str) -> dict | None:
    """The version's manifest as one flat document — sharded manifests
    (format 2) resolve their shard objects here, so every caller keeps
    seeing ``{"files": [...], "sizes": {...}, "schema": ...}``."""
    raw = store.get(f"{version_dir}/{MANIFEST}")
    if raw is None:
        return None
    doc = json.loads(raw)
    if "shards" not in doc:
        return doc
    files: list[str] = []
    sizes: dict = {}
    rows: dict = {}
    col_stats: dict = {}
    for name in doc["shards"]:
        sraw = store.get(f"{version_dir}/{name}")
        if sraw is None:
            raise FileNotFoundError(
                f"manifest shard {name!r} missing under {version_dir!r} "
                f"in {store.root!r}"
            )
        sdoc = json.loads(sraw)
        files.extend(sdoc["files"])
        sizes.update(sdoc.get("sizes") or {})
        rows.update(sdoc.get("rows") or {})
        col_stats.update(sdoc.get("stats") or {})
    out = {k: v for k, v in doc.items() if k != "shards"}
    out["files"] = files
    if sizes:
        out["sizes"] = sizes
    if rows:
        out["rows"] = rows
    if col_stats:
        out["stats"] = col_stats
    return out


def refs_of(store, version_dir: str) -> list[str]:
    """A version's file references: its manifest when it has one,
    else (legacy self-contained directory) every data file under it."""
    m = load_manifest(store, version_dir)
    if m is not None:
        return list(m["files"])
    return data_file_refs(store, version_dir)


def sizes_of(store, version_dir: str) -> dict:
    """The version's recorded per-file sizes (``{ref: bytes}``) —
    empty for legacy/pre-size manifests, whose callers fall back to
    the stat path in :func:`ref_sizes`."""
    m = load_manifest(store, version_dir)
    return dict(m.get("sizes") or {}) if m is not None else {}


def rows_of(store, version_dir: str) -> dict:
    """The version's recorded per-file row counts (``{ref: n}``) —
    empty for legacy/pre-rows manifests, whose consumers fall back to
    a Spark metadata count."""
    m = load_manifest(store, version_dir)
    return dict(m.get("rows") or {}) if m is not None else {}


def stats_of(store, version_dir: str) -> dict:
    """The version's recorded per-file column min/max stats
    (``{ref: {col: [min, max]}}``) — empty for legacy manifests,
    whose merges simply skip file pruning."""
    m = load_manifest(store, version_dir)
    return dict(m.get("stats") or {}) if m is not None else {}


def ref_sizes(store, refs: list[str], known: dict | None = None) -> list[int]:
    """Byte sizes of referenced files. ``known`` (manifest-recorded
    sizes) answers without any store call; only refs it lacks — legacy
    manifests, foreign files — pay a metadata call (local stat / HEAD
    / HeadObject). Never a data read."""
    out = []
    for r in refs:
        s = known.get(r) if known else None
        if s is None:
            s = store.size(r)
        if s is None:
            raise FileNotFoundError(
                f"manifest references missing file {r!r} under "
                f"{store.root!r}"
            )
        out.append(s)
    return out


def uri_to_ref(uri: str, root: str) -> str:
    """Normalize an ``input_file_name()`` URI to a root-relative ref.

    The classification that decides which files a CoW verb rewrites
    compares THESE normalized refs, never raw URI strings —
    ``input_file_name`` and manifest refs have historically differed
    in scheme and percent-encoding, and a silent mismatch would both
    reference AND rewrite a file, duplicating its rows."""
    u = urlparse(uri)
    path = unquote(u.path) if u.scheme else uri
    root_norm = root
    if root_norm.startswith("file://"):
        root_norm = root_norm[len("file://"):]
    rel = os.path.relpath(os.path.abspath(path), os.path.abspath(root_norm))
    ref = rel.replace(os.sep, "/")
    if ref.startswith("../"):
        raise ValueError(f"file {uri!r} is outside the dataset root {root!r}")
    return posixpath.normpath(ref)


def read_artifact(spark: SparkSession, root: str, dirname: str) -> DataFrame:
    """Manifest-resolved read of one versioned artifact table (a
    Table version, an index's bands/sigs/codes dir): resolve the
    directory's manifest when it has one, else read the whole
    directory (legacy self-contained layout). An empty manifest reads
    as an empty frame under the manifest's recorded schema."""
    from pyspark.sql.types import StructType

    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    root = root.rstrip("/")
    store = ByteStore.for_path(root)
    m = load_manifest(store, dirname)
    if m is None:
        return spark.read.parquet(store.spark_path(dirname))
    if not m["files"]:
        if not m.get("schema"):
            raise ValueError(
                f"artifact {dirname} is empty and records no schema"
            )
        return spark.createDataFrame([], StructType.fromJson(m["schema"]))
    # read under the manifest's recorded schema: schema inference over
    # a many-file relation costs a driver round-trip (and, above the
    # parallel-discovery threshold, a footer-read job) on EVERY read
    # of the artifact — the manifest already knows the answer
    schema = (
        StructType.fromJson(m["schema"]) if m.get("schema") else None
    )
    return read_refs(spark, root, m["files"], schema, store=store)


def adopt_dir_files(
    store, dirname: str, schema_json=None, pre: set | None = None,
    spark=None,
) -> int:
    """Fold freshly written data files in a live artifact directory
    into its manifest (atomic PUT) — the append-commit: an index
    append snapshots the directory (:func:`snapshot_dir`), writes its
    segment files, then adopts here. With ``pre`` (the pre-write
    snapshot) adoption is EXACTLY the post-minus-pre delta: orphan
    files from an append that crashed between segment write and adopt
    are in ``pre`` but not in the manifest, so a retry never adopts
    them as if they were fresh data (the duplicate-rows-on-replay
    hazard) — they stay unmanifested, invisible to readers, and the
    index vacuums reclaim them (live-dir orphan sweep). Without
    ``pre`` every physical file folds in (fresh builds, compactions —
    directories this verb just created). Creates the manifest if
    absent; a legacy index upgrades on its first append (its
    pre-existing physical files ARE its data, so they adopt even in
    delta mode). ``schema_json`` fills the manifest's schema when it
    has none — builders pass the written frame's schema so an
    artifact that legitimately holds zero rows (e.g. a band table
    over only too-short docs) stays readable. Per-file sizes come
    from the inventory listing and ride in the manifest (the CoW
    sizing path never re-stats them). Returns the manifest's new
    file count."""
    m = load_manifest(store, dirname)
    phys = data_file_stats(store, dirname)
    phys_sizes = dict(phys)
    if pre is None or m is None:
        # fresh build / compaction / legacy upgrade: everything
        # physically present is (or becomes) the artifact's data
        adopted = set(phys_sizes)
    else:
        adopted = {r for r in phys_sizes if r not in pre}
    refs = sorted(set(m["files"] if m else []) | adopted)
    old_sizes = dict(m.get("sizes") or {}) if m else {}
    sizes = {
        r: phys_sizes.get(r, old_sizes.get(r))
        for r in refs
        if r in phys_sizes or r in old_sizes
    }
    # the same rows + column-stats accounting Table commits carry —
    # footer reads for the adopted files only (old files keep their
    # recorded numbers), so index takedowns can prune by id range
    rows = dict(m.get("rows") or {}) if m else {}
    col_stats = dict(m.get("stats") or {}) if m else {}
    a_rows, a_stats = footer_accounting(
        store,
        [(r, phys_sizes[r]) for r in sorted(adopted)],
        spark=spark,
    )
    rows.update(a_rows)
    col_stats.update(a_stats)
    rows = {r: rows[r] for r in refs if r in rows}
    col_stats = {r: col_stats[r] for r in refs if r in col_stats}
    schema = (m.get("schema") if m else None) or schema_json
    write_manifest(
        store, dirname, refs, schema,
        sizes=sizes, rows=rows, col_stats=col_stats,
    )
    return len(refs)


def rewrite_accounting(
    store, new_dir: str, untouched_refs: list[str], src_dir: str,
    spark=None,
) -> tuple[list[str], dict, dict, dict]:
    """``(refs, sizes, rows, col_stats)`` for a CoW rewrite commit:
    the untouched refs CARRY their accounting from the source
    directory's manifest and the fresh files in ``new_dir`` get
    footer-read numbers — without this an index takedown's new
    generation would silently drop the stats every later pruned
    takedown depends on (Table.delete composes the same thing
    inline). Returns refs = untouched + new files."""
    old = load_manifest(store, src_dir) or {}
    old_sizes = old.get("sizes") or {}
    old_rows = old.get("rows") or {}
    old_stats = old.get("stats") or {}
    new_stats = data_file_stats(store, new_dir)
    refs = list(untouched_refs) + [r for r, _ in new_stats]
    sizes = {r: old_sizes[r] for r in untouched_refs if r in old_sizes}
    rows = {r: old_rows[r] for r in untouched_refs if r in old_rows}
    col_stats = {
        r: old_stats[r] for r in untouched_refs if r in old_stats
    }
    sizes.update(dict(new_stats))
    n_rows, n_stats = footer_accounting(store, new_stats, spark=spark)
    rows.update(n_rows)
    col_stats.update(n_stats)
    return refs, sizes, rows, col_stats


HISTORY_CAP = 256


def meta_with_history(meta: dict, op: str, stats: dict | None) -> dict:
    """A new index meta dict with ``generation`` advanced and an
    ``{op, ts, generation, stats}`` record appended to ``history`` —
    written with the SAME atomic pointer PUT that publishes the
    mutation, so the audit trail can never disagree with the pointer.
    History caps at :data:`HISTORY_CAP` records (oldest dropped,
    ``history_truncated`` set): the pointer object must stay a small
    metadata read even under a per-micro-batch append cadence."""
    import time

    gen = meta.get("generation", 0) + 1
    rec = {
        "op": op,
        "ts": time.time(),
        "generation": gen,
        "stats": stats or {},
    }
    hist = list(meta.get("history", [])) + [rec]
    out = {**meta, "generation": gen, "history": hist}
    if len(hist) > HISTORY_CAP:
        out["history"] = hist[-HISTORY_CAP:]
        out["history_truncated"] = True
    return out


def is_tombstoned(store, version_dir: str) -> bool:
    return store.get(f"{version_dir}/{TOMBSTONE}") is not None


def vacuum_refcount(
    store,
    referenced: set[str],
    candidate_dirs: list[str],
    sidecars: tuple[str, ...] = (
        MANIFEST,
        "_COMMIT.json",
        "_SCHEMA.json",
        "_SUCCESS",
    ),
) -> dict:
    """Reference-counted retention over shared-file versions.

    For each candidate directory (no longer retained): delete every
    data file no retained manifest references. If nothing survives,
    the directory goes entirely; if shared files remain, the version
    is demoted to a **husk** — sidecars deleted, ``_TOMBSTONE.json``
    written (the version is unreadable and out of history), the
    shared files parked until their last referencing version is
    itself vacuumed (a later vacuum re-candidates husks and finishes
    the job). Returns ``{"removed": [dirs], "demoted": [dirs],
    "files_deleted": n}``."""
    removed: list[str] = []
    demoted: list[str] = []
    files_deleted = 0
    for vd in candidate_dirs:
        already_husk = is_tombstoned(store, vd)
        here = data_file_refs(store, vd)
        kept = [r for r in here if r in referenced]
        if not kept:
            store.delete_prefix(vd)
            removed.append(vd)
            files_deleted += len(here)
            continue
        # TOMBSTONE FIRST: the moment the tombstone lands the version
        # is unreadable, so a crash mid-demotion can never leave a
        # half-stripped directory masquerading as a legacy
        # self-contained version (whose whole-directory read would
        # return only the shared-file subset as if it were the full
        # snapshot). The next vacuum re-candidates husks and finishes
        # the cleanup.
        if not already_husk:
            store.put(
                f"{vd}/{TOMBSTONE}",
                json.dumps({"kept_files": len(kept)}).encode(),
            )
        for r in here:
            if r not in referenced:
                store.delete_prefix(r)
                files_deleted += 1
        # sidecars strip on EVERY pass (a vacuum that crashed between
        # tombstone and strip leaves them behind; the re-candidate
        # finishes the job), but an already-tombstoned husk was
        # demoted long ago — idempotent runs must not re-report it
        for side in sidecars:
            if store.get(f"{vd}/{side}") is not None:
                store.delete_prefix(f"{vd}/{side}")
        # sharded-manifest side objects strip with the main document
        # (they are sidecars too, just dynamically named)
        for n in store.list_prefix(vd):
            if n.startswith("_MANIFEST-"):
                store.delete_prefix(f"{vd}/{n}")
        if not already_husk:
            demoted.append(vd)
    return {
        "removed": removed,
        "demoted": demoted,
        "files_deleted": files_deleted,
    }

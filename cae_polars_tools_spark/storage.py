"""Physical-layout utilities: bucketed tables and file compaction.

Two storage-level levers a 100 TB deployment pulls constantly, missing
from the query-level corpus because they are *layout* decisions, not
queries:

* **Bucketing** — pre-shuffle a fact table ONCE into N hash buckets on
  its join/agg key. Every later equi-join or aggregation on that key
  reads co-located buckets and plans with ZERO exchanges: the shuffle
  that dominates a repeated big-big join is paid once at write time,
  amortized across every downstream query. This is the Spark-native
  answer to the "co-located join" every warehouse engine grows.
* **Compaction** — object-store pipelines accrete small files (one per
  streaming micro-batch task, per late partition, …). Scans then pay
  per-file open cost and lose row-group locality; compaction rewrites
  a dataset to target-sized files, optionally sorted so min/max
  row-group statistics actually prune.

Both are beyond the reference's surface (its storage layer only READS
zarr/object stores — ``/root/reference/src/data_access``), added here
as first-class pipeline components.
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_bucketed",
    "compact_parquet",
    "zorder_parquet",
    "merge_parquet",
    "delete_parquet",
    "dataset_file_sizes",
    "parquet_rowgroup_stats",
    "dict_encode",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as a bucketed parquet table registered as
    ``table``; returns the table name.

    The frame is repartitioned to exactly ``buckets`` tasks on the
    bucket keys first, so each bucket lands in ONE file. That single
    extra exchange at write time buys two read-side eliminations:

    * joins/aggregations between co-bucketed tables on the bucket keys
      plan with no ``Exchange`` at all (asserted in
      ``tests/test_storage.py``), and
    * with ``sort_cols`` == join keys, the sort-merge join's per-side
      ``Sort`` is elided too — IF
      ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` is
      set (off by default since Spark 3.0 because proving bucket order
      requires listing files at planning time; worth enabling for hot,
      repeatedly-joined tables). Spark trusts sorted buckets only when
      a bucket is ONE file, which the up-front repartition guarantees —
      without it, a multi-task write fragments each bucket and the
      ordering claim would be silently void.

    ``buckets`` should be sized so one bucket of the LARGER table fits
    an executor's scan budget (e.g. ~128-512 MB each); both join sides
    must use the same ``buckets`` and ``keys`` for exchange-free
    planning. ``path`` makes it an external table (default: session
    warehouse dir).
    """
    if buckets < 1:
        raise ValueError("buckets must be at least 1")
    if not keys:
        raise ValueError("at least one bucket key is required")
    sort_cols = sort_cols if sort_cols is not None else list(keys)
    writer = (
        df.repartition(buckets, *keys)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, *keys)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        # abspath only scheme-less local paths: it would mangle a URI
        # ('s3a://bucket/t' -> '<cwd>/s3a:/bucket/t') and the table
        # would land on local disk with no error
        u = urlparse(path)
        writer = writer.option(
            "path", path if u.scheme else os.path.abspath(path)
        )
    writer.saveAsTable(table)
    return table


def dataset_file_sizes(spark: SparkSession, path: str) -> list[int]:
    """Data-file sizes (bytes) of a local parquet dataset, via the same
    file listing Spark's scan planning uses — metadata only, no data
    read. Raises for non-local URIs (cluster deployments should consult
    their object store's listing instead)."""
    files = spark.read.parquet(path).inputFiles()
    sizes = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            raise ValueError(f"not a local file: {f}")
        sizes.append(os.path.getsize(unquote(u.path)))
    return sizes


def _reader(spark, read_schema):
    """spark.read, optionally pinned to an explicit schema — the
    schema-evolution seam: a Table that was widened via
    ``Table.add_columns`` holds files of BOTH physical schemas
    (old files byte-copied, new files written wide), so its CoW verbs
    read with the declared schema and Spark null-fills the columns a
    file lacks (``unionByName(allowMissingColumns=True)`` semantics,
    without the footer-merge cost of ``mergeSchema``)."""
    return spark.read if read_schema is None else spark.read.schema(read_schema)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    read_schema=None,
    source_refs: list[str] | None = None,
    source_sizes: dict | None = None,
) -> int:
    """Rewrite the parquet dataset at ``src`` into ``dst`` with files
    sized toward ``target_file_bytes``; returns the file count written.
    With ``source_refs`` (manifest mode), ``src`` is the table ROOT
    and the dataset is the referenced file set, possibly spanning
    several version directories (``Table.compact``); ``source_sizes``
    (the manifest's recorded per-file sizes) makes the sizing pass
    zero store calls.

    File count = ceil(total_bytes / target) from the source listing —
    parquet-to-parquet rewrites keep encoded size roughly stable, so
    the source's on-disk bytes are the right sizing signal (row-count
    heuristics drift with encodings and wide columns).

    Without ``sort_cols`` the rewrite is a round-robin
    ``repartition(n)`` — pure coalescing, one shuffle of the data
    being compacted. With ``sort_cols`` it is ``repartitionByRange``
    + ``sortWithinPartitions``: globally range-clustered files whose
    per-column min/max row-group statistics become selective, so later
    point/range scans on those columns prune files and row groups
    (the poor man's Z-order; same shuffle count as the plain path).

    Hive-partitioned (``key=value``) sources keep their layout: the
    output is written back through ``partitionBy`` so downstream
    partition pruning keeps working. Rows range-partition on the
    partition columns first (plus ``sort_cols``, or a deterministic
    row-hash salt when none are given, so an oversized partition
    value can still split across tasks), which keeps each task's
    rows contiguous in partition-value space — at most a boundary
    task straddles two values, so file counts stay near the target.

    Scale note: each output file is produced by one task buffering one
    ~target-sized parquet write — keep ``target_file_bytes`` within
    executor memory. The rewrite streams through a single stage; no
    driver-side materialization of data.
    """
    from pyspark.sql import functions as F

    if target_file_bytes < 1:
        raise ValueError("target_file_bytes must be positive")
    # ONE relation for sizing and rewrite: on the many-small-files
    # datasets this function exists for, directory listing + footer
    # schema inference dominates planning — don't pay it twice
    root, store, refs, pcols, df = _cow_source(
        spark, src, read_schema, source_refs, "compact_parquet"
    )
    _dst_root, dst_store = _cow_store(dst, "compact_parquet")
    total = _ref_bytes(store, refs, known=source_sizes)
    n = max(1, math.ceil(total / target_file_bytes))
    if pcols:
        if sort_cols:
            keys = pcols + [c for c in sort_cols if c not in pcols]
            df = df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
        else:
            data_cols = [c for c in df.columns if c not in pcols]
            df = (
                df.withColumn("__salt", F.xxhash64(*data_cols))
                .repartitionByRange(n, *pcols, "__salt")
                .drop("__salt")
            )
        df.write.mode("overwrite").partitionBy(*pcols).parquet(
            dst_store.spark_path("")
        )
    else:
        if sort_cols:
            df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        else:
            df = df.repartition(n)
        df.write.mode("overwrite").parquet(dst_store.spark_path(""))
    from cae_polars_tools_spark.manifest import data_file_refs

    return len(data_file_refs(dst_store))


def zorder_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    zorder_cols: list[str],
    bits_per_col: int = 4,
    target_file_bytes: int = 128 * 1024 * 1024,
    rel_err: float = 0.01,
    read_schema=None,
    source_refs: list[str] | None = None,
    source_sizes: dict | None = None,
) -> int:
    """Rewrite the parquet dataset at ``src`` into ``dst`` clustered on
    a Z-order (Morton) curve over ``zorder_cols``; returns the file
    count written.

    ``compact_parquet(sort_cols=…)`` linearly range-clusters: file
    min/max statistics become selective on the FIRST sort column and
    progressively useless on the rest. Z-ordering interleaves the bits
    of per-column quantile codes instead, so every file covers a small
    hyper-rectangle of the value space and min/max pruning works on
    EVERY listed column at once — the standard lakehouse answer
    (Delta/Iceberg ``OPTIMIZE ZORDER BY``) for the "filter by either
    column" scan pattern.

    Mechanics, all scale-bounded:

    * per column: ``2^bits_per_col − 1`` quantile split points via
      ``approxQuantile`` (Greenwald-Khanna sketch, one pass, driver
      holds a handful of doubles); quantile codes, unlike uniform-width
      ``width_bucket``, stay balanced under skew.
    * per row: code = how many split points the value ≥ — a
      ``size(filter(array(<literals>), s -> col >= s))`` HOF, pure
      JVM codegen; NULLs code to 0 (they satisfy no comparison), i.e.
      sort first.
    * Z-value = bitwise interleave of the codes (shift/or literal
      expressions), then ``repartitionByRange`` on it +
      ``sortWithinPartitions`` — exactly one shuffle of the data being
      rewritten, same as plain compaction.

    Numeric columns only (the quantile sketch's domain); rank string
    columns into codes upstream (e.g. ``ntile``) and Z-order the code.
    Note: a hive-partitioned source rewrites to an UNPARTITIONED
    Z-ordered layout — the directory-encoded partition columns become
    ordinary data columns (rows preserved exactly); Z-ordering spans
    partition boundaries by design, so keep using
    :func:`compact_parquet` when the partition layout must survive.
    """
    if not 1 <= bits_per_col <= 8:
        raise ValueError("bits_per_col must be in [1, 8]")
    if not zorder_cols or len(zorder_cols) < 2:
        raise ValueError(
            "zorder needs >= 2 columns (use compact_parquet(sort_cols=…) "
            "for single-column clustering)"
        )
    if bits_per_col * len(zorder_cols) > 64:
        # Java shiftleft masks the shift amount to 6 bits: past 64
        # total bits the interleave would silently wrap high bits onto
        # low positions and distant value regions would collide in __z
        raise ValueError(
            f"bits_per_col * columns = {bits_per_col * len(zorder_cols)} "
            "exceeds the 64-bit Z-value; lower bits_per_col or split "
            "the column list"
        )
    if target_file_bytes < 1:
        raise ValueError("target_file_bytes must be positive")
    from pyspark.sql import functions as F

    _root, store, refs, _pcols, df = _cow_source(
        spark, src, read_schema, source_refs, "zorder_parquet"
    )
    _dst_root, dst_store = _cow_store(dst, "zorder_parquet")
    total = _ref_bytes(store, refs, known=source_sizes)
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    bad = [c for c in zorder_cols if c not in numeric]
    if bad:
        raise ValueError(f"zorder columns must be numeric, got: {bad}")

    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # one multi-column sketch pass over the dataset, not one per column
    all_splits = df.approxQuantile(zorder_cols, probs, rel_err)
    z = F.lit(0).cast("long")
    for i, (c, splits) in enumerate(zip(zorder_cols, all_splits)):
        code = F.size(
            F.filter(
                F.array(*[F.lit(float(s)) for s in splits]),
                lambda s: F.col(c).cast("double") >= s,
            )
        ).cast("long")
        # interleave: bit b of column i lands at position b*ncols + i
        for b in range(bits_per_col):
            z = z.bitwiseOR(
                F.shiftleft(
                    code.bitwiseAND(F.lit(1 << b)).cast("long"),
                    b * (len(zorder_cols) - 1) + i,
                )
            )
    n = max(1, math.ceil(total / target_file_bytes))
    (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dst_store.spark_path(""))
    )
    from cae_polars_tools_spark.manifest import data_file_refs

    return len(data_file_refs(dst_store))

def _local_path(uri: str, op: str) -> str:
    """Normalized local filesystem path of a ``file://`` URI (Spark
    accepts either form; os-level fast paths do not — an
    un-normalized URI dst used to send byte-copies into a literal
    ``file:`` directory under the cwd). Non-file schemes do NOT land
    here anymore: :func:`_cow_store` keeps them as URIs and every
    metadata/copy operation rides the ByteStore seam instead."""
    u = urlparse(uri)
    if u.scheme not in ("file", ""):
        raise ValueError(
            f"{op}: {uri!r} is not a local path"
        )
    return os.path.abspath(unquote(u.path if u.scheme else uri))


def _cow_store(path: str, op: str):
    """``(root, store)`` for one copy-on-write dataset location. Local
    paths (plain or ``file://``) keep their historical normalization;
    any other scheme stays a URI and resolves through
    ``ByteStore.for_path`` — the seam that makes every CoW verb run
    against object stores (s3/http/registered schemes): Spark reads
    and writes go through ``store.spark_path``, affected-file
    classification through ``store.ref_from_spark_uri``, sizing
    through manifest-recorded sizes + ``store.size``, and the legacy
    copy-untouched path through ``store.copy_to`` (server-side where
    the backend supports it)."""
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    if "://" in path and not path.startswith("file:"):
        root = path.rstrip("/")
    else:
        root = (
            _local_path(path, op)
            if "://" in path or path.startswith("file:")
            else path
        )
    return root, ByteStore.for_path(root)


def _copy_refs(store, refs: list[str], dst_store) -> None:
    """Copy root-relative file refs into the destination store,
    keeping each file's ``key=value`` partition subpath (the
    partition-column values live in those directory names, not in the
    files, so flattening would silently drop them). Rides
    ``ByteStore.copy_to``: local→local hardlinks (CoW version files
    are immutable after their pointer flip, so sharing inodes is
    safe and the "copy" costs zero data bytes), same-backend object
    stores use server-side copy, anything else streams. The scale
    path avoids even this: ``copy_untouched=False`` + a manifest
    references the untouched files instead
    (``cae_polars_tools_spark.manifest``)."""
    from cae_polars_tools_spark.manifest import split_ref

    for i, ref in enumerate(refs):
        base, _cols = split_ref(ref)
        sub = ref[len(base):].lstrip("/") if base else ref
        rel_dir, fname = os.path.split(sub)
        out_name = f"copied-{i:05d}-{fname}"
        dst_key = f"{rel_dir}/{out_name}" if rel_dir else out_name
        store.copy_to(ref, dst_store, dst_key)


def _cow_source(
    spark, target, read_schema, source_refs, op, relation_refs=None
):
    """The dataset a CoW verb operates on, as ``(root, store, refs,
    pcols, df)`` with refs root-relative (``manifest.py``
    conventions).

    Directory mode (``source_refs is None``): ``target`` is a plain
    parquet dataset directory — list it once, derive refs + hive
    layout, exactly the round-12 behavior. Manifest mode: ``target``
    is the table ROOT and ``source_refs`` the current version's file
    references (possibly spanning several version directories); the
    relation is the per-birth-dir union of :func:`manifest.read_refs`
    and untouched files are never copied, only re-referenced.

    ``relation_refs`` (manifest mode only) builds ``df`` over a
    SUBSET of the refs — merge's stats-pruned candidate files — while
    ``refs`` stays the full set: at scale the expensive part of the
    union is the driver-side file index over every path, so a pruned
    relation makes planning O(candidates), not O(table files).
    Requires ``read_schema`` (an empty candidate set still needs a
    typed relation, and a subset's inferred schema must not drift
    from the table's)."""
    from cae_polars_tools_spark.manifest import group_refs, read_refs

    root, store = _cow_store(target, op)
    if source_refs is None:
        raw = (
            _reader(spark, read_schema)
            .parquet(store.spark_path(""))
            .inputFiles()
        )
        refs = sorted(store.ref_from_spark_uri(f) for f in raw)
    else:
        refs = sorted(source_refs)
    _groups, pcols = group_refs(refs)  # mixed layouts refused here
    rel = refs if relation_refs is None else sorted(relation_refs)
    if relation_refs is not None and read_schema is None:
        raise ValueError(
            f"{op}: a pruned relation (relation_refs) requires an "
            "explicit read_schema"
        )
    if not rel:
        # a zero-file dataset (a prior job wrote zero rows, an
        # empty-version manifest, or a fully pruned candidate set):
        # a merge is then a pure insert and a delete a no-op —
        # preserve that behavior instead of refusing. Only an
        # explicit schema can type the empty relation (there are no
        # footers to infer from).
        if read_schema is None:
            raise ValueError(
                f"{op}: {target!r} holds no data files and no "
                "read_schema was given — cannot type the empty "
                "relation"
            )
        return root, store, refs, pcols, spark.createDataFrame([], read_schema)
    df = read_refs(spark, root, rel, read_schema, store=store)
    return root, store, refs, pcols, df


def _guard_cow_dst(store, refs: list[str], dst_store) -> None:
    """Copy-on-write destination guard: the fresh output location
    must not be, contain, or live inside any BIRTH directory of the
    source refs (clearing it would destroy referenced data; writing
    into one would corrupt the source dataset). Birth dirs come from
    :func:`manifest.split_ref` — partition subdirectories collapse to
    their dataset root, so a hive-partitioned directory-mode source
    protects its whole root exactly like the unpartitioned form.
    Containment compares the stores' canonical identities
    (``ByteStore.canon`` — local paths abspath-normalize, URI roots
    compare as URIs), so the guard holds on object stores too."""
    from cae_polars_tools_spark.manifest import split_ref

    d_can = dst_store.canon().rstrip("/")
    s_can = store.canon().rstrip("/")
    bases = {split_ref(r)[0] for r in refs} or {""}
    for b in bases:
        b_can = f"{s_can}/{b}" if b else s_can
        if (
            d_can == b_can
            or b_can.startswith(d_can + "/")
            or d_can.startswith(b_can + "/")
        ):
            raise ValueError(
                f"copy-on-write destination {dst_store.root!r} overlaps "
                f"source directory {b_can!r}; write to a fresh path"
            )
    if dst_store.list_prefix(""):
        dst_store.delete_prefix("")


def _ref_bytes(store, refs: list[str], known: dict | None = None) -> int:
    """Total size of referenced files via the ByteStore seam. With
    ``known`` (the manifest's recorded per-file sizes) this is pure
    arithmetic — zero store calls; refs the manifest predates fall
    back to a metadata call each (local stat / HEAD / S3 HeadObject),
    never a data read."""
    from cae_polars_tools_spark.manifest import ref_sizes

    return sum(ref_sizes(store, refs, known=known))


def merge_parquet(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    keys: list[str],
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    read_schema=None,
    source_refs: list[str] | None = None,
    copy_untouched: bool = True,
    source_sizes: dict | None = None,
    source_rows: dict | None = None,
    candidate_refs: list[str] | None = None,
    pre_rows: int | None = None,
) -> dict:
    """Copy-on-write MERGE (upsert) into a parquet dataset: rows of
    ``updates`` replace target rows with matching ``keys``; everything
    else carries over untouched. Returns
    ``{files_rewritten, files_copied, rows_updated, rows_inserted}``.

    The lakehouse move this emulates (Delta/Iceberg ``MERGE INTO``
    without their transaction log): only the files that actually
    CONTAIN a matching key are rewritten; every other file is copied
    byte-for-byte — no decode, no re-encode, no shuffle. At 100 TB
    with a key-clustered layout (``compact_parquet(sort_cols=…)`` or
    ``zorder_parquet``), an update batch touching one key range
    rewrites a handful of files while the rest of the dataset moves at
    raw-copy speed (or, on object stores, server-side copy).

    Affected files are found DISTRIBUTEDLY: scan the target with
    ``input_file_name`` and left-semi join to the (broadcast) distinct
    update keys — Catalyst prunes row groups via min/max stats on the
    way, so a clustered target reads only the candidate slices. The
    output is a NEW dataset at ``dst`` (copy-on-write): readers of
    ``target`` are never exposed to a half-merged state, and the swap
    is the caller's one atomic rename/pointer-flip. ``dst`` must not
    overlap ``target`` (checked).

    Hive-partitioned (``key=value`` directory) targets are supported:
    untouched files keep their relative partition subpaths in the
    copy, affected files are read with ``basePath`` so the
    directory-encoded partition columns re-materialize, and the
    rewrite goes back out through ``partitionBy`` — an update may
    even move a row between partitions (the old version leaves its
    file via the anti-join, the new row lands in its new directory).

    ``updates`` must carry exactly the target's columns (aligned by
    name; a silent schema mix across files would poison later reads)
    and be unique on ``keys`` (checked — a duplicate would fan out
    every matching row); multiple TARGET rows per key are all
    replaced by the single update row. ``updates`` is persisted for
    the duration of the call: its lineage feeds the uniqueness check,
    the key broadcast, both counters, and the write.

    **Manifest mode** (``source_refs=`` + ``copy_untouched=False``):
    ``target`` is the table ROOT and ``source_refs`` the current
    version's root-relative file references; untouched files are not
    copied at all — their refs come back in
    ``stats["untouched_refs"]`` for the caller's new-version manifest
    (``Table.merge``), making the commit metadata-only outside the
    genuinely rewritten files. This is the 100 TB path: a one-key
    merge writes the affected files plus the update rows and copies
    ZERO untouched bytes.

    ``candidate_refs`` (manifest mode) narrows the DISCOVERY relation
    to the files whose manifest-recorded key min/max can intersect
    the batch (``Table._merge_candidates`` computes them): at scale
    the driver-side file index over every path dominates merge
    planning, so a stats-pruned merge plans over O(candidates)
    instead of O(table files). Requires ``read_schema`` and
    ``source_rows`` covering every source ref (the subset relation
    can answer neither the table's schema nor its row count).

    ``pre_rows`` asserts the caller ALREADY ran the batch
    precondition — verified uniqueness on ``keys`` and counted the
    batch rows — in its own aggregate (``Table._merge_candidates``
    fuses it with the pruning range probe), so the precondition job
    here is skipped: one fewer driver action / cluster barrier per
    merge. Callers without such a fused aggregate leave it None and
    get the full check.
    """
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.manifest import read_refs

    if not keys:
        raise ValueError("merge_parquet needs at least one key column")
    if candidate_refs is not None:
        # pruned-discovery contract: the relation below is the
        # CANDIDATE subset, so the table's refs, schema, and row
        # count must all come from the manifest, never from the
        # subset (directory mode has no manifest — a count of the
        # pruned relation would undercount, an inferred schema could
        # drift, and discovery would have no stats basis)
        if source_refs is None:
            raise ValueError(
                "merge_parquet: candidate_refs requires manifest "
                "mode (source_refs)"
            )
        if read_schema is None:
            raise ValueError(
                "merge_parquet: candidate_refs requires read_schema"
            )
        if source_rows is None or any(
            r not in source_rows for r in source_refs
        ):
            raise ValueError(
                "merge_parquet: candidate_refs requires source_rows "
                "covering every source ref"
            )
    _dst_root, dst_store = _cow_store(dst, "merge_parquet")
    root, store, refs, pcols, t = _cow_source(
        spark, target, read_schema, source_refs, "merge_parquet",
        relation_refs=candidate_refs,
    )
    if set(updates.columns) != set(t.columns):
        raise ValueError(
            f"updates columns {sorted(updates.columns)} must equal the "
            f"target's {sorted(t.columns)} (aligned by name)"
        )
    # name-AND-type alignment: a dtype drift (int updates vs long
    # target) would flow through unionByName into the rewritten files
    # and leave dst with a schema split across byte-copied vs
    # rewritten files — silent poison for later readers
    t_types = {f.name: f.dataType for f in t.schema.fields}
    u_types = {f.name: f.dataType for f in updates.schema.fields}
    drift = {
        c: (u_types[c].simpleString(), t_types[c].simpleString())
        for c in t.columns
        if u_types[c] != t_types[c]
    }
    if drift:
        raise ValueError(
            "updates schema types differ from the target's: "
            + ", ".join(
                f"{c}: updates={u} target={t_}" for c, (u, t_) in drift.items()
            )
            + " — cast the updates to the target schema first"
        )
    updates = updates.select(*t.columns).persist()
    try:
        if pre_rows is not None:
            # the caller's fused aggregate already verified key
            # uniqueness and counted the batch (see docstring)
            upd_rows = pre_rows
        else:
            # ONE aggregate job answers both precondition questions —
            # "is the batch unique on keys?" and "how many update
            # rows?" — instead of a dup-probe action plus a separate
            # count action; each saved action is a full driver
            # round-trip / cluster barrier (a scheduling constant
            # locally, a real commit-latency term on a 100 TB
            # cluster).
            per_key = updates.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("__n")
            )
            pre = per_key.agg(
                F.coalesce(F.sum("__n"), F.lit(0)).alias("__rows"),
                F.coalesce(F.max("__n"), F.lit(0)).alias("__mx"),
            ).collect()[0]
            upd_rows = pre["__rows"]
            if pre["__mx"] > 1:
                # error path only: one extra job to name an example key
                dup = per_key.filter(F.col("__n") > 1).limit(1).collect()
                raise ValueError(
                    f"updates are not unique on {keys}: e.g. "
                    f"{tuple(dup[0][k] for k in keys)}"
                )
        key_set = F.broadcast(updates.select(*keys).distinct())

        # distributed affected-file discovery; min/max row-group
        # pruning applies to the probe on a key-clustered target
        aff_refs = sorted(
            {
                store.ref_from_spark_uri(r["__f"])
                for r in t.withColumn("__f", F.input_file_name())
                .join(key_set, keys, "left_semi")
                .select("__f")
                .distinct()
                .collect()
            }
        )
        affected_set = set(aff_refs)
        untouched_refs = [r for r in refs if r not in affected_set]

        _guard_cow_dst(store, refs, dst_store)
        if copy_untouched:
            _copy_refs(store, untouched_refs, dst_store)

        # bytes-per-row from dataset statistics sizes the rewritten
        # files: the update volume counts too (a large insert batch
        # must not funnel into one giant single-task file). With
        # manifest-recorded row counts (``source_rows``) this is pure
        # arithmetic; legacy manifests fall back to a parquet
        # metadata count (footer reads, no data scan — but still a
        # job over every file, which is why the manifest records rows)
        total_bytes = _ref_bytes(store, refs, known=source_sizes)
        if source_rows is not None and all(r in source_rows for r in refs):
            t_rows = sum(source_rows[r] for r in refs)
        else:
            t_rows = t.count()
        bpr = total_bytes / max(t_rows, 1)

        stats = {"rows_updated": 0, "rows_inserted": 0}
        obs = None
        if aff_refs:
            from pyspark.sql import Observation

            # per-birth-dir basePath re-derives the partition columns
            # from the key=value dirs — reading the leaf files bare
            # would silently drop them from the rewrite
            aff = read_refs(spark, root, aff_refs, read_schema, store=store)
            survivors = aff.join(key_set, keys, "left_anti")
            # matched-row accounting rides the WRITE job as an
            # observed metric on the updates branch (CollectMetrics)
            # instead of a separate count action that re-scans aff and
            # updates: flag each update row whose key exists among the
            # affected files (left join against the distinct affected
            # keys — cardinality-preserving by construction) and sum
            # the flags as the rows stream into the writer.
            aff_keys = (
                aff.select(*keys).distinct().withColumn("__m", F.lit(1))
            )
            obs = Observation()
            upd_flagged = (
                updates.join(F.broadcast(aff_keys), keys, "left")
                .observe(
                    obs,
                    F.coalesce(F.sum("__m"), F.lit(0)).alias("matched"),
                )
                .drop("__m")
            )
            out = survivors.unionByName(upd_flagged)
            est = (
                _ref_bytes(store, aff_refs, known=source_sizes)
                + upd_rows * bpr
            )
        else:
            stats["rows_inserted"] = upd_rows
            out = updates
            est = upd_rows * bpr
        n_files = max(1, math.ceil(est / target_file_bytes))
        writer = out.repartition(
            # on a partitioned target, hash on the partition columns so
            # each partition value lands in ONE task → one file per
            # value, not n_files × n_partitions fragments
            *( [n_files] + pcols if pcols else [n_files] )
        ).write.mode("append")
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(dst_store.spark_path(""))
        if obs is not None:
            try:
                matched = int(obs.get["matched"])
            except Exception:
                # Defensive twin of delete_parquet's fallback: the
                # observed branch carries every update row into the
                # write (out ⊇ updates, and updates is non-empty
                # whenever aff_refs is), so AQE's empty-relation
                # propagation cannot excise this CollectMetrics — but
                # if an optimizer change ever does, recount rather
                # than mis-report merge stats.
                matched = updates.join(
                    F.broadcast(aff.select(*keys).distinct()),
                    keys,
                    "left_semi",
                ).count()
            stats["rows_updated"] = matched
            stats["rows_inserted"] = upd_rows - matched
    finally:
        updates.unpersist()

    stats_out = {"files_rewritten": len(aff_refs), **stats}
    if candidate_refs is not None:
        stats_out["files_candidates"] = len(candidate_refs)
    if copy_untouched:
        stats_out["files_copied"] = len(untouched_refs)
    else:
        stats_out["files_referenced"] = len(untouched_refs)
        stats_out["untouched_refs"] = untouched_refs
        stats_out["schema"] = t.schema.jsonValue()
    return stats_out


def delete_parquet(
    spark: SparkSession,
    target: str,
    predicate,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    read_schema=None,
    source_refs: list[str] | None = None,
    copy_untouched: bool = True,
    source_sizes: dict | None = None,
    candidate_refs: list[str] | None = None,
) -> dict:
    """Copy-on-write DELETE WHERE: rows where ``predicate`` (a Column
    or SQL string) evaluates to TRUE are removed; FALSE and NULL rows
    survive (SQL DELETE semantics — a NULL predicate must not delete
    a row it cannot affirm). Only the files that CONTAIN a matching
    row are rewritten; the rest copy byte-for-byte into the fresh
    output. Returns ``{files_rewritten, files_copied, rows_deleted}``.

    This is the takedown / right-to-be-forgotten primitive a training
    corpus needs operationally: deleting one domain's documents from
    a petabyte dataset must not re-encode the petabyte. Catalyst
    pushes the predicate into the discovery scan, so on a layout
    clustered by the predicate columns (``compact_parquet`` sort or
    ``zorder_parquet``) min/max stats skip the untouched files
    without reading them. Same copy-on-write contract as
    :func:`merge_parquet`: readers of ``target`` never observe a
    half-deleted state, the swap is the caller's pointer flip, and
    ``dst`` must not overlap ``target`` (checked). Hive-partitioned
    targets are supported (relative ``key=value`` subpaths preserved
    in the copy, ``partitionBy`` rewrite); a predicate on a partition
    column prunes whole directories out of the discovery scan before
    a single data byte is read — the cheap takedown shape.

    ``candidate_refs`` (manifest mode) narrows the discovery relation
    to files whose manifest-recorded stats can satisfy the predicate
    — callers with a KEY-LIST predicate (``Table.delete_keys``, the
    takedown cascade) compute it from the id range, so a takedown of
    a handful of ids plans over a handful of files, not the table.
    Requires ``read_schema`` (the subset cannot type itself).
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    if not isinstance(pred, Column):
        raise ValueError("predicate must be a Column or SQL string")

    from cae_polars_tools_spark.manifest import read_refs

    _dst_root, dst_store = _cow_store(dst, "delete_parquet")
    root, store, refs, pcols, t = _cow_source(
        spark, target, read_schema, source_refs, "delete_parquet",
        relation_refs=candidate_refs,
    )
    # rows whose partition value is pruned by the predicate never even
    # list their files here — the discovery scan skips whole key=value
    # directories on a partition-column predicate
    aff_refs = sorted(
        {
            store.ref_from_spark_uri(r["__f"])
            for r in t.filter(pred)
            .select(F.input_file_name().alias("__f"))
            .distinct()
            .collect()
        }
    )
    affected_set = set(aff_refs)
    untouched_refs = [r for r in refs if r not in affected_set]

    _guard_cow_dst(store, refs, dst_store)
    if copy_untouched:
        _copy_refs(store, untouched_refs, dst_store)

    rows_deleted = 0
    if aff_refs:
        from pyspark.sql import Observation

        aff_raw = read_refs(spark, root, aff_refs, read_schema, store=store)
        # deleted-row accounting rides the WRITE job as an observed
        # metric (CollectMetrics below the survivor filter — every aff
        # row flows through it; Catalyst does not push filters through
        # CollectMetrics) instead of a separate count action that
        # scans the affected files a second time. A NULL predicate
        # counts 0 (`when` otherwise-branch), matching the survival
        # rule below.
        obs = Observation()
        aff = aff_raw.observe(
            obs,
            F.coalesce(
                F.sum(F.when(pred, 1).otherwise(0)), F.lit(0)
            ).alias("deleted"),
        )
        # NULL-predicate rows SURVIVE: plain ~pred maps NULL→NULL and
        # the filter would silently drop them uncounted
        survivors = aff.filter(pred.isNull() | ~pred)
        total = _ref_bytes(store, aff_refs, known=source_sizes)
        n_files = max(1, math.ceil(total / target_file_bytes))
        writer = survivors.repartition(
            *([n_files] + pcols if pcols else [n_files])
        ).write.mode("append")
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(dst_store.spark_path(""))
        try:
            rows_deleted = int(obs.get["deleted"])
        except Exception:
            # When EVERY affected row is deleted, AQE's runtime
            # empty-relation propagation collapses the write plan —
            # including the CollectMetrics node — to an empty
            # relation, and the observation never fires (reproduced:
            # observe → filter-all-out → parquet write). Recount
            # directly on the unobserved frame (an Observation is
            # single-use); this edge re-scans only the affected
            # files, and only when the write was empty.
            rows_deleted = aff_raw.filter(pred).count()

    stats = {
        "files_rewritten": len(aff_refs),
        "rows_deleted": rows_deleted,
    }
    if candidate_refs is not None:
        stats["files_candidates"] = len(candidate_refs)
    if copy_untouched:
        stats["files_copied"] = len(untouched_refs)
    else:
        stats["files_referenced"] = len(untouched_refs)
        stats["untouched_refs"] = untouched_refs
        stats["schema"] = t.schema.jsonValue()
    return stats


def parquet_rowgroup_stats(path: str) -> list[dict]:
    """Row-group-level statistics of a local parquet dataset: one dict
    per (file, row group) with row count, byte size, and per-column
    min/max/null-count from the footers — METADATA only, no data read.

    This is the instrument for verifying that a layout decision
    actually bought pruning power: after ``compact_parquet(sort_cols=…)``
    or ``zorder_parquet``, the min/max spans here are what Spark's scan
    planning consults to skip row groups; overlapping spans on the
    filter column mean the rewrite did not help. (The pytest layout
    suite asserts the same property by probing scans; this exposes the
    underlying footer evidence to users and ops tooling.)"""
    import pyarrow.parquet as pq

    out: list[dict] = []
    files = sorted(
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ) if os.path.isdir(path) else [path]
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            cols = {}
            for ci in range(g.num_columns):
                c = g.column(ci)
                st = c.statistics
                cols[c.path_in_schema] = {
                    "min": st.min if st and st.has_min_max else None,
                    "max": st.max if st and st.has_min_max else None,
                    "null_count": st.null_count if st else None,
                }
            out.append(
                {
                    "file": f,
                    "row_group": rg,
                    "rows": g.num_rows,
                    "bytes": g.total_byte_size,
                    "columns": cols,
                }
            )
    return out


def dict_encode(
    df: "DataFrame",
    col: str,
    code_col: str | None = None,
    max_cardinality: int = 100_000,
) -> tuple["DataFrame", "DataFrame"]:
    """Dictionary-encode a (low-cardinality) string column: returns
    ``(encoded, dictionary)`` where ``dictionary`` is
    ``(value, code)`` with dense codes 0…n−1 assigned in value sort
    order, and ``encoded`` is ``df`` with ``code_col`` (default
    ``f"{col}_code"``) added via a broadcast join.

    This is the Spark-idiomatic stand-in for the reference's
    ``.cast(pl.Categorical)`` (reference
    docs/user_guide/performance_tips.md:124-143): Spark has no
    session-global category registry, so the dictionary is an
    explicit, persistable table — which is what a distributed system
    wants anyway (the mapping must be consistent across executors AND
    across runs, so it has to live in data, not in process state).
    Downstream, joins/groupBys on the int code shuffle ~8 bytes a row
    instead of the string, and the parquet scan of an encoded table
    prunes to a dictionary-friendly int column.

    Scale shape: one distinct (key-partitioned) over the column, one
    window over the DICTIONARY — bounded by the column's cardinality,
    which is the premise of dictionary encoding, not by |df| — then a
    broadcast join back. The corpus never reshuffles.

    The low-cardinality premise is ENFORCED, not assumed (the
    ``_collect_queries`` convention, similarity.py): a
    ``limit``-bounded count of the distinct values raises past
    ``max_cardinality`` BEFORE the single-partition dictionary window
    or the broadcast ever run — a caller passing a near-unique column
    (an id, a URL) gets a loud error, not a driver OOM or a
    million-row one-partition sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = code_col or f"{col}_code"
    distinct_vals = (
        df.select(F.col(col).alias("value"))
        .where(F.col("value").isNotNull())
        .distinct()
    )
    n = distinct_vals.limit(max_cardinality + 1).count()
    if n > max_cardinality:
        raise ValueError(
            f"dict_encode: column {col!r} has {n - 1}+ distinct values"
            f" (> max_cardinality={max_cardinality}); dictionary"
            " encoding wants a low-cardinality column — raise the"
            " bound explicitly if this is intended"
        )
    dictionary = (
        distinct_vals
        .withColumn(
            "code",
            (F.row_number().over(Window.orderBy("value")) - 1).cast(
                "long"
            ),
        )
    )
    encoded = df.join(
        F.broadcast(
            dictionary.select(
                F.col("value").alias(col), F.col("code").alias(out)
            )
        ),
        on=col,
        how="left",
    )
    return encoded, dictionary


def diff_tables(
    old: "DataFrame",
    new: "DataFrame",
    keys: list[str],
) -> "DataFrame":
    """Change-data-feed extraction between two versions of a keyed
    table: one row per changed key with ``op`` ∈ insert / delete /
    update — what downstream consumers (indexes, caches, the
    incremental-aggregate refresh) want instead of re-reading the new
    snapshot wholesale. This is the READ side of the engine's CoW
    versioning: ``merge_parquet``/``cow_upsert_sink`` produce the
    versions, ``diff_tables`` tells a consumer what moved between
    any two of them.

    Shape: ONE full outer join on the keys (null-safe on every
    non-key column via ``<=>`` so NULL→value edits register as
    updates, not matches); unchanged keys drop out map-side after the
    join. Both versions carry the new row's columns for updates and
    inserts, the old row's for deletes. Column sets must match
    (checked — a schema drift between versions is a real change the
    caller must handle explicitly, not something to zip silently)."""
    from pyspark.sql import functions as F

    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"diff_tables: column sets differ — old {sorted(old.columns)}"
            f" vs new {sorted(new.columns)}; reconcile schemas first"
        )
    vals = [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in vals],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in vals],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    same = None
    for c in vals:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = eq if same is None else (same & eq)
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(same if same is not None else F.lit(True), F.lit(None))
        .otherwise(F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
        for k in keys
    ]
    # value columns branch on ROW presence, never per-column coalesce:
    # an update whose NEW value is NULL must report NULL (the NULL-ing
    # edit IS the change) — coalescing would resurrect the old value
    # and a consumer applying the feed would keep it forever
    out_vals = [
        F.when(F.col("_in_new").isNotNull(), F.col(f"_n_{c}"))
        .otherwise(F.col(f"_o_{c}"))
        .alias(c)
        for c in vals
    ]
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(F.col("op"), *out_keys, *out_vals)
    )

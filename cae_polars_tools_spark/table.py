"""``Table`` — one facade over the repo's copy-on-write pointer-flip
protocol, so every lakehouse verb (read current / time travel / merge
/ delete / compact / zorder / diff / vacuum) goes through a single
discipline instead of each call site re-implementing it.

Versions are **manifest-based** (metadata-only commits, the
Delta/Iceberg snapshot model — ``cae_polars_tools_spark.manifest``):

* a version directory ``vN/`` holds the files the verb actually
  WROTE plus a ``_MANIFEST.json`` listing every file the version
  references — untouched files stay in the version directory that
  created them and are shared across versions, never copied. A
  one-key merge commits {affected rewrites + update rows + manifest};
  ``add_columns`` and ``restore`` commit pure metadata (zero data
  bytes move);
* a ``_CURRENT.json`` pointer ``{version, version_dir, batch_id}``
  flips LAST through the ByteStore seam (local ``os.replace`` /
  object-store single-object PUT — readers see the old table or the
  new one, never a torn state);
* ``vacuum`` is reference-counted: a data file is deleted only when
  no retained version references it; a no-longer-retained version
  whose files are still shared is demoted to an unreadable husk
  (``_TOMBSTONE.json``) until its last referencing version goes too;
* a version directory WITHOUT a manifest is a legacy self-contained
  version (round-12 layout, or a foreign writer's plain parquet
  directory) — it reads whole-directory, so old tables keep working.

Every mutating verb follows the same two steps: write the new
version directory fully (files, manifest, sidecars), then flip the
pointer. A crash between the two leaves an orphan directory the
pointer never referenced — the next writer clears it (the
``cow_upsert_sink`` rule).

The two *index* manifests in this repo — IVF-PQ's and the MinHash
band index's ``_INDEX.json`` — follow the same flip-last discipline
but version EACH ARTIFACT dir independently (codes/bands/sigs) under
one manifest, because an index mutation must swap several directories
atomically-together; they deliberately stay their own small protocols
rather than forcing multi-dir semantics into this single-dataset one.
Zarr generations are the third instance of the discipline (generation
pointer in consolidated metadata). One rule, three layouts, all
documented here so none drifts silently.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_CURRENT.json"
#: per-version commit RECORD directory: ``_txn/vN.json`` is created
#: with ``ByteStore.put_if_absent`` — on stores with a real
#: conditional put (local link(2); S3 If-None-Match via a custom
#: store) exactly ONE writer can commit version N, closing the
#: check-and-put race the optimistic checks only detect. The record
#: IS the commit; ``_CURRENT.json`` is a cache of the newest one,
#: repaired on read when a writer crashed between the two writes.
_TXN = "_txn"
#: per-version schema sidecar written by :meth:`Table.add_columns` —
#: an underscore-prefixed file inside the version directory (Spark's
#: parquet reader ignores it), recording the DECLARED schema as Spark
#: schema-JSON. Versions without one read with their physical schema.
_SCHEMA_SIDECAR = "_SCHEMA.json"
#: per-version commit record written by every mutating verb BEFORE the
#: pointer flip: {op, ts, stats} — the DESCRIBE HISTORY audit trail.
#: Underscore-prefixed like the schema sidecar, invisible to readers.
_COMMIT_SIDECAR = "_COMMIT.json"


class ConcurrentWriteError(RuntimeError):
    """Another writer flipped the pointer while this verb was
    running. The verb did NOT commit (its version directory is an
    unreferenced orphan); re-read the table and retry against the new
    current version."""


class Table:
    """A versioned copy-on-write parquet table rooted at ``root``.

    >>> t = Table.create(spark, path, seed_df)
    >>> t.merge(batch, keys=["doc_id"])      # CoW upsert → v1
    >>> t.delete("source = 'bad'")           # CoW takedown → v2
    >>> t.current()                          # DataFrame @ v2
    >>> t.read_version(0)                    # time travel
    >>> t.diff(0, keys=["doc_id"])           # change feed since v0
    >>> t.vacuum(keep_last=2)                # retention

    **Single-writer contract, optimistically enforced.** Exactly one
    mutating verb should run against a table root at a time (readers
    are unlimited — they only ever follow the pointer). This is the
    same contract Delta/Iceberg place on a table without a
    coordinating catalog, and every CoW artifact in this repo shares
    it (the MinHash band index, the IVF-PQ index, zarr generations).
    The facade deliberately does not carry a lock protocol (a lock
    file without heartbeat/lease semantics only converts a race into
    a stale-lock wedge); instead every verb runs two optimistic
    checks — at version reservation (before any write or orphan-clear,
    so a verb holding a stale snapshot aborts with ZERO damage) and
    immediately before publishing — and then COMMITS through a
    store-level conditional create: the verb's ``_txn/vN.json``
    record goes in with ``ByteStore.put_if_absent``. On CAS-capable
    stores (``cas_atomic`` — local link(2) here; S3 conditional PUT
    in a custom store) exactly one of two truly-concurrent writers
    can commit version N; the loser raises
    :class:`ConcurrentWriteError` with the pointer unmoved and its
    directory left as an unreferenced orphan the next writer clears.
    ``_CURRENT.json`` is a CACHE of the newest record — a crash
    between commit-create and cache flip still committed, and the
    next pointer read advances over the record and repairs the cache
    (:func:`read_pointer`). Version-DIRECTORY reservation is still
    check-and-clear, so two truly-concurrent writers can interleave
    their file writes inside one ``vN`` directory before either
    reaches the commit — but the post-write inventory ATTRIBUTES
    files by their Spark write-job uuid and refuses to commit a
    directory holding a second job's output
    (:meth:`_new_data_stats`), so the interleave is loud and
    lossless rather than wrong-rows-committed. Two residues stay
    outside the guarantee: files named by a foreign committer carry
    no uuid to attribute (the check skips), and a loser's files
    landing AFTER the winner's inventory become unreferenced orphans
    inside a committed version directory — invisible to readers
    (manifest-mode reads resolve refs, never the directory), at
    worst a storage leak until the directory is vacuumed. Serialize
    writers externally (the streaming sink's single foreachBatch
    thread, a nightly scheduler, a queue) when overlap is expected
    rather than exceptional; the CAS plus the uuid guard are the
    backstop that makes the overlap loud, not a license for it.
    """

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root.rstrip("/")

    # -- plumbing ---------------------------------------------------

    def _store(self):
        from cae_polars_tools_spark.sources.zarr_format import ByteStore

        return ByteStore.for_path(self.root)

    def meta(self) -> dict:
        """The current pointer ``{version, version_dir, batch_id}``.

        Truth is the COMMIT RECORDS (``_txn/vN.json``, created with a
        store-level conditional put — see :meth:`_commit`); the
        ``_CURRENT.json`` pointer is their cache, repaired here when a
        writer crashed between commit-create and cache flip."""
        meta = read_pointer(self._store())
        if meta is None:
            raise FileNotFoundError(
                f"no {_CURRENT} pointer under {self.root} — not a "
                "Table (seed one with Table.create)"
            )
        return meta

    def exists(self) -> bool:
        return read_pointer(self._store()) is not None

    def version(self) -> int:
        return self.meta()["version"]

    def _flip(self, meta: dict) -> None:
        self._store().put(_CURRENT, json.dumps(meta).encode())

    def _next_version_dir(self, meta: dict) -> tuple[int, str]:
        # optimistic early check (see the class docstring): ``meta``
        # is the snapshot the verb read its data from — if the
        # pointer has already moved past it, committing would lose
        # the other writer's update AND the orphan-clear below would
        # delete their COMMITTED directory. Abort before touching
        # anything; the caller re-reads and retries.
        fresh = self.meta()["version"]
        if fresh != meta["version"]:
            raise ConcurrentWriteError(
                f"pointer moved from v{meta['version']} to v{fresh} "
                "since this verb read the table — another writer "
                "committed; re-read and retry"
            )
        v = meta["version"] + 1
        vd = f"v{v}"
        store = self._store()
        if store.list_prefix(vd):
            # orphan from a crash between version-write and pointer
            # flip — never referenced, safe to clear. (A husk left by
            # vacuum can never collide here: vacuum only demotes
            # versions STRICTLY OLDER than the current pointer, and
            # version numbers never reuse.) Re-probe the COMMIT RECORD
            # at the last instant (the Table.create rule): a racing
            # writer can commit v between the fresh meta() probe above
            # and this clear, and clearing then would delete a
            # COMMITTED directory before our own CAS even gets to
            # fail. The remaining probe→clear window is the documented
            # same-directory interleave the class docstring carries.
            if store.size(f"{_TXN}/v{v}.json") is not None:
                raise ConcurrentWriteError(
                    f"version v{v} was committed by another writer "
                    f"while this verb was reserving {vd}; re-read the "
                    "table and retry"
                )
            store.delete_prefix(vd)
        return v, vd

    # -- manifest plumbing ------------------------------------------

    def _version_refs(self, version_dir: str) -> list[str]:
        """The version's file references (root-relative): manifest
        when present, else every data file under the directory
        (legacy self-contained version)."""
        from cae_polars_tools_spark.manifest import refs_of

        return refs_of(self._store(), version_dir)

    def _manifest_schema(self, version_dir: str):
        from pyspark.sql.types import StructType

        from cae_polars_tools_spark.manifest import load_manifest

        m = load_manifest(self._store(), version_dir)
        if m is None or not m.get("schema"):
            return None
        return StructType.fromJson(m["schema"])

    def _commit_manifest(
        self, version_dir: str, refs: list[str], schema_json,
        sizes=None, rows=None, col_stats=None,
    ) -> None:
        from cae_polars_tools_spark.manifest import write_manifest

        write_manifest(
            self._store(), version_dir, refs, schema_json,
            sizes=sizes, rows=rows, col_stats=col_stats,
        )

    def _new_data_files(self, version_dir: str) -> list[str]:
        """Data files physically written into a fresh version
        directory (refs root-relative) — the verb's actual output,
        inventoried after the Spark write, before the manifest."""
        from cae_polars_tools_spark.manifest import data_file_refs

        return data_file_refs(self._store(), version_dir)

    def _new_data_stats(self, version_dir: str) -> list[tuple[str, int]]:
        """``(ref, bytes)`` of the verb's freshly written files —
        sizes come from the inventory LISTING (no per-file stat), and
        ride into the new manifest so later verbs size their rewrites
        without any store calls.

        **Interleave guard.** Every Table verb performs exactly ONE
        Spark write job into its fresh version directory, and Spark
        stamps one job uuid into every part-file name of a write —
        so an inventory showing a SECOND uuid is another writer's
        output interleaved into this directory (the same-directory
        race the class docstring documents). Committing would adopt
        the other writer's partial files as this verb's rows — wrong
        data, silently. Refuse loudly instead: this verb's files stay
        behind as unreferenced orphans the next writer clears, and
        the caller re-reads and retries. Files without a parseable
        uuid (foreign committers) skip the check — no attribution,
        the documented caveat stands there."""
        from cae_polars_tools_spark.manifest import (
            data_file_stats,
            write_job_uuids,
        )

        stats = data_file_stats(self._store(), version_dir)
        uuids = write_job_uuids([r for r, _ in stats])
        if uuids is not None and len(uuids) > 1:
            raise ConcurrentWriteError(
                f"{version_dir} contains part files from "
                f"{len(uuids)} distinct Spark write jobs — another "
                "writer interleaved its output into this version "
                "directory while this verb was writing; committing "
                "would adopt its partial files as rows. Re-read the "
                "table and retry (the next verb clears the orphan)."
            )
        return stats

    def _version_sizes(self, version_dir: str) -> dict:
        """The version's manifest-recorded per-file sizes (empty for
        legacy manifests — callers fall back to stat per ref)."""
        from cae_polars_tools_spark.manifest import sizes_of

        return sizes_of(self._store(), version_dir)

    def _version_rows(self, version_dir: str) -> dict:
        """The version's manifest-recorded per-file row counts (empty
        for legacy manifests — merge falls back to a metadata count)."""
        from cae_polars_tools_spark.manifest import rows_of

        return rows_of(self._store(), version_dir)

    def _new_footer_accounting(
        self, new_stats: list[tuple[str, int]]
    ) -> tuple[dict, dict]:
        """``(rows, col_stats)`` of the verb's fresh files, from
        their parquet FOOTERS via ranged store reads (two
        ``get_range`` calls per new file, sizes reused from the
        inventory) — the commit-time accounting that lets every later
        merge size itself by manifest arithmetic instead of a count
        job, and prune its affected-file discovery to the files whose
        key range can intersect the batch. Past
        ``manifest.DISTRIBUTE_FOOTER_MIN`` fresh files the reads run
        as a Spark job (``manifest.footer_accounting``), so the verbs
        that re-emit every file — compact/zorder of a million-file
        table — commit with O(1) driver round-trips."""
        from cae_polars_tools_spark.manifest import footer_accounting

        return footer_accounting(
            self._store(), new_stats, spark=self.spark
        )

    def _version_stats(self, version_dir: str) -> dict:
        from cae_polars_tools_spark.manifest import stats_of

        return stats_of(self._store(), version_dir)

    def _merge_candidates(
        self, batch, keys, refs, rows, cstats, read_schema
    ):
        """File-skipping for merge's affected-file discovery: the
        manifest's per-file key min/max against the batch's key range
        — files provably outside it never even enter the discovery
        scan's relation, so planning cost is O(candidate files), not
        O(table files) (the Delta data-skipping shape).

        Returns ``(candidate_refs | None, batch_rows | None)``. The
        batch PRECONDITION ``merge_parquet`` needs ("unique on keys?
        how many rows?") rides the SAME aggregate job: min/max of a
        key expression over the DISTINCT keys equals min/max over the
        batch, so one ``groupBy(keys)`` aggregate answers pruning and
        precondition together and the verb saves a full driver
        action / cluster barrier per merge (a scheduling constant
        locally, a real commit-latency term on a cluster). A non-None
        second element means the precondition already ran here —
        ``Table.merge`` forwards it as ``merge_parquet(pre_rows=…)``;
        ``(None, None)`` (a key column missing from the batch — let
        merge_parquet's own validation name the problem) keeps the
        un-fused path.

        Candidate pruning itself stays None (no pruning, full
        discovery) unless the manifest carries the accounting merge
        needs to skip the full union entirely: a recorded schema, row
        counts covering EVERY ref, and column stats. Conservative
        everywhere — a key column that is not
        int/float/string/timestamp/date, an empty batch range, or a
        file without stats falls back to candidacy, never to pruning.
        Timestamp keys probe as epoch-MICROS and date keys as
        epoch-DAYS (``unix_micros``/``unix_date`` — deterministic
        under any session timezone), and decimal keys as UNSCALED
        ints tagged with their scale — each matching the int encoding
        the manifest records for them (``manifest._stat_bounds``).
        The decimal conversion happens DRIVER-SIDE on the collected
        ``Decimal`` bounds (exact at any precision ≤ 38) rather than
        as a Spark ``* 10^s`` expression, whose decimal-multiply
        precision rules can overflow 38 digits and silently ROUND —
        a rounded probe bound is an unsound prune."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import (
            DateType,
            DecimalType,
            NumericType,
            StringType,
            TimestampType,
        )

        if any(k not in batch.columns for k in keys):
            return None, None
        prunable = (
            read_schema is not None
            and bool(cstats)
            and all(r in rows for r in refs)
        )

        import decimal

        def _probe_expr(f):
            """(expr, encoding_tag, post) for a probe-able key column;
            ``post`` converts the collected bound exactly."""
            if isinstance(f.dataType, TimestampType):
                return F.unix_micros(F.col(f.name)), None, None
            if isinstance(f.dataType, DateType):
                return F.unix_date(F.col(f.name)), None, None
            if isinstance(f.dataType, DecimalType):
                s = f.dataType.scale
                ctx = decimal.Context(prec=60)  # exact for <= 38 digits
                return (
                    F.col(f.name),
                    {"t": "dec", "s": s},
                    lambda v, s=s, ctx=ctx: int(v.scaleb(s, ctx)),
                )
            if isinstance(f.dataType, (NumericType, StringType)):
                return F.col(f.name), None, None
            return None

        probed = (
            {
                f.name: et
                for f in batch.schema.fields
                if f.name in keys and (et := _probe_expr(f)) is not None
            }
            if prunable
            else {}
        )
        per_key = batch.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("__n")
        )
        agg = per_key.agg(
            F.coalesce(F.sum("__n"), F.lit(0)).alias("__rows"),
            F.coalesce(F.max("__n"), F.lit(0)).alias("__mx"),
            *[F.min(e).alias(f"lo_{k}") for k, (e, _, _) in probed.items()],
            *[F.max(e).alias(f"hi_{k}") for k, (e, _, _) in probed.items()],
        ).collect()[0]
        if agg["__mx"] > 1:
            # error path only: one extra job to name an example key
            # (message kept identical to merge_parquet's own check)
            dup = per_key.filter(F.col("__n") > 1).limit(1).collect()
            raise ValueError(
                f"updates are not unique on {keys}: e.g. "
                f"{tuple(dup[0][k] for k in keys)}"
            )
        batch_rows = int(agg["__rows"])
        ranges = {}
        for k, (_, tag, post) in probed.items():
            lo, hi = agg[f"lo_{k}"], agg[f"hi_{k}"]
            if lo is None or hi is None:
                continue
            if post is not None:
                lo, hi = post(lo), post(hi)
            ranges[k] = (lo, hi) if tag is None else (lo, hi, tag)
        if not ranges:
            return None, batch_rows
        from cae_polars_tools_spark.manifest import refs_intersecting

        return refs_intersecting(cstats, refs, ranges), batch_rows

    def _commit(
        self,
        v: int,
        vd: str,
        batch_id: int,
        op: str | None = None,
        stats: dict | None = None,
    ) -> None:
        # optimistic pre-flip check (see the class docstring): the
        # verb computed v against the pointer it read — if the
        # pointer has moved since, another writer committed first and
        # flipping now would silently drop their version. Refuse
        # loudly; this verb's directory is an unreferenced orphan.
        cur = self.meta()["version"]
        if cur != v - 1:
            raise ConcurrentWriteError(
                f"pointer moved from v{v - 1} to v{cur} while this "
                f"verb was writing {vd} — another writer committed "
                "first; re-read the table and retry"
            )
        if op is not None:
            self._put_commit(vd, op, stats)
        meta = {"version": v, "version_dir": vd, "batch_id": batch_id}
        # THE commit: a conditional create of the version's _txn
        # record. On CAS-capable stores (ByteStore.cas_atomic) exactly
        # one of two truly-concurrent writers creates it — the loser
        # raises here with zero damage (its directory is an orphan the
        # next writer clears), which closes the interleaving the
        # optimistic checks above can only detect. On stores without a
        # conditional put the create is check-then-put: still a
        # tighter window than pointer-overwrite, honest in the class
        # docstring. A crash AFTER this create is already committed —
        # read_pointer() advances over the record and repairs the
        # cache below.
        if not self._store().put_if_absent(
            f"{_TXN}/v{v}.json", json.dumps(meta).encode()
        ):
            raise ConcurrentWriteError(
                f"version v{v} was committed by another writer while "
                f"this verb was writing {vd}; re-read the table and "
                "retry"
            )
        self._flip(meta)

    def _put_commit(
        self, version_dir: str, op: str, stats: dict | None
    ) -> None:
        """The version's audit record — written INTO the immutable
        version directory before the flip, so history travels with
        the data (vacuum drops a version's record with its bytes)."""
        import time

        self._store().put(
            f"{version_dir}/{_COMMIT_SIDECAR}",
            json.dumps(
                {
                    "op": op,
                    "ts": time.time(),
                    "stats": stats or {},
                }
            ).encode(),
        )

    def describe_history(self) -> list[dict]:
        """One record per RETAINED version, oldest first: ``{version,
        op, ts, stats}`` — the audit-trail read (Delta's DESCRIBE
        HISTORY shape). Versions written before this facade recorded
        commits (or by foreign writers) report ``op: "unknown"``.
        History is exactly as durable as the versions themselves:
        :meth:`vacuum` drops a version's record with its bytes, which
        is the honest retention story (an audit log outliving its
        data belongs in an external system)."""
        return history_records(self._store())

    # -- declared schema (widen-only evolution) ----------------------

    def _declared_schema(self, version_dir: str):
        """The version's declared StructType from its ``_SCHEMA.json``
        sidecar, or None for a never-evolved version (physical schema
        is the declared schema)."""
        from pyspark.sql.types import StructType

        raw = self._store().get(f"{version_dir}/{_SCHEMA_SIDECAR}")
        return None if raw is None else StructType.fromJson(json.loads(raw))

    def _put_sidecar(self, version_dir: str, schema) -> None:
        self._store().put(
            f"{version_dir}/{_SCHEMA_SIDECAR}",
            json.dumps(schema.jsonValue()).encode(),
        )

    def _propagate_schema(self, src_vd: str, dst_vd: str):
        """Carry the declared schema forward onto a new version (every
        mutating verb calls this BEFORE the pointer flip, so a reader
        of the new version always sees the sidecar). Returns the
        schema (for the verb's own read) or None."""
        schema = self._declared_schema(src_vd)
        if schema is not None:
            self._put_sidecar(dst_vd, schema)
        return schema

    def _read_dir(self, version_dir: str) -> DataFrame:
        """Read a version under its declared schema: files lacking an
        evolved column null-fill it at read
        (``unionByName(allowMissingColumns=True)`` semantics) — old
        files are never rewritten just to add a column. Manifest
        versions resolve their file references (possibly spanning
        several version directories); a version without a manifest
        reads its whole directory (legacy self-contained layout)."""
        from cae_polars_tools_spark.manifest import load_manifest, read_refs

        store = self._store()
        schema = self._declared_schema(version_dir)
        m = load_manifest(store, version_dir)
        if m is None:
            reader = (
                self.spark.read
                if schema is None
                else self.spark.read.schema(schema)
            )
            return reader.parquet(store.spark_path(version_dir))
        if schema is None:
            schema = self._manifest_schema(version_dir)
        if not m["files"]:
            # a version may legitimately reference zero files (e.g. a
            # delete that removed every row) — the manifest's schema
            # keeps it readable
            if schema is None:
                raise ValueError(
                    f"version {version_dir} is empty and records no "
                    "schema — unreadable"
                )
            return self.spark.createDataFrame([], schema)
        return read_refs(
            self.spark, self.root, m["files"], schema, store=store
        )

    def _normalize_batch(self, batch: DataFrame, schema) -> DataFrame:
        """Align a merge batch to the declared schema: unknown columns
        refuse loudly, declared-but-missing columns null-fill (a batch
        produced before the widening stays mergeable), present columns
        keep merge_parquet's strict dtype validation downstream."""
        from pyspark.sql import functions as F

        declared = {f.name for f in schema.fields}
        unknown = sorted(set(batch.columns) - declared)
        if unknown:
            raise ValueError(
                f"batch carries columns not in the table schema: "
                f"{unknown} — evolve the table first (add_columns)"
            )
        return batch.select(
            *[
                F.col(f.name)
                if f.name in batch.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )

    # -- reads ------------------------------------------------------

    def current(self) -> DataFrame:
        """The live version (what the pointer references), under its
        declared schema when the table has been widened."""
        return self._read_dir(self.meta()["version_dir"])

    def read_version(self, version: int) -> DataFrame:
        """Time travel to an immutable retained version — read under
        the schema DECLARED AT THAT VERSION (a pre-evolution version
        keeps its narrower schema; that the schema changed is itself
        part of history)."""
        from cae_polars_tools_spark.manifest import is_tombstoned

        vd = f"v{version}"
        store = self._store()
        if not store.list_prefix(vd) or is_tombstoned(store, vd):
            raise FileNotFoundError(
                f"version {version} not found under {self.root} "
                "(never written, or removed by vacuum)"
            )
        return self._read_dir(vd)

    def history(self) -> list[int]:
        """Version numbers still readable on storage (oldest first).
        Husk directories — vacuumed versions whose files survive only
        because newer manifests still reference them — are not
        versions and do not appear."""
        from cae_polars_tools_spark.manifest import is_tombstoned

        store = self._store()
        out = set()
        for name in store.list_prefix(""):
            m = re.fullmatch(r"v(\d+)/?", name)
            if m and not is_tombstoned(store, f"v{m.group(1)}"):
                out.add(int(m.group(1)))
        return sorted(out)

    def diff(
        self,
        since: int,
        keys: list[str],
        until: int | None = None,
    ) -> DataFrame:
        """Change data feed between two retained versions (default:
        since → current): one (op, key, new-image) row per insert /
        update / delete — ``storage.diff_tables`` semantics."""
        from cae_polars_tools_spark.storage import diff_tables

        old = self.read_version(since)
        new = (
            self.current() if until is None else self.read_version(until)
        )
        if set(old.columns) < set(new.columns):
            # widen-only evolution between the two versions: null-fill
            # the old side up to the new schema (an unchanged row then
            # compares null==null on the evolved column and drops out).
            # Only the strict-subset direction normalizes — a diff
            # whose OLD side is wider (e.g. across a restore() to a
            # pre-evolution version) falls through to diff_tables'
            # accurate schema-drift refusal.
            old = self._normalize_batch(old, new.schema)
        return diff_tables(old, new, keys)

    # -- writes (version dir first, pointer flip LAST) --------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        batch_id: int = -1,
        op: str = "create",
    ) -> "Table":
        """Seed ``v0`` (files + manifest) and flip the initial
        pointer. ``batch_id``/``op`` let the streaming upsert sink
        seed through the same path it merges through."""
        t = cls(spark, root)
        if t.exists():
            raise FileExistsError(f"Table already exists at {root}")
        # a v0 directory WITHOUT a commit record is a crash orphan
        # from an earlier create (the record is the commit) — clear
        # it, the same next-writer rule every other verb applies.
        # Re-check the record IMMEDIATELY before clearing: a racing
        # create may have committed since the exists() probe above,
        # and clearing then would destroy committed data. The
        # remaining window (check → clear → write) is the documented
        # same-directory interleave; the CAS below still guarantees
        # at most one create COMMITS.
        store = t._store()
        if store.list_prefix("v0"):
            if store.size(f"{_TXN}/v0.json") is not None:
                raise FileExistsError(f"Table already exists at {root}")
            store.delete_prefix("v0")
        df.write.mode("errorifexists").parquet(store.spark_path("v0"))
        v0_stats = t._new_data_stats("v0")
        v0_rows, v0_cstats = t._new_footer_accounting(v0_stats)
        t._commit_manifest(
            "v0",
            [r for r, _ in v0_stats],
            df.schema.jsonValue(),
            sizes=dict(v0_stats),
            rows=v0_rows,
            col_stats=v0_cstats,
        )
        t._put_commit("v0", op, None)
        meta = {"version": 0, "version_dir": "v0", "batch_id": batch_id}
        # conditional create = the seed commit: two racing creates,
        # exactly one COMMITS (CAS-capable stores); the loser raises.
        # NB: if both raced past the orphan-clear above, their file
        # writes interleaved in one v0 directory (the documented
        # same-directory caveat in the class docstring) — the CAS
        # bounds the damage to "one commit", not "clean directories"
        if not store.put_if_absent(
            f"{_TXN}/v0.json", json.dumps(meta).encode()
        ):
            raise ConcurrentWriteError(
                f"another writer seeded {root} while this create was "
                "writing v0"
            )
        t._flip(meta)
        return t

    def merge(
        self,
        batch: DataFrame,
        keys: list[str],
        batch_id: int | None = None,
        op: str = "merge",
    ) -> dict:
        """CoW upsert as a metadata-only commit outside the genuinely
        touched files: only current-version files containing a matched
        key rewrite (plus the update rows); every other file is
        RE-REFERENCED by the new version's manifest — zero untouched
        bytes move (``storage.merge_parquet`` manifest mode). The
        pointer flips last."""
        from cae_polars_tools_spark.storage import merge_parquet

        meta = self.meta()
        cur = meta["version_dir"]
        schema = self._declared_schema(cur)
        if schema is not None:
            batch = self._normalize_batch(batch, schema)
        cur_refs = self._version_refs(cur)
        if not cur_refs:
            # the current version is EMPTY (e.g. a delete removed
            # every row): the merge is a pure insert — validate the
            # batch against the recorded schema, dedup-check the
            # keys, and seed the new version directly
            return self._insert_into_empty(
                meta, batch, keys, batch_id=batch_id, op=op
            )
        cur_sizes = self._version_sizes(cur)
        cur_rows = self._version_rows(cur)
        cur_cstats = self._version_stats(cur)
        read_schema = schema or self._manifest_schema(cur)
        # persist the batch across BOTH consumers: the candidate
        # range-agg below and merge_parquet's own uniqueness check /
        # key broadcast / write all read one materialization instead
        # of recomputing an expensive update plan twice
        batch = batch.persist()
        try:
            candidates, pre_rows = self._merge_candidates(
                batch, keys, cur_refs, cur_rows, cur_cstats, read_schema
            )
            v, vd = self._next_version_dir(meta)
            stats = merge_parquet(
                self.spark,
                self.root,
                batch,
                keys,
                f"{self.root}/{vd}",
                read_schema=read_schema,
                source_refs=cur_refs,
                copy_untouched=False,
                source_sizes=cur_sizes,
                source_rows=cur_rows,
                candidate_refs=candidates,
                pre_rows=pre_rows,
            )
        finally:
            batch.unpersist()
        untouched = stats.pop("untouched_refs")
        new_stats = self._new_data_stats(vd)
        refs = untouched + [r for r, _ in new_stats]
        sizes = {
            **{r: cur_sizes[r] for r in untouched if r in cur_sizes},
            **dict(new_stats),
        }
        new_rows, new_cstats = self._new_footer_accounting(new_stats)
        rows = {
            **{r: cur_rows[r] for r in untouched if r in cur_rows},
            **new_rows,
        }
        col_stats = {
            **{r: cur_cstats[r] for r in untouched if r in cur_cstats},
            **new_cstats,
        }
        self._commit_manifest(
            vd, refs, stats.pop("schema"), sizes=sizes, rows=rows,
            col_stats=col_stats,
        )
        self._propagate_schema(cur, vd)
        if batch_id is not None:
            stats["batch_id"] = batch_id
        self._commit(
            v,
            vd,
            meta["batch_id"] if batch_id is None else batch_id,
            op=op,
            stats=stats,
        )
        stats["version"] = v
        return stats

    def _insert_into_empty(
        self,
        meta: dict,
        batch: DataFrame,
        keys: list[str],
        batch_id: int | None,
        op: str,
    ) -> dict:
        """Merge into a version with zero files: a pure insert.
        Keeps merge_parquet's contracts — schema validated by name,
        batch unique on keys — then seeds the new version from the
        batch alone."""
        from pyspark.sql import functions as F

        cur = meta["version_dir"]
        schema = (
            self._declared_schema(cur) or self._manifest_schema(cur)
        )
        if schema is not None:
            want = {f.name for f in schema.fields}
            if set(batch.columns) != want:
                raise ValueError(
                    f"batch columns {sorted(batch.columns)} must "
                    f"equal the table's {sorted(want)}"
                )
            # merge_parquet's dtype-drift refusal stays in force: a
            # wrong-typed insert would commit files conflicting with
            # the manifest's recorded schema and poison later reads
            b_types = {f.name: f.dataType for f in batch.schema.fields}
            drift = {
                f.name: (
                    b_types[f.name].simpleString(),
                    f.dataType.simpleString(),
                )
                for f in schema.fields
                if b_types[f.name] != f.dataType
            }
            if drift:
                raise ValueError(
                    "updates schema types differ from the target's: "
                    + ", ".join(
                        f"{c}: updates={u} target={t_}"
                        for c, (u, t_) in drift.items()
                    )
                    + " — cast the updates to the target schema first"
                )
            batch = batch.select(*[f.name for f in schema.fields])
        dup = (
            batch.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"updates are not unique on {keys}: e.g. "
                f"{tuple(dup[0][k] for k in keys)}"
            )
        v, vd = self._next_version_dir(meta)
        store = self._store()
        batch.write.mode("errorifexists").parquet(store.spark_path(vd))
        new_stats = self._new_data_stats(vd)
        new_rows, new_cstats = self._new_footer_accounting(new_stats)
        rows = sum(new_rows.values())  # footer arithmetic, no count job
        self._commit_manifest(
            vd,
            [r for r, _ in new_stats],
            schema.jsonValue() if schema is not None else batch.schema.jsonValue(),
            sizes=dict(new_stats),
            rows=new_rows,
            col_stats=new_cstats,
        )
        self._propagate_schema(cur, vd)
        stats = {
            "files_rewritten": 0,
            "files_referenced": 0,
            "rows_updated": 0,
            "rows_inserted": rows,
        }
        if batch_id is not None:
            stats["batch_id"] = batch_id
        self._commit(
            v,
            vd,
            meta["batch_id"] if batch_id is None else batch_id,
            op=op,
            stats=stats,
        )
        stats["version"] = v
        return stats

    def delete(
        self,
        predicate,
        op_stats: dict | None = None,
        candidate_refs: list | None = None,
        candidates_version: int | None = None,
    ) -> dict:
        """CoW DELETE WHERE (``storage.delete_parquet`` manifest
        mode): matched files rewrite, the rest re-reference in the
        new manifest — zero untouched bytes move; pointer flips last.
        The takedown verb. Deleting from an EMPTY version commits a
        no-op version (idempotent takedowns must not error).
        ``op_stats`` folds caller context (e.g. ``cascade_delete``'s
        ``takedown_id`` correlation key) into the version's commit
        record, so one takedown is traceable across every artifact's
        history."""
        from cae_polars_tools_spark.storage import delete_parquet

        meta = self.meta()
        if (
            candidate_refs is not None
            and candidates_version is not None
            and meta["version"] != candidates_version
        ):
            # the candidates were computed against a version another
            # writer has since superseded — their stats may EXCLUDE a
            # file the new version added. Dropping them (unpruned
            # path) is always correct; keeping them would be a silent
            # missed delete.
            candidate_refs = None
        cur = meta["version_dir"]
        cur_refs = self._version_refs(cur)
        if not cur_refs:
            schema = (
                self._declared_schema(cur) or self._manifest_schema(cur)
            )
            if schema is None:
                # an empty version with no recorded schema cannot seed
                # another one — committing schema=None would create a
                # version _read_dir later refuses as unreadable.
                # Refuse HERE, where the caller can still act (a
                # legacy empty dir has no footers to derive from).
                raise ValueError(
                    f"delete: current version {cur} is empty and "
                    "records no schema — the no-op version it would "
                    "commit would be unreadable; merge data first or "
                    "recreate the table"
                )
            v, vd = self._next_version_dir(meta)
            self._commit_manifest(vd, [], schema.jsonValue())
            self._propagate_schema(cur, vd)
            stats = {
                "files_rewritten": 0,
                "files_referenced": 0,
                "rows_deleted": 0,
            }
            if op_stats:
                stats.update(op_stats)
            self._commit(v, vd, meta["batch_id"], op="delete", stats=stats)
            stats["version"] = v
            return stats
        cur_sizes = self._version_sizes(cur)
        read_schema = self._declared_schema(cur)
        if candidate_refs is not None and read_schema is None:
            read_schema = self._manifest_schema(cur)
        v, vd = self._next_version_dir(meta)
        stats = delete_parquet(
            self.spark,
            self.root,
            predicate,
            f"{self.root}/{vd}",
            read_schema=read_schema,
            source_refs=cur_refs,
            copy_untouched=False,
            source_sizes=cur_sizes,
            candidate_refs=candidate_refs,
        )
        untouched = stats.pop("untouched_refs")
        new_stats = self._new_data_stats(vd)
        refs = untouched + [r for r, _ in new_stats]
        sizes = {
            **{r: cur_sizes[r] for r in untouched if r in cur_sizes},
            **dict(new_stats),
        }
        cur_rows = self._version_rows(cur)
        cur_cstats = self._version_stats(cur)
        new_rows, new_cstats = self._new_footer_accounting(new_stats)
        rows = {
            **{r: cur_rows[r] for r in untouched if r in cur_rows},
            **new_rows,
        }
        col_stats = {
            **{r: cur_cstats[r] for r in untouched if r in cur_cstats},
            **new_cstats,
        }
        self._commit_manifest(
            vd, refs, stats.pop("schema"), sizes=sizes, rows=rows,
            col_stats=col_stats,
        )
        self._propagate_schema(cur, vd)
        if op_stats:
            stats.update(op_stats)
        self._commit(v, vd, meta["batch_id"], op="delete", stats=stats)
        stats["version"] = v
        return stats

    def delete_keys(
        self, key_col: str, values, op_stats: dict | None = None
    ) -> dict:
        """Pruned takedown: ``DELETE WHERE key_col IN (values)`` with
        the affected-file discovery narrowed by the manifest's
        per-file stats — the id list's [min, max] range is matched
        against each file's recorded range, so purging a handful of
        ids from a key-clustered table plans over a handful of files,
        never the table (``cascade_delete`` routes the base-table
        purge through here). Falls back to the unpruned
        :meth:`delete` whenever the manifest lacks the accounting or
        the values are not range-comparable — conservative, never a
        silent miss."""
        from pyspark.sql import functions as F

        from cae_polars_tools_spark.manifest import (
            id_range_of,
            refs_intersecting,
        )

        pred = F.col(key_col).isin(list(values))
        rng = id_range_of(values)
        candidates = None
        cand_version = None
        if rng is not None:
            snap = self.meta()  # candidates stamped with THIS version
            cur = snap["version_dir"]
            cstats = self._version_stats(cur)
            if cstats:
                candidates = refs_intersecting(
                    cstats,
                    self._version_refs(cur),
                    {key_col: rng},
                )
                cand_version = snap["version"]
        return self.delete(
            pred,
            op_stats=op_stats,
            candidate_refs=candidates,
            candidates_version=cand_version,
        )

    def compact(self, **kwargs) -> dict:
        """Rewrite the current version toward target-sized files
        (``storage.compact_parquet``) as a NEW version — the serving-
        layout verb, now inside the same pointer discipline instead of
        compacting into a side directory."""
        from cae_polars_tools_spark.storage import compact_parquet

        meta = self.meta()
        cur = meta["version_dir"]
        schema = self._declared_schema(cur) or self._manifest_schema(cur)
        cur_refs = self._version_refs(cur)
        if not cur_refs:
            raise ValueError(
                "compact: the current version is empty — nothing to "
                "rewrite (merge data first)"
            )
        if schema is None:
            # legacy version (no sidecar, no manifest schema): derive
            # from its parquet footers so the NEW version never
            # commits schema=None (an empty delete on it later would
            # otherwise be unreadable)
            schema = self._read_dir(cur).schema
        v, vd = self._next_version_dir(meta)
        n_files = compact_parquet(
            self.spark,
            self.root,
            f"{self.root}/{vd}",
            read_schema=self._declared_schema(cur),
            source_refs=cur_refs,
            source_sizes=self._version_sizes(cur),
            **kwargs,
        )
        # a compaction rewrites EVERYTHING: the new manifest references
        # only the fresh files, so vacuuming past it reclaims every
        # predecessor file — this is the verb that resets manifest
        # sprawl (union branch count) to 1
        new_stats = self._new_data_stats(vd)
        new_rows, new_cstats = self._new_footer_accounting(new_stats)
        self._commit_manifest(
            vd,
            [r for r, _ in new_stats],
            schema.jsonValue(),
            sizes=dict(new_stats),
            rows=new_rows,
            col_stats=new_cstats,
        )
        self._propagate_schema(cur, vd)
        self._commit(
            v, vd, meta["batch_id"], op="compact",
            stats={"files": n_files},
        )
        return {"files": n_files, "version": v}

    def zorder(self, cols: list[str], **kwargs) -> dict:
        """Interleaved-bit clustering rewrite (``storage
        .zorder_parquet``) as a new version — multi-column skipping
        layout under the same pointer discipline."""
        from cae_polars_tools_spark.storage import zorder_parquet

        meta = self.meta()
        cur = meta["version_dir"]
        schema = self._declared_schema(cur) or self._manifest_schema(cur)
        cur_refs = self._version_refs(cur)
        if not cur_refs:
            raise ValueError(
                "zorder: the current version is empty — nothing to "
                "rewrite (merge data first)"
            )
        if schema is None:
            # same legacy-schema derivation as compact(): never commit
            # a schema-less version
            schema = self._read_dir(cur).schema
        v, vd = self._next_version_dir(meta)
        n_files = zorder_parquet(
            self.spark,
            self.root,
            f"{self.root}/{vd}",
            cols,
            read_schema=self._declared_schema(cur),
            source_refs=cur_refs,
            source_sizes=self._version_sizes(cur),
            **kwargs,
        )
        new_stats = self._new_data_stats(vd)
        new_rows, new_cstats = self._new_footer_accounting(new_stats)
        self._commit_manifest(
            vd,
            [r for r, _ in new_stats],
            schema.jsonValue(),
            sizes=dict(new_stats),
            rows=new_rows,
            col_stats=new_cstats,
        )
        self._propagate_schema(cur, vd)
        self._commit(
            v, vd, meta["batch_id"], op="zorder",
            stats={"files": n_files, "cols": cols},
        )
        return {"files": n_files, "version": v}

    def add_columns(self, cols: dict) -> dict:
        """Widen-only schema evolution as a PURE METADATA commit: add
        new NULLABLE columns (``{name: spark_ddl_type}``) as a CoW
        version that copies **zero bytes** — the new version's
        manifest references exactly the current version's files and a
        ``_SCHEMA.json`` sidecar declares the widened schema; every
        read of the version null-fills the new columns lazily
        (``unionByName(allowMissingColumns=True)`` semantics via an
        explicit-schema parquet read). This is the Delta/Iceberg ADD
        COLUMN shape: at 100 TB the commit writes two small JSON
        objects, never touches a data file, and works wherever the
        ByteStore does. Later merges accept batches on EITHER schema
        (old batches null-fill, see :meth:`_normalize_batch`);
        ``merge_parquet``'s strict validation — unknown columns,
        dtype drift, duplicate keys — stays in force for everything
        else. Renames, drops, and type changes are refused by
        construction: they would change the meaning of bytes already
        written, which a pointer flip must never do."""
        from pyspark.sql.types import StructField, StructType

        if not cols:
            raise ValueError("add_columns needs at least one column")
        meta = self.meta()
        cur_vd = meta["version_dir"]
        cur = self._declared_schema(cur_vd)
        if cur is None:
            cur = self._read_dir(cur_vd).schema
        existing = {f.name for f in cur.fields}
        dup = sorted(set(cols) & existing)
        if dup:
            raise ValueError(
                f"add_columns: columns already present: {dup}"
            )
        new_fields = []
        for name, dtype in cols.items():
            # parse the DDL type through the public expression path —
            # an invalid type string fails loudly here, not at read
            parsed = (
                self.spark.range(0)
                .selectExpr(f"cast(null as {dtype}) as `{name}`")
                .schema.fields[0]
            )
            new_fields.append(StructField(name, parsed.dataType, True))
        widened = StructType(list(cur.fields) + new_fields)
        v, vd = self._next_version_dir(meta)
        refs = self._version_refs(cur_vd)
        self._commit_manifest(
            vd, refs, widened.jsonValue(),
            sizes=self._version_sizes(cur_vd),
            rows=self._version_rows(cur_vd),
            col_stats=self._version_stats(cur_vd),
        )
        self._put_sidecar(vd, widened)
        self._commit(
            v, vd, meta["batch_id"], op="add_columns",
            stats={
                "added": {
                    f.name: f.dataType.simpleString()
                    for f in new_fields
                },
                "files_referenced": len(refs),
                "bytes_copied": 0,
            },
        )
        return {
            "version": v,
            "added": {
                f.name: f.dataType.simpleString() for f in new_fields
            },
        }

    def restore(self, version: int) -> dict:
        """Roll the table back to a retained ``version`` — as a NEW
        version (the Delta RESTORE semantic): history stays linear
        and append-only, the pointer never moves backwards (vacuum's
        "strictly older than current" invariant survives), and the
        bad intermediate versions remain retained for forensics until
        vacuumed. A PURE METADATA commit: the new version's manifest
        references the restored version's files — zero data bytes
        move, and reference-counted vacuum keeps every shared file
        alive exactly as long as some retained version needs it."""
        meta = self.meta()
        src_vd = f"v{version}"
        store = self._store()
        from cae_polars_tools_spark.manifest import is_tombstoned

        if not store.list_prefix(src_vd) or is_tombstoned(store, src_vd):
            raise FileNotFoundError(
                f"version {version} not found under {self.root} "
                "(never written, or removed by vacuum)"
            )
        v, vd = self._next_version_dir(meta)
        schema = (
            self._declared_schema(src_vd)
            or self._manifest_schema(src_vd)
        )
        self._commit_manifest(
            vd,
            self._version_refs(src_vd),
            schema.jsonValue() if schema is not None else None,
            sizes=self._version_sizes(src_vd),
            rows=self._version_rows(src_vd),
            col_stats=self._version_stats(src_vd),
        )
        self._propagate_schema(src_vd, vd)
        self._commit(
            v, vd, meta["batch_id"], op="restore",
            stats={"restored_from": version},
        )
        return {"version": v, "restored_from": version}

    # -- retention / streaming -------------------------------------

    def vacuum(self, keep_last: int = 2) -> dict:
        """Reference-counted retention: versions older than the
        newest ``keep_last`` stop being readable, and their data
        files are deleted **only if no retained version references
        them** — a file shared with a newer manifest survives until
        its last referencing version is vacuumed too (the version
        directory stays behind as a tombstoned husk holding the
        shared files). Returns ``{"removed": [dirs], "demoted":
        [dirs], "files_deleted": n}``."""
        return vacuum_table(self.root, keep_last=keep_last)

    def maintain(
        self,
        max_branches: int = 16,
        target_file_bytes: int = 128 * 1024 * 1024,
        auto_compact: bool = False,
    ) -> dict:
        """Layout health check for the manifest-sprawl growth
        ``read_refs`` documents: every verb since the last compaction
        adds one birth directory to the current version's union plan,
        so scan planning degrades linearly until a compaction resets
        the branch count to 1. Returns ``{branches, files, bytes,
        recommendation}``; with ``auto_compact=True`` and branches >
        ``max_branches`` it RUNS :meth:`compact` (a new version under
        the normal pointer discipline) and reports what it did —
        the policy hook a nightly scheduler calls after its merge
        batch. Pure metadata otherwise: one manifest read, zero data
        I/O."""
        from cae_polars_tools_spark.manifest import group_refs, ref_sizes

        meta = self.meta()
        cur = meta["version_dir"]
        refs = self._version_refs(cur)
        groups, _pcols = group_refs(refs)
        branches = len(groups) if refs else 0
        sizes = self._version_sizes(cur)
        total = (
            sum(ref_sizes(self._store(), refs, known=sizes)) if refs else 0
        )
        out = {
            "branches": branches,
            "files": len(refs),
            "bytes": total,
            "recommendation": None,
            "compacted": False,
        }
        if branches > max_branches:
            if auto_compact:
                res = self.compact(target_file_bytes=target_file_bytes)
                out["compacted"] = True
                out["version"] = res["version"]
                out["recommendation"] = (
                    f"compacted: {branches} scan branches -> 1 "
                    f"({res['files']} files)"
                )
            else:
                out["recommendation"] = (
                    f"compact(): the current version unions "
                    f"{branches} birth directories (> {max_branches}) "
                    "— scan planning degrades linearly until a "
                    "compaction resets it"
                )
        return out

    def upsert_sink(self, keys: list[str], order_col: str, **kwargs):
        """The streaming write path into this same table: a
        ``foreachBatch`` callable (``streaming.events
        .cow_upsert_sink``) whose versions and pointer are exactly the
        ones every verb above reads — including the declared-schema
        sidecar after :meth:`add_columns` (pre-evolution micro-batches
        null-fill their missing columns, exactly like :meth:`merge`)."""
        from cae_polars_tools_spark.streaming.events import (
            cow_upsert_sink,
        )

        return cow_upsert_sink(self.root, keys, order_col, **kwargs)


def read_pointer(store) -> dict | None:
    """The table's current ``{version, version_dir, batch_id}`` — the
    single pointer-read implementation behind :meth:`Table.meta`,
    :func:`vacuum_table`, and the streaming sink's replay guard.

    Reads the ``_CURRENT.json`` cache, then advances over any NEWER
    ``_txn/vN.json`` commit records (a writer that crashed between
    commit-create and cache flip still committed — its version
    directory was fully written before the record), repairing the
    cache best-effort so later reads are one GET again. The advance
    PROBES record keys upward from the cached version instead of
    listing the directory — on the fresh-cache common case that is
    one metadata miss (no LIST round-trip on object stores), and it
    works on stores that cannot list at all (plain HTTP). Probing by
    consecutive key is sound because staleness is bounded: the cache
    is written immediately after each commit record, and vacuum (the
    only record deleter) repairs the cache first and removes only
    records OLDER than it — so any un-cached records sit at
    version+1, version+2, … with no gaps."""
    raw = store.get(_CURRENT)
    meta = None if raw is None else json.loads(raw)
    v = (meta["version"] if meta else -1) + 1
    advanced = None
    while True:
        rec = store.get(f"{_TXN}/v{v}.json")
        if rec is None:
            break
        advanced = rec
        v += 1
    if advanced is not None:
        meta = json.loads(advanced)
        try:
            # re-read-and-compare before repairing: a writer can flip
            # the cache to a NEWER version while this reader was
            # probing records — blindly putting our advanced value
            # would make the raw cache REGRESS for anything consuming
            # _CURRENT.json without the record probe (external
            # tooling, non-upgraded readers). Repair only while the
            # cache is still strictly behind what we advanced to.
            cur_raw = store.get(_CURRENT)
            cur_v = (
                json.loads(cur_raw)["version"] if cur_raw is not None else -1
            )
            if cur_v < meta["version"]:
                store.put(_CURRENT, json.dumps(meta).encode())
        except Exception:
            # best-effort cache repair, as promised: a read-only
            # replica (http mirror, no write perms) must still be
            # able to READ the advanced pointer
            pass
    return meta


def history_records(store) -> list[dict]:
    """Spark-free replay of a Table's commit history from a ByteStore:
    one ``{version, op, ts, stats}`` per retained (non-tombstoned)
    version, oldest first, ``op: "unknown"`` for versions without a
    commit sidecar. The single implementation behind
    :meth:`Table.describe_history` and the CLI ``history`` subcommand
    — retention/tombstone semantics must never diverge between the
    two views."""
    from cae_polars_tools_spark.manifest import is_tombstoned

    versions = sorted(
        int(m.group(1))
        for n in store.list_prefix("")
        if (m := re.fullmatch(r"v(\d+)/?", n))
        and not is_tombstoned(store, f"v{m.group(1)}")
    )
    out = []
    for v in versions:
        raw = store.get(f"v{v}/{_COMMIT_SIDECAR}")
        rec = (
            json.loads(raw)
            if raw is not None
            else {"op": "unknown", "ts": None, "stats": {}}
        )
        out.append({"version": v, **rec})
    return out


def vacuum_table(root: str, keep_last: int = 2) -> dict:
    """Reference-counted vacuum over a versioned table root — the
    engine behind :meth:`Table.vacuum` and the streaming sink's
    ``vacuum_versions``.

    Retention rule (unchanged from round 12): only versions STRICTLY
    older than the newest ``keep_last`` are candidates, the current
    pointer's version is always kept (``keep_last`` clamps to ≥1),
    and the pointer itself is untouched. New under manifests: a
    candidate's files are deleted only when no retained version's
    manifest references them; shared files park in a tombstoned husk
    directory until the last referencing version is vacuumed (husks
    re-candidate on every run, so retention converges). The standard
    lakehouse caveat stands: a concurrent reader that already
    resolved an old version can race its file reads — vacuum only
    past your longest reader."""
    from cae_polars_tools_spark.manifest import (
        is_tombstoned,
        refs_of,
        vacuum_refcount,
    )
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    store = ByteStore.for_path(root.rstrip("/"))
    meta = read_pointer(store)
    if meta is None:
        raise FileNotFoundError(f"no {_CURRENT} pointer under {root}")
    current = meta["version"]
    cutoff = current - max(1, keep_last)
    retained, candidates = [], []
    for name in store.list_prefix(""):
        m = re.fullmatch(r"v(\d+)/?", name)
        if not m:
            continue
        v = int(m.group(1))
        vd = f"v{v}"
        if v <= cutoff or is_tombstoned(store, vd):
            candidates.append(vd)
        else:
            retained.append(vd)
    referenced: set[str] = set()
    for vd in retained:
        referenced.update(refs_of(store, vd))
    out = vacuum_refcount(
        store, referenced, sorted(candidates, key=lambda d: int(d[1:]))
    )
    # commit records of fully vacuumed versions are history that no
    # longer resolves — drop them so the _txn listing read_pointer
    # scans stays bounded by retention, not table age
    for vd in out["removed"] + out["demoted"]:
        store.delete_prefix(f"{_TXN}/{vd}.json")
    return out


# ---------------------------------------------------------------------------
# Corpus entry: the facade's whole verb chain through the hash gate —
# create → CoW merge (a correction batch) → CoW delete (a takedown) →
# read current. The oracle recomputes the final state from the raw
# table, so a lost update, a resurrected deleted row, or a pointer
# pointing at the wrong generation all fail the value check.
# ---------------------------------------------------------------------------


def _register_table_entry() -> None:
    import os
    import shutil

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.plans.registry import register

    @register(
        "storage_table_lifecycle",
        oracle="""
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 10 = 0
                        THEN o_totalprice + 1
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_custkey % 97 <> 0
        """,
        tags=("storage", "lakehouse", "extension"),
        window_rank=1,
    )
    def storage_table_lifecycle(spark, sf_dir: str):
        """The Table facade end to end, value-checked: seed a
        versioned table from orders (v0), MERGE a correction batch
        (every 10th order's price revised, v1 — only files holding a
        matched key rewrite), DELETE a customer takedown (v2), then
        read CURRENT through the pointer. The oracle recomputes the
        final state from the raw table in SQL, so any drift anywhere
        in the chain — a lost update, a resurrected deleted row, a
        half-flipped pointer — fails the hash gate. Scratch follows
        the agg_incremental_refresh convention (deterministic .tmp
        path, rebuilt per run)."""
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        scratch = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".tmp",
            "table_lifecycle_demo",
        )
        shutil.rmtree(scratch, ignore_errors=True)
        t = Table.create(spark, scratch, orders)
        correction = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1
        )
        t.merge(correction, keys=["o_orderkey"])
        t.delete("o_custkey % 97 = 0")
        return t.current().select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )



def _register_evolution_entry() -> None:
    import os
    import shutil

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.plans.registry import register

    @register(
        "storage_schema_evolution",
        oracle="""
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 10 = 0
                        THEN o_totalprice + 1
                        ELSE o_totalprice END AS o_totalprice,
                   CASE WHEN o_orderkey % 10 <> 0
                         AND o_orderkey % 7 = 0
                        THEN 'rush' END AS priority_class
            FROM orders
        """,
        tags=("storage", "lakehouse", "schema-evolution", "extension"),
        window_rank=1,
    )
    def storage_schema_evolution(spark, sf_dir: str):
        """Widen-only schema evolution through the hash gate: seed a
        versioned table from orders (v0, three columns), ADD a
        nullable ``priority_class`` column without rewriting a data
        file (v1 — sidecar + byte-copy), MERGE a WIDE batch (every
        7th order flagged 'rush', v2), then MERGE a NARROW pre-
        evolution batch (every 10th order's price revised — its
        missing evolved column null-fills, v3), and read CURRENT.
        The oracle recomputes the final state in SQL, including the
        replacement rule (a narrow merge NULLs the evolved column on
        the rows it replaces), so a wrong null-fill, a dropped
        sidecar, or a mixed-schema read that silently narrows all
        fail the value check."""
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        scratch = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".tmp",
            "table_evolution_demo",
        )
        shutil.rmtree(scratch, ignore_errors=True)
        t = Table.create(spark, scratch, orders)
        t.add_columns({"priority_class": "string"})
        wide = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "priority_class", F.lit("rush")
        )
        t.merge(wide, keys=["o_orderkey"])
        narrow = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1
        )
        t.merge(narrow, keys=["o_orderkey"])
        return t.current().select(
            "o_orderkey", "o_custkey", "o_totalprice", "priority_class"
        )


def _register_restore_entry() -> None:
    import os
    import shutil

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.plans.registry import register

    @register(
        "storage_restore_lifecycle",
        oracle="""
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 5 = 0
                        THEN o_totalprice * 1.1
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
        """,
        tags=("storage", "lakehouse", "restore", "extension"),
        window_rank=1,
    )
    def storage_restore_lifecycle(spark, sf_dir: str):
        """RESTORE as a metadata-only commit, value-checked: seed a
        versioned table from orders (v0), DELETE a bad takedown that
        removed too much (v1: every 3rd order gone), RESTORE v0 (v2 —
        a pure manifest commit: zero data bytes move, the new version
        references v0's files), then MERGE the correction that should
        have happened instead (every 5th order's price +10%, v3), and
        read CURRENT. The oracle recomputes the final state from the
        raw table — a restore that aliased the wrong version, resur-
        rected the deleted rows into the merge, or dropped rows
        through the shared-file manifest fails the hash gate."""
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        scratch = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".tmp",
            "table_restore_demo",
        )
        shutil.rmtree(scratch, ignore_errors=True)
        t = Table.create(spark, scratch, orders)
        t.delete("o_orderkey % 3 = 0")  # the bad takedown
        t.restore(0)  # metadata-only rollback
        correction = orders.filter(
            F.col("o_orderkey") % 5 == 0
        ).withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        t.merge(correction, keys=["o_orderkey"])
        return t.current().select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )


def _register_objectstore_entry() -> None:
    import os
    import shutil

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.plans.registry import register

    @register(
        "storage_objectstore_lifecycle",
        oracle="""
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 8 = 0
                        THEN o_totalprice * 0.5
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderkey % 11 <> 0
        """,
        tags=("storage", "lakehouse", "objectstore", "extension"),
        window_rank=1,
    )
    def storage_objectstore_lifecycle(spark, sf_dir: str):
        """The Table verb chain against a NON-LOCAL ByteStore root,
        value-checked: a ``mock://`` scheme (RoutedLocalByteStore —
        URI-rooted metadata, Spark I/O through the spark_path
        translation, the s3://-client vs s3a://-connector split)
        carries create (v0) → CoW MERGE (every 8th order half-priced,
        v1) → CoW DELETE (an 11-divisible takedown, v2) → COMPACT
        (layout rewrite, v3) → read CURRENT through the pointer. The
        oracle recomputes the final state from the raw table, so a
        path-translation slip anywhere — a ref misclassified because
        scheme'd URIs compared unequal, a manifest pointing at files
        Spark wrote elsewhere, a stale pointer — fails the hash gate.
        Scratch follows the table-lifecycle convention (deterministic
        .tmp path, rebuilt per run); the scheme registration is
        scoped to the build (the returned plan resolves its file
        paths at build time)."""
        from cae_polars_tools_spark.sources.zarr_format import (
            ByteStore,
            RoutedLocalByteStore,
        )

        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        scratch = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".tmp",
            "objectstore_lifecycle_demo",
        )
        shutil.rmtree(scratch, ignore_errors=True)
        ByteStore.register_scheme(
            "mock",
            lambda p, so=None: RoutedLocalByteStore(p, scratch, so),
        )
        try:
            t = Table.create(spark, "mock://orders_table", orders)
            correction = orders.filter(
                F.col("o_orderkey") % 8 == 0
            ).withColumn("o_totalprice", F.col("o_totalprice") * 0.5)
            t.merge(correction, keys=["o_orderkey"])
            t.delete("o_orderkey % 11 = 0")
            t.compact(target_file_bytes=32 * 1024 * 1024)
            return t.current().select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
        finally:
            ByteStore.unregister_scheme("mock")


def _register_ts_clustered_entry() -> None:
    import os
    import shutil

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.plans.registry import register

    @register(
        "storage_ts_clustered_merge",
        oracle="""
            SELECT event_id, ts, event_type,
                   value * CASE WHEN ts >= TIMESTAMP '2024-01-10'
                                 AND ts <  TIMESTAMP '2024-01-12'
                                THEN 2 ELSE 1 END AS value
            FROM events
            WHERE event_type <> 'error'
        """,
        tags=("storage", "lakehouse", "data-skipping", "extension"),
        window_rank=1,
    )
    def storage_ts_clustered_merge(spark, sf_dir: str):
        """Round-15 data skipping on TIME, the common CDC/event
        layout, through the hash gate: seed a Table from events
        range-clustered on ``ts`` (written as TIMESTAMP_MICROS so the
        parquet footers carry int64 statistics — Spark's INT96
        default records none), MERGE a two-day correction window
        (values doubled, v1) keyed on (event_id, ts), then DELETE an
        event-type takedown (v2) and read CURRENT. The merge's
        affected-file discovery must PRUNE by the manifest's
        epoch-micros ts stats — the entry refuses to return if the
        candidate set wasn't a strict subset of the table's files, so
        a silent fallback to full discovery fails the round, not just
        a perf number. The oracle recomputes the final state from the
        raw table; a pruning bug that drops an update (the soundness
        direction) fails the value hash."""
        ev = read_table(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type", "value"
        )
        scratch = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".tmp",
            "table_ts_clustered_demo",
        )
        shutil.rmtree(scratch, ignore_errors=True)
        old_tt = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        try:
            seed = ev.repartitionByRange(8, "ts").sortWithinPartitions(
                "ts"
            )
            t = Table.create(spark, scratch, seed)
            n_files = len(t._version_refs("v0"))
            batch = ev.filter(
                (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
                & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
            ).withColumn("value", F.col("value") * 2)
            stats = t.merge(batch, keys=["event_id", "ts"])
            cand = stats.get("files_candidates")
            if cand is None or not (0 < cand < n_files):
                raise RuntimeError(
                    "ts-clustered merge did not prune its discovery: "
                    f"candidates={cand} of {n_files} files — the "
                    "manifest's timestamp stats regressed"
                )
            t.delete("event_type = 'error'")
            return t.current().select(
                "event_id", "ts", "event_type", "value"
            )
        finally:
            spark.conf.set(
                "spark.sql.parquet.outputTimestampType", old_tt
            )


_register_table_entry()
_register_evolution_entry()
_register_restore_entry()
_register_objectstore_entry()
_register_ts_clustered_entry()

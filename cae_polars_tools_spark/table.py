"""``Table`` — one facade over the repo's copy-on-write pointer-flip
protocol, so every lakehouse verb (read current / time travel / merge
/ delete / compact / zorder / diff / vacuum) goes through a single
discipline instead of each call site re-implementing it.

ADAPTERS ONLY — no format change. A ``Table`` is exactly the layout
``streaming.events.cow_upsert_sink`` writes and
``examples/lakehouse_usage.py`` demonstrated by hand:

* immutable version directories ``v0/ v1/ …`` (plain parquet — any
  engine reads a version directly);
* a ``_CURRENT.json`` pointer ``{version, version_dir, batch_id}``
  that flips LAST through the ByteStore seam (local ``os.replace`` /
  object-store single-object PUT — readers see the old table or the
  new one, never a torn state).

Every mutating verb here follows the same two steps: write the new
version directory fully, then flip the pointer. A crash between the
two leaves an orphan directory the pointer never referenced — the
next writer clears it (the ``cow_upsert_sink`` rule).

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
#: per-version schema sidecar written by :meth:`Table.add_columns` —
#: an underscore-prefixed file inside the version directory (Spark's
#: parquet reader ignores it), recording the DECLARED schema as Spark
#: schema-JSON. Versions without one read with their physical schema.
_SCHEMA_SIDECAR = "_SCHEMA.json"
#: per-version commit record written by every mutating verb BEFORE the
#: pointer flip: {op, ts, stats} — the DESCRIBE HISTORY audit trail.
#: Underscore-prefixed like the schema sidecar, invisible to readers.
_COMMIT_SIDECAR = "_COMMIT.json"


def _bytestore_copy_tree(store, src: str, dst: str) -> None:
    """Object-by-object recursive copy inside one ByteStore — the
    remote-store path of :meth:`Table.add_columns`'s version-dir copy.
    Each object passes through driver memory (``get`` then ``put``),
    which is the honest portable primitive when no server-side copy
    API is abstracted; local roots take ``shutil`` instead."""
    for name in store.list_prefix(src):
        child = f"{src}/{name.rstrip('/')}"
        data = store.get(child)
        if data is None:  # sub-directory
            _bytestore_copy_tree(store, child, f"{dst}/{name.rstrip('/')}")
        else:
            store.put(f"{dst}/{name.rstrip('/')}", data)


class Table:
    """A versioned copy-on-write parquet table rooted at ``root``.

    >>> t = Table.create(spark, path, seed_df)
    >>> t.merge(batch, keys=["doc_id"])      # CoW upsert → v1
    >>> t.delete("source = 'bad'")           # CoW takedown → v2
    >>> t.current()                          # DataFrame @ v2
    >>> t.read_version(0)                    # time travel
    >>> t.diff(0, keys=["doc_id"])           # change feed since v0
    >>> t.vacuum(keep_last=2)                # retention

    **Single-writer contract.** Exactly one mutating verb may run
    against a table root at a time (readers are unlimited — they only
    ever follow the pointer). This is the same contract Delta/Iceberg
    place on a table without a coordinating catalog, and every CoW
    artifact in this repo shares it (the MinHash band index, the
    IVF-PQ index, zarr generations). Two concurrent writers race in
    two ways: both compute the same next version number (last pointer
    flip silently wins, the other's version dir becomes an orphan),
    and the orphan-clear rule in :meth:`_next_version_dir` — which
    exists to self-heal a CRASHED writer's leftovers — would let one
    writer delete the other's in-progress directory before its flip,
    leaving a flipped pointer referencing a dead directory. Serialize
    writers externally (the streaming sink's single foreachBatch
    thread, a nightly job scheduler, a queue); this facade
    deliberately does not carry a lock protocol, because a lock file
    without heartbeat/lease semantics only converts the race into a
    stale-lock wedge.
    """

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root.rstrip("/")

    # -- plumbing ---------------------------------------------------

    def _store(self):
        from cae_polars_tools_spark.sources.zarr_format import ByteStore

        return ByteStore.for_path(self.root)

    def meta(self) -> dict:
        """The current pointer ``{version, version_dir, batch_id}``."""
        raw = self._store().get(_CURRENT)
        if raw is None:
            raise FileNotFoundError(
                f"no {_CURRENT} pointer under {self.root} — not a "
                "Table (seed one with Table.create)"
            )
        return json.loads(raw)

    def exists(self) -> bool:
        return self._store().get(_CURRENT) is not None

    def version(self) -> int:
        return self.meta()["version"]

    def _flip(self, meta: dict) -> None:
        self._store().put(_CURRENT, json.dumps(meta).encode())

    def _next_version_dir(self, meta: dict) -> tuple[int, str]:
        v = meta["version"] + 1
        vd = f"v{v}"
        store = self._store()
        if store.list_prefix(vd):
            # orphan from a crash between version-write and pointer
            # flip — never referenced, safe to clear
            store.delete_prefix(vd)
        return v, vd

    def _commit(
        self,
        v: int,
        vd: str,
        batch_id: int,
        op: str | None = None,
        stats: dict | None = None,
    ) -> None:
        if op is not None:
            self._put_commit(vd, op, stats)
        self._flip({"version": v, "version_dir": vd, "batch_id": batch_id})

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
        out = []
        for v in self.history():
            raw = self._store().get(f"v{v}/{_COMMIT_SIDECAR}")
            rec = (
                json.loads(raw)
                if raw is not None
                else {"op": "unknown", "ts": None, "stats": {}}
            )
            out.append({"version": v, **rec})
        return out

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
        """Read a version directory under its declared schema: files
        lacking an evolved column null-fill it at read
        (``unionByName(allowMissingColumns=True)`` semantics) — old
        files are never rewritten just to add a column."""
        schema = self._declared_schema(version_dir)
        reader = (
            self.spark.read
            if schema is None
            else self.spark.read.schema(schema)
        )
        return reader.parquet(f"{self.root}/{version_dir}")

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
        vd = f"v{version}"
        if not self._store().list_prefix(vd):
            raise FileNotFoundError(
                f"version {version} not found under {self.root} "
                "(never written, or removed by vacuum)"
            )
        return self._read_dir(vd)

    def history(self) -> list[int]:
        """Version numbers still present on storage (oldest first)."""
        store = self._store()
        out = set()
        for name in store.list_prefix(""):
            m = re.fullmatch(r"v(\d+)/?", name)
            if m:
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
        cls, spark: SparkSession, root: str, df: DataFrame
    ) -> "Table":
        """Seed ``v0`` and flip the initial pointer."""
        t = cls(spark, root)
        if t.exists():
            raise FileExistsError(f"Table already exists at {root}")
        # a v0 directory WITHOUT a pointer is a crash orphan from an
        # earlier create (pointer flips last) — clear it, the same
        # next-writer rule every other verb applies
        store = t._store()
        if store.list_prefix("v0"):
            store.delete_prefix("v0")
        df.write.mode("errorifexists").parquet(f"{t.root}/v0")
        t._put_commit("v0", "create", None)
        t._flip({"version": 0, "version_dir": "v0", "batch_id": -1})
        return t

    def merge(self, batch: DataFrame, keys: list[str]) -> dict:
        """CoW upsert: only current-version files containing a matched
        key rewrite, the rest copy byte-for-byte
        (``storage.merge_parquet``); then the pointer flips."""
        from cae_polars_tools_spark.storage import merge_parquet

        meta = self.meta()
        schema = self._declared_schema(meta["version_dir"])
        if schema is not None:
            batch = self._normalize_batch(batch, schema)
        v, vd = self._next_version_dir(meta)
        stats = merge_parquet(
            self.spark,
            f"{self.root}/{meta['version_dir']}",
            batch,
            keys,
            f"{self.root}/{vd}",
            read_schema=schema,
        )
        self._propagate_schema(meta["version_dir"], vd)
        self._commit(v, vd, meta["batch_id"], op="merge", stats=stats)
        stats["version"] = v
        return stats

    def delete(self, predicate) -> dict:
        """CoW DELETE WHERE (``storage.delete_parquet``): matched files
        rewrite, others copy; pointer flips last. The takedown verb."""
        from cae_polars_tools_spark.storage import delete_parquet

        meta = self.meta()
        v, vd = self._next_version_dir(meta)
        stats = delete_parquet(
            self.spark,
            f"{self.root}/{meta['version_dir']}",
            predicate,
            f"{self.root}/{vd}",
            read_schema=self._declared_schema(meta["version_dir"]),
        )
        self._propagate_schema(meta["version_dir"], vd)
        self._commit(v, vd, meta["batch_id"], op="delete", stats=stats)
        stats["version"] = v
        return stats

    def compact(self, **kwargs) -> dict:
        """Rewrite the current version toward target-sized files
        (``storage.compact_parquet``) as a NEW version — the serving-
        layout verb, now inside the same pointer discipline instead of
        compacting into a side directory."""
        from cae_polars_tools_spark.storage import compact_parquet

        meta = self.meta()
        v, vd = self._next_version_dir(meta)
        n_files = compact_parquet(
            self.spark,
            f"{self.root}/{meta['version_dir']}",
            f"{self.root}/{vd}",
            read_schema=self._declared_schema(meta["version_dir"]),
            **kwargs,
        )
        self._propagate_schema(meta["version_dir"], vd)
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
        v, vd = self._next_version_dir(meta)
        n_files = zorder_parquet(
            self.spark,
            f"{self.root}/{meta['version_dir']}",
            f"{self.root}/{vd}",
            cols,
            read_schema=self._declared_schema(meta["version_dir"]),
            **kwargs,
        )
        self._propagate_schema(meta["version_dir"], vd)
        self._commit(
            v, vd, meta["batch_id"], op="zorder",
            stats={"files": n_files, "cols": cols},
        )
        return {"files": n_files, "version": v}

    def add_columns(self, cols: dict) -> dict:
        """Widen-only schema evolution: add new NULLABLE columns
        (``{name: spark_ddl_type}``) as a CoW version WITHOUT
        rewriting a single data file — the current version's files
        copy byte-for-byte into the new version directory and a
        ``_SCHEMA.json`` sidecar declares the widened schema; every
        read of the version null-fills the new columns lazily
        (``unionByName(allowMissingColumns=True)`` semantics via an
        explicit-schema parquet read). Later merges accept batches on
        EITHER schema (old batches null-fill, see
        :meth:`_normalize_batch`); ``merge_parquet``'s strict
        validation — unknown columns, dtype drift, duplicate keys —
        stays in force for everything else. Renames, drops, and type
        changes are refused by construction: they would change the
        meaning of bytes already written, which a pointer flip must
        never do."""
        import os
        import shutil

        from pyspark.sql.types import StructField, StructType

        if not cols:
            raise ValueError("add_columns needs at least one column")
        meta = self.meta()
        cur = self._declared_schema(meta["version_dir"])
        if cur is None:
            cur = self._read_dir(meta["version_dir"]).schema
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
        # byte-for-byte: the evolution itself costs one directory copy,
        # never a data rewrite. Local roots — plain paths AND file://
        # URIs — take the streaming filesystem path (the ByteStore
        # walk reads each object fully into driver memory, fine for
        # metadata, wrong for multi-GB parquet); any other root copies
        # object-by-object through the ByteStore seam, so evolution
        # works wherever the Table does.
        local_root = (
            self.root[len("file://"):]
            if self.root.startswith("file://")
            else self.root
        )
        src_dir = os.path.join(local_root, meta["version_dir"])
        if os.path.isdir(src_dir):
            shutil.copytree(src_dir, os.path.join(local_root, vd))
        else:
            _bytestore_copy_tree(
                self._store(), meta["version_dir"], vd
            )
        self._put_sidecar(vd, widened)  # overwrites any copied sidecar
        self._commit(
            v, vd, meta["batch_id"], op="add_columns",
            stats={
                "added": {
                    f.name: f.dataType.simpleString()
                    for f in new_fields
                }
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
        vacuumed. The restored content is rewritten rather than
        aliased so every version directory stays independently
        vacuumable."""
        meta = self.meta()
        src = self.read_version(version)
        v, vd = self._next_version_dir(meta)
        src.write.mode("errorifexists").parquet(f"{self.root}/{vd}")
        self._propagate_schema(f"v{version}", vd)
        self._commit(
            v, vd, meta["batch_id"], op="restore",
            stats={"restored_from": version},
        )
        return {"version": v, "restored_from": version}

    # -- retention / streaming -------------------------------------

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop version directories older than the newest
        ``keep_last`` (``streaming.events.vacuum_versions``)."""
        from cae_polars_tools_spark.streaming.events import (
            vacuum_versions,
        )

        return vacuum_versions(self.root, keep_last=keep_last)

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


_register_table_entry()
_register_evolution_entry()

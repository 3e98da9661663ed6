"""Table facade: the single copy-on-write pointer discipline behind
create/merge/delete/compact/zorder/diff/vacuum, adapter-compatible
with cow_upsert_sink's on-disk format."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.table import Table


def _seed(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}", i * 10) for i in range(30)],
        "doc_id long, source string, n long",
    )
    return Table.create(spark, str(tmp_path / "t"), df)


def test_create_merge_delete_versions_and_time_travel(spark, tmp_path):
    t = _seed(spark, tmp_path)
    assert t.version() == 0 and t.current().count() == 30

    batch = spark.createDataFrame(
        [(0, "src0", 999), (100, "srcX", 1)],
        "doc_id long, source string, n long",
    )
    stats = t.merge(batch, keys=["doc_id"])
    assert stats["version"] == 1
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1
    cur = t.current()
    assert cur.count() == 31
    assert cur.filter("doc_id = 0").first()["n"] == 999

    stats = t.delete("source = 'src1'")
    assert stats["version"] == 2 and stats["rows_deleted"] == 10
    assert t.current().filter("source = 'src1'").count() == 0

    # time travel: every retained version is a consistent snapshot
    assert t.read_version(0).count() == 30
    assert t.read_version(0).filter("doc_id = 0").first()["n"] == 0
    assert t.read_version(1).count() == 31
    assert t.history() == [0, 1, 2]


def test_diff_is_change_feed(spark, tmp_path):
    t = _seed(spark, tmp_path)
    t.merge(
        spark.createDataFrame(
            [(0, "src0", 999)], "doc_id long, source string, n long"
        ),
        keys=["doc_id"],
    )
    t.delete("doc_id = 5")
    ops = {
        (r["op"], r["doc_id"])
        for r in t.diff(0, keys=["doc_id"]).collect()
    }
    assert ops == {("update", 0), ("delete", 5)}
    # bounded window: v0 → v1 sees only the update
    ops01 = {
        (r["op"], r["doc_id"])
        for r in t.diff(0, keys=["doc_id"], until=1).collect()
    }
    assert ops01 == {("update", 0)}


def test_compact_zorder_preserve_rows(spark, tmp_path):
    t = _seed(spark, tmp_path)
    before = {tuple(r) for r in t.current().collect()}
    out = t.compact(target_file_bytes=1 << 20)
    assert out["version"] == 1 and out["files"] >= 1
    assert {tuple(r) for r in t.current().collect()} == before
    out = t.zorder(["doc_id", "n"])
    assert out["version"] == 2
    assert {tuple(r) for r in t.current().collect()} == before


def test_vacuum_and_orphan_cleanup(spark, tmp_path):
    t = _seed(spark, tmp_path)
    t.delete("doc_id = 1")
    t.delete("doc_id = 2")
    stats = t.vacuum(keep_last=2)
    # v1/v2's manifests still reference v0 files, so v0 demotes to a
    # husk (shared files parked) rather than vanishing — either way
    # it stops being a readable version
    assert stats["removed"] + stats["demoted"] == ["v0"]
    assert t.history() == [1, 2]
    with pytest.raises(FileNotFoundError):
        t.read_version(0)
    # orphan next-version dir (crash between write and flip) is
    # cleared by the next writer, not stumbled over
    os.makedirs(f"{t.root}/v3/junk")
    t.delete("doc_id = 3")
    assert t.version() == 3
    assert t.current().filter("doc_id = 3").count() == 0


def test_create_refuses_overwrite_and_missing_pointer(spark, tmp_path):
    t = _seed(spark, tmp_path)
    with pytest.raises(FileExistsError):
        Table.create(spark, t.root, t.current())
    t2 = Table(spark, str(tmp_path / "nope"))
    assert not t2.exists()
    with pytest.raises(FileNotFoundError, match="not a Table"):
        t2.meta()


def test_adapter_compatible_with_streaming_sink(spark, tmp_path):
    """A table written by cow_upsert_sink opens as a Table, and a
    Table seeded here is written to by the sink — one protocol."""
    t = _seed(spark, tmp_path)
    sink = t.upsert_sink(keys=["doc_id"], order_col="n")
    batch = spark.createDataFrame(
        [(7, "src7", 70000)], "doc_id long, source string, n long"
    )
    sink(batch, batch_id=0)
    assert t.version() == 1
    assert t.current().filter("doc_id = 7").first()["n"] == 70000
    # replayed micro-batch is a no-op (effectively-once)
    sink(batch, batch_id=0)
    assert t.version() == 1
    # facade verbs continue the same chain the sink advanced
    t.delete("doc_id = 7")
    assert t.version() == 2 and t.meta()["batch_id"] == 0


def test_restore_is_a_new_version(spark, tmp_path):
    """RESTORE semantics: rolling back re-publishes old content as a
    NEW version — the pointer never moves backward, the bad versions
    stay retained for forensics, and vacuum's 'strictly older than
    current' invariant survives."""
    t = _seed(spark, tmp_path)
    before = {tuple(r) for r in t.current().collect()}
    t.delete("doc_id < 15")  # v1: the "bad" takedown
    assert t.current().count() == 15
    out = t.restore(0)
    assert out == {"version": 2, "restored_from": 0}
    assert {tuple(r) for r in t.current().collect()} == before
    assert t.history() == [0, 1, 2]  # bad v1 retained for forensics
    stats = t.vacuum(keep_last=2)
    assert stats["removed"] + stats["demoted"] == ["v0"]
    # v2 restored FROM v0 by reference — its shared files must
    # survive v0's vacuum (refcount), so the restored content reads
    assert {tuple(r) for r in t.current().collect()} == before


def test_create_clears_crash_orphaned_v0(spark, tmp_path):
    """A v0 directory without a pointer (crash between write and
    flip) must be cleared by the next create, not wedge the table."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    df.write.parquet(f"{root}/v0")  # orphan: no _CURRENT.json
    t = Table.create(spark, root, df)
    assert t.version() == 0 and t.current().count() == 1


def test_table_random_op_sequences_match_model(spark, tmp_path):
    """Model-based check: a seeded random sequence of merge / delete /
    restore verbs must keep the live table equal to a plain dict
    model, every retained version must replay as its recorded
    snapshot, and diff(i) must equal the model-level delta — the
    invariants that make the pointer protocol a database."""
    import random

    rng = random.Random(20250815)
    t = Table.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(
            [(i, i * 10) for i in range(20)], "k long, n long"
        ),
    )
    model = {i: i * 10 for i in range(20)}
    snapshots = {0: dict(model)}
    next_key = 100
    for _ in range(8):
        op = rng.choice(["merge", "delete", "restore"])
        if op == "merge":
            upd = rng.sample(sorted(model) or [0], k=min(3, len(model)))
            rows = [(k, rng.randrange(10_000)) for k in upd]
            rows.append((next_key, rng.randrange(10_000)))
            for k, v in rows:
                model[k] = v
            next_key += 1
            t.merge(
                spark.createDataFrame(rows, "k long, n long"),
                keys=["k"],
            )
        elif op == "delete":
            cut = rng.randrange(0, 10_000)
            model = {k: v for k, v in model.items() if v < cut}
            t.delete(f"n >= {cut}")
        else:
            v = rng.choice(sorted(snapshots))
            model = dict(snapshots[v])
            t.restore(v)
        snapshots[t.version()] = dict(model)
        live = {r["k"]: r["n"] for r in t.current().collect()}
        assert live == model, (op, t.version())
    # every retained version replays as its recorded snapshot
    for v, snap in snapshots.items():
        got = {r["k"]: r["n"] for r in t.read_version(v).collect()}
        assert got == snap, v
    # diff(0) equals the model delta vs the seed
    seed = snapshots[0]
    feed = {
        (r["op"], r["k"]): r["n"]
        for r in t.diff(0, keys=["k"]).collect()
    }
    want = {}
    for k, v in model.items():
        if k not in seed:
            want[("insert", k)] = v
        elif seed[k] != v:
            want[("update", k)] = v
    for k, v in seed.items():
        if k not in model:
            # deletes carry the OLD image (there is no new one)
            want[("delete", k)] = v
    assert feed == want


def test_add_columns_lifecycle(spark, tmp_path):
    """Widen-only schema evolution end to end: add nullable columns
    WITHOUT rewriting data files, merge batches on BOTH schemas, read
    current/time-travel/diff correctly, and keep the strict refusals
    (unknown column, duplicate add)."""
    t = _seed(spark, tmp_path)

    out = t.add_columns({"score": "double", "lang": "string"})
    assert out["version"] == 1
    assert out["added"] == {"score": "double", "lang": "string"}
    # metadata-only commit: the new version holds ONLY sidecars (its
    # manifest references v0's files), zero data bytes moved
    v1 = str(tmp_path / "t" / "v1")
    assert sorted(os.listdir(v1)) == [
        "_COMMIT.json", "_MANIFEST.json", "_SCHEMA.json"
    ]
    cur = t.current()
    assert cur.columns == ["doc_id", "source", "n", "score", "lang"]
    assert cur.count() == 30
    assert cur.filter(F.col("score").isNotNull()).count() == 0
    # time travel keeps the NARROW schema the version was written with
    assert t.read_version(0).columns == ["doc_id", "source", "n"]

    # merge a NEW-schema batch: evolved values land
    wide = spark.createDataFrame(
        [(0, "src0", 111, 0.9, "en"), (100, "srcX", 1, 0.5, "de")],
        "doc_id long, source string, n long, score double, lang string",
    )
    stats = t.merge(wide, keys=["doc_id"])
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1
    cur = t.current()
    assert cur.filter("doc_id = 0").first()["score"] == 0.9
    assert cur.filter("doc_id = 3").first()["score"] is None

    # merge an OLD-schema batch (produced before the widening):
    # missing evolved columns null-fill, nothing refuses
    narrow = spark.createDataFrame(
        [(1, "src1", 222), (101, "srcY", 2)],
        "doc_id long, source string, n long",
    )
    stats = t.merge(narrow, keys=["doc_id"])
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1
    cur = t.current()
    assert cur.count() == 32
    r = cur.filter("doc_id = 1").first()
    assert r["n"] == 222 and r["score"] is None and r["lang"] is None
    # doc 0's evolved value SURVIVED the later old-schema merge
    assert cur.filter("doc_id = 0").first()["lang"] == "en"

    # diff across the evolution boundary: old side null-fills, only
    # genuinely-changed keys report
    ops = {
        (r["doc_id"], r["op"])
        for r in t.diff(0, keys=["doc_id"]).collect()
    }
    assert ops == {
        (0, "update"), (1, "update"), (100, "insert"), (101, "insert")
    }

    # refusals: unknown batch column; re-adding an existing column
    with pytest.raises(ValueError, match="not in the table schema"):
        t.merge(
            spark.createDataFrame(
                [(5, "s", 1, True)],
                "doc_id long, source string, n long, extra boolean",
            ),
            keys=["doc_id"],
        )
    with pytest.raises(ValueError, match="already present"):
        t.add_columns({"score": "double"})


def test_evolved_table_delete_compact_restore(spark, tmp_path):
    """The other verbs stay correct on a widened table: CoW delete
    reads mixed-schema files under the declared schema, compact
    rewrites them physically wide, restore across the evolution
    boundary resurrects the narrow schema."""
    t = _seed(spark, tmp_path)
    t.add_columns({"score": "double"})                       # v1
    wide = spark.createDataFrame(
        [(0, "src0", 111, 0.9)],
        "doc_id long, source string, n long, score double",
    )
    t.merge(wide, keys=["doc_id"])                           # v2
    stats = t.delete("doc_id = 3")                           # v3
    assert stats["rows_deleted"] == 1
    cur = t.current()
    assert cur.count() == 29
    assert cur.filter("doc_id = 0").first()["score"] == 0.9

    out = t.compact()                                        # v4
    assert out["files"] >= 1
    cur = t.current()
    assert cur.columns == ["doc_id", "source", "n", "score"]
    assert cur.count() == 29
    # post-compact the files are PHYSICALLY wide: a raw read (no
    # sidecar knowledge) now sees the evolved column too
    raw = spark.read.parquet(str(tmp_path / "t" / "v4"))
    assert "score" in raw.columns

    # restore to the pre-evolution version: narrow schema returns,
    # as a NEW version (history stays linear)
    out = t.restore(0)                                       # v5
    assert out["version"] == 5
    assert t.current().columns == ["doc_id", "source", "n"]
    assert t.current().count() == 30


def test_upsert_sink_is_evolution_aware(spark, tmp_path):
    """Streaming upserts into a WIDENED table: a pre-evolution
    micro-batch null-fills the evolved column (instead of silently
    narrowing the table or crashing on schema drift), a wide batch
    lands its values, the sidecar propagates to sink-written versions,
    and replay detection still works."""
    t = _seed(spark, tmp_path)
    t.add_columns({"score": "double"})                        # v1
    sink = t.upsert_sink(keys=["doc_id"], order_col="n")

    narrow = spark.createDataFrame(
        [(0, "src0", 111), (100, "srcX", 1)],
        "doc_id long, source string, n long",
    )
    sink(narrow, 7)                                           # v2
    cur = t.current()
    assert cur.columns == ["doc_id", "source", "n", "score"]
    assert cur.count() == 31
    r = cur.filter("doc_id = 0").first()
    assert r["n"] == 111 and r["score"] is None

    wide = spark.createDataFrame(
        [(100, "srcX", 2, 0.75)],
        "doc_id long, source string, n long, score double",
    )
    sink(wide, 8)                                             # v3
    assert t.current().filter("doc_id = 100").first()["score"] == 0.75
    # replayed batch id: skipped, version unchanged
    sink(narrow, 8)
    assert t.version() == 3
    # the MERGE verb still works on top of sink-written versions
    # (sidecar propagated), and an unknown column still refuses
    t.merge(
        spark.createDataFrame(
            [(1, "src1", 222)], "doc_id long, source string, n long"
        ),
        keys=["doc_id"],
    )
    assert t.current().filter("doc_id = 1").first()["n"] == 222
    with pytest.raises(ValueError, match="not in the table schema"):
        sink(
            spark.createDataFrame(
                [(2, "s", 3, True)],
                "doc_id long, source string, n long, zz boolean",
            ),
            9,
        )


def test_add_columns_on_uri_root(spark, tmp_path):
    """Schema evolution must work on a NON-plain-path root: a
    file:// URI routes the version-dir copy through the ByteStore
    object walk instead of shutil (the same seam an object-store root
    would take), and every later verb still composes."""
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "doc_id long, n long"
    )
    root = "file://" + str(tmp_path / "uri_table")
    t = Table.create(spark, root, df)
    out = t.add_columns({"score": "double"})
    assert out["version"] == 1
    cur = t.current()
    assert cur.columns == ["doc_id", "n", "score"]
    assert cur.count() == 10
    t.merge(
        spark.createDataFrame(
            [(1, 99, 0.5)], "doc_id long, n long, score double"
        ),
        keys=["doc_id"],
    )
    cur = t.current()
    # the byte-copied untouched files MUST land in the real version
    # dir (an un-normalized URI dst once sent them to a junk `file:`
    # directory under the cwd, silently dropping 9 of 10 rows here)
    assert cur.count() == 10
    assert sorted(r["doc_id"] for r in cur.collect()) == list(range(10))
    r = cur.filter("doc_id = 1").first()
    assert r["n"] == 99 and r["score"] == 0.5
    stats = t.delete("doc_id = 5")
    assert stats["rows_deleted"] == 1 and t.current().count() == 9


def test_bytestore_copy_and_size_primitives(tmp_path):
    """ByteStore.copy is the server-side-copy seam for object-store
    CoW: local stores hardlink (zero data bytes), the base-class
    fallback streams get→put, and size() is a metadata call. A
    missing source refuses loudly on both paths."""
    import os

    from cae_polars_tools_spark.sources.zarr_format import (
        ByteStore,
        LocalByteStore,
    )

    root = tmp_path / "store"
    (root / "v0" / "sub").mkdir(parents=True)
    (root / "v0" / "sub" / "b.bin").write_bytes(b"\x00\x01\x02")
    store = ByteStore.for_path(str(root))
    assert isinstance(store, LocalByteStore)
    store.copy("v0/sub/b.bin", "v1/sub/b.bin")
    assert (root / "v1" / "sub" / "b.bin").read_bytes() == b"\x00\x01\x02"
    # local fast path shares the inode — a true zero-byte copy
    assert os.stat(root / "v1" / "sub" / "b.bin").st_ino == os.stat(
        root / "v0" / "sub" / "b.bin"
    ).st_ino
    assert store.size("v0/sub/b.bin") == 3 and store.size("nope") is None
    with pytest.raises(FileNotFoundError):
        store.copy("missing", "x")
    # base-class fallback (get→put) — what a store without a native
    # server-side copy inherits
    ByteStore.copy(store, "v0/sub/b.bin", "v2/c.bin")
    assert (root / "v2" / "c.bin").read_bytes() == b"\x00\x01\x02"
    with pytest.raises(FileNotFoundError):
        ByteStore.copy(store, "missing", "x")


def test_describe_history_audit_trail(spark, tmp_path):
    """Every mutating verb leaves a commit record in its version dir;
    describe_history replays the retained chain oldest-first, vacuum
    drops records with their versions, and sink-written / foreign
    versions report 'unknown' rather than lying."""
    t = _seed(spark, tmp_path)
    t.add_columns({"score": "double"})
    t.merge(
        spark.createDataFrame(
            [(0, "src0", 1, 0.5)],
            "doc_id long, source string, n long, score double",
        ),
        keys=["doc_id"],
    )
    t.delete("doc_id = 3")
    t.compact()
    t.restore(0)

    hist = t.describe_history()
    assert [h["version"] for h in hist] == [0, 1, 2, 3, 4, 5]
    assert [h["op"] for h in hist] == [
        "create", "add_columns", "merge", "delete", "compact", "restore",
    ]
    assert hist[1]["stats"]["added"] == {"score": "double"}
    assert hist[2]["stats"]["rows_updated"] == 1
    assert hist[3]["stats"]["rows_deleted"] == 1
    assert hist[5]["stats"]["restored_from"] == 0
    assert all(
        h["ts"] is not None and h["ts"] > 0 for h in hist
    )
    # monotone timestamps across the chain
    ts = [h["ts"] for h in hist]
    assert ts == sorted(ts)

    # vacuum drops history with the bytes
    t.vacuum(keep_last=2)
    hist = t.describe_history()
    assert [h["version"] for h in hist] == [4, 5]

    # streaming-sink-written versions carry their own audit record;
    # a FOREIGN version directory (no sidecar) reports unknown
    sink = t.upsert_sink(keys=["doc_id"], order_col="n")
    sink(
        spark.createDataFrame(
            [(7, "srcX", 1)], "doc_id long, source string, n long"
        ),
        99,
    )
    hist = t.describe_history()
    assert hist[-1]["version"] == 6
    assert hist[-1]["op"] == "streaming-upsert"
    assert hist[-1]["stats"]["batch_id"] == 99
    os.remove(str(tmp_path / "t" / "v6" / "_COMMIT.json"))
    assert t.describe_history()[-1]["op"] == "unknown"


# ---------------------------------------------------------------------------
# Manifest-based versioning: metadata-only commits + refcount vacuum
# ---------------------------------------------------------------------------


def _data_files(d):
    """Physical parquet data files under a version directory."""
    out = []
    for root, _dirs, fs in os.walk(d):
        out.extend(
            os.path.join(root, f)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def test_one_key_merge_copies_zero_untouched_bytes(spark, tmp_path):
    """The manifest pin the round-12 verdict asked for: a one-key
    merge writes ONLY the affected file's rewrite plus the update
    rows; every untouched file is re-referenced, never copied — the
    new version directory holds no copy of them and the referenced
    v0 inodes are untouched."""
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1000)], "doc_id long, n long"
    )
    root = str(tmp_path / "t")
    t = Table.create(
        spark,
        root,
        df.repartitionByRange(8, "doc_id").sortWithinPartitions("doc_id"),
    )
    v0_files = _data_files(f"{root}/v0")
    assert len(v0_files) == 8
    v0_inodes = {f: os.stat(f).st_ino for f in v0_files}

    stats = t.merge(
        spark.createDataFrame([(500, 999)], "doc_id long, n long"),
        keys=["doc_id"],
    )
    # exactly one file held doc_id 500 (range-clustered layout)
    assert stats["files_rewritten"] == 1
    assert stats["files_referenced"] == 7
    v1_files = _data_files(f"{root}/v1")
    # the new version wrote only the rewrite — no copied untouched
    # files anywhere (neither byte copies nor 'copied-' hardlinks)
    assert 1 <= len(v1_files) <= 2
    assert not any("copied-" in f for f in v1_files)
    # untouched v0 files: same inodes, still referenced by v1
    for f, ino in v0_inodes.items():
        assert os.stat(f).st_ino == ino
    refs = t._version_refs("v1")
    assert sum(r.startswith("v0/") for r in refs) == 7
    assert sum(r.startswith("v1/") for r in refs) == len(v1_files)
    # and the read is correct across the shared files
    cur = t.current()
    assert cur.count() == 1000
    assert cur.filter("doc_id = 500").first()["n"] == 999
    assert cur.filter("doc_id = 499").first()["n"] == 4990


def test_vacuum_refcount_shared_file_survives(spark, tmp_path):
    """A data file shared by a vacuumed version and a retained one
    must survive the vacuum (refcount), then die when its last
    referencing version is vacuumed too."""
    df = spark.createDataFrame(
        [(i, i) for i in range(100)], "doc_id long, n long"
    )
    root = str(tmp_path / "t")
    t = Table.create(
        spark, root, df.repartitionByRange(4, "doc_id")
    )
    t.merge(
        spark.createDataFrame([(1, -1)], "doc_id long, n long"),
        keys=["doc_id"],
    )  # v1: references 3 untouched v0 files
    t.merge(
        spark.createDataFrame([(2, -2)], "doc_id long, n long"),
        keys=["doc_id"],
    )  # v2
    shared_before = [
        r for r in t._version_refs("v2") if r.startswith("v0/")
    ]
    assert shared_before  # v2 really does reference v0 files

    stats = t.vacuum(keep_last=2)  # drops v0 from history
    assert stats["demoted"] == ["v0"] and stats["removed"] == []
    # v0 no longer reads, but its shared files are still on disk
    with pytest.raises(FileNotFoundError):
        t.read_version(0)
    for r in shared_before:
        assert os.path.isfile(os.path.join(root, r))
    assert t.current().count() == 100  # reads fine through v0 husks

    # rewrite everything (compact) then vacuum past the last
    # referencing versions: the husk finally empties and disappears
    t.compact()  # v3 references only its own files
    stats = t.vacuum(keep_last=1)
    assert "v0" in stats["removed"]  # husk fully reclaimed
    assert not os.path.exists(os.path.join(root, "v0"))
    assert t.current().count() == 100


def test_restore_and_add_columns_are_metadata_only(spark, tmp_path):
    """restore() and add_columns() commit pure metadata: the new
    version directory contains sidecars only, zero data files."""
    t = _seed(spark, tmp_path)
    t.delete("doc_id < 5")  # v1
    t.restore(0)  # v2
    v2 = str(tmp_path / "t" / "v2")
    assert _data_files(v2) == []
    assert sorted(os.listdir(v2)) == ["_COMMIT.json", "_MANIFEST.json"]
    assert t.current().count() == 30
    # restored version shares v0's files byte-for-byte
    assert t._version_refs("v2") == t._version_refs("v0")

    t.add_columns({"extra": "int"})  # v3
    assert _data_files(str(tmp_path / "t" / "v3")) == []
    assert t.current().columns == ["doc_id", "source", "n", "extra"]


def test_table_over_file_uri_root(spark, tmp_path):
    """The whole verb chain through a file:// URI root — the
    ByteStore seam every non-local deployment rides (the HTTP-store
    test pattern; no writable object store exists in this sandbox,
    so the URI form of the local store is the live stand-in)."""
    df = spark.createDataFrame(
        [(i, i * 2) for i in range(50)], "doc_id long, n long"
    )
    root = "file://" + str(tmp_path / "t")
    t = Table.create(spark, root, df.repartitionByRange(4, "doc_id"))
    t.merge(
        spark.createDataFrame([(7, -7), (70, 700)], "doc_id long, n long"),
        keys=["doc_id"],
    )
    t.add_columns({"tag": "string"})
    t.delete("doc_id = 0")
    assert t.version() == 3
    cur = t.current()
    assert cur.count() == 50  # 50 + 1 insert - 1 delete
    assert cur.filter("doc_id = 7").first()["n"] == -7
    assert t.read_version(0).count() == 50
    stats = t.vacuum(keep_last=2)
    assert set(stats["removed"]) | set(stats["demoted"]) == {"v0", "v1"}
    assert t.current().count() == 50


def test_concurrent_writer_detected_and_loser_aborts(spark, tmp_path):
    """Optimistic concurrency: a verb that loses the pointer race
    raises ConcurrentWriteError WITHOUT flipping — the winner's
    commit survives intact, the loser's work is an unreferenced
    orphan, and a retry against the new current version succeeds."""
    from cae_polars_tools_spark.table import ConcurrentWriteError

    root = str(tmp_path / "t")
    t = Table.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, i) for i in range(40)], "doc_id long, n long"
        ),
    )

    # interleave a second writer between the slow verb's snapshot
    # read and its version reservation (the stale/suspended-writer
    # shape — the one that previously let the loser orphan-clear the
    # winner's COMMITTED directory before failing)
    class RacyTable(Table):
        raced = False

        def _declared_schema(self, version_dir):
            if not RacyTable.raced:
                RacyTable.raced = True
                Table(self.spark, self.root).delete("doc_id = 7")
            return super()._declared_schema(version_dir)

    racy = RacyTable(spark, root)
    with pytest.raises(ConcurrentWriteError, match="pointer moved"):
        racy.merge(
            spark.createDataFrame([(0, 999)], "doc_id long, n long"),
            keys=["doc_id"],
        )
    # the winner's delete IS the table state; the loser left no trace
    # in the committed chain
    assert t.version() == 1
    cur = t.current()
    assert cur.count() == 39
    assert cur.filter("doc_id = 0").first()["n"] == 0  # merge NOT applied
    assert [h["op"] for h in t.describe_history()][-1] == "delete"
    # retry from the new current version lands cleanly
    stats = t.merge(
        spark.createDataFrame([(0, 999)], "doc_id long, n long"),
        keys=["doc_id"],
    )
    assert stats["version"] == 2
    assert t.current().filter("doc_id = 0").first()["n"] == 999

    # racing CREATE against an existing table also refuses pre-flip
    class RacyCreate(Table):
        seeded = False

    with pytest.raises(FileExistsError):
        Table.create(spark, root, t.current())


def test_table_random_ops_with_vacuum_and_compact_match_model(
    spark, tmp_path
):
    """The model-based sequence test extended over the verbs that
    stress the MANIFEST machinery: compact (full rewrite, manifest
    reset), restore (pure aliasing commit), and reference-counted
    vacuum interleaved with merges/deletes. Invariants: the live
    table always equals the dict model; every still-retained version
    replays its recorded snapshot; vacuumed versions refuse to read;
    restore of a vacuumed version refuses; history() is exactly the
    retained set."""
    import random

    rng = random.Random(20250816)
    t = Table.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(
            [(i, i * 10) for i in range(25)], "k long, n long"
        ),
    )
    model = {i: i * 10 for i in range(25)}
    snapshots = {0: dict(model)}
    vacuumed: set[int] = set()
    next_key = 1000
    for step in range(12):
        op = rng.choice(
            ["merge", "delete", "restore", "compact", "vacuum"]
        )
        if op == "merge":
            upd = rng.sample(sorted(model) or [0], k=min(4, len(model)))
            rows = [(k, rng.randrange(10_000)) for k in upd]
            rows.append((next_key, rng.randrange(10_000)))
            for k, v in rows:
                model[k] = v
            next_key += 1
            t.merge(
                spark.createDataFrame(rows, "k long, n long"), keys=["k"]
            )
        elif op == "delete":
            cut = rng.randrange(0, 10_000)
            model = {k: v for k, v in model.items() if v < cut}
            t.delete(f"n >= {cut}")
        elif op == "restore":
            retained = sorted(set(snapshots) - vacuumed)
            v = rng.choice(retained)
            model = dict(snapshots[v])
            t.restore(v)
        elif op == "compact":
            t.compact(target_file_bytes=1 << 20)
        else:
            keep = rng.choice([2, 3])
            stats = t.vacuum(keep_last=keep)
            gone = {
                int(d[1:])
                for d in stats["removed"] + stats["demoted"]
            }
            vacuumed |= gone
        if op in ("merge", "delete", "restore", "compact"):
            snapshots[t.version()] = dict(model)
        live = {r["k"]: r["n"] for r in t.current().collect()}
        assert live == model, (step, op, t.version())
        assert sorted(set(snapshots) - vacuumed) == t.history(), op
    # retained versions replay; vacuumed ones refuse (read + restore)
    for v, snap in snapshots.items():
        if v in vacuumed:
            with pytest.raises(FileNotFoundError):
                t.read_version(v)
            with pytest.raises(FileNotFoundError):
                t.restore(v)
        else:
            got = {r["k"]: r["n"] for r in t.read_version(v).collect()}
            assert got == snap, v


def test_empty_version_merge_delete_roundtrip(spark, tmp_path):
    """Verbs against an EMPTIED version (a delete removed every row):
    delete is an idempotent no-op version, merge is a pure insert
    (schema + key-uniqueness still validated), compact/zorder refuse
    with a clear message, and reads stay correct throughout."""
    root = str(tmp_path / "t")
    t = Table.create(
        spark,
        root,
        spark.createDataFrame([(1, 10), (2, 20)], "k long, n long"),
    )
    t.delete("n >= 0")  # v1: zero rows (Spark still writes a 0-row file)
    assert t.current().count() == 0
    assert t.current().columns == ["k", "n"]

    # force the ZERO-FILES form too (a foreign writer / an engine
    # that skips empty part files): commit v2 with an empty manifest
    meta = t.meta()
    v, vd = t._next_version_dir(meta)
    t._commit_manifest(vd, [], t.current().schema.jsonValue())
    t._commit(v, vd, meta["batch_id"], op="delete", stats={})
    assert t._version_refs("v2") == []
    assert t.current().count() == 0  # empty manifest reads via schema

    stats = t.delete("k = 1")  # v3: no-op on zero-files, not an error
    assert stats["rows_deleted"] == 0 and stats["version"] == 3
    assert t.current().count() == 0

    with pytest.raises(ValueError, match="empty"):
        t.compact()
    with pytest.raises(ValueError, match="empty"):
        t.zorder(["k", "n"])

    with pytest.raises(ValueError, match="not unique"):
        t.merge(
            spark.createDataFrame(
                [(5, 1), (5, 2)], "k long, n long"
            ),
            keys=["k"],
        )
    with pytest.raises(ValueError, match="must equal"):
        t.merge(
            spark.createDataFrame([(5, 1, 2)], "k long, n long, x long"),
            keys=["k"],
        )
    stats = t.merge(
        spark.createDataFrame([(5, 50)], "k long, n long"), keys=["k"]
    )
    assert stats["rows_inserted"] == 1 and stats["rows_updated"] == 0
    assert {tuple(r) for r in t.current().collect()} == {(5, 50)}
    # and the chain continues normally from here
    t.merge(
        spark.createDataFrame([(5, 55), (6, 60)], "k long, n long"),
        keys=["k"],
    )
    assert {tuple(r) for r in t.current().collect()} == {(5, 55), (6, 60)}
    assert [h["op"] for h in t.describe_history()] == [
        "create", "delete", "delete", "delete", "merge", "merge"
    ]


def test_vacuum_crash_mid_demotion_never_fakes_a_version(spark, tmp_path):
    """Tombstone-first demotion: a vacuum that crashes after writing
    the tombstone but before stripping sidecars/files must leave the
    version UNREADABLE (not a legacy-looking directory whose
    whole-directory read would return only the shared-file subset);
    the next vacuum finishes the cleanup."""
    root = str(tmp_path / "t")
    t = Table.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, i) for i in range(100)], "k long, n long"
        ).repartitionByRange(4, "k"),
    )
    t.merge(
        spark.createDataFrame([(1, -1)], "k long, n long"), keys=["k"]
    )
    t.merge(
        spark.createDataFrame([(2, -2)], "k long, n long"), keys=["k"]
    )
    # simulate the crash window: tombstone landed, nothing else did
    import json as _json

    t._store().put(
        "v0/_TOMBSTONE.json", _json.dumps({"kept_files": 3}).encode()
    )
    assert os.path.exists(f"{root}/v0/_MANIFEST.json")  # half-demoted
    assert t.history() == [1, 2]
    with pytest.raises(FileNotFoundError):
        t.read_version(0)
    assert t.describe_history()[0]["version"] == 1
    # reads through shared v0 files still work; the next vacuum
    # re-candidates the husk and completes the strip
    assert t.current().count() == 100
    t.vacuum(keep_last=2)
    assert not os.path.exists(f"{root}/v0/_MANIFEST.json")
    assert t.current().count() == 100


def test_empty_schemaless_delete_refuses_loudly(spark, tmp_path):
    """Deleting from an EMPTY current version that records no schema
    (legacy dir: no manifest, no sidecar, no footers) must refuse
    loudly instead of committing a schema=None version that later
    reads refuse as unreadable."""
    import json as _json
    import os as _os

    root = str(tmp_path / "tbl")
    _os.makedirs(f"{root}/v0")
    with open(f"{root}/_CURRENT.json", "w") as fh:
        _json.dump(
            {"version": 0, "version_dir": "v0", "batch_id": -1}, fh
        )
    t = Table(spark, root)
    with pytest.raises(ValueError, match="records no schema"):
        t.delete("x = 1")


def test_compact_legacy_version_derives_schema(spark, tmp_path):
    """Compacting a legacy (manifest-less, sidecar-less) version must
    derive the schema from its parquet footers so the NEW version
    never commits schema=None — a later delete-everything on it stays
    readable."""
    import json as _json

    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    df = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") * 3.0).alias("val")
    )
    df.write.parquet(f"{root}/v0")  # foreign writer: files only
    store_path = f"{root}/_CURRENT.json"
    with open(store_path, "w") as fh:
        _json.dump(
            {"version": 0, "version_dir": "v0", "batch_id": -1}, fh
        )
    t = Table(spark, root)
    t.compact(target_file_bytes=1 << 20)
    from cae_polars_tools_spark.manifest import load_manifest

    m = load_manifest(t._store(), "v1")
    assert m["schema"] is not None
    # and the chain stays readable even through delete-everything
    t.delete("k >= 0")
    assert t.current().count() == 0
    t.delete("k < 0")  # idempotent no-op on the empty version
    assert t.current().columns == ["k", "val"]


def test_merge_precondition_rides_the_candidate_aggregate(
    spark, tmp_path, monkeypatch
):
    """Table.merge submits exactly TWO driver actions before its
    write: the fused candidate-range + precondition aggregate and the
    affected-file discovery. A third action (merge_parquet running its
    own uniqueness/count probe despite the caller's fused aggregate —
    the pre-fusion shape) shows up here immediately, as would a
    count() fallback (manifest row accounting must keep the verb off
    the t.count() path)."""
    t = _seed(spark, tmp_path)
    batch = spark.createDataFrame(
        [(0, "src0", 999), (100, "srcX", 1)],
        "doc_id long, source string, n long",
    )
    cls = type(batch)
    calls = {"count": 0, "collect": 0}
    orig_count, orig_collect = cls.count, cls.collect

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    def counting_collect(self):
        calls["collect"] += 1
        return orig_collect(self)

    monkeypatch.setattr(cls, "count", counting_count)
    monkeypatch.setattr(cls, "collect", counting_collect)
    stats = t.merge(batch, keys=["doc_id"])
    in_merge = dict(calls)
    # the stats the fused precondition feeds must stay exact
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1
    assert in_merge == {"count": 0, "collect": 2}, in_merge

    # the fused aggregate still enforces merge_parquet's uniqueness
    # precondition, with the same error text
    dup = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], "doc_id long, source string, n long"
    )
    with pytest.raises(ValueError, match="not unique"):
        t.merge(dup, keys=["doc_id"])

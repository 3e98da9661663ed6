"""Object-store CoW end-to-end: the full ``Table`` verb chain against
a NON-LOCAL ByteStore root.

``MockObjectStore`` registers a ``mock://`` scheme whose METADATA side
(manifests, pointers, commit records, guards, inventories, sizes) runs
entirely through the ByteStore interface — every call is counted —
while Spark's data I/O goes through the ``spark_path`` translation to
a backing local directory. That is exactly the production shape the
seam exists for (s3:// metadata client vs s3a:// Hadoop connector);
the ``mock://`` root itself is not a real filesystem path, so any code
path that still assumes os-level access on the root fails loudly here.

Also pins the round-14 commit-protocol upgrades:

* manifest-recorded per-file sizes make a manifest-mode merge perform
  ZERO per-file ``size()`` calls (the per-verb serial stat loop is
  gone);
* the ``_txn/vN.json`` conditional-put commit: exactly one of two
  racing writers wins, the loser raises ``ConcurrentWriteError`` with
  the pointer unmoved;
* pointer repair: a crash between commit-create and cache flip still
  committed — the next reader advances over the record.
"""

from __future__ import annotations

import collections
import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.sources.zarr_format import (
    ByteStore,
    LocalByteStore,
)
from cae_polars_tools_spark.table import ConcurrentWriteError, Table

CALLS: collections.Counter = collections.Counter()
_BASE: list[str] = [""]


class MockObjectStore(ByteStore):
    """Scheme'd store fronting a local directory (see module
    docstring). Every ByteStore method delegates to the backing
    LocalByteStore and bumps a per-method counter."""

    cas_atomic = True

    def __init__(self, root: str, storage_options: dict | None = None):
        super().__init__(root, storage_options)
        rel = self.root[len("mock://"):]
        self._local = LocalByteStore(os.path.join(_BASE[0], rel))

    def get(self, key):
        CALLS["get"] += 1
        return self._local.get(key)

    def get_range(self, key, offset, length):
        CALLS["get_range"] += 1
        return self._local.get_range(key, offset, length)

    def put(self, key, data):
        CALLS["put"] += 1
        self._local.put(key, data)

    def put_if_absent(self, key, data):
        CALLS["put_if_absent"] += 1
        return self._local.put_if_absent(key, data)

    def delete_prefix(self, prefix=""):
        CALLS["delete_prefix"] += 1
        self._local.delete_prefix(prefix)

    def list_prefix(self, prefix=""):
        CALLS["list_prefix"] += 1
        return self._local.list_prefix(prefix)

    def list_prefix_detail(self, prefix=""):
        CALLS["list_prefix_detail"] += 1
        return self._local.list_prefix_detail(prefix)

    def size(self, key):
        CALLS["size"] += 1
        return self._local.size(key)

    def copy(self, src, dst):
        CALLS["copy"] += 1
        self._local.copy(src, dst)

    def copy_to(self, src_key, dst_store, dst_key):
        CALLS["copy_to"] += 1
        if isinstance(dst_store, MockObjectStore):
            self._local.copy_to(src_key, dst_store._local, dst_key)
        else:
            super().copy_to(src_key, dst_store, dst_key)

    def spark_path(self, key=""):
        return self._local.spark_path(key)

    def ref_from_spark_uri(self, uri):
        return self._local.ref_from_spark_uri(uri)

    def canon(self):
        return self._local.canon()


@pytest.fixture()
def mock_root(tmp_path):
    CALLS.clear()
    _BASE[0] = str(tmp_path)
    ByteStore.register_scheme(
        "mock", lambda p, so=None: MockObjectStore(p, so)
    )
    yield "mock://table"
    ByteStore.unregister_scheme("mock")


def _seed(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("long").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )


def test_full_verb_chain_on_object_store(spark, mock_root):
    """create → merge → delete → add_columns → merge(wide) → compact →
    zorder → maintain → vacuum → history, all on a mock:// root —
    value-checked against an independently computed expectation."""
    t = Table.create(spark, mock_root, _seed(spark))

    correction = _seed(spark).filter(F.col("k") % 10 == 0).withColumn(
        "val", F.col("val") + 100.0
    )
    t.merge(correction, keys=["k"])
    t.delete("grp = 3")
    t.add_columns({"tag": "string"})
    wide = (
        spark.createDataFrame(
            [(k, k % 7, -1.0, "x") for k in (0, 50, 100, 150)],
            "k long, grp long, val double, tag string",
        )
    )
    t.merge(wide, keys=["k"])
    # restore() round-trip: roll back to the pre-wide version (a pure
    # metadata commit on the mock store), verify, then re-apply
    pre_wide = {
        r["k"]: (r["grp"], r["val"], r["tag"])
        for r in t.read_version(3).collect()
    }
    t.restore(3)
    assert {
        r["k"]: (r["grp"], r["val"], r["tag"])
        for r in t.current().collect()
    } == pre_wide
    t.merge(wide, keys=["k"])
    t.compact(target_file_bytes=1 << 20)
    t.zorder(["k", "grp"], target_file_bytes=1 << 20)

    # expectation, computed independently
    exp = {}
    for k in range(200):
        grp, val = k % 7, k * 1.5
        if k % 10 == 0:
            val += 100.0
        if grp != 3:
            exp[k] = (grp, val, None)
    for k in (0, 50, 100, 150):
        exp[k] = (k % 7, -1.0, "x")
    got = {
        r["k"]: (r["grp"], r["val"], r["tag"])
        for r in t.current().collect()
    }
    assert got == exp

    m = t.maintain()
    assert m["branches"] == 1  # zorder reset the union to one birth dir
    assert m["recommendation"] is None
    assert m["bytes"] > 0

    ops = [h["op"] for h in t.describe_history()]
    assert ops == [
        "create", "merge", "delete", "add_columns", "merge",
        "restore", "merge", "compact", "zorder",
    ]

    t.vacuum(keep_last=2)
    # current still reads after retention, values unchanged
    assert {
        r["k"]: (r["grp"], r["val"], r["tag"])
        for r in t.current().collect()
    } == exp
    assert t.history()[-1] == 8

    # the metadata layer really ran through the mock store
    assert CALLS["put"] > 0 and CALLS["list_prefix_detail"] > 0


def test_manifest_mode_merge_makes_zero_size_calls(spark, mock_root):
    """The per-verb serial stat loop is gone: with sizes recorded in
    the manifest at commit, a manifest-mode merge performs ZERO
    per-file ``size()`` calls — sizing is manifest arithmetic, and the
    new-file inventory rides the listing (``list_prefix_detail``)."""
    t = Table.create(spark, mock_root, _seed(spark))
    CALLS.clear()
    t.merge(
        _seed(spark).filter(F.col("k") % 25 == 0).withColumn(
            "val", F.lit(0.0)
        ),
        keys=["k"],
    )
    assert CALLS["size"] == 0
    assert CALLS["list_prefix_detail"] > 0  # inventory via listing
    # and a delete keeps the same property
    CALLS.clear()
    t.delete("k % 40 = 0")
    assert CALLS["size"] == 0


def test_put_if_absent_is_atomic_exclusive(tmp_path):
    """Eight threads race one key: exactly one create wins, and the
    winner's bytes are complete (link-after-full-write, never a torn
    O_EXCL stream)."""
    store = LocalByteStore(str(tmp_path))
    barrier = threading.Barrier(8)
    results = []

    def go(i):
        barrier.wait()
        results.append(
            (store.put_if_absent("ptr.json", f"writer-{i}".encode()), i)
        )

    threads = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    winners = [i for ok, i in results if ok]
    assert len(winners) == 1
    assert store.get("ptr.json") == f"writer-{winners[0]}".encode()


def test_racing_writers_exactly_one_commits(spark, tmp_path):
    """Two writers race the same version number. Writer B commits
    first; writer A — holding a frozen pre-B snapshot so the
    optimistic early checks cannot save it — must lose at the
    conditional commit create, with the pointer (and B's data)
    untouched."""
    root = str(tmp_path / "tbl")
    t_a = Table.create(spark, root, _seed(spark, 50))
    meta0 = t_a.meta()
    v, vd = 1, "v1"

    t_b = Table(spark, root)
    t_b.merge(
        _seed(spark, 50).filter(F.col("k") < 5).withColumn(
            "val", F.lit(42.0)
        ),
        keys=["k"],
    )
    assert t_b.version() == 1

    # freeze A's view of the pointer so both optimistic checks pass —
    # the store-level CAS is the last line, and it must hold alone
    t_a.meta = lambda: meta0  # type: ignore[method-assign]
    with pytest.raises(ConcurrentWriteError):
        t_a._commit(v, vd, batch_id=-1)
    fresh = Table(spark, root)
    assert fresh.version() == 1
    assert (
        fresh.current().filter(F.col("k") < 5).select("val").distinct()
        .collect()[0]["val"]
        == 42.0
    )


def test_pointer_repairs_after_crash_between_commit_and_flip(
    spark, tmp_path
):
    """A writer that created its ``_txn/vN.json`` record but died
    before flipping ``_CURRENT.json`` still committed: the next
    reader advances over the record and repairs the cache."""
    root = str(tmp_path / "tbl")
    t = Table.create(spark, root, _seed(spark, 40))
    t.merge(
        _seed(spark, 40).filter(F.col("k") % 2 == 0).withColumn(
            "val", F.lit(-5.0)
        ),
        keys=["k"],
    )
    store = t._store()
    # simulate the crash: wind the CACHE back to v0; the v1 commit
    # record remains
    store.put(
        "_CURRENT.json",
        json.dumps(
            {"version": 0, "version_dir": "v0", "batch_id": -1}
        ).encode(),
    )
    t2 = Table(spark, root)
    assert t2.version() == 1  # advanced over the commit record
    # and the cache was repaired for later one-GET reads
    assert json.loads(store.get("_CURRENT.json"))["version"] == 1
    assert (
        t2.current().filter(F.col("k") % 2 == 0)
        .select("val").distinct().collect()[0]["val"]
        == -5.0
    )


def test_minhash_index_lifecycle_on_object_store(spark, mock_root):
    """The persisted MinHash index rides the same seam: build, append,
    query, CoW delete, and vacuum all run against a mock:// root —
    index artifacts are CoW citizens of the object store too."""
    from cae_polars_tools_spark.operators.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        delete_minhash_index,
        query_minhash_index,
        vacuum_minhash_index,
    )

    docs = spark.createDataFrame(
        [
            (i, f"shared words for everyone {i % 4} " * 6 + f"tail {i}", "s")
            for i in range(24)
        ],
        "doc_id long, text string, source string",
    )
    root = "mock://mhidx"
    build_minhash_index(docs.filter("doc_id < 16"), root)
    append_minhash_index(spark, root, docs.filter("doc_id >= 16"))
    probe = spark.createDataFrame(
        [(100, "shared words for everyone 1 " * 6 + "tail 1", "b")],
        "doc_id long, text string, source string",
    )
    before = {
        r["doc_id_hist"]
        for r in query_minhash_index(spark, root, probe).collect()
    }
    assert 1 in before
    delete_minhash_index(spark, root, "doc_id = 1")
    after = {
        r["doc_id_hist"]
        for r in query_minhash_index(spark, root, probe).collect()
    }
    assert after == before - {1}
    vacuum_minhash_index(root)
    assert {
        r["doc_id_hist"]
        for r in query_minhash_index(spark, root, probe).collect()
    } == after

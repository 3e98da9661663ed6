"""Metadata scalability: sharded manifests keep the pointer read
bounded at millions of files (Delta checkpoint-parts shape), and
``Table.maintain`` is the policy hook that watches manifest sprawl
(union branch count) and resets it via compaction."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import cae_polars_tools_spark.manifest as mf
from cae_polars_tools_spark.sources.zarr_format import LocalByteStore
from cae_polars_tools_spark.table import Table


def _df(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("val")
    )


def test_write_manifest_shards_roundtrip(tmp_path, monkeypatch):
    """Past the shard cap the main document carries shard NAMES only
    (bounded read); load_manifest resolves them back to the flat
    files+sizes view byte-for-byte."""
    monkeypatch.setattr(mf, "MANIFEST_SHARD_REFS", 3)
    store = LocalByteStore(str(tmp_path))
    refs = [f"v0/part-{i:05d}.parquet" for i in range(10)]
    sizes = {r: 100 + i for i, r in enumerate(refs)}
    mf.write_manifest(store, "v0", refs, {"type": "struct"}, sizes=sizes)

    main = json.loads(store.get("v0/_MANIFEST.json"))
    assert main["format"] == 2
    assert "files" not in main
    assert main["n_files"] == 10
    assert len(main["shards"]) == 4  # ceil(10/3)
    # the pointer-read object stays small no matter the ref count
    assert len(store.get("v0/_MANIFEST.json")) < 1024

    doc = mf.load_manifest(store, "v0")
    assert doc["files"] == sorted(refs)
    assert doc["sizes"] == sizes
    assert doc["schema"] == {"type": "struct"}
    # refs_of / sizes_of ride the same resolution
    assert mf.refs_of(store, "v0") == sorted(refs)
    assert mf.sizes_of(store, "v0") == sizes
    # a retry (same content) rewrites the same shard names idempotently
    mf.write_manifest(store, "v0", refs, {"type": "struct"}, sizes=sizes)
    assert mf.load_manifest(store, "v0")["files"] == sorted(refs)


def test_sharded_manifest_table_lifecycle(spark, tmp_path, monkeypatch):
    """A Table whose versions shard their manifests stays fully
    operable: reads resolve, merges commit, vacuum strips shard
    sidecars with the main document."""
    monkeypatch.setattr(mf, "MANIFEST_SHARD_REFS", 3)
    root = str(tmp_path / "tbl")
    t = Table.create(spark, root, _df(spark).repartition(8))
    store = t._store()
    assert "shards" in json.loads(store.get("v0/_MANIFEST.json"))
    assert t.current().count() == 60

    t.merge(
        _df(spark).filter(F.col("k") % 5 == 0).withColumn(
            "val", F.lit(-1.0)
        ),
        keys=["k"],
    )
    got = {r["k"]: r["val"] for r in t.current().collect()}
    assert got[5] == -1.0 and got[1] == 2.0 and len(got) == 60

    t.compact(target_file_bytes=1 << 20)
    t.merge(
        _df(spark).filter(F.col("k") == 1).withColumn("val", F.lit(9.0)),
        keys=["k"],
    )
    t.vacuum(keep_last=1)
    # demoted/removed version dirs keep no _MANIFEST-* shard litter
    for vd in ("v0", "v1"):
        assert not [
            n
            for n in store.list_prefix(vd)
            if n.startswith("_MANIFEST")
        ]
    got = {r["k"]: r["val"] for r in t.current().collect()}
    assert got[1] == 9.0 and got[5] == -1.0


def test_maintain_watches_branch_sprawl_and_auto_compacts(spark, tmp_path):
    """Each CoW verb adds one birth directory to the current version's
    union plan; maintain() reports the count, recommends compaction
    past the threshold, and (auto_compact) runs it — resetting the
    branch count to 1 with values intact."""
    root = str(tmp_path / "tbl")
    # k-clustered files so each narrow merge rewrites ONE file and
    # re-references the rest — the sprawl shape maintain() exists for
    seed = (
        _df(spark, 300)
        .repartitionByRange(6, "k")
        .sortWithinPartitions("k")
    )
    t = Table.create(spark, root, seed)
    for i in range(3):
        lo = 100 * i
        t.merge(
            _df(spark, 300)
            .filter((F.col("k") >= lo) & (F.col("k") < lo + 3))
            .withColumn("val", F.col("val") + 1000.0 * (i + 1)),
            keys=["k"],
        )
    before = {r["k"]: r["val"] for r in t.current().collect()}

    m = t.maintain(max_branches=2)
    assert m["branches"] > 2
    assert not m["compacted"]
    assert "compact" in m["recommendation"]

    m2 = t.maintain(max_branches=2, auto_compact=True)
    assert m2["compacted"]
    assert t.maintain(max_branches=2)["branches"] == 1
    assert [h["op"] for h in t.describe_history()][-1] == "compact"
    assert {r["k"]: r["val"] for r in t.current().collect()} == before

    # healthy table: pure report, no recommendation, no new version
    v = t.version()
    m3 = t.maintain(max_branches=2, auto_compact=True)
    assert not m3["compacted"] and t.version() == v


def test_manifests_record_rows_and_reuse_them(spark, tmp_path):
    """Commits record per-file ROW counts (parquet footers via ranged
    store reads), untouched files carry their counts forward, and the
    recorded total equals the table's actual row count at every
    version — the accounting that lets merge size itself without a
    count job over the table."""
    from cae_polars_tools_spark.manifest import (
        parquet_footer_rows,
        rows_of,
    )

    root = str(tmp_path / "tbl")
    t = Table.create(spark, root, _df(spark, 120).repartition(4))
    store = t._store()
    r0 = rows_of(store, "v0")
    assert r0 and sum(r0.values()) == 120
    # footer reader agrees with a real read per file
    for ref, n in r0.items():
        assert parquet_footer_rows(store, ref) == n

    t.merge(
        _df(spark, 130).filter(F.col("k") >= 100).withColumn(
            "val", F.lit(7.0)
        ),
        keys=["k"],
    )
    r1 = rows_of(store, t.meta()["version_dir"])
    assert set(r1) == set(t._version_refs(t.meta()["version_dir"]))
    assert sum(r1.values()) == t.current().count() == 130

    t.delete("k % 3 = 0")
    r2 = rows_of(store, t.meta()["version_dir"])
    assert sum(r2.values()) == t.current().count()
    # metadata-only verbs carry the accounting verbatim
    t.add_columns({"tag": "string"})
    assert rows_of(store, t.meta()["version_dir"]) == r2
    t.restore(2)
    assert rows_of(store, t.meta()["version_dir"]) == r2


def test_merge_discovery_prunes_files_by_manifest_stats(spark, tmp_path):
    """Data skipping: commits record per-file column min/max; a merge
    whose batch key range provably misses a file never even puts that
    file in the discovery relation (files_candidates < table files on
    a key-clustered layout), and the result is exactly the full-path
    merge's."""
    root = str(tmp_path / "tbl")
    seed = (
        _df(spark, 400)
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
    )
    t = Table.create(spark, root, seed)
    n_files = len(t._version_refs("v0"))
    assert n_files >= 4
    batch = (
        _df(spark, 400)
        .filter((F.col("k") >= 100) & (F.col("k") < 110))
        .withColumn("val", F.lit(-9.0))
    )
    stats = t.merge(batch, keys=["k"])
    assert stats["files_candidates"] < n_files
    assert stats["files_rewritten"] <= stats["files_candidates"]
    assert stats["rows_updated"] == 10
    got = {r["k"]: r["val"] for r in t.current().collect()}
    assert len(got) == 400
    for k in range(400):
        assert got[k] == (-9.0 if 100 <= k < 110 else k * 2.0)

    # a fully-outside batch inserts without touching any file
    stats2 = t.merge(
        spark.createDataFrame([(10_000, 1.0)], "k long, val double"),
        keys=["k"],
    )
    assert stats2["files_candidates"] == 0
    assert stats2["files_rewritten"] == 0
    assert stats2["rows_inserted"] == 1
    assert t.current().count() == 401


def test_merge_pruning_handles_strings_and_evolved_columns(spark, tmp_path):
    """Conservative rules: string keys prune by byte-order ranges;
    a key column added by schema evolution (old files have no stats
    for it) keeps every old file a candidate — never a silent miss."""
    root = str(tmp_path / "tbl")
    seed = spark.createDataFrame(
        [(f"doc-{i:04d}", float(i)) for i in range(100)],
        "name string, val double",
    ).repartitionByRange(4, "name").sortWithinPartitions("name")
    t = Table.create(spark, root, seed)
    n_files = len(t._version_refs("v0"))
    stats = t.merge(
        spark.createDataFrame(
            [("doc-0007", -1.0)], "name string, val double"
        ),
        keys=["name"],
    )
    assert stats["files_candidates"] < n_files
    got = {r["name"]: r["val"] for r in t.current().collect()}
    assert got["doc-0007"] == -1.0 and got["doc-0099"] == 99.0

    # evolve, then merge on the evolved column as a key: old files
    # carry no stats for it — all stay candidates, values stay right
    t.add_columns({"bucket": "bigint"})
    wide = spark.createDataFrame(
        [("doc-0001", 1.0, 7)], "name string, val double, bucket bigint"
    )
    stats3 = t.merge(wide, keys=["name", "bucket"])
    got = {
        r["name"]: (r["val"], r["bucket"])
        for r in t.current().collect()
    }
    # the (doc-0001, 7) key matches nothing (old rows have NULL
    # bucket, and NULL never equals 7) — the row inserts
    assert got["doc-0001"] == (1.0, None) or t.current().count() == 101
    assert (
        t.current().filter("name = 'doc-0001' and bucket = 7").count()
        == 1
    )


def test_delete_keys_prunes_files_on_clustered_table(spark, tmp_path):
    """The pruned-takedown verb: deleting a narrow id list from a
    key-clustered table plans over a strict subset of its files, and
    the result equals the unpruned predicate delete's."""
    root = str(tmp_path / "tbl")
    seed = (
        _df(spark, 400)
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
    )
    t = Table.create(spark, root, seed)
    n_files = len(t._version_refs("v0"))
    stats = t.delete_keys("k", [42, 43, 44])
    assert stats["files_candidates"] < n_files
    assert stats["files_rewritten"] <= stats["files_candidates"]
    assert stats["rows_deleted"] == 3
    got = {r["k"] for r in t.current().collect()}
    assert len(got) == 397 and not {42, 43, 44} & got
    # out-of-range takedown: zero candidates, a clean no-op version
    stats2 = t.delete_keys("k", [99_999])
    assert stats2["files_candidates"] == 0
    assert stats2["rows_deleted"] == 0
    assert t.current().count() == 397


def test_merge_discovery_prunes_on_timestamp_key(spark, tmp_path):
    """Round-15: TIMESTAMP keys prune. A ts-clustered table (written
    as TIMESTAMP_MICROS — INT96, Spark's default, carries no parquet
    statistics at all) records epoch-micros int stats; a merge over a
    narrow time window plans over a strict subset of the files, and
    the result equals the full-path merge's. The most common CDC /
    event-table layout must not fall back to full discovery."""
    old = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        root = str(tmp_path / "tbl")
        seed = (
            spark.range(400)
            .select(
                F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
                (F.col("id") * 2.0).alias("val"),
            )
            .repartitionByRange(8, "ts")
            .sortWithinPartitions("ts")
        )
        t = Table.create(spark, root, seed)
        n_files = len(t._version_refs("v0"))
        assert n_files >= 4
        # the manifest really recorded epoch-micros ints for ts
        cstats = t._version_stats("v0")
        assert any(
            isinstance(st.get("ts", [None])[0], int)
            for st in cstats.values()
        )
        batch = (
            spark.range(400)
            .select(
                F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
                (F.col("id") * 2.0).alias("val"),
            )
            .filter((F.col("id") >= 100) & (F.col("id") < 110))
            .withColumn("val", F.lit(-9.0))
        )
        stats = t.merge(batch, keys=["ts"])
        assert stats["files_candidates"] < n_files
        assert stats["rows_updated"] == 10
        got = {r["ts"]: r["val"] for r in t.current().collect()}
        assert len(got) == 400
        assert sorted(v for v in got.values() if v == -9.0) == [-9.0] * 10
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old)


def test_merge_discovery_prunes_on_date_key(spark, tmp_path):
    """DATE keys prune out of the box (parquet date stats are INT32
    epoch days regardless of writer settings); delete_keys with a
    Python date list rides the same epoch-days encoding."""
    import datetime as dt

    root = str(tmp_path / "tbl")
    seed = (
        spark.range(365)
        .select(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
            (F.col("id") * 1.0).alias("val"),
        )
        .repartitionByRange(8, "d")
        .sortWithinPartitions("d")
    )
    t = Table.create(spark, root, seed)
    n_files = len(t._version_refs("v0"))
    assert n_files >= 4
    batch = (
        seed.filter(
            (F.col("d") >= F.lit("2024-06-01")) & (F.col("d") < F.lit("2024-06-08"))
        ).withColumn("val", F.lit(-1.0))
    )
    stats = t.merge(batch, keys=["d"])
    assert stats["files_candidates"] < n_files
    assert stats["rows_updated"] == 7

    # pruned takedown by a date id list
    stats2 = t.delete_keys(
        "d", [dt.date(2024, 6, 1), dt.date(2024, 6, 2)]
    )
    assert stats2["files_candidates"] < n_files
    assert stats2["rows_deleted"] == 2
    assert t.current().count() == 363


def test_txn_records_stay_bounded_under_long_lifecycle(spark, tmp_path):
    """Round-15 retention-parity pin: 50 mutating verbs with periodic
    vacuums keep the ``_txn/`` commit-record listing bounded by
    RETENTION, not table age (vacuum drops records with their
    versions), and a fresh pointer read stays O(1) — one cache GET
    plus exactly one record-probe miss, never a listing scan.
    The retention rule: a version's record lives exactly as long as
    the version is readable; removed and demoted versions lose theirs
    in the same vacuum pass (table.py:vacuum_table)."""
    from cae_polars_tools_spark.sources.zarr_format import LocalByteStore
    from cae_polars_tools_spark.table import read_pointer

    root = str(tmp_path / "tbl")
    small = _df(spark, 20)
    t = Table.create(spark, root, small)
    for i in range(1, 50):
        if i % 10 == 0:
            t.vacuum(keep_last=2)  # not a version; bounds the rest
        elif i % 7 == 0:
            t.delete(f"k = {1000 + i}")  # no-match: metadata version
        else:
            t.merge(
                small.filter(F.col("k") == i % 20).withColumn(
                    "val", F.lit(float(i))
                ),
                keys=["k"],
            )
        # the record listing never outgrows retention + verbs since
        # the last vacuum (10 here), regardless of total table age
        store = t._store()
        assert len(store.list_prefix("_txn")) <= 2 + 1 + 10
    t.vacuum(keep_last=2)
    store = t._store()
    # after the final vacuum: records for the retained versions only
    assert len(store.list_prefix("_txn")) <= 3
    # readable history and records agree (parity)
    recs = {
        int(n[1:-5]) for n in store.list_prefix("_txn")
    }  # vN.json -> N
    assert recs == set(t.history())

    class _Counting(LocalByteStore):
        def __init__(self, r):
            super().__init__(r)
            self.txn_gets = 0

        def get(self, key):
            if key.startswith("_txn/"):
                self.txn_gets += 1
            return super().get(key)

    cst = _Counting(root)
    meta = read_pointer(cst)
    assert meta["version"] == t.version()
    assert cst.txn_gets == 1  # one probe miss — O(1), no LIST

    # values survived the whole lifecycle
    got = {r["k"]: r["val"] for r in t.current().collect()}
    assert len(got) == 20


def test_merge_discovery_prunes_on_decimal_key(spark, tmp_path):
    """DECIMAL keys prune via scale-tagged unscaled-int stats — and a
    table merely CONTAINING decimal columns commits at all (pyarrow's
    converted statistics raise on Spark's int-physical decimals, so
    the accounting must read the raw values; this was a latent crash
    before round 15)."""
    root = str(tmp_path / "tbl")
    seed = (
        spark.range(300)
        .select(
            (F.col("id").cast("decimal(12,2)") / F.lit(4))
            .cast("decimal(12,2)")
            .alias("amt"),
            (F.col("id") * 1.0).alias("val"),
        )
        .repartitionByRange(6, "amt")
        .sortWithinPartitions("amt")
    )
    t = Table.create(spark, root, seed)
    n_files = len(t._version_refs("v0"))
    assert n_files >= 3
    # the manifest really carries scale-tagged unscaled ints
    cstats = t._version_stats("v0")
    tagged = [
        st["amt"] for st in cstats.values() if "amt" in st
    ]
    assert tagged and all(
        len(x) == 3 and x[2] == {"t": "dec", "s": 2} for x in tagged
    )
    batch = seed.filter(
        (F.col("amt") >= 10) & (F.col("amt") < 12)
    ).withColumn("val", F.lit(-3.0))
    stats = t.merge(batch, keys=["amt"])
    assert stats["files_candidates"] < n_files
    assert stats["rows_updated"] == 8  # 40..47 -> 10.00..11.75
    got = {str(r["amt"]): r["val"] for r in t.current().collect()}
    assert got["10.00"] == -3.0 and got["12.00"] == 48.0


def test_high_precision_decimal_key_prunes_exactly(spark, tmp_path):
    """precision 38 (FIXED_LEN_BYTE_ARRAY physical, unscaled values
    beyond int64): the driver-side Decimal→unscaled conversion is
    exact at any precision, so even decimal(38,2) keys prune — and
    the probe bound can never round (a Spark *10^s expression would
    overflow the 38-digit multiply rules and silently round, which is
    why the conversion lives on the driver)."""
    root = str(tmp_path / "tbl")
    seed = (
        spark.range(100)
        .select(
            # huge magnitudes: unscaled values ~1e20 exceed int64
            (
                F.col("id").cast("decimal(38,2)")
                * F.lit(10).cast("decimal(20,0)") ** 18
            ).cast("decimal(38,2)").alias("amt"),
            (F.col("id") * 1.0).alias("val"),
        )
        .repartitionByRange(4, "amt")
        .sortWithinPartitions("amt")
    )
    t = Table.create(spark, root, seed)
    n_files = len(t._version_refs("v0"))
    batch = seed.filter(F.col("val") == 7.0).withColumn(
        "val", F.lit(-1.0)
    )
    stats = t.merge(batch, keys=["amt"])
    assert stats["files_candidates"] < n_files
    assert stats["rows_updated"] == 1
    got = {r["val"] for r in t.current().collect()}
    assert -1.0 in got and 7.0 not in got and len(got) == 100

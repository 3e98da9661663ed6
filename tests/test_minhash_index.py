"""Persisted MinHash-LSH band index lifecycle: build/append/query
equivalence against the inline LSH path, uniqueness guards, CoW
delete pointer flips."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table
from cae_polars_tools_spark.operators.dedup import minhash_lsh_pairs
from cae_polars_tools_spark.operators.minhash_index import (
    append_minhash_index,
    build_minhash_index,
    delete_minhash_index,
    load_minhash_meta,
    query_minhash_index,
)

SF = "/root/testdata/sf0.001"
_PRED = "source LIKE 'src1_'"


def _docs(spark):
    return read_table(spark, SF, "documents")


def _inline_cross_role_pairs(spark):
    """Ground truth from the INLINE path: all LSH pairs over the full
    corpus, kept only where exactly one side is in the batch, then
    normalized to (hist, new)."""
    docs = _docs(spark)
    pairs = minhash_lsh_pairs(docs)
    roles = docs.select(
        "doc_id", F.expr(_PRED).alias("is_new")
    )
    ra = roles.select(
        F.col("doc_id").alias("doc_id_a"), F.col("is_new").alias("a_new")
    )
    rb = roles.select(
        F.col("doc_id").alias("doc_id_b"), F.col("is_new").alias("b_new")
    )
    return {
        (
            r["doc_id_b"] if r["a_new"] else r["doc_id_a"],
            r["doc_id_a"] if r["a_new"] else r["doc_id_b"],
            round(r["jaccard"], 9),
        )
        for r in pairs.join(ra, "doc_id_a").join(rb, "doc_id_b")
        .filter(F.col("a_new") != F.col("b_new"))
        .collect()
    }


def _query_set(spark, root):
    batch = _docs(spark).filter(F.expr(_PRED))
    return {
        (r["doc_id_hist"], r["doc_id_new"], round(r["jaccard"], 9))
        for r in query_minhash_index(spark, root, batch).collect()
    }


def test_index_query_equals_inline_lsh(spark, tmp_path):
    """Probing the persisted index must return exactly the inline LSH
    path's cross-role pairs — same frozen hash family, same 32-band
    geometry, same exact verification."""
    root = str(tmp_path / "idx")
    hist = _docs(spark).filter(~F.expr(_PRED))
    build_minhash_index(hist, root)
    assert _query_set(spark, root) == _inline_cross_role_pairs(spark)


def test_append_equals_full_build(spark, tmp_path):
    """history[:half] built + history[half:] appended must answer
    probes identically to a single full build (frozen-family append
    never drifts)."""
    full_root = str(tmp_path / "full")
    inc_root = str(tmp_path / "inc")
    hist = _docs(spark).filter(~F.expr(_PRED))
    cut = hist.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    build_minhash_index(hist, full_root)
    build_minhash_index(hist.filter(F.col("doc_id") <= cut), inc_root)
    stats = append_minhash_index(
        spark, inc_root, hist.filter(F.col("doc_id") > cut)
    )
    assert stats["rows_appended"] > 0
    assert _query_set(spark, inc_root) == _query_set(spark, full_root)


def test_append_rejects_duplicate_ids(spark, tmp_path):
    root = str(tmp_path / "idx")
    hist = _docs(spark).filter(~F.expr(_PRED))
    build_minhash_index(hist, root)
    with pytest.raises(ValueError, match="collide"):
        append_minhash_index(spark, root, hist.limit(1))
    batch = _docs(spark).filter(F.expr(_PRED)).limit(1)
    with pytest.raises(ValueError, match="duplicate doc_ids"):
        append_minhash_index(spark, root, batch.unionAll(batch))


def test_cow_delete_flips_pointers_and_removes_pairs(spark, tmp_path):
    """Deleting an indexed doc must remove every pair it anchored,
    version BOTH directories, and leave the old generation intact
    (readers of the old pointer never observe a half-deleted state)."""
    root = str(tmp_path / "idx")
    hist = _docs(spark).filter(~F.expr(_PRED))
    build_minhash_index(hist, root)
    before = _query_set(spark, root)
    assert before, "corpus should produce cross-role near-dup pairs"
    victim = sorted(before)[0][0]
    stats = delete_minhash_index(spark, root, f"doc_id = {victim}")
    meta = load_minhash_meta(root)
    assert meta["bands_dir"] == stats["bands_dir"] == "bands_v1"
    assert meta["sigs_dir"] == stats["sigs_dir"] == "sigs_v1"
    assert stats["sigs"]["rows_deleted"] == 1
    after = _query_set(spark, root)
    assert after == {p for p in before if p[0] != victim}
    # old generation untouched on disk
    assert os.path.isdir(f"{root}/bands_v0")
    assert os.path.isdir(f"{root}/sigs_v0")
    old = spark.read.parquet(f"{root}/sigs_v0")
    assert old.filter(F.col("doc_id") == victim).count() == 1


def test_query_missing_index_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no MinHash index"):
        query_minhash_index(
            spark, str(tmp_path / "nope"), _docs(spark).limit(1)
        )


def test_ingest_sink_effectively_once_and_compact_preserves(spark, tmp_path):
    """Streaming ingest: a redelivered micro-batch (or one carrying a
    duplicate) appends nothing twice; compaction rewrites layout into
    new versioned dirs without changing probe answers."""
    from cae_polars_tools_spark.operators.minhash_index import (
        compact_minhash_index,
    )
    from cae_polars_tools_spark.operators.minhash_index import (
        minhash_ingest_sink,
    )

    root = str(tmp_path / "idx")
    hist = _docs(spark).filter(~F.expr(_PRED))
    cut = hist.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    build_minhash_index(hist.filter(F.col("doc_id") <= cut), root)
    sink = minhash_ingest_sink(root)
    tail = hist.filter(F.col("doc_id") > cut)
    sink(tail, 0)
    n_after = spark.read.parquet(f"{root}/sigs_v0").count()
    sink(tail, 0)  # redelivery: id-level dedup makes it a no-op
    assert spark.read.parquet(f"{root}/sigs_v0").count() == n_after
    want = _query_set(spark, root)
    assert want == _inline_cross_role_pairs(spark)

    out = compact_minhash_index(spark, root)
    meta = load_minhash_meta(root)
    assert meta["bands_dir"] == out["bands_dir"] == "bands_v1"
    assert meta["sigs_dir"] == out["sigs_dir"] == "sigs_v1"
    assert _query_set(spark, root) == want


def test_short_docs_visible_to_indexed_exact_dedup(spark, tmp_path):
    """A history doc too short to shingle must still block an exact
    batch duplicate: the sigs table keeps its fingerprint row (empty
    h64), the anti-probe sees it, and near-dup paths ignore it for
    free (no band rows)."""
    from cae_polars_tools_spark.operators.minhash_index import (
        incremental_dedup_indexed,
    )

    hist = spark.createDataFrame(
        [(1, "hi", "src0"), (2, "a much longer document " * 4, "src0")],
        "doc_id long, text string, source string",
    )
    root = str(tmp_path / "idx")
    build_minhash_index(hist, root)
    batch = spark.createDataFrame(
        [(10, "hi", "src10"),            # exact dup of the SHORT doc
         (11, "fresh batch text " * 4, "src10")],
        "doc_id long, text string, source string",
    )
    kept = {
        r["doc_id"]
        for r in incremental_dedup_indexed(spark, root, batch).collect()
    }
    assert kept == {11}, kept


def test_vacuum_removes_only_stale_generations(spark, tmp_path):
    from cae_polars_tools_spark.operators.minhash_index import (
        vacuum_minhash_index,
    )

    from cae_polars_tools_spark.operators.minhash_index import (
        compact_minhash_index,
    )

    root = str(tmp_path / "idx")
    hist = _docs(spark).filter(~F.expr(_PRED))
    build_minhash_index(hist, root)
    before = _query_set(spark, root)
    delete_minhash_index(spark, root, "doc_id = -1")  # no-op delete → v1
    removed = vacuum_minhash_index(root)
    # the no-op delete's v1 manifests re-reference every v0 segment
    # (zero bytes copied), so v0 demotes to a husk parking the shared
    # files — retired from service, files refcount-protected
    assert removed == ["bands_v0", "sigs_v0"]
    assert _query_set(spark, root) == before  # live generation intact
    # a compaction rewrites everything into fresh segments; the next
    # vacuum finds the husk files unreferenced and reclaims them fully
    compact_minhash_index(spark, root)
    vacuum_minhash_index(root)
    assert not os.path.isdir(f"{root}/bands_v0")
    assert not os.path.isdir(f"{root}/sigs_v0")
    assert _query_set(spark, root) == before


def test_index_handles_non_ascii_text(spark, tmp_path):
    """The ORACLE needs ASCII (ascii()/substr SQL twins), but the
    OPERATOR must not: unicode history and batch docs probe the index
    identically to the inline path (token hashing is over UTF-8
    bytes on both paths, so offsets/hashes agree by construction)."""
    hist = spark.createDataFrame(
        [
            (1, "café au lait — übermäßig gut " * 4, "h"),
            (2, "日本語 の 文書 テスト データ " * 4, "h"),
            (3, "plain ascii history document " * 4, "h"),
        ],
        "doc_id long, text string, source string",
    )
    batch = spark.createDataFrame(
        [
            (10, "café au lait — übermäßig gut " * 4, "b"),  # dup of 1
            (11, "日本語 の 文書 テスト データ x " * 4, "b"),  # near 2
            (12, "entirely different new content here " * 4, "b"),
        ],
        "doc_id long, text string, source string",
    )
    root = str(tmp_path / "idx")
    build_minhash_index(hist, root)
    got = {
        (r["doc_id_hist"], r["doc_id_new"])
        for r in query_minhash_index(spark, root, batch).collect()
    }
    # inline ground truth over hist ∪ batch, cross-role only
    pairs = minhash_lsh_pairs(hist.unionByName(batch))
    want = {
        (min(r["doc_id_a"], r["doc_id_b"]),
         max(r["doc_id_a"], r["doc_id_b"]))
        for r in pairs.collect()
        if (r["doc_id_a"] < 10) != (r["doc_id_b"] < 10)
    }
    assert got == want
    assert (1, 10) in got  # the exact unicode duplicate pair


def test_probe_pushdown_cap_fallback_same_answers(spark, tmp_path, monkeypatch):
    """Past PROBE_PUSHDOWN_MAX distinct probe keys the driver-side
    isin pushdown is skipped (the broadcast join still filters) — the
    results must be identical either way."""
    import cae_polars_tools_spark.operators.minhash_index as mi

    root = str(tmp_path / "idx")
    build_minhash_index(_docs(spark).filter(~F.expr(_PRED)), root)
    want = _query_set(spark, root)
    monkeypatch.setattr(mi, "PROBE_PUSHDOWN_MAX", 1)
    assert _query_set(spark, root) == want


def test_compact_retry_after_crash_orphan(spark, tmp_path):
    """A crash between compact's version-write and pointer flip leaves
    orphaned bands_v1/sigs_v1 dirs the meta never referenced; the
    RETRY must clear them and succeed (Table._next_version_dir's rule)
    instead of wedging on errorifexists until a manual vacuum."""
    from cae_polars_tools_spark.operators.minhash_index import (
        compact_minhash_index,
    )

    root = str(tmp_path / "idx")
    build_minhash_index(_docs(spark).filter(~F.expr(_PRED)), root)
    want = _query_set(spark, root)
    for orphan in ("bands_v1", "sigs_v1"):
        os.makedirs(f"{root}/{orphan}")
        with open(f"{root}/{orphan}/junk.txt", "w") as fh:
            fh.write("crash leftovers")
    out = compact_minhash_index(spark, root)
    assert out["bands_dir"] == "bands_v1"
    assert out["sigs_dir"] == "sigs_v1"
    # orphan content is GONE, not merged into the new generation
    assert not os.path.exists(f"{root}/bands_v1/junk.txt")
    assert not os.path.exists(f"{root}/sigs_v1/junk.txt")
    assert _query_set(spark, root) == want


def test_delete_retry_after_crash_orphan(spark, tmp_path):
    """Same crash-then-retry contract for the CoW delete verb (heals
    through delete_parquet's fresh-destination rule)."""
    root = str(tmp_path / "idx")
    build_minhash_index(_docs(spark).filter(~F.expr(_PRED)), root)
    before = _query_set(spark, root)
    victim = sorted(before)[0][0]
    for orphan in ("bands_v1", "sigs_v1"):
        os.makedirs(f"{root}/{orphan}")
        with open(f"{root}/{orphan}/junk.txt", "w") as fh:
            fh.write("crash leftovers")
    stats = delete_minhash_index(spark, root, f"doc_id = {victim}")
    assert stats["bands_dir"] == "bands_v1"
    assert not os.path.exists(f"{root}/sigs_v1/junk.txt")
    assert _query_set(spark, root) == {p for p in before if p[0] != victim}


def test_over_cap_probe_keeps_shard_partition_pruning(spark, tmp_path, monkeypatch):
    """Above PROBE_PUSHDOWN_MAX the bh isin pushdown is skipped, but
    the ≤64-value shard list must STILL prune band-table partitions —
    the plan carries a PartitionFilters INSET on shard."""
    import io
    from contextlib import redirect_stdout

    import cae_polars_tools_spark.operators.minhash_index as mi

    root = str(tmp_path / "idx")
    build_minhash_index(_docs(spark).filter(~F.expr(_PRED)), root)
    want = _query_set(spark, root)
    monkeypatch.setattr(mi, "PROBE_PUSHDOWN_MAX", 1)
    batch = _docs(spark).filter(F.expr(_PRED))
    df = query_minhash_index(spark, root, batch)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    fmt = buf.getvalue()
    bands_scan = [s for s in fmt.split("\n\n") if "/bands_v" in s]
    assert bands_scan, fmt
    seg = bands_scan[0]
    assert "PartitionFilters: [shard" in seg and "INSET" in seg, seg
    assert _query_set(spark, root) == want


def test_large_batch_regime_drops_signed_broadcast(spark, tmp_path):
    """Above broadcast_max_rows every batch-derived broadcast hint is
    dropped: the plan carries NO BroadcastExchange when auto-broadcast
    is off (proving no explicit hint survived), and the survivors are
    identical across the switch."""
    from cae_polars_tools_spark.operators.minhash_index import (
        incremental_dedup_indexed,
    )

    root = str(tmp_path / "idx")
    docs = _docs(spark)
    build_minhash_index(docs.filter(~F.expr(_PRED)), root)
    batch = docs.filter(F.expr(_PRED))
    want = {
        tuple(r)
        for r in incremental_dedup_indexed(spark, root, batch).collect()
    }
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = incremental_dedup_indexed(
            spark, root, batch, broadcast_max_rows=0
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
        assert {tuple(r) for r in out.collect()} == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_stream_indexed_dedup_equals_batch_twin(spark, tmp_path):
    """The continuous-ingestion loop: micro-batches (ascending doc_id,
    arrival order) deduped against the persisted index via the
    foreachBatch sink — WITH crafted redeliveries of two of them —
    must land exactly the batch twin's survivors in the survivors
    table, and the index must hold exactly history + survivors with
    no duplicate ids."""
    from cae_polars_tools_spark.operators.minhash_index import (
        build_minhash_index as build,
    )
    from cae_polars_tools_spark.operators.minhash_index import (
        dedup_stream_indexed,
        incremental_dedup_indexed,
    )

    docs = _docs(spark)
    hist = docs.filter(~F.expr(_PRED))
    batch = docs.filter(F.expr(_PRED))

    # batch twin: one dedup over the whole batch + one append
    twin_root = str(tmp_path / "twin")
    build(hist, twin_root)
    twin_surv = {
        (r["doc_id"], r["source"])
        for r in incremental_dedup_indexed(spark, twin_root, batch).collect()
    }
    assert twin_surv, "batch must have survivors"

    # streaming: 3 ascending-id micro-batches + redeliveries
    stream_root = str(tmp_path / "stream")
    surv_path = str(tmp_path / "survivors")
    build(hist, stream_root)
    cuts = batch.agg(
        F.expr("percentile(doc_id, 0.34)"), F.expr("percentile(doc_id, 0.67)")
    ).first()
    b0 = batch.filter(F.col("doc_id") <= cuts[0])
    b1 = batch.filter(
        (F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])
    )
    b2 = batch.filter(F.col("doc_id") > cuts[1])
    sink = dedup_stream_indexed(stream_root, surv_path)
    sink(b0, 0)
    sink(b0, 0)  # immediate redelivery
    sink(b1, 1)
    sink(b2, 2)
    sink(b1, 1)  # late redelivery after later batches landed
    sink(batch.limit(0), 3)  # empty trigger is a no-op

    got = {
        (r["doc_id"], r["source"])
        for r in spark.read.parquet(surv_path).collect()
    }
    assert got == twin_surv
    # survivors table carries no duplicate rows despite redeliveries
    assert spark.read.parquet(surv_path).count() == len(twin_surv)
    # index = history + survivors exactly, no id indexed twice
    sigs = spark.read.parquet(f"{stream_root}/sigs_v0")
    assert sigs.count() == sigs.select("doc_id").distinct().count()
    want_ids = {r["doc_id"] for r in hist.select("doc_id").collect()} | {
        d for d, _ in twin_surv
    }
    assert {r["doc_id"] for r in sigs.collect()} == want_ids


def test_minhash_index_random_verb_sequences_match_rebuild(spark, tmp_path):
    """Model-based lifecycle check: a seeded random sequence of
    append / ingest-sink (with replay) / delete / compact / vacuum
    verbs must keep the incremental index answer-equivalent to an
    index REBUILT from scratch over the model's surviving documents —
    the invariant that makes frozen-family incremental maintenance
    sound (any drift between 'maintained' and 'rebuilt' state is a
    corruption the pointwise tests can miss)."""
    import random

    from cae_polars_tools_spark.operators.minhash_index import (
        compact_minhash_index,
        minhash_ingest_sink,
        vacuum_minhash_index,
    )

    rng = random.Random(20260816)

    def mk_doc(i):
        base = f"document number {i % 7} with shared phrasing " * 3
        return (i, base + f"unique tail {i} " * (1 + i % 3), "s")

    SCHEMA = "doc_id long, text string, source string"
    model = {i: mk_doc(i) for i in range(20)}
    root = str(tmp_path / "idx")
    build_minhash_index(
        spark.createDataFrame(list(model.values()), SCHEMA), root
    )
    probe = spark.createDataFrame(
        [(10_000 + j, mk_doc(j * 3)[1], "probe") for j in range(5)],
        SCHEMA,
    )
    next_id = 100
    sink = minhash_ingest_sink(root)

    def check(op):
        # rebuild-from-scratch is the reference implementation
        fresh = str(tmp_path / f"fresh_{op}_{next_id}")
        build_minhash_index(
            spark.createDataFrame(list(model.values()), SCHEMA), fresh
        )
        got = {
            (r["doc_id_hist"], r["doc_id_new"], round(r["jaccard"], 9))
            for r in query_minhash_index(spark, root, probe).collect()
        }
        want = {
            (r["doc_id_hist"], r["doc_id_new"], round(r["jaccard"], 9))
            for r in query_minhash_index(spark, fresh, probe).collect()
        }
        assert got == want, op
        # sigs content (manifest-resolved): exactly the model's ids,
        # no duplicates
        from cae_polars_tools_spark.operators.minhash_index import (
            _dirs,
            _read_sigs,
        )

        r_root, meta = _dirs(spark, root)
        sigs = _read_sigs(spark, r_root, meta)
        ids = [r["doc_id"] for r in sigs.select("doc_id").collect()]
        assert sorted(ids) == sorted(model), op

    for step in range(7):
        op = rng.choice(["append", "ingest", "delete", "compact", "vacuum"])
        if op == "append":
            docs = [mk_doc(next_id + j) for j in range(3)]
            next_id += 3
            for d in docs:
                model[d[0]] = d
            append_minhash_index(
                spark, root, spark.createDataFrame(docs, SCHEMA)
            )
        elif op == "ingest":
            docs = [mk_doc(next_id + j) for j in range(2)]
            next_id += 2
            for d in docs:
                model[d[0]] = d
            bdf = spark.createDataFrame(docs, SCHEMA)
            sink(bdf, step)
            sink(bdf, step)  # redelivery: must be a no-op
        elif op == "delete":
            victims = rng.sample(sorted(model), k=min(2, len(model)))
            for v in victims:
                model.pop(v)
            delete_minhash_index(
                spark, root, f"doc_id IN ({','.join(map(str, victims))})"
            )
        elif op == "compact":
            compact_minhash_index(spark, root)
        else:
            vacuum_minhash_index(root)
        check(op)


def test_stream_indexed_all_duplicate_batch_is_noop(spark, tmp_path):
    """A micro-batch whose every doc duplicates the index must write
    nothing anywhere: no survivors-table rows, no index growth — the
    zero-survivors early return after the dedup, not a crash."""
    from cae_polars_tools_spark.operators.minhash_index import (
        dedup_stream_indexed,
    )

    hist = _docs(spark).filter(~F.expr(_PRED))
    root = str(tmp_path / "idx")
    surv = str(tmp_path / "surv")
    build_minhash_index(hist, root)
    n0 = spark.read.parquet(f"{root}/sigs_v0").count()
    # batch = exact copies of indexed docs under new ids
    dup_batch = hist.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
    )
    sink = dedup_stream_indexed(root, surv)
    sink(dup_batch, 0)
    import os

    assert not os.path.exists(surv)
    assert spark.read.parquet(f"{root}/sigs_v0").count() == n0


def test_index_delete_commits_only_rewritten_files(spark, tmp_path):
    """Manifest pin for the index CoW verbs (the round-12 verdict's
    task #2): a takedown delete writes ONLY the files that contained
    the victim; every untouched segment is re-referenced by the new
    generation's manifest — zero copied files, original inodes
    untouched — and probe answers still match a fresh rebuild."""
    import os as _os

    from cae_polars_tools_spark.manifest import load_manifest
    from cae_polars_tools_spark.operators.minhash_index import (
        describe_minhash_index_history,
        load_minhash_meta,
    )
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    from cae_polars_tools_spark.operators.minhash_index import (
        append_minhash_index,
    )

    root = str(tmp_path / "idx")
    hist = _docs(spark).filter(~F.expr(_PRED))
    build_minhash_index(hist, root)
    # a second sigs segment via append, then delete FROM that segment:
    # the original build segment must come through by reference
    append_minhash_index(
        spark,
        root,
        spark.createDataFrame(
            [(900, "appended takedown victim content " * 4, "x")],
            "doc_id long, text string, source string",
        ),
    )

    def inodes(d):
        return {
            _os.path.join(r, f): _os.stat(_os.path.join(r, f)).st_ino
            for r, _dd, fs in _os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        }

    sigs_inodes = inodes(f"{root}/sigs_v0")
    stats = delete_minhash_index(spark, root, "doc_id = 900")
    # only the containing files rewrote; the rest re-referenced. The
    # victim lives in the appended sigs segment only, so the build's
    # segment is untouched; the victim's 32 band rows can touch many
    # band files at this tiny scale, so only the no-copy contract is
    # asserted there.
    for part in ("bands", "sigs"):
        s = stats[part]
        assert s["files_rewritten"] >= 1
        assert "files_copied" not in s
    assert stats["sigs"]["files_rewritten"] == 1
    assert stats["sigs"]["files_referenced"] >= 1
    # no copied- files anywhere in the new generations
    for d in (stats["bands_dir"], stats["sigs_dir"]):
        for r, _dd, fs in _os.walk(f"{root}/{d}"):
            assert not any(f.startswith("copied-") for f in fs)
    # untouched sigs_v0 inodes intact and still referenced
    for f, ino in sigs_inodes.items():
        assert _os.stat(f).st_ino == ino
    store = ByteStore.for_path(root)
    m = load_manifest(store, stats["sigs_dir"])
    assert any(r.startswith("sigs_v0/") for r in m["files"])
    # correctness: probes equal a fresh rebuild without the victim
    fresh = str(tmp_path / "fresh")
    build_minhash_index(hist, fresh)
    assert _query_set(spark, root) == _query_set(spark, fresh)

    # audit trail: build → append → delete, generations advance
    ops = [h["op"] for h in describe_minhash_index_history(root)]
    assert ops == ["build", "append", "delete"]
    gens = [h["generation"] for h in describe_minhash_index_history(root)]
    assert gens == sorted(gens)
    assert load_minhash_meta(root)["generation"] == gens[-1]


def test_index_history_full_lifecycle_chain(spark, tmp_path):
    """describe_minhash_index_history through the whole verb chain —
    build → append → delete → compact → vacuum — with stats per op."""
    from cae_polars_tools_spark.operators.minhash_index import (
        append_minhash_index,
        compact_minhash_index,
        describe_minhash_index_history,
        vacuum_minhash_index,
    )

    root = str(tmp_path / "idx")
    hist = _docs(spark).filter(~F.expr(_PRED))
    build_minhash_index(hist, root)
    batch = spark.createDataFrame(
        [(900, "fresh appended content entirely new " * 4, "x")],
        "doc_id long, text string, source string",
    )
    append_minhash_index(spark, root, batch)
    delete_minhash_index(spark, root, "doc_id = 900")
    compact_minhash_index(spark, root)
    vacuum_minhash_index(root)
    h = describe_minhash_index_history(root)
    assert [r["op"] for r in h] == [
        "build", "append", "delete", "compact", "vacuum"
    ]
    assert h[1]["stats"]["rows_appended"] == 1
    assert h[2]["stats"]["sigs"]["rows_deleted"] == 1
    assert all(r["ts"] is not None for r in h)


def test_index_emptied_by_takedown_stays_operable(spark, tmp_path):
    """Deleting EVERY document from the index must leave it operable:
    a repeat takedown is an idempotent no-op (cascade_delete retries),
    probes return empty instead of erroring, and appends re-populate
    under the same frozen hash family."""
    from cae_polars_tools_spark.operators.minhash_index import (
        append_minhash_index,
    )

    hist = spark.createDataFrame(
        [(1, "some document body text " * 4, "h"),
         (2, "another document body text " * 4, "h")],
        "doc_id long, text string, source string",
    )
    root = str(tmp_path / "idx")
    build_minhash_index(hist, root)
    delete_minhash_index(spark, root, "doc_id IN (1, 2)")

    probe = spark.createDataFrame(
        [(10, "some document body text " * 4, "b")],
        "doc_id long, text string, source string",
    )
    assert query_minhash_index(spark, root, probe).count() == 0

    again = delete_minhash_index(spark, root, "doc_id = 1")
    assert again["sigs"]["rows_deleted"] == 0
    assert again["bands"]["rows_deleted"] == 0

    append_minhash_index(spark, root, hist.filter("doc_id = 1"))
    got = {
        (r["doc_id_hist"], r["doc_id_new"])
        for r in query_minhash_index(spark, root, probe).collect()
    }
    assert got == {(1, 10)}


def test_append_retry_after_crash_before_adopt(spark, tmp_path):
    """An append that crashed BETWEEN segment write and manifest adopt
    leaves unmanifested orphan files. The retry re-appends the same
    docs (the replay guard reads the manifest-resolved sigs and cannot
    see orphans) but delta adoption never folds the orphans in — no
    duplicate band/sigs rows anywhere a reader looks — and the
    vacuum's live-directory sweep reclaims the orphan bytes."""
    from cae_polars_tools_spark.manifest import (
        data_file_refs,
        read_artifact,
        refs_of,
    )
    from cae_polars_tools_spark.operators.minhash_index import (
        minhash_ingest_sink,
        vacuum_minhash_index,
    )
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    hist = _docs(spark).filter(~F.expr(_PRED))
    batch = _docs(spark).filter(F.expr(_PRED))

    root = str(tmp_path / "idx")
    build_minhash_index(hist, root)
    store = ByteStore.for_path(root)
    meta = load_minhash_meta(root)
    dirs = (meta["bands_dir"], meta["sigs_dir"])
    saved = {d: store.get(f"{d}/_MANIFEST.json") for d in dirs}

    append_minhash_index(spark, root, batch)
    # simulate the crash: segment files landed, the adopts did NOT —
    # wind both manifests back to their pre-append state
    for d, raw in saved.items():
        store.put(f"{d}/_MANIFEST.json", raw)

    # replay the trigger through the ingest sink's ID-level guard
    minhash_ingest_sink(root)(batch, batch_id=1)

    sigs = read_artifact(spark, root, meta["sigs_dir"])
    assert (
        sigs.groupBy("doc_id").count().filter("count > 1").count() == 0
    )
    bands = read_artifact(spark, root, meta["bands_dir"])
    assert (
        bands.groupBy("doc_id", "band").count()
        .filter("count > 1").count() == 0
    )

    # results equal a clean build+append (no lost docs either)
    clean = str(tmp_path / "clean")
    build_minhash_index(hist, clean)
    append_minhash_index(spark, clean, batch)
    probe = _docs(spark).filter("doc_id % 3 = 0")
    got = {
        (r["doc_id_hist"], r["doc_id_new"])
        for r in query_minhash_index(spark, root, probe).collect()
    }
    want = {
        (r["doc_id_hist"], r["doc_id_new"])
        for r in query_minhash_index(spark, clean, probe).collect()
    }
    assert got == want

    # the orphans exist physically, are unreferenced, and vacuum's
    # live-dir sweep reclaims them
    orphans = {
        d: set(data_file_refs(store, d)) - set(refs_of(store, d))
        for d in dirs
    }
    assert any(orphans.values())
    vacuum_minhash_index(root)
    for d in dirs:
        assert set(data_file_refs(store, d)) == set(refs_of(store, d))
    # audit trail recorded the sweep
    hist_rec = load_minhash_meta(root)["history"][-1]
    assert hist_rec["op"] == "vacuum"
    assert hist_rec["stats"]["orphans_swept"] == sum(
        len(v) for v in orphans.values()
    )
    # and the healed index still answers correctly
    assert {
        (r["doc_id_hist"], r["doc_id_new"])
        for r in query_minhash_index(spark, root, probe).collect()
    } == want

"""Persisted MinHash-LSH band index: build / append / query / CoW
delete — the lifecycle that makes incremental text near-dup O(batch),
not O(history).

The inline path (``dedup_minhash_lsh`` / ``incremental_dedup``)
recomputes history-side signatures every run; at 100 TB that is a full
history scan per nightly batch. This module persists the two artifacts
a production near-dup pipeline keeps materialized between cycles
(reference parity note: the reference engine has no near-dup surface at
all — this mirrors the repo's own IVF-PQ index lifecycle,
similarity.py:1509-1830, applied to the MinHash family):

* ``bands_v<N>/`` — the LSH band table ``(band, bh, doc_id)``, laid out
  for the probe path: Hive-partitioned by ``shard = pmod(bh, 64)`` (a
  probe's shard set is known driver-side → static partition pruning)
  and range-clustered on ``bh`` within partitions (row-group min/max
  stats prune inside each shard). 24 bytes/row × 32 bands ≈ 1-2% of
  corpus bytes.
* ``sigs_v<N>/`` — per-document verification state ``(doc_id, fp,
  h64)``: the md5 fingerprint (exact dedup anti-joins) and the 64-bit
  shingle-hash set (exact Jaccard of candidates). ~8 B/shingle, the
  same artifact the inline path persists per run.
* ``_INDEX.json`` — format version, LSH geometry echo, current
  ``bands_dir``/``sigs_dir`` pointers (CoW delete flips them LAST, so
  readers never observe a half-deleted index), and the caller's source
  ``fingerprint`` for staleness detection.

Query cost shape: the batch is signed with the index's FROZEN hash
family (the same seeded multiply-shift permutations — appends and
probes must never retrain, exactly like the IVF-PQ frozen-model rule),
its band hashes broadcast against the pruned band-table scan, the few
candidate history docs fetch their shingle sets via a second broadcast
join, and exact Jaccard verifies. The history tables are never
shuffled and never scanned beyond pruning — every wide side of every
join is the (small) batch.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table, spread
from cae_polars_tools_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    SHINGLES_SQL,
    _release_on_gc,
    hashed_shingles,
    minhash_band_hashes,
)
from cae_polars_tools_spark.operators.text import fingerprint
from cae_polars_tools_spark.plans.registry import register

_INDEX_META = "_INDEX.json"

#: Hive partition count for the band table: pmod(bh, SHARDS) is the
#: directory key, so a probe's shard list (known driver-side) prunes
#: whole directories before any data byte is read.
BAND_SHARDS = 64

#: Probe sets larger than this skip the driver-side isin pushdown (the
#: broadcast join still filters map-side); below it, the bh literals
#: land in the scan as row-group-prunable pushed filters.
PROBE_PUSHDOWN_MAX = 20_000

#: Batches at or below this row count broadcast their signed frame
#: (doc_id, fp, h64 — the shingle arrays are the wide part: ~1-2 KB a
#: doc, so 1M docs ≈ low-GB, the sane ceiling for an explicit
#: broadcast hint). Above it the "batch" has outgrown the nightly
#: contract the hints encode, and every batch-derived broadcast hint
#: is dropped: joins become plain shuffles over batch-sized sides and
#: AQE re-broadcasts at runtime whatever actually turns out small.
BATCH_BROADCAST_MAX = 1_000_000


def _signed(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, fp, h64) under the frozen hash family. Docs too short
    to shingle keep their row WITH AN EMPTY h64: they still carry a
    fingerprint the exact-dedup anti-probe must see (the inline
    ``incremental_dedup`` fingerprints ALL history docs — dropping
    them here made short duplicates invisible to exact dedup), while
    the band/near-dup paths ignore them for free (``posexplode`` of
    an empty array emits no band rows, so they are never candidates
    — the same net near-dup behavior as the inline path's filter)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint(text_col).alias("fp"),
        hashed_shingles(text_col).alias("h64"),
    )


def _bands_of(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bh, shard) — one row per (doc, band). Docs with
    empty shingle sets are excluded HERE, not in :func:`_signed`: the
    MinHash kernel maps an empty set to the sentinel signature, so
    without this filter every too-short doc would share one band
    bucket (and a 0/0 Jaccard) with every other."""
    return (
        sigs.filter(F.size("h64") > 0)
        .select(
            "doc_id", F.posexplode(minhash_band_hashes(F.col("h64")))
        )
        .toDF("doc_id", "band", "bh")
        .withColumn("shard", F.pmod(F.col("bh"), F.lit(BAND_SHARDS)))
    )


def build_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: str | None = None,
) -> dict:
    """Sign the corpus once and persist the full index layout under
    ``path`` (see module docstring). The meta pointer is written LAST
    through the ByteStore seam — a half-built index is never observed
    as current. Returns the meta dict."""
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    root = path.rstrip("/")
    store = ByteStore.for_path(root)
    # persist: the signing pipeline (tokenize→shingle→hash pandas UDF,
    # the expensive pass) feeds BOTH table writes — without the cache
    # it would run twice over the full corpus
    sigs = _signed(docs, id_col, text_col).persist()
    try:
        (
            sigs.repartitionByRange(F.col("doc_id"))
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(store.spark_path("sigs_v0"))
        )
        # ONE file per shard, GUARANTEED: hash-clustering on the
        # partition column puts each shard wholly in one writer task.
        # The former range partitioning over (shard, bh) only gave
        # that when no shard straddled a range boundary — a property
        # of the data and the session's shuffle-partition count, not
        # of the layout. The bh sort within each shard's single file
        # keeps the probe's row-group bh stats exactly as selective
        # as the ranged layout did (interleaved A/B at sf0.1: probe
        # medians 3.30 ranged vs 2.79 clustered, builds a tie).
        (
            _bands_of(sigs)
            .repartition(F.col("shard"))
            .sortWithinPartitions("bh", "band")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(store.spark_path("bands_v0"))
        )
    finally:
        sigs.unpersist()
    # manifests make every later delete/compact a metadata-plus-
    # rewritten-files commit (untouched segments re-referenced, never
    # copied) and vacuum reference-counted — manifest.py's model
    from cae_polars_tools_spark.manifest import (
        adopt_dir_files,
        meta_with_history,
    )

    spark = sigs.sparkSession
    n_bands = adopt_dir_files(
        store, "bands_v0", _bands_of(sigs).schema.jsonValue(), spark=spark
    )
    n_sigs = adopt_dir_files(
        store, "sigs_v0", sigs.schema.jsonValue(), spark=spark
    )
    meta = meta_with_history(
        {
            "format": "minhash-lsh-v1",
            "shards": BAND_SHARDS,
            "bands_dir": "bands_v0",
            "sigs_dir": "sigs_v0",
            "fingerprint": fingerprint,
        },
        "build",
        {"bands_files": n_bands, "sigs_files": n_sigs},
    )
    store.put(_INDEX_META, json.dumps(meta).encode())
    return meta


def load_minhash_meta(path: str) -> dict | None:
    """The index's ``_INDEX.json``, or None when ``path`` holds no
    finished index — builders use the ``fingerprint`` field for
    rebuild-if-stale checks."""
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    raw = ByteStore.for_path(path.rstrip("/")).get(_INDEX_META)
    return None if raw is None else json.loads(raw)


def _release_checkpoints(*frames: DataFrame) -> None:
    """Unpersist the RDD blocks behind localCheckpoint()ed frames as
    soon as their trigger's work lands — without this a long-lived
    streaming sink pins one checkpointed batch per trigger until JVM
    RDD GC gets around to it (dedup.py's ``_checkpoint_rdd`` note)."""
    from cae_polars_tools_spark.operators.dedup import (
        _checkpoint_rdd,
        _unpersist_quietly,
    )

    handles = [
        r for f in frames if (r := _checkpoint_rdd(f)) is not None
    ]
    if handles:
        _unpersist_quietly(handles)


def _record_index_op(root: str, op: str, stats: dict) -> None:
    """Append an audit record to the index's meta history with a
    fresh atomic PUT — for verbs that do NOT flip the artifact
    pointers (append, vacuum). Pointer-flipping verbs (delete,
    compact) fold their record into the same PUT as the flip instead,
    so the audit trail can never disagree with the pointer. A crash
    between an append's data commit and this record loses only the
    audit line, never data."""
    from cae_polars_tools_spark.manifest import meta_with_history
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    meta = load_minhash_meta(root)
    if meta is None:
        return
    ByteStore.for_path(root).put(
        _INDEX_META,
        json.dumps(meta_with_history(meta, op, stats)).encode(),
    )


def describe_minhash_index_history(path: str) -> list[dict]:
    """The index's audit trail, oldest first: one ``{op, ts,
    generation, stats}`` record per lifecycle verb (build / append /
    delete / compact / vacuum) — the ``Table.describe_history``
    counterpart for the takedown-audit story the index's CoW deletes
    exist for. Rides inside ``_INDEX.json`` (capped at
    ``manifest.HISTORY_CAP`` records, oldest dropped), so reading it
    is one metadata GET."""
    meta = load_minhash_meta(path)
    if meta is None:
        raise FileNotFoundError(f"no MinHash index under {path}")
    return list(meta.get("history", []))


def _dirs(spark: SparkSession, path: str) -> tuple[str, dict]:
    root = path.rstrip("/")
    meta = load_minhash_meta(root)
    if meta is None:
        raise FileNotFoundError(f"no MinHash index under {path}")
    return root, meta


def _read_bands(spark: SparkSession, root: str, meta: dict):
    """The live bands table, manifest-resolved (after a CoW delete
    its files may span several ``bands_v*`` directories; a legacy
    manifest-less index reads whole-directory)."""
    from cae_polars_tools_spark.manifest import read_artifact

    return read_artifact(spark, root, meta["bands_dir"])


def _read_sigs(spark: SparkSession, root: str, meta: dict):
    from cae_polars_tools_spark.manifest import read_artifact

    return read_artifact(spark, root, meta["sigs_dir"])


def _append_segments(
    spark: SparkSession, root: str, meta: dict, signed: DataFrame
) -> None:
    """Append one signed batch to the live index: band segments first
    (snapshot the directory, write files, adopt EXACTLY the new
    delta), sigs second (same three steps). Delta adoption is the
    crash-orphan discipline: files left by an append that died
    between segment write and adopt are in the retry's PRE-snapshot
    but not its manifest, so the retry never adopts them as fresh
    data — the replay would otherwise commit the same rows twice
    (once from the orphans, once from its own re-write). Orphans stay
    unmanifested — invisible to every reader — until
    :func:`vacuum_minhash_index`'s live-directory sweep reclaims
    them. The bands-before-sigs rule survives manifests: manifested
    band rows whose docs are absent from sigs are invisible to probes
    (the verify join drops them) and the ID-level replay guards heal
    the gap on retry."""
    from cae_polars_tools_spark.manifest import adopt_dir_files, snapshot_dir
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    store = ByteStore.for_path(root)
    bands = _bands_of(signed)
    pre_bands = snapshot_dir(store, meta["bands_dir"])
    # one segment file per touched shard per append (not one per
    # batch partition per shard): file-count growth is what decays
    # scan planning between compactions
    (
        bands.repartition(F.col("shard"))
        .sortWithinPartitions("bh", "band")
        .write.mode("append")
        .partitionBy("shard")
        .parquet(store.spark_path(meta["bands_dir"]))
    )
    adopt_dir_files(
        store, meta["bands_dir"], bands.schema.jsonValue(), pre=pre_bands,
        spark=signed.sparkSession,
    )
    pre_sigs = snapshot_dir(store, meta["sigs_dir"])
    signed.write.mode("append").parquet(store.spark_path(meta["sigs_dir"]))
    adopt_dir_files(
        store, meta["sigs_dir"], signed.schema.jsonValue(), pre=pre_sigs,
        spark=signed.sparkSession,
    )


def append_minhash_index(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    check_unique: bool = True,
    signed: DataFrame | None = None,
) -> dict:
    """Append new documents WITHOUT re-signing history: sign them
    under the frozen hash family and add parquet segments to the live
    ``sigs``/``bands`` directories (each band row lands in its shard's
    partition). Appended files are locally bh-clustered — row-group
    stats stay tight per segment; a periodic full rebuild (or
    ``storage.compact_parquet``) restores the global clustering.

    ``check_unique`` anti-joins new ids against the sigs table — a
    doc_id indexed twice answers every probe twice. Both uniqueness
    checks run on an IDS-ONLY projection of the incoming frame:
    neither needs fingerprints or shingle hashes, so projecting before
    checking keeps the expensive tokenize→shingle→hash signing
    pipeline out of the check actions entirely (signing runs exactly
    once, on the persisted frame below). A caller that already signed
    the docs (``dedup_stream_indexed`` shares one signing between the
    dedup and the append) passes the ``(doc_id, fp, h64)`` frame as
    ``signed`` and no signing happens here at all (cache ownership
    stays with the caller — this function persists only frames it
    signed itself, the ``query_minhash_index`` convention). Returns
    ``{rows_appended}``."""
    root, meta = _dirs(spark, path)
    if check_unique:
        ids = (
            signed.select("doc_id")
            if signed is not None
            else docs.select(F.col(id_col).alias("doc_id"))
        )
        existing = _read_sigs(spark, root, meta).select("doc_id")
        dup = ids.join(existing, "doc_id", "left_semi").limit(1).count()
        if dup:
            raise ValueError(
                "append_minhash_index: new doc_ids collide with ids "
                "already in the index (pass check_unique=False only "
                "if the caller guarantees disjointness)"
            )
        internal = (
            ids.groupBy("doc_id")
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if internal:
            raise ValueError(
                "append_minhash_index: the appended frame itself "
                "carries duplicate doc_ids; dedup it first"
            )
    own_cache = signed is None
    new = (
        _signed(docs, id_col, text_col).persist() if own_cache else signed
    )
    try:
        n = new.count()
        _append_segments(spark, root, meta, new)
    finally:
        if own_cache:
            new.unpersist()
    _record_index_op(root, "append", {"rows_appended": n})
    return {"rows_appended": n}


def minhash_ingest_sink(
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """``writeStream.foreachBatch`` sink maintaining the persisted
    band index from a document stream: each micro-batch signs under
    the index's FROZEN hash family and appends sigs + band segments
    (:func:`append_minhash_index` semantics). Replay safety is
    ID-LEVEL, the ivfpq_ingest_sink rule: the batch dedups within
    itself, then anti-joins ids already in the sigs table — a
    redelivered batch (foreachBatch's at-least-once contract) or a
    crash between segment write and checkpoint commit re-appends
    nothing, making the sink effectively-once for stable doc_ids."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        root, meta = _dirs(spark, path)
        fresh = batch_df.dropDuplicates([id_col]).join(
            _read_sigs(spark, root, meta).select(
                F.col("doc_id").alias(id_col)
            ),
            id_col,
            "left_anti",
        )
        # localCheckpoint, not persist: the plan anti-joins against
        # the sigs table this sink is about to append to, and Spark
        # invalidates cached plans that read a written path — a
        # cache would silently recompute against the UPDATED table
        # (seeing its own output, dropping every row) the moment the
        # first append lands. Checkpointing severs the lineage; its
        # pinned RDD blocks release when the trigger's work is done
        # (a long-lived stream must not accumulate one per trigger).
        new = _signed(fresh, id_col, text_col).localCheckpoint()
        try:
            n = new.count()
            if n == 0:
                return
            # bands BEFORE sigs (see _append_segments): a crash
            # between the writes leaves band rows whose doc is absent
            # from sigs — invisible to probes and HEALED on replay,
            # because replay detection anti-joins on sigs.
            _append_segments(spark, root, meta, new)
            _record_index_op(
                root,
                "append",
                {"rows_appended": n, "batch_id": batch_id},
            )
        finally:
            _release_checkpoints(new)

    return sink


def dedup_stream_indexed(
    index_path: str,
    survivors_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("source",),
    threshold: float = JACCARD_THRESHOLD,
):
    """``writeStream.foreachBatch`` sink closing the continuous-
    ingestion loop the index exists for: each micro-batch is deduped
    against the PERSISTED index — exact by fingerprint, near-dup by
    LSH probe, plus the within-batch pass
    (:func:`incremental_dedup_indexed`) — survivors land in the
    ``survivors_path`` parquet table AND are appended to the index
    (:func:`append_minhash_index` semantics), so the next micro-batch
    dedups against them too. History text is never read and history
    signatures are never recomputed: each trigger costs O(micro-batch).

    Replay safety is ID-LEVEL, the ingest-sink rule, applied at every
    stage so a redelivered batch (foreachBatch's at-least-once
    contract) converges to the exactly-once outcome for stable ids:

    * already-INDEXED ids anti-join away up front — a doc that
      survived last delivery is not re-deduped, re-emitted, or
      re-appended;
    * docs DROPPED last delivery are not in sigs, so they re-run the
      dedup and drop again for the same (now-indexed) winner —
      deterministic, no state needed;
    * the survivors table appends behind its own id anti-join, and is
      written BEFORE the index append: a crash between the two
      re-runs the dedup on replay, skips the already-written survivor
      rows, and completes the missing index append — the opposite
      order would lose survivor rows forever (the index append makes
      the replay guard drop them before they ever reach the table).

    Equivalence with the batch twin (one ``incremental_dedup_indexed``
    over the whole batch + one append) holds when micro-batches arrive
    in ascending ``id_col`` order — the arrival-time order of a real
    ingestion stream; out-of-order delivery keeps the same dedup
    guarantees but may elect a different (earlier-arriving) canonical
    representative, exactly like the inline incremental path run
    nightly."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        root, meta = _dirs(spark, index_path)
        fresh = batch_df.dropDuplicates([id_col]).join(
            _read_sigs(spark, root, meta).select(
                F.col("doc_id").alias(id_col)
            ),
            id_col,
            "left_anti",
        )
        # ONE signing per trigger: the dedup consumes this cache AND
        # the index append reuses the survivors' rows from it — the
        # tokenize→shingle→hash pass never runs twice on a document.
        b = _signed(fresh, id_col, text_col).persist()
        try:
            # checkpoint the SURVIVOR IDS first: the eager
            # localCheckpoint runs the whole dedup DAG exactly once —
            # the two derived frames below then join against the
            # materialized ids instead of re-executing the probe +
            # verify joins (checkpointing them directly ran the DAG
            # twice). The checkpoints also sever every lineage into
            # the sigs table this sink is about to append to (the
            # ingest-sink rule).
            surv_ids = (
                incremental_dedup_indexed(
                    spark,
                    index_path,
                    fresh,
                    threshold=threshold,
                    id_col=id_col,
                    text_col=text_col,
                    keep_cols=(),
                    signed=b,
                )
                .select(F.col("doc_id").alias(id_col))
                .localCheckpoint()
            )
            survivors = (
                fresh.join(F.broadcast(surv_ids), id_col)
                .select(id_col, text_col, *keep_cols)
                .localCheckpoint()
            )
            b_surv = b.join(
                F.broadcast(surv_ids.select(F.col(id_col).alias("doc_id"))),
                "doc_id",
            ).localCheckpoint()
        finally:
            b.unpersist()
        try:
            if survivors.count() == 0:
                return
            # survivors table FIRST (behind its own id anti-join),
            # index append second — see the replay-ordering note
            # above. The history-sized `seen` side carries NO
            # broadcast hint (the BATCH_BROADCAST_MAX rule: only
            # batch-bounded sides get hints) — the survivors table
            # grows for the stream's lifetime, and a forced broadcast
            # of it would eventually slow every trigger and OOM
            # executors; AQE still broadcasts at runtime while it is
            # actually small.
            try:
                seen = spark.read.parquet(survivors_path).select(id_col)
                to_write = survivors.join(seen, id_col, "left_anti")
            except AnalysisException as e:
                # ONLY the missing-path case is "first batch"; any
                # other read failure must propagate so foreachBatch
                # retries — swallowing it would skip the replay
                # anti-join and append duplicates forever.
                if "PATH_NOT_FOUND" not in str(e):
                    raise
                to_write = survivors
            to_write.write.mode("append").parquet(survivors_path)
            # check_unique=False: the up-front sigs anti-join already
            # guarantees disjointness, and the strict check would
            # refuse the partial-replay heal (bands written, sigs
            # not).
            append_minhash_index(
                spark,
                index_path,
                survivors,
                id_col=id_col,
                text_col=text_col,
                check_unique=False,
                signed=b_surv,
            )
        finally:
            # the trigger's checkpointed frames are done — release
            # their pinned RDD blocks now, not at some future JVM GC
            _release_checkpoints(surv_ids, survivors, b_surv)

    return sink


def compact_minhash_index(spark: SparkSession, path: str) -> dict:
    """Restore the index's global clustering after a run of appends:
    appended segments are only LOCALLY bh-clustered, so probe-side
    row-group pruning degrades as segments accumulate. Rewrite both
    tables into new versioned directories — bands range-clustered on
    (shard, bh), sigs on doc_id — then flip the meta pointers LAST
    (readers never observe a half-compacted index). Content is
    unchanged (equivalence-tested); only layout improves."""
    from cae_polars_tools_spark.manifest import (
        adopt_dir_files,
        meta_with_history,
    )
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    root, meta = _dirs(spark, path)
    nxt_bands = _next_dir(meta["bands_dir"], "bands")
    nxt_sigs = _next_dir(meta["sigs_dir"], "sigs")
    # Table._next_version_dir's rule (table.py): a target directory
    # that already exists is a crash orphan from a run that died
    # between version-write and pointer flip — the meta pointer never
    # referenced it, so clear it rather than wedging every retry on
    # errorifexists until a manual vacuum. Single-writer contract, as
    # everywhere in the CoW family (see Table's docstring).
    store = ByteStore.for_path(root)
    for orphan in (nxt_bands, nxt_sigs):
        if store.list_prefix(orphan):
            store.delete_prefix(orphan)
    sigs_rel = _read_sigs(spark, root, meta)
    bands_rel = _read_bands(spark, root, meta)
    (
        sigs_rel.repartitionByRange(F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("errorifexists")
        .parquet(store.spark_path(nxt_sigs))
    )
    (
        bands_rel.repartitionByRange(F.col("shard"), F.col("bh"))
        .sortWithinPartitions("bh", "band")
        .write.mode("errorifexists")
        .partitionBy("shard")
        .parquet(store.spark_path(nxt_bands))
    )
    # a compaction rewrites everything: each new manifest references
    # only its own fresh files, so a later vacuum reclaims every
    # predecessor segment (schemas reuse the rewrite relations — no
    # second manifest resolution/footer pass)
    n_bands = adopt_dir_files(
        store, nxt_bands, bands_rel.schema.jsonValue(), spark=spark
    )
    n_sigs = adopt_dir_files(
        store, nxt_sigs, sigs_rel.schema.jsonValue(), spark=spark
    )
    meta = meta_with_history(
        {**meta, "bands_dir": nxt_bands, "sigs_dir": nxt_sigs},
        "compact",
        {"bands_files": n_bands, "sigs_files": n_sigs},
    )
    store.put(_INDEX_META, json.dumps(meta).encode())
    return {"bands_dir": nxt_bands, "sigs_dir": nxt_sigs}


def _next_dir(cur: str, stem: str) -> str:
    m = re.fullmatch(rf"{stem}_v(\d+)", cur)
    return f"{stem}_v{int(m.group(1)) + 1 if m else 1}"


def vacuum_minhash_index(path: str) -> list[str]:
    """Reference-counted retention for the index's CoW generation
    chain: every ``bands_v*`` / ``sigs_v*`` directory the current
    meta pointer does not reference is a candidate — its files are
    deleted only when the LIVE manifests no longer reference them (a
    CoW delete's new generation shares its untouched segments with
    the old directory, which then parks them as a tombstoned husk
    until a compaction rewrites everything). LIVE directories get an
    orphan sweep too: physical files a crashed append wrote but never
    adopted into the manifest (delta adoption, ``_append_segments``)
    are unreferenced by construction and deleted here — safe under
    the index's single-writer contract (no append can be in flight
    while vacuum runs). Explicit and never automatic (the repo's
    vacuum_versions caveat: only vacuum past your longest reader).
    Returns the names of directories that no longer serve (fully
    removed + demoted husks)."""
    from cae_polars_tools_spark.manifest import refs_of, vacuum_refcount
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    root = path.rstrip("/")
    meta = load_minhash_meta(root)
    if meta is None:
        raise FileNotFoundError(f"no MinHash index under {path}")
    live = {meta["bands_dir"], meta["sigs_dir"]}
    store = ByteStore.for_path(root)
    referenced: set[str] = set()
    for d in live:
        referenced.update(refs_of(store, d))
    candidates = sorted(
        n.rstrip("/")
        for n in store.list_prefix("")
        if re.fullmatch(r"(bands|sigs)_v\d+", n.rstrip("/"))
        and n.rstrip("/") not in live
    )
    stats = vacuum_refcount(store, referenced, candidates)
    orphans = _sweep_live_orphans(store, live, referenced)
    gone = sorted(set(stats["removed"]) | set(stats["demoted"]))
    if gone or stats["files_deleted"] or orphans:
        _record_index_op(
            root,
            "vacuum",
            {
                "retired": gone,
                "files_deleted": stats["files_deleted"],
                "orphans_swept": orphans,
            },
        )
    return gone


def _sweep_live_orphans(store, live_dirs, referenced: set) -> int:
    """Delete unmanifested physical files inside LIVE artifact
    directories — crash leftovers from an append that died between
    segment write and adopt (delta adoption keeps them out of the
    manifest forever, so without this sweep they leak). Only
    manifested directories sweep: in a legacy self-contained dir every
    physical file IS the data. Shared by the MinHash and IVF-PQ
    vacuums. Returns the number of files deleted."""
    from cae_polars_tools_spark.manifest import data_file_stats, load_manifest

    import json as _json

    swept = 0
    for d in sorted(live_dirs):
        raw = store.get(f"{d}/_MANIFEST.json")
        if raw is None:
            continue
        for ref, _sz in data_file_stats(store, d):
            if ref not in referenced:
                store.delete_prefix(ref)
                swept += 1
        # superseded manifest SHARDS are sidecar litter too: every
        # rewrite of a sharded live manifest names a fresh token'd
        # shard set, so strip the shard files the current document
        # does not name (readers holding the superseded document race
        # this exactly like data-file vacuum — the same only-vacuum-
        # past-your-longest-reader caveat applies)
        current_shards = set(_json.loads(raw).get("shards") or [])
        for n in store.list_prefix(d):
            if n.startswith("_MANIFEST-") and n not in current_shards:
                store.delete_prefix(f"{d}/{n}")
                swept += 1
    return swept


def delete_minhash_index(
    spark: SparkSession,
    path: str,
    predicate=None,
    op_stats: dict | None = None,
    doc_ids=None,
) -> dict:
    """Copy-on-write DELETE from the index: rows matching ``predicate``
    (a Column or SQL string over ``doc_id``, e.g. ``"doc_id IN (7)"``)
    are removed from BOTH tables into new versioned directories via
    :func:`storage.delete_parquet` in MANIFEST mode (only files
    containing a match rewrite; untouched segments are re-referenced
    by the new generation's manifest — zero bytes copied), then the
    meta pointer flips LAST with the audit record folded into the
    same PUT. The takedown primitive: removing a document from the
    corpus must remove it from every derived index without re-signing
    either, and at 100 TB without re-copying the index either.
    Returns per-table delete counters plus the new directory names.

    ``doc_ids`` is the takedown fast path: the predicate becomes
    ``doc_id IN (ids)`` and each artifact's affected-file discovery
    is PRUNED by the ids' range against its manifest's per-file
    doc_id stats — the doc_id-clustered sigs table then plans over a
    handful of files (band files spread doc_ids, so they usually all
    stay candidates — conservative, never a silent miss)."""
    from cae_polars_tools_spark.manifest import (
        meta_with_history,
        refs_intersecting,
        refs_of,
        stats_of,
        write_manifest,
    )
    from cae_polars_tools_spark.sources.zarr_format import ByteStore
    from cae_polars_tools_spark.storage import delete_parquet

    if (predicate is None) == (doc_ids is None):
        raise ValueError(
            "delete_minhash_index: pass exactly one of predicate / "
            "doc_ids"
        )
    id_range = None
    if doc_ids is not None:
        from cae_polars_tools_spark.manifest import id_range_of

        predicate = F.col("doc_id").isin(list(doc_ids))
        id_range = id_range_of(doc_ids)
    root, meta = _dirs(spark, path)
    store = ByteStore.for_path(root)

    def _delete_artifact(cur_dir: str, stem: str) -> tuple[dict, str]:
        """Per-artifact CoW delete; an artifact whose manifest is
        already EMPTY (a previous delete-everything — the bands table
        goes empty before sigs, since partitionBy writes zero files
        for an empty frame while the sigs write leaves a 0-row file)
        is an idempotent no-op keeping its current directory:
        takedown retries must never error (cascade_delete re-runs
        after partial failure)."""
        refs = refs_of(store, cur_dir)
        if not refs:
            return (
                {
                    "files_rewritten": 0,
                    "files_referenced": 0,
                    "rows_deleted": 0,
                },
                cur_dir,
            )
        candidates = None
        read_schema = None
        if id_range is not None:
            cstats = stats_of(store, cur_dir)
            if cstats:
                from pyspark.sql.types import StructType

                from cae_polars_tools_spark.manifest import load_manifest

                mdoc = load_manifest(store, cur_dir)
                if mdoc and mdoc.get("schema"):
                    read_schema = StructType.fromJson(mdoc["schema"])
                    candidates = refs_intersecting(
                        cstats, refs, {"doc_id": id_range}
                    )
        nxt = _next_dir(cur_dir, stem)
        stats = delete_parquet(
            spark,
            root,
            predicate,
            f"{root}/{nxt}",
            source_refs=refs,
            copy_untouched=False,
            read_schema=read_schema,
            candidate_refs=candidates,
        )
        from cae_polars_tools_spark.manifest import rewrite_accounting

        # carry the untouched refs' accounting and footer-read the
        # fresh files — a takedown must not discard the stats every
        # LATER pruned takedown depends on
        n_refs, n_sizes, n_rows, n_cstats = rewrite_accounting(
            store, nxt, stats.pop("untouched_refs"), cur_dir, spark=spark
        )
        write_manifest(
            store,
            nxt,
            n_refs,
            stats.pop("schema"),
            sizes=n_sizes,
            rows=n_rows,
            col_stats=n_cstats,
        )
        return stats, nxt

    bands_stats, nxt_bands = _delete_artifact(meta["bands_dir"], "bands")
    sigs_stats, nxt_sigs = _delete_artifact(meta["sigs_dir"], "sigs")
    meta = meta_with_history(
        {**meta, "bands_dir": nxt_bands, "sigs_dir": nxt_sigs},
        "delete",
        {
            "bands": {
                k: v for k, v in bands_stats.items() if k != "schema"
            },
            "sigs": {
                k: v for k, v in sigs_stats.items() if k != "schema"
            },
            # caller context (cascade_delete's takedown_id correlation
            # key) rides in the same audit record as the flip
            **(op_stats or {}),
        },
    )
    store.put(_INDEX_META, json.dumps(meta).encode())
    return {
        "bands": bands_stats,
        "sigs": sigs_stats,
        "bands_dir": nxt_bands,
        "sigs_dir": nxt_sigs,
        # the generation this delete PUBLISHED (pre = generation - 1):
        # cascade_delete stamps both into its cross-artifact manifest
        "generation": meta["generation"],
    }


def query_minhash_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
    signed: DataFrame | None = None,
    broadcast_batch: bool = True,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate (index-doc, batch-doc) pairs at Jaccard ≥
    ``threshold`` — the batch probed against the PERSISTED index, no
    history re-signing anywhere.

    Plan shape (pinned by test_plan_quality): the batch signs itself
    (one pandas-UDF map), its distinct (shard, bh) probe keys collect
    driver-side (bounded: |batch| × 32 bands, capped by
    ``PROBE_PUSHDOWN_MAX``) and prune the band-table scan twice —
    shard list as a static PARTITION filter, bh list as a pushed
    row-group filter — then the batch bands BROADCAST against the
    pruned scan for candidates, candidate history docs fetch their
    shingle sets via a second broadcast semi-probe of the sigs table,
    and exact Jaccard verifies. History tables never shuffle; recall
    matches the inline LSH path exactly (same 32-band geometry, same
    frozen permutations — equivalence-tested).

    Output: ``(doc_id_hist, doc_id_new, jaccard)``. A caller that
    already signed the batch (``incremental_dedup_indexed`` shares one
    signing between the probe and its within-batch pass) passes the
    persisted ``(doc_id, fp, h64)`` frame as ``signed`` and keeps
    ownership of its cache; otherwise the batch signs here.

    ``broadcast_batch=False`` drops every batch-side broadcast hint
    (the :data:`BATCH_BROADCAST_MAX` regime — a "batch" too big to
    ship to every executor): the joins run as plain shuffles over
    batch-bounded sides and AQE broadcasts at runtime whatever is
    actually small. The history tables still never shuffle more than
    their pruned, candidate-matched slices."""
    root, meta = _dirs(spark, path)
    bc = F.broadcast if broadcast_batch else (lambda df: df)
    own_cache = signed is None
    b_sigs = (
        _signed(batch, id_col, text_col).persist()
        if own_cache
        else signed
    )
    # The band frame is read twice below (probe-key collect + the
    # candidate join) and the MinHash kernel — K permutation minima
    # over every shingle, the most expensive per-doc compute in this
    # path — runs inside ``_bands_of``, NOT inside the signed cache.
    # Persist the bands (4 longs × LSH_BANDS per doc — far narrower
    # than the shingle cache) so the kernel runs once per batch; a
    # caller that also bands the batch itself (the within-batch pass
    # of ``incremental_dedup_indexed``) passes its own persisted
    # frame as ``bands`` and keeps ownership.
    own_bands = bands is None
    b_bands_src = _bands_of(b_sigs).persist() if own_bands else bands
    b_bands = b_bands_src.select(
        F.col("doc_id").alias("doc_id_new"), "band", "bh", "shard"
    )

    idx = _read_bands(spark, root, meta)
    probe = (
        b_bands.select("shard", "bh")
        .distinct()
        .limit(PROBE_PUSHDOWN_MAX + 1)
        .collect()
    )
    if len(probe) <= PROBE_PUSHDOWN_MAX:
        shards = sorted({r["shard"] for r in probe})
        bhs = sorted({r["bh"] for r in probe})
        idx = idx.filter(F.col("shard").isin(shards)).filter(
            F.col("bh").isin(bhs)
        )
    else:
        # bh list too wide for a useful pushed filter, but the shard
        # list is ≤ BAND_SHARDS values by construction — ALWAYS
        # collectable, and it still prunes whole Hive partitions out
        # of the scan (marginal when a huge probe touches all shards,
        # free insurance when it doesn't — e.g. a wide probe of
        # near-identical docs whose bands hash into few shards)
        shards = sorted(
            r["shard"]
            for r in b_bands.select("shard").distinct().collect()
        )
        idx = idx.filter(F.col("shard").isin(shards))
    cand = (
        idx.join(bc(b_bands), ["band", "bh"])
        .select(
            F.col("doc_id").alias("doc_id_hist"),
            "doc_id_new",
        )
        .distinct()
    )

    sigs = _read_sigs(spark, root, meta)
    touched = sigs.join(
        bc(cand),
        sigs["doc_id"] == cand["doc_id_hist"],
    ).select(
        "doc_id_hist",
        "doc_id_new",
        F.col("h64").alias("s_hist"),
    )
    out = (
        touched.join(
            bc(
                b_sigs.select(
                    F.col("doc_id").alias("doc_id_new"),
                    F.col("h64").alias("s_new"),
                )
            ),
            "doc_id_new",
        )
        .select(
            "doc_id_hist",
            "doc_id_new",
            (
                F.size(F.array_intersect("s_hist", "s_new")).cast("double")
                / F.size(F.array_union("s_hist", "s_new"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # unpersist the batch signatures/bands when the returned plan
    # handle is dropped — a nightly loop must not accumulate one
    # cached batch per cycle (dedup.py's _release_on_gc convention);
    # caller-owned `signed`/`bands` caches are the caller's to release
    cached = [c for c, own in ((b_sigs, own_cache), (b_bands_src, own_bands)) if own]
    return _release_on_gc(out, *cached) if cached else out


# ---------------------------------------------------------------------------
# Corpus entry: history (src0..src9) builds the persisted index once
# (cached per sf_dir fingerprint under .tmp/), tonight's batch
# (src10..src19) probes it. Mirrors incremental_dedup's batch split.
# ---------------------------------------------------------------------------

_NEW_BATCH_PRED = "source LIKE 'src1_'"

_MINHASH_INDEX_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, {SHINGLES_SQL} AS s FROM documents
    ),
    roles AS (
        SELECT doc_id, (source LIKE 'src1_') AS is_new FROM documents
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    jp AS (
        SELECT p.da, p.db,
               CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS j
        FROM pairs p
        JOIN sizes sa ON p.da = sa.doc_id
        JOIN sizes sb ON p.db = sb.doc_id
        WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter)
              >= {JACCARD_THRESHOLD}
    )
    SELECT CAST(CASE WHEN ra.is_new THEN jp.db ELSE jp.da END
                AS BIGINT) AS doc_id_hist,
           CAST(CASE WHEN ra.is_new THEN jp.da ELSE jp.db END
                AS BIGINT) AS doc_id_new,
           jp.j AS jaccard
    FROM jp
    JOIN roles ra ON jp.da = ra.doc_id
    JOIN roles rb ON jp.db = rb.doc_id
    WHERE ra.is_new <> rb.is_new
"""


def _documents_fingerprint(sf_dir: str) -> str:
    """Cheap staleness key: the documents parquet's file names + sizes
    + mtimes (local test data only — production versions the source
    table explicitly, exactly like the IVF-PQ note)."""
    d = os.path.join(sf_dir, "documents.parquet")
    paths = (
        [d]
        if os.path.isfile(d)
        else [os.path.join(d, f) for f in sorted(os.listdir(d))]
    )
    parts = []
    for p in paths:
        st = os.stat(p)
        parts.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


def _index_root(sf_dir: str) -> str:
    # key the cache on basename + a short hash of the ABSOLUTE path:
    # two corpora named sf0.01 under different parents must not share
    # (and perpetually rebuild) one cached index root
    import hashlib

    ap = os.path.abspath(sf_dir.rstrip("/"))
    base = os.path.basename(ap) or "sf"
    tag = hashlib.md5(ap.encode()).hexdigest()[:8]
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".tmp",
        "minhash_index",
        f"{base}-{tag}",
    )


@register(
    "dedup_minhash_index",
    # miss probability ≈ 1e-10 per true pair (32 bands, same geometry
    # and therefore same recall argument as dedup_minhash_lsh)
    oracle=_MINHASH_INDEX_ORACLE,
    tags=("dedup", "extension", "lsh", "index"),
    window_rank=1,
)
def dedup_minhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup via the PERSISTED MinHash-LSH band index:
    the deduplicated history signs ONCE into the on-disk band + sigs
    tables; tonight's batch probes them — O(batch) work per cycle
    instead of the inline path's O(history) re-signing. The oracle is
    the exact cross-role Jaccard join (candidates ⊇ truth per the LSH
    recall argument; verification is exact), so the hash gate checks
    the full lifecycle: frozen-family signing, shard/bh-pruned probe,
    broadcast candidate joins, exact verify."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    hist = docs.filter(~F.expr(_NEW_BATCH_PRED))
    batch = docs.filter(F.expr(_NEW_BATCH_PRED))
    root = _index_root(sf_dir)
    fp = _documents_fingerprint(sf_dir)
    meta = load_minhash_meta(root)
    if meta is None or meta.get("fingerprint") != fp:
        build_minhash_index(hist, root, fingerprint=fp)
    return query_minhash_index(spark, root, batch)


# ---------------------------------------------------------------------------
# The composition the index exists for: nightly incremental dedup
# where history is the PERSISTED index — O(batch) per cycle.
# ---------------------------------------------------------------------------


def incremental_dedup_indexed(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("source",),
    broadcast_max_rows: int | None = None,
    signed: DataFrame | None = None,
) -> DataFrame:
    """Surviving batch documents after dedup against the PERSISTED
    index and within the batch itself — ``incremental_dedup``'s drop
    rules (dedup.py) with the history side served entirely from the
    index artifacts, so a nightly cycle costs O(batch), never
    O(history):

    * exact — the doc's md5 fingerprint exists in the index's sigs
      table (broadcast-batch anti-probe), or an earlier batch doc
      shares it (min doc_id per fp wins);
    * near-dup — a probe pair (:func:`query_minhash_index`) links the
      doc to ANY indexed doc at Jaccard ≥ ``threshold``, or an
      earlier batch doc does (within-batch pairs from the inline
      banded path over the batch alone — O(batch), and a < b drops b).

    The caller appends the survivors to the index afterwards
    (:func:`append_minhash_index` / the ingest sink) to close the
    loop. History text is never read; history signatures are never
    recomputed — the two costs the inline ``incremental_dedup``
    pays every cycle.

    The batch-side broadcast hints (the signed ``sa``/``sb`` frames
    of the within-batch verify are the heavy ones: full shingle-hash
    arrays) assume the nightly-batch contract. A caller can hand this
    a 50M-doc "batch", so the hints are gated on ``broadcast_max_rows``
    (default :data:`BATCH_BROADCAST_MAX`): above it, every
    batch-derived hint is dropped — within-batch verification joins
    its candidate pairs to the signed cache as plain shuffles (the
    ``jaccard_pairs`` shape) and the probe runs with
    ``broadcast_batch=False`` — leaving AQE to broadcast at runtime
    whatever is actually small. Equivalence across the switch is
    test-pinned; only the physical plan changes."""
    from cae_polars_tools_spark.operators.dedup import bucket_pairs

    root, meta = _dirs(spark, index_path)
    keep = batch.select(F.col(id_col).alias("doc_id"), *keep_cols)
    # ONE signing of the batch (fp + shingle hashes), shared by the
    # exact path, the index probe AND the within-batch pass — the
    # expensive tokenize→shingle→hash pipeline runs once, not three
    # times, and one cache serves every consumer. A caller that needs
    # the signatures AFTERWARDS (the streaming sink appends survivors
    # to the index) passes its own persisted frame as ``signed`` and
    # keeps ownership of the cache.
    own_cache = signed is None
    b = (
        _signed(batch, id_col, text_col).persist()
        if own_cache
        else signed
    )
    # The size probe doubles as the cache materializer (it is the
    # first action and scans every partition), so the regime check
    # costs one cached count — the later probe-key collect and every
    # other consumer read the populated cache.
    cap = BATCH_BROADCAST_MAX if broadcast_max_rows is None else broadcast_max_rows
    small_batch = b.count() <= cap
    bc = F.broadcast if small_batch else (lambda df: df)

    # exact: history wins, then first-in-batch wins. A plain
    # batch-LEFT-ANTI-history join can only broadcast the RIGHT side
    # (the huge one), so invert it: semi-probe the sigs fp column with
    # the BROADCAST batch fps (history scans map-side, never
    # shuffles; the matches are ⊆ batch fps, so they broadcast back)
    batch_fps = b.select("fp").distinct()
    matched = (
        _read_sigs(spark, root, meta)
        .select("fp")
        .join(bc(batch_fps), "fp", "left_semi")
        .distinct()
    )
    no_hist = b.join(bc(matched), "fp", "left_anti")
    first = no_hist.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    exact_kept = (
        no_hist.join(bc(first), "fp")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .join(bc(keep), "doc_id")
        .select("doc_id", *keep_cols)
    )

    # ONE banding of the batch (the MinHash kernel — K permutation
    # minima per doc — lives in _bands_of, not in the signed cache),
    # shared by the index probe's two band reads AND the within-batch
    # candidate pass: three kernel runs become one. Narrow cache
    # (4 longs × LSH_BANDS per doc); released with the output below.
    b_bands = _bands_of(b).persist()
    # near-dup vs the index: probe pairs drop the batch side
    probe = query_minhash_index(
        spark, index_path, batch, threshold=threshold,
        id_col=id_col, text_col=text_col, signed=b,
        broadcast_batch=small_batch, bands=b_bands,
    ).select(F.col("doc_id_new").alias("doc_id"))
    # near-dup within the batch: the inline banded path's candidate +
    # verify stages, fed from the SAME signed cache (a < b drops b)
    cands = bucket_pairs(
        b_bands.select("doc_id", "band", "bh"), ["band", "bh"]
    )
    sa = b.select(F.col("doc_id").alias("doc_id_a"), F.col("h64").alias("s_a"))
    sb = b.select(F.col("doc_id").alias("doc_id_b"), F.col("h64").alias("s_b"))
    within = (
        cands.join(bc(sa), "doc_id_a")
        .join(bc(sb), "doc_id_b")
        .filter(
            F.size(F.array_intersect("s_a", "s_b")).cast("double")
            / F.size(F.array_union("s_a", "s_b"))
            >= threshold
        )
        .select(F.col("doc_id_b").alias("doc_id"))
    )
    # bounded by the batch's near-dup degree — broadcast, so the
    # final anti-join never shuffles the survivors
    dropped = probe.unionByName(within).distinct()
    out = exact_kept.join(bc(dropped), "doc_id", "left_anti")
    return (
        _release_on_gc(out, b, b_bands)
        if own_cache
        else _release_on_gc(out, b_bands)
    )


_INDEXED_INCREMENTAL_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, {{shingles}} AS s FROM documents
    ),
    fps AS (
        SELECT doc_id, source, {{fp}} AS fp FROM documents
    ),
    newb AS (SELECT * FROM fps WHERE {_NEW_BATCH_PRED}),
    hist AS (SELECT * FROM fps WHERE NOT ({_NEW_BATCH_PRED})),
    exact_kept AS (
        SELECT n.doc_id, n.source FROM newb n
        WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = n.fp)
          AND n.doc_id = (SELECT MIN(m.doc_id) FROM newb m
                          WHERE m.fp = n.fp)
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    jp AS (
        SELECT p.da, p.db
        FROM pairs p
        JOIN sizes sa ON p.da = sa.doc_id
        JOIN sizes sb ON p.db = sb.doc_id
        WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter)
              >= {JACCARD_THRESHOLD}
    ),
    near_dropped AS (
        SELECT db AS doc_id FROM jp
        WHERE da IN (SELECT doc_id FROM hist)
          AND db IN (SELECT doc_id FROM newb)
        UNION
        SELECT da FROM jp
        WHERE db IN (SELECT doc_id FROM hist)
          AND da IN (SELECT doc_id FROM newb)
        UNION
        SELECT db FROM jp
        WHERE da IN (SELECT doc_id FROM newb)
          AND db IN (SELECT doc_id FROM newb)
    )
    SELECT doc_id, source FROM exact_kept
    WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped)
"""


def _indexed_incremental_oracle() -> str:
    from cae_polars_tools_spark.operators.dedup import SHINGLES_SQL
    from cae_polars_tools_spark.operators.text import FINGERPRINT_SQL

    return _INDEXED_INCREMENTAL_ORACLE.format(
        shingles=SHINGLES_SQL, fp=FINGERPRINT_SQL
    )


@register(
    "dedup_incremental_indexed",
    # exact cross/within-role Jaccard + fingerprint recompute; LSH
    # recall argument identical to dedup_minhash_index
    oracle=_indexed_incremental_oracle(),
    tags=("dedup", "extension", "lsh", "index", "incremental"),
    window_rank=1,
)
def dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The loop the index closes: tonight's batch deduped against the
    PERSISTED history index — exact by fingerprint anti-probe,
    near-dup by LSH probe pairs plus the within-batch banded path —
    with history text never read and history signatures never
    recomputed (the inline ``dedup_incremental``'s O(history) costs).
    The oracle recomputes fingerprints and the exact uncapped Jaccard
    cascade in SQL, so the composed drop rules are value-checked end
    to end."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    hist = docs.filter(~F.expr(_NEW_BATCH_PRED))
    batch = docs.filter(F.expr(_NEW_BATCH_PRED))
    root = _index_root(sf_dir)
    fp = _documents_fingerprint(sf_dir)
    meta = load_minhash_meta(root)
    if meta is None or meta.get("fingerprint") != fp:
        build_minhash_index(hist, root, fingerprint=fp)
    return incremental_dedup_indexed(spark, root, batch)

"""cascade_delete: one takedown request purges the base Table AND
every derived index, no read/probe/query path surfaces the doc
afterwards, and a failing artifact doesn't stop the others."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.operators.minhash_index import (
    build_minhash_index,
    query_minhash_index,
)
from cae_polars_tools_spark.operators.similarity import (
    EMBED_DIM,
    build_ivfpq_index,
    query_ivfpq_index,
)
from cae_polars_tools_spark.table import Table
from cae_polars_tools_spark.takedown import cascade_delete

VICTIM = 7


def _seed(spark, tmp_path):
    """Base table + MinHash index + IVF-PQ index, all containing the
    victim doc. Returns (table_root, mh_root, pq_root, docs, emb)."""
    docs = spark.createDataFrame(
        [
            (
                i,
                f"document number {i} with shared words " * 3
                + f"unique tail {i}",
                "corpus",
            )
            for i in range(40)
        ],
        "doc_id long, text string, source string",
    )
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(64, EMBED_DIM))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(64)],
        f"vec_id long, embedding array<double>",
    )
    table_root = str(tmp_path / "corpus")
    mh_root = str(tmp_path / "mh")
    pq_root = str(tmp_path / "pq")
    Table.create(spark, table_root, docs)
    build_minhash_index(docs, mh_root)
    build_ivfpq_index(emb, pq_root)
    return table_root, mh_root, pq_root, docs, emb


def test_cascade_purges_every_surface(spark, tmp_path):
    table_root, mh_root, pq_root, docs, emb = _seed(spark, tmp_path)

    # pre-delete: every surface serves the victim
    assert (
        Table(spark, table_root)
        .current()
        .filter(F.col("doc_id") == VICTIM)
        .count()
        == 1
    )
    near_dup = docs.filter(F.col("doc_id") == VICTIM).select(
        F.lit(999).alias("doc_id"), "text", "source"
    )
    probe = query_minhash_index(spark, mh_root, near_dup)
    assert {r["doc_id_hist"] for r in probe.collect()} == {VICTIM}
    q = emb.filter(F.col("vec_id") == VICTIM).select(
        F.lit(999).cast("long").alias("vec_id"), "embedding"
    )
    ann = query_ivfpq_index(spark, pq_root, q, k=3)
    assert VICTIM in {r["neighbor_id"] for r in ann.collect()}

    manifest = cascade_delete(
        spark,
        [VICTIM],
        table_root=table_root,
        minhash_index_paths=(mh_root,),
        ivfpq_index_paths=(pq_root,),
    )
    assert manifest["table"]["rows_deleted"] == 1
    assert manifest["minhash"][0]["sigs"]["rows_deleted"] == 1
    assert manifest["ivfpq"][0]["rows_deleted"] == 1
    assert len(manifest["vacuum_pending"]) == 3

    # post-delete: NO surface can produce the victim
    assert (
        Table(spark, table_root)
        .current()
        .filter(F.col("doc_id") == VICTIM)
        .count()
        == 0
    )
    assert (
        query_minhash_index(spark, mh_root, near_dup)
        .filter(F.col("doc_id_hist") == VICTIM)
        .count()
        == 0
    )
    ann = query_ivfpq_index(spark, pq_root, q, k=3)
    assert VICTIM not in {r["neighbor_id"] for r in ann.collect()}
    # the other docs still answer (the purge was surgical)
    assert ann.count() == 3

    # idempotent: re-running purges zero rows, raises nothing
    again = cascade_delete(
        spark,
        [VICTIM],
        table_root=table_root,
        minhash_index_paths=(mh_root,),
        ivfpq_index_paths=(pq_root,),
    )
    assert again["table"]["rows_deleted"] == 0
    assert again["minhash"][0]["sigs"]["rows_deleted"] == 0
    assert again["ivfpq"][0]["rows_deleted"] == 0


def test_cascade_partial_failure_still_purges_the_rest(spark, tmp_path):
    """A wedged artifact (here: a missing index path) must not leave
    the OTHER indexes serving the doc — the cascade continues, then
    raises with the partial manifest attached."""
    table_root, mh_root, pq_root, _, _ = _seed(spark, tmp_path)
    with pytest.raises(RuntimeError, match="some artifacts failed") as ei:
        cascade_delete(
            spark,
            [VICTIM],
            table_root=table_root,
            minhash_index_paths=(str(tmp_path / "nope"), mh_root),
            ivfpq_index_paths=(pq_root,),
        )
    manifest = ei.value.args[1]
    assert manifest["table"]["rows_deleted"] == 1
    # the GOOD minhash index and the ivfpq index were still purged
    assert [m["path"] for m in manifest["minhash"]] == [mh_root]
    assert manifest["minhash"][0]["sigs"]["rows_deleted"] == 1
    assert manifest["ivfpq"][0]["rows_deleted"] == 1


def test_cascade_refuses_empty_and_oversized(spark, tmp_path):
    with pytest.raises(ValueError, match="no doc_ids"):
        cascade_delete(spark, [], table_root=str(tmp_path / "t"))
    with pytest.raises(ValueError, match="MAX_TAKEDOWN_IDS"):
        cascade_delete(
            spark,
            range(100_001),
            table_root=str(tmp_path / "t"),
        )
    with pytest.raises(ValueError, match="nothing to purge"):
        cascade_delete(spark, [1])


def test_cascade_stamps_correlation_id_into_every_history(spark, tmp_path):
    """One takedown request is traceable END-TO-END: the cascade's
    ``takedown_id`` appears in the Table version's commit record AND
    in both indexes' history entries — the audit walk ``cli history``
    exposes — and a retry passing the same id correlates its no-op
    versions with the original request."""
    from cae_polars_tools_spark.operators.minhash_index import (
        describe_minhash_index_history,
    )
    from cae_polars_tools_spark.operators.similarity import (
        describe_ivfpq_index_history,
    )

    table_root, mh_root, pq_root, docs, emb = _seed(spark, tmp_path)
    manifest = cascade_delete(
        spark,
        [VICTIM],
        table_root=table_root,
        minhash_index_paths=(mh_root,),
        ivfpq_index_paths=(pq_root,),
    )
    tdid = manifest["takedown_id"]
    assert tdid

    def _delete_records(history):
        return [h for h in history if h["op"] == "delete"]

    t_rec = _delete_records(Table(spark, table_root).describe_history())
    mh_rec = _delete_records(describe_minhash_index_history(mh_root))
    pq_rec = _delete_records(describe_ivfpq_index_history(pq_root))
    assert t_rec and mh_rec and pq_rec
    for rec in (t_rec[-1], mh_rec[-1], pq_rec[-1]):
        assert rec["stats"]["takedown_id"] == tdid
        assert rec["stats"]["takedown_ids_count"] == 1

    # retry with the SAME id (the partial-failure protocol): the
    # idempotent no-op versions carry the original correlation key
    again = cascade_delete(
        spark,
        [VICTIM],
        table_root=table_root,
        minhash_index_paths=(mh_root,),
        ivfpq_index_paths=(pq_root,),
        takedown_id=tdid,
    )
    assert again["takedown_id"] == tdid
    t2 = _delete_records(Table(spark, table_root).describe_history())
    assert len(t2) == len(t_rec) + 1
    assert t2[-1]["stats"]["takedown_id"] == tdid


def test_index_takedowns_prune_discovery_by_id_stats(spark, tmp_path):
    """The takedown fast path: delete_minhash_index(doc_ids=…) /
    delete_ivfpq_index(vec_ids=…) prune the affected-file discovery
    by the ids' range against the manifest's per-file id stats — the
    doc_id-clustered sigs table plans over a strict subset of its
    files — with results identical to the predicate path."""
    from cae_polars_tools_spark.operators.minhash_index import (
        delete_minhash_index,
        load_minhash_meta,
    )
    from cae_polars_tools_spark.operators.similarity import (
        delete_ivfpq_index,
        load_ivfpq_meta,
    )

    table_root, mh_root, pq_root, docs, emb = _seed(spark, tmp_path)
    mh_meta = load_minhash_meta(mh_root)
    stats = delete_minhash_index(spark, mh_root, doc_ids=[VICTIM])
    # the pruned-discovery path engaged (files_candidates reported;
    # this tiny index holds one sigs file, so the subset is 1-of-1 —
    # the strict-subset claim is pinned on a multi-file table in
    # test_table_scale_meta)
    sigs = stats["sigs"]
    assert "files_candidates" in sigs
    assert sigs["files_candidates"] <= (
        sigs["files_rewritten"] + sigs["files_referenced"]
    )
    assert sigs["rows_deleted"] == 1

    pq_stats = delete_ivfpq_index(spark, pq_root, vec_ids=[VICTIM])
    assert "files_candidates" in pq_stats
    assert pq_stats["rows_deleted"] == 1

    # exactly-one-of contract
    with pytest.raises(ValueError, match="exactly one"):
        delete_minhash_index(spark, mh_root)
    with pytest.raises(ValueError, match="exactly one"):
        delete_ivfpq_index(
            spark, pq_root, "vec_id = 1", vec_ids=[1]
        )


def test_cascade_manifest_records_pre_post_versions(spark, tmp_path):
    """Round-15 read-ordering contract (takedown.py module docs): the
    manifest names every flip the cascade performed — table
    pre/post_version, index pre_generation/generation — and those
    numbers agree with what the artifacts themselves report, so a
    consistent-view consumer can verify 'table >= post_version AND
    index >= generation' after the fact."""
    from cae_polars_tools_spark.operators.minhash_index import (
        load_minhash_meta,
    )
    from cae_polars_tools_spark.operators.similarity import (
        load_ivfpq_meta,
    )

    table_root, mh_root, pq_root, docs, emb = _seed(spark, tmp_path)
    t_pre = Table(spark, table_root).version()
    mh_pre = load_minhash_meta(mh_root)["generation"]
    pq_pre = load_ivfpq_meta(pq_root)["generation"]

    man = cascade_delete(
        spark,
        [VICTIM],
        table_root=table_root,
        minhash_index_paths=(mh_root,),
        ivfpq_index_paths=(pq_root,),
        takedown_id="case-r15",
    )
    assert man["table"]["pre_version"] == t_pre
    assert man["table"]["post_version"] == t_pre + 1
    assert Table(spark, table_root).version() == man["table"]["post_version"]
    (mh,) = man["minhash"]
    assert mh["pre_generation"] == mh_pre
    assert mh["generation"] == mh_pre + 1
    assert load_minhash_meta(mh_root)["generation"] == mh["generation"]
    (pq,) = man["ivfpq"]
    assert pq["pre_generation"] == pq_pre
    assert pq["generation"] == pq_pre + 1
    assert load_ivfpq_meta(pq_root)["generation"] == pq["generation"]


def test_cascade_intermediate_state_is_the_safe_direction(
    spark, tmp_path, monkeypatch
):
    """Pin the documented intermediate state: with the base table
    purged but the MinHash index NOT yet flipped (cascade interrupted
    between the two), the index still returns the victim as a hit —
    the designed, bounded inconsistency — and that hit dereferences
    to NOTHING in the table (the safe direction: no text is
    servable). A retried cascade with the same takedown_id then
    converges every artifact."""
    import cae_polars_tools_spark.takedown as td

    table_root, mh_root, pq_root, docs, emb = _seed(spark, tmp_path)

    # interrupt the cascade AFTER the table purge, BEFORE the index
    def boom(*a, **k):
        raise RuntimeError("index wedged")

    monkeypatch.setattr(
        "cae_polars_tools_spark.operators.minhash_index."
        "delete_minhash_index",
        boom,
    )
    with pytest.raises(RuntimeError) as exc:
        cascade_delete(
            spark,
            [VICTIM],
            table_root=table_root,
            minhash_index_paths=(mh_root,),
            takedown_id="case-interrupt",
        )
    partial = exc.value.args[1]
    assert partial["table"] is not None  # the table DID purge
    assert partial["minhash"] == []  # the index did not

    # the documented intermediate state: index still hits the victim…
    probe = docs.filter(F.col("doc_id") == VICTIM).withColumn(
        "doc_id", F.lit(999).cast("long")
    )
    hits = {
        r["doc_id_hist"]
        for r in query_minhash_index(spark, mh_root, probe).collect()
    }
    assert VICTIM in hits
    # …but the hit dereferences to nothing — no text is servable
    assert (
        Table(spark, table_root)
        .current()
        .filter(F.col("doc_id") == VICTIM)
        .count()
        == 0
    )

    # retry (same takedown_id) converges: idempotent on the table,
    # effective on the index
    monkeypatch.undo()
    man = cascade_delete(
        spark,
        [VICTIM],
        table_root=table_root,
        minhash_index_paths=(mh_root,),
        takedown_id="case-interrupt",
    )
    assert man["table"]["rows_deleted"] == 0  # already purged
    hits_after = {
        r["doc_id_hist"]
        for r in query_minhash_index(spark, mh_root, probe).collect()
    }
    assert VICTIM not in hits_after


def test_cascade_retry_on_fully_emptied_index(spark, tmp_path):
    """Review fix: a cascade retried against an IVF-PQ index a prior
    delete fully EMPTIED must stay the documented idempotent no-op —
    the empty-path return now carries the published generation (a
    KeyError there aborted the cascade outside its per-artifact error
    wrapper) and still lands the takedown_id in history."""
    from cae_polars_tools_spark.operators.similarity import (
        delete_ivfpq_index,
        load_ivfpq_meta,
    )

    table_root, mh_root, pq_root, docs, emb = _seed(spark, tmp_path)
    # empty the codes table completely
    delete_ivfpq_index(spark, pq_root, predicate="vec_id >= 0")
    gen_before = load_ivfpq_meta(pq_root)["generation"]

    man = cascade_delete(
        spark,
        [VICTIM],
        ivfpq_index_paths=(pq_root,),
        takedown_id="case-empty-retry",
    )
    (pq,) = man["ivfpq"]
    assert pq["rows_deleted"] == 0
    assert pq["generation"] == gen_before + 1
    assert pq["pre_generation"] == gen_before
    hist = load_ivfpq_meta(pq_root)["history"]
    assert hist[-1]["stats"]["takedown_id"] == "case-empty-retry"

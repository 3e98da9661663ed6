"""``cascade_delete`` — the right-to-be-forgotten verb ACROSS
artifacts: a takedown request names document ids, but the ids live in
more than one place — the base corpus table AND every index derived
from it (MinHash band/sigs tables, IVF-PQ codes). Each artifact
already has its own copy-on-write delete (``Table.delete``,
``delete_minhash_index``, ``delete_ivfpq_index``); this composes them
under one call with one manifest, so a purge can be audited and — when
an artifact fails mid-cascade — retried.

Ordering and atomicity contract ("atomic-enough"):

* the BASE TABLE purges first — it is the ground truth every index can
  be rebuilt from, so after any partial failure the invariant "no
  artifact contains a doc the base table lacks a reason to contain"
  re-establishes by simply re-running the cascade;
* derived indexes purge next, each as its own pointer-flip CoW delete
  (readers of any single artifact never observe a torn state);
* a failing artifact does NOT halt the cascade — the remaining
  indexes still purge (one wedged index must not leave the others
  serving the document) — and the error surfaces at the end with the
  manifest of everything that DID purge;
* re-running the same cascade is idempotent: deleting already-absent
  ids is a zero-row CoW version per artifact.

**Read-ordering contract (the documented intermediate state).** The
cascade is NOT one cross-artifact transaction: each artifact flips its
own pointer atomically, in the order above. Between the base table's
flip and a derived index's flip, a reader that consults both can
observe the document GONE from the table but still RETRIEVABLE from
that index — that is the designed intermediate state, bounded by the
cascade's runtime, and it is the safe direction: an index hit whose
document the table no longer serves dereferences to nothing (every
retrieval path in this repo joins index hits back to their source
rows — ``query_minhash_index`` verifies against sigs+corpus,
``ann_*`` re-ranks against stored vectors), whereas the opposite order
could serve a purged document through a stale table from a fresh
index. Consumers that require a consistent cross-artifact view must
pin BOTH versions before reading: the returned manifest (and each
artifact's own history, via the shared ``takedown_id``) records the
``pre_version``/``post_version`` (Table) and ``pre_generation``/
``generation`` (indexes) of every flip, so "read table ≥
post_version with index ≥ generation" is checkable after the fact.
``tests/test_takedown.py`` pins these semantics.

Old CoW generations still hold the purged bytes until retention runs —
a complete takedown ends with ``Table.vacuum`` /
``vacuum_minhash_index`` / ``vacuum_ivfpq_index``, which the
manifest's ``vacuum_pending`` list spells out per artifact.

Scope: the cascade covers every persisted artifact that serves
PER-DOCUMENT rows — the base table's text, the MinHash index's
fingerprints/shingle-hash sets/band rows, the IVF-PQ index's encoded
vectors. The repo's other persisted artifacts are deliberately out of
scope because they hold no per-document state to purge: span-candidate
segments store ``(window-hash, document-frequency)`` partials (counts,
not content — and their finalize pass joins the live corpus, so purged
docs drop out of results automatically), and sketch segments store
mergeable aggregate registers. If a future artifact persists doc-keyed
rows, give it a CoW delete verb and register it here.

No reference counterpart (the reference engine has no mutation surface
at all); this is the operational closure of the repo's own lakehouse +
index lifecycle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: cascade_delete inlines the ids as one IN-list predicate per
#: artifact (the takedown shape: a handful to a few thousand ids named
#: by a legal/ops request). Larger purges are bulk data management,
#: not takedown — run the per-artifact deletes with a real predicate
#: (e.g. a partition-column filter) instead of a driver-side literal.
MAX_TAKEDOWN_IDS = 100_000


def cascade_delete(
    spark: SparkSession,
    doc_ids,
    table_root: str | None = None,
    minhash_index_paths: tuple = (),
    ivfpq_index_paths: tuple = (),
    table_id_col: str = "doc_id",
    takedown_id: str | None = None,
) -> dict:
    """Purge ``doc_ids`` from the base :class:`~cae_polars_tools_spark
    .table.Table` at ``table_root`` (first) and from every listed
    MinHash / IVF-PQ index (each a pointer-flip CoW delete). Returns a
    manifest::

        {"doc_ids": [...],
         "takedown_id": "...",
         "table": {root, pre_version, post_version, **delete stats}
                  | None,
         "minhash": [{path, pre_generation, generation, **stats}, ...],
         "ivfpq":   [{path, pre_generation, generation, **stats}, ...],
         "vacuum_pending": [...]}

    The per-artifact pre/post versions make the module-level
    read-ordering contract auditable: they name exactly which flips
    this cascade performed, so a consumer needing a consistent
    cross-artifact view can check "table ≥ post_version AND index ≥
    generation" (and the same numbers appear in each artifact's own
    history under the shared ``takedown_id``).

    Raises ``RuntimeError`` at the END if any artifact failed, with
    the partial manifest in ``exc.args[1]`` — everything else was
    still purged, and re-running the cascade is idempotent. The ids
    are inlined as an ``IN`` predicate (≤ :data:`MAX_TAKEDOWN_IDS`,
    checked) so each artifact's delete prunes files/partitions by
    min/max stats on its id column.

    ``takedown_id`` (default: a fresh random token) is stamped into
    EVERY artifact's own commit history record — the Table version's
    ``_COMMIT.json`` and each index's ``_INDEX.json`` history entry —
    so one legal/ops request is traceable end-to-end: ``cli history
    <artifact>`` on any of them shows which cascade deleted what, and
    a retried cascade passes the SAME id so its per-artifact no-op
    versions correlate with the original request."""
    import uuid
    from cae_polars_tools_spark.operators.minhash_index import (
        delete_minhash_index,
    )
    from cae_polars_tools_spark.operators.similarity import (
        delete_ivfpq_index,
    )
    from cae_polars_tools_spark.table import Table

    ids = sorted(set(doc_ids))
    if not ids:
        raise ValueError("cascade_delete: no doc_ids given")
    if len(ids) > MAX_TAKEDOWN_IDS:
        raise ValueError(
            f"cascade_delete: {len(ids)} ids exceeds "
            f"MAX_TAKEDOWN_IDS={MAX_TAKEDOWN_IDS} — a purge this large "
            "is bulk data management; run the per-artifact deletes "
            "with a real predicate instead of a literal id list"
        )
    if table_root is None and not minhash_index_paths and not ivfpq_index_paths:
        raise ValueError("cascade_delete: nothing to purge from")
    tdid = takedown_id or uuid.uuid4().hex[:16]
    correl = {"takedown_id": tdid, "takedown_ids_count": len(ids)}

    manifest: dict = {
        "doc_ids": ids,
        "takedown_id": tdid,
        "table": None,
        "minhash": [],
        "ivfpq": [],
        "vacuum_pending": [],
    }
    errors: list[str] = []

    def _step(label: str, fn):
        try:
            return fn()
        except Exception as exc:  # keep purging the other artifacts
            errors.append(f"{label}: {exc}")
            return None

    # base table FIRST — ground truth, see the module contract
    if table_root is not None:
        # delete_keys prunes the affected-file discovery by the ids'
        # range against the manifest's per-file stats — a takedown of
        # a handful of ids plans over a handful of files, not the table
        stats = _step(
            f"table {table_root}",
            lambda: Table(spark, table_root).delete_keys(
                table_id_col, ids, op_stats=correl
            ),
        )
        if stats is not None:
            manifest["table"] = {
                "root": table_root,
                # versions are linear: the delete committed version N
                # against N-1 — the pair a consistent-view consumer
                # checks against (module read-ordering contract)
                "pre_version": stats["version"] - 1,
                "post_version": stats["version"],
                **stats,
            }
            manifest["vacuum_pending"].append(
                f"Table({table_root}).vacuum()"
            )
    for p in minhash_index_paths:
        stats = _step(
            f"minhash index {p}",
            lambda p=p: delete_minhash_index(
                spark, p, doc_ids=ids, op_stats=correl
            ),
        )
        if stats is not None:
            manifest["minhash"].append({
                "path": p,
                "pre_generation": stats["generation"] - 1,
                **stats,
            })
            manifest["vacuum_pending"].append(
                f"vacuum_minhash_index({p!r})"
            )
    for p in ivfpq_index_paths:
        stats = _step(
            f"ivfpq index {p}",
            lambda p=p: delete_ivfpq_index(
                spark, p, vec_ids=ids, op_stats=correl
            ),
        )
        if stats is not None:
            manifest["ivfpq"].append({
                "path": p,
                "pre_generation": stats["generation"] - 1,
                **stats,
            })
            manifest["vacuum_pending"].append(
                f"vacuum_ivfpq_index({p!r})"
            )
    if errors:
        raise RuntimeError(
            "cascade_delete: some artifacts failed (the rest WERE "
            "purged; re-run to retry — idempotent): "
            + "; ".join(errors),
            manifest,
        )
    return manifest

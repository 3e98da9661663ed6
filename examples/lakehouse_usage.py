#!/usr/bin/env python3
"""cae-polars-tools-spark example: a governed lakehouse loop.

The storage + streaming primitives composed the way a governed
training-corpus table actually runs (all engine-native — no external
table format):

1. seed a versioned copy-on-write document table from the corpus
2. stream CDC change batches into it (``cow_upsert_sink``): each
   micro-batch compacts to latest-per-key, MERGEs copy-on-write into
   a NEW immutable version directory, and flips the ``_CURRENT.json``
   pointer last — readers never observe a half-merged state and
   replayed batches are no-ops
3. GDPR-style takedown: ``delete_parquet`` rewrites only the files
   containing matched rows, behind the same pointer-flip discipline
4. serving layout: compaction toward target-sized files
5. widen-only schema evolution (``Table.add_columns``) + a
   cross-artifact takedown (``takedown.cascade_delete``): the table
   grows a column without rewriting a byte of data, old and new
   batches both merge, and one purge request reaches the table AND
   its MinHash near-dup index with an auditable manifest
6. the round-9 relational additions, run as the corpus entries a
   reference user would call: transitive closure (q68), gap-fill +
   linear interpolation (q69), windowed COUNT DISTINCT (q70),
   schema-evolution unionByName (q72), MAP type + map HOFs (q73),
   posexplode (q74).

Run: ``python examples/lakehouse_usage.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cae_polars_tools_spark.io import read_table  # noqa: E402
from cae_polars_tools_spark.plans.registry import load_all  # noqa: E402
from cae_polars_tools_spark.session import get_spark  # noqa: E402
from cae_polars_tools_spark.table import Table  # noqa: E402


def cdc_upsert_loop(spark, sf_dir: str, work: str) -> str:
    """Seed → stream two CDC batches (snapshot, then revisions of
    half the keys + fresh inserts) → verify the pointer-flipped
    CURRENT table holds exactly the newest row per key."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.lit(0).alias("rev")
    )
    target = os.path.join(work, "doc_table")
    src = os.path.join(work, "cdc_in")
    os.makedirs(src)

    revisions = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .withColumn("rev", F.lit(1))
        .unionByName(
            docs.limit(5).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "source",
                "n_chars",
                F.lit(1).alias("rev"),
            )
        )
    )
    docs.coalesce(1).write.parquet(os.path.join(src, "b0"))
    revisions.coalesce(1).write.parquet(os.path.join(src, "b1"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    table = Table(spark, target)
    q = (
        stream.writeStream.foreachBatch(
            table.upsert_sink(keys=["doc_id"], order_col="rev")
        )
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    cur = table.current()
    n_total, n_rev = cur.count(), cur.filter(F.col("rev") == 1).count()
    print(f"CDC upsert: CURRENT has {n_total} rows, {n_rev} at rev=1")
    return target


def takedown_and_compact(spark, target: str, work: str) -> None:
    """Right-to-be-forgotten + serving layout + change feed +
    retention — every verb through the ONE Table facade (one
    pointer-flip discipline, no hand-rolled pointer I/O)."""
    table = Table(spark, target)
    pre_takedown = table.version()
    victim = (
        table.current().select("source").orderBy("source").first()["source"]
    )

    stats = table.delete(f"source = '{victim}'")
    assert table.current().filter(F.col("source") == victim).count() == 0
    print(
        f"takedown: source {victim!r} removed copy-on-write → "
        f"v{stats['version']} ({stats['rows_deleted']} rows, "
        f"{stats['files_rewritten']} files rewritten, "
        f"{stats['files_referenced']} re-referenced — zero bytes copied)"
    )

    out = table.compact()
    print(f"compaction: {out['files']} serving file(s) → v{out['version']}")

    # change data feed: downstream consumers see exactly the deleted
    # rows, nothing else (compaction changes layout, not content)
    feed = table.diff(pre_takedown, keys=["doc_id"])
    ops = {r["op"]: r["n"] for r in feed.groupBy("op").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    print(f"change feed since v{pre_takedown}: {ops}")
    vac = table.vacuum(keep_last=2)
    gone = vac["removed"] + vac["demoted"]
    print(
        f"vacuum: retired {gone or 'nothing'} "
        f"({vac['files_deleted']} files reclaimed, keep_last=2)"
    )


def incremental_rollup(spark, sf_dir: str, work: str) -> None:
    """Materialized-aggregate maintenance + the sketch rollup — the
    two 'never rescan the corpus' moves: nightly batches merge into a
    persisted aggregate through the CoW merge; distinct counts roll up
    from persisted HLL sketches."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.incremental import (
        build_agg_state,
        refresh_agg_parquet,
    )
    from cae_polars_tools_spark.operators.sketches import (
        distinct_sketches,
        rollup_distinct,
    )

    orders = read_table(spark, sf_dir, "orders")
    cutoff = F.lit("2001-01-01").cast("timestamp")
    measures = {
        "n_orders": ("o_orderkey", "count"),
        "sum_price": ("o_totalprice", "sum"),
    }
    v0 = os.path.join(work, "agg_v0")
    v1 = os.path.join(work, "agg_v1")
    build_agg_state(
        orders.filter(F.col("o_orderdate") < cutoff), ["o_custkey"], measures
    ).write.parquet(v0)
    stats = refresh_agg_parquet(
        spark,
        v0,
        orders.filter(F.col("o_orderdate") >= cutoff),
        ["o_custkey"],
        measures,
        v1,
    )
    print(
        "incremental refresh: "
        f"{stats['rows_updated']} updated, {stats['rows_inserted']} "
        f"inserted, {stats['files_rewritten']} file(s) rewritten"
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    sk_path = os.path.join(work, "daily_sketches")
    distinct_sketches(ev, ["event_type", "day"], "user_id").write.parquet(
        sk_path
    )
    merged = rollup_distinct(
        spark.read.parquet(sk_path), ["event_type"]
    )
    for r in merged.orderBy("event_type").collect()[:3]:
        print(
            f"sketch rollup: {r['event_type']} ≈ "
            f"{r['approx_distinct']} distinct users"
        )


def relational_additions(spark, sf_dir: str) -> None:
    """The q68–q74 surface, invoked exactly as the driver runs it."""
    corpus = load_all()
    for name, label in [
        ("q68_transitive_closure", "transitive closure (path doubling)"),
        ("q69_gap_fill", "gap-fill + linear interpolation"),
        ("q70_window_distinct", "windowed COUNT DISTINCT"),
        ("q72_union_by_name", "schema-evolution unionByName"),
        ("q73_map_roundtrip", "MAP type + map HOFs"),
        ("q74_posexplode_tokens", "posexplode"),
    ]:
        n = corpus[name].build(spark, sf_dir).count()
        print(f"{label}: {n} rows")


def evolution_and_cascade(spark, sf_dir: str, work: str) -> None:
    """Round-12 governance verbs: widen the table's schema with a
    zero-rewrite CoW version, merge batches on BOTH schemas, then
    purge one document from the table and its derived MinHash index
    in one cascade."""
    from cae_polars_tools_spark.operators.minhash_index import (
        build_minhash_index,
        query_minhash_index,
    )
    from cae_polars_tools_spark.takedown import cascade_delete

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .limit(200)
    )
    root = os.path.join(work, "governed")
    t = Table.create(spark, root, docs)
    out = t.add_columns({"quality": "double"})
    print(f"evolved to v{out['version']}: added {out['added']}")
    # a NEW-schema batch and an OLD-schema batch both merge
    t.merge(
        docs.limit(20).withColumn("quality", F.lit(0.9)),
        keys=["doc_id"],
    )
    t.merge(
        docs.limit(5).withColumn("text", F.concat("text", F.lit(" v2"))),
        keys=["doc_id"],
    )
    scored = t.current().filter("quality IS NOT NULL").count()
    print(f"current schema {t.current().columns}, {scored} scored docs")

    # derived index + one-request cascade
    idx = os.path.join(work, "governed_mh")
    build_minhash_index(docs, idx)
    victim = docs.first()["doc_id"]
    manifest = cascade_delete(
        spark, [victim], table_root=root, minhash_index_paths=(idx,)
    )
    print(
        "cascade purged:",
        {
            "table_rows": manifest["table"]["rows_deleted"],
            "index_sigs": manifest["minhash"][0]["sigs"]["rows_deleted"],
        },
    )
    probe = docs.filter(F.col("doc_id") == victim).select(
        F.lit(10**9).alias("doc_id"), "text", "source"
    )
    hits = (
        query_minhash_index(spark, idx, probe)
        .filter(F.col("doc_id_hist") == victim)
        .count()
    )
    assert hits == 0, "purged doc must not answer probes"
    print("post-cascade probe of the purged doc: 0 hits")
    trail = [(h["version"], h["op"]) for h in t.describe_history()]
    print("audit trail:", trail)
    assert [op for _, op in trail] == [
        "create", "add_columns", "merge", "merge", "delete",
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cae-polars-tools-spark-lakehouse")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as work:
        target = cdc_upsert_loop(spark, sf_dir, work)
        takedown_and_compact(spark, target, work)
        incremental_rollup(spark, sf_dir, work)
        evolution_and_cascade(spark, sf_dir, work)
    relational_additions(spark, sf_dir)
    print("Lakehouse demo complete.")


if __name__ == "__main__":
    main()

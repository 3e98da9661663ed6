"""Physical-layout utilities: bucketed co-located joins + compaction.

The bucketing tests assert PLAN SHAPE — the whole point of bucketing
is what disappears from the plan (exchanges, sorts), which no
value-level test would catch.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.storage import (
    compact_parquet,
    dataset_file_sizes,
    write_bucketed,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_small):
    """documents + a derived per-doc table, co-bucketed on doc_id."""
    from cae_polars_tools_spark.io import read_table

    docs = read_table(spark, sf_small, "documents")
    stats = docs.select("doc_id", F.length("text").alias("n_chars"))
    for t in ("t_docs_b", "t_stats_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(
        docs.select("doc_id", "text"), "t_docs_b", ["doc_id"], 4,
        path=os.path.join(TMP, "bucketed_docs"),
    )
    write_bucketed(
        stats, "t_stats_b", ["doc_id"], 4,
        path=os.path.join(TMP, "bucketed_stats"),
    )
    yield spark.table("t_docs_b"), spark.table("t_stats_b")
    for t in ("t_docs_b", "t_stats_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_plans_zero_exchanges(spark, bucketed_pair):
    """Co-bucketed equi-join on the bucket key: the shuffle was paid
    once at write time, so the join plan must contain NO Exchange —
    the property that amortizes across every downstream query. (The
    merge hint forces the shuffle-join path the big-big case takes;
    these sf0.001 tables would otherwise just broadcast.)"""
    docs, stats = bucketed_pair
    joined = docs.hint("merge").join(stats, "doc_id")
    plan = _plan(joined)
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_elides_sorts_with_single_file_buckets(
    spark, bucketed_pair
):
    """write_bucketed repartitions to one file per bucket and sortBys
    the key, so with the (off-by-default) bucketed-scan ordering conf
    on, Spark trusts bucket order and the sort-merge join needs no
    per-side Sort either."""
    docs, stats = bucketed_pair
    conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(conf, "true")
    try:
        plan = _plan(docs.hint("merge").join(stats, "doc_id"))
    finally:
        spark.conf.set(conf, "false")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Sort [" not in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_pair, sf_small):
    from cae_polars_tools_spark.io import read_table

    docs, stats = bucketed_pair
    got = {
        (r["doc_id"], r["n_chars"])
        for r in docs.hint("merge").join(stats, "doc_id").collect()
    }
    src = read_table(spark, sf_small, "documents")
    want = {
        (r["doc_id"], r["n_chars"])
        for r in src.select(
            "doc_id", F.length("text").alias("n_chars")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_bucketed_groupby_needs_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the bucketed layout."""
    docs, _ = bucketed_pair
    plan = _plan(docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")))
    assert "Exchange" not in plan


def test_bucketed_one_file_per_bucket(spark, bucketed_pair):
    sizes = dataset_file_sizes(spark, os.path.join(TMP, "bucketed_docs"))
    assert len(sizes) == 4


def test_write_bucketed_validates_inputs(spark, bucketed_pair):
    docs, _ = bucketed_pair
    with pytest.raises(ValueError, match="buckets"):
        write_bucketed(docs, "t_bad", ["doc_id"], 0)
    with pytest.raises(ValueError, match="key"):
        write_bucketed(docs, "t_bad", [], 4)


def test_compact_parquet_hits_target_file_count(spark, sf_small):
    """64 splinter files compact to the listing-derived target count;
    rows survive byte-for-byte."""
    from cae_polars_tools_spark.io import read_table

    src = os.path.join(TMP, "compact_src")
    dst = os.path.join(TMP, "compact_dst")
    docs = read_table(spark, sf_small, "documents").select("doc_id", "text")
    docs.repartition(64).write.mode("overwrite").parquet(src)
    sizes = dataset_file_sizes(spark, src)
    assert len(sizes) == 64
    target = max(1, sum(sizes) // 2)  # aim for ~2-3 files
    n_out = compact_parquet(spark, src, dst, target_file_bytes=target)
    assert n_out <= 4
    assert (
        spark.read.parquet(dst).count()
        == spark.read.parquet(src).count()
        > 0
    )


def test_compact_parquet_sorted_files_cluster_ranges(spark, sf_small):
    """sort_cols compaction range-partitions: each output file holds a
    disjoint doc_id range (the property that makes min/max row-group
    stats selective for pruning)."""
    from cae_polars_tools_spark.io import read_table

    src = os.path.join(TMP, "compact_sort_src")
    dst = os.path.join(TMP, "compact_sort_dst")
    docs = read_table(spark, sf_small, "documents").select("doc_id", "text")
    docs.repartition(16).write.mode("overwrite").parquet(src)
    total = sum(dataset_file_sizes(spark, src))
    compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total // 3),
        sort_cols=["doc_id"],
    )
    out = spark.read.parquet(dst)
    per_file = (
        out.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(spans) >= 2
    for (lo_a, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a <= lo_b  # disjoint ranges ⇒ file-level pruning works


def test_compact_validates_target(spark):
    with pytest.raises(ValueError, match="target_file_bytes"):
        compact_parquet(spark, "/nonexistent", "/tmp/x", target_file_bytes=0)


def test_write_bucketed_preserves_uri_paths(monkeypatch):
    """A URI path must reach the writer untouched — os.path.abspath
    would mangle 's3a://bucket/t' into a local path and the table
    would land on disk silently."""
    import os

    from cae_polars_tools_spark import storage

    captured = {}

    class FakeWriter:
        def option(self, k, v):
            captured[k] = v
            return self

        def saveAsTable(self, t):
            captured["table"] = t

        def sortBy(self, *c):
            return self

        def bucketBy(self, n, *k):
            return self

        def mode(self, m):
            return self

        def format(self, f):
            return self

    class FakeDF:
        def repartition(self, n, *k):
            return self

        @property
        def write(self):
            return FakeWriter()

    storage.write_bucketed(FakeDF(), "t", ["k"], 2, path="s3a://bucket/tbl")
    assert captured["path"] == "s3a://bucket/tbl"
    storage.write_bucketed(FakeDF(), "t", ["k"], 2, path="rel/dir")
    assert captured["path"] == os.path.abspath("rel/dir")


def _per_file_spans(spark, path, col):
    rows = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    return [(r["lo"], r["hi"]) for r in rows]


def _avg_files_hit(spans, probes):
    """Average number of files a point query must read: files whose
    [min,max] interval contains the probe value."""
    return sum(
        sum(1 for lo, hi in spans if lo <= p <= hi) for p in probes
    ) / len(probes)


def test_zorder_prunes_on_every_listed_column(spark, sf_small):
    """Z-order vs linear sort on (l_partkey, l_suppkey): the linear
    layout makes min/max stats selective on l_partkey only — any
    l_suppkey point query reads ~every file. The Z-ordered layout
    prunes on BOTH columns, and beats linear on the second column by a
    wide margin. Row parity is byte-exact."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.storage import (
        compact_parquet,
        dataset_file_sizes,
        zorder_parquet,
    )

    src = os.path.join(TMP, "zorder_src")
    zdst = os.path.join(TMP, "zorder_dst")
    ldst = os.path.join(TMP, "linear_dst")
    li = read_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    li.repartition(8).write.mode("overwrite").parquet(src)
    total = sum(dataset_file_sizes(spark, src))
    target = max(1, total // 8)

    n_z = zorder_parquet(
        spark, src, zdst, ["l_partkey", "l_suppkey"],
        target_file_bytes=target,
    )
    compact_parquet(
        spark, src, ldst, target_file_bytes=target,
        sort_cols=["l_partkey"],
    )
    assert n_z >= 6  # enough files for pruning to be measurable
    assert spark.read.parquet(zdst).count() == li.count()

    probes = {
        c: [
            r[0]
            for r in li.select(c).distinct().orderBy(c).collect()[::10]
        ]
        for c in ("l_partkey", "l_suppkey")
    }
    for col in ("l_partkey", "l_suppkey"):
        z_spans = _per_file_spans(spark, zdst, col)
        hit_frac = _avg_files_hit(z_spans, probes[col]) / len(z_spans)
        assert hit_frac <= 0.8, f"zorder does not prune on {col}: {hit_frac:.2f}"

    lin_spans = _per_file_spans(spark, ldst, "l_suppkey")
    z_spans = _per_file_spans(spark, zdst, "l_suppkey")
    lin_hit = _avg_files_hit(lin_spans, probes["l_suppkey"]) / len(lin_spans)
    z_hit = _avg_files_hit(z_spans, probes["l_suppkey"]) / len(z_spans)
    assert lin_hit > 0.9  # linear layout is blind on the second column
    assert z_hit < 0.75 * lin_hit


def test_zorder_validates_inputs(spark, sf_small):
    import pytest

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.storage import zorder_parquet

    src = os.path.join(TMP, "zorder_val_src")
    read_table(spark, sf_small, "documents").select(
        "doc_id", "text", "n_chars"
    ).write.mode("overwrite").parquet(src)
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_parquet(spark, src, src + "_o", ["doc_id"])
    with pytest.raises(ValueError, match="numeric"):
        zorder_parquet(spark, src, src + "_o", ["doc_id", "text"])
    with pytest.raises(ValueError, match="bits_per_col"):
        zorder_parquet(
            spark, src, src + "_o", ["doc_id", "n_chars"], bits_per_col=0
        )


def test_merge_parquet_rewrites_only_affected_files(spark, sf_small):
    """Copy-on-write MERGE on a key-clustered target: an update batch
    touching one doc_id range rewrites only the files containing those
    keys; every other file is copied BYTE-IDENTICALLY; updated rows
    carry the new values; untouched + inserted rows survive."""
    import hashlib

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.storage import (
        compact_parquet,
        merge_parquet,
    )

    src = os.path.join(TMP, "merge_src_raw")
    tgt = os.path.join(TMP, "merge_tgt")
    dst = os.path.join(TMP, "merge_dst")
    docs = read_table(spark, sf_small, "documents").select(
        "doc_id", "source", "n_chars"
    )
    docs.repartition(8).write.mode("overwrite").parquet(src)
    total = sum(dataset_file_sizes(spark, src))
    # key-clustered target: disjoint doc_id ranges per file
    compact_parquet(
        spark, src, tgt, target_file_bytes=max(1, total // 6),
        sort_cols=["doc_id"],
    )
    n_target_files = len(dataset_file_sizes(spark, tgt))
    assert n_target_files >= 4

    # updates: 3 existing keys in one narrow range + 1 brand-new key
    updates = spark.createDataFrame(
        [(5, "patched", -1), (6, "patched", -2), (7, "patched", -3),
         (1_000_000, "inserted", -4)],
        "doc_id long, source string, n_chars long",
    )
    before = {
        os.path.basename(f): hashlib.md5(
            open(f.replace("file:", ""), "rb").read()
        ).hexdigest()
        for f in spark.read.parquet(tgt).inputFiles()
    }
    summary = merge_parquet(
        spark, tgt, updates, ["doc_id"], dst, target_file_bytes=1 << 30
    )
    # the clustered layout confines keys 5..7 to few files; the new
    # key matches nothing
    assert 1 <= summary["files_rewritten"] <= 2
    assert summary["files_copied"] == n_target_files - summary["files_rewritten"]
    assert summary["rows_updated"] == 3
    assert summary["rows_inserted"] == 1

    out = spark.read.parquet(dst)
    n_src = docs.count()
    assert out.count() == n_src + 1  # +1 insert, updates replace
    got = {r["doc_id"]: (r["source"], r["n_chars"]) for r in out.collect()}
    assert got[5] == ("patched", -1) and got[7] == ("patched", -3)
    assert got[1_000_000] == ("inserted", -4)
    # copied files are byte-identical to their originals
    copied = [
        f for f in os.listdir(dst) if f.startswith("copied-")
    ]
    assert len(copied) == summary["files_copied"]
    for c in copied:
        orig = c.split("-", 2)[2]
        assert orig in before
        assert (
            hashlib.md5(open(os.path.join(dst, c), "rb").read()).hexdigest()
            == before[orig]
        )


def test_merge_parquet_validates_inputs(spark, sf_small):
    import pytest

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.storage import merge_parquet

    tgt = os.path.join(TMP, "merge_val_tgt")
    read_table(spark, sf_small, "documents").select(
        "doc_id", "source"
    ).write.mode("overwrite").parquet(tgt)
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b")], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="not unique"):
        merge_parquet(spark, tgt, dup, ["doc_id"], tgt + "_o")
    with pytest.raises(ValueError, match="at least one key"):
        merge_parquet(spark, tgt, dup, [], tgt + "_o")
    missing = spark.createDataFrame([(1,)], "other long")
    with pytest.raises(ValueError, match="must equal"):
        merge_parquet(spark, tgt, missing, ["doc_id"], tgt + "_o")
    # destination overlap guard: in-place "merge" would rmtree the
    # source before reading it
    ok = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="overlaps"):
        merge_parquet(spark, tgt, ok, ["doc_id"], tgt)
    with pytest.raises(ValueError, match="overlaps"):
        merge_parquet(spark, tgt, ok, ["doc_id"], os.path.join(tgt, "sub"))


def test_delete_parquet_confines_rewrites_and_removes_rows(spark, sf_small):
    """DELETE WHERE on a key-clustered target: only the files holding
    matching rows are rewritten; everything else copies byte-for-byte;
    the predicate rows are gone and nothing else changed."""
    import hashlib

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.storage import (
        compact_parquet,
        delete_parquet,
    )

    src = os.path.join(TMP, "del_src_raw")
    tgt = os.path.join(TMP, "del_tgt")
    dst = os.path.join(TMP, "del_dst")
    docs = read_table(spark, sf_small, "documents").select(
        "doc_id", "source", "n_chars"
    )
    docs.repartition(8).write.mode("overwrite").parquet(src)
    total = sum(dataset_file_sizes(spark, src))
    compact_parquet(
        spark, src, tgt, target_file_bytes=max(1, total // 6),
        sort_cols=["doc_id"],
    )
    n_files = len(dataset_file_sizes(spark, tgt))

    before = {
        os.path.basename(f): hashlib.md5(
            open(f.replace("file:", ""), "rb").read()
        ).hexdigest()
        for f in spark.read.parquet(tgt).inputFiles()
    }
    summary = delete_parquet(spark, tgt, "doc_id BETWEEN 10 AND 20", dst)
    assert summary["rows_deleted"] == 11
    assert 1 <= summary["files_rewritten"] <= 2  # clustered confinement
    assert summary["files_copied"] == n_files - summary["files_rewritten"]

    out = spark.read.parquet(dst)
    assert out.count() == docs.count() - 11
    assert out.filter("doc_id BETWEEN 10 AND 20").count() == 0
    surviving = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 9 in surviving and 21 in surviving
    for f in os.listdir(dst):
        if f.startswith("copied-"):
            orig = f.split("-", 2)[2]
            assert (
                hashlib.md5(
                    open(os.path.join(dst, f), "rb").read()
                ).hexdigest()
                == before[orig]
            )
    # no-match predicate: pure copy, zero rewrites
    summary2 = delete_parquet(spark, tgt, "doc_id < 0", dst + "_noop")
    assert summary2["files_rewritten"] == 0
    assert summary2["rows_deleted"] == 0
    assert spark.read.parquet(dst + "_noop").count() == docs.count()


def test_delete_parquet_null_predicate_rows_survive(spark):
    """SQL DELETE semantics: rows where the predicate is NULL are NOT
    deleted, even when they share a file with matching rows, and the
    summary counts only affirmed deletions."""
    from cae_polars_tools_spark.storage import delete_parquet

    tgt = os.path.join(TMP, "del_null_tgt")
    dst = os.path.join(TMP, "del_null_dst")
    spark.createDataFrame(
        [(1, 5), (2, 15), (3, None)], "id long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(tgt)
    summary = delete_parquet(spark, tgt, "v BETWEEN 10 AND 20", dst)
    assert summary["rows_deleted"] == 1
    got = {(r["id"], r["v"]) for r in spark.read.parquet(dst).collect()}
    assert got == {(1, 5), (3, None)}


def test_delete_parquet_counts_when_every_affected_row_deleted(spark):
    """rows_deleted stays exact when the predicate wipes EVERY row of
    every affected file: the survivor write is then empty and AQE's
    runtime empty-relation propagation excises the CollectMetrics
    observation the count normally rides on — the fallback recount
    must cover that edge (regression pin for the observed-write
    optimization)."""
    from cae_polars_tools_spark.storage import delete_parquet

    tgt = os.path.join(TMP, "del_all_tgt")
    dst = os.path.join(TMP, "del_all_dst")
    spark.createDataFrame(
        [(1, 5), (2, 15)], "id long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(tgt)
    summary = delete_parquet(spark, tgt, "v IS NOT NULL", dst)
    assert summary["rows_deleted"] == 2
    assert summary["files_rewritten"] == 1
    assert spark.read.parquet(dst).count() == 0


def _hive_tgt(spark, path):
    """Two-level hive-partitioned dataset: part=a|b / sub=x|y, two rows
    per leaf, one file per leaf directory."""
    rows = [
        (pid, part, sub, pid * 10)
        for pid, (part, sub) in enumerate(
            [(p, s) for p in ("a", "b") for s in ("x", "y") for _ in (0, 1)]
        )
    ]
    (
        spark.createDataFrame(
            rows, "id long, part string, sub string, v long"
        )
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("part", "sub")
        .parquet(path)
    )
    return {(r[0]): (r[1], r[2], r[3]) for r in rows}


def _file_hashes(spark, path):
    import hashlib
    from urllib.parse import unquote, urlparse

    out = {}
    for f in spark.read.parquet(path).inputFiles():
        p = unquote(urlparse(f).path)
        tgt_rel = os.path.relpath(p, os.path.abspath(path))
        out[tgt_rel] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def test_merge_parquet_hive_partitioned_roundtrip(spark):
    """MERGE on a two-level key=value-partitioned target: untouched
    leaf files copy byte-identically INTO their partition subpaths,
    affected leaves rewrite with partition columns intact, and an
    update may move a row to a different partition."""
    from cae_polars_tools_spark.storage import merge_parquet

    tgt = os.path.join(TMP, "cow_hive_m_tgt")
    dst = os.path.join(TMP, "cow_hive_m_dst")
    base = _hive_tgt(spark, tgt)
    before = _file_hashes(spark, tgt)
    assert len(before) == 4  # one file per leaf dir

    # id 0 lives in part=a/sub=x; the update MOVES it to part=b/sub=y
    # and id 99 is a brand-new row for part=a/sub=y
    upd = spark.createDataFrame(
        [(0, "b", "y", -1), (99, "a", "y", -2)],
        "id long, part string, sub string, v long",
    )
    summary = merge_parquet(spark, tgt, upd, ["id"], dst)
    assert summary["rows_updated"] == 1
    assert summary["rows_inserted"] == 1
    assert summary["files_rewritten"] == 1  # only id 0's file
    assert summary["files_copied"] == 3

    out = spark.read.parquet(dst)
    got = {
        r["id"]: (r["part"], r["sub"], r["v"]) for r in out.collect()
    }
    expect = dict(base)
    expect[0] = ("b", "y", -1)
    expect[99] = ("a", "y", -2)
    assert got == expect

    # untouched copies keep their key=value subpath, byte-identical
    after = _file_hashes(spark, dst)
    copied = {
        rel: h for rel, h in after.items()
        if os.path.basename(rel).startswith("copied-")
    }
    assert len(copied) == 3
    for rel, h in copied.items():
        d = os.path.dirname(rel)
        orig_base = os.path.basename(rel).split("-", 2)[2]
        assert before[os.path.join(d, orig_base)] == h


def test_delete_parquet_hive_partition_predicate_prunes(spark):
    """DELETE WHERE on a partition column: the discovery scan prunes
    the other directories entirely, only the matching leaves rewrite,
    and the rewritten rows keep their partition values."""
    from cae_polars_tools_spark.storage import delete_parquet

    tgt = os.path.join(TMP, "cow_hive_d_tgt")
    dst = os.path.join(TMP, "cow_hive_d_dst")
    base = _hive_tgt(spark, tgt)

    summary = delete_parquet(
        spark, tgt, "part = 'a' AND id % 2 = 0", dst
    )
    assert summary["rows_deleted"] == 2  # ids 0 and 2 (part=a, even)
    assert summary["files_rewritten"] == 2  # part=a leaves only
    assert summary["files_copied"] == 2  # part=b leaves untouched

    out = spark.read.parquet(dst)
    got = {r["id"]: (r["part"], r["sub"], r["v"]) for r in out.collect()}
    expect = {k: v for k, v in base.items() if not (v[0] == "a" and k % 2 == 0)}
    assert got == expect
    # partition dirs preserved on the copied side
    assert os.path.isdir(os.path.join(dst, "part=b", "sub=x"))


def test_cow_handles_literal_percent_paths(spark):
    """A literal '%' in the dataset path must not be decoded twice on
    the way into layout classification (inputFiles() percent-encodes;
    one unquote is correct, two would mangle 'pct%3D50' into
    'pct=50' and misread it as a hive component)."""
    from cae_polars_tools_spark.storage import delete_parquet

    tgt = os.path.join(TMP, "pct%3D50", "cow_pct_tgt")
    dst = os.path.join(TMP, "pct%3D50", "cow_pct_dst")
    spark.createDataFrame(
        [(1, 5), (2, 15)], "id long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(tgt)
    summary = delete_parquet(spark, tgt, "v > 10", dst)
    assert summary["rows_deleted"] == 1
    got = {(r["id"], r["v"]) for r in spark.read.parquet(dst).collect()}
    assert got == {(1, 5)}


def test_merge_parquet_rejects_dtype_drift(spark):
    """Same names, different types (int updates vs long target) must be
    rejected before unionByName can poison the rewritten files."""
    from cae_polars_tools_spark.storage import merge_parquet

    tgt = os.path.join(TMP, "merge_dtype_tgt")
    spark.createDataFrame(
        [(1, 5), (2, 6)], "id long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(tgt)
    upd = spark.createDataFrame([(1, 7)], "id int, v int")
    with pytest.raises(ValueError, match="cast the updates"):
        merge_parquet(spark, tgt, upd, ["id"], tgt + "_o")


def test_compact_preserves_hive_partition_layout(spark):
    """Compacting a key=value-partitioned dataset must keep the
    layout (partitionBy rewrite): same rows, far fewer files, the
    key=value directories intact, and partition pruning still
    listing only the filtered directories."""
    from urllib.parse import unquote, urlparse

    from cae_polars_tools_spark.storage import compact_parquet

    src = os.path.join(TMP, "compact_hive_src")
    dst = os.path.join(TMP, "compact_hive_dst")
    rows = [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(200)]
    (
        spark.createDataFrame(rows, "id long, part string, v long")
        .repartition(16)  # many small files per partition dir
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(src)
    )
    n_src = len(spark.read.parquet(src).inputFiles())
    assert n_src >= 20

    n_dst = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n_dst < n_src / 3

    out = spark.read.parquet(dst)
    got = {(r["id"], r["part"], r["v"]) for r in out.collect()}
    assert got == set(rows)
    assert os.path.isdir(os.path.join(dst, "part=a"))
    assert os.path.isdir(os.path.join(dst, "part=b"))
    # pruning: a partition-column filter becomes a PartitionFilter in
    # the scan (inputFiles() is relation-level and would list all)
    pruned = out.filter("part = 'a'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part" in plan
    assert pruned.count() == 100


def test_compact_hive_with_sort_cols_clusters_within_partition(spark):
    from cae_polars_tools_spark.storage import compact_parquet

    src = os.path.join(TMP, "compact_hive_sort_src")
    dst = os.path.join(TMP, "compact_hive_sort_dst")
    rows = [(i, "p%d" % (i % 3), (997 * i) % 1000) for i in range(300)]
    (
        spark.createDataFrame(rows, "id long, part string, v long")
        .repartition(8)
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(src)
    )
    compact_parquet(
        spark, src, dst, target_file_bytes=1 << 30, sort_cols=["v"]
    )
    out = spark.read.parquet(dst)
    assert out.count() == 300
    assert {r["part"] for r in out.select("part").distinct().collect()} == {
        "p0", "p1", "p2"
    }


def test_parquet_rowgroup_stats_footer_evidence(spark, sf_small):
    """parquet_rowgroup_stats reads the footer metadata only and shows
    the pruning evidence directly: after a sort_cols compaction the
    doc_id min/max spans of the row groups are disjoint."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.storage import (
        compact_parquet,
        dataset_file_sizes,
        parquet_rowgroup_stats,
    )

    src = os.path.join(TMP, "rgstats_src")
    dst = os.path.join(TMP, "rgstats_dst")
    docs = read_table(spark, sf_small, "documents").select("doc_id", "text")
    docs.repartition(8).write.mode("overwrite").parquet(src)
    total = sum(dataset_file_sizes(spark, src))
    compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total // 4),
        sort_cols=["doc_id"],
    )
    stats = parquet_rowgroup_stats(dst)
    assert len(stats) >= 3
    assert sum(s["rows"] for s in stats) == docs.count()
    spans = sorted(
        (s["columns"]["doc_id"]["min"], s["columns"]["doc_id"]["max"])
        for s in stats
    )
    assert all(s["columns"]["doc_id"]["null_count"] == 0 for s in stats)
    for (lo_a, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a <= lo_b  # disjoint → row-group pruning works


def test_dict_encode_roundtrip_and_nulls(spark):
    """dict_encode: dense value-ordered codes, nulls pass through
    un-coded, and join-back on the dictionary reconstructs the
    column exactly."""
    from cae_polars_tools_spark.storage import dict_encode
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "b"), (4, None), (5, "c")],
        "id long, cat string",
    )
    encoded, dictionary = dict_encode(df, "cat")
    d = {r["value"]: r["code"] for r in dictionary.collect()}
    assert d == {"a": 0, "b": 1, "c": 2}
    got = {r["id"]: r["cat_code"] for r in encoded.collect()}
    assert got == {1: 1, 2: 0, 3: 1, 4: None, 5: 2}
    # decode via the dictionary reconstructs the source column
    back = encoded.join(
        dictionary.withColumnRenamed("code", "cat_code"),
        "cat_code",
        "left",
    )
    assert {
        (r["id"], r["value"]) for r in back.collect()
    } == {(1, "b"), (2, "a"), (3, "b"), (4, None), (5, "c")}


def test_dict_encode_cardinality_guard(spark):
    """The low-cardinality premise is enforced: a near-unique column
    raises past max_cardinality instead of silently running the
    dictionary window on one partition; raising the bound explicitly
    re-enables the call on the same data."""
    import pytest
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.storage import dict_encode

    df = spark.range(50).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("cat")
    )
    with pytest.raises(ValueError, match="max_cardinality"):
        dict_encode(df, "cat", max_cardinality=10)
    encoded, dictionary = dict_encode(df, "cat", max_cardinality=50)
    assert dictionary.count() == 50
    assert encoded.where(F.col("cat_code").isNull()).count() == 0

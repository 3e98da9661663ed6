"""Pipeline utilities: deterministic hash splits, stratified sampling,
and sequence packing (operators/pipeline.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table
from cae_polars_tools_spark.operators.pipeline import (
    pack_sequences,
    split_by_hash,
    stratified_sample,
)


def test_split_by_hash_partitions_completely_and_deterministically(spark, sf_small):
    docs = read_table(spark, sf_small, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_by_hash(docs, "doc_id", w, seed=7)
    counts = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # complete partition, no drops
    # proportions within loose binomial bounds
    assert 0.7 * n <= counts["train"] <= 0.9 * n
    # deterministic: identical assignment on rebuild
    b = split_by_hash(read_table(spark, sf_small, "documents"), "doc_id", w, seed=7)
    assert a.select("doc_id", "split").exceptAll(b.select("doc_id", "split")).count() == 0
    # different seed reshuffles membership
    c = split_by_hash(docs, "doc_id", w, seed=8)
    moved = (
        a.select("doc_id", "split")
        .exceptAll(c.select("doc_id", "split"))
        .count()
    )
    assert moved > 0


def test_split_by_hash_same_key_same_split(spark):
    """Equal keys always co-locate — the leakage-prevention property."""
    df = spark.createDataFrame(
        [(i % 10, i) for i in range(100)], "k long, payload long"
    )
    out = split_by_hash(df, "k", {"a": 0.5, "b": 0.5})
    assert out.groupBy("k").agg(
        F.count_distinct("split").alias("n")
    ).filter("n > 1").count() == 0


def test_stratified_sample_bernoulli_and_exact(spark, sf_small):
    emb = read_table(spark, sf_small, "embeddings")
    per_label = {
        r["label"]: r["count"] for r in emb.groupBy("label").count().collect()
    }

    exact = stratified_sample(emb, "label", 0.3, seed=1, exact=True)
    got = {r["label"]: r["count"] for r in exact.groupBy("label").count().collect()}
    import math

    for lbl, n in per_label.items():
        assert got.get(lbl, 0) == math.ceil(0.3 * n)
    # deterministic row choice for a fixed seed
    again = stratified_sample(emb, "label", 0.3, seed=1, exact=True)
    assert exact.exceptAll(again).count() == 0

    loose = stratified_sample(emb, "label", 0.5, seed=1).count()
    assert 0.25 * emb.count() <= loose <= 0.75 * emb.count()

    with pytest.raises(ValueError, match="outside"):
        stratified_sample(emb, "label", 1.5)


def test_pack_sequences_budget_and_coverage(spark, sf_small):
    docs = read_table(spark, sf_small, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    budget = 512
    packed = pack_sequences(docs, budget, token_col="n_tokens")
    # every document assigned exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    # no multi-document pack exceeds the budget (a single oversized doc
    # may — callers chunk upstream)
    over = (
        packed.groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("members")
        )
        .filter((F.col("tot") > budget) & (F.col("members") > 1))
    )
    assert over.count() == 0
    # pack_tokens column is the true per-pack sum
    bad = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.first("pack_tokens").alias("rep")
    ).filter("tot <> rep")
    assert bad.count() == 0
    # packing is dense: far fewer packs than docs at this budget
    n_packs = packed.select("pack_id").distinct().count()
    assert n_packs < docs.count()
    # utilization sanity: average multi-doc pack fill is high
    fill = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .agg(F.avg("tot"))
        .collect()[0][0]
    )
    assert fill > budget * 0.5


def test_pack_sequences_oversized_doc_isolated(spark):
    # one partition: packing is partition-local by design, and this
    # test asserts WITHIN-partition packing decisions
    df = spark.createDataFrame(
        [(1, 100), (2, 9000), (3, 150)], "doc_id long, n_tokens long"
    ).coalesce(1)
    packed = {r["doc_id"]: r for r in pack_sequences(df, 512).collect()}
    assert packed[2]["pack_tokens"] == 9000  # alone in its pack
    assert packed[1]["pack_id"] != packed[2]["pack_id"]
    assert packed[1]["pack_id"] == packed[3]["pack_id"]  # 100+150 fit together


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, 0)


def test_pack_sequences_preserves_string_ids(spark):
    """String/UUID doc ids (the common real-crawl shape) pass through
    unchanged — no silent cast-to-long nulling of identities."""
    df = spark.createDataFrame(
        [("u-aaa", 100), ("u-bbb", 9000), ("u-ccc", 150)],
        "doc_id string, n_tokens long",
    ).coalesce(1)
    packed = {r["doc_id"]: r for r in pack_sequences(df, 512).collect()}
    assert set(packed) == {"u-aaa", "u-bbb", "u-ccc"}
    assert dict(pack_sequences(df, 512).dtypes)["doc_id"] == "string"
    assert packed["u-bbb"]["pack_tokens"] == 9000
    assert packed["u-aaa"]["pack_id"] == packed["u-ccc"]["pack_id"]


def test_pack_sequences_rejects_complex_id_type(spark):
    df = spark.createDataFrame(
        [([1, 2], 10)], "doc_id array<long>, n_tokens long"
    )
    with pytest.raises(TypeError, match="complex type"):
        pack_sequences(df, 512)


def test_decontamination_flags_verbatim_overlap(spark, sf_small):
    """A benchmark built from verbatim 13-token spans of two corpus
    docs flags exactly those docs; a novel benchmark doc flags none."""
    from cae_polars_tools_spark.operators.pipeline import (
        contamination_hits,
        decontaminate,
    )

    docs = read_table(spark, sf_small, "documents")
    long_docs = [
        (r["doc_id"], r["text"])
        for r in docs.filter(F.size(F.split("text", " ")) >= 20)
        .orderBy("doc_id")
        .limit(2)
        .collect()
    ]
    assert len(long_docs) == 2
    spans = [
        " ".join(text.split(" ")[3:17])  # 14 tokens → two 13-gram windows
        for _id, text in long_docs
    ]
    benchmark = spark.createDataFrame(
        [(0, spans[0]), (1, spans[1]), (2, "entirely novel words " * 8)],
        "bench_id long, text string",
    )

    hits = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(docs, benchmark).collect()
    }
    expected_ids = {i for i, _ in long_docs}
    assert expected_ids <= set(hits)
    for i in expected_ids:
        assert hits[i] >= 2  # both windows of the span matched
    clean = decontaminate(docs, benchmark)
    remaining = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert expected_ids.isdisjoint(remaining)
    assert len(remaining) == docs.count() - len(set(hits))


def test_decontamination_shuffle_join_variant_matches(spark, sf_small):
    from cae_polars_tools_spark.operators.pipeline import contamination_hits

    docs = read_table(spark, sf_small, "documents")
    bench = docs.limit(3).select(F.col("doc_id").alias("bench_id"), "text")
    a = set(map(tuple, contamination_hits(docs, bench).collect()))
    b = set(
        map(
            tuple,
            contamination_hits(docs, bench, broadcast_benchmark=False).collect(),
        )
    )
    assert a == b and len(a) >= 3  # the 3 source docs self-match


def test_split_by_hash_rejects_negative_weight(spark):
    from cae_polars_tools_spark.operators.pipeline import split_by_hash

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="negative"):
        split_by_hash(df, "k", {"a": 0.5, "b": -0.2, "c": 0.7})


def test_contamination_tolerates_null_text(spark):
    from cae_polars_tools_spark.operators.pipeline import contamination_hits

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox " * 10), (2, None)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "the quick brown fox " * 4)], "bench_id long, text string"
    )
    hits = {r["doc_id"] for r in contamination_hits(corpus, bench).collect()}
    assert hits == {1}  # null-text doc neither crashes nor matches


def test_pack_sequences_open_pack_cap(spark):
    """With a tiny open-pack cap the budget contract still holds; the
    cap only trades density, never correctness."""
    from cae_polars_tools_spark.operators.pipeline import pack_sequences

    rows = [(i, 260) for i in range(50)]  # each pack fits exactly one…
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").coalesce(1)
    packed = pack_sequences(df, 512, max_open_packs=2)
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("m"))
        .filter((F.col("tot") > 512) & (F.col("m") > 1))
    )
    assert over.count() == 0
    assert packed.count() == 50
    with pytest.raises(ValueError, match="max_open_packs"):
        pack_sequences(df, 512, max_open_packs=0)


def test_pack_sequences_honors_column_names(spark):
    from cae_polars_tools_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame([(7, 10), (8, 20)], "uid long, toks long").coalesce(1)
    out = pack_sequences(df, 512, id_col="uid", token_col="toks")
    assert set(out.columns) == {"uid", "pack_id", "toks", "pack_tokens"}
    assert {r["uid"] for r in out.collect()} == {7, 8}


def test_mix_sources_waterfill_and_determinism(spark):
    """mix_sources: the most over-weighted source keeps every row,
    under-weighted sources thin toward their proportional share, and
    membership is invariant under repartitioning (row-local md5
    predicate)."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.pipeline import mix_sources

    rows = [(i, "heavy" if i % 2 else "light") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    w = lambda s: F.when(s == "heavy", F.lit(4.0)).otherwise(F.lit(1.0))

    out = mix_sources(df, "source", w, "doc_id")
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["heavy"] == 1000  # over-weighted: keeps everything
    # light targets 1000/4 = 250; Bernoulli noise band ±5 sigma (~68)
    assert 180 <= by_src["light"] <= 320

    # repartition invariance: identical kept set
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in mix_sources(df.repartition(13), "source", w, "doc_id").collect()
    }
    assert a == b


def test_mix_sources_rejects_null_or_nonpositive_weights(spark):
    """A weight_of missing its .otherwise() (NULL weight) must raise,
    not silently drop whole sources."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from cae_polars_tools_spark.operators.pipeline import mix_sources

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10)],
        ["doc_id", "source"],
    )
    missing_otherwise = lambda s: F.when(s == "a", F.lit(2.0))
    with _pytest.raises(Exception, match="weights must be positive"):
        mix_sources(df, "source", missing_otherwise, "doc_id").collect()
    negative = lambda s: F.lit(-1.0)
    with _pytest.raises(Exception, match="weights must be positive"):
        mix_sources(df, "source", negative, "doc_id").collect()


def test_register_views_exposes_all_tables(spark, sf_small):
    """register_views: every synthetic table becomes a temp view the
    SQL interface can query."""
    from cae_polars_tools_spark.io import TABLES, register_views

    register_views(spark, sf_small)
    for t in TABLES:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() >= 0


def test_cap_per_key_salted_equals_plain(spark):
    """The presalted two-phase cap selects EXACTLY the rows the plain
    single-window path selects (pigeonhole: a globally-kept row has
    < cap rows of its own salt ahead of it) — on data with one 90%-hot
    key — and respects the cap everywhere."""
    from collections import Counter

    from cae_polars_tools_spark.operators.pipeline import cap_per_key

    rows = [(i, "hot") for i in range(450)]
    rows += [(1000 + i, f"k{i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    plain = cap_per_key(df, "source", 7, "doc_id", seed=3)
    salted = cap_per_key(df, "source", 7, "doc_id", seed=3, presalt=4)
    got_p = sorted(map(tuple, plain.collect()))
    got_s = sorted(map(tuple, salted.collect()))
    assert got_p == got_s
    per_key = Counter(k for _, k in got_s)
    assert per_key["hot"] == 7
    assert all(n <= 7 for n in per_key.values())
    # deterministic across runs
    assert got_s == sorted(map(tuple, salted.collect()))


def test_cap_per_key_validates_args(spark):
    import pytest

    from cae_polars_tools_spark.operators.pipeline import cap_per_key

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="cap"):
        cap_per_key(df, "source", 0)
    with pytest.raises(ValueError, match="presalt"):
        cap_per_key(df, "source", 1, presalt=0)


def test_weighted_sample_rejects_nonpositive_weights(spark):
    """A-Res weights are selection rates: zero/negative/null weights
    have no meaning and previously degenerated to Infinity/NaN scores
    that silently sorted into or out of the top-k. The guard is fused
    into the score projection (assert_true — no extra scan) and must
    abort the job loudly."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from cae_polars_tools_spark.operators.pipeline import weighted_sample

    bad = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, 5.0)], "doc_id long, w double"
    )
    with pytest.raises(SparkRuntimeException, match="strictly positive"):
        weighted_sample(bad, "w", 2).collect()
    neg = spark.createDataFrame(
        [(1, 10.0), (2, -1.0)], "doc_id long, w double"
    )
    with pytest.raises(SparkRuntimeException, match="strictly positive"):
        weighted_sample(neg, "w", 1).collect()
    # all-positive still samples exactly k deterministic rows
    ok = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(20)], "doc_id long, w double"
    )
    a = [r["doc_id"] for r in weighted_sample(ok, "w", 5).collect()]
    b = [r["doc_id"] for r in weighted_sample(ok, "w", 5).collect()]
    assert len(a) == 5 and a == b


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunking contract: full character coverage, exactly `overlap`
    shared chars between neighbors, short docs yield one chunk of
    themselves, and bad parameters refuse."""
    import pytest

    from cae_polars_tools_spark.operators.pipeline import chunk_documents

    long_text = "".join(chr(97 + (i % 26)) for i in range(250))
    docs = spark.createDataFrame(
        [(1, long_text), (2, "tiny")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, max_chars=100, overlap=20).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
    c1 = by_doc[1]
    assert sorted(c1) == [0, 1, 2]
    assert c1[0] == long_text[0:100]
    assert c1[1] == long_text[80:180]
    assert c1[2] == long_text[160:250]
    # overlap: each neighbor pair shares exactly 20 chars
    assert c1[0][-20:] == c1[1][:20]
    # reconstruction: stride-spliced chunks rebuild the document
    assert c1[0] + c1[1][20:] + c1[2][20:] == long_text
    assert by_doc[2] == {0: "tiny"}
    with pytest.raises(ValueError, match="max_chars > overlap"):
        chunk_documents(docs, max_chars=20, overlap=20)


def test_bloom_decontaminate_equals_exact(spark):
    """The Bloom-prefiltered path must return EXACTLY the broadcast
    path's hits and survivors (no false negatives by Bloom's
    contract, false positives removed by the verify join) — at an
    aggressive fpp so false positives actually occur and the verify
    stage is exercised, not vacuous."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.pipeline import (
        contamination_hits,
        contamination_hits_bloom,
        decontaminate,
        decontaminate_bloom,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter("source = 'src19'").select("doc_id", "text")
    corp = docs.filter("source <> 'src19'")
    want = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_hits(corp, bench).collect()
    }
    assert want, "fixture must contain contamination"
    for fpp in (0.5, 0.001):  # 0.5: floods the verify stage with FPs
        got = {
            (r["doc_id"], r["n_hits"])
            for r in contamination_hits_bloom(corp, bench, fpp=fpp).collect()
        }
        assert got == want, fpp
    a = {r["doc_id"] for r in decontaminate(corp, bench).collect()}
    b = {r["doc_id"] for r in decontaminate_bloom(corp, bench).collect()}
    assert a == b


def test_build_hash_bloom_contract(spark):
    """No false negatives ever (every built hash tests positive);
    false-positive rate on fresh hashes lands near the requested fpp;
    sizing follows the textbook formula."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.pipeline import (
        _bloom_member_udf,
        build_hash_bloom,
    )

    n = 2000
    members = spark.range(n).select(
        F.xxhash64(F.col("id")).alias("g")
    )
    bitmap, m, k = build_hash_bloom(members, n_items=n, fpp=0.01)
    assert m >= math.ceil(-n * math.log(0.01) / math.log(2) ** 2)
    assert 1 <= k <= 20
    member, _bc = _bloom_member_udf(spark, bitmap)
    # round-16 contract: the k bit positions arrive as k FLAT long
    # columns (columnar Arrow transfer), not one array<long>
    pos = [
        F.pmod(F.xxhash64("g", F.lit(i)), F.lit(m)) for i in range(k)
    ]
    # zero false negatives
    assert members.filter(~member(*pos)).count() == 0
    # false positives near fpp on disjoint fresh hashes
    fresh = spark.range(n, n + 20000).select(
        F.xxhash64(F.col("id")).alias("g")
    )
    fp = fresh.filter(member(*pos)).count()
    assert fp / 20000 < 0.05, fp

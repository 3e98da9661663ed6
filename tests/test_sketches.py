"""Mergeable-sketch operators: HLL rollup semantics (union ≡ sketch of
union, persistence round-trip) and the Misra–Gries heavy-hitter
guarantee (exact equality with brute force, bounded candidates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.operators.sketches import (
    distinct_sketches,
    heavy_hitters,
    rollup_distinct,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "grp string, day int, uid long")


def test_rollup_estimate_matches_exact_within_tol(spark):
    # 3 groups × 4 days, deliberately overlapping uids across days so
    # the union must deduplicate across sketches, not just add counts
    rows = [
        (g, d, (d * 37 + i) % 500)
        for g in ("a", "b")
        for d in range(4)
        for i in range(300)
    ]
    df = _events(spark, rows)
    daily = distinct_sketches(df, ["grp", "day"], "uid")
    got = {
        r["grp"]: r["approx_distinct"]
        for r in rollup_distinct(daily, ["grp"]).collect()
    }
    exact = {
        r["grp"]: r["x"]
        for r in df.groupBy("grp")
        .agg(F.count_distinct("uid").alias("x"))
        .collect()
    }
    for g, e in exact.items():
        assert abs(got[g] - e) / e < 0.05, (g, got[g], e)


def test_sketches_survive_parquet_roundtrip(spark, tmp_path):
    """The build-once/persist/merge-later contract: sketches written
    as a plain binary column must merge identically after re-read."""
    rows = [("a", d, (d * 11 + i) % 200) for d in range(3) for i in range(120)]
    daily = distinct_sketches(_events(spark, rows), ["grp", "day"], "uid")
    p = str(tmp_path / "sketches.parquet")
    daily.write.parquet(p)
    direct = rollup_distinct(daily, ["grp"]).collect()[0]["approx_distinct"]
    reread = rollup_distinct(
        spark.read.parquet(p), ["grp"]
    ).collect()[0]["approx_distinct"]
    assert direct == reread


def test_sketch_ingest_stream_equals_batch(spark, tmp_path):
    """The streamed sketch table must EXACTLY equal the batch-built
    one: HLL union is grouping-invariant (registers merge by
    elementwise max), so batch boundaries cannot move any estimate."""
    from cae_polars_tools_spark.operators.sketches import (
        sketch_ingest_sink,
    )

    rows = [
        ("a", d, (d * 31 + i) % 400) for d in range(6) for i in range(200)
    ]
    df = _events(spark, rows)
    target = str(tmp_path / "sketches")
    sink = sketch_ingest_sink(target, ["grp", "day"], "uid")
    # three micro-batches along day boundaries
    for bid, lo in enumerate((0, 2, 4)):
        sink(df.filter((df.day >= lo) & (df.day < lo + 2)), bid)
    streamed = rollup_distinct(
        spark.read.parquet(target), ["grp"]
    ).collect()[0]["approx_distinct"]
    batch = rollup_distinct(
        distinct_sketches(df, ["grp", "day"], "uid"), ["grp"]
    ).collect()[0]["approx_distinct"]
    assert streamed == batch


def test_sketch_ingest_replay_is_idempotent(spark, tmp_path):
    import os

    from cae_polars_tools_spark.operators.sketches import (
        sketch_ingest_sink,
    )

    df = _events(spark, [("a", 0, i) for i in range(50)])
    target = str(tmp_path / "sk")
    sink = sketch_ingest_sink(target, ["grp"], "uid")
    sink(df, 0)
    before = rollup_distinct(
        spark.read.parquet(target), ["grp"]
    ).collect()
    segs = set(os.listdir(target))
    sink(df, 0)  # redelivery
    assert set(os.listdir(target)) == segs
    assert (
        rollup_distinct(spark.read.parquet(target), ["grp"]).collect()
        == before
    )


def test_compact_sketch_segments_preserves_estimates(spark, tmp_path):
    from cae_polars_tools_spark.operators.sketches import (
        compact_sketch_segments,
        sketch_ingest_sink,
    )

    rows = [("a", d, (d * 13 + i) % 150) for d in range(4) for i in range(80)]
    df = _events(spark, rows)
    target = str(tmp_path / "segs")
    sink = sketch_ingest_sink(target, ["grp"], "uid")
    for bid in range(4):
        sink(df.filter(df.day == bid), bid)
    before = rollup_distinct(
        spark.read.parquet(target), ["grp"]
    ).collect()
    compacted = compact_sketch_segments(
        spark, target, str(tmp_path / "compact"), ["grp"]
    )
    assert compacted.count() == 1  # one row per key after compaction
    assert rollup_distinct(compacted, ["grp"]).collect() == before


def test_heavy_hitters_equals_bruteforce(spark):
    # skewed stream: 'hot1' 30%, 'hot2' 12%, long uniform tail
    vals = (
        ["hot1"] * 300
        + ["hot2"] * 120
        + [f"tail{i % 97}" for i in range(580)]
    )
    df = spark.createDataFrame(
        [(v,) for v in vals], "token string"
    ).repartition(7)
    got = {
        (r["token"], r["n_occurrences"])
        for r in heavy_hitters(df, "token", 10).collect()
    }
    n = len(vals)
    brute = {
        (r["token"], r["c"])
        for r in df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * 10 > n)
        .collect()
    }
    assert got == brute
    assert ("hot1", 300) in got and ("hot2", 120) in got


@pytest.mark.parametrize("parts", [1, 3, 13])
def test_heavy_hitters_partition_invariant(spark, parts):
    """The candidate union ⊇ truth argument holds for ANY partition
    layout — the result must not change with parallelism."""
    vals = ["x"] * 50 + ["y"] * 20 + [f"t{i}" for i in range(130)]
    df = spark.createDataFrame(
        [(v,) for v in vals], "token string"
    ).repartition(parts)
    got = sorted(
        (r["token"], r["n_occurrences"])
        for r in heavy_hitters(df, "token", 8).collect()
    )
    # n=200, threshold n/k=25: only 'x' (50) qualifies; 'y' (20) must not
    assert got == [("x", 50)]


def test_heavy_hitters_borderline_threshold(spark):
    """count·k > n is a strict integer comparison: a value at EXACTLY
    n/k is not a heavy hitter."""
    vals = ["a"] * 25 + ["b"] * 26 + [f"t{i}" for i in range(49)]
    # n = 100, k = 4 → threshold 25: 'a' (25·4 = 100 = n) excluded,
    # 'b' (26·4 > 100) included
    df = spark.createDataFrame([(v,) for v in vals], "token string")
    got = {r["token"] for r in heavy_hitters(df, "token", 4).collect()}
    assert got == {"b"}


def test_hh_candidate_sink_stream_covers_truth(spark, tmp_path):
    """Candidates accumulated across micro-batches must contain every
    global heavy hitter (pigeonhole over batches), and the shared
    confirm stage over the accumulated corpus must equal brute
    force — even when no single batch makes the hitter locally
    heavy... and replays must change nothing."""
    import os

    from cae_polars_tools_spark.operators.sketches import (
        confirm_heavy_hitters,
        hh_candidate_sink,
    )

    # 'hot' is 30% of every batch; tail values differ per batch so
    # the candidate sets differ batch to batch
    batches = [
        ["hot"] * 30 + [f"b{b}_t{i % 23}" for i in range(70)]
        for b in range(4)
    ]
    target = str(tmp_path / "hh")
    sink = hh_candidate_sink(target, "token", 8)
    frames = []
    for bid, vals in enumerate(batches):
        bdf = spark.createDataFrame([(v,) for v in vals], "token string")
        frames.append(bdf)
        sink(bdf, bid)
    corpus = frames[0]
    for f in frames[1:]:
        corpus = corpus.unionAll(f)
    cands = spark.read.parquet(target)
    got = {
        (r["token"], r["n_occurrences"])
        for r in confirm_heavy_hitters(corpus, cands, "token", 8).collect()
    }
    n = sum(len(b) for b in batches)
    brute = {
        (r["token"], r["c"])
        for r in corpus.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * 8 > n)
        .collect()
    }
    assert got == brute
    assert ("hot", 120) in got

    segs = set(os.listdir(target))
    sink(frames[0], 0)  # replay
    assert set(os.listdir(target)) == segs


def test_segment_sink_clears_crash_orphans(spark, tmp_path):
    """A segment directory WITHOUT a _SUCCESS marker (crash between
    write start and commit) must be cleared and rewritten, not
    skipped and not crashed into (errorifexists)."""
    import os

    from cae_polars_tools_spark.operators.sketches import (
        sketch_ingest_sink,
    )

    df = _events(spark, [("a", 0, i) for i in range(40)])
    target = str(tmp_path / "orph")
    seg = os.path.join(target, "batch=0")
    os.makedirs(seg)
    with open(os.path.join(seg, "part-junk.parquet"), "wb") as fh:
        fh.write(b"partial")  # orphan, no _SUCCESS
    sink = sketch_ingest_sink(target, ["grp"], "uid")
    sink(df, 0)
    assert os.path.exists(os.path.join(seg, "_SUCCESS"))
    assert not os.path.exists(os.path.join(seg, "part-junk.parquet"))
    assert rollup_distinct(
        spark.read.parquet(target), ["grp"]
    ).collect()[0]["approx_distinct"] > 0

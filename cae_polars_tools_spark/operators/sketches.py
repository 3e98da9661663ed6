"""Mergeable-sketch operators: persisted HLL distinct-count rollups
and Misra–Gries heavy hitters.

The reference engine carries no sketch surface of its own (its
delegated query layer leans on whatever the host engine offers); these
operators are the north-star scale path for the two questions a
100 TB pipeline asks constantly and cannot afford to answer by rescan:

* "How many distinct users/URLs/documents over ANY grouping of an
  already-processed corpus?" — answered by building **HLL sketches
  once** at a fine grain (e.g. per day), persisting them as ordinary
  binary columns, and **merging** them per query
  (:func:`distinct_sketches` / :func:`rollup_distinct`). Sketch union
  is exact over the sketch algebra, so a month-level distinct count
  touches 30 sketch rows, not 100 TB of raw events. Spark ships the
  Apache DataSketches HLL bindings (``hll_sketch_agg`` /
  ``hll_union_agg`` / ``hll_sketch_estimate``, JVM-side, mergeable
  partials) — this module is the thin, tested composition layer.

* "Which values dominate the corpus?" — answered by the
  **Misra–Gries** summary (:func:`heavy_hitters`): per-partition
  bounded-memory candidate generation with the classic n/k guarantee,
  a bucket-local union, and an exact confirmation pass over the
  (bounded) candidate set only. The result is EXACT — provably equal
  to the brute-force groupBy-HAVING — while per-executor memory stays
  O(k) regardless of value cardinality. The merge step is the
  mergeable-summaries construction (Agarwal, Cormode, Huang, Phillips,
  Wei, Yi — "Mergeable Summaries", PODS 2012): add counters, subtract
  the k-th largest, drop non-positives.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table, spread
from cae_polars_tools_spark.plans.registry import register

# ---------------------------------------------------------------------------
# HLL distinct-count sketches: build fine, persist, merge coarse
# ---------------------------------------------------------------------------

#: log2 of the HLL register count. 12 → 4096 registers ≈ 1.6 KB per
#: sketch with ~1.6% relative standard error — the DataSketches
#: default trade-off; raise to 14 (~0.8%) when estimates feed billing.
DEFAULT_LG_K = 12


def distinct_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col`` per ``keys`` group — the
    build-once half of the rollup pattern. The output column is plain
    ``binary``: write it to parquet next to the grouping keys and any
    later job (or engine with DataSketches bindings — the wire format
    is the cross-language Apache DataSketches HLL layout) can keep
    merging it. One map-side-combined aggregation; each partial is a
    fixed ≤2^lg_k-register sketch, so the shuffle volume is
    O(groups × 1.6 KB) no matter how many raw rows went in."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    )


def rollup_distinct(
    sketches: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
    est_col: str = "approx_distinct",
) -> DataFrame:
    """Merge fine-grain sketches up to ``keys`` and estimate — the
    query-time half. Sketch union is lossless over the sketch algebra
    (the union of two HLL sketches is exactly the sketch of the union
    of their streams), so rolling day → month → year re-reads sketch
    rows only; the raw corpus is never rescanned. Estimates are
    rounded to whole longs."""
    return sketches.groupBy(*keys).agg(
        F.round(
            F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        )
        .cast("long")
        .alias(est_col)
    )


#: estimate must land within this of exact for the corpus entry's
#: invariant frame (HLL at lg_k=12 has ~1.6% RSE; 5% is >3σ)
SKETCH_REL_TOL = 0.05


@register(
    "sketch_rollup_distinct",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS approx_within_tol
        FROM events
        GROUP BY event_type
    """,
    tags=("sketch", "approx", "scale-path", "extension"),
    window_rank=1,
)
def sketch_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-sketch rollup pattern, value-checked: per
    (event_type, day) HLL sketches of user_id are built at the fine
    grain (the shape a nightly job would persist), then MERGED across
    days per event_type and estimated — month-level distinct users
    without touching raw events again.

    Sketch bits aren't reproducible across engines, so the oracle is
    the q29 invariant-frame contract: the entry outputs the exact
    distinct count (equality-checked against SQL) plus a boolean
    asserting the merged-sketch estimate landed within
    ``SKETCH_REL_TOL`` of it; the oracle emits TRUE. An estimator
    drifting out of tolerance — or a union that loses sketch state —
    flips the boolean and fails the hash match.

    Scale shape: the sketch path shuffles one ≤1.6 KB partial per
    (partition × group); the exact twin exists only to referee the
    estimate and would be dropped in production."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = distinct_sketches(ev, ["event_type", "day"], "user_id")
    merged = rollup_distinct(daily, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    within = (
        F.abs(
            F.col("approx_distinct").cast("double")
            - F.col("exact_users").cast("double")
        )
        / F.col("exact_users")
        <= SKETCH_REL_TOL
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        within.alias("approx_within_tol"),
    )


# ---------------------------------------------------------------------------
# Streaming sketch ingest: append one sketch segment per micro-batch
# ---------------------------------------------------------------------------


def sketch_ingest_sink(
    target_dir: str,
    keys: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
):
    """``foreachBatch`` sink maintaining a persisted HLL sketch table
    from a stream: each micro-batch aggregates to per-``keys``
    sketches (:func:`distinct_sketches`) and lands as its own parquet
    segment ``batch=<id>/``; any later job answers distinct-count
    questions by reading the segments and merging
    (:func:`rollup_distinct`) — the raw stream is never replayed.

    Exactly-once WITHOUT a transaction log: HLL union is IDEMPOTENT
    (registers merge by elementwise max, so unioning the same sketch
    twice is a no-op) — a redelivered micro-batch (foreachBatch's
    at-least-once contract) merging again cannot change any estimate.
    The segment-exists skip below therefore only prevents storage
    bloat; correctness never depended on it. Grouping-invariance of
    the union (same registers whatever the batch boundaries) is what
    makes the streamed table EXACTLY equal the batch-built one —
    equivalence-tested in tests/test_sketches.py.

    Returns the ``(batch_df, batch_id)`` callable for
    ``writeStream.foreachBatch``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns or batch_df.isEmpty():
            return
        seg = _begin_segment(target_dir, batch_id)
        if seg is None:
            return  # replayed batch: segment already committed
        distinct_sketches(
            batch_df, keys, value_col, lg_k=lg_k
        ).write.mode("errorifexists").parquet(seg)

    return sink


def _begin_segment(target_dir: str, batch_id: int) -> str | None:
    """Replay/crash protocol shared by the segment sinks, on the same
    ByteStore seam as the CoW pointer I/O (store-agnostic — a plain
    ``os.path.exists`` would be blind on hdfs://s3a:// targets and a
    redelivered batch would then crash the stream on errorifexists):
    a segment whose ``_SUCCESS`` marker exists is committed → skip
    (None); a segment directory WITHOUT the marker is a crash orphan
    → cleared so the rewrite lands cleanly; otherwise the caller
    writes fresh. Returns the segment path to write, or None."""
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    store = ByteStore.for_path(target_dir)
    seg_name = f"batch={batch_id}"
    if store.get(f"{seg_name}/_SUCCESS") is not None:
        return None
    if store.list_prefix(seg_name):
        store.delete_prefix(seg_name)
    return f"{target_dir.rstrip('/')}/{seg_name}"


def compact_sketch_segments(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge a segment buildup (one sketch row per key per
    micro-batch) into one row per key — union associativity means the
    compacted table answers every rollup identically (tested). Output
    is a fresh dataset: the swap stays the caller's atomic pointer
    flip, the CoW convention of this engine's storage layer."""
    allseg = spark.read.parquet(src_dir)
    merged = allseg.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    merged.write.mode("errorifexists").parquet(dst_dir)
    return spark.read.parquet(dst_dir)


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters: bounded-memory candidates + exact confirm
# ---------------------------------------------------------------------------


def _mg_candidates(col: str, k: int):
    """Per-partition Misra–Gries summary over ``col``, vectorized:
    each Arrow batch is counted with pandas ``value_counts`` (no
    per-row Python), merged into the running ≤(k−1)-counter summary,
    and truncated with the mergeable-summaries step (subtract the k-th
    largest count, drop non-positives). Any value whose frequency in
    this partition exceeds n_partition/k survives to the end — the
    classic MG guarantee, preserved under batch merge (Mergeable
    Summaries, PODS 2012, Lemma 1).

    Memory: O(k + batch-distinct), not a pure O(k) — within one Arrow
    batch ``value_counts`` materializes that batch's distinct values
    before the truncation step. Harmless at default batch sizes
    (≤10k rows/batch caps batch-distinct at the batch size); a
    strictly-O(k) variant would have to truncate per chunk inside the
    batch loop at ~k× the Python overhead."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > k - 1:
                kth = sorted(counts.values(), reverse=True)[k - 1]
                counts = {
                    v: c - kth for v, c in counts.items() if c > kth
                }
        yield pd.DataFrame({col: list(counts.keys())})

    return gen


def confirm_heavy_hitters(
    df: DataFrame, candidates: DataFrame, col: str, k: int
) -> DataFrame:
    """Exact confirmation stage shared by the batch and streaming
    paths: count ONLY candidate rows (broadcast semi-join filters the
    corpus map-side) and keep values with count·k > n — integer
    threshold, engine-identical. Correct whenever ``candidates`` ⊇
    the true heavy hitters, which both producers guarantee."""
    total = df.select(F.count(F.lit(1)).alias("_n"))
    confirmed = (
        df.join(F.broadcast(candidates.select(col).distinct()), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        confirmed.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * k > F.col("_n"))
        .drop("_n")
    )


def hh_candidate_sink(target_dir: str, col: str, k: int):
    """``foreachBatch`` sink maintaining a streaming heavy-hitter
    candidate table: each micro-batch's Misra–Gries candidates
    (≤(k−1) values per partition, :func:`_mg_candidates`) land as a
    parquet segment ``batch=<id>/``.

    Why the accumulated union still covers the truth over the WHOLE
    stream: a value with total frequency > n/k must exceed n_b/k in
    at least one micro-batch b (pigeonhole over batches, since
    n = Σ n_b), and inside that batch it exceeds n_p/k in at least
    one partition (pigeonhole again) — so the per-partition MG of
    that batch keeps it. The exact answer then comes from
    :func:`confirm_heavy_hitters` over the accumulated corpus, or the
    raw candidate table feeds monitoring directly. Replays are
    handled the segment way (skip if the segment landed); a replayed
    batch could only ADD already-present candidates anyway —
    supersets stay supersets, so at-least-once is safe here too.

    Returns the ``(batch_df, batch_id)`` callable for
    ``writeStream.foreachBatch``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns or batch_df.isEmpty():
            return
        seg = _begin_segment(target_dir, batch_id)
        if seg is None:
            return  # committed replay
        (
            batch_df.mapInPandas(
                _mg_candidates(col, k), schema=f"{col} string"
            )
            .distinct()
            .write.mode("errorifexists")
            .parquet(seg)
        )

    return sink


def heavy_hitters(
    df: DataFrame, col: str, k: int
) -> DataFrame:
    """EXACT heavy hitters: every value of ``col`` occurring more than
    n/k times, with its exact count — equal to the brute-force
    ``GROUP BY … HAVING count·k > n``, but with per-executor memory
    bounded at O(k) instead of O(distinct values).

    Why the candidate set provably covers the truth: a value with
    global frequency > n/k = Σ n_p/k must, by pigeonhole, exceed
    n_p/k in at least one partition p, and the per-partition MG
    summary keeps every such value. The confirmation pass then counts
    ONLY candidate rows exactly (the non-candidate corpus is filtered
    map-side before the shuffle) and applies the integer threshold
    count·k > n — no float division, so every engine cuts the same
    set.

    Scale shape: TWO corpus scans total. The candidate pass
    (mapInPandas, ≤(k−1) candidate strings per partition) also carries
    the corpus row count as an ``observe`` metric — the total rides
    the same scan instead of a third one. Candidates are collected
    (bounded: partitions × (k−1) strings — the same driver-side
    footprint the broadcast needed anyway) and flow back as a
    broadcast semi-join; the confirm aggregation shuffles one partial
    per (partition × candidate) and cuts against the observed total
    as a literal. Nothing anywhere is proportional to value
    cardinality.

    Snapshot semantics: the candidate pass executes EAGERLY here (the
    observe metric needs an action), so the candidate set and the
    total are a snapshot of ``df`` at build time — re-executing the
    returned plan over a source that gained files since will count
    occurrences against the stale total. For static inputs (the
    batch-corpus contract) this is invisible; over a moving directory,
    rebuild per run — or use the streaming pair
    (:func:`hh_candidate_sink` + :func:`confirm_heavy_hitters`),
    whose single-action confirm computes count and total in one
    consistent snapshot."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    cand_rows = observed.mapInPandas(
        _mg_candidates(col, k), schema=f"{col} string"
    ).distinct().collect()
    n_total = obs.get["n"]
    cands = df.sparkSession.createDataFrame(
        [(r[col],) for r in cand_rows], f"{col} string"
    )
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * k > F.lit(n_total))
    )


#: heavy-hitter threshold for the corpus entry: tokens above 1% of the
#: total token stream
HH_K = 100


@register(
    "text_heavy_hitters",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        tot AS (SELECT COUNT(*) AS n FROM tok)
        SELECT token,
               COUNT(*) AS n_occurrences
        FROM tok, tot
        GROUP BY token, tot.n
        HAVING COUNT(*) * {HH_K} > tot.n
    """,
    tags=("sketch", "text", "scale-path", "extension"),
    window_rank=1,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant tokens of the corpus (frequency > n/{HH_K}) via the
    Misra–Gries bounded-memory path — the boilerplate/stopword
    detector that runs where an exact full-vocabulary groupBy would
    not (per-executor memory O(k), not O(vocabulary)). The oracle IS
    the brute-force SQL census, because :func:`heavy_hitters` is
    provably exact (candidates ⊇ truth + exact confirm); integer
    threshold math keeps the cut engine-identical."""
    from cae_polars_tools_spark.operators.text import tokens

    d = spread(read_table(spark, sf_dir, "documents"))
    toks = d.select(F.explode(tokens("text")).alias("token"))
    return heavy_hitters(toks, "token", HH_K)

"""Training-data pipeline utilities: deterministic splits, stratified
sampling, and sequence packing.

Beyond the reference surface (which has no pipeline tooling at all) —
these are the bookkeeping operators a 100 TB pretraining pipeline runs
between dedup and tokenization. All three are shuffle-free or
shuffle-bounded by design:

* ``split_by_hash`` — zero shuffle, zero state: membership is a pure
  function of the row key, so it is stable across runs, engines,
  repartitions, and incremental arrivals (a re-crawled document lands
  in the same split forever).
* ``stratified_sample`` — per-stratum Bernoulli sampling (zero
  shuffle) or an exact per-stratum quota (one window shuffle keyed by
  stratum).
* ``pack_sequences`` — partition-local first-fit-decreasing bin
  packing inside ``mapInPandas``: each task packs only its own rows,
  so the operator scales embarrassingly; global pack ids are
  (partition, local) encoded without any coordination.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_BUCKETS = 1_000_000


def md5_rank(col: str, seed: int) -> Column:
    """The engine-portable deterministic rank: md5 over
    ``CAST(col AS string) || ':' || seed``. Hex digests compare
    identically in every engine, and the DuckDB transcription is
    ``md5(CAST(col AS VARCHAR) || ':seed')`` — shared by
    :func:`mix_sources` (threshold membership) and
    :func:`cap_per_key` (per-key ordering) so the portability
    contract lives in exactly one expression."""
    return F.md5(F.concat(F.col(col).cast("string"), F.lit(f":{seed}")))


def split_by_hash(
    df: DataFrame,
    key_col: str | Column,
    weights: dict[str, float],
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic, stateless dataset split: adds a ``split`` column
    assigning each row to one of ``weights``' names with the given
    proportions.

    Membership is a pure row-local hash-range test — no shuffle, no
    sampling state, and the assignment survives reruns and data
    growth: everything a random split cannot guarantee. Rows with
    equal keys (e.g. near-identical URLs crawled twice) always land in
    the same split, which is exactly the leakage-prevention property a
    train/test split needs.

    ``hash_fn`` picks the hash family:

    * ``"xxhash64"`` (default) — ``xxhash64(key, seed) mod 1e6``
      sub-ranges, evaluated JVM-side inside codegen; fastest, but the
      hash is Spark-specific.
    * ``"md5"`` — the first 8 hex chars of ``md5(key:seed)`` against
      cumulative hex thresholds (the :func:`mix_sources` convention).
      ENGINE-PORTABLE: any system with md5 (DuckDB, Postgres, Python)
      recomputes the exact membership, which is what an audit or a
      cross-engine migration of a frozen train/val/test split needs.
    """
    bad = {k: w for k, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    names = list(weights)
    if hash_fn == "md5":
        h8 = F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, 8
        )
        expr = None
        cum = 0.0
        for name in names[:-1]:
            cum += weights[name] / total
            thr = format(min(int(cum * MIX_HASH_SPACE), 2**32 - 1), "08x")
            cond = h8 < F.lit(thr)
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
        return df.withColumn("split", expr)
    if hash_fn != "xxhash64":
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64|md5)")
    bucket = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_HASH_BUCKETS))

    expr = None
    upper = 0.0
    for name in names[:-1]:
        upper += weights[name] / total * _HASH_BUCKETS
        cond = bucket < F.lit(int(round(upper)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: float | dict,
    seed: int = 0,
    exact: bool = False,
    rank_cols: list[str] | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum sampling for class-balanced corpora.

    ``exact=False`` (default): Bernoulli per stratum — zero shuffle,
    size is binomial around the target; a scalar fraction is a plain
    ``sample`` (statistically identical per stratum, and it skips the
    full-table distinct scan a ``sampleBy`` fraction map would need).
    ``exact=True``: exactly ``ceil(fraction · n)`` rows per stratum,
    chosen by ranking rows on a seeded hash inside a per-stratum
    window — one shuffle on the stratum key, deterministic for a given
    seed, and the hash ranking (not ``rand()``) keeps the choice
    reproducible across runs and retries. The hash covers
    ``rank_cols`` when given (pass a unique id column for frames with
    MapType columns, which xxhash64 cannot consume, or with fully
    duplicate rows, whose ties would rank arbitrarily), else all
    columns. Use exact quotas when a downstream contract needs them;
    the Bernoulli form at 100 TB avoids the stratum-keyed sort
    entirely.

    ``hash_fn`` picks the exact-mode rank (the ``weighted_sample``
    convention): ``"xxhash64"`` (default, JVM-native, fastest) or
    ``"md5"`` — ENGINE-PORTABLE (any system with md5 ranks the same
    rows), requiring exactly one ``rank_cols`` column; the DuckDB
    oracle of ``q85_stratified_sample`` pins the portable form
    value-for-value.

    Drop semantics (both modes): rows whose stratum is NOT a key of
    the ``fractions`` dict are dropped, and so are NULL-stratum rows —
    ``sampleBy`` ignores unlisted keys, and the exact path's inner
    join never matches nulls. Pre-filter or fill nulls upstream if
    they must be kept. Driver-memory note: a SCALAR fraction with
    ``exact=True`` collects the distinct strata to the driver to build
    the quota map — fine for class labels or language codes, wrong for
    unbounded-cardinality strata (pass an explicit dict there)."""
    if not isinstance(fractions, dict):
        f = float(fractions)
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fractions outside [0, 1]: {f}")
        if not exact:
            return df.sample(fraction=f, seed=seed)
        uniq = [r[0] for r in df.select(strata_col).distinct().collect()]
        fractions = {v: f for v in uniq}
    bad = {k: fr for k, fr in fractions.items() if not 0.0 <= fr <= 1.0}
    if bad:
        raise ValueError(f"fractions outside [0, 1]: {bad}")
    if not exact:
        return df.sampleBy(strata_col, fractions, seed=seed)

    from pyspark.sql import Window

    spark = df.sparkSession
    frac = spark.createDataFrame(
        [(k, float(f)) for k, f in fractions.items()],
        schema=f"{strata_col} {dict(df.dtypes)[strata_col]}, __frac double",
    )
    if hash_fn == "md5":
        if not rank_cols or len(rank_cols) != 1:
            raise ValueError(
                "hash_fn='md5' needs exactly one rank_cols column "
                "(the portable rank hashes one key: md5('key:seed'))"
            )
        rank_expr = md5_rank(rank_cols[0], seed)
    elif hash_fn == "xxhash64":
        rank_expr = F.xxhash64(
            F.struct(*(rank_cols if rank_cols else df.columns)),
            F.lit(seed),
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    w = Window.partitionBy(strata_col).orderBy(rank_expr)
    counts = Window.partitionBy(strata_col)
    return (
        df.join(F.broadcast(frac), strata_col, "inner")
        .withColumn("__rank", F.row_number().over(w))
        .withColumn("__quota", F.ceil(F.count(F.lit(1)).over(counts) * F.col("__frac")))
        .filter(F.col("__rank") <= F.col("__quota"))
        .drop("__rank", "__quota", "__frac")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    max_open_packs: int = 1024,
) -> DataFrame:
    """Greedy sequence packing: group documents into packs whose token
    sums stay ≤ ``budget`` (the LLM-training sample-packing step that
    turns ragged documents into dense fixed-context batches).

    First-fit-decreasing runs PER PARTITION inside ``mapInPandas``:
    the task buffers only its (id, tokens) bookkeeping pairs — 16
    bytes/row, never document payloads — so the whole partition sorts
    descending as one unit (true FFD, ≤ 11/9·OPT + 1 per partition)
    regardless of how Arrow batches it. No shuffle, no global state;
    cross-partition packing would buy marginally denser packs at the
    cost of a global coordination step, the wrong trade at scale.
    Pack ids are globally unique without coordination:
    ``(spark_partition_id << 40) | local_pack_index``.

    ``max_open_packs`` bounds per-document work: when the open list
    overflows, the fullest pack (least remaining room — the least
    useful to future, smaller documents) is closed, keeping the task
    O(n · max_open_packs) instead of quadratic on adversarial size
    distributions, with negligible density cost.

    A single document longer than ``budget`` gets a pack of its own
    (callers chunk or drop oversized docs upstream); output columns
    are ``(id_col, pack_id, token_col, pack_tokens)`` with
    ``pack_tokens`` the pack's total, repeated on every member row.

    ``id_col`` passes through with its ORIGINAL type — string/UUID doc
    ids (the common shape in real crawls) survive unchanged; only
    ``token_col`` is cast (to long). Complex-typed ids (array/map/
    struct) are rejected up front: they have no stable Arrow↔pandas
    round-trip as a passthrough key and no equality semantics a pack
    membership row should depend on.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if max_open_packs < 1:
        raise ValueError("max_open_packs must be at least 1")
    id_type = dict(df.dtypes)[id_col]
    if any(id_type.startswith(t) for t in ("array", "map", "struct")):
        raise TypeError(
            f"pack_sequences: id column {id_col!r} has complex type "
            f"{id_type}; use an atomic id (string/int) column"
        )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        base = pid << 40
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        # ids stay in their native dtype (object for strings) — they
        # are a passthrough payload, never arithmetic operands
        ids = np.concatenate([c[id_col].to_numpy() for c in chunks])
        toks = np.concatenate(
            [c[token_col].to_numpy() for c in chunks]
        ).astype(np.int64)
        order = np.argsort(-toks, kind="stable")  # first-fit-DECREASING
        open_room: list[int] = []  # remaining budget per open pack
        open_ids: list[int] = []
        out_pack = np.empty(len(ids), dtype=np.int64)
        next_local = 0
        for i in order:
            t = int(toks[i])
            placed = False
            for j, room in enumerate(open_room):
                if t <= room:
                    open_room[j] -= t
                    out_pack[i] = open_ids[j]
                    placed = True
                    break
            if not placed:
                pack_id = base + next_local
                next_local += 1
                open_ids.append(pack_id)
                open_room.append(max(0, budget - t))
                out_pack[i] = pack_id
                if len(open_room) > max_open_packs:
                    full = min(
                        range(len(open_room)), key=open_room.__getitem__
                    )
                    open_room.pop(full)
                    open_ids.pop(full)
        yield pd.DataFrame(
            {id_col: ids, "pack_id": out_pack, token_col: toks}
        )

    from pyspark.sql import Window

    packed = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias(token_col),
    ).mapInPandas(
        pack, schema=f"{id_col} {id_type}, pack_id long, {token_col} long"
    )
    # per-pack totals: the window shuffles only the (doc, pack, tokens)
    # bookkeeping rows, never document payloads
    return packed.withColumn(
        "pack_tokens", F.sum(token_col).over(Window.partitionBy("pack_id"))
    )


DECONTAM_NGRAM = 13  # the GPT-3/PaLM-style decontamination window


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = DECONTAM_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination detection: for each corpus document,
    the number of distinct ``ngram``-token windows it shares with ANY
    benchmark document — the standard eval-decontamination signal
    (long verbatim n-gram overlap; 13 tokens is the published
    convention).

    Scale shape: both sides reduce to 64-bit window hashes (the dedup
    module's rolling-hash kernel — bytes never re-materialize as
    strings), the benchmark side collapses to its DISTINCT hash set —
    eval suites are tiny next to a training corpus, so it broadcasts
    (~8 B per distinct window) and the corpus-side scan never
    shuffles. For an unusually large benchmark union pass
    ``broadcast_benchmark=False`` to fall back to a hash-keyed shuffle
    join. Returns ``(id_col, n_hits)`` for contaminated docs only.
    """
    from cae_polars_tools_spark.operators.dedup import hashed_shingles

    b = benchmark.select(
        F.explode(hashed_shingles(F.col(text_col), ngram)).alias("g")
    ).distinct()
    return _hits_vs_hashes(
        corpus, b, ngram, id_col, text_col, broadcast_benchmark
    )


def _hits_vs_hashes(
    corpus: DataFrame,
    benchmark_hashes: DataFrame,
    ngram: int,
    id_col: str,
    text_col: str,
    broadcast_benchmark: bool,
) -> DataFrame:
    """The contamination core against a PRE-HASHED benchmark window
    set ``(g)`` — shared by the batch path (which derives the hashes
    per call) and the streaming sink (which derives them ONCE and
    caches across micro-batches)."""
    from cae_polars_tools_spark.operators.dedup import hashed_shingles

    c = corpus.select(
        F.col(id_col),
        F.explode(hashed_shingles(F.col(text_col), ngram)).alias("g"),
    )
    b = (
        F.broadcast(benchmark_hashes)
        if broadcast_benchmark
        else benchmark_hashes
    )
    return (
        c.join(b, "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = DECONTAM_NGRAM,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Drop corpus documents sharing ≥ ``min_hits`` distinct
    ``ngram``-token windows with the benchmark set (anti-join on the
    flagged ids — the corpus payload rows never shuffle)."""
    flagged = contamination_hits(
        corpus,
        benchmark,
        ngram=ngram,
        id_col=id_col,
        text_col=text_col,
        broadcast_benchmark=broadcast_benchmark,
    ).filter(F.col("n_hits") >= min_hits)
    ids = flagged.select(id_col)
    if broadcast_benchmark:
        # flagged ids are bounded by docs-overlapping-the-(small)-
        # benchmark — broadcast keeps the anti-join shuffle-free
        ids = F.broadcast(ids)
    # broadcast_benchmark=False signals the large regime: a heavily
    # mirrored benchmark can flag an unbounded share of the corpus, so
    # let the planner pick a shuffle anti-join
    return corpus.join(ids, id_col, "left_anti")


def build_hash_bloom(
    hashes: DataFrame,
    n_items: int | None = None,
    fpp: float = 0.01,
    hash_col: str = "g",
) -> tuple[bytes, int, int]:
    """Bloom filter over a column of 64-bit hashes, built WITHOUT ever
    collecting the hashes: the k bit positions per hash are computed
    JVM-side (``pmod(xxhash64(g, i), m)`` — the same expression the
    probe uses, so build/probe consistency is by construction, not by
    re-implementing Spark's xxhash64 in Python), DISTINCT-ed (one
    shuffle bounded by the bitmap size m, never by |hashes|), and the
    set-bit positions stream to the driver where a numpy pass sets
    them. Driver memory is O(set bits) ≤ m — the size YOU chose via
    ``fpp`` — instead of O(|benchmark| · bytes-per-ngram) for an exact
    broadcast set. Returns ``(bitmap_bytes, m_bits, k)``.

    Standard sizing: m = ⌈-n·ln p / ln²2⌉, k = round(m/n · ln 2)
    (Bloom 1970). No false negatives ever; callers that need exact
    semantics verify survivors (see :func:`contamination_hits_bloom`).
    """
    import math

    if n_items is None:
        n_items = hashes.select(hash_col).distinct().count()
    n = max(1, int(n_items))
    m = math.ceil(-n * math.log(max(fpp, 1e-12)) / math.log(2) ** 2)
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, round(m / n * math.log(2)))
    pos = (
        hashes.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(hash_col, F.lit(i)), F.lit(m))
                        for i in range(k)
                    ]
                )
            ).alias("p")
        )
        .distinct()
    )
    bitmap = np.zeros(m // 8, dtype=np.uint8)
    # arrow-batched driver transfer: each batch is one vectorized
    # numpy bit-set pass; total driver traffic ≤ m positions
    for batch in pos.toArrow().to_batches():
        p = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        np.bitwise_or.at(bitmap, p >> 3, (1 << (p & 7)).astype(np.uint8))
    return bitmap.tobytes(), m, k


def _bloom_member_udf(spark, bitmap: bytes):
    """Vectorized membership test: the k bit positions arrive as k
    SEPARATE long columns (computed JVM-side), NOT one array<long> —
    an array column reaches pandas as an object-dtype Series of
    per-row numpy arrays, and the ``np.array(pos.tolist())``
    flattening was a row-at-a-time Python loop over every corpus
    window (profiled round 16: ~28 executor core-s of run-vs-CPU gap
    on pipeline_decontaminate_bloom). Flat long columns stay int64
    end to end: Arrow transfer is columnar and the kernel is k
    zero-copy vector passes. The bitmap ships once per executor as a
    Spark broadcast, not per task in the UDF closure."""
    import pandas as pd
    from pyspark.sql.types import BooleanType

    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def member(*cols: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        n = len(cols[0])
        if not n:
            return pd.Series([], dtype=bool)
        hit = np.ones(n, dtype=bool)
        for c in cols:
            p = c.to_numpy(dtype=np.int64, copy=False)
            hit &= (bm[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(hit)

    return member, bc


def contamination_hits_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = DECONTAM_NGRAM,
    fpp: float = 0.001,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`contamination_hits` for the LARGE-benchmark regime —
    the case ``broadcast_benchmark=True`` can't serve (an exact
    distinct-hash broadcast of a 1B-window benchmark is ~8 GB per
    executor) and ``broadcast_benchmark=False`` serves badly (the
    full corpus n-gram stream shuffles against it). Three stages,
    EXACT final semantics:

    1. **Bloom build** (:func:`build_hash_bloom`): one pass over the
       benchmark windows; the bitmap is ~10 bits per distinct window
       at fpp=1e-3 — 60× smaller than the exact hash set.
    2. **Map-side prune**: every corpus window probes the broadcast
       bitmap in a vectorized Arrow UDF — NO shuffle of corpus data;
       survivors are true hits plus an fpp fraction of false
       positives.
    3. **Exact verify**: only the pruned survivors join the true
       benchmark hash set (Bloom has no false negatives, so the join
       removes exactly the false positives) — the shuffle that
       remains moves ~fpp·|corpus windows| + |true hits| rows
       instead of the whole corpus stream.

    Returns ``(id_col, n_hits)`` for contaminated docs only —
    equivalence with :func:`contamination_hits` is test-pinned."""
    from cae_polars_tools_spark.operators.dedup import hashed_shingles

    spark = corpus.sparkSession
    bh = (
        benchmark.select(
            F.explode(hashed_shingles(F.col(text_col), ngram)).alias("g")
        )
        .distinct()
        .persist()
    )
    try:
        n = bh.count()
        bitmap, m, k = build_hash_bloom(bh, n_items=n, fpp=fpp)
        member, _bc = _bloom_member_udf(spark, bitmap)
        pos = [
            F.pmod(F.xxhash64("g", F.lit(i)), F.lit(m)) for i in range(k)
        ]
        cand = corpus.select(
            F.col(id_col),
            F.explode(hashed_shingles(F.col(text_col), ngram)).alias("g"),
        ).filter(member(*pos))
        # exact verify; AQE broadcasts whichever side is small at
        # runtime (at true scale both are modest: pruned corpus
        # windows vs the benchmark hash table)
        out = (
            cand.join(bh, "g", "left_semi")
            .groupBy(id_col)
            .agg(F.count_distinct("g").alias("n_hits"))
        )
        # materialization fence is the caller's action; releasing the
        # benchmark cache rides the returned plan handle. The bitmap
        # broadcast deliberately does NOT: callers derive from this
        # frame and drop the handle (decontaminate_bloom does), and a
        # broadcast destroy() is HARD — executors fail mid-plan —
        # where an unpersist merely recomputes. One transient bitmap
        # per batch call is bounded; the long-lived form
        # (decontaminate_sink) owns its bitmap via the sink closure
        # and destroys it when the sink drops.
        from cae_polars_tools_spark.operators.dedup import _release_on_gc

        return _release_on_gc(out, bh)
    except Exception:
        bh.unpersist()
        raise


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = DECONTAM_NGRAM,
    min_hits: int = 1,
    fpp: float = 0.001,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`decontaminate` with the Bloom-prefiltered hit stage —
    identical output (exact verify removes every false positive),
    built for the benchmark-too-big-to-broadcast regime."""
    flagged = contamination_hits_bloom(
        corpus, benchmark, ngram=ngram, fpp=fpp,
        id_col=id_col, text_col=text_col,
    ).filter(F.col("n_hits") >= min_hits)
    # NO broadcast hint on the flagged ids: this function exists for
    # the regime where the benchmark is huge, and a heavily mirrored
    # benchmark can flag an unbounded share of the corpus (the same
    # reason decontaminate()'s broadcast_benchmark=False path doesn't
    # hint) — AQE broadcasts at runtime when the set is actually small
    return corpus.join(flagged.select(id_col), id_col, "left_anti")


def decontaminate_sink(
    benchmark: DataFrame,
    clean_path: str,
    ngram: int = DECONTAM_NGRAM,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_bloom: bool = False,
    fpp: float = 0.001,
):
    """``writeStream.foreachBatch`` sink decontaminating a document
    stream against a FIXED benchmark set: each micro-batch drops docs
    sharing ≥ ``min_hits`` distinct ``ngram``-token windows with any
    benchmark document, and survivors append to the ``clean_path``
    parquet table — the streaming twin of :func:`decontaminate`, so
    an ingestion pipeline never lands contaminated documents at all.

    The benchmark's distinct window-hash set is derived ONCE at sink
    construction and persisted across micro-batches (eval suites
    change rarely; re-deriving per trigger would re-explode the
    benchmark every few seconds); the cache releases when the sink
    callable itself is dropped. Replay safety is ID-LEVEL, the
    ingest-sink rule: the batch dedups within itself and anti-joins
    ids already in the clean table, so a redelivered micro-batch
    (foreachBatch's at-least-once contract) appends nothing — the
    sink is effectively-once for stable doc ids. A contaminated doc
    is dropped deterministically on every delivery (the benchmark is
    fixed), so replays converge.

    The clean-table id set carries NO broadcast hint: it grows for
    the stream's lifetime, and a forced broadcast of it would
    eventually slow every trigger and OOM executors (the
    BATCH_BROADCAST_MAX rule — only batch-bounded sides get hints);
    AQE still broadcasts it at runtime while it is actually small.

    ``use_bloom=True`` is the benchmark-too-big-to-broadcast regime
    (:func:`decontaminate_bloom`'s sink twin): the bitmap builds once
    at construction (~10 bits per distinct benchmark window at
    fpp=1e-3), ships once per executor as a Spark broadcast, prunes
    each micro-batch's windows map-side, and the exact verify join
    against the persisted hash set — unhinted, AQE decides — removes
    every false positive. Output is identical across the switch
    (stream≡batch equivalence is test-pinned); only the physical
    plan changes."""
    from pyspark.errors import AnalysisException

    from cae_polars_tools_spark.operators.dedup import hashed_shingles

    spark0 = benchmark.sparkSession
    bh = (
        benchmark.select(
            F.explode(hashed_shingles(F.col(text_col), ngram)).alias("g")
        )
        .distinct()
        .persist()
    )
    n_windows = bh.count()  # materialize once, at construction
    if use_bloom:
        bitmap, m, k = build_hash_bloom(bh, n_items=n_windows, fpp=fpp)
        member, bloom_bc = _bloom_member_udf(spark0, bitmap)
        probe_pos = [
            F.pmod(F.xxhash64("g", F.lit(i)), F.lit(m)) for i in range(k)
        ]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([id_col])
        try:
            seen = spark.read.parquet(clean_path).select(id_col)
            batch = batch.join(seen, id_col, "left_anti")
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise  # transient read failure: retry, don't duplicate
        if use_bloom:
            # map-side bitmap prune, then exact verify (no false
            # negatives → the semi-join removes exactly the false
            # positives); neither side hinted — the benchmark hash
            # set is the too-big-to-broadcast premise of this mode
            cand = batch.select(
                F.col(id_col),
                F.explode(
                    hashed_shingles(F.col(text_col), ngram)
                ).alias("g"),
            ).filter(member(*probe_pos))
            flagged = (
                cand.join(bh, "g", "left_semi")
                .groupBy(id_col)
                .agg(F.count_distinct("g").alias("n_hits"))
                .filter(F.col("n_hits") >= min_hits)
            )
        else:
            flagged = _hits_vs_hashes(
                batch, bh, ngram, id_col, text_col,
                broadcast_benchmark=True,
            ).filter(F.col("n_hits") >= min_hits)
        survivors = batch.join(
            F.broadcast(flagged.select(id_col)), id_col, "left_anti"
        )
        # the anti-join above reads the table this writes —
        # localCheckpoint severs the lineage (the ingest-sink rule);
        # its RDD blocks release as soon as the write lands (a
        # long-lived stream must not accumulate one pinned batch per
        # trigger until JVM GC)
        from cae_polars_tools_spark.operators.dedup import (
            _checkpoint_rdd,
        )

        ck = survivors.localCheckpoint()
        try:
            ck.write.mode("append").parquet(clean_path)
        finally:
            if (r := _checkpoint_rdd(ck)) is not None:
                _unpersist_quietly([r])

    # release the construction-time benchmark cache when the sink
    # callable is dropped (the _release_on_gc convention, applied to
    # a function handle): a session cycling decontamination sinks
    # must not accumulate one cached hash set per sink
    import weakref

    from cae_polars_tools_spark.operators.dedup import (
        _unpersist_quietly,
    )

    handles = []
    if (j := getattr(bh, "_jdf", None)) is not None:
        handles.append(j)
    if handles:
        weakref.finalize(sink, _unpersist_quietly, handles)
    if use_bloom:
        # the per-executor bitmap broadcast dies with the sink too —
        # a session cycling bloom sinks must not accumulate one
        # undestroyed bitmap per sink on every executor
        def _drop_bitmap(b=bloom_bc):
            try:
                b.destroy()
            except Exception:
                pass  # session already stopped

        weakref.finalize(sink, _drop_bitmap)
    return sink


__all__ = [
    "split_by_hash",
    "stratified_sample",
    "pack_sequences",
    "contamination_hits",
    "decontaminate",
    "build_hash_bloom",
    "contamination_hits_bloom",
    "decontaminate_bloom",
    "decontaminate_sink",
]


# ---------------------------------------------------------------------------
# Corpus entry: the split → pack tail of the ingest pipeline, timed by
# bench.py and smoke-checked by the driver like every other operator.
# ---------------------------------------------------------------------------

from cae_polars_tools_spark.io import read_table, spread  # noqa: E402
from cae_polars_tools_spark.plans.registry import register  # noqa: E402

PACK_BUDGET = 512
SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


_TRAIN_THR = format(
    int(SPLIT_WEIGHTS["train"] * 4294967296.0), "08x"
)  # md5 split threshold for the 0.9 train share


@register(
    "pipeline_split_pack",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               TRUE AS pack_within_budget
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)
              < '{_TRAIN_THR}'
    """,
    tags=("pipeline", "extension"),
)
def pipeline_split_pack(spark, sf_dir: str) -> DataFrame:
    """Deterministic train split of the documents table, packed into
    fixed token budgets — the split→pack tail every pretraining
    pipeline runs after dedup. Zero-shuffle split (engine-portable md5
    hash-range membership) feeding a partition-local
    first-fit-decreasing packer in ``mapInPandas``.

    Value-level oracle coverage (previously rows-only): the md5 split
    has an exact DuckDB twin, so membership (every train doc exactly
    once — coverage AND no duplication), per-doc token counts, and the
    packer's budget invariant (``pack_within_budget`` must hash-match
    the oracle's constant TRUE on every row) are all value-checked.
    Pack COMPOSITION stays deliberately partition-local
    (coordination-free by design) and is invariant-tested in
    tests/test_pipeline_ops.py."""
    from cae_polars_tools_spark.operators.text import tokens

    d = spread(read_table(spark, sf_dir, "documents"))
    train = (
        split_by_hash(d, "doc_id", SPLIT_WEIGHTS, hash_fn="md5")
        .filter(F.col("split") == "train")
        .select(
            "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
        )
    )
    return pack_sequences(train, budget=PACK_BUDGET).select(
        "doc_id",
        "n_tokens",
        (F.col("pack_tokens") <= F.lit(PACK_BUDGET)).alias(
            "pack_within_budget"
        ),
    )


MIX_HASH_SPACE = 4294967296.0  # 16^8 — first 8 hex chars of md5


def mix_sources(
    df: DataFrame,
    source_col: str,
    weight_of: Callable[[Column], Column],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic data mixing: downsample each source so the kept
    corpus follows the target weight mixture while keeping as many
    rows as possible (water-filling: the most over-weighted source
    keeps everything, the rest thin proportionally).

    ``weight_of`` maps the source column to its target weight (a
    relative share, any positive scale). Per-source keep fraction =
    ``w_s·K / n_s`` with ``K = min_s(n_s / w_s)``. Selection is a pure
    row-local predicate — the first 8 hex chars of ``md5(key:seed)``
    against the source's fraction threshold — so membership is
    deterministic across runs, engines, repartitions, and incremental
    arrivals (the same leakage-safety property as
    :func:`split_by_hash`). The whole operator is one bounded
    aggregation (|sources| rows) broadcast back onto a map-side
    filter: no corpus shuffle at any scale. md5-hex thresholding
    (rather than xxhash) keeps the predicate bit-portable to the SQL
    oracle."""
    src = F.col(source_col)
    raw_w = weight_of(F.col("_mix_src")).cast("double")
    # fail loudly on null/non-positive weights: a weight_of missing its
    # .otherwise() branch yields NULL, which would silently drop every
    # row of the affected sources (NULL threshold -> NULL filter) and
    # skew K via min()'s null-skipping
    checked_w = F.when(
        raw_w.isNull() | (raw_w <= 0.0),
        F.raise_error(
            F.concat(
                F.lit("mix_sources: weight_of returned "),
                F.coalesce(raw_w.cast("string"), F.lit("NULL")),
                F.lit(" for source "),
                F.col("_mix_src").cast("string"),
                F.lit(" — weights must be positive for every source"),
            )
        ),
    ).otherwise(raw_w)
    counts = (
        df.groupBy(src.alias("_mix_src"))
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_w", checked_w)
    )
    k = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_k"))
    frac = F.col("_w") * F.col("_k") / F.col("_n")
    thr = F.lpad(
        F.lower(F.hex(F.floor(frac * F.lit(MIX_HASH_SPACE)).cast("bigint"))),
        8,
        "0",
    )
    plan = counts.crossJoin(F.broadcast(k)).select(
        "_mix_src", frac.alias("_frac"), thr.alias("_thr")
    )
    h8 = F.substring(md5_rank(key_col, seed), 1, 8)
    return (
        df.join(F.broadcast(plan), src == F.col("_mix_src"))
        .filter((F.col("_frac") >= 1.0) | (h8 < F.col("_thr")))
        .drop("_mix_src", "_frac", "_thr")
    )


MIX_SEED = 42


@register(
    "pipeline_mix_sources",
    oracle=f"""
        WITH counts AS (
            SELECT source AS s,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CASE WHEN source LIKE 'src1_' THEN 3.0 ELSE 1.0 END AS w
            FROM documents GROUP BY source
        ),
        k AS (SELECT MIN(n / w) AS k FROM counts),
        plan AS (
            SELECT s,
                   w * k.k / n AS frac,
                   lpad(lower(to_hex(CAST(floor(w * k.k / n * {MIX_HASH_SPACE}) AS BIGINT))), 8, '0') AS thr
            FROM counts, k
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN plan p ON d.source = p.s
        WHERE p.frac >= 1.0
           OR substr(md5(CAST(d.doc_id AS VARCHAR) || ':{MIX_SEED}'), 1, 8) < p.thr
    """,
    tags=("pipeline", "mixing", "extension"),
    window_rank=1,
)
def pipeline_mix_sources(spark, sf_dir: str) -> DataFrame:
    """Data mixing demo: up-weight the src10-19 half of the corpus 3:1
    against src0-9 — the over-weighted half keeps every row, the rest
    thins to a third, deterministically by md5(doc_id) threshold."""
    d = spread(read_table(spark, sf_dir, "documents"))
    w = lambda s: F.when(s.like("src1_"), F.lit(3.0)).otherwise(F.lit(1.0))
    return mix_sources(d, "source", w, "doc_id", seed=MIX_SEED).select(
        "doc_id", "source"
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    rank_col: str = "doc_id",
    seed: int = 0,
    presalt: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per key — the domain-cap step every
    crawl pipeline runs (C4/RefinedWeb cap documents per registered
    domain so one mega-site cannot dominate the training mix).

    Selection is deterministic and engine-portable: rows rank by
    ``md5(rank_col || ':' || seed)`` (hex compares identically
    everywhere) with ``rank_col`` itself as the total-order
    tie-breaker, so the same corpus always keeps the same rows — no
    ``rand()``, stable under retries, reruns, and engine swaps.

    Scale shape: the plain path is one ``row_number`` window on the
    key — fine until one domain is pathologically hot (a window
    partition cannot be split by AQE, so a 100M-page domain sorts on
    one reducer). ``presalt=S`` inserts a salt-local pre-cap: rank
    within ``(key, salt)`` first and keep ≤ ``cap`` per salt, which
    shrinks the global window's input to ≤ ``cap·S`` rows per key.
    The result is EXACTLY the plain path's: any row in the global
    top-``cap`` has fewer than ``cap`` rows of its own salt ahead of
    it, so it survives the pre-cap. (Same pigeonhole that makes
    salted_agg exact — see operators/skew.py.)
    """
    if cap < 1:
        raise ValueError("cap must be at least 1")
    h = md5_rank(rank_col, seed)
    out_cols = df.columns
    work = df.withColumn("__h", h)
    if presalt is not None:
        if presalt < 1:
            raise ValueError("presalt must be at least 1")
        w_local = Window.partitionBy(key_col, "__salt").orderBy(
            F.col("__h"), F.col(rank_col)
        )
        work = (
            work.withColumn(
                "__salt",
                F.pmod(
                    F.xxhash64(F.col(rank_col), F.lit(seed)),
                    F.lit(presalt),
                ),
            )
            .withColumn("__rn", F.row_number().over(w_local))
            .filter(F.col("__rn") <= cap)
            .drop("__salt", "__rn")
        )
    w_global = Window.partitionBy(key_col).orderBy(F.col("__h"), F.col(rank_col))
    return (
        work.withColumn("__rn", F.row_number().over(w_global))
        .filter(F.col("__rn") <= cap)
        .select(*out_cols)
    )


DOMAIN_CAP = 10
DOMAIN_CAP_SEED = 7


@register(
    "pipeline_domain_cap",
    oracle=f"""
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)
                                    || ':{DOMAIN_CAP_SEED}'),
                                doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= {DOMAIN_CAP}
    """,
    tags=("pipeline", "sampling", "extension"),
    window_rank=1,
)
def pipeline_domain_cap(spark, sf_dir: str) -> DataFrame:
    """Per-source document cap (``source`` standing in for the crawl
    domain): at most DOMAIN_CAP (=10) docs per source, chosen by the
    deterministic md5 rank. Runs the SALTED two-phase path — the hash
    gate proves it equals the plain single-window SQL the oracle
    runs, pinning the pigeonhole argument at driver scale."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return cap_per_key(
        d, "source", DOMAIN_CAP, "doc_id", seed=DOMAIN_CAP_SEED, presalt=4
    ).select("doc_id", "source")


def _curate_e2e_oracle() -> str:
    """The full composed oracle: quality rules -> exact-dedup
    survivors (min doc_id per md5 fingerprint, via a window) ->
    capped-Jaccard near-dup pairs over the SURVIVING subset -> drop
    the larger side of every pair. Built from the same SQL fragments
    the individual stage oracles use, so a mismatch localizes to
    composition. (Imports are deferred into the function body only to
    keep module import light; there is no cycle.)"""
    return _curate_e2e_oracle_impl()


@register(
    "pipeline_curate_e2e",
    oracle=None,  # replaced two lines below the builder definition
    tags=("pipeline", "extension", "e2e"),
    window_rank=1,
)
def pipeline_curate_e2e(spark, sf_dir: str) -> DataFrame:
    """The whole curation tail in ONE composed plan: Gopher quality
    gate (map-only filter) → exact dedup survivors (min doc_id per
    16-byte fingerprint, one window shuffle — no join) → capped-index
    exact-Jaccard near-dup pairs over the survivors → drop the larger
    id of each pair → surviving (doc_id, n_tokens).

    This is the entry a reference user actually RUNS nightly; every
    stage is individually oracle-checked elsewhere, and this one
    hash-checks their composition. Scale shape: one fingerprint-window
    shuffle + the Jaccard cascade's single bucket shuffle; document
    text never shuffles except into the shingle index."""
    from pyspark.sql import Window

    from cae_polars_tools_spark.operators.dedup import jaccard_pairs
    from cae_polars_tools_spark.operators.text import (
        QUALITY_MAX_WORDS,
        QUALITY_MEAN_WORD_LEN,
        QUALITY_MIN_ALPHA_FRAC,
        QUALITY_MIN_STOPWORDS,
        QUALITY_MIN_WORDS,
        fingerprint,
        quality_signals,
        tokens,
    )

    docs = spread(read_table(spark, sf_dir, "documents"))
    s = quality_signals("text")
    keep = (
        s["n_words"].between(QUALITY_MIN_WORDS, QUALITY_MAX_WORDS)
        & s["mean_word_len"].between(*QUALITY_MEAN_WORD_LEN)
        & (s["alpha_frac"] >= QUALITY_MIN_ALPHA_FRAC)
        & (s["n_stopwords"] >= QUALITY_MIN_STOPWORDS)
    )
    kept = docs.filter(keep)
    w = Window.partitionBy(fingerprint("text"))
    restricted = (
        kept.withColumn("__m", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__m"))
        .drop("__m")
    )
    # ONE materialization of the survivors subtree (scan → quality
    # gate → fingerprint window): both downstream consumers — the
    # Jaccard cascade and the final anti-join — read this narrow
    # cache (doc_id, token count, shingle hashes: the 1-2%-of-corpus
    # artifact the module's persist rule allows) instead of each
    # re-running the window shuffle. Before, the subtree executed
    # twice per run (plan-visible as two identical quality+window
    # stages).
    from cae_polars_tools_spark.operators.dedup import (
        _release_on_gc,
        hashed_shingles,
    )

    enriched = restricted.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        hashed_shingles("text").alias("h64"),
    ).persist()
    enriched.count()
    pairs = jaccard_pairs(restricted, shingled=enriched)
    dropped = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    out = _release_on_gc(
        enriched.select("doc_id", "n_tokens").join(
            dropped, "doc_id", "left_anti"
        ),
        enriched,
    )
    out._upstream_cache_handle = pairs
    return out


def _curate_e2e_oracle_impl() -> str:
    from cae_polars_tools_spark.operators.dedup import (
        JACCARD_MAX_DF,
        JACCARD_THRESHOLD,
        SHINGLES_SQL,
    )
    from cae_polars_tools_spark.operators.text import (
        NORMALIZED_SQL,
        QUALITY_MAX_WORDS,
        QUALITY_MEAN_WORD_LEN,
        QUALITY_MIN_ALPHA_FRAC,
        QUALITY_MIN_STOPWORDS,
        QUALITY_MIN_WORDS,
        STOPWORDS,
    )

    return f"""
        WITH q AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       len(string_split(text, ' ')) AS n_words,
                       CAST(list_sum(list_transform(string_split(text, ' '),
                            x -> length(x))) AS DOUBLE)
                           / len(string_split(text, ' ')) AS mean_word_len,
                       CAST(len(list_filter(string_split(text, ' '),
                            x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                           / len(string_split(text, ' ')) AS alpha_frac,
                       len(list_filter(string_split(text, ' '),
                            x -> x IN {STOPWORDS!r})) AS n_stopwords
                FROM documents
            )
            WHERE (n_words BETWEEN {QUALITY_MIN_WORDS} AND {QUALITY_MAX_WORDS})
              AND (mean_word_len BETWEEN {QUALITY_MEAN_WORD_LEN[0]}
                                     AND {QUALITY_MEAN_WORD_LEN[1]})
              AND (alpha_frac >= {QUALITY_MIN_ALPHA_FRAC})
              AND (n_stopwords >= {QUALITY_MIN_STOPWORDS})
        ),
        r AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       min(doc_id) OVER (
                           PARTITION BY md5({NORMALIZED_SQL})
                       ) AS m
                FROM q
            ) WHERE doc_id = m
        ),
        sh AS (SELECT doc_id, {SHINGLES_SQL} AS s FROM r),
        ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        kept AS (
            SELECT g FROM ex GROUP BY g HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
            FROM ex a
            JOIN kept k ON a.g = k.g
            JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        ),
        inter AS (
            SELECT c.doc_id_a, c.doc_id_b,
                   len(list_intersect(sa.s, sb.s)) AS i,
                   len(sa.s) AS na, len(sb.s) AS nb
            FROM cand c
            JOIN sh sa ON c.doc_id_a = sa.doc_id
            JOIN sh sb ON c.doc_id_b = sb.doc_id
        ),
        jp AS (
            SELECT doc_id_b FROM inter
            WHERE CAST(i AS DOUBLE) / (na + nb - i) >= {JACCARD_THRESHOLD}
        )
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM r
        WHERE doc_id NOT IN (SELECT doc_id_b FROM jp)
    """


# attach the assembled oracle (built after the SQL-fragment imports)
from cae_polars_tools_spark.plans.registry import CORPUS as _CORPUS  # noqa: E402

_CORPUS["pipeline_curate_e2e"].oracle = _curate_e2e_oracle()


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis A-Res scheme, distributed: each row draws a
    reproducible uniform u from md5(key:seed) (the
    :func:`md5_rank` convention), scores ``-ln(u) / weight``, and the
    k SMALLEST scores are the sample (equivalent to the classic
    u^(1/w) top-k). Selection probability is ∝ weight; equal inputs
    always produce the same sample — reruns, retries and audits see
    one frozen draw, which ``df.sample()`` cannot promise.

    Scale shape: the score is a row-local expression (no shuffle);
    the global cut is a TakeOrdered top-k (per-partition heaps + one
    k-row driver merge), never a full sort. Scores round to 8
    decimals so Spark's and an auditor's libm agree ulp-for-ulp, with
    the key column as the total-order tie-break.

    Weights must be strictly positive: a zero/negative weight has no
    meaning under A-Res (the score degenerates to ±Infinity/NaN and
    would silently sort into or out of the top-k). The guard is fused
    into the score projection via ``assert_true`` — zero extra scans
    or actions; a bad row fails the job loudly at execution time
    instead of corrupting the draw."""
    h8 = F.substring(
        F.md5(
            F.concat(F.col(key_col).cast("string"), F.lit(f":ws{seed}"))
        ),
        1,
        8,
    )
    u = (F.conv(h8, 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        4294967296.0
    )
    w = F.col(weight_col).cast("double")
    # assert_true evaluates to NULL when the predicate holds and
    # aborts the task otherwise; the when() wrapper threads it into
    # the same codegen'd projection as the score — no second pass.
    guard = F.assert_true(
        w.isNotNull() & (w > 0),
        F.lit(
            f"weighted_sample: {weight_col!r} must be strictly "
            "positive and non-null (A-Res selection rates); filter "
            "or clamp before sampling"
        ),
    )
    score = F.when(guard.isNull(), F.round(-F.log(u) / w, 8)).alias(
        "sample_key"
    )
    return df.select(*df.columns, score).orderBy(
        "sample_key", key_col
    ).limit(k)


WEIGHTED_SAMPLE_K = 200


@register(
    "pipeline_weighted_sample",
    oracle=f"""
        SELECT doc_id, source, sample_key FROM (
            SELECT doc_id, source,
                   ROUND(-ln(
                       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                           || ':ws0'), 1, 8))::UBIGINT + 1.0)
                       / 4294967296.0
                   ) / CAST(n_chars AS DOUBLE), 8) AS sample_key
            FROM documents
        ) ORDER BY sample_key, doc_id LIMIT {WEIGHTED_SAMPLE_K}
    """,
    tags=("pipeline", "sampling", "extension"),
    window_rank=1,
)
def pipeline_weighted_sample(spark, sf_dir: str) -> DataFrame:
    """Length-proportional document sampling (A-Res weighted
    reservoir, frozen draw): sample 200 docs with probability ∝
    n_chars — the quality/length-weighted subset selection every
    curation pipeline needs, reproducible across reruns and engines
    (the oracle recomputes the identical draw from the same md5
    uniforms). Verified bias: the sample's mean length sits well
    above the corpus mean."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return weighted_sample(d, "n_chars", WEIGHTED_SAMPLE_K).select(
        "doc_id", "source", "sample_key"
    )


STRATIFIED_FRACTION = 0.2
STRATIFIED_SEED = 7


@register(
    "q85_stratified_sample",
    oracle=f"""
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)
                                    || ':{STRATIFIED_SEED}')
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM documents
        ) WHERE rk <= CEIL(n * {STRATIFIED_FRACTION})
    """,
    tags=("pipeline", "sampling", "extension"),
    window_rank=1,
)
def q85_stratified_sample(spark, sf_dir: str) -> DataFrame:
    """Exact per-stratum quota sampling, value-checked: keep exactly
    ceil(20%) of each source's documents, chosen by the
    engine-portable md5 rank (``stratified_sample(exact=True,
    hash_fn='md5')``) — the class-balanced subset selection a
    curation pipeline uses to build eval slices and ablation
    corpora. The oracle replays the identical draw in SQL (same
    md5('id:seed') ordering, same per-stratum ceil quota), so a
    drifted rank, an off-by-one quota, or a dropped stratum fails
    the hash gate. One shuffle on the stratum key; the Bernoulli
    mode (zero shuffle) is the 100 TB default when exact quotas are
    not contractually required."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return stratified_sample(
        d.select("doc_id", "source"),
        "source",
        STRATIFIED_FRACTION,
        seed=STRATIFIED_SEED,
        exact=True,
        rank_cols=["doc_id"],
        hash_fn="md5",
    ).select("doc_id", "source")


CHUNK_MAX_CHARS = 120
CHUNK_OVERLAP = 20
_CHUNK_STRIDE = CHUNK_MAX_CHARS - CHUNK_OVERLAP


def chunk_documents(
    df: DataFrame,
    max_chars: int = CHUNK_MAX_CHARS,
    overlap: int = CHUNK_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-length chunking — the fixed-window + overlap splitter
    every pretraining/RAG ingest runs on long documents: chunk ``i``
    covers characters ``[i·stride, i·stride + max_chars)`` with
    ``stride = max_chars − overlap``; ``n_chunks =
    max(1, ceil((len − overlap) / stride))``, so every character is
    covered, consecutive chunks share ``overlap`` chars of context,
    and a short document yields exactly one chunk of itself.

    Scale shape: entirely row-local JVM expressions — an
    ``explode(sequence(...))`` generator plus a substring projection;
    zero shuffles, zero Python. Returns
    ``(doc_id, chunk_id, chunk)``."""
    if overlap < 0 or max_chars <= overlap:
        raise ValueError(
            "chunking needs max_chars > overlap >= 0 "
            f"(got max_chars={max_chars}, overlap={overlap})"
        )
    stride = max_chars - overlap
    n_chunks = F.greatest(
        F.ceil(
            (F.length(text_col) - F.lit(overlap))
            / F.lit(stride).cast("double")
        ),
        F.lit(1),
    ).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1)
        ).alias("chunk_id"),
        F.col(text_col).alias("__t"),
    ).select(
        "doc_id",
        "chunk_id",
        F.expr(
            f"substring(__t, CAST(chunk_id * {stride} AS INT) + 1, "
            f"{max_chars})"
        ).alias("chunk"),
    )


@register(
    "pipeline_chunk_documents",
    oracle=f"""
        SELECT doc_id, g.i AS chunk_id,
               substr(text, g.i * {_CHUNK_STRIDE} + 1,
                      {CHUNK_MAX_CHARS}) AS chunk
        FROM documents,
             unnest(range(GREATEST(
                 (length(text) - {CHUNK_OVERLAP} + {_CHUNK_STRIDE} - 1)
                     // {_CHUNK_STRIDE},
                 1))) AS g(i)
    """,
    tags=("pipeline", "chunking", "extension"),
    window_rank=1,
)
def pipeline_chunk_documents(spark, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking of the documents table
    (120-char windows, 20-char overlap), character-exact against the
    DuckDB substring twin — full coverage, shared context between
    neighbors, one chunk for short docs."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return chunk_documents(d)


_BENCH_PRED = "source = 'src19'"

# 13-gram windows as strings in DuckDB: list slice [i:i+12] is
# inclusive on both ends (13 tokens), series 1..len-12 — the exact
# string twin of the rolling-hash window ids (same ' ' tokenization).
_DECONTAM_BLOOM_ORACLE = f"""
    WITH corp AS (
        SELECT doc_id, source, text FROM documents
        WHERE NOT ({_BENCH_PRED})
    ),
    bg AS (
        SELECT DISTINCT array_to_string(
                   (string_split(text, ' '))[i:i+12], ' ') AS g
        FROM documents,
             unnest(generate_series(
                 1, greatest(len(string_split(text, ' ')) - 12, 0)
             )) AS u(i)
        WHERE {_BENCH_PRED}
    ),
    cg AS (
        SELECT doc_id, array_to_string(
                   (string_split(text, ' '))[i:i+12], ' ') AS g
        FROM corp,
             unnest(generate_series(
                 1, greatest(len(string_split(text, ' ')) - 12, 0)
             )) AS u(i)
    ),
    flagged AS (
        SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (g)
    )
    SELECT doc_id, source FROM corp
    WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
"""


@register(
    "pipeline_decontaminate_bloom",
    oracle=_DECONTAM_BLOOM_ORACLE,
    tags=("pipeline", "decontamination", "sketch", "scale-path",
          "extension"),
    window_rank=1,
)
def pipeline_decontaminate_bloom(spark, sf_dir: str) -> DataFrame:
    """Eval-set decontamination through the Bloom-prefiltered scale
    path: src19 documents play the benchmark, the rest the corpus;
    any corpus doc sharing a verbatim 13-token window with a
    benchmark doc drops. The Bloom stage is a broadcast bitmap probed
    map-side (no corpus shuffle); survivors verify EXACTLY against
    the true hash set, so the oracle — the full string-level 13-gram
    join in DuckDB — must match bit-for-bit despite the approximate
    prefilter (false positives verified away, false negatives
    impossible). Same ' '-tokenization contract as the dedup family."""
    d = spread(read_table(spark, sf_dir, "documents"))
    bench = d.filter(F.expr(_BENCH_PRED)).select("doc_id", "text")
    corp = d.filter(~F.expr(_BENCH_PRED)).select(
        "doc_id", "source", "text"
    )
    return decontaminate_bloom(corp, bench).select("doc_id", "source")

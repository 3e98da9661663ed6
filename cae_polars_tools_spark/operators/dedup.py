"""Deduplication operators for 100 TB-scale corpora.

Five strategies, each a corpus entry:

* **exact** — md5-fingerprint hash-aggregation; one shuffle on the
  fingerprint with map-side combine.
* **n-gram Jaccard** — exact similarity join via a DF-capped shingle
  inverted index (stop-shingle cap kills the hot-key quadratic path);
  candidates verified exactly over the full sets.
* **MinHash + LSH** — the sub-quadratic scale path: K=96 permutations,
  32 bands × 3 rows; candidates from band-bucket equality, then exact
  Jaccard verification of candidates only. With these parameters a
  true jaccard≥0.8 pair is missed with probability (1−0.8³)³² ≈ 1e-10,
  so the output is (whp) identical to the exact join — and is checked
  against the *exact* SQL oracle.
* **SimHash** — 64-bit signatures via per-bit majority of token
  hashes; near-dup candidates from 16-bit band equality + Hamming
  verification (bit_count), all JVM-side.
* **embedding cosine** — near-dup pairs over `array<float>` vectors,
  blocked by a partition key (`label`) so the pair space is
  block-diagonal, never all-pairs; each block scored in one numpy
  pass inside ``applyInPandas``.

Candidate generation is bucket-local everywhere (:func:`bucket_pairs`
and the simhash in-bucket verify): one groupBy shuffle on the bucket
key, pairs from a double explode — no band-table self-joins.

All numeric hashing uses Spark's xxhash64 (JVM, codegen) — Python
never touches the row path.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from cae_polars_tools_spark.io import read_table, spread
from cae_polars_tools_spark.operators.text import (
    FINGERPRINT_SQL,
    TOKEN_SPLIT,
    fingerprint,
    tokens,
)
from cae_polars_tools_spark.plans.registry import register

NGRAM = 5
JACCARD_THRESHOLD = 0.8

# MinHash parameters (seeded, deterministic across runs/engines)
MINHASH_K = 96
LSH_BANDS = 32
LSH_ROWS = 3


def _shingle_starts(n: Column) -> Column:
    """Start indices ``1..n-NGRAM+1`` of the shingle windows, or an
    empty array for documents shorter than ``NGRAM`` tokens. The guard
    matters: Spark's ``sequence(1, 0)`` auto-descends to ``[1, 0]``
    (unlike DuckDB's ``generate_series``, which is empty), and index 0
    then crashes ``slice``."""
    return F.when(
        n >= NGRAM, F.sequence(F.lit(1), n - (NGRAM - 1))
    ).otherwise(F.array().cast("array<int>"))


def shingles(col: Column | str) -> Column:
    """Distinct word-``NGRAM`` shingles per document (order-preserving
    construction, then dedup). Documents with fewer than ``NGRAM``
    tokens yield an empty set."""
    t = tokens(col)
    idx = _shingle_starts(F.size(t))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, NGRAM), " "))
    )


# Position-weighted combine coefficients for the rolling shingle hash
# (odd 64-bit constants from the splitmix64/xxhash families; odd ⇒
# each term is a bijection of the token hash, position-distinct ⇒
# window order matters).
_SHINGLE_COEF = np.array(
    [
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0x27D4EB2F165667C5,
        0x85EBCA77C2B2AE63,
    ],
    dtype=np.uint64,
)


def _shingle_coef(ngram: int) -> np.ndarray:
    """Position-weight coefficients for an ``ngram``-token rolling
    hash: the five fixed constants, extended deterministically (seeded,
    odd — each term stays a bijection of the token hash) for longer
    windows such as 13-gram decontamination."""
    if ngram <= len(_SHINGLE_COEF):
        return _SHINGLE_COEF[:ngram]
    rng = np.random.default_rng(20240813 + ngram)
    extra = (
        rng.integers(
            0, 2**63, size=ngram - len(_SHINGLE_COEF), dtype=np.int64
        ).astype(np.uint64)
        << np.uint64(1)
    ) | np.uint64(1)
    return np.concatenate([_SHINGLE_COEF, extra])


def _make_hashed_shingles_udf(ngram: int):
    """Arrow-batched distinct 64-bit shingle ids per document.

    Per document: blake2b-8 each token (memoized across the batch —
    vocabulary ≪ token count), then every ``ngram`` window's id is a
    position-weighted sum Σ cⱼ·h(tokⱼ) mod 2⁶⁴ — one vectorized numpy
    pass over the token-hash array, no per-window string join.
    Content-deterministic across partitions/engines (blake2b + fixed
    coefficients), so equal windows get equal ids everywhere; 64-bit
    ids keep cross-window collision odds ~|index|²/2⁶⁴ (~1e-7 at a
    million distinct shingles).

    Replaces a higher-order-function formulation
    (transform(sequence)+xxhash64(slice)+array_distinct): HOFs are
    CodegenFallback, interpreted per element — measured 42 s of
    executor CPU (cold) for 5 000 docs at sf0.1 vs well under 1 s
    for this kernel."""
    coef = _shingle_coef(ngram)

    @F.pandas_udf(ArrayType(LongType()))
    def udf(text: pd.Series) -> pd.Series:
        from hashlib import blake2b

        cache: dict[str, int] = {}

        def th(tok: str) -> int:
            h = cache.get(tok)
            if h is None:
                h = int.from_bytes(
                    blake2b(tok.encode(), digest_size=8).digest(), "little"
                )
                cache[tok] = h
            return h

        out = []
        for s in text:
            # null text (common in real crawls) ⇒ empty shingle set,
            # mirroring the < ngram-tokens case
            toks = s.split(TOKEN_SPLIT) if isinstance(s, str) else []
            n = len(toks)
            if n < ngram:
                out.append(np.empty(0, dtype=np.int64))
                continue
            hv = np.fromiter((th(t) for t in toks), dtype=np.uint64, count=n)
            nwin = n - ngram + 1
            acc = np.zeros(nwin, dtype=np.uint64)
            for j in range(ngram):
                acc += coef[j] * hv[j : j + nwin]
            out.append(np.unique(acc).astype(np.int64))
        return pd.Series(out)

    return udf


_hashed_shingles_udf = _make_hashed_shingles_udf(NGRAM)


def hashed_shingles(col: Column | str, ngram: int = NGRAM) -> Column:
    """Distinct 64-bit shingle ids (see :func:`_make_hashed_shingles_udf`).
    Window-set distinctness — and therefore every Jaccard value — is
    identical to the string-shingle form (:func:`shingles`); only the
    ids differ. Documents with fewer than ``ngram`` tokens yield an
    empty set."""
    c = F.col(col) if isinstance(col, str) else col
    if ngram == NGRAM:
        return _hashed_shingles_udf(c)
    return _make_hashed_shingles_udf(ngram)(c)


SHINGLES_SQL = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(string_split(text, ' ')) - 4, 0)), "
    "i -> array_to_string((string_split(text, ' '))[i:i+4], ' ')))"
)

# Shingles with document frequency above this are excluded from the
# inverted index (candidate generation only — verification still uses
# the full sets). This is the stop-shingle cap that removes the one
# quadratic-blowup path: a shingle shared by d documents fans out into
# d·(d-1)/2 candidate pairs, so a boilerplate phrase on a skewed
# corpus would otherwise explode the self-join.
JACCARD_MAX_DF = 128

# Capped exact-Jaccard oracle, mirroring jaccard_pairs(): candidates
# from the DF-capped index, verified with exact set intersection over
# the FULL shingle sets.
# Shared CTE chain for every capped-Jaccard oracle (exact pairs,
# duplicate clustering, incremental ingest): candidates from the
# DF-capped inverted index, verified with exact set intersection over
# the FULL shingle sets, thresholded into `jp`. ONE definition so the
# oracles can never silently diverge from the operator family they
# mirror.
_CAPPED_JACCARD_CTES = f"""sh AS (
        SELECT doc_id, {SHINGLES_SQL} AS s FROM documents
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    kept AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) <= {JACCARD_MAX_DF}),
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
        SELECT doc_id_a,
               doc_id_b,
               CAST(i AS DOUBLE) / (na + nb - i) AS jaccard
        FROM inter
        WHERE CAST(i AS DOUBLE) / (na + nb - i) >= {JACCARD_THRESHOLD}
    )"""

_EXACT_JACCARD_SQL = f"""
    WITH {_CAPPED_JACCARD_CTES}
    SELECT doc_id_a, doc_id_b, jaccard FROM jp
"""

# Uncapped exact join — the oracle for MinHash-LSH, whose candidate
# generation has no DF cap (band buckets bound the blowup instead).
_EXACT_JACCARD_SQL_UNCAPPED = f"""
    WITH sh AS (
        SELECT doc_id, {SHINGLES_SQL} AS s FROM documents
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    pairs AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS inter
        FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh)
    SELECT p.doc_id_a,
           p.doc_id_b,
           CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_id_a = sa.doc_id
    JOIN sizes sb ON p.doc_id_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle=f"""
        SELECT {FINGERPRINT_SQL} AS fp,
               MIN(doc_id) AS canonical_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    tags=("dedup", "extension"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by md5(normalized text), keep the smallest
    doc_id as canonical (deterministic — unlike dropDuplicates, which
    keeps an arbitrary row). One fingerprint shuffle with map-side
    combine; the fingerprint is 16 bytes regardless of document size."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _unpersist_quietly(jdfs: list) -> None:
    # handles are JVM Datasets OR JVM RDDs — both expose
    # unpersist(blocking: Boolean), so one loop releases cache-manager
    # entries and localCheckpoint block stores alike
    for j in jdfs:
        try:
            j.unpersist(False)
        except Exception:
            pass  # session/JVM already gone — nothing to release


def _checkpoint_rdd(df: DataFrame):
    """JVM RDD handle behind a localCheckpoint()ed DataFrame, or None.

    ``DataFrame.unpersist()`` only touches the SQL cache manager; the
    blocks a localCheckpoint pins live on the underlying RDD and stay
    on executors until JVM RDD GC unless that RDD is unpersisted
    directly. The checkpointed frame's analyzed plan is a
    ``LogicalRDD`` leaf whose ``rdd`` field is exactly that handle."""
    try:
        lp = df._jdf.queryExecution().analyzed()
        if lp.getClass().getSimpleName() == "LogicalRDD":
            return lp.rdd()
    except Exception:
        pass  # Spark Connect / non-JVM frame — nothing to release
    return None


def _release_round_frame(df: DataFrame) -> None:
    """Eagerly release a finished propagation round's frame: the
    cache-manager entry AND (when the frame is a lazy localCheckpoint)
    the RDD-level checkpoint blocks, which ``DataFrame.unpersist``
    alone would leave accumulating on executors round after round."""
    try:
        df._jdf.unpersist(False)
    except Exception:
        pass
    rdd = _checkpoint_rdd(df)
    if rdd is not None:
        try:
            rdd.unpersist(False)
        except Exception:
            pass


def _release_on_gc(
    out: DataFrame, *cached: DataFrame, include_self: bool = False
) -> DataFrame:
    """Cleanup hook for plans built over persisted intermediates:
    unpersist the cached frames (shingle index / signature bands /
    materialized cluster labels) as soon as the returned plan handle is
    garbage-collected. CPython's refcounting makes this deterministic
    for the common call shape — build, materialize, drop the handle —
    so a long-lived session calling the generators repeatedly does not
    accumulate cached frames until eviction, while each cache stays
    live for as long as the caller can still re-execute the plan.

    The finalizer captures only the JVM-side ``Dataset`` handles, never
    the Python ``DataFrame`` objects: a finalizer holding its own
    referent (``include_self=True``, used when the RETURNED frame is
    the persisted one) would otherwise keep it alive forever.

    Contract for callers who CHAIN on the result
    (``jaccard_pairs(d).filter(...)``): hold the returned handle until
    the derived plan materializes — a derived PySpark DataFrame keeps
    no Python reference to its parent, so dropping the handle early
    releases the caches and the chained action recomputes the
    upstream pipeline (correct, just slower). The in-repo call shape
    (build → materialize → drop) always holds the handle."""
    # getattr guard: under Spark Connect DataFrames have no _jdf (no
    # JVM handle in-process) — caches there are session-managed, so
    # skipping the finalizer is the correct degradation, not a leak.
    handles = [j for c in cached if (j := getattr(c, "_jdf", None)) is not None]
    if include_self and (j := getattr(out, "_jdf", None)) is not None:
        handles.append(j)
    # localCheckpoint()ed frames additionally pin RDD-level blocks the
    # Dataset unpersist does not touch — capture those handles too
    for c in cached:
        if (r := _checkpoint_rdd(c)) is not None:
            handles.append(r)
    if include_self and (r := _checkpoint_rdd(out)) is not None:
        handles.append(r)
    if handles:
        weakref.finalize(out, _unpersist_quietly, handles)
    return out


def bucket_pairs(
    index: DataFrame,
    keys: list[str],
    max_bucket: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Candidate pairs from equality buckets, generated bucket-locally:
    ONE shuffle (``groupBy`` the bucket key) + a double explode of each
    bucket's id list, deduped across buckets.

    Replaces the two-sided band-table self-join — and the persist that
    join reuse required — with half the exchanges (measured ~1.4 s →
    ~0.6 s for the LSH candidate stage at sf0.1). Output cardinality is
    identical to the equality self-join (Σ_b m_b·(m_b−1)/2), so this
    changes cost shape, not semantics.

    Per-task memory is the largest bucket's id array — one ROW holds
    the whole bucket, a failure mode the streaming self-join didn't
    have. The jaccard call site is hard-bounded (stop-shingle cap ⇒
    bucket ≤ max_df); LSH band buckets are bounded only by the data —
    a corpus with a million copies of one document puts them all in
    one bucket. For such corpora run exact dedup FIRST (the standard
    pipeline order; the same groups would have inflated the
    self-join's output just as quadratically), or set ``max_bucket``
    to fail loudly instead of OOMing: buckets above it raise with the
    offending size."""
    buckets = (
        index.groupBy(*keys)
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        oversized = F.size("ids") > max_bucket
        buckets = buckets.withColumn(
            "ids",
            F.when(
                oversized,
                F.raise_error(
                    F.concat(
                        F.lit("bucket_pairs: bucket of "),
                        F.size("ids").cast("string"),
                        F.lit(
                            f" ids exceeds max_bucket={max_bucket} — "
                            "run exact dedup first or raise the cap"
                        ),
                    )
                ),
            ).otherwise(F.col("ids")),
        )
    pairs = (
        buckets.select(F.explode("ids").alias("doc_id_a"), "ids")
        .select("doc_id_a", F.explode("ids").alias("doc_id_b"))
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
    )
    # distinct=False keeps one row per (pair, bucket) — the shape a
    # shared-key COUNT consumer (winnow_pairs) aggregates over
    return pairs.distinct() if distinct else pairs


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard similarity join
# ---------------------------------------------------------------------------


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_df: int = JACCARD_MAX_DF,
    candidate_filter: Callable[[DataFrame], DataFrame] | None = None,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity join over word-shingle sets via a
    DF-capped inverted index: explode (doc, shingle), drop shingles
    with document frequency > ``max_df`` (stop-shingle cap — the
    skew guard: a shingle shared by d docs fans out d·(d-1)/2 pairs,
    so the hottest key bounds the per-bucket blowup), generate
    candidates bucket-locally (:func:`bucket_pairs` over the capped
    index), then verify candidates EXACTLY over
    the full (uncapped) shingle sets. A pair is missed only if *every*
    shared shingle is hot — at threshold 0.8 that needs a doc made
    almost entirely of boilerplate, the case the cap is designed to
    refuse to pay for.

    The index stores xxhash64(shingle) (8-byte join/shuffle keys, not
    ~30-char strings; per-pair collision odds ~1e-15) and is persisted
    because the DAG reads it three times (the bucket-grouped candidate
    index + both verification sides). The DF cap is a broadcast
    hot-key anti-join:
    the over-cap shingle set is tiny by construction (each survivor of
    ``GROUP BY g HAVING count > max_df`` represents > max_df rows, so
    there can be at most |index|/max_df of them), so it broadcasts,
    and the cap costs one map-side-combined aggregation instead of a
    full sort-within-partitions count-window over every (doc, shingle)
    row (measured ~2.5× slower at sf0.1 in the former self-join DAG).

    The persisted index is materialized EAGERLY (count) before the
    join DAG executes: the consumers otherwise start as concurrent AQE
    shuffle-map stages that race the still-empty cache and each re-run
    the tokenize→shingle→hash pipeline — measured 4× the CPU and ~2×
    the wall time at sf0.1 (with the former 4-consumer DAG)."""
    # ``shingled``: a caller that ALREADY holds a persisted
    # (doc_id, h64) frame (e.g. one enriched cache serving several
    # stages of a composed pipeline) passes it here and keeps
    # ownership of the cache — the tokenize→shingle→hash pipeline
    # then runs exactly once across the whole composition instead of
    # once per consumer subtree (the ``signed=`` seam of
    # incremental_dedup_indexed, applied to this generator).
    own_cache = shingled is None
    if own_cache:
        sh = docs.select(
            "doc_id", hashed_shingles("text").alias("h64")
        ).persist()
        sh.count()
    else:
        sh = shingled.select("doc_id", "h64")
    ex = sh.select("doc_id", F.explode("h64").alias("g"))
    hot = (
        ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("g")
    )
    exk = ex.join(F.broadcast(hot), "g", "left_anti")
    # bucket-local pair generation: bucket size ≤ max_df by the cap,
    # so the per-bucket fan-out is bounded at max_df·(max_df−1)/2
    candidates = bucket_pairs(exk, ["g"])
    if candidate_filter is not None:
        # pre-verification pruning hook: the verify joins below ship
        # the full shingle arrays (the widest rows in this DAG), so a
        # caller that only needs a subset of pairs — incremental
        # ingest needs only pairs touching the arriving batch; a
        # steady-state large history makes history-history candidates
        # the dominant term — prunes the expensive stage, not just
        # the output. The hook must keep (doc_id_a, doc_id_b); any
        # EXTRA columns it adds (e.g. role flags) ride through the
        # verification joins into the output, so callers never re-join
        # their annotations onto the verified pairs.
        candidates = candidate_filter(candidates)
        missing = {"doc_id_a", "doc_id_b"} - set(candidates.columns)
        if missing:
            raise ValueError(
                f"candidate_filter dropped required columns: {sorted(missing)}"
            )
    extra = [c for c in candidates.columns if c not in ("doc_id_a", "doc_id_b")]
    sa = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("h64").alias("s_a"))
    sb = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("h64").alias("s_b"))
    inter = F.size(F.array_intersect("s_a", "s_b"))
    jac = inter.cast("double") / (
        F.size("s_a") + F.size("s_b") - inter
    )
    return _release_on_gc(
        candidates.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select("doc_id_a", "doc_id_b", *extra, jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold),
        *([sh] if own_cache else []),
    )


@register(
    "dedup_ngram_jaccard",
    oracle=_EXACT_JACCARD_SQL,
    tags=("dedup", "extension"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram Jaccard near-dup pairs at threshold 0.8."""
    return jaccard_pairs(spread(read_table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# MinHash + LSH (the sub-quadratic scale path)
# ---------------------------------------------------------------------------


def _minhash_params() -> tuple[np.ndarray, np.ndarray]:
    """K multiply-shift hash functions: odd 64-bit multipliers + 64-bit
    offsets (Dietzfelbinger et al. multiply-shift family). Seeded, so
    signatures are deterministic across runs/engines."""
    rng = np.random.default_rng(20240813)
    a = (rng.integers(0, 2**63, size=MINHASH_K, dtype=np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 2**63, size=MINHASH_K, dtype=np.int64).astype(np.uint64)
    return a, b


_MINHASH_EMPTY = (1 << 32) - 1  # empty doc ⇒ all-MAX signature


def _signature(hv: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """The multiply-shift K-permutation minima as uint64 — the ONE
    kernel both the signature UDF and the fused band-hash UDF call, so
    they can never silently desynchronize (empty-doc sentinel
    included)."""
    if hv.size == 0:
        return np.full(MINHASH_K, _MINHASH_EMPTY, dtype=np.uint64)
    m = a[:, None] * hv[None, :]
    m += b[:, None]
    return (m >> np.uint64(32)).min(axis=1)


@F.pandas_udf(ArrayType(LongType()))
def minhash_signature(h64: pd.Series) -> pd.Series:
    """K-permutation MinHash signature from 64-bit shingle hashes.

    Permutation hash = multiply-shift ((a·h + b) mod 2⁶⁴) >> 32 with
    odd a — a universal family that needs no modular division (~2×
    faster than the Mersenne-prime mod form) and consumes the full
    64-bit shingle ids directly. The K×S product runs as one vectorized
    numpy op per document; uint64 wraparound is the intended mod-2⁶⁴.
    (K separate array_min(transform(...)) expression columns would be
    interpreted per element — higher-order functions are
    CodegenFallback — measured ~100× this cost.)"""
    import pandas as pd

    a, b = _minhash_params()
    out = []
    for h in h64:
        hv = np.asarray(h, dtype=np.int64).view(np.uint64)
        out.append(_signature(hv, a, b).astype(np.int64))
    return pd.Series(out)


def _band_coef() -> np.ndarray:
    """Odd 64-bit combine multipliers, one per band row (seeded). A
    band hash is the position-weighted sum of its rows mod 2⁶⁴ — two
    different row-tuples collide with probability ~2⁻⁶⁴, and a
    collision only ADDS a candidate pair that exact verification then
    rejects, so the bucketing function needs mixing, not cryptography."""
    rng = np.random.default_rng(20250814)
    return (
        rng.integers(0, 2**63, size=LSH_ROWS, dtype=np.int64).astype(np.uint64)
        << np.uint64(1)
    ) | np.uint64(1)


@F.pandas_udf(ArrayType(LongType()))
def minhash_band_hashes(h64: pd.Series) -> pd.Series:
    """The LSH_BANDS band hashes per document, fused with the
    signature computation: sig (K multiply-shift permutation minima,
    exactly :func:`minhash_signature`) reshaped to (bands, rows) and
    row-combined in the same numpy pass.

    Fusion is a measured plan optimization, not a semantic change:
    deriving band hashes JVM-side from the signature array took 96
    interpreted ``getItem`` calls + 32 ``hash()`` expressions + an
    array-of-structs explode per document (~1.4 s of the 3.3 s LSH
    median at sf0.1); here the combine is two vectorized numpy ops,
    and the consumer explodes a plain long array with ``posexplode``.
    Docs with equal (band, rows) still get equal band hashes — bucket
    semantics, recall, and the exact-verified output are unchanged."""
    import pandas as pd

    a, b = _minhash_params()
    c = _band_coef()
    out = []
    for h in h64:
        hv = np.asarray(h, dtype=np.int64).view(np.uint64)
        sig = _signature(hv, a, b)
        bh = (sig.reshape(LSH_BANDS, LSH_ROWS) * c[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out.append(bh.astype(np.int64))
    return pd.Series(out)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_bucket: int = 200_000,
) -> DataFrame:
    """Candidate pairs from LSH band-bucket equality, verified with the
    exact Jaccard of the candidate pairs only.

    Sub-quadratic by construction: the only all-pairs-ish step is
    bucket-local pair generation, and buckets hold near-duplicates
    only. Verification intersects 64-bit shingle *hashes*, not
    strings: the per-pair collision odds are ~|s|²/2⁶⁴ ≈ 1e-15, and
    the candidate shuffle carries 8-byte longs instead of ~30-char
    shingles.

    Band buckets are bounded only by the data — a corpus with a
    million byte-identical copies of one document puts them all in one
    band bucket, and :func:`bucket_pairs` holds a whole bucket's id
    array in one task. ``max_bucket`` (default 200k ids ≈ 1.6 MB per
    bucket row — far below executor memory, but already 2·10¹⁰
    candidate pairs, a cost no caller wants silently) makes that
    corpus fail loudly with the offending bucket size instead of
    OOMing mid-explode. The standard pipeline — exact dedup FIRST,
    then near-dup — keeps real buckets orders of magnitude below the
    cap; pass ``max_bucket=None`` to run uncapped.

    The hashed frame is persisted because the DAG references it three
    times (the signature path and both sides of the verification
    join) — without it the tokenize→shingle→hash pipeline executes
    3×. At 100 TB this artifact is ~1-2% of corpus bytes
    (8 B/shingle), well inside MEMORY_AND_DISK's spill-safe budget.
    The band table needs no persist at all: ``bucket_pairs`` consumes
    it exactly once (its groupBy replaced the former band-table
    self-join, halving the exchanges on the candidate path)."""
    hashed = (
        docs.select("doc_id", hashed_shingles("text").alias("h64"))
        .filter(F.size("h64") > 0)
        .persist()
    )
    # signature + band combine fused in one pandas UDF (see
    # minhash_band_hashes); the explode is a plain long array
    bands = hashed.select(
        "doc_id", F.posexplode(minhash_band_hashes(F.col("h64")))
    ).toDF("doc_id", "band", "bh")

    candidates = bucket_pairs(bands, ["band", "bh"], max_bucket=max_bucket)

    sa = hashed.select(F.col("doc_id").alias("doc_id_a"), F.col("h64").alias("s_a"))
    sb = hashed.select(F.col("doc_id").alias("doc_id_b"), F.col("h64").alias("s_b"))
    verified = (
        candidates.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.size(F.array_intersect("s_a", "s_b")).cast("double")
                / F.size(F.array_union("s_a", "s_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return _release_on_gc(verified, hashed)


@register(
    "dedup_minhash_lsh",
    oracle=_EXACT_JACCARD_SQL_UNCAPPED,  # miss probability ≈ 1e-10 per true pair
    tags=("dedup", "extension", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at jaccard ≥ 0.8. Verified exactly on
    candidates, so the result matches the exact-join oracle (a true
    pair escapes all 32 bands with probability ≈ 1e-10)."""
    return minhash_lsh_pairs(spread(read_table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BAND_BITS = 16
SIMHASH_MAX_HAMMING = 6

# Portable (oracle-checked) variant: token hash = first 15 hex chars
# of md5 parsed as a 60-bit int — reproducible in DuckDB SQL, unlike
# xxhash64. 6 bands × 10 bits with k=5 keeps the pigeonhole guarantee
# (k < nbands ⇒ ≥1 untouched band), so banded candidates ⊇ every true
# pair and the blocked result EQUALS the brute-force all-pairs join.
PORTABLE_SIMHASH_BITS = 60
PORTABLE_BAND_BITS = 10
PORTABLE_MAX_HAMMING = 5


def _vote_udf(nbits: int):
    """Pandas UDF: per-bit majority vote over a document's token-hash
    array (term-frequency weighted — hashes arrive undeduped).
    Vectorized bit unpack + vote per document; the bit pattern is
    identical to the shift/bitwiseOR JVM formulation (top bit set ⇒
    negative long, matching shiftleft(1, 63))."""

    @F.pandas_udf(LongType())
    def vote(hashes: pd.Series) -> pd.Series:
        shifts = np.arange(nbits, dtype=np.uint64)
        out = []
        for hv in hashes:
            a = np.asarray(hv, dtype=np.int64).astype(np.uint64)
            votes = (
                2 * ((a[:, None] >> shifts) & np.uint64(1)).astype(np.int32) - 1
            ).sum(axis=0)
            sig = ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out.append(sig.astype(np.int64))
        return pd.Series(out, dtype="int64")

    return vote


def portable_token_hash(t: Column) -> Column:
    """60-bit token hash both engines can compute: first 15 hex chars
    of md5, base-16-parsed (DuckDB mirror: digit-wise strpos bit
    extraction over the same md5 hex — see the dedup_simhash oracle)."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    docs: DataFrame,
    token_hash: Callable[[Column], Column] | None = None,
    nbits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash per document. Tokens are hashed JVM-side (xxhash64 by
    default — codegen; or a custom ``token_hash`` expression); the
    per-bit majority vote runs as one vectorized numpy op per
    document. The previous formulation — explode tokens then
    groupBy(doc) with one conditional sum per bit — shuffled |tokens|
    rows per doc; this one never explodes, so the only wide op left in
    the pipeline is the band-bucket groupBy."""
    th = F.transform(tokens("text"), token_hash or (lambda t: F.xxhash64(t)))
    return docs.select(
        "doc_id", _vote_udf(nbits)(th).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    token_hash: Callable[[Column], Column] | None = None,
    nbits: int = SIMHASH_BITS,
    band_bits: int = SIMHASH_BAND_BITS,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ k. Candidates via
    ``band_bits``-bit band equality, verified with bit_count. By
    pigeonhole, recall is EXACT whenever k < nbits/band_bits (k
    differing bits can touch at most k bands, leaving one equal);
    beyond that banding is the standard recall/cost dial.

    Pair generation is bucket-local (one groupBy shuffle on
    (band, bh), the ``bucket_pairs`` shape): each bucket's
    (doc_id, simhash) structs are collected, every in-bucket pair is
    verified with bit_count right there, and nothing needs a persist
    or a re-join — the 64-bit signature rides along instead of being
    looked up again."""
    sig = simhash_signatures(docs, token_hash=token_hash, nbits=nbits)
    return hamming_pairs(
        sig,
        id_col="doc_id",
        sig_col="simhash",
        nbits=nbits,
        band_bits=band_bits,
        max_hamming=max_hamming,
    )


#: Widest (band, bucket) group hamming_pairs will expand: pair
#: generation is bucket-local, so one bucket of b identical-ish
#: signatures is an O(b²) single task (4096 → ≤8.4M pair checks,
#: seconds). A corpus of thousands of byte-identical payloads lands
#: its whole clique in ONE bucket per band — that wants dedup_exact
#: first, not a quadratic near-dup pass, so refuse loudly.
HAMMING_MAX_BUCKET = 4096


def hamming_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    nbits: int,
    band_bits: int,
    max_hamming: int,
    max_bucket: int = HAMMING_MAX_BUCKET,
) -> DataFrame:
    """Signature-agnostic banded Hamming self-join: pairs with
    Hamming(sig) ≤ ``max_hamming`` out of an (id, int64-signature)
    frame. This is the shared kernel behind SimHash text near-dup and
    dHash image near-dup — any bit-signature modality plugs in.

    Candidates come from ``band_bits``-bit band equality; by
    pigeonhole, recall is EXACT whenever max_hamming < nbits/band_bits
    (k differing bits touch at most k bands, leaving one equal). Pair
    generation is bucket-local (ONE groupBy shuffle on (band, bh)):
    each bucket's (id, sig) structs are collected and every in-bucket
    pair is verified with bit_count right there — the signature rides
    along, so no persist and no re-join. At 100 TB the only wide ops
    are this bucket shuffle over ~nbits/band_bits × 16-byte rows per
    input row and the final distinct.

    ``max_bucket`` guards the degenerate corpus (thousands of
    byte-identical payloads → identical signatures → one clique
    bucket per band): any (band, bh) group wider than the cap raises
    a loud USER_RAISED_EXCEPTION naming the bucket instead of
    silently becoming a single O(b²) task — run
    :func:`exact_duplicates` first or raise the cap consciously."""
    nbands = (nbits + band_bits - 1) // band_bits
    bands = sig.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col(sig_col), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bh"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    buckets = (
        bands.groupBy("band", "bh")
        .agg(F.collect_list(F.struct("_id", "_sig")).alias("xs"))
        .filter(
            # the guard lives IN the filter predicate so Catalyst
            # can't prune it away as an unused projection
            F.when(
                F.size("xs") > max_bucket,
                F.raise_error(
                    F.format_string(
                        "hamming_pairs: bucket (band=%s, bh=%s) holds "
                        "%s signatures, over max_bucket="
                        + str(max_bucket)
                        + " — a near-identical signature flood makes "
                        "in-bucket pairing one O(b^2) task; run exact "
                        "dedup first or raise max_bucket consciously",
                        F.col("band").cast("string"),
                        F.col("bh").cast("string"),
                        F.size("xs").cast("string"),
                    )
                ),
            ).otherwise(F.size("xs") > 1)
        )
    )
    ham = F.bit_count(
        F.col("a._sig").bitwiseXOR(F.col("b._sig"))
    )
    return (
        buckets.select(F.explode("xs").alias("a"), "xs")
        .select("a", F.explode("xs").alias("b"))
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias(f"{id_col}_a"),
            F.col("b._id").alias(f"{id_col}_b"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# DuckDB mirror of the portable signature: per token, md5 hex; bit b of
# the 60-bit hash lives in hex digit 15 - b//4 (1-based from the left)
# at position b%4; majority vote per (doc, bit); signature = sum of
# winning powers of two. Pairs verified brute-force (all pairs) —
# equal to the banded Spark result because k=5 < 6 bands.
_PORTABLE_SIMHASH_SQL = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), th AS (
        SELECT doc_id, md5(t) AS h FROM tok
    ), votes AS (
        SELECT doc_id, r.b AS bit,
               SUM(CASE WHEN ((strpos('0123456789abcdef',
                                      substr(h, 15 - r.b // 4, 1)) - 1)
                              >> (r.b % 4)) & 1 = 1
                        THEN 1 ELSE -1 END) AS vote
        FROM th, range({PORTABLE_SIMHASH_BITS}) r(b)
        GROUP BY doc_id, r.b
    ), sigs AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN vote > 0
                             THEN (CAST(1 AS BIGINT) << bit)
                             ELSE 0 END) AS BIGINT) AS sig
        FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_id_a,
           b.doc_id AS doc_id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {PORTABLE_MAX_HAMMING}
"""


@register(
    "dedup_simhash",
    oracle=_PORTABLE_SIMHASH_SQL,
    tags=("dedup", "extension", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, oracle-checked: portable md5-derived
    60-bit signatures (engine-reproducible), 6 bands × 10 bits,
    Hamming ≤ 5 — inside the pigeonhole-exact regime, so the banded
    candidates match the oracle's brute-force all-pairs join exactly.
    The xxhash64 64-bit variant (default args of
    :func:`simhash_pairs`) is the production fast path, covered by
    unit tests."""
    return simhash_pairs(
        spread(read_table(spark, sf_dir, "documents")),
        max_hamming=PORTABLE_MAX_HAMMING,
        token_hash=portable_token_hash,
        nbits=PORTABLE_SIMHASH_BITS,
        band_bits=PORTABLE_BAND_BITS,
    )


# ---------------------------------------------------------------------------
# Image near-dup: perceptual dHash + banded Hamming pairs
# ---------------------------------------------------------------------------

_DHASH_NBITS = 56  # 9×7 raster → 8 gradient bits × 7 rows (sign-safe)
_DHASH_BAND_BITS = 14  # 4 bands; Hamming ≤ 3 stays pigeonhole-exact
_DHASH_MAX_HAMMING = 3

# The oracle reconstructs the WHOLE image path in SQL: text bytes →
# 9×7 RGB raster (rpad + ascii, the mm_bmp_features pixel oracle) →
# integer grayscale (299R+587G+114B)//1000 → adjacent-column gradient
# bits → 56-bit signature → brute-force all-pairs Hamming join. Equal
# to the banded Spark result because max_hamming 3 < 4 bands
# (pigeonhole). Integer-only math end to end, so both engines agree
# bit for bit.
_IMAGE_DHASH_SQL = f"""
    WITH px AS (
        SELECT doc_id, p,
               ascii(substr(rpad(text, 189, chr(0)), p + 1, 1)) AS b
        FROM documents, range(189) r(p)
    ), gray AS (
        SELECT doc_id, p // 3 AS q,
               SUM(CASE p % 3 WHEN 0 THEN 299 * b
                              WHEN 1 THEN 587 * b
                              ELSE 114 * b END) // 1000 AS g
        FROM px GROUP BY doc_id, p // 3
    ), bits AS (
        SELECT a.doc_id, (a.q // 9) * 8 + (a.q % 9) AS bit
        FROM gray a JOIN gray b
          ON a.doc_id = b.doc_id AND b.q = a.q + 1
        WHERE a.q % 9 < 8 AND a.g < b.g
    ), sigs AS (
        SELECT d.doc_id,
               COALESCE(SUM(CAST(1 AS BIGINT) << s.bit),
                        CAST(0 AS BIGINT)) AS sig
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN bits s ON s.doc_id = d.doc_id
        GROUP BY d.doc_id
    )
    SELECT a.doc_id AS doc_id_a,
           b.doc_id AS doc_id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {_DHASH_MAX_HAMMING}
"""


@register(
    "dedup_image_dhash",
    oracle=_IMAGE_DHASH_SQL,
    tags=("dedup", "multimodal", "extension", "dhash"),
    window_rank=1,
)
def dedup_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs via perceptual difference hash — the
    multimodal twin of :func:`dedup_simhash`, and the missing
    dedup×multimodal intersection: web-scale image corpora are full of
    re-encoded/re-scaled copies that exact byte hashing misses.

    The pipeline is the REAL byte path end to end: per document a 9×7
    BMP is synthesized from its payload bytes (the corpus carries no
    media; everything downstream is the honest format path), decoded
    by the hand-parsed BMP decoder, reduced to an integer-grayscale
    gradient signature (:func:`image_dhash`), and paired by the shared
    banded-Hamming kernel (:func:`hamming_pairs`, 4×14-bit bands,
    Hamming ≤ 3 — inside the pigeonhole-exact regime, so the banded
    candidate set equals the oracle's brute-force join exactly).

    Scale shape: decode + hash never leave their partitions and emit
    16 bytes/row; the ONLY wide ops are the band-bucket groupBy and
    the closing distinct. No float anywhere — every engine derives the
    same 56-bit integers."""
    from cae_polars_tools_spark.operators.multimodal import (
        DHASH_H,
        DHASH_W,
        _text_to_bmp,
        image_dhash,
        with_payload,
    )

    docs = spread(read_table(spark, sf_dir, "documents"))
    assets = _text_to_bmp(with_payload(docs), width=DHASH_W, height=DHASH_H)
    return hamming_pairs(
        image_dhash(assets),
        id_col="doc_id",
        sig_col="dhash",
        nbits=_DHASH_NBITS,
        band_bits=_DHASH_BAND_BITS,
        max_hamming=_DHASH_MAX_HAMMING,
    )


# ---------------------------------------------------------------------------
# Audio near-dup: frame-energy fingerprint + banded Hamming pairs
# ---------------------------------------------------------------------------

_AFP_FRAME = 2  # 64 demo samples → 32 frames → 31 gradient bits
_AFP_NBITS = 31
_AFP_BAND_BITS = 8  # 4 bands; Hamming ≤ 3 stays pigeonhole-exact
_AFP_MAX_HAMMING = 3

# Oracle: rebuild the PCM from ascii bytes (the mm_audio_frame_energy
# pixel... sample oracle), exact int64 Σv² per 2-sample frame,
# adjacent-frame gradient bits, 31-bit signature, brute-force all-pairs
# Hamming — equal to the banded Spark result by pigeonhole (3 < 4
# bands). Integer-only end to end.
_AUDIO_FP_SQL = f"""
    WITH en AS (
        SELECT doc_id, u.j // {_AFP_FRAME} AS f,
               SUM(CAST(ascii(substr(rpad(text, 64, chr(0)),
                                     u.j + 1, 1)) AS BIGINT)
                   * ascii(substr(rpad(text, 64, chr(0)),
                                  u.j + 1, 1))) AS e
        FROM documents, unnest(range(0, 64)) AS u(j)
        GROUP BY doc_id, u.j // {_AFP_FRAME}
    ), bits AS (
        SELECT a.doc_id, a.f AS bit
        FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f + 1
        WHERE a.e < b.e
    ), sigs AS (
        SELECT d.doc_id,
               COALESCE(SUM(CAST(1 AS BIGINT) << s.bit),
                        CAST(0 AS BIGINT)) AS sig
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN bits s ON s.doc_id = d.doc_id
        GROUP BY d.doc_id
    )
    SELECT a.doc_id AS doc_id_a,
           b.doc_id AS doc_id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {_AFP_MAX_HAMMING}
"""


@register(
    "dedup_audio_fingerprint",
    oracle=_AUDIO_FP_SQL,
    tags=("dedup", "multimodal", "audio", "extension"),
    window_rank=1,
)
def dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs via the frame-energy fingerprint —
    the third modality on the shared banded-Hamming kernel (text →
    SimHash, image → dHash, audio → energy contour): re-encoded or
    gain-ridden copies of a clip keep their energy gradient signs, so
    duplicate detection is Hamming distance on an int64.

    Real byte path end to end: per document a 64-sample PCM WAV is
    synthesized (the corpus carries no media), decoded by the
    hand-parsed WAV reader, fingerprinted by
    :func:`multimodal.audio_fingerprint` (exact int64 Σv² per 2-sample
    frame, 31 gradient bits), paired by :func:`hamming_pairs`
    (4×8-bit bands, Hamming ≤ 3 — pigeonhole-exact, so the banded
    candidates equal the oracle's brute-force join). Decode +
    fingerprint never leave their partitions; the only wide ops are
    the band-bucket groupBy and the closing distinct."""
    from cae_polars_tools_spark.operators.multimodal import (
        _text_to_wav,
        audio_fingerprint,
    )

    docs = spread(read_table(spark, sf_dir, "documents"))
    sig = audio_fingerprint(_text_to_wav(docs), frame_samples=_AFP_FRAME)
    return hamming_pairs(
        sig,
        id_col="doc_id",
        sig_col="afp",
        nbits=_AFP_NBITS,
        band_bits=_AFP_BAND_BITS,
        max_hamming=_AFP_MAX_HAMMING,
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster assembly: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def _local_union_find(batches):
    """Single-task union-find over a pair iterator (both columns are
    the same id type): classic path-halving find + union-by-min, so
    every tree root is its component's minimum id. Runs inside one
    ``mapInPandas`` partition — data never visits the driver."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for pdf in batches:
        for a, b in zip(pdf.iloc[:, 0].values, pdf.iloc[:, 1].values):
            for n in (a, b):
                if n not in parent:
                    parent[n] = n
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    nodes = list(parent)
    yield pd.DataFrame(
        {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]}
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iters: int = 25,
    local_threshold: int = 5_000_000,
) -> DataFrame:
    """Connected components over an undirected pair graph → one
    ``(doc_id, cluster_id)`` row per vertex, ``cluster_id`` = the
    smallest doc_id in the component (the canonical survivor every
    dedup pipeline needs after pair generation).

    Two physical strategies, picked AQE-style from the materialized
    pair count (the pair set is persisted and counted once — the count
    is also what materializes the expensive upstream pair pipeline, so
    it is not an extra pass):

    * ``n_pairs <= local_threshold`` — single-task union-find inside
      one ``mapInPandas`` partition (path-halving + union-by-min).
      A near-dup pair graph is typically orders of magnitude smaller
      than the corpus that produced it; 5M pairs ≈ 80 MB comfortably
      fits one task, and one job beats diameter-many shuffle rounds
      of scheduler overhead. Same small-side-goes-local reasoning as
      a broadcast join.
    * otherwise — distributed min-label propagation WITH pointer
      jumping: each round (a) joins labels across edges and takes the
      per-vertex minimum, then (b) replaces each vertex's label by its
      label's own just-computed label (label-of-label, the classic
      pointer-jumping / path-halving step). Edge propagation moves the
      minimum one hop; the jump doubles the distance already covered,
      so rounds ≈ O(log diameter) instead of O(diameter) — a
      path-shaped adversarial graph of length 1000 converges in ~10
      rounds, not 1000 (same round complexity as the
      large-star/small-star contraction of Kiveris et al., "Connected
      Components in MapReduce", but with vertex-sized — not
      edge-sized — per-round shuffles).

    In the distributed loop, ONE driver action per round: the
    convergence signal rides inside the round's frame itself (each
    vertex's previous label is carried as an ``old`` column, so "any
    label changed?" is a filter over the just-built frame, not a
    separate join against the previous labels), and the ``.count()``
    action that reads it is the SAME scan that materializes the
    round's lazy localCheckpoint — there is no second pass over the
    vertex frame (pinned by ``test_connected_components_one_action_
    per_round``). The per-round driver round-trip itself is accepted
    by design: an iterative loop cannot decide termination without
    one action per check, checking less often would burn whole extra
    rounds of vertex-frame shuffles (orders of magnitude costlier at
    scale than job-submission latency), and pointer jumping already
    bounds the number of such round-trips at O(log diameter). Each
    finished round's frame is released eagerly — both its cache entry
    and its localCheckpoint RDD blocks, which ``DataFrame.unpersist``
    alone would leave pinned on executors.
    Duplicate edges are harmless (min is idempotent), so the input
    pair set is NOT deduplicated — no distinct shuffle; edges are
    hash-partitioned on ``u`` once and cached, so each round's
    propagation join re-shuffles only the (small) label frame."""
    import warnings

    from pyspark.sql.types import StructField, StructType

    pairs_p = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).persist()
    n_pairs = pairs_p.count()
    if n_pairs <= local_threshold:
        id_type = pairs_p.schema["u"].dataType
        out_schema = StructType(
            [
                StructField("doc_id", id_type),
                StructField("cluster_id", id_type),
            ]
        )
        out = (
            pairs_p.coalesce(1)
            .mapInPandas(_local_union_find, schema=out_schema)
            .persist()
        )
        out.count()  # materialize while the pair cache is still live
        pairs_p.unpersist()
        return _release_on_gc(out, include_self=True)

    fwd = pairs_p
    rev = pairs_p.select(F.col("v").alias("u"), F.col("u").alias("v"))
    edges = fwd.union(rev).repartition("u").persist()
    prev = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .persist()
    )
    labels = prev
    changed = None
    for _ in range(max_iters):
        prop = edges.join(labels, edges["u"] == labels["doc_id"]).select(
            F.col("v").alias("doc_id"),
            "cluster_id",
            F.lit(None).cast("long").alias("old"),
        )
        cur = labels.select(
            "doc_id", "cluster_id", F.col("cluster_id").alias("old")
        )
        merged = (
            cur.unionByName(prop)
            .groupBy("doc_id")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                # every vertex appears exactly once in `cur`, so the
                # null-skipping min recovers its previous label
                F.min("old").alias("old"),
            )
        )
        # pointer jump: my new label is itself a vertex (min always
        # includes self), so look up THAT vertex's just-computed label
        # and take the smaller — doubles the hops the minimum has
        # traveled, giving O(log diameter) rounds. Left join +
        # coalesce: monotone (labels only decrease), so correctness
        # never depends on the jump landing.
        parent = merged.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("cluster_id").alias("grand"),
        )
        # LAZY localCheckpoint, not persist: the self-join references
        # `merged` twice, so an un-truncated lineage would DOUBLE the
        # logical plan each round (2^rounds nodes — driver heap OOM by
        # round ~12). The checkpoint cuts the plan to a leaf; the
        # convergence count below is still the round's only action and
        # is what materializes it. Resilience trade (same one GraphX
        # iteration makes): checkpointed blocks live on executors, so
        # losing an executor mid-loop fails the JOB rather than
        # recomputing — acceptable for a convergence loop whose restart
        # re-enters at the persisted pair set; swap for
        # reliable checkpoint() (needs a checkpoint dir) when running
        # on preemptible fleets.
        nxt = (
            merged.join(parent, "cluster_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("grand", "cluster_id"),
                ).alias("cluster_id"),
                "old",
            )
            .localCheckpoint(eager=False)
        )
        changed = nxt.filter(F.col("cluster_id") < F.col("old")).count()
        _release_round_frame(prev)
        prev = nxt
        labels = nxt.select("doc_id", "cluster_id")
        if changed == 0:
            break
    if changed:
        warnings.warn(
            f"connected_components: not converged after {max_iters} rounds "
            f"({changed} labels still changing) — returned labels are "
            "partial; raise max_iters (graph diameter exceeds it)",
            stacklevel=2,
        )
    pairs_p.unpersist()
    edges.unpersist()
    # `labels` is a projection of the still-persisted final round frame
    # (`prev`): release that cache with the handle.
    return _release_on_gc(labels, prev)


@register(
    "dedup_clusters",
    oracle=f"""
        WITH RECURSIVE {_CAPPED_JACCARD_CTES},
        edges AS (
            SELECT doc_id_a AS u, doc_id_b AS v FROM jp
            UNION
            SELECT doc_id_b, doc_id_a FROM jp
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        )
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
        FROM reach GROUP BY u
    """,
    tags=("dedup", "extension", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters: the capped exact-Jaccard
    join feeds min-label-propagation connected components; output maps
    every doc that has a near-dup to its cluster's canonical (minimum)
    doc_id. Oracle: the same pair set run through a DuckDB recursive
    transitive closure."""
    pairs = jaccard_pairs(spread(read_table(spark, sf_dir, "documents")))
    return connected_components(pairs)


@register(
    "dedup_canonical_pick",
    oracle=f"""
        WITH RECURSIVE {_CAPPED_JACCARD_CTES},
        edges AS (
            SELECT doc_id_a AS u, doc_id_b AS v FROM jp
            UNION
            SELECT doc_id_b, doc_id_a FROM jp
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        labels AS (
            SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
            FROM reach GROUP BY u
        )
        SELECT doc_id, cluster_id, rep_id, doc_id = rep_id AS keep
        FROM (
            SELECT l.doc_id, l.cluster_id,
                   FIRST_VALUE(l.doc_id) OVER (
                       PARTITION BY l.cluster_id
                       ORDER BY d.n_chars DESC, l.doc_id ASC
                   ) AS rep_id
            FROM labels l JOIN documents d USING (doc_id)
        )
    """,
    tags=("dedup", "extension", "iterative"),
    window_rank=1,
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection — the step AFTER clustering
    that real dedup pipelines get wrong by default: inside each
    near-dup cluster keep the BEST copy (here: longest text, doc_id
    tie-break), not the arbitrary minimum id. Output maps every
    clustered doc to its cluster and its elected representative with
    a ``keep`` verdict.

    Scale shape: the cluster labels come from the same
    pointer-jumping components as ``dedup_clusters``; the election is
    ONE key-partitioned window over the (small) clustered subset —
    quality joins in by doc_id, the corpus itself never reshuffles.
    Oracle: recursive-CTE closure + the same FIRST_VALUE election."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    labels = connected_components(jaccard_pairs(docs))
    from pyspark.sql import Window

    q = labels.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = (
        Window.partitionBy("cluster_id")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # ONE window expression, aliased and reused — two textual
    # F.first(...).over(w) copies are collapsed by Catalyst anyway,
    # but the single-expression form makes that guarantee in the
    # unresolved plan instead of relying on CSE.
    out = q.select(
        "doc_id", "cluster_id", F.first("doc_id").over(w).alias("rep_id")
    ).withColumn("keep", F.col("doc_id") == F.col("rep_id"))
    # chain contract of _release_on_gc: a derived DataFrame keeps no
    # Python ref to its parent, so returning `out` alone would drop
    # `labels`, fire its cache-release finalizer, and make the
    # caller's action recompute the whole pair pipeline uncached
    # (measured 7.7 s vs 2.9 s at sf0.1). Pin the handle to the
    # returned frame for exactly the result's lifetime.
    out._cc_labels_handle = labels
    return out


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

COSINE_DEDUP_THRESHOLD = 0.40

# Shared vector kernels (re-exported here for back-compat; see
# operators/vectors.py for the expression-vs-batch trade).
from cae_polars_tools_spark.operators.vectors import (  # noqa: E402
    COSINE_SQL,
    cosine_batch,
    cosine_expr,
    cosine_with_norms,
    dot_expr,
    pair_dot,
)


def _tiled_cosine_pairs(
    ids: np.ndarray, E: np.ndarray, threshold: float, tile_rows: int = 2048
) -> pd.DataFrame:
    """All (a < b) pairs within one block whose cosine ≥ threshold.

    One dim-sequential vectorized pass per tile — every double is
    bit-identical to ``dot_expr``/DuckDB ``list_sum`` (numpy's
    pairwise-summing matmul would drift in the last ulp and flip
    threshold-boundary pairs). Rows are scored in bounded tiles so
    peak memory is tile×block, not block², even if a block is huge.
    Ids are sorted first so the upper-triangle test is a plain index
    comparison; the emitted cosine for a given (a, b) pair is
    therefore independent of which block produced it (callers
    deduplicate multi-block collisions with a plain ``distinct``)."""
    order = np.argsort(ids)
    ids = ids[order]
    E = E[order].astype(np.float64)
    m, d = E.shape
    n2 = np.zeros(m, dtype=np.float64)
    for j in range(d):
        n2 += E[:, j] * E[:, j]
    norm = np.sqrt(n2)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    for lo in range(0, m, tile_rows):
        hi = min(lo + tile_rows, m)
        # columns start at lo: columns ≤ lo can never satisfy the
        # upper-triangle condition, so skipping them halves the
        # kernel's multiply-adds across all tiles
        acc = np.zeros((hi - lo, m - lo), dtype=np.float64)
        for j in range(d):
            acc += E[lo:hi, j][:, None] * E[lo:, j][None, :]
        cos = acc / (norm[lo:hi][:, None] * norm[lo:][None, :])
        rows, cols = np.nonzero(cos >= threshold)
        upper = rows < cols  # both offset by lo; vec ids sorted
        rows, cols = rows[upper], cols[upper]
        out_a.append(ids[rows + lo])
        out_b.append(ids[cols + lo])
        out_c.append(cos[rows, cols])
    return pd.DataFrame(
        {
            "vec_id_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
            "vec_id_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
            "raw_cos": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
        }
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
        SELECT a.vec_id AS vec_id_a,
               b.vec_id AS vec_id_b,
               ROUND({COSINE_SQL}, 6) AS cosine
        FROM embeddings a
        JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {COSINE_SQL} >= {COSINE_DEDUP_THRESHOLD}
    """,
    tags=("dedup", "extension", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above cosine 0.40, blocked by `label`.

    Blocking keeps the pair space block-diagonal: with B blocks it
    shrinks by ~B× and each block is scored independently — the
    standard production shape (block key = coarse cluster / LSH
    bucket / shard).

    Arrays-once kernel: ONE shuffle (`groupBy(label)`), then each
    block's full cosine matrix in a single numpy pass inside
    ``applyInPandas`` — every row's embedding crosses Arrow once,
    not once per pair (the per-pair HOF this replaced paid
    interpreted per-element evaluation on every joined row; the
    self-join also shuffled both sides). The dim-sequential
    accumulation mirrors ``dot_expr``/``score_against_queries``, so
    every double is bit-identical to the expression form and the
    DuckDB oracle. Rows are scored in bounded tiles so peak memory is
    tile×block, not block², even if a label block is huge."""
    threshold = COSINE_DEDUP_THRESHOLD

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy().astype(np.int64)
        E = np.stack(pdf["embedding"].to_numpy())
        return _tiled_cosine_pairs(ids, E, threshold)

    e = (
        spread(read_table(spark, sf_dir, "embeddings"))
        # null labels never matched the equality blocking (SQL null
        # semantics, mirrored by the oracle's a.label = b.label) — a
        # groupBy would silently collect them into one all-pairs block
        .filter(F.col("label").isNotNull())
        .select("vec_id", "label", "embedding")
    )
    return (
        e.groupBy("label")
        .applyInPandas(
            lambda _key, pdf: score_block(pdf),
            schema="vec_id_a long, vec_id_b long, raw_cos double",
        )
        .select("vec_id_a", "vec_id_b", F.round("raw_cos", 6).alias("cosine"))
    )

def embedding_lsh_pairs(
    embeddings: DataFrame,
    threshold: float = COSINE_DEDUP_THRESHOLD,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs WITHOUT a blocking label: candidates
    come from random-hyperplane LSH buckets, verified with the exact
    tiled cosine kernel.

    The label-blocked ``dedup_embedding_cosine`` needs a partition key
    the data already carries; raw crawl embeddings have none. This is
    the keyless scale path: each vector lands in one bucket per LSH
    table (8 tables × 64 buckets — ``lsh_buckets``,
    operators/similarity.py), every bucket scores its own pairs
    locally, and multi-table collisions collapse with a distinct.

    100 TB shape: ONE shuffle (groupBy (table, bucket) — vectors
    replicate ×tables, the standard LSH space/recall trade), bucket-
    local all-pairs bounded by tiles, then a distinct over the
    (already threshold-filtered, tiny) pair set. Nothing global is
    ever materialized; no all-pairs join exists at any scale. Recall
    against the exact all-pairs ground truth is seed-deterministic
    and asserted in tests (sign-LSH recall at a 0.40 threshold is the
    documented weak spot — near-orthogonal pairs collide rarely; raise
    LSH_TABLES or lower LSH_PLANES_PER_TABLE to buy recall for
    low-similarity thresholds, or keep thresholds ≥0.8 where recall
    is ≥0.95 by construction)."""
    from cae_polars_tools_spark.operators.similarity import lsh_buckets

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy().astype(np.int64)
        E = np.stack(pdf[emb_col].to_numpy())
        return _tiled_cosine_pairs(ids, E, threshold)

    bucketed = embeddings.select(
        F.col(id_col),
        F.col(emb_col),
        F.posexplode(lsh_buckets(F.col(emb_col))).alias("table", "bucket"),
    )
    pairs = bucketed.groupBy("table", "bucket").applyInPandas(
        lambda _key, pdf: score_bucket(pdf),
        schema="vec_id_a long, vec_id_b long, raw_cos double",
    )
    # the kernel's doubles are block-independent (see
    # _tiled_cosine_pairs), so exact distinct collapses multi-table
    # collisions without a numeric tolerance
    return pairs.distinct().select(
        "vec_id_a", "vec_id_b", F.round("raw_cos", 6).alias("cosine")
    )


def _embedding_lsh_oracle() -> str:
    # value-level oracle: the seeded hyperplane buckets are
    # recomputed in SQL (similarity.lsh_bucket_ctes), so the
    # candidate membership — not just precision/recall — is
    # hash-verified; cosines share the bit-parity kernel with
    # dedup_embedding_cosine's oracle
    from cae_polars_tools_spark.operators.similarity import (
        lsh_bucket_ctes,
        lsh_share_any_table,
    )

    return f"""
        WITH {lsh_bucket_ctes()},
        cand AS (
            SELECT qa.vec_id AS ida, qb.vec_id AS idb
            FROM lsh_tbl_buckets qa
            JOIN lsh_tbl_buckets qb
              ON qa.vec_id < qb.vec_id
             AND ({lsh_share_any_table("qa", "qb")})
        )
        SELECT a.vec_id AS vec_id_a,
               b.vec_id AS vec_id_b,
               ROUND({COSINE_SQL}, 6) AS cosine
        FROM cand
        JOIN embeddings a ON a.vec_id = cand.ida
        JOIN embeddings b ON b.vec_id = cand.idb
        WHERE {COSINE_SQL} >= {COSINE_DEDUP_THRESHOLD}
    """


@register(
    "dedup_embedding_lsh",
    oracle=_embedding_lsh_oracle(),
    tags=("dedup", "extension", "embedding", "lsh"),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless embedding near-dup pairs via LSH bucketing + exact
    cosine verification (the scale path when no blocking label
    exists). Value-checked end-to-end: the oracle recomputes the
    seeded hyperplane buckets in SQL (precision/recall property tests
    in tests/test_operators.py remain as the approximate-operator
    contract)."""
    e = spread(read_table(spark, sf_dir, "embeddings"))
    return embedding_lsh_pairs(e)


# ---------------------------------------------------------------------------
# Incremental ingest dedup — the batch-vs-history shape an ongoing
# crawl pipeline runs every cycle (new shard arrives; history is
# already deduplicated and must win every tie).
# ---------------------------------------------------------------------------

# Batch split on the synthetic corpus: two-digit sources (src10..src19)
# are the arriving batch, one-digit (src0..src9) the deduplicated
# history. LIKE 'src1_' is portable across Spark and DuckDB.
_NEW_BATCH_PRED = "source LIKE 'src1_'"

INCREMENTAL_ORACLE = f"""
    WITH {_CAPPED_JACCARD_CTES},
    fps AS (SELECT doc_id, source, {FINGERPRINT_SQL} AS fp FROM documents),
    newb AS (SELECT * FROM fps WHERE {_NEW_BATCH_PRED}),
    hist AS (SELECT * FROM fps WHERE NOT ({_NEW_BATCH_PRED})),
    exact_kept AS (
        SELECT n.doc_id, n.source FROM newb n
        WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = n.fp)
          AND n.doc_id = (SELECT MIN(m.doc_id) FROM newb m WHERE m.fp = n.fp)
    ),
    near_dropped AS (
        SELECT doc_id_b AS doc_id FROM jp
        WHERE doc_id_a IN (SELECT doc_id FROM hist)
          AND doc_id_b IN (SELECT doc_id FROM newb)
        UNION
        SELECT doc_id_a FROM jp
        WHERE doc_id_b IN (SELECT doc_id FROM hist)
          AND doc_id_a IN (SELECT doc_id FROM newb)
        UNION
        SELECT doc_id_b FROM jp
        WHERE doc_id_a IN (SELECT doc_id FROM newb)
          AND doc_id_b IN (SELECT doc_id FROM newb)
    )
    SELECT doc_id, source FROM exact_kept
    WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped)
"""


def incremental_dedup(
    docs: DataFrame, is_new: Column, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Surviving NEW-batch documents after dedup against an existing
    history and within the batch itself.

    Drop rules (history always wins; within the batch the smallest
    doc_id wins):

    * exact — the batch doc's fingerprint exists in history, or an
      earlier batch doc shares it;
    * near-dup — a capped-index Jaccard ≥ ``threshold`` pair links
      the batch doc to ANY history doc, or to an earlier batch doc.

    100 TB shape: the history fingerprint set joins as a left-anti on
    the 16-byte key (broadcast when small, shuffle otherwise — AQE's
    call); near-dup candidates come from the same bucket-local capped
    inverted index every other Jaccard operator uses
    (:func:`jaccard_pairs` — one groupBy shuffle, no self-join, hot
    shingles excluded), and history-history candidates are pruned by
    role BEFORE the exact verification joins (which ship full shingle
    arrays) — in the steady state where a large clean history dwarfs
    each arriving batch, those candidates dominate the cascade and
    their verification would be pure waste. History contributes its
    fingerprint column and its shingle index — both of which a real
    pipeline keeps materialized between cycles."""
    # ONE corpus pass computes everything every branch below needs —
    # md5 fingerprint, role flag, and the shingle hashes — into a
    # single persisted frame. The former shape scanned the corpus
    # text three times (history fps, batch fps, and jaccard_pairs'
    # own shingle cache), re-running the md5 kernel twice; at 100 TB
    # each avoided pass is a full-corpus read. Width stays within the
    # narrow-persist rule: this is jaccard_pairs' own (doc_id, h64)
    # cache plus three scalar columns. Eager count for the same
    # reason jaccard_pairs materializes its cache: concurrent AQE
    # stage materializations otherwise race the empty cache and each
    # re-run the tokenize→shingle→hash pipeline.
    base = docs.select(
        "doc_id",
        "source",
        is_new.alias("new"),
        fingerprint("text").alias("fp"),
        hashed_shingles("text").alias("h64"),
    ).persist()
    base.count()
    hist_fps = base.filter(~F.col("new")).select("fp").distinct()
    batch = base.filter(F.col("new")).select("doc_id", "source", "fp")

    # exact: history wins, then first-in-batch wins
    no_hist = batch.join(hist_fps, "fp", "left_anti")
    first = no_hist.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    exact_kept = (
        no_hist.join(first, "fp")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "source")
    )

    # near-dup pairs over history ∪ batch (a < b), role-resolved in a
    # SINGLE pass: the expensive pair cascade is evaluated once, each
    # pair annotated with both sides' batch membership via two joins
    # against the tiny (doc_id, is_new) role frame INSIDE the
    # candidate filter; the a_new/b_new flags then ride through
    # jaccard_pairs' verification into its output (the extra-column
    # contract), so the dropped id is one CASE over jp — no second
    # pair-of-joins (history partner drops the batch side; batch-batch
    # drops the larger id, consistent with a < b).
    roles = base.select("doc_id", "new")
    ra = roles.select(
        F.col("doc_id").alias("doc_id_a"), F.col("new").alias("a_new")
    )
    rb = roles.select(
        F.col("doc_id").alias("doc_id_b"), F.col("new").alias("b_new")
    )

    def touching_batch(cands: DataFrame) -> DataFrame:
        # drop history-history candidates BEFORE the (expensive,
        # full-shingle-array) exact verification — in the steady state
        # the docstring describes, history dwarfs the batch and
        # hist-hist candidates dominate the pair cascade
        return (
            cands.join(ra, "doc_id_a")
            .join(rb, "doc_id_b")
            .filter(F.col("a_new") | F.col("b_new"))
        )

    jp = jaccard_pairs(
        docs,
        threshold=threshold,
        candidate_filter=touching_batch,
        shingled=base,
    )
    dropped = jp.select(
        F.when(F.col("b_new"), F.col("doc_id_b"))
        .when(F.col("a_new"), F.col("doc_id_a"))
        .alias("doc_id")
    ).distinct()
    result = exact_kept.join(dropped, "doc_id", "left_anti")
    # the shared cache is ours (jaccard_pairs ran caller-owned):
    # release it when the returned plan handle is garbage-collected
    return _release_on_gc(result, base)


@register(
    "dedup_incremental",
    oracle=INCREMENTAL_ORACLE,
    tags=("dedup", "extension", "incremental"),
    window_rank=1,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest: the arriving batch (sources src10-19)
    deduplicated exactly AND near-dup (capped Jaccard ≥ 0.8) against
    the already-clean history (src0-9) and itself."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    return incremental_dedup(docs, F.expr(_NEW_BATCH_PRED))


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): coarse k-means clusters as blocking
# keys, exact cosine verification inside each cluster.
# ---------------------------------------------------------------------------

SEMANTIC_CENTROIDS = 8


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = COSINE_DEDUP_THRESHOLD,
    n_centroids: int = SEMANTIC_CENTROIDS,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    parity: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: cluster embeddings with
    the IVF coarse quantizer, then score each cluster block with the
    exact tiled cosine kernel — the published recipe (Abbas et al.
    2023: k-means the embedding space, deduplicate within clusters)
    composed from this engine's ANN and dedup primitives.

    The 100 TB shape is the same block-diagonal contract as
    ``dedup_embedding_cosine``, but the blocking key is LEARNED: no
    label column is needed, and the pair space shrinks from n² to
    Σ cluster² — with the cluster count sized so blocks fit the tiled
    kernel. Training is the bounded-sample IVF recipe
    (``similarity.py::train_ivf_centroids`` — a few-hundred-KB driver
    matrix at any corpus size); assignment is one zero-shuffle
    vectorized UDF pass; scoring is ONE ``groupBy(cluster)`` shuffle.

    Precision is exact (every emitted pair carries its true cosine —
    verification never trusts the blocking); recall misses only pairs
    split across clusters, the documented SemDeDup trade. On the
    synthetic near-orthogonal test vectors every threshold-crossing
    pair is only weakly similar (no pair reaches cosine 0.6), the
    hardest case for a learned blocking — measured recall there is
    ~0.36 at 8 centroids; real corpora deduplicate at 0.9+ where
    near-dups co-cluster far more reliably. Identical
    vectors always share a cluster, so exact duplicates are never
    missed. Deterministic for a fixed input partitioning (seeded
    sample, deterministic Lloyd, argmax ties by lowest index).

    ``parity=True`` trains with the SQL-reproducible quantizer
    (``similarity.train_kmeans_parity`` + dim-sequential assignment),
    making the full pair set value-checkable against the
    ``kmeans_parity_ctes`` DuckDB oracle — same algorithm and scale
    shape, deterministic regardless of input partitioning.
    """
    from cae_polars_tools_spark.operators.similarity import (
        _assign_udf,
        assign_udf_parity,
        train_ivf_centroids,
        train_kmeans_parity,
    )

    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("embedding")
    )
    if parity:
        centroids = train_kmeans_parity(e, n_centroids=n_centroids)
        assign = assign_udf_parity(centroids)
    else:
        centroids = train_ivf_centroids(e, n_centroids=n_centroids)
        assign = _assign_udf(centroids)

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy().astype(np.int64)
        E = np.stack(pdf["embedding"].to_numpy())
        return _tiled_cosine_pairs(ids, E, threshold)

    return (
        e.withColumn("__cl", assign(F.col("embedding")))
        .groupBy("__cl")
        .applyInPandas(
            lambda _key, pdf: score_block(pdf),
            schema="vec_id_a long, vec_id_b long, raw_cos double",
        )
        .select(
            "vec_id_a", "vec_id_b", F.round("raw_cos", 6).alias("cosine")
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = COSINE_DEDUP_THRESHOLD,
    n_centroids: int = SEMANTIC_CENTROIDS,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Drop list from semantic near-dup pairs: connected components
    over the pair graph, keep each component's minimum id, return the
    ids to DROP — the composition ``semantic_dedup_pairs`` →
    ``connected_components`` (whose single-task/label-propagation
    strategy pick already handles any component-size skew)."""
    pairs = semantic_dedup_pairs(
        embeddings, threshold, n_centroids, id_col, emb_col
    )
    comp = connected_components(pairs, "vec_id_a", "vec_id_b")
    out = comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("drop_id"),
        F.col("cluster_id").alias("keep_id"),
    )
    # chain contract: keep the materialized labels cache alive for the
    # derived frame's lifetime (see dedup_canonical_pick — dropping the
    # handle fires the cache-release finalizer and the caller's action
    # recomputes the pair pipeline uncached)
    out._cc_labels_handle = comp
    return out


def _dedup_semantic_oracle() -> str:
    # the quantizer is retrained inside the oracle (kmeans_parity_ctes
    # — bit-identical centroids + assignments), so the full pair set
    # is value-checked: same-cluster (a < b) pairs whose bit-parity
    # cosine clears the threshold
    from cae_polars_tools_spark.operators.similarity import (
        kmeans_parity_ctes,
    )

    return f"""
        WITH {kmeans_parity_ctes(SEMANTIC_CENTROIDS)}
        SELECT a.vec_id AS vec_id_a,
               b.vec_id AS vec_id_b,
               ROUND({COSINE_SQL}, 6) AS cosine
        FROM km_assign ca
        JOIN km_assign cb ON ca.cl = cb.cl AND ca.vec_id < cb.vec_id
        JOIN embeddings a ON a.vec_id = ca.vec_id
        JOIN embeddings b ON b.vec_id = cb.vec_id
        WHERE {COSINE_SQL} >= {COSINE_DEDUP_THRESHOLD}
    """


@register(
    "dedup_semantic",
    oracle=_dedup_semantic_oracle(),
    tags=("dedup", "extension", "embedding"),
    window_rank=1,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs over the embeddings table with a
    LEARNED blocking key (k-means clusters) instead of the label
    column ``dedup_embedding_cosine`` blocks on — value-checked
    end-to-end: the oracle retrains the parity quantizer in SQL, so
    blocking MEMBERSHIP (not just pair precision) is hash-verified."""
    e = spread(read_table(spark, sf_dir, "embeddings"))
    return semantic_dedup_pairs(e, parity=True)


# ---------------------------------------------------------------------------
# Winnowing (MOSS) exact-substring fingerprints: position-independent
# sampling of k-gram hashes for verbatim-overlap detection.
# ---------------------------------------------------------------------------

WINNOW_K = 16  # k-gram length (characters)
WINNOW_W = 8   # winnow window (consecutive k-gram hashes)
WINNOW_MIN_SHARED = 5
WINNOW_MAX_DF = 200  # boilerplate-fingerprint cap (docs per fingerprint)
_WINNOW_BASE = np.uint64(1_000_003)


def winnowed_fingerprints(col: Column | str, k: int = WINNOW_K,
                          w: int = WINNOW_W) -> Column:
    """Winnowing fingerprints of a text column (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS algorithm): hash every k-gram of
    UTF-8 bytes with a wrapping polynomial rolling hash, then keep the
    MINIMUM hash of every window of ``w`` consecutive k-grams.

    The selection is position-INDEPENDENT — a shared substring selects
    the same minimum hashes in both documents regardless of where it
    sits — which is what n-gram-set methods (Jaccard/MinHash) cannot
    give you for *verbatim span* detection, and what suffix arrays
    give you only with a global sort. Guarantee: any common substring
    of length ≥ ``w + k − 1`` shares at least one fingerprint (ties
    between equal hashes may select different positions but emit the
    same VALUE, so the guarantee survives tie-breaking). Density is
    ~2/(w+1) of all k-grams, so the explode stays ~8× sparser than
    shingling at these defaults.

    Arrow-batched pandas UDF (per-row, shuffle-free): numpy builds all
    k-gram hashes in ``k`` vectorized adds and the window minima with
    one stride-tricks pass. Returns ``array<bigint>`` (distinct hash
    values, int64 bit view)."""
    if k < 2 or w < 1:
        raise ValueError("winnowing needs k >= 2 and w >= 1")
    powers = _WINNOW_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    @F.pandas_udf("array<long>")
    def fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(
                np.uint64
            )
            n = len(b) - k + 1
            if n <= 0:
                out.append([])
                continue
            H = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                H += b[j: j + n] * powers[j]
            if n <= w:
                sel = np.array([n - 1 - int(np.argmin(H[::-1]))])
            else:
                sw = np.lib.stride_tricks.sliding_window_view(H, w)
                # rightmost minimum per window (the paper's rule)
                pos = (w - 1) - np.argmin(sw[:, ::-1], axis=1)
                sel = np.unique(pos + np.arange(len(pos)))
            out.append(np.unique(H[sel]).view(np.int64).tolist())
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    return fp(c)


def winnow_pairs(
    df: DataFrame,
    min_shared: int = WINNOW_MIN_SHARED,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_df: int = WINNOW_MAX_DF,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verbatim-overlap candidate pairs: documents sharing ≥
    ``min_shared`` winnowing fingerprints, with the shared count —
    the distributed form of MOSS-style plagiarism/copy detection and
    the practical stand-in for suffix-array substring dedup (Lee et
    al.'s ExactSubstr) at cluster scale.

    Scale shape mirrors ``jaccard_pairs``: explode the (sparse)
    fingerprints, drop boilerplate fingerprints present in more than
    ``max_df`` documents via a broadcast anti-join (they would create
    quadratic pairs AND carry no overlap signal — license headers,
    templates), then ONE groupBy(fingerprint) bucket pass emits each
    bucket's pairs and a final (a, b) count aggregation applies the
    threshold. Returns ``(doc_id_a, doc_id_b, n_shared)``."""
    # persisted: the index feeds BOTH the hot-fingerprint aggregation
    # and the anti-join probe — without the cache the fingerprint UDF
    # (the operator's dominant cost) would execute twice, the measured
    # recompute failure mode jaccard_pairs documents. Materialized
    # eagerly so no consumer races the cache; released when the
    # returned plan handle is garbage-collected. No distinct:
    # winnowed_fingerprints already emits per-document UNIQUE values
    # (np.unique before return), so the exploded (doc_id, f) pairs
    # are unique by construction — a distinct here would re-shuffle
    # the whole index for nothing.
    idx = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(winnowed_fingerprints(text_col, k, w)).alias("f"),
    ).persist()
    idx.count()
    hot = (
        idx.groupBy("f")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("f")
    )
    capped = idx.join(F.broadcast(hot), "f", "left_anti")
    pairs = bucket_pairs(capped, ["f"], distinct=False)
    out = (
        pairs.groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return _release_on_gc(out, idx)


def _kgram_hash_terms_sql(k: int) -> str:
    """SQL restatement of the wrapping polynomial k-gram hash shared
    by winnowing and repeated-span dedup: Σⱼ ascii(char at i+j) ·
    baseᵏ⁻¹⁻ʲ in HUGEINT (128-bit) intermediates, wrapped mod 2⁶⁴ by
    the caller — exact twin of the numpy uint64 arithmetic."""
    return " + ".join(
        f"CAST(ascii(substr(t, i + {j + 1}, 1)) AS HUGEINT) * "
        f"CAST('{pow(int(_WINNOW_BASE), k - 1 - j, 2 ** 64)}' AS HUGEINT)"
        for j in range(k)
    )


def _winnow_oracle(k: int = WINNOW_K, w: int = WINNOW_W,
                   min_shared: int = WINNOW_MIN_SHARED,
                   max_df: int = WINNOW_MAX_DF) -> str:
    """DuckDB twin of the whole winnowing cascade. The wrapping-uint64
    polynomial hash is exact 128-bit arithmetic mod 2^64 (HUGEINT
    intermediates; per-term wrap ≡ one final mod), reinterpreted to
    the signed int64 bit view the UDF emits. Window minima need no
    tie-break: the per-document fingerprint set is DISTINCT VALUES, so
    which tied position is selected cannot change it. The ``n ≤ w``
    short-document branch reduces to the i = 0 window (its frame
    already spans every k-gram).

    PRECONDITION (asserted by tests/test_corpus_oracle.py::
    test_corpus_text_is_ascii): ``ascii(substr(...))`` walks
    CHARACTERS while the Spark UDF hashes UTF-8 BYTES — equivalent
    only for pure-ASCII text, which the synthetic corpus is."""
    terms = _kgram_hash_terms_sql(k)
    two64, two63 = 2 ** 64, 2 ** 63
    return f"""
        WITH kg AS (
            SELECT doc_id, g.i,
                   ({terms}) % {two64} AS hu
            FROM (SELECT doc_id, text AS t FROM documents),
                 unnest(range(length(t) - {k - 1})) AS g(i)
        ),
        wmin AS (
            -- minima over the UNSIGNED hash (the UDF's uint64 order);
            -- the signed bit-view conversion happens after selection
            SELECT doc_id, i,
                   min(hu) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING
                   ) AS fu,
                   count(*) OVER (PARTITION BY doc_id) AS n
            FROM kg
        ),
        idx AS (
            SELECT DISTINCT doc_id,
                   CAST(CASE WHEN fu >= {two63} THEN fu - {two64}
                             ELSE fu END AS BIGINT) AS f
            FROM wmin
            WHERE (n > {w} AND i <= n - {w}) OR (n <= {w} AND i = 0)
        ),
        keepf AS (
            SELECT f FROM idx GROUP BY f HAVING count(*) <= {max_df}
        ),
        capped AS (SELECT doc_id, f FROM idx JOIN keepf USING (f))
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               count(*) AS n_shared
        FROM capped a JOIN capped b USING (f)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {min_shared}
    """


@register(
    "dedup_winnow",
    oracle=_winnow_oracle(),
    tags=("dedup", "extension", "winnowing"),
)
def dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing verbatim-overlap pairs over the documents table,
    value-checked end-to-end: the DuckDB oracle recomputes the
    wrapping rolling hash in 128-bit arithmetic, the window minima,
    the boilerplate cap, and the shared-count threshold (previously
    rows-only — the winnowing guarantee and position independence
    stay pinned in tests/test_operators.py::test_winnow_*)."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return winnow_pairs(d)


# ---------------------------------------------------------------------------
# Cross-document repeated-substring (span-level) dedup: the
# suffix-array / ExactSubstr use case — find the maximal character
# spans repeated verbatim across many documents (license boilerplate,
# templates, mirrored paragraphs) and report each occurrence with its
# position, so a curation pipeline can CUT the spans instead of
# dropping whole documents.
# ---------------------------------------------------------------------------

SPAN_K = 16        # k-gram window (characters) — the position resolution
SPAN_MIN_DOCS = 3  # a span must appear in >= this many distinct docs
SPAN_MIN_LEN = 24  # minimal reported span length (characters)


def kgram_hash_seq(col: Column | str, k: int = SPAN_K) -> Column:
    """POSITION-ORDERED rolling k-gram hashes of a text column
    (``array<long>``, index = 0-based character offset): the same
    wrapping polynomial hash as :func:`winnowed_fingerprints`, but
    keeping EVERY window in sequence instead of winnow-sampling —
    ``posexplode`` over the result yields the (pos, hash) postings a
    span-level index needs. Arrow-batched, shuffle-free; documents
    shorter than ``k`` yield an empty array.

    Hashed over Unicode CODEPOINTS (a UTF-32 view), not UTF-8 bytes:
    array index i must BE the character offset the span contract and
    the splice in :func:`cut_repeated_spans` slice with — a byte-
    indexed hash would shift every span after the first non-ASCII
    character and silently cut the wrong text. For ASCII (codepoint =
    byte value) the hashes are bit-identical to the byte formulation,
    which is what keeps the DuckDB ``ascii(substr(...))`` oracle
    exact on the tripwired-ASCII corpus."""
    if k < 2:
        raise ValueError("k-gram hashing needs k >= 2")
    powers = _WINNOW_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    @F.pandas_udf("array<long>")
    def seq(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            b = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            n = len(b) - k + 1
            if n <= 0:
                out.append([])
                continue
            H = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                H += b[j : j + n] * powers[j]
            out.append(H.view(np.int64).tolist())
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    return seq(c)


def repeated_spans(
    df: DataFrame,
    min_docs: int = SPAN_MIN_DOCS,
    k: int = SPAN_K,
    min_len: int = SPAN_MIN_LEN,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_flagged: bool = True,
) -> DataFrame:
    """Cross-document repeated-substring detection — the span-level
    dedup modality document-level exact/near-dup methods cannot
    express (Lee et al., "Deduplicating Training Data Makes Language
    Models Better": their ExactSubstr suffix-array dedup; this is the
    shuffle-architected equivalent). A character span repeated
    verbatim in ≥ ``min_docs`` documents has EVERY one of its k-gram
    windows repeated in those documents, so: build (doc, pos, hash)
    postings for all k-grams (the decontamination window-hash kernel
    with positions kept), keep hashes whose doc-frequency ≥
    ``min_docs``, and merge per-document runs of CONSECUTIVE flagged
    positions (gaps-and-islands) into maximal spans of length ≥
    ``min_len``.

    Returns one row per span occurrence: ``(doc_id, span_start,
    span_len, cluster_id)`` with 0-based character offsets;
    ``cluster_id`` is the minimum window hash inside the run — equal
    maximal spans share it deterministically, so a downstream cut or
    keep-one-occurrence step can group by it.

    Scale shape: the postings table is the honest cost of
    substring-level dedup (~one row per character — the same order as
    ExactSubstr's suffix array) and it shuffles ONCE, on the hash,
    for the doc-frequency aggregation. Doc frequency is a plain
    ``count(*)`` with full map-side combine — NOT ``count_distinct``,
    which Spark plans as a second corpus-sized exchange on
    ``(h, doc)``: per-document distinctness is instead established
    row-locally with ``array_distinct`` on the hash array before the
    explode (each document's windows live in one row, so within-doc
    dedup costs nothing). The hash UDF runs once — the ARRAY form is
    what's cached; both the postings and the df-agg are cheap
    derivations of it. The flagged-hash set — bounded by how much
    repeated boilerplate exists, not corpus size — broadcasts back as
    a semi-join (``broadcast_flagged=False`` falls back to a hash
    join for pathological corpora), and the island merge
    windows+groups only the FLAGGED subset by doc_id, reusing one
    partitioning for both steps. No pair join materializes anywhere:
    cost is linear in corpus size + output size, never quadratic in
    duplicates."""
    _span_params_check(k, min_len)

    arrs = df.select(
        F.col(id_col).alias("doc_id"),
        kgram_hash_seq(F.col(text_col), k).alias("hs"),
    ).persist()
    # materialize before both consumers (df-agg + postings probe)
    # race the cache — the jaccard_pairs recompute lesson
    arrs.count()
    idx = arrs.select(
        "doc_id", F.posexplode("hs").alias("pos", "h")
    )
    flagged = (
        arrs.select(F.explode(F.array_distinct("hs")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("h")
    )
    if broadcast_flagged:
        flagged = F.broadcast(flagged)
    runs = _merge_flagged_islands(idx, flagged, k, min_len)
    return _release_on_gc(runs, arrs)


def _span_params_check(k: int, min_len: int) -> None:
    if min_len < k:
        raise ValueError(
            f"min_len ({min_len}) must be >= k ({k}): a span shorter "
            "than one window carries no flagged window at all"
        )


def _merge_flagged_islands(
    idx: DataFrame, flagged, k: int, min_len: int
) -> DataFrame:
    """The shared span kernel: semi-join the (doc_id, pos, h)
    postings against the flagged-hash set and merge consecutive
    flagged positions (gaps-and-islands) into maximal spans — ONE
    definition so the batch path (:func:`repeated_spans`) and the
    streaming finalize (:func:`finalize_repeated_spans`) cannot
    silently diverge (their equivalence is test-pinned)."""
    from pyspark.sql import Window

    rep = idx.join(flagged, "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = rep.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(k))
            .cast("long")
            .alias("span_len"),
            F.min("h").alias("cluster_id"),
        )
        .filter(F.col("span_len") >= min_len)
        .drop("grp")
    )


def _repeated_spans_ctes(
    k: int = SPAN_K,
    min_docs: int = SPAN_MIN_DOCS,
    min_len: int = SPAN_MIN_LEN,
) -> str:
    """Shared DuckDB CTE chain ending in ``runs(doc_id, span_start,
    span_len, cluster_id)`` — the span-detection twin both the
    detection oracle and the span-cut oracle build on: rolling k-gram
    hashes in 128-bit SQL arithmetic (the winnowing oracle's kernel,
    positions kept), doc-frequency filter, gaps-and-islands merge.
    cluster_id converts each hash to the signed int64 bit view BEFORE
    the MIN so both engines elect the same representative hash (the
    unsigned-vs-signed ordering gotcha the winnow oracle documents)."""
    terms = _kgram_hash_terms_sql(k)
    two64, two63 = 2 ** 64, 2 ** 63
    return f"""kg AS (
            SELECT doc_id, g.i AS pos, ({terms}) % {two64} AS hu
            FROM (SELECT doc_id, text AS t FROM documents),
                 unnest(range(length(t) - {k - 1})) AS g(i)
        ),
        rep AS (
            SELECT doc_id, pos,
                   CAST(CASE WHEN hu >= {two63} THEN hu - {two64}
                        ELSE hu END AS BIGINT) AS h
            FROM kg
            WHERE hu IN (SELECT hu FROM kg GROUP BY hu
                         HAVING COUNT(DISTINCT doc_id) >= {min_docs})
        ),
        isl AS (
            SELECT doc_id, pos, h,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY pos
                   ) AS grp
            FROM rep
        ),
        runs AS (
            SELECT doc_id,
                   CAST(MIN(pos) AS BIGINT) AS span_start,
                   CAST(MAX(pos) - MIN(pos) + {k} AS BIGINT) AS span_len,
                   MIN(h) AS cluster_id
            FROM isl GROUP BY doc_id, grp
            HAVING MAX(pos) - MIN(pos) + {k} >= {min_len}
        )"""


def _repeated_spans_oracle(
    k: int = SPAN_K,
    min_docs: int = SPAN_MIN_DOCS,
    min_len: int = SPAN_MIN_LEN,
) -> str:
    return f"""
        WITH {_repeated_spans_ctes(k, min_docs, min_len)}
        SELECT doc_id, span_start, span_len, cluster_id FROM runs
    """


@register(
    "dedup_repeated_spans",
    oracle=_repeated_spans_oracle(),
    tags=("dedup", "extension", "spans"),
    window_rank=1,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (substring) dedup over the documents table: every
    maximal character span of ≥ 24 chars repeated verbatim across ≥ 3
    documents, one row per occurrence with its 0-based offset, length
    and content cluster id — the boilerplate-cutting modality
    (ExactSubstr) that completes the dedup family next to exact /
    near-dup / embedding / winnow-pair detection. Value-checked
    end-to-end against a DuckDB oracle that recomputes the rolling
    hashes, the doc-frequency threshold and the island merge in SQL."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return repeated_spans(d)


def cut_repeated_spans(
    df: DataFrame,
    min_docs: int = SPAN_MIN_DOCS,
    k: int = SPAN_K,
    min_len: int = SPAN_MIN_LEN,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_spans: bool = True,
) -> DataFrame:
    """The CONSUMER of :func:`repeated_spans` — boilerplate STRIP:
    remove every repeated-span character range from every document
    (Lee et al.'s ExactSubstr cut, applied corpus-wide: the repeated
    content is by definition redundant training signal; a
    keep-one-copy policy composes on top by exempting one cluster
    representative before the cut). Returns
    ``(doc_id, cleaned, n_cut)`` for EVERY input document — docs with
    no repeated spans pass through with ``n_cut = 0``.

    Adjacent maximal runs whose k-gram windows are separated by a
    short unflagged gap still OVERLAP as character ranges (a window
    spans k chars past its start), so the cut first merges
    overlapping intervals per document — a second gaps-and-islands
    pass, this time over (start, end) intervals with a running-max
    end — then splices the surviving segments in one Arrow-batched
    UDF.

    Scale shape: on top of the detection cascade, the interval merge
    windows+groups only the span subset by doc_id (partitioning
    reused), the per-doc cut lists collect_list within that same
    partitioning, and the splice joins spans back to the corpus —
    broadcast by default (spans are bounded by repeated boilerplate,
    not corpus size; ``broadcast_spans=False`` falls back to a hash
    join). The text column shuffles nowhere."""
    from pyspark.sql import Window

    spans = repeated_spans(
        df, min_docs, k, min_len, id_col=id_col, text_col=text_col
    )
    iv = spans.select(
        "doc_id",
        F.col("span_start").alias("s"),
        (F.col("span_start") + F.col("span_len")).alias("e"),
    )
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1
    ).otherwise(0)
    merged = (
        iv.withColumn("brk", brk)
        .withColumn("mg", F.sum("brk").over(w))
        .groupBy("doc_id", "mg")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    )
    cuts = merged.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("ms", "me"))).alias("cuts")
    )
    if broadcast_spans:
        cuts = F.broadcast(cuts)

    @F.pandas_udf("string")
    def splice(text: pd.Series, cut_list: pd.Series) -> pd.Series:
        out = []
        for t, cs in zip(text, cut_list):
            if cs is None or len(cs) == 0:
                out.append(t)
                continue
            parts = []
            prev = 0
            for c in cs:
                parts.append(t[prev : c["ms"]])
                prev = c["me"]
            parts.append(t[prev:])
            out.append("".join(parts))
        return pd.Series(out)

    joined = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")
    ).join(cuts, "doc_id", "left")
    out = joined.select(
        "doc_id",
        splice(F.col("__t"), F.col("cuts")).alias("cleaned"),
        F.length("__t").cast("long").alias("__orig_len"),
    ).select(
        "doc_id",
        "cleaned",
        (F.col("__orig_len") - F.length("cleaned")).cast("long").alias(
            "n_cut"
        ),
    )
    # chain contract of _release_on_gc (the dedup_canonical_pick
    # lesson): derived frames keep no Python ref to `spans`, so
    # without this pin the detection cache releases at function exit
    # and the caller's action re-runs the k-gram UDF uncached
    out._span_cache_handle = spans
    return out


def _span_cut_oracle(
    k: int = SPAN_K,
    min_docs: int = SPAN_MIN_DOCS,
    min_len: int = SPAN_MIN_LEN,
) -> str:
    """DuckDB twin of the full cut: span detection (shared CTEs) →
    per-doc interval merge (running-max gaps-and-islands) → segment
    splice via ordered string_agg; docs without spans pass through."""
    return f"""
        WITH {_repeated_spans_ctes(k, min_docs, min_len)},
        iv AS (
            SELECT doc_id, span_start AS s, span_start + span_len AS e
            FROM runs
        ),
        o AS (
            SELECT doc_id, s, e,
                   CASE WHEN s > COALESCE(MAX(e) OVER (
                       PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), -1)
                   THEN 1 ELSE 0 END AS brk
            FROM iv
        ),
        gi AS (
            SELECT doc_id, s, e,
                   SUM(brk) OVER (
                       PARTITION BY doc_id ORDER BY s, e
                   ) AS mg
            FROM o
        ),
        merged AS (
            SELECT doc_id, MIN(s) AS ms, MAX(e) AS me
            FROM gi GROUP BY doc_id, mg
        ),
        seg AS (
            SELECT doc_id,
                   COALESCE(LAG(me) OVER (
                       PARTITION BY doc_id ORDER BY ms), 0) AS a,
                   ms AS b
            FROM merged
            UNION ALL
            SELECT m.doc_id, MAX(me), length(d.text)
            FROM merged m JOIN documents d USING (doc_id)
            GROUP BY m.doc_id, length(d.text)
        )
        SELECT d.doc_id,
               COALESCE(sg.cleaned, d.text) AS cleaned,
               CAST(length(d.text)
                    - length(COALESCE(sg.cleaned, d.text))
                    AS BIGINT) AS n_cut
        FROM documents d
        LEFT JOIN (
            SELECT doc_id,
                   string_agg(substr(text, a + 1, b - a), ''
                              ORDER BY a) AS cleaned
            FROM seg JOIN documents USING (doc_id)
            GROUP BY doc_id
        ) sg USING (doc_id)
    """


@register(
    "dedup_span_cut",
    oracle=_span_cut_oracle(),
    tags=("dedup", "extension", "spans"),
    window_rank=1,
)
def dedup_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate strip end-to-end: every repeated span (≥ 24 chars,
    ≥ 3 docs) cut out of every document, per-doc cleaned text + chars
    removed — the transform a curation pipeline actually applies
    after span detection. The DuckDB oracle recomputes detection,
    interval merge AND the string splice, so the gate is
    character-exact on the cleaned text."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return cut_repeated_spans(d)


def span_candidate_sink(
    target_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SPAN_K,
):
    """``foreachBatch`` sink maintaining the streaming state for
    repeated-span detection — the last dedup modality without a
    streaming twin (exact, near-dup and per-domain cap have theirs in
    streaming/events.py; the hh candidate sink covers heavy hitters).

    What must be persisted is different from the heavy-hitter case: a
    span can reach ``min_docs`` with ONE document per micro-batch, so
    no per-batch threshold can pre-filter candidates — the pigeonhole
    that bounds MG candidates does not transfer. What DOES transfer is
    mergeability: per-document distinctness of a k-gram hash is
    row-local (``array_distinct`` before the explode) and every doc
    lives in exactly one batch, so per-batch ``(h, df)`` partial
    doc-frequency counts SUM to the exact global doc frequency. Each
    micro-batch writes its partial-count segment ``batch=<id>/``
    (replays skip via the ``_SUCCESS`` protocol — a committed segment
    re-summed would double-count, unlike the hh sink's idempotent
    union, so the marker is load-bearing here); state is bounded by
    distinct k-grams, the information-theoretic floor for cross-batch
    substring detection.

    The exact spans then come from :func:`finalize_repeated_spans`
    over the accumulated corpus — equal to the batch
    :func:`repeated_spans` by construction (equivalence-tested).

    Returns the ``(batch_df, batch_id)`` callable."""
    from cae_polars_tools_spark.operators.sketches import _begin_segment

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns or batch_df.isEmpty():
            return
        seg = _begin_segment(target_dir, batch_id)
        if seg is None:
            return  # committed replay: re-summing would double-count
        (
            # one row per document: the partial df counts are exact
            # only if each doc contributes once across the WHOLE
            # stream — within-batch duplicates are dropped here;
            # cross-batch uniqueness of ids is the caller's contract
            # (the same stable-id premise every index sink has)
            batch_df.dropDuplicates([id_col])
            .select(kgram_hash_seq(F.col(text_col), k).alias("hs"))
            .select(F.explode(F.array_distinct("hs")).alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .write.mode("errorifexists")
            .parquet(seg)
        )

    return sink


def finalize_repeated_spans(
    spark: SparkSession,
    target_dir: str,
    corpus: DataFrame,
    min_docs: int = SPAN_MIN_DOCS,
    k: int = SPAN_K,
    min_len: int = SPAN_MIN_LEN,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_flagged: bool = True,
) -> DataFrame:
    """Exact repeated spans from the streaming state: sum the
    accumulated per-batch ``(h, df)`` partials to global doc
    frequencies, flag hashes at ``df ≥ min_docs``, and run the same
    flagged-postings island merge as :func:`repeated_spans` over the
    accumulated corpus — no re-counting, the text is hashed once
    here and never shuffled (the flagged set broadcasts). Output
    contract identical to :func:`repeated_spans` — both paths run the
    SAME island-merge kernel (:func:`_merge_flagged_islands`) and the
    same parameter validation, so they cannot silently diverge."""
    _span_params_check(k, min_len)
    flagged = (
        spark.read.parquet(target_dir)
        .groupBy("h")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("h")
    )
    if broadcast_flagged:
        flagged = F.broadcast(flagged)
    idx = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(kgram_hash_seq(F.col(text_col), k)).alias(
            "pos", "h"
        ),
    )
    return _merge_flagged_islands(idx, flagged, k, min_len)


# ---------------------------------------------------------------------------
# Edit-distance fuzzy join (PassJoin-style segment blocking) — the
# entity-resolution primitive (near-identical names / titles / keys).
# ---------------------------------------------------------------------------


def _seg_bounds(k, length, d):
    """Even (d+1)-way partition of a string of ``length``: segment k
    spans [floor(k·L/(d+1)), floor((k+1)·L/(d+1)))."""
    return (
        F.floor(k * length / (d + 1)).cast("int"),
        F.floor((k + 1) * length / (d + 1)).cast("int"),
    )


def fuzzy_pairs(
    strings: DataFrame,
    id_col: str = "id",
    str_col: str = "s",
    max_dist: int = 1,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` — WITHOUT an
    all-pairs join, via PassJoin-style pigeonhole blocking (Li et al.,
    "PassJoin: A Partition-based Method for Similarity Joins"):

    split every string into ``max_dist + 1`` contiguous segments; if
    ``edit(a, b) ≤ d`` then at most d segments of ``a`` are touched,
    so at least one survives VERBATIM inside ``b``, shifted by at most
    d positions. The indexed side emits its d+1 segments keyed by
    (string length, segment index, segment text); the probe side
    emits, for each candidate partner length ``l ∈ [len−d, len+d]``,
    the substrings at that segment's allowed positions. An equi-join
    on the key yields candidates — a tiny, selective set — and exact
    ``levenshtein() ≤ d`` verifies them.

    100 TB shape: segments/probes are pure JVM expressions
    (substr/transform/flatten — zero Python), the ONLY shuffle is the
    (len, k, segment) equi-join, probe fan-out is O(d²) per row, and
    no cartesian exists at any scale (plan-pinned in CI). Output:
    ``(id_a, id_b, dist)`` with ``id_a < id_b``, exact distances."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    d = max_dist
    # three derivations read this frame (index side, probe side, the
    # short-string patch) — persist it for the build, released when
    # the returned handle is dropped
    base = strings.select(
        F.col(id_col).alias("_fid"), F.col(str_col).alias("_fs")
    ).filter(F.length("_fs") > 0).persist()

    L = F.length("_fs")
    ks = F.sequence(F.lit(0), F.lit(d))

    # indexed side: (l, k, segment)
    seg_structs = F.transform(
        ks,
        lambda k: F.struct(
            k.cast("int").alias("k"),
            F.substr(
                "_fs",
                _seg_bounds(k, L, d)[0] + 1,
                _seg_bounds(k, L, d)[1] - _seg_bounds(k, L, d)[0],
            ).alias("seg"),
        ),
    )
    left = base.select(
        "_fid", "_fs", L.alias("_fl"), F.explode(seg_structs).alias("e")
    ).select(
        F.col("_fid").alias("id_a"),
        F.col("_fs").alias("s_a"),
        F.col("_fl").alias("l"),
        F.col("e.k").alias("k"),
        F.col("e.seg").alias("seg"),
    ).filter(F.length("seg") > 0)

    # probe side: for each partner length l' and segment k, the
    # substrings at positions start±d (clamped into the probe string)
    lens = F.sequence(F.greatest(L - d, F.lit(1)), L + d)
    probe_structs = F.flatten(
        F.transform(
            lens,
            lambda lp: F.flatten(
                F.transform(
                    ks,
                    lambda k: F.transform(
                        # guard the bounds: F.sequence DESCENDS when
                        # stop < start (an impossible range for this
                        # segment at this partner length), which would
                        # synthesize probes at negative positions —
                        # harmless (exact verify filters them) but
                        # wasted candidates at scale
                        F.when(
                            F.least(
                                _seg_bounds(k, lp, d)[0] + d,
                                L
                                - (
                                    _seg_bounds(k, lp, d)[1]
                                    - _seg_bounds(k, lp, d)[0]
                                ),
                            )
                            >= F.greatest(
                                _seg_bounds(k, lp, d)[0] - d, F.lit(0)
                            ),
                            F.sequence(
                                F.greatest(
                                    _seg_bounds(k, lp, d)[0] - d, F.lit(0)
                                ),
                                F.least(
                                    _seg_bounds(k, lp, d)[0] + d,
                                    L
                                    - (
                                        _seg_bounds(k, lp, d)[1]
                                        - _seg_bounds(k, lp, d)[0]
                                    ),
                                ),
                            ),
                        ).otherwise(F.array().cast("array<bigint>")),
                        lambda p: F.struct(
                            lp.cast("int").alias("l"),
                            k.cast("int").alias("k"),
                            F.substr(
                                "_fs",
                                p + 1,
                                _seg_bounds(k, lp, d)[1]
                                - _seg_bounds(k, lp, d)[0],
                            ).alias("seg"),
                        ),
                    ),
                )
            ),
        )
    )
    right = base.select(
        F.col("_fid").alias("id_b"),
        F.col("_fs").alias("s_b"),
        F.explode(probe_structs).alias("p"),
    ).select(
        "id_b", "s_b",
        F.col("p.l").alias("l"),
        F.col("p.k").alias("k"),
        F.col("p.seg").alias("seg"),
    ).filter(F.length("seg") > 0)

    cand = (
        left.join(right, ["l", "k", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "s_a", "id_b", "s_b")
    )

    # pigeonhole hole: a string SHORTER than d+1 chars has no segment
    # that must survive (its whole content fits in d edits), so those
    # pair with anything within the length bound |len diff| <= d.
    # The short set is bounded by construction (distinct strings of
    # length <= d over the alphabet), so it broadcasts; the partner
    # side is length-pruned to <= 2d. A constant-key equi-join keeps
    # this a broadcast HASH join — no nested-loop node.
    shorts = base.filter(L <= d).select(
        F.col("_fid").alias("sid"),
        F.col("_fs").alias("ss"),
        F.lit(0).alias("__k"),
    )
    near = base.filter(L <= 2 * d).select(
        F.col("_fid").alias("nid"),
        F.col("_fs").alias("ns"),
        F.lit(0).alias("__k"),
    )
    extra = (
        near.join(F.broadcast(shorts), "__k")
        .filter(F.col("sid") != F.col("nid"))
        .select(
            F.least("sid", "nid").alias("id_a"),
            F.when(F.col("sid") < F.col("nid"), F.col("ss"))
            .otherwise(F.col("ns"))
            .alias("s_a"),
            F.greatest("sid", "nid").alias("id_b"),
            F.when(F.col("sid") < F.col("nid"), F.col("ns"))
            .otherwise(F.col("ss"))
            .alias("s_b"),
        )
    )

    dist = F.levenshtein("s_a", "s_b")
    out = (
        cand.unionByName(extra)
        .distinct()
        .filter(dist <= d)
        .select("id_a", "id_b", dist.alias("dist"))
    )
    return _release_on_gc(out, base)


@register(
    "fuzzy_source_pairs",
    oracle="""
        WITH s AS (
            SELECT source, MIN(doc_id) AS id
            FROM documents GROUP BY source
        )
        SELECT a.id AS id_a, b.id AS id_b,
               levenshtein(a.source, b.source) AS dist
        FROM s a JOIN s b ON a.id < b.id
        WHERE levenshtein(a.source, b.source) <= 1
    """,
    tags=("dedup", "fuzzy", "extension"),
    window_rank=1,
)
def fuzzy_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 pairs among the corpus' distinct source names
    via the PassJoin blocking — value-checked against DuckDB's
    all-pairs levenshtein (the oracle may brute-force; the ENGINE may
    not, asserted by the plan suite)."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    sources = docs.groupBy("source").agg(F.min("doc_id").alias("id"))
    return fuzzy_pairs(sources, id_col="id", str_col="source", max_dist=1)

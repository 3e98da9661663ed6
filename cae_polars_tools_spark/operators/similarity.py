"""Approximate-nearest-neighbor search over embedding columns.

Three paths:

* **brute force** (baseline, oracle-checked): score every corpus row
  against the (small, driver-collected) query matrix inside
  ``mapInPandas`` — each embedding crosses the Arrow boundary ONCE
  PER ROW, never once per pair — with per-batch partial top-k, then
  one tiny global top-k window. At 100 TB the scoring pass is a
  single map over the corpus; only ``batches × queries × k``
  survivors shuffle.
* **random-hyperplane LSH** (scale path): 8 hash tables × 6 sign-bit
  planes bucket the vectors; a candidate is scored iff it shares a
  bucket with the query in ≥1 table (OR-amplification). Sub-linear
  candidate counts at the cost of recall — measured against brute
  force in tests.
* **IVF**: coarse k-means quantizer + nprobe cluster probing.

Scoring-kernel note (measured, sf0.1): evaluating the cosine per
candidate *pair* — whether as an interpreted higher-order expression
or as a pandas UDF over the joined pair rows — is dominated by either
interpretation or per-pair Arrow transfer of both 64-float arrays
(the pandas-UDF-per-pair variant measured ~2× worse than the HOF).
The ``score_against_queries`` kernel here avoids both: arrays ship
once per corpus row, scores come from dim-sequential vectorized
numpy (bit-identical doubles to ``dot_expr``/DuckDB ``list_sum`` —
numpy's pairwise-summing ``matmul`` would drift in the last ulp and
flip near-tie ranks vs the oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from cae_polars_tools_spark.io import read_table, spread
from cae_polars_tools_spark.operators.vectors import COSINE_SQL
from cae_polars_tools_spark.plans.registry import register

TOPK = 5
N_QUERIES = 10  # vec_id < 10 are the demo query set
EMBED_DIM = 64


MAX_COLLECTED_QUERIES = 65536  # broadcast-regime ceiling (~32 MB at dim 64)


def _collect_queries(
    queries: DataFrame, max_queries: int = MAX_COLLECTED_QUERIES
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver-side query matrix + squared norms. The query set must be
    small (broadcast regime — the premise of every top-k-per-query ANN
    shape), and that contract is ENFORCED, not assumed: the collect is
    ``limit(max_queries + 1)``-bounded so an oversized query set raises
    after pulling at most one row past the cap — it can never silently
    materialize an unbounded frame on the driver. Norms use the same
    sequential accumulation as ``dot_expr`` for bit parity."""
    pdf = (
        queries.select("vec_id", "embedding")
        .limit(max_queries + 1)
        .toPandas()
    )
    if len(pdf) > max_queries:
        raise ValueError(
            f"query set exceeds the broadcast regime ({len(pdf) - 1}+ rows"
            f" > max_queries={max_queries}); partition the queries or use"
            " a join-based scorer instead of top-k-per-query ANN"
        )
    qids = pdf["vec_id"].to_numpy().astype(np.int64)
    if len(qids) == 0:
        return qids, np.empty((0, 0)), np.empty(0)
    Q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)  # (nq, d)
    qn2 = np.zeros(len(Q), dtype=np.float64)
    for j in range(Q.shape[1]):
        qn2 += Q[:, j] * Q[:, j]
    return qids, Q, qn2


def score_against_queries(
    embeddings: DataFrame,
    queries: DataFrame,
    top_per_batch: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, raw_cos) for every corpus row × query.

    ``mapInPandas`` over ``(neighbor_id, embedding)`` rows: per Arrow
    batch, one dim-sequential vectorized pass computes all nq cosines
    per row (the accumulation order matches ``dot_expr`` exactly, so
    every double is bit-identical to the expression form and the
    DuckDB oracle). Self-pairs (neighbor == query id) are dropped.

    ``top_per_batch=k`` keeps only the k best rows per query per
    batch under ``(cos DESC, neighbor_id ASC)`` — an exact superset
    of the global top-k under the same ordering, so the downstream
    window sees ``batches × nq × k`` rows instead of ``|corpus| × nq``
    (the difference between a bounded shuffle and a corpus-sized one
    at 100 TB)."""
    qids, Q, qn2 = _collect_queries(queries)
    if len(qids) == 0:
        # an empty query set (a filter matched nothing) is a valid
        # input at scale — return a typed empty result instead of
        # letting np.stack blow up on zero arrays
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, raw_cos double"
        )
    d = Q.shape[1]
    nq = len(qids)
    sqrt_qn2 = np.sqrt(qn2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy().astype(np.int64)
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            acc = np.zeros((len(E), nq), dtype=np.float64)
            en2 = np.zeros(len(E), dtype=np.float64)
            for j in range(d):
                ej = E[:, j]
                acc += ej[:, None] * Q[:, j][None, :]
                en2 += ej * ej
            cos = acc / (np.sqrt(en2)[:, None] * sqrt_qn2[None, :])
            out_q: list[np.ndarray] = []
            out_n: list[np.ndarray] = []
            out_c: list[np.ndarray] = []
            for qi in range(nq):
                valid = ids != qids[qi]
                vids, vcos = ids[valid], cos[valid, qi]
                if top_per_batch is not None and len(vids) > top_per_batch:
                    keep = np.lexsort((vids, -vcos))[:top_per_batch]
                    vids, vcos = vids[keep], vcos[keep]
                out_q.append(np.full(len(vids), qids[qi], dtype=np.int64))
                out_n.append(vids)
                out_c.append(vcos)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "raw_cos": np.concatenate(out_c),
                }
            )

    return embeddings.mapInPandas(
        gen, schema="query_id long, neighbor_id long, raw_cos double"
    )


def _topk_window(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("raw_cos", 6).alias("cosine"),
        )
    )


def bruteforce_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = TOPK
) -> DataFrame:
    """Exact cosine top-k: one scoring map over the corpus (per-batch
    partial top-k) → global top-k window over the bounded survivor
    set. Ties broken by candidate id for determinism."""
    scored = score_against_queries(
        embeddings.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        queries,
        top_per_batch=k,
    )
    return _topk_window(scored, k)


@register(
    "ann_bruteforce_topk",
    oracle=f"""
        SELECT query_id, neighbor_id, "rank", ROUND(raw_cos, 6) AS cosine
        FROM (
            SELECT a.vec_id AS query_id,
                   b.vec_id AS neighbor_id,
                   {COSINE_SQL} AS raw_cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {COSINE_SQL} DESC, b.vec_id ASC
                   ) AS "rank"
            FROM embeddings a
            JOIN embeddings b ON a.vec_id < {N_QUERIES} AND b.vec_id != a.vec_id
        )
        WHERE "rank" <= {TOPK}
    """,
    tags=("similarity", "extension"),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the demo query set (vec_id<10)."""
    e = spread(read_table(spark, sf_dir, "embeddings"))
    return bruteforce_topk(e, e.filter(F.col("vec_id") < N_QUERIES))


def _score_candidates(
    candidates: DataFrame, embeddings: DataFrame, queries: DataFrame
) -> DataFrame:
    """Attach exact cosines to a (query_id, neighbor_id) candidate
    set: score each UNIQUE candidate row against the whole query
    matrix in one map (arrays cross Arrow once per unique candidate,
    nq scores each), then semi-filter back to the candidate pairs.
    Cheaper than a per-pair join whenever nq is small — the premise
    of the broadcast-query regime."""
    uniq = (
        candidates.select("neighbor_id")
        .distinct()
        .join(
            embeddings.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
    )
    scored_all = score_against_queries(uniq, queries)
    return candidates.join(scored_all, ["query_id", "neighbor_id"])


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


LSH_TABLES = 8  # OR-amplification: candidate if ANY table bucket matches
LSH_PLANES_PER_TABLE = 6  # 64 buckets per table


def _planes() -> np.ndarray:
    rng = np.random.default_rng(7_2024)
    return rng.standard_normal((LSH_TABLES * LSH_PLANES_PER_TABLE, EMBED_DIM))


def lsh_bucket_ctes() -> str:
    """DuckDB CTE text recomputing every vector's per-table sign-LSH
    bucket ids from the SAME seeded hyperplanes the pandas UDF uses —
    the buckets are seed-deterministic, so membership (not merely
    recall) is value-checkable in SQL. Plane weights are embedded as
    ``repr`` literals (exact double round-trip); each dot product is a
    ``list_sum`` over the same element order, and a sign can disagree
    with numpy's BLAS accumulation only for a vector lying within ~1
    ulp of a hyperplane — vanishingly unlikely for continuous data and
    loudly caught by the oracle gate if it ever happens.

    Defines ``lsh_tbl_buckets(vec_id, b0..b{tables-1})``."""
    P = _planes()
    dot_cols = []
    for j in range(P.shape[0]):
        arr = ", ".join(repr(float(x)) for x in P[j])
        dot_cols.append(
            f"list_sum(list_transform(generate_series(1, {EMBED_DIM}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * "
            f"(CAST([{arr}] AS DOUBLE[]))[i])) AS d{j}"
        )
    bucket_cols = []
    for t in range(LSH_TABLES):
        terms = " + ".join(
            f"(CASE WHEN d{t * LSH_PLANES_PER_TABLE + p} > 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p in range(LSH_PLANES_PER_TABLE)
        )
        bucket_cols.append(f"{terms} AS b{t}")
    return f"""
        lsh_dots AS (
            SELECT vec_id, {", ".join(dot_cols)} FROM embeddings
        ),
        lsh_tbl_buckets AS (
            SELECT vec_id, {", ".join(bucket_cols)} FROM lsh_dots
        )
    """


def lsh_share_any_table(left: str, right: str) -> str:
    """SQL predicate: two ``lsh_tbl_buckets`` rows collide in ≥1 table
    (the OR-amplification candidate rule)."""
    return " OR ".join(
        f"{left}.b{t} = {right}.b{t}" for t in range(LSH_TABLES)
    )


@F.pandas_udf(ArrayType(LongType()))
def lsh_buckets(emb: pd.Series) -> pd.Series:
    """Per-table LSH bucket ids (index = table): bucket bit p is set
    iff v · plane_{t,p} > 0. Random-hyperplane (sign) LSH with
    AND-amplification inside a table (6 planes → 64 buckets) and
    OR-amplification across 8 tables — the standard recall/cost dial.

    One numpy matmul per Arrow batch: (batch × dim) @ (dim × 48) →
    sign bits → per-table bucket ints. (Pairwise summation is fine
    HERE — only the signs are consumed, so ulp drift can flip a
    bucket only for vectors lying numerically on a plane.)"""
    import pandas as pd

    planes = _planes()  # (tables*planes, dim)
    if len(emb) == 0:  # empty Arrow batch — real at scale
        return pd.Series([], dtype=object)
    M = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
    bits = (M @ planes.T > 0).astype(np.int64)  # (n, tables*planes)
    weights = 1 << np.arange(LSH_PLANES_PER_TABLE, dtype=np.int64)
    buckets = bits.reshape(len(M), LSH_TABLES, LSH_PLANES_PER_TABLE) @ weights
    return pd.Series(list(buckets))


def _probe_buckets_udf(nprobe: int):
    """Pandas UDF: per row, per table, the base bucket plus the
    ``nprobe - 1`` Hamming-1 neighbors obtained by flipping the
    sign bits with the SMALLEST |margin| (the hyperplanes the vector
    lies closest to — the classic multi-probe heuristic): if a near
    neighbor hashes differently, it almost certainly differs in one
    of those low-confidence bits. Returns array<array<long>> indexed
    by table."""
    planes = _planes()

    @F.pandas_udf(ArrayType(ArrayType(LongType())))
    def probes(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(emb.to_numpy()).astype(np.float64)
        dots = M @ planes.T  # (n, tables*planes)
        bits = (dots > 0).astype(np.int64)
        weights = 1 << np.arange(LSH_PLANES_PER_TABLE, dtype=np.int64)
        buckets = (
            bits.reshape(len(M), LSH_TABLES, LSH_PLANES_PER_TABLE) @ weights
        )
        margins = np.abs(dots).reshape(
            len(M), LSH_TABLES, LSH_PLANES_PER_TABLE
        )
        order = np.argsort(margins, axis=2, kind="stable")
        n_flip = min(nprobe - 1, LSH_PLANES_PER_TABLE)
        out = []
        for i in range(len(M)):
            row = []
            for t in range(LSH_TABLES):
                base = int(buckets[i, t])
                row.append(
                    [base]
                    + [
                        base ^ (1 << int(order[i, t, j]))
                        for j in range(n_flip)
                    ]
                )
            out.append(row)
        return pd.Series(out)

    return probes


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = TOPK,
    nprobe: int = 1,
) -> DataFrame:
    """ANN top-k over candidates sharing ≥1 LSH table bucket with the
    query. Scale shape: (table, bucket) is the join key, so per-query
    work is the union of its 8 bucket populations — a tunable fraction
    of the corpus, never all of it. Candidate ids are deduplicated
    *before* embeddings are re-attached, so multi-table collisions
    never shuffle vector payloads twice.

    ``nprobe`` > 1 turns on MULTI-PROBE (Lv et al., VLDB'07, adapted
    to sign-LSH): each query additionally probes the ``nprobe - 1``
    Hamming-1 buckets reached by flipping its lowest-|margin| sign
    bits per table. This buys recall on the QUERY side only — the
    corpus index stays ×tables, nothing is re-bucketed or re-written —
    which is the right lever at 100 TB where the index dominates cost
    and queries are comparatively free. Recall vs brute force, its
    monotone growth in ``nprobe``, and candidate-superset behavior
    are asserted in tests."""
    if not 1 <= nprobe <= LSH_PLANES_PER_TABLE + 1:
        raise ValueError(
            f"nprobe must be in [1, {LSH_PLANES_PER_TABLE + 1}] "
            "(base bucket + one flip per plane)"
        )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode(lsh_buckets(F.col("embedding"))).alias("table", "bucket"),
    )
    if nprobe == 1:
        q = queries.select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(lsh_buckets(F.col("embedding"))).alias(
                "table", "bucket"
            ),
        )
    else:
        q = queries.select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(
                _probe_buckets_udf(nprobe)(F.col("embedding"))
            ).alias("table", "probes"),
        ).select(
            "query_id", "table", F.explode("probes").alias("bucket")
        )
    candidates = (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # a pair may collide in several tables/probes
    )
    return _topk_window(_score_candidates(candidates, embeddings, queries), k)


def _ann_lsh_oracle() -> str:
    # full value-level oracle (not recall-only): DuckDB recomputes the
    # seeded hyperplane buckets (lsh_bucket_ctes), derives the SAME
    # candidate set (≥1 shared table bucket), scores with the
    # bit-parity cosine and applies the identical top-k tie-break
    return f"""
        WITH {lsh_bucket_ctes()},
        cand AS (
            SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id
            FROM lsh_tbl_buckets qa
            JOIN lsh_tbl_buckets qb
              ON qa.vec_id < {N_QUERIES}
             AND qb.vec_id != qa.vec_id
             AND ({lsh_share_any_table("qa", "qb")})
        )
        SELECT query_id, neighbor_id, "rank", ROUND(raw_cos, 6) AS cosine
        FROM (
            SELECT cand.query_id,
                   cand.neighbor_id,
                   {COSINE_SQL} AS raw_cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY cand.query_id
                       ORDER BY {COSINE_SQL} DESC, cand.neighbor_id ASC
                   ) AS "rank"
            FROM cand
            JOIN embeddings a ON a.vec_id = cand.query_id
            JOIN embeddings b ON b.vec_id = cand.neighbor_id
        )
        WHERE "rank" <= {TOPK}
    """


@register(
    "ann_lsh_topk",
    oracle=_ann_lsh_oracle(),
    tags=("similarity", "extension", "lsh"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 for the demo query set,
    value-checked end-to-end: the oracle recomputes the seeded
    hyperplane buckets in SQL, so candidate MEMBERSHIP — not just
    recall — is hash-verified."""
    e = read_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < N_QUERIES))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + cluster probing
# ---------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 6
IVF_ITERS = 8
IVF_TRAIN_SAMPLE = 16384
IVF_TRAIN_FRACTION = 0.5

# Parity quantizer (the SQL-reproducible variant): the training sample
# is the first PARITY_TRAIN_SAMPLE rows (by id) with an even id — a
# keyed Bernoulli-like thinning both engines can restate exactly,
# unlike Spark's seeded sample whose membership depends on scan order.
# Centroid updates are rounded to PARITY_CENT_ROUND decimals after
# every Lloyd iteration in BOTH engines, which absorbs the
# summation-order ulps between numpy's pairwise sums and DuckDB's
# aggregate (error ~1e-10 at 4k members, two orders under the 0.5e-8
# rounding tolerance); all dot products accumulate dim-sequentially,
# so every post-rounding double is bit-identical across engines.
# Operating envelope: the ABSOLUTE rounding absorbs the RELATIVE sum
# drift only while |embedding values| ≲ 1e4 (error ≈ n·eps·|mean| vs
# the fixed 0.5e-8 tolerance); unit-norm-ish embedding spaces — the
# universal case — sit four orders inside it.
PARITY_TRAIN_SAMPLE = 4096
PARITY_CENT_ROUND = 8


def _parity_sample_matrix(
    embeddings: DataFrame,
    sample_size: int,
    id_col: str,
    emb_col: str,
    min_rows: int,
) -> np.ndarray:
    """The shared parity training sample as an (n, dim) float64
    matrix: the ``sample_size`` smallest even ids, collected via a
    distributed top-k (bounded driver footprint, independent of scan
    order) — used by the coarse quantizer AND the PQ codebooks so one
    SQL sample CTE restates both."""
    sample = (
        embeddings.filter((F.col(id_col) % 2) == 0)
        .orderBy(id_col)
        .limit(sample_size)
        .select(emb_col)
        .toPandas()[emb_col]
    )
    if len(sample) < min_rows:
        raise ValueError(
            f"parity quantizer needs >= {min_rows} even-id rows, "
            f"got {len(sample)}"
        )
    return np.stack(sample.to_numpy()).astype(np.float64)


def _parity_cos_matrix(E: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n × c) cosine matrix with dim-sequential accumulation — every
    double bit-identical to DuckDB's ``list_sum`` over the same
    element order (BLAS matmul's pairwise summation would drift in
    the last ulp and flip argmax/threshold verdicts on near-ties)."""
    n, d = E.shape
    acc = np.zeros((n, len(C)), dtype=np.float64)
    en2 = np.zeros(n, dtype=np.float64)
    cn2 = np.zeros(len(C), dtype=np.float64)
    for j in range(d):
        ej = E[:, j]
        acc += ej[:, None] * C[:, j][None, :]
        en2 += ej * ej
        cn2 += C[:, j] * C[:, j]
    return acc / (np.sqrt(en2)[:, None] * np.sqrt(cn2)[None, :])


def train_kmeans_parity(
    embeddings: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    n_iters: int = IVF_ITERS,
    sample_size: int = PARITY_TRAIN_SAMPLE,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Deterministic, cross-engine-reproducible coarse quantizer.

    Same bounded-sample Lloyd recipe as :func:`train_ivf_centroids`,
    but every step is restatable in ANSI SQL (see
    :func:`kmeans_parity_ctes`, which emits the DuckDB CTEs computing
    the IDENTICAL centroid matrix — the oracle contract for
    ``ann_ivf_topk`` / ``dedup_semantic``):

    * sample = the ``sample_size`` smallest ids with ``id % 2 = 0``
      (a distributed top-k — one bounded pass, no full sort, no
      dependence on partition scan order);
    * init = the first ``n_centroids`` sample rows;
    * assignment = cosine argmax, ties to the lowest cluster id, all
      dots dim-sequential (``_parity_cos_matrix``);
    * update = per-dimension mean rounded to ``PARITY_CENT_ROUND``
      decimals; empty clusters keep their previous centroid.

    Scale shape matches the scan-order trainer: the driver holds only
    the bounded sample and the (c × dim) matrix.
    """
    M = _parity_sample_matrix(
        embeddings, sample_size, id_col, emb_col, min_rows=n_centroids
    )
    return _lloyd_cos_parity(M, n_centroids, n_iters)


def _lloyd_cos_parity(M: np.ndarray, n_centroids: int, n_iters: int) -> np.ndarray:
    """The cosine parity Lloyd loop on a driver-resident sample —
    split out so callers that train several quantizers (IVF-PQ) can
    share ONE sample collect."""
    c = M[:n_centroids].copy()
    for _ in range(n_iters):
        cl = _parity_cos_matrix(M, c).argmax(axis=1)  # first-max = lowest id
        nxt = c.copy()  # empty clusters keep their old centroid
        for i in range(n_centroids):
            members = M[cl == i]
            if len(members):
                nxt[i] = np.round(
                    members.sum(axis=0) / len(members), PARITY_CENT_ROUND
                )
        c = nxt
    return c


def assign_udf_parity(centroids: np.ndarray):
    """Pandas UDF: nearest-centroid id under the parity cosine
    (dim-sequential dots, argmax ties to the lowest cluster id) —
    bit-agrees with the SQL ``km_assign`` CTE row for row."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(LongType())
    def assign(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        M = np.stack(emb.to_numpy()).astype(np.float64)
        return pd.Series(_parity_cos_matrix(M, C).argmax(axis=1).astype(np.int64))

    return assign


def probe_udf_parity(centroids: np.ndarray, nprobe: int):
    """Pandas UDF: the ``nprobe`` nearest centroid ids per query under
    the parity cosine, ordered (cos DESC, cluster ASC) — bit-agrees
    with the SQL ``km_probe`` CTE."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(ArrayType(LongType()))
    def probe(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(emb.to_numpy()).astype(np.float64)
        cos = _parity_cos_matrix(M, C)
        # stable argsort of -cos: equal cosines keep ascending cluster id
        order = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int64)))

    return probe


def _cos_sql(emb_expr: str, cent_expr: str, dim: int = EMBED_DIM) -> str:
    """DuckDB cosine between an embedding column expression (FLOAT[],
    cast per element) and a DOUBLE[] centroid expression — the same
    op order as ``_parity_cos_matrix``."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({emb_expr}[i] AS DOUBLE) * {cent_expr}[i])) / "
        f"(sqrt(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({emb_expr}[i] AS DOUBLE) * CAST({emb_expr}[i] AS DOUBLE)))) * "
        f"sqrt(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> {cent_expr}[i] * {cent_expr}[i]))))"
    )


def kmeans_parity_ctes(
    n_centroids: int,
    n_iters: int = IVF_ITERS,
    sample_size: int = PARITY_TRAIN_SAMPLE,
    dim: int = EMBED_DIM,
) -> str:
    """DuckDB CTE text recomputing :func:`train_kmeans_parity`'s
    centroid matrix from the ``embeddings`` table — Lloyd unrolled
    into one CTE pair per iteration (assignment → rounded per-dim
    mean, empty clusters carried through a LEFT JOIN). Defines:

    * ``km_cent(cl, c)`` — the final centroids (DOUBLE[]);
    * ``km_assign(vec_id, cl)`` — every corpus row's nearest centroid
      under the parity cosine (ties to the lowest cluster id).

    Same seeded-recompute oracle pattern as ``lsh_bucket_ctes``: the
    quantizer is deterministic, so cluster MEMBERSHIP — not merely
    recall — is value-checkable in SQL."""
    cos0 = _cos_sql("s.embedding", "c.c", dim)
    parts = [
        f"""
        km_sample AS MATERIALIZED (
            SELECT vec_id, embedding,
                   ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id % 2 = 0
                ORDER BY vec_id LIMIT {sample_size}
            )
        ),
        km_cent_0 AS MATERIALIZED (
            SELECT rn - 1 AS cl,
                   list_transform(generate_series(1, {dim}),
                                  i -> CAST(embedding[i] AS DOUBLE)) AS c
            FROM km_sample WHERE rn <= {n_centroids}
        )"""
    ]
    for t in range(1, n_iters + 1):
        prev = f"km_cent_{t - 1}"
        parts.append(
            f"""
        km_asg_{t} AS MATERIALIZED (
            SELECT vec_id, embedding, cl FROM (
                SELECT s.vec_id, s.embedding, c.cl,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {cos0} DESC, c.cl ASC
                       ) AS rnk
                FROM km_sample s CROSS JOIN {prev} c
            ) WHERE rnk = 1
        ),
        km_upd_{t} AS MATERIALIZED (
            SELECT cl, list(v ORDER BY pos) AS c FROM (
                SELECT a.cl, g.i AS pos,
                       round(avg(CAST(a.embedding[g.i] AS DOUBLE)),
                             {PARITY_CENT_ROUND}) AS v
                FROM km_asg_{t} a, generate_series(1, {dim}) AS g(i)
                GROUP BY a.cl, g.i
            ) GROUP BY cl
        ),
        km_cent_{t} AS MATERIALIZED (
            SELECT p.cl, COALESCE(u.c, p.c) AS c
            FROM {prev} p LEFT JOIN km_upd_{t} u USING (cl)
        )"""
        )
    parts.append(
        f"""
        km_cent AS MATERIALIZED (SELECT cl, c FROM km_cent_{n_iters}),
        km_assign AS MATERIALIZED (
            SELECT vec_id, cl FROM (
                SELECT s.vec_id, c.cl,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {cos0} DESC, c.cl ASC
                       ) AS rnk
                FROM embeddings s CROSS JOIN km_cent c
            ) WHERE rnk = 1
        )"""
    )
    return ",".join(parts)


def _assign_udf(centroids: np.ndarray):
    """Pandas UDF mapping an embedding to its nearest centroid id by
    cosine (centroids are L2-normalized once, driver-side). The
    centroid matrix rides to executors inside the serialized closure —
    it is nprobe-lists × dim floats, kilobytes at any corpus size."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(LongType())
    def assign(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        M = np.stack(emb.to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        return pd.Series((M @ cn.T).argmax(axis=1).astype(np.int64))

    return assign


def _lloyd_refine_distributed(embeddings: DataFrame, c: np.ndarray) -> np.ndarray:
    """One distributed Lloyd iteration over the FULL corpus: assign
    (vectorized UDF) → posexplode → per-(cluster, dim) sum/count.
    The driver only ever holds the (C × dim) centroid matrix; the
    shuffle key is (cluster, dim) — C·dim cells regardless of corpus
    size, so the reduce side is trivially small at any scale."""
    assign = _assign_udf(c)
    stats = (
        embeddings.select(
            assign(F.col("embedding")).alias("cl"),
            F.posexplode("embedding").alias("pos", "v"),
        )
        .groupBy("cl", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values(["cl", "pos"])
    )
    nxt = c.copy()  # empty clusters keep their old centroid
    for cl, grp in stats.groupby("cl"):
        nxt[int(cl)] = grp["s"].to_numpy() / grp["n"].to_numpy()
    return nxt


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    n_iters: int = IVF_ITERS,
    sample_size: int = IVF_TRAIN_SAMPLE,
    distributed_iters: int = 0,
    sample_fraction: float = IVF_TRAIN_FRACTION,
) -> np.ndarray:
    """Coarse-quantizer training: local Lloyd on a bounded *seeded*
    Bernoulli sample, the standard IVF recipe (FAISS trains its
    quantizer on a sample for the same reason): centroid quality needs
    O(centroids × oversampling) points, not the corpus.

    The sample is ``sample(fraction).limit(target)`` — no ``count()``
    (which cost a full corpus scan per query run) and no ``orderBy``
    (a sort). ``limit`` executes incrementally, so only the first
    ~``target / fraction`` rows are ever scanned regardless of corpus
    size — at 100 TB that is a few hundred thousand rows, not the
    table. The trade: rows come from the first-scanned partitions
    (Bernoulli-thinned within them), so training mixes less across
    far-apart shards than a full uniform sample; pass a smaller
    ``sample_fraction`` to widen the scanned span when shard order
    correlates with content. Deterministic for a fixed input
    partitioning (seeded sample + in-order limit).

    ``distributed_iters`` optionally appends full-corpus Lloyd passes
    (``_lloyd_refine_distributed``) for exact convergence on the whole
    dataset; assignments by cosine, matching ``_assign_udf``."""
    target = max(sample_size, n_centroids)
    sample = (
        embeddings.select("embedding")
        .sample(fraction=sample_fraction, seed=20240813)
        .limit(target)
        .toPandas()["embedding"]
    )
    if len(sample) < n_centroids:
        # tiny corpus: the thinned sample can't even seed the
        # centroids — fall back to an unsampled prefix
        sample = embeddings.select("embedding").limit(target).toPandas()["embedding"]
    if len(sample) == 0:
        raise ValueError(
            "train_ivf_centroids: the corpus is empty — nothing to train on"
        )
    M = np.stack(sample.to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    c = M[:n_centroids].copy()  # deterministic init: first sampled rows
    dim = c.shape[1]
    for _ in range(n_iters):
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        cl = (Mn @ cn.T).argmax(axis=1)
        nxt = c.copy()  # empty clusters keep their old centroid
        for i in range(n_centroids):
            members = M[cl == i]
            if len(members):
                nxt[i] = members.mean(axis=0)
        c = nxt
    for _ in range(distributed_iters):
        c = _lloyd_refine_distributed(embeddings, c)
    assert c.shape == (n_centroids, dim)
    return c


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = TOPK,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    sample_fraction: float = IVF_TRAIN_FRACTION,
    parity: bool = False,
) -> DataFrame:
    """IVF ANN: candidates come from the ``nprobe`` centroid lists
    nearest to each query, then exact cosine + top-k window.

    Scale shape: the corpus is hash-partitioned by cluster id exactly
    once (the inverted file); each query probes nprobe/n_centroids of
    the corpus. Recall vs brute force is measured in tests — raise
    ``nprobe`` to buy recall, ``n_centroids`` to buy selectivity,
    lower ``sample_fraction`` to widen the training sample's scanned
    span when shard order correlates with content (see
    :func:`train_ivf_centroids`).

    ``parity=True`` swaps in the SQL-reproducible quantizer
    (:func:`train_kmeans_parity` + the dim-sequential assign/probe
    kernels) so the ENTIRE result is value-checkable against the
    ``kmeans_parity_ctes`` DuckDB oracle; same algorithm, same scale
    shape, deterministic regardless of input partitioning."""
    if parity:
        centroids = train_kmeans_parity(embeddings, n_centroids)
        assign = assign_udf_parity(centroids)
        probe = probe_udf_parity(centroids, nprobe)
    else:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, sample_fraction=sample_fraction
        )
        assign = _assign_udf(centroids)
        cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

        @F.pandas_udf(ArrayType(LongType()))
        def probe_scan(emb: pd.Series) -> pd.Series:
            if len(emb) == 0:
                return pd.Series([], dtype=object)
            M = np.stack(emb.to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            order = np.argsort(-(M @ cn.T), axis=1)[:, :nprobe].astype(np.int64)
            return pd.Series(list(order))

        probe = probe_scan

    cand = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        assign(F.col("embedding")).alias("cl"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(probe(F.col("embedding"))).alias("cl"),
    )
    candidates = (
        cand.join(F.broadcast(q), on="cl")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    return _topk_window(_score_candidates(candidates, embeddings, queries), k)


def _ann_ivf_oracle() -> str:
    # full value-level oracle: DuckDB retrains the parity quantizer
    # (kmeans_parity_ctes — bit-identical centroids), re-derives every
    # corpus row's cluster and each query's nprobe probe list, then
    # scores the identical candidate set with the bit-parity cosine
    # and applies the same top-k tie-break (the _ann_lsh_oracle
    # pattern, with the learned quantizer replacing the seeded planes)
    cosq = _cos_sql("s.embedding", "c.c")
    return f"""
        WITH {kmeans_parity_ctes(IVF_CENTROIDS)},
        km_probe AS (
            SELECT vec_id AS query_id, cl FROM (
                SELECT s.vec_id, c.cl,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {cosq} DESC, c.cl ASC
                       ) AS rnk
                FROM embeddings s CROSS JOIN km_cent c
                WHERE s.vec_id < {N_QUERIES}
            ) WHERE rnk <= {IVF_NPROBE}
        ),
        cand AS (
            SELECT p.query_id, a.vec_id AS neighbor_id
            FROM km_probe p JOIN km_assign a ON a.cl = p.cl
            WHERE a.vec_id != p.query_id
        )
        SELECT query_id, neighbor_id, "rank", ROUND(raw_cos, 6) AS cosine
        FROM (
            SELECT cand.query_id,
                   cand.neighbor_id,
                   {COSINE_SQL} AS raw_cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY cand.query_id
                       ORDER BY {COSINE_SQL} DESC, cand.neighbor_id ASC
                   ) AS "rank"
            FROM cand
            JOIN embeddings a ON a.vec_id = cand.query_id
            JOIN embeddings b ON b.vec_id = cand.neighbor_id
        )
        WHERE "rank" <= {TOPK}
    """


@register(
    "ann_ivf_topk",
    oracle=_ann_ivf_oracle(),
    tags=("similarity", "extension", "ivf"),
    window_rank=1,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for the demo query set, value-checked
    end-to-end: the parity quantizer is retrained inside the oracle
    SQL (bit-identical centroids, assignments and probe lists), so
    candidate MEMBERSHIP — not just recall — is hash-verified."""
    e = spread(read_table(spark, sf_dir, "embeddings"))
    return ivf_topk(e, e.filter(F.col("vec_id") < N_QUERIES), parity=True)


OUTLIER_COS_THRESHOLD = 0.0


@register(
    "emb_outliers",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, embedding FROM embeddings
            WHERE label IS NOT NULL
        ),
        x AS (
            SELECT label, i AS pos,
                   avg(CAST(embedding[i] AS DOUBLE)) AS c
            FROM e, generate_series(1, 64) AS g(i)
            GROUP BY label, i
        ),
        cent AS (
            SELECT label, list(c ORDER BY pos) AS centroid
            FROM x GROUP BY label
        )
        SELECT e.vec_id, e.label,
               round(
                   list_sum(list_transform(generate_series(1, 64),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * cent.centroid[i]))
                   / (sqrt(list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(e.embedding[i] AS DOUBLE)
                               * CAST(e.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, 64),
                          i -> cent.centroid[i] * cent.centroid[i])))),
                   6) AS centroid_cos,
               round(
                   list_sum(list_transform(generate_series(1, 64),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * cent.centroid[i]))
                   / (sqrt(list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(e.embedding[i] AS DOUBLE)
                               * CAST(e.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, 64),
                          i -> cent.centroid[i] * cent.centroid[i])))),
                   6) < {OUTLIER_COS_THRESHOLD} AS is_outlier
        FROM e JOIN cent USING (label)
    """,
    tags=("embedding", "quality", "extension"),
    window_rank=1,
)
def emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid outlier scoring: each embedding's cosine to
    its label's mean vector, plus an outlier verdict — the embedding-
    space curation signal (SemDeDup's sibling: prune what is FAR from
    every cluster, not just what duplicates a neighbor).

    Scale shape: the centroid aggregation shuffles only
    ``(label, pos)`` cells — C·dim rows regardless of corpus size
    (the `_lloyd_refine_distributed` contract); the bounded centroid
    table broadcasts back and the scoring pass is a zero-shuffle HOF
    over each row's own array (``dot_expr``'s sequential
    accumulation, bit-identical to the DuckDB oracle; the mean and
    cosine are rounded to 1e-6 to absorb summation-order ulps in the
    avg)."""
    from cae_polars_tools_spark.operators.vectors import cosine_expr

    e = (
        spread(read_table(spark, sf_dir, "embeddings"))
        .filter(F.col("label").isNotNull())
        .select("vec_id", "label", "embedding")
    )
    cells = e.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    cent = (
        cells.groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    cos = cosine_expr(F.col("embedding"), F.col("centroid"))
    return e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.round(cos, 6).alias("centroid_cos"),
        # threshold the ROUNDED value: the raw double carries
        # summation-order ulps from the distributed avg, and a cosine
        # one ulp either side of the cut would flip the verdict
        # between engines
        (F.round(cos, 6) < OUTLIER_COS_THRESHOLD).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Distributed PCA over the embedding column — dimensionality reduction
# / whitening for downstream ANN and clustering.
# ---------------------------------------------------------------------------


def train_pca(
    embeddings: DataFrame,
    k: int,
    emb_col: str = "embedding",
) -> dict:
    """PCA model over an embedding column in ONE distributed pass.

    Per Arrow batch, a numpy kernel accumulates the dim×dim Gram
    matrix, the per-dimension sum and the row count, and emits them as
    (cell_index, value) rows — dim² + dim + 1 cells per PARTITION
    regardless of row count. A trivial ``groupBy(cell).sum`` (4,161
    cells at dim=64) reduces them; the driver assembles the covariance
    C = G/n − μμᵀ and eigendecomposes it (``numpy.linalg.eigh`` on a
    dim×dim symmetric matrix — microseconds). Nothing proportional to
    the corpus ever reaches the driver; the only shuffle carries the
    fixed cell set.

    Sign convention: each component's largest-|loading| coordinate is
    made positive, so the basis is reproducible across runs up to the
    last-ulp drift of distributed summation (the covariance cell sums
    combine in task-completion order — document tolerance-based
    comparisons downstream, not byte equality).

    Returns ``{"mean": (dim,), "components": (k, dim) row-major,
    "explained_variance": (k,), "n": int}``.
    """
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.types import DoubleType as _D
    from pyspark.sql.types import LongType as _L

    if k < 1:
        raise ValueError("k must be >= 1")

    schema = StructType(
        [StructField("cell", _L()), StructField("v", _D())]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        s = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            if gram is None:
                d = M.shape[1]
                gram = np.zeros((d, d))
                s = np.zeros(d)
            gram += M.T @ M
            s += M.sum(axis=0)
            n += len(M)
        if gram is None:
            return
        d = len(s)
        cells = np.concatenate([gram.reshape(-1), s, [float(n)]])
        yield pd.DataFrame(
            {"cell": np.arange(d * d + d + 1, dtype=np.int64), "v": cells}
        )

    rows = (
        embeddings.select(emb_col)
        .mapInPandas(partials, schema=schema)
        .groupBy("cell")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    if not rows:
        raise ValueError("train_pca: the corpus is empty")
    cells = {r["cell"]: r["v"] for r in rows}
    total = len(cells)
    d = int(round((-1 + np.sqrt(4 * total - 3)) / 2))  # d² + d + 1 = total
    assert d * d + d + 1 == total, "inconsistent PCA cell count"
    if k > d:
        raise ValueError(f"k={k} exceeds the embedding dimension {d}")
    gram = np.array([cells[i] for i in range(d * d)]).reshape(d, d)
    s = np.array([cells[d * d + i] for i in range(d)])
    n = int(cells[d * d + d])
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: largest-|loading| coordinate positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": evals[order],
        "n": n,
    }


def project_pca(
    embeddings: DataFrame,
    model: dict,
    emb_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project the embedding column onto a trained PCA basis:
    ``(x − μ) @ componentsᵀ`` as an Arrow-batched kernel. The (k × dim)
    model rides to executors inside the closure — kilobytes at any
    corpus size; the projection is a zero-shuffle map."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)

    @F.pandas_udf(ArrayType(DoubleType()))
    def proj(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(emb.to_numpy()).astype(np.float64)
        P = (M - mean) @ comps.T
        return pd.Series(list(P))

    return embeddings.withColumn(out_col, proj(F.col(emb_col)))


PCA_K = 8
# reconstruction with the top-8 of 64 components must capture at
# least this fraction of total variance on the benchmark embeddings
# (they are near-isotropic noise + label structure; the bound is
# intentionally loose — the exact spectrum is property-tested against
# numpy's full PCA in tests/test_operators.py)
PCA_MIN_VARIANCE_FRACTION = 0.08


@register(
    "emb_pca_project",
    # eigenvectors are not SQL-expressible, so the hash-checked
    # contract is the INVARIANT frame (the mm_jpeg_roundtrip
    # pattern): exact per-row coverage + projection width, plus
    # flags that must hash TRUE on every row — centering (projection
    # of the mean-removed data sums to ~0 per component across the
    # corpus is a global property, so per-row we pin the dimension
    # and finite-ness)
    oracle=f"""
        SELECT vec_id,
               {PCA_K} AS k,
               TRUE AS finite
        FROM embeddings
    """,
    tags=("similarity", "extension", "pca"),
    window_rank=1,
)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train PCA on the embeddings table and project every vector —
    the classic pre-ANN dimensionality reduction, end to end. The
    oracle hash-checks the invariant frame (coverage, output width,
    finiteness); the spectrum itself is property-tested against
    numpy's exact PCA in the unit suite."""
    e = spread(read_table(spark, sf_dir, "embeddings"))
    model = train_pca(e, PCA_K)
    out = project_pca(e, model)
    return out.select(
        "vec_id",
        F.size("pca").alias("k"),
        F.forall(
            "pca", lambda v: ~F.isnan(v) & ~v.eqNullSafe(F.lit(None))
        ).alias("finite"),
    )


# ---------------------------------------------------------------------------
# IVF-PQ — product quantization + asymmetric-distance (ADC) scoring,
# the standard billion-scale ANN layout (FAISS IVF{n},PQ{m}): the
# corpus is stored as m small codebook ids per row (64 floats → m
# bytes, a 32-64× scan-size reduction at 100 TB) and queries score
# candidates through per-subspace distance TABLE LOOKUPS instead of
# full-dimension arithmetic.
# ---------------------------------------------------------------------------

PQ_SUBSPACES = 8       # m: 64 dims → 8 subvectors of 8
PQ_CODEWORDS = 16      # k per subspace codebook (m·log2(k) = 32 bits/vector)
PQ_ITERS = 6


def _parity_normalize(E: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization with the sequential norm
    accumulation — bit-identical to the oracle's ``pq_norm`` CTE.
    Cosine-metric PQ normalizes first so squared L2 becomes the
    monotone 2 − 2·cos of the cosine ranking (the standard recipe);
    ADC then approximates the same ordering brute force uses."""
    n2 = np.zeros(len(E), dtype=np.float64)
    for j in range(E.shape[1]):
        n2 += E[:, j] * E[:, j]
    return E / np.sqrt(n2)[:, None]


def _parity_l2_matrix(E: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n × c) squared-L2 matrix with dim-sequential accumulation —
    bit-identical to the oracle's ``list_sum`` of per-dim squared
    differences (the PQ twin of ``_parity_cos_matrix``; PQ trains and
    scores in L2 per the standard formulation)."""
    n, d = E.shape
    acc = np.zeros((n, len(C)), dtype=np.float64)
    for j in range(d):
        diff = E[:, j][:, None] - C[:, j][None, :]
        acc += diff * diff
    return acc


def _lloyd_l2_parity(M: np.ndarray, k: int, n_iters: int) -> np.ndarray:
    """SQL-restatable k-means in L2 on a driver-resident sample: init
    = first k rows, argmin assignment (ties to the lowest id), per-dim
    mean rounded to PARITY_CENT_ROUND each iteration, empty clusters
    keep their centroid — the L2 twin of train_kmeans_parity's loop."""
    c = M[:k].copy()
    for _ in range(n_iters):
        cl = _parity_l2_matrix(M, c).argmin(axis=1)
        nxt = c.copy()
        for i in range(k):
            members = M[cl == i]
            if len(members):
                nxt[i] = np.round(
                    members.sum(axis=0) / len(members), PARITY_CENT_ROUND
                )
        c = nxt
    return c


def train_pq_parity(
    embeddings: DataFrame,
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODEWORDS,
    n_iters: int = PQ_ITERS,
    sample_size: int = PARITY_TRAIN_SAMPLE,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Product-quantizer codebooks, (m, k, dim/m), trained on the
    L2-NORMALIZED sample (cosine-metric PQ): ONE bounded sample
    collect (shared shape with the coarse quantizer), then an
    independent parity Lloyd per subvector slice. Deterministic and
    fully restatable in SQL (:func:`pq_parity_ctes`)."""
    M = _parity_sample_matrix(
        embeddings, sample_size, id_col, emb_col, min_rows=k
    )
    return _pq_codebooks_from(M, m, k, n_iters)


def _pq_codebooks_from(
    M: np.ndarray, m: int, k: int, n_iters: int
) -> np.ndarray:
    """Per-subspace L2 parity Lloyd on an (unnormalized) sample
    matrix — normalization happens here so a caller sharing the raw
    sample with the coarse trainer stays bit-consistent."""
    Mn = _parity_normalize(M)
    d = Mn.shape[1]
    if d % m:
        raise ValueError(f"dim {d} is not divisible by {m} subspaces")
    dsub = d // m
    return np.stack(
        [
            _lloyd_l2_parity(Mn[:, j * dsub : (j + 1) * dsub], k, n_iters)
            for j in range(m)
        ]
    )


def pq_encode_udf(codebooks: np.ndarray):
    """Pandas UDF: embedding → ``array<long>`` of m codebook ids
    (per-subspace argmin L2, ties to the lowest id, sequential
    accumulation — bit-agrees with the SQL ``pq_codes`` CTE). This is
    the PQ compression map: at 100 TB the encoded corpus is what you
    persist and scan, not the float vectors."""
    C = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, _k, dsub = C.shape

    @F.pandas_udf(ArrayType(LongType()))
    def encode(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        M = _parity_normalize(np.stack(emb.to_numpy()).astype(np.float64))
        codes = np.empty((len(M), m), dtype=np.int64)
        for j in range(m):
            sub = M[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = _parity_l2_matrix(sub, C[j]).argmin(axis=1)
        return pd.Series(list(codes))

    return encode


PQ_RERANK = 60  # ADC survivors per query fed to the exact re-rank


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = TOPK,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_SUBSPACES,
    n_codewords: int = PQ_CODEWORDS,
    rerank: int | None = PQ_RERANK,
) -> DataFrame:
    """IVF-PQ ANN with exact re-rank — the full production cascade:
    the coarse parity quantizer routes each query to ``nprobe``
    inverted lists; candidates there are scored by PQ asymmetric
    distance (Σ_j dtable[query, j, code_j], with the per-query m × k
    distance tables precomputed once, driver-side, against the
    L2-normalized query); the best ``rerank`` ADC survivors per query
    are then re-scored with the exact cosine on their float vectors
    and the true top-k emitted. ``rerank=None`` returns the raw ADC
    ranking (columns ``approx_d2`` instead of ``cosine``).

    Scale shape: the corpus is touched by exactly two zero-shuffle
    vectorized maps (coarse assign + PQ encode — in production both
    persist with the table); ADC scoring reads only the m-byte code
    columns of the probed cells and does table lookups, never
    full-dimension arithmetic, so the scan is ~32× smaller than the
    float corpus; float vectors are fetched ONLY for the bounded
    rerank·queries survivor set. Recall: the ADC stage alone is
    quantization-limited (~0.2 on the near-isotropic demo vectors,
    their hardest case); the re-rank recovers the IVF routing's
    recall (property-tested ≥ the plain-IVF bound).

    Fully value-checkable: coarse centroids, codebooks, probe lists,
    codes, ADC sums and the re-rank are all deterministic and
    restated by the DuckDB oracle (``_ann_ivfpq_oracle``)."""
    # ONE bounded sample collect feeds both quantizers (they share the
    # keyed-sample definition, so the SQL oracle's km_sample/pq_sample
    # CTEs see the identical rows)
    M = _parity_sample_matrix(
        embeddings,
        PARITY_TRAIN_SAMPLE,
        "vec_id",
        "embedding",
        min_rows=max(n_centroids, n_codewords),
    )
    centroids = _lloyd_cos_parity(M, n_centroids, IVF_ITERS)
    assign = assign_udf_parity(centroids)
    codebooks = _pq_codebooks_from(M, m, n_codewords, PQ_ITERS)
    encode = pq_encode_udf(codebooks)

    cand = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        assign(F.col("embedding")).alias("cl"),
        encode(F.col("embedding")).alias("codes"),
    )
    return _ivfpq_query(
        cand, queries, centroids, codebooks, k, nprobe, rerank,
        embeddings,
    )


def _ivfpq_query(
    cand: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int,
    nprobe: int,
    rerank: int | None,
    embeddings: DataFrame | None,
    prune_partitions: bool = False,
) -> DataFrame:
    """The IVF-PQ query stage, shared by the inline cascade
    (:func:`ivfpq_topk`) and the persisted-index path
    (:func:`query_ivfpq_index`): probe routing, per-query ADC tables,
    the code-only lookup scorer, the bounded top-``keep`` cut, and
    the optional exact re-rank. ``cand`` is the encoded corpus
    ``(neighbor_id, cl, codes)`` — built on the fly or read from the
    persisted codes table. With ``prune_partitions`` the probed cell
    set (bounded: nprobe x |queries|) is applied as a static ``cl
    IN (…)`` filter so a ``partitionBy("cl")``-laid-out codes table
    scans ONLY the probed inverted lists (partition pruning at the
    source — the read-path contract of the persisted layout)."""
    m, n_codewords, _dsub_cb = codebooks.shape
    probe = probe_udf_parity(centroids, nprobe)

    qids, Q, _qn2 = _collect_queries(queries)
    dsub = Q.shape[1] // m if len(qids) else 0
    Qn = _parity_normalize(Q) if len(qids) else Q
    # per-query ADC tables: (nq, m, k) squared distances on the
    # normalized query, sequential accumulation so every double
    # matches the oracle's list_sum
    dtab = np.empty((len(qids), m, n_codewords), dtype=np.float64)
    for j in range(m):
        dtab[:, j, :] = _parity_l2_matrix(
            Qn[:, j * dsub : (j + 1) * dsub], codebooks[j]
        )
    qid_to_row = {int(q): i for i, q in enumerate(qids)}

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(probe(F.col("embedding"))).alias("cl"),
    )
    if prune_partitions:
        # exact driver-side probe cells (same parity math as the UDF);
        # bounded by the _collect_queries guard
        cells: set[int] = set()
        if len(qids):
            sims = _parity_cos_matrix(Q, centroids)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            cells = {int(c) for row in order for c in row}
        cand = cand.filter(F.col("cl").isin(sorted(cells)))
    pairs = cand.join(F.broadcast(q), on="cl").filter(
        F.col("query_id") != F.col("neighbor_id")
    )

    keep = k if rerank is None else max(rerank, k)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            qrows = np.array(
                [qid_to_row[int(qv)] for qv in pdf["query_id"]],
                dtype=np.int64,
            )
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            # Σ_j dtab[q, j, code_j], ascending j — the oracle's
            # list(ORDER BY j) → list_sum order exactly
            approx = np.zeros(len(pdf), dtype=np.float64)
            for j in range(m):
                approx = approx + dtab[qrows, j, codes[:, j]]
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].astype("int64"),
                    "neighbor_id": pdf["neighbor_id"].astype("int64"),
                    "approx_d2": approx,
                }
            )
            # bounded per-batch partial top-keep (ascending distance)
            out = out.sort_values(
                ["query_id", "approx_d2", "neighbor_id"]
            ).groupby("query_id", sort=False).head(keep)
            yield out

    scored = pairs.select("query_id", "neighbor_id", "codes").mapInPandas(
        adc, schema="query_id long, neighbor_id long, approx_d2 double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    adc_top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= keep)
    )
    if rerank is None:
        return adc_top.filter(F.col("rank") <= k).select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("approx_d2", 6).alias("approx_d2"),
        )
    survivors = adc_top.select("query_id", "neighbor_id")
    if embeddings is None:
        raise ValueError(
            "exact re-rank needs the float-vector table; pass "
            "embeddings= or use rerank=None for the ADC-only ranking"
        )
    return _topk_window(
        _score_candidates(survivors, embeddings, queries), k
    )


# ---------------------------------------------------------------------------
# Persisted IVF-PQ index: train/encode ONCE, query forever. At 100 TB
# the quantizers and codes are index artifacts on storage, not
# per-query work — the query path reads only the (partition-pruned)
# codes table plus two tiny model tables.
# ---------------------------------------------------------------------------

_INDEX_META = "_INDEX.json"


def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = IVF_CENTROIDS,
    m: int = PQ_SUBSPACES,
    n_codewords: int = PQ_CODEWORDS,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    fingerprint: str | None = None,
) -> dict:
    """Train the coarse quantizer + PQ codebooks once and persist the
    full IVF-PQ index layout under ``path``:

    * ``codes/`` — the encoded corpus ``(vec_id, codes)`` written
      ``partitionBy("cl")``: each inverted list IS a partition
      directory, so a probe scans only its cells (static partition
      pruning in the query plan, asserted by the plan-quality test);
    * ``model/centroids`` + ``model/codebooks`` — tiny parquet model
      tables (broadcast-sized by construction);
    * ``_INDEX.json`` — layout version, shapes, and the caller's
      ``fingerprint`` of the source table (staleness detection),
      written LAST through the ByteStore seam, so a half-built index
      is never observed as current.

    Training and encoding are identical to the inline cascade
    (:func:`ivfpq_topk`) — one bounded driver sample feeds both
    quantizers, the corpus is touched by exactly two zero-shuffle
    vectorized maps — so a rebuilt index answers queries bit-equal to
    the inline path (equivalence-tested)."""
    import json

    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    spark = embeddings.sparkSession
    root = path.rstrip("/")
    store = ByteStore.for_path(root)
    M = _parity_sample_matrix(
        embeddings,
        PARITY_TRAIN_SAMPLE,
        id_col,
        emb_col,
        min_rows=max(n_centroids, n_codewords),
    )
    centroids = _lloyd_cos_parity(M, n_centroids, IVF_ITERS)
    codebooks = _pq_codebooks_from(M, m, n_codewords, PQ_ITERS)
    codes = _encode_with_index_model(
        embeddings, centroids, codebooks, id_col, emb_col
    )
    # ONE file per inverted list: hash-cluster on the partition column
    # before partitionBy, or every encode partition writes its own
    # sliver into every touched cell (measured: 32 partitions x 18
    # cells = 506 files of ~8 KB — and a >threshold file count makes
    # every subsequent read pay a distributed listing job). vec_id
    # ordering within the file keeps row-group stats selective for
    # the id fast paths (the compaction's sort_cols discipline).
    (
        codes.repartition(F.col("cl"))
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cl")
        .parquet(store.spark_path("codes"))
    )
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cl long, c array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        store.spark_path("model/centroids")
    )
    spark.createDataFrame(
        [
            (j, code, [float(x) for x in codebooks[j, code]])
            for j in range(m)
            for code in range(n_codewords)
        ],
        "j long, code long, c array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        store.spark_path("model/codebooks")
    )
    # manifest + history: later deletes/compactions commit only
    # rewritten files (untouched segments re-referenced) and the
    # audit trail rides the same pointer PUT — manifest.py's model
    from cae_polars_tools_spark.manifest import (
        adopt_dir_files,
        meta_with_history,
    )

    n_files = adopt_dir_files(
        store, "codes", codes.schema.jsonValue(),
        spark=codes.sparkSession,
    )
    meta = meta_with_history(
        {
            "format": "ivfpq-v1",
            "dim": int(centroids.shape[1]),
            "n_centroids": int(n_centroids),
            "m": int(m),
            "n_codewords": int(n_codewords),
            "codes_dir": "codes",
            "fingerprint": fingerprint,
        },
        "build",
        {"codes_files": n_files},
    )
    store.put(_INDEX_META, json.dumps(meta).encode())
    return meta


def _encode_with_index_model(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cl, codes) for new vectors under a FROZEN model — the
    incremental-maintenance primitive: appended segments must encode
    against the index's original quantizers, never retrain (retraining
    would silently re-key every existing inverted list)."""
    assign = assign_udf_parity(centroids)
    encode = pq_encode_udf(codebooks)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        assign(F.col(emb_col)).alias("cl"),
        encode(F.col(emb_col)).alias("codes"),
    )


def append_ivfpq_index(
    spark: SparkSession,
    path: str,
    embeddings: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    check_unique: bool = True,
) -> dict:
    """Append new vectors to a persisted IVF-PQ index WITHOUT
    retraining: encode them under the frozen model and add parquet
    segments to the live codes directory (each new file lands in its
    inverted list's partition). This is the standard segment-append
    lifecycle — at 100 TB you never re-encode the corpus to ingest a
    day's worth of new documents; quantizer drift is handled by a
    periodic full ``build_ivfpq_index`` rebuild, not per batch.

    ``check_unique`` anti-joins the new ids against the existing codes
    (one scan of the id column) — a duplicate vec_id would answer
    queries twice. Returns ``{rows_appended}``."""
    root = path.rstrip("/")
    meta = load_ivfpq_meta(root)
    if meta is None:
        raise FileNotFoundError(f"no IVF-PQ index under {path}")
    centroids, codebooks = _load_ivfpq_model(spark, root, meta)
    new = _encode_with_index_model(
        embeddings, centroids, codebooks, id_col, emb_col
    )
    if check_unique:
        existing = _read_codes(spark, root, meta).select("vec_id")
        dup = new.join(existing, "vec_id", "left_semi").limit(1).count()
        if dup:
            raise ValueError(
                "append_ivfpq_index: new vec_ids collide with ids "
                "already in the index (pass check_unique=False only "
                "if the caller guarantees disjointness)"
            )
        # Collisions WITHIN the appended frame are just as fatal — a
        # vec_id indexed twice answers every query twice — and the
        # cross-join check above can't see them.
        internal_dup = (
            new.groupBy("vec_id").count().where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if internal_dup:
            raise ValueError(
                "append_ivfpq_index: the appended frame itself carries "
                "duplicate vec_ids; dedup it (or pass "
                "check_unique=False if duplicates are intended)"
            )
    n = new.count()
    # snapshot → write → adopt the exact delta: orphans from an append
    # that crashed between segment write and adopt are in the
    # snapshot, never adopted on retry (duplicate vec_id rows), and
    # reclaimed by vacuum_ivfpq_index's live-dir sweep
    from cae_polars_tools_spark.manifest import adopt_dir_files, snapshot_dir
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    store = ByteStore.for_path(root)
    pre = snapshot_dir(store, meta.get("codes_dir", "codes"))
    new.repartition(F.col("cl")).write.mode("append").partitionBy("cl").parquet(
        store.spark_path(meta.get("codes_dir", "codes"))
    )
    adopt_dir_files(
        store, meta.get("codes_dir", "codes"), pre=pre,
        spark=new.sparkSession,
    )
    _record_ivfpq_op(root, "append", {"rows_appended": n})
    return {"rows_appended": n}


def ivfpq_ingest_sink(
    path: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """``writeStream.foreachBatch`` sink maintaining a persisted
    IVF-PQ index from a stream of new vectors: each micro-batch is
    encoded under the index's FROZEN model and appended as parquet
    segments into the live per-cell partitions
    (:func:`append_ivfpq_index` semantics). Replay safety comes from
    ID-LEVEL dedup, not batch ids: already-indexed vec_ids are
    anti-joined away before the append, so a redelivered batch
    (foreachBatch's at-least-once contract) — or a crash between the
    segment write and the checkpoint commit — re-appends nothing.
    That makes the sink effectively-once as long as vec_ids are
    stable identifiers, which is the premise of an index."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        root = path.rstrip("/")
        meta = load_ivfpq_meta(root)
        if meta is None:
            raise FileNotFoundError(f"no IVF-PQ index under {path}")
        existing = _read_codes(spark, root, meta).select(
            F.col("vec_id")
        )
        # Dedup WITHIN the micro-batch first: the anti-join below only
        # screens against already-persisted ids, so a batch carrying
        # the same vec_id twice (source replay inside one trigger)
        # would otherwise append both encodings and break the
        # effectively-once contract the docstring promises.
        batch_df = batch_df.dropDuplicates([id_col])
        fresh = batch_df.join(
            existing,
            batch_df[id_col] == existing["vec_id"],
            "left_anti",
        )
        centroids, codebooks = _load_ivfpq_model(spark, root, meta)
        new = _encode_with_index_model(
            fresh, centroids, codebooks, id_col, emb_col
        )
        # delta adoption (append_ivfpq_index rule): a replayed batch
        # whose previous delivery crashed pre-adopt re-encodes the
        # same vec_ids (the anti-join can't see unmanifested files),
        # but only ITS OWN fresh files are adopted — the orphans stay
        # out of the manifest and vacuum's live-dir sweep reclaims
        # them, so the codes table never holds a vec_id twice
        from cae_polars_tools_spark.manifest import (
            adopt_dir_files,
            snapshot_dir,
        )
        from cae_polars_tools_spark.sources.zarr_format import ByteStore

        store = ByteStore.for_path(root)
        pre = snapshot_dir(store, meta.get("codes_dir", "codes"))
        new.repartition(F.col("cl")).write.mode("append").partitionBy("cl").parquet(
            store.spark_path(meta.get("codes_dir", "codes"))
        )
        adopt_dir_files(
            store, meta.get("codes_dir", "codes"), pre=pre,
            spark=new.sparkSession,
        )
        _record_ivfpq_op(root, "append", {"batch_id": batch_id})

    return sink


def compact_ivfpq_index(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compact the index's codes table: streaming ingest accumulates
    one small segment file per micro-batch per touched cell, and scan
    efficiency decays with file count (footer reads + task overhead).
    Rewrites the live codes directory into a NEW versioned directory
    through :func:`storage.compact_parquet` — per-cell partitioning
    preserved, files sized toward ``target_file_bytes``, vec_id-sorted
    within files so row-group min/max stats stay selective — then
    flips the ``_INDEX.json`` pointer LAST. Readers never observe a
    half-compacted index; the old directory remains until the caller
    garbage-collects it. Returns ``{files, codes_dir}``."""
    import json
    import re as _re

    from cae_polars_tools_spark.sources.zarr_format import ByteStore
    from cae_polars_tools_spark.storage import compact_parquet

    from cae_polars_tools_spark.manifest import (
        adopt_dir_files,
        meta_with_history,
        refs_of,
    )

    root = path.rstrip("/")
    meta = load_ivfpq_meta(root)
    if meta is None:
        raise FileNotFoundError(f"no IVF-PQ index under {path}")
    store = ByteStore.for_path(root)
    cur = meta.get("codes_dir", "codes")
    m_v = _re.fullmatch(r"codes_v(\d+)", cur)
    nxt = f"codes_v{int(m_v.group(1)) + 1 if m_v else 1}"
    codes_rel = _read_codes(spark, root, meta)
    n = compact_parquet(
        spark,
        root,
        f"{root}/{nxt}",
        target_file_bytes=target_file_bytes,
        sort_cols=["vec_id"],
        source_refs=refs_of(store, cur),
    )
    # full rewrite → the new manifest references only fresh files;
    # vacuum can then reclaim every predecessor segment (schema
    # reuses the pre-built relation — no second manifest resolution)
    adopt_dir_files(
        store, nxt, codes_rel.schema.jsonValue(), spark=spark
    )
    meta = meta_with_history(
        {**meta, "codes_dir": nxt}, "compact", {"files": n}
    )
    store.put(_INDEX_META, json.dumps(meta).encode())
    return {"files": n, "codes_dir": nxt}


def delete_ivfpq_index(
    spark: SparkSession,
    path: str,
    predicate=None,
    op_stats: dict | None = None,
    vec_ids=None,
) -> dict:
    """Copy-on-write DELETE from a persisted IVF-PQ index: rows of
    the codes table matching ``predicate`` (a Column or SQL string,
    e.g. ``"vec_id IN (7, 9)"``) are removed into a NEW versioned
    codes directory via :func:`storage.delete_parquet` (only files
    containing a match rewrite; the rest copy byte-for-byte), then
    the ``_INDEX.json`` pointer flips to the new directory LAST —
    readers never observe a half-deleted index. The takedown
    primitive: removing a document from the corpus must remove it
    from every derived index too, without re-encoding either.
    Returns delete_parquet's counters plus ``codes_dir``.

    ``vec_ids`` is the takedown fast path (the delete_minhash_index
    rule): the predicate becomes ``vec_id IN (ids)`` and the
    affected-file discovery is pruned by the ids' range against the
    codes manifest's per-file vec_id stats."""
    import json
    import re as _re

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.sources.zarr_format import ByteStore
    from cae_polars_tools_spark.storage import delete_parquet

    from cae_polars_tools_spark.manifest import (
        load_manifest,
        meta_with_history,
        refs_intersecting,
        refs_of,
        stats_of,
        write_manifest,
    )

    if (predicate is None) == (vec_ids is None):
        raise ValueError(
            "delete_ivfpq_index: pass exactly one of predicate / vec_ids"
        )
    id_range = None
    if vec_ids is not None:
        from cae_polars_tools_spark.manifest import id_range_of

        predicate = F.col("vec_id").isin(list(vec_ids))
        id_range = id_range_of(vec_ids)
    root = path.rstrip("/")
    meta = load_ivfpq_meta(root)
    if meta is None:
        raise FileNotFoundError(f"no IVF-PQ index under {path}")
    store = ByteStore.for_path(root)
    cur = meta.get("codes_dir", "codes")
    if not refs_of(store, cur):
        # an already-emptied index: takedowns are idempotent no-ops,
        # not errors (cascade_delete may retry after partial failure).
        # Still publish an audit record — the retry's takedown_id must
        # land in history like every other artifact's (the minhash
        # twin's empty path does the same through its outer flip), and
        # the returned stats must carry the published generation the
        # cascade manifest stamps (a KeyError here would abort the
        # cascade OUTSIDE its per-artifact error wrapper).
        stats = {
            "files_rewritten": 0,
            "files_referenced": 0,
            "rows_deleted": 0,
        }
        meta = meta_with_history(
            meta, "delete", {**stats, **(op_stats or {})}
        )
        store.put(_INDEX_META, json.dumps(meta).encode())
        stats["codes_dir"] = cur
        stats["generation"] = meta["generation"]
        return stats
    m_v = _re.fullmatch(r"codes_v(\d+)", cur)
    nxt = f"codes_v{int(m_v.group(1)) + 1 if m_v else 1}"
    candidates = None
    read_schema = None
    if id_range is not None:
        cstats = stats_of(store, cur)
        mdoc = load_manifest(store, cur)
        if cstats and mdoc and mdoc.get("schema"):
            from pyspark.sql.types import StructType

            read_schema = StructType.fromJson(mdoc["schema"])
            candidates = refs_intersecting(
                cstats, refs_of(store, cur), {"vec_id": id_range}
            )
    stats = delete_parquet(
        spark,
        root,
        predicate,
        f"{root}/{nxt}",
        source_refs=refs_of(store, cur),
        copy_untouched=False,
        read_schema=read_schema,
        candidate_refs=candidates,
    )
    from cae_polars_tools_spark.manifest import rewrite_accounting

    n_refs, n_sizes, n_rows, n_cstats = rewrite_accounting(
        store, nxt, stats.pop("untouched_refs"), cur, spark=spark
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
    meta = meta_with_history(
        {**meta, "codes_dir": nxt},
        "delete",
        # caller context (cascade_delete's takedown_id correlation
        # key) rides in the same audit record as the flip
        {**stats, **(op_stats or {})},
    )
    store.put(_INDEX_META, json.dumps(meta).encode())
    stats["codes_dir"] = nxt
    # the generation this delete PUBLISHED (pre = generation - 1):
    # cascade_delete stamps both into its cross-artifact manifest
    stats["generation"] = meta["generation"]
    return stats


def vacuum_ivfpq_index(path: str) -> list[str]:
    """Reference-counted retention for the IVF-PQ index's CoW
    generation chain: every ``codes*`` directory the current
    ``_INDEX.json`` pointer does not reference is a candidate — its
    files are deleted only when the live manifest no longer
    references them (a CoW delete's generation shares untouched
    segments with its predecessor, which then parks them as a
    tombstoned husk until a compaction rewrites everything). The LIVE
    codes directory gets an orphan sweep too: files a crashed append
    wrote but never delta-adopted are unreferenced by construction
    and deleted here (single-writer contract — no append in flight
    while vacuum runs). Explicit and never automatic — the
    ``vacuum_minhash_index`` twin, same caveat: only vacuum past your
    longest reader. Returns the names of directories that no longer
    serve (removed + demoted husks)."""
    import re as _re

    from cae_polars_tools_spark.manifest import refs_of, vacuum_refcount
    from cae_polars_tools_spark.operators.minhash_index import (
        _sweep_live_orphans,
    )
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    root = path.rstrip("/")
    meta = load_ivfpq_meta(root)
    if meta is None:
        raise FileNotFoundError(f"no IVF-PQ index under {path}")
    live = meta.get("codes_dir", "codes")
    store = ByteStore.for_path(root)
    referenced = set(refs_of(store, live))
    candidates = sorted(
        n.rstrip("/")
        for n in store.list_prefix("")
        if n.rstrip("/") != live
        and (
            n.rstrip("/") == "codes"
            or _re.fullmatch(r"codes_v\d+", n.rstrip("/"))
        )
    )
    stats = vacuum_refcount(store, referenced, candidates)
    orphans = _sweep_live_orphans(store, {live}, referenced)
    gone = sorted(set(stats["removed"]) | set(stats["demoted"]))
    if gone or stats["files_deleted"] or orphans:
        _record_ivfpq_op(
            root,
            "vacuum",
            {
                "retired": gone,
                "files_deleted": stats["files_deleted"],
                "orphans_swept": orphans,
            },
        )
    return gone


def _read_codes(spark: SparkSession, root: str, meta: dict):
    """The live codes table, manifest-resolved (after a CoW delete
    its files may span several ``codes_v*`` directories; a legacy
    manifest-less index reads whole-directory). Partition pruning on
    ``cl`` pushes into every per-birth-dir scan branch."""
    from cae_polars_tools_spark.manifest import read_artifact

    return read_artifact(spark, root, meta.get("codes_dir", "codes"))


def _record_ivfpq_op(root: str, op: str, stats: dict) -> None:
    """Audit record for verbs that do not flip the codes pointer
    (append, vacuum) — pointer-flipping verbs fold theirs into the
    flip PUT (the minhash_index._record_index_op convention)."""
    import json

    from cae_polars_tools_spark.manifest import meta_with_history
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    meta = load_ivfpq_meta(root)
    if meta is None:
        return
    ByteStore.for_path(root).put(
        _INDEX_META,
        json.dumps(meta_with_history(meta, op, stats)).encode(),
    )


def describe_ivfpq_index_history(path: str) -> list[dict]:
    """The index's audit trail, oldest first: one ``{op, ts,
    generation, stats}`` record per lifecycle verb (build / append /
    delete / compact / vacuum) — ``Table.describe_history``'s
    counterpart for the ANN index (capped at ``manifest.HISTORY_CAP``
    records). One metadata GET."""
    meta = load_ivfpq_meta(path)
    if meta is None:
        raise FileNotFoundError(f"no IVF-PQ index under {path}")
    return list(meta.get("history", []))


def load_ivfpq_meta(path: str) -> dict | None:
    """The index's ``_INDEX.json`` metadata, or None when ``path``
    holds no (finished) index — builders use this for
    rebuild-if-stale checks via the ``fingerprint`` field."""
    import json

    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    raw = ByteStore.for_path(path.rstrip("/")).get(_INDEX_META)
    return None if raw is None else json.loads(raw)


def _load_ivfpq_model(
    spark: SparkSession, root: str, meta: dict
) -> tuple[np.ndarray, np.ndarray]:
    """Centroids (n_centroids, dim) and codebooks (m, k, dsub) from
    the persisted model tables (tiny: one driver collect each)."""
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    store = ByteStore.for_path(root.rstrip("/"))
    cent_rows = (
        spark.read.parquet(store.spark_path("model/centroids"))
        .orderBy("cl")
        .collect()
    )
    centroids = np.array([r["c"] for r in cent_rows], dtype=np.float64)
    cb_rows = (
        spark.read.parquet(store.spark_path("model/codebooks"))
        .orderBy("j", "code")
        .collect()
    )
    m, k = meta["m"], meta["n_codewords"]
    dsub = meta["dim"] // m
    codebooks = np.array([r["c"] for r in cb_rows], dtype=np.float64)
    return centroids, codebooks.reshape(m, k, dsub)


def query_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = TOPK,
    nprobe: int = IVF_NPROBE,
    rerank: int | None = None,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """Answer top-k ANN queries from a PERSISTED IVF-PQ index — no
    training, no encoding: the plan reads the two tiny model tables
    plus ONLY the probed partitions of the codes table (static ``cl
    IN (…)`` partition pruning). With ``rerank=None`` (default) the
    ADC ranking is returned and the float corpus is never touched;
    pass ``rerank=`` + ``embeddings=`` for the exact re-rank
    cascade. Bit-equal to :func:`ivfpq_topk` over the same source
    table (equivalence-tested)."""
    root = path.rstrip("/")
    meta = load_ivfpq_meta(root)
    if meta is None:
        raise FileNotFoundError(f"no IVF-PQ index under {path}")
    centroids, codebooks = _load_ivfpq_model(spark, root, meta)
    # keep `cl` the raw partition column (no cast): the static isin
    # filter must land as a PartitionFilter on the scan, and the join
    # coerces int/long keys itself
    cand = _read_codes(spark, root, meta).select(
        F.col("vec_id").alias("neighbor_id"), "cl", "codes"
    )
    return _ivfpq_query(
        cand,
        queries,
        centroids,
        codebooks,
        k,
        nprobe,
        rerank,
        embeddings,
        prune_partitions=True,
    )


def _l2_sql(a_expr: str, b_expr: str, lo: "int | str", dim: int) -> str:
    """DuckDB squared L2 between a DOUBLE[] column slice (elements
    ``lo+1 .. lo+dim``; ``lo`` may be a SQL expression like
    ``c.j * 8``) and a DOUBLE[] centroid — the op order of
    ``_parity_l2_matrix``."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({a_expr}[{lo} + i] - {b_expr}[i]) * "
        f"({a_expr}[{lo} + i] - {b_expr}[i])))"
    )


def pq_parity_ctes(
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODEWORDS,
    n_iters: int = PQ_ITERS,
    sample_size: int = PARITY_TRAIN_SAMPLE,
    dim: int = EMBED_DIM,
) -> str:
    """DuckDB CTEs recomputing :func:`train_pq_parity`'s codebooks and
    every corpus row's PQ codes. Defines ``pq_norm(vec_id, ne)`` (the
    L2-normalized DOUBLE[] vectors — every produced double is
    bit-identical to ``_parity_normalize``), ``pq_cent(j, cl, c)``
    (all subspace codebooks, c = DOUBLE[dsub]) and
    ``pq_codes(vec_id, j, cl)``. Every CTE is MATERIALIZED: DuckDB
    inlines single-reference CTEs, and the Lloyd chain re-evaluated
    through nested references is combinatorial (the unhinted form
    measured 188 s vs 1 s at sf0.01)."""
    dsub = dim // m
    n2 = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"q -> CAST(embedding[q] AS DOUBLE) * CAST(embedding[q] AS DOUBLE)))"
    )
    parts = [
        f"""
        pq_norm AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(generate_series(1, {dim}),
                                  i -> CAST(embedding[i] AS DOUBLE)
                                       / sqrt({n2})) AS ne
            FROM embeddings
        ),
        pq_sample AS MATERIALIZED (
            SELECT vec_id, ne,
                   ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM (
                SELECT vec_id, ne FROM pq_norm
                WHERE vec_id % 2 = 0
                ORDER BY vec_id LIMIT {sample_size}
            )
        )"""
    ]
    for j in range(m):
        lo = j * dsub
        d2 = _l2_sql("s.ne", "c.c", lo, dsub)
        parts.append(
            f"""
        pq{j}_cent_0 AS MATERIALIZED (
            SELECT rn - 1 AS cl,
                   list_transform(generate_series(1, {dsub}),
                                  i -> ne[{lo} + i]) AS c
            FROM pq_sample WHERE rn <= {k}
        )"""
        )
        for t in range(1, n_iters + 1):
            prev = f"pq{j}_cent_{t - 1}"
            parts.append(
                f"""
        pq{j}_asg_{t} AS MATERIALIZED (
            SELECT vec_id, ne, cl FROM (
                SELECT s.vec_id, s.ne, c.cl,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {d2} ASC, c.cl ASC
                       ) AS rnk
                FROM pq_sample s CROSS JOIN {prev} c
            ) WHERE rnk = 1
        ),
        pq{j}_upd_{t} AS MATERIALIZED (
            SELECT cl, list(v ORDER BY pos) AS c FROM (
                SELECT a.cl, g.i AS pos,
                       round(avg(a.ne[{lo} + g.i]),
                             {PARITY_CENT_ROUND}) AS v
                FROM pq{j}_asg_{t} a, generate_series(1, {dsub}) AS g(i)
                GROUP BY a.cl, g.i
            ) GROUP BY cl
        ),
        pq{j}_cent_{t} AS MATERIALIZED (
            SELECT p.cl, COALESCE(u.c, p.c) AS c
            FROM {prev} p LEFT JOIN pq{j}_upd_{t} u USING (cl)
        )"""
            )
    union = " UNION ALL ".join(
        f"SELECT {j} AS j, cl, c FROM pq{j}_cent_{n_iters}" for j in range(m)
    )
    code_d2 = _l2_sql("s.ne", "c.c", f"c.j * {dsub}", dsub)
    parts.append(
        f"""
        pq_cent AS MATERIALIZED ({union}),
        pq_codes AS MATERIALIZED (
            SELECT vec_id, j, cl FROM (
                SELECT s.vec_id, c.j, c.cl,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id, c.j
                           ORDER BY {code_d2} ASC, c.cl ASC
                       ) AS rnk
                FROM pq_norm s CROSS JOIN pq_cent c
            ) WHERE rnk = 1
        )"""
    )
    return ",".join(parts)


def _ivfpq_approx_ctes() -> str:
    """The CTE chain both IVF-PQ oracles share: retrain BOTH parity
    quantizers in SQL, derive probe lists, ADC distance tables, codes
    and the per-pair approximate distances (``approx``)."""
    dsub = EMBED_DIM // PQ_SUBSPACES
    cosq = _cos_sql("s.embedding", "c.c")
    # per (query, subspace, codeword) ADC table entry — against the
    # NORMALIZED query vector, as ivfpq_topk's driver-side dtab does
    dtab_d2 = _l2_sql("s.ne", "c.c", f"c.j * {dsub}", dsub)
    return f"""{kmeans_parity_ctes(IVF_CENTROIDS)},
        {pq_parity_ctes()},
        km_probe AS (
            SELECT vec_id AS query_id, cl FROM (
                SELECT s.vec_id, c.cl,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {cosq} DESC, c.cl ASC
                       ) AS rnk
                FROM embeddings s CROSS JOIN km_cent c
                WHERE s.vec_id < {N_QUERIES}
            ) WHERE rnk <= {IVF_NPROBE}
        ),
        dtab AS (
            SELECT s.vec_id AS query_id, c.j, c.cl, {dtab_d2} AS d2
            FROM pq_norm s CROSS JOIN pq_cent c
            WHERE s.vec_id < {N_QUERIES}
        ),
        cand AS (
            SELECT p.query_id, a.vec_id AS neighbor_id
            FROM km_probe p JOIN km_assign a ON a.cl = p.cl
            WHERE a.vec_id != p.query_id
        ),
        approx AS (
            SELECT cand.query_id,
                   cand.neighbor_id,
                   list_sum(list(dtab.d2 ORDER BY dtab.j)) AS approx_d2
            FROM cand
            JOIN pq_codes pc ON pc.vec_id = cand.neighbor_id
            JOIN dtab ON dtab.query_id = cand.query_id
                     AND dtab.j = pc.j AND dtab.cl = pc.cl
            GROUP BY cand.query_id, cand.neighbor_id
        )"""


def _ann_ivfpq_oracle() -> str:
    return f"""
        WITH {_ivfpq_approx_ctes()},
        adc_top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY approx_d2 ASC, neighbor_id ASC
                       ) AS rnk
                FROM approx
            ) WHERE rnk <= {PQ_RERANK}
        )
        SELECT query_id, neighbor_id, "rank", ROUND(raw_cos, 6) AS cosine
        FROM (
            SELECT adc_top.query_id,
                   adc_top.neighbor_id,
                   {COSINE_SQL} AS raw_cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY adc_top.query_id
                       ORDER BY {COSINE_SQL} DESC, adc_top.neighbor_id ASC
                   ) AS "rank"
            FROM adc_top
            JOIN embeddings a ON a.vec_id = adc_top.query_id
            JOIN embeddings b ON b.vec_id = adc_top.neighbor_id
        )
        WHERE "rank" <= {TOPK}
    """


@register(
    "ann_ivfpq_topk",
    oracle=_ann_ivfpq_oracle(),
    tags=("similarity", "extension", "ivf", "pq"),
    window_rank=1,
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-5 for the demo query set — the
    billion-scale layout (inverted lists + product-quantized codes +
    ADC lookup scoring), value-checked end-to-end: the oracle retrains
    BOTH parity quantizers in SQL and re-derives probe lists, codes,
    distance tables and the ADC ranking."""
    e = spread(read_table(spark, sf_dir, "embeddings"))
    return ivfpq_topk(e, e.filter(F.col("vec_id") < N_QUERIES))


def _ann_ivfpq_index_oracle() -> str:
    # the ADC-only ranking from the persisted codes — no re-rank,
    # the float corpus is never touched in the Spark plan
    return f"""
        WITH {_ivfpq_approx_ctes()}
        SELECT query_id, neighbor_id, rnk AS "rank",
               ROUND(approx_d2, 6) AS approx_d2
        FROM (
            SELECT query_id, neighbor_id, approx_d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY approx_d2 ASC, neighbor_id ASC
                   ) AS rnk
            FROM approx
        ) WHERE rnk <= {TOPK}
    """


def _embeddings_fingerprint(sf_dir: str) -> str:
    """Cheap staleness key for the sf_dir's embeddings table: the
    parquet file names + sizes + mtimes (local test data only — a
    production build would version the source table explicitly)."""
    import os

    d = os.path.join(sf_dir, "embeddings.parquet")
    paths = [d] if os.path.isfile(d) else [
        os.path.join(d, f) for f in sorted(os.listdir(d))
    ]
    parts = []
    for p in paths:
        st = os.stat(p)
        parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def _index_root(sf_dir: str) -> str:
    import os

    base = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".tmp",
        "ivfpq_index",
        base,
    )


@register(
    "ann_ivfpq_index_topk",
    oracle=_ann_ivfpq_index_oracle(),
    tags=("similarity", "extension", "ivf", "pq", "index"),
    window_rank=1,
)
def ann_ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 ADC ranking answered from the PERSISTED IVF-PQ index —
    the production read path: quantizers and codes are built once
    (cached per sf_dir + source fingerprint under .tmp/), and the
    query plan reads ONLY the probed partitions of the codes table
    plus the two tiny model tables; the float-vector corpus is never
    scanned. Value-checked: the oracle retrains both quantizers in
    SQL and re-derives the identical ADC ranking."""
    e = spread(read_table(spark, sf_dir, "embeddings"))
    root = _index_root(sf_dir)
    fp = _embeddings_fingerprint(sf_dir)
    meta = load_ivfpq_meta(root)
    if meta is None or meta.get("fingerprint") != fp:
        build_ivfpq_index(e, root, fingerprint=fp)
    return query_ivfpq_index(
        spark, root, e.filter(F.col("vec_id") < N_QUERIES)
    )

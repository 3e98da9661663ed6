"""Approximate-nearest-neighbor search over embedding columns.

Two paths:

* **brute force** (baseline, oracle-checked): broadcast the query set,
  score every candidate JVM-side, keep top-k per query with a window.
  At 100 TB the scoring pass is a single map over candidates (no
  candidate shuffle); only the k·|queries| survivors shuffle.
* **random-hyperplane LSH** (scale path): 8 hash tables × 6 sign-bit
  planes bucket the vectors; a candidate is scored iff it shares a
  bucket with the query in ≥1 table (OR-amplification). Sub-linear
  candidate counts at the cost of recall — measured against brute
  force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from cae_polars_tools_spark.io import read_table
from cae_polars_tools_spark.operators.dedup import (
    COSINE_SQL,
    cosine_with_norms,
    dot_expr,
)
from cae_polars_tools_spark.plans.registry import register

TOPK = 5
N_QUERIES = 10  # vec_id < 10 are the demo query set
EMBED_DIM = 64


def bruteforce_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = TOPK
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × map over candidates →
    per-query window. Ties broken by candidate id for determinism.
    Squared norms are computed once per input row below the join, so
    each of the |q|·|c| pairs evaluates a single dot product."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        dot_expr(F.col("embedding"), F.col("embedding")).alias("q_n2"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        dot_expr(F.col("embedding"), F.col("embedding")).alias("c_n2"),
    )
    cos = cosine_with_norms(
        F.col("q_emb"), F.col("c_emb"), F.col("q_n2"), F.col("c_n2")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("raw_cos"))
    )
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
    e = read_table(spark, sf_dir, "embeddings")
    return bruteforce_topk(e, e.filter(F.col("vec_id") < N_QUERIES))


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


LSH_TABLES = 8  # OR-amplification: candidate if ANY table bucket matches
LSH_PLANES_PER_TABLE = 6  # 64 buckets per table


def _planes() -> np.ndarray:
    rng = np.random.default_rng(7_2024)
    return rng.standard_normal((LSH_TABLES * LSH_PLANES_PER_TABLE, EMBED_DIM))


@F.pandas_udf(ArrayType(LongType()))
def lsh_buckets(emb: pd.Series) -> pd.Series:
    """Per-table LSH bucket ids (index = table): bucket bit p is set
    iff v · plane_{t,p} > 0. Random-hyperplane (sign) LSH with
    AND-amplification inside a table (6 planes → 64 buckets) and
    OR-amplification across 8 tables — the standard recall/cost dial.

    One numpy matmul per Arrow batch: (batch × dim) @ (dim × 48) →
    sign bits → per-table bucket ints. The expression-tree equivalent
    (48 dot products as aggregate-over-zip_with with literal plane
    arrays) is a ~3000-node plan that Catalyst analyzes slowly and
    evaluates interpreted per element."""
    import pandas as pd

    planes = _planes()  # (tables*planes, dim)
    M = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
    bits = (M @ planes.T > 0).astype(np.int64)  # (n, tables*planes)
    weights = 1 << np.arange(LSH_PLANES_PER_TABLE, dtype=np.int64)
    buckets = bits.reshape(len(M), LSH_TABLES, LSH_PLANES_PER_TABLE) @ weights
    return pd.Series(list(buckets))


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = TOPK) -> DataFrame:
    """ANN top-k over candidates sharing ≥1 LSH table bucket with the
    query. Scale shape: (table, bucket) is the join key, so per-query
    work is the union of its 8 bucket populations — a tunable fraction
    of the corpus, never all of it. Candidate ids are deduplicated
    *before* embeddings are re-attached, so multi-table collisions
    never shuffle vector payloads twice. Recall vs brute force is
    measured in tests; raise LSH_TABLES (or add multi-probe) to buy
    recall."""
    with_n2 = embeddings.select(
        "vec_id",
        "embedding",
        dot_expr(F.col("embedding"), F.col("embedding")).alias("n2"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode(lsh_buckets(F.col("embedding"))).alias("table", "bucket"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(lsh_buckets(F.col("embedding"))).alias("table", "bucket"),
    )
    candidates = (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # a pair may collide in several tables
    )
    qe = with_n2.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    ce = with_n2.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )
    cos = cosine_with_norms(
        F.col("q_emb"), F.col("c_emb"), F.col("q_n2"), F.col("c_n2")
    )
    scored = (
        candidates.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("raw_cos"))
    )
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


@register(
    "ann_lsh_topk",
    oracle=None,  # bucket membership depends on seeded hyperplanes
    tags=("similarity", "extension", "lsh"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 for the demo query set."""
    e = read_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < N_QUERIES))

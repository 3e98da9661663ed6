"""Vector kernels shared by the similarity/dedup operators.

Two formulations of the same double-precision cosine, chosen per call
site:

* **Expression form** (``dot_expr`` / ``cosine_with_norms``) —
  higher-order array expressions (CodegenFallback, interpreted per
  element). Measured winner for per-*pair* scoring over joined rows:
  at sf0.1 the blocked self-join scores in ~1.1 s with the HOF vs
  ~2.1 s with the batch UDF (identical values), because the UDF ships
  both 64-float arrays through Arrow for every joined row while the
  HOF reads them in place.
* **Batch form** (``pair_dot`` / ``cosine_batch``) — Arrow-vectorized
  pandas UDF: one numpy pass per batch, vectorized across the rows
  with the accumulation kept **sequential over the vector dims**, so
  every produced double is bit-identical to the expression form and
  to DuckDB's ``list_sum`` over the same element order (numpy's
  pairwise-summing ``einsum``/``dot`` would drift in the last ulp and
  can flip near-tie top-k ranks vs the oracle). Kept for API
  completeness; it loses per pair (see above), and the ANN paths use
  the stronger arrays-once ``score_against_queries`` kernel
  (operators/similarity.py) instead, which ships each corpus row
  once — not once per pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

EMBED_DIM = 64


def dot_expr(x: Column, y: Column) -> Column:
    """Sequential-accumulation double dot product of two array<float>
    columns — bit-identical to the DuckDB oracle's list_sum over the
    same element order."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns. Prefer
    ``cosine_batch`` in join hot paths (see module docstring)."""
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


@F.pandas_udf(DoubleType())
def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise double dot product of two array<float> columns,
    Arrow-batched. Accumulates dim-by-dim (vectorized across the
    batch) so the result is bit-identical to ``dot_expr`` — see the
    module docstring for why this matters against the oracle."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    acc = np.zeros(len(A), dtype=np.float64)
    for j in range(A.shape[1]):
        acc += A[:, j] * B[:, j]
    return pd.Series(acc)


def cosine_with_norms(a: Column, b: Column, n2_a: Column, n2_b: Column) -> Column:
    """Cosine from a per-pair HOF dot and *precomputed per-row*
    squared norms (expression form — kept for API completeness and
    plan-only contexts; hot paths use :func:`cosine_batch`)."""
    return dot_expr(a, b) / (F.sqrt(n2_a) * F.sqrt(n2_b))


def cosine_batch(a: Column, b: Column, n2_a: Column, n2_b: Column) -> Column:
    """Cosine from the Arrow-batched pair dot and precomputed per-row
    squared norms. Same doubles as ``cosine_with_norms`` (sequential
    accumulation) but measured ~2× SLOWER per candidate pair at sf0.1
    (per-pair Arrow transfer of both arrays dominates) — prefer the
    expression form in join hot paths; see the module docstring."""
    return pair_dot(a, b) / (F.sqrt(n2_a) * F.sqrt(n2_b))


COSINE_SQL = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))"
)

"""Every corpus query with an oracle must match DuckDB exactly
(row count + order-insensitive value equality) at sf0.001 — the local
mirror of the driver's sf0.01 correctness gate. Queries without an
oracle are smoke-checked (runs, stable schema, ≥0 rows)."""

from __future__ import annotations

import pytest

from cae_polars_tools_spark.plans.registry import load_all
from tests.oracle_utils import assert_frames_match, run_oracle

CORPUS = load_all()


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_corpus_query(spark, sf_small, name):
    spec = CORPUS[name]
    df = spec.build(spark, sf_small)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert len(df.schema.fields) > 0
    else:
        assert_frames_match(df, run_oracle(spec.oracle, sf_small), name)

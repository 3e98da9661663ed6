"""Logistic-regression quality classifier: trainer convergence and
determinism, fold-in-standardization correctness, and the Spark
scoring pass against a local numpy recompute."""

from __future__ import annotations

import numpy as np
import pytest

from cae_polars_tools_spark.operators.classifier import (
    FIXED_LR_BIAS,
    FIXED_LR_WEIGHTS,
    QUALITY_FEATURES,
    sample_training_frame,
    score_quality_lr,
    train_quality_lr,
)


def test_trainer_separates_and_is_deterministic():
    rng = np.random.default_rng(7)
    n = 400
    X0 = rng.normal(loc=[10, 4, 0.5, 1], scale=0.5, size=(n, 4))
    X1 = rng.normal(loc=[60, 6, 0.9, 8], scale=0.5, size=(n, 4))
    X = np.vstack([X0, X1])
    y = np.r_[np.zeros(n), np.ones(n)]
    w1, b1 = train_quality_lr(X, y)
    w2, b2 = train_quality_lr(X.copy(), y.copy())
    assert np.array_equal(w1, w2) and b1 == b2
    # coefficients are in ORIGINAL feature units: score raw X directly
    p = 1.0 / (1.0 + np.exp(-(X @ w1 + b1)))
    acc = ((p >= 0.5) == y).mean()
    assert acc >= 0.99


def test_spark_scoring_matches_numpy(spark, sf_small):
    import pandas as pd

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.text import quality_signals

    docs = read_table(spark, sf_small, "documents")
    s = quality_signals("text")
    feats = docs.select(
        "doc_id", *[s[f].alias(f) for f in QUALITY_FEATURES]
    ).toPandas()
    X = feats[list(QUALITY_FEATURES)].to_numpy(dtype=np.float64)
    z = X @ np.array(FIXED_LR_WEIGHTS) + FIXED_LR_BIAS
    want = np.round(1.0 / (1.0 + np.exp(-z)), 6)

    got = {
        r["doc_id"]: (r["quality_score"], r["keep"])
        for r in score_quality_lr(
            docs, FIXED_LR_WEIGHTS, FIXED_LR_BIAS
        ).collect()
    }
    for doc_id, w in zip(feats["doc_id"], want):
        gs, gk = got[doc_id]
        assert gs == pytest.approx(w, abs=2e-6)
        assert gk == (gs >= 0.5)


def test_sample_training_frame_bounded_and_deterministic(spark, sf_small):
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table

    docs = read_table(spark, sf_small, "documents")
    label = F.length("text") > 200
    X1, y1 = sample_training_frame(docs, label, sample_rows=128)
    X2, y2 = sample_training_frame(docs, label, sample_rows=128)
    assert X1.shape[0] <= 128 and X1.shape[1] == len(QUALITY_FEATURES)
    assert np.array_equal(X1, X2) and np.array_equal(y1, y2)
    # end-to-end: train on the heuristic label, score distributed
    w, b = train_quality_lr(X1, y1)
    scored = score_quality_lr(docs, w, b)
    assert scored.columns == ["doc_id", "quality_score", "keep"]
    assert scored.count() == docs.count()

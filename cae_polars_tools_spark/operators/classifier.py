"""Model-based quality filtering: a logistic-regression scorer over
the per-document quality signals — the fasttext-classifier stage of a
real LLM data pipeline (CCNet / GPT-3's quality classifier), reduced
to its Spark-shaped essentials:

* **Training** is driver-side on a BOUNDED seeded sample (numpy
  gradient descent — the model is a handful of doubles, the corpus is
  not the training set's size). Same sampling contract as the IVF
  quantizer and the BPE trainer: ``sample(fraction).limit(n)``, no
  count, no sort.
* **Scoring** is pure JVM expressions: ``sigmoid(w·x + b)`` built
  from the same `quality_signals` columns — zero shuffle, zero
  Python, SQL-expressible (the corpus entry's DuckDB oracle recomputes
  it exactly; the score rounds to 1e-6 to absorb libm exp() ulps
  across engines).

At 100 TB the scorer is a map-only pass and the model a closure
constant; nothing scales with the corpus but the scan itself.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table, spread
from cae_polars_tools_spark.operators.text import quality_signals
from cae_polars_tools_spark.plans.registry import register

QUALITY_FEATURES = ("n_words", "mean_word_len", "alpha_frac", "n_stopwords")


def train_quality_lr(
    X: np.ndarray,
    y: np.ndarray,
    n_iters: int = 300,
    lr: float = 0.1,
    l2: float = 1e-3,
) -> tuple[np.ndarray, float]:
    """Plain batch-gradient logistic regression on standardized
    features → ``(weights, bias)`` in the ORIGINAL feature space (the
    standardization folds into the returned coefficients, so scoring
    needs no stats). Deterministic: fixed iterations, zero init."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Z = (X - mu) / sd
    w = np.zeros(Z.shape[1])
    b = 0.0
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        g = p - y
        w -= lr * (Z.T @ g / len(y) + l2 * w)
        b -= lr * float(g.mean())
    # unfold standardization: w·(x-mu)/sd + b = (w/sd)·x + (b - w·mu/sd)
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    return w_raw, b_raw


def sample_training_frame(
    docs: DataFrame,
    label: Column,
    sample_rows: int = 4096,
    sample_fraction: float = 0.5,
    text_col: str = "text",
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded seeded (features, labels) sample for the trainer —
    ``label`` is any boolean Column (e.g. a heuristic rule, a human
    tag join, or a held-out judgment)."""
    s = quality_signals(text_col)
    rows = (
        docs.select(
            *[s[f].alias(f) for f in QUALITY_FEATURES],
            label.cast("double").alias("__y"),
        )
        .sample(fraction=sample_fraction, seed=20240814)
        .limit(sample_rows)
        .collect()
    )
    if not rows:
        raise ValueError("sample_training_frame: empty sample")
    X = np.array([[r[f] for f in QUALITY_FEATURES] for r in rows])
    y = np.array([r["__y"] for r in rows])
    return X, y


def score_quality_lr(
    docs: DataFrame,
    weights,
    bias: float,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Map-only scoring pass: ``(doc_id, quality_score, keep)`` with
    ``quality_score = round(sigmoid(w·x + b), 6)`` over the JVM-side
    quality signals. The rounding is the cross-engine contract — raw
    libm ``exp`` can differ in the last ulp between engines, and the
    keep verdict thresholds the ROUNDED score so an ulp can never
    flip it (the emb_outliers discipline)."""
    s = quality_signals(text_col)
    z = F.lit(float(bias))
    for f, w in zip(QUALITY_FEATURES, weights):
        z = z + s[f].cast("double") * float(w)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return docs.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= threshold).alias("keep"),
    )


# Fixed demonstration model for the oracle-checked corpus entry:
# hand-set coefficients in original feature units (more words, more
# stopwords, mid word length → higher quality), NOT trained at query
# time — training is covered by its own determinism/separability
# tests, and a fixed model is what production scoring ships anyway.
FIXED_LR_WEIGHTS = (0.08, -0.55, 2.0, 0.25)
FIXED_LR_BIAS = -6.5


@register(
    "text_quality_lr",
    oracle=f"""
        WITH s AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_words,
                   CAST(list_sum(list_transform(string_split(text, ' '),
                        x -> length(x))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS mean_word_len,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS alpha_frac,
                   len(list_filter(string_split(text, ' '),
                        x -> x IN ('the', 'a', 'an', 'and', 'of', 'to',
                                   'in', 'on', 'is', 'for')))
                       AS n_stopwords
            FROM documents
        )
        SELECT doc_id,
               ROUND(1.0 / (1.0 + exp(-({FIXED_LR_BIAS}
                   + n_words * {FIXED_LR_WEIGHTS[0]}
                   + mean_word_len * {FIXED_LR_WEIGHTS[1]}
                   + alpha_frac * {FIXED_LR_WEIGHTS[2]}
                   + n_stopwords * {FIXED_LR_WEIGHTS[3]}))), 6)
                   AS quality_score,
               ROUND(1.0 / (1.0 + exp(-({FIXED_LR_BIAS}
                   + n_words * {FIXED_LR_WEIGHTS[0]}
                   + mean_word_len * {FIXED_LR_WEIGHTS[1]}
                   + alpha_frac * {FIXED_LR_WEIGHTS[2]}
                   + n_stopwords * {FIXED_LR_WEIGHTS[3]}))), 6) >= 0.5
                   AS keep
        FROM s
    """,
    tags=("text", "quality", "classifier", "extension"),
    window_rank=1,
)
def text_quality_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring with a FIXED logistic model over
    the quality signals — the classifier stage every curation
    pipeline runs after the rule gate. Zero shuffle; the DuckDB
    oracle recomputes the sigmoid exactly (scores rounded to 1e-6 so
    libm exp ulps cannot flip verdicts)."""
    return score_quality_lr(
        spread(read_table(spark, sf_dir, "documents")),
        FIXED_LR_WEIGHTS,
        FIXED_LR_BIAS,
    )

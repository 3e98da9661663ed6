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


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_corpus_text_is_ascii(sf):
    """Shared precondition of the byte-vs-character oracles (BPE
    nested-REPLACE, winnowing ascii() hash, chargram length identity,
    BMP/PNG/y4m pixel reconstruction): DuckDB string functions count
    CHARACTERS while the Spark side operates on UTF-8 BYTES, and the
    chr(0)..chr(8) placeholder/padding characters must not occur in
    the input. Both hold iff the documents text is pure ASCII free of
    control bytes 0x00-0x08 — asserted here so a future non-ASCII
    corpus fails THIS test with a clear message instead of a
    mystifying hash mismatch in those entries."""
    import duckdb

    con = duckdb.connect()
    [(bad,)] = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{sf}/documents.parquet')
        WHERE octet_length(CAST(text AS BLOB)) != length(text)
           OR regexp_matches(text, '[\\x00-\\x08]')
        """
    ).fetchall()
    assert bad == 0, (
        f"{bad} documents in {sf} violate the ASCII/no-control-bytes "
        "precondition the byte-vs-character oracles rely on"
    )


# The numerically-sensitive entries: floating aggregation order,
# quantile sketches, log/exp chains, tie-breaking under volume —
# exactly the places where scaling 10x could surface ulp/overflow
# drift the sf0.001 gate cannot see. Opt-in (driver-scale sf0.01 runs
# ~10x the data): `pytest -m sf01` — deselected by default via
# pytest.ini so the ordinary suite stays fast.
SF01_SENSITIVE = (
    "q07_corr",
    "q21_weighted_mean",
    "q22_quantiles",
    "q29_approx_aggregates",
    "q43_global_sort",
    "q54_correlated_scalar",
    "q60_share_of_total",
    "text_logprob",
    "text_tfidf_topk",
    "text_quality_lr",
    "bpe_token_counts",
    "dedup_winnow",
    "dedup_clusters",
    "emb_outliers",
    "pipeline_curate_e2e",
    "mm_y4m_features",
    "q63_regression_aggs",
    "graph_pagerank",
    "text_bigram_logprob",
    "fuzzy_source_pairs",
    "ann_lsh_topk",
    "dedup_embedding_lsh",
    # the parity-quantizer family: Lloyd rounding + argmax/argmin
    # tie-break + ADC sums are exactly where scale could surface
    # cross-engine ulp drift (all hand-verified at sf0.01 AND sf0.1
    # in round 8; this keeps the check automated)
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "dedup_semantic",
    "q67_distribution_ranks",  # rounded rank divisions under volume
    "q69_gap_fill",  # rounded-mean interpolation divisions under volume
    "dedup_canonical_pick",  # rides dedup_clusters' pair set + election
    "pipeline_weighted_sample",  # libm ln + rounded-score top-k boundary
    "text_entropy",  # 95-term ln fold, rounded at 1e-6
    # round-10 additions hand-verified at sf0.01 during the build;
    # these keep those checks automated
    "dedup_image_dhash",  # 56-bit signatures + pigeonhole banding
    "dedup_audio_fingerprint",  # frame-energy signatures, same regime
    "dedup_repeated_spans",  # 128-bit rolling-hash SQL twin under volume
    "dedup_span_cut",  # detection + interval merge + splice composition
    "graph_kcore",  # unrolled peel CTE must stay within 8 rounds
    "agg_incremental_refresh",  # decimal merge vs full recompute
    "storage_table_diff",  # null-safe classification on both versions
    "q76_robust_outliers",  # interpolated median/MAD + 3.5 cut under volume
    "q78_profile_columns",  # weighted decimal means, distinct counts
    "q81_rolling_median",  # interpolated percentile window under volume
    "text_heavy_hitters",  # integer threshold boundary under volume
    "sketch_rollup_distinct",  # HLL estimate tolerance under volume
    # round-11 additions hand-verified at sf0.01 during the build
    "dedup_minhash_index",  # LSH recall + frozen-family probe at volume
    "q78_profile_approx",  # HLL-vs-exact tolerance boolean under volume
    "mm_flac_features",  # rice/predictor coverage widens with volume
    "text_normalize",  # nfc_normalize twin over the full corpus
    "storage_table_lifecycle",  # CoW rewrite-selection under volume
    "dedup_incremental_indexed",  # composed drop rules at volume
    # round-12 additions hand-verified at sf0.01 during the build
    "mm_ogg_flac_features",  # page walk / lacing coverage widens with volume
    "storage_schema_evolution",  # mixed-schema CoW reads under volume
    "pipeline_decontaminate_bloom",  # FP-verify stage under volume
    "q84_quantile_approx",  # GK-sketch tolerance boolean under volume
    # round-13 additions hand-verified at sf0.01 during the build
    "storage_restore_lifecycle",  # manifest-aliased restore under volume
    "q85_stratified_sample",  # portable md5 rank + ceil quotas at volume
    # round-14 additions hand-verified at sf0.01 during the build
    "storage_objectstore_lifecycle",  # scheme-routed CoW chain at volume
    # round-15 additions hand-verified at sf0.01 during the build
    "storage_ts_clustered_merge",  # ts-stats pruning gate at volume
)


@pytest.mark.sf01
@pytest.mark.parametrize("name", SF01_SENSITIVE)
def test_corpus_query_sf01(spark, sf_oracle, name):
    """Driver-scale (sf0.01) value check for the numerically-sensitive
    subset — catches scale-dependent drift BEFORE the driver does."""
    spec = CORPUS[name]
    assert spec.oracle is not None
    assert_frames_match(
        spec.build(spark, sf_oracle), run_oracle(spec.oracle, sf_oracle), name
    )


# The learned-quantizer family at FULL local scale (sf0.1): Lloyd
# retraining, argmax/argmin tie-breaks and ADC sums are the one place
# where another 10x of data could still surface cross-engine ulp
# drift past the sf0.01 gate. Round 8 verified these by hand at
# sf0.1; this keeps that check automated. Opt-in (`pytest -m sf1`,
# several minutes — DuckDB re-runs the unrolled Lloyd chains on the
# full corpus).
SF1_QUANTIZER = (
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_index_topk",
    "dedup_semantic",
)


@pytest.mark.sf1
@pytest.mark.parametrize("name", SF1_QUANTIZER)
def test_corpus_query_sf1(spark, name):
    """Full-local-scale (sf0.1) value check for the quantizer family."""
    sf = "/root/testdata/sf0.1"
    spec = CORPUS[name]
    assert spec.oracle is not None
    assert_frames_match(
        spec.build(spark, sf), run_oracle(spec.oracle, sf), name
    )


def test_q76_zero_mad_group_matches_oracle(spark, tmp_path):
    """A >50%-constant group has MAD = 0: Spark's x/0.0 is ±Inf while
    DuckDB's is NULL, so without the explicit mad=0 branch the two
    engines count different outliers. Pin the divergence case with a
    synthetic events table (group 'const': 10× 5.0 and 2× 7.0 →
    med=5, mad=0, exactly the 2 off-median rows are outliers)."""
    import os

    import pandas as pd

    sf = str(tmp_path)
    for name in os.listdir("/root/testdata/sf0.001"):
        os.symlink(f"/root/testdata/sf0.001/{name}", f"{sf}/{name}")
    os.unlink(f"{sf}/events.parquet")
    values = [5.0] * 10 + [7.0] * 2 + [1.0, 2.0, 3.0, 4.0, 100.0]
    pd.DataFrame(
        {
            "event_id": range(len(values)),
            "ts": pd.Timestamp("2001-01-01"),
            "user_id": 0,
            "event_type": (["const"] * 12 + ["vary"] * 5),
            "value": values,
            "props": "{}",
        }
    ).to_parquet(f"{sf}/events.parquet")
    spec = CORPUS["q76_robust_outliers"]
    df = spec.build(spark, sf)
    assert_frames_match(df, run_oracle(spec.oracle, sf), "q76_zero_mad")
    got = {r["event_type"]: r["n_outliers"] for r in df.collect()}
    assert got["const"] == 2

"""The driver's correctness artifact records the FIRST 50 registry
entries and its round-over-round comparison tracks them by name; a
registration-order change would silently drop established entries from
that window (losing their driver hash checks) while every local test
stays green. This pin makes such a change loud: if you add an entry,
give it ``window_rank=1`` (see plans/registry.py) so it sorts after
the frozen window, and leave this list untouched."""

from __future__ import annotations

from cae_polars_tools_spark.plans.registry import load_all

DRIVER_WINDOW = ['q01_pricing_summary', 'q02_projection_arith', 'q03_filter_predicates', 'q04_conditional_case', 'q05_global_agg', 'q06_groupby_stats', 'q07_corr', 'q08_distinct', 'q09_sort_topk', 'q10_join_shipping_priority', 'q11_join_regional_revenue', 'q12_window_anomaly', 'q13_argmax_per_group', 'q14_lag_diff', 'q15_datetime_parts', 'q16_math_funcs', 'q17_casts', 'q18_union_concat', 'q19_binning', 'q20_quality_report', 'q21_weighted_mean', 'q22_quantiles', 'q23_tumbling_window', 'q26_sessionization', 'q24_anti_join', 'q25_semi_join', 'q27_sliding_window', 'q28_sql_interface', 'q29_approx_aggregates', 'q31_rollup', 'q32_cube', 'q33_outer_join', 'q35_cross_join', 'text_stats', 'text_language_id', 'text_fingerprint', 'dedup_exact', 'dedup_ngram_jaccard', 'dedup_minhash_lsh', 'dedup_simhash', 'dedup_clusters', 'dedup_embedding_cosine', 'ann_bruteforce_topk', 'multimodal_frame_sample', 'multimodal_features', 'q30_asof_join', 'q34_range_join', 'zarr_scan_longformat', 'zarr_filter_pushdown', 'zarr_multi_array_join']


def test_driver_window_entries_are_stable():
    assert list(load_all())[:50] == DRIVER_WINDOW


def test_survey_header_count_matches_registry():
    """SURVEY §8's header states the registry size; the round-9 churn
    showed the doc sync is manual. This tripwire fails the suite when
    the header goes stale — update the header when adding entries."""
    import os
    import re

    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    m = re.search(r"registry at (\d+) entries", survey)
    assert m, "SURVEY §8 header lost its 'registry at N entries' line"
    assert int(m.group(1)) == len(load_all()), (
        f"SURVEY §8 header says {m.group(1)} entries but the registry "
        f"has {len(load_all())} — update the header (and README if it "
        "states a count)"
    )

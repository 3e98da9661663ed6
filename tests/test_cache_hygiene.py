"""The dedup pair generators persist intermediate frames (shingle
index, signature bands) because their DAGs read them 2-4 times. The
cleanup contract (`operators/dedup.py:_release_on_gc`): those caches
are released as soon as the returned plan handle is dropped, so a
long-lived session calling the generators repeatedly does not
accumulate cached frames until eviction.
"""

from __future__ import annotations

import gc

import pytest


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


DEDUP_ENTRIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_incremental",
    "dedup_winnow",
    "dedup_repeated_spans",
    "dedup_span_cut",
]


@pytest.mark.parametrize("name", DEDUP_ENTRIES)
def test_no_cached_frames_after_materialization(spark, sf_small, name):
    from cae_polars_tools_spark.plans.registry import load_all

    spark.catalog.clearCache()
    gc.collect()
    assert _persistent_rdd_count(spark) == 0

    df = load_all()[name].build(spark, sf_small)
    df.write.format("noop").mode("overwrite").save()
    # Drop the plan handle: CPython refcounting fires the generators'
    # weakref cleanup hooks deterministically.
    del df
    gc.collect()
    assert _persistent_rdd_count(spark) == 0

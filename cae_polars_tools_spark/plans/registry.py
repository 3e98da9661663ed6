"""Registry of named queries with optional DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2) registers here; the
driver contract (``__spark_entry__.py``) exposes this registry via
``queries()`` / ``oracle_sql()``. Each builder takes
``(spark, sf_dir)`` and returns a DataFrame; ``oracle`` is equivalent
ANSI SQL over the same tables (or ``None`` for genuinely
non-SQL-expressible operators, which the driver checks rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    window_rank: int = 0


CORPUS: dict[str, QuerySpec] = {}

# The external harness's correctness artifact records the FIRST 50
# registry entries and tracks them round-over-round BY NAME. This
# tuple freezes their order so it can never depend on process import
# history: @register fires at module import, so without an explicit
# rank the dict's insertion order — and therefore the window — would
# silently reorder whenever a consumer imports an operator module
# before the first load_all() call (e.g. for a helper function).
# tests/test_driver_window.py keeps an independent copy as a tripwire.
DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    'q01_pricing_summary',
    'q02_projection_arith',
    'q03_filter_predicates',
    'q04_conditional_case',
    'q05_global_agg',
    'q06_groupby_stats',
    'q07_corr',
    'q08_distinct',
    'q09_sort_topk',
    'q10_join_shipping_priority',
    'q11_join_regional_revenue',
    'q12_window_anomaly',
    'q13_argmax_per_group',
    'q14_lag_diff',
    'q15_datetime_parts',
    'q16_math_funcs',
    'q17_casts',
    'q18_union_concat',
    'q19_binning',
    'q20_quality_report',
    'q21_weighted_mean',
    'q22_quantiles',
    'q23_tumbling_window',
    'q26_sessionization',
    'q24_anti_join',
    'q25_semi_join',
    'q27_sliding_window',
    'q28_sql_interface',
    'q29_approx_aggregates',
    'q31_rollup',
    'q32_cube',
    'q33_outer_join',
    'q35_cross_join',
    'text_stats',
    'text_language_id',
    'text_fingerprint',
    'dedup_exact',
    'dedup_ngram_jaccard',
    'dedup_minhash_lsh',
    'dedup_simhash',
    'dedup_clusters',
    'dedup_embedding_cosine',
    'ann_bruteforce_topk',
    'multimodal_frame_sample',
    'multimodal_features',
    'q30_asof_join',
    'q34_range_join',
    'zarr_scan_longformat',
    'zarr_filter_pushdown',
    'zarr_multi_array_join',
)



def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
    window_rank: int = 0,
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder in the corpus.

    ``window_rank`` orders entries *within* the oracle-backed /
    rows-only classes in :func:`load_all`. The driver's correctness
    artifact records only the first 50 registry entries, and its
    round-over-round comparison tracks those 50 by name — entries
    added after the window filled register with ``window_rank=1`` so
    the established 50 driver-checked entries keep their slots, and
    the newer entries (which carry the same oracle SQL, asserted by
    the in-repo DuckDB gate ``tests/test_corpus_oracle.py``) sort
    after them."""

    def wrap(fn: Builder) -> Builder:
        if name in CORPUS:
            raise ValueError(f"duplicate corpus entry {name!r}")
        CORPUS[name] = QuerySpec(
            name=name,
            build=fn,
            oracle=oracle,
            tags=tags,
            doc=doc or (fn.__doc__ or ""),
            window_rank=window_rank,
        )
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers corpus entries and return the
    full registry, oracle-backed entries first.

    The ordering is deliberate: the driver's correctness artifact has
    held exactly 50 entries (CORRECTNESS_r01 silently dropped the
    trailing registrations), so every hash-checkable entry sorts ahead
    of any rows-only ones (none remain as of round 8 — the learned-
    quantizer entries gained SQL-retrained parity oracles; the class
    split is kept for future genuinely non-SQL entries). Within each
    class, registration order is preserved."""
    # Imports are deferred so that importing the package stays cheap and
    # so partial failures (e.g. an optional dependency) don't take down
    # the whole corpus.
    import cae_polars_tools_spark.plans.corpus  # noqa: F401
    import cae_polars_tools_spark.operators.dedup  # noqa: F401
    import cae_polars_tools_spark.operators.similarity  # noqa: F401
    import cae_polars_tools_spark.operators.text  # noqa: F401
    import cae_polars_tools_spark.operators.multimodal  # noqa: F401
    import cae_polars_tools_spark.operators.y4m  # noqa: F401
    import cae_polars_tools_spark.operators.gif  # noqa: F401
    import cae_polars_tools_spark.operators.avi  # noqa: F401
    import cae_polars_tools_spark.operators.graph  # noqa: F401
    import cae_polars_tools_spark.operators.pipeline  # noqa: F401
    import cae_polars_tools_spark.operators.temporal  # noqa: F401
    import cae_polars_tools_spark.operators.classifier  # noqa: F401
    import cae_polars_tools_spark.operators.tokenizer  # noqa: F401
    import cae_polars_tools_spark.operators.sketches  # noqa: F401
    import cae_polars_tools_spark.operators.incremental  # noqa: F401
    import cae_polars_tools_spark.operators.minhash_index  # noqa: F401
    import cae_polars_tools_spark.operators.flac  # noqa: F401
    import cae_polars_tools_spark.table  # noqa: F401
    import cae_polars_tools_spark.plans.zarr_demo  # noqa: F401

    rank = {n: i for i, n in enumerate(DRIVER_WINDOW_ORDER)}
    return dict(
        sorted(
            CORPUS.items(),
            key=lambda kv: (
                rank.get(kv[0], len(rank)),  # frozen window, in order
                kv[1].oracle is None,  # then oracle-backed extras
                kv[1].window_rank,
                kv[0],  # name: import-order-independent tiebreak
            ),
        )
    )

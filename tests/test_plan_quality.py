"""Physical-plan regression tests: the 100 TB contract, asserted.

Correctness tests prove WHAT each query returns; these prove HOW —
that Catalyst produces the plan shape that survives a 1000-executor
scale-up. Each assertion encodes a property that, if silently lost in
a refactor, would still pass every value-level test while multiplying
the cluster bill:

* filters/projections reach the parquet scan (PushedFilters/ReadSchema),
* small dimensions broadcast instead of shuffling the fact table,
* nothing degenerates into a cartesian product (except the one entry
  whose semantics ARE a cross join),
* hot expression pipelines stay inside whole-stage codegen.
"""

from __future__ import annotations

import pytest

from cae_polars_tools_spark.plans.registry import load_all

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = load_all()[name].build(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name: str) -> str:
    """Capture ``df.explain('formatted')`` — the plan report the build
    loop audits by hand, asserted here so regressions fail CI."""
    import io
    from contextlib import redirect_stdout

    df = load_all()[name].build(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_reaches_parquet_scan(spark):
    """q03's predicates must be pushed into the parquet source, not
    evaluated after a full scan."""
    plan = _formatted(spark, "q03_filter_predicates")
    assert "PushedFilters: [" in plan
    # at least one concrete pushed predicate, not an empty list
    assert "PushedFilters: []" not in plan.split("PushedFilters:", 1)[1][:200]


def test_projection_prunes_scan_columns(spark):
    """q02 projects a handful of lineitem columns; the scan schema must
    not contain untouched wide columns like l_comment."""
    plan = _formatted(spark, "q02_projection_arith")
    read_schemas = [
        seg.split("\n", 1)[0]
        for seg in plan.split("ReadSchema: ")[1:]
    ]
    assert read_schemas, "no ReadSchema in formatted plan"
    assert all("l_comment" not in rs for rs in read_schemas)


def test_small_dims_broadcast_not_shuffled(spark):
    """q11 joins region(5)⋈nation(25)⋈customer⋈orders⋈lineitem: every
    small dimension must arrive via BroadcastHashJoin; the fact table
    must never be exchanged for one of them."""
    plan = _plan(spark, "q11_join_regional_revenue")
    assert "BroadcastHashJoin" in plan


def test_no_cartesian_products_anywhere(spark):
    """No corpus entry may plan a cartesian/unconditioned nested-loop
    join — except q35_cross_join, whose semantics are a (bounded,
    broadcast) cross join, and zarr_write_roundtrip, which is a write
    side effect + fresh scan, not a join query."""
    offenders = []
    for name in sorted(load_all()):
        if name in ("q35_cross_join", "zarr_write_roundtrip"):
            continue
        plan = _plan(spark, name)
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == []


def test_cross_join_is_broadcast_not_shuffle(spark):
    """The one deliberate cross join must be the broadcast nested-loop
    flavor (small side shipped once), not a shuffle cartesian."""
    plan = _plan(spark, "q35_cross_join")
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan


def test_agg_pipeline_stays_in_codegen(spark):
    """q01 (scan → filter → hash agg) must run inside whole-stage
    codegen spans, and its aggregate must be partial-then-final
    (map-side combine before the shuffle). AQE finalizes the physical
    plan only on execution, so run the query before reading it."""
    df = load_all()["q01_pricing_summary"].build(spark, SF)
    assert "partial_" in df._jdf.queryExecution().executedPlan().toString()
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "*(" in final  # whole-stage-codegen stage markers


def test_exact_dedup_is_single_shuffle_agg(spark):
    """dedup_exact must be one hash-aggregate shuffle on the
    fingerprint (partial + final), with no join and no sort."""
    plan = _formatted(spark, "dedup_exact")
    assert "partial_" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 2  # fingerprint agg (+AQE read)


def test_embedding_cosine_is_single_shuffle_no_join(spark):
    """dedup_embedding_cosine is the arrays-once kernel: ONE exchange
    (groupBy label feeding applyInPandas) and no self-join — each
    embedding crosses Arrow once, never once per pair."""
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # group shuffle (+AQE read)


def test_q29_scans_lineitem_once(spark):
    """q29 derives the exact twins AND both sketches from one shared
    (flag, orderkey)-level aggregate: exactly one lineitem scan, no
    join, no Expand (the COUNT(DISTINCT) shape it replaced)."""
    import re

    plan = _formatted(spark, "q29_approx_aggregates")
    # formatted output names each node once in the tree and once in the
    # detail section — count numbered detail headers, i.e. scan NODES
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" not in plan
    raw = _plan(spark, "q29_approx_aggregates")
    assert "Join" not in raw


def test_asof_join_has_no_range_fanout(spark):
    """q30's as-of join is the union + carry-forward-window form: no
    nested-loop/range join, exactly one shuffle per side feeding the
    window sort."""
    plan = _plan(spark, "q30_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


@pytest.mark.parametrize(
    "name", ["q10_join_shipping_priority", "q24_anti_join", "q25_semi_join"]
)
def test_join_filters_push_below_join(spark, name):
    """Per-table predicates must appear as PushedFilters on their own
    scans — i.e. Catalyst pushed them below the join."""
    plan = _formatted(spark, name)
    assert "PushedFilters: [" in plan
    first = plan.split("PushedFilters:", 1)[1][:200]
    assert "[]" != first.strip().split("\n")[0].strip()


def test_pivot_is_single_agg_no_discovery(spark):
    """q38's pivot values are DECLARED, so the plan is one scan + one
    partial/final hash aggregate — no distinct-values discovery job,
    no join, no second scan."""
    import re

    plan = _plan(spark, "q38_pivot_wide")
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "partial_" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # group shuffle (+AQE read)


def test_unpivot_is_zero_shuffle(spark):
    """q39's unpivot is a per-row Expand over a pruned, filtered scan:
    no Exchange anywhere, and the orderkey filter reaches the scan."""
    plan = _plan(spark, "q39_unpivot_long")
    assert "Exchange" not in plan
    assert "Expand" in plan
    fmt = _formatted(spark, "q39_unpivot_long")
    assert "PushedFilters: [" in fmt
    assert "[]" != fmt.split("PushedFilters:", 1)[1][:60].strip().split("\n")[0].strip()


@pytest.mark.parametrize("name", ["q40_window_ranking", "q41_window_frames"])
def test_window_entries_single_shuffle(spark, name):
    """The ranking/frame windows cost exactly ONE exchange (the
    partition-key shuffle feeding the window sort) — no join, no
    second shuffle from a stray repartition."""
    plan = _plan(spark, name)
    assert "Window" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_scalar_subquery_broadcasts_the_aggregate(spark):
    """q37's 1-row global mean must arrive via broadcast nested-loop —
    the part table itself is never exchanged."""
    plan = _plan(spark, "q37_scalar_subquery")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_embedding_lsh_is_groupby_plus_distinct_only(spark):
    """dedup_embedding_lsh: bucket-local scoring (FlatMapGroupsInPandas
    behind one group shuffle) + the pair distinct — no join node and no
    all-pairs structure anywhere."""
    plan = _plan(spark, "dedup_embedding_lsh")
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 3  # bucket groupBy + 2-phase distinct


def test_global_sort_is_range_partitioned(spark):
    """q43 must plan a range exchange (sampled split points feeding
    partition-local sorts) — never a single-partition sort — and its
    filter must reach the scan."""
    plan = _plan(spark, "q43_global_sort")
    assert "rangepartitioning" in plan.lower()
    assert "Sort" in plan
    fmt = _formatted(spark, "q43_global_sort")
    assert "PushedFilters: [" in fmt
    assert "[]" != fmt.split("PushedFilters:", 1)[1][:60].strip().split("\n")[0].strip()


@pytest.mark.parametrize("name", ["q31_rollup", "q32_cube"])
def test_grouping_sets_expand_partials_not_the_table(spark, name):
    """q31/q32 pre-aggregate to the finest grouping level BEFORE the
    grouping-sets Expand, so Expand multiplies O(groups) partial rows,
    not the fact table. In the plan tree (printed top-down) that means
    a HashAggregate must appear BELOW the Expand node — i.e. after it
    in the string — feeding it pre-aggregated rows."""
    plan = _plan(spark, name)
    assert "Expand" in plan
    below_expand = plan.split("Expand", 1)[1]
    assert "HashAggregate" in below_expand
    # and the scan feeds that base aggregate, not the Expand directly
    assert "Scan parquet" in below_expand


def test_salted_join_shuffles_on_key_and_salt(spark):
    """skew_join_salted must plan a real shuffled equi-join on
    (key, salt) — never a nested loop — with partial aggregation above
    it, and the small side's replication must happen via Generate
    (explode), not a join."""
    plan = _plan(spark, "skew_join_salted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join must be SHUFFLED on (key, salt): a broadcast join has
    # no reducer for the salt to spread, so Catalyst's small-scale
    # broadcast preference would demo the wrong large-scale plan —
    # salted_join pins it with a shuffle_hash hint
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "Generate explode" in plan  # salt replication is an explode
    assert "__salt" in plan            # join key extended by the salt
    assert "partial_" in plan          # downstream agg map-side combines


def test_text_repetition_aggregates_partially(spark):
    """The (doc, bigram) mode count must map-side combine (the key
    cardinality is bounded by distinct bigrams per doc) and no join
    may sneak in — signals ride the aggregation keys."""
    plan = _plan(spark, "text_repetition")
    assert "partial_" in plan
    assert "Join" not in plan
    assert "Generate explode" in plan


def test_text_logprob_broadcasts_the_model(spark):
    """The corpus-sized token stream joins the unigram model via
    BROADCAST joins only — a shuffled join here would re-shuffle the
    whole corpus for a vocabulary-bounded table."""
    plan = _plan(spark, "text_logprob")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "partial_" in plan


def test_domain_cap_has_no_join_and_two_windows(spark):
    """The salted per-domain cap is windows + filters only: the
    salt-local pre-cap window, then the key window over the reduced
    set — no join, no cartesian."""
    plan = _plan(spark, "pipeline_domain_cap")
    assert "Join" not in plan
    assert plan.count("RunningWindowFunction") >= 1 or "Window" in plan


def test_semantic_dedup_is_groupby_apply_no_join(spark):
    """Semantic dedup's scoring stage is ONE grouped-map shuffle on
    the learned cluster id; the pair space never materializes as a
    join."""
    plan = _plan(spark, "dedup_semantic")
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_emb_outliers_broadcasts_centroids_no_corpus_reshuffle(spark):
    """The centroid table must come back via a broadcast join and the
    scoring side must not shuffle for it; the only exchanges belong to
    the bounded (label, pos) centroid aggregation."""
    plan = _plan(spark, "emb_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_winnow_caches_index_and_broadcasts_the_cap(spark):
    """dedup_winnow's fingerprint index must come from the persisted
    cache (the UDF is the dominant cost — without InMemoryTableScan it
    executes once per consumer), the boilerplate cap must arrive via a
    broadcast join, and the pair count must map-side combine."""
    plan = _plan(spark, "dedup_winnow")
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan  # the left_anti hot-fp cap
    assert "partial_" in plan
    assert "CartesianProduct" not in plan


def test_exists_subqueries_decorrelate_to_semi_anti_joins(spark):
    """Catalyst must rewrite the correlated EXISTS / NOT EXISTS into
    semi/anti joins — no nested-loop re-execution per outer row."""
    plan = _plan(spark, "q46_exists_subq")
    assert "LeftSemi" in plan or "Semi" in plan
    assert "LeftAnti" in plan or "Anti" in plan
    assert "CartesianProduct" not in plan


def _non_spread_exchanges(plan: str) -> list[str]:
    """Exchange lines other than spread()'s parallelism-restoring
    round-robin repartition (which only fires on tiny single-split
    scans like sf0.001 — a 100 TB scan already has more tasks than
    cores and plans no such exchange)."""
    return [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]


def test_bpe_tokenize_is_zero_shuffle(spark):
    """The BPE encode pass must be a pure map: merges ride in the
    closure, no data-dependent Exchange anywhere in the plan."""
    plan = _plan(spark, "bpe_token_counts")
    assert not _non_spread_exchanges(plan), plan
    assert "MapInPandas" in plan


def test_png_features_are_zero_shuffle(spark):
    """PNG encode→decode→features is map-only: payload bytes must
    never cross a partition boundary."""
    plan = _plan(spark, "mm_png_features")
    assert not _non_spread_exchanges(plan), plan


def test_split_pack_single_bookkeeping_shuffle(spark):
    """The md5 split is a row-local predicate (no Exchange for it) and
    packing is partition-local; the only data-dependent shuffle is the
    per-pack-total window over thin (id, pack, tokens) bookkeeping
    rows — document text must never reach an exchange."""
    plan = _plan(spark, "pipeline_split_pack")
    ex = _non_spread_exchanges(plan)
    assert len(ex) == 1 and "pack_id" in ex[0], plan


def test_salted_agg_two_phase_shape(spark):
    """Phase 1 groups on (key, salt), phase 2 on the key: exactly the
    two hash-agg exchanges, nothing more."""
    plan = _plan(spark, "salted_hot_key_agg")
    # two aggregation exchanges + the final orderBy's range exchange
    assert plan.count("Exchange") <= 3
    assert "__salt" in plan


def test_correlated_scalar_decorrelates_to_aggregate_join(spark):
    """q54's correlated scalar subquery must decorrelate: the physical
    plan is a per-key aggregate joined back — no nested-loop / no
    cartesian, and only the bounded aggregate+join exchanges."""
    plan = _plan(spark, "q54_correlated_scalar")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 4, plan


def test_funnel_is_single_agg_no_join(spark):
    """q55: one conditional-min hash aggregate — no join, one group
    shuffle (+AQE read)."""
    plan = _plan(spark, "q55_funnel")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2, plan


def test_cohort_broadcasts_the_per_user_frame(spark):
    """q56: the per-user cohort frame must arrive via broadcast — the
    events fact table is never exchanged for the join."""
    plan = _plan(spark, "q56_retention_cohort")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zarr_resample_single_agg_shuffle(spark):
    """zarr_resample_time: scan → bucket projection → ONE partial+final
    aggregate shuffle; no join, no second scan."""
    plan = _plan(spark, "zarr_resample_time")
    assert "Join" not in plan
    assert "partial_" in plan
    assert plan.count("Exchange") <= 2, plan


def test_bag_set_ops_have_no_sort_merge_join(spark):
    """q57: INTERSECT/EXCEPT ALL plan as aggregate+generate over the
    union — never as a join of the two sides."""
    plan = _plan(spark, "q57_bag_set_ops")
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_grouping_sets_expand_once_single_scan(spark):
    """q58: one Expand + one partial/final aggregate over ONE scan."""
    import re

    plan = _plan(spark, "q58_grouping_sets")
    assert plan.count("Expand") == 1
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "partial_" in plan


def test_latest_per_key_single_window_shuffle(spark):
    """q59: one key shuffle feeding the window sort; no join."""
    plan = _plan(spark, "q59_latest_per_key")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1, plan


def test_gaps_islands_single_shared_shuffle(spark):
    """q62: the (user, day) distinct, the island window and the final
    group-by all hash on user_id-rooted keys — ONE exchange total; no
    join, no iteration (the constant-difference trick is pure window
    algebra)."""
    plan = _plan(spark, "q62_gaps_islands")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1, plan


def test_regression_aggs_partial_aggregate_no_join(spark):
    """q63: the regr_* family partial-aggregates map-side — the single
    exchange carries per-group co-moment sums, not rows."""
    plan = _plan(spark, "q63_regression_aggs")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1, plan
    assert "partial_regr" in plan or "HashAggregate" in plan


def test_gif_features_are_zero_shuffle(spark):
    """mm_gif_features: the whole encode/decode/feature chain is one
    mapInPandas over the scan — payloads never shuffle."""
    plan = _plan(spark, "mm_gif_features")
    assert "Exchange hashpartitioning" not in plan
    assert "MapInPandas" in plan


def test_y4m_features_are_zero_shuffle(spark):
    plan = _plan(spark, "mm_y4m_features")
    assert "Exchange hashpartitioning" not in plan
    assert "MapInPandas" in plan


def test_pca_projection_is_zero_shuffle(spark):
    """emb_pca_project: training reduces fixed cell counts; the
    returned projection plan is a pure Arrow map over the scan."""
    plan = _plan(spark, "emb_pca_project")
    assert "Exchange hashpartitioning" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_fuzzy_pairs_is_equijoin_no_cartesian(spark):
    """fuzzy_source_pairs: the PassJoin blocking must plan the MAIN
    path as an equi-join on (l, k, segment) — never a cartesian over
    the string set. The one permitted nested-loop is the short-string
    hole-patch, whose BOTH sides are length-pruned to <= 2*max_dist
    chars (a bounded broadcast at any scale, like q35's declared
    cross)."""
    plan = _plan(spark, "fuzzy_source_pairs")
    assert "CartesianProduct" not in plan
    # the blocking equi-join is present on the segment key
    assert "seg" in plan and plan.count("Join") >= 1
    import re

    assert re.search(r"HashJoin \[l#\d+, k#\d+, seg#\d+\]", plan) or (
        "SortMergeJoin" in plan and "seg" in plan
    ), plan


def test_html_strip_is_zero_shuffle_codegen(spark):
    """text_html_strip: a pure regexp_replace/replace chain — no data
    shuffle (the only exchange is spread()'s tiny-SF round-robin) and
    no Python stage."""
    plan = _plan(spark, "text_html_strip")
    assert "Exchange hashpartitioning" not in plan
    for node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan


def test_pagerank_has_no_cartesian_and_broadcast_contribs(spark):
    """graph_pagerank: every per-round contribution join is an
    equi-join (no cartesian); the tiny rank/outdeg frames broadcast
    against the cached edge partitioning."""
    plan = _plan(spark, "graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q65_composition_stays_hash_joins_bounded_exchanges(spark):
    """q65 (TPC-H Q21 shape): the EXISTS/NOT-EXISTS "different
    supplier" conjuncts must ride their l_orderkey equi-component as
    hash/sort-merge join post-probe filters — the classic degeneration
    is a nested-loop over the fact table. The late set is persisted
    (built once), dims broadcast, and the top-k is a TakeOrdered, not
    a global sort."""
    plan = _plan(spark, "q65_waiting_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan
    assert "InMemoryTableScan" in plan  # the reused late set
    # bounded exchange budget: orderkey semi/anti + the final group-by;
    # a re-derivation of `late` or a lost broadcast would add more
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_pushdown_sources_consume_coordinate_filters(spark):
    """zarr AND netcdf3 data-source entries: the WHERE predicate on a
    coordinate column must be consumed by pushFilters (pruned at the
    source) — the executed plan has NO post-scan Filter node at all,
    just the projected BatchScan."""
    for name in ("zarr_filter_pushdown", "netcdf_filter_pushdown"):
        plan = _plan(spark, name)
        assert "BatchScan" in plan, plan
        # "RuntimeFilters: []" is part of the scan node itself; what
        # must be absent is a post-scan Filter OPERATOR on `time`
        assert "+- Filter" not in plan and "Filter (" not in plan, (
            name,
            plan,
        )


def test_q66_scd2_single_partitioning(spark):
    """q66: run-collapse lag, version numbering and interval lead must
    all reuse ONE (user_id) partitioning — a second exchange would
    mean the windows disagree on ordering keys."""
    plan = _plan(spark, "q66_scd2_history")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_triangles_has_no_single_partition_exchange(spark):
    """count_triangles' DISTRIBUTED path (forced via local_threshold=0
    — at test SFs the entry itself takes the driver-side strategy, a
    LocalTableScan that would satisfy these assertions vacuously):
    edge orientation must ride the lexicographic (deg, node) struct
    comparison, never a row_number over an unpartitioned window —
    that window is a SinglePartition exchange that funnels every node
    of the graph through one task. The whole pipeline must be
    key-partitioned shuffles and equi-joins only."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.graph import count_triangles

    li = (
        read_table(spark, SF, "lineitem")
        .filter((F.col("l_orderkey") % 10) == 0)
        .select("l_orderkey", "l_partkey")
    )
    x = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    y = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = x.join(y, "ok").filter(F.col("u") != F.col("v")).select("u", "v")
    df = count_triangles(edges, src="u", dst="v", local_threshold=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan, plan
    # and the entry itself takes the local path at test scale
    entry_plan = _plan(spark, "graph_triangles")
    assert "LocalTableScan" in entry_plan, entry_plan


def test_ivfpq_index_query_prunes_code_partitions(spark):
    """ann_ivfpq_index_topk: the persisted-index read path must scan
    ONLY the probed inverted lists — the codes table's scan node
    carries a static `cl INSET …` PartitionFilter — and must never
    scan the float embedding column on the corpus side (embeddings
    parquet is read only for the vec_id<10 query set, filter pushed)."""
    plan = _plan(spark, "ann_ivfpq_index_topk")
    import re

    scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln
    ]
    code_scans = [ln for ln in scans if "ivfpq_index" in ln]
    assert code_scans, plan
    for ln in code_scans:
        m = re.search(r"PartitionFilters: \[([^\]]*)", ln)
        assert m and "INSET" in m.group(1), ln
    # every float-corpus scan is the bounded query set
    emb_scans = [ln for ln in scans if "embeddings.parquet" in ln]
    assert emb_scans
    for ln in emb_scans:
        assert "LessThan(vec_id,10)" in ln, ln


def test_q68_closure_is_doubling_no_cartesian_no_single_partition(spark):
    """q68: the transitive closure must be log-round path doubling —
    equi-joins and key-partitioned distincts only; no cartesian, no
    SinglePartition exchange, no driver-side loop actions (the build
    returns one linear plan)."""
    plan = _plan(spark, "q68_transitive_closure")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan, plan


def test_q70_window_distinct_single_exchange(spark):
    """q70: the first-occurrence flag window and the running-sum
    window must share ONE (user_id) hash exchange — the explicit
    repartition satisfies the (user_id, event_type) clustering by the
    subset rule, so the second window adds only an in-partition sort."""
    plan = _plan(spark, "q70_window_distinct")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_q69_gap_fill_scaffold_broadcasts_no_fact_reshuffle(spark):
    """q69: the dense scaffold must come from broadcasting the tiny
    hour axis against the type dimension — never a cartesian of
    shuffled sides — and both IGNORE-NULLS walks must share one
    per-type partitioning."""
    plan = _plan(spark, "q69_gap_fill")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the dims x axis cross
    # exchanges: daily agg + the per-type window partitioning + the
    # scaffold-to-daily join sides; a lost share would add more
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_weighted_sample_is_takeordered_not_global_sort(spark):
    """pipeline_weighted_sample: the k-smallest-score cut must plan as
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
    never a range-partitioned global sort."""
    plan = _plan(spark, "pipeline_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan


def test_text_entropy_is_zero_shuffle_codegen(spark):
    """text_entropy: the per-char count chain must stay a single
    projection over the scan — no explode, no key exchange (the naive
    per-character groupBy would shuffle the whole corpus). The only
    allowed exchange is spread()'s round-robin parallelism fix, which
    is a no-op at real scale by construction."""
    plan = _plan(spark, "text_entropy")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Generate" not in plan, plan


def test_canonical_pick_single_window_single_election_exchange(spark):
    """dedup_canonical_pick: the representative election must be ONE
    Window node fed by ONE hashpartitioning exchange on cluster_id —
    a second Window (or a SinglePartition exchange) would mean the
    rep_id/keep expressions stopped sharing the election pass."""
    plan = _plan(spark, "dedup_canonical_pick")
    # exactly one Window operator in the whole plan
    assert plan.count("Window") - plan.count("WindowGroupLimit") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    # the election shuffle keys on cluster_id
    import re

    win_exchanges = re.findall(
        r"Exchange hashpartitioning\(([^)]*)\)", plan
    )
    assert any("cluster_id" in g for g in win_exchanges), plan


def test_repeated_spans_two_exchanges_no_pair_join(spark):
    """dedup_repeated_spans: the corpus-sized postings shuffle ONCE
    (on the window hash, for the doc-frequency agg); the flagged
    subset shuffles once more on doc_id, and that partitioning must
    be REUSED by the island-merge aggregation (no third exchange).
    The flagged-hash set joins back as a broadcast LeftSemi — never a
    shuffled or cartesian pair join."""
    plan = _plan(spark, "dedup_repeated_spans")
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "LeftSemi, BuildRight" in plan, plan


def test_ttr_stats_zero_shuffle(spark):
    """text_ttr_stats: all signals are row-local (codegen expressions
    + one Arrow UDF) — the corpus must never shuffle (the only
    allowed exchange is spread()'s round-robin parallelism fix)."""
    plan = _plan(spark, "text_ttr_stats")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "ArrowEvalPython" in plan, plan


def test_audio_resample_stays_partition_local(spark):
    """mm_audio_resample: the WAV build -> resample -> decode ->
    posexplode chain is mapInPandas all the way — payload bytes never
    shuffle."""
    plan = _plan(spark, "mm_audio_resample")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_span_cut_no_pair_join_text_never_shuffles(spark):
    """dedup_span_cut: detection's two exchanges plus ONE more for
    the interval-merge/collect chain on doc_id; the corpus text joins
    the per-doc cut lists via broadcast — the text column itself must
    appear in no Exchange."""
    plan = _plan(spark, "dedup_span_cut")
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan  # flagged + cuts
    # every hash exchange keys on h or doc_id bookkeeping — none may
    # carry the text column
    import re

    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "__t" not in keys and "text" not in keys, plan


def test_chunk_documents_zero_shuffle_codegen(spark):
    """pipeline_chunk_documents: explode(sequence)+substring is a
    pure generator pipeline — no exchange of any kind beyond
    spread()'s round-robin, no Python."""
    plan = _plan(spark, "pipeline_chunk_documents")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "Generate explode" in plan, plan


def test_audio_frame_energy_partition_local(spark):
    plan = _plan(spark, "mm_audio_frame_energy")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_heavy_hitters_confirm_is_broadcast_semi(spark):
    """text_heavy_hitters: the candidate set must flow back as a
    BROADCAST semi-join (the non-candidate corpus filters map-side
    before any shuffle); a sort-merge join here would shuffle the full
    token stream and defeat the whole design."""
    plan = _plan(spark, "text_heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the corpus total rides the candidate pass as an observe metric
    # and enters the confirm plan as a LITERAL: the returned plan must
    # scan the documents parquet exactly once (candidates come from a
    # local table, the cut is a filter, no third total-count subtree)
    assert plan.count("Scan parquet") == 1, plan


def test_signature_dedup_pairs_stay_bucket_local(spark):
    """dedup_image_dhash and dedup_audio_fingerprint ride the shared
    banded-Hamming kernel: candidate pairs must come out of the
    band-bucket groupBy's collect_list, never a signature self-JOIN
    (which would re-shuffle signatures per band)."""
    for name in ("dedup_image_dhash", "dedup_audio_fingerprint"):
        plan = _plan(spark, name)
        assert "SortMergeJoin" not in plan, (name, plan)
        assert "Exchange SinglePartition" not in plan, (name, plan)


def test_sketch_rollup_has_no_single_partition(spark):
    """sketch_rollup_distinct: both the daily sketch build and the
    union rollup key on real columns — a SinglePartition exchange
    would mean the sketches stopped merging distributively."""
    plan = _plan(spark, "sketch_rollup_distinct")
    assert "Exchange SinglePartition" not in plan, plan
    assert "hllsketchagg" in plan.lower() or "hll_sketch_agg" in plan.lower(), plan


def test_skew_profile_uses_takeordered(spark):
    """q77_skew_profile: the top-k cut must be TakeOrdered (per-
    partition heaps + driver merge of k rows), not a global range
    sort of the counts frame."""
    plan = _plan(spark, "q77_skew_profile")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_robust_outliers_models_broadcast(spark):
    """q76: the per-type median/MAD model frames are tiny and must
    broadcast back onto events — a sort-merge join would shuffle the
    corpus twice for a 5-row model."""
    plan = _plan(spark, "q76_robust_outliers")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q78_profile_approx_scale_subtree(spark):
    """q78_profile_approx (round-16 fused shape): exact and approx
    statistics both ride ONE (col_name, value, cnt) pre-aggregate —
    exactly one corpus scan, one Expand (the unpivot; a second would be
    either the old duplicated subtree or Catalyst's distinct-agg
    rewrite resurfacing), and no join anywhere (the old shape
    broadcast-joined two separately-scanned 4-row profiles)."""
    plan = _plan(spark, "q78_profile_approx")
    assert plan.count("Expand") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_minhash_index_probe_is_pruned_and_broadcast(spark):
    """dedup_minhash_index: the persisted band-table read must be
    pruned TWICE — the probe's shard set as a static PartitionFilters
    INSET on the scan, the bh literals as a pushed row-group filter —
    and every join on the probe path must broadcast the (small) batch
    side; the history tables never ride a SortMergeJoin shuffle."""
    import io
    from contextlib import redirect_stdout

    df = load_all()["dedup_minhash_index"].build(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    fmt = buf.getvalue()
    bands_scan = [s for s in fmt.split("\n\n") if "/bands_v" in s]
    assert bands_scan, fmt
    seg = bands_scan[0]
    assert "PartitionFilters: [shard" in seg and "INSET" in seg, seg
    assert "PushedFilters: [In(bh" in seg, seg


def test_incremental_indexed_no_history_shuffle_joins(spark):
    """dedup_incremental_indexed: every join on the index-probe and
    drop paths must broadcast the (small) batch-derived side — no
    SortMergeJoin anywhere, so history tables are scanned but never
    shuffled."""
    plan = _plan(spark, "dedup_incremental_indexed")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.mark.parametrize(
    "name", ["text_normalize", "mm_flac_features", "mm_ogg_flac_features"]
)
def test_per_document_round11_entries_zero_shuffle(spark, name):
    """text_normalize, mm_flac_features and mm_ogg_flac_features are
    per-document maps: the only allowed Exchange is spread()'s
    deliberate round-robin of the single-file test corpus — never a
    hash/single partitioning, never a join."""
    plan = _plan(spark, name)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 1, plan


def test_bloom_decontaminate_prunes_map_side(spark):
    """pipeline_decontaminate_bloom: the Bloom probe must be an Arrow
    UDF filter in the scan stage (corpus rows prune BEFORE any join
    or exchange of the exploded window stream), no cartesian, no
    single-partition funnel."""
    plan = _plan(spark, "pipeline_decontaminate_bloom")
    assert "ArrowEvalPython" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_q84_one_scan_one_agg_no_expand(spark):
    """q84_quantile_approx: both the exact and the GK-sketch buffers
    ride ONE aggregation over ONE scan — no second pass for the
    approx twin, no distinct-rewrite Expand."""
    plan = _plan(spark, "q84_quantile_approx")
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan, plan

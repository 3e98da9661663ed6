"""Graph algorithms beyond connected components: PageRank.

The second iterative graph operator (``dedup.connected_components``
being the first), built on the same scale discipline: per-round
lineage cuts via lazy ``localCheckpoint`` with eager RDD-block
release, edges hash-partitioned once and reused every round, and —
because the iteration count is FIXED — **zero driver actions inside
the loop**: the whole power iteration materializes in the single
action that consumes the result.

Reference parity: no counterpart in the reference (its surface is the
zarr data-access layer); this extends the beyond-reference pipeline
operators (link-graph quality scoring is a standard web-corpus
curation signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table
from cae_polars_tools_spark.operators.dedup import (
    _release_on_gc,
    _release_round_frame,
)
from cae_polars_tools_spark.plans.registry import register

PR_ITERS = 8
PR_DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 0,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Power-iteration PageRank over a (multi-)edge list → one
    ``(node, rank)`` row per node appearing as a source or
    destination. Multi-edges count with multiplicity; dangling-node
    mass is NOT redistributed (documented convention, mirrored
    exactly by the SQL oracle), so ranks sum to 1 only on graphs
    without dangling nodes.

    Scale shape: edges are hash-partitioned on ``src`` ONCE and
    cached — each round's contribution join re-shuffles only the
    (node, rank) frame, exactly like the components loop. Unlike that
    loop, each round references the previous frame exactly ONCE, so
    the logical plan grows LINEARLY (no lineage cut needed) and the
    fixed iteration count means ZERO driver actions inside the loop —
    the caller's own action runs every chained round in one job
    pipeline. The single up-front ``count`` sizes the uniform prior
    (node count — bounded, not corpus-sized).

    ``checkpoint_every`` > 0 inserts an EAGER localCheckpoint (one
    extra action + the round frame's blocks) every that many rounds,
    releasing the previous cut — use it for iteration counts large
    enough that Catalyst's analysis of the linearly-growing plan
    becomes measurable (~hundreds of rounds); typical PageRank runs
    (≤ 20) should leave it off.

    Strategy pick (the ``connected_components`` pattern): when the
    COLLAPSED weighted edge set fits ``local_threshold`` rows, the
    power iteration runs driver-side in numpy — a few MB and
    microseconds per round vs diameter-many tiny distributed stages
    whose scheduling latency dominates on small graphs. The count
    that picks the strategy is also what materializes the collapse,
    so it is not an extra pass. Same algebra either way; cross-path
    equality is test-pinned.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    # collapse multi-edges to (src, dst, weight) FIRST: the power
    # iteration only ever consumes edge multiplicity, so the rounds
    # run over the collapsed frame — one aggregation of the raw edge
    # list up front instead of rescanning it every round (on a
    # transition graph the collapse is |node|² rows regardless of how
    # many raw transitions produced it)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .repartition("src")
        .persist()
    )
    outdeg = e.groupBy("src").agg(F.sum("w").alias("out_c"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    m = e.count()
    if m == 0:
        e.unpersist()
        nodes.unpersist()
        raise ValueError("pagerank: the edge list is empty")
    if m <= local_threshold:
        try:
            return _pagerank_local(
                edges.sparkSession, e, iters, damping
            )
        finally:
            e.unpersist()
            nodes.unpersist()

    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    prev_cut = None
    for i in range(iters):
        contrib = (
            e.join(outdeg, "src")
            .join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("r") * F.col("w") / F.col("out_c")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
            ).alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            # eager: the cut must MATERIALIZE before the previous one
            # can release (releasing an unmaterialized lazy checkpoint
            # invalidates its storage level and fails the later job)
            ranks = ranks.localCheckpoint(eager=True)
            if prev_cut is not None:
                _release_round_frame(prev_cut)
            prev_cut = ranks
    out = _release_on_gc(ranks.select("node", "r"), e, nodes)
    if prev_cut is not None:
        out = _release_on_gc(out, prev_cut)
    return out


def _pagerank_local(spark, weighted_edges: DataFrame, iters, damping):
    """Driver-side power iteration over a bounded collapsed edge set
    (sorted for run-to-run determinism); identical fixed-point
    algebra to the distributed loop."""
    import numpy as np

    pdf = (
        weighted_edges.toPandas().sort_values(["src", "dst"]).reset_index(
            drop=True
        )
    )
    node_vals = sorted(set(pdf["src"]) | set(pdf["dst"]))
    idx = {v: i for i, v in enumerate(node_vals)}
    n = len(node_vals)
    si = pdf["src"].map(idx).to_numpy()
    di = pdf["dst"].map(idx).to_numpy()
    w = pdf["w"].to_numpy().astype(np.float64)
    out_c = np.zeros(n)
    np.add.at(out_c, si, w)
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iters):
        acc = np.zeros(n)
        np.add.at(acc, di, r[si] * w / out_c[si])
        r = base + damping * acc
    node_type = dict(weighted_edges.dtypes)["src"]
    return spark.createDataFrame(
        [(v, float(r[idx[v]])) for v in node_vals],
        f"node {node_type}, r double",
    )


# ---------------------------------------------------------------------------
# Corpus entry: PageRank over the event-type transition graph
# ---------------------------------------------------------------------------

# edges = consecutive event_type transitions per user (ts, event_id
# total order) — a small-node multi-edge graph whose edge multiplicity
# is part of the semantics
_EDGES_SQL = """
        SELECT prev AS src, event_type AS dst
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        )
        WHERE prev IS NOT NULL
"""


def _pagerank_oracle(iters: int = PR_ITERS, damping: float = PR_DAMPING) -> str:
    """Iteration-unrolled DuckDB twin of the fixed-iteration power
    loop — pr0 .. pr{iters} as chained CTEs, exactly the Spark
    per-round algebra (no dangling redistribution), ROUND(…, 6) as
    the cross-engine contract on the iterated float sums."""
    ctes = [
        f"raw_edges AS ({_EDGES_SQL})",
        # multi-edges collapse to weights FIRST, mirroring the engine's
        # collapsed algebra term for term (r*w/out once, not r/out
        # summed w times — identical mathematically, closer in floats)
        "edges AS (SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w "
        "FROM raw_edges GROUP BY src, dst)",
        "outdeg AS (SELECT src, SUM(w) AS out_c FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT node FROM ("
        "SELECT src AS node FROM edges "
        "UNION ALL SELECT dst FROM edges))",
        "nn AS (SELECT COUNT(*) AS cnt FROM nodes)",
        "pr0 AS (SELECT node, 1.0 / cnt AS r FROM nodes, nn)",
    ]
    for i in range(iters):
        ctes.append(
            f"pr{i + 1} AS ("
            f"SELECT n.node, "
            f"(1 - {damping}) / (SELECT cnt FROM nn) + {damping} * "
            f"COALESCE(SUM(p.r * e.w / o.out_c), 0) AS r "
            f"FROM nodes n "
            f"LEFT JOIN edges e ON e.dst = n.node "
            f"LEFT JOIN pr{i} p ON p.node = e.src "
            f"LEFT JOIN outdeg o ON o.src = e.src "
            f"GROUP BY n.node)"
        )
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + f"\n        SELECT node, ROUND(r, 6) AS rank FROM pr{iters}"
    )


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "extension"),
    window_rank=1,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (consecutive
    event types per user form multi-edges), value-checked against an
    iteration-unrolled DuckDB twin of the same fixed-point algebra —
    a full iterative algorithm under the hash gate, not just a
    rows-only smoke check.

    No ``spread()`` on the scan: every downstream op here is JVM-side
    (window lag, groupBy collapse, joins) — none of the CPU-heavy
    Python kernels spread exists for — so the repartition only added
    an exchange and 32-way task overhead ahead of the window's own
    user_id shuffle (interleaved A/B at sf0.1: 1.21 → 1.02 s median
    without it; identical output, test-pinned semantics unchanged).
    At scale the scan splits past core count by itself."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("dst"),
            F.lag("event_type").over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .select("src", "dst")
    )
    out = pagerank(edges)
    ranked = out.select("node", F.round("r", 6).alias("rank"))
    # chain contract of _release_on_gc: keep pagerank's cached/
    # checkpointed frames alive for the derived frame's lifetime —
    # dropping `out` here would fire the cache-release finalizer and
    # the caller's action would recompute the whole iteration chain
    # (see dedup_canonical_pick, measured 2.6x there)
    ranked._pr_handle = out
    return ranked


# ---------------------------------------------------------------------------
# Triangle counting — degree-ordered orientation (the O(m^1.5) trick)
# ---------------------------------------------------------------------------


def count_triangles(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Per-node triangle counts over an undirected (multi-)edge list →
    ``(node, triangles)`` for every node of the graph.

    The scalable formulation: canonicalize to distinct undirected
    edges, order nodes by the (degree, id) pair — a total order, since
    ids are distinct — orient every edge from the LOWER (degree, id)
    to the higher, enumerate wedges by joining the oriented list with
    itself on the apex, and close each wedge with one more equi-join.
    Orienting by degree bounds every out-neighborhood by ~sqrt(m), so
    wedge fan-out is O(m^1.5) TOTAL regardless of skew — the hub that
    would explode a naive neighbor join has the HIGHEST order and
    therefore out-degree ~0.

    The total order is taken DIRECTLY as lexicographic comparison of
    ``struct(deg, node)`` (Spark struct comparison), never as a
    materialized global rank: a ``row_number`` over an unpartitioned
    window would funnel every node through a single partition — the
    one plan shape that cannot survive a 100x scale-up. With the
    struct comparison the whole pipeline is key-partitioned shuffles
    only (degree agg, two degree-attach joins, wedge join, closing
    join); no SinglePartition exchange, no cartesian anywhere. The
    orientation (and therefore the result) is provably identical to
    the rank formulation because ``row_number() OVER (ORDER BY deg,
    node)`` is monotone in exactly this pair.

    The canonical edge set feeds the degree aggregate AND the
    orientation join, the degree frame feeds both attach joins plus
    the final node roster, and the oriented list is referenced three
    times (both wedge legs and the closing probe) — Catalyst inlines
    each reference into an independent subtree (no ReusedExchange
    across them), so an expensive upstream edge derivation would
    execute once PER REFERENCE. All three are therefore persisted
    (O(m), O(n), O(m) respectively — each no bigger than the input
    edge list), released via the ``_release_on_gc`` finalizer chain."""
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).filter(F.col("u") != F.col("v"))
    und = (
        e.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        .persist()
    )
    # AQE-style strategy pick (the kcore/pagerank convention): a
    # distinct undirected edge set at or under ``local_threshold``
    # counts driver-side in pandas — the SAME orientation + wedge +
    # closing-join algebra, integer-exact either way (cross-path
    # equality is test-pinned). Below the threshold the distributed
    # plan is five key-partitioned shuffles whose per-task overhead
    # dwarfs the data (measured at sf0.1: 121k edges, 19k nodes →
    # 1946 tasks, 17.5 executor-CPU core-s, ~9 ms/task of pure fixed
    # cost); a few MB of edges merge in milliseconds locally. The
    # count that picks the strategy also materializes the cache
    # before its multiple distributed consumers can race it.
    n_und = und.count()
    if n_und <= local_threshold:
        out = _triangles_local(edges.sparkSession, und)
        und.unpersist()
        return out
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # (degree, id) is already a total order (ids distinct within an
    # edge list), so orientation is a DAG — compare the pair directly
    # with lexicographic struct comparison instead of materializing a
    # row_number over an unpartitioned window (which would be a
    # SinglePartition exchange: every node through one task).
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    keyed = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.struct(F.col("dega").alias("d"), F.col("a").alias("n")).alias("ka"),
            F.struct(F.col("degb").alias("d"), F.col("b").alias("n")).alias("kb"),
        )
    )
    a_first = F.col("ka") < F.col("kb")
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("kb")).otherwise(F.col("ka")).alias("khi"),
    ).persist()
    o1 = oriented.select(
        F.col("lo").alias("apex"),
        F.col("hi").alias("x"),
        F.col("khi").alias("kx"),
    )
    o2 = oriented.select(
        F.col("lo").alias("apex"),
        F.col("hi").alias("y"),
        F.col("khi").alias("ky"),
    )
    wedges = o1.join(o2, "apex").filter(F.col("kx") < F.col("ky"))
    closing = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("apex", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return _release_on_gc(
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        ),
        und,
        deg,
        oriented,
    )


def _triangles_local(spark, und: DataFrame) -> DataFrame:
    """Driver-side twin of the distributed triangle count over a
    bounded distinct undirected edge set: identical (degree, id)
    orientation, wedge enumeration and closing probe, fully
    vectorized in numpy — integer-exact, so the two paths agree row
    for row (test-pinned). Output sorted by node for run-to-run
    determinism (the ``_kcore_local`` convention)."""
    import numpy as np
    import pandas as pd

    pdf = und.toPandas()
    node_type = dict(und.dtypes)["a"]
    schema = f"node {node_type}, triangles long"
    if not len(pdf):
        return spark.createDataFrame([], schema)
    # factorize endpoints to dense 0..n-1 ids over the SORTED node
    # roster, so the dense id order equals the node-id order and the
    # (deg, dense-id) pair ranks exactly like the distributed
    # struct(deg, node) comparison
    a_raw = pdf["a"].to_numpy()
    b_raw = pdf["b"].to_numpy()
    nodes = np.unique(np.concatenate([a_raw, b_raw]))
    a = np.searchsorted(nodes, a_raw)
    b = np.searchsorted(nodes, b_raw)
    n = len(nodes)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    # orient from the LOWER (deg, id) to the higher; encode each
    # (deg, id) pair as one int64 rank key (deg * n + id — ids are
    # < n, so the key is exactly lexicographic)
    ka = deg[a].astype(np.int64) * n + a
    kb = deg[b].astype(np.int64) * n + b
    a_first = ka < kb  # ids distinct within an edge: never equal
    lo = np.where(a_first, a, b)
    hi = np.where(a_first, b, a)
    khi = np.where(a_first, kb, ka)
    # group oriented edges by apex (lo); enumerate ordered pairs of
    # out-neighbors per apex with the repeat/arange group-pairs trick
    order = np.argsort(lo, kind="stable")
    lo_s, hi_s, khi_s = lo[order], hi[order], khi[order]
    grp_counts = np.bincount(lo_s, minlength=n)
    starts = np.concatenate([[0], np.cumsum(grp_counts)[:-1]])
    reps = grp_counts[lo_s]  # pairs per left-edge = its apex out-deg
    x_idx = np.repeat(np.arange(len(lo_s)), reps)
    within = np.arange(len(x_idx)) - np.repeat(
        np.cumsum(np.concatenate([[0], reps[:-1]])), reps
    )
    y_idx = starts[lo_s[x_idx]] + within
    keep = khi_s[x_idx] < khi_s[y_idx]  # ordered wedge: kx < ky
    wx, wy, wapex = hi_s[x_idx[keep]], hi_s[y_idx[keep]], lo_s[x_idx[keep]]
    # close each wedge: (wx, wy) must be an oriented edge — one
    # sorted-key membership probe (ids < n, so lo * n + hi is unique)
    edge_keys = np.sort(lo.astype(np.int64) * n + hi)
    probe = wx.astype(np.int64) * n + wy
    pos = np.searchsorted(edge_keys, probe)
    pos[pos == len(edge_keys)] = 0
    closed = edge_keys[pos] == probe
    tri_nodes = np.concatenate([wapex[closed], wx[closed], wy[closed]])
    counts = np.bincount(tri_nodes, minlength=n).astype(np.int64)
    out = pd.DataFrame({"node": nodes, "triangles": counts})
    return spark.createDataFrame(out, schema)


# Parts co-purchased within one order, over the keyed 1/10 order
# sample (l_orderkey % 10 — deterministic, SQL-restatable, and the
# fraction is scale-invariant). The PART graph stays sparse as data
# grows (parts scale with SF; the supplier graph went complete at
# sf0.01 and wedge-heavy at sf0.1 — measured 21 s/round).
_TRI_EDGES_SQL = """
        SELECT DISTINCT LEAST(x.l_partkey, y.l_partkey) AS a,
                        GREATEST(x.l_partkey, y.l_partkey) AS b
        FROM lineitem x
        JOIN lineitem y ON x.l_orderkey = y.l_orderkey
                       AND x.l_partkey != y.l_partkey
        WHERE x.l_orderkey % 10 = 0
"""


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """k-core decomposition by iterative peeling → ``(node,
    core_degree)`` for every node of the maximal subgraph in which
    each member keeps ≥ k neighbors — the standard graph-cohesion
    screen (spam/bot rings, community nuclei, junk-node pruning
    before expensive per-node work).

    Formulation: canonicalize to distinct undirected edges,
    symmetrize (both directions), then repeat {degree aggregate →
    keep nodes with deg ≥ k → two semi-joins drop edges touching a
    peeled node} until the edge count stops changing. Peeling is
    monotone, so the fixed point is THE k-core (order-independent —
    the classic invariant) and round r+1 after convergence is a
    no-op, which is what lets a fixed-unroll SQL oracle mirror a
    data-dependent loop.

    Scale shape: each round is one map-side-combined degree aggregate
    plus two key-partitioned semi-joins — no driver-side graph, no
    cartesian; the one driver action per round is the edge count that
    doubles as the convergence test (the connected-components
    convention). Rounds are bounded by peel depth, which is small on
    real graphs (≤5 across this corpus's scales, measured); raises
    loudly if ``max_iters`` rounds don't converge rather than
    returning a half-peeled graph.

    AQE-style strategy pick (the pagerank convention): a distinct
    undirected edge set at or under ``local_threshold`` peels
    driver-side in plain Python — per-round scheduling latency
    dominates tiny graphs (measured 24.9 s → ~1 s at sf0.1) — and the
    two paths are equality-tested against each other. The count that
    picks the path is the same single action the distributed loop
    needs anyway."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    und = (
        e.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
    )
    und = und.persist()
    n_und = und.count()
    if n_und <= local_threshold:
        out = _kcore_local(edges.sparkSession, und, k, max_iters)
        und.unpersist()
        return out
    from cae_polars_tools_spark.operators.dedup import (
        _release_on_gc,
        _release_round_frame,
    )

    # LAZY localCheckpoint, not persist: every round references `cur`
    # TWICE (the degree aggregate feeding `keep` AND the edge frame
    # being filtered), so an un-truncated lineage would double the
    # logical plan per round — driver heap OOM by round ~8 (measured;
    # the connected-components loop documents the same trap). The
    # round's count action is what materializes each checkpoint.
    cur = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    n_prev = cur.count()
    # only NOW is the symmetrized frame materialized from und's
    # cache — unpersisting und before this count would recompute the
    # expensive distinct-undirected-edge stage from source
    und.unpersist()
    converged = False
    # max_iters + 1: the loop needs one extra no-op round to OBSERVE
    # convergence (n == n_prev), so max_iters counts edge-removing
    # rounds — the same contract as the local path's drop-empty check
    for _ in range(max_iters + 1):
        keep = (
            cur.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("a")
        )
        nxt = (
            cur.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
        n = nxt.count()
        _release_round_frame(cur)
        cur = nxt
        if n == n_prev:
            converged = True
            break
        n_prev = n
    if not converged:
        _release_round_frame(cur)
        raise ValueError(
            f"kcore: no fixed point within {max_iters} rounds — "
            "raise max_iters (deep peel chains) or check the graph"
        )
    out = cur.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )
    # `out` projects the final round's checkpointed frame: release its
    # blocks when the result is garbage-collected
    return _release_on_gc(out, cur)


def _kcore_local(spark, und: DataFrame, k: int, max_iters: int) -> DataFrame:
    """Driver-side peel over a bounded distinct undirected edge set —
    identical fixed point to the distributed loop (peeling is
    order-independent), same ``max_iters`` refusal so the loud-
    divergence contract holds on both paths.

    Round counting matches the distributed EDGE-FRAME view exactly:
    a node whose last edge disappears is purged within the same round
    (an edgeless node is invisible to an edge list and, for k ≥ 1,
    can never rejoin the core), so both paths count the same number
    of edge-removing rounds — boundary-parity-tested."""
    pdf = und.toPandas()
    adj: dict = {}
    for a, b in zip(pdf["a"], pdf["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    converged = False
    for _ in range(max_iters + 1):
        drop = [n for n, s in adj.items() if len(s) < k]
        if not drop:
            converged = True
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
        for n in [n for n, s in adj.items() if not s]:
            del adj[n]  # isolated: edge-frame-invisible, never core
    if not converged:
        raise ValueError(
            f"kcore: no fixed point within {max_iters} rounds — "
            "raise max_iters (deep peel chains) or check the graph"
        )
    node_type = dict(und.dtypes)["a"]
    return spark.createDataFrame(
        sorted((n, len(s)) for n, s in adj.items()),
        f"node {node_type}, core_degree long",
    )


KCORE_K = 5
#: oracle unroll depth; peel converges in ≤5 rounds across this
#: corpus's scales (measured sf0.001–0.1) and the entry passes
#: max_iters=this so any deeper peel fails LOUDLY instead of
#: diverging from the oracle
KCORE_ORACLE_ROUNDS = 8


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ORACLE_ROUNDS) -> str:
    """Fixed-unroll SQL twin of the peel loop: each round recomputes
    degrees and keeps ≥k edges-at-both-ends; post-convergence rounds
    are no-ops, so unrolling past the real depth is safe."""
    parts = [
        "e0 AS MATERIALIZED (SELECT a, b FROM und "
        "UNION ALL SELECT b, a FROM und)"
    ]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT a FROM {prev} "
            f"GROUP BY a HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b FROM {prev} e "
            f"JOIN k{i} x ON e.a = x.a JOIN k{i} y ON e.b = y.a)"
        )
        prev = f"e{i}"
    return (
        f"WITH und AS MATERIALIZED ({_TRI_EDGES_SQL}),\n"
        + ",\n".join(parts)
        + f"\nSELECT a AS node, CAST(COUNT(*) AS BIGINT) AS core_degree "
        f"FROM {prev} GROUP BY a"
    )


@register(
    "graph_kcore",
    oracle=_kcore_oracle(),
    tags=("graph", "extension"),
    window_rank=1,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-core of the part co-purchase graph (same keyed 1/10 order
    sample as graph_triangles): the maximal subgraph where every part
    co-occurs with ≥5 other core parts — cohesion pruning before
    per-node analytics. The oracle unrolls the peel loop to a fixed
    depth; the entry caps the Spark loop at the same depth, so a
    graph needing a deeper peel fails loudly on BOTH sides instead of
    silently diverging.

    No ``spread()``: the edge build is JVM-only (broadcast self-join
    + distinct) — see graph_pagerank; A/B 1.72 → 1.40 s median."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_orderkey") % 10) == 0)
        .select("l_orderkey", "l_partkey")
    )
    x = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
    )
    y = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
    )
    edges = (
        x.join(y, "ok")
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
    )
    return kcore(
        edges, KCORE_K, src="u", dst="v", max_iters=KCORE_ORACLE_ROUNDS
    )


def _triangles_oracle() -> str:
    return f"""
        WITH und AS MATERIALIZED ({_TRI_EDGES_SQL}),
        deg AS MATERIALIZED (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT a AS node FROM und
                UNION ALL SELECT b FROM und
            ) GROUP BY node
        ),
        rk AS MATERIALIZED (
            SELECT node, ROW_NUMBER() OVER (ORDER BY deg, node) AS rk
            FROM deg
        ),
        oriented AS MATERIALIZED (
            SELECT CASE WHEN ra.rk < rb.rk THEN u.a ELSE u.b END AS lo,
                   CASE WHEN ra.rk < rb.rk THEN u.b ELSE u.a END AS hi,
                   LEAST(ra.rk, rb.rk) AS rlo,
                   GREATEST(ra.rk, rb.rk) AS rhi
            FROM und u
            JOIN rk ra ON ra.node = u.a
            JOIN rk rb ON rb.node = u.b
        ),
        tri AS MATERIALIZED (
            SELECT o1.apex, o1.x, o2.y
            FROM (SELECT lo AS apex, hi AS x, rhi AS rx FROM oriented) o1
            JOIN (SELECT lo AS apex, hi AS y, rhi AS ry FROM oriented) o2
              ON o1.apex = o2.apex AND o1.rx < o2.ry
            JOIN (SELECT lo AS x, hi AS y FROM oriented) c
              ON c.x = o1.x AND c.y = o2.y
        )
        SELECT d.node,
               CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles
        FROM deg d
        LEFT JOIN (
            SELECT node, COUNT(*) AS triangles FROM (
                SELECT apex AS node FROM tri
                UNION ALL SELECT x FROM tri
                UNION ALL SELECT y FROM tri
            ) GROUP BY node
        ) t USING (node)
    """


@register(
    "graph_triangles",
    oracle=_triangles_oracle(),
    tags=("graph", "extension"),
    window_rank=1,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-purchase graph (parts
    sharing an order are adjacent; keyed 1/10 order sample) — the
    classic cohesion signal, computed with the degree-ordered
    orientation that keeps wedge fan-out O(m^1.5) under ANY skew.
    Value-checked: the oracle re-derives the same graph, ranking,
    orientation and closing joins in SQL (integer-exact end to end).

    No ``spread()``: the edge build is JVM-only (broadcast self-join
    + distinct) — see graph_pagerank; A/B 1.90 → 1.31 s median."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_orderkey") % 10) == 0)
        .select("l_orderkey", "l_partkey")
    )
    x = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
    )
    y = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
    )
    edges = (
        x.join(y, "ok")
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
    )
    return count_triangles(edges, src="u", dst="v")

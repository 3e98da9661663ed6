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

from cae_polars_tools_spark.io import read_table, spread
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
    rows-only smoke check."""
    ev = spread(read_table(spark, sf_dir, "events"))
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
    return out.select("node", F.round("r", 6).alias("rank"))

"""Plan diagnostics: the 100 TB plan audit as a library call.

``tests/test_plan_quality.py`` pins the engine's own plans in CI; this
module gives USERS the same instrument for theirs. ``plan_report``
summarizes the physical-plan properties that decide the cluster bill —
exchanges (how many, partitioned how), join strategies, scan pushdown
(filters + pruned schema), whole-stage-codegen coverage, and which
stages drop to Python — and ``assert_scale_safe`` turns a policy over
those properties into a loud failure, so a pipeline can gate its own
deploys the way this repo's CI gates refactors.

Everything is parsed from Spark's own plan strings (``executedPlan``
and the ``formatted`` explain) — no private APIs beyond ``_jdf``, no
execution triggered.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from typing import Any

from pyspark.sql import DataFrame

_PY_STAGES = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandasWithState",
)


def _physical(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_report(
    df: DataFrame, after_execution: bool = False
) -> dict[str, Any]:
    """Summarize a DataFrame's physical plan. Keys:

    * ``n_exchanges`` / ``exchanges`` — *shuffle* count and each
      exchange's partitioning (hash/range/round-robin/single; broadcast
      exchanges are reported separately — they replicate a small side,
      they don't repartition the big one);
    * ``n_broadcast_exchanges`` — broadcast-side exchanges;
    * ``joins`` — counts per strategy (broadcast_hash, sort_merge,
      shuffled_hash, broadcast_nested_loop, cartesian);
    * ``scans`` — per file scan: format, pushed filters, read schema
      (the pruning evidence);
    * ``codegen_stage_count`` — whole-stage-codegen spans (``None``
      before the first action under AQE, which finalizes the physical
      plan only at execution — run the query, then re-report);
    * ``python_stages`` — stages that leave the JVM (Arrow-batched
      pandas UDF nodes etc.);
    * ``has_cartesian`` — convenience flag.

    With ``after_execution=True`` the report describes the FINAL plan —
    the one that actually ran: if AQE has not yet finalized this
    DataFrame's plan, the physical plan is executed once cluster-side
    (``executedPlan().execute().count()`` on the JVM — no rows are
    collected to the driver) so the adaptive re-plan materializes, then
    the report is taken from it. On an already-executed DataFrame this
    is free.
    """
    if after_execution:
        qe = df._jdf.queryExecution()
        probe = qe.executedPlan().toString()
        if "isFinalPlan=false" in probe:
            # run the plan once, executor-side only, to let AQE finalize
            qe.executedPlan().execute().count()
    plan = _physical(df)
    fmt = _formatted(df)

    exchanges = []
    # shuffle exchanges print as "Exchange hashpartitioning(...)",
    # "Exchange rangepartitioning(...)", "Exchange RoundRobinPartitioning(n)"
    # or — with NO parenthesized detail — "Exchange SinglePartition", the
    # global single-partition shuffle this audit most needs to catch. The
    # leading lookbehind keeps BroadcastExchange / ReusedExchange nodes out
    # of the shuffle count (reported separately below).
    for m in re.finditer(r"(?<![A-Za-z])Exchange (\w+)(?:\(([^)]*)\))?", plan):
        kind = m.group(1)
        exchanges.append(
            {
                "partitioning": kind,
                "detail": (m.group(2) or "")[:120],
            }
        )
    joins = {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
    }
    scans = []
    for seg in fmt.split("Scan ")[1:]:
        head = seg.split("\n", 1)[0]
        fmt_name = head.split(" ", 1)[0]
        pushed = re.search(r"PushedFilters: (\[[^\]]*\])", seg)
        schema = re.search(r"ReadSchema: (\S+)", seg)
        scans.append(
            {
                "format": fmt_name,
                "pushed_filters": pushed.group(1) if pushed else None,
                "read_schema": schema.group(1)[:200] if schema else None,
            }
        )
    python_stages = sorted(
        {name for name in _PY_STAGES if name in plan}
    )
    # under AQE the codegen stage markers (*(n)) only appear in the
    # FINAL plan, i.e. after an action has run; before that the
    # coverage is genuinely unknown — report None, not 0
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    if codegen == 0 and "isFinalPlan=false" in plan:
        codegen = None
    return {
        "n_exchanges": len(exchanges),
        "exchanges": exchanges,
        "n_broadcast_exchanges": plan.count("BroadcastExchange"),
        "joins": joins,
        "scans": scans,
        "codegen_stage_count": codegen,
        "python_stages": python_stages,
        "has_cartesian": joins["cartesian"] > 0,
    }


def assert_scale_safe(
    df: DataFrame,
    max_exchanges: int | None = None,
    forbid_cartesian: bool = True,
    forbid_sort_merge: bool = False,
    require_pushed_filters: bool = False,
    forbid_python: bool = False,
) -> dict[str, Any]:
    """Policy gate over :func:`plan_report`; raises ``AssertionError``
    with the offending report. Returns the report when the plan
    passes, so callers can log it."""
    rep = plan_report(df)
    problems = []
    if forbid_cartesian and rep["has_cartesian"]:
        problems.append("plan contains a cartesian product")
    if max_exchanges is not None and rep["n_exchanges"] > max_exchanges:
        problems.append(
            f"{rep['n_exchanges']} exchanges > allowed {max_exchanges}"
        )
    if forbid_sort_merge and rep["joins"]["sort_merge"]:
        problems.append("sort-merge join present (expected broadcast)")
    if require_pushed_filters and not any(
        s["pushed_filters"] not in (None, "[]") for s in rep["scans"]
    ):
        problems.append("no scan carries pushed filters")
    if forbid_python and rep["python_stages"]:
        problems.append(f"python stages present: {rep['python_stages']}")
    if problems:
        raise AssertionError(
            "plan is not scale-safe: "
            + "; ".join(problems)
            + f"\nreport: {rep}"
        )
    return rep

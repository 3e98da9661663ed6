"""Skew-handling aggregation: two-phase salted groupBy.

AQE's skew handling covers JOINS (``spark.sql.adaptive.skewJoin``,
on in this engine's session, session.py:52) but not aggregations: a
``groupBy(key)`` where one key holds 30% of a 100 TB table sends 30 TB
through a single reducer no matter how many executors exist — the
classic hot-key stall. The standard fix is salting: aggregate on
``(key, salt)`` first (fans the hot key over ``salt_buckets``
reducers), then merge the per-salt partials with a second, tiny
aggregation keyed on ``key`` alone.

Only algebraic aggregates decompose this way (partial per salt +
exact merge): sum / count / min / max, and avg as sum÷count. That is
the same decomposability contract Spark's own partial aggregation
relies on — this operator simply inserts one more partial level that
partial-aggregation cannot provide, because map-side combine still
funnels every (mapper, hot-key) partial into ONE reducer.

When to use: only when one group key is pathologically hot AND the
group count is small enough that map-side combine stops helping.
For uniform keys the extra shuffle is pure overhead — measure first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate name → (phase-1 partial builder, phase-2 merge builder)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``metrics`` maps output column name → ``(input_col, fn)`` with
    ``fn`` one of ``sum | count | min | max | avg``. Results are
    EXACTLY equal to the unsalted ``df.groupBy(keys).agg(...)`` —
    salting changes the physical route, not the algebra.

    The salt is ``pmod(hash(input_col ...), salt_buckets)`` over the
    metric inputs — deterministic per ROW (safe under task retry /
    speculation, unlike ``rand()``), yet spreading a hot key's rows
    across buckets because the hash ranges over the non-key values.
    """
    bad = [f for _, (_, f) in metrics.items() if f not in (*_ALGEBRAIC, "avg")]
    if bad:
        raise ValueError(
            f"non-algebraic aggregate(s) {bad!r}: salting needs "
            "partial+merge decomposability (sum/count/min/max/avg)"
        )

    # phase 1: per-(key, salt) partials. avg decomposes to sum+count.
    partials: list[Column] = []
    merges: list[Column] = []
    finals: list[Column] = []
    for out, (col, fn) in metrics.items():
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"__s_{out}"),
                F.count(col).alias(f"__c_{out}"),
            ]
            merges += [
                F.sum(f"__s_{out}").alias(f"__s_{out}"),
                F.sum(f"__c_{out}").alias(f"__c_{out}"),
            ]
            finals.append(
                (F.col(f"__s_{out}") / F.col(f"__c_{out}")).alias(out)
            )
        else:
            part, merge = _ALGEBRAIC[fn]
            partials.append(part(col).alias(f"__p_{out}"))
            merges.append(merge(f"__p_{out}").alias(out))
            finals.append(F.col(out))

    salt_inputs = [F.col(c) for c, _ in metrics.values()]
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*salt_inputs, F.lit(seed)), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(*partials)
    phase2 = phase1.groupBy(*keys).agg(*merges)
    return phase2.select(*keys, *finals)


__all__ = ["salted_agg"]

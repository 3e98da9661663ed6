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


#: join types where the salted rewrite is exactly equivalent: the
#: SMALL side is replicated, so only big-side-preserving joins qualify
#: (an unmatched small-side row would otherwise surface once per salt).
_SALTABLE_JOINS = ("inner", "left", "leftouter", "left_outer",
                   "semi", "leftsemi", "left_semi",
                   "anti", "leftanti", "left_anti")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    seed: int = 42,
    how: str = "inner",
    join_hint: str | None = "shuffle_hash",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Salted equi-join for hot keys the optimizer cannot fix.

    AQE's skew-join handling splits oversized partitions AFTER a
    sort-merge join has already shuffled both sides — and it cannot
    help when the skewed side feeds a downstream agg that reuses the
    same partitioning, or when the join is planned as a shuffled hash
    join on a key whose single hottest value exceeds an executor. The
    classic rewrite: replicate the SMALL side once per salt bucket
    (an explode, no shuffle yet), give each BIG row a deterministic
    row-local salt, and join on ``(key…, salt)`` — the hot key's rows
    now land on ``salt_buckets`` reducers instead of one.

    Exactly equivalent to ``big.join(small, on, how)`` for big-side-
    preserving joins (inner / left / left_semi / left_anti): a big row
    carries ONE salt, so it meets exactly one replica of each matching
    small row; unmatched big rows stay unmatched in every salt. Right/
    full joins would emit unmatched small rows once per replica and
    are rejected.

    The salt is ``pmod(xxhash64(salt_cols…, seed), buckets)`` —
    deterministic per ROW (safe under task retry and speculation,
    unlike ``rand()``), yet spreading a hot join key because it ranges
    over the non-key values too. ``salt_cols`` defaults to every
    non-MapType big column (xxhash64 cannot consume maps). CAVEAT:
    rows that are IDENTICAL across the salt columns hash to one salt
    — a hot key made of verbatim duplicate rows would still stall one
    reducer; pass a unique row id (or any high-cardinality column) as
    ``salt_cols`` there. Cost: the small side shuffles
    ``salt_buckets``× its size — use only when the small side is too
    big to broadcast AND a hot key demonstrably stalls the plain join;
    for a broadcast-able small side, ``F.broadcast`` is strictly
    better (no shuffle at all).

    ``join_hint`` (default ``"shuffle_hash"``) pins the physical
    strategy to a shuffled join on ``(key…, salt)`` — the plan this
    operator exists to produce. Left to itself, Catalyst broadcasts
    any under-threshold replicated side, and a broadcast join has no
    reducer for the salt to spread (the salting becomes pure
    overhead); at the scales where salting is warranted the small
    side exceeds the broadcast threshold anyway, so the hint only
    matters for making small-scale plans faithful to the large-scale
    shape. Pass ``None`` to let Catalyst choose freely.
    """
    if how not in _SALTABLE_JOINS:
        raise ValueError(
            f"salted_join: how={how!r} is not big-side-preserving; "
            "replicating the small side breaks right/full/cross joins"
        )
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    missing = [k for k in on if k not in big.columns or k not in small.columns]
    if missing:
        raise ValueError(f"join key(s) {missing!r} absent from a side")
    if salt_cols is None:
        salt_cols = [
            f.name
            for f in big.schema.fields
            if not f.dataType.typeName().startswith("map")
        ]
        if not salt_cols:
            raise ValueError(
                "salted_join: every big-side column is a MapType, which "
                "xxhash64 cannot consume — pass salt_cols explicitly"
            )
    else:
        absent = [c for c in salt_cols if c not in big.columns]
        if absent:
            raise ValueError(f"salt_cols {absent!r} absent from the big side")

    salted_big = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols], F.lit(seed)),
            F.lit(salt_buckets),
        ),
    )
    # sequence over longs so the exploded salt's type matches the
    # big side's pmod(xxhash64) long without an implicit cast (a
    # generator expression cannot be wrapped in cast() directly)
    replicated = small.withColumn(
        "__salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long")
            )
        ),
    )
    if join_hint is not None:
        replicated = replicated.hint(join_hint)
    joined = salted_big.join(replicated, [*on, "__salt"], how)
    return joined.drop("__salt")


__all__ = ["salted_agg", "salted_join"]

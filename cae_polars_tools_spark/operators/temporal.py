"""Temporal operators: as-of join and banded range join.

The reference has no temporal joins (SURVEY.md §2.2 "ABSENT": only
inner equi-join), but a training-data pipeline over event streams
needs point-in-time correctness ("the most recent feature value at or
before this label's timestamp"). Spark has no native as-of join, so
this implements one as a composition of built-in operators — the
union + carry-forward-window merge:

1. Tag left rows ``_side=1`` and right rows ``_side=0``; union them on
   a common schema (each side padded with typed nulls for the other
   side's columns).
2. One window pass per key, ordered by ``(on, _side)``, carries the
   last right *row* forward as a single struct
   (``last(struct, ignorenulls=True)`` over an unbounded-preceding
   frame) — one atomic pick, so genuinely-NULL attributes inside the
   matched right row are preserved rather than back-filled from an
   older row.
3. Keep only left rows: each now holds the right row with the
   greatest ``on`` ≤ its own (ties included, because right sorts
   before left at equal ``on``) — exactly DuckDB/pandas ``ASOF JOIN``
   / ``merge_asof`` backward semantics, as a LEFT join (no match ⇒
   nulls).

Scale shape: ONE shuffle per side (the window's hash partitioning on
the key) and a per-key sort — identical cost to a sort-merge join,
with no range-explosion risk at any skew, unlike the
``l.ts BETWEEN r.ts AND r.ts + tol`` range-join formulation whose
candidate fan-out is unbounded. Per-key state during the scan is one
row of carried attributes.

Determinism: if the right side has several rows at the same
``(by, on)`` the carried winner is tie-ambiguous; pre-aggregate the
right side to unique ``(by, on)`` (the corpus entry uses
``max_by(·, event_id)``) the same way DuckDB's ASOF demands a unique
ordering key for reproducible output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table
from cae_polars_tools_spark.plans.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of LEFT join. ``direction="backward"`` (default): for each
    left row, attach the right row of the same ``by`` key with the
    greatest ``on`` value ≤ the left row's (equal values match) —
    point-in-time feature lookup. ``direction="forward"``: the right
    row with the SMALLEST ``on`` ≥ the left row's — time-to-next-event
    attribution. Same machinery either way: the window order places
    right rows on the matching side of equal-``on`` left rows and the
    carry flips between last-over-preceding and first-over-following.
    Right columns other than ``on``/``by`` are carried through under
    their own names — rename before calling on collision; the matched
    right ``on`` value is returned as ``matched_<on>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be backward/forward, "
            f"got {direction!r}"
        )
    matched = f"matched_{on}"
    l_other = [c for c in left.columns if c not in (on, by)]
    r_other = [c for c in right.columns if c not in (on, by)]
    r_carry = r_other + [matched]
    l_types = dict(left.dtypes)

    # The right columns travel as ONE struct so a single
    # last(ignorenulls) picks the whole matched row atomically —
    # carrying each column independently would back-fill a genuinely
    # NULL right attribute from an *older* right row, silently mixing
    # rows (DuckDB/pandas ASOF never do).
    r_struct = F.struct(
        *[F.col(c) for c in r_other], F.col(on).alias(matched)
    )
    struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    lu = left.select(
        by,
        on,
        F.lit(1).alias("_side"),
        *[F.col(c) for c in l_other],
        F.lit(None).cast(struct_type).alias("_r"),
    )
    ru = right.select(
        by,
        on,
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in l_other],
        r_struct.alias("_r"),
    )
    if direction == "backward":
        # right (_side=0) sorts BEFORE left at equal `on`, so equal
        # timestamps match; carry the last right row forward
        w = (
            Window.partitionBy(by)
            .orderBy(on, "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_r", ignorenulls=True).over(w)
    else:
        # forward: right sorts AFTER left at equal `on` (so equal
        # timestamps still match) and the FIRST right row at-or-after
        # carries backward
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("_r", ignorenulls=True).over(w)
    return (
        lu.unionByName(ru)
        .select(
            by,
            on,
            "_side",
            *l_other,
            *[carried[c].alias(c) for c in r_carry],
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


@register(
    "q30_asof_join",
    oracle="""
        WITH l AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
            FROM events WHERE event_type = 'purchase'
        ), r AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   MAX(event_id) AS prior_event_id,
                   max_by(value, event_id) AS prior_value
            FROM events WHERE event_type = 'click' GROUP BY 1, 2
        )
        SELECT l.event_id, l.user_id, l.ts_us, l.value,
               r.prior_event_id, r.prior_value,
               r.ts_us AS matched_ts_us
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
    """,
    tags=("temporal", "extension", "asof-join"),
)
def q30_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time attribution: each purchase event joined to the
    same user's most recent click at or before it (nulls when none).
    Timestamps compared as epoch microseconds in both engines, and the
    right side is pre-aggregated to unique (user, ts) with
    ``max_by(·, event_id)`` so the as-of winner is deterministic.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(
            F.max("event_id").alias("prior_event_id"),
            F.max_by("value", "event_id").alias("prior_value"),
        )
    )
    return asof_join(left, right, on="ts_us", by="user_id")


@register(
    "q82_asof_forward",
    oracle="""
        WITH l AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
            FROM events WHERE event_type = 'click'
        ), r AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   MAX(event_id) AS next_event_id,
                   max_by(value, event_id) AS next_value
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        )
        SELECT l.event_id, l.user_id, l.ts_us, l.value,
               r.next_event_id, r.next_value,
               r.ts_us AS matched_ts_us
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts_us <= r.ts_us
    """,
    tags=("temporal", "extension", "asof-join"),
    window_rank=1,
)
def q82_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion attribution — the FORWARD as-of direction
    q30 left open: each click joined to the same user's next purchase
    at or after it (nulls when the user never converts). Identical
    scale shape to the backward join (one window shuffle per side, no
    range fan-out); DuckDB's native ASOF with the flipped inequality
    is the oracle."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(
            F.max("event_id").alias("next_event_id"),
            F.max_by("value", "event_id").alias("next_value"),
        )
    )
    return asof_join(
        left, right, on="ts_us", by="user_id", direction="forward"
    )


# ---------------------------------------------------------------------------
# Banded range join
# ---------------------------------------------------------------------------


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    window: int,
) -> DataFrame:
    """Inner range join: pairs where ``right.on`` ∈ [``left.on``,
    ``left.on + window``] for the same ``by`` key, executed as a
    *banded* equi-join so it shuffles and probes like an ordinary hash
    join at any scale.

    Naive formulations (`l.t <= r.t AND r.t <= l.t + W` as a join
    condition) degenerate to a per-key nested loop — unbounded fan-out
    under skew. Instead the time axis is cut into ``window``-sized
    bands: a right row in [t, t+W] lands in band(t) or band(t)+1, so
    each left row explodes to exactly TWO (key, band) candidates,
    equi-joins on them, and an exact BETWEEN filter keeps true pairs.
    Cost: one 2×-left + 1×-right shuffle on (by, band) — candidate
    count is bounded by band co-occupancy, never |L|×|R| per key.

    Column collisions: both sides keep their own columns; rename
    before calling if names overlap (``on``/``by`` come from the left
    row and the right ``on`` is returned as ``matched_<on>``).
    """
    matched = f"matched_{on}"
    band_l = F.explode(
        F.array(
            F.floor(F.col(on) / window).cast("long"),
            (F.floor(F.col(on) / window) + 1).cast("long"),
        )
    ).alias("_band")
    lu = left.select(F.col("*"), band_l)
    ru = right.select(
        F.col(by).alias("_rby"),
        F.col(on).alias(matched),
        F.floor(F.col(on) / window).cast("long").alias("_rband"),
        *[F.col(c) for c in right.columns if c not in (on, by)],
    )
    return (
        lu.join(
            ru,
            (F.col(by) == F.col("_rby")) & (F.col("_band") == F.col("_rband")),
        )
        .filter(
            (F.col(matched) >= F.col(on)) & (F.col(matched) <= F.col(on) + window)
        )
        .drop("_band", "_rby", "_rband")
    )


RANGE_WINDOW_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "q34_range_join",
    oracle=f"""
        WITH l AS (
            SELECT event_id AS click_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'click'
        ), r AS (
            SELECT event_id AS error_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'error'
        )
        SELECT l.click_id, r.error_id, l.user_id,
               l.ts_us, r.ts_us AS matched_ts_us,
               r.ts_us - l.ts_us AS gap_us
        FROM l JOIN r ON l.user_id = r.user_id
          AND r.ts_us BETWEEN l.ts_us AND l.ts_us + {RANGE_WINDOW_US}
    """,
    tags=("temporal", "extension", "range-join"),
)
def q34_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors within 30 minutes after a click by the same user —
    the banded equi-join formulation of a time-range join."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts_us"
    )
    right = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts_us"
    )
    return range_join(left, right, on="ts_us", by="user_id", window=RANGE_WINDOW_US).select(
        "click_id",
        "error_id",
        "user_id",
        "ts_us",
        "matched_ts_us",
        (F.col("matched_ts_us") - F.col("ts_us")).alias("gap_us"),
    )

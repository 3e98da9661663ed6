"""Structured Streaming over the events stream.

The reference has no true streaming (its "streaming" is chunked batch
conversion — SURVEY §2.4); this module is the north-star extension:
the same windowed aggregation the batch corpus runs
(``q23_tumbling_window``) executed incrementally with
``readStream`` + event-time watermark, a custom stateful
operator (gap sessionization) via ``applyInPandasWithState``,
watermark-bounded exact dedup, and a stream-stream time-range
attribution join (clicks → purchases) with two-sided watermark state
bounding.

Design: transformations are written once against a DataFrame and work
identically in batch and streaming (the Structured Streaming
contract), so correctness of the streaming path is tested by
equivalence to the oracle-checked batch query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_MIN = 30

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """1-day tumbling-window counts/sums per event type — the exact
    transformation of batch query ``q23_tumbling_window``; pass a
    watermark for incremental execution with bounded state."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table. The parquet stores
    timestamp[us] with isAdjustedToUTC=false; the explicit
    ``TimestampType`` schema reads the stored micros as UTC instants,
    matching the batch reader (io.read_table with
    ``inferTimestampNTZ`` disabled)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def run_windowed_stream(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_events",
) -> DataFrame:
    """Run the windowed aggregation over the file stream with
    Trigger.AvailableNow (process everything, then stop) into a memory
    sink; returns the result table. Complete output mode keeps windows
    queryable; in production this would be ``append`` + a real sink."""
    stream = windowed_counts(stream_events(spark, sf_dir), watermark="1 hour")
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(checkpoint_dir, query_name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication with BOUNDED state — the streaming
    twin of ``dedup_exact``: an at-least-once ingest (Kafka replays,
    file redeliveries) becomes exactly-once downstream by dropping
    re-deliveries of the same key.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    EVICTS entries older than the event-time watermark, so state is
    bounded by (keys per watermark window), not by stream history —
    the property that lets this run forever at ingest scale. Plain
    ``dropDuplicates`` on a stream would grow state without bound.
    A duplicate arriving later than the watermark delay is no longer
    deduplicated — that is the documented, bounded-state trade-off."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def dedup_stream_vs_history(
    docs: DataFrame,
    history_fingerprints: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    fp_col: str = "fp",
) -> DataFrame:
    """Streaming twin of ``dedup_incremental``'s exact stage: an
    arriving document stream deduplicated against an already-clean
    static history AND within itself.

    Two composed patterns:

    * **stream-static left-anti join** on the 16-byte fingerprint —
      the static side (the history's fingerprint column, which a real
      pipeline keeps materialized between cycles) is read fresh per
      micro-batch, so a history update is picked up without restarting
      the query; no state is kept for this join.
    * **watermark-bounded in-stream dedup**
      (``dropDuplicatesWithinWatermark``) — one state entry per
      fingerprint, evicted past the event-time watermark, so state is
      bounded by fingerprints-per-window at any ingest rate.

    The near-dup stage deliberately has no streaming twin: candidate
    generation needs the corpus-wide inverted index, which is a batch
    (or periodic micro-batch-materialized) structure — the standard
    lambda split for this operator."""
    from cae_polars_tools_spark.operators.text import fingerprint

    with_fp = docs.withColumn(fp_col, fingerprint("text"))
    hist = history_fingerprints.select(F.col(fp_col))
    return (
        with_fp.join(hist, fp_col, "left_anti")
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([fp_col])
    )


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream (or batch-batch — same code, the Structured
    Streaming contract) attribution join: every purchase matched to
    the same user's clicks in the preceding ``horizon_minutes``.

    The streaming-viable shape: an equi-join key (user) plus a
    time-RANGE predicate between the two event times, with a watermark
    on BOTH sides. That pair is exactly what lets Spark bound the join
    state — each side buffers only rows younger than
    watermark + horizon, so state is (events per user per horizon
    window), not stream history, and the join runs forever at ingest
    scale. On batch inputs the watermark is a no-op and Catalyst plans
    an ordinary range-banded join.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    joined = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        ),
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("lag_us"),
    )


def run_attribution_stream(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    query_name: str = "attribution",
    horizon_minutes: int = 60,
) -> DataFrame:
    """Drain the click→purchase join over the file stream
    (Trigger.AvailableNow, append mode — the only mode stream-stream
    inner joins support) into a memory sink; returns the result."""
    events = stream_events(spark, sf_dir)
    joined = attribution_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
        horizon_minutes=horizon_minutes,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, query_name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


# ---------------------------------------------------------------------------
# Custom stateful operator: gap sessionization (applyInPandasWithState)
# ---------------------------------------------------------------------------

SESSION_STATE_SCHEMA = "session_start long, session_end long, n_events long"
SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    watermark: str = "1 hour",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming gap sessionization with explicit state: per user,
    events within ``gap_minutes`` of the previous one extend the
    session; a completed session is emitted when a later event opens a
    new one. With ``timeout_ms`` set, a processing-time timeout also
    flushes idle sessions — for always-on pipelines only: pending
    timeouts keep empty micro-batches firing, so a
    ``Trigger.AvailableNow`` drain (and hence any run-to-completion
    test) must use the default NoTimeout.

    This is the `applyInPandasWithState` pattern for operators Spark
    has no builtin for — state is one tiny tuple per user (bounded),
    batches arrive Arrow-vectorized."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start],
                    "session_end_us": [end],
                    "n_events": [n],
                }
            )
            return
        ts_us = []
        for pdf in pdfs:
            ts_us.extend(
                (pdf["ts"].astype("int64") // 1000).tolist()
            )
        ts_us.sort()
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = ts_us[0], ts_us[0], 0
        out = []
        for t in ts_us:
            if t - end > gap_us:
                out.append((user_id, start, end, n))
                start, end, n = t, t, 1
            else:
                # a LATE (within-watermark, cross-micro-batch) event
                # can arrive with t < end; taking `end = t` would
                # regress the stored session end and a following
                # on-time event would measure a phantom gap and split
                # the session. Late events extend the open session's
                # bounds, never shrink them.
                end = max(end, t)
                start = min(start, t)
                n += 1
        state.update((start, end, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            import pandas as pd

            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_start_us",
                    "session_end_us",
                    "n_events",
                ],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


# ---------------------------------------------------------------------------
# Streaming per-key cap (the streaming twin of pipeline.cap_per_key)
# ---------------------------------------------------------------------------

CAP_STATE_SCHEMA = "n_kept long"
CAP_OUTPUT_SCHEMA = "user_id long, event_id long, ts_us long"


def cap_stream(
    events: DataFrame, cap: int, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming per-key cap: emit at most ``cap`` events per user,
    keeping the FIRST arrivals. The batch twin
    (``operators/pipeline.py::cap_per_key``) ranks the whole corpus by
    a deterministic hash; a streaming operator cannot see future rows,
    so the streaming contract is first-arrival-wins — within a
    micro-batch, ties resolve by (event time, event_id) so a batch's
    admission set is deterministic regardless of Arrow chunking.

    State is ONE long per key (the kept count) — bounded by distinct
    keys, not by stream length; a key already at its cap costs one
    integer comparison per batch. The watermark bounds how late an
    event may arrive, not the state size."""
    if cap < 1:
        raise ValueError("cap must be at least 1")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        n_kept = state.get[0] if state.exists else 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if n_kept >= cap or not chunks:
            if not state.exists:
                state.update((n_kept,))
            return
        batch = pd.concat(chunks, ignore_index=True)
        batch["ts_us"] = batch["ts"].astype("int64") // 1000
        batch = batch.sort_values(["ts_us", "event_id"], kind="stable")
        take = batch.head(cap - n_kept)
        state.update((n_kept + len(take),))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(take),
                "event_id": take["event_id"].to_numpy(),
                "ts_us": take["ts_us"].to_numpy(),
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=CAP_OUTPUT_SCHEMA,
            stateStructType=CAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming CDC upsert: foreachBatch → copy-on-write MERGE, versioned
# target with an atomic pointer flip — the lakehouse ingestion loop.
# ---------------------------------------------------------------------------

_CURRENT = "_CURRENT.json"


def _pointer_store(target_root: str):
    """The upsert target's pointer I/O rides the ByteStore seam (the
    same local/http/fsspec ladder every zarr path uses), so the sink
    is store-agnostic: local filesystems get a true atomic
    ``os.replace`` flip, object stores get single-object PUT (atomic
    visibility per S3/GCS semantics — readers see the old pointer or
    the new one, never a torn write)."""
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    return ByteStore.for_path(target_root)


def read_current(spark: SparkSession, target_root: str) -> DataFrame:
    """Read the upsert target's CURRENT version (what the pointer
    references, its manifest resolved). Readers never observe a
    half-merged state: versions are immutable and the pointer flips
    only after a version is fully written."""
    from cae_polars_tools_spark.table import Table

    return Table(spark, target_root).current()


def read_version(
    spark: SparkSession, target_root: str, version: int
) -> DataFrame:
    """Time travel: read a SPECIFIC immutable version of the upsert
    target (versions never mutate after their pointer flip, so any
    retained version is a consistent snapshot — the audit/debug/
    reproduce-yesterday's-training-set read). Raises if the version
    was never written or has been vacuumed."""
    from cae_polars_tools_spark.table import Table

    try:
        return Table(spark, target_root).read_version(version)
    except FileNotFoundError as e:
        # keep this module's historical error text (tests + callers
        # match on "vacuum_versions")
        raise FileNotFoundError(
            f"version {version} not found under {target_root} "
            "(never written, or removed by vacuum_versions)"
        ) from e


def vacuum_versions(target_root: str, keep_last: int = 2) -> list[str]:
    """Retention for the CoW version chain — the reference-counted
    :func:`cae_polars_tools_spark.table.vacuum_table`: versions older
    than the newest ``keep_last`` stop being readable; their files
    are deleted only when no retained manifest references them
    (shared files park in a tombstoned husk until the last reader
    version goes). Returns the names of the version directories that
    no longer read (fully removed + demoted husks).

    Safe by construction: only versions STRICTLY OLDER than the
    pointer's current one are candidates, and the pointer itself is
    untouched — a concurrent reader that already resolved an old
    version could still race its file reads (the standard lakehouse
    retention caveat: vacuum only past your longest reader), which is
    why retention is explicit and never automatic here."""
    from cae_polars_tools_spark.table import vacuum_table

    stats = vacuum_table(target_root, keep_last=keep_last)
    return sorted(
        set(stats["removed"]) | set(stats["demoted"]),
        key=lambda d: int(d[1:]),
    )


def cow_upsert_sink(
    target_root: str,
    keys: list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
    maintain_every: int | None = None,
    max_branches: int = 16,
    target_file_bytes: int = 128 * 1024 * 1024,
):
    """``foreachBatch`` sink upserting each micro-batch into a
    versioned copy-on-write parquet target — the streaming CDC
    ingestion loop composed from this engine's own storage primitive
    (``storage.merge_parquet``):

    * the batch first compacts to latest-per-key — row_number over
      ``keys`` by ``(order_col DESC, *tiebreak DESC)``, the q59/q64
      ``(ts, event_id)`` convention — so one micro-batch carrying
      several updates of a key applies only the newest. ``tiebreak``
      defaults to every remaining non-key column (name-sorted), which
      makes the pick a deterministic function of row CONTENT even
      when two updates of one key carry an identical ``order_col``:
      redelivered batches compact byte-identically;
    * the compacted batch MERGEs into the current version: only
      target files containing a matched key rewrite, the rest copy
      byte-for-byte (at 100 TB: a handful of rewrites per batch on a
      key-clustered layout);
    * the pointer file flips LAST, recording the micro-batch id —
      a replayed batch (foreachBatch's at-least-once contract) is
      detected and SKIPPED, upgrading the sink to effectively-once.

    Crash safety: the pointer flips LAST, so a crash after the new
    version is written but before the flip leaves an ORPHAN
    ``v{n+1}`` directory the pointer never referenced. On replay the
    sink detects and clears it before rewriting — readers only ever
    followed the pointer, so the cleanup races nothing.

    ``maintain_every`` (OFF by default) is the layout-health hook for
    exactly this path: every merge since the last compaction adds one
    birth directory to the current version's union plan, and a
    per-micro-batch cadence is where that sprawl actually accrues.
    Every N applied batches the sink runs ``Table.maintain(
    max_branches=…, auto_compact=True)`` AFTER the batch commits —
    a normal CoW version under the same pointer discipline, so branch
    count stays bounded by policy instead of growing with stream age.
    Left None, nothing changes: maintenance stays an explicit nightly
    call, the honest default for a sink that cannot know the
    deployment's reader latency.

    Returns the ``(batch_df, batch_id)`` callable for
    ``writeStream.foreachBatch``."""
    import json

    from pyspark.sql import Window as W

    if maintain_every is not None and maintain_every < 1:
        raise ValueError(
            f"maintain_every must be >= 1 batches, got {maintain_every}"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from cae_polars_tools_spark.table import Table

        spark = batch_df.sparkSession
        if not batch_df.columns or batch_df.isEmpty():
            return
        store = _pointer_store(target_root)
        root = target_root.rstrip("/")
        meta = None
        raw = store.get(_CURRENT)
        if raw is not None:
            meta = json.loads(raw)
            if batch_id <= meta["batch_id"]:
                return  # replayed batch: already applied
        tb = tiebreak
        if tb is None:
            tb = sorted(
                c
                for c in batch_df.columns
                if c not in keys and c != order_col
            )
        w = W.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc() for c in tb]
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # Table's verbs carry the whole CoW discipline: orphan-clear,
        # manifest commit (untouched files re-referenced, never
        # copied), declared-schema normalization for widen-only
        # evolution (pre-evolution batches null-fill, unknown columns
        # refuse), audit record, pointer flip LAST with this batch's
        # id — the replay guard above completes effectively-once.
        if meta is None:
            Table.create(
                spark, root, latest,
                batch_id=batch_id, op="streaming-upsert",
            )
        else:
            Table(spark, root).merge(
                latest, keys, batch_id=batch_id, op="streaming-upsert"
            )
        # layout health on the path where sprawl accrues: every N
        # batches (cadence keyed to the monotone micro-batch id, so a
        # restart keeps it without sink-local state), compact when the
        # union plan exceeds the branch policy. Runs AFTER the commit:
        # a maintenance failure must never lose the batch, and the
        # compaction is its own CoW version (replay guard unaffected —
        # the pointer's batch_id carries forward through compact()).
        if (
            maintain_every is not None
            and (batch_id + 1) % maintain_every == 0
        ):
            try:
                Table(spark, root).maintain(
                    max_branches=max_branches,
                    target_file_bytes=target_file_bytes,
                    auto_compact=True,
                )
            except Exception:
                # best-effort BY CONTRACT: the batch already
                # committed, and layout health must never take the
                # stream down with it — a failed compaction here
                # would otherwise crash-loop the query at every
                # cadence multiple while every data batch applies
                # fine. The next cadence point retries; a persistent
                # failure surfaces through the warning trail and the
                # branch-count growth maintain() reports.
                import logging

                logging.getLogger(__name__).warning(
                    "cow_upsert_sink: auto-maintain after batch %s "
                    "failed (batch IS committed; retrying at the "
                    "next cadence point)",
                    batch_id,
                    exc_info=True,
                )

    return sink

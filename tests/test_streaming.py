"""Structured Streaming tests: the streaming windowed aggregation must
equal the oracle-checked batch query, and the custom stateful
sessionization operator must match the batch sessionization corpus
entry (restricted to flushed sessions)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_streaming_windowed_counts_equals_batch(spark, sf_small, tmp_path):
    from cae_polars_tools_spark.plans.registry import load_all
    from cae_polars_tools_spark.streaming.events import run_windowed_stream

    got = run_windowed_stream(
        spark, sf_small, str(tmp_path / "ckpt"), query_name="t_windowed"
    ).toPandas()
    batch = load_all()["q23_tumbling_window"].build(spark, sf_small).toPandas()

    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, batch, check_like=True)


def test_streaming_sessionization_matches_batch(spark, sf_small, tmp_path):
    """Run the stateful sessionizer with availableNow over the events
    file; every session it FLUSHES (a later event opened a new session
    for that user) must appear in the batch sessionization result with
    identical boundaries and counts."""
    from cae_polars_tools_spark.plans.registry import load_all
    from cae_polars_tools_spark.streaming.events import (
        sessionize_stream,
        stream_events,
    )

    sessions = sessionize_stream(stream_events(spark, sf_small))
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sessions"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    flushed = spark.table("t_sessions").toPandas()

    batch = (
        load_all()["q26_sessionization"]
        .build(spark, sf_small)
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .toPandas()
    )
    batch_keys = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in batch.itertuples()
    }
    assert len(flushed) > 0  # users with >1 session exist in the data
    for r in flushed.itertuples():
        assert (
            r.user_id,
            r.session_start_us,
            r.session_end_us,
            r.n_events,
        ) in batch_keys


def test_windowed_counts_batch_streaming_same_code(spark, sf_small):
    """The shared transformation applied to a batch frame reproduces
    q23 — one definition, two execution modes."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.plans.registry import load_all
    from cae_polars_tools_spark.streaming.events import windowed_counts

    a = (
        windowed_counts(read_table(spark, sf_small, "events"))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    b = (
        load_all()["q23_tumbling_window"]
        .build(spark, sf_small)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    """dedup_stream: a doubled input stream (every event delivered
    twice, as an at-least-once source would) dedups back to exactly
    the distinct key set, using watermark-bounded state."""
    from cae_polars_tools_spark.streaming.events import (
        EVENTS_SCHEMA,
        dedup_stream,
    )

    import datetime

    src = str(tmp_path / "src")
    base = datetime.datetime(2023, 11, 14, 22, 13, 20, tzinfo=datetime.timezone.utc)
    rows = [
        (i % 4, base + datetime.timedelta(seconds=i), 1, "click", 1.0, "{}")
        for i in range(8)  # event_ids 0..3, each delivered twice
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        dedup_stream(stream, keys=("event_id",))
        .writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["event_id"] for r in spark.table("t_dedup_stream").collect()
    )
    assert got == [0, 1, 2, 3]


def test_attribution_join_batch_matches_duckdb(spark, sf_small):
    """The shared click→purchase transformation on BATCH inputs equals
    an independent DuckDB formulation of the same time-range join."""
    import duckdb

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.streaming.events import attribution_join

    ev = read_table(spark, sf_small, "events")
    got = attribution_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).toPandas()

    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT p.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM read_parquet('{sf_small}/events.parquet') c
        JOIN read_parquet('{sf_small}/events.parquet') p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 60 MINUTE
        """
    ).df()
    key = ["user_id", "click_id", "purchase_id"]
    assert len(got) > 0
    got_keys = sorted(map(tuple, got[key].itertuples(index=False)))
    want_keys = sorted(map(tuple, want[key].itertuples(index=False)))
    assert got_keys == want_keys
    # lag sanity: within the horizon, non-negative
    assert (got["lag_us"] >= 0).all()
    assert (got["lag_us"] <= 60 * 60 * 1_000_000).all()


def test_attribution_join_stream_matches_batch(spark, sf_small, tmp_path):
    """Stream-stream inner join with two-sided watermarks drained via
    availableNow reproduces the batch join exactly (one micro-batch:
    nothing is late, so the watermark only bounds state)."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.streaming.events import (
        attribution_join,
        run_attribution_stream,
    )

    got = run_attribution_stream(
        spark, sf_small, str(tmp_path / "ckpt_attr"), query_name="t_attr"
    ).toPandas()
    ev = read_table(spark, sf_small, "events")
    batch = attribution_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).toPandas()
    key = ["user_id", "click_id", "purchase_id", "lag_us"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    batch_s = batch[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, batch_s)


def test_streaming_dedup_vs_static_history(spark, tmp_path):
    """dedup_stream_vs_history: stream docs anti-joined against a
    static history fingerprint set (stream-static join), then
    watermark-bounded in-stream dedup — exact-dup redeliveries and
    history copies never reach the sink."""
    import datetime

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from cae_polars_tools_spark.operators.text import fingerprint
    from cae_polars_tools_spark.streaming.events import (
        dedup_stream_vs_history,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    base = datetime.datetime(
        2023, 11, 14, 22, 13, 20, tzinfo=datetime.timezone.utc
    )
    hist_rows = [(0, base, "history doc alpha"), (1, base, "history doc beta")]
    history = spark.createDataFrame(hist_rows, schema).select(
        fingerprint("text").alias("fp")
    )

    stream_rows = [
        (10, base + datetime.timedelta(seconds=1), "history doc alpha"),  # hist dup
        (11, base + datetime.timedelta(seconds=2), "fresh doc one"),
        (12, base + datetime.timedelta(seconds=3), "fresh doc one"),      # in-stream dup
        (13, base + datetime.timedelta(seconds=4), "fresh doc two"),
    ]
    src = str(tmp_path / "docsrc")
    spark.createDataFrame(stream_rows, schema).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        dedup_stream_vs_history(stream, history)
        .writeStream.format("memory")
        .queryName("t_dedup_hist")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hist"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["doc_id"] for r in spark.table("t_dedup_hist").collect())
    assert got == [11, 13] or got == [12, 13]  # one survivor per fp
    assert 10 not in got


def test_sessionize_stream_late_event_does_not_split(spark, tmp_path):
    """A delayed (within-watermark) event older than the stored
    session end must not regress it: before the fix, the late 11:40
    event set end=11:40 and the 12:20 event then measured a phantom
    40-minute gap, splitting one session into two."""
    import datetime
    import time as _time

    from cae_polars_tools_spark.streaming.events import (
        EVENTS_SCHEMA,
        sessionize_stream,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc)

    def ev(i, minutes):
        return (
            i,
            base + datetime.timedelta(minutes=minutes),
            7,
            "click",
            1.0,
            "{}",
        )

    src = str(tmp_path / "late_src")
    # file 1: the on-time 12:00 event; file 2 (later mtime → later
    # micro-batch under maxFilesPerTrigger=1): a LATE 11:40 event,
    # 12:20, and a new-session event at 14:00 that flushes session 1
    spark.createDataFrame([ev(0, 0)], EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(
        [ev(1, -20), ev(2, 20), ev(3, 120)], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("t_late_sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_late_sess").collect()
    # ONE closed session covering 11:40-12:20 with 3 events — not two
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == 3
    span_min = (r["session_end_us"] - r["session_start_us"]) / 60e6
    assert abs(span_min - 40.0) < 1e-6


def test_cap_stream_admits_first_arrivals_across_batches(spark, tmp_path):
    """cap_stream: with cap=2 and two micro-batches (one file each,
    maxFilesPerTrigger=1), every user keeps exactly 2 events and the
    FIRST batch's earliest events win — the second batch's arrivals
    are rejected because the per-key state already reached the cap."""
    import datetime
    import os as _os

    from cae_polars_tools_spark.streaming.events import (
        EVENTS_SCHEMA,
        cap_stream,
    )

    base = datetime.datetime(
        2023, 11, 14, 22, 13, 20, tzinfo=datetime.timezone.utc
    )

    def ev(eid, uid, sec):
        return (
            eid,
            base + datetime.timedelta(seconds=sec),
            uid,
            "click",
            1.0,
            "{}",
        )

    src = str(tmp_path / "src")
    _os.makedirs(src)
    # batch 1: users 1 and 2, three events each (ids 0..5)
    b1 = [ev(i, 1 + i % 2, i) for i in range(6)]
    # batch 2 (later mtime): three more per user (ids 10..15)
    b2 = [ev(10 + i, 1 + i % 2, 100 + i) for i in range(6)]
    spark.createDataFrame(b1, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    import time as _time

    _time.sleep(1.1)  # distinct mtimes: file source processes in order
    spark.createDataFrame(b2, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        cap_stream(stream, cap=2)
        .writeStream.format("memory")
        .queryName("t_cap_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cap"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_cap_stream").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["event_id"])
    assert {u: sorted(ids) for u, ids in by_user.items()} == {
        1: [0, 2],  # user 1's two earliest batch-1 events
        2: [1, 3],  # user 2's two earliest batch-1 events
    }


def test_cap_stream_validates_cap(spark):
    import pytest

    from cae_polars_tools_spark.streaming.events import cap_stream

    with pytest.raises(ValueError, match="cap"):
        cap_stream(None, cap=0)


def test_zarr_ingest_sink_streams_microbatches_into_store(spark, tmp_path):
    """foreachBatch → zarr: two micro-batches (one file each) create
    then append; the final store holds every cell of both. A manual
    REDELIVERY of the first batch is skipped idempotently (the append
    high-watermark), and a straddling batch raises."""
    import pytest as _pytest

    from cae_polars_tools_spark.sources.zarr_scan import scan_data
    from cae_polars_tools_spark.sources.zarr_write import zarr_ingest_sink

    schema = "t int, x int, value double"
    src = str(tmp_path / "src")
    b1 = spark.createDataFrame(
        [(t, j, float(t * 10 + j)) for t in (1, 2) for j in range(3)], schema
    )
    b2 = spark.createDataFrame(
        [(t, j, float(t * 10 + j)) for t in (3, 4) for j in range(3)], schema
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    import time as _time

    _time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(src)

    store = str(tmp_path / "ingest.zarr")
    sink = zarr_ingest_sink(store, append_dim="t", chunks=(2, 3))
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_zarr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["t"], r["x"]): r["value"]
        for r in scan_data(spark, store, "value").collect()
    }
    assert got == {
        (t, j): float(t * 10 + j) for t in (1, 2, 3, 4) for j in range(3)
    }

    # redelivery of an already-ingested batch: skipped, store unchanged
    sink(b1, 99)
    assert {
        (r["t"], r["x"]): r["value"]
        for r in scan_data(spark, store, "value").collect()
    } == got
    # a straddling batch (t=4 old, t=5 new) must refuse loudly
    straddle = spark.createDataFrame(
        [(4, 0, 0.0), (5, 0, 0.0)], schema
    )
    with _pytest.raises(ValueError, match="high-watermark"):
        sink(straddle, 100)


def test_zarr_ingest_sink_resumes_half_finished_create(spark, tmp_path):
    """Create-path crash recovery: if the marker is still present
    (write_zarr flips metadata FIRST, so a crash mid-create leaves a
    store that LOOKS complete), a redelivered first batch must REDO
    the create instead of being skipped as a redelivery — otherwise
    the unwritten chunks would be lost forever."""
    from cae_polars_tools_spark.sources.zarr_format import ByteStore
    from cae_polars_tools_spark.sources.zarr_scan import scan_data
    from cae_polars_tools_spark.sources.zarr_write import (
        write_zarr,
        zarr_ingest_sink,
    )

    schema = "t int, x int, value double"
    b1 = spark.createDataFrame(
        [(t, j, float(t * 10 + j)) for t in (1, 2) for j in range(3)], schema
    )
    store_path = str(tmp_path / "resume.zarr")

    # simulate the half-finished create: metadata + axes written (so
    # the store "exists" and the axis covers batch 1), one data chunk
    # deleted, marker still present
    write_zarr(b1, store_path, chunks=(1, 3))
    store = ByteStore.for_path(store_path, None)
    store.put(".ingest_incomplete", b"1")
    import os as _os

    _os.remove(f"{store_path}/value/0.0")

    sink = zarr_ingest_sink(store_path, append_dim="t", chunks=(1, 3))
    sink(b1, 0)  # redelivery of the first batch
    assert store.get(".ingest_incomplete") is None  # marker cleared
    got = {
        (r["t"], r["x"]): r["value"]
        for r in scan_data(spark, store_path, "value").collect()
    }
    assert got == {
        (t, j): float(t * 10 + j) for t in (1, 2) for j in range(3)
    }


def test_map_only_text_operators_run_on_streams(spark, sf_small, tmp_path):
    """The zero-shuffle text operators (BPE tokenize, quality filter)
    are streaming-ready BY CONSTRUCTION — the same code runs on a
    readStream frame and a micro-batched run must equal the batch
    result exactly. Pins the 'map-only ⇒ streaming twin for free'
    architectural claim."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.text import quality_filter
    from cae_polars_tools_spark.operators.tokenizer import (
        FIXED_MERGES,
        tokenize_bpe,
    )

    docs = read_table(spark, sf_small, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_stream")
    docs.repartition(3).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    q1 = (
        tokenize_bpe(stream, FIXED_MERGES)
        .writeStream.format("memory")
        .queryName("bpe_stream")
        .outputMode("append")
        .start()
    )
    q1.processAllAvailable()
    q1.stop()
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in spark.sql("SELECT * FROM bpe_stream").collect()
    }
    want = {
        r["doc_id"]: r["n_tokens"]
        for r in tokenize_bpe(docs, FIXED_MERGES).collect()
    }
    assert got == want

    q2 = (
        quality_filter(stream)
        .writeStream.format("memory")
        .queryName("quality_stream")
        .outputMode("append")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got_q = {
        r["doc_id"]: r["keep"]
        for r in spark.sql("SELECT doc_id, keep FROM quality_stream").collect()
    }
    want_q = {
        r["doc_id"]: r["keep"] for r in quality_filter(docs).collect()
    }
    assert got_q == want_q


def test_streaming_cow_upsert_matches_batch_latest_per_key(spark, tmp_path):
    """The streaming CDC loop: micro-batches of keyed updates upsert
    into a versioned copy-on-write target (foreachBatch →
    merge_parquet, atomic pointer flip). The final table must equal
    the batch latest-per-key view of ALL updates, replayed batches
    must be skipped (effectively-once), and within-batch duplicates
    of a key must apply only the newest."""
    import json
    import os

    from cae_polars_tools_spark.streaming.events import (
        cow_upsert_sink,
        read_current,
    )

    src = str(tmp_path / "updates")
    os.makedirs(src)
    # batch 0: initial states; batch 1: updates incl. a within-batch
    # double-update of key 1 and a brand-new key 4
    b0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 11, "b"), (3, 12, "c")],
        "k long, seq long, val string",
    )
    b1 = spark.createDataFrame(
        [(1, 20, "a2"), (1, 21, "a3"), (4, 22, "d")],
        "k long, seq long, val string",
    )
    b0.coalesce(1).write.parquet(os.path.join(src, "f0"))
    target = str(tmp_path / "table")
    os.makedirs(target)

    sink = cow_upsert_sink(target, keys=["k"], order_col="seq")
    stream = (
        spark.readStream.schema("k long, seq long, val string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got0 = {
        (r["k"], r["seq"], r["val"]) for r in read_current(spark, target).collect()
    }
    assert got0 == {(1, 10, "a"), (2, 11, "b"), (3, 12, "c")}

    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["seq"], r["val"]) for r in read_current(spark, target).collect()
    }
    assert got == {
        (1, 21, "a3"),  # within-batch newest wins
        (2, 11, "b"),
        (3, 12, "c"),
        (4, 22, "d"),
    }
    with open(os.path.join(target, "_CURRENT.json")) as fh:
        meta = json.load(fh)
    assert meta["version"] == 1 and meta["batch_id"] >= 1

    # replay: re-applying an already-recorded batch id is a no-op
    sink(b1, meta["batch_id"])
    with open(os.path.join(target, "_CURRENT.json")) as fh:
        meta2 = json.load(fh)
    assert meta2 == meta
    # and a fresh higher batch id applies normally
    b2 = spark.createDataFrame([(2, 30, "b2")], "k long, seq long, val string")
    sink(b2, meta["batch_id"] + 1)
    got2 = {
        (r["k"], r["val"]) for r in read_current(spark, target).collect()
    }
    assert (2, "b2") in got2 and len(got2) == 4


def test_cow_upsert_tied_order_col_is_deterministic(spark, tmp_path):
    """Two updates of one key with an IDENTICAL order_col must compact
    to a deterministic winner (the q59/q64 tie-break convention: the
    default tiebreak orders by every remaining column, so the pick is
    a function of row content, not partition layout). A redelivered
    batch with shuffled input order must produce byte-identical state."""
    import os

    from cae_polars_tools_spark.streaming.events import (
        cow_upsert_sink,
        read_current,
    )

    rows = [(1, 5, "x"), (1, 5, "z"), (1, 5, "y"), (2, 5, "q")]
    schema = "k long, seq long, val string"

    t1 = str(tmp_path / "t1")
    t2 = str(tmp_path / "t2")
    os.makedirs(t1)
    os.makedirs(t2)
    sink1 = cow_upsert_sink(t1, keys=["k"], order_col="seq")
    sink2 = cow_upsert_sink(t2, keys=["k"], order_col="seq")
    # same logical batch, opposite physical order + different layout
    sink1(spark.createDataFrame(rows, schema).repartition(4), 0)
    sink2(
        spark.createDataFrame(list(reversed(rows)), schema).coalesce(1), 0
    )
    got1 = {(r["k"], r["seq"], r["val"]) for r in read_current(spark, t1).collect()}
    got2 = {(r["k"], r["seq"], r["val"]) for r in read_current(spark, t2).collect()}
    assert got1 == got2
    # default tiebreak = remaining cols DESC → val 'z' wins for key 1
    assert got1 == {(1, 5, "z"), (2, 5, "q")}

    # explicit tiebreak column overrides the default
    t3 = str(tmp_path / "t3")
    os.makedirs(t3)
    sink3 = cow_upsert_sink(
        t3, keys=["k"], order_col="seq", tiebreak=["val"]
    )
    sink3(spark.createDataFrame(rows, schema), 0)
    got3 = {(r["k"], r["val"]) for r in read_current(spark, t3).collect()}
    assert got3 == {(1, "z"), (2, "q")}


def test_cow_upsert_recovers_from_crash_before_pointer_flip(spark, tmp_path):
    """Fault injection: a crash AFTER the new version directory is
    written but BEFORE the pointer flips leaves an orphan v{n+1} the
    pointer never referenced. The replayed batch must clear the
    orphan and apply cleanly; readers (who only follow the pointer)
    never saw the orphan."""
    import json
    import os

    from cae_polars_tools_spark.streaming.events import (
        cow_upsert_sink,
        read_current,
    )

    schema = "k long, seq long, val string"
    target = str(tmp_path / "table")
    os.makedirs(target)
    sink = cow_upsert_sink(target, keys=["k"], order_col="seq")
    sink(spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], schema), 0)

    # simulate the crash: materialize v1 (what batch 1 WOULD write)
    # without flipping the pointer — an orphan version directory
    orphan = spark.createDataFrame([(1, 99, "TORN")], schema)
    orphan.write.parquet(os.path.join(target, "v1"))
    with open(os.path.join(target, "_CURRENT.json")) as fh:
        assert json.load(fh)["version"] == 0  # pointer untouched
    # readers still see v0
    got = {(r["k"], r["val"]) for r in read_current(spark, target).collect()}
    assert got == {(1, "a"), (2, "b")}

    # redelivered batch 1: must clear the orphan and apply
    sink(spark.createDataFrame([(1, 2, "a2")], schema), 1)
    got = {
        (r["k"], r["seq"], r["val"])
        for r in read_current(spark, target).collect()
    }
    assert got == {(1, 2, "a2"), (2, 1, "b")}
    with open(os.path.join(target, "_CURRENT.json")) as fh:
        meta = json.load(fh)
    assert meta["version"] == 1 and meta["batch_id"] == 1


def test_streaming_ivfpq_ingest_matches_batch_append(spark, tmp_path):
    """Streaming ANN-index maintenance: micro-batches of new vectors
    append to the persisted IVF-PQ index under the frozen model;
    replayed rows dedupe by vec_id (effectively-once); final query
    results equal the batch-append path over the same vectors."""
    import os

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        N_QUERIES,
        append_ivfpq_index,
        build_ivfpq_index,
        ivfpq_ingest_sink,
        query_ivfpq_index,
    )
    from pyspark.sql import functions as F

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    base = e.filter(F.col("vec_id") % 4 == 0)
    rest = e.filter(F.col("vec_id") % 4 != 0).select("vec_id", "embedding")

    # streamed index
    root_s = str(tmp_path / "idx_stream")
    build_ivfpq_index(base, root_s, fingerprint="base")
    src = str(tmp_path / "updates")
    os.makedirs(src)
    # two files -> two micro-batches; plus a duplicate re-delivery of
    # the first file's rows inside the second file, AND a within-batch
    # duplicate (same vec_id twice in one file) — the sink must dedup
    # inside the micro-batch too, not only against persisted ids
    r1 = rest.filter(F.col("vec_id") % 4 == 1)
    r23 = (
        rest.filter(F.col("vec_id") % 4 >= 2)
        .unionAll(r1.limit(5))
        .unionAll(rest.filter(F.col("vec_id") % 4 == 2).limit(3))
    )
    r1.coalesce(1).write.parquet(os.path.join(src, "f0"))
    r23.coalesce(1).write.parquet(os.path.join(src, "f1"))
    stream = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    query = (
        stream.writeStream.foreachBatch(ivfpq_ingest_sink(root_s))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)

    # batch-appended twin
    root_b = str(tmp_path / "idx_batch")
    build_ivfpq_index(base, root_b, fingerprint="base")
    append_ivfpq_index(spark, root_b, rest)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    got = rows(query_ivfpq_index(spark, root_s, q))
    want = rows(query_ivfpq_index(spark, root_b, q))
    assert got == want
    # no duplicate ids slipped in despite the redelivered rows
    n = spark.read.parquet(root_s + "/codes").count()
    d = spark.read.parquet(root_s + "/codes").select("vec_id").distinct().count()
    assert n == d == e.count()


def test_time_travel_and_vacuum(spark, tmp_path):
    """Versions stay readable (time travel) until explicitly
    vacuumed; vacuum keeps the newest keep_last and never touches the
    pointer's current version."""
    import os

    import pytest

    from cae_polars_tools_spark.streaming.events import (
        cow_upsert_sink,
        read_current,
        read_version,
        vacuum_versions,
    )

    root = str(tmp_path / "tt")
    os.makedirs(root)
    sink = cow_upsert_sink(root, keys=["k"], order_col="seq")
    for bid, rows in enumerate(
        [[(1, 0, "a")], [(1, 1, "b")], [(2, 2, "c")]]
    ):
        sink(spark.createDataFrame(rows, "k long, seq long, val string"), bid)

    # time travel: v0 still holds the original value
    assert [
        (r["k"], r["val"]) for r in read_version(spark, root, 0).collect()
    ] == [(1, "a")]
    assert {
        (r["k"], r["val"]) for r in read_current(spark, root).collect()
    } == {(1, "b"), (2, "c")}

    removed = vacuum_versions(root, keep_last=1)
    assert removed == ["v0", "v1"]
    with pytest.raises(FileNotFoundError, match="vacuum"):
        read_version(spark, root, 0)
    # current unaffected; vacuum again is a no-op
    assert read_current(spark, root).count() == 2
    assert vacuum_versions(root, keep_last=1) == []


def test_span_candidate_sink_stream_equals_batch(spark, tmp_path):
    """Streaming span state (per-batch mergeable (h, df) partials)
    finalized over the accumulated corpus must equal the batch
    repeated_spans — including a span whose min_docs occurrences
    arrive ONE PER MICRO-BATCH (the case no per-batch threshold could
    catch) — and a replayed batch must not double-count."""
    import os

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.dedup import (
        finalize_repeated_spans,
        repeated_spans,
        span_candidate_sink,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # one boilerplate span spread across three different batches
    boiler = "COMMON LICENSE BOILERPLATE PARAGRAPH X"
    extra = spark.createDataFrame(
        [(10_000 + b, f"batch {b} prefix {boiler} suffix {b}")
         for b in range(3)],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(extra)
    batches = [
        corpus.filter((F.col("doc_id") % 3) == b).persist()
        for b in range(3)
    ]
    target = str(tmp_path / "spans")
    sink = span_candidate_sink(target)
    for bid, bdf in enumerate(batches):
        sink(bdf, bid)

    got = {
        tuple(r)
        for r in finalize_repeated_spans(spark, target, corpus).collect()
    }
    want = {tuple(r) for r in repeated_spans(corpus).collect()}
    assert got == want and got, "stream finalize must equal batch"
    # the cross-batch-only span was detected
    cross = {r for r in got if r[0] >= 10_000}
    assert len(cross) == 3

    # replay: segment skipped, finalize unchanged (no double count)
    segs = set(os.listdir(target))
    sink(batches[0], 0)
    assert set(os.listdir(target)) == segs
    got2 = {
        tuple(r)
        for r in finalize_repeated_spans(spark, target, corpus).collect()
    }
    assert got2 == want
    for b in batches:
        b.unpersist()


def test_decontaminate_sink_stream_equals_batch(spark, tmp_path):
    """Streaming decontamination: micro-batches through the sink —
    with a redelivered batch — must land exactly the batch
    decontaminate() survivors in the clean table, with no duplicate
    rows."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.pipeline import (
        decontaminate,
        decontaminate_sink,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter("source = 'src19'").select("doc_id", "text")
    corp = docs.filter("source <> 'src19'").select(
        "doc_id", "text", "source"
    )
    want = {
        (r["doc_id"], r["source"])
        for r in decontaminate(corp, bench).collect()
    }
    assert 0 < len(want) < corp.count(), "fixture must drop something"

    clean = str(tmp_path / "clean")
    sink = decontaminate_sink(bench, clean)
    batches = [corp.filter((F.col("doc_id") % 3) == b) for b in range(3)]
    sink(batches[0], 0)
    sink(batches[1], 1)
    sink(batches[0], 0)  # redelivery after later batches landed
    sink(batches[2], 2)
    sink(corp.limit(0), 3)  # empty trigger no-op

    got = {
        (r["doc_id"], r["source"])
        for r in spark.read.parquet(clean).collect()
    }
    assert got == want
    assert spark.read.parquet(clean).count() == len(want)


def test_decontaminate_sink_bloom_equals_batch_bloom(spark, tmp_path):
    """The Bloom-prefiltered sink regime (benchmark too big to
    broadcast): micro-batches through use_bloom=True — with a
    redelivered batch — must land exactly decontaminate_bloom()'s
    survivors, identical to the exact sink's output (Bloom verify
    removes every false positive), with no duplicate rows."""
    import gc

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.pipeline import (
        decontaminate_bloom,
        decontaminate_sink,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter("source = 'src19'").select("doc_id", "text")
    corp = docs.filter("source <> 'src19'").select(
        "doc_id", "text", "source"
    )
    want = {
        (r["doc_id"], r["source"])
        for r in decontaminate_bloom(corp, bench).collect()
    }
    assert 0 < len(want) < corp.count(), "fixture must drop something"

    gc.collect()
    # baseline-relative: earlier suites in a shared session may hold
    # legitimately-lingering checkpoint RDDs until JVM GC — this test
    # pins only that the SINK adds nothing to the baseline
    rdds_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    clean = str(tmp_path / "clean_bloom")
    sink = decontaminate_sink(bench, clean, use_bloom=True)
    batches = [corp.filter((F.col("doc_id") % 3) == b) for b in range(3)]
    sink(batches[0], 0)
    sink(batches[1], 1)
    sink(batches[0], 0)  # redelivery after later batches landed
    sink(batches[2], 2)

    got = {
        (r["doc_id"], r["source"])
        for r in spark.read.parquet(clean).collect()
    }
    assert got == want
    assert spark.read.parquet(clean).count() == len(want)

    # sink-lifetime cache hygiene: dropping the sink releases the
    # construction-time benchmark hash cache; per-trigger checkpoints
    # were already released per batch
    del sink
    gc.collect()
    assert (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        <= rdds_before
    )


def test_cow_upsert_auto_maintain_bounds_branch_sprawl(spark, tmp_path):
    """Round-15: the sink's maintain_every hook keeps the union-plan
    branch count bounded by policy across 3x that many micro-batches
    — sprawl accrues exactly on this path, and nothing called
    Table.maintain there before. Cadence keys to the monotone batch
    id (restart-safe, no sink-local state); the compaction commits
    AFTER the batch and carries the batch_id forward, so the replay
    guard still skips a redelivered batch."""
    from cae_polars_tools_spark.streaming.events import (
        cow_upsert_sink,
        read_current,
    )
    from cae_polars_tools_spark.table import Table

    root = str(tmp_path / "tbl")
    sink = cow_upsert_sink(
        root,
        keys=["k"],
        order_col="seq",
        maintain_every=4,
        max_branches=3,
        target_file_bytes=1 << 20,
    )
    n_batches = 12  # 3x the cadence
    for b in range(n_batches):
        batch = spark.createDataFrame(
            [(k, b * 100 + k, f"v{b}") for k in range(b * 3, b * 3 + 3)],
            "k long, seq long, val string",
        )
        sink(batch, b)
        t = Table(spark, root)
        m = t.maintain(max_branches=3)  # read-only probe
        # the bound holds at every auto-maintain point, and in between
        # can exceed it by at most the cadence
        assert m["branches"] <= 3 + 4

    t = Table(spark, root)
    # after the final batch (id 11; (11+1) % 4 == 0 fired), the plan
    # is compacted back under the policy bound
    assert t.maintain(max_branches=3)["branches"] <= 3
    ops = [h["op"] for h in t.describe_history()]
    assert "compact" in ops

    # replay guard survives the compactions: redelivering batch 11 is
    # a no-op (the compact commit carried the batch id forward)
    v_before = t.version()
    sink(
        spark.createDataFrame([(0, 99999, "dup")], "k long, seq long, val string"),
        11,
    )
    assert Table(spark, root).version() == v_before

    # values: latest write per key
    got = {
        r["k"]: r["val"] for r in read_current(spark, root).collect()
    }
    assert got[0] == "v0" and got[33] == "v11" and len(got) == 36


def test_cow_upsert_maintain_every_validation(tmp_path):
    import pytest

    from cae_polars_tools_spark.streaming.events import cow_upsert_sink

    with pytest.raises(ValueError):
        cow_upsert_sink(
            str(tmp_path), keys=["k"], order_col="seq", maintain_every=0
        )


def test_cow_upsert_maintain_failure_never_kills_the_stream(
    spark, tmp_path, monkeypatch
):
    """Review fix: auto-maintain is best-effort BY CONTRACT — a
    failing compaction after a committed batch must not propagate out
    of the foreachBatch sink (it would crash-loop the query at every
    cadence multiple while every data batch applies fine)."""
    from cae_polars_tools_spark.streaming.events import (
        cow_upsert_sink,
        read_current,
    )
    from cae_polars_tools_spark.table import Table

    root = str(tmp_path / "tbl")
    sink = cow_upsert_sink(
        root, keys=["k"], order_col="seq", maintain_every=1
    )

    def boom(self, **kwargs):
        raise RuntimeError("compaction wedged")

    monkeypatch.setattr(Table, "maintain", boom)
    for b in range(3):
        sink(
            spark.createDataFrame(
                [(b, b, f"v{b}")], "k long, seq long, val string"
            ),
            b,
        )  # must NOT raise
    got = {r["k"]: r["val"] for r in read_current(spark, root).collect()}
    assert got == {0: "v0", 1: "v1", 2: "v2"}
    assert Table(spark, root).version() == 2  # all batches committed

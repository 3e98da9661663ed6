"""Parquet table helpers for the synthetic benchmark tables.

The driver supplies TPC-H-ish parquet tables (see /root/repo/TESTDATA.md):
``region nation customer supplier part orders lineitem events documents
embeddings`` under ``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os
import stat as _statmod

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Process-local cache of INFERRED schemas, keyed by (path, mtime_ns,
# size) — the role a metastore plays for a real table. Without it every
# `spark.read.parquet(path)` re-infers the schema: one driver→JVM
# round-trip plus a 1-task "parquet at ..." inference job per call,
# and the corpus reads each base table hundreds of times per bench
# process. The key's stat signature makes a rewritten file re-infer;
# a fresh process always starts empty, so nothing persists across
# runs. Single files only: directory datasets (no single stat
# signature) keep the uncached path.
_SCHEMA_CACHE: dict[tuple, object] = {}


def _schema_cache_key(path: str) -> tuple | None:
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not _statmod.S_ISREG(st.st_mode):
        return None
    return (os.path.abspath(path), st.st_mtime_ns, st.st_size)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Plain parquet scan — Catalyst handles
    column pruning and predicate pushdown from the downstream plan.

    The tables store timestamp[us] (isAdjustedToUTC=false), which reads
    directly. As a defensive fallback for nano-typed variants of
    ``events.parquet`` — which Spark's vectorized reader rejects
    (PARQUET_TYPE_ILLEGAL) — the legacy nanosAsLong conf is kept on:
    if ``ts`` arrives as int64 nanos, a microsecond timestamp is
    rebuilt with integer division (deterministic truncation, no
    double-precision round-trip — int64 ns exceeds 2^53).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")

    # session.get_spark sets these up front; only touch session state
    # for foreign sessions (e.g. the grading driver's). The tables
    # store timestamp[us] with isAdjustedToUTC=false — Spark 4 would
    # infer TIMESTAMP_NTZ, which breaks instant functions
    # (unix_micros) and diverges from the DuckDB oracle's
    # naive-as-UTC reading — so read them as UTC instants.
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # oracle parity on FOREIGN sessions: timestamp literals parse and
    # instants render in the session timezone, so a non-UTC driver
    # session would shift every filter boundary / year() / date cast
    # against DuckDB's naive-as-UTC reading
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name != "events":
        return _read_parquet_cached_schema(spark, path)

    from pyspark.sql import functions as F

    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _read_parquet_cached_schema(spark, path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    """`spark.read.parquet(path)` with the inferred schema memoized per
    (path, mtime_ns, size). A cache hit supplies the schema explicitly,
    skipping the per-call inference job; behavior is otherwise
    identical (the schema came from the same bytes, per the stat key).
    ``read_table`` pins the schema-affecting confs (NTZ inference,
    nanosAsLong) before calling, so the inferred schema is
    deterministic per file within a process."""
    key = _schema_cache_key(path)
    if key is None:
        return spark.read.parquet(path)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        return spark.read.schema(cached).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[key] = df.schema
    return df


#: Compute-matched task sizing for ``spread()``: when a small scan is
#: re-partitioned for CPU-heavy per-row work, aim for about this many
#: INPUT bytes per task instead of blanketing every core. The kernels
#: spread serves (tokenize/shingle/MinHash/pandas-UDF scoring) cost
#: ~0.1-0.5 s of single-thread CPU per MB, so 256 KiB ≈ 25-130 ms of
#: real work per task — enough to amortize the per-task Python-worker
#: dispatch (~25 ms measured: a 32-task pandas-UDF job over a 1.5 MB
#: corpus walls ~1.0 s vs 0.39 s at 4 tasks with identical output).
#: Measured at sf0.1/local[32]: dedup_minhash_lsh 4.33→1.60 s,
#: text_tfidf_topk 2.19→0.73, dedup_simhash 1.76→0.66 vs the old
#: always-all-cores rule; 128 KiB and 512 KiB were both worse on the
#: same interleaved sweep. At real scale this cap is irrelevant by
#: construction — spread only fires when the scan yields fewer
#: partitions than cores, and the cap only LOWERS the count below
#: cores for sub-``cores × target`` inputs. Env-overridable for
#: clusters whose per-task dispatch or kernel cost differs.
SPREAD_TARGET_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_TARGET_BYTES", str(256 * 1024))
)

#: Codec-family spread targets — the ``target_bytes`` overrides for
#: kernels far heavier per input byte than the text default above.
#: Tiered by measured single-thread kernel cost, each tier keeping a
#: task at roughly the same tens-to-hundreds-of-ms of real work the
#: 256 KiB text tier gives (round-15 interleaved A/B over the whole
#: mm family at sf0.1, four targets × 3 rounds, same process;
#: per-entry medians in OPTIMIZATION_r15.md):
#:
#: * HEAVY (~1-3 s/MB: full-image decode, sample-rate conversion) —
#:   64 KiB. mm_png_features 0.75→0.55 s, mm_bmp 0.62→0.52,
#:   mm_y4m 0.69→0.56, mm_audio_resample 0.68→0.63,
#:   mm_resize_thumbnail 1.37→0.75.
#: * CODEC (~3-8 s/MB: bit-level audio codec decode) — 32 KiB.
#:   mm_flac_features 1.98→1.02 s, mm_ogg_flac 2.47→0.88.
#: * ROUNDTRIP (~10+ s/MB: encode THEN decode, pixel-exact) —
#:   16 KiB. mm_avi_mjpeg_roundtrip 8.40→1.65 s, mm_jpeg_roundtrip
#:   3.90→0.82, mm_gif_features 0.81→0.57.
#:
#: Entries whose kernel is header-sniff/frame-sample cheap
#: (mm_image_info, multimodal_frame_sample, multimodal_features,
#: mm_audio_frame_energy) measured BEST at the text default — finer
#: splits only add dispatch — and take no override. Same scale
#: argument as the base target: a real corpus scans as more splits
#: than cores and spread never fires.
SPREAD_HEAVY_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_HEAVY_BYTES", str(64 * 1024))
)
SPREAD_CODEC_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_CODEC_BYTES", str(32 * 1024))
)
SPREAD_ROUNDTRIP_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_ROUNDTRIP_BYTES", str(16 * 1024))
)

#: ``spread(df, target_bytes=SPREAD_NO_CAP)`` — no byte-matched task
#: cap, fan out to every core whenever the scan yields fewer splits.
#: For consumers whose downstream is PURE JVM expressions (regex /
#: higher-order array functions / md5): they pay none of the ~25 ms
#: Python-worker dispatch the byte cap exists to amortize (a JVM task
#: launch is ~2 ms), so the cap only withholds parallelism. Round-16
#: cold-process driver-methodology A/B (fresh JVM, median-of-3+,
#: alternating configs): text_stats 0.47→0.29 s and text_language_id
#: 0.46→0.37 s vs the 256 KiB cap, and both still beat the 64 KiB
#: HEAVY tier (0.41/0.62) — while the heavier JVM regex kernels
#: (bpe_token_counts 0.60 vs 0.77, text_repetition 0.96 vs 1.22) keep
#: winning at HEAVY, so this is per-kernel, not a blanket revert. At
#: scale identical no-op argument as every other tier: spread never
#: fires when the scan yields >= cores splits.
SPREAD_NO_CAP = 0


def spread(df: DataFrame, target_bytes: int | None = None) -> DataFrame:
    """Round-robin repartition a scan up to the session's parallelism —
    but ONLY if the scan yields fewer partitions than cores, and no
    further than the input size warrants (``target_bytes``, default
    ``SPREAD_TARGET_BYTES``). Callers whose downstream kernel is far
    heavier per input byte than the text kernels the default is sized
    for (codec round-trips run seconds per MB, not tenths) pass a
    proportionally smaller ``target_bytes`` so each task still
    carries tens-to-hundreds of ms of real work.

    Why: parquet splitting is row-group-granular, so a small input (one
    file, one row group — exactly the shape of a dim-table or a
    small-SF test table) scans as ONE task no matter how many cores
    exist, and every downstream narrow op (tokenize, shingle, pandas
    UDF) runs single-threaded. For CPU-heavy per-row operators the
    repartition shuffle (bytes ≈ input size, which is small precisely
    when this fires) buys back parallelism.

    At real scale this is a no-op by construction: a 100 TB table scans
    as ~10⁵ row-group splits ≥ parallelism, so no exchange is added to
    the plan. Decision rule (measured at sf0.1 on local[32]): spread
    when per-row compute dominates — shingling/tokenizing (4× faster),
    pandas-UDF scoring, blocked self-joins; do NOT spread cheap-per-row
    plans — a 600k-row groupBy got 3× slower (the extra exchange costs
    more than the single-task map side), and md5-fingerprint /
    persisted-LSH-bucket pipelines regressed ~2×. The partition count
    is compute-matched, not core-matched: a tiny corpus split across
    every core pays per-task Python-worker dispatch on every
    downstream UDF stage for ~no added parallelism of real work (see
    ``SPREAD_TARGET_BYTES``).

    The small-scan test computes the partition count from input file
    sizes with Spark's own split-sizing + packing rules
    (``_scan_task_estimate``) — file-listing metadata only, so
    planning stays lazy and no RDD lineage is built. Non-file plans
    fall back to the exact (lineage-building) RDD partition count and
    the plain all-cores rule (no size information to match against).
    """
    spark = df.sparkSession
    try:
        n = spark.sparkContext.defaultParallelism
    except Exception:
        # Spark Connect: no SparkContext client-side — the scan-size
        # heuristic can't run; leave the plan untouched
        return df
    sizes = _scan_file_sizes(df)
    est = _scan_task_estimate(df, sizes=sizes)
    if est is None:
        try:
            est = df.rdd.getNumPartitions()
        except Exception:
            return df  # non-file plan on a Connect-like session
    if est >= n:
        return df
    per_task = SPREAD_TARGET_BYTES if target_bytes is None else target_bytes
    k = (
        n
        if sizes is None or per_task <= 0  # SPREAD_NO_CAP: all cores
        else min(n, max(1, -(-sum(sizes) // per_task)))
    )
    if est >= k:
        return df
    return df.repartition(k)


def _conf_int(conf, key: str) -> int | None:
    try:
        v = conf.get(key, None)
        return int(v) if v is not None else None
    except Exception:
        return None


def _parse_bytes_conf(raw: str) -> int:
    """Parse Spark byte-size conf values ('134217728', '128m', '1g')."""
    s = raw.strip().lower().rstrip("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def _scan_file_sizes(df: DataFrame) -> list[int] | None:
    """Byte sizes of a local-file scan's input files (``None`` when the
    plan isn't a local-file scan). File-listing metadata only — no RDD
    lineage is built."""
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    sizes = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        try:
            sizes.append(os.path.getsize(unquote(u.path)))
        except OSError:
            return None
    return sizes


def _scan_task_estimate(
    df: DataFrame, sizes: list[int] | None = None
) -> int | None:
    """File-scan partition count computed the way Spark itself does
    (``FilePartition.maxSplitBytes`` + ``getFilePartitions``): split
    size = ``min(maxPartitionBytes, max(openCostInBytes,
    bytesPerCore))``, each FILE split independently (splits never span
    files), splits sorted descending and packed first-fit with an
    open-cost pad per split. File-listing metadata only — no RDD
    lineage is built at plan time. ``None`` when the plan isn't a
    local-file scan (caller falls back to the exact RDD partition
    count).

    Ordering note: the GLOBAL descending sort over flattened splits is
    Spark's own order — both ``FileSourceScanExec.createReadRDD`` (v1)
    and ``FileScan.partitions`` (DSv2) flatten every file's splits and
    then ``sortBy(_.length)`` descending before
    ``FilePartition.getFilePartitions`` packs them; splits are NOT
    emitted in per-file order. Ties between equal-length splits may
    order differently than Spark's sort, but first-fit packing of
    interchangeable equal-length items yields the same partition
    count, so the estimate — and therefore ``spread()``'s decision —
    is unaffected."""
    if sizes is None:
        sizes = _scan_file_sizes(df)
    if sizes is None:
        return None
    spark = df.sparkSession
    conf = spark.conf
    max_pb = _parse_bytes_conf(
        conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    open_cost = _parse_bytes_conf(
        conf.get("spark.sql.files.openCostInBytes", "4194304")
    )
    min_pn = (
        _conf_int(conf, "spark.sql.files.minPartitionNum")
        or _conf_int(conf, "spark.sql.leafNodeDefaultParallelism")
        or spark.sparkContext.defaultParallelism
    )
    padded = sum(sizes) + len(sizes) * open_cost
    bytes_per_core = padded // max(min_pn, 1)
    max_split = max(1, min(max_pb, max(open_cost, bytes_per_core)))

    splits: list[int] = []
    for s in sizes:
        while s > max_split:
            splits.append(max_split)
            s -= max_split
        if s > 0:
            splits.append(s)
    splits.sort(reverse=True)
    partitions, current = 0, 0
    for sp in splits:
        if current + sp > max_split and current > 0:
            partitions += 1
            current = 0
        current += sp + open_cost
    return partitions + (1 if current > 0 else 0)


def read_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every synthetic table into a dict."""
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql use."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)

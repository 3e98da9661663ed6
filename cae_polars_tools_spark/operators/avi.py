"""MJPEG-in-AVI — the first REAL compressed-video path, pure Python:
an AVI RIFF container walk (from the public AVI 1.0 spec: 'RIFF/AVI '
→ LIST hdrl (avih, strl/strh/strf) → LIST movi with '##dc'/'##db'
frame chunks, even-byte padding, optional idx1 ignored) whose video
frames are JPEG streams decoded by the repo's own numpy baseline JPEG
codec (operators/jpeg.py). Muxing is symmetric: ``encode_avi_mjpeg``
writes the same layout, so Spark pipelines can produce playable
MJPEG AVIs from raster frames.

Reference parity: the reference engine has no media operators
(`/root/reference/src` is the zarr data-access layer only) — this is
part of the beyond-reference multimodal surface. Container structure
is additionally pinned by offset-level byte assertions in
tests/test_avi.py (fourccs, header fields), so a symmetric mux/demux
bug cannot hide; frame content rides the independently-tested JPEG
codec. Truly arbitrary codecs (H.264 etc.) remain behind the loud
seam in operators/multimodal.py — MJPEG is the one mainstream video
codec that is honestly implementable from public specs without
external libraries.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x10


def _u32(v: int) -> bytes:
    return struct.pack("<I", v)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
) -> bytes:
    """Mux ready-made JPEG streams into an MJPEG AVI (AVI 1.0 layout:
    hdrl with avih + one 'vids'/'MJPG' stream, movi with '00dc'
    chunks padded to even length, plus a standard idx1). Frames are
    stored verbatim — encode them with ``jpeg.encode_jpeg`` (or any
    baseline encoder) first."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    for f in jpeg_frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("MJPEG frame lacks JPEG SOI")
    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)

    avih = b"avih" + _u32(56) + struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = b"strh" + _u32(56) + (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I",
            0,  # dwFlags
            0,  # wPriority + wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0 = varying)
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = b"strf" + _u32(40) + struct.pack(
        "<I2i2H2I2i2I",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        struct.unpack("<I", b"MJPG")[0],  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    strl = b"LIST" + _u32(4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + _u32(4 + len(avih) + len(strl)) + b"hdrl" + avih + strl

    movi_body = bytearray(b"movi")
    index = bytearray()
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        index += b"00dc" + _u32(0x10) + _u32(len(movi_body)) + _u32(len(f))
        movi_body += b"00dc" + _u32(len(f)) + f
        if len(f) % 2:
            movi_body += b"\x00"
    movi = b"LIST" + _u32(len(movi_body)) + bytes(movi_body)
    idx1 = b"idx1" + _u32(len(index)) + bytes(index)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _u32(len(body)) + body


def _walk_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, data_start, data_size) for each RIFF chunk in
    [start, end); chunks pad to even length."""
    pos = start
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data_start = pos + 8
        if data_start + size > len(payload):
            raise ValueError("AVI chunk overruns payload")
        yield fourcc, data_start, size
        pos = data_start + size + (size & 1)


def parse_avi_mjpeg(payload: bytes) -> tuple[dict, list[bytes]]:
    """Parse an MJPEG AVI → (meta, per-frame JPEG streams). Meta:
    ``width height fps n_frames codec``. Raises ValueError on
    non-AVI/corrupt bytes and NotImplementedError on non-MJPEG video
    streams (the honest seam: other codecs need entropy decoders that
    cannot be reimplemented here)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))

    meta: dict = {}
    # (stream_no, jpeg_bytes): movi data chunks are tagged with their
    # stream number ('00dc', '01wb', ...); keep the tag so only the
    # MJPG video stream's chunks become frames — an audio or second
    # video stream must never silently interleave into the frame list.
    tagged: list[tuple[int, bytes]] = []
    handler = None
    video_stream = None
    n_strh = 0

    def walk_list(start: int, stop: int) -> None:
        nonlocal handler, video_stream, n_strh
        for fourcc, ds, size in _walk_chunks(payload, start, stop):
            if fourcc == b"LIST":
                walk_list(ds + 4, ds + size)
            elif fourcc == b"avih":
                (us_pf,) = struct.unpack_from("<I", payload, ds)
                (total,) = struct.unpack_from("<I", payload, ds + 16)
                w, h = struct.unpack_from("<II", payload, ds + 32)
                meta.update(
                    width=int(w),
                    height=int(h),
                    n_frames=int(total),
                    fps=round(1_000_000 / us_pf) if us_pf else 0,
                )
            elif fourcc == b"strh":
                # stream number = ordinal of this strh among all strl
                # lists (the AVI spec's chunk-prefix convention)
                if payload[ds : ds + 4] == b"vids":
                    if video_stream is not None:
                        raise NotImplementedError(
                            "AVI carries more than one video stream "
                            "(single-stream MJPEG only)"
                        )
                    handler = payload[ds + 4 : ds + 8]
                    video_stream = n_strh
                n_strh += 1
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                tagged.append((int(fourcc[:2]), payload[ds : ds + size]))

    walk_list(12, end)
    if handler is None:
        raise ValueError("AVI has no video stream header")
    if handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video codec {handler!r} (only MJPEG is implemented; "
            "other codecs stay behind the loud seam)"
        )
    frames = [b for sn, b in tagged if sn == video_stream]
    meta["codec"] = "MJPG"
    if meta.get("n_frames") and meta["n_frames"] != len(frames):
        raise ValueError(
            f"AVI declares {meta['n_frames']} frames but movi holds "
            f"{len(frames)}"
        )
    meta["n_frames"] = len(frames)
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("MJPEG frame chunk lacks JPEG SOI")
    return meta, frames


def split_avi_frames(payload: bytes) -> list[bytes]:
    """REAL demuxer for :func:`~cae_polars_tools_spark.operators.
    multimodal.sample_frames`: each MJPEG frame's JPEG stream as one
    ``bytes`` item, stream order — each sampled frame is then a
    self-contained image decodable by ``decode_jpeg``/
    ``decode_image_bytes``."""
    return parse_avi_mjpeg(payload)[1]


def decode_avi_mjpeg(payload: bytes) -> tuple[dict, list[np.ndarray]]:
    """Full decode: (meta, list of (H, W[, 3]) uint8 frames) through
    the repo's baseline JPEG decoder."""
    from cae_polars_tools_spark.operators.jpeg import decode_jpeg

    meta, streams = parse_avi_mjpeg(payload)
    return meta, [decode_jpeg(s) for s in streams]


# ---------------------------------------------------------------------------
# Corpus entry
# ---------------------------------------------------------------------------

from collections.abc import Iterator  # noqa: E402

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from cae_polars_tools_spark.io import (  # noqa: E402
    SPREAD_ROUNDTRIP_BYTES,
    read_table,
    spread,
)
from cae_polars_tools_spark.plans.registry import register  # noqa: E402


@register(
    "mm_avi_mjpeg_roundtrip",
    # MJPEG is LOSSY (JPEG frames), so the hash-checked contract is
    # the INVARIANT frame (the mm_jpeg_roundtrip pattern): container
    # metadata is exact, and within_tol must match the oracle's
    # constant TRUE — any mux/demux drift or JPEG decode error flips
    # a column and fails the gate.
    oracle="""
        SELECT doc_id,
               3 AS n_frames,
               5 AS width,
               4 AS height,
               10 AS fps,
               TRUE AS within_tol
        FROM documents
    """,
    tags=("multimodal", "extension", "video", "avi"),
    window_rank=1,
)
def mm_avi_mjpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL compressed video: text bytes → three 5×4 RGB
    rasters (sliding 60-byte windows) → JPEG-encode each (quality
    90) → mux into an MJPEG AVI → full container parse + JPEG decode
    → per-frame max |error| vs the source rasters, thresholded at
    the quantization budget. Every stage is the repo's own code
    (jpeg.py + this module); payload bytes never leave their
    partition (one zero-shuffle mapInPandas)."""
    import pandas as pd

    from cae_polars_tools_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from cae_polars_tools_spark.operators.multimodal import (
        BMP_H,
        BMP_W,
        JPEG_TOL,
        with_payload,
    )

    n = BMP_W * BMP_H * 3
    n_frames = 3

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "n_frames": [],
                "width": [],
                "height": [],
                "fps": [],
                "within_tol": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                rasters = []
                for i in range(n_frames):
                    win = raw[i * 7 : i * 7 + n].ljust(n, b"\x00")
                    rasters.append(
                        np.frombuffer(win, dtype=np.uint8).reshape(
                            BMP_H, BMP_W, 3
                        )
                    )
                avi = encode_avi_mjpeg(
                    [encode_jpeg(r, quality=90) for r in rasters],
                    BMP_W,
                    BMP_H,
                    fps=10,
                )
                meta, streams = parse_avi_mjpeg(avi)
                err = max(
                    int(
                        np.abs(
                            decode_jpeg(s).astype(np.int32)
                            - r.astype(np.int32)
                        ).max()
                    )
                    for s, r in zip(streams, rasters)
                )
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(meta["n_frames"])
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["fps"].append(meta["fps"])
                out["within_tol"].append(err <= JPEG_TOL)
            yield pd.DataFrame(out)

    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_ROUNDTRIP_BYTES,
    )
    return with_payload(docs).mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames int, width int, height int, "
            "fps int, within_tol boolean"
        ),
    )


def resize_avi_mjpeg(
    payload: bytes, width: int, height: int, quality: int = 90
) -> bytes:
    """REAL video resize: demux → per-frame JPEG decode →
    nearest-neighbor resample → JPEG re-encode (the container must
    stay MJPEG, so frames re-encode through the JPEG codec — a
    documented second lossy generation, exactly what every MJPEG
    transcoder does) → re-mux with the new dimensions and the
    original frame rate. Composes entirely from the repo's own
    codecs, so the output plays anywhere MJPEG does."""
    from cae_polars_tools_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    meta, streams = parse_avi_mjpeg(payload)
    resized = []
    for s in streams:
        px = decode_jpeg(s)
        h, w = px.shape[:2]
        ys = (np.arange(height) * h) // height
        xs = (np.arange(width) * w) // width
        resized.append(encode_jpeg(px[ys][:, xs], quality))
    return encode_avi_mjpeg(resized, width, height, fps=meta["fps"] or 25)

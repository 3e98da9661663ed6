"""Multimodal column handling: opaque binary payloads + typed metadata.

Convention: a multimodal asset is a row with

* ``payload``  — ``binary`` (image/audio/video bytes; opaque to Spark)
* ``meta``     — ``struct<modality string, mime string, n_bytes long>``
  (extend with width/height/sample_rate per modality)

The Spark-side plumbing — schema, partition-parallel batch decode via
``mapInPandas``, feature extraction signatures — is real and tested.
Media decode is REAL for the library-free formats: uncompressed
24-bit BMP is hand-parsed (:func:`decode_bmp` — decode, features,
nearest-neighbor resize all run on actual pixels, oracle-checked by
the ``mm_bmp_features`` corpus entry), PNG decodes with nothing
beyond stdlib ``zlib`` (:func:`decode_png` — chunk walk + all five
spec scanline filters, Adam7 de-interlacing, palette/tRNS, sub-byte
gray+palette depths, gray+alpha, and 16-bit samples; oracle-checked by
``mm_png_features``), baseline AND progressive JPEG encode + decode
with numpy alone (``operators/jpeg.py`` — DCT, quantization,
canonical Huffman, 4:2:2/4:2:0, restart markers, SOF2 successive
approximation; lossy, so round-trips are tolerance-tested plus exact
on flat blocks), GIF decodes including animations
(``operators/gif.py`` — LZW, interlace, compositing/transparency/
disposal; ``split_gif_frames`` demuxes into ``sample_frames``),
baseline TIFF decodes hand-parsed (``operators/tiff.py`` — both byte
orders, strips, PackBits, palette), PCM
WAV decodes via the stdlib ``wave`` module
(:func:`decode_wav`), and uncompressed YUV4MPEG2 video parses for
real in ``operators/y4m.py`` (header walk + planar frame slicing,
value-checked by ``mm_y4m_features``; ``split_y4m_frames`` is a real
``split_fn`` for :func:`sample_frames`), and COMPRESSED video has a
real first-class path too: MJPEG-in-AVI (``operators/avi.py`` — RIFF
container mux/demux + the repo's own JPEG codec per frame,
``split_avi_frames`` demuxes into :func:`sample_frames`,
value-gated by ``mm_avi_mjpeg_roundtrip``). Only inter-frame codecs
(H.264/VP9/…) genuinely need external entropy decoders and stay STUBBED
behind a clear ``NotImplementedError``; swapping in PyAV/ffmpeg there
is a one-line change at the marked seam, and the tested pipeline uses
a deterministic fake decoder for it.

Scale notes: payload bytes never leave their partition (decode is a
map), and feature outputs are small fixed-width rows — the shuffle
(if any) happens after the 1000× data reduction.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import (
    SPREAD_HEAVY_BYTES,
    SPREAD_ROUNDTRIP_BYTES,
    read_table,
    spread,
)
from cae_polars_tools_spark.plans.registry import register


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the multimodal convention columns to the documents table
    (text bytes stand in for media bytes in this environment)."""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("text").alias("modality"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


# --------------------------------------------------------------------------
# Decoder seam (STUB)
# --------------------------------------------------------------------------


def decode_image(payload: bytes) -> Any:
    """Decode image bytes → ndarray. REAL for BMP (:func:`decode_bmp`,
    hand-parsed, 8/24/32-bit), PNG (:func:`decode_png`, stdlib zlib,
    incl. palette/interlaced), baseline+progressive JPEG
    (``operators/jpeg.py``), GIF (``operators/gif.py``) and baseline
    TIFF (``operators/tiff.py``) — no library needed; anything else
    (WebP/AVIF/…) genuinely needs an imaging library absent from this
    environment and raises NotImplementedError — plug a real decoder
    (e.g. PIL.Image.open) into :func:`extract_features` for those."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from cae_polars_tools_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from cae_polars_tools_spark.operators.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from cae_polars_tools_spark.operators.tiff import decode_tiff

        return decode_tiff(payload)
    raise NotImplementedError(
        "image decoding beyond BMP/PNG/JPEG/GIF/TIFF requires an "
        "imaging library not present in this environment; pass "
        "decode_fn= to extract_features()"
    )


def fake_decode(payload: bytes) -> dict[str, int]:
    """Deterministic fake decoder used by tests and the demo pipeline:
    derives fixed 'features' from raw bytes."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
    }


def extract_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes], dict[str, int]] | None = None,
) -> DataFrame:
    """Partition-parallel batch feature extraction over binary payloads
    via ``mapInPandas`` (Arrow batches; payload bytes stay in-partition).
    ``decode_fn`` maps raw bytes → feature dict; defaults to the
    deterministic fake decoder (see module docstring for the real-
    decoder seam)."""
    fn = decode_fn or fake_decode

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                }
            )

    return assets.mapInPandas(
        gen,
        schema="doc_id long, modality string, n_bytes long, first_byte int",
    )


# --------------------------------------------------------------------------
# Resize (image) and frame sampling (video) — same mapInPandas shape
# --------------------------------------------------------------------------

RESIZE_W = 8
RESIZE_H = 4
FRAME_BYTES = 32
FRAME_STEP = 2


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Decode → resample → re-encode. STUB (no imaging library here);
    pass ``resize_fn=`` to :func:`resize_assets`."""
    raise NotImplementedError(
        "image resizing requires an imaging library not present in this "
        "environment; pass resize_fn= to resize_assets()"
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: truncate/zero-pad the payload to exactly
    width×height bytes (a 1-byte-per-pixel 'thumbnail')."""
    n = width * height
    return payload[:n].ljust(n, b"\x00")


def resize_assets(
    assets: DataFrame,
    width: int = RESIZE_W,
    height: int = RESIZE_H,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Batch resize over binary payloads via ``mapInPandas``: payload
    in, fixed-size payload out, meta updated with width/height. Bytes
    never leave their partition; output rows are O(width·height)."""
    fn = resize_fn or fake_resize

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [fn(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(
        gen, schema="doc_id long, payload binary, width int, height int"
    )


def sample_frames(
    assets: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    step: int = FRAME_STEP,
    split_fn: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Frame sampling for video-ish payloads: one input row fans out to
    one output row per kept frame (every ``step``-th). ``split_fn``
    turns container bytes into frame bytes; the default deterministic
    splitter chunks the payload into fixed-size windows, standing in
    for a real demuxer at the marked seam.

    Scale shape: fan-out happens inside ``mapInPandas`` on the
    partition that already holds the bytes — no shuffle, no driver
    involvement, output bounded by len(payload)/step per row."""

    def default_split(payload: bytes) -> list[bytes]:
        return [
            payload[i : i + frame_bytes]
            for i in range(0, len(payload), frame_bytes)
        ]

    fn = split_fn or default_split

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = fn(payload)
                for idx in range(0, len(frames), step):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame"].append(frames[idx])
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen, schema="doc_id long, frame_idx long, frame binary"
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
        WITH idx AS (
            SELECT doc_id,
                   text,
                   unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0)
                                        AS BIGINT))) AS frame_idx
            FROM documents
        )
        SELECT doc_id,
               frame_idx,
               hex(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT),
                          {FRAME_BYTES})) AS frame_hex
        FROM idx
        WHERE frame_idx % {FRAME_STEP} = 0
    """,
    tags=("multimodal", "extension", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling end-to-end on the documents-as-payloads table.
    The corpus text is pure ASCII, so the oracle reconstructs each
    sampled frame with character slicing — value-level verification of
    the fan-out plumbing (row per frame, byte-exact frames). The frame
    is emitted hex-encoded on BOTH engines: byte-exactness is fully
    preserved, and the comparison harness can canonicalize strings
    (raw ``binary`` frames crash pandas sorting — bytearray is
    unhashable)."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    return sample_frames(with_payload(docs)).select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


@register(
    "multimodal_features",
    oracle="""
        SELECT doc_id,
               'text' AS modality,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               ascii(substr(text, 1, 1)) AS first_byte
        FROM documents
    """,
    tags=("multimodal", "extension", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: build payload+meta columns, run
    the batch 'decode'+feature step in mapInPandas. The oracle verifies
    the full plumbing value-for-value (byte length + first byte are
    decoder-independent)."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    return extract_features(with_payload(docs))


# --------------------------------------------------------------------------
# Real decoders for the library-free formats. The stub seam above is
# for formats that genuinely need external codecs (JPEG/PNG/MP4);
# uncompressed BMP is hand-parseable and PCM WAV is Python-stdlib, so
# those two paths are REAL — decode, features, and resize execute on
# actual pixel/sample data end-to-end in this environment.
# --------------------------------------------------------------------------

import struct

import numpy as np


# hostile-bytes guard shared by the image decoders: header-claimed
# dimensions drive allocations BEFORE any pixel data validates, so a
# tiny payload claiming a 65535x65535 canvas would allocate gigabytes.
# 2^27 pixels (~134 MP, ~400 MB as RGB) is far beyond any training
# payload while bounding the worst-case allocation.
MAX_DECODE_PIXELS = 1 << 27


def check_decode_dims(w: int, h: int, what: str) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{what} dimensions {w}x{h} outside the ingest cap "
            f"(max {MAX_DECODE_PIXELS} pixels)"
        )


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) — the
    format's standard layout, written from the public spec."""
    h, w, c = pixels.shape
    assert c == 3
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM",
        14 + 40 + img_size,
        0,
        0,
        14 + 40,
        40,
        w,
        h,
        1,
        24,
        0,
        img_size,
        2835,
        2835,
        0,
        0,
    )
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        # BGR byte order per spec
        body += pixels[y, :, ::-1].tobytes() + b"\x00" * pad
    return header + bytes(body)


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode an uncompressed BMP → uint8 array: 24-bit → (H, W, 3)
    RGB, 32-bit → (H, W, 4) RGBA, 8-bit palette (incl. grayscale
    palettes) → (H, W, 3) RGB via the BGRA color table. Raises
    ValueError on non-BMP bytes and NotImplementedError on
    compressed / other-depth BMPs (those need a real imaging
    library)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp not in (8, 24, 32) or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 8/24/32-bit BMP is hand-decodable (got "
            f"bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    check_decode_dims(w, h, "BMP")
    nch = bpp // 8
    palette = None
    if bpp == 8:
        (clr_used,) = struct.unpack_from("<I", payload, 46)
        n_colors = clr_used or 256
        # color table (BGRA quads) follows the info header
        tbl = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)
        palette = tbl[:, 2::-1]  # BGR(A) → RGB
    row = w * nch
    pad = (-row) % 4
    out = np.empty((h, w, 3 if bpp == 8 else nch), dtype=np.uint8)
    for i in range(h):
        off = data_off + i * (row + pad)
        line = np.frombuffer(payload, dtype=np.uint8, count=row, offset=off)
        y = (h - 1 - i) if bottom_up else i
        if bpp == 8:
            if int(line.max(initial=0)) >= len(palette):
                raise ValueError("BMP palette index out of range")
            out[y] = palette[line]
        elif bpp == 24:
            out[y] = line.reshape(w, 3)[:, ::-1]  # BGR → RGB
        else:  # 32-bit BGRA → RGBA
            px4 = line.reshape(w, 4)
            out[y, :, :3] = px4[:, 2::-1]
            out[y, :, 3] = px4[:, 3]
    return out


# -- PNG: stdlib-only (zlib + per-scanline unfilter) -----------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: "np.ndarray") -> bytes:
    """Encode an 8-bit image as a non-interlaced PNG (stdlib ``zlib``
    only, written from the public spec): (H, W) → grayscale,
    (H, W, 3) → RGB, (H, W, 4) → RGBA. Filter type 0 on every
    scanline — byte-deterministic output."""
    import zlib

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
    elif px.ndim == 3 and px.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0 (None)
        raw += px[y].tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_scanline(
    ftype: int, line: "np.ndarray", prev: "np.ndarray", bpp: int
) -> "np.ndarray":
    """One scanline of PNG unfiltering (spec filters 0-4). Sub uses a
    stride-reshaped cumulative sum (mod-256 wraps for free in uint8);
    Up is fully vectorized; Average/Paeth carry a left-pixel
    dependency and fall back to a per-byte loop."""
    if ftype == 0:  # None
        return line
    if ftype == 2:  # Up
        return (line + prev).astype(np.uint8)
    if ftype == 1:  # Sub: out[i] = line[i] + out[i-bpp]
        n = len(line)
        pad = (-n) % bpp
        cols = np.zeros(n + pad, dtype=np.uint8)
        cols[:n] = line
        out = np.cumsum(
            cols.reshape(-1, bpp).astype(np.uint64), axis=0
        ).astype(np.uint8)
        return out.reshape(-1)[:n]
    out = np.zeros_like(line)
    if ftype == 3:  # Average
        for i in range(len(line)):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        return out
    if ftype == 4:  # Paeth
        for i in range(len(line)):
            left = int(out[i - bpp]) if i >= bpp else 0
            ul = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (int(line[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        return out
    raise ValueError(f"unknown PNG filter type {ftype}")


# Adam7 interlacing: (x0, y0, dx, dy) per pass, from the spec's
# 8x8 tile pattern
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unpack_samples(row: "np.ndarray", depth: int, n: int) -> "np.ndarray":
    """Unpack a packed sub-byte scanline (depth 1/2/4, MSB first) into
    ``n`` samples; depth 8 returns the row as-is."""
    if depth == 8:
        return row[:n]
    per = 8 // depth
    mask = (1 << depth) - 1
    out = np.empty(len(row) * per, dtype=np.uint8)
    for i in range(per):
        out[i::per] = (row >> (8 - depth * (i + 1))) & mask
    return out[:n]


def _unfilter_image(
    raw: "np.ndarray", h: int, w: int, depth: int, channels: int
) -> "np.ndarray":
    """Unfilter ``h`` scanlines of a (sub)image → (h, w*channels)
    samples (sub-byte depths unpacked, 16-bit assembled big-endian
    per the spec). Returns uint8 (depth ≤ 8) or uint16 (depth 16)
    samples in their raw range. Filtering always operates on BYTES
    (bpp = bytes per pixel), exactly as the spec prescribes for every
    depth."""
    stride = (w * channels * depth + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.empty(
        (h, w * channels), dtype=np.uint16 if depth == 16 else np.uint8
    )
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_scanline(int(raw[y, 0]), raw[y, 1:], prev, bpp)
        if depth == 16:
            out[y] = np.frombuffer(prev.tobytes(), dtype=">u2")
        else:
            out[y] = _unpack_samples(prev, depth, w * channels)
    return out


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode a PNG → (H, W[, C]) uint8 array, stdlib only: chunk
    walk, ``zlib`` inflate, per-scanline unfilter (all five spec
    filter types), Adam7 de-interlacing, palette (PLTE, with optional
    tRNS alpha → RGBA) and sub-byte gray/palette depths (1/2/4 bit;
    gray scales to 8-bit exactly). Raises ValueError on non-PNG bytes
    and NotImplementedError on 16-bit images."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 8 - 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if color_type not in (0, 2, 3, 4, 6):
                raise NotImplementedError(f"PNG color type {color_type}")
            allowed = {
                0: (1, 2, 4, 8, 16),  # grayscale
                2: (8, 16),           # RGB
                3: (1, 2, 4, 8),      # palette (indices are <= 8 bit)
                4: (8, 16),           # gray + alpha
                6: (8, 16),           # RGBA
            }
            if depth not in allowed[color_type]:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={color_type} is not "
                    "a spec-legal combination"
                )
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
        elif tag == b"PLTE":
            if len(body) % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    check_decode_dims(w, h, "PNG")
    # bounded inflate: the expected pixel volume is KNOWN from the
    # header, so cap decompression there instead of letting a zip
    # bomb expand a kilobyte payload into gigabytes
    if interlace == 0:
        expect = h * ((w * channels * depth + 7) // 8 + 1)
    else:
        expect = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                expect += ph * ((pw * channels * depth + 7) // 8 + 1)
    dec = zlib.decompressobj()
    inflated = dec.decompress(bytes(idat), expect)
    if dec.unconsumed_tail or (not dec.eof and dec.decompress(b"", 1)):
        raise ValueError("PNG pixel data exceeds the header's dimensions")
    raw = np.frombuffer(inflated, dtype=np.uint8)

    if interlace == 0:
        samples = _unfilter_image(raw, h, w, depth, channels)
    else:
        # Adam7: seven independently-filtered sub-images, pixels
        # scattered back onto the full grid by the pass pattern
        samples = np.zeros(
            (h, w * channels),
            dtype=np.uint16 if depth == 16 else np.uint8,
        )
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * channels * depth + 7) // 8
            need = ph * (stride + 1)
            sub = _unfilter_image(raw[off : off + need], ph, pw, depth, channels)
            off += need
            sub = sub.reshape(ph, pw, channels)
            ys = y0 + np.arange(ph) * dy
            xs = x0 + np.arange(pw) * dx
            grid = samples.reshape(h, w, channels)
            grid[np.ix_(ys, xs)] = sub
        if off != len(raw):
            raise ValueError("PNG interlaced data length mismatch")

    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = samples.reshape(h, w)
        if idx.max(initial=0) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if color_type == 0 and depth < 8:
        # exact 8-bit expansion: 255/(2^d-1) is an integer for 1/2/4
        # (16-bit passes through as uint16 — no rescale)
        samples = samples * np.uint8(255 // ((1 << depth) - 1))
    out = samples
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, channels)


def decode_image_bytes(payload: bytes) -> "np.ndarray":
    """Format-sniffing decode → (H, W, 3) uint8 RGB: real BMP, PNG,
    and baseline-JPEG decoders by magic bytes (grayscale expands to 3
    channels, RGBA drops alpha); anything else falls through to the
    :func:`decode_image` codec seam (video — NotImplementedError in
    this environment)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)[:, :, :3]
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        px = decode_png(payload)
        if px.dtype == np.uint16:  # 16-bit: standard 8-bit reduction
            px = (px >> 8).astype(np.uint8)
        if px.ndim == 2:
            return np.repeat(px[:, :, None], 3, axis=2)
        if px.shape[2] == 2:  # gray + alpha
            return np.repeat(px[:, :, :1], 3, axis=2)
        return px[:, :, :3]
    if payload[:2] == b"\xff\xd8":
        from cae_polars_tools_spark.operators.jpeg import decode_jpeg

        px = decode_jpeg(payload)
        if px.ndim == 2:
            return np.repeat(px[:, :, None], 3, axis=2)
        return px
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from cae_polars_tools_spark.operators.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from cae_polars_tools_spark.operators.tiff import decode_tiff

        px = decode_tiff(payload)
        if px.dtype == np.uint16:  # 16-bit: standard 8-bit reduction
            px = (px >> 8).astype(np.uint8)
        if px.ndim == 2:
            return np.repeat(px[:, :, None], 3, axis=2)
        return px[:, :, :3]
    return decode_image(payload)


def encode_wav_pcm16(samples: "np.ndarray", sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a mono 16-bit PCM WAV (stdlib)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


from functools import lru_cache


@lru_cache(maxsize=1)
def _g711_ulaw_table() -> "np.ndarray":
    """µ-law byte → linear int16, from the G.711 expansion formula
    (sign / 3-bit exponent / 4-bit mantissa with the 0x84 bias)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        sign = u & 0x80
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
        out[b] = -sample if sign else sample
    return out


@lru_cache(maxsize=1)
def _g711_alaw_table() -> "np.ndarray":
    """A-law byte → linear int16, from the G.711 expansion formula
    (even-bit inversion with 0x55, sign-magnitude segments)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        sign = a & 0x80
        exponent = (a >> 4) & 0x07
        mantissa = a & 0x0F
        if exponent:
            sample = ((mantissa << 4) + 0x108) << (exponent - 1)
        else:
            sample = (mantissa << 4) + 8
        out[b] = sample if sign else -sample
    return out


# IMA/DVI ADPCM (WAV format tag 0x11) — public spec constants: the
# 89-entry quantizer step table and the 3-bit-magnitude index
# adaptation table (mirrored for the sign nibbles 8-15).
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX_ADJUST = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32
)


def _ima_expand_channel(
    nibbles: "np.ndarray", predictor: int, index: int
) -> list[int]:
    """Expand one channel's nibble stream within a block. The
    recurrence is inherently sequential (each step's quantizer depends
    on the previous index), so this is a plain loop — bounded by the
    block size, which the format caps at block_align bytes."""
    out = []
    pred = int(predictor)
    idx = min(max(int(index), 0), 88)
    for nib in nibbles:
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        pred = min(max(pred + diff, -32768), 32767)
        out.append(pred)
        idx = min(max(idx + int(_IMA_INDEX_ADJUST[nib]), 0), 88)
    return out


def _decode_wav_ima_adpcm(
    fmt: bytes, data: bytes, fact_samples: int | None
) -> "np.ndarray":
    """IMA/DVI ADPCM ``data`` chunk → (n, ch) int16, per the public
    spec's MS-IMA block layout: per channel a 4-byte block header
    (initial predictor int16, step index, reserved) whose predictor IS
    the block's first output sample, then 4-bit codes at two per byte,
    LOW nibble first — mono as a straight stream, stereo interleaved
    in 4-byte words per channel. A trailing short block decodes by its
    actual length; a ``fact`` chunk's sample count trims encoder
    padding."""
    _tag, ch, _rate = struct.unpack_from("<HHI", fmt, 0)
    (block_align,) = struct.unpack_from("<H", fmt, 12)
    if ch not in (1, 2):
        raise NotImplementedError(f"{ch}-channel IMA ADPCM WAV")
    if block_align < 4 * ch:
        raise ValueError("IMA ADPCM block_align smaller than its headers")
    chans: list[list[int]] = [[] for _ in range(ch)]
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4 * ch:
            break  # dangling bytes cannot hold even the headers
        preds = []
        idxs = []
        for c in range(ch):
            pred, idx, _res = struct.unpack_from("<hBB", block, 4 * c)
            preds.append(pred)
            idxs.append(idx)
            chans[c].append(int(pred))  # header predictor = sample 0
        body = np.frombuffer(block[4 * ch :], dtype=np.uint8)
        nibs = np.empty(len(body) * 2, dtype=np.uint8)
        nibs[0::2] = body & 0x0F  # low nibble first (spec order)
        nibs[1::2] = body >> 4
        if ch == 1:
            chans[0].extend(_ima_expand_channel(nibs, preds[0], idxs[0]))
        else:
            # stereo: 4-byte (8-nibble) words alternate channels
            words = nibs.reshape(-1, 8)
            for c in range(ch):
                chans[c].extend(
                    _ima_expand_channel(
                        words[c::ch].reshape(-1), preds[c], idxs[c]
                    )
                )
    n = min(len(chans[0]), *(len(x) for x in chans))
    if fact_samples is not None:
        n = min(n, fact_samples)
    out = np.empty((n, ch), dtype=np.int16)
    for c in range(ch):
        out[:, c] = np.asarray(chans[c][:n], dtype=np.int16)
    return out


def _decode_wav_g711(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Hand-parsed RIFF path for the compressed formats the stdlib
    ``wave`` module refuses: format tag 6 (A-law) and 7 (µ-law)
    expand through their G.711 lookup tables to int16; tag 0x11
    (IMA/DVI ADPCM — the most common compressed WAV in the wild)
    decodes block-wise through the spec's step/index tables."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    fact_samples = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        elif tag == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack_from("<I", body, 0)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunks")
    tag_id, ch, rate = struct.unpack_from("<HHI", fmt, 0)
    if tag_id == 0x11:
        return rate, _decode_wav_ima_adpcm(fmt, data, fact_samples)
    if tag_id not in (6, 7):
        raise NotImplementedError(f"WAV format tag {tag_id}")
    table = _g711_alaw_table() if tag_id == 6 else _g711_ulaw_table()
    raw = np.frombuffer(data, dtype=np.uint8)
    n = len(raw) // ch
    return rate, table[raw[: n * ch]].reshape(n, ch)


def decode_audio_bytes(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Format-sniffed audio decode — the dispatch every audio operator
    rides so compressed formats get features/fingerprints/dedup for
    free: ``fLaC`` magic → :func:`operators.flac.decode_flac`
    (lossless, sample-exact), ``RIFF`` → :func:`decode_wav` (PCM,
    G.711, IMA ADPCM). MP3/AAC stay documented refusal seams (lossy —
    no sample-exact oracle is possible even in principle)."""
    if payload[:4] == b"fLaC" or payload[:4] == b"OggS":
        from cae_polars_tools_spark.operators.flac import decode_flac

        return decode_flac(payload)
    # MPEG audio frame sync is 11 set bits (0xFF then top 3 bits of
    # the next byte) — covers MP3 with and without CRC protection and
    # ADTS AAC, all lossy. Checked AFTER the fLaC/Ogg container sniff:
    # a raw headerless FLAC frame also starts 0xFF 0xF8, but real
    # .flac payloads always open with the container magic.
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        raise NotImplementedError(
            "MPEG audio (MP3/AAC) is a lossy codec — out of scope (no "
            "sample-exact decode contract is possible); transcode to "
            "FLAC/WAV"
        )
    return decode_wav(payload)


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Decode a WAV → (sample_rate, (n_samples, channels) int array).
    Pure stdlib (``wave``) for PCM; G.711 µ-law/A-law and IMA/DVI
    ADPCM files (which ``wave`` refuses) take a hand-parsed RIFF path
    and expand to int16 through the specs' tables.

    Sample widths: 16-bit → int16; 8-bit (unsigned per the RIFF spec)
    → int16 recentred to signed full scale (``(x - 128) << 8``);
    24-bit and 32-bit little-endian signed → int32; µ-law/A-law →
    int16."""
    import io
    import wave

    try:
        wf_probe = wave.open(io.BytesIO(payload), "rb")
        wf_probe.close()
    except wave.Error:
        return _decode_wav_g711(payload)
    with wave.open(io.BytesIO(payload), "rb") as wf:
        width = wf.getsampwidth()
        if width not in (1, 2, 3, 4):
            raise NotImplementedError(f"{width * 8}-bit PCM WAV")
        rate = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        raw = wf.readframes(n)
        if width == 2:
            arr = np.frombuffer(raw, dtype="<i2").reshape(n, ch)
        elif width == 1:
            u = np.frombuffer(raw, dtype=np.uint8).reshape(n, ch)
            arr = ((u.astype(np.int16) - 128) << 8).astype(np.int16)
        elif width == 4:
            arr = np.frombuffer(raw, dtype="<i4").reshape(n, ch)
        else:  # 24-bit: sign-extend each 3-byte little-endian sample
            b = np.frombuffer(raw, dtype=np.uint8).reshape(n * ch, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v -= (v & 0x800000) << 1  # sign bit → two's complement
            arr = v.reshape(n, ch)
    return rate, arr


def image_features(assets: DataFrame) -> DataFrame:
    """REAL image feature extraction for BMP and PNG payloads
    (format-sniffed per row): width, height, per-channel means — one
    ``mapInPandas`` pass, pixels never leave the partition. Same scale
    shape as :func:`extract_features`; this one runs on actual decoded
    pixels."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "width": [],
                "height": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_image_bytes(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                # exact integer sums, ONE double division — engine-
                # portable (numpy's float pairwise mean could drift in
                # the last ulp vs a SQL AVG)
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                n = px.shape[0] * px.shape[1]
                out["mean_r"].append(sums[0] / n)
                out["mean_g"].append(sums[1] / n)
                out["mean_b"].append(sums[2] / n)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        schema=(
            "doc_id long, width int, height int, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for BMP payloads: nearest-neighbor resample on the
    decoded pixel grid, re-encoded as BMP. Deterministic (pure index
    math) — the real-decoder counterpart of :func:`fake_resize`."""
    px = decode_bmp(payload)[:, :, :3]  # 32-bit inputs drop alpha
    h, w, _ = px.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_bmp(px[ys][:, xs])


def resize_image_bytes(payload: bytes, width: int, height: int) -> bytes:
    """Format-agnostic REAL resize over every decodable still
    (BMP/PNG/baseline JPEG/GIF/TIFF): sniffing decode →
    nearest-neighbor resample → re-encode. Container handling:

    * GIF stays GIF (palette rebuilt from the surviving colors —
      :func:`~cae_polars_tools_spark.operators.gif.resize_gif`);
    * everything else re-encodes as PNG — lossless and
      byte-deterministic regardless of the lossy-or-not input, a
      DOCUMENTED container change for JPEG/TIFF inputs (TIFF has no
      from-scratch encoder here, and re-encoding JPEG would compound
      loss)."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from cae_polars_tools_spark.operators.gif import resize_gif

        return resize_gif(payload, width, height)
    px = decode_image_bytes(payload)
    h, w = px.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_png(px[ys][:, xs])


def audio_features(
    assets: DataFrame, target_rate: int | None = None
) -> DataFrame:
    """REAL audio feature extraction for PCM-WAV payloads: sample
    rate, length, RMS and peak amplitude — one ``mapInPandas`` pass.
    ``target_rate`` normalizes every clip to one rate first
    (:func:`resample_pcm`, fused into the same pass — the
    16 kHz-normalization every speech pipeline runs), so lengths and
    energies are comparable across mixed-rate corpora."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "sample_rate": [],
                "n_samples": [],
                "rms": [],
                "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, arr = decode_audio_bytes(bytes(payload))
                if target_rate is not None:
                    arr = resample_pcm(arr, rate, target_rate)
                    rate = target_rate
                x = arr.astype(np.float64)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_samples"].append(arr.shape[0])
                out["rms"].append(float(np.sqrt((x * x).mean())) if arr.size else 0.0)
                # widen before abs: np.abs of the type's own minimum
                # (int16 -32768 / int32 -2^31) wraps negative,
                # under-reporting the peak of clipped audio
                out["peak"].append(
                    int(np.abs(arr.astype(np.int64)).max()) if arr.size else 0
                )
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        schema=(
            "doc_id long, sample_rate int, n_samples long, "
            "rms double, peak long"  # a clipped 32-bit peak (2^31) overflows int
        ),
    )


def resample_pcm(
    arr: "np.ndarray", old_rate: int, new_rate: int
) -> "np.ndarray":
    """Sample-exact linear-interpolation resampling of an integer PCM
    array ``(n_samples, channels)`` — the 16 kHz-normalization step
    every speech pipeline runs before feature extraction.

    The math is PURE INTEGER so it is engine-portable (a DuckDB
    oracle recomputes it digit-for-digit): with ``num/den`` the
    reduced ratio ``old_rate/new_rate``, output sample ``i`` sits at
    source position ``i·num/den``; its value is the rational
    interpolation ``(x[idx]·(den−rem) + x[idx+1]·rem) / den`` rounded
    HALF-UP via floor division ``(2·v + den) // (2·den)`` (floor, not
    truncation, so negative samples round identically everywhere).
    Output length is DURATION-PRESERVING — ``n_out = ceil(n·new/old)``,
    the ``scipy.signal.resample_poly`` convention, so resampled clips
    concatenate without drift; grid points past the last input sample
    hold its value (right-edge hold, exact by construction since both
    interpolation endpoints clamp to ``x[n−1]``)."""
    from math import gcd

    if old_rate <= 0 or new_rate <= 0:
        raise ValueError("sample rates must be positive")
    # a 1-D mono array would silently broadcast rem[:, None] against
    # the 1-D gathers into an (n_out, n_out) OUTER PRODUCT of garbage
    # — accept the natural mono shape by lifting it to (n, 1) and
    # returning 1-D to match the input
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[:, None]
    elif arr.ndim != 2:
        raise ValueError(
            f"resample_pcm: expected (n_samples,) or "
            f"(n_samples, channels), got ndim={arr.ndim}"
        )
    if old_rate == new_rate:
        out = arr.copy()
        return out[:, 0] if squeeze else out
    g = gcd(old_rate, new_rate)
    num, den = old_rate // g, new_rate // g
    n = arr.shape[0]
    n_out = -((-n * den) // num)  # ceil(n·den/num)
    pos = np.arange(n_out, dtype=np.int64) * num
    idx = pos // den
    rem = (pos % den)[:, None]
    x0 = arr[idx].astype(np.int64)
    x1 = arr[np.minimum(idx + 1, n - 1)].astype(np.int64)
    val = x0 * (den - rem) + x1 * rem
    out = ((2 * val + den) // (2 * den)).astype(arr.dtype)
    return out[:, 0] if squeeze else out


def resample_wav(payload: bytes, rate: int) -> bytes:
    """Decode an audio payload (any format :func:`decode_audio_bytes`
    dispatches — PCM 8/16/24/32-bit WAV, G.711, IMA ADPCM, FLAC),
    resample to ``rate`` with :func:`resample_pcm`, re-encode as PCM
    WAV. Output width follows the decoded dtype: int16 sources emit
    16-bit PCM; int32 sources (24/32-bit) emit 32-bit PCM — the one
    normalization (24→32) is lossless."""
    import io
    import wave

    old_rate, arr = decode_audio_bytes(payload)
    out = resample_pcm(arr, old_rate, rate)
    width = 2 if out.dtype == np.int16 else 4
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(out.shape[1] if out.ndim == 2 else 1)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(
            out.astype("<i2" if width == 2 else "<i4").tobytes()
        )
    return buf.getvalue()


def audio_resample(assets: DataFrame, rate: int) -> DataFrame:
    """Distributed WAV resampling: ``(doc_id, payload)`` →
    ``(doc_id, payload)`` at the target rate — one ``mapInPandas``
    pass, bytes never leave the partition (the multimodal scale
    contract)."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                out["payload"].append(resample_wav(bytes(payload), rate))
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, schema="doc_id long, payload binary")


BMP_W, BMP_H = 5, 4  # demo raster: 60 bytes of text → 5×4 RGB


def _text_to_bmp(
    assets: DataFrame, width: int = BMP_W, height: int = BMP_H
) -> DataFrame:
    """Deterministically materialize a real BMP per document from its
    payload bytes (first W·H·3 bytes, zero-padded) — the corpus has no
    media files, so the demo raster is synthesized; everything
    downstream of this point (encode → decode → features) is the real
    byte-level format path."""
    n = width * height * 3

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)[:n].ljust(n, b"\x00")
                px = np.frombuffer(raw, dtype=np.uint8).reshape(
                    height, width, 3
                )
                out["doc_id"].append(int(doc_id))
                out["payload"].append(encode_bmp(px))
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, schema="doc_id long, payload binary")


# Perceptual difference hash (dHash): grayscale raster, one bit per
# adjacent-column gradient. The classic published recipe is 9×8 → 64
# bits; this engine uses 9×7 → 56 bits so the signature stays strictly
# positive in an int64 on EVERY engine (bit 63 would flip the sign in
# two's-complement BIGINT arithmetic, and DuckDB's `1 << 63` overflow
# behavior is not a contract worth depending on). Banding math is
# identical either way.
DHASH_W, DHASH_H = 9, 7


def image_dhash(
    assets: DataFrame, out_col: str = "dhash"
) -> DataFrame:
    """Perceptual difference hash over REAL decoded pixels: per image,
    integer grayscale g = (299·R + 587·G + 114·B) // 1000, then bit
    y·(W−1)+x = [g(y,x) < g(y,x+1)]. Two images whose content matches
    up to small luminance shifts keep most gradient signs, so near-dup
    detection becomes a Hamming-distance problem on a 56-bit integer —
    the image twin of SimHash's text signature.

    One ``mapInPandas`` pass (format-sniffed decode, vectorized numpy
    gradient per image); pixels never leave their partition and only
    (doc_id, int64) rows come out — at 100 TB of images the signature
    frame that reaches the shuffle is ~16 bytes/row. Integer-only math
    keeps every engine bit-identical (no float luma)."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        weights = np.array([299, 587, 114], dtype=np.int64)
        for pdf in batches:
            ids: list[int] = []
            hs: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_image_bytes(bytes(payload))[:, :, :3]
                g = (px.astype(np.int64) @ weights) // 1000
                bits = (g[:, :-1] < g[:, 1:]).reshape(-1)
                if bits.size > 63:
                    raise ValueError(
                        "image_dhash: raster yields "
                        f"{bits.size} gradient bits; the signature "
                        "must fit a sign-safe int64 (≤63 bits) — "
                        "downsample first (resize_image_bytes)"
                    )
                h = int(
                    (
                        bits.astype(np.int64)
                        << np.arange(bits.size, dtype=np.int64)
                    ).sum()
                )
                ids.append(int(doc_id))
                hs.append(h)
            yield pd.DataFrame({"doc_id": ids, out_col: hs})

    return assets.mapInPandas(gen, schema=f"doc_id long, {out_col} long")


@register(
    "mm_bmp_features",
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   p,
                   ascii(substr(rpad(text, {BMP_W * BMP_H * 3}, chr(0)),
                                p + 1, 1)) AS b
            FROM documents,
                 unnest(range(0, {BMP_W * BMP_H * 3})) AS u(p)
        )
        SELECT doc_id,
               {BMP_W} AS width,
               {BMP_H} AS height,
               AVG(CASE WHEN p % 3 = 0 THEN b END) AS mean_r,
               AVG(CASE WHEN p % 3 = 1 THEN b END) AS mean_g,
               AVG(CASE WHEN p % 3 = 2 THEN b END) AS mean_b
        FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "extension", "bmp"),
    window_rank=1,
)
def mm_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image path, value-checked: text bytes →
    synthesized 5×4 BMP (real encoder) → hand-parsed BMP decode →
    per-channel means from exact integer sums. The oracle reconstructs
    every pixel from the same text bytes in SQL, so the whole
    encode/decode/feature chain is verified value-for-value — not just
    plumbing. Zero shuffle; bytes never leave their partition."""
    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_HEAVY_BYTES,
    )
    return image_features(_text_to_bmp(with_payload(docs)))


def _text_to_png(assets: DataFrame) -> DataFrame:
    """PNG twin of :func:`_text_to_bmp`: same W·H·3 text bytes per
    document, encoded through the stdlib PNG encoder (zlib IDAT,
    filtered scanlines) instead of BMP."""
    n = BMP_W * BMP_H * 3

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)[:n].ljust(n, b"\x00")
                px = np.frombuffer(raw, dtype=np.uint8).reshape(
                    BMP_H, BMP_W, 3
                )
                out["doc_id"].append(int(doc_id))
                out["payload"].append(encode_png(px))
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, schema="doc_id long, payload binary")


@register(
    "mm_png_features",
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   p,
                   ascii(substr(rpad(text, {BMP_W * BMP_H * 3}, chr(0)),
                                p + 1, 1)) AS b
            FROM documents,
                 unnest(range(0, {BMP_W * BMP_H * 3})) AS u(p)
        )
        SELECT doc_id,
               {BMP_W} AS width,
               {BMP_H} AS height,
               AVG(CASE WHEN p % 3 = 0 THEN b END) AS mean_r,
               AVG(CASE WHEN p % 3 = 1 THEN b END) AS mean_g,
               AVG(CASE WHEN p % 3 = 2 THEN b END) AS mean_b
        FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "extension", "png"),
    window_rank=1,
)
def mm_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL PNG path, value-checked against the same SQL
    pixel oracle as ``mm_bmp_features``: text bytes → stdlib PNG
    encode (zlib + filtered scanlines) → chunk-walking decode +
    unfilter → per-channel means. Closes most of the media-codec seam
    without any external imaging library (video remains behind the
    documented NotImplementedError seam)."""
    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_HEAVY_BYTES,
    )
    return image_features(_text_to_png(with_payload(docs)))


# Max per-channel abs error budget at quality 90: measured 33 across
# every sf0.01 text raster (sharp ASCII noise on 5×4 tiles — near the
# codec's worst case); real stream corruption lands at ~128+, so 48
# separates the regimes with margin on both sides.
JPEG_TOL = 48


@register(
    "mm_jpeg_roundtrip",
    # JPEG is LOSSY, so a pixel-value oracle cannot exist; the
    # hash-checked contract is the INVARIANT frame (the
    # pipeline_split_pack pattern): per-doc coverage + dimensions are
    # exact, and within_tol must hash-match the oracle's constant
    # TRUE on every row — any decode drift or stream corruption flips
    # it and fails the gate
    oracle=f"""
        SELECT doc_id,
               {BMP_W} AS width,
               {BMP_H} AS height,
               TRUE AS within_tol
        FROM documents
    """,
    tags=("multimodal", "extension", "jpeg"),
    window_rank=1,
)
def mm_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL baseline-JPEG path (numpy-only encoder AND
    decoder — DCT, quantization, canonical per-image Huffman tables):
    text bytes → 5×4 raster → JPEG encode → full entropy decode →
    per-channel max |error| vs the original raster, thresholded at
    the quality-90 quantization budget. Payloads never leave their
    partition."""
    from cae_polars_tools_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    n = BMP_W * BMP_H * 3

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "within_tol": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)[:n].ljust(n, b"\x00")
                px = np.frombuffer(raw, dtype=np.uint8).reshape(
                    BMP_H, BMP_W, 3
                )
                dec = decode_jpeg(encode_jpeg(px, quality=90))
                err = int(
                    np.abs(
                        dec.astype(np.int32) - px.astype(np.int32)
                    ).max()
                )
                out["doc_id"].append(int(doc_id))
                out["height"].append(dec.shape[0])
                out["width"].append(dec.shape[1])
                out["within_tol"].append(err <= JPEG_TOL)
            yield pd.DataFrame(out)

    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_ROUNDTRIP_BYTES,
    )
    return with_payload(docs).mapInPandas(
        gen,
        schema="doc_id long, width int, height int, within_tol boolean",
    )


# demo audio: one WAV per document, samples = the first WAV_N text
# bytes (zero-padded) as non-negative int16 PCM @ WAV_RATE_IN;
# resampled to WAV_RATE_OUT (ratio 2/3 → interpolation fractions 0,
# 1/3, 2/3 all exercised)
WAV_N = 64
WAV_RATE_IN, WAV_RATE_OUT = 8000, 12000
_WAV_N_OUT = -((-WAV_N * 3) // 2)  # resample_pcm's ceil(n·3/2) = 96


def _text_to_wav(docs: DataFrame) -> DataFrame:
    """Deterministic per-document WAV fixture (the ``_text_to_bmp``
    pattern): first ``WAV_N`` payload bytes, zero-padded, as mono
    16-bit PCM at ``WAV_RATE_IN``."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode()[:WAV_N].ljust(WAV_N, b"\x00")
                samples = np.frombuffer(raw, dtype=np.uint8).astype(
                    np.int16
                )
                out["doc_id"].append(int(doc_id))
                out["payload"].append(
                    encode_wav_pcm16(samples, WAV_RATE_IN)
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


@register(
    "mm_audio_resample",
    # sample-exact twin: ascii() rebuilds the input PCM, then the same
    # pure-integer interpolation — position i*2 over denominator 3,
    # round-half-up via (2v+3)//6 (samples are non-negative here, so
    # DuckDB's // and Python's floor agree by construction)
    oracle=f"""
        WITH s AS (
            SELECT doc_id, u.j AS j,
                   ascii(substr(rpad(text, {WAV_N}, chr(0)), u.j + 1, 1)) AS v
            FROM documents, unnest(range(0, {WAV_N})) AS u(j)
        ),
        o AS (
            SELECT doc_id, g.i AS i,
                   (g.i * 2) // 3 AS idx, (g.i * 2) % 3 AS rem
            FROM documents, unnest(range(0, {_WAV_N_OUT})) AS g(i)
        )
        SELECT o.doc_id,
               o.i AS sample_idx,
               CAST((2 * (s0.v * (3 - o.rem) + s1.v * o.rem) + 3) // 6
                    AS BIGINT) AS sample
        FROM o
        JOIN s s0 ON s0.doc_id = o.doc_id AND s0.j = o.idx
        JOIN s s1 ON s1.doc_id = o.doc_id
                 AND s1.j = LEAST(o.idx + 1, {WAV_N - 1})
    """,
    tags=("multimodal", "audio", "extension"),
    window_rank=1,
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audio resampling through the REAL WAV path: text
    bytes → 16-bit PCM WAV @ 8 kHz → :func:`audio_resample` to
    12 kHz (decode → exact-rational linear interpolation → re-encode)
    → decode again and emit EVERY output sample as a row. The DuckDB
    oracle recomputes the interpolation in pure integer SQL, so the
    gate is sample-for-sample — any drift in the codec round-trip,
    the rational position math, or the rounding convention flips the
    value hash."""

    def decode_gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "samples": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, arr = decode_audio_bytes(bytes(payload))
                assert rate == WAV_RATE_OUT
                out["doc_id"].append(int(doc_id))
                out["samples"].append(arr[:, 0].astype(np.int64))
            yield pd.DataFrame(out)

    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_HEAVY_BYTES,
    )
    resampled = audio_resample(_text_to_wav(docs), WAV_RATE_OUT)
    decoded = resampled.mapInPandas(
        decode_gen, schema="doc_id long, samples array<long>"
    )
    return decoded.select(
        "doc_id",
        F.posexplode("samples").alias("sample_idx", "sample"),
    ).select(
        "doc_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        "sample",
    )


def sniff_image_info(payload: bytes) -> tuple[str, int, int]:
    """(format, width, height) from the HEADER bytes alone — no pixel
    decode, no decompression, no palette read. This is the 100 TB
    metadata pass: cataloging a petabyte of images must read a few
    dozen bytes per file (on object stores: one small ranged GET), not
    inflate pixels. Formats: BMP (BITMAPINFOHEADER dims), PNG (IHDR),
    GIF (logical screen descriptor), JPEG (marker walk to the first
    SOF0/1/2 frame header — still header-only: entropy-coded data is
    never touched). Raises ValueError on anything else, truncated
    included."""
    if len(payload) >= 26 and payload[:2] == b"BM":
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = abs(int.from_bytes(payload[22:26], "little", signed=True))
        return "bmp", w, h
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        return (
            "png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError("sniff_image_info: corrupt JPEG walk")
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                if i + 9 > len(payload):
                    break
                return (
                    "jpeg",
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            # TEM (0x01) and RSTn/EOI (0xD0-0xD9) are standalone —
            # no 2-byte length follows; reading one as a segment
            # length misparses any valid JPEG carrying them pre-SOF.
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
                break
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        raise ValueError("sniff_image_info: JPEG without a SOF header")
    raise ValueError("sniff_image_info: unrecognized image payload")


@register(
    "mm_image_info",
    # dims are a per-doc formula and the format cycles with doc_id —
    # the oracle recomputes the whole catalog row from doc_id alone
    oracle="""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'bmp'
                               WHEN 1 THEN 'png'
                               ELSE 'gif' END AS format,
               CAST(3 + doc_id % 4 AS INT) AS width,
               CAST(2 + doc_id % 3 AS INT) AS height
        FROM documents
    """,
    tags=("multimodal", "metadata", "extension"),
    window_rank=1,
)
def mm_image_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image cataloging WITHOUT decode: a mixed BMP/PNG/GIF corpus
    (format cycles by doc_id, dimensions vary per document) is
    inventoried by :func:`sniff_image_info` — header bytes only, the
    pass that makes a petabyte image catalog cost ranged GETs instead
    of decompression. Zero shuffle; truncation robustness (64 header
    bytes suffice) is unit-tested."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        from cae_polars_tools_spark.operators.gif import encode_gif

        gray16 = np.stack([np.arange(0, 256, 16, dtype=np.uint8)] * 3, 1)
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "format": [],
                "width": [],
                "height": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                w, h = 3 + doc_id % 4, 2 + doc_id % 3
                raw = (text or "").encode()[: w * h * 3]
                raw = raw.ljust(w * h * 3, b"\x00")
                px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
                kind = doc_id % 3
                if kind == 0:
                    payload = encode_bmp(px)
                elif kind == 1:
                    payload = encode_png(px)
                else:
                    payload = encode_gif(px[:, :, 0] // 16, gray16)
                fmt, sw, sh = sniff_image_info(payload)
                out["doc_id"].append(doc_id)
                out["format"].append(fmt)
                out["width"].append(sw)
                out["height"].append(sh)
            yield pd.DataFrame(out)

    docs = spread(read_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, format string, width int, height int"
    )


def audio_fingerprint(
    assets: DataFrame,
    frame_samples: int = 160,
    out_col: str = "afp",
) -> DataFrame:
    """Acoustic fingerprint as a bit signature: per WAV payload,
    exact int64 frame energies (Σv² over ``frame_samples``-sample
    frames — the same primitive as :func:`audio_frame_energy`), one
    bit per adjacent-frame energy gradient. The audio twin of
    :func:`image_dhash`: energy CONTOUR survives re-encoding and gain
    riding far better than raw bytes, so near-duplicate clips become
    a Hamming-distance problem on an int64 — feed the output to
    ``dedup.hamming_pairs``. The published shape this distills is the
    spectral-band energy-difference fingerprint (Haitsma–Kalker); the
    time-domain energy contour keeps it FFT-free and therefore
    integer-exact on every engine.

    One ``mapInPandas`` pass (real WAV decode, vectorized reshape/
    square/sum per payload); audio bytes never leave their partition,
    16 bytes/row come out. The frame count must give ≤63 gradient
    bits (sign-safe int64) — pick ``frame_samples`` accordingly."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            hs: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, arr = decode_audio_bytes(bytes(payload))
                mono = arr[:, 0].astype(np.int64)
                n_frames = len(mono) // frame_samples
                e = (
                    (mono[: n_frames * frame_samples] ** 2)
                    .reshape(n_frames, frame_samples)
                    .sum(axis=1)
                )
                bits = e[:-1] < e[1:]
                if bits.size > 63:
                    raise ValueError(
                        "audio_fingerprint: "
                        f"{bits.size} gradient bits; the signature "
                        "must fit a sign-safe int64 (≤63 bits) — "
                        "raise frame_samples"
                    )
                h = int(
                    (
                        bits.astype(np.int64)
                        << np.arange(bits.size, dtype=np.int64)
                    ).sum()
                )
                ids.append(int(doc_id))
                hs.append(h)
            yield pd.DataFrame({"doc_id": ids, out_col: hs})

    return assets.mapInPandas(gen, schema=f"doc_id long, {out_col} long")


def audio_frame_energy(
    assets: DataFrame, frame_samples: int = 160
) -> DataFrame:
    """Frame-level energy — the primitive under voice-activity
    detection and silence trimming (a 10 ms frame at 16 kHz is the
    classic ``frame_samples=160``): decode each WAV, split channel 0
    into consecutive frames of ``frame_samples``, and emit the exact
    INTEGER energy ``Σ v²`` per frame (int64 — exact for any PCM
    width, so downstream thresholds are bit-portable). The trailing
    partial frame is kept (real VADs pad; energy of fewer samples is
    still well-defined). One ``mapInPandas`` pass, bytes never leave
    the partition. Returns ``(doc_id, frame_id, energy)``."""
    if frame_samples <= 0:
        raise ValueError("frame_samples must be positive")

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_id": [],
                "energy": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, arr = decode_audio_bytes(bytes(payload))
                x = arr[:, 0].astype(np.int64)
                n_frames = -(-len(x) // frame_samples) if len(x) else 0
                for i in range(n_frames):
                    fr = x[i * frame_samples : (i + 1) * frame_samples]
                    out["doc_id"].append(int(doc_id))
                    out["frame_id"].append(i)
                    out["energy"].append(int((fr * fr).sum()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen, schema="doc_id long, frame_id long, energy long"
    )


VAD_FRAME = 16          # demo frame: 16 samples → 4 frames of the 64
VAD_THRESHOLD = 100_000  # zero-padded silence vs ascii-text frames


@register(
    "mm_audio_frame_energy",
    # integer-exact twin: rebuild the PCM from ascii bytes, square and
    # sum per 16-sample frame, threshold — no floating point anywhere
    oracle=f"""
        SELECT doc_id,
               u.j // {VAD_FRAME} AS frame_id,
               CAST(SUM(CAST(ascii(substr(rpad(text, {WAV_N}, chr(0)),
                                     u.j + 1, 1)) AS BIGINT)
                   * ascii(substr(rpad(text, {WAV_N}, chr(0)),
                                  u.j + 1, 1))) AS BIGINT) AS energy,
               SUM(CAST(ascii(substr(rpad(text, {WAV_N}, chr(0)),
                                     u.j + 1, 1)) AS BIGINT)
                   * ascii(substr(rpad(text, {WAV_N}, chr(0)),
                                  u.j + 1, 1))) >= {VAD_THRESHOLD}
                   AS is_speech
        FROM documents, unnest(range(0, {WAV_N})) AS u(j)
        GROUP BY doc_id, u.j // {VAD_FRAME}
    """,
    tags=("multimodal", "audio", "extension"),
    window_rank=1,
)
def mm_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD primitive through the real WAV path: per-16-sample frame
    energies of the demo PCM (text bytes @ 8 kHz) with a speech/
    silence verdict — zero-padded tails classify silent, text frames
    speech. Energy is an exact int64 sum of squares, so the DuckDB
    twin matches bit-for-bit."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    frames = audio_frame_energy(_text_to_wav(docs), VAD_FRAME)
    return frames.select(
        "doc_id",
        "frame_id",
        "energy",
        (F.col("energy") >= VAD_THRESHOLD).alias("is_speech"),
    )

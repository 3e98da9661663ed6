"""GIF (87a/89a) decoding — pure Python + numpy, from the public spec.

The fourth real image codec (after BMP, PNG, JPEG) and the second real
ANIMATION source (after y4m): variable-width LSB-first LZW with
dictionary reset/growth, global and local color tables, the 4-pass row
interlace, GIF89a graphics-control extensions (per-frame delay,
transparency index, disposal methods 0-3), and frame compositing onto
the logical screen. ``split_gif_frames`` plugs the composited frames
into ``multimodal.sample_frames`` exactly like the y4m demuxer.

Reference parity: the reference engine has no media operators at all
(`/root/reference/src` is the zarr data-access layer only) — this is
part of the beyond-reference multimodal surface.

Encoding is out of scope (the tests hand-assemble streams, including
an independent in-test LZW compressor, so the decoder is verified
against the spec rather than against a sibling encoder).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGICS = (b"GIF87a", b"GIF89a")


class _LzwReader:
    """Variable-width LSB-first code reader over concatenated
    sub-block bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """Decode a GIF LZW stream to exactly ``n_pixels`` palette
    indices (extra trailing codes are ignored, per common practice)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    rd = _LzwReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def reset():
        return (
            {i: (i,) for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: tuple[int, ...] | None = None
    while n_out < n_pixels:
        code = rd.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK special case
        else:
            raise ValueError("corrupt GIF LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = entry[:take]
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            # width grows when the NEXT code to assign would not fit;
            # capped at 12 bits per spec
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF's 4-pass row interlace → natural row order."""
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif_frames(payload: bytes) -> tuple[dict, np.ndarray]:
    """Decode all frames of a GIF → ``(meta, (N, H, W, 3) uint8 RGB)``
    composited onto the logical screen (disposal methods 0-3,
    transparency honored). ``meta`` carries ``width/height/n_frames/
    delays_cs`` (per-frame delay in centiseconds; 0 for plain GIF87a
    frames). Raises ValueError on non-GIF or corrupt bytes."""
    if payload[:6] not in _MAGICS:
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_frames_inner(payload)
    except (IndexError, KeyError, struct.error) as e:
        # truncated/corrupt streams surface as clean ValueError — a
        # hostile-bytes ingest pipeline must never see the internals
        raise ValueError(f"truncated or corrupt GIF: {e!r}") from e


def _decode_gif_frames_inner(payload: bytes) -> tuple[dict, np.ndarray]:
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    from cae_polars_tools_spark.operators.multimodal import check_decode_dims

    check_decode_dims(w, h, "GIF")
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3

    # compositing state
    screen = np.zeros((h, w, 3), dtype=np.uint8)
    if global_table is not None and bg_idx < len(global_table):
        screen[:] = global_table[bg_idx]
    drawn = np.zeros((h, w), dtype=bool)  # transparency: never-drawn areas
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("GIF sub-blocks truncated")
            n = payload[p]
            p += 1
            if n == 0:
                return p
            p += n

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos + 1 > len(payload):
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphics control
                size = payload[pos]
                if size != 4:
                    raise ValueError("bad GIF graphics-control block")
                gc_packed, delay = struct.unpack_from(
                    "<BH", payload, pos + 1
                )
                t_idx = payload[pos + 4]
                disposal = (gc_packed >> 2) & 0x07
                transparent = t_idx if gc_packed & 0x01 else None
                pos += 5
                if payload[pos] != 0:
                    raise ValueError("bad GIF graphics-control terminator")
                pos += 1
            else:  # comment / plain text / application: skip
                pos = skip_subblocks(pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF frame has no color table")
        if left + fw > w or top + fh > h:
            raise ValueError("GIF frame exceeds the logical screen")
        min_code = payload[pos]
        pos += 1
        sub = bytearray()
        while True:
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            sub += payload[pos : pos + n]
            pos += n
        idx = _lzw_decode(min_code, bytes(sub), fw * fh).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF palette index out of range")

        saved = saved_drawn = None
        if disposal == 3:
            saved = screen[top : top + fh, left : left + fw].copy()
            saved_drawn = drawn[top : top + fh, left : left + fw].copy()
        region = screen[top : top + fh, left : left + fw]
        region_drawn = drawn[top : top + fh, left : left + fw]
        opaque = (
            np.ones((fh, fw), dtype=bool)
            if transparent is None
            else idx != transparent
        )
        region[opaque] = table[idx[opaque]]
        region_drawn[opaque] = True
        from cae_polars_tools_spark.operators.multimodal import (
            MAX_DECODE_PIXELS,
        )

        if (len(frames) + 1) * w * h > MAX_DECODE_PIXELS:
            # animation volume budget: every frame materializes a full
            # screen copy, so thousands of tiny frames on a large
            # canvas would otherwise out-allocate the payload by
            # orders of magnitude
            raise ValueError(
                "GIF animation volume exceeds the ingest cap "
                f"({len(frames) + 1} frames x {w}x{h})"
            )
        frames.append(screen.copy())
        delays.append(delay)

        if disposal == 2:  # restore to background
            bg = (
                table[bg_idx]
                if global_table is not None and bg_idx < len(table)
                else np.zeros(3, dtype=np.uint8)
            )
            region[:] = bg
            region_drawn[:] = False
        elif disposal == 3 and saved is not None:
            region[:] = saved
            region_drawn[:] = saved_drawn
        transparent = None
        disposal = 0
        delay = 0

    if not frames:
        raise ValueError("GIF contains no image data")
    meta = {
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "delays_cs": delays,
    }
    return meta, np.stack(frames)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Textbook GIF-LZW: CLEAR up front, dictionary growth to 12 bits,
    width grows when the next code to assign would overflow, END last.
    (The decoder's primary verification stays the INDEPENDENT in-test
    compressor — this encoder exists for the write path.)"""
    clear = 1 << min_code_size
    end = clear + 1
    bits: list[int] = []

    def emit(code: int, width: int) -> None:
        for i in range(width):
            bits.append((code >> i) & 1)

    table = {(i,): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for px in indices.reshape(-1):
        cand = buf + (int(px),)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        buf = (int(px),)
    if buf:
        emit(table[buf], width)
    emit(end, width)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        out.append(byte)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode a single-frame GIF89a from (H, W) uint8 palette indices
    and an (N, 3) uint8 RGB palette (N ≤ 256); non-interlaced, global
    color table, full LZW. Byte-deterministic."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if indices.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("need (H, W) indices and an (N, 3) palette")
    if len(palette) > 256:
        raise ValueError("GIF palettes hold at most 256 colors")
    if int(indices.max(initial=0)) >= len(palette):
        raise ValueError("palette index out of range")
    h, w = indices.shape
    size_bits = max((len(palette) - 1).bit_length(), 1) - 1
    n_entries = 2 << size_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0)
    out += palette.tobytes()
    out += b"\x00" * 3 * (n_entries - len(palette))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(size_bits + 1, 2)
    out.append(min_code)
    data = _lzw_encode(indices, min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame of a GIF → (H, W, 3) uint8 RGB (the
    still-image view; use :func:`decode_gif_frames` for animations)."""
    _meta, frames = decode_gif_frames(payload)
    return frames[0]


def split_gif_frames(payload: bytes) -> list[bytes]:
    """REAL demuxer ``split_fn`` for ``multimodal.sample_frames``:
    each composited RGB frame's raw bytes as one item, in animation
    order (the GIF twin of ``y4m.split_y4m_frames``)."""
    _meta, frames = decode_gif_frames(payload)
    return [frames[i].tobytes() for i in range(len(frames))]


# --------------------------------------------------------------------------
# Corpus entry: the GIF chain value-checked end-to-end
# --------------------------------------------------------------------------

GIF_W, GIF_H = 6, 4  # demo raster: 24 text bytes → 6×4 palette indices


def _demo_palette() -> np.ndarray:
    """Deterministic full 256-entry palette whose channels are simple
    byte functions — so the SQL oracle can recompute every decoded
    pixel from the index byte alone: (i, 255-i, i XOR 85)."""
    i = np.arange(256, dtype=np.uint8)
    return np.stack([i, np.uint8(255) - i, i ^ np.uint8(85)], axis=1)


def mm_gif_features(spark, sf_dir: str):
    """End-to-end REAL GIF path, value-checked: text bytes → 6×4
    palette-index raster → full GIF89a encode (LZW) → composited
    decode → per-channel means from exact integer sums. The palette is
    the deterministic (i, 255−i, i⊕85) map, so the oracle reconstructs
    every decoded pixel from the same text bytes in SQL — the whole
    encode/decode chain is verified value-for-value like
    ``mm_bmp_features``. Zero shuffle; payloads never leave their
    partition. (ASCII precondition shared with the other byte-level
    oracles — asserted in tests/test_corpus_oracle.py.)"""
    from collections.abc import Iterator

    from cae_polars_tools_spark.io import (
        SPREAD_HEAVY_BYTES,
        SPREAD_ROUNDTRIP_BYTES,
        read_table,
        spread,
    )
    from cae_polars_tools_spark.operators.multimodal import with_payload

    n = GIF_W * GIF_H
    palette = _demo_palette()

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)[:n].ljust(n, b"\x00")
                idx = np.frombuffer(raw, dtype=np.uint8).reshape(
                    GIF_H, GIF_W
                )
                px = decode_gif(encode_gif(idx, palette))
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                out["doc_id"].append(int(doc_id))
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["mean_r"].append(sums[0] / n)
                out["mean_g"].append(sums[1] / n)
                out["mean_b"].append(sums[2] / n)
            yield pd.DataFrame(out)

    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_ROUNDTRIP_BYTES,
    )
    return with_payload(docs).mapInPandas(
        gen,
        schema=(
            "doc_id long, width int, height int, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def _register_entry() -> None:
    from cae_polars_tools_spark.plans.registry import register

    n = GIF_W * GIF_H
    register(
        "mm_gif_features",
        oracle=f"""
            WITH px AS (
                SELECT doc_id,
                       ascii(substr(rpad(text, {n}, chr(0)), p + 1, 1)) AS b
                FROM documents,
                     unnest(range(0, {n})) AS u(p)
            )
            SELECT doc_id,
                   {GIF_W} AS width,
                   {GIF_H} AS height,
                   AVG(b) AS mean_r,
                   AVG(255 - b) AS mean_g,
                   AVG(xor(b, 85)) AS mean_b
            FROM px GROUP BY doc_id
        """,
        tags=("multimodal", "extension", "gif"),
        window_rank=1,
    )(mm_gif_features)


_register_entry()


def resize_gif(payload: bytes, width: int, height: int) -> bytes:
    """REAL GIF→GIF resize, container preserved: decode the first
    composited frame, nearest-neighbor resample, re-encode as a
    single-frame GIF89a with a palette rebuilt from the surviving
    colors (``np.unique`` — lexicographic, so byte-deterministic).
    Thumbnail targets always fit a GIF palette (≤ width·height
    colors); a target past 256 surviving colors raises rather than
    silently quantizing."""
    px = decode_gif(payload)
    h, w, _ = px.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    small = px[ys][:, xs]
    # a GIF frame holds ≤256 distinct colors and resampling only keeps
    # a subset, so the rebuilt palette always fits — encode_gif's own
    # 256-entry check stays as the backstop
    palette, inverse = np.unique(
        small.reshape(-1, 3), axis=0, return_inverse=True
    )
    return encode_gif(
        inverse.reshape(height, width).astype(np.uint8), palette
    )


def text_to_gif_assets(assets):
    """GIF twin of ``multimodal._text_to_bmp``: materialize a real
    single-frame GIF per document — the first ``GIF_W·GIF_H`` payload
    bytes as palette indices under the deterministic demo palette."""
    from collections.abc import Iterator

    n = GIF_W * GIF_H
    palette = _demo_palette()

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)[:n].ljust(n, b"\x00")
                idx = np.frombuffer(raw, dtype=np.uint8).reshape(
                    GIF_H, GIF_W
                )
                out["doc_id"].append(int(doc_id))
                out["payload"].append(encode_gif(idx, palette))
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, schema="doc_id long, payload binary")


RESIZE_W, RESIZE_H = 3, 2  # 6×4 demo raster → 3×2 thumbnail


def mm_resize_thumbnail(spark, sf_dir: str):
    """The ``resize_assets`` path exercising a REAL format end to end:
    text bytes → real GIF encode → ``resize_image_bytes`` (GIF in,
    GIF out — container preserved through the palette-rebuilding
    re-encoder) → composited decode → per-channel means. Nearest-
    neighbor with the 6×4→3×2 shape keeps source rows {0,2} and
    columns {0,2,4}, so the oracle recomputes every surviving pixel
    straight from the text bytes. Zero shuffle; payloads never leave
    their partition."""
    from cae_polars_tools_spark.io import (
        SPREAD_HEAVY_BYTES,
        SPREAD_ROUNDTRIP_BYTES,
        read_table,
        spread,
    )
    from cae_polars_tools_spark.operators.multimodal import (
        image_features,
        resize_assets,
        resize_image_bytes,
        with_payload,
    )

    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_HEAVY_BYTES,
    )
    resized = resize_assets(
        text_to_gif_assets(with_payload(docs)),
        width=RESIZE_W,
        height=RESIZE_H,
        resize_fn=resize_image_bytes,
    )
    return image_features(resized.select("doc_id", "payload"))


def _register_resize_entry() -> None:
    from cae_polars_tools_spark.plans.registry import register

    n = GIF_W * GIF_H
    register(
        "mm_resize_thumbnail",
        oracle=f"""
            WITH px AS (
                SELECT doc_id,
                       ascii(substr(rpad(text, {n}, chr(0)),
                                    (y * 2) * {GIF_W} + x * 2 + 1,
                                    1)) AS b
                FROM documents,
                     unnest(range(0, {RESIZE_H})) AS yy(y),
                     unnest(range(0, {RESIZE_W})) AS xx(x)
            )
            SELECT doc_id,
                   {RESIZE_W} AS width,
                   {RESIZE_H} AS height,
                   AVG(b) AS mean_r,
                   AVG(255 - b) AS mean_g,
                   AVG(xor(b, 85)) AS mean_b
            FROM px GROUP BY doc_id
        """,
        tags=("multimodal", "extension", "gif", "resize"),
        window_rank=1,
    )(mm_resize_thumbnail)


_register_resize_entry()

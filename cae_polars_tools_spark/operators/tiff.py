"""Baseline TIFF decoding — pure Python + numpy, from the public spec
(TIFF 6.0 + TechNote 2). The fifth real image codec: both byte orders
(II/MM), IFD tag walk, strip assembly, 1/2/4-bit grayscale
(MSB-packed, byte-aligned rows, exact 8-bit expansion), 8- and 16-bit
samples (uint16 out, either byte order), grayscale (BlackIsZero AND
WhiteIsZero), RGB, RGBA, palette-color (16-bit ColorMap), chunky AND
planar (PlanarConfiguration 2) layouts, uncompressed (1), LZW (5,
MSB-first with early change, incl. the horizontal-differencing
predictor), PackBits (32773), and new-style JPEG (7, per-strip JPEG
streams + shared ``JPEGTables`` splicing, decoded by the repo's own
baseline JPEG decoder), old-style JPEG (6, the §22 interchange-stream
form via ``JPEGInterchangeFormat`` or concatenated strips; the
TechNote-2-deprecated per-table reconstruction stays behind a loud
seam), and TILED layouts (§15: fixed-size padded tiles, per-tile
compression + predictor, edge crop, chunky AND plane-major planar
grids, and MSB-packed sub-byte grayscale tiles).

Reference parity: the reference engine has no media operators
(`/root/reference/src` is the zarr data-access layer only) — this is
part of the beyond-reference multimodal surface. Tests hand-assemble
streams with an independent in-test writer (the repo has no TIFF
encoder), so no symmetric codec bug can pass.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 §8)
_WIDTH = 256
_LENGTH = 257
_BITS = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES = 277
_ROWS_PER_STRIP = 278
_STRIP_COUNTS = 279
_PLANAR = 284
_PREDICTOR = 317
_COLORMAP = 320
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_COUNTS = 325
_JPEG_TABLES = 347
_JPEG_IF = 513  # JPEGInterchangeFormat (old-style JPEG, §22)
_JPEG_IF_LEN = 514  # JPEGInterchangeFormatLength

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE) decompression to exactly ``expected``
    bytes."""
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("TIFF PackBits stream truncated")
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            if i + n + 1 > len(data):
                raise ValueError("TIFF PackBits literal truncated")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("TIFF PackBits repeat truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    if len(out) != expected:
        raise ValueError("TIFF PackBits output length mismatch")
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW to exactly ``expected`` bytes: MSB-first codes
    (GIF packs LSB-first), fixed 256/257 clear/EOI, initial width 9,
    and the spec's EARLY CHANGE — the width grows when the next code
    to assign reaches 2^width − 1, one code sooner than GIF."""
    CLEAR, EOI = 256, 257
    acc = nbits = pos = 0
    out = bytearray()

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        v = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        return v

    def reset():
        return {i: bytes([i]) for i in range(256)}, 258, 9

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == CLEAR:
            table, next_code, width = reset()
            prev = None
            continue
        if code == EOI:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1  # early change
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW stream ended early")
    return bytes(out[:expected])


def _read_values(payload: bytes, bo: str, vtype: int, count: int, raw: bytes):
    """An IFD entry's value array: inline when it fits in 4 bytes,
    else at the offset the value field holds."""
    size = _TYPE_SIZE.get(vtype)
    fmt = _TYPE_FMT.get(vtype)
    if size is None or fmt is None:
        raise ValueError(f"unsupported TIFF value type {vtype}")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        buf = payload[off : off + total]
        if len(buf) != total:
            raise ValueError("TIFF value array out of bounds")
    return list(struct.unpack(bo + fmt * count, buf))


def _decode_tiff_jpeg(
    payload: bytes,
    offsets: list,
    counts: list,
    jpeg_tables: bytes | None,
    w: int,
    h: int,
    rows_per_strip: int,
    photo: int,
) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7, TechNote 2): each strip
    is a JPEG stream decoded with the repo's own baseline decoder; a
    ``JPEGTables`` tag holds shared DQT/DHT segments as an abbreviated
    SOI…EOI stream whose body is spliced after each strip's SOI. A
    strip may decode extra MCU-padding rows/cols — cropped to the
    strip's row count and the image width, per the spec."""
    from cae_polars_tools_spark.operators.jpeg import decode_jpeg

    if photo not in (1, 2, 6):
        raise NotImplementedError(
            f"JPEG-in-TIFF photometric {photo} (gray, RGB or YCbCr)"
        )
    tables_body = b""
    if jpeg_tables:
        if (
            jpeg_tables[:2] != b"\xff\xd8"
            or jpeg_tables[-2:] != b"\xff\xd9"
        ):
            raise ValueError("TIFF JPEGTables is not an SOI…EOI stream")
        tables_body = jpeg_tables[2:-2]
    parts = []
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        chunk = payload[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("TIFF strip out of bounds")
        if chunk[:2] != b"\xff\xd8":
            raise ValueError("JPEG-in-TIFF strip lacks SOI")
        if tables_body:
            chunk = b"\xff\xd8" + tables_body + chunk[2:]
        px = decode_jpeg(chunk)
        n_rows = min(rows_per_strip, remaining_rows)
        remaining_rows -= n_rows
        if px.shape[0] < n_rows or px.shape[1 if px.ndim > 1 else 0] < w:
            raise ValueError("JPEG-in-TIFF strip smaller than declared")
        parts.append(px[:n_rows, :w])
    out = np.vstack(parts)
    if out.shape[0] != h:
        raise ValueError("JPEG-in-TIFF row count mismatch")
    return out


def _decode_tiff_oldjpeg(
    payload: bytes,
    tags: dict,
    w: int,
    h: int,
    photo: int,
    planar: int,
) -> np.ndarray:
    """Old-style JPEG-in-TIFF (compression 6, TIFF 6.0 §22): the
    interoperable form stores ONE complete JPEG interchange stream
    located by ``JPEGInterchangeFormat``/``…Length`` (or, from some
    writers, as the concatenated strip bytes). Decode it whole with
    the repo's baseline decoder and crop MCU padding. The deprecated
    per-table reconstruction variant (separate JPEGQTables/DC/AC tags,
    no SOI anywhere — the ambiguity TechNote 2 was written to kill)
    stays behind a loud seam."""
    if planar != 1:
        raise NotImplementedError("planar old-style JPEG-in-TIFF")
    if photo not in (1, 2, 6):
        raise NotImplementedError(
            f"old-style JPEG-in-TIFF photometric {photo} "
            "(gray, RGB or YCbCr)"
        )
    from cae_polars_tools_spark.operators.jpeg import decode_jpeg

    if _JPEG_IF in tags:
        off = tags[_JPEG_IF][0]
        ln = tags.get(_JPEG_IF_LEN, [len(payload) - off])[0]
        stream = payload[off : off + ln]
        if len(stream) != ln:
            raise ValueError("TIFF JPEGInterchangeFormat out of bounds")
    else:
        offsets = tags.get(_STRIP_OFFSETS)
        counts = tags.get(_STRIP_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError(
                "old-style JPEG-in-TIFF lacks both "
                "JPEGInterchangeFormat and strip tables"
            )
        stream = b"".join(
            payload[o : o + c] for o, c in zip(offsets, counts)
        )
    if stream[:2] != b"\xff\xd8":
        raise NotImplementedError(
            "old-style JPEG-in-TIFF without a complete interchange "
            "stream (per-table reconstruction, deprecated by "
            "TechNote 2)"
        )
    px = decode_jpeg(stream)
    if px.shape[0] < h or px.shape[1] < w:
        raise ValueError("old-style JPEG-in-TIFF smaller than declared")
    return px[:h, :w]


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode the FIRST page of a baseline TIFF → (H, W) uint8 gray or
    (H, W, C) uint8 RGB/RGBA. Raises ValueError on non-TIFF/corrupt
    bytes and NotImplementedError on unsupported variants."""
    try:
        return _decode_tiff_inner(payload)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"truncated or corrupt TIFF: {e!r}") from e


def _decode_tiff_inner(payload: bytes) -> np.ndarray:
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list] = {}
    blobs: dict[int, bytes] = {}  # UNDEFINED (type 7) byte payloads
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, vtype, count = struct.unpack_from(bo + "HHI", payload, base)
        raw = payload[base + 8 : base + 12]
        if vtype in _TYPE_FMT:
            tags[tag] = _read_values(payload, bo, vtype, count, raw)
        elif vtype == 7:  # UNDEFINED: raw bytes (JPEGTables et al.)
            if count <= 4:
                blobs[tag] = raw[:count]
            else:
                (off,) = struct.unpack(bo + "I", raw)
                blob = payload[off : off + count]
                if len(blob) != count:
                    raise ValueError("TIFF UNDEFINED value out of bounds")
                blobs[tag] = blob

    def one(tag, default=None):
        if tag in tags:
            return tags[tag][0]
        if default is not None:
            return default
        raise ValueError(f"TIFF missing required tag {tag}")

    w, h = one(_WIDTH), one(_LENGTH)
    from cae_polars_tools_spark.operators.multimodal import check_decode_dims

    check_decode_dims(w, h, "TIFF")
    spp = one(_SAMPLES, default=1)
    bits = tags.get(_BITS, [8] * spp)
    comp = one(_COMPRESSION, default=1)
    photo = one(_PHOTOMETRIC)
    planar = one(_PLANAR, default=1)
    if not (
        all(b == 8 for b in bits)
        or all(b == 16 for b in bits)
        or (len(bits) == 1 and bits[0] in (1, 2, 4))
    ):
        raise NotImplementedError(
            f"only uniform 1/2/4-bit gray or 8-/16-bit TIFF samples "
            f"(got {bits})"
        )
    depth = bits[0]
    predictor = one(_PREDICTOR, default=1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if _TILE_OFFSETS in tags:
        if comp not in (1, 5, 32773):
            raise NotImplementedError(f"tiled TIFF compression {comp}")
        if depth < 8:
            # tiled sub-byte grayscale: tile rows pad to byte
            # boundaries like strip rows (§15 tiles are just fixed
            # size strips), MSB-first packing, edge tiles cropped
            if spp != 1 or planar != 1 or photo not in (0, 1):
                raise NotImplementedError(
                    "tiled sub-byte TIFF supports 1-sample grayscale only"
                )
            if predictor != 1:
                raise NotImplementedError(
                    "horizontal predictor with sub-byte samples"
                )
            vals = _decode_tiff_tiles_subbyte(
                payload, tags, bo, w, h, depth, comp, one
            )
            g = vals * np.uint8(255 // ((1 << depth) - 1))
            if photo == 0:
                return np.uint8(255) - g
            return g
        px = _decode_tiff_tiles(
            payload, tags, bo, w, h, spp, depth, comp, predictor, one,
            planar,
        )
        return _apply_photometric(px, photo, depth, spp, tags)

    if comp == 6:  # old-style JPEG (§22): one interchange stream
        return _decode_tiff_oldjpeg(payload, tags, w, h, photo, planar)

    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing or inconsistent")
    rows_per_strip = one(_ROWS_PER_STRIP, default=h)

    if comp == 7:  # new-style JPEG-in-TIFF: strips are JPEG streams
        if planar != 1:
            raise NotImplementedError("planar JPEG-in-TIFF")
        return _decode_tiff_jpeg(
            payload, offsets, counts, blobs.get(_JPEG_TABLES),
            w, h, rows_per_strip, photo,
        )
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (uncompressed, LZW, PackBits "
            "and old-/new-style JPEG)"
        )
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF PlanarConfiguration {planar}")

    if depth < 8:
        # bilevel / sub-byte grayscale: rows pad to byte boundaries
        # (spec §: each row begins on a byte), MSB-first packing
        if spp != 1 or photo not in (0, 1):
            raise NotImplementedError(
                "sub-byte TIFF supports 1-sample grayscale only"
            )
        if predictor != 1:
            raise NotImplementedError(
                "horizontal predictor with sub-byte samples"
            )
        row_bytes = (w * depth + 7) // 8
        raw = bytearray()
        remaining_rows = h
        for off, cnt in zip(offsets, counts):
            chunk = payload[off : off + cnt]
            if len(chunk) != cnt:
                raise ValueError("TIFF strip out of bounds")
            n_rows = min(rows_per_strip, remaining_rows)
            remaining_rows -= n_rows
            want = n_rows * row_bytes
            if comp == 32773:
                chunk = _unpackbits(chunk, want)
            elif comp == 5:
                chunk = _lzw_decode_tiff(chunk, want)
            elif len(chunk) != want:
                raise ValueError("TIFF strip length mismatch")
            raw += chunk
        if len(raw) != h * row_bytes:
            raise ValueError("TIFF pixel data length mismatch")
        packed = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(
            h, row_bytes
        )
        bits_arr = np.unpackbits(packed, axis=1)[:, : w * depth]
        weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.uint8)
        vals = (
            bits_arr.reshape(h, w, depth).astype(np.uint16) @ weights
        ).astype(np.uint8)
        # exact 8-bit expansion (255/(2^d − 1) is integral for 1/2/4)
        g = vals * np.uint8(255 // ((1 << depth) - 1))
        if photo == 0:
            return (np.uint8(255) - g)
        return g

    item = depth // 8
    n_row_groups = -(-h // rows_per_strip)
    if planar == 2 and len(offsets) != n_row_groups * spp:
        raise ValueError("planar TIFF strip count mismatch")
    plane_w = w * (spp if planar == 1 else 1)
    raws = [bytearray() for _ in range(spp if planar == 2 else 1)]
    remaining_rows = h
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        chunk = payload[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("TIFF strip out of bounds")
        if planar == 2:
            plane = si // n_row_groups
            group = si % n_row_groups
            n_rows = min(rows_per_strip, h - group * rows_per_strip)
        else:
            plane = 0
            n_rows = min(rows_per_strip, remaining_rows)
            remaining_rows -= n_rows
        want = n_rows * plane_w * item
        if comp == 32773:
            chunk = _unpackbits(chunk, want)
        elif comp == 5:
            chunk = _lzw_decode_tiff(chunk, want)
        elif len(chunk) != want:
            raise ValueError("TIFF strip length mismatch")
        raws[plane] += chunk
    if any(len(r) != h * plane_w * item for r in raws):
        raise ValueError("TIFF pixel data length mismatch")
    sample_dt = np.uint8 if depth == 8 else np.dtype(bo + "u2")
    if planar == 2:
        px = np.stack(
            [
                np.frombuffer(bytes(r), dtype=sample_dt).reshape(h, w)
                for r in raws
            ],
            axis=2,
        )
    else:
        px = np.frombuffer(bytes(raws[0]), dtype=sample_dt).reshape(
            h, w, spp
        )
    if depth == 16:
        px = px.astype(np.uint16)  # native order
    if predictor == 2:
        # horizontal differencing: each sample is stored as the delta
        # to its left neighbor (per channel); invert with a wrapping
        # row cumsum
        mask = (1 << depth) - 1
        px = (px.astype(np.uint64).cumsum(axis=1) & mask).astype(
            px.dtype
        )

    return _apply_photometric(px, photo, depth, spp, tags)


def _apply_photometric(
    px: np.ndarray, photo: int, depth: int, spp: int, tags: dict
) -> np.ndarray:
    """(h, w, spp) samples → the decoded image under the photometric
    interpretation (shared by the strip and tile paths)."""
    if photo == 3:  # palette
        if depth != 8:
            raise NotImplementedError("palette TIFF indices must be 8-bit")
        cmap = tags.get(_COLORMAP)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("TIFF palette image missing 256-entry ColorMap")
        if spp != 1:
            raise ValueError("TIFF palette image must have 1 sample/pixel")
        # ColorMap values are 16-bit; the standard 8-bit reduction
        table = (
            np.array(cmap, dtype=np.uint16).reshape(3, 256).T >> 8
        ).astype(np.uint8)
        return table[px[:, :, 0]]
    if photo in (0, 1):  # gray (0 = WhiteIsZero inverts)
        if spp != 1:
            raise NotImplementedError("multi-sample grayscale TIFF")
        g = px[:, :, 0]
        if photo == 0:
            return (np.array((1 << depth) - 1, dtype=g.dtype) - g)
        return g.copy()
    if photo == 2:  # RGB / RGBA
        if spp not in (3, 4):
            raise NotImplementedError(f"RGB TIFF with {spp} samples")
        return px.copy()
    raise NotImplementedError(f"TIFF photometric interpretation {photo}")


def _decode_tiff_tiles(
    payload: bytes,
    tags: dict,
    bo: str,
    w: int,
    h: int,
    spp: int,
    depth: int,
    comp: int,
    predictor: int,
    one,
    planar: int = 1,
) -> np.ndarray:
    """Tiled layout (TIFF 6.0 §15): the image is a grid of FIXED
    tw×tl tiles, edge tiles padded to full size; tiles are stored
    row-major, each compressed independently, and the horizontal
    predictor runs per tile row. With PlanarConfiguration 2 the grid
    repeats once per sample, plane-major (all tiles of sample 0, then
    sample 1, …) and each tile carries ONE sample's data. Returns the
    assembled (h, w, spp) sample array (edge padding cropped)."""
    tw = one(_TILE_WIDTH)
    tl = one(_TILE_LENGTH)
    if tw <= 0 or tl <= 0:
        raise ValueError("TIFF tile dimensions must be positive")
    offsets = tags.get(_TILE_OFFSETS)
    counts = tags.get(_TILE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF tile tables missing or inconsistent")
    across = -(-w // tw)
    down = -(-h // tl)
    n_planes = spp if planar == 2 else 1
    tile_spp = 1 if planar == 2 else spp
    if len(offsets) != across * down * n_planes:
        raise ValueError("TIFF tile count mismatch")
    item = depth // 8
    want = tl * tw * tile_spp * item
    sample_dt = np.uint8 if depth == 8 else np.dtype(bo + "u2")
    out = np.zeros((h, w, spp), dtype=np.uint8 if depth == 8 else np.uint16)
    for ti, (off, cnt) in enumerate(zip(offsets, counts)):
        chunk = payload[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("TIFF tile out of bounds")
        if comp == 32773:
            chunk = _unpackbits(chunk, want)
        elif comp == 5:
            chunk = _lzw_decode_tiff(chunk, want)
        elif len(chunk) != want:
            raise ValueError("TIFF tile length mismatch")
        tile = np.frombuffer(chunk, dtype=sample_dt).reshape(
            tl, tw, tile_spp
        )
        if depth == 16:
            tile = tile.astype(np.uint16)
        if predictor == 2:
            mask = (1 << depth) - 1
            tile = (
                tile.astype(np.uint64).cumsum(axis=1) & mask
            ).astype(tile.dtype)
        plane, gi = divmod(ti, across * down)
        ty, tx = divmod(gi, across)
        y0, x0 = ty * tl, tx * tw
        ys, xs = min(tl, h - y0), min(tw, w - x0)
        if planar == 2:
            out[y0 : y0 + ys, x0 : x0 + xs, plane] = tile[:ys, :xs, 0]
        else:
            out[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
    return out


def _decode_tiff_tiles_subbyte(
    payload: bytes,
    tags: dict,
    bo: str,
    w: int,
    h: int,
    depth: int,
    comp: int,
    one,
) -> np.ndarray:
    """Tiled 1/2/4-bit grayscale: each tile packs MSB-first with rows
    padded to byte boundaries (a tile is just a fixed-size strip,
    §15). Returns the (h, w) RAW sample values (0 … 2^depth − 1);
    the caller applies the exact 8-bit expansion + photometric."""
    tw = one(_TILE_WIDTH)
    tl = one(_TILE_LENGTH)
    if tw <= 0 or tl <= 0:
        raise ValueError("TIFF tile dimensions must be positive")
    offsets = tags.get(_TILE_OFFSETS)
    counts = tags.get(_TILE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF tile tables missing or inconsistent")
    across = -(-w // tw)
    down = -(-h // tl)
    if len(offsets) != across * down:
        raise ValueError("TIFF tile count mismatch")
    row_bytes = (tw * depth + 7) // 8
    want = tl * row_bytes
    weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.uint8)
    out = np.zeros((h, w), dtype=np.uint8)
    for ti, (off, cnt) in enumerate(zip(offsets, counts)):
        chunk = payload[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("TIFF tile out of bounds")
        if comp == 32773:
            chunk = _unpackbits(chunk, want)
        elif comp == 5:
            chunk = _lzw_decode_tiff(chunk, want)
        elif len(chunk) != want:
            raise ValueError("TIFF tile length mismatch")
        packed = np.frombuffer(chunk, dtype=np.uint8).reshape(
            tl, row_bytes
        )
        bits_arr = np.unpackbits(packed, axis=1)[:, : tw * depth]
        vals = (
            bits_arr.reshape(tl, tw, depth).astype(np.uint16) @ weights
        ).astype(np.uint8)
        ty, tx = divmod(ti, across)
        y0, x0 = ty * tl, tx * tw
        ys, xs = min(tl, h - y0), min(tw, w - x0)
        out[y0 : y0 + ys, x0 : x0 + xs] = vals[:ys, :xs]
    return out

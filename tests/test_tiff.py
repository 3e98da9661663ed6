"""TIFF decoder: hand-assembled streams via an independent in-test
writer (the repo has no TIFF encoder — no symmetric codec bug can
pass), both byte orders, strip layouts, PackBits, palette,
WhiteIsZero, and hostile-bytes guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cae_polars_tools_spark.operators.tiff import decode_tiff


def _packbits(data: bytes) -> bytes:
    """Independent PackBits compressor: literal runs + repeat runs."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a repeat run of >= 3
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal run up to the next >=3 repeat (max 128)
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and data[j + r] == data[j] and r < 3:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _pack_subbyte_rows(px: np.ndarray, bits: int) -> np.ndarray:
    """(h, w) values < 2^bits → (h, row_bytes) MSB-first packed rows
    (each row byte-aligned, per the spec)."""
    h, w = px.shape
    expanded = np.zeros((h, w, bits), dtype=np.uint8)
    for b in range(bits):
        expanded[:, :, b] = (px >> (bits - 1 - b)) & 1
    return np.packbits(expanded.reshape(h, w * bits), axis=1)


def _build_tiff(
    px: np.ndarray,
    bo: str = "<",
    photometric: int | None = None,
    rows_per_strip: int | None = None,
    packbits: bool = False,
    colormap: np.ndarray | None = None,
    planar: int = 1,
    bits: int = 8,
):
    """Independent minimal TIFF writer from the spec: header, pixel
    strips (chunky or planar, 8-bit or MSB-packed sub-byte), then one
    IFD."""
    if px.ndim == 2:
        h, w = px.shape
        spp = 1
        photometric = 1 if photometric is None else photometric
    else:
        h, w, spp = px.shape
        photometric = 2 if photometric is None else photometric
    rows_per_strip = rows_per_strip or h
    strips = []
    if bits < 8:
        packed = _pack_subbyte_rows(px, bits)
        for y0 in range(0, h, rows_per_strip):
            raw = packed[y0 : y0 + rows_per_strip].tobytes()
            strips.append(_packbits(raw) if packbits else raw)
    elif planar == 2:
        for c in range(spp):  # plane-major strip order
            for y0 in range(0, h, rows_per_strip):
                raw = px[y0 : y0 + rows_per_strip, :, c].tobytes()
                strips.append(_packbits(raw) if packbits else raw)
    else:
        flat = px.reshape(h, -1)
        for y0 in range(0, h, rows_per_strip):
            raw = flat[y0 : y0 + rows_per_strip].tobytes()
            strips.append(_packbits(raw) if packbits else raw)

    header = struct.pack(
        bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 0
    )  # IFD offset patched below
    body = bytearray(header)
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(body))
        body += s
    if len(body) % 2:
        body += b"\x00"

    entries = []  # (tag, type, count, packed-or-offset-later values)
    extra = bytearray()  # out-of-line value arrays, appended after IFD

    def add(tag, vtype, values):
        entries.append((tag, vtype, values))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [bits] * spp)
    add(259, 3, [32773 if packbits else 1])
    add(262, 3, [photometric])
    add(273, 4, strip_offsets)
    add(277, 3, [spp])
    add(278, 4, [rows_per_strip])
    add(279, 4, [len(s) for s in strips])
    if planar != 1:
        add(284, 3, [planar])
    if colormap is not None:
        add(320, 3, list(colormap.reshape(-1)))
    entries.sort()

    ifd_off = len(body)
    fmt_of = {3: "H", 4: "I"}
    size_of = {3: 2, 4: 4}
    ifd = bytearray(struct.pack(bo + "H", len(entries)))
    after_ifd = ifd_off + 2 + 12 * len(entries) + 4
    for tag, vtype, values in entries:
        packed = struct.pack(bo + fmt_of[vtype] * len(values), *values)
        total = size_of[vtype] * len(values)
        ifd += struct.pack(bo + "HHI", tag, vtype, len(values))
        if total <= 4:
            ifd += packed.ljust(4, b"\x00")
        else:
            ifd += struct.pack(bo + "I", after_ifd + len(extra))
            extra += packed
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    body += ifd + extra
    out = bytearray(body)
    out[4:8] = struct.pack(bo + "I", ifd_off)
    return bytes(out)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_gray_rgb_rgba_roundtrip_both_byte_orders(bo):
    rng = np.random.default_rng(1 if bo == "<" else 2)
    for shape in [(5, 7), (4, 3, 3), (2, 6, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_tiff(_build_tiff(px, bo=bo))
        assert np.array_equal(out, px), (bo, shape)


def test_multi_strip_and_uneven_final_strip():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    out = decode_tiff(_build_tiff(px, rows_per_strip=3))  # strips 3+3+1
    assert np.array_equal(out, px)


def test_packbits_compression():
    rng = np.random.default_rng(4)
    # runs + noise exercises both literal and repeat paths
    px = np.repeat(
        rng.integers(0, 256, size=(6, 4), dtype=np.uint8), 3, axis=1
    )
    out = decode_tiff(_build_tiff(px, packbits=True, rows_per_strip=2))
    assert np.array_equal(out, px)


def test_white_is_zero_inverts():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_tiff(_build_tiff(g, photometric=0))
    assert np.array_equal(out, 255 - g)


def test_palette_colormap_16bit_reduction():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    # 16-bit colormap: value v maps to high byte v>>8
    cmap16 = rng.integers(0, 65536, size=(3, 256), dtype=np.uint16)
    tif = _build_tiff(
        idx, photometric=3, colormap=cmap16.astype(np.uint16)
    )
    out = decode_tiff(tif)
    want = (cmap16.T >> 8).astype(np.uint8)[idx]
    assert np.array_equal(out, want)


def test_dispatch_and_feature_path(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        decode_image_bytes,
        image_features,
    )

    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    tif = _build_tiff(px)
    assert np.array_equal(decode_image_bytes(tif), px)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert np.array_equal(
        decode_image_bytes(_build_tiff(gray)),
        np.repeat(gray[:, :, None], 3, axis=2),
    )
    assets = spark.createDataFrame(
        [(1, bytearray(tif))], "doc_id long, payload binary"
    )
    [r] = image_features(assets).collect()
    assert (r["width"], r["height"]) == (6, 4)
    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    assert r["mean_r"] == sums[0] / 24


def test_guards_and_hostile_bytes():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"RIFF....")
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = _build_tiff(px, packbits=True)
    for cut in range(len(data)):
        try:
            decode_tiff(data[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(150):
        d = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            d[int(rng.integers(4, len(d)))] = int(rng.integers(0, 256))
        try:
            decode_tiff(bytes(d))
        except (ValueError, NotImplementedError):
            pass


def test_unsupported_variants_raise_loudly():
    px = np.zeros((2, 2), dtype=np.uint8)
    # old-style JPEG (6) now decodes the interchange-stream form; the
    # deprecated per-table reconstruction (strip bytes without SOI)
    # refuses loudly, as do non-JPEG strip bytes under new-style (7)
    tif = _build_tiff(px)
    idx = tif.find(struct.pack("<HHI", 259, 3, 1))
    assert idx > 0
    t = bytearray(tif)
    t[idx + 8 : idx + 10] = struct.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="interchange"):
        decode_tiff(bytes(t))
    t[idx + 8 : idx + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError, match="lacks SOI"):
        decode_tiff(bytes(t))
    # an unknown compression scheme is still a loud refusal
    t[idx + 8 : idx + 10] = struct.pack("<H", 8)  # Deflate: not impl
    with pytest.raises(NotImplementedError, match="compression 8"):
        decode_tiff(bytes(t))


def _lzw_compress_tiff(data: bytes) -> bytes:
    """Independent TIFF-LZW compressor: MSB-first packing, CLEAR up
    front, EARLY width change (one code before the table fills the
    width), EOI last."""
    CLEAR, EOI = 256, 257
    bits = []

    def emit(code, width):
        for i in range(width - 1, -1, -1):
            bits.append((code >> i) & 1)

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    buf = b""
    for b in data:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        buf = bytes([b])
    if buf:
        emit(table[buf], width)
    emit(EOI, width)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        chunk = bits[i : i + 8]
        for j, v in enumerate(chunk):
            byte |= v << (7 - j)
        out.append(byte)
    return bytes(out)


def test_lzw_compression_with_and_without_predictor(spark):
    """LZW strips (independent in-test compressor: MSB-first, early
    change) decode exactly; predictor 2 (horizontal differencing per
    channel) inverts with the wrapping row cumsum."""
    import struct as _struct

    from cae_polars_tools_spark.operators.tiff import decode_tiff

    rng = np.random.default_rng(23)
    # runs force dictionary growth through the 9->10 bit early change
    px = np.repeat(
        rng.integers(0, 200, size=(9, 7, 3), dtype=np.uint8), 3, axis=1
    )  # (9, 21, 3)
    h, w, spp = px.shape

    def build(with_predictor):
        rows_per_strip = 4
        strips = []
        for y0 in range(0, h, rows_per_strip):
            block = px[y0 : y0 + rows_per_strip].astype(np.int16)
            if with_predictor:
                block = block.copy()
                block[:, 1:, :] = (
                    block[:, 1:, :] - block[:, :-1, :]
                ) % 256
            strips.append(
                _lzw_compress_tiff(block.astype(np.uint8).tobytes())
            )
        # assemble a minimal little-endian TIFF with LZW + predictor
        entries = []
        extra = bytearray()

        def add(tag, vtype, values):
            entries.append((tag, vtype, values))

        add(256, 4, [w]); add(257, 4, [h]); add(258, 3, [8] * spp)
        add(259, 3, [5]); add(262, 3, [2]); add(277, 3, [spp])
        add(278, 4, [rows_per_strip])
        if with_predictor:
            add(317, 3, [2])
        body = bytearray(b"II*\x00\x00\x00\x00\x00")
        offs = []
        for s_ in strips:
            offs.append(len(body)); body += s_
        if len(body) % 2:
            body += b"\x00"
        add(273, 4, offs); add(279, 4, [len(s_) for s_ in strips])
        entries.sort()
        ifd_off = len(body)
        size_of = {3: 2, 4: 4}; fmt_of = {3: "H", 4: "I"}
        after = ifd_off + 2 + 12 * len(entries) + 4
        ifd = bytearray(_struct.pack("<H", len(entries)))
        for tag, vtype, values in entries:
            packed = _struct.pack("<" + fmt_of[vtype] * len(values), *values)
            ifd += _struct.pack("<HHI", tag, vtype, len(values))
            if size_of[vtype] * len(values) <= 4:
                ifd += packed.ljust(4, b"\x00")
            else:
                ifd += _struct.pack("<I", after + len(extra))
                extra += packed
        ifd += _struct.pack("<I", 0)
        body += ifd + extra
        out = bytearray(body)
        out[4:8] = _struct.pack("<I", ifd_off)
        return bytes(out)

    assert np.array_equal(decode_tiff(build(False)), px)
    assert np.array_equal(decode_tiff(build(True)), px)


def test_16bit_samples_both_byte_orders():
    """16-bit TIFF samples decode to uint16, honoring the file's byte
    order; WhiteIsZero inverts against the 16-bit maximum; the
    horizontal-differencing predictor wraps mod 65536."""
    import struct as _struct

    from cae_polars_tools_spark.operators.tiff import decode_tiff

    rng = np.random.default_rng(29)
    g16 = rng.integers(0, 65536, size=(3, 4), dtype=np.uint16)

    def build16(px, bo, photometric=1, predictor=False):
        h, w = px.shape[:2]
        spp = 1 if px.ndim == 2 else px.shape[2]
        data = px.reshape(h, -1).astype(np.int64)
        if predictor:
            d = data.reshape(h, w, spp).copy()
            d[:, 1:, :] = (d[:, 1:, :] - d[:, :-1, :]) % 65536
            data = d.reshape(h, -1)
        be = (bo + "u2")
        body = bytearray(
            _struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 0)
        )
        off = len(body)
        body += np.ascontiguousarray(data, dtype=be).tobytes()
        entries = [
            (256, 4, [w]), (257, 4, [h]), (258, 3, [16] * spp),
            (259, 3, [1]), (262, 3, [photometric]), (273, 4, [off]),
            (277, 3, [spp]), (278, 4, [h]),
            (279, 4, [data.size * 2]),
        ]
        if predictor:
            entries.append((317, 3, [2]))
        entries.sort()
        ifd_off = len(body)
        fmt_of = {3: "H", 4: "I"}
        size_of = {3: 2, 4: 4}
        after = ifd_off + 2 + 12 * len(entries) + 4
        extra = bytearray()
        ifd = bytearray(_struct.pack(bo + "H", len(entries)))
        for tag, vtype, values in entries:
            packed = _struct.pack(bo + fmt_of[vtype] * len(values), *values)
            ifd += _struct.pack(bo + "HHI", tag, vtype, len(values))
            if size_of[vtype] * len(values) <= 4:
                ifd += packed.ljust(4, b"\x00")
            else:
                ifd += _struct.pack(bo + "I", after + len(extra))
                extra += packed
        ifd += _struct.pack(bo + "I", 0)
        body += ifd + extra
        out = bytearray(body)
        out[4:8] = _struct.pack(bo + "I", ifd_off)
        return bytes(out)

    for bo in ("<", ">"):
        out = decode_tiff(build16(g16, bo))
        assert out.dtype == np.uint16
        assert np.array_equal(out, g16), bo
    # WhiteIsZero at 16-bit inverts against 65535
    out = decode_tiff(build16(g16, "<", photometric=0))
    assert np.array_equal(out, 65535 - g16)
    # predictor at 16-bit wraps mod 65536
    rgb16 = rng.integers(0, 65536, size=(2, 5, 3), dtype=np.uint16)
    out = decode_tiff(build16(rgb16, "<", photometric=2, predictor=True))
    assert np.array_equal(out, rgb16)


def test_planar_configuration_2_roundtrip():
    """PlanarConfiguration=2: plane-major strips reassemble to the
    chunky pixel array exactly, uncompressed and PackBits, with an
    uneven final row group."""
    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    out = decode_tiff(_build_tiff(px, planar=2, rows_per_strip=3))
    assert np.array_equal(out, px)
    out2 = decode_tiff(
        _build_tiff(px, planar=2, rows_per_strip=2, packbits=True)
    )
    assert np.array_equal(out2, px)
    # RGBA planes too
    pxa = rng.integers(0, 256, size=(4, 6, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(_build_tiff(pxa, planar=2)), pxa
    )
    # strip-count mismatch fails loudly
    import struct as _struct

    t = bytearray(_build_tiff(px, planar=2, rows_per_strip=3))
    idx = t.find(_struct.pack("<HHI", 278, 4, 1))
    t[idx + 8 : idx + 12] = _struct.pack("<I", 7)  # 1 group claimed
    with pytest.raises(ValueError, match="strip count mismatch"):
        decode_tiff(bytes(t))


@pytest.mark.parametrize("bits", [1, 2, 4])
@pytest.mark.parametrize("photometric", [0, 1])
def test_sub_byte_gray_decodes_exactly(bits, photometric):
    """1/2/4-bit grayscale: MSB-first packed, byte-aligned rows
    (including a width that does NOT fill the last byte), exact 8-bit
    expansion, WhiteIsZero inversion, multi-strip, and PackBits."""
    rng = np.random.default_rng(10 * bits + photometric)
    px = rng.integers(0, 1 << bits, size=(5, 7), dtype=np.uint8)
    scale = 255 // ((1 << bits) - 1)
    want = (px * scale).astype(np.uint8)
    if photometric == 0:
        want = 255 - want
    out = decode_tiff(
        _build_tiff(px, bits=bits, photometric=photometric,
                    rows_per_strip=2)
    )
    assert np.array_equal(out, want)
    out2 = decode_tiff(
        _build_tiff(px, bits=bits, photometric=photometric,
                    packbits=True)
    )
    assert np.array_equal(out2, want)


def _split_jpeg_tables(stream: bytes):
    """Walk a JFIF stream's segments; return (tables_stream,
    abbreviated_stream) — DQT/DHT lifted into an SOI…EOI tables-only
    stream, everything else kept in order."""
    import struct as _struct

    assert stream[:2] == b"\xff\xd8"
    pos = 2
    tables = bytearray()
    rest = bytearray()
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows to EOI
            rest += stream[pos:]
            break
        (seg_len,) = _struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seg_len]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            rest += seg
        pos += 2 + seg_len
    return (
        b"\xff\xd8" + bytes(tables) + b"\xff\xd9",
        b"\xff\xd8" + bytes(rest),
    )


def _build_jpeg_tiff(strips, w, h, rows_per_strip, photometric,
                     jpeg_tables=None):
    """Independent TIFF writer for compression 7: strips are opaque
    JPEG byte streams; optional JPEGTables (tag 347, UNDEFINED)."""
    import struct as _struct

    body = bytearray(b"II*\x00\x00\x00\x00\x00")
    offs = []
    for s in strips:
        offs.append(len(body))
        body += s
    if len(body) % 2:
        body += b"\x00"
    extra = bytearray()
    entries = []
    spp = 3 if photometric in (2, 6) else 1

    def add(tag, vtype, values, raw=None):
        entries.append((tag, vtype, values, raw))

    add(256, 4, [w]); add(257, 4, [h]); add(258, 3, [8] * spp)
    add(259, 3, [7]); add(262, 3, [photometric]); add(277, 3, [spp])
    add(278, 4, [rows_per_strip]); add(273, 4, offs)
    add(279, 4, [len(s) for s in strips])
    if jpeg_tables is not None:
        add(347, 7, None, jpeg_tables)
    entries.sort()
    ifd_off = len(body)
    size_of = {3: 2, 4: 4, 7: 1}
    fmt_of = {3: "H", 4: "I"}
    after = ifd_off + 2 + 12 * len(entries) + 4
    ifd = bytearray(_struct.pack("<H", len(entries)))
    for tag, vtype, values, raw in entries:
        if vtype == 7:
            packed, count = raw, len(raw)
        else:
            packed = _struct.pack("<" + fmt_of[vtype] * len(values), *values)
            count = len(values)
        ifd += _struct.pack("<HHI", tag, vtype, count)
        if size_of[vtype] * count <= 4:
            ifd += packed.ljust(4, b"\x00")
        else:
            ifd += _struct.pack("<I", after + len(extra))
            extra += packed
    ifd += _struct.pack("<I", 0)
    body += ifd + extra
    out = bytearray(body)
    out[4:8] = _struct.pack("<I", ifd_off)
    return bytes(out)


def test_jpeg_in_tiff_strips_and_shared_tables():
    """New-style JPEG-in-TIFF (compression 7): per-strip JPEG streams
    decode through the repo's baseline decoder and reassemble exactly
    (verified against decoding each strip standalone — the TIFF
    plumbing adds no pixel drift); the JPEGTables variant splices the
    shared DQT/DHT segments after each strip's SOI and must decode
    identically."""
    from cae_polars_tools_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(41)
    h, w, rps = 12, 9, 8
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    strips = [
        encode_jpeg(px[y0 : y0 + rps]) for y0 in range(0, h, rps)
    ]
    want = np.vstack(
        [
            decode_jpeg(s)[: min(rps, h - y0), :w]
            for s, y0 in zip(strips, range(0, h, rps))
        ]
    )
    out = decode_tiff(_build_jpeg_tiff(strips, w, h, rps, 6))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, want)

    # shared-tables form: lift DQT/DHT into JPEGTables. The repo's
    # encoder emits content-optimized Huffman tables, so a REAL
    # shared-tables file needs strips encoded with one table set —
    # model that with two identical-content strips (their streams, and
    # hence tables, are identical).
    px2 = np.vstack([px[:rps], px[:rps]])
    strips2 = [encode_jpeg(px2[y0 : y0 + rps]) for y0 in (0, rps)]
    assert strips2[0] == strips2[1]
    split = [_split_jpeg_tables(s) for s in strips2]
    tables = split[0][0]
    assert split[1][0] == tables
    abbreviated = [s for _t, s in split]
    want2 = np.vstack([decode_jpeg(strips2[0])[:rps, :w]] * 2)
    out2 = decode_tiff(
        _build_jpeg_tiff(abbreviated, w, 2 * rps, rps, 6,
                         jpeg_tables=tables)
    )
    assert np.array_equal(out2, want2)

    # a gray JPEG payload under photometric 1
    g = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    gs = encode_jpeg(g)
    outg = decode_tiff(_build_jpeg_tiff([gs], 5, 6, 6, 1))
    assert np.array_equal(outg, decode_jpeg(gs)[:6, :5])


def _build_tiled_tiff(px, tw, tl, bo="<", packbits=False, lzw=False,
                      predictor=False, planar=1, bits=8,
                      photometric=None):
    """Independent tiled-TIFF writer (spec §15): row-major grid of
    FIXED tw×tl tiles, edge tiles zero-padded to full size. With
    ``planar=2`` the grid repeats plane-major (all tiles of sample 0
    first), one sample per tile; with ``bits`` in (1, 2, 4) tiles
    pack MSB-first with byte-aligned rows."""
    import struct as _struct

    if px.ndim == 2:
        px3 = px[:, :, None]
    else:
        px3 = px
    h, w, spp = px3.shape
    item = px3.dtype.itemsize
    across, down = -(-w // tw), -(-h // tl)
    tiles = []
    plane_list = list(range(spp)) if planar == 2 else [None]
    for plane in plane_list:
        for ty in range(down):
            for tx in range(across):
                nspp = 1 if planar == 2 else spp
                block = np.zeros((tl, tw, nspp), dtype=px3.dtype)
                seg = px3[
                    ty * tl : ty * tl + tl, tx * tw : tx * tw + tw
                ]
                if planar == 2:
                    seg = seg[:, :, plane : plane + 1]
                block[: seg.shape[0], : seg.shape[1]] = seg
                if bits < 8:
                    assert nspp == 1 and not predictor
                    raw = _pack_subbyte_rows(
                        block[:, :, 0], bits
                    ).tobytes()
                else:
                    if predictor:
                        b16 = block.astype(np.int32)
                        b16[:, 1:, :] = (
                            b16[:, 1:, :] - b16[:, :-1, :]
                        ) % (1 << (8 * item))
                        block = b16.astype(px3.dtype)
                    raw = (
                        block.tobytes()
                        if bo == "<"
                        else block.byteswap().tobytes()
                    )
                if packbits:
                    raw = _packbits(raw)
                elif lzw:
                    raw = _lzw_compress_tiff(raw)
                tiles.append(raw)

    comp = 32773 if packbits else (5 if lzw else 1)
    body = bytearray(
        _struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 0)
    )
    offs = []
    for t in tiles:
        offs.append(len(body))
        body += t
    if len(body) % 2:
        body += b"\x00"
    entries = []
    extra = bytearray()

    def add(tag, vtype, values):
        entries.append((tag, vtype, values))

    add(256, 4, [w]); add(257, 4, [h])
    add(258, 3, [bits if bits < 8 else 8 * item] * spp)
    photo = photometric if photometric is not None else (
        1 if spp == 1 else 2
    )
    add(259, 3, [comp]); add(262, 3, [photo])
    add(277, 3, [spp])
    add(322, 4, [tw]); add(323, 4, [tl])
    add(324, 4, offs); add(325, 4, [len(t) for t in tiles])
    if predictor:
        add(317, 3, [2])
    if planar != 1:
        add(284, 3, [planar])
    entries.sort()
    ifd_off = len(body)
    size_of = {3: 2, 4: 4}
    fmt_of = {3: "H", 4: "I"}
    after = ifd_off + 2 + 12 * len(entries) + 4
    ifd = bytearray(_struct.pack(bo + "H", len(entries)))
    for tag, vtype, values in entries:
        packed = _struct.pack(bo + fmt_of[vtype] * len(values), *values)
        ifd += _struct.pack(bo + "HHI", tag, vtype, len(values))
        if size_of[vtype] * len(values) <= 4:
            ifd += packed.ljust(4, b"\x00")
        else:
            ifd += _struct.pack(bo + "I", after + len(extra))
            extra += packed
    ifd += _struct.pack(bo + "I", 0)
    body += ifd + extra
    out = bytearray(body)
    out[4:8] = _struct.pack(bo + "I", ifd_off)
    return bytes(out)


def test_tiled_tiff_roundtrip_all_compressions():
    """Tiled layout: fixed-size padded tiles reassemble exactly with
    edge cropping, for uncompressed, PackBits and LZW(+predictor),
    gray and RGB, including non-divisible image extents."""
    rng = np.random.default_rng(51)
    px = rng.integers(0, 256, size=(7, 10, 3), dtype=np.uint8)
    for kw in ({}, {"packbits": True}, {"lzw": True},
               {"lzw": True, "predictor": True}):
        out = decode_tiff(_build_tiled_tiff(px, 4, 3, **kw))
        assert np.array_equal(out, px), kw
    g = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    assert np.array_equal(decode_tiff(_build_tiled_tiff(g, 4, 4)), g)
    # 16-bit tiles, both byte orders
    px16 = rng.integers(0, 65536, size=(5, 6), dtype=np.uint16)
    for bo in ("<", ">"):
        out16 = decode_tiff(_build_tiled_tiff(px16, 4, 2, bo=bo))
        assert out16.dtype == np.uint16
        assert np.array_equal(out16, px16), bo


def test_tiled_tiff_guards():
    """Tile-table inconsistencies and truncated tiles fail loudly."""
    import struct as _struct

    rng = np.random.default_rng(52)
    px = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    tif = _build_tiled_tiff(px, 4, 4)
    # claim a wrong tile grid (TileWidth 2 → 3x2 grid expected vs the
    # 2x2 = 4 tiles actually present)
    t = bytearray(tif)
    idx = t.find(_struct.pack("<HHI", 322, 4, 1))
    t[idx + 8 : idx + 12] = _struct.pack("<I", 2)
    with pytest.raises(ValueError, match="tile count mismatch"):
        decode_tiff(bytes(t))
    # truncated tile payload
    with pytest.raises(ValueError):
        decode_tiff(tif[: len(tif) // 2])


def test_tiled_planar_roundtrip_all_compressions():
    """Tiled x planar (PlanarConfiguration 2): the tile grid repeats
    plane-major, one sample per tile — must reassemble exactly under
    every supported compression, 8- and 16-bit, both byte orders."""
    rng = np.random.default_rng(61)
    px = rng.integers(0, 256, size=(7, 10, 3), dtype=np.uint8)
    for kw in ({}, {"packbits": True}, {"lzw": True},
               {"lzw": True, "predictor": True}):
        out = decode_tiff(_build_tiled_tiff(px, 4, 3, planar=2, **kw))
        assert np.array_equal(out, px), kw
    # RGBA planar tiles
    pxa = rng.integers(0, 256, size=(5, 5, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(_build_tiled_tiff(pxa, 3, 2, planar=2)), pxa
    )
    # 16-bit planar tiles, both byte orders
    px16 = rng.integers(0, 65536, size=(6, 5, 3), dtype=np.uint16)
    for bo in ("<", ">"):
        out16 = decode_tiff(_build_tiled_tiff(px16, 3, 4, bo=bo, planar=2))
        assert out16.dtype == np.uint16
        assert np.array_equal(out16, px16), bo


@pytest.mark.parametrize("bits", [1, 2, 4])
@pytest.mark.parametrize("photometric", [0, 1])
def test_tiled_sub_byte_gray_decodes_exactly(bits, photometric):
    """Tiled x sub-byte: MSB-packed byte-aligned tile rows expand to
    the exact 8-bit values (same contract as the strip path), with
    WhiteIsZero inversion and edge-tile cropping; PackBits and LZW
    per-tile compression too."""
    rng = np.random.default_rng(62)
    vals = rng.integers(0, 1 << bits, size=(9, 11), dtype=np.uint8)
    scale = 255 // ((1 << bits) - 1)
    want = vals * scale
    if photometric == 0:
        want = 255 - want
    for kw in ({}, {"packbits": True}, {"lzw": True}):
        out = decode_tiff(
            _build_tiled_tiff(vals, 4, 4, bits=bits,
                              photometric=photometric, **kw)
        )
        assert out.dtype == np.uint8
        assert np.array_equal(out, want), (bits, photometric, kw)


def _build_oldjpeg_tiff(stream, w, h, photometric, via_strips=False,
                        planar=None, table_tags=False):
    """Old-style JPEG TIFF (compression 6): the interchange stream
    sits in the file located by JPEGInterchangeFormat/…Length tags
    (or, via_strips, as plain strip bytes — the other writer shape in
    the wild). ``planar=2`` and ``table_tags`` build the two
    TechNote-2-deprecated hostile variants (per-plane streams /
    per-table reconstruction with JPEGProc+JPEGQTables/DC/AC tags and
    no SOI anywhere)."""
    import struct as _struct

    body = bytearray(b"II*\x00\x00\x00\x00\x00")
    stream_off = len(body)
    body += stream
    if len(body) % 2:
        body += b"\x00"
    spp = 3 if photometric in (2, 6) else 1
    entries = []

    def add(tag, vtype, values):
        entries.append((tag, vtype, values))

    add(256, 4, [w]); add(257, 4, [h]); add(258, 3, [8] * spp)
    add(259, 3, [6]); add(262, 3, [photometric]); add(277, 3, [spp])
    if planar is not None:
        add(284, 3, [planar])
    if table_tags:
        # the deprecated per-table shape: JPEGProc=1 (baseline) plus
        # pointers at raw table bytes; entropy data carries no SOI
        add(512, 3, [1])                      # JPEGProc
        add(519, 4, [stream_off] * spp)       # JPEGQTables
        add(520, 4, [stream_off] * spp)       # JPEGDCTables
        add(521, 4, [stream_off] * spp)       # JPEGACTables
    if via_strips:
        add(273, 4, [stream_off]); add(279, 4, [len(stream)])
        add(278, 4, [h])
    else:
        add(513, 4, [stream_off]); add(514, 4, [len(stream)])
    entries.sort()
    ifd_off = len(body)
    size_of = {3: 2, 4: 4}
    fmt_of = {3: "H", 4: "I"}
    after = ifd_off + 2 + 12 * len(entries) + 4
    extra = bytearray()
    ifd = bytearray(_struct.pack("<H", len(entries)))
    for tag, vtype, values in entries:
        packed = _struct.pack("<" + fmt_of[vtype] * len(values), *values)
        ifd += _struct.pack("<HHI", tag, vtype, len(values))
        if size_of[vtype] * len(values) <= 4:
            ifd += packed.ljust(4, b"\x00")
        else:
            ifd += _struct.pack("<I", after + len(extra))
            extra += packed
    ifd += _struct.pack("<I", 0)
    body += ifd + extra
    out = bytearray(body)
    out[4:8] = _struct.pack("<I", ifd_off)
    return bytes(out)


def test_old_style_jpeg_in_tiff_interchange_stream():
    """Old-style JPEG (compression 6, TIFF 6.0 §22): the interchange
    stream located by JPEGInterchangeFormat decodes through the
    baseline decoder and crops MCU padding; the strip-bytes writer
    shape decodes identically. The deprecated per-table
    reconstruction (no SOI) still refuses loudly."""
    from cae_polars_tools_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(63)
    h, w = 10, 9  # non-MCU-aligned → exercises the crop
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stream = encode_jpeg(px, 90)
    want = decode_jpeg(stream)[:h, :w]
    out = decode_tiff(_build_oldjpeg_tiff(stream, w, h, 6))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, want)
    # same stream delivered as strip bytes (no 513/514 tags)
    out2 = decode_tiff(_build_oldjpeg_tiff(stream, w, h, 6,
                                           via_strips=True))
    assert np.array_equal(out2, want)
    # grayscale
    g = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    gs = encode_jpeg(g, 90)
    outg = decode_tiff(_build_oldjpeg_tiff(gs, 5, 6, 1))
    assert np.array_equal(outg, decode_jpeg(gs)[:6, :5])
    # per-table reconstruction variant (strip bytes lack SOI)
    with pytest.raises(NotImplementedError, match="interchange"):
        decode_tiff(
            _build_oldjpeg_tiff(b"\x00" * 32, 5, 6, 1, via_strips=True)
        )


def test_old_style_jpeg_permanent_refusals():
    """The two PERMANENT old-style-JPEG seams (SURVEY §8): TIFF
    TechNote 2 deprecated both shapes because the TIFF 6.0 §22 spec
    was ambiguous enough that writers disagreed on the layout —
    'the old fields should never be written'. Decoding would mean
    guessing a writer; the engine refuses loudly instead.

    (a) full per-table reconstruction: JPEGProc + JPEGQTables/DC/AC
    pointers, entropy strips with no SOI anywhere;
    (b) planar (PlanarConfiguration=2) old-style JPEG — per-plane
    streams with no defined assembly."""
    # (a) faithful per-table fixture — all deprecated tags present
    hostile = bytes(range(64)) * 2  # plausible table/entropy bytes, no SOI
    with pytest.raises(NotImplementedError, match="interchange"):
        decode_tiff(
            _build_oldjpeg_tiff(
                hostile, 5, 6, 6, via_strips=True, table_tags=True
            )
        )
    # (b) planar old-style JPEG refuses BEFORE touching stream bytes
    from cae_polars_tools_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    good_stream = encode_jpeg(px, 90)
    with pytest.raises(NotImplementedError, match="planar"):
        decode_tiff(
            _build_oldjpeg_tiff(good_stream, 5, 6, 6, planar=2)
        )

"""The REAL decode paths: uncompressed BMP (hand-parsed) and PCM WAV
(stdlib) run on actual pixel/sample data — no imaging/audio library
involved. These complement the stub-seam tests for formats that do
need external codecs."""

from __future__ import annotations

import numpy as np
import pytest


def _bmp(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_exact():
    from cae_polars_tools_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    for h, w in [(1, 1), (3, 5), (4, 4), (7, 2)]:  # odd widths hit padding
        px = _bmp(h, w, h * 10 + w)
        out = decode_bmp(encode_bmp(px))
        assert out.shape == (h, w, 3)
        assert (out == px).all()


def test_decode_image_dispatches_bmp_and_rejects_unknown():
    from cae_polars_tools_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
    )

    px = _bmp(2, 3, 7)
    assert (decode_image(encode_bmp(px)) == px).all()
    # BMP/PNG/JPEG/GIF/TIFF are REAL native decode paths now; a
    # genuinely foreign format (WebP here) still hits the
    # NotImplementedError seam
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP....")


def test_resize_bmp_nearest_neighbor_exact():
    from cae_polars_tools_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_bmp,
    )

    px = _bmp(8, 6, 42)
    out = decode_bmp(resize_bmp(encode_bmp(px), width=3, height=4))
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(3) * 6) // 3
    assert (out == px[ys][:, xs]).all()


def test_image_features_on_spark(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        encode_bmp,
        image_features,
    )

    imgs = {i: _bmp(4 + i, 5, i) for i in range(3)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_bmp(px))) for i, px in imgs.items()],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_features(df).collect()}
    for i, px in imgs.items():
        r = rows[i]
        assert (r["height"], r["width"]) == px.shape[:2]
        means = px.reshape(-1, 3).mean(axis=0)
        assert abs(r["mean_r"] - means[0]) < 1e-9
        assert abs(r["mean_b"] - means[2]) < 1e-9


def test_wav_roundtrip_and_audio_features_on_spark(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(3)
    clips = {
        0: (8000, rng.integers(-3000, 3000, size=160, dtype=np.int16)),
        1: (16000, rng.integers(-30000, 30000, size=320, dtype=np.int16)),
    }
    for rate, samples in clips.values():
        r, arr = decode_wav(encode_wav_pcm16(samples, rate))
        assert r == rate
        assert (arr[:, 0] == samples).all()

    df = spark.createDataFrame(
        [
            (i, bytearray(encode_wav_pcm16(s, r)))
            for i, (r, s) in clips.items()
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    for i, (rate, samples) in clips.items():
        r = rows[i]
        assert r["sample_rate"] == rate
        assert r["n_samples"] == len(samples)
        x = samples.astype(np.float64)
        assert abs(r["rms"] - float(np.sqrt((x * x).mean()))) < 1e-9
        assert r["peak"] == int(np.abs(samples).max())


def test_png_roundtrip_exact():
    """encode_png → decode_png is pixel-exact for gray/RGB/RGBA."""
    from cae_polars_tools_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for shape in [(4, 5), (4, 5, 3), (3, 2, 4), (1, 1, 3), (7, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == px.shape
        assert np.array_equal(out, px), shape


def test_png_unfilter_all_spec_filters():
    """Hand-built IDAT streams exercise every scanline filter type
    (None/Sub/Up/Average/Paeth) against a reference unfilter computed
    with the spec's per-byte recurrences."""
    import struct
    import zlib

    from cae_polars_tools_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(11)
    h, w, c = 5, 4, 3
    bpp = c
    stride = w * c
    filt = [0, 1, 2, 3, 4]  # one per row
    raw_rows = rng.integers(0, 256, size=(h, stride), dtype=np.uint8)

    # reference unfilter, straight from the spec recurrences
    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else cc

    expect = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        for i in range(stride):
            x = int(raw_rows[y, i])
            left = int(expect[y, i - bpp]) if i >= bpp else 0
            up = int(expect[y - 1, i]) if y > 0 else 0
            ul = int(expect[y - 1, i - bpp]) if (y > 0 and i >= bpp) else 0
            f = filt[y]
            if f == 0:
                v = x
            elif f == 1:
                v = x + left
            elif f == 2:
                v = x + up
            elif f == 3:
                v = x + (left + up) // 2
            else:
                v = x + paeth(left, up, ul)
            expect[y, i] = v & 0xFF

    body = bytearray()
    for y in range(h):
        body.append(filt[y])
        body += raw_rows[y].tobytes()
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), expect.reshape(h, w, c))


def test_png_rejects_unsupported_variants():
    import struct
    import zlib

    from cae_polars_tools_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    # spec-ILLEGAL combination: 16-bit palette indices
    png_bad = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(png_bad)


def test_image_features_mixed_bmp_png_on_spark(spark):
    """image_features sniffs the format per row: a frame with one BMP
    and one PNG of the same pixels yields identical feature rows."""
    import pandas as pd

    from cae_polars_tools_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        image_features,
    )

    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "payload": [encode_bmp(px), encode_png(px)],
            }
        )
    )
    rows = {r["doc_id"]: r for r in image_features(df).collect()}
    assert rows[1]["width"] == rows[2]["width"] == 5
    assert rows[1]["mean_r"] == rows[2]["mean_r"]
    assert rows[1]["mean_g"] == rows[2]["mean_g"]
    assert rows[1]["mean_b"] == rows[2]["mean_b"]


# ---------------------------------------------------------------------------
# PNG interop: palette, sub-byte depths, Adam7 interlacing
# ---------------------------------------------------------------------------


def _chunkify(tag, body):
    from cae_polars_tools_spark.operators.multimodal import _png_chunk

    return _png_chunk(tag, body)


def _pack_bits(samples, depth):
    """Pack one scanline of sub-byte samples MSB-first (spec order)."""
    per = 8 // depth
    out = bytearray()
    for i in range(0, len(samples), per):
        byte = 0
        group = samples[i : i + per]
        for j, s in enumerate(group):
            byte |= int(s) << (8 - depth * (j + 1))
        out.append(byte)
    return bytes(out)


def _build_png(w, h, depth, color_type, scanlines, extra_chunks=()):
    import struct
    import zlib

    from cae_polars_tools_spark.operators.multimodal import _PNG_SIG

    raw = bytearray()
    for line in scanlines:
        raw.append(0)  # filter None
        raw += line
    out = _PNG_SIG + _chunkify(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    )
    for tag, body in extra_chunks:
        out += _chunkify(tag, body)
    out += _chunkify(b"IDAT", zlib.compress(bytes(raw)))
    out += _chunkify(b"IEND", b"")
    return out


def test_png_palette_decode_with_and_without_trns():
    from cae_polars_tools_spark.operators.multimodal import decode_png

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    png = _build_png(
        4, 2, 8, 3,
        [idx[y].tobytes() for y in range(2)],
        extra_chunks=[(b"PLTE", palette.tobytes())],
    )
    assert np.array_equal(decode_png(png), palette[idx])

    # tRNS: per-entry alpha (shorter than the palette -> rest opaque)
    png_a = _build_png(
        4, 2, 8, 3,
        [idx[y].tobytes() for y in range(2)],
        extra_chunks=[(b"PLTE", palette.tobytes()), (b"tRNS", bytes([0, 128]))],
    )
    out = decode_png(png_a)
    assert out.shape == (2, 4, 4)
    assert np.array_equal(out[..., :3], palette[idx])
    alpha = np.array([0, 128, 255, 255], dtype=np.uint8)
    assert np.array_equal(out[..., 3], alpha[idx])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_palette_and_gray(depth):
    from cae_polars_tools_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(depth)
    w, h = 11, 3  # odd width exercises the partial final byte
    maxv = (1 << depth) - 1
    idx = rng.integers(0, maxv + 1, size=(h, w), dtype=np.uint8)

    # palette at this depth
    palette = np.arange((maxv + 1) * 3, dtype=np.uint8).reshape(-1, 3)
    png_p = _build_png(
        w, h, depth, 3,
        [_pack_bits(idx[y], depth) for y in range(h)],
        extra_chunks=[(b"PLTE", palette.tobytes())],
    )
    assert np.array_equal(decode_png(png_p), palette[idx])

    # grayscale at this depth scales to 8-bit EXACTLY (255/(2^d-1))
    png_g = _build_png(
        w, h, depth, 0, [_pack_bits(idx[y], depth) for y in range(h)]
    )
    assert np.array_equal(decode_png(png_g), idx * (255 // maxv))


def _adam7_passes(w, h):
    table = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
        (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    for x0, y0, dx, dy in table:
        xs = list(range(x0, w, dx))
        ys = list(range(y0, h, dy))
        yield xs, ys


def test_adam7_pass_table_hand_pinned_3x3():
    """The 3x3 pass pixel sets, derived by hand from the spec's 8x8
    tile — pins the pass table itself against a transcription slip
    shared between any generator and the decoder."""
    passes = [
        (xs, ys) for xs, ys in _adam7_passes(3, 3)
    ]
    got = [
        {(x, y) for x in xs for y in ys} for xs, ys in passes
    ]
    assert got == [
        {(0, 0)}, set(), set(), {(2, 0)},
        {(0, 2), (2, 2)}, {(1, 0), (1, 2)},
        {(0, 1), (1, 1), (2, 1)},
    ]
    assert sum(len(s) for s in got) == 9


@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (8, 8), (9, 13), (16, 5)])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_adam7_interlaced_decode(shape, channels):
    """An interlaced PNG built by an independent in-test generator
    (pass extraction + filter-0 scanlines + one zlib stream) must
    decode to the original image exactly."""
    import struct
    import zlib

    from cae_polars_tools_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
    )

    h, w = shape
    rng = np.random.default_rng(hash((shape, channels)) % 2**32)
    if channels == 1:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        color_type = 0
    else:
        px = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
        color_type = 2 if channels == 3 else 6
    raw = bytearray()
    for xs, ys in _adam7_passes(w, h):
        if not xs or not ys:
            continue
        for y in ys:
            raw.append(0)  # filter None
            row = px[y][xs] if channels > 1 else px[y][xs, None]
            raw += row.tobytes()
    png = (
        _PNG_SIG
        + _chunkify(
            b"IHDR",
            struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1),
        )
        + _chunkify(b"IDAT", zlib.compress(bytes(raw)))
        + _chunkify(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), px)


# ---------------------------------------------------------------------------
# BMP palette / 32-bit, WAV sample widths
# ---------------------------------------------------------------------------


def _build_bmp(w, h, bpp, rows, palette=None):
    """Hand-assemble an uncompressed BMP (bottom-up) from raw row
    byte strings (pre-padding) and an optional RGB palette."""
    import struct

    pal_bytes = b""
    n_colors = 0
    if palette is not None:
        n_colors = len(palette)
        pal_bytes = b"".join(
            bytes([b, g, r, 0]) for r, g, b in palette  # BGRA quads
        )
    row_bytes = w * (bpp // 8)
    pad = (-row_bytes) % 4
    data_off = 14 + 40 + len(pal_bytes)
    body = b"".join(rows[y] + b"\x00" * pad for y in range(h - 1, -1, -1))
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", data_off + len(body), 0, 0, data_off,
        40, w, h, 1, bpp, 0, len(body), 2835, 2835, n_colors, 0,
    )
    return header + pal_bytes + body


def test_bmp_palette_decode():
    from cae_polars_tools_spark.operators.multimodal import decode_bmp

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    bmp = _build_bmp(
        3, 2, 8, [idx[y].tobytes() for y in range(2)], palette=palette
    )
    want = np.array(palette, dtype=np.uint8)[idx]
    assert np.array_equal(decode_bmp(bmp), want)


def test_bmp_32bit_decode_rgba_and_dispatch():
    from cae_polars_tools_spark.operators.multimodal import (
        decode_bmp,
        decode_image_bytes,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(2, 3, 4), dtype=np.uint8)  # RGBA
    rows = [
        b"".join(
            bytes([px[y, x, 2], px[y, x, 1], px[y, x, 0], px[y, x, 3]])
            for x in range(3)
        )
        for y in range(2)
    ]
    bmp = _build_bmp(3, 2, 32, rows)
    out = decode_bmp(bmp)
    assert out.shape == (2, 3, 4)
    assert np.array_equal(out, px)
    # sniffing dispatch drops alpha for the 3-channel feature path
    assert np.array_equal(decode_image_bytes(bmp), px[..., :3])


def test_wav_sample_widths():
    import io
    import wave

    from cae_polars_tools_spark.operators.multimodal import decode_wav

    def wav_bytes(width, frames, ch=1, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(ch)
            wf.setsampwidth(width)
            wf.setframerate(rate)
            wf.writeframes(frames)
        return buf.getvalue()

    # 8-bit unsigned recentres to signed full scale
    rate, arr = decode_wav(wav_bytes(1, bytes([0, 128, 255])))
    assert arr.dtype == np.int16
    assert arr[:, 0].tolist() == [-32768, 0, 32512]

    # 24-bit little-endian signed, including the sign boundary
    samples = [0x000001, 0x7FFFFF, 0x800000, 0xFFFFFF]  # 1, max, min, -1
    raw = b"".join(s.to_bytes(3, "little") for s in samples)
    rate, arr = decode_wav(wav_bytes(3, raw))
    assert arr.dtype == np.int32
    assert arr[:, 0].tolist() == [1, 8388607, -8388608, -1]

    # 32-bit passthrough
    a32 = np.array([1, -(2**31), 2**31 - 1], dtype="<i4")
    rate, arr = decode_wav(wav_bytes(4, a32.tobytes()))
    assert arr[:, 0].tolist() == a32.tolist()

    # stereo 24-bit keeps channel interleave
    raw2 = b"".join(s.to_bytes(3, "little") for s in [5, 0xFFFFFB, 7, 9])
    rate, arr = decode_wav(wav_bytes(3, raw2, ch=2))
    assert arr.tolist() == [[5, -5], [7, 9]]


def test_audio_features_peak_survives_clipped_32bit(spark):
    import io
    import wave

    from cae_polars_tools_spark.operators.multimodal import audio_features

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(4)
        wf.setframerate(8000)
        wf.writeframes(
            np.array([0, -(2**31)], dtype="<i4").tobytes()
        )
    assets = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    [r] = audio_features(assets).collect()
    assert r["peak"] == 2**31  # |int32 min| — would wrap under int32 abs


def test_resize_image_bytes_gif_and_tiff():
    """The format-agnostic resize must sniff GIF and TIFF too —
    dispatch contract: GIF stays GIF (container preserved, palette
    rebuilt), TIFF re-encodes as PNG (documented container change);
    pixels are the exact nearest-neighbor resample either way."""
    from cae_polars_tools_spark.operators.gif import decode_gif, encode_gif
    from cae_polars_tools_spark.operators.multimodal import (
        decode_png,
        resize_image_bytes,
    )
    from tests.test_tiff import _build_tiff

    rng = np.random.default_rng(13)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(8, 10), dtype=np.uint8)
    resized_gif = resize_image_bytes(encode_gif(idx, palette), 5, 4)
    assert resized_gif[:6] == b"GIF89a"  # container preserved
    out = decode_gif(resized_gif)
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(5) * 10) // 5
    assert np.array_equal(out, palette[idx][ys][:, xs])

    px = rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
    resized_tiff = resize_image_bytes(_build_tiff(px), 5, 4)
    assert resized_tiff[:8] == b"\x89PNG\r\n\x1a\n"  # PNG out for TIFF
    out2 = decode_png(resized_tiff)
    assert np.array_equal(out2, px[ys][:, xs])


def test_resize_gif_full_palette_roundtrip():
    """resize_gif at the 256-color limit: an identity-size resample of
    a full-palette GIF keeps every color (the rebuilt palette sits
    exactly at GIF's maximum) and round-trips pixel-exact; upscaling
    also works (nearest-neighbor duplicates rows/cols)."""
    from cae_polars_tools_spark.operators.gif import (
        decode_gif,
        encode_gif,
        resize_gif,
    )

    palette = np.stack(
        [np.arange(256), 255 - np.arange(256), np.arange(256) ^ 85],
        axis=1,
    ).astype(np.uint8)
    idx = np.arange(256, dtype=np.uint8).reshape(16, 16)
    src = encode_gif(idx, palette)
    out = resize_gif(src, 16, 16)  # identity: all 256 colors survive
    assert out[:6] == b"GIF89a"
    assert np.array_equal(decode_gif(out), palette[idx])
    up = decode_gif(resize_gif(src, 32, 16))  # 2x width upscale
    assert np.array_equal(up, palette[idx][:, np.repeat(np.arange(16), 2)])


def test_png_16bit_and_gray_alpha_decode():
    """16-bit PNGs decode to uint16 (big-endian sample assembly,
    byte-level filtering) and gray+alpha (type 4) round-trips; the
    sniffing dispatch reduces both to 8-bit RGB."""
    import struct
    import zlib

    from cae_polars_tools_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_image_bytes,
        decode_png,
    )

    rng = np.random.default_rng(17)

    def build(px, color_type, depth):
        h = px.shape[0]
        w = px.shape[1]
        be = ">u2" if depth == 16 else "u1"
        rows = [
            np.ascontiguousarray(px[y], dtype=be).tobytes()
            for y in range(h)
        ]
        # forward-apply filter type 2 (Up) byte-wise, so decode must
        # invert byte-level filtering UNDER the 16-bit samples
        body = bytearray()
        prev = bytes(len(rows[0]))
        for line in rows:
            body.append(2)
            body += bytes((a - b) & 0xFF for a, b in zip(line, prev))
            prev = line
        return (
            _PNG_SIG
            + _png_chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0),
            )
            + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
            + _png_chunk(b"IEND", b"")
        )

    # 16-bit grayscale
    g16 = rng.integers(0, 65536, size=(3, 5), dtype=np.uint16)
    out = decode_png(build(g16, 0, 16))
    assert out.dtype == np.uint16
    assert np.array_equal(out, g16)
    # 16-bit RGB
    rgb16 = rng.integers(0, 65536, size=(2, 3, 3), dtype=np.uint16)
    out = decode_png(build(rgb16, 2, 16))
    assert np.array_equal(out, rgb16)
    # dispatch reduces to 8-bit RGB (high byte)
    red = decode_image_bytes(build(rgb16, 2, 16))
    assert red.dtype == np.uint8
    assert np.array_equal(red, (rgb16 >> 8).astype(np.uint8))
    # 8-bit gray+alpha
    ga = rng.integers(0, 256, size=(3, 4, 2), dtype=np.uint8)
    out = decode_png(build(ga, 4, 8))
    assert out.shape == (3, 4, 2)
    assert np.array_equal(out, ga)
    rgb = decode_image_bytes(build(ga, 4, 8))
    assert np.array_equal(rgb, np.repeat(ga[:, :, :1], 3, axis=2))
    # 16-bit gray+alpha through the byte-level Up filter
    ga16 = rng.integers(0, 65536, size=(2, 3, 2), dtype=np.uint16)
    out = decode_png(build(ga16, 4, 16))
    assert out.dtype == np.uint16
    assert np.array_equal(out, ga16)


def test_wav_g711_ulaw_alaw_decode():
    """µ-law and A-law WAVs (format tags 7/6, refused by the stdlib
    wave module) decode through the hand-built G.711 expansion
    tables — verified byte-for-byte against audioop, the independent
    stdlib reference implementation."""
    import audioop
    import struct as _struct

    from cae_polars_tools_spark.operators.multimodal import decode_wav

    def riff(tag_id, ch, rate, data):
        fmt = _struct.pack("<HHIIHH", tag_id, ch, rate, rate * ch, ch, 8)
        out = b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        out += b"data" + _struct.pack("<I", len(data)) + data
        if len(data) & 1:
            out += b"\x00"
        return b"RIFF" + _struct.pack("<I", 4 + len(out)) + b"WAVE" + out

    payload = bytes(range(256))  # every companded code point
    for tag_id, name in ((7, "ulaw2lin"), (6, "alaw2lin")):
        rate, arr = decode_wav(riff(tag_id, 1, 8000, payload))
        assert rate == 8000
        assert arr.dtype == np.int16
        want = np.frombuffer(
            getattr(audioop, name)(payload, 2), dtype="<i2"
        )
        assert np.array_equal(arr[:, 0], want), name
    # stereo interleave preserved
    rate, arr = decode_wav(riff(7, 2, 8000, bytes([0, 1, 2, 3])))
    assert arr.shape == (2, 2)
    # unknown compressed format still raises loudly
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav(riff(2, 1, 8000, b"\x00\x00"))


def test_decode_dimension_caps_block_allocation_bombs():
    """A tiny payload claiming a gigantic canvas must be refused
    BEFORE the allocation happens, in every decoder."""
    import struct as _struct
    import zlib as _zlib

    from cae_polars_tools_spark.operators.gif import decode_gif
    from cae_polars_tools_spark.operators.jpeg import decode_jpeg
    from cae_polars_tools_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_bmp,
        decode_png,
    )
    from cae_polars_tools_spark.operators.tiff import decode_tiff

    big = 60000
    # BMP header claiming 60000x60000
    bmp = _struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 100, 0, 0, 54, 40, big, big, 1, 24, 0, 0, 0, 0, 0, 0,
    )
    with pytest.raises(ValueError, match="ingest cap"):
        decode_bmp(bmp)
    # PNG
    png = (
        _PNG_SIG
        + _png_chunk(
            b"IHDR", _struct.pack(">IIBBBBB", big, big, 8, 2, 0, 0, 0)
        )
        + _png_chunk(b"IDAT", _zlib.compress(b"\x00" * 10))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="ingest cap"):
        decode_png(png)
    # GIF
    gif = (
        b"GIF89a" + _struct.pack("<HHBBB", big, big, 0, 0, 0) + b"\x3b"
    )
    with pytest.raises(ValueError, match="ingest cap"):
        decode_gif(gif)
    # TIFF
    tif = bytearray(b"II*\x00\x08\x00\x00\x00")
    entries = [(256, 4, big), (257, 4, big), (262, 3, 1)]
    tif += _struct.pack("<H", len(entries))
    for tag, vtype, val in entries:
        tif += _struct.pack("<HHI", tag, vtype, 1)
        tif += _struct.pack("<I", val)
    tif += _struct.pack("<I", 0)
    with pytest.raises(ValueError, match="ingest cap"):
        decode_tiff(bytes(tif))
    # JPEG (SOF0 claiming the huge frame)
    sof = _struct.pack(">HBHHB", 11, 8, big, big, 1) + bytes([1, 0x11, 0])
    jpg = b"\xff\xd8\xff\xc0" + sof + b"\xff\xd9"
    with pytest.raises(ValueError, match="ingest cap"):
        decode_jpeg(jpg)


def test_png_zip_bomb_is_bounded():
    """An IDAT inflating far past the header's pixel volume must be
    refused (bounded decompression), not expanded into memory."""
    import struct as _struct
    import zlib as _zlib

    from cae_polars_tools_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    bomb = _zlib.compress(b"\x00" * 50_000_000, 9)  # ~48 KB compressed
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", bomb)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="exceeds the header"):
        decode_png(png)


def _ima_riff(ch, rate, block_align, samples_per_block, data, fact=None):
    """Independent RIFF builder for IMA-ADPCM (format tag 0x11)."""
    import struct as _struct

    fmt = _struct.pack(
        "<HHIIHH",
        0x11,
        ch,
        rate,
        rate * block_align // max(samples_per_block, 1),
        block_align,
        4,
    ) + _struct.pack("<HH", 2, samples_per_block)
    out = b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    if fact is not None:
        out += b"fact" + _struct.pack("<II", 4, fact)
    out += b"data" + _struct.pack("<I", len(data)) + data
    if len(data) & 1:
        out += b"\x00"
    return b"RIFF" + _struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def _swap_nibbles(body: bytes) -> bytes:
    """WAV IMA packs the FIRST code in the LOW nibble; audioop's
    DVI/IMA reference expands the HIGH nibble first — swapping makes
    both read the identical code sequence."""
    a = np.frombuffer(body, dtype=np.uint8)
    return bytes(((a & 0x0F) << 4) | (a >> 4))


def test_wav_ima_adpcm_mono_byte_exact_vs_audioop():
    """IMA/DVI ADPCM WAVs (format tag 0x11) decode block-wise through
    the spec's step/index tables — byte-exact against audioop's
    independent stdlib DVI expander, over random code streams and
    every header index, across multiple blocks with fresh headers."""
    import audioop
    import struct as _struct

    from cae_polars_tools_spark.operators.multimodal import decode_wav

    rng = np.random.default_rng(42)
    blocks = []
    want = []
    for b, idx0 in enumerate((0, 17, 88, 44)):
        pred0 = int(rng.integers(-32768, 32768))
        body = bytes(rng.integers(0, 256, size=28, dtype=np.uint8))
        blocks.append(_struct.pack("<hBB", pred0, idx0, 0) + body)
        want.append(pred0)  # header predictor = sample 0
        expanded, _state = audioop.adpcm2lin(
            _swap_nibbles(body), 2, (pred0, idx0)
        )
        want.extend(np.frombuffer(expanded, dtype="<i2").tolist())
    rate, arr = decode_wav(_ima_riff(1, 8000, 32, 57, b"".join(blocks)))
    assert rate == 8000
    assert arr.dtype == np.int16 and arr.shape == (4 * 57, 1)
    assert arr[:, 0].tolist() == want


def test_wav_ima_adpcm_stereo_word_interleave():
    """Stereo IMA blocks interleave 4-byte (8-code) words per channel;
    each deinterleaved channel must equal its own mono expansion."""
    import audioop
    import struct as _struct

    from cae_polars_tools_spark.operators.multimodal import decode_wav

    rng = np.random.default_rng(7)
    left = bytes(rng.integers(0, 256, size=8, dtype=np.uint8))
    right = bytes(rng.integers(0, 256, size=8, dtype=np.uint8))
    headers = _struct.pack("<hBB", 1000, 5, 0) + _struct.pack(
        "<hBB", -2000, 30, 0
    )
    body = b"".join(
        left[i : i + 4] + right[i : i + 4] for i in range(0, 8, 4)
    )
    rate, arr = decode_wav(_ima_riff(2, 44100, len(headers) + len(body), 17,
                                     headers + body))
    assert arr.shape == (17, 2)
    for c, (stream, pred0, idx0) in enumerate(
        ((left, 1000, 5), (right, -2000, 30))
    ):
        expanded, _ = audioop.adpcm2lin(_swap_nibbles(stream), 2, (pred0, idx0))
        want = [pred0] + np.frombuffer(expanded, dtype="<i2").tolist()
        assert arr[:, c].tolist() == want, f"channel {c}"


def test_wav_ima_adpcm_fact_trims_and_features_dispatch(spark):
    """A fact chunk's sample count trims encoder padding, and
    audio_features sniffs the IMA payload end-to-end."""
    import struct as _struct

    from cae_polars_tools_spark.operators.multimodal import (
        audio_features,
        decode_wav,
    )

    body = bytes(range(12))
    block = _struct.pack("<hBB", 100, 3, 0) + body
    payload = _ima_riff(1, 16000, len(block), 25, block, fact=10)
    rate, arr = decode_wav(payload)
    assert rate == 16000
    assert arr.shape == (10, 1)  # 25 decodable, fact says 10

    assets = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    [r] = audio_features(assets).collect()
    assert r["sample_rate"] == 16000 and r["n_samples"] == 10
    assert r["peak"] == int(np.abs(arr.astype(np.int64)).max())


def _wav(width, frames, ch=1, rate=8000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(frames)
    return buf.getvalue()


def test_resample_pcm_exact_math():
    """The rational-interpolation contract: exact-factor up/downsample
    hit the closed-form values, fractions round HALF-UP via floor
    division (so negatives round toward +inf at .5 — the same value
    the SQL twin computes), identity is a no-op copy."""
    from cae_polars_tools_spark.operators.multimodal import resample_pcm

    x = np.array([[0], [10], [20], [30]], dtype=np.int16)
    # 2x upsample: odd outputs are neighbor midpoints
    up = resample_pcm(x, 8000, 16000)
    assert up[:, 0].tolist() == [0, 5, 10, 15, 20, 25, 30, 30]
    # exact 2x downsample picks every other sample
    down = resample_pcm(up, 16000, 8000)
    assert down[:, 0].tolist() == [0, 10, 20, 30]
    # identity returns an equal copy, not the same object
    same = resample_pcm(x, 8000, 8000)
    assert same is not x and same.tolist() == x.tolist()
    # 2/3 ratio: fractions 1/3 and 2/3, half-up rounding
    y = np.array([[0], [1], [2], [3]], dtype=np.int16)
    r = resample_pcm(y, 8000, 12000)
    # positions 0, 2/3, 4/3, 2, 8/3, 10/3(edge-hold) -> half-up
    assert r[:, 0].tolist() == [0, 1, 1, 2, 3, 3]
    # negative midpoint -0.5 rounds half-UP to 0 (floor division on
    # the doubled numerator), matching SQL floor semantics
    z = np.array([[0], [-1]], dtype=np.int16)
    assert resample_pcm(z, 8000, 16000)[:, 0].tolist() == [0, 0, -1, -1]
    import pytest

    with pytest.raises(ValueError, match="positive"):
        resample_pcm(x, 0, 8000)


def test_resample_wav_width_paths():
    """resample_wav round-trips every decode path: 8-bit in -> 16-bit
    out, 16-bit stays 16, 24-bit in -> lossless 32-bit out, stereo
    interleave preserved, rate field rewritten."""
    from cae_polars_tools_spark.operators.multimodal import (
        decode_wav,
        resample_wav,
    )

    # 8-bit input (recentred to int16) -> PCM16 out
    out = resample_wav(_wav(1, bytes([0, 128, 255])), 16000)
    rate, arr = decode_wav(out)
    assert rate == 16000 and arr.dtype == np.int16
    assert arr[:, 0].tolist() == [-32768, -16384, 0, 16256, 32512, 32512]

    # 24-bit input -> PCM32 out, values preserved at identical rate
    raw = b"".join(s.to_bytes(3, "little") for s in [1, 0x7FFFFF, 0x800000])
    rate, arr = decode_wav(resample_wav(_wav(3, raw), 8000))
    assert rate == 8000 and arr.dtype == np.int32
    assert arr[:, 0].tolist() == [1, 8388607, -8388608]

    # stereo 16-bit: channels resample independently
    st = np.array([[0, 100], [10, 200]], dtype="<i2")
    rate, arr = decode_wav(resample_wav(_wav(2, st.tobytes(), ch=2), 16000))
    assert arr.tolist() == [[0, 100], [5, 150], [10, 200], [10, 200]]


def test_audio_features_target_rate(spark):
    """audio_features(target_rate=...) normalizes mixed-rate clips:
    n_samples reflects the resampled stream and sample_rate reports
    the target."""
    from cae_polars_tools_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    clips = [
        (1, encode_wav_pcm16(np.arange(4, dtype=np.int16) * 100, 8000)),
        (2, encode_wav_pcm16(np.arange(7, dtype=np.int16) * 100, 16000)),
    ]
    df = spark.createDataFrame(clips, "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in audio_features(df, target_rate=16000).collect()}
    assert rows[1]["sample_rate"] == 16000 and rows[1]["n_samples"] == 8
    assert rows[2]["sample_rate"] == 16000 and rows[2]["n_samples"] == 7


def test_audio_frame_energy_exact_and_partial_frame(spark):
    """Frame energy: exact int64 sums per frame, trailing partial
    frame kept, bad frame size refuses."""
    import pytest

    from cae_polars_tools_spark.operators.multimodal import (
        audio_frame_energy,
        encode_wav_pcm16,
    )

    samples = np.array([3, -4, 0, 2, 10], dtype=np.int16)  # 2 frames @4
    df = spark.createDataFrame(
        [(7, encode_wav_pcm16(samples, 8000))], "doc_id long, payload binary"
    )
    rows = {
        r["frame_id"]: r["energy"]
        for r in audio_frame_energy(df, frame_samples=4).collect()
    }
    assert rows == {0: 9 + 16 + 0 + 4, 1: 100}
    with pytest.raises(ValueError, match="frame_samples"):
        audio_frame_energy(df, frame_samples=0)


def test_sniff_image_info_header_only():
    """Format + dims from header bytes alone: the first 64 bytes must
    suffice for BMP/PNG/GIF (a truncated payload no decoder could
    read), and a JPEG resolves through its marker walk without
    touching entropy-coded data."""
    import pytest

    from cae_polars_tools_spark.operators.gif import encode_gif
    from cae_polars_tools_spark.operators.jpeg import encode_jpeg
    from cae_polars_tools_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        sniff_image_info,
    )

    px = (np.arange(7 * 5 * 3, dtype=np.uint8)).reshape(5, 7, 3)
    pal = np.stack([np.arange(0, 256, 16, dtype=np.uint8)] * 3, 1)
    cases = [
        (encode_bmp(px), ("bmp", 7, 5)),
        (encode_png(px), ("png", 7, 5)),
        (encode_gif(px[:, :, 0] // 16, pal), ("gif", 7, 5)),
    ]
    for payload, want in cases:
        assert sniff_image_info(payload) == want
        assert sniff_image_info(payload[:64]) == want  # header-only

    jp = encode_jpeg(np.full((16, 24, 3), 128, dtype=np.uint8))
    assert sniff_image_info(jp) == ("jpeg", 24, 16)

    for hostile in (b"", b"BM", b"\xff\xd8\x00\x00", b"nonsense" * 8):
        with pytest.raises(ValueError):
            sniff_image_info(hostile)


def test_resample_pcm_mono_1d():
    """The natural 1-D mono shape must resample per-sample (it used
    to broadcast into an (n_out, n_out) outer product); output shape
    mirrors input shape, values match the 2-D path."""
    import pytest

    from cae_polars_tools_spark.operators.multimodal import resample_pcm

    mono = np.array([0, 10, 20, 30], dtype=np.int16)
    out1 = resample_pcm(mono, 8000, 16000)
    out2 = resample_pcm(mono[:, None], 8000, 16000)
    assert out1.ndim == 1 and out2.ndim == 2
    assert np.array_equal(out1, out2[:, 0])
    assert np.array_equal(out1[:4], np.array([0, 5, 10, 15]))
    assert np.array_equal(
        resample_pcm(mono, 8000, 8000), mono
    )
    with pytest.raises(ValueError, match="ndim"):
        resample_pcm(np.zeros((2, 2, 2), dtype=np.int16), 8000, 16000)


def test_sniff_jpeg_standalone_markers():
    """TEM (0x01) and RSTn/EOI (0xD0-0xD9) carry no length word; a
    valid JPEG holding one before SOF must still sniff, and a stream
    that reaches SOS without a SOF must raise (not walk entropy
    data)."""
    import pytest

    from cae_polars_tools_spark.operators.multimodal import sniff_image_info

    sof = b"\xff\xc0" + (8).to_bytes(2, "big") + b"\x08" + (
        (16).to_bytes(2, "big") + (24).to_bytes(2, "big") + b"\x01"
    )
    # SOI, TEM, RST0 (both standalone), then SOF0
    assert sniff_image_info(b"\xff\xd8\xff\x01\xff\xd0" + sof) == (
        "jpeg", 24, 16,
    )
    # SOI straight to SOS: no frame header anywhere
    with pytest.raises(ValueError, match="without a SOF"):
        sniff_image_info(b"\xff\xd8\xff\xda\x00\x04\x01\x00" + b"\x55" * 32)

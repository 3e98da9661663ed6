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
    # BMP/PNG/baseline-JPEG are REAL native decode paths now; a
    # genuinely foreign format (GIF here) still hits the
    # NotImplementedError seam
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a......")


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
    # 16-bit depth
    png16 = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(png16)


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

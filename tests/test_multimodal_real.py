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
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


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

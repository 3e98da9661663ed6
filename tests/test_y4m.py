"""YUV4MPEG2 codec: byte-exact round-trips, header handling, the real
frame-splitter seam through sample_frames, and hostile-bytes guards."""

from __future__ import annotations

import numpy as np
import pytest

from cae_polars_tools_spark.operators.y4m import (
    decode_y4m,
    encode_y4m,
    split_y4m_frames,
    video_features,
    y4m_to_rgb,
)


def _planes(rng, n, h, w, fh, fv):
    y = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(n, h // fv, w // fh), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(n, h // fv, w // fh), dtype=np.uint8)
    return y, cb, cr


@pytest.mark.parametrize(
    "cs,fh,fv", [("C444", 1, 1), ("C422", 2, 1), ("C420", 2, 2)]
)
def test_roundtrip_byte_exact(cs, fh, fv):
    rng = np.random.default_rng(5)
    y, cb, cr = _planes(rng, 4, 8, 12, fh, fv)
    enc = encode_y4m(y, cb, cr, rate=(30, 1), colorspace=cs)
    assert enc.startswith(b"YUV4MPEG2 W12 H8 F30:1 ")
    meta, y2, cb2, cr2 = decode_y4m(enc)
    assert meta["colorspace"] == cs
    assert meta["n_frames"] == 4
    assert (meta["width"], meta["height"]) == (12, 8)
    assert np.array_equal(y, y2)
    assert np.array_equal(cb, cb2)
    assert np.array_equal(cr, cr2)
    # lossless container: encode(decode(x)) == x
    assert encode_y4m(y2, cb2, cr2, rate=(30, 1), colorspace=cs) == enc


def test_mono_roundtrip_and_rgb():
    rng = np.random.default_rng(6)
    y = rng.integers(0, 256, size=(2, 4, 6), dtype=np.uint8)
    enc = encode_y4m(y)
    meta, y2, cb2, cr2 = decode_y4m(enc)
    assert meta["colorspace"] == "Cmono"
    assert cb2 is None and cr2 is None
    assert np.array_equal(y, y2)
    rgb = y4m_to_rgb(meta, y2, cb2, cr2)
    assert rgb.shape == (2, 4, 6, 3)
    assert np.array_equal(rgb[..., 0], y)
    assert np.array_equal(rgb[..., 1], y)


def test_neutral_chroma_rgb_is_luma():
    y = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4) + 50
    chroma = np.full((2, 2, 2), 128, np.uint8)
    meta, y2, cb2, cr2 = decode_y4m(encode_y4m(y, chroma, chroma))
    rgb = y4m_to_rgb(meta, y2, cb2, cr2)
    assert np.array_equal(rgb[..., 0], y)
    assert np.array_equal(rgb[..., 2], y)


def test_colorspace_inference_and_420_variants():
    rng = np.random.default_rng(7)
    y, cb, cr = _planes(rng, 1, 4, 4, 2, 2)
    # inferred colorspace from factors
    assert b" C420\n" in encode_y4m(y, cb, cr)
    # siting variants parse with identical plane layout
    for variant in ("C420jpeg", "C420mpeg2", "C420paldv"):
        enc = encode_y4m(y, cb, cr, colorspace=variant)
        meta, y2, cb2, cr2 = decode_y4m(enc)
        assert meta["colorspace"] == variant
        assert np.array_equal(y2, y) and np.array_equal(cb2, cb)


def test_default_colorspace_when_header_omits_C():
    """Spec default is 4:2:0 when no C tag is present."""
    y = np.zeros((1, 4, 4), np.uint8)
    chroma = np.full((1, 2, 2), 128, np.uint8)
    enc = encode_y4m(y, chroma, chroma)
    stripped = enc.replace(b" C420\n", b"\n", 1)
    meta, y2, cb2, _ = decode_y4m(stripped)
    assert meta["colorspace"] == "C420"
    assert np.array_equal(y2, y) and np.array_equal(cb2, chroma)


def test_guards():
    y = np.zeros((1, 4, 4), np.uint8)
    chroma = np.full((1, 2, 2), 128, np.uint8)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="together"):
        encode_y4m(y, chroma, None)
    with pytest.raises(ValueError, match="colorspace"):
        encode_y4m(y, chroma, chroma, colorspace="C422")
    enc = encode_y4m(y, chroma, chroma)
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_y4m(enc.replace(b" Ip ", b" It ", 1))
    with pytest.raises(NotImplementedError, match="colorspace"):
        decode_y4m(enc.replace(b" C420\n", b" C411\n", 1))
    # truncations raise cleanly, never IndexError
    for cut in range(0, len(enc)):
        try:
            decode_y4m(enc[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_split_y4m_frames_through_sample_frames(spark):
    """The REAL demuxer plugs into the generic sample_frames operator:
    one output row per kept frame, frame bytes = that frame's exact
    plane bytes."""
    from cae_polars_tools_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(8)
    vids = {}
    rows = []
    for doc_id in (1, 2):
        y, cb, cr = _planes(rng, 5, 4, 6, 2, 2)
        enc = encode_y4m(y, cb, cr)
        vids[doc_id] = (y, cb, cr)
        rows.append((doc_id, bytearray(enc)))
    assets = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames(assets, step=2, split_fn=split_y4m_frames).collect()
    got = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in out}
    assert set(got) == {(d, i) for d in (1, 2) for i in (0, 2, 4)}
    for (doc_id, idx), frame in got.items():
        y, cb, cr = vids[doc_id]
        want = y[idx].tobytes() + cb[idx].tobytes() + cr[idx].tobytes()
        assert frame == want


def test_video_features(spark):
    rng = np.random.default_rng(9)
    y, cb, cr = _planes(rng, 3, 4, 6, 2, 2)
    assets = spark.createDataFrame(
        [(7, bytearray(encode_y4m(y, cb, cr, rate=(30000, 1001))))],
        "doc_id long, payload binary",
    )
    [r] = video_features(assets).collect()
    assert (r["n_frames"], r["width"], r["height"]) == (3, 6, 4)
    assert r["fps"] == pytest.approx(29.97, abs=0.01)
    assert r["mean_y"] == pytest.approx(
        y.astype(np.int64).sum() / y.size, abs=0
    )

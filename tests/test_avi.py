"""MJPEG-in-AVI: container round trip, offset-level structure pins
(so the symmetric mux/demux cannot hide a layout bug), demuxer
integration with sample_frames, and hostile-bytes guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cae_polars_tools_spark.operators.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    parse_avi_mjpeg,
    split_avi_frames,
)
from cae_polars_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _frames(n=3, h=6, w=5, seed=11):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for _ in range(n)
    ]


def test_mux_demux_roundtrip_streams_verbatim():
    rasters = _frames()
    streams = [encode_jpeg(r, 90) for r in rasters]
    avi = encode_avi_mjpeg(streams, 5, 6, fps=10)
    meta, got = parse_avi_mjpeg(avi)
    assert got == streams  # container stores frames verbatim
    assert meta == {
        "width": 5, "height": 6, "n_frames": 3, "fps": 10,
        "codec": "MJPG",
    }
    m2, decoded = decode_avi_mjpeg(avi)
    assert m2 == meta
    for d, s in zip(decoded, streams):
        assert np.array_equal(d, decode_jpeg(s))


def test_container_structure_offsets():
    """Offset-level pins from the AVI 1.0 spec — independent of the
    parser, so a symmetric encode/decode bug cannot pass."""
    streams = [encode_jpeg(f, 90) for f in _frames(2)]
    avi = encode_avi_mjpeg(streams, 5, 6, fps=25)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", avi, 4)
    assert 8 + riff_size == len(avi)  # RIFF size covers the file
    assert avi[12:16] == b"LIST" and avi[20:24] == b"hdrl"
    assert avi[24:28] == b"avih"
    (avih_size,) = struct.unpack_from("<I", avi, 28)
    assert avih_size == 56
    us_pf, = struct.unpack_from("<I", avi, 32)
    assert us_pf == 40000  # 25 fps
    total, = struct.unpack_from("<I", avi, 32 + 16)
    assert total == 2
    w, h = struct.unpack_from("<II", avi, 32 + 32)
    assert (w, h) == (5, 6)
    # stream header: vids/MJPG
    i = avi.find(b"strh")
    assert avi[i + 8 : i + 12] == b"vids"
    assert avi[i + 12 : i + 16] == b"MJPG"
    # strf BITMAPINFOHEADER: biCompression == 'MJPG', 24 bpp
    j = avi.find(b"strf")
    bi = avi[j + 8 : j + 48]
    assert struct.unpack_from("<H", bi, 14)[0] == 24
    assert bi[16:20] == b"MJPG"
    # movi list with 00dc chunks, each padded to even
    k = avi.find(b"movi")
    assert avi[k - 8 : k - 4] == b"LIST"
    assert avi[k + 4 : k + 8] == b"00dc"
    (sz0,) = struct.unpack_from("<I", avi, k + 8)
    assert sz0 == len(streams[0])
    nxt = k + 12 + sz0 + (sz0 & 1)
    assert avi[nxt : nxt + 4] == b"00dc"
    assert b"idx1" in avi


def test_split_fn_feeds_sample_frames(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        decode_image_bytes,
        sample_frames,
    )

    rasters = _frames(4, 8, 7, seed=12)
    avi = encode_avi_mjpeg([encode_jpeg(r, 90) for r in rasters], 7, 8)
    assets = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id long, payload binary"
    )
    rows = (
        sample_frames(assets, step=2, split_fn=split_avi_frames)
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 2]
    for r in rows:
        img = decode_image_bytes(bytes(r["frame"]))
        assert img.shape == (8, 7, 3)


def test_guards_and_unsupported_codec():
    with pytest.raises(ValueError, match="not an AVI"):
        parse_avi_mjpeg(b"RIFF....WAVE")
    streams = [encode_jpeg(_frames(1)[0], 90)]
    avi = encode_avi_mjpeg(streams, 5, 6)
    # non-MJPEG codec refuses loudly
    t = bytearray(avi)
    i = avi.find(b"strh") + 12
    t[i : i + 4] = b"XVID"
    with pytest.raises(NotImplementedError, match="XVID"):
        parse_avi_mjpeg(bytes(t))
    # declared-vs-actual frame count mismatch
    t = bytearray(avi)
    j = avi.find(b"avih") + 8 + 16
    t[j : j + 4] = struct.pack("<I", 9)
    with pytest.raises(ValueError, match="declares 9"):
        parse_avi_mjpeg(bytes(t))
    # truncation at every prefix either parses to the same frames or
    # fails loudly — never returns corrupt frame bytes silently
    for cut in range(12, len(avi), 97):
        try:
            _m, fr = parse_avi_mjpeg(avi[:cut])
        except (ValueError, NotImplementedError):
            continue
        for f in fr:
            assert f in streams
    # encoder guards
    with pytest.raises(ValueError, match="SOI"):
        encode_avi_mjpeg([b"nope"], 5, 6)
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg(streams, 5, 6, fps=0)


def test_odd_length_frame_pads_to_even_chunks():
    """RIFF chunks pad to even length; the pad byte must not leak
    into the returned frame bytes and the following chunk must stay
    aligned."""
    odd = b"\xff\xd8" + b"x" * 31  # 33 bytes, SOI-prefixed stand-in
    even = b"\xff\xd8" + b"y" * 30
    avi = encode_avi_mjpeg([odd, even], 3, 3, fps=5)
    meta, frames = parse_avi_mjpeg(avi)
    assert frames == [odd, even]
    k = avi.find(b"movi")
    (sz0,) = struct.unpack_from("<I", avi, k + 8)
    assert sz0 == 33
    assert avi[k + 12 + 33] == 0  # the pad byte
    assert avi[k + 12 + 34 : k + 12 + 38] == b"00dc"


def test_resize_avi_roundtrip_dims_and_playability():
    """Video resize: every frame resamples to the new dims, the
    container re-muxes with updated headers, and the result is a
    fully decodable MJPEG AVI."""
    from cae_polars_tools_spark.operators.avi import resize_avi_mjpeg

    rasters = _frames(3, 8, 6, seed=13)
    avi = encode_avi_mjpeg([encode_jpeg(r, 90) for r in rasters], 6, 8,
                           fps=15)
    out = resize_avi_mjpeg(avi, 3, 4)
    meta, decoded = decode_avi_mjpeg(out)
    assert meta == {"width": 3, "height": 4, "n_frames": 3, "fps": 15,
                    "codec": "MJPG"}
    for d in decoded:
        assert d.shape == (4, 3, 3)


def _mk_avi(streams_spec, movi_chunks, n_frames, w=5, h=6):
    """Hand-rolled AVI for stream-topology tests: streams_spec is
    [(fccType, handler), ...] in strl order; movi_chunks is
    [(fourcc, data), ...]."""
    u32 = lambda v: struct.pack("<I", v)  # noqa: E731
    avih = b"avih" + u32(56) + struct.pack(
        "<14I", 100_000, 0, 0, 0x10, n_frames, 0, len(streams_spec),
        0, w, h, 0, 0, 0, 0,
    )
    strls = b""
    for fcc_type, handler in streams_spec:
        strh = b"strh" + u32(56) + fcc_type + handler + bytes(48)
        strls += b"LIST" + u32(4 + len(strh)) + b"strl" + strh
    hdrl = b"LIST" + u32(4 + len(avih) + len(strls)) + b"hdrl" + avih + strls
    body = bytearray(b"movi")
    for fcc, data in movi_chunks:
        body += fcc + u32(len(data)) + data
        if len(data) % 2:
            body += b"\x00"
    movi = b"LIST" + u32(len(body)) + bytes(body)
    full = b"AVI " + hdrl + movi
    return b"RIFF" + u32(len(full)) + full


def test_second_video_stream_refuses_loudly():
    """Two 'vids' strh headers: a second video stream would silently
    interleave its frames into one list — must raise instead."""
    jpg = encode_jpeg(_frames(1)[0], 90)
    avi = _mk_avi(
        [(b"vids", b"MJPG"), (b"vids", b"MJPG")],
        [(b"00dc", jpg), (b"01dc", jpg)],
        n_frames=1,
    )
    with pytest.raises(NotImplementedError, match="more than one video"):
        parse_avi_mjpeg(avi)


def test_frames_filtered_to_video_stream_number():
    """The MJPG stream is stream 1 here (a text stream occupies slot
    0): only '01dc' chunks are frames; a hostile '00dc' chunk from
    the non-video stream must not leak into the frame list, and the
    declared n_frames cross-check runs against the FILTERED count."""
    f1, f2 = (encode_jpeg(f, 90) for f in _frames(2))
    avi = _mk_avi(
        [(b"txts", b"\x00" * 4), (b"vids", b"MJPG")],
        [(b"00dc", b"\xff\xd8hostile-not-counted"),
         (b"01dc", f1), (b"01dc", f2)],
        n_frames=2,
    )
    meta, frames = parse_avi_mjpeg(avi)
    assert frames == [f1, f2]
    assert meta["n_frames"] == 2 and meta["codec"] == "MJPG"
    # audio data chunks ('##wb') were already excluded by suffix; a
    # mixed audio+video file keeps working with video at slot 0
    avi2 = _mk_avi(
        [(b"vids", b"MJPG"), (b"auds", b"\x01\x00\x00\x00")],
        [(b"00dc", f1), (b"01wb", b"pcm-bytes!"), (b"00dc", f2)],
        n_frames=2,
    )
    meta2, frames2 = parse_avi_mjpeg(avi2)
    assert frames2 == [f1, f2] and meta2["n_frames"] == 2

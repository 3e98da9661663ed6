"""FLAC codec: lossless round trips across every subframe type and
stereo decorrelation, handcrafted bitstreams for the decoder paths the
encoder doesn't emit, CRC/hostile-bytes hardening, and the audio
dispatch equivalence (FLAC clip ≡ WAV clip through audio_features)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cae_polars_tools_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_encode,
    decode_flac,
    encode_flac,
)


def _rt(x, rate=44100, **kw):
    got_rate, out = decode_flac(encode_flac(x, rate, **kw))
    assert got_rate == rate
    want = np.asarray(x, dtype=np.int64)
    if want.ndim == 1:
        want = want[:, None]
    assert out.shape == want.shape
    assert (out.astype(np.int64) == want).all()
    return out


def test_roundtrip_mono_correlated():
    rng = np.random.default_rng(3)
    x = np.clip(
        np.cumsum(rng.integers(-40, 41, size=9000)), -32768, 32767
    )
    payload = encode_flac(x, 44100)
    _rt(x)
    # the fixture is correlated, so FIXED+rice must actually compress
    assert len(payload) < 2 * len(x) * 0.7


@pytest.mark.parametrize(
    "mode", ["independent", "mid-side", "left-side", "right-side"]
)
def test_roundtrip_stereo_decorrelations(mode):
    rng = np.random.default_rng(5)
    l = np.clip(np.cumsum(rng.integers(-30, 31, size=5000)), -30000, 30000)
    r = np.clip(l + rng.integers(-5, 6, size=5000), -32768, 32767)
    _rt(np.stack([l, r], axis=1), rate=48000, stereo_mode=mode)


def test_roundtrip_lpc_constant_verbatim_empty():
    rng = np.random.default_rng(9)
    x = np.clip(np.cumsum(rng.integers(-9, 10, size=3000)), -32768, 32767)
    _rt(x, rate=8000, force="lpc")  # LPC reconstruction path
    _rt(np.full(300, -7), rate=8000)  # CONSTANT
    _rt(rng.integers(-32768, 32768, size=400), rate=22050)  # ~VERBATIM
    _rt(np.empty(0, dtype=np.int64))  # empty stream, 0 frames


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
    st.sampled_from([8000, 16000, 44100, 11025]),
)
def test_roundtrip_fuzz(vals, rate):
    _rt(np.asarray(vals, dtype=np.int64), rate=rate)


def _custom_stream(bn, subframe_bits_fn, bps=16, rate=8000):
    """Minimal one-frame FLAC stream with a caller-written subframe —
    exercises decoder paths the encoder never emits."""
    head = _BitWriter()
    head.write(max(16, bn), 16)
    head.write(max(16, bn), 16)
    head.write(0, 24)
    head.write(0, 24)
    head.write(rate, 20)
    head.write(0, 3)  # mono
    head.write(bps - 1, 5)
    head.write(bn, 36)
    info = head.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info
    f = _BitWriter()
    f.write(0b11111111111110, 14)
    f.write(0, 2)
    f.write(7, 4)  # 16-bit blocksize at end
    f.write(4, 4)  # 8000 Hz code
    f.write(0, 4)  # mono
    f.write(4, 3)  # 16-bit
    f.write(0, 1)
    f.buf += _utf8_encode(0)
    f.write(bn - 1, 16)
    f.align()
    hdr = f.bytes()
    f = _BitWriter()
    f.buf = bytearray(hdr)
    f.write(_crc8(hdr), 8)
    subframe_bits_fn(f)
    f.align()
    body = f.bytes()
    out += body + struct.pack(">H", _crc16(body))
    return bytes(out)


def test_decode_wasted_bits_and_rice2_partitions():
    """FIXED order-0 subframe with one wasted bit, residual method 1
    (5-bit params) split over 2 partitions — all decoder-only paths."""
    vals = [2 * v for v in range(-8, 8)]  # 16 samples, all even

    def sub(f):
        f.write(0, 1)
        f.write(0b001000, 6)  # FIXED order 0
        f.write(1, 1)  # wasted-bits flag
        f.write(1, 1)  # unary 0 → wasted = 1
        f.write(1, 2)  # residual method 1
        f.write(1, 4)  # partition order 1 → 2 partitions
        for part in (vals[:8], vals[8:]):
            f.write(2, 5)  # rice2 param k=2
            for v in part:
                v >>= 1  # effective bps excludes the wasted bit
                zig = 2 * v if v >= 0 else -2 * v - 1
                f.write_unary(zig >> 2)
                f.write(zig, 2)

    rate, out = decode_flac(_custom_stream(16, sub))
    assert rate == 8000
    assert out[:, 0].tolist() == vals


def test_decode_escape_partition():
    """Rice escape (param 0b1111 → raw n-bit residuals)."""
    vals = [900, -900, 31000, -31000]

    def sub(f):
        f.write(0, 1)
        f.write(0b001000, 6)  # FIXED order 0
        f.write(0, 1)
        f.write(0, 2)  # method 0
        f.write(0, 4)  # one partition
        f.write(0xF, 4)  # escape
        f.write(16, 5)  # raw 16-bit residuals
        for v in vals:
            f.write(v & 0xFFFF, 16)

    _, out = decode_flac(_custom_stream(4, sub))
    assert out[:, 0].tolist() == vals


def test_hostile_bytes_refuse_loudly():
    good = encode_flac(np.arange(100), 8000)
    with pytest.raises(ValueError, match="bad magic"):
        decode_flac(b"nonsense" * 4)
    with pytest.raises(ValueError):
        decode_flac(good[:20])  # truncated metadata
    with pytest.raises(ValueError):
        decode_flac(good[:-3])  # truncated frame
    # flip the stored frame CRC itself: the body parses identically,
    # so only the CRC-16 check can catch it
    corrupt = bytearray(good)
    corrupt[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(corrupt))
    # a mid-body bit flip must also fail loudly (CRC-16 or a parse
    # error, whichever the corrupted rice stream hits first)
    corrupt3 = bytearray(good)
    corrupt3[-5] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(corrupt3))
    # flip a frame-header byte → CRC-8 (or sync loss) must catch it
    hdr_at = len(good) - (len(good) - 42)  # first frame starts after meta
    corrupt2 = bytearray(good)
    corrupt2[hdr_at + 3] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(corrupt2))
    with pytest.raises(NotImplementedError, match="Ogg"):
        decode_flac(b"OggS" + good)
    with pytest.raises(ValueError, match="exceed bits_per_sample"):
        encode_flac(np.array([40000]), 8000)
    with pytest.raises(ValueError, match="stereo_mode"):
        encode_flac(np.zeros((4, 2)), 8000, stereo_mode="qqq")


def test_dispatch_flac_equals_wav(spark):
    """audio_features over a FLAC clip must equal the same samples as
    WAV — the decode_audio_bytes dispatch and FLAC losslessness."""
    from cae_polars_tools_spark.operators.multimodal import (
        audio_features,
        decode_audio_bytes,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(11)
    x = np.clip(
        np.cumsum(rng.integers(-99, 100, size=640)), -32768, 32767
    ).astype(np.int16)
    flac = encode_flac(x.astype(np.int64), 8000)
    wav = encode_wav_pcm16(x, 8000)
    fr, fa = decode_audio_bytes(flac)
    wr, wa = decode_audio_bytes(wav)
    assert fr == wr and (fa.reshape(-1) == wa.reshape(-1)).all()
    df = spark.createDataFrame(
        [(0, bytearray(flac)), (1, bytearray(wav))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert rows[0]["rms"] == rows[1]["rms"]
    assert rows[0]["peak"] == rows[1]["peak"]
    assert rows[0]["n_samples"] == rows[1]["n_samples"]
    with pytest.raises(NotImplementedError, match="MP3"):
        decode_audio_bytes(b"ID3\x04" + b"\x00" * 64)


def test_roundtrip_20_and_24_bit():
    """The advertised deep widths must encode (md5 packing has no
    3-byte numpy dtype) and round-trip to int32 output."""
    rng = np.random.default_rng(21)
    for bps in (20, 24):
        lim = 1 << (bps - 1)
        x = np.clip(
            np.cumsum(rng.integers(-9000, 9001, size=900)), -lim, lim - 1
        )
        rate, out = decode_flac(encode_flac(x, 48000, bits_per_sample=bps))
        assert out.dtype == np.int32
        assert (out[:, 0] == x).all()


def test_mp3_sniff_covers_crc_variants():
    from cae_polars_tools_spark.operators.multimodal import (
        decode_audio_bytes,
    )

    for sync in (b"\xff\xfb", b"\xff\xfa", b"\xff\xf3", b"\xff\xf2",
                 b"\xff\xf1"):  # MP3 ± CRC, MPEG-2, ADTS AAC
        with pytest.raises(NotImplementedError, match="MPEG audio"):
            decode_audio_bytes(sync + b"\x00" * 64)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_any_single_bitflip_in_frame_region_raises(data):
    """CRC-16 covers every frame byte including subframe padding, so
    NO single-bit corruption in the frame region may decode silently
    — it must raise (CRC mismatch, or an earlier parse error when the
    flip derails the rice stream first). Metadata (STREAMINFO) is
    deliberately out of scope: FLAC defines no header checksum."""
    x = np.clip(
        np.cumsum(np.arange(200) % 17 - 8), -32768, 32767
    )
    good = encode_flac(x, 8000)
    meta_end = 4 + 4 + 34  # magic + block header + STREAMINFO body
    i = data.draw(st.integers(meta_end, len(good) - 1))
    bit = data.draw(st.integers(0, 7))
    corrupt = bytearray(good)
    corrupt[i] ^= 1 << bit
    with pytest.raises(ValueError):
        decode_flac(bytes(corrupt))


def test_reserved_sample_size_code_raises():
    """bps code 3 is reserved (RFC 9639); a frame carrying it must
    raise the specific reserved-code error, not silently fall back to
    the STREAMINFO width."""
    def sub(f):
        f.write(0, 1)
        f.write(0, 6)  # CONSTANT
        f.write(0, 1)
        f.write(42, 16)

    good = _custom_stream(16, sub)
    # patch the frame header's 3 bps bits (bits 32-34 of the frame,
    # i.e. byte 4 bits 4-6 of the header) from 4 (16-bit) to 3, then
    # re-stamp the CRC-8 so only the reserved-code check can object
    meta_end = 4 + 4 + 34
    frame = bytearray(good[meta_end:])
    b = frame[3]
    frame[3] = (b & 0b10000001) | (3 << 1)
    hdr_len = 6  # sync..bs/rate/chan/bps + coded number (1 byte)
    # header continues through the 16-bit blocksize; CRC byte follows
    hdr_len = 4 + 1 + 2  # fixed 4 bytes + utf8 number + 16-bit size
    from cae_polars_tools_spark.operators.flac import _crc8 as crc8

    frame[hdr_len] = crc8(bytes(frame[:hdr_len]))
    with pytest.raises(ValueError, match="reserved sample-size"):
        decode_flac(good[:meta_end] + bytes(frame))


def test_decode_header_code_variants():
    """Decoder-only frame-header paths the encoder never emits: 8-bit
    blocksize-at-end (code 6), inline sample-rate codes 12 (8-bit
    kHz), 13/14 (16-bit Hz / Hz*10), tabled blocksize codes, and an
    8-bit-bps stream."""
    def build(bn, bs_code, rate_code, rate_payload_bits, rate, bps=16,
              bps_code=4, extra_bn_bits=0):
        head = _BitWriter()
        head.write(max(16, bn), 16)
        head.write(max(16, bn), 16)
        head.write(0, 24); head.write(0, 24)
        head.write(rate, 20)
        head.write(0, 3)
        head.write(bps - 1, 5)
        head.write(bn, 36)
        info = head.bytes() + b"\x00" * 16
        out = bytearray(b"fLaC")
        out += bytes([0x80]) + len(info).to_bytes(3, "big") + info
        f = _BitWriter()
        f.write(0b11111111111110, 14)
        f.write(0, 2)
        f.write(bs_code, 4)
        f.write(rate_code, 4)
        f.write(0, 4)
        f.write(bps_code, 3)
        f.write(0, 1)
        f.buf += _utf8_encode(0)
        if extra_bn_bits:
            f.write(bn - 1, extra_bn_bits)
        if rate_payload_bits:
            f.write(rate_payload_bits[0], rate_payload_bits[1])
        f.align()
        hdr = f.bytes()
        f = _BitWriter(); f.buf = bytearray(hdr)
        f.write(_crc8(hdr), 8)
        # CONSTANT subframe, value 5
        f.write(0, 1); f.write(0, 6); f.write(0, 1); f.write(5, bps)
        f.align()
        body = f.bytes()
        return bytes(out + body + struct.pack(">H", _crc16(body)))

    # code 6: 8-bit blocksize-1 at header end
    rate, out = decode_flac(build(24, 6, 4, None, 8000, extra_bn_bits=8))
    assert out.shape == (24, 1) and (out == 5).all()
    # tabled blocksize 256 = code 8
    rate, out = decode_flac(build(256, 8, 4, None, 8000))
    assert out.shape == (256, 1)
    # rate code 12: kHz byte follows (value ignored for samples)
    _, out = decode_flac(build(192, 1, 12, (8, 8), 8000))
    assert out.shape == (192, 1)
    # rate codes 13/14: 16-bit payload follows
    for rc in (13, 14):
        _, out = decode_flac(build(192, 1, rc, (8000, 16), 8000))
        assert out.shape == (192, 1)
    # 8-bit stream (bps_code 1)
    _, out = decode_flac(build(192, 1, 4, None, 8000, bps=8, bps_code=1))
    assert (out[:, 0] == 5).all()
    # reserved blocksize code 0 must refuse
    with pytest.raises(ValueError, match="reserved block-size"):
        decode_flac(build(192, 0, 4, None, 8000))
    # invalid rate code 15 must refuse
    with pytest.raises(ValueError, match="sample-rate"):
        decode_flac(build(192, 1, 15, None, 8000))

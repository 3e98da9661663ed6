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
    # Ogg magic glued onto garbage is CORRUPTION (no valid page), not
    # a supported-container refusal — the demuxer must say so loudly
    with pytest.raises(ValueError, match="ogg"):
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


# ---------------------------------------------------------------------------
# Ogg-FLAC demux (RFC 3533 + the xiph Ogg-FLAC mapping)
# ---------------------------------------------------------------------------


def _ogg_pages(packets, serial=0x0D15EA5E, max_laces=255, version=0):
    """Test-side Ogg muxer, written straight from RFC 3533 (NOT the
    inverse of the demuxer's code paths): packets → lacing values
    (255 continues, <255 terminates — a 255-multiple packet gets a
    0 lace) → pages of at most ``max_laces`` segments with
    continued/BOS/EOS flags and the Ogg CRC-32."""
    from cae_polars_tools_spark.operators.flac import _ogg_crc

    laces = []
    for p in packets:
        n_full = len(p) // 255
        for i in range(n_full):
            laces.append((255, p[i * 255 : (i + 1) * 255]))
        laces.append((len(p) % 255, p[n_full * 255 :]))
    out = b""
    idx, seq, continued = 0, 0, False
    while idx < len(laces) or seq == 0:
        take = laces[idx : idx + max_laces]
        idx += len(take)
        htype = (
            (0x01 if continued else 0)
            | (0x02 if seq == 0 else 0)
            | (0x04 if idx >= len(laces) else 0)
        )
        page = bytearray(
            b"OggS"
            + bytes([version, htype])
            + (0).to_bytes(8, "little")       # granule (unused here)
            + serial.to_bytes(4, "little")
            + seq.to_bytes(4, "little")
            + b"\x00\x00\x00\x00"             # CRC placeholder
            + bytes([len(take)])
            + bytes(l for l, _ in take)
            + b"".join(d for _, d in take)
        )
        page[22:26] = _ogg_crc(bytes(page)).to_bytes(4, "little")
        out += bytes(page)
        seq += 1
        continued = bool(take) and take[-1][0] == 255
    return out


def _ogg_wrap(native, max_laces=255, n_chunks=3, serial=0x0D15EA5E):
    """Wrap a native fLaC stream per the Ogg-FLAC mapping: first
    packet = 0x7F 'FLAC' 1 0 count16 + magic+STREAMINFO, remaining
    bytes split across ``n_chunks`` packets (the demuxer concatenates,
    so chunking is packet-boundary-agnostic by design)."""
    si_end = 4 + 4 + 34  # magic + block header + STREAMINFO body
    pk0 = (
        bytes([0x7F]) + b"FLAC" + bytes([1, 0])
        + (0).to_bytes(2, "big") + native[:si_end]
    )
    rest = native[si_end:]
    step = max(1, -(-len(rest) // n_chunks))
    packets = [pk0] + [
        rest[i : i + step] for i in range(0, len(rest), step)
    ]
    return _ogg_pages(packets, serial=serial, max_laces=max_laces)


def test_ogg_flac_roundtrip_equals_native():
    """Ogg-wrapped FLAC must decode sample-identically to the native
    stream — including packets that span PAGES (max_laces=2 forces
    the continued-packet flag) and a packet of exactly 255 bytes
    (zero-lace terminator)."""
    rng = np.random.default_rng(7)
    x = np.cumsum(rng.integers(-50, 50, size=9000)).astype(np.int64)
    x = np.clip(x, -30000, 30000)
    native = encode_flac(x, 22050)
    want_rate, want = decode_flac(native)
    for ml, nc in ((255, 3), (2, 5), (255, 1)):
        rate, got = decode_flac(_ogg_wrap(native, max_laces=ml, n_chunks=nc))
        assert rate == want_rate and (got == want).all()
    # exact-255-byte packet → trailing 0 lace
    si_end = 4 + 4 + 34
    pk0 = (
        bytes([0x7F]) + b"FLAC" + bytes([1, 0])
        + (0).to_bytes(2, "big") + native[:si_end]
    )
    rest = native[si_end:]
    packets = [pk0, rest[:255], rest[255:]]
    rate, got = decode_flac(_ogg_pages(packets))
    assert rate == want_rate and (got == want).all()


def test_ogg_flac_through_audio_dispatch(spark):
    """The OggS payload flows through decode_audio_bytes into the same
    feature pass as native FLAC — container transparency end to end."""
    from cae_polars_tools_spark.operators.multimodal import (
        decode_audio_bytes,
    )

    x = np.arange(500, dtype=np.int64) % 97
    native = encode_flac(x, 16000)
    rate_n, out_n = decode_audio_bytes(native)
    rate_o, out_o = decode_audio_bytes(_ogg_wrap(native))
    assert rate_n == rate_o == 16000
    assert (out_n == out_o).all()


def test_ogg_hostile_bytes_refuse_loudly():
    native = encode_flac(np.arange(300), 8000)
    good = _ogg_wrap(native)

    # corrupt one payload byte: the page CRC-32 must catch it
    corrupt = bytearray(good)
    corrupt[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32"):
        decode_flac(bytes(corrupt))
    # unsupported Ogg version
    vbad = bytearray(good)
    vbad[4] = 1
    with pytest.raises(ValueError, match="version"):
        decode_flac(bytes(vbad))
    # truncated page body
    with pytest.raises(ValueError, match="truncated"):
        decode_flac(good[: len(good) - 7])
    # chained stream: a second BOS page after the first stream
    with pytest.raises(NotImplementedError, match="chained"):
        decode_flac(good + good)
    # multiplexed: serial changes mid-stream (re-mux second half with
    # a different serial, gluing whole pages together)
    si_end = 4 + 4 + 34
    pk0 = (
        bytes([0x7F]) + b"FLAC" + bytes([1, 0])
        + (0).to_bytes(2, "big") + native[:si_end]
    )
    first = _ogg_pages([pk0], serial=1)
    # second page claims BOS too (serial 2) → chained/multiplexed
    second = _ogg_pages([native[si_end:]], serial=2)
    with pytest.raises(NotImplementedError, match="second BOS"):
        decode_flac(first + second)
    # a non-FLAC mapping (Vorbis-style first packet) is a loud seam
    vorbis = _ogg_pages([b"\x01vorbis" + b"\x00" * 23])
    with pytest.raises(NotImplementedError, match="Ogg-FLAC mapping"):
        decode_flac(vorbis)
    # continuation flag set with no pending packet
    broken = bytearray(_ogg_pages([pk0, native[si_end:]], max_laces=1))
    # find the second page and force its continued bit on
    second_off = broken.index(b"OggS", 4)
    assert broken[second_off + 5] & 0x01 == 0
    broken[second_off + 5] |= 0x01
    from cae_polars_tools_spark.operators.flac import _ogg_crc

    # re-CRC so only the flag inconsistency can trip
    nseg = broken[second_off + 26]
    body_len = sum(broken[second_off + 27 : second_off + 27 + nseg])
    page_end = second_off + 27 + nseg + body_len
    page = bytearray(broken[second_off:page_end])
    page[22:26] = b"\x00\x00\x00\x00"
    broken[second_off + 22 : second_off + 26] = _ogg_crc(
        bytes(page)
    ).to_bytes(4, "little")
    with pytest.raises(ValueError, match="continuation"):
        decode_flac(bytes(broken))


def test_flac_external_tool_interop(tmp_path):
    """CI-optional interop against a REAL implementation: when the
    reference `flac` binary (or ffmpeg) is on PATH, (a) our encoder's
    output must pass `flac -t` / decode in ffmpeg, and (b) a stream
    produced BY the reference encoder must decode sample-exactly in
    our decoder. Skips where neither tool exists — the symmetric
    round-trip and hostile-bytes suites still run everywhere."""
    import shutil as _sh
    import subprocess
    import wave

    flac_bin = _sh.which("flac")
    ffmpeg = _sh.which("ffmpeg")
    if not flac_bin and not ffmpeg:
        pytest.skip("no flac/ffmpeg binary on PATH")

    rng = np.random.default_rng(3)
    x = np.clip(
        np.cumsum(rng.integers(-80, 80, size=5000)), -30000, 30000
    ).astype(np.int64)
    ours = tmp_path / "ours.flac"
    ours.write_bytes(encode_flac(x, 16000))

    if flac_bin:
        # (a) reference decoder verifies our stream (CRCs, MD5, frames)
        subprocess.run(
            [flac_bin, "-t", "-s", str(ours)], check=True
        )
        # (b) reference encoder → our decoder, sample-exact
        wav = tmp_path / "src.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.astype("<i2").tobytes())
        theirs = tmp_path / "theirs.flac"
        subprocess.run(
            [flac_bin, "-s", "-f", "-o", str(theirs), str(wav)],
            check=True,
        )
        rate, got = decode_flac(theirs.read_bytes())
        assert rate == 16000
        assert (got[:, 0].astype(np.int64) == x).all()
    if ffmpeg:
        # ffmpeg decodes our stream back to the exact PCM
        out_wav = tmp_path / "dec.wav"
        subprocess.run(
            [ffmpeg, "-v", "error", "-y", "-i", str(ours), str(out_wav)],
            check=True,
        )
        with wave.open(str(out_wav), "rb") as w:
            back = np.frombuffer(
                w.readframes(w.getnframes()), dtype="<i2"
            )
        assert (back.astype(np.int64) == x).all()


def test_encode_ogg_flac_structure_is_conforming():
    """The PRODUCT muxer must emit mapping-conforming streams, not
    just ones our own demuxer accepts: one audio frame per packet
    (packet boundaries land exactly on frame boundaries), BOS on the
    first page only, EOS on the last, and granule position = last
    completed sample of each page."""
    x = np.arange(10000, dtype=np.int64) % 1000 - 500
    from cae_polars_tools_spark.operators.flac import (
        _encode_flac_parts,
        encode_ogg_flac,
    )

    header, frames = _encode_flac_parts(x, 16000)
    ogg = encode_ogg_flac(x, 16000)

    # independent page walk (mirror of the test muxer, not the demuxer)
    pos, pages, packets, cur = 0, [], [], b""
    while pos < len(ogg):
        assert ogg[pos : pos + 4] == b"OggS"
        htype = ogg[pos + 5]
        gran = int.from_bytes(ogg[pos + 6 : pos + 14], "little", signed=True)
        nseg = ogg[pos + 26]
        laces = ogg[pos + 27 : pos + 27 + nseg]
        body = ogg[pos + 27 + nseg : pos + 27 + nseg + sum(laces)]
        pages.append((htype, gran))
        off = 0
        for lace in laces:
            cur += body[off : off + lace]
            off += lace
            if lace < 255:
                packets.append(cur)
                cur = b""
        pos += 27 + nseg + sum(laces)
    assert not cur
    # BOS exactly on page 0, EOS exactly on the last page
    assert pages[0][0] & 0x02 and all(not (h & 0x02) for h, _ in pages[1:])
    assert pages[-1][0] & 0x04 and all(
        not (h & 0x04) for h, _ in pages[:-1]
    )
    # first packet: mapping header + native header bytes
    assert packets[0][:5] == bytes([0x7F]) + b"FLAC"
    assert packets[0][9:] == header
    # ONE FRAME PER PACKET, byte-exact
    assert packets[1:] == [f for f, _ in frames]
    # final granule = total samples
    assert pages[-1][1] == len(x)


def test_encode_ogg_flac_large_frame_spans_pages():
    """A verbatim-heavy frame larger than one page's 255 lacing
    segments (65 KB) must span pages with the continued flag and
    still decode exactly."""
    rng = np.random.default_rng(11)
    # white noise at 32 bits → verbatim subframes ≈ 16 KB per 4096
    # block; force 3 channels to push one frame past 48KB... use
    # int32 range and 8 channels for ~130 KB frames
    x = rng.integers(-(2**30), 2**30, size=(8192, 8), dtype=np.int64)
    from cae_polars_tools_spark.operators.flac import encode_ogg_flac

    ogg = encode_ogg_flac(x, 48000, bits_per_sample=32)
    # at least one page must carry the continued-packet flag
    pos, continued_seen = 0, False
    while pos < len(ogg):
        nseg = ogg[pos + 26]
        if ogg[pos + 5] & 0x01:
            continued_seen = True
        pos += 27 + nseg + sum(ogg[pos + 27 : pos + 27 + nseg])
    assert continued_seen
    rate, got = decode_flac(ogg)
    assert rate == 48000 and (got.astype(np.int64) == x).all()


def test_encode_ogg_flac_id_packet_alone_on_first_page():
    """The xiph mapping's first-page rule: the BOS page carries ONLY
    the 0x7F'FLAC' identification packet, granule position 0 —
    libflac's Ogg decoder rejects streams that pack audio onto it."""
    from cae_polars_tools_spark.operators.flac import encode_ogg_flac

    ogg = encode_ogg_flac(np.arange(5000, dtype=np.int64) % 211, 16000)
    nseg = ogg[26]
    laces = ogg[27 : 27 + nseg]
    body = ogg[27 + nseg : 27 + nseg + sum(laces)]
    gran = int.from_bytes(ogg[6:14], "little", signed=True)
    assert gran == 0
    # exactly ONE packet on page 0: every lace but the last is a
    # continuation (255) and the last terminates it
    assert laces[-1] < 255 and all(l == 255 for l in laces[:-1])
    assert body[:5] == bytes([0x7F]) + b"FLAC"


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=6000),
    st.sampled_from([8000, 16000, 44100]),
)
def test_ogg_flac_roundtrip_fuzz(vals, rate):
    """Property: decode(mux(encode(x))) == x for arbitrary PCM —
    the Ogg layer must be transparent for every frame/page shape the
    encoder can produce."""
    from cae_polars_tools_spark.operators.flac import encode_ogg_flac

    x = np.asarray(vals, dtype=np.int64)
    got_rate, out = decode_flac(encode_ogg_flac(x, rate))
    assert got_rate == rate
    assert out.shape == (len(x), 1)
    assert (out[:, 0].astype(np.int64) == x).all()

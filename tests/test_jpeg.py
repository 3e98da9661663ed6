"""Baseline JPEG codec (numpy-only): round-trip tolerances, exactness
where the pipeline is error-free, stream/format guards, and the Spark
dispatch path."""

from __future__ import annotations

import numpy as np
import pytest

from cae_polars_tools_spark.operators.jpeg import (
    _DCT,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def test_dct_basis_is_orthonormal():
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


def test_zigzag_is_a_permutation_with_correct_head():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    # spec order starts (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),(0,3)...
    assert _ZIGZAG[:7].tolist() == [0, 1, 8, 16, 9, 2, 3]


def test_flat_blocks_roundtrip_exact():
    """DC-only content has zero quantization error by construction."""
    for level in (0, 37, 120, 255):
        px = np.full((16, 24, 3), level, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, 90))
        assert out.shape == px.shape
        assert np.array_equal(out, px), level


@pytest.mark.parametrize(
    "shape", [(8, 8, 3), (17, 19, 3), (1, 1, 3), (9, 11), (40, 32, 3)]
)
def test_noise_roundtrip_within_quantization_budget(shape):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, 90))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 32


def test_smooth_gradient_near_exact():
    g = np.linspace(0, 255, 32 * 40).reshape(32, 40)
    img = np.stack([g, g[::-1], np.roll(g, 7, axis=1)], axis=-1).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg(img, 90))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_quality_knob_is_monotone():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    errs = [
        np.abs(
            decode_jpeg(encode_jpeg(px, q)).astype(int) - px.astype(int)
        ).mean()
        for q in (30, 60, 90)
    ]
    assert errs[0] > errs[1] > errs[2]


def test_deterministic_bytes():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert encode_jpeg(px, 85) == encode_jpeg(px.copy(), 85)


def test_guards():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"BMxxxx")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF/SOS
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="unsupported pixel shape"):
        encode_jpeg(rng.integers(0, 255, size=(4, 4, 2), dtype=np.uint8))


def test_dispatch_through_image_features(spark):
    """image_features sniffs JPEG alongside BMP/PNG; lossy means the
    channel means are compared with a tolerance, not exactly."""
    import pandas as pd

    from cae_polars_tools_spark.operators.multimodal import (
        encode_bmp,
        image_features,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "payload": [encode_bmp(px), encode_jpeg(px, 90)],
            }
        )
    )
    rows = {r["doc_id"]: r for r in image_features(df).collect()}
    assert rows[2]["width"] == 8 and rows[2]["height"] == 8
    for ch in ("mean_r", "mean_g", "mean_b"):
        assert abs(rows[1][ch] - rows[2][ch]) < 8.0


def test_property_roundtrip_random_shapes_and_qualities():
    """Hypothesis-style sweep (seeded loop — the codec is slow enough
    per case that explicit cases beat shrinking): arbitrary small
    shapes x qualities stay within a generous quantization envelope
    and always reproduce exact dimensions."""
    rng = np.random.default_rng(2024)
    for _ in range(12):
        h = int(rng.integers(1, 26))
        w = int(rng.integers(1, 26))
        c = int(rng.choice([0, 3]))
        # below ~q50 the quant steps on noise legitimately exceed any
        # tight pixel budget (observed 177 at q26); sweep the range
        # real pipelines use and let the monotone test cover the tail
        q = int(rng.integers(50, 99))
        shape = (h, w) if c == 0 else (h, w, 3)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, q))
        assert out.shape == px.shape, (shape, q)
        # random noise is the codec's worst case and per-case error is
        # not monotone in quality (basis overlap): assert a generous
        # decodes-sanely ceiling here; the precise per-quality budgets
        # live in the dedicated flat/gradient/monotone tests above
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 160, (
            shape,
            q,
        )


def test_resize_image_bytes_across_formats(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        decode_png,
        encode_bmp,
        encode_png,
        resize_image_bytes,
    )

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
    for payload in (encode_bmp(px), encode_png(px), encode_jpeg(px, 90)):
        out = decode_png(resize_image_bytes(payload, 5, 4))
        assert out.shape == (4, 5, 3)
    # lossless inputs resize pixel-exactly
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(5) * 10) // 5
    want = px[ys][:, xs]
    assert np.array_equal(
        decode_png(resize_image_bytes(encode_bmp(px), 5, 4)), want
    )


def test_truncation_fuzz_never_hangs():
    """Every truncation of a valid stream either raises cleanly or
    returns an image — bounded time, no hangs, no non-ValueError
    crashes (the guard an ingest pipeline fed hostile bytes needs)."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = encode_jpeg(px, 90)
    for cut in list(range(2, min(len(data), 60))) + [len(data) - 3]:
        try:
            decode_jpeg(data[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_random_corruption_fuzz_raises_cleanly():
    """Random byte corruptions either raise ValueError/
    NotImplementedError or decode to some image — never an internal
    IndexError/KeyError (hostile-bytes ingest safety)."""
    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(px, 80))
    for _ in range(120):
        d = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            d[int(rng.integers(2, len(d)))] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(d))
        except (ValueError, NotImplementedError):
            pass


# ---------------------------------------------------------------------------
# Chroma subsampling (4:2:2 / 4:2:0) and restart markers
# ---------------------------------------------------------------------------


def _chroma_smooth_rgb(h, w):
    """Luma gradient with constant chroma: subsampling is near-lossless
    on it, so round-trip budgets stay tight."""
    y = np.linspace(40, 200, w)[None, :] + np.linspace(0, 30, h)[:, None]
    return (
        np.stack([y, y * 0.9 + 10, y * 0.8 + 20], axis=-1)
        .clip(0, 255)
        .astype(np.uint8)
    )


@pytest.mark.parametrize("sub", ["422", "420"])
@pytest.mark.parametrize("shape", [(16, 16), (37, 53), (8, 9)])
def test_subsampled_roundtrip_smooth(sub, shape):
    px = _chroma_smooth_rgb(*shape)
    out = decode_jpeg(encode_jpeg(px, quality=95, subsampling=sub))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_flat_roundtrip_exact_all_subsamplings(sub):
    px = np.full((24, 24, 3), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90, subsampling=sub))
    assert np.array_equal(out, px)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_restart_markers_roundtrip(sub):
    """restart_interval emits DRI + RSTn and the decoder resyncs:
    the decode must be IDENTICAL to the no-restart decode (restarts
    change framing, not coefficients)."""
    px = _chroma_smooth_rgb(37, 53)
    plain = decode_jpeg(encode_jpeg(px, quality=95, subsampling=sub))
    enc = encode_jpeg(px, quality=95, subsampling=sub, restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI present
    n_rst = sum(
        1
        for i in range(len(enc) - 1)
        if enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
    )
    assert n_rst >= 1
    assert np.array_equal(decode_jpeg(enc), plain)


def test_handbuilt_420_stream_pins_mcu_block_order():
    """A 4:2:0 stream built BY HAND from the spec (never through the
    encoder): 16x16 image, one MCU, four flat luma quadrants with
    distinct values and neutral chroma. All blocks are DC-only with a
    unit quant table, so the decode is EXACT — and the quadrant
    placement pins the spec's MCU block order (Y: TL,TR,BL,BR then
    Cb, Cr) independently of anything the encoder does. A symmetric
    encoder/decoder ordering bug cannot cancel here."""
    import struct

    quads = {"tl": 138, "tr": 148, "bl": 158, "br": 118}
    # flat 8x8 block, orthonormal 2D DCT: DC = 8*(v-128); quant 1
    dcs = [8 * (v - 128) for v in (quads["tl"], quads["tr"], quads["bl"], quads["br"])]

    bits_out = []

    def put(value, length):
        bits_out.extend((value >> (length - 1 - i)) & 1 for i in range(length))

    def put_dc(diff):
        cat = abs(diff).bit_length()
        put(cat, 4)  # DC table: symbols 0..10 at fixed length 4, code==symbol
        if cat:
            put(diff if diff > 0 else diff + (1 << cat) - 1, cat)
        put(0, 1)  # AC table: single EOB symbol at length 1, code 0

    prev = 0
    for dc in dcs:  # Y blocks in spec order TL,TR,BL,BR
        put_dc(dc - prev)
        prev = dc
    put_dc(0)  # Cb (flat 128 -> DC 0, own predictor)
    put_dc(0)  # Cr
    while len(bits_out) % 8:
        bits_out.append(1)  # 1-fill pad
    entropy = bytearray()
    for i in range(0, len(bits_out), 8):
        byte = int("".join(map(str, bits_out[i : i + 8])), 2)
        entropy.append(byte)
        if byte == 0xFF:
            entropy.append(0x00)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc0" + sof
    dc_bits = [0] * 16
    dc_bits[3] = 11  # 11 symbols, all at code length 4
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + 11)
        + bytes([0x00])
        + bytes(dc_bits)
        + bytes(range(11))
    )
    ac_bits = [0] * 16
    ac_bits[0] = 1  # one symbol (EOB) at code length 1
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + 1)
        + bytes([0x10])
        + bytes(ac_bits)
        + bytes([0x00])
    )
    sos = struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos + bytes(entropy) + b"\xff\xd9"

    img = decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)
    # neutral chroma -> r=g=b=luma, DC-only unit-quant -> exact
    for (ys, xs), key in [
        ((slice(0, 8), slice(0, 8)), "tl"),
        ((slice(0, 8), slice(8, 16)), "tr"),
        ((slice(8, 16), slice(0, 8)), "bl"),
        ((slice(8, 16), slice(8, 16)), "br"),
    ]:
        region = img[ys, xs]
        assert np.all(region == quads[key]), (key, np.unique(region))


def test_fill_bytes_and_tem_markers_tolerated():
    """Spec-legal 0xFF fill bytes before a marker and standalone TEM
    (0xFF 0x01) markers must not derail the header walk."""
    px = _chroma_smooth_rgb(16, 16)
    enc = encode_jpeg(px, quality=95)
    want = decode_jpeg(enc)
    # insert after SOI: two fill bytes before DQT, and a TEM marker
    doctored = enc[:2] + b"\xff\xff" + b"\xff\x01" + enc[2:]
    assert np.array_equal(decode_jpeg(doctored), want)


def test_corrupt_restart_stream_raises_cleanly():
    px = _chroma_smooth_rgb(37, 53)
    enc = bytearray(
        encode_jpeg(px, quality=95, subsampling="420", restart_interval=1)
    )
    # find the first RST marker inside the entropy stream and break it
    sos = bytes(enc).find(b"\xff\xda")
    for i in range(sos, len(enc) - 1):
        if enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7:
            enc[i + 1] = 0x65  # not a restart, not stuffing
            break
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


def test_truncated_subsampled_stream_raises_cleanly():
    px = _chroma_smooth_rgb(32, 32)
    data = encode_jpeg(px, quality=90, subsampling="420", restart_interval=2)
    for cut in list(range(2, 60)) + [len(data) // 2, len(data) - 3]:
        try:
            decode_jpeg(data[:cut])
        except (ValueError, NotImplementedError):
            pass


# ---------------------------------------------------------------------------
# Progressive (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (37, 53)])
@pytest.mark.parametrize("q", [50, 90])
def test_progressive_decodes_identical_to_baseline(sub, shape, q):
    """Successive approximation is lossless once every scan lands: the
    progressive encoding of an image must decode BIT-IDENTICALLY to
    its baseline encoding (same DCT, same quantizer, same
    coefficients — only the entropy framing differs). This pins the
    whole progressive path — DC first/refine, AC first/refine, EOB
    runs — against the already-oracle-checked baseline decoder."""
    rng = np.random.default_rng(hash((sub, shape, q)) % 2**32)
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, q, subsampling=sub))
    prog = decode_jpeg(encode_jpeg(px, q, subsampling=sub, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_grayscale_and_restart_identity():
    rng = np.random.default_rng(21)
    g = rng.integers(0, 256, size=(19, 23), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, 85)),
        decode_jpeg(encode_jpeg(g, 85, progressive=True)),
    )
    px = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    want = decode_jpeg(encode_jpeg(px, 90, subsampling="420"))
    for ri in (1, 3):
        enc = encode_jpeg(
            px, 90, subsampling="420", progressive=True, restart_interval=ri
        )
        assert b"\xff\xdd" in enc
        assert np.array_equal(decode_jpeg(enc), want)


def test_handbuilt_progressive_stream_pins_scan_semantics():
    """A progressive stream built BY HAND from the spec (never through
    the encoder): 16x8 grayscale, two blocks, unit quant table, four
    scans — DC first (Al=1), DC refinement, AC first with an EOB run
    spanning the second block, AC refinement whose correction bit and
    EOB run must both be consumed. Expected pixels are computed with
    an INDEPENDENT inverse DCT written here, so no symmetric
    encoder/decoder bug can satisfy this test."""
    import math
    import struct

    bits_out = []

    def put(value, length):
        bits_out.extend(
            (value >> (length - 1 - i)) & 1 for i in range(length)
        )

    def finish_scan():
        nonlocal_entropy = bytearray()
        while len(bits_out) % 8:
            bits_out.append(1)
        for i in range(0, len(bits_out), 8):
            byte = int("".join(map(str, bits_out[i : i + 8])), 2)
            nonlocal_entropy.append(byte)
            if byte == 0xFF:
                nonlocal_entropy.append(0x00)
        bits_out.clear()
        return bytes(nonlocal_entropy)

    # DC table: symbols 6,7 at code length 2 (codes 00, 01)
    # AC table: symbols 0x00, 0x03, 0x10 at length 2 (codes 00, 01, 10)
    # Coefficients: block A dc=81, ac[zigzag 1]=14; block B dc=-81.
    # Scan 1 — DC first (Al=1): shifted DCs 40, -41; diffs 40, -81
    put(0b00, 2)          # cat 6
    put(40, 6)
    put(0b01, 2)          # cat 7
    put(-81 + 127, 7)     # negative encoding: v + 2^s - 1
    scan1 = finish_scan()
    # Scan 2 — DC refinement (Al=0): bits 81&1=1, -81&1=1
    put(1, 1)
    put(1, 1)
    scan2 = finish_scan()
    # Scan 3 — AC first (Ss=1,Se=63,Al=1): block A codes 14>>1=7
    # (r=0,s=3), its trailing zeros + all of block B fold into an
    # EOB run of 2 (symbol 0x10 + 1 extension bit 0)
    put(0b01, 2)          # symbol 0x03
    put(7, 3)
    put(0b10, 2)          # symbol 0x10: EOB run, nbits=1
    put(0, 1)             # run = 2 + 0
    scan3 = finish_scan()
    # Scan 4 — AC refinement (Ah=1,Al=0): no newly-nonzero anywhere;
    # EOB run of 2 carries block A's one correction bit (14 & 1 = 0)
    put(0b10, 2)          # symbol 0x10
    put(0, 1)             # run = 2
    put(0, 1)             # correction bit for coefficient 14
    scan4 = finish_scan()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">HBHHB", 11, 8, 8, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + sof
    dc_bits = [0] * 16
    dc_bits[1] = 2
    out += (
        b"\xff\xc4" + struct.pack(">H", 21)
        + bytes([0x00]) + bytes(dc_bits) + bytes([6, 7])
    )
    ac_bits = [0] * 16
    ac_bits[1] = 3
    out += (
        b"\xff\xc4" + struct.pack(">H", 22)
        + bytes([0x10]) + bytes(ac_bits) + bytes([0x00, 0x03, 0x10])
    )
    for (ss, se, ahal), entropy in [
        ((0, 0, 0x01), scan1),
        ((0, 0, 0x10), scan2),
        ((1, 63, 0x01), scan3),
        ((1, 63, 0x10), scan4),
    ]:
        out += (
            b"\xff\xda" + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00]) + bytes([ss, se, ahal]) + entropy
        )
    out += b"\xff\xd9"

    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 16)

    # independent expectation: orthonormal IDCT of the two blocks
    def b0(_):
        return 1.0 / math.sqrt(8.0)

    def b1(x):
        return 0.5 * math.cos((2 * x + 1) * math.pi / 16.0)

    want = np.zeros((8, 16))
    for y in range(8):
        for x in range(8):
            # block A: dc=81 at (0,0), ac=14 at (row 0, col 1)
            want[y, x] = 81 * b0(y) * b0(x) + 14 * b0(y) * b1(x) + 128
            want[y, x + 8] = -81 * b0(y) * b0(x) + 128  # block B
    want = np.clip(np.round(want), 0, 255).astype(np.uint8)
    assert np.array_equal(img, want)


def test_progressive_truncation_and_corruption_fuzz():
    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    data = bytearray(
        encode_jpeg(px, 80, subsampling="420", progressive=True)
    )
    for cut in list(range(2, 80)) + [len(data) // 2, len(data) - 3]:
        try:
            decode_jpeg(bytes(data[:cut]))
        except (ValueError, NotImplementedError):
            pass
    for _ in range(120):
        d = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            d[int(rng.integers(2, len(d)))] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(d))
        except (ValueError, NotImplementedError):
            pass

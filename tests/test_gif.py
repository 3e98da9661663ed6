"""GIF decoder: hand-assembled streams (independent in-test LZW
compressor — the repo has no GIF encoder, so no symmetric codec bug
can pass), interlace, animation compositing, transparency, disposal,
and hostile-bytes guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cae_polars_tools_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    split_gif_frames,
)


def _lzw_compress(indices, min_code_size):
    """Independent textbook GIF-LZW compressor: dictionary of tuples,
    CLEAR up front, variable width growing when the next code to be
    ASSIGNED would overflow the current width, END at the end."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits = []

    def emit(code, width):
        for i in range(width):
            out_bits.append((code >> i) & 1)

    table = {(i,): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    buf = ()
    for px in indices:
        cand = buf + (int(px),)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                # the just-assigned code needs one more bit on the
                # DECODER side from now on
                width += 1
        buf = (int(px),)
    if buf:
        emit(table[buf], width)
    emit(end, width)
    data = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, b in enumerate(out_bits[i : i + 8]):
            byte |= b << j
        data.append(byte)
    return bytes(data)


def _subblocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _build_gif(
    w,
    h,
    palette,
    frames,
    interlace=False,
    magic=b"GIF89a",
    bg_idx=0,
):
    """frames: list of (left, top, idx 2-D array, gce-or-None);
    gce = (disposal, delay_cs, transparent_index_or_None)."""
    size_bits = max((len(palette) - 1).bit_length(), 1) - 1
    n_entries = 2 << size_bits
    out = bytearray(magic)
    out += struct.pack("<HHBBB", w, h, 0x80 | size_bits, bg_idx, 0)
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += b"\x00\x00\x00" * (n_entries - len(palette))
    for left, top, idx, gce in frames:
        if gce is not None:
            disposal, delay, t_idx = gce
            packed = (disposal << 2) | (1 if t_idx is not None else 0)
            out += bytes([0x21, 0xF9, 4, packed])
            out += struct.pack("<H", delay)
            out += bytes([t_idx if t_idx is not None else 0, 0])
        fh, fw = idx.shape
        ipacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, ipacked)
        min_code = max(size_bits + 1, 2)
        rows = idx
        if interlace:
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            rows = idx[order]
        out += bytes([min_code]) + _subblocks(
            _lzw_compress(rows.reshape(-1), min_code)
        )
    out += b"\x3b"
    return bytes(out)


PALETTE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def test_single_frame_decode_exact():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4, size=(13, 17), dtype=np.uint8)
    gif = _build_gif(17, 13, PALETTE, [(0, 0, idx, None)])
    out = decode_gif(gif)
    assert np.array_equal(out, np.array(PALETTE, np.uint8)[idx])


def test_lzw_dictionary_growth_roundtrip():
    """Long repetitive data forces dictionary growth through several
    width increases (including the KwKwK case) — decode must
    reproduce the indices exactly against the independent
    compressor."""
    rng = np.random.default_rng(2)
    # 64x64 with long runs: dictionary blows past 9->10->11 bit widths
    idx = np.repeat(
        rng.integers(0, 4, size=(64, 16), dtype=np.uint8), 4, axis=1
    )
    gif = _build_gif(64, 64, PALETTE, [(0, 0, idx, None)])
    assert np.array_equal(
        decode_gif(gif), np.array(PALETTE, np.uint8)[idx]
    )


def test_interlaced_decode():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, size=(16, 8), dtype=np.uint8)
    plain = _build_gif(8, 16, PALETTE, [(0, 0, idx, None)])
    laced = _build_gif(8, 16, PALETTE, [(0, 0, idx, None)], interlace=True)
    assert np.array_equal(decode_gif(laced), decode_gif(plain))


def test_gif87a_magic_accepted():
    idx = np.zeros((2, 2), dtype=np.uint8)
    gif = _build_gif(2, 2, PALETTE, [(0, 0, idx, None)], magic=b"GIF87a")
    assert decode_gif(gif).shape == (2, 2, 3)


def test_animation_compositing_transparency_and_disposal():
    """Frame 2 paints a sub-rectangle with a transparent index: the
    transparent pixels must show frame 1 underneath; a disposal-2
    frame restores its region to background before frame 3."""
    pal = np.array(PALETTE, np.uint8)
    base = np.zeros((4, 4), dtype=np.uint8)  # all red
    patch = np.array([[1, 3], [3, 2]], dtype=np.uint8)  # 3 = transparent
    tail = np.array([[2]], dtype=np.uint8)
    gif = _build_gif(
        4, 4, PALETTE,
        [
            (0, 0, base, (0, 5, None)),
            (1, 1, patch, (2, 7, 3)),  # disposal 2, transparent idx 3
            (0, 0, tail, (0, 0, None)),
        ],
    )
    meta, frames = decode_gif_frames(gif)
    assert meta["n_frames"] == 3
    assert meta["delays_cs"] == [5, 7, 0]
    f1, f2, f3 = frames
    assert np.array_equal(f1, pal[base])
    # frame 2: opaque patch pixels replace; transparent show-through
    want2 = pal[base].copy()
    want2[1, 1] = pal[1]
    want2[2, 2] = pal[2]
    # (1,2) and (2,1) were transparent -> frame-1 red survives
    assert np.array_equal(f2, want2)
    # frame 3: the disposal-2 region reverted to background (palette
    # bg_idx 0 = red) before the 1x1 tail painted at (0,0)
    want3 = pal[base].copy()
    want3[0, 0] = pal[2]
    assert np.array_equal(f3, want3)


def test_local_color_table_overrides_global():
    # frame with its own table: indices must map through the local one
    idx = np.array([[0, 1]], dtype=np.uint8)
    gif = bytearray(_build_gif(2, 1, PALETTE, []))
    # remove trailer, append a frame with a local table
    assert gif[-1] == 0x3B
    gif = gif[:-1]
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0x80)  # local, size 0
    gif += bytes([7, 7, 7, 200, 201, 202])  # 2-entry local table
    gif += bytes([2]) + _subblocks(_lzw_compress(idx.reshape(-1), 2))
    gif += b"\x3b"
    out = decode_gif(bytes(gif))
    assert out[0, 0].tolist() == [7, 7, 7]
    assert out[0, 1].tolist() == [200, 201, 202]


def test_split_gif_frames_through_sample_frames(spark):
    from cae_polars_tools_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(5)
    idx = [rng.integers(0, 4, size=(3, 5), dtype=np.uint8) for _ in range(4)]
    gif = _build_gif(
        5, 3, PALETTE, [(0, 0, f, (0, 2, None)) for f in idx]
    )
    assets = spark.createDataFrame(
        [(9, bytearray(gif))], "doc_id long, payload binary"
    )
    out = sample_frames(assets, step=2, split_fn=split_gif_frames).collect()
    got = {r["frame_idx"]: bytes(r["frame"]) for r in out}
    assert set(got) == {0, 2}
    pal = np.array(PALETTE, np.uint8)
    assert got[0] == pal[idx[0]].tobytes()
    assert got[2] == pal[idx[2]].tobytes()


def test_image_features_dispatches_gif(spark):
    from cae_polars_tools_spark.operators.multimodal import image_features

    idx = np.zeros((4, 6), dtype=np.uint8)  # all palette[0] = red
    gif = _build_gif(6, 4, PALETTE, [(0, 0, idx, None)])
    assets = spark.createDataFrame(
        [(3, bytearray(gif))], "doc_id long, payload binary"
    )
    [r] = image_features(assets).collect()
    assert (r["width"], r["height"]) == (6, 4)
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (255.0, 0.0, 0.0)


def test_guards_and_hostile_bytes_fuzz():
    """Every truncation and random corruption either decodes to some
    image or raises ValueError — never an internal IndexError/
    struct.error (the ingest-pipeline guard the other codecs carry)."""
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF...")
    idx = np.arange(16, dtype=np.uint8).reshape(4, 4) % 4
    data = _build_gif(4, 4, PALETTE, [(0, 0, idx, (0, 1, None))])
    for cut in range(len(data)):
        try:
            decode_gif(data[:cut])
        except ValueError:
            pass
    rng = np.random.default_rng(7)
    for _ in range(150):
        d = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            d[int(rng.integers(6, len(d)))] = int(rng.integers(0, 256))
        try:
            decode_gif(bytes(d))
        except ValueError:
            pass


def test_encode_gif_roundtrips_exact():
    from cae_polars_tools_spark.operators.gif import encode_gif

    rng = np.random.default_rng(11)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(23, 31), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, palette))
    assert np.array_equal(out, palette[idx])
    # small palettes round-trip too (size_bits < 7 path)
    pal4 = np.array(PALETTE, np.uint8)
    idx4 = rng.integers(0, 4, size=(5, 9), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx4, pal4)), pal4[idx4])
    with pytest.raises(ValueError, match="out of range"):
        encode_gif(np.full((2, 2), 9, np.uint8), pal4)


def test_disposal_restore_previous():
    """Disposal 3 (restore to previous): the frame's region must
    revert to the PRE-frame content before the next frame draws."""
    pal = np.array(PALETTE, np.uint8)
    base = np.zeros((3, 3), dtype=np.uint8)          # red screen
    flash = np.full((2, 2), 1, dtype=np.uint8)        # green patch
    tail = np.array([[2]], dtype=np.uint8)            # blue pixel
    gif = _build_gif(
        3, 3, PALETTE,
        [
            (0, 0, base, (0, 1, None)),
            (1, 1, flash, (3, 1, None)),  # disposal 3
            (0, 0, tail, (0, 1, None)),
        ],
    )
    meta, frames = decode_gif_frames(gif)
    f1, f2, f3 = frames
    # frame 2 shows the flash...
    assert np.array_equal(f2[1:3, 1:3], pal[flash])
    # ...frame 3 shows the flash REGION restored to frame-1 red, with
    # only the new blue pixel at (0,0)
    want3 = pal[base].copy()
    want3[0, 0] = pal[2]
    assert np.array_equal(f3, want3)


def test_animation_volume_cap():
    """Thousands of tiny frames on a large canvas must hit the
    animation-volume budget instead of out-allocating the payload."""
    w = h = 4000  # 16 MP screen -> budget allows ~8 frames
    px = np.zeros((1, 1), dtype=np.uint8)
    frames = [(0, 0, px, None)] * 20
    gif = _build_gif(w, h, PALETTE, frames)
    with pytest.raises(ValueError, match="ingest cap"):
        decode_gif_frames(gif)

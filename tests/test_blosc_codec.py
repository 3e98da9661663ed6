"""Tests for the vendored pure-Python blosc/LZ4 decoder and the zarr
filter chain — hand-crafted frames per the public c-blosc 1.x / LZ4
block specs (no native blosc exists in this environment to generate
fixtures, so the vectors are composed byte-by-byte)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cae_polars_tools_spark.sources.blosc_codec import (
    BloscFormatError,
    blosc_compress_memcpy,
    blosc_decompress,
    lz4_decompress_block,
)


def test_lz4_literal_only_block():
    data = bytes(range(100))
    # token: 15 literals + extension byte 85 → 100 literals, no match.
    stream = bytes([0xF0, 85]) + data
    assert lz4_decompress_block(stream, 100) == data


def test_lz4_match_and_overlap():
    # "abcdefgh" then a 240-byte match at offset 8 (overlapping RLE of
    # the 8-byte period), then a literal-only tail of 5 bytes.
    expect = b"abcdefgh" + (b"abcdefgh" * 30) + b"vwxyz"
    stream = (
        bytes([0x8F])          # 8 literals, match_len 15+4 (+ext)
        + b"abcdefgh"
        + b"\x08\x00"          # offset 8
        + bytes([221])         # match extension: 4+15+221 = 240
        + bytes([0x50])        # final sequence: 5 literals
        + b"vwxyz"
    )
    assert lz4_decompress_block(stream, len(expect)) == expect


def test_lz4_bad_offset_raises():
    with pytest.raises(BloscFormatError):
        lz4_decompress_block(bytes([0x10, ord("a"), 0x09, 0x00]), 100)


def test_blosc_memcpy_roundtrip():
    payload = np.arange(64, dtype=np.int32).tobytes()
    frame = blosc_compress_memcpy(payload, typesize=4)
    assert blosc_decompress(frame) == payload


def _lz4_frame(data: bytes, stream: bytes, flags: int, typesize: int) -> bytes:
    header = bytes([2, 1, flags, typesize]) + struct.pack(
        "<iii", len(data), len(data), 16 + 4 + 4 + len(stream)
    )
    return header + struct.pack("<i", 20) + struct.pack("<i", len(stream)) + stream


def test_blosc_lz4_single_stream():
    expect = b"abcdefgh" + (b"abcdefgh" * 30) + b"vwxyz"
    stream = (
        bytes([0x8F]) + b"abcdefgh" + b"\x08\x00" + bytes([221])
        + bytes([0x50]) + b"vwxyz"
    )
    frame = _lz4_frame(expect, stream, flags=1 << 5, typesize=1)
    assert blosc_decompress(frame) == expect


def test_blosc_shuffle_split_streams():
    """typesize=2, 256 elements, byte-shuffled and split into 2 raw
    streams — the shape c-blosc produces for shuffled lz4/blosclz
    blocks above the split threshold."""
    orig = np.arange(256, dtype="<u2").tobytes()  # 512 bytes
    shuf = np.frombuffer(orig, dtype=np.uint8).reshape(256, 2).T.reshape(-1)
    s0, s1 = shuf[:256].tobytes(), shuf[256:].tobytes()
    block = (
        struct.pack("<i", 256) + s0 + struct.pack("<i", 256) + s1
    )  # csize == neblock → stored raw
    header = bytes([2, 1, 0x1 | (1 << 5), 2]) + struct.pack(
        "<iii", 512, 512, 16 + 4 + len(block)
    )
    frame = header + struct.pack("<i", 20) + block
    assert blosc_decompress(frame) == orig


def test_blosc_unsupported_codec_mentions_numcodecs():
    header = bytes([2, 1, 4 << 5, 1]) + struct.pack("<iii", 8, 8, 28)
    frame = header + struct.pack("<i", 20) + b"\x00" * 8
    with pytest.raises(BloscFormatError, match="numcodecs"):
        blosc_decompress(frame)


def test_store_with_blosc_compressor_roundtrip(tmp_path):
    """write_group(compressor blosc) emits valid memcpyed blosc frames
    that the read path decodes — end-to-end through the scan."""
    from cae_polars_tools_spark.sources.zarr_format import (
        open_group,
        write_group,
    )

    root = str(tmp_path / "blosc.zarr")
    data = np.arange(24, dtype=np.float32).reshape(4, 6)
    write_group(
        root,
        arrays={"m": data},
        dims={"m": ("a", "b")},
        coords={},
        chunks={"m": (2, 3)},
        compressor={"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    )
    arr = open_group(root).get_array("m")
    np.testing.assert_array_equal(arr[(slice(None), slice(None))], data)


def test_unsupported_compressor_error_names_package(tmp_path):
    from cae_polars_tools_spark.sources.zarr_format import _decode_bytes

    with pytest.raises(ValueError, match="numcodecs"):
        _decode_bytes(b"\x00" * 8, {"id": "zstd"})


def test_delta_filter_roundtrip(tmp_path):
    from cae_polars_tools_spark.sources.zarr_format import (
        open_group,
        write_array,
        write_group,
    )

    root = str(tmp_path / "delta.zarr")
    write_group(root, arrays={}, coords={})
    data = np.array([5, 7, 2, 2, 9, -3, 100, 100], dtype=np.int64)
    write_array(
        root,
        "d",
        data,
        chunks=(3,),
        compressor={"id": "zlib", "level": 5},
        filters=[{"id": "delta", "dtype": "<i8"}],
    )
    # consolidated=False: 'd' was added after write_group consolidated
    arr = open_group(root, consolidated=False).get_array("d")
    np.testing.assert_array_equal(arr[(slice(None),)], data)
    # metadata surfaces the filter chain (reference parity: info shows
    # filters, reference zarr_storage.py:403)
    assert arr.filters == [{"id": "delta", "dtype": "<i8"}]


def test_unknown_filter_error_names_package(tmp_path):
    from cae_polars_tools_spark.sources.zarr_format import (
        _apply_filters_decode,
    )

    with pytest.raises(ValueError, match="numcodecs"):
        _apply_filters_decode(
            b"\x00" * 8, [{"id": "fixedscaleoffset"}], np.dtype("<i8")
        )


def test_lz4_truncated_input_raises_format_error():
    """Truncated literal/match-extension reads must surface as
    BloscFormatError (not bare IndexError): the adaptive split-count
    fallback in blosc_decompress catches only BloscFormatError, and a
    wrong split-count guess is exactly how a mid-sequence truncation
    arises."""
    from cae_polars_tools_spark.sources.blosc_codec import (
        BloscFormatError,
        lz4_decompress_block,
    )

    # token promises a 15+ literal run, then input ends mid-extension
    with pytest.raises(BloscFormatError):
        lz4_decompress_block(bytes([0xF0]), 64)
    # literals ok, then truncated mid-offset (only 1 of 2 offset bytes)
    with pytest.raises(BloscFormatError):
        lz4_decompress_block(bytes([0x12, ord("a"), 0x01]), 64)
    # match-length extension runs past end
    with pytest.raises(BloscFormatError):
        lz4_decompress_block(bytes([0x1F, ord("a"), 0x01, 0x00, 0xFF]), 64)


def test_blosc_truncated_offset_table_raises_format_error():
    """A frame whose header promises more block offsets than the frame
    holds must raise BloscFormatError, not struct.error."""
    import struct

    from cae_polars_tools_spark.sources.blosc_codec import (
        BloscFormatError,
        blosc_decompress,
    )

    # flags: codec lz4 (1 << 5); nbytes 1 MiB, blocksize 4 KiB → 256
    # offsets expected, but the frame ends right after the header.
    header = bytes([2, 1, 1 << 5, 4]) + struct.pack(
        "<iii", 1 << 20, 4096, 16
    )
    with pytest.raises(BloscFormatError):
        blosc_decompress(header)

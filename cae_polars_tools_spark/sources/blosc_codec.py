"""Pure-Python decoder for the c-blosc 1.x frame format.

Zarr v2 stores written by zarr-python default to the blosc compressor
(reference examples/basic_usage.py:34 reads such a store), but this
environment has no blosc/numcodecs binary. This module implements the
*container* against the public c-blosc 1.x format description
(c-blosc README_HEADER.rst) so the common default — ``cname='lz4'``
with byte-shuffle — decodes without native code:

* 16-byte header: version, versionlz, flags, typesize, nbytes,
  blocksize, cbytes (all LE).
* flags: bit 0 byte-shuffle, bit 1 memcpyed (verbatim payload),
  bit 2 bit-shuffle; bits 5-7 codec id (0 blosclz, 1 lz4/lz4hc,
  2 snappy, 3 zlib, 4 zstd).
* non-memcpyed payload: ``nblocks`` int32 offsets, then per block a
  sequence of streams (``int32 csize`` + bytes; ``csize == raw size``
  means stored uncompressed). Blocks are split into ``typesize``
  streams when the c-blosc split rule fires; the rule's exact
  constants changed across releases, so this decoder *infers* the
  split count by attempting the predicted count first and falling
  back (stream framing makes a wrong guess fail fast, not corrupt).
* byte-shuffle is undone per block (trailing non-multiple bytes are
  stored unshuffled, as c-blosc does).

Codecs: lz4 (pure-Python block decode below) and zlib (stdlib).
blosclz / snappy / zstd / bit-shuffle raise a precise error unless
``numcodecs`` is installed (see zarr_format._decode_bytes fallback).

Performance note: this is the COMPATIBILITY path — Python-loop LZ4
runs at a few MB/s. At scale, install ``numcodecs`` (C codecs) on the
executors; the format layer prefers it automatically whenever import
succeeds.

The encoder side intentionally supports only the ``memcpyed`` mode —
enough to produce valid blosc-tagged stores for round-trip tests and
for `cli read`-style re-writes, without pretending to be a
compressor.
"""

from __future__ import annotations

import struct
import zlib as _zlib

import numpy as np

BLOSC_MEMCPYED = 0x2
BLOSC_BYTE_SHUFFLE = 0x1
BLOSC_BIT_SHUFFLE = 0x4
_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
# c-blosc split rule constants (BLOSC_MAX_SPLITS / BLOSC_MIN_BUFFERSIZE)
_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128


class BloscFormatError(ValueError):
    pass


def lz4_decompress_block(src: bytes, dst_size: int) -> bytes:
    """LZ4 *block* format decode (the format inside blosc streams),
    per the public LZ4 block spec: sequences of
    ``token | literals | offset(LE16) | match``. Pure Python; match
    copies use the min(len, offset) slice trick so overlapping runs
    (RLE) stay O(n).

    Always raises :class:`BloscFormatError` on malformed input — the
    adaptive split-count fallback in :func:`blosc_decompress` probes
    this decoder with possibly-wrong stream boundaries and catches
    exactly that type, so a truncated read must not escape as a bare
    ``IndexError``."""
    try:
        return _lz4_decompress_block(src, dst_size)
    except IndexError:
        raise BloscFormatError("lz4: truncated sequence (read past end of input)")


def _lz4_decompress_block(src: bytes, dst_size: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if lit_len:
            if pos + lit_len > n:
                raise BloscFormatError("lz4: literal run past end of input")
            out += src[pos : pos + lit_len]
            pos += lit_len
        if pos >= n:
            break  # last sequence carries literals only
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise BloscFormatError(f"lz4: bad match offset {offset}")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        while match_len > 0:
            take = min(match_len, offset)
            out += out[start : start + take]
            start += take
            match_len -= take
    if len(out) != dst_size:
        raise BloscFormatError(
            f"lz4: decompressed {len(out)} bytes, expected {dst_size}"
        )
    return bytes(out)


def _unshuffle(buf: bytes, typesize: int) -> bytes:
    """Undo c-blosc byte-shuffle over one block: element byte j of all
    elements is stored contiguously; bytes past the last whole element
    are stored verbatim at the tail."""
    if typesize <= 1:
        return buf
    nelem = len(buf) // typesize
    body = nelem * typesize
    arr = np.frombuffer(buf[:body], dtype=np.uint8)
    out = arr.reshape(typesize, nelem).T.reshape(-1).tobytes()
    return out + buf[body:]


def _decode_streams(
    block: bytes, raw_size: int, nsplits: int, codec: int
) -> bytes:
    """Decode one block's ``nsplits`` streams and concatenate. Raises
    BloscFormatError on any framing inconsistency (used for adaptive
    split-count fallback)."""
    if nsplits < 1 or raw_size % nsplits:
        raise BloscFormatError("bad split count")
    neblock = raw_size // nsplits
    pos = 0
    parts = []
    for _ in range(nsplits):
        if pos + 4 > len(block):
            raise BloscFormatError("stream header past end of block")
        (csize,) = struct.unpack_from("<i", block, pos)
        pos += 4
        if csize < 0 or pos + csize > len(block):
            raise BloscFormatError("stream length past end of block")
        payload = block[pos : pos + csize]
        pos += csize
        if csize == neblock:
            parts.append(payload)  # stored uncompressed
        elif codec == 1:
            parts.append(lz4_decompress_block(payload, neblock))
        elif codec == 3:
            raw = _zlib.decompress(payload)
            if len(raw) != neblock:
                raise BloscFormatError("zlib stream wrong size")
            parts.append(raw)
        else:
            raise BloscFormatError(
                f"blosc codec {_CODEC_NAMES.get(codec, codec)!r} requires "
                "numcodecs"
            )
    return b"".join(parts)


def blosc_decompress(frame: bytes) -> bytes:
    """Decode one blosc frame (one zarr chunk) to raw bytes."""
    if len(frame) < 16:
        raise BloscFormatError("blosc frame shorter than its 16-byte header")
    version, _versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", frame, 4)
    if version < 1 or nbytes < 0 or cbytes > len(frame):
        raise BloscFormatError("implausible blosc header")
    if flags & BLOSC_MEMCPYED:
        payload = frame[16 : 16 + nbytes]
        if len(payload) != nbytes:
            raise BloscFormatError("memcpyed payload truncated")
        return payload
    if flags & BLOSC_BIT_SHUFFLE:
        raise BloscFormatError(
            "blosc bit-shuffle requires numcodecs (only byte-shuffle is "
            "implemented in pure Python)"
        )
    codec = flags >> 5
    if codec not in (1, 3):
        raise BloscFormatError(
            f"blosc codec {_CODEC_NAMES.get(codec, codec)!r} requires "
            "numcodecs (pure-Python path supports lz4/zlib/memcpyed)"
        )
    if blocksize <= 0:
        raise BloscFormatError("bad blosc blocksize")
    nblocks = -(-nbytes // blocksize) if nbytes else 0
    try:
        offsets = list(struct.unpack_from(f"<{nblocks}i", frame, 16))
    except struct.error:
        raise BloscFormatError(
            f"blosc frame too short for its {nblocks}-entry block offset table"
        )
    shuffled = bool(flags & BLOSC_BYTE_SHUFFLE)
    out = bytearray()
    for i in range(nblocks):
        bsize = min(blocksize, nbytes - i * blocksize)
        start = offsets[i]
        if start < 16 or start > len(frame):
            raise BloscFormatError(f"block {i} offset {start} out of range")
        # Streams are self-delimiting (int32 length prefixes), so the
        # block slice just runs to the end of the frame — blocks need
        # not be stored in offset order.
        block = frame[start:]
        leftover = bsize != blocksize
        # c-blosc splits a block into `typesize` streams when its split
        # rule fires; the rule's constants moved between releases, so
        # try the predicted count first, then the alternative — the
        # int32 stream framing makes the wrong guess raise, not corrupt.
        predict_split = (
            shuffled
            and not leftover
            and 1 < typesize <= _MAX_SPLITS
            and (bsize // typesize) >= _MIN_BUFFERSIZE
        )
        tries = (typesize, 1) if predict_split else (1, typesize)
        last_err: BloscFormatError | None = None
        for nsplits in tries:
            try:
                raw = _decode_streams(block, bsize, nsplits, codec)
                break
            except BloscFormatError as e:
                last_err = e
        else:
            raise last_err  # type: ignore[misc]
        out += _unshuffle(raw, typesize) if shuffled else raw
    if len(out) != nbytes:
        raise BloscFormatError(
            f"blosc frame decoded to {len(out)} bytes, expected {nbytes}"
        )
    return bytes(out)


def blosc_compress_memcpy(data: bytes, typesize: int = 1) -> bytes:
    """Encode bytes as a valid blosc frame in ``memcpyed`` mode (no
    compression — the container any blosc implementation can read).
    Used by the writer/tests; real compression belongs to numcodecs."""
    header = bytes(
        [2, 1, BLOSC_MEMCPYED, max(1, min(typesize, 255))]
    ) + struct.pack("<iii", len(data), len(data), len(data) + 16)
    return header + data

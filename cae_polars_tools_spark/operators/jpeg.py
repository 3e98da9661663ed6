"""Baseline JPEG (ITU-T T.81) encode/decode with numpy only — the
third real library-free image codec after BMP and PNG, closing the
image half of the multimodal codec seam entirely (video remains
stubbed; no container/codec is hand-parseable in reasonable scope).

Scope (the baseline-sequential core of the public spec):

* 8-bit, single-scan, non-progressive, no restart markers;
* grayscale (1 component) or YCbCr 4:4:4 (3 components, no
  subsampling) — every component uses quant table 0 and the same
  DC/AC Huffman tables;
* the ENCODER emits per-image canonical Huffman tables in the DHT
  segment (fixed-length canonical codes over the symbols actually
  used — spec-legal, and it means no memorized Annex-K constants
  anywhere); the DECODER reconstructs codes from the DHT exactly as
  the spec prescribes, so it also reads tables other baseline
  encoders write.

JPEG is lossy: round-trips are tested to a quantization-error
tolerance, plus an exactness check on DC-only (flat) blocks where the
pipeline is error-free by construction. Like the other codecs, all
Spark-side use is per-partition ``mapInPandas`` — payload bytes never
leave their partition.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared math: 8x8 DCT basis, zigzag order, quantization table
# ---------------------------------------------------------------------------

_N = 8
_k = np.arange(_N)
_DCT = np.sqrt(2.0 / _N) * np.cos(
    (2 * _k[None, :] + 1) * _k[:, None] * np.pi / (2 * _N)
)
_DCT[0] /= np.sqrt(2.0)

# zigzag scan order, derived (not transcribed): antidiagonals with
# alternating direction — identical to the spec's Figure 5 (odd
# antidiagonals walk row-ascending: (0,1),(1,0); even ones
# column-ascending: (2,0),(1,1),(0,2))
_zz = sorted(
    ((i, j) for i in range(_N) for j in range(_N)),
    key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else p[1]),
)
_ZIGZAG = np.array([i * _N + j for i, j in _zz])
_UNZIGZAG = np.argsort(_ZIGZAG)

# base luminance quantization table (the widely published example
# table from the spec's Annex; scaled by the quality knob below)
_QBASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)


def _qtable(quality: int) -> np.ndarray:
    """The common libjpeg quality scaling of the base table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QBASE * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (nby, nbx, 8, 8) with edge replication padding."""
    h, w = plane.shape
    ph, pw = (-h) % _N, (-w) % _N
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    nby, nbx = p.shape[0] // _N, p.shape[1] // _N
    return p.reshape(nby, _N, nbx, _N).swapaxes(1, 2)


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    out = blocks.swapaxes(1, 2).reshape(nby * _N, nbx * _N)
    return out[:h, :w]


def _rgb_to_ycc(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycc_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    self.pos -= 1  # marker: stop feeding, pad with 1s
                    byte = None
            if byte is None:
                self.acc = (self.acc << 8) | 0xFF
            else:
                self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.nbits < length:
            raise ValueError("JPEG entropy stream truncated")
        v = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return v


# ---------------------------------------------------------------------------
# Canonical Huffman from a DHT (bits, huffval) spec — both directions
# ---------------------------------------------------------------------------


def _codes_from_spec(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), the spec's canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decoder_from_spec(bits: list[int], huffval: list[int]):
    """(code, length) → symbol lookup dict for the decoder."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _fixed_length_spec(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Spec-legal table giving every used symbol the same code length
    L (n < 2^L keeps the all-ones code unused, as required). Trades a
    little compression for zero reliance on transcribed constants."""
    syms = sorted(symbols) or [0]
    L = max((len(syms)).bit_length(), 1)
    if len(syms) >= (1 << L):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


def _read_huff_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 → baseline JPEG
    bytes (4:4:4, one quant table, per-image canonical Huffman
    tables)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        planes = [px.astype(np.float64) - 128.0]
    elif px.ndim == 3 and px.shape[2] == 3:
        ycc = _rgb_to_ycc(px)
        planes = [ycc[..., i] - 128.0 for i in range(3)]
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    qt = _qtable(quality)

    # forward DCT + quantization, per component
    comp_coeffs = []
    for plane in planes:
        b = _blocks(plane)
        d = np.einsum("ij,xyjk,lk->xyil", _DCT, b, _DCT)
        comp_coeffs.append(
            np.round(d / qt).astype(np.int32).reshape(-1, _N * _N)[:, _ZIGZAG]
        )

    # first pass: collect (dc_category, ac run/size) symbol usage
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}  # EOB always representable
    seqs = []
    for coeffs in comp_coeffs:
        prev_dc = 0
        comp_seq = []
        for blk in coeffs:
            dc_diff = int(blk[0]) - prev_dc
            prev_dc = int(blk[0])
            dc_syms.add(_category(dc_diff))
            acs = []
            run = 0
            for v in blk[1:]:
                v = int(v)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0))  # ZRL
                    ac_syms.add(0xF0)
                    run -= 16
                size = _category(v)
                acs.append(((run << 4) | size, v))
                ac_syms.add((run << 4) | size)
                run = 0
            # EOB needed unless the block's LAST AC (k=63) was coded —
            # i.e. whenever trailing zeros remain (or the block is
            # all-zero)
            needs_eob = run > 0 or not acs
            comp_seq.append((dc_diff, acs, needs_eob))
        seqs.append(comp_seq)

    dc_bits, dc_vals = _fixed_length_spec(dc_syms)
    ac_bits, ac_vals = _fixed_length_spec(ac_syms)
    dc_codes = _codes_from_spec(dc_bits, dc_vals)
    ac_codes = _codes_from_spec(ac_bits, ac_vals)

    # entropy coding — components interleaved per MCU block (4:4:4:
    # one block per component per MCU)
    bw = _BitWriter()
    n_blocks = len(comp_coeffs[0])
    for bi in range(n_blocks):
        for seq in seqs:
            dc_diff, acs, needs_eob = seq[bi]
            size = _category(dc_diff)
            c, ln = dc_codes[size]
            bw.write(c, ln)
            if size:
                bw.write(
                    dc_diff if dc_diff > 0 else dc_diff + (1 << size) - 1,
                    size,
                )
            for sym, v in acs:
                c, ln = ac_codes[sym]
                bw.write(c, ln)
                size = sym & 0x0F
                if size:
                    bw.write(v if v > 0 else v + (1 << size) - 1, size)
            if needs_eob:
                c, ln = ac_codes[0x00]
                bw.write(c, ln)
    entropy = bw.flush()

    # segments
    out = bytearray(b"\xff\xd8")  # SOI
    qt_zz = qt.reshape(-1)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in qt_zz
    )
    ncomp = len(planes)
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # 1x1 sampling, quant table 0
    out += b"\xff\xc0" + sof
    for cls, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos + entropy + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes → (H, W) or (H, W, 3) uint8. Raises
    ValueError on non-JPEG bytes and NotImplementedError on
    progressive / subsampled / 12-bit / restart-marker variants."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, KeyError, struct.error) as e:
        # truncated/corrupt streams surface as clean ValueError — a
        # hostile-bytes ingest pipeline must never see
        # IndexError/KeyError (dangling table ids, short segments)
        raise ValueError(f"truncated or corrupt JPEG: {e!r}") from e


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    scan_comps = None
    entropy_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtables[tq] = (
                    np.frombuffer(b[1:65], dtype=np.uint8)
                    .astype(np.int32)[_UNZIGZAG]
                    .reshape(_N, _N)
                )
                b = b[65:]
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling not supported (4:4:4 only)"
                    )
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline (SOF0) JPEG")
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = body
            while b:
                cls, tid = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                n = sum(bits)
                huff[(cls, tid)] = _decoder_from_spec(
                    bits, list(b[17 : 17 + n])
                )
                b = b[17 + n :]
        elif marker == 0xDD:
            raise NotImplementedError("restart markers not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            entropy_start = pos
            break
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    br = _BitReader(payload[entropy_start:])
    nby, nbx = (h + _N - 1) // _N, (w + _N - 1) // _N
    planes = []
    coeff_sets = [
        np.zeros((nby * nbx, _N * _N), dtype=np.int32) for _ in comps
    ]
    prev_dc = [0] * len(comps)
    tq_of = dict(comps)
    td_ta = {cid: (td, ta) for cid, td, ta in scan_comps}
    for bi in range(nby * nbx):
        for ci, (cid, tq) in enumerate(comps):
            td, ta = td_ta[cid]
            dct = huff[(0, td)]
            act = huff[(1, ta)]
            size = _read_huff_symbol(br, dct)
            if size:
                v = br.read(size)
                diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
            else:
                diff = 0
            prev_dc[ci] += diff
            blk = coeff_sets[ci][bi]
            blk[0] = prev_dc[ci]
            k = 1
            while k < 64:
                sym = _read_huff_symbol(br, act)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if sym == 0xF0:
                    k += 16
                    continue
                k += run
                if k >= 64:
                    raise ValueError("JPEG AC run overflow")
                v = br.read(size)
                blk[k] = (
                    v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                )
                k += 1

    for ci, (cid, tq) in enumerate(comps):
        qt = qtables[tq_of[cid]]
        zig = coeff_sets[ci][:, _UNZIGZAG].reshape(nby, nbx, _N, _N)
        deq = zig * qt
        spatial = np.einsum("ji,xyjk,kl->xyil", _DCT, deq.astype(np.float64), _DCT)
        planes.append(_unblocks(spatial, h, w) + 128.0)
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycc_to_rgb(np.stack(planes, axis=-1))

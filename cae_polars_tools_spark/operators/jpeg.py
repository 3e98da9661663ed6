"""Baseline JPEG (ITU-T T.81) encode/decode with numpy only — the
third real library-free image codec after BMP and PNG, closing the
image half of the multimodal codec seam entirely (video remains
stubbed; no container/codec is hand-parseable in reasonable scope).

Scope (the baseline-sequential core of the public spec):

* 8-bit, single-scan, non-progressive;
* grayscale (1 component) or YCbCr with per-component sampling
  factors — 4:4:4, 4:2:2 and 4:2:0 (the overwhelming majority of
  real-world baseline JPEGs) both encode and decode; the decoder
  accepts ANY integer-ratio factor combination in 1..4;
* restart markers: the encoder emits DRI + RSTn on request, the
  decoder resyncs at them (byte-align, reset DC predictors) — and
  tolerates spec-legal 0xFF fill bytes and standalone TEM/RSTn
  markers in the header walk;
* every component uses quant table 0 and the same DC/AC Huffman
  tables when encoding;
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

    def restart_marker(self, m: int) -> None:
        """Byte-align with 1-fill and emit RST(m mod 8). The fill goes
        through :meth:`write` so a resulting 0xFF byte still gets its
        stuffed 0x00 before the marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m % 8)])


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

    def restart(self) -> None:
        """Resync at an expected RSTn: discard the current byte's pad
        bits (and any 1-padding `_fill` synthesized when it stopped at
        the marker), skip spec-legal 0xFF fill bytes, consume the
        marker. Raises when the stream holds anything else — a missing
        restart means the entropy data is corrupt."""
        self.acc = 0
        self.nbits = 0
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF and self.data[p + 1] == 0xFF:
            p += 1
        if (
            p + 1 >= len(self.data)
            or self.data[p] != 0xFF
            or not 0xD0 <= self.data[p + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos = p + 2


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


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-average chroma downsample by (fh, fv) with edge padding."""
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    p = np.pad(plane, ((0, (-h) % fv), (0, (-w) % fh)), mode="edge")
    return p.reshape(
        p.shape[0] // fv, fv, p.shape[1] // fh, fh
    ).mean(axis=(1, 3))


def _tokenize_block(blk, prev_dc, dc_syms, ac_syms):
    """One block's (dc_diff, acs, needs_eob) tokens + symbol usage."""
    dc_diff = int(blk[0]) - prev_dc
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
    # EOB needed unless the block's LAST AC (k=63) was coded — i.e.
    # whenever trailing zeros remain (or the block is all-zero)
    needs_eob = run > 0 or not acs
    return (dc_diff, acs, needs_eob), int(blk[0])


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 → baseline JPEG
    bytes (one quant table, per-image canonical Huffman tables).

    ``subsampling``: ``"444"`` (no chroma subsampling), ``"422"``
    (2×1) or ``"420"`` (2×2) — the 2×2-luma-MCU layout virtually all
    real-world JPEGs use. ``restart_interval`` > 0 emits a DRI
    segment and an RSTn marker (with DC-predictor reset) every that
    many MCUs — the spec's resync/parallel-decode primitive."""
    px = np.asarray(px, dtype=np.uint8)
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError("restart_interval must be in [0, 65535]")
    hy, vy = _SUBSAMPLING[subsampling]
    if px.ndim == 2:
        planes = [px.astype(np.float64) - 128.0]
        samps = [(1, 1)]
    elif px.ndim == 3 and px.shape[2] == 3:
        ycc = _rgb_to_ycc(px)
        planes = [
            ycc[..., 0] - 128.0,
            _downsample(ycc[..., 1], hy, vy) - 128.0,
            _downsample(ycc[..., 2], hy, vy) - 128.0,
        ]
        samps = [(hy, vy), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (_N * hmax))
    mcuy = -(-h // (_N * vmax))
    qt = _qtable(quality)

    # forward DCT + quantization per component, on an MCU-aligned grid
    # (rows = mcuy*vi, cols = mcux*hi blocks, edge-padded)
    comp_grids = []
    for plane, (hi, vi) in zip(planes, samps):
        rows, cols = mcuy * vi, mcux * hi
        ph, pw = rows * _N - plane.shape[0], cols * _N - plane.shape[1]
        p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        b = p.reshape(rows, _N, cols, _N).swapaxes(1, 2)
        d = np.einsum("ij,xyjk,lk->xyil", _DCT, b, _DCT)
        comp_grids.append(
            np.round(d / qt)
            .astype(np.int32)
            .reshape(rows, cols, _N * _N)[..., _ZIGZAG]
        )

    # first pass: tokenize in MCU order, collecting symbol usage;
    # DC predictors reset at every restart boundary, like the decoder
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}  # EOB always representable
    mcus = []
    prev_dc = [0] * len(planes)
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                prev_dc = [0] * len(planes)
            tokens = []
            for ci, (hi, vi) in enumerate(samps):
                for by in range(vi):
                    for bx in range(hi):
                        blk = comp_grids[ci][my * vi + by, mx * hi + bx]
                        tok, prev_dc[ci] = _tokenize_block(
                            blk, prev_dc[ci], dc_syms, ac_syms
                        )
                        tokens.append(tok)
            mcus.append(tokens)
            mcu_idx += 1

    dc_bits, dc_vals = _fixed_length_spec(dc_syms)
    ac_bits, ac_vals = _fixed_length_spec(ac_syms)
    dc_codes = _codes_from_spec(dc_bits, dc_vals)
    ac_codes = _codes_from_spec(ac_bits, ac_vals)

    bw = _BitWriter()
    for mi, tokens in enumerate(mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.restart_marker(mi // restart_interval - 1)
        for dc_diff, acs, needs_eob in tokens:
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
    for cid, (hi, vi) in zip(range(1, ncomp + 1), samps):
        sof += bytes([cid, (hi << 4) | vi, 0])  # quant table 0
    out += b"\xff\xc0" + sof
    for cls, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
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
    """Decode baseline JPEG bytes → (H, W) or (H, W, 3) uint8 —
    including 4:2:2 / 4:2:0 chroma subsampling (any integer-ratio
    per-component sampling factors) and restart-marker streams.
    Raises ValueError on non-JPEG/corrupt bytes and
    NotImplementedError on progressive / 12-bit variants."""
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
    restart_interval = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # spec-legal fill: any number of extra 0xFF bytes may precede
        # the marker id
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers carry no length
            pos += 2
            continue
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
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
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
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
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

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for cid, hi, vi, _tq in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"non-integer sampling ratio {hi}x{vi} vs {hmax}x{vmax}"
            )
    mcux = (w + _N * hmax - 1) // (_N * hmax)
    mcuy = (h + _N * vmax - 1) // (_N * vmax)

    br = _BitReader(payload[entropy_start:])
    spec_of = {c[0]: c for c in comps}
    # scan order (SOS component order) drives the interleave; each
    # component's block grid is MCU-aligned: (mcuy*vi, mcux*hi)
    order = []
    for cid, td, ta in scan_comps:
        if cid not in spec_of:
            raise ValueError(f"SOS references unknown component {cid}")
        order.append((spec_of[cid], td, ta))
    grids = {
        cid: np.zeros((mcuy * vi, mcux * hi, _N * _N), dtype=np.int32)
        for cid, hi, vi, _tq in comps
    }
    prev_dc = {c[0]: 0 for c in comps}
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_idx
                and mcu_idx % restart_interval == 0
            ):
                br.restart()
                prev_dc = {c[0]: 0 for c in comps}
            for (cid, hi, vi, _tq), td, ta in order:
                dct = huff[(0, td)]
                act = huff[(1, ta)]
                for by in range(vi):
                    for bx in range(hi):
                        blk = grids[cid][my * vi + by, mx * hi + bx]
                        size = _read_huff_symbol(br, dct)
                        if size:
                            v = br.read(size)
                            diff = (
                                v
                                if v >= (1 << (size - 1))
                                else v - (1 << size) + 1
                            )
                        else:
                            diff = 0
                        prev_dc[cid] += diff
                        blk[0] = prev_dc[cid]
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
                                v
                                if v >= (1 << (size - 1))
                                else v - (1 << size) + 1
                            )
                            k += 1
            mcu_idx += 1

    planes = []
    for cid, hi, vi, tq in comps:
        qt = qtables[tq]
        rows, cols = mcuy * vi, mcux * hi
        zig = grids[cid][..., _UNZIGZAG].reshape(rows, cols, _N, _N)
        deq = zig * qt
        spatial = np.einsum(
            "ji,xyjk,kl->xyil", _DCT, deq.astype(np.float64), _DCT
        )
        # crop to the component's own resolution, then upsample by
        # block replication to full frame resolution
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        plane = _unblocks(spatial, ch, cw) + 128.0
        fv, fh = vmax // vi, hmax // hi
        if fv > 1 or fh > 1:
            plane = plane.repeat(fv, axis=0).repeat(fh, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycc_to_rgb(np.stack(planes, axis=-1))

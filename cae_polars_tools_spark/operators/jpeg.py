"""Baseline JPEG (ITU-T T.81) encode/decode with numpy only — the
third real library-free image codec after BMP and PNG, closing the
image half of the multimodal codec seam entirely (video remains
stubbed; no container/codec is hand-parseable in reasonable scope).

Scope (the Huffman-coded core of the public spec):

* 8-bit baseline (SOF0) AND progressive (SOF2) — spectral selection,
  successive approximation, EOB-run coding, non-interleaved scans;
  the encoder emits the standard 4-phase progressive scan script on
  request, and successive approximation being lossless once all
  scans land, a progressive encode decodes bit-identically to the
  baseline encode of the same input (test-pinned);
* grayscale (1 component) or YCbCr with per-component sampling
  factors — 4:4:4, 4:2:2 and 4:2:0 (the overwhelming majority of
  real-world JPEGs) both encode and decode; the decoder accepts ANY
  integer-ratio factor combination in 1..4;
* restart markers: the encoder emits DRI + RSTn on request, the
  decoder resyncs at them (byte-align, reset DC predictors and EOB
  runs) — and tolerates spec-legal 0xFF fill bytes and standalone
  TEM/RSTn markers in the header walk;
* every component uses quant table 0 and the same DC/AC Huffman
  tables when encoding;
* out of scope (loud NotImplementedError): arithmetic coding,
  12-bit precision, lossless and hierarchical modes — vanishingly
  rare in the wild.
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
        # reads are <= 16 bits, so the accumulator only needs topping
        # up below that; _fill leaves > 24 bits when the stream has
        # them, making the call skippable on ~2/3 of reads
        if self.nbits < 16:
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


class _HuffDecodeTable(dict):
    """(code, length) → symbol dict, plus a fast path: when the DHT
    spec assigns every symbol the SAME code length L (detectable from
    the spec itself — ``bits`` has one nonzero entry), canonical codes
    are simply 0..n-1 at length L, so a symbol decodes as ONE
    ``read(L)`` + list index instead of up to 16 read(1)+dict probes.
    ``fixed`` is ``(L, huffval_list)`` in that case, else None. This
    engine's own encoder always emits single-length tables
    (``_fixed_length_spec``), so its streams always take the fast
    path; multi-length tables from foreign JPEGs keep the general
    walk."""

    fixed: tuple[int, list[int]] | None = None


def _decoder_from_spec(bits: list[int], huffval: list[int]):
    """(code, length) → symbol lookup for the decoder."""
    table = _HuffDecodeTable()
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    nz = [i for i, b in enumerate(bits) if b]
    if len(nz) == 1:
        table.fixed = (nz[0] + 1, list(huffval[: bits[nz[0]]]))
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
    fixed = getattr(table, "fixed", None)
    if fixed is not None:
        L, vals = fixed
        code = br.read(L)
        if code < len(vals):
            return vals[code]
        raise ValueError("invalid JPEG Huffman code")
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
    # one C-level tolist() instead of 64 numpy-scalar extractions —
    # the per-element int(blk[i]) walk dominated encode on small rasters
    vals = blk.tolist() if hasattr(blk, "tolist") else list(blk)
    dc_diff = vals[0] - prev_dc
    dc_syms.add(_category(dc_diff))
    acs = []
    run = 0
    for v in vals[1:]:
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
    return (dc_diff, acs, needs_eob), vals[0]


def _pack_entropy_bits(vals: list[int], lens: list[int]) -> bytes:
    """Vectorized twin of the ``_BitWriter`` loop for one entropy
    segment: MSB-first variable-length codes packed to bytes, 1-filled
    to the byte boundary (spec padding), 0x00 stuffed after every
    0xFF — byte-identical to writing each (value, length) pair through
    ``_BitWriter`` and flushing. One numpy pass per segment instead of
    a Python call per token."""
    if not vals:
        return b""
    v = np.asarray(vals, dtype=np.int64)
    ln = np.asarray(lens, dtype=np.int64)
    # mirror _BitWriter's `value & ((1 << length) - 1)` so negative or
    # overwide values pack identically to the per-call writer
    v = v & ((np.int64(1) << ln) - 1)
    total = int(ln.sum())
    tok = np.repeat(np.arange(len(v)), ln)
    starts = np.concatenate(([0], np.cumsum(ln)[:-1]))
    j = np.arange(total) - np.repeat(starts, ln)
    bits = ((v[tok] >> (ln[tok] - 1 - j)) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    by = np.packbits(bits)
    ff = by == 0xFF
    if ff.any():
        reps = np.where(ff, 2, 1)
        out = np.repeat(by, reps)
        out[np.cumsum(reps)[ff] - 1] = 0x00
        by = out
    return by.tobytes()


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 → JPEG bytes
    (one quant table, per-image canonical Huffman tables).

    ``subsampling``: ``"444"`` (no chroma subsampling), ``"422"``
    (2×1) or ``"420"`` (2×2) — the 2×2-luma-MCU layout virtually all
    real-world JPEGs use. ``restart_interval`` > 0 emits a DRI
    segment and an RSTn marker (with DC-predictor reset) every that
    many MCUs — the spec's resync/parallel-decode primitive.

    ``progressive=True`` emits SOF2 with the standard 4-phase scan
    script (DC first at Al=1 interleaved → DC refinement → per-
    component AC first Ss=1..63 at Al=1 → per-component AC
    refinement): spectral selection + one level of successive
    approximation, EOB-run coding included. Successive approximation
    is lossless once all scans land, so the decoded image is
    bit-identical to the baseline encoding of the same input — the
    cross-check the tests pin."""
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

    if progressive:
        # non-interleaved AC scans walk the component's OWN block
        # raster (ceil(cw/8) × ceil(ch/8)) — from the pre-padding dims
        comp_dims = [
            ((p.shape[1] + _N - 1) // _N, (p.shape[0] + _N - 1) // _N)
            for p in planes
        ]
        return _assemble_progressive(
            comp_grids, samps, comp_dims, h, w, qt, mcuy, mcux,
            restart_interval,
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

    # token stream → (value, length) pairs, packed per restart segment
    # by the vectorized twin of _BitWriter (byte-identical output; see
    # _pack_entropy_bits) — restart markers sit between byte-aligned
    # segments exactly as _BitWriter.restart_marker emitted them
    eob_c, eob_ln = ac_codes[0x00]
    parts: list[bytes] = []
    vals: list[int] = []
    lens: list[int] = []
    for mi, tokens in enumerate(mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            parts.append(_pack_entropy_bits(vals, lens))
            parts.append(
                bytes([0xFF, 0xD0 + ((mi // restart_interval - 1) % 8)])
            )
            vals, lens = [], []
        for dc_diff, acs, needs_eob in tokens:
            size = _category(dc_diff)
            c, ln = dc_codes[size]
            vals.append(c)
            lens.append(ln)
            if size:
                vals.append(
                    dc_diff if dc_diff > 0 else dc_diff + (1 << size) - 1
                )
                lens.append(size)
            for sym, v in acs:
                c, ln = ac_codes[sym]
                vals.append(c)
                lens.append(ln)
                size = sym & 0x0F
                if size:
                    vals.append(v if v > 0 else v + (1 << size) - 1)
                    lens.append(size)
            if needs_eob:
                vals.append(eob_c)
                lens.append(eob_ln)
    parts.append(_pack_entropy_bits(vals, lens))
    entropy = b"".join(parts)

    # segments
    out = bytearray(b"\xff\xd8")  # SOI
    qt_zz = qt.reshape(-1)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + (
        qt_zz.astype(np.uint8).tobytes()
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
# Progressive (SOF2) encoding — spectral selection + one successive-
# approximation level, EOB-run coding, shared canonical tables
# ---------------------------------------------------------------------------


class _CollectSink:
    """Dry-run scan sink: records which DC/AC symbols each scan uses
    so ONE canonical table pair (emitted once, before the first scan)
    covers every scan."""

    def __init__(self) -> None:
        self.dc_syms: set[int] = set()
        self.ac_syms: set[int] = set()

    def dc(self, sym: int) -> None:
        self.dc_syms.add(sym)

    def ac(self, sym: int) -> None:
        self.ac_syms.add(sym)

    def bits(self, v: int, n: int) -> None:
        pass

    def restart(self, m: int) -> None:
        pass

    def flush(self) -> bytes:
        return b""


class _WriteSink:
    """Progressive-scan writer on the vectorized packer: per-symbol
    calls append (value, length) pairs; restart/flush pack the pending
    segment through ``_pack_entropy_bits`` — byte-identical to the old
    per-call ``_BitWriter`` (same canonical packing, padding and
    stuffing; differential-tested in the baseline rewrite)."""

    def __init__(self, dc_codes, ac_codes) -> None:
        self.dc_codes = dc_codes
        self.ac_codes = ac_codes
        self.parts: list[bytes] = []
        self.vals: list[int] = []
        self.lens: list[int] = []

    def dc(self, sym: int) -> None:
        c, ln = self.dc_codes[sym]
        self.vals.append(c)
        self.lens.append(ln)

    def ac(self, sym: int) -> None:
        c, ln = self.ac_codes[sym]
        self.vals.append(c)
        self.lens.append(ln)

    def bits(self, v: int, n: int) -> None:
        self.vals.append(v)
        self.lens.append(n)

    def restart(self, m: int) -> None:
        self.parts.append(_pack_entropy_bits(self.vals, self.lens))
        self.parts.append(bytes([0xFF, 0xD0 + (m % 8)]))
        self.vals, self.lens = [], []

    def flush(self) -> bytes:
        self.parts.append(_pack_entropy_bits(self.vals, self.lens))
        return b"".join(self.parts)


def _flush_eobrun(sink, state: dict) -> None:
    """Emit the pending EOB-run symbol (nbits<<4 + extension bits) and
    the correction bits buffered behind it (refinement scans).
    Buffered bits are flushed ONLY together with a symbol — here with
    the EOB run, in the block encoders right after their own symbol —
    because the decoder reads them while advancing past that symbol's
    run; dumping them symbol-less would desynchronize the stream."""
    e = state["eobrun"]
    if e > 0:
        r = e.bit_length() - 1
        sink.ac((r << 4))
        if r:
            sink.bits(e - (1 << r), r)
        state["eobrun"] = 0
        for b in state["bits"]:
            sink.bits(b, 1)
        state["bits"] = []


def _enc_ac_first(sink, band: list[int], state: dict) -> None:
    """One block of a progressive first AC scan (Ah=0): run-length
    over the point-transformed band, whole-block trailing zeros fold
    into the shared EOB run."""
    last = -1
    for i, t in enumerate(band):
        if t:
            last = i
    if last < 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(sink, state)
        return
    _flush_eobrun(sink, state)
    r = 0
    for i in range(last + 1):
        t = band[i]
        if t == 0:
            r += 1
            continue
        while r > 15:
            sink.ac(0xF0)
            r -= 16
        s = _category(t)
        sink.ac((r << 4) | s)
        sink.bits(t if t > 0 else t + (1 << s) - 1, s)
        r = 0
    if last < len(band) - 1:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(sink, state)


def _enc_ac_refine(sink, band: list[int], Al: int, state: dict) -> None:
    """One block of a progressive AC refinement scan (Ah=Al+1): the
    T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine algorithm — newly-
    nonzero coefficients coded with size 1, already-nonzero ones get a
    buffered correction bit. TWO separate bit buffers, as in libjpeg:
    ``state["bits"]`` holds corrections attached to the pending EOB
    run (the decoder consumes them while finishing those run blocks),
    while ``cur`` holds THIS block's corrections since the last
    symbol (the decoder consumes them while advancing past the next
    symbol) — merging them desynchronizes multi-block streams."""
    absv = [abs(t) >> Al for t in band]
    eob = -1
    for i, a in enumerate(absv):
        if a == 1:
            eob = i
    r = 0
    cur: list[int] = []
    for i, t in enumerate(band):
        a = absv[i]
        if a == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            _flush_eobrun(sink, state)
            sink.ac(0xF0)
            r -= 16
            for b in cur:
                sink.bits(b, 1)
            cur = []
        if a > 1:
            cur.append(a & 1)
            continue
        _flush_eobrun(sink, state)
        sink.ac((r << 4) | 1)
        r = 0
        sink.bits(1 if t > 0 else 0, 1)
        for b in cur:
            sink.bits(b, 1)
        cur = []
    if r > 0 or cur:
        state["eobrun"] += 1
        state["bits"].extend(cur)
        if state["eobrun"] == 0x7FFF or len(state["bits"]) > 900:
            _flush_eobrun(sink, state)


def _enc_scan_mcus(comp_indices, samps, comp_grids, mcuy, mcux, comp_dims):
    """Encoder twin of ``_scan_mcu_iter``: interleaved MCU walk for
    multi-component scans, component-raster walk for single-component
    (non-interleaved) ones."""
    if len(comp_indices) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for ci in comp_indices:
                    hi, vi = samps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            blocks.append(
                                (ci, comp_grids[ci][my * vi + by, mx * hi + bx])
                            )
                yield blocks
    else:
        ci = comp_indices[0]
        bw_, bh_ = comp_dims[ci]
        for rr in range(bh_):
            for cc in range(bw_):
                yield [(ci, comp_grids[ci][rr, cc])]


def _encode_scan(
    sink, scan, comp_grids, samps, comp_dims, mcuy, mcux, restart_interval
):
    comp_indices, Ss, Se, Ah, Al = scan
    preds = {ci: 0 for ci in comp_indices}
    state = {"eobrun": 0, "bits": []}
    rst = 0
    for idx, blocks in enumerate(
        _enc_scan_mcus(comp_indices, samps, comp_grids, mcuy, mcux, comp_dims)
    ):
        if restart_interval and idx and idx % restart_interval == 0:
            _flush_eobrun(sink, state)
            sink.restart(rst)
            rst += 1
            preds = {ci: 0 for ci in comp_indices}
        for ci, blk in blocks:
            if Ss == 0:
                dc = int(blk[0])
                if Ah == 0:
                    # DC point transform is an ARITHMETIC shift
                    v = dc >> Al
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = _category(diff)
                    sink.dc(s)
                    if s:
                        sink.bits(
                            diff if diff > 0 else diff + (1 << s) - 1, s
                        )
                else:
                    sink.bits((dc >> Al) & 1, 1)
            else:
                if Ah == 0:
                    # AC point transform truncates TOWARD ZERO
                    band = [
                        (abs(int(blk[k])) >> Al)
                        * (1 if blk[k] >= 0 else -1)
                        for k in range(Ss, Se + 1)
                    ]
                    _enc_ac_first(sink, band, state)
                else:
                    band = [int(blk[k]) for k in range(Ss, Se + 1)]
                    _enc_ac_refine(sink, band, Al, state)
    _flush_eobrun(sink, state)


def _assemble_progressive(
    comp_grids, samps, comp_dims, h, w, qt, mcuy, mcux, restart_interval
) -> bytes:
    ncomp = len(comp_grids)
    all_comps = list(range(ncomp))
    scans = [(all_comps, 0, 0, 0, 1), (all_comps, 0, 0, 1, 0)]
    for ci in all_comps:
        scans.append(([ci], 1, 63, 0, 1))
    for ci in all_comps:
        scans.append(([ci], 1, 63, 1, 0))

    collector = _CollectSink()
    for scan in scans:
        _encode_scan(
            collector, scan, comp_grids, samps, comp_dims,
            mcuy, mcux, restart_interval,
        )
    dc_bits, dc_vals = _fixed_length_spec(collector.dc_syms)
    # EOB-run symbols (r<<4) and refinement sizes must always be
    # representable even if the dry run happened not to use them
    ac_bits, ac_vals = _fixed_length_spec(collector.ac_syms | {0x00})
    dc_codes = _codes_from_spec(dc_bits, dc_vals)
    ac_codes = _codes_from_spec(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    qt_zz = qt.reshape(-1)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + (
        qt_zz.astype(np.uint8).tobytes()
    )
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, (hi, vi) in zip(range(1, ncomp + 1), samps):
        sof += bytes([cid, (hi << 4) | vi, 0])
    out += b"\xff\xc2" + sof  # SOF2: progressive
    for cls, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for scan in scans:
        comp_indices, Ss, Se, Ah, Al = scan
        ns = len(comp_indices)
        sos = struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_indices:
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        sink = _WriteSink(dc_codes, ac_codes)
        _encode_scan(
            sink, scan, comp_grids, samps, comp_dims,
            mcuy, mcux, restart_interval,
        )
        out += b"\xff\xda" + sos + sink.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode JPEG bytes → (H, W) or (H, W, 3) uint8 — baseline
    (SOF0) AND progressive (SOF2), including 4:2:2 / 4:2:0 chroma
    subsampling (any integer-ratio per-component sampling factors),
    restart-marker streams, non-interleaved scans, spectral selection
    and successive approximation. Raises ValueError on
    non-JPEG/corrupt bytes and NotImplementedError on
    lossless/hierarchical/12-bit variants."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, KeyError, struct.error) as e:
        # truncated/corrupt streams surface as clean ValueError — a
        # hostile-bytes ingest pipeline must never see
        # IndexError/KeyError (dangling table ids, short segments)
        raise ValueError(f"truncated or corrupt JPEG: {e!r}") from e


def _extend(v: int, size: int) -> int:
    """The spec's EXTEND: a ``size``-bit magnitude to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block_full(br: _BitReader, blk, dct, act, pred: list[int]) -> None:
    """One baseline (sequential) block: DC diff + full AC run-length."""
    size = _read_huff_symbol(br, dct)
    pred[0] += _extend(br.read(size), size) if size else 0
    blk[0] = pred[0]
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
        blk[k] = _extend(br.read(size), size)
        k += 1


def _decode_ac_first(
    br: _BitReader, blk, act, Ss: int, Se: int, Al: int, state: dict
) -> None:
    """Progressive AC scan, Ah == 0 (first pass for this band):
    run-length over the spectral band with EOB-run symbols spanning
    whole blocks; values arrive shifted left by ``Al``."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = Ss
    while k <= Se:
        sym = _read_huff_symbol(br, act)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.read(r)
            return
        k += r
        if k > Se:
            raise ValueError("JPEG AC run overflow (progressive)")
        blk[k] = _extend(br.read(s), s) << Al
        k += 1


def _decode_ac_refine(
    br: _BitReader, blk, act, Ss: int, Se: int, Al: int, state: dict
) -> None:
    """Progressive AC refinement (Ah == Al + 1): one correction bit
    per already-nonzero coefficient, newly-nonzero coefficients coded
    with size 1 — the T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine
    algorithm."""
    p1 = 1 << Al
    m1 = -1 << Al
    k = Ss
    if state["eobrun"] == 0:
        while k <= Se:
            sym = _read_huff_symbol(br, act)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad size in AC refinement scan")
                val = p1 if br.read(1) else m1
            # advance r zero-history coefficients, appending a
            # correction bit to every nonzero-history one passed over
            while k <= Se:
                if blk[k] != 0:
                    if br.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= Se:
            if blk[k] != 0:
                if br.read(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    progressive = False
    restart_interval = 0
    grids = None
    geom: dict[int, tuple] = {}
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            from cae_polars_tools_spark.operators.multimodal import (
                check_decode_dims,
            )

            check_decode_dims(w, h, "JPEG")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG"
            )
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
        elif marker == 0xDA:  # SOS — decode one scan, keep walking
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            if grids is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                for cid, hi, vi, _tq in comps:
                    if hmax % hi or vmax % vi:
                        raise NotImplementedError(
                            f"non-integer sampling ratio {hi}x{vi} "
                            f"vs {hmax}x{vmax}"
                        )
                mcux = (w + _N * hmax - 1) // (_N * hmax)
                mcuy = (h + _N * vmax - 1) // (_N * vmax)
                grids = {}
                for cid, hi, vi, tq in comps:
                    cw = (w * hi + hmax - 1) // hmax
                    ch = (h * vi + vmax - 1) // vmax
                    geom[cid] = (
                        hi,
                        vi,
                        tq,
                        (cw + _N - 1) // _N,  # non-interleaved block cols
                        (ch + _N - 1) // _N,  # non-interleaved block rows
                    )
                    grids[cid] = np.zeros(
                        (mcuy * vi, mcux * hi, _N * _N), dtype=np.int32
                    )
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            Ss, Se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 0x0F
            for cid, _td, _ta in scan_comps:
                if cid not in geom:
                    raise ValueError(f"SOS references unknown component {cid}")
            br = _BitReader(payload[pos:])
            _decode_scan(
                br, grids, geom, huff, scan_comps,
                mcuy, mcux, Ss, Se, Ah, Al,
                restart_interval, progressive,
            )
            saw_scan = True
            # skip past this scan's entropy bytes: the next real
            # marker is the first 0xFF not followed by stuffing (0x00),
            # fill (0xFF) or a restart id
            p = pos + br.pos
            while p + 1 < len(payload):
                nxt = payload[p + 1] if payload[p] == 0xFF else None
                if nxt is not None and nxt != 0x00 and nxt != 0xFF and not (
                    0xD0 <= nxt <= 0xD7
                ):
                    break
                p += 1
            pos = p
    if grids is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")

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


def _scan_mcu_iter(scan_comps, geom, grids, mcuy: int, mcux: int):
    """Yield each scan-MCU's blocks as ``(cid, td, ta, blk)`` tuples.

    Interleaved scans (>1 component) walk the MCU grid with hi×vi
    blocks per component per MCU; a single-component scan is
    NON-interleaved per the spec — its "MCU" is one block and the
    order is the component's own block raster (ceil(cw/8) wide, NOT
    the MCU-aligned grid)."""
    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for cid, td, ta in scan_comps:
                    hi, vi = geom[cid][0], geom[cid][1]
                    for by in range(vi):
                        for bx in range(hi):
                            blocks.append(
                                (cid, td, ta,
                                 grids[cid][my * vi + by, mx * hi + bx])
                            )
                yield blocks
    else:
        cid, td, ta = scan_comps[0]
        bw, bh = geom[cid][3], geom[cid][4]
        for r in range(bh):
            for c in range(bw):
                yield [(cid, td, ta, grids[cid][r, c])]


def _decode_scan(
    br, grids, geom, huff, scan_comps,
    mcuy, mcux, Ss, Se, Ah, Al, restart_interval, progressive,
):
    if not progressive and (Ss != 0 or Se != 63 or Ah or Al):
        raise ValueError("sequential JPEG scan with progressive parameters")
    if progressive and Ss == 0 and Se != 0:
        raise ValueError("progressive DC scan must have Se = 0")
    if progressive and Ss > 0 and len(scan_comps) != 1:
        raise ValueError("progressive AC scans must be non-interleaved")
    preds = {cid: [0] for cid, _td, _ta in scan_comps}
    state = {"eobrun": 0}
    for idx, blocks in enumerate(
        _scan_mcu_iter(scan_comps, geom, grids, mcuy, mcux)
    ):
        if restart_interval and idx and idx % restart_interval == 0:
            br.restart()
            for p in preds.values():
                p[0] = 0
            state["eobrun"] = 0
        for cid, td, ta, blk in blocks:
            if not progressive:
                _decode_block_full(
                    br, blk, huff[(0, td)], huff[(1, ta)], preds[cid]
                )
            elif Ss == 0:
                if Ah == 0:  # DC first: diffs at reduced precision
                    dct = huff[(0, td)]
                    size = _read_huff_symbol(br, dct)
                    preds[cid][0] += (
                        _extend(br.read(size), size) if size else 0
                    )
                    blk[0] = preds[cid][0] << Al
                else:  # DC refinement: one raw bit
                    if br.read(1):
                        blk[0] |= 1 << Al
            elif Ah == 0:
                _decode_ac_first(br, blk, huff[(1, ta)], Ss, Se, Al, state)
            else:
                _decode_ac_refine(br, blk, huff[(1, ta)], Ss, Se, Al, state)

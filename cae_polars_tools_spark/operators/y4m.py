"""YUV4MPEG2 (y4m) video: the video half of the multimodal codec seam.

y4m is the uncompressed interchange container the video toolchain
standardizes on (mjpegtools/ffmpeg ``-f yuv4mpeg``): a one-line ASCII
stream header (``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``) followed by
``FRAME\\n``-prefixed raw planar YCbCr frames. No entropy coding —
which makes it exactly hand-parseable, the same way uncompressed BMP
opened the image seam: real video payloads now flow through
``sample_frames`` / feature extraction instead of the documented
``NotImplementedError`` stub. Compressed video (H.264/VP9/…) still
genuinely needs external codecs and stays behind that seam.

The container is lossless, so round-trips are byte-exact and the
``mm_y4m_features`` corpus entry is value-checked against a SQL
oracle that reconstructs every luma sample — the decode path is
verified pixel-for-pixel, not just plumbing-shape.

Reference parity: the reference engine has no video (or any media)
operators — this is part of the beyond-reference LLM-pipeline surface
(`/root/reference/src` contains only the zarr data-access layer).

Scale shape: every operator here is a ``mapInPandas`` map — payload
bytes never leave the partition that holds them, outputs are small
fixed-width feature rows or per-frame slices bounded by payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from cae_polars_tools_spark.io import (
    SPREAD_HEAVY_BYTES,
    read_table,
    spread,
)
from cae_polars_tools_spark.operators.jpeg import _ycc_to_rgb
from cae_polars_tools_spark.plans.registry import register

_MAGIC = b"YUV4MPEG2"

# colorspace tag → (horizontal, vertical) chroma subsampling factors;
# None = luma-only. The three C420 variants differ only in chroma
# SITING (sample position), which does not change plane sizes — they
# parse identically.
_COLORSPACES = {
    "C444": (1, 1),
    "C422": (2, 1),
    "C420": (2, 2),
    "C420jpeg": (2, 2),
    "C420mpeg2": (2, 2),
    "C420paldv": (2, 2),
    "Cmono": None,
}


def encode_y4m(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    rate: tuple[int, int] = (25, 1),
    colorspace: str | None = None,
) -> bytes:
    """Encode planar frames as a YUV4MPEG2 stream.

    ``y`` is ``(N, H, W)`` uint8; ``cb``/``cr`` are ``(N, H/fv, W/fh)``
    uint8 for a subsampled colorspace, or both ``None`` for ``Cmono``.
    The container is lossless: plane bytes are written verbatim."""
    y = np.asarray(y, dtype=np.uint8)
    if y.ndim != 3:
        raise ValueError(f"y must be (N, H, W), got {y.shape}")
    n, h, w = y.shape
    if (cb is None) != (cr is None):
        raise ValueError("cb and cr must be given together")
    if cb is None:
        cs = "Cmono"
    else:
        cb = np.asarray(cb, dtype=np.uint8)
        cr = np.asarray(cr, dtype=np.uint8)
        if cb.shape != cr.shape or cb.ndim != 3 or cb.shape[0] != n:
            raise ValueError(
                f"chroma shapes {cb.shape}/{cr.shape} do not match {n} frames"
            )
        ch, cw = cb.shape[1:]
        if h % ch or w % cw:
            raise ValueError(
                f"chroma {cw}x{ch} does not evenly divide luma {w}x{h}"
            )
        fh, fv = w // cw, h // ch
        if colorspace is None:
            # canonical names for inference (the C420 siting variants
            # share these factors but must be requested explicitly)
            colorspace = {
                (1, 1): "C444", (2, 1): "C422", (2, 2): "C420"
            }.get((fh, fv))
            if colorspace is None:
                raise ValueError(f"no y4m colorspace for factors {fh}x{fv}")
        cs = colorspace
        if _COLORSPACES.get(cs) != (fh, fv):
            raise ValueError(
                f"colorspace {cs} does not match chroma factors {fh}x{fv}"
            )
    header = f"YUV4MPEG2 W{w} H{h} F{rate[0]}:{rate[1]} Ip A1:1 {cs}\n"
    out = bytearray(header.encode("ascii"))
    for i in range(n):
        out += b"FRAME\n"
        out += y[i].tobytes()
        if cb is not None:
            out += cb[i].tobytes()
            out += cr[i].tobytes()
    return bytes(out)


def decode_y4m(
    payload: bytes,
) -> tuple[dict, np.ndarray, np.ndarray | None, np.ndarray | None]:
    """Decode a YUV4MPEG2 stream → ``(meta, y, cb, cr)``.

    ``meta`` carries ``width/height/rate_num/rate_den/colorspace/
    n_frames``; ``y`` is ``(N, H, W)`` uint8 and ``cb``/``cr`` are the
    subsampled chroma planes (``None`` for ``Cmono``). Byte-exact
    inverse of :func:`encode_y4m`. Raises ``ValueError`` on non-y4m /
    truncated / malformed streams and ``NotImplementedError`` on
    interlaced streams or unknown colorspaces."""
    if payload[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("y4m stream header unterminated")
    try:
        header = payload[: nl].decode("ascii")
    except UnicodeDecodeError as e:
        raise ValueError(f"bad y4m header: {e}") from e
    w = h = None
    rate_num, rate_den = 25, 1
    cs = "C420"  # the spec's default when no C tag is present
    for tok in header.split(" ")[1:]:
        if not tok:
            continue
        key, val = tok[0], tok[1:]
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            num, den = val.split(":")
            rate_num, rate_den = int(num), int(den)
        elif key == "I":
            if val not in ("p", "?"):
                raise NotImplementedError(
                    f"interlaced y4m (I{val}) is not supported"
                )
        elif key == "C":
            cs = tok
            if cs not in _COLORSPACES:
                raise NotImplementedError(f"y4m colorspace {cs!r}")
        # A (aspect) and X (comment) tokens are ignored
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    factors = _COLORSPACES[cs]
    if factors is not None:
        fh, fv = factors
        if w % fh or h % fv:
            raise ValueError(
                f"frame {w}x{h} not divisible by {cs} subsampling"
            )
        ch, cw = h // fv, w // fh
        frame_bytes = w * h + 2 * ch * cw
    else:
        ch = cw = 0
        frame_bytes = w * h

    ys: list[np.ndarray] = []
    cbs: list[np.ndarray] = []
    crs: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m FRAME header missing or malformed")
        pos = fnl + 1
        if pos + frame_bytes > len(payload):
            raise ValueError("y4m stream truncated mid-frame")
        yp = np.frombuffer(payload, np.uint8, w * h, pos).reshape(h, w)
        pos += w * h
        ys.append(yp)
        if factors is not None:
            cbs.append(
                np.frombuffer(payload, np.uint8, ch * cw, pos).reshape(ch, cw)
            )
            pos += ch * cw
            crs.append(
                np.frombuffer(payload, np.uint8, ch * cw, pos).reshape(ch, cw)
            )
            pos += ch * cw
    meta = {
        "width": w,
        "height": h,
        "rate_num": rate_num,
        "rate_den": rate_den,
        "colorspace": cs,
        "n_frames": len(ys),
    }
    y = np.stack(ys) if ys else np.empty((0, h, w), np.uint8)
    if factors is None:
        return meta, y, None, None
    cb = np.stack(cbs) if cbs else np.empty((0, ch, cw), np.uint8)
    cr = np.stack(crs) if crs else np.empty((0, ch, cw), np.uint8)
    return meta, y, cb, cr


def y4m_to_rgb(
    meta: dict,
    y: np.ndarray,
    cb: np.ndarray | None,
    cr: np.ndarray | None,
) -> np.ndarray:
    """Planar frames → ``(N, H, W, 3)`` uint8 RGB (replication chroma
    upsample, BT.601 conversion — same math as the JPEG codec);
    ``Cmono`` replicates luma across channels."""
    if cb is None:
        return np.repeat(y[..., None], 3, axis=3)
    fv = y.shape[1] // cb.shape[1]
    fh = y.shape[2] // cb.shape[2]
    cbu = cb.repeat(fv, axis=1).repeat(fh, axis=2)
    cru = cr.repeat(fv, axis=1).repeat(fh, axis=2)
    ycc = np.stack(
        [y.astype(np.float64), cbu.astype(np.float64), cru.astype(np.float64)],
        axis=-1,
    )
    return _ycc_to_rgb(ycc)


def split_y4m_frames(payload: bytes) -> list[bytes]:
    """REAL demuxer for :func:`~cae_polars_tools_spark.operators.
    multimodal.sample_frames`: each y4m frame's raw plane bytes as one
    ``bytes`` item, in stream order — the drop-in ``split_fn`` that
    replaces the fixed-window fake splitter for actual video payloads."""
    meta, y, cb, cr = decode_y4m(payload)
    out = []
    for i in range(meta["n_frames"]):
        buf = y[i].tobytes()
        if cb is not None:
            buf += cb[i].tobytes() + cr[i].tobytes()
        out.append(buf)
    return out


def video_features(assets: DataFrame) -> DataFrame:
    """REAL video feature extraction for y4m payloads: frame count,
    dimensions, frame rate and overall mean luma (exact integer sums,
    one double division — engine-portable) in one ``mapInPandas``
    pass. Same scale shape as ``image_features``: payload bytes never
    leave their partition."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "n_frames": [],
                "width": [],
                "height": [],
                "fps": [],
                "mean_y": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta, y, _cb, _cr = decode_y4m(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(meta["n_frames"])
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["fps"].append(meta["rate_num"] / meta["rate_den"])
                out["mean_y"].append(
                    float(y.astype(np.int64).sum() / y.size) if y.size else 0.0
                )
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames int, width int, height int, "
            "fps double, mean_y double"
        ),
    )


# demo raster: per document, N_FRAMES frames of VID_H x VID_W luma
# taken from consecutive text bytes (zero-padded), neutral chroma —
# even dims so C420 applies
VID_W, VID_H, N_FRAMES = 6, 4, 3
_FRAME_PX = VID_W * VID_H


def _text_to_y4m(assets: DataFrame) -> DataFrame:
    """Deterministically materialize a real C420 y4m video per document
    from its payload bytes — the corpus has no media files, so the demo
    stream is synthesized; everything downstream (encode → decode →
    per-frame features) is the real byte-level container path."""
    n = _FRAME_PX * N_FRAMES

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)[:n].ljust(n, b"\x00")
                y = np.frombuffer(raw, dtype=np.uint8).reshape(
                    N_FRAMES, VID_H, VID_W
                )
                chroma = np.full(
                    (N_FRAMES, VID_H // 2, VID_W // 2), 128, np.uint8
                )
                out["doc_id"].append(int(doc_id))
                out["payload"].append(encode_y4m(y, chroma, chroma))
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, schema="doc_id long, payload binary")


@register(
    "mm_y4m_features",
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   p,
                   ascii(substr(rpad(text, {_FRAME_PX * N_FRAMES}, chr(0)),
                                p + 1, 1)) AS b
            FROM documents,
                 unnest(range(0, {_FRAME_PX * N_FRAMES})) AS u(p)
        )
        SELECT doc_id,
               p // {_FRAME_PX} AS frame_idx,
               {VID_W} AS width,
               {VID_H} AS height,
               AVG(b) AS mean_y
        FROM px
        GROUP BY doc_id, p // {_FRAME_PX}
    """,
    tags=("multimodal", "extension", "video", "y4m"),
    window_rank=1,
)
def mm_y4m_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL video path, value-checked: text bytes → 3-frame
    6×4 C420 y4m stream (real container encoder) → full header+plane
    decode → per-frame mean luma from exact integer sums. The oracle
    reconstructs every luma sample from the same text bytes in SQL, so
    the whole container encode/decode/feature chain is verified
    value-for-value, like ``mm_bmp_features`` did for images. Zero
    shuffle; payload bytes never leave their partition.

    ASCII precondition (shared with the BMP/PNG pixel oracles): the
    byte↔character equivalence the oracle's ``ascii(substr(...))``
    relies on holds because the synthetic corpus text is pure ASCII —
    asserted for the sampled corpus in tests/test_corpus_oracle.py."""
    from cae_polars_tools_spark.operators.multimodal import with_payload

    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_HEAVY_BYTES,
    )
    assets = _text_to_y4m(with_payload(docs))

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "width": [],
                "height": [],
                "mean_y": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta, y, _cb, _cr = decode_y4m(bytes(payload))
                for i in range(meta["n_frames"]):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
                    out["mean_y"].append(
                        float(y[i].astype(np.int64).sum() / y[i].size)
                    )
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        schema=(
            "doc_id long, frame_idx long, width int, height int, "
            "mean_y double"
        ),
    )

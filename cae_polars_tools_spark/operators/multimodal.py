"""Multimodal column handling: opaque binary payloads + typed metadata.

Convention: a multimodal asset is a row with

* ``payload``  — ``binary`` (image/audio/video bytes; opaque to Spark)
* ``meta``     — ``struct<modality string, mime string, n_bytes long>``
  (extend with width/height/sample_rate per modality)

The Spark-side plumbing — schema, partition-parallel batch decode via
``mapInPandas``, feature extraction signatures — is real and tested.
The actual media decode is STUBBED: this container has no image/audio
libraries, so :func:`decode_image` raises ``NotImplementedError``
unless a decoder callback is supplied, and the tested pipeline uses a
deterministic fake decoder. Swapping in Pillow/librosa is a one-line
change at the marked seam.

Scale notes: payload bytes never leave their partition (decode is a
map), and feature outputs are small fixed-width rows — the shuffle
(if any) happens after the 1000× data reduction.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import read_table, spread
from cae_polars_tools_spark.plans.registry import register


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the multimodal convention columns to the documents table
    (text bytes stand in for media bytes in this environment)."""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("text").alias("modality"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


# --------------------------------------------------------------------------
# Decoder seam (STUB)
# --------------------------------------------------------------------------


def decode_image(payload: bytes) -> Any:
    """Decode image bytes → ndarray. STUB: no imaging library in this
    environment. Plug a real decoder (e.g. PIL.Image.open) into
    :func:`extract_features` instead of relying on this."""
    raise NotImplementedError(
        "media decoding requires an imaging/audio library not present in "
        "this environment; pass decode_fn= to extract_features()"
    )


def fake_decode(payload: bytes) -> dict[str, int]:
    """Deterministic fake decoder used by tests and the demo pipeline:
    derives fixed 'features' from raw bytes."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
    }


def extract_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes], dict[str, int]] | None = None,
) -> DataFrame:
    """Partition-parallel batch feature extraction over binary payloads
    via ``mapInPandas`` (Arrow batches; payload bytes stay in-partition).
    ``decode_fn`` maps raw bytes → feature dict; defaults to the
    deterministic fake decoder (see module docstring for the real-
    decoder seam)."""
    fn = decode_fn or fake_decode

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                }
            )

    return assets.mapInPandas(
        gen,
        schema="doc_id long, modality string, n_bytes long, first_byte int",
    )


# --------------------------------------------------------------------------
# Resize (image) and frame sampling (video) — same mapInPandas shape
# --------------------------------------------------------------------------

RESIZE_W = 8
RESIZE_H = 4
FRAME_BYTES = 32
FRAME_STEP = 2


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Decode → resample → re-encode. STUB (no imaging library here);
    pass ``resize_fn=`` to :func:`resize_assets`."""
    raise NotImplementedError(
        "image resizing requires an imaging library not present in this "
        "environment; pass resize_fn= to resize_assets()"
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: truncate/zero-pad the payload to exactly
    width×height bytes (a 1-byte-per-pixel 'thumbnail')."""
    n = width * height
    return payload[:n].ljust(n, b"\x00")


def resize_assets(
    assets: DataFrame,
    width: int = RESIZE_W,
    height: int = RESIZE_H,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Batch resize over binary payloads via ``mapInPandas``: payload
    in, fixed-size payload out, meta updated with width/height. Bytes
    never leave their partition; output rows are O(width·height)."""
    fn = resize_fn or fake_resize

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [fn(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(
        gen, schema="doc_id long, payload binary, width int, height int"
    )


def sample_frames(
    assets: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    step: int = FRAME_STEP,
    split_fn: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Frame sampling for video-ish payloads: one input row fans out to
    one output row per kept frame (every ``step``-th). ``split_fn``
    turns container bytes into frame bytes; the default deterministic
    splitter chunks the payload into fixed-size windows, standing in
    for a real demuxer at the marked seam.

    Scale shape: fan-out happens inside ``mapInPandas`` on the
    partition that already holds the bytes — no shuffle, no driver
    involvement, output bounded by len(payload)/step per row."""

    def default_split(payload: bytes) -> list[bytes]:
        return [
            payload[i : i + frame_bytes]
            for i in range(0, len(payload), frame_bytes)
        ]

    fn = split_fn or default_split

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = fn(payload)
                for idx in range(0, len(frames), step):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame"].append(frames[idx])
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen, schema="doc_id long, frame_idx long, frame binary"
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
        WITH idx AS (
            SELECT doc_id,
                   text,
                   unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0)
                                        AS BIGINT))) AS frame_idx
            FROM documents
        )
        SELECT doc_id,
               frame_idx,
               hex(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT),
                          {FRAME_BYTES})) AS frame_hex
        FROM idx
        WHERE frame_idx % {FRAME_STEP} = 0
    """,
    tags=("multimodal", "extension", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling end-to-end on the documents-as-payloads table.
    The corpus text is pure ASCII, so the oracle reconstructs each
    sampled frame with character slicing — value-level verification of
    the fan-out plumbing (row per frame, byte-exact frames). The frame
    is emitted hex-encoded on BOTH engines: byte-exactness is fully
    preserved, and the comparison harness can canonicalize strings
    (raw ``binary`` frames crash pandas sorting — bytearray is
    unhashable)."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    return sample_frames(with_payload(docs)).select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


@register(
    "multimodal_features",
    oracle="""
        SELECT doc_id,
               'text' AS modality,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               ascii(substr(text, 1, 1)) AS first_byte
        FROM documents
    """,
    tags=("multimodal", "extension", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: build payload+meta columns, run
    the batch 'decode'+feature step in mapInPandas. The oracle verifies
    the full plumbing value-for-value (byte length + first byte are
    decoder-independent)."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    return extract_features(with_payload(docs))

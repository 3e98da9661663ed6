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

from cae_polars_tools_spark.io import read_table
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
    docs = read_table(spark, sf_dir, "documents")
    return extract_features(with_payload(docs))

#!/usr/bin/env python3
"""cae-polars-tools-spark example: the multimodal + embedding surface.

Real, library-free codecs end to end on Spark: a mixed-format image
frame (BMP / PNG / baseline, 4:2:0 and progressive JPEG / GIF) runs
through one format-sniffing feature pass; audio and video payloads
(PCM WAV, YUV4MPEG2, animated GIF) decode with the same
payloads-never-leave-their-partition shape; frames demux through the
generic ``sample_frames`` operator with REAL splitters; and the
embeddings table flows through distributed PCA and ANN top-k.

Run: ``python examples/multimodal_usage.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from cae_polars_tools_spark.io import read_table  # noqa: E402
from cae_polars_tools_spark.plans.registry import load_all  # noqa: E402
from cae_polars_tools_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cae-polars-tools-spark-multimodal")
    spark.sparkContext.setLogLevel("ERROR")

    from cae_polars_tools_spark.operators.gif import encode_gif
    from cae_polars_tools_spark.operators.jpeg import encode_jpeg
    from cae_polars_tools_spark.operators.multimodal import (
        audio_features,
        encode_bmp,
        encode_png,
        encode_wav_pcm16,
        image_features,
        resize_image_bytes,
        sample_frames,
    )
    from cae_polars_tools_spark.operators.y4m import (
        encode_y4m,
        split_y4m_frames,
        video_features,
    )

    rng = np.random.default_rng(7)

    # --- one mixed-format image frame, one sniffing feature pass ----
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    palette = np.stack(
        [np.arange(256), 255 - np.arange(256), np.arange(256) ^ 85], axis=1
    ).astype(np.uint8)
    images = [
        (1, encode_bmp(px)),
        (2, encode_png(px)),
        (3, encode_jpeg(px, quality=95)),
        (4, encode_jpeg(px, quality=95, subsampling="420")),
        (5, encode_jpeg(px, quality=95, progressive=True)),
        (6, encode_gif(rng.integers(0, 256, (16, 16), np.uint8), palette)),
    ]
    frame = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in images], "doc_id long, payload binary"
    )
    feats = image_features(frame).orderBy("doc_id").collect()
    print("image features (format-sniffed, one mapInPandas pass):")
    for r in feats:
        print(
            f"  doc {r['doc_id']}: {r['width']}x{r['height']} "
            f"mean_rgb=({r['mean_r']:.1f}, {r['mean_g']:.1f}, "
            f"{r['mean_b']:.1f})"
        )

    # --- resize: any input format → deterministic PNG thumbnails ----
    thumbs = [
        resize_image_bytes(bytes(b), 8, 8) for _i, b in images[:3]
    ]
    print(f"thumbnails: {len(thumbs)} x 8x8 PNG, "
          f"{sum(len(t) for t in thumbs)} bytes total")

    # --- audio: PCM WAV features -----------------------------------
    tone = (
        np.sin(np.linspace(0, 2 * np.pi * 440, 8000)) * 20000
    ).astype(np.int16)
    audio = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(tone, 8000)))],
        "doc_id long, payload binary",
    )
    [a] = audio_features(audio).collect()
    print(
        f"audio: {a['n_samples']} samples @ {a['sample_rate']} Hz, "
        f"rms={a['rms']:.0f}, peak={a['peak']}"
    )

    # --- video: y4m decode + REAL frame demuxing -------------------
    y = rng.integers(0, 256, size=(6, 8, 12), dtype=np.uint8)
    chroma = np.full((6, 4, 6), 128, np.uint8)
    vid = spark.createDataFrame(
        [(1, bytearray(encode_y4m(y, chroma, chroma, rate=(30, 1))))],
        "doc_id long, payload binary",
    )
    [v] = video_features(vid).collect()
    print(
        f"video: {v['n_frames']} frames {v['width']}x{v['height']} "
        f"@ {v['fps']:.0f} fps, mean_y={v['mean_y']:.1f}"
    )
    kept = sample_frames(vid, step=2, split_fn=split_y4m_frames).count()
    print(f"frame sampling: kept {kept} of {v['n_frames']} frames")

    # --- embeddings: PCA then ANN in the reduced space -------------
    from cae_polars_tools_spark.operators.similarity import (
        lsh_topk,
        project_pca,
        train_pca,
    )
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    model = train_pca(emb, k=8)
    ev = model["explained_variance"]
    print(
        f"PCA: top-8 of {len(model['mean'])} dims, explained "
        f"variance {ev.sum():.3f} (leading component {ev[0]:.3f})"
    )
    projected = project_pca(emb, model)
    print(f"projected rows: {projected.count()}")

    top = lsh_topk(emb, emb.filter(F.col("vec_id") < 3), nprobe=4)
    print("multi-probe LSH top-5 for 3 query vectors:")
    for r in top.orderBy("query_id", "rank").collect()[:6]:
        print(
            f"  q{r['query_id']} #{r['rank']}: vec {r['neighbor_id']} "
            f"(cos {r['cosine']:.4f})"
        )

    # -- cross-modality near-dup: one banded-Hamming kernel ---------
    # SimHash (text), dHash (image), and the frame-energy fingerprint
    # (audio) all reduce a modality to an int64 signature and share
    # dedup.hamming_pairs for candidate generation.
    corpus = load_all()
    for name, label in [
        ("dedup_simhash", "text near-dup (SimHash)"),
        ("dedup_image_dhash", "image near-dup (dHash)"),
        ("dedup_audio_fingerprint", "audio near-dup (energy contour)"),
    ]:
        n = corpus[name].build(spark, sf_dir).count()
        print(f"{label}: {n} candidate pairs")

    print("Multimodal demo complete.")


if __name__ == "__main__":
    main()

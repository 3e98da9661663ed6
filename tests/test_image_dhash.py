"""Perceptual image dHash + the generic banded Hamming kernel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.operators.dedup import hamming_pairs
from cae_polars_tools_spark.operators.multimodal import (
    DHASH_H,
    DHASH_W,
    encode_bmp,
    image_dhash,
)


def _ref_dhash(px: np.ndarray) -> int:
    """Independent scalar reference: integer gray, column gradients."""
    h = 0
    bit = 0
    H, W, _ = px.shape
    for y in range(H):
        for x in range(W - 1):
            g0 = (
                299 * int(px[y, x, 0])
                + 587 * int(px[y, x, 1])
                + 114 * int(px[y, x, 2])
            ) // 1000
            g1 = (
                299 * int(px[y, x + 1, 0])
                + 587 * int(px[y, x + 1, 1])
                + 114 * int(px[y, x + 1, 2])
            ) // 1000
            if g0 < g1:
                h |= 1 << bit
            bit += 1
    return h


def _assets(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )


def test_dhash_matches_scalar_reference(spark):
    rng = np.random.default_rng(7)
    pxs = [
        rng.integers(0, 256, (DHASH_H, DHASH_W, 3), dtype=np.uint8)
        for _ in range(5)
    ]
    out = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(
            _assets(spark, [encode_bmp(p) for p in pxs])
        ).collect()
    }
    for i, px in enumerate(pxs):
        assert out[i] == _ref_dhash(px)


def test_dhash_flat_image_is_zero(spark):
    px = np.full((DHASH_H, DHASH_W, 3), 128, dtype=np.uint8)
    [r] = image_dhash(_assets(spark, [encode_bmp(px)])).collect()
    assert r["dhash"] == 0


def test_dhash_luminance_shift_invariant(spark):
    """dHash keys on gradient SIGNS: a global brightness shift leaves
    the signature unchanged — the property that makes it a near-dup
    detector rather than a byte hash."""
    rng = np.random.default_rng(3)
    base = rng.integers(30, 200, (DHASH_H, DHASH_W, 3), dtype=np.uint8)
    shifted = (base.astype(np.int16) + 20).clip(0, 255).astype(np.uint8)
    out = [
        r["dhash"]
        for r in image_dhash(
            _assets(spark, [encode_bmp(base), encode_bmp(shifted)])
        ).collect()
    ]
    assert bin(out[0] ^ out[1]).count("1") <= 4  # near-identical


def test_dhash_rejects_oversized_raster(spark):
    px = np.zeros((12, 12, 3), dtype=np.uint8)  # 11·12 = 132 bits
    with pytest.raises(Exception, match="63 bits"):
        image_dhash(_assets(spark, [encode_bmp(px)])).collect()


def _sig_frame(spark, sigs):
    return spark.createDataFrame(
        [(i, s) for i, s in sigs.items()], "doc_id long, sig long"
    )


def test_hamming_pairs_exact_in_pigeonhole_regime(spark):
    # nbits=16, band_bits=4 → 4 bands; max_hamming 3 < 4 ⇒ exact.
    # Craft signatures whose pairwise distances straddle the cut.
    sigs = {
        1: 0b0000000000000000,
        2: 0b0000000000000111,  # d(1,2)=3 → pair
        3: 0b0000111100001111,  # d(1,3)=8 → no
        4: 0b0000000000000110,  # d(1,4)=2, d(2,4)=1 → pairs
    }
    got = {
        (r["doc_id_a"], r["doc_id_b"], r["hamming"])
        for r in hamming_pairs(
            _sig_frame(spark, sigs),
            id_col="doc_id",
            sig_col="sig",
            nbits=16,
            band_bits=4,
            max_hamming=3,
        ).collect()
    }
    brute = set()
    ks = sorted(sigs)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= 3:
                brute.add((a, b, d))
    assert got == brute


def test_hamming_pairs_no_duplicate_rows(spark):
    """Signatures equal in several bands must still yield ONE pair row."""
    sigs = {1: 0, 2: 0, 3: 1}
    rows = hamming_pairs(
        _sig_frame(spark, sigs),
        id_col="doc_id",
        sig_col="sig",
        nbits=16,
        band_bits=4,
        max_hamming=3,
    ).collect()
    assert len(rows) == len({(r["doc_id_a"], r["doc_id_b"]) for r in rows})
    assert len(rows) == 3


def test_audio_fingerprint_matches_scalar_reference(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(11)
    clips = [
        rng.integers(0, 256, 64).astype(np.int16) for _ in range(4)
    ]
    assets = _assets(
        spark, [encode_wav_pcm16(c, 8000) for c in clips]
    )
    out = {
        r["doc_id"]: r["afp"]
        for r in audio_fingerprint(assets, frame_samples=2).collect()
    }
    for i, c in enumerate(clips):
        e = (c.astype(np.int64) ** 2).reshape(32, 2).sum(axis=1)
        ref = sum(
            1 << f for f in range(31) if e[f] < e[f + 1]
        )
        assert out[i] == ref


def test_audio_fingerprint_gain_invariant(spark):
    """Scaling every sample by a constant gain preserves all energy
    gradient signs — the property that makes the contour a near-dup
    signature rather than a byte hash."""
    from cae_polars_tools_spark.operators.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(1, 100, 64).astype(np.int16)
    loud = (base * 3).astype(np.int16)
    out = [
        r["afp"]
        for r in audio_fingerprint(
            _assets(
                spark,
                [encode_wav_pcm16(base, 8000), encode_wav_pcm16(loud, 8000)],
            ),
            frame_samples=2,
        ).collect()
    ]
    assert out[0] == out[1]


def test_audio_fingerprint_rejects_oversized_frame_count(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
    )

    clip = np.zeros(200, dtype=np.int16)  # 100 frames at 2 samples
    with pytest.raises(Exception, match="63 bits"):
        audio_fingerprint(
            _assets(spark, [encode_wav_pcm16(clip, 8000)]),
            frame_samples=2,
        ).collect()


def test_dedup_image_dhash_plan_is_bucket_local(spark, sf_small):
    """No cartesian anywhere; candidate generation must ride the
    band-bucket groupBy, not a signature self-join."""
    from cae_polars_tools_spark.plans.registry import load_all

    df = load_all()["dedup_image_dhash"].build(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # pairs come from collect_list


def test_hamming_pairs_oversize_bucket_raises(spark):
    """A degenerate corpus (thousands of identical signatures → one
    clique bucket per band) must refuse loudly instead of becoming a
    single O(b²) task; a clique under the cap still pairs fine."""
    import pytest

    from cae_polars_tools_spark.operators.dedup import HAMMING_MAX_BUCKET

    flood = _sig_frame(spark, {i: 0 for i in range(HAMMING_MAX_BUCKET + 1)})
    with pytest.raises(Exception, match="over max_bucket"):
        hamming_pairs(
            flood, id_col="doc_id", sig_col="sig",
            nbits=16, band_bits=4, max_hamming=3,
        ).count()
    # explicit smaller cap triggers on a small clique too
    small = _sig_frame(spark, {i: 0 for i in range(10)})
    with pytest.raises(Exception, match="over max_bucket"):
        hamming_pairs(
            small, id_col="doc_id", sig_col="sig",
            nbits=16, band_bits=4, max_hamming=3, max_bucket=5,
        ).count()
    # under the cap: all 45 clique pairs, hamming 0
    ok = hamming_pairs(
        small, id_col="doc_id", sig_col="sig",
        nbits=16, band_bits=4, max_hamming=3, max_bucket=64,
    )
    assert ok.count() == 45

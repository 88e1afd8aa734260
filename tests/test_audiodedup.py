"""Perceptual audio dedup (Haitsma-Kalker spectral fingerprint) tests.

Load-bearing property: power-of-two gain scaling is EXACTLY invariant —
IEEE multiplication by 2^k is exact, every FFT operation is linear, so
every band energy scales by exactly 2^2k and every H-K sign bit
survives.  That is what the exact gate's planted gain-twins rely on."""

from __future__ import annotations

import numpy as np
import pytest

from fastdb_spark.pipeline import audiodedup as ad
from fastdb_spark.sources import imagecodec as ic


def _wav(seed: int, gain: int = 1, n: int = 4000) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    sig = (
        2000 * np.sin(t * 0.05 * (1 + seed % 5))
        + 1500 * np.sin(t * 0.013 * (1 + seed % 3))
        + rng.normal(0, 300, n)
    ).astype(np.int16)
    return ic.encode_wav((sig * np.int16(gain))[:, None], rate=16000)


def test_gain_invariance_exact():
    for seed in (1, 5, 9):
        base = ad.afp_bytes(_wav(seed))
        assert ad.afp_bytes(_wav(seed, gain=2)) == base
        assert ad.afp_bytes(_wav(seed, gain=4)) == base


def test_distinct_signals_distinct_fingerprints():
    hashes = {ad.afp_bytes(_wav(seed)) for seed in range(25)}
    assert len(hashes) == 25


def test_bit_matrix_shape_and_balance():
    bits = ad.audio_fingerprint_bits(_wav(3), frame=256, hop=128, bands=16)
    assert bits.shape == ((4000 - 256) // 128 + 1 - 1, 15)
    assert 0.3 < bits.mean() < 0.7  # sign bits are content, not constant


def test_stereo_downmix_and_short_reject():
    stereo = np.stack([np.arange(4000), -np.arange(4000)], axis=1).astype(
        np.int16
    )
    # L+R cancels to zero — still fingerprints (all-equal energies -> 0 bits)
    ad.afp_bytes(ic.encode_wav(stereo, rate=8000))
    with pytest.raises(ValueError, match="too short"):
        ad.afp_bytes(ic.encode_wav(np.zeros((100, 1), dtype=np.int16)))


def test_audio_dup_pairs_end_to_end(spark):
    rows = [(s, bytearray(_wav(s))) for s in range(5)]
    rows.append((100, bytearray(_wav(2, gain=2))))  # gain twin of 2
    rows.append((300, bytearray(b"RIFFxxxxWAVEjunk")))  # torn, skipped
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ad.audio_dup_pairs(media).collect()
    }
    assert pairs == {(2, 100)}
    hashes = ad.audio_hashes(media).collect()
    assert len(hashes) == len(rows) - 1

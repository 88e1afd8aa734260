"""Perceptual image dedup (pHash/dHash) tests.

The load-bearing property: a uniform brightness shift changes only the
DCT's DC coefficient (linearity), so the AC sign bits — the pHash — are
EXACTLY invariant; dHash's gradient signs likewise.  That invariance is
what lets the exact gate adjudicate planted brightness-twins."""

from __future__ import annotations

import numpy as np
import pytest

from fastdb_spark.pipeline import imagededup as idd
from fastdb_spark.sources import imagecodec as ic


def _png(seed: int, shift: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 248, (24, 24)).astype(np.uint8)  # headroom for +shift
    return ic.encode_png(img + np.uint8(shift))


def test_dct32_is_orthonormal():
    c = idd._dct32()
    np.testing.assert_allclose(c @ c.T, np.eye(32), atol=1e-12)


def test_phash_brightness_invariant_dhash_too():
    for seed in (1, 2, 3):
        base = idd.phash_bytes(_png(seed))
        assert idd.phash_bytes(_png(seed, shift=5)) == base
        assert idd.dhash_bytes(_png(seed, shift=5)) == idd.dhash_bytes(_png(seed))


def test_phash_separates_distinct_images():
    hashes = {idd.phash_bytes(_png(seed)) for seed in range(30)}
    assert len(hashes) == 30
    # and hamming distance between random images is large (not near-dups)
    a, b = idd.phash_bytes(_png(1)), idd.phash_bytes(_png(2))
    assert bin(a ^ b).count("1") > 8


def test_phash_jpeg_reencode_is_near(seed=7):
    """A JPEG re-encode of the same picture should land within a few
    bits — the motivating near-dup class."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (4, 4)).repeat(8, 0).repeat(8, 1).astype(np.uint8)
    smooth = (base.astype(float) * 0.7 + 38).astype(np.uint8)
    h_png = idd.phash_bytes(ic.encode_png(smooth))
    from fastdb_spark.sources import jpegcodec as jc

    h_jpg = idd.phash_bytes(jc.encode_jpeg(smooth, quality=90))
    assert bin(h_png ^ h_jpg).count("1") <= 6


def test_unknown_method_raises(spark):
    media = spark.createDataFrame(
        [(1, bytearray(_png(1)))], "media_id long, payload binary"
    )
    with pytest.raises(ValueError, match="method"):
        idd.perceptual_hashes(media, method="md5")


def test_image_dup_pairs_exact_and_banded(spark):
    """Exact regime pairs the brightness twins and nothing else; the
    banded hamming regime also catches a JPEG re-encode twin the exact
    regime misses; undecodable payloads are skipped, not fatal."""
    rows = []
    for seed in range(6):
        rows.append((seed, bytearray(_png(seed))))
    rows.append((100, bytearray(_png(2, shift=4))))  # exact-pHash twin of 2
    # JPEG re-encode twin of a smooth image
    rng = np.random.default_rng(50)
    base = rng.integers(0, 256, (3, 3)).repeat(8, 0).repeat(8, 1).astype(np.uint8)
    smooth = (base.astype(float) * 0.7 + 38).astype(np.uint8)
    rows.append((200, bytearray(ic.encode_png(smooth))))
    from fastdb_spark.sources import jpegcodec as jc

    rows.append((201, bytearray(jc.encode_jpeg(smooth, quality=90))))
    rows.append((300, bytearray(b"not an image at all")))  # skipped
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    exact = {
        (r["id_a"], r["id_b"])
        for r in idd.image_dup_pairs(media, max_hamming=0).collect()
    }
    assert (2, 100) in exact
    assert all(p == (2, 100) or p == (200, 201) for p in exact)

    near = {
        (r["id_a"], r["id_b"])
        for r in idd.image_dup_pairs(media, max_hamming=6).collect()
    }
    assert (2, 100) in near and (200, 201) in near
    assert all(p in ((2, 100), (200, 201)) for p in near)

    hashes = idd.perceptual_hashes(media).collect()
    assert len(hashes) == len(rows) - 1  # torn payload skipped

    with pytest.raises(ValueError, match="bands"):
        idd.image_dup_pairs(media, max_hamming=8, bands=8).collect()


# ---------------------------------------------------------------------------
# video perceptual dedup (sampled-frame pHash fold)


def _avi(seed: int, shift: int = 0, n_frames: int = 8) -> bytes:
    from fastdb_spark.sources import avicodec as av

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 248, (n_frames, 16, 16, 3)).astype(np.uint8)
    return av.encode_avi(frames + np.uint8(shift), fps=4, codec="rgb")


def test_video_fingerprint_brightness_invariant_and_distinct():
    base = idd.video_fingerprint_bytes(_avi(1), every_ms=500)
    assert idd.video_fingerprint_bytes(_avi(1, shift=4), every_ms=500) == base
    assert len(
        {idd.video_fingerprint_bytes(_avi(s), every_ms=500) for s in range(10)}
    ) == 10


def test_video_fingerprint_samples_not_all_frames():
    """Changing an UNSAMPLED frame must not change the fingerprint —
    proof the sampled-decode path really skips frames."""
    from fastdb_spark.sources import avicodec as av

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 248, (8, 16, 16, 3)).astype(np.uint8)
    a = av.encode_avi(frames, fps=4, codec="rgb")
    # fps=4, every 1000 ms over 2 s -> indices 0 and 4; frame 3 unsampled
    frames2 = frames.copy()
    frames2[3] = 255 - frames2[3]
    b = av.encode_avi(frames2, fps=4, codec="rgb")
    assert idd.video_fingerprint_bytes(a, 1000) == idd.video_fingerprint_bytes(b, 1000)
    # but changing a SAMPLED frame does change it
    frames3 = frames.copy()
    frames3[4] = 255 - frames3[4]
    c = av.encode_avi(frames3, fps=4, codec="rgb")
    assert idd.video_fingerprint_bytes(a, 1000) != idd.video_fingerprint_bytes(c, 1000)


def test_video_dup_pairs_end_to_end(spark):
    rows = [(s, bytearray(_avi(s))) for s in range(4)]
    rows.append((100, bytearray(_avi(2, shift=4))))  # regraded twin of 2
    rows.append((300, bytearray(b"RIFF....AVI junk")))  # torn, skipped
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in idd.video_dup_pairs(media, every_ms=500).collect()
    }
    assert pairs == {(2, 100)}

"""Dependency-free PNG / FITS image codec tests, and their integration
with the multimodal mapInPandas operators (un-gating the X4 decode path
for the two formats the reference cutout pipeline emits)."""

from __future__ import annotations

import numpy as np
import pytest

from fastdb_spark.sources import imagecodec as ic


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(ch, filter_type):
    arr = _rng(ch * 10 + filter_type).integers(0, 256, (9, 7, ch), dtype=np.uint8)
    enc = ic.encode_png(arr, filter_type=filter_type)
    dec = ic.decode_png(enc)
    assert dec.shape == arr.shape
    assert np.array_equal(dec, arr), f"ch={ch} filter={filter_type}"


def test_png_grey_2d_input():
    arr = _rng(1).integers(0, 256, (5, 5), dtype=np.uint8)
    dec = ic.decode_png(ic.encode_png(arr))
    assert np.array_equal(dec[:, :, 0], arr)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        ic.decode_png(b"not a png at all")


@pytest.mark.parametrize("dtype", ["u1", "i2", "i4", "f4", "f8"])
def test_fits_roundtrip(dtype):
    arr = _rng(3).integers(-100, 100, (6, 11)).astype(np.dtype(dtype))
    enc = ic.encode_fits_image(arr)
    assert len(enc) % 2880 == 0
    dec = ic.decode_fits_image(enc)
    assert dec.shape == arr.shape
    assert np.array_equal(dec, arr)


def test_fits_rejects_garbage():
    with pytest.raises(ValueError):
        ic.decode_fits_image(b"\x00" * 5760)


def test_resize_nearest_known():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = ic.resize_nearest(arr, 2, 2)
    assert out.tolist() == [[0, 2], [8, 10]]


def test_real_resize_roundtrips():
    arr = _rng(5).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    small = ic.real_resize(ic.encode_png(arr), 4, 4)
    dec = ic.decode_png(small)
    assert dec.shape == (4, 4, 3)
    fits = ic.encode_fits_image(arr[:, :, 0].astype(">i2"))
    small_f = ic.real_resize(fits, 4, 4)
    assert ic.decode_fits_image(small_f).shape == (4, 4)


def test_real_decode_features_values():
    arr = np.full((4, 4), 7, dtype=np.uint8)
    feats = ic.real_decode_features(ic.encode_png(arr))
    assert feats[:4] == [4.0, 4.0, 1.0, 7.0]
    assert feats[4] == 0.0  # std of a constant image


def test_multimodal_real_decoder_end_to_end(spark):
    """The REAL codec through the existing Arrow operators: PNG and FITS
    payloads decode, featurize and resize inside mapInPandas."""
    from fastdb_spark.pipeline.multimodal import extract_features, resize_images

    png = ic.encode_png(
        _rng(11).integers(0, 256, (16, 12, 3), dtype=np.uint8)
    )
    fits = ic.encode_fits_image(
        _rng(12).integers(0, 1000, (10, 10)).astype(">f4")
    )
    rows = [
        (1, "image", bytearray(png), "image/png", 12, 16, None),
        (2, "image", bytearray(fits), "image/fits", 10, 10, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = {
        r["media_id"]: r["feat"]
        for r in extract_features(media, decoder=ic.real_decode_features).collect()
    }
    assert feats[1][:3] == [16.0, 12.0, 3.0]
    assert feats[2][:3] == [10.0, 10.0, 1.0]
    resized = resize_images(media, 6, 6, resizer=ic.real_resize).collect()
    assert len(resized) == 2
    for r in resized:
        dec = ic.decode_any(bytes(r["payload"]))
        assert dec.shape[:2] == (6, 6)


def test_decode_image_falls_back_to_builtin_codec():
    """multimodal.decode_image must decode PNG/FITS without PIL."""
    from fastdb_spark.pipeline.multimodal import decode_image

    arr = _rng(13).integers(0, 256, (5, 6, 3), dtype=np.uint8)
    out = decode_image(ic.encode_png(arr))
    assert np.array_equal(np.asarray(out), arr)


# ---------------------------------------------------------------------------
# WAV audio


@pytest.mark.parametrize("dtype", [np.int8, np.dtype("<i2"), np.dtype("<i4")])
@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(dtype, ch):
    samples = (
        _rng(int(np.dtype(dtype).itemsize) * 10 + ch)
        .integers(-100, 100, (500, ch))
        .astype(dtype)
    )
    enc = ic.encode_wav(samples, rate=8000)
    dec, rate = ic.decode_wav(enc)
    assert rate == 8000
    assert np.array_equal(dec, samples)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        ic.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        ic.decode_wav(b"\x00" * 64)


def test_real_audio_features_known_sine():
    t = np.arange(16000)
    sine = (np.sin(2 * np.pi * 440 * t / 16000) * 10000).astype("<i2")
    feats = ic.real_audio_features(ic.encode_wav(sine, 16000))
    n, ch, rate, dur, mean, rms, peak, zcr = feats
    assert (n, ch, rate) == (16000.0, 1.0, 16000.0)
    assert dur == pytest.approx(1.0)
    assert abs(mean) < 20
    assert rms == pytest.approx(10000 / np.sqrt(2), rel=0.01)
    assert peak <= 10000
    # 440 Hz -> ~880 zero crossings/second
    assert 0.05 < zcr < 0.06


def test_multimodal_audio_end_to_end(spark):
    from fastdb_spark.pipeline.multimodal import extract_features

    wav = ic.encode_wav(
        _rng(21).integers(-1000, 1000, (800, 2)).astype("<i2"), rate=4000
    )
    media = spark.createDataFrame(
        [(5, "audio", bytearray(wav), "audio/wav", None, None, 200)],
        "media_id long, modality string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = extract_features(media, decoder=ic.real_audio_features).collect()
    assert feats[0]["feat"][:3] == [800.0, 2.0, 4000.0]


def test_decode_any_malformed_raises_valueerror():
    # truncated PNG: valid signature, garbage after
    with pytest.raises(ValueError):
        ic.decode_any(b"\x89PNG\r\n\x1a\n" + b"\x00\x00")
    with pytest.raises(ValueError):
        ic.decode_wav(b"RIFF\x10\x00\x00\x00WAVE")

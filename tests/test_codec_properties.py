"""Property-based round-trip tests for the spec-derived codecs
(avro binary, FITS BINTABLE) — hypothesis drives value generation;
the property is decode(encode(x)) == x for every schema-valid x."""

from __future__ import annotations

import json
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fastdb_spark.sources import avro_codec

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
FINITE = st.floats(allow_nan=False, allow_infinity=False)
TEXT = st.text(max_size=80)


RECORD_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": "double"},
            {"name": "d", "type": {"type": "array", "items": "int"}},
            {"name": "e", "type": ["null", {"type": "map", "values": "long"}]},
            {"name": "f", "type": "boolean"},
            {"name": "g", "type": "bytes"},
        ],
    }
)


@settings(max_examples=200, deadline=None)
@given(
    a=I64,
    b=st.one_of(st.none(), TEXT),
    c=st.floats(allow_nan=False),  # inf allowed: IEEE bits round-trip
    d=st.lists(I32, max_size=20),
    e=st.one_of(st.none(), st.dictionaries(TEXT.filter(bool), I64, max_size=8)),
    f=st.booleans(),
    g=st.binary(max_size=64),
)
def test_avro_record_roundtrip(a, b, c, d, e, f, g):
    sch = avro_codec.parse(RECORD_SCHEMA)
    rec = {"a": a, "b": b, "c": c, "d": d, "e": e, "f": f, "g": g}
    back = sch.decode(sch.encode(rec))
    assert back == rec


@settings(max_examples=200, deadline=None)
@given(v=I64)
def test_avro_long_zigzag_roundtrip(v):
    sch = avro_codec.parse('"long"')
    assert sch.decode(sch.encode(v)) == v


@settings(max_examples=100, deadline=None)
@given(v=st.floats())
def test_avro_double_bit_roundtrip(v):
    sch = avro_codec.parse('"double"')
    back = sch.decode(sch.encode(v))
    assert (math.isnan(v) and math.isnan(back)) or back == v


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    width=st.integers(min_value=1, max_value=12),
)
def test_fits_bintable_roundtrip(tmp_path_factory, n, seed, width):
    from fastdb_spark.sources.fits import read_bintable, write_bintable

    rng = np.random.RandomState(seed)
    path = str(tmp_path_factory.mktemp("fits") / "t.FITS.gz")
    cols = {
        "I64": rng.randint(-(2**62), 2**62, size=n).astype(np.int64),
        "I16": rng.randint(-(2**15), 2**15, size=n).astype(np.int16),
        "F32": rng.randn(n).astype(np.float32),
        "F64": rng.randn(n).astype(np.float64),
        "TXT": np.array(
            ["".join(chr(65 + rng.randint(26)) for _ in range(rng.randint(width) + 1)) for _ in range(n)]
        )
        if n
        else np.array([], dtype="U1"),
    }
    write_bintable(path, cols)
    back = read_bintable(path)
    for k, v in cols.items():
        if v.dtype.kind == "U":
            assert list(back[k]) == list(v)
        elif v.dtype.kind == "f":
            assert np.array_equal(back[k], v, equal_nan=True), k
        else:
            assert np.array_equal(back[k], v), k


# ---------------------------------------------------------------------------
# JPEG / AVI properties


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    by=st.integers(min_value=1, max_value=4),
    bx=st.integers(min_value=1, max_value=4),
)
def test_jpeg_blockconstant_q100_bit_exact(seed, by, bx):
    """Per-block-constant images are a fixed point of the q100 pipeline:
    FDCT of a constant block is a lone integer DC coefficient, quant 1
    preserves it, IDCT restores the constant exactly."""
    from fastdb_spark.sources import jpegcodec as jc

    rng = np.random.default_rng(seed)
    img = (
        rng.integers(0, 256, (by, bx)).repeat(8, 0).repeat(8, 1).astype(np.uint8)
    )
    assert np.array_equal(jc.decode_jpeg(jc.encode_jpeg(img, quality=100)), img)


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
)
def test_jpeg_q100_arbitrary_content_bounded_error(seed, h, w):
    """At quant 1 the only loss is coefficient rounding (<=0.5 per
    coefficient); the reconstruction error stays within a few levels for
    ANY content and ANY (cropped) dimensions."""
    from fastdb_spark.sources import jpegcodec as jc

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    dec = jc.decode_jpeg(jc.encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 4
    assert err.mean() <= 1.0


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    n=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=16),
    fps=st.integers(min_value=1, max_value=60),
)
def test_avi_rgb_roundtrip_property(seed, n, h, w, fps):
    """decode(encode(x)) == x for every raw-DIB clip shape, including
    widths whose 3-byte stride needs row padding."""
    from fastdb_spark.sources import avicodec as av

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8)
    dec, got_fps = av.decode_avi(av.encode_avi(frames, fps=fps, codec="rgb"))
    assert got_fps == fps
    assert np.array_equal(dec, frames)

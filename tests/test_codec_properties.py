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

"""Baseline JPEG + AVI codec tests.

Independence strategy (the PNG/FITS codecs' standard): the decoder is
verified against bitstreams the production encoder NEVER touched — a
hand-assembled golden stream whose entropy bits are derived on paper
from T.81, and a naive test-side encoder written straight from the spec
(its own DCT double loop, its own zigzag literal, its own canonical
code builder, its own bit packer).  Component primitives (DCT pair,
zigzag, canonical Huffman codes, EXTEND, quality scaling, color
transform) are each checked against an independent formulation.
Encoder output is then adjudicated through the decoder (round-trip
PSNR, bit-exact regimes) — with the decoder independently pinned, a
cancelling encoder/decoder bug pair would have to fool the golden
streams too.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fastdb_spark.sources import avicodec as av
from fastdb_spark.sources import imagecodec as ic
from fastdb_spark.sources import jpegcodec as jc

# ---------------------------------------------------------------------------
# component primitives vs independent formulations


def test_fdct_matches_naive_definition():
    """T.81 A.3.3 FDCT as a literal O(N^4) double loop."""
    rng = np.random.default_rng(1)
    block = rng.uniform(-128, 127, (8, 8))
    naive = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            naive[u, v] = 0.25 * cu * cv * s
    np.testing.assert_allclose(jc.fdct2(block), naive, atol=1e-9)


def test_idct_inverts_fdct():
    rng = np.random.default_rng(2)
    blocks = rng.uniform(-128, 127, (5, 8, 8))
    np.testing.assert_allclose(jc.idct2(jc.fdct2(blocks)), blocks, atol=1e-9)


def test_zigzag_is_the_spec_order():
    """Spot-check the T.81 figure A.6 path + permutation validity."""
    zz = jc.ZIGZAG
    assert sorted(zz.tolist()) == list(range(64))
    # first and last diagonal walks from the figure
    assert zz[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
    assert zz[-4:].tolist() == [47, 55, 62, 63]
    # structural property of the figure A.6 walk: the anti-diagonal
    # index (row+col) is the canonical zigzag diagonal sequence —
    # diagonal d appears exactly min(d+1, 15-d, 8) times, in order
    diags = [(r // 8) + (r % 8) for r in zz.tolist()]
    expected = [d for d in range(15) for _ in range(min(d + 1, 15 - d, 8))]
    assert diags == expected


def test_canonical_dc_luma_codes_hand_computed():
    """Canonical codes for the Annex K DC luminance table, derived by
    hand from BITS=[0,1,5,1,1,1,1,1,1,0...]: one 2-bit code, five
    3-bit, then one each of 4..9 bits."""
    codes = jc._build_codes(*jc.HUFF_DC_LUMA)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[2] == (0b011, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[7] == (0b11110, 5)
    assert codes[11] == (0b111111110, 9)


def test_canonical_ac_luma_codes_hand_computed():
    codes = jc._build_codes(*jc.HUFF_AC_LUMA)
    assert codes[0x01] == (0b00, 2)  # run 0, size 1
    assert codes[0x02] == (0b01, 2)
    assert codes[0x03] == (0b100, 3)
    assert codes[0x00] == (0b1010, 4)  # EOB
    assert codes[0xF0] == (0b11111111001, 11)  # ZRL (spec table K.5)


def test_huffman_decoder_inverts_encoder_tables():
    """Every symbol in every standard table decodes back from its code."""
    for spec in (
        jc.HUFF_DC_LUMA,
        jc.HUFF_DC_CHROMA,
        jc.HUFF_AC_LUMA,
        jc.HUFF_AC_CHROMA,
    ):
        codes = jc._build_codes(*spec)
        dec = jc._HuffDecoder(*spec)
        for sym, (code, length) in codes.items():
            # write the code MSB-first into a byte buffer, pad with 1s
            total = ((length + 7) // 8) * 8
            buf = (code << (total - length)) | ((1 << (total - length)) - 1)
            r = jc._BitReader(buf.to_bytes(total // 8, "big"))
            assert r.decode_symbol(dec) == sym


def test_extend_is_the_spec_mapping():
    """EXTEND (F.2.2.1) against the encode-side magnitude mapping for
    every category up to 11."""
    for size in range(1, 12):
        for v in [-(1 << size) + 1, -(1 << (size - 1)), (1 << (size - 1)), (1 << size) - 1]:
            if jc._category(v) != size:
                continue
            bits = v if v >= 0 else v + (1 << size) - 1
            assert jc._extend(bits, size) == v
    assert jc._extend(0, 0) == 0


def test_quality_scaling_ijg_formula():
    assert np.array_equal(jc.quality_scale_table(jc.QUANT_LUMA, 50), jc.QUANT_LUMA)
    assert np.array_equal(
        jc.quality_scale_table(jc.QUANT_LUMA, 100), np.ones(64, dtype=np.int64)
    )
    q10 = jc.quality_scale_table(jc.QUANT_LUMA, 10)
    assert (q10 >= jc.QUANT_LUMA).all()  # coarser
    with pytest.raises(ValueError):
        jc.quality_scale_table(jc.QUANT_LUMA, 0)


def test_color_transform_jfif_formulas_and_inverse():
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [128, 128, 128]]], dtype=np.float64)
    ycc = jc.rgb_to_ycbcr(rgb)
    # JFIF spot values: pure red Y=76.245, gray is (128,128,128)
    np.testing.assert_allclose(ycc[0, 0, 0], 0.299 * 255, atol=1e-9)
    np.testing.assert_allclose(ycc[0, 3], [128, 128, 128], atol=1e-9)
    back = jc.ycbcr_to_rgb(ycc)
    np.testing.assert_allclose(back, rgb, atol=0.01)


def test_bitwriter_stuffs_ff():
    w = jc._BitWriter()
    w.write(0xFF, 8)
    w.write(0xA5, 8)
    assert w.flush() == b"\xff\x00\xa5"


# ---------------------------------------------------------------------------
# golden bitstreams: decoder vs hand-assembled spec-derived bytes


def _dht(tclass, tid, spec):
    bits, values = spec
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _golden_gray_header(h, w, qtable_zigzag):
    out = bytearray(b"\xff\xd8")
    body = bytes([0]) + bytes(qtable_zigzag)
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, jc.HUFF_DC_LUMA) + _dht(1, 0, jc.HUFF_AC_LUMA)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    return out


def test_golden_constant_128_block():
    """Hand-derived on paper: constant 128 block, level-shifted to zeros,
    all coefficients 0 -> DC category 0 ('00') + EOB ('1010'); padded
    with 1-bits the entropy segment is the single byte 0x2B."""
    stream = _golden_gray_header(8, 8, [1] * 64) + b"\x2b" + b"\xff\xd9"
    out = jc.decode_jpeg(bytes(stream))
    assert out.shape == (8, 8)
    assert (out == 128).all()


def test_golden_constant_160_block():
    """Constant 160: DC = 8*(160-128) = 256 with quant 1 -> category 9,
    appended bits = 256 (9 bits).  DC luma cat-9 code from
    BITS=[0,1,5,1,1,1,1,1,1,0,...]: '1111110' (7 bits)."""
    bits = "1111110" + "100000000" + "1010"
    bits += "1" * (-len(bits) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    stream = _golden_gray_header(8, 8, [1] * 64) + data + b"\xff\xd9"
    out = jc.decode_jpeg(bytes(stream))
    assert (out == 160).all()


def test_golden_two_blocks_dc_prediction():
    """Two blocks 16 wide: first constant 128 (DC diff 0), second
    constant 129 (DC 8, diff 8 -> category 4, code 101, bits 1000)."""
    bits = "00" + "1010"  # block 1: DC cat0, EOB
    bits += "101" + "1000" + "1010"  # block 2: DC cat4(code 101), 8, EOB
    bits += "1" * (-len(bits) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    stream = _golden_gray_header(8, 16, [1] * 64) + data + b"\xff\xd9"
    out = jc.decode_jpeg(bytes(stream))
    assert out.shape == (8, 16)
    assert (out[:, :8] == 128).all() and (out[:, 8:] == 129).all()


def test_golden_single_ac_coefficient():
    """One nonzero AC: coefficient k=1 in zigzag order (raster (0,1))
    set to +3 with quant 1.  AC luma (run 0, size 2) code = '01', bits
    '11'.  IDCT of that lone basis function is computable independently;
    compare decoder output to the closed-form cosine."""
    bits = "00"  # DC cat 0
    bits += "01" + "11"  # AC run0/size2, value 3
    bits += "1010"  # EOB
    bits += "1" * (-len(bits) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    stream = _golden_gray_header(8, 8, [1] * 64) + data + b"\xff\xd9"
    out = jc.decode_jpeg(bytes(stream)).astype(np.float64)
    # f(x,y) = a(0)a(1)/4 * F(0,1) * cos((2y+1) pi/16): varies along
    # columns only, amplitude 3/(4*sqrt(2))
    y = np.arange(8)
    basis = 3 / (4 * np.sqrt(2)) * np.cos((2 * y + 1) * 1 * np.pi / 16)
    expected = np.clip(np.round(128 + np.tile(basis, (8, 1))), 0, 255)
    np.testing.assert_array_equal(out, expected)


def test_golden_nonunit_quant_table():
    """Quant table actually multiplies: DC quant 16, coefficient 4 ->
    dequantized DC 64 -> constant 128 + 64/8 = 136."""
    q = [16] + [1] * 63
    # on paper: DC diff = 4 -> category 3 (4..7), DC luma cat-3 code =
    # '100', appended magnitude bits = '100'; then EOB '1010'
    bits = "100" + "100" + "1010"
    bits += "1" * (-len(bits) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    stream = _golden_gray_header(8, 8, q) + data + b"\xff\xd9"
    out = jc.decode_jpeg(bytes(stream))
    assert (out == 136).all()


# ---------------------------------------------------------------------------
# naive independent test-side encoder -> production decoder

_TEST_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _TestBits:
    """Independent MSB-first bit packer with FF stuffing."""

    def __init__(self):
        self.bits = ""

    def put(self, code, length):
        self.bits += format(code, f"0{length}b") if length else ""

    def bytes(self):
        b = self.bits + "1" * (-len(self.bits) % 8)
        raw = bytes(int(b[i : i + 8], 2) for i in range(0, len(b), 8))
        return raw.replace(b"\xff", b"\xff\x00")


def _test_codes(spec):
    bits, values = spec
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            k += 1
            code += 1
        code *= 2
    return out


def _naive_encode_gray(img):
    """Straight-from-spec baseline encoder sharing NOTHING with the
    production module: own DCT double loop, own zigzag literal, own
    code builder, own bit packer.  Quant all-ones."""
    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    dc_codes = _test_codes(jc.HUFF_DC_LUMA)
    ac_codes = _test_codes(jc.HUFF_AC_LUMA)
    wtr = _TestBits()
    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float) - 128.0
            coef = np.zeros((8, 8))
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s = 0.0
                    for x in range(8):
                        for y in range(8):
                            s += (
                                block[x, y]
                                * np.cos((2 * x + 1) * u * np.pi / 16)
                                * np.cos((2 * y + 1) * v * np.pi / 16)
                            )
                    coef[u, v] = 0.25 * cu * cv * s
            qz = [int(round(coef.flat[r])) for r in _TEST_ZIGZAG]
            diff = qz[0] - pred
            pred = qz[0]
            size = abs(diff).bit_length()
            c, ln = dc_codes[size]
            wtr.put(c, ln)
            if size:
                wtr.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
            run = 0
            last = max((i for i in range(1, 64) if qz[i]), default=0)
            for k in range(1, last + 1):
                if qz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    wtr.put(c, ln)
                    run -= 16
                size = abs(qz[k]).bit_length()
                c, ln = ac_codes[(run << 4) | size]
                wtr.put(c, ln)
                wtr.put(qz[k] if qz[k] >= 0 else qz[k] + (1 << size) - 1, size)
                run = 0
            if last < 63:
                c, ln = ac_codes[0x00]
                wtr.put(c, ln)
    return bytes(_golden_gray_header(h, w, [1] * 64) + wtr.bytes() + b"\xff\xd9")


def test_decoder_vs_independent_naive_encoder():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    out = jc.decode_jpeg(_naive_encode_gray(img))
    assert out.shape == img.shape
    # quant=1 round-trip loses only the coefficient rounding: <= 2 levels
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_decoder_420_subsampled_stream():
    """Hand-assembled 4:2:0 color stream: 16x16, Y per-block constants
    [118,138,98,158], chroma constant 128 (gray) -> decodes to the four
    gray quadrants.  MCU order: Y00 Y01 Y10 Y11 Cb Cr."""
    dc_l = _test_codes(jc.HUFF_DC_LUMA)
    dc_c = _test_codes(jc.HUFF_DC_CHROMA)
    ac_l = _test_codes(jc.HUFF_AC_LUMA)
    ac_c = _test_codes(jc.HUFF_AC_CHROMA)
    wtr = _TestBits()
    pred = 0
    for val in (118, 138, 98, 158):  # Y blocks, DC = 8*(val-128)
        dc = 8 * (val - 128)
        diff = dc - pred
        pred = dc
        size = abs(diff).bit_length()
        c, ln = dc_l[size]
        wtr.put(c, ln)
        wtr.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
        c, ln = ac_l[0x00]
        wtr.put(c, ln)
    for _ in range(2):  # Cb, Cr: all-zero blocks
        c, ln = dc_c[0]
        wtr.put(c, ln)
        c, ln = ac_c[0x00]
        wtr.put(c, ln)
    out = bytearray(b"\xff\xd8")
    for tid in (0, 1):
        body = bytes([tid]) + bytes([1] * 64)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0])  # Y 2x2 sampling
    sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, jc.HUFF_DC_LUMA) + _dht(1, 0, jc.HUFF_AC_LUMA)
    out += _dht(0, 1, jc.HUFF_DC_CHROMA) + _dht(1, 1, jc.HUFF_AC_CHROMA)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += wtr.bytes() + b"\xff\xd9"
    dec = jc.decode_jpeg(bytes(out))
    assert dec.shape == (16, 16, 3)
    # gray pixels (chroma 128): R=G=B=Y
    for (qy, qx), val in zip(((0, 0), (0, 1), (1, 0), (1, 1)), (118, 138, 98, 158)):
        quad = dec[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8]
        assert np.abs(quad.astype(int) - val).max() <= 1, (qy, qx, val)


# ---------------------------------------------------------------------------
# production encoder -> production decoder


def test_roundtrip_constant_blocks_bit_exact_q100():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (3, 4)).repeat(8, 0).repeat(8, 1).astype(np.uint8)
    assert np.array_equal(jc.decode_jpeg(jc.encode_jpeg(img, quality=100)), img)


def test_roundtrip_psnr_thresholds():
    y, x = np.mgrid[0:48, 0:64]
    img = ((np.sin(x / 9.0) + np.cos(y / 7.0) + 2) * 63).astype(np.uint8)
    for q, floor in ((50, 38.0), (85, 44.0), (100, 55.0)):
        dec = jc.decode_jpeg(jc.encode_jpeg(img, quality=q))
        mse = ((dec.astype(float) - img) ** 2).mean()
        psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
        assert psnr >= floor, (q, psnr)


def test_roundtrip_rgb_and_odd_dims():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
    dec = jc.decode_jpeg(jc.encode_jpeg(img, quality=100))
    assert dec.shape == (13, 17, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4  # color xform rounding


def test_roundtrip_restart_intervals():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for ri in (1, 3, 7):
        enc = jc.encode_jpeg(img, quality=100, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        dec = jc.decode_jpeg(enc)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1
    # wraps past RST7
    big = rng.integers(0, 256, (80, 80)).astype(np.uint8)
    dec = jc.decode_jpeg(jc.encode_jpeg(big, quality=100, restart_interval=1))
    assert np.abs(dec.astype(int) - big.astype(int)).max() <= 1


def test_encoder_emits_stuffed_bytes_that_decode():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    enc = jc.encode_jpeg(img, quality=100)
    scan = enc[enc.index(b"\xff\xda") :]
    assert b"\xff\x00" in scan  # stuffing actually exercised
    jc.decode_jpeg(enc)


def test_error_paths_name_the_feature():
    with pytest.raises(ValueError, match="SOI"):
        jc.decode_jpeg(b"\x00\x01")
    # progressive: minimal SOI + SOF2
    prog = b"\xff\xd8\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x08\x00\x08\x01"
    with pytest.raises(ValueError, match="non-baseline"):
        jc.decode_jpeg(prog)
    with pytest.raises(ValueError, match="quality"):
        jc.encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=101)
    with pytest.raises(ValueError, match="uint8"):
        jc.encode_jpeg(np.zeros((8, 8), dtype=np.int32))
    with pytest.raises(ValueError, match="empty"):
        jc.encode_jpeg(np.zeros((0, 8), dtype=np.uint8))
    # 16-bit quant tables
    seg = b"\xff\xd8\xff\xdb" + struct.pack(">H", 3 + 128) + b"\x10" + b"\x00" * 128
    with pytest.raises(ValueError, match="16-bit"):
        jc.decode_jpeg(seg + b"\xff\xd9")
    # truncated entropy data
    stream = _golden_gray_header(8, 8, [1] * 64) + b"\xff\xd9"
    with pytest.raises(ValueError, match="exhausted|Huffman"):
        jc.decode_jpeg(bytes(stream))


# ---------------------------------------------------------------------------
# imagecodec dispatch integration


def test_sniff_and_decode_any_jpeg():
    img = np.full((8, 8), 200, dtype=np.uint8)
    enc = jc.encode_jpeg(img, quality=100)
    assert ic.sniff(enc) == "jpeg"
    assert (ic.decode_any(enc) == 200).all()
    feats = ic.real_decode_features(enc)
    assert feats[0] == 8.0 and feats[1] == 8.0 and feats[3] == 200.0


def test_real_resize_jpeg_stays_jpeg():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 2
    out = ic.real_resize(jc.encode_jpeg(img, quality=100), 16, 16)
    assert ic.sniff(out) == "jpeg"
    dec = ic.decode_any(out)
    assert dec.shape[:2] == (16, 16)


def test_decode_any_malformed_jpeg_is_valueerror():
    with pytest.raises(ValueError):
        ic.decode_any(b"\xff\xd8\xff")


# ---------------------------------------------------------------------------
# AVI container


def test_avi_rgb_roundtrip_lossless_with_row_padding():
    rng = np.random.default_rng(10)
    frames = rng.integers(0, 256, (4, 11, 33, 3)).astype(np.uint8)  # stride%4 != 0
    enc = av.encode_avi(frames, fps=12, codec="rgb")
    dec, fps = av.decode_avi(enc)
    assert fps == 12
    assert np.array_equal(dec, frames)
    info = av.avi_info(enc)
    assert info == {"n_frames": 4, "width": 33, "height": 11, "fps": 12, "codec": "rgb"}


def test_avi_gray_frames_promote_to_rgb():
    frames = np.full((2, 8, 8), 77, dtype=np.uint8)
    dec, _ = av.decode_avi(av.encode_avi(frames, codec="rgb"))
    assert dec.shape == (2, 8, 8, 3)
    assert (dec == 77).all()


def test_avi_mjpg_roundtrip_and_single_frame():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (5, 16, 16, 3)).astype(np.uint8)
    enc = av.encode_avi(frames, fps=10, codec="mjpg", quality=90)
    dec, _ = av.decode_avi(enc)
    assert dec.shape == frames.shape
    assert ((dec.astype(float) - frames) ** 2).mean() < 200
    one = av.decode_avi_frame(enc, 3)
    assert np.array_equal(one, dec[3])
    assert av.avi_info(enc)["codec"] == "mjpg"


def test_avi_mjpg_blockconstant_gray_bit_exact():
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, (3, 2, 2)).repeat(8, 1).repeat(8, 2).astype(np.uint8)
    enc = av.encode_avi(frames, codec="mjpg", quality=100)
    dec, _ = av.decode_avi(enc)
    assert np.array_equal(dec, frames)


def test_multimodal_jpeg_end_to_end(spark):
    """JPEG payloads through the existing Arrow operators: featurize and
    resize inside mapInPandas, no PIL anywhere."""
    from fastdb_spark.pipeline.multimodal import extract_features, resize_images

    rng = np.random.default_rng(20)
    gray = rng.integers(0, 256, (2, 3)).repeat(8, 0).repeat(8, 1).astype(np.uint8)
    jpg = jc.encode_jpeg(gray, quality=100)  # bit-exact regime
    rows = [(1, "image", bytearray(jpg), "image/jpeg", 24, 16, None)]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = extract_features(media, decoder=ic.real_decode_features).collect()
    assert feats[0]["feat"][:4] == [16.0, 24.0, 1.0, float(gray.mean())]
    resized = resize_images(media, 8, 8, resizer=ic.real_resize).collect()
    out = ic.decode_any(bytes(resized[0]["payload"]))
    assert ic.sniff(bytes(resized[0]["payload"])) == "jpeg"
    assert out.shape[:2] == (8, 8)


def test_sample_frames_decoded_end_to_end(spark):
    """REAL video frame sampling: AVI payloads decode only the sampled
    frames; raw-RGB frames make the per-frame stats exactly checkable."""
    from fastdb_spark.pipeline.multimodal import sample_frames_decoded

    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, (6, 8, 12, 3)).astype(np.uint8)
    avi = av.encode_avi(frames, fps=2, codec="rgb")  # 3 s of video
    rows = [
        (1, "video", bytearray(avi), "video/avi", 12, 8, 3000),
        (2, "image", bytearray(b"not video"), None, None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    got = {
        r["frame_ts_ms"]: r
        for r in sample_frames_decoded(media, every_ms=1000).collect()
    }
    # fps=2, every 1000 ms -> ts 0/1000/2000 -> frame indices 0/2/4
    assert sorted(got) == [0, 1000, 2000]
    for ts, idx in ((0, 0), (1000, 2), (2000, 4)):
        r = got[ts]
        assert r["media_id"] == 1 and r["frame_index"] == idx
        assert (r["height"], r["width"], r["channels"]) == (8, 12, 3)
        a = frames[idx].astype(np.float64)
        assert abs(r["pix_mean"] - a.mean()) < 1e-9
        assert abs(r["pix_std"] - a.std()) < 1e-9


def test_avi_error_paths():
    with pytest.raises(ValueError, match="RIFF"):
        av.decode_avi(b"nope")
    with pytest.raises(ValueError, match="codec"):
        av.encode_avi(np.zeros((1, 8, 8), dtype=np.uint8), codec="h264")
    with pytest.raises(ValueError, match="uint8"):
        av.encode_avi(np.zeros((1, 8, 8), dtype=np.float64))
    with pytest.raises(ValueError, match="zero frames|empty"):
        av.encode_avi(np.zeros((0, 8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="out of range"):
        av.decode_avi_frame(
            av.encode_avi(np.zeros((2, 8, 8), dtype=np.uint8), codec="rgb"), 5
        )
    assert av.sniff_avi(av.encode_avi(np.zeros((1, 8, 8), dtype=np.uint8), codec="rgb"))
    assert not av.sniff_avi(b"RIFFxxxxWAVE")


# ---------------------------------------------------------------------------
# 4:2:0 encoder


def test_encode_420_roundtrip_and_size_win():
    """The 4:2:0 encoder output decodes through the (independently
    pinned) decoder within chroma-averaging error, and its scan is
    materially smaller than 4:4:4 on the same content."""
    y, x = np.mgrid[0:96, 0:96]
    smooth = np.stack(
        [
            ((np.sin(x / 9.0) + 1) * 127).astype(np.uint8),
            ((np.cos(y / 7.0) + 1) * 127).astype(np.uint8),
            ((np.sin((x + y) / 11.0) + 1) * 127).astype(np.uint8),
        ],
        axis=-1,
    )
    enc420 = jc.encode_jpeg(smooth, quality=90, subsampling="4:2:0")
    enc444 = jc.encode_jpeg(smooth, quality=90, subsampling="4:4:4")
    dec = jc.decode_jpeg(enc420)
    assert dec.shape == smooth.shape
    mse = ((dec.astype(float) - smooth) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr >= 30.0, psnr
    assert len(enc420) < 0.8 * len(enc444), (len(enc420), len(enc444))


def test_encode_420_gray_content_matches_444():
    """Gray content (R=G=B) has constant chroma, so 4:2:0 subsampling
    loses nothing: both modes reconstruct the same pixels at q100."""
    rng = np.random.default_rng(30)
    g = rng.integers(0, 256, (2, 2)).repeat(8, 0).repeat(8, 1).astype(np.uint8)
    img = np.stack([g, g, g], axis=-1)
    d420 = jc.decode_jpeg(jc.encode_jpeg(img, quality=100, subsampling="4:2:0"))
    d444 = jc.decode_jpeg(jc.encode_jpeg(img, quality=100, subsampling="4:4:4"))
    assert np.array_equal(d420, d444)
    assert np.abs(d420.astype(int) - img.astype(int)).max() <= 1


def test_encode_420_odd_dims_and_restarts():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (19, 21, 3)).astype(np.uint8)
    for ri in (0, 1):
        dec = jc.decode_jpeg(
            jc.encode_jpeg(img, quality=95, subsampling="4:2:0", restart_interval=ri)
        )
        assert dec.shape == img.shape
    with pytest.raises(ValueError, match="subsampling"):
        jc.encode_jpeg(img, subsampling="4:1:1")


def test_encode_420_quadrants_match_hand_stream_semantics():
    """The production 4:2:0 encoder on the same four-quadrant gray image
    the hand-assembled stream test decodes: quadrant constants survive
    the MCU interleave (Y 2x2 + Cb + Cr) bit-for-bit at q100."""
    q = np.array([[118, 138], [98, 158]], dtype=np.uint8)
    g = q.repeat(8, 0).repeat(8, 1)
    img = np.stack([g, g, g], axis=-1)
    dec = jc.decode_jpeg(jc.encode_jpeg(img, quality=100, subsampling="4:2:0"))
    for (qy, qx), val in zip(((0, 0), (0, 1), (1, 0), (1, 1)), (118, 138, 98, 158)):
        quad = dec[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8]
        assert np.abs(quad.astype(int) - int(val)).max() <= 1, (qy, qx, val)


def test_avi_torn_mjpeg_frame_is_valueerror():
    """A corrupted MJPEG frame chunk must surface as the documented
    ValueError (reject-row cascade contract), not a raw struct/Index
    error from the JPEG parser."""
    frames = np.full((2, 8, 8), 99, dtype=np.uint8)
    enc = bytearray(av.encode_avi(frames, codec="mjpg", quality=100))
    # tear the second frame: find its JPEG SOI inside movi and truncate
    # the chunk body to 4 bytes of garbage after SOI
    soi_positions = []
    i = 0
    while True:
        j = bytes(enc).find(b"\xff\xd8\xff", i)
        if j < 0:
            break
        soi_positions.append(j)
        i = j + 1
    assert len(soi_positions) >= 2
    j = soi_positions[-1]
    enc[j + 2 : j + 8] = b"\xc0\x00\x02\x00\x00\x00"  # nonsense SOF stub
    with pytest.raises(ValueError):
        av.decode_avi(bytes(enc))


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.2: a single-component scan is non-interleaved — declared
    sampling factors do not apply.  A grayscale stream declaring 2x2
    must decode on the plain 8x8 block grid."""
    out = bytearray(b"\xff\xd8")
    body = bytes([0]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x22, 0])  # 2x2!
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, jc.HUFF_DC_LUMA) + _dht(1, 0, jc.HUFF_AC_LUMA)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    # two blocks on the 8x8 grid: 128 then 129 (same bits as the
    # DC-prediction golden)
    bits = "00" + "1010" + "101" + "1000" + "1010"
    bits += "1" * (-len(bits) % 8)
    out += int(bits, 2).to_bytes(len(bits) // 8, "big") + b"\xff\xd9"
    dec = jc.decode_jpeg(bytes(out))
    assert dec.shape == (8, 16)
    assert (dec[:, :8] == 128).all() and (dec[:, 8:] == 129).all()


def test_fill_bytes_before_marker_tolerated():
    """Repeated 0xFF fill bytes before a marker are legal (B.1.1.2)."""
    enc = jc.encode_jpeg(np.full((8, 8), 50, dtype=np.uint8), quality=100)
    # inject fill bytes before the DQT marker (right after SOI+APP0)
    i = enc.index(b"\xff\xdb")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i + 1 :]  # FF FF FF DB...
    assert (jc.decode_jpeg(padded) == 50).all()


# ---------------------------------------------------------------------------
# header-only probes + metadata validation


def test_header_only_infos():
    rng = np.random.default_rng(40)
    img = rng.integers(0, 256, (12, 20, 3)).astype(np.uint8)
    pi = ic.png_info(ic.encode_png(img))
    assert (pi["width"], pi["height"], pi["channels"]) == (20, 12, 3)
    ji = jc.jpeg_info(jc.encode_jpeg(img, quality=85))
    assert (ji["width"], ji["height"], ji["channels"], ji["baseline"]) == (20, 12, 3, True)
    fi = ic.fits_info(ic.encode_fits_image(np.zeros((7, 9), dtype=">i2")))
    assert (fi["width"], fi["height"], fi["bitpix"]) == (9, 7, 16)
    wi = ic.wav_info(ic.encode_wav(np.zeros((500, 2), dtype=np.int16), rate=8000))
    assert (wi["channels"], wi["rate"], wi["n_frames"]) == (2, 8000, 500)
    # progressive SOF2 probes (baseline False) without decoding
    prog = b"\xff\xd8\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x10\x00\x20\x01"
    assert jc.jpeg_info(prog) == {
        "width": 32, "height": 16, "channels": 1, "precision": 8, "baseline": False,
    }


def test_probe_media_validates_declared_metadata(spark):
    from fastdb_spark.pipeline.multimodal import probe_media

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (10, 14)).astype(np.uint8)
    avi = av.encode_avi(
        rng.integers(0, 256, (3, 8, 12, 3)).astype(np.uint8), fps=3, codec="rgb"
    )
    wavb = ic.encode_wav(np.zeros((400, 1), dtype=np.int16), rate=16000)
    rows = [
        # truthful PNG
        (1, "image", bytearray(ic.encode_png(img)), None, 14, 10, None),
        # lying JPEG: declared 99x99
        (2, "image", bytearray(jc.encode_jpeg(img)), None, 99, 99, None),
        # AVI with truthful dims
        (3, "video", bytearray(avi), None, 12, 8, 1000),
        # WAV (no declared dims -> metadata_ok NULL)
        (4, "audio", bytearray(wavb), None, None, None, None),
        # torn payload
        (5, "image", bytearray(b"\xff\xd8\xff"), None, 8, 8, None),
        (6, "image", bytearray(b"garbage"), None, None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    got = {r["media_id"]: r for r in probe_media(media).collect()}
    assert got[1]["kind"] == "png" and got[1]["metadata_ok"] is True
    assert got[1]["actual_width"] == 14 and got[1]["actual_height"] == 10
    assert got[2]["kind"] == "jpeg" and got[2]["metadata_ok"] is False
    assert got[3]["kind"] == "avi" and got[3]["metadata_ok"] is True
    assert got[3]["n_frames"] == 3
    assert got[4]["kind"] == "wav" and got[4]["metadata_ok"] is None
    assert got[4]["n_frames"] == 400 and got[4]["channels"] == 1
    assert got[5]["kind"] == "malformed_jpeg" and got[5]["metadata_ok"] is None
    assert got[6]["kind"] == "unknown"

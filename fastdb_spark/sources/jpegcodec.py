"""Dependency-free baseline JPEG codec (ITU-T T.81 / JFIF), numpy-only.

The runtime image ships no imaging library, but baseline JPEG needs
none: it is 8x8 block DCT + uniform quantization + canonical Huffman
entropy coding inside a marker-segmented container — all public spec
(ITU-T T.81, the JFIF APP0 convention).  Implementing it from the spec
closes the one image format the multimodal path (reference
``src/services/projectsim.py:362-421`` cutout previews; user-supplied
corpus media) still PIL-gated: ``sources.imagecodec.decode_any`` now
dispatches JPEG natively and ``pipeline.multimodal.decode_image`` no
longer needs Pillow for it.

Scope (stated plainly):
- **Decode**: baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
  components, arbitrary sampling factors 1-2 per axis (4:4:4, 4:2:2,
  4:2:0, ...), restart intervals (DRI/RSTn), multiple DQT/DHT tables
  per segment.  Progressive (SOF2), arithmetic coding, 12-bit, and
  hierarchical modes raise ``ValueError`` naming the feature (the
  reject-row cascade upstream catches that).
- **Encode**: baseline sequential, grayscale or YCbCr at 4:4:4 or
  4:2:0 (box-averaged chroma, the interchange default), standard
  Annex K quantization tables scaled by the IJG quality formula
  (quality=100 -> all-ones tables, which makes per-block-constant
  images round-trip bit-exactly — the property the exact-correctness
  gate leans on), standard Annex K Huffman tables, optional restart
  intervals.

The DCT is the spec's type-II/III pair computed as an exact matrix
product over numpy float64 (vectorized across every block of the image
in one einsum) — no fast-DCT approximations, so encoder and decoder
are the textbook definitions the tests can check against a naive
O(N^4) double loop.  Entropy coding walks blocks in Python but does
integer work only; for the corpus-preview image sizes this path serves
(and Arrow-batched ``mapInPandas`` parallelism upstream), that is the
right simplicity/speed trade.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants

#: zigzag scan order (T.81 figure A.6): ZIGZAG[i] = raster index of the
#: i-th coefficient in zigzag order.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

#: Annex K.1 luminance / K.2 chrominance quantization tables (raster order).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

#: Annex K.3 standard Huffman tables as (bits[1..16] counts, values).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: exact type-II DCT basis matrix: C[u, x] = a(u)/2 * cos((2x+1) u pi / 16)
_DCT_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def fdct2(blocks: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT over a stack of blocks ``(..., 8, 8)`` (T.81 A.3.3)."""
    return np.einsum("ux,...xy,vy->...uv", _DCT_C, blocks, _DCT_C)


def idct2(blocks: np.ndarray) -> np.ndarray:
    """Inverse 8x8 DCT over a stack of blocks ``(..., 8, 8)``."""
    return np.einsum("xu,...uv,yv->...xy", _DCT_C.T.copy(), blocks, _DCT_C.T.copy())


def quality_scale_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table clipped to [1, 255].

    quality=50 reproduces the Annex K base table; quality=100 gives
    all ones (the bit-exact-constant-block regime)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality {quality} out of range 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman table machinery (canonical codes per T.81 Annex C)


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a (BITS, HUFFVAL) table spec."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_STD_CODES = None


def _std_codes():
    """The four standard encode tables, built once per process."""
    global _STD_CODES
    if _STD_CODES is None:
        _STD_CODES = (
            _build_codes(*HUFF_DC_LUMA),
            _build_codes(*HUFF_AC_LUMA),
            _build_codes(*HUFF_DC_CHROMA),
            _build_codes(*HUFF_AC_CHROMA),
        )
    return _STD_CODES


class _HuffDecoder:
    """Canonical Huffman decode tables (T.81 F.2.2.3: MINCODE/MAXCODE/VALPTR)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a destuffed entropy-coded segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # byte position
        self.bit = 0  # bit position within current byte

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted mid-symbol")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[length]:
                return table.values[table.valptr[length] + code - table.mincode[length]]
        raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _category(v: int) -> int:
    """Bit category (SSSS) of a signed coefficient value."""
    return int(abs(v)).bit_length()


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3; a padded
        0xFF still gets its stuffed zero)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, m: int) -> None:
        """Byte-align and emit a bare marker (RSTn) into the stream."""
        self.align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


# ---------------------------------------------------------------------------
# color transforms (JFIF / BT.601 full range)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# encoder


def _encode_block(
    writer: _BitWriter,
    row: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    """Entropy-encode one zigzagged quantized block; returns the new DC
    predictor."""
    diff = int(row[0]) - pred
    pred = int(row[0])
    s = _category(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(row[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return pred


def _dht_segment(tclass: int, tid: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, values = table
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, table_raster: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(v) for v in table_raster[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _pad_edge(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    """Edge-replicate pad a 2-D float plane to exactly (H, W)."""
    h, w = plane.shape
    if h == H and w == W:
        return plane
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    subsampling: str = "4:4:4",
) -> bytes:
    """uint8 array (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes.

    ``subsampling`` is ``'4:4:4'`` (every component full resolution) or
    ``'4:2:0'`` (chroma box-averaged 2x2 — the interchange default,
    roughly halving color payloads; ignored for grayscale).  Standard
    Annex K quantization scaled by ``quality`` (100 -> all-ones tables),
    standard Annex K Huffman tables.  Dimensions are padded to MCU
    multiples internally; the SOF0 header records the true size so
    decoders crop back.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    that many MCUs (DC predictors reset at each) — the error-resilience
    feature long corpus scans want: a corrupt byte loses one restart
    interval, not the rest of the image."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"JPEG encode expects uint8, got {arr.dtype}")
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = rgb_to_ycbcr(arr)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError(f"JPEG encode expects (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot JPEG-encode an empty image")

    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(
            f"unsupported subsampling {subsampling!r} (4:4:4 or 4:2:0)"
        )
    qluma = quality_scale_table(QUANT_LUMA, quality)
    qchroma = quality_scale_table(QUANT_CHROMA, quality)
    ncomp = len(planes)
    # per-component (h_sampling, v_sampling)
    if ncomp == 3 and subsampling == "4:2:0":
        hv = [(2, 2), (1, 1), (1, 1)]
    else:
        hv = [(1, 1)] * ncomp
    hmax = max(s[0] for s in hv)
    vmax = max(s[1] for s in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF 1.01, no density, no thumbnail
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += _dqt_segment(0, qluma)
    if ncomp == 3:
        out += _dqt_segment(1, qchroma)
    # SOF0: precision 8, size, components (id, sampling, qtable)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = hv[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, HUFF_DC_LUMA)
    out += _dht_segment(1, 0, HUFF_AC_LUMA)
    if ncomp == 3:
        out += _dht_segment(0, 1, HUFF_DC_CHROMA)
        out += _dht_segment(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l, ac_l, dc_c, ac_c = _std_codes()

    # quantized zigzag block grids per component: (blocks_y, blocks_x, 64)
    zz_planes = []
    for ci, plane in enumerate(planes):
        hs, vs = hv[ci]
        full = _pad_edge(plane, mcuy * 8 * vmax, mcux * 8 * hmax)
        if (hs, vs) != (hmax, vmax):
            # box-average downsample to this component's grid (JFIF
            # centered-average convention for 2x2)
            ry, rx = vmax // vs, hmax // hs
            H, W = full.shape
            full = full.reshape(H // ry, ry, W // rx, rx).mean(axis=(1, 3))
        nby, nbx = full.shape[0] // 8, full.shape[1] // 8
        blocks = full.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coefs = fdct2(blocks - 128.0)
        q = qluma if ci == 0 else qchroma
        qz = np.round(coefs / q.reshape(8, 8)).astype(np.int64)
        zz_planes.append(qz.reshape(nby, nbx, 64)[:, :, ZIGZAG])

    writer = _BitWriter()
    preds = [0] * ncomp
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)
    # interleaved MCU raster order: each MCU carries hs*vs blocks per
    # component (T.81 A.2.3)
    rst = 0
    m = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and m and m % restart_interval == 0:
                writer.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = hv[ci]
                for v in range(vs):
                    for hb in range(hs):
                        preds[ci] = _encode_block(
                            writer,
                            zz_planes[ci][my * vs + v, mx * hs + hb],
                            tables[ci][0],
                            tables[ci][1],
                            preds[ci],
                        )
            m += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def _destuff(data: bytes) -> tuple[bytes, list[int]]:
    """Remove 0xFF00 stuffing; return (clean bytes, restart-marker byte
    offsets into the CLEAN stream, each marking the start of a new
    entropy interval)."""
    out = bytearray()
    restarts = []
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                restarts.append(len(out))
                i += 2
                continue
            break  # next real marker (EOI / next scan) ends the segment
        out.append(b)
        i += 1
    return bytes(out), restarts


def jpeg_info(payload: bytes) -> dict:
    """Header-only probe: dimensions / component count / baseline flag
    from the SOF marker, WITHOUT entropy decode — the metadata-
    validation path never pays for pixels."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        while pos + 2 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            if len(body) < 6:
                raise ValueError("truncated JPEG frame header")
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            return {
                "width": fw,
                "height": fh,
                "channels": ncomp,
                "precision": prec,
                "baseline": marker in (0xC0, 0xC1),
            }
    raise ValueError("JPEG has no frame header (SOF marker not found)")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> uint8 array (h, w) or (h, w, 3).

    Grayscale streams return 2-D; 3-component YCbCr returns RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        # repeated 0xFF are legal fill bytes before a marker (T.81 B.1.1.2)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / bare RST
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec = body[i] >> 4
                tid = body[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                tz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tz
                qtables[tid] = raster
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tclass = body[i] >> 4
                tid = body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                values = list(body[i + 17 : i + 17 + nvals])
                htables[(tclass, tid)] = _HuffDecoder(bits, values)
                i += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both baseline-ish)
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported (8 only)")
            comps = []
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                samp = body[7 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, body[8 + 3 * ci]))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cid = body[1 + 2 * si]
                td = body[2 + 2 * si] >> 4
                ta = body[2 + 2 * si] & 0x0F
                scan.append((cid, td, ta))
            data, restarts = _destuff(payload[pos:])
            return _decode_scan(
                frame, scan, qtables, htables, data, restarts, restart_interval
            )
        # APPn / COM / others: skipped
    raise ValueError("JPEG has no scan (SOS marker not found)")


def _decode_scan(
    frame: tuple,
    scan: list[tuple[int, int, int]],
    qtables: dict[int, np.ndarray],
    htables: dict[tuple[int, int], _HuffDecoder],
    data: bytes,
    restarts: list[int],
    restart_interval: int,
) -> np.ndarray:
    fh, fw, comps = frame
    if len(scan) != len(comps):
        raise ValueError("JPEG multi-scan (non-interleaved) unsupported")
    if len(comps) == 1:
        # a single-component scan is NON-interleaved (T.81 A.2.2): the
        # MCU is one data unit and the declared sampling factors do not
        # apply — a grayscale file declaring 2x2 sampling still lays its
        # blocks out on the plain 8x8 grid
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or any(c[1] < 1 or c[2] < 1 for c in comps):
        raise ValueError("JPEG sampling factors beyond 2x2 unsupported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_cid = {c[0]: c for c in comps}

    # per component: quantized coefficient store (blocks_y, blocks_x, 64)
    stores = {}
    tables = {}
    for cid, td, ta in scan:
        _, hs, vs, tq = by_cid[cid]
        if tq not in qtables:
            raise ValueError(f"JPEG quant table {tq} undefined")
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("JPEG Huffman table undefined for scan")
        stores[cid] = np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
        tables[cid] = (htables[(0, td)], htables[(1, ta)], qtables[tq])

    reader = _BitReader(data)
    preds = {cid: 0 for cid, _, _ in scan}
    restart_iter = iter(restarts)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align onto the next restart boundary, reset predictors
                rpos = next(restart_iter, None)
                if rpos is None:
                    raise ValueError("JPEG restart marker missing")
                reader.pos = rpos
                reader.bit = 0
                preds = {cid: 0 for cid in preds}
            for cid, _td, _ta in scan:
                _, hs, vs, _tq = by_cid[cid]
                dct, act, _q = tables[cid]
                for v in range(vs):
                    for hblk in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(s), s)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        stores[cid][my * vs + v, mx * hs + hblk] = zz
            mcu_count += 1

    # dequantize + IDCT per component, vectorized over all blocks
    planes = []
    for cid, _td, _ta in scan:
        _, hs, vs, _tq = by_cid[cid]
        _dct, _act, q = tables[cid]
        zz = stores[cid]
        raster = np.zeros_like(zz)
        raster[:, :, ZIGZAG] = zz
        coefs = (raster * q).reshape(zz.shape[0], zz.shape[1], 8, 8)
        pix = idct2(coefs) + 128.0
        nby, nbx = zz.shape[0], zz.shape[1]
        plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # upsample to full frame grid (nearest / pixel replication)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    rgb = ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

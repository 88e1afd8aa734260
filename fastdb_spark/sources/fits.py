"""Minimal FITS binary-table reader (FITS 4.0 standard — public spec).

The reference ingests SNANA simulation photometry from ``*HEAD.FITS.gz``
/ ``*PHOT.FITS.gz`` pairs with astropy (``src/admin/load_snana_fits.py:
115-246``).  astropy is not in this image, so this module parses the two
things those files actually are — gzipped FITS files whose first
extension is a BINTABLE — directly from the standard:

- a FITS file is a sequence of HDUs on 2880-byte block boundaries;
- a header is 80-byte keyword cards ending at ``END``;
- a BINTABLE extension describes ``TFIELDS`` columns via ``TTYPEn``
  (name) / ``TFORMn`` (repeat count + type code), ``NAXIS1`` bytes per
  row, ``NAXIS2`` rows, data big-endian row-major — i.e. exactly a numpy
  structured dtype.

Covered type codes: L (logical), B, I, J, K (u/ints), E, D (floats),
A (char).  That is the full set SNANA HEAD/PHOT tables use.
"""

from __future__ import annotations

import gzip
from typing import BinaryIO

import numpy as np

BLOCK = 2880
CARD = 80

_TFORM_NUMPY = {
    "L": "u1",  # logical: 'T'/'F' bytes; converted to bool after read
    "B": "u1",
    "I": ">i2",
    "J": ">i4",
    "K": ">i8",
    "E": ">f4",
    "D": ">f8",
}


def _read_header(stream: BinaryIO) -> dict[str, str] | None:
    """One header unit -> {KEY: raw value string}; None at EOF."""
    cards: dict[str, str] = {}
    while True:
        block = stream.read(BLOCK)
        if not block:
            return None if not cards else cards
        if len(block) != BLOCK:
            raise ValueError("truncated FITS block")
        done = False
        for i in range(0, BLOCK, CARD):
            card = block[i : i + CARD].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if card[8:10] == "= ":
                val = card[10:].split("/")[0].strip()
                cards[key] = val
        if done:
            return cards


def _hdr_int(h: dict[str, str], key: str, default: int | None = None) -> int:
    if key not in h:
        if default is None:
            raise KeyError(key)
        return default
    return int(h[key])


def _hdr_str(h: dict[str, str], key: str) -> str:
    return h.get(key, "").strip().strip("'").strip()


def _data_size(h: dict[str, str]) -> int:
    naxis = _hdr_int(h, "NAXIS", 0)
    if naxis == 0:
        return 0
    size = 1
    for i in range(1, naxis + 1):
        size *= _hdr_int(h, f"NAXIS{i}")
    # BITPIX is bits per element; negative for floats
    size *= abs(_hdr_int(h, "BITPIX", 8)) // 8
    return size


def _skip_data(stream: BinaryIO, h: dict[str, str]) -> None:
    n = _data_size(h)
    if n:
        stream.seek(((n + BLOCK - 1) // BLOCK) * BLOCK, 1)


def _parse_tform(tform: str) -> tuple[int, str]:
    """'1J' / 'D' / '20A' -> (repeat, code)."""
    i = 0
    while i < len(tform) and tform[i].isdigit():
        i += 1
    repeat = int(tform[:i]) if i else 1
    code = tform[i : i + 1]
    return repeat, code


def read_bintable(path_or_bytes) -> dict[str, np.ndarray]:
    """First BINTABLE extension of a (optionally gzipped) FITS file as
    {column_name: numpy array} (native byte order, strings stripped)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        import io

        raw = bytes(path_or_bytes)
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        stream: BinaryIO = io.BytesIO(raw)
    else:
        opener = gzip.open if str(path_or_bytes).endswith(".gz") else open
        stream = opener(path_or_bytes, "rb")  # type: ignore[assignment]

    with stream:
        hdr = _read_header(stream)
        if hdr is None or _hdr_str(hdr, "SIMPLE") != "T":
            raise ValueError("not a FITS file")
        _skip_data(stream, hdr)
        while True:
            hdr = _read_header(stream)
            if hdr is None:
                raise ValueError("no BINTABLE extension found")
            if _hdr_str(hdr, "XTENSION") == "BINTABLE":
                break
            _skip_data(stream, hdr)

        row_bytes = _hdr_int(hdr, "NAXIS1")
        n_rows = _hdr_int(hdr, "NAXIS2")
        n_fields = _hdr_int(hdr, "TFIELDS")
        names, fmts = [], []
        logical_cols, string_cols = set(), set()
        for i in range(1, n_fields + 1):
            name = _hdr_str(hdr, f"TTYPE{i}") or f"col{i}"
            repeat, code = _parse_tform(_hdr_str(hdr, f"TFORM{i}"))
            if code == "A":
                fmts.append(f"S{repeat}")
                string_cols.add(name)
            elif code in _TFORM_NUMPY:
                base = _TFORM_NUMPY[code]
                fmts.append(base if repeat == 1 else f"{repeat}{base}")
                if code == "L":
                    logical_cols.add(name)
            else:
                raise NotImplementedError(f"TFORM code {code!r} unsupported")
            names.append(name)
        dtype = np.dtype({"names": names, "formats": fmts})
        if dtype.itemsize != row_bytes:
            raise ValueError(
                f"row size mismatch: dtype {dtype.itemsize} != NAXIS1 {row_bytes}"
            )
        data = stream.read(row_bytes * n_rows)
        if len(data) != row_bytes * n_rows:
            raise ValueError("truncated BINTABLE data")
        table = np.frombuffer(data, dtype=dtype, count=n_rows)

    out: dict[str, np.ndarray] = {}
    for name in names:
        col = table[name]
        if name in string_cols:
            if len(col) == 0:  # np.char chokes on empty decode results
                out[name] = np.array([], dtype="U1")
            else:
                out[name] = np.char.strip(np.char.decode(col, "ascii"))
        elif name in logical_cols:
            out[name] = col == ord("T")
        else:
            out[name] = col.astype(col.dtype.newbyteorder("="))
    return out


def write_bintable(path: str, columns: dict[str, np.ndarray]) -> None:
    """Write {name: array} as a FITS BINTABLE (primary HDU + one
    extension).  Test-fixture writer — lets the reader be verified against
    files this module did not produce byte-for-byte (and against the
    public format definition)."""
    inverse = {"u1": "B", "i2": "I", "i4": "J", "i8": "K", "f4": "E", "f8": "D"}
    names = list(columns)
    n_rows = len(next(iter(columns.values()))) if columns else 0
    fmts, tforms = [], []
    for name in names:
        a = np.asarray(columns[name])
        if a.dtype.kind in ("U", "S"):
            width = int(str(a.dtype).split(")")[0].rsplit("U", 1)[-1].rsplit("S", 1)[-1] or 1)
            fmts.append(f"S{width}")
            tforms.append(f"{width}A")
        else:
            key = a.dtype.str.lstrip("<>=|")
            tforms.append(inverse[key])
            fmts.append(f">{key}" if key != "u1" else "u1")
    dtype = np.dtype({"names": names, "formats": fmts})
    rec = np.zeros(n_rows, dtype=dtype)
    for name in names:
        a = np.asarray(columns[name])
        if a.dtype.kind == "U":
            rec[name] = np.char.encode(a, "ascii")
        else:
            rec[name] = a

    def card(key: str, value: str) -> bytes:
        return f"{key:<8}= {value:>20}".ljust(CARD).encode("ascii")

    def block_pad(b: bytes) -> bytes:
        pad = (-len(b)) % BLOCK
        return b + b" " * pad

    primary = b"".join(
        [
            card("SIMPLE", "T"),
            card("BITPIX", "8"),
            card("NAXIS", "0"),
            "END".ljust(CARD).encode("ascii"),
        ]
    )
    ext_cards = [
        f"{'XTENSION':<8}= 'BINTABLE'".ljust(CARD).encode("ascii"),
        card("BITPIX", "8"),
        card("NAXIS", "2"),
        card("NAXIS1", str(dtype.itemsize)),
        card("NAXIS2", str(n_rows)),
        card("PCOUNT", "0"),
        card("GCOUNT", "1"),
        card("TFIELDS", str(len(names))),
    ]
    for i, (name, tform) in enumerate(zip(names, tforms), start=1):
        ext_cards.append(f"{f'TTYPE{i}':<8}= '{name}'".ljust(CARD).encode("ascii"))
        ext_cards.append(f"{f'TFORM{i}':<8}= '{tform}'".ljust(CARD).encode("ascii"))
    ext_cards.append("END".ljust(CARD).encode("ascii"))

    payload = rec.tobytes()
    body = (
        block_pad(primary)
        + block_pad(b"".join(ext_cards))
        + payload
        + b"\x00" * ((-len(payload)) % BLOCK)
    )
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(body)
